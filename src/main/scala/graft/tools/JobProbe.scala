package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{Sessions, SparkEntry}

/** Attribute a driver row's wall time to the Spark jobs it runs, keyed
  * by call site — the guide §1 "where is the time actually going" step
  * for rows that run MANY jobs (streaming drains, snapshot-table rows
  * with in-row requires). Prints, per named query: total wall, the sum
  * of job wall, the residue (driver-side planning/manifest IO/offset
  * log time), and the top call sites by accumulated job time.
  * Diagnostic only — never part of a query path.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBoundedWindowWarning()
    val open = new ConcurrentHashMap[Int, (String, Long)]()
    val agg = new ConcurrentHashMap[String, (Long, Long)]() // site -> (ns, n)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        def prop(k: String) = p.flatMap(x => Option(x.getProperty(k)))
        val site = prop("callSite.short")
          .orElse(prop("spark.job.description").map(_.take(90)))
          .orElse(prop("callSite.long").map(_.linesIterator.take(2)
            .mkString(" | ").take(120)))
          .getOrElse("?")
        open.put(j.jobId, (site, System.nanoTime())): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val o = open.remove(j.jobId)
        if (o != null) {
          val dt = System.nanoTime() - o._2
          agg.merge(o._1, (dt, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
        }
      }
    })
    // per-micro-batch duration breakdown (triggerExecution and its
    // named sub-phases), accumulated across every batch of every
    // streaming query the row runs
    val phase = new ConcurrentHashMap[String, (Long, Long)]() // ms, n
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          e.progress.durationMs.forEach { (k, v) =>
            phase.merge(k, (v.longValue(), 1L),
              (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
          }
          phase.merge("(batches)", (0L, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
        }
      })
    // in-process stack sampler: every 15 ms, record the deepest
    // "interesting" frame of each RUNNABLE non-executor thread —
    // attributes the driver-side residue (planning, manifest IO,
    // commit protocol) that job wall can't see
    val samples = new ConcurrentHashMap[String, Long]()
    val samplerOn = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sampler = new Thread(() => {
      while (true) {
        if (samplerOn.get()) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, st) =>
            val n = t.getName
            if (t.getState == Thread.State.RUNNABLE && t.getId != Thread.currentThread().getId &&
              !n.startsWith("Executor task launch") && !n.contains("dispatcher") &&
              !n.contains("netty") && !n.contains("shuffle")) {
              val f = st.find { e =>
                val c = e.getClassName
                c.startsWith("org.apache.spark.sql.catalyst") ||
                c.startsWith("org.apache.spark.sql.execution") ||
                c.startsWith("org.apache.spark.sql.Dataset") ||
                c.startsWith("org.apache.parquet") ||
                c.startsWith("graft") ||
                c.startsWith("org.apache.hadoop") ||
                c.startsWith("com.fasterxml") ||
                c.startsWith("java.io") || c.startsWith("java.nio") ||
                c.startsWith("org.apache.spark")
              }
              f.foreach { e =>
                val chain =
                  if (e.getClassName.endsWith("Shell") ||
                    e.getClassName.endsWith("WritableUtils"))
                    st.filter(x => x.getClassName.startsWith("org.apache") ||
                      x.getClassName.startsWith("graft"))
                      .slice(1, 7).map(x => x.getClassName
                        .replaceAll("^.*\\.", "") + "." + x.getMethodName)
                      .mkString(" <- ")
                  else ""
                val key = (if (n.startsWith("stream execution")) "stream|"
                  else if (n == "main") "main|" else "other|") +
                  e.getClassName.replaceAll("^org\\.apache\\.spark\\.sql\\.", "o.a.s.sql.")
                    .replaceAll("\\$+.*$", "") + "." + e.getMethodName +
                  (if (chain.nonEmpty) s" [$chain]" else "")
                samples.merge(key, 1L, _ + _): Unit
              }
            }
          }
        }
        Thread.sleep(15)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    // warmup, same as Bench
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    args.foreach { n =>
      agg.clear()
      phase.clear()
      samples.clear()
      samplerOn.set(true)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are delivered async — give the bus a moment
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rows = agg.asScala.toSeq.sortBy(-_._2._1)
      val jobSum = rows.map(_._2._1).sum / 1e9
      println(f"PROBE $n wall=$wall%.2f jobs=$jobSum%.2f " +
        f"residue=${wall - jobSum}%.2f njobs=${rows.map(_._2._2).sum}")
      rows.take(20).foreach { case (site, (ns, cnt)) =>
        println(f"  ${ns / 1e9}%7.3f s  x$cnt%-4d $site")
      }
      samplerOn.set(false)
      val ph = phase.asScala.toSeq.sortBy(-_._2._1)
      ph.foreach { case (k, (ms, cnt)) =>
        println(f"  phase ${ms / 1e3}%7.3f s  x$cnt%-4d $k")
      }
      samples.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, c) =>
        println(f"  stack $c%5d $k")
      }
    }
    spark.stop()
  }
}
