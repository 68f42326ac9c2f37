package graft

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Orchestration surface (SURVEY §2.10): sequential and concurrent
  * stage runners plus driver-side progress metrics.
  *
  * The stage list holds THUNKS. The reference's Start.py:49-54 builds
  * its stage list by CALLING the functions (eager evaluation — the
  * real sequencing happened during list construction and full_run
  * iterated a list of Nones); `() => Unit` makes that bug a type
  * error here rather than a silent behavior.
  */
object Pipeline {

  final case class Stage(name: String, run: () => Unit)
  final case class StageResult(name: String, millis: Long, error: Option[String])

  /** C2: ordered sequential execution, never aborting the whole run on
    * one failed stage (the reference's full_run skips and continues —
    * qa_api_handler.py:296-317), with per-stage wall time.
    */
  def runSequential(stages: Seq[Stage]): Seq[StageResult] =
    stages.map { st =>
      val t0 = System.nanoTime()
      val err = try { st.run(); None }
      catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      StageResult(st.name, (System.nanoTime() - t0) / 1000000L, err)
    }

  /** C1: thread-per-pipeline concurrency (Start.py:69-83) via a fixed
    * pool; results arrive in submission order. Stages must touch
    * disjoint state — same contract the reference's threads had.
    */
  def runConcurrent(stages: Seq[Stage], parallelism: Int): Seq[StageResult] = {
    val pool = Executors.newFixedThreadPool(math.max(parallelism, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = stages.map(st => Future(runSequential(Seq(st)).head))
      Await.result(Future.sequence(fs), Duration.Inf)
    } finally pool.shutdown()
  }

  /** O3: peek-first-N debug (the reference prints json_var[:3],
    * qa_api_handler.py:326-331) — take(n) through the limit-pushdown
    * path, never a full materialization.
    */
  def peek(df: org.apache.spark.sql.DataFrame, n: Int = 3): Seq[String] =
    df.take(n).map(_.json).toSeq

  /** A3: driver progress metrics — the reference prints running counts
    * and percentages (qa_api_handler.py:130,146-152); on Spark the
    * scheduler already knows, so expose jobs/tasks/records seen via a
    * listener instead of hand-rolled counters.
    */
  final class ProgressMetrics extends SparkListener {
    @volatile var jobsCompleted = 0L
    @volatile var tasksCompleted = 0L
    @volatile var recordsRead = 0L
    override def onJobEnd(end: SparkListenerJobEnd): Unit =
      jobsCompleted += 1
    override def onTaskEnd(end: SparkListenerTaskEnd): Unit = {
      tasksCompleted += 1
      val m = end.taskMetrics
      if (m != null) recordsRead += m.inputMetrics.recordsRead
    }
  }

  /** Attach metrics for the duration of `body`. */
  def withProgress[A](spark: SparkSession)(body: => A): (A, ProgressMetrics) = {
    val pm = new ProgressMetrics
    spark.sparkContext.addSparkListener(pm)
    try {
      val a = body
      // the listener bus is async: poll until the counters go quiet
      // (the bus-draining API is private[spark])
      var last = -1L
      var spins = 0
      while (spins < 50 && last != pm.jobsCompleted + pm.tasksCompleted) {
        last = pm.jobsCompleted + pm.tasksCompleted
        Thread.sleep(100)
        spins += 1
      }
      (a, pm)
    } finally spark.sparkContext.removeSparkListener(pm)
  }
}
