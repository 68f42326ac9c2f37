package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.sources.{Extraction, Ingest}
import graft.sources.Ingest.DateWindow

/** Orchestration + extraction-config surface (SURVEY §2.10 C1-C3,
  * §2.1 S1/S3).
  */
class PipelineSpec extends SparkSpec {

  test("runSequential preserves order, isolates failures, times stages") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val res = Pipeline.runSequential(Seq(
      Pipeline.Stage("a", () => seen += "a"),
      Pipeline.Stage("boom", () => throw new RuntimeException("nope")),
      Pipeline.Stage("b", () => seen += "b")))
    assert(seen.toSeq === Seq("a", "b"))
    assert(res.map(_.name) === Seq("a", "boom", "b"))
    assert(res(1).error.exists(_.contains("nope")))
    assert(res.forall(_.millis >= 0))
  }

  test("runConcurrent executes all stages and reports in submission order") {
    val n = new AtomicInteger(0)
    val res = Pipeline.runConcurrent(
      (1 to 6).map(i => Pipeline.Stage(s"s$i", () => { n.incrementAndGet(); () })),
      parallelism = 3)
    assert(n.get === 6)
    assert(res.map(_.name) === (1 to 6).map(i => s"s$i"))
    assert(res.forall(_.error.isEmpty))
  }

  test("withProgress observes spark jobs and records") {
    val (_, pm) = Pipeline.withProgress(spark) {
      Tables.documents(spark, "/root/testdata/sf0.001").count()
    }
    assert(pm.jobsCompleted >= 1)
    assert(pm.tasksCompleted >= 1)
    assert(pm.recordsRead > 0)
  }

  test("flagship entry returns rows on the smoke scale (t1 gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracle key has a query; every query is oracle-checked") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      s"orphan oracle keys: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
    // r14 graduated the last five rows-only rows to hash-checked
    // DuckDB replays (md5-derived signatures, pinned IVF/PQ
    // quantizers) — a query without an oracle is an unmeasured
    // surface now; fail loudly if one ever reappears
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet === Set.empty,
      s"rows-only queries: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
  }

  test("queryString builds the reference's windowed-scan URL shape (P13)") {
    val url = Extraction.queryString("/api/rest/recording/contact", Seq(
      "beginDate" -> "2024-01-01", "endDate" -> "2024-01-03",
      "limit" -> "50000", "evalState" -> "scored"))
    assert(url === "/api/rest/recording/contact?beginDate=2024-01-01&endDate=2024-01-03&limit=50000&evalState=scored")
    assert(Extraction.queryString("/x", Nil) === "/x")
    // reserved chars are encoded
    assert(Extraction.queryString("/x", Seq("q" -> "a b&c")) === "/x?q=a+b%26c")
  }

  test("credentialsFrom parses env-injected JSON and rejects absence") {
    val env = Map("CALABRIO_KEY" ->
      """{"base_url": "https://x.example/api", "user": "svc", "secret": "s3cr3t"}""")
    val c = Extraction.credentialsFrom(env)
    assert(c === Extraction.Credentials("https://x.example/api", "svc", "s3cr3t"))
    intercept[IllegalStateException](Extraction.credentialsFrom(Map.empty))
    intercept[IllegalArgumentException](
      Extraction.credentialsFrom(Map("CALABRIO_KEY" -> """{"user": "u"}""")))
  }

  test("followLinks: only rows with a link fan out (S6/F7)") {
    import spark.implicits._
    val evals = Seq(
      (5000L, "/api/contact/1/eval/5000/comment"),
      (5001L, null),
      (5002L, "/api/contact/2/eval/5002/comment")).toDF("id", "comments")
    val lf = new Extraction.LinkFetcher {
      def fetch(url: String): Iterator[String] = Iterator(s"""[{"url": "$url"}]""")
    }
    val out = Extraction.followLinks(evals, "comments", lf, tasks = 2)
    assert(out.count() === 2)
  }

  test("collapseLoadTargets mirrors the reference's glob collapse (O4)") {
    val in = Seq("all_contacts_1.json", "all_contacts_2.json", "forms.json",
      "all_contacts_7.json", "qa_contacts.json")
    assert(Ingest.collapseLoadTargets(in)
      === Seq("all_contacts_*.json", "forms.json", "qa_contacts.json"))
  }

  test("transcripts reader drops empty responses, keeps utterance order (S5/F6)") {
    val t = Fixtures.transcripts(spark)
    assert(t.count() === 30)
    assert(t.filter(org.apache.spark.sql.functions.col("ccrid").isNull).count() === 0)
  }

  test("peek returns first-N without full materialization (O3)") {
    val p = Pipeline.peek(Tables.documents(spark, "/root/testdata/sf0.001"), 3)
    assert(p.size === 3)
    assert(p.head.contains("doc_id"))
  }

  test("source selector: window scan vs keys-from-query produce the same shape") {
    import spark.implicits._
    val wf = new Ingest.WindowFetcher {
      def fetch(w: DateWindow): Iterator[String] =
        Iterator(s"""[{"id": 1, "startTime": 0, "assocCallId": "w"}]""")
    }
    val kf = new Ingest.KeyFetcher {
      def fetch(key: Long): Iterator[String] =
        Iterator(s"""[{"id": $key, "startTime": 0, "assocCallId": "k"}]""")
    }
    val fromWindows = Extraction.extract(
      spark, Extraction.WindowScan(Seq(DateWindow("2024-01-01", "2024-01-02"))), wf, kf)
    val fromQuery = Extraction.extract(
      spark, Extraction.KeysFromQuery(Seq(7L, 8L).toDF("contact_id"), "contact_id"), wf, kf)
    val a = Ingest.parseDocs(fromWindows, Schemas.contacts)
    val b = Ingest.parseDocs(fromQuery, Schemas.contacts)
    assert(a.columns === b.columns)
    assert(a.count() === 1)
    assert(b.select("id").collect().map(_.getLong(0)).toSet === Set(7L, 8L))
  }
}
