package graft

import graft.operators.{Maintenance, Shred}
import graft.sources.{Extraction, Ingest, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full lifecycle (SURVEY §3 E1-E3) as one composed
  * pipeline: windowed contact extraction → per-contact evaluation
  * fan-out → comment link-follow → staged JSON-lines → PERMISSIVE
  * load → shred → idempotent merges into the typed target tables,
  * each landing via atomic tmp-swap overwrite. Fetchers are injected
  * (fixture-backed in tests, HTTP against Calabrio in production), so
  * the whole dataflow runs and verifies offline.
  *
  * Vendor payloads arrive as JSON arrays; the pipeline normalizes to
  * JSON-lines at stage time — at 100 TB an array file is one
  * indivisible task, a lines file splits at any offset.
  */
object CalabrioPipeline {

  final case class Config(stageDir: String, targetDir: String)

  def contactsTable(c: Config): String = s"${c.targetDir}/t_qa_contacts"
  def evaluationsTable(c: Config): String = s"${c.targetDir}/t_qa_evaluations"
  def scoresTable(c: Config): String = s"${c.targetDir}/t_qa_evaluation_scores"
  def commentsTable(c: Config): String = s"${c.targetDir}/t_qa_evaluation_comments"

  private def readOr(spark: SparkSession, path: String, empty: => DataFrame): DataFrame =
    if (Sinks.exists(path)) spark.read.parquet(path) else empty

  /** The restated-contact set every delete/rebuild keys on — the ids
    * in the CONTACTS staging batch (Update…sql:90,145,181), NOT the
    * contacts that happen to appear in the evals/comments staging: a
    * restated contact whose evaluations all vanished upstream must
    * still have its stale rows deleted.
    */
  private def stagedContactIds(spark: SparkSession, c: Config): DataFrame = {
    val (good, _) = Ingest.loadStagedLines(
      spark, s"${c.stageDir}/all_contacts_*.json", Schemas.contacts)
    good.select(col("id").as("contact_id"))
  }

  /** One full batch run. Returns per-stage results (a failed stage is
    * isolated, like the reference's full_run). Re-running with the
    * same inputs is a no-op on every target — the merge algebra's
    * replay idempotency, property-tested in MaintenanceSpec.
    */
  def fullRun(
      spark: SparkSession,
      config: Config,
      windows: Seq[Ingest.DateWindow],
      contactsFetcher: Ingest.WindowFetcher,
      evalsFetcher: Ingest.KeyFetcher,
      commentsFetcher: Extraction.LinkFetcher): Seq[Pipeline.StageResult] = {
    import spark.implicits._
    val c = config

    val stages = Seq(
      Pipeline.Stage("purge_stage", () =>
        Sinks.purgeStage(spark, c.stageDir)),

      Pipeline.Stage("extract_contacts", () => {
        val raw = Ingest.fetchWindows(spark, windows, contactsFetcher)
        Sinks.writeJsonBatch(
          Ingest.parseDocs(raw, Schemas.contacts), c.stageDir, "all_contacts", 1)
      }),

      Pipeline.Stage("merge_contacts", () => {
        val (good, _) = Ingest.loadStagedLines(
          spark, s"${c.stageDir}/all_contacts_*.json", Schemas.contacts)
        val fresh = Shred.contacts(good)
        val target = readOr(spark, contactsTable(c), fresh.limit(0))
        Sinks.overwriteAtomic(
          Maintenance.insertOnlyMerge(target, fresh, Seq("contact_id")),
          contactsTable(c))
      }),

      Pipeline.Stage("extract_evaluations", () => {
        val ids = spark.read.parquet(contactsTable(c))
          .select(col("contact_id")).as[java.lang.Long]
        val raw = Ingest.fetchPerKey(ids, evalsFetcher, tasks = 4)
        Sinks.writeJsonBatch(
          Ingest.parseDocs(raw, Schemas.evaluations), c.stageDir, "fix_eval_raw", 1)
      }),

      Pipeline.Stage("merge_evaluations", () => {
        val (good, _) = Ingest.loadStagedLines(
          spark, s"${c.stageDir}/fix_eval_raw_*.json", Schemas.evaluations)
        val fresh = Shred.evaluations(good)
        val target = readOr(spark, evaluationsTable(c), fresh.limit(0))
        val survivors = Maintenance.deleteVanished(
          target, stagedContactIds(spark, c), good.select(col("id").as("evaluation_id")))
        Sinks.overwriteAtomic(
          Maintenance.upsertKeepCols(
            survivors, fresh, Seq("evaluation_id"),
            keepCols = Set("contact_id", "evaluated_date")),
          evaluationsTable(c))
      }),

      Pipeline.Stage("rebuild_scores", () => {
        val (good, _) = Ingest.loadStagedLines(
          spark, s"${c.stageDir}/fix_eval_raw_*.json", Schemas.evaluations)
        val fresh = Shred.scores(good)
        val target = readOr(spark, scoresTable(c), fresh.limit(0))
        Sinks.overwriteAtomic(
          Maintenance.rebuildForContacts(target, stagedContactIds(spark, c), fresh),
          scoresTable(c))
      }),

      Pipeline.Stage("extract_comments", () => {
        val (evals, _) = Ingest.loadStagedLines(
          spark, s"${c.stageDir}/fix_eval_raw_*.json", Schemas.evaluations)
        val raw = Extraction.followLinks(evals, "comments", commentsFetcher, tasks = 4)
        Sinks.writeJsonBatch(
          Ingest.parseDocs(raw, Schemas.comments), c.stageDir, "fix_comments_raw", 1)
      }),

      Pipeline.Stage("rebuild_comments", () => {
        val (good, _) = Ingest.loadStagedLines(
          spark, s"${c.stageDir}/fix_comments_raw_*.json", Schemas.comments)
        val fresh = Shred.comments(good)
        val target = readOr(spark, commentsTable(c), fresh.limit(0))
        Sinks.overwriteAtomic(
          Maintenance.rebuildForContacts(target, stagedContactIds(spark, c), fresh),
          commentsTable(c))
      }))

    Pipeline.runSequential(stages)
  }
}
