package graft.operators

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end sync pipelines: shred staging, then apply the
  * reference's merge/delete/rebuild write-path semantics against the
  * previously-loaded state. The "target" state is itself derived from
  * the base fixture batch (the reference's first run), the "staging"
  * state from the *_restated fixtures (an overlapping re-extraction
  * window with upstream edits/deletes — the reference's whole
  * late-data design, SURVEY §2.11).
  */
object CalabrioSync {

  /** J2: insert-only contacts merge — Update…sql:36-53. */
  def mergedContacts(spark: SparkSession): DataFrame =
    Maintenance
      .insertOnlyMerge(
        Shred.contacts(Fixtures.qaContacts(spark)),
        Shred.contacts(Fixtures.qaContactsRestated(spark)),
        Seq("contact_id"))
      .orderBy("contact_id")

  /** D1+J5 delete-vanished, then J3 update+insert keeping the target's
    * evaluated_date (and never touching contact_id) — Update…sql:85-134.
    */
  def mergedEvaluations(spark: SparkSession): DataFrame = {
    val target = Shred.evaluations(Fixtures.evaluations(spark))
    val survivors = Maintenance.deleteVanished(
      target,
      Fixtures.qaContactsRestated(spark).select(col("id").as("contact_id")),
      Fixtures.evaluationsRestated(spark).select(col("id").as("evaluation_id")))
    Maintenance
      .upsertKeepCols(
        survivors,
        Shred.evaluations(Fixtures.evaluationsRestated(spark)),
        Seq("evaluation_id"),
        keepCols = Set("contact_id", "evaluated_date"))
      .orderBy("contact_id", "evaluation_id")
  }

  /** J4+D4: backup mirror merge — update-else-insert keyed on the
    * document id the reference extracts from the VARIANT
    * (Update…sql:217-227: matched → replace the whole payload,
    * non-matched → insert). Like the reference's backup table, the
    * payload travels WHOLE — one raw JSON `src` column next to the
    * extracted key, not a scalar projection (payload archaeology: the
    * backup exists to answer "what did the vendor actually send").
    * `ignoreNullFields=false` keeps null fields explicit so the
    * serialized payload round-trips the document shape (and matches
    * DuckDB's to_json rendering in the oracle).
    */
  def backupMirror(spark: SparkSession): DataFrame = {
    def proj(df: DataFrame): DataFrame = df.select(
      col("id").as("contact_id"),
      to_json(
        struct(col("id"), col("startTime"), col("assocCallId"), col("agent")),
        Map("ignoreNullFields" -> "false")).as("src"))
    Maintenance
      .upsertKeepCols(
        proj(Fixtures.qaContacts(spark)),
        proj(Fixtures.qaContactsRestated(spark)),
        Seq("contact_id"),
        keepCols = Set.empty)
      .orderBy("contact_id")
  }

  /** The troubleshooting row-count surface (queries/troubleshooting
    * .sql:1-11: the reference's manual verification was eyeballing
    * table sizes) as one relation: each shredded table's cardinality.
    */
  def tableCounts(spark: SparkSession): DataFrame = {
    def one(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("table_name"), col("n"))
    one("qa_contacts", Shred.contacts(Fixtures.qaContacts(spark)))
      .unionByName(one("qa_evaluations", Shred.evaluations(Fixtures.evaluations(spark))))
      .unionByName(one("qa_evaluation_scores", Shred.scores(Fixtures.evaluations(spark))))
      .unionByName(one("qa_evaluation_comments", Shred.comments(Fixtures.comments(spark))))
      .unionByName(one("qa_forms", Shred.forms(Fixtures.forms(spark))))
      .unionByName(one("qa_transcripts", Fixtures.transcripts(spark)))
      .unionByName(one("contacts_staging_backup", backupMirror(spark)))
      .orderBy("table_name")
  }

  /** D2+J6: scores partition rebuild keyed on restated contacts —
    * Update…sql:140-170.
    */
  def rebuiltScores(spark: SparkSession): DataFrame =
    Maintenance
      .rebuildForContacts(
        Shred.scores(Fixtures.evaluations(spark)),
        Fixtures.qaContactsRestated(spark).select(col("id").as("contact_id")),
        Shred.scores(Fixtures.evaluationsRestated(spark)))
      .orderBy("evaluation_id", "section_id", "question_id")
}
