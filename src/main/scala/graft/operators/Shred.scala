package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The semi-structured → relational shredding layer: the heart of the
  * reference transform (/root/reference/sql_templates/Update Calabrio
  * Tables from Staging Tables (D_POST_INSTALL).sql). Every function is
  * a pure DataFrame => DataFrame over the typed staging frames
  * (Fixtures + Schemas), so each is unit-testable and DuckDB-oracle
  * checkable in isolation.
  *
  * Scale posture: all transforms are narrow (project/explode/filter)
  * except the window dedups, which shuffle on their natural key
  * (evaluation_id / comment_id — high-cardinality, skew-free). Nothing
  * collects to the driver; explodes amplify rows by the documented
  * nesting factor only (sections×questions×options), never by data
  * volume squared.
  */
object Shred {

  /** Epoch-ms → America/Denver wall-clock string.
    * Reference: Update…sql:41-42,67-68,107-109,193-196 — the payload's
    * own tz fields are documented-wrong and deliberately ignored.
    * Output is a formatted string so the cross-engine compare is
    * instant-exact and type-stable (determinism rules, Queries.scala).
    */
  def denverTs(epochMs: Column): Column =
    date_format(
      convert_timezone(lit("UTC"), lit("America/Denver"), timestamp_millis(epochMs)),
      "yyyy-MM-dd HH:mm:ss")

  /** T_QA_FORMS: 3-level inner flatten forms→sections→questions→options
    * (L1). Reference: Update…sql:6-27. Inner explode intentionally
    * drops sections/questions with empty children, matching LATERAL
    * FLATTEN semantics.
    */
  def forms(staged: DataFrame): DataFrame =
    staged
      .select(
        col("id").as("form_id"),
        col("name").as("form_name"),
        explode(col("sections")).as("sec"))
      .select(
        col("form_id"), col("form_name"),
        col("sec.id").as("section_id"),
        col("sec.name").as("section_name"),
        col("sec.weight").as("section_weight"),
        explode(col("sec.questions")).as("que"))
      .select(
        col("form_id"), col("form_name"),
        col("section_id"), col("section_name"), col("section_weight"),
        col("que.id").as("question_id"),
        col("que.text").as("question_text"),
        col("que.weight").as("question_weight"),
        explode(col("que.options")).as("opt"))
      .select(
        col("form_id"), col("form_name"),
        col("section_id"), col("section_name"), col("section_weight"),
        col("question_id"), col("question_text"), col("question_weight"),
        col("opt.id").as("option_id"),
        col("opt.label").as("option_label"),
        col("opt.points").as("option_points"),
        col("opt.type").as("option_type"))
  // NOTE: the reference's ORDER BY clauses are presentation-only;
  // shred outputs deliberately carry no global sort so downstream
  // merges don't pay a range exchange. Registered queries order at
  // the edge (SparkEntry).

  /** T_QA_CONTACTS / T_CONTACTS source projection (P1-P4).
    * Reference: Update…sql:36-53,62-79 — epoch-ms → Denver timestamp,
    * URL concat, assocCallId passthrough.
    */
  def contacts(staged: DataFrame): DataFrame =
    staged.select(
      col("id").as("contact_id"),
      denverTs(col("startTime")).as("contact_start_time"),
      concat(
        lit("https://calabriocloud.com/index.html#/recordings/"),
        col("id").cast("string"),
        lit("/ccr")).as("contact_url"),
      col("assocCallId").as("cjp_session_id"))

  /** Schema-on-read alternative: the same contacts shred through
    * Spark 4 VariantType — parse_json the raw array, variant_explode
    * to one semi-structured document per row, variant_get per path.
    * This is the literal analog of the reference's single-VARIANT-
    * column staging (`co.src:id::NUMBER`); the declared-StructType
    * path (contacts above) stays the default because the scan prunes
    * to the consumed fields, but this path survives payload drift
    * without a schema change — both are oracle-checked to agree.
    * Input: one raw JSON array document per row (wholetext read).
    */
  def contactsVariant(rawArrays: DataFrame): DataFrame =
    rawArrays
      // variant_explode is a lateral TVF (SQL-only); casting the
      // variant to array<variant> keeps this in the DataFrame API
      .select(explode(expr("cast(parse_json(value) AS array<variant>)")).as("value"))
      .select(
        expr("variant_get(value, '$.id', 'bigint')").as("contact_id"),
        denverTs(expr("variant_get(value, '$.startTime', 'bigint')"))
          .as("contact_start_time"),
        concat(
          lit("https://calabriocloud.com/index.html#/recordings/"),
          expr("variant_get(value, '$.id', 'bigint')").cast("string"),
          lit("/ccr")).as("contact_url"),
        expr("variant_get(value, '$.assocCallId', 'string')").as("cjp_session_id"))

  private val evalCols = Seq(
    "evaluation_id", "form_id", "contact_id", "agent_id", "evaluator_id",
    "eval_type", "evaluated_date", "response_state", "raw_score", "final_score")

  /** T_QA_EVALUATIONS source projection: SCORED filter (F1), anchored
    * regex contact id (P5), IFF eval type (P7), dedup-to-1 (W1).
    * Reference: Update…sql:97-134. The reference's `ORDER BY 1`
    * tie-break is nondeterministic; duplicates in staging are exact
    * duplicates (re-fetched windows), so we order by the full projected
    * tuple — deterministic and identical under exact duplication.
    * raw_score is the additive score; final_score is Calabrio's
    * KPI-aware total (0 if any KPI question failed — semantics carried
    * by the payload field, Update…sql:111-114).
    */
  def evaluations(staged: DataFrame): DataFrame = {
    val proj = staged
      .filter(col("state.text") === "SCORED")
      .select(
        col("id").as("evaluation_id"),
        col("evalForm.evalFormId").as("form_id"),
        regexp_extract(col("qualityRef"), "(\\d+)$", 1).cast("long").as("contact_id"),
        col("agent.id").as("agent_id"),
        col("evaluator.id").as("evaluator_id"),
        when(col("isScoreCounted"), "Evaluation").otherwise("Calibration").as("eval_type"),
        denverTs(col("evaluated")).as("evaluated_date"),
        col("responseState.text").as("response_state"),
        col("additiveScore").as("raw_score"),
        col("totalScore").as("final_score"))
    val w = Window.partitionBy("evaluation_id")
      .orderBy(evalCols.filterNot(_ == "evaluation_id").map(col): _*)
    proj
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** T_QA_EVALUATION_SCORES: 2-level inner flatten (L2) with the
    * documented row-loss acceptance for empty arrays. No dedup — exact
    * duplicate staging rows fan out to duplicate score rows, as in the
    * reference. Reference: Update…sql:149-170 (contact id here is the
    * FIRST digit run of qualityRef, not the anchored last — `:152`).
    */
  def scores(staged: DataFrame): DataFrame =
    staged
      .filter(col("state.text") === "SCORED")
      .select(
        col("id").as("evaluation_id"),
        regexp_extract(col("qualityRef"), "(\\d+)", 1).cast("long").as("contact_id"),
        explode(col("sections")).as("sec"))
      .select(
        col("evaluation_id"), col("contact_id"),
        col("sec.id").as("section_id"),
        explode(col("sec.questions")).as("que"))
      .select(
        col("evaluation_id"), col("contact_id"), col("section_id"),
        col("que.id").as("question_id"),
        col("que.selectedOption").as("option_id"))

  /** T_QA_EVALUATION_COMMENTS: outer flatten of history (L3 — Spark's
    * explode_outer natively expresses the reference's '[]'→'[{}]'
    * hack, Update…sql:201-202), occurrence-indexed regex ids from the
    * HATEOAS $ref (P6, `:187-189`: digit runs 1/2/3 = contact/eval/
    * comment), NVL history-over-top-level (P8), alnum text filter
    * (P9, dot-all), newest-history-wins dedup (W2, `:206-208`).
    */
  def comments(staged: DataFrame): DataFrame = {
    val runs = regexp_extract_all(col("`$ref`"), lit("\\d+"), lit(0))
    val proj = staged
      .withColumn("h", explode_outer(col("history")))
      .filter(col("text").rlike("(?s)^.*[\\p{Alnum}].*$"))
      .select(
        element_at(runs, 3).cast("long").as("comment_id"),
        element_at(runs, 1).cast("long").as("contact_id"),
        element_at(runs, 2).cast("long").as("evaluation_id"),
        col("sectionFK").as("section_id"),
        col("questionFK").as("question_id"),
        denverTs(coalesce(col("h.created"), col("created"))).as("created_date"),
        regexp_extract(
          coalesce(col("h.commentor").getField("$ref"), col("commentor").getField("$ref")),
          "(\\d+)", 1).cast("long").as("commentor_id"),
        col("text"),
        col("h.created").as("h_created"))
    val w = Window.partitionBy("comment_id").orderBy(col("h_created").desc_nulls_last)
    proj
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "h_created")
  }
}
