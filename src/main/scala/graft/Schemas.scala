package graft

import org.apache.spark.sql.types._

/** Declared StructTypes for the Calabrio payloads (FIXTURES.md §A).
  *
  * The reference stages these as schemaless VARIANT and casts per path
  * (`src:a:b::TYPE`); here the schema is stable and documented (vendor
  * API guide), so a declared StructType is the Spark-right default —
  * the JSON reader prunes and the casts disappear into the scan.
  * Field lists are exactly the paths the transform consumes:
  * /root/reference/sql_templates/Update Calabrio Tables from Staging
  * Tables (D_POST_INSTALL).sql.
  */
object Schemas {

  private def ref = StructField("$ref", StringType)

  /** forms.json — Update…sql:6-27 (id/name/sections→questions→options). */
  val forms: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("sections", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("weight", DoubleType),
      StructField("questions", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("weight", DoubleType),
        StructField("options", ArrayType(StructType(Seq(
          StructField("id", LongType),
          StructField("label", StringType),
          StructField("points", LongType),
          StructField("type", StringType),
        )))),
      )))),
    )))),
  ))

  /** contacts payloads — Update…sql:36-53 (id/startTime/assocCallId). */
  val contacts: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("startTime", LongType),
    StructField("assocCallId", StringType),
    StructField("agent", StructType(Seq(
      ref, StructField("displayId", StringType)))),
  ))

  /** evaluations payload — Update…sql:97-170. */
  val evaluations: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("qualityRef", StringType),
    StructField("evalForm", StructType(Seq(
      StructField("evalFormId", LongType)))),
    StructField("agent", StructType(Seq(StructField("id", LongType)))),
    StructField("evaluator", StructType(Seq(StructField("id", LongType)))),
    StructField("isScoreCounted", BooleanType),
    StructField("evaluated", LongType),
    StructField("state", StructType(Seq(StructField("text", StringType)))),
    StructField("responseState", StructType(Seq(
      StructField("text", StringType)))),
    StructField("additiveScore", LongType),
    StructField("totalScore", DoubleType),
    StructField("comments", StringType),
    StructField("sections", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("questions", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("selectedOption", LongType),
      )))),
    )))),
  ))

  /** transcript utterance — qa_api_handler.py:163-200 (speechtextview
    * responses; extraction+staging only, no transform SQL exists). */
  val transcript: StructType = StructType(Seq(
    StructField("ccrid", LongType),
    StructField("seq", LongType),
    StructField("text", StringType),
  ))

  /** comments payload — Update…sql:185-215 ($ref digit-runs carry ids). */
  val comments: StructType = StructType(Seq(
    ref,
    StructField("sectionFK", LongType),
    StructField("questionFK", LongType),
    StructField("created", LongType),
    StructField("commentor", StructType(Seq(ref))),
    StructField("text", StringType),
    StructField("history", ArrayType(StructType(Seq(
      StructField("created", LongType),
      StructField("commentor", StructType(Seq(ref))),
    )))),
  ))
}
