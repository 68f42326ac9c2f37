package graft

import graft.operators.Shred
import org.apache.spark.sql.functions._

/** Edge-case semantics of the shredding layer (SURVEY §5 item 4):
  * the documented behaviors the reference SQL encodes in comments.
  */
class ShredSpec extends SparkSpec {

  test("forms: inner flatten drops sections/questions with empty children") {
    val out = Shred.forms(Fixtures.forms(spark)).cache()
    // every output row has a full (form, section, question, option) path
    assert(out.filter(col("option_id").isNull).count() === 0)
    // fixtures contain a section with no questions and a question with
    // no options (FIXTURES.md §A.1) — those paths must NOT appear
    val secs = Fixtures.forms(spark)
      .select(explode(col("sections")).as("sec"))
      .select(col("sec.id").as("sid"), size(col("sec.questions")).as("nq"))
    val emptySecs = secs.filter(col("nq") === 0).select("sid")
      .collect().map(_.getLong(0)).toSet
    assert(emptySecs.nonEmpty, "fixture should contain an empty section")
    assert(out.filter(col("section_id").isin(emptySecs.toSeq: _*)).count() === 0)
  }

  test("evaluations: only SCORED rows survive and keys are unique") {
    val out = Shred.evaluations(Fixtures.evaluations(spark)).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.select("evaluation_id").distinct().count() === n)
    // raw staging has exact-duplicate ids and non-SCORED rows; both gone
    val raw = Fixtures.evaluations(spark)
    assert(raw.count() > n)
  }

  test("evaluations: tz conversion is UTC→Denver (payload tz ignored)") {
    // Eval 5012 (SCORED): 1705190411964 ms = 2024-01-14 00:00:11 UTC
    // = 2024-01-13 17:00:11 Denver (MST, UTC-7) — crosses the date
    // boundary, so a wrong tz source is off by a day, not just hours.
    val out = Shred.evaluations(Fixtures.evaluations(spark))
      .filter(col("evaluation_id") === 5012)
    assert(out.select("evaluated_date").collect().head.getString(0)
      === "2024-01-13 17:00:11")
  }

  test("comments: empty history survives via outer flatten") {
    val staged = Fixtures.comments(spark)
    val emptyHist = staged.filter(size(col("history")) === 0)
      .filter(col("text").rlike("(?s)^.*[\\p{Alnum}].*$"))
    val out = Shred.comments(staged)
    // every alnum-text comment with empty history must still emit a row
    assert(emptyHist.count() > 0)
    assert(out.count() >= emptyHist.count())
    // rows with empty history take top-level created/commentor
    val ids = emptyHist
      .select(element_at(regexp_extract_all(col("`$ref`"), lit("\\d+"), lit(0)), 3)
        .cast("long").as("comment_id"))
      .collect().map(_.getLong(0)).toSet
    val got = out.filter(col("comment_id").isin(ids.toSeq: _*))
    assert(got.count() === ids.size)
    assert(got.filter(col("created_date").isNull).count() === 0)
  }

  test("comments: newest history entry wins (W2)") {
    val staged = Fixtures.comments(spark)
    val multi = staged.filter(size(col("history")) > 1).cache()
    assert(multi.count() > 0)
    val expect = multi.select(
      element_at(regexp_extract_all(col("`$ref`"), lit("\\d+"), lit(0)), 3)
        .cast("long").as("comment_id"),
      array_max(col("history.created")).as("newest"))
    val out = Shred.comments(staged)
      .join(expect, Seq("comment_id"))
      .withColumn("expected_date", Shred.denverTs(col("newest")))
    assert(out.filter(col("created_date") =!= col("expected_date")).count() === 0)
  }

  test("comments: non-alnum text dropped; section-level comments keep null question_id") {
    val out = Shred.comments(Fixtures.comments(spark)).cache()
    assert(out.filter(!col("text").rlike("(?s)^.*[\\p{Alnum}].*$")).count() === 0)
    assert(out.filter(col("question_id").isNull).count() > 0,
      "section-level comments (null question_id) must survive")
  }
}
