package graft.sources.dsv2

import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The row-level DML group bookkeeping (the r13 `snapshot_sql_dml`
  * flake): Spark plans the operation's scan several times per command
  * — measured 3 calls / 2 threads (an unfiltered pass for
  * partitioning/metrics on `main`, the post-runtime-group-filter pass
  * on an AQE stage thread) — with no happens-before between the
  * passes' writes. Last-write-wins bookkeeping let a stale WIDE pass
  * land after the narrow one, making the commit replace groups the
  * write never rewrote (silent row loss). `recordPlanned` pins the
  * version and keeps only the narrowest planned set. */
class RowLevelPlanSpec extends AnyFunSuite {

  private def op() = new SnapshotRowLevelOperation("/tmp/rlp", Command.DELETE,
    () => StructType(Seq(StructField("id", LongType))))

  test("a stale wide planning pass can never widen the replaced group set") {
    val o = op()
    o.recordPlanned(7L, Set("a", "b", "c")) // unfiltered pass
    o.recordPlanned(7L, Set("b"))           // post-runtime-filter pass
    assert(o.scannedFiles == Set("b"))
    // the r13 flake: the unfiltered pass's write lands LAST — it must
    // NOT widen the set back to {a,b,c}
    o.recordPlanned(7L, Set("a", "b", "c"))
    assert(o.scannedFiles == Set("b"),
      "a wide pass after the narrow one would commit-drop never-rewritten groups")
    assert(o.scannedVersion == 7L)
  }

  test("a different head version mid-command aborts loudly") {
    val o = op()
    o.recordPlanned(7L, Set("a", "b"))
    val boom = intercept[IllegalArgumentException] {
      o.recordPlanned(8L, Set("a"))
    }
    assert(boom.getMessage.contains("concurrent commit"))
  }

  test("incomparable planning passes abort rather than guess") {
    val o = op()
    o.recordPlanned(7L, Set("a", "b"))
    val boom = intercept[IllegalArgumentException] {
      o.recordPlanned(7L, Set("a", "c"))
    }
    assert(boom.getMessage.contains("incomparably"))
  }
}
