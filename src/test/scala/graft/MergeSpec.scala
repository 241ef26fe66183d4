package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

/** MERGE INTO semantics over a hand-built base/change-set covering every
  * matched/unmatched × op combination. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("applyChangeSet: all six merge behaviors") {
    import spark.implicits._
    val base = Seq(
      (1L, 100L), // untouched
      (2L, 200L), // updated
      (3L, 300L), // deleted
      (4L, 400L), // matched insert -> kept as-is
      (5L, 500L)  // untouched
    ).toDF("k", "v")
    val changes = Seq(
      (2L, 999L, "U"),  // matched update
      (3L, 0L, "D"),    // matched delete
      (4L, -1L, "I"),   // matched insert: ignored
      (6L, 600L, "I"),  // unmatched insert
      (7L, -2L, "U"),   // unmatched update: ignored
      (8L, -3L, "D")    // unmatched delete: ignored
    ).toDF("k", "v", "op")
    val got = Merge.applyChangeSet(base, changes, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 100L, 2L -> 999L, 4L -> 400L,
      5L -> 500L, 6L -> 600L))
  }

  test("applyChangeSet with empty change-set is identity") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val none = Seq.empty[(Long, Long, String)].toDF("k", "v", "op")
    val got = Merge.applyChangeSet(base, none, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 10L, 2L -> 20L))
  }
}
