package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.model.EngineConfig
import graft.ops.Decide

/** Decision-table tests for should_optimize edge semantics (SURVEY.md §7.4):
  * the REPLACE snapshot is excluded from both count and age check, and
  * pre-REPLACE staleness must not trigger. */
class DecideSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = EngineConfig() // thresholds: 10 commits / 3 h
  private val now = Decide.NowMs
  private val hour = 3600000L

  /** log rows: (tableId, snapshotId, tsOffsetHoursBeforeNow, operation) */
  private def log(rows: (Long, Long, Double, String)*): DataFrame =
    rows.map { case (t, s, h, op) => (t, s, now - (h * hour).toLong, op) }
      .toDF("table_id", "snapshot_id", "ts_ms", "operation")

  private def decide(df: DataFrame): Map[Long, (Long, Boolean, Boolean)] =
    Decide.shouldOptimize(df, cfg).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getBoolean(3), r.getBoolean(4)))
    }.toMap

  test("snapshotDiff: replace removes prior state, appends add, t==t keeps") {
    import graft.ops.EventOps
    // table 1: a1,a2 before cutoff, then REPLACE r + append a3 after —
    // diff(cutoff, now) = removed {a1,a2}, added {r,a3}, kept {}
    // table 2: appends only, one before, one after — kept 1, added 1
    val l = log(
      (1L, 11L, 5.0, "append"), (1L, 12L, 4.5, "append"),
      (1L, 13L, 1.0, "replace"), (1L, 14L, 0.5, "append"),
      (2L, 21L, 5.0, "append"), (2L, 22L, 0.5, "append"))
    val cutoff = now - 3 * hour
    val d = EventOps.snapshotDiff(l, cutoff, Long.MaxValue).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(d(1L) === ((2L, 2L, 0L)))  // added r+a3, removed a1+a2
    assert(d(2L) === ((1L, 0L, 1L)))
    // identical endpoints: nothing added or removed, everything kept
    val same = EventOps.snapshotDiff(l, Long.MaxValue, Long.MaxValue)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(same === Set((0L, 0L)))
  }

  test("snapshotDiff invariants on random logs: kept+removed=|s1|, " +
      "kept+added=|s2|, forward diff never removes without a replace") {
    import graft.ops.EventOps
    val rnd = new scala.util.Random(42)
    val rows = for {
      t <- 1L to 12L
      s <- 1 to 15
    } yield (t, t * 100 + s, rnd.nextDouble() * 6.0,
      if (rnd.nextInt(5) == 0) "replace" else "append")
    val l = log(rows: _*)
    val cutoff = now - 3 * hour
    // reference states computed independently (driver-side, tiny)
    def stateAt(tMs: Long): Set[(Long, Long)] = {
      val byTable = rows.groupBy(_._1).toSeq
      byTable.flatMap { case (t, rs) =>
        val visible = rs.map { case (_, s, h, op) =>
          (s, now - (h * hour).toLong, op)
        }.filter(_._2 <= tMs)
        val lastReplace = visible.filter(_._3 == "replace")
          .map(_._2).maxOption
        visible.filter(v => lastReplace.forall(v._2 >= _))
          .map(v => (t, v._1))
      }.toSet
    }
    val s1 = stateAt(cutoff)
    val s2 = stateAt(Long.MaxValue)
    val d = EventOps.snapshotDiff(l, cutoff, Long.MaxValue).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    d.foreach { case (t, (added, removed, kept)) =>
      assert(kept + removed === s1.count(_._1 == t).toLong, s"table $t s1")
      assert(kept + added === s2.count(_._1 == t).toLong, s"table $t s2")
      assert(added === s2.count(p => p._1 == t && !s1(p)).toLong)
      assert(removed === s1.count(p => p._1 == t && !s2(p)).toLong)
    }
    assert(d.keySet === (s1.map(_._1) ++ s2.map(_._1)))
  }

  test("newest commit is the REPLACE itself: empty S, never optimize") {
    val d = decide(log((1L, 10L, 1.0, "replace"), (1L, 9L, 5.0, "append")))
    assert(d(1L) === ((0L, false, false)))
  }

  test("exactly commitThreshold fresh commits after replace triggers") {
    val appends = (1 to 10).map(i => (1L, 100L + i, 0.01 * i, "append"))
    val d = decide(log(appends :+ ((1L, 50L, 2.0, "replace")): _*))
    assert(d(1L)._1 === 10L)
    assert(d(1L)._3 === true)
    assert(d(1L)._2 === false) // all fresh, no time trigger
  }

  test("threshold-1 fresh commits does not trigger") {
    val appends = (1 to 9).map(i => (1L, 100L + i, 0.01 * i, "append"))
    val d = decide(log(appends :+ ((1L, 50L, 2.0, "replace")): _*))
    assert(d(1L) === ((9L, false, false)))
  }

  test("a single stale post-replace commit triggers via time threshold") {
    val d = decide(log(
      (1L, 100L, 4.0, "append"), // 4 h old ≥ 3 h threshold
      (1L, 50L, 5.0, "replace")))
    assert(d(1L) === ((1L, true, true)))
  }

  test("staleness before the replace cutoff must NOT trigger") {
    val d = decide(log(
      (1L, 100L, 0.5, "append"), // fresh, after replace
      (1L, 50L, 1.0, "replace"),
      (1L, 10L, 100.0, "append"))) // very stale but pre-replace
    assert(d(1L) === ((1L, false, false)))
  }

  test("no replace at all: all commits count") {
    val appends = (1 to 10).map(i => (1L, 100L + i, 0.01 * i, "append"))
    val d = decide(log(appends: _*))
    assert(d(1L)._1 === 10L && d(1L)._3 === true)
  }

  test("age exactly at threshold triggers (>= semantics)") {
    val d = decide(log((1L, 100L, 3.0, "append")))
    assert(d(1L)._2 === true)
  }

  test("tables are independent") {
    val t1 = (1 to 10).map(i => (1L, 100L + i, 0.01 * i, "append"))
    val t2 = Seq((2L, 200L, 0.5, "append"))
    val d = decide(log(t1 ++ t2: _*))
    assert(d(1L)._3 === true)
    assert(d(2L)._3 === false)
  }

  test("monotonicity: adding a post-replace commit never flips true→false") {
    val base = Seq((1L, 50L, 2.0, "replace")) ++
      (1 to 10).map(i => (1L, 100L + i, 0.01 * i, "append"))
    val before = decide(log(base: _*))(1L)._3
    val after = decide(log(base :+ ((1L, 200L, 0.005, "append")): _*))(1L)._3
    assert(!before || after)
  }
}
