package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, TimeJoins}

/** The temporal-join rewrites (union+window as-of, bucketed range join)
  * checked against brute-force inequality-join formulations of the same
  * semantics — on top of the DuckDB-oracle gate, which checks them against
  * DuckDB's native ASOF/range joins. */
class TimeJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def events = EventOps.events(spark, dir)

  test("as-of join equals brute-force latest-prior-purchase per view") {
    val e = events.select("event_id", "user_id", "ts_ms", "event_type")
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_ms").as("p_ts"))
    // brute force: all (view, prior purchase) pairs, keep latest purchase
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("p_ts").desc, col("p_id").desc)
    val brute = v.join(p, Seq("user_id"))
      .filter(col("ts_ms") >= col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("p_id").as("purchase_event_id"), col("p_ts").as("purchase_ts_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = TimeJoins.asofViewToPurchase(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got.nonEmpty)
    assert(got === brute)
  }

  test("temporal-join plans avoid nested-loop joins") {
    val e = events.select("event_id", "user_id", "ts_ms", "event_type")
    // as-of: no join operator at all — one hash shuffle + window pass
    val asofPlan = TimeJoins.asofViewToPurchase(e)
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("BroadcastNestedLoopJoin") &&
      !asofPlan.contains("CartesianProduct"), asofPlan)
    assert(!asofPlan.contains("Join"),
      s"as-of rewrite must be join-free (window carry-forward):\n$asofPlan")
    // range join: the bucketed rewrite keeps an equi-join; Spark left with
    // the raw inequality predicate would pick a nested-loop join
    val rangePlan = TimeJoins.viewsBeforePurchase(e)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("BroadcastNestedLoopJoin") &&
      !rangePlan.contains("CartesianProduct"),
      s"range rewrite must stay an equi-join:\n$rangePlan")
  }

  test("range-count join equals brute-force window count, zeros included") {
    val e = events.select("event_id", "user_id", "ts_ms", "event_type")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ms").as("v_ts"))
    val brute = p.join(v, Seq("user_id"), "left")
      .groupBy(col("event_id"), col("user_id"), col("ts_ms"))
      .agg(count(when(
        col("v_ts") >= col("ts_ms") - 60000L && col("v_ts") < col("ts_ms"),
        lit(1))).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = TimeJoins.viewsBeforePurchase(e)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === brute)
    // every purchase appears exactly once, including zero-view ones
    assert(got.size === p.count())
    assert(got.exists(_._4 == 0L) || got.forall(_._4 > 0L))
  }
}
