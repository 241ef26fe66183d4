package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the event stream — as-of join and bounded
  * range join. Spark has no native ASOF/range join; the naive formulations
  * (inequality theta-join) degenerate to a broadcast-nested-loop or a
  * cartesian per key, which is unusable at 100 TB. Both operators here are
  * re-expressed as shuffle-bounded plans:
  *
  *  - as-of join: union the two sides tagged, one hash shuffle on the join
  *    key, one sort within partitions, one window pass carrying the latest
  *    right-side row forward (`last(..., ignoreNulls)`) — cost is
  *    O(n log n) per key group, no pairwise candidate blowup at all;
  *  - range join (count views in the minute before each purchase): time is
  *    bucketed at the window width, each left row is replicated to the two
  *    buckets its window can overlap, and the join becomes an equi-join on
  *    (key, bucket) with an exact range filter after — candidates per row
  *    are bounded by bucket occupancy, never the full key group.
  *
  * Both match a DuckDB oracle that uses the *native* formulation (ASOF
  * JOIN / inequality join), so the rewrite's semantics are independently
  * checked.
  */
object TimeJoins {

  /** as-of join: for each 'view' event, the most recent 'purchase' by the
    * same user at or before the view's timestamp (views with no prior
    * purchase are dropped — inner as-of). Equivalent to DuckDB
    * `v ASOF JOIN p ON v.user_id = p.user_id AND v.ts_ms >= p.ts_ms`.
    *
    * Input frame needs (event_id, user_id, ts_ms, event_type). At equal
    * timestamps the purchase sorts first (boolean `is_left` ascending), so
    * `ts >= ts` inclusion holds. Tie-break: among several purchases at the
    * same (user_id, ts_ms) the one with the LARGEST event_id wins (the
    * window is ordered by event_id ascending and `last` carries the final
    * one forward); the DuckDB oracle mirrors this by pre-aggregating
    * purchases to max(event_id) per (user_id, ts_ms), since a native ASOF
    * JOIN leaves the choice among equal-timestamp matches unspecified. */
  def asofViewToPurchase(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        (col("event_type") === "view").as("is_left"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val purchaseId = when(!col("is_left"), col("event_id"))
    val purchaseTs = when(!col("is_left"), col("ts_ms"))
    tagged
      .withColumn("purchase_event_id",
        last(purchaseId, ignoreNulls = true).over(w))
      .withColumn("purchase_ts_ms",
        last(purchaseTs, ignoreNulls = true).over(w))
      .filter(col("is_left") && col("purchase_event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("purchase_event_id"), col("purchase_ts_ms"))
  }

  /** Bounded range join: per purchase, how many views by the same user fell
    * in the window `[purchase_ts - windowMs, purchase_ts)`. Purchases with
    * no views in range are kept with a zero count.
    *
    * A view at `v_ts` can only land in the window of a purchase whose
    * bucket is `v_ts div W` or `v_ts div W + 1`, so each view is
    * replicated exactly twice and the join is a plain equi-join on
    * (user_id, bucket) — the 100 TB-safe shape for fixed-width range
    * predicates. */
  def viewsBeforePurchase(events: DataFrame,
      windowMs: Long = 60000L): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        (col("ts_ms") / windowMs).cast("long").as("bk"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ms").as("v_ts"))
      .withColumn("bk", explode(array(
        (col("v_ts") / windowMs).cast("long"),
        (col("v_ts") / windowMs).cast("long") + 1)))
    purchases.join(views, Seq("user_id", "bk"), "left")
      .groupBy(col("event_id"), col("user_id"), col("ts_ms"))
      .agg(count(when(
        col("v_ts") >= col("ts_ms") - windowMs && col("v_ts") < col("ts_ms"),
        lit(1))).as("n_views_before"))
  }
}
