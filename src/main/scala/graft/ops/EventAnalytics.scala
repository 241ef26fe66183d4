package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: ordered-step funnel
  * conversion and cohort retention — the two queries every event
  * warehouse runs hourly, expressed in the shapes that survive scale.
  *
  * Both reduce the event stream to user-cardinality intermediates as the
  * FIRST step (one filtered aggregate each), so every join that follows
  * is against a frame bounded by |users|, broadcast-eligible, and the
  * full event volume is scanned exactly once per stage with the filter
  * pushed into the scan. No windows over the whole stream, no
  * repartition of raw events.
  */
object EventAnalytics {

  /** Ordered funnel: users reaching view → click → purchase with strictly
    * increasing timestamps (the classic "did the click happen AFTER the
    * first view" funnel, not mere set membership). Stage N's frame is
    * user-cardinality, so each subsequent stage is one event-scan filter
    * joined against a broadcast of the previous stage. */
  def funnel(events: DataFrame): DataFrame = {
    val t1 = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t1"))
    val t2 = events.filter(col("event_type") === "click")
      .join(broadcast(t1), "user_id")
      .filter(col("ts_ms") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t2"))
    val t3 = events.filter(col("event_type") === "purchase")
      .join(broadcast(t2), "user_id")
      .filter(col("ts_ms") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t3"))
    Seq("1_view" -> t1, "2_click" -> t2, "3_purchase" -> t3)
      .map { case (stage, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), col("n_users"))
      }
      .reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by their first-activity UTC day,
    * counted per day-offset of later activity — the (cohort × offset)
    * retention matrix. The cohort frame is user-cardinality and
    * broadcast back onto the day-level activity. */
  def cohorts(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      expr("(ts_ms div 86400000) * 86400000").as("day_ms"))
    val c = e.groupBy(col("user_id")).agg(min(col("day_ms")).as("cohort_ms"))
    e.join(broadcast(c), "user_id")
      .select(col("cohort_ms"),
        expr("(day_ms - cohort_ms) div 86400000").as("day_offset"),
        col("user_id"))
      .groupBy(col("cohort_ms"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
