package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Advanced aggregation coverage: multi-level aggregates (ROLLUP /
  * GROUPING SETS with grouping ids — one Expand + one hash agg, no extra
  * shuffles), plus approximate sketches (HLL distinct, approximate
  * quantiles) registered rows-only since sketch internals are
  * engine-specific (accuracy is asserted against exact values in
  * ScalaTest). */
object AdvancedQueries {

  val pack: QueryPack = QueryPack(
    queries = Map(
      // ROLLUP over (year, month): per-month, per-year, grand total.
      "rollup_agg" -> ((s, dir) =>
        Tables.load(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
          .withColumn("o_month", month(col("o_orderdate")))
          .rollup(col("o_year"), col("o_month"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .as("total_cents"),
            grouping_id().as("gid"))),

      // GROUPING SETS via the SQL surface (engine exposes spark.sql too).
      "grouping_sets_agg" -> ((s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  count(*) AS n_items,
            |  sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
            |  CAST(grouping_id() AS BIGINT) AS gid
            |FROM lineitem_v
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |""".stripMargin)
      }),

      // Approximate sketches: HLL++ distinct + approximate quantiles.
      // Rows-only (sketches are engine-specific); accuracy tested in
      // AdvancedSpec against exact values.
      "agg_approx_sketches" -> ((s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            approx_count_distinct(col("o_custkey")).as("approx_customers"),
            percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
              .as("approx_median_price"))) ),

    oracles = Map(
      "rollup_agg" ->
        """WITH t AS (
          |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          |         CAST(month(o_orderdate) AS INTEGER) AS o_month,
          |         o_totalprice
          |  FROM orders)
          |SELECT o_year, o_month,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |    AS total_cents,
          |  CAST(GROUPING(o_year, o_month) AS BIGINT) AS gid
          |FROM t GROUP BY ROLLUP (o_year, o_month)""".stripMargin,

      "grouping_sets_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  count(*) AS n_items,
          |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin))
}
