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
              .as("approx_median_price"))),

      // Pivot: one Expand-free hash agg with fixed pivot values (no extra
      // distinct-values job, no second shuffle).
      "pivot_status" -> ((s, dir) =>
        Tables.load(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
          .groupBy(col("o_year"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_year"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))),

      // CUBE over (status, priority): all four grouping combinations from
      // one Expand + one hash agg — same single-shuffle shape as rollup.
      "cube_agg" -> ((s, dir) =>
        Tables.load(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .as("total_cents"),
            grouping_id().as("gid"))),

      // Unpivot (wide → long): one Expand node, no shuffle at all — the
      // long form feeds generic per-metric pipelines downstream.
      "unpivot_metrics" -> ((s, dir) =>
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)")
              .as("total_cents"),
            col("o_custkey"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("total_cents"), col("o_custkey")),
            "metric", "value")),

      // Exact percentiles by COUNTING, not ranking: the value at rank
      // ⌈p·n⌉ of (cents, o_orderkey) is the smallest cents whose
      // cumulative frequency reaches ⌈p·n⌉ (the orderkey tie-break never
      // changes the VALUE at a rank), so a hash aggregate keyed by
      // (status, cents) — map-side combined, output bounded by the PRICE
      // DOMAIN, not the row count — replaces the previous per-status
      // ranking window over raw orders. o_orderstatus has 3 values: that
      // window funneled n/3 rows through each of 3 tasks for a full sort
      // — the bounded-partition shape PlanGuard now rejects. The
      // remaining windows run over the reduced frequency table only.
      "price_percentiles" -> ((s, dir) => {
        val byStatus = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderstatus"))
        val cumW = byStatus.orderBy(col("cents"))
        Tables.load(s, dir, "orders")
          .select(col("o_orderstatus"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .groupBy(col("o_orderstatus"), col("cents"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(cumW))
          .withColumn("cnt", sum(col("c")).over(byStatus))
          .groupBy(col("o_orderstatus"))
          .agg(
            min(when(col("cum") >= expr("(cnt + 1) div 2"), col("cents")))
              .as("p50_cents"),
            min(when(col("cum") >= expr("(9 * cnt + 9) div 10"), col("cents")))
              .as("p90_cents"),
            max(col("cnt")).as("n_orders"))
      })),

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

      "pivot_status" ->
        """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
          |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
          |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
          |FROM orders GROUP BY 1""".stripMargin,

      "cube_agg" ->
        """SELECT o_orderstatus, o_orderpriority,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |    AS total_cents,
          |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
          |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

      "unpivot_metrics" ->
        """SELECT o_orderkey, 'total_cents' AS metric,
          |  CAST(round(o_totalprice * 100) AS BIGINT) AS value
          |FROM orders
          |UNION ALL
          |SELECT o_orderkey, 'o_custkey' AS metric, o_custkey AS value
          |FROM orders""".stripMargin,

      "price_percentiles" ->
        """WITH c AS (
          |  SELECT o_orderstatus, o_orderkey,
          |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          |  FROM orders),
          |r AS (
          |  SELECT o_orderstatus, cents,
          |    CAST(row_number() OVER (PARTITION BY o_orderstatus
          |      ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
          |    CAST(count(*) OVER (PARTITION BY o_orderstatus) AS BIGINT)
          |      AS cnt
          |  FROM c)
          |SELECT o_orderstatus,
          |  max(CASE WHEN rn = (cnt + 1) // 2 THEN cents END) AS p50_cents,
          |  max(CASE WHEN rn = (9 * cnt + 9) // 10 THEN cents END)
          |    AS p90_cents,
          |  max(cnt) AS n_orders
          |FROM r GROUP BY 1""".stripMargin,

      "grouping_sets_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  count(*) AS n_items,
          |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin))
}
