package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BucketedStore

/** Bucketed co-located join: same results, no per-query exchange. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    BucketedStore.writeBucketed(li, "li_b", "l_orderkey", 8)
    BucketedStore.writeBucketed(ord, "ord_b", "o_orderkey", 8)

    // force the fact⋈fact path (broadcast would hide the bucketing on
    // these tiny fixtures — the case bucketing exists for is both sides
    // too big to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.table(spark, "li_b")
        .join(BucketedStore.table(spark, "ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"no SMJ in:\n$plan")
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing unused in:\n$plan")

      // same result as the plain (shuffling) join
      val viaBuckets = joined.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
