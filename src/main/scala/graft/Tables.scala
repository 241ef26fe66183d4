package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table loading (the engine's `table_lookup`,
  * SURVEY.md §2.1 — reference resolves via Iceberg catalog at
  * AwsTableManagementMetricsEvaluator.java:72; here tables are partitioned
  * Parquet directories keyed by name).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The commit-event stream analog (FIXTURES.md §1). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
}
