package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** File-level compaction planning (SURVEY.md §2.2 filegroup_planning,
  * small_file_metrics): the metadata queries behind the reference's
  * delegated `rewrite_data_files` — assign data files to ≤cap-sized rewrite
  * groups (partial-progress commit unit, AwsManageProperties.java:48-50) and
  * compute the small-file stats that motivate optimizing.
  *
  * Scale shape: file metadata is ~1 row per data file (100 TB at 128 MB
  * files ≈ 800 k rows), partitioned by table partition. The window cum-sum
  * runs per partition after a single hash shuffle; no global sort. A skewed
  * partition with millions of files would serialize in one task — at that
  * point pre-split by `file_seq div N` salt; not needed at current scale.
  */
object FilePlan {

  /** Reference default group cap: 10 GiB (AwsManageProperties.java:48-50). */
  val DefaultGroupCapBytes: Long = 10737418240L
  /** "Small file" cutoff for metrics: files under 100 MB want compaction. */
  val SmallFileBytes: Long = 100000000L

  /** Deterministic file-metadata fixture derived from `orders`
    * (FIXTURES.md §2): one "data file" per order, size ≈ 100 MB scale so the
    * 10 GiB default cap yields ~100-file groups. Mirrored in oracle SQL. */
  def fileRelation(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      col("o_orderstatus").as("part_key"),
      col("o_orderkey").as("file_seq"),
      concat(lit("f_"), col("o_orderkey")).as("path"),
      (floor(col("o_totalprice")) * 1000).as("size_bytes"))

  /** filegroup_planning: greedy-in-order accumulation into groups of ≤cap
    * bytes via per-partition running sum (SURVEY.md §2.2): group_id =
    * floor(cumulative_bytes / cap). */
  def filegroupPlanning(files: DataFrame,
      capBytes: Long = DefaultGroupCapBytes): DataFrame = {
    val w = Window.partitionBy(col("part_key")).orderBy(col("file_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(
      col("part_key"), col("path"), col("size_bytes"),
      floor(sum(col("size_bytes")).over(w).cast("double") / capBytes)
        .as("group_id"))
  }

  /** small_file_metrics: per-partition file-size stats (count/avg/min/max,
    * small-file count) — the signal that motivates optimize (README.md:3).
    * avg is floor-integer (`div`) so both engines stay in exact arithmetic. */
  def smallFileMetrics(files: DataFrame): DataFrame =
    files.groupBy(col("part_key")).agg(
      count(lit(1)).as("n_files"),
      sum(col("size_bytes")).as("total_bytes"),
      min(col("size_bytes")).as("min_bytes"),
      max(col("size_bytes")).as("max_bytes"),
      sum((col("size_bytes") < SmallFileBytes).cast("long")).as("n_small"))
      .withColumn("avg_bytes", expr("total_bytes div n_files"))
}
