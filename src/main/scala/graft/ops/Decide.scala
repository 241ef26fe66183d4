package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{EngineConfig, Fixture}

/** The optimize decision query (`shouldOptimizeDataFiles`,
  * AwsTableManagementMetricsEvaluator.java:108-140), restated as window +
  * aggregate over the snapshot log.
  *
  * Reference semantics (SURVEY.md §2.1 `should_optimize`): let S = ancestors
  * strictly newer than the newest REPLACE ancestor (all ancestors if none).
  * Optimize ⟺ |S| ≥ commitThreshold OR ∃ s∈S with now − s.ts ≥ timeThreshold.
  * The REPLACE snapshot itself is neither counted nor age-checked.
  *
  * Scale shape: everything below is one hash-shuffle by `table_id` followed
  * by per-partition window/aggregate work — at 100 TB of event history the
  * plan stays a single exchange, and partial aggregation (count/min/bool_or
  * are all map-side combinable) keeps the shuffle narrow.
  */
object Decide {

  /** Fixed "now" in epoch millis (FIXTURES.md §3: the reference's
    * `System.currentTimeMillis()` at :119 is parameterized out). */
  val NowMs: Long = java.time.Instant.parse("2024-01-31T00:00:00Z").toEpochMilli
  /** now − timeThreshold: a commit at or before this instant is stale. */
  def staleCutoffMs(cfg: EngineConfig): Long = NowMs - cfg.timeThresholdMs

  private val byTable = Window.partitionBy(col("table_id"))

  /** optimize_cutoff (SURVEY.md §2.1): keep only commits strictly newer than
    * the table's newest REPLACE commit — the short-circuit at
    * AwsTableManagementMetricsEvaluator.java:114-117 as a window marker. */
  def optimizeCutoff(log: DataFrame): DataFrame = {
    val lastReplace =
      max(when(col("operation") === "replace", col("ts_ms"))).over(byTable)
    log.withColumn("last_replace_ts_ms", lastReplace)
      .filter(col("last_replace_ts_ms").isNull ||
        col("ts_ms") > col("last_replace_ts_ms"))
      .drop("last_replace_ts_ms")
  }

  /** time_threshold_pred (SURVEY.md §2.1): per-commit staleness predicate
    * `now − ts ≥ timeThreshold` (AwsTableManagementMetricsEvaluator.java:119-126). */
  def timeThresholdPred(log: DataFrame, cfg: EngineConfig): DataFrame =
    log.filter(col("ts_ms") <= lit(staleCutoffMs(cfg)))
      .withColumn("age_ms", lit(NowMs) - col("ts_ms"))

  /** commit_threshold_count (SURVEY.md §2.1): running count of qualifying
    * commits newest-first; `triggered` once the count reaches the threshold
    * (AwsTableManagementMetricsEvaluator.java:128-135). */
  def commitThresholdCount(postCutoff: DataFrame, cfg: EngineConfig): DataFrame = {
    val w = byTable.orderBy(col("ts_ms").desc, col("snapshot_id").desc)
    postCutoff
      .withColumn("commits_so_far", row_number().over(w))
      .withColumn("triggered", col("commits_so_far") >= cfg.commitThreshold)
  }

  /** should_optimize (SURVEY.md §2.1, the flagship): combined decision per
    * table. Tables whose newest commit is the REPLACE itself (empty S)
    * appear with n=0 / false, via the left join. */
  def shouldOptimize(log: DataFrame, cfg: EngineConfig): DataFrame = {
    val agg = optimizeCutoff(log).groupBy(col("table_id")).agg(
      count(lit(1)).as("n"),
      min(col("ts_ms")).as("oldest"),
      max((col("ts_ms") <= lit(staleCutoffMs(cfg))).cast("int")).as("stale"))
    log.select(col("table_id")).distinct()
      .join(agg, Seq("table_id"), "left")
      .select(
        col("table_id"),
        coalesce(col("n"), lit(0L)).as("n_commits_since_replace"),
        coalesce(col("oldest"), lit(-1L)).as("oldest_pending_ts_ms"),
        (coalesce(col("stale"), lit(0)) === 1).as("time_triggered"),
        (coalesce(col("n"), lit(0L)) >= cfg.commitThreshold ||
          coalesce(col("stale"), lit(0)) === 1).as("should_optimize"))
  }
}
