package graft.engine

import org.apache.spark.sql.SparkSession

import graft.model.{EngineConfig, SnapshotMeta}
import graft.ops.Decide

/** The full maintenance loop closed end-to-end (SURVEY.md §3.1 + §4.1):
  * evaluate the decision over the snapshot log, compact triggered tables,
  * and append a REPLACE commit per completed compaction — which is exactly
  * what the next decision cycle's `optimize_cutoff` treats as the new
  * baseline. The reference's recursion guard (stripping reporter props so
  * an optimize job can't re-trigger itself,
  * AwsTableManagementMetricsEvaluator.java:93-99) holds here structurally:
  * compaction emits `replace` commits, and replace commits are cutoffs,
  * never triggers.
  */
object Maintenance {

  /** Where a table's data lives (input) and where rewrites land. */
  final case class TableDirs(inputDir: String, outputDir: String)

  final case class CycleResult(
      triggered: Seq[Long],
      jobIds: Seq[String],
      log: Seq[SnapshotMeta])

  /** One decision+compaction cycle over an explicit snapshot log. */
  def cycle(spark: SparkSession, log: Seq[SnapshotMeta],
      tables: Map[Long, TableDirs], cfg: EngineConfig,
      nowMs: Long = Decide.NowMs): CycleResult = {
    import spark.implicits._
    val logDf = log.toDF("table_id", "snapshot_id", "ts_ms", "operation")
    val decisions = Decide.shouldOptimize(logDf, cfg).collect()
    val triggered = decisions.filter(_.getBoolean(4)).map(_.getLong(0)).toSeq
      .filter(tables.contains)
    val stateLog = new JobStateLog
    var nextSnapshotId = log.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val (jobIds, newCommits) = triggered.map { tableId =>
      val dirs = tables(tableId)
      val ex = new LocalSparkExecutor(spark, stateLog)
      ex.initialize(s"db.tbl_$tableId", Map(
        "optimize-data.synchronous-enabled" -> "true",
        "optimize-data.sleep-wait-ms" -> "20",
        "local.input-dir" -> dirs.inputDir,
        "local.output-dir" -> dirs.outputDir))
      val jobId = ex.execute()
      val commit = SnapshotMeta(tableId, nextSnapshotId, nowMs, "replace")
      nextSnapshotId += 1
      (jobId, commit)
    }.unzip
    CycleResult(triggered, jobIds, log ++ newCommits)
  }
}
