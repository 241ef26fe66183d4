package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.engine.{Executor, JobStateLog}
import graft.model.{EngineConfig, Fixture}
import graft.ops.Decide

/** The event-driven maintenance pipeline (SURVEY.md §3.1), Spark-native:
  * the reference's push-based `MetricsReporter.report()` entry point
  * becomes a Structured Streaming source; the per-commit decision + dispatch
  * runs in `foreachBatch`, so each micro-batch filters commit events,
  * evaluates `should_optimize` over the accumulated log, and submits
  * maintenance jobs for triggered tables — the thread boundary moves from
  * "inline in the table write commit" to the micro-batch thread
  * (SURVEY.md §3.1), and the remote-engine network boundary becomes the
  * executor SPI.
  *
  * State lives in the snapshot log itself (like the reference, which
  * rescans `currentAncestors` per event) — no managed streaming state is
  * required; `foreachBatch` recomputes the windowed decision per batch.
  */
object EventPipeline {

  /** Streaming-source schema for the events table (ts is TIMESTAMP(NANOS)
    * in the fixture parquet; read as nanos Long via the legacy conf). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Snapshot-log derivation from a (batch or micro-batch) events frame —
    * same pure rule as EventOps.snapshotLog (FIXTURES.md §3). */
  def snapshotLogFrom(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin(Fixture.WriteOps: _*))
      .select(
        col("user_id").as("table_id"),
        col("event_id").as("snapshot_id"),
        expr("ts div 1000000").as("ts_ms"),
        when(col("event_type") === Fixture.ReplaceOp, lit("replace"))
          .otherwise(lit("append")).as("operation"))

  /** Open the events parquet as a file stream (the file-stream source needs
    * a directory, so glob-filter the events file inside the sf dir). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }

  /** Result of one pipeline run: final decisions + submitted job ids. */
  final case class RunResult(decisions: Seq[Row], submittedJobs: Seq[String])

  /** Run the full pipeline over all currently-available events
    * (Trigger.AvailableNow): stream → filter commits → decide → dispatch
    * an executor per triggered table. Returns the final batch's decisions
    * and the submitted job ids. */
  def runOnce(spark: SparkSession, dir: String, cfg: EngineConfig,
      executorFor: String => Executor): RunResult = {
    val decisions = scala.collection.mutable.ArrayBuffer.empty[Row]
    val submitted = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = readEventStream(spark, dir).writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = Decide.shouldOptimize(snapshotLogFrom(batch), cfg)
        val rows = d.collect()
        decisions.clear()
        decisions ++= rows
        rows.filter(_.getBoolean(4)).foreach { r =>
          val table = s"db.tbl_${r.getLong(0)}"
          val ex = executorFor(table)
          ex.initialize(table, Map.empty)
          submitted += ex.execute()
        }
        ()
      }
      .start()
    q.awaitTermination()
    RunResult(decisions.toSeq, submitted.toSeq)
  }

  /** Streaming decision query for the driver contract: same output (and
    * oracle) as the batch should_optimize, produced through the streaming
    * path. The single AvailableNow batch covers the whole fixture file. */
  def decisionsViaStream(spark: SparkSession, dir: String,
      cfg: EngineConfig): DataFrame = {
    val result = runOnce(spark, dir, cfg, _ => NoopExecutor)
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(result.decisions).asJava),
      StructType(Seq(
        StructField("table_id", LongType),
        StructField("n_commits_since_replace", LongType),
        StructField("oldest_pending_ts_ms", LongType),
        StructField("time_triggered", BooleanType),
        StructField("should_optimize", BooleanType))))
  }

  private object NoopExecutor extends Executor {
    override def initialize(table: String, properties: Map[String, String]): Unit = ()
    override def execute(): String = "noop"
  }

  /** Session-window analysis (extension): per-user activity sessions with
    * a fixed inactivity gap. Event times are truncated to millis before
    * sessionization so the SQL gaps-and-islands oracle (which works in
    * epoch millis) sees identical instants. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(expr("ts div 1000000")))
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"))

  /** Tumbling-window event metrics (extension, SURVEY.md §2.3 streaming):
    * per event-type counts and byte totals per window. Works on the batch
    * and streaming frame alike; with a stream, pair with a watermark on
    * `event_time` and an append/complete sink. */
  def windowedMetrics(events: DataFrame, windowLength: String): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("value_cents"))
}
