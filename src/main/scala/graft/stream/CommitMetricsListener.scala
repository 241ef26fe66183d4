package graft.stream

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Custom metrics over the streaming pipeline — the Spark-native
  * restatement of the reference's `MetricsReporter` registration
  * (README.md:33: the plugin is wired in by class name and receives a
  * report per table-write commit). Here the unit of work is the
  * micro-batch: a `StreamingQueryListener` observes every batch's progress
  * (rows ingested, processing duration, event-time watermark) and appends
  * it to an in-memory metrics log that is itself queryable as a DataFrame —
  * metrics about table maintenance are just another table. */
object CommitMetricsListener {
  final case class BatchMetric(
      queryId: String,
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double,
      durationMs: Long,
      timestamp: String)
}

final class CommitMetricsListener extends StreamingQueryListener {
  import CommitMetricsListener.BatchMetric

  private val metrics = new ConcurrentLinkedQueue[BatchMetric]()

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    metrics.add(BatchMetric(
      queryId = p.id.toString,
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      processedRowsPerSecond =
        if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
      durationMs =
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      timestamp = p.timestamp))
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def all: Seq[CommitMetricsListener.BatchMetric] =
    metrics.iterator().asScala.toSeq

  /** The captured metrics as a queryable DataFrame. */
  def asDataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    all.toDF()
  }
}
