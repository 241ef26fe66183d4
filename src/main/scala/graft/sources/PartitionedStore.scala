package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet table layout — the engine's at-scale storage
  * convention: a table is a directory tree partitioned by a low-cardinality
  * key (`key=value/` dirs), so scans with a partition predicate prune whole
  * directories before any file I/O (visible as PartitionFilters in the
  * scan node).
  *
  * This is the 100 TB answer to "where does the data live": the decision
  * and dedup operators shuffle by table/bucket ids; the storage partitions
  * by coarse time or tenant keys so maintenance (compaction per partition)
  * and reads (pruning) both stay bounded per partition.
  */
object PartitionedStore {

  /** Write a DataFrame partitioned by the given columns. */
  def write(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** Read a partitioned table back. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Events re-laid-out partitioned by event date: the natural layout for
    * the commit-event stream at scale (per-day pruning + per-day
    * compaction file groups). */
  def writeEventsByDay(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val ev = graft.ops.EventOps.events(spark, sfDir)
      .withColumn("event_date",
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd"))
    write(ev, outDir, Seq("event_date"))
  }
}
