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

  /** Corpus snapshot token for a table: a deterministic hash of the
    * file listing (relative path, length, mtime) under the table's
    * parquet directory. Artifact memos (Bloom sketch, IVF centroids,
    * BPE merges) fold this into their key so a table REWRITE under the
    * same path invalidates the memo instead of silently serving a stale
    * artifact — the snapshot-id role an Iceberg catalog would play,
    * derived here from the directory listing (one metadata-only pass;
    * the same listing a scan's file index performs). */
  def version(dir: String, name: String): Long = {
    val root = new java.io.File(s"$dir/$name.parquet")
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).iterator.flatMap(walk)
      else Iterator.single(f)
    if (!root.exists()) return 0L
    walk(root).foldLeft(17L) { (h, f) =>
      var x = h
      for (c <- f.getName) x = x * 31 + c
      (x * 31 + f.length()) * 31 + f.lastModified()
    }
  }
}
