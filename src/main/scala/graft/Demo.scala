package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Compact, Maintenance}
import graft.exts.{Dedup, Similarity, TextAnalysis}
import graft.model.{EngineConfig, SnapshotMeta}
import graft.ops.{Decide, EventOps}

/** End-to-end walkthrough of the engine on sf0.001: event ingestion →
  * decision → compaction loop closure → pipeline extensions. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val cfg = EngineConfig()

    println("== 1. Commit events -> snapshot log -> optimize decision")
    val decisions = Decide.shouldOptimize(EventOps.snapshotLog(spark, dir), cfg)
    val n = decisions.count()
    val nTrig = decisions.filter(col("should_optimize")).count()
    println(s"   $n tables evaluated, $nTrig trigger optimize " +
      s"(>=${cfg.commitThreshold} commits or >${cfg.timeThresholdMs / 3600000}h stale since last replace)")

    println("== 2. Maintenance loop: fragmented table -> compact -> quiesce")
    val in = Files.createTempDirectory("demo-in").toString
    spark.read.parquet(s"$dir/lineitem.parquet").repartition(24)
      .write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("demo-out").toString
    val now = Decide.NowMs
    val log = (1 to 12).map(i =>
      SnapshotMeta(1L, i.toLong, now - 5 * 3600000 + i, "append"))
    val c1 = Maintenance.cycle(spark, log,
      Map(1L -> Maintenance.TableDirs(in, out)), cfg)
    println(s"   cycle 1: triggered=${c1.triggered} jobs=${c1.jobIds} " +
      s"files ${Compact.listFiles(in).size} -> ${Compact.listFiles(out).size}")
    val c2 = Maintenance.cycle(spark, c1.log,
      Map(1L -> Maintenance.TableDirs(in, out)), cfg)
    println(s"   cycle 2: triggered=${c2.triggered} (replace commit quiesced)")

    println("== 3. Pipeline extensions on the documents/embeddings corpus")
    val dups = Dedup.exactDupGroups(Dedup.corpusWithExactDups(spark, dir)).count()
    val near = Dedup.ngramJaccardPairs(Dedup.corpusWithNearDups(spark, dir)).count()
    val embDups = Similarity.nearDupPairs(spark, dir).count()
    val langs = TextAnalysis.langId(spark, dir)
      .groupBy(col("predicted_lang")).count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    println(s"   exact dup groups=$dups, jaccard near-dup pairs=$near, " +
      s"embedding near-dups=$embDups")
    println(s"   language id distribution: $langs")
    val topk = Similarity.bruteTopK(spark, dir, maxQueryId = 2).collect()
      .map(r => s"q${r.getLong(0)}->n${r.getLong(1)}#${r.getInt(2)}")
      .mkString(" ")
    println(s"   cosine top-5 for 2 queries: $topk")
    spark.stop()
  }
}
