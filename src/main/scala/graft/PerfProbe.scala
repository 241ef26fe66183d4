package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.exts.Dedup

/** Throwaway perf probe for the dedup plans (not part of the engine). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpus = Dedup.corpusWithNearDups(spark, dir)
    time("corpus.count")(corpus.count())
    val sh = corpus.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
    time("shingles.count")(sh.count())
    time("shingles.count again")(sh.count())
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    time("inter.count")(inter.count())
    time("jaccard full")(Dedup.ngramJaccardPairs(corpus).count())

    val signed = Dedup.signatures(corpus)
    time("signatures.count")(signed.count())
    time("minhash full")(Dedup.minhashLshPairs(corpus).count())
    time("simhash full")(Dedup.simhashPairs(corpus).count())
    spark.stop()
  }
}
