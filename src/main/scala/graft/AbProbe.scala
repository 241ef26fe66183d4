package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B perf probe (diagnostic main, not part of the engine):
  * times DataFrame variants INTERLEAVED in one JVM and reports, per run,
  * wall seconds plus the SparkListener-summed task executor time and
  * shuffle bytes — the work-proportional metrics a noisy host window
  * can't fake. Used to adjudicate r18 plan restructures; variants are
  * registered inline below.
  *
  * Usage: runMain graft.AbProbe <variantA> <variantB> [reps=4]
  */
object AbProbe {
  @volatile private var taskTimeMs: Long = 0L
  @volatile private var shuffleRead: Long = 0L
  @volatile private var shuffleWrite: Long = 0L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length >= 3) args(2).toInt else 4

    def run(name: String, fn: (SparkSession, String) => DataFrame): Unit = {
      taskTimeMs = 0; shuffleRead = 0; shuffleWrite = 0
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(300)
      println(f"[ab] $name%-28s wall=$wall%7.2f s  task=${taskTimeMs / 1e3}%8.2f s" +
        f"  shufR=${shuffleRead / 1e6}%9.1f MB  shufW=${shuffleWrite / 1e6}%9.1f MB")
    }

    val a = variants(args(0))
    val b = variants(args(1))
    // warm both once (codegen/footers), then alternate
    run(s"${args(0)} warm", a); run(s"${args(1)} warm", b)
    (1 to reps).foreach { i =>
      run(s"${args(0)} #$i", a)
      run(s"${args(1)} #$i", b)
    }
    spark.stop()
  }

  /** Inline variant registry: current engine entries plus frozen copies
    * of pre-restructure shapes for A/B adjudication. */
  private def variants: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries ++ Map[String, (SparkSession, String) => DataFrame](
      "lm_old" -> ((s, dir) => lmScoresOld(Tables.load(s, dir, "documents"))),
      "rho_old" -> ((s, dir) => rhoSelectOld(Tables.load(s, dir, "documents")))
    )

  // ---- frozen r17 shapes (verbatim) ----

  private def words(text: org.apache.spark.sql.Column) =
    split(trim(text), "\\s+")

  private def bigramTf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (x, y) -> named_struct('w1', x, 'w2', y))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))

  private def lmScoresOld(docs: DataFrame): DataFrame = {
    val tf = bigramTf(docs)
    val bgc = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c_bg"))
    val ctx = bgc.groupBy(col("w1")).agg(sum(col("c_bg")).as("c_ctx"))
    tf.join(bgc, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .withColumn("ppm", expr("(c_bg * 1000000) div c_ctx"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("ppm")).as("ppm_mass"),
        sum(when(col("c_bg") === col("tf"), col("tf")).otherwise(0L))
          .as("novel_occ"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("ppm_mass div n_bigrams").as("lm_score_ppm"),
        expr("novel_occ * 1000 div n_bigrams").as("novel_frac_x1000"))
  }

  private def rhoSelectOld(docs: DataFrame): DataFrame = {
    val tfs = bigramTf(docs)
      .join(docs.select(col("doc_id"), col("source"))
        .hint("shuffle_hash"), Seq("doc_id"))
    val gbg = tfs.groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).as("g_bg"))
    val gctx = gbg.groupBy(col("w1")).agg(sum(col("g_bg")).as("g_ctx"))
    val sbg = tfs.groupBy(col("source"), col("w1"), col("w2"))
      .agg(sum(col("tf")).as("s_bg"))
    val sctx = sbg.groupBy(col("source"), col("w1"))
      .agg(sum(col("s_bg")).as("s_ctx"))
    tfs
      .join(gbg.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(gctx.hint("shuffle_hash"), Seq("w1"))
      .join(sbg.hint("shuffle_hash"), Seq("source", "w1", "w2"))
      .join(sctx.hint("shuffle_hash"), Seq("source", "w1"))
      .withColumn("g_ppm", expr("(g_bg * 1000000) div g_ctx"))
      .withColumn("s_ppm", expr("(s_bg * 1000000) div s_ctx"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("g_ppm")).as("gmass"),
        sum(col("tf") * col("s_ppm")).as("smass"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        expr("gmass div n_bigrams").as("global_ppm"),
        expr("smass div n_bigrams").as("source_ppm"))
      .withColumn("excess_ppm", col("source_ppm") - col("global_ppm"))
      .withColumn("keep", expr("CAST(CASE WHEN source_ppm * 1000 >" +
        s" global_ppm * ${graft.exts.TextAnalysis.RhoMarginPermille} THEN 1 ELSE 0 END AS BIGINT)"))
  }
}
