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
      // same engine shape as Bench (see the rationale there)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
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
    val reps = if (args.length >= 3 && args(0) != "diff") args(2).toInt else 4

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

    if (args(0) == "diff") {
      // identity mode: exceptAll both ways between two variants
      val x = variants(args(1))(spark, dir)
      val y = variants(args(2))(spark, dir).select(x.columns.map(col): _*)
      val onlyX = x.exceptAll(y).count()
      val onlyY = y.exceptAll(x).count()
      println(s"[ab] diff ${args(1)} vs ${args(2)}: onlyA=$onlyX onlyB=$onlyY" +
        s" rowsA=${x.count()} rowsB=${y.count()}" +
        (if (onlyX == 0 && onlyY == 0) " IDENTICAL" else " MISMATCH"))
      if ((onlyX > 0 || onlyY > 0) && onlyX <= 20 && onlyY <= 20) {
        x.exceptAll(y).collect().foreach(r => println(s"[ab]  onlyA: $r"))
        y.exceptAll(x).collect().foreach(r => println(s"[ab]  onlyB: $r"))
      }
      spark.stop(); return
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
      "rho_old" -> ((s, dir) => rhoSelectOld(Tables.load(s, dir, "documents"))),
      "rho_r18" -> ((s, dir) => rhoSelectR18(Tables.load(s, dir, "documents"))),
      "bpe_nockpt" -> ((s, dir) =>
        bpeTrainNoCkpt(Tables.load(s, dir, "documents"))),
      "bpe_r18" -> ((s, dir) =>
        bpeTrainR18(Tables.load(s, dir, "documents"))),
      "mmr_spark_old" -> ((s, dir) =>
        mmrSparkOld(Tables.load(s, dir, "embeddings"))),
      "ensemble_ckpt" -> ((s, dir) => ensembleCkpt(s, dir)),
      "q21_preagg" -> ((s, dir) => q21PreAgg(s, dir)),
      "funnel_one" -> ((s, dir) => funnelOnePass(
        graft.exts.Dedup.corpusWithExactDups(s, dir))),
      "mm_near_seq" -> ((s, dir) => mmNearSeq(s, dir)),
      "overlap_ckpt" -> ((s, dir) => {
        val base = Tables.load(s, dir, "documents")
          .select(col("source"), col("text"))
        sourceOverlapCkpt(base.unionByName(
          Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 7 === 0)
            .select(lit("src_wire").as("source"), col("text"))))
      })
    )

  /** curationFunnel in ONE qualitySignals pass: all three stages derive
    * from a per-content-hash pre-aggregate (same values: raw = Σ n_all,
    * kept = Σ n_kept, deduped = hashes with a kept row / Σ per-hash min
    * kept tokens). */
  private def funnelOnePass(docs: DataFrame): DataFrame = {
    val sig = graft.exts.TextAnalysis.qualitySignals(docs)
      .select(col("text"),
        col("n_tokens").cast("long").as("n_tokens"), col("keep"))
    val byH = sig.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_all"),
        sum(col("n_tokens")).as("tok_all"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tokens"))).as("tok_kept"),
        min(when(col("keep"), col("n_tokens"))).as("min_kept_tok"))
    byH.agg(
        sum(col("n_all")).as("raw_docs"),
        sum(col("tok_all")).as("raw_toks"),
        sum(col("n_kept")).as("kept_docs"),
        sum(col("tok_kept")).as("kept_toks"),
        sum(when(col("n_kept") > 0L, 1L).otherwise(0L)).as("ded_docs"),
        sum(when(col("n_kept") > 0L, col("min_kept_tok"))).as("ded_toks"))
      .select(expr(
        "stack(3," +
          " '1_raw', raw_docs, raw_toks," +
          " '2_quality_kept', kept_docs, kept_toks," +
          " '3_deduped', ded_docs, ded_toks)" +
          " AS (stage, n_docs, n_tokens)"))
  }

  /** q21 with the two countDistincts replaced by a (orderkey, suppkey)
    * pre-aggregation — removes the Expand×3 multi-distinct plan; values
    * identical (per-supplier late flags then exact counts). */
  private def q21PreAgg(s: SparkSession, dir: String): DataFrame = {
    def cents(c: String) =
      round(col(c).cast("double") * 100).cast("long")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(late, 1L).otherwise(0L)).as("has_late"),
        sum(when(late, 1L).otherwise(0L)).as("n_late"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nsupp"),
        sum(col("has_late")).as("nlate_supp"),
        min(when(col("has_late") === 1L, col("l_suppkey")))
          .as("late_supp"),
        sum(col("n_late")).as("n_late_items"))
      .filter(col("nsupp") > 1 && col("nlate_supp") === 1)
    val sup = Tables.load(s, dir, "supplier")
      .select("s_suppkey", "s_name")
    perOrder.groupBy(col("late_supp"))
      .agg(sum(col("n_late_items")).as("numwait"))
      .join(broadcast(sup), col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** ensemblePairs→dupComponents with the capped shingle frame
    * materialized once (eager) — re-adjudicating the r9 "wash" verdict
    * with the task-time instrument. */
  private def ensembleCkpt(s: SparkSession, dir: String): DataFrame = {
    val corpus = graft.exts.Dedup.corpusWithMixedDups(s, dir)
    val sh = graft.exts.Dedup
      .cappedShingles(corpus, graft.exts.Dedup.DefaultMaxShingleDf)
      .localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")),
        "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")),
        "b_id")
      .filter(col("inter") * 3 >= col("n_a") + col("n_b") ||
        col("inter") * 10 >= least(col("n_a"), col("n_b")) * 9)
      .select(col("a_id"), col("b_id"))
    graft.exts.Dedup.dupComponents(pairs)
  }

  /** sourceOverlap with the kept (source, shingle-hash) frame
    * materialized once (eager) — A/B against the recompute baseline. */
  private def sourceOverlapCkpt(docs: DataFrame,
      maxSourceDf: Int = graft.exts.Dedup.DefaultMaxShingleDf): DataFrame = {
    val sh0 = docs
      .select(col("source"),
        explode(graft.functions.Signatures.shingle_set(col("text"))).as("s"))
      .select(col("source"), xxhash64(col("s")).as("sh"))
      .distinct()
    val hot = sh0.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxSourceDf)
      .select(col("sh"))
    val sh = sh0.join(hot, Seq("sh"), "left_anti").localCheckpoint(true)
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_sh").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_sh").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        expr("n_shared * 1000 div least(n_a, n_b)")
          .as("containment_x1000"))
  }

  /** mmCaptionPairsNear with the SEQUENTIAL construction (decode
    * checkpoint strictly before the caption near tier — the pre-r19
    * shape) for the overlap A/B. */
  private def mmNearSeq(spark: SparkSession, dir: String): DataFrame = {
    import graft.exts.{Ckpt, Multimodal}
    val sig = Ckpt.eager(
      Multimodal.ahashStats(Multimodal.pngAssetsWithDups(spark, dir)).toDF())
    val keys = Seq("width", "height", "gray_sum", "ahash")
    val igrp = sig.join(
        sig.groupBy(keys.map(col): _*)
          .agg(min(col("doc_id")).as("img_gid")).hint("shuffle_hash"),
        keys)
      .select(col("doc_id"), col("img_gid"))
    val cgrp = Multimodal.captionNearGroups(
      Multimodal.captionsNear(spark, dir))
    val grouped = Ckpt.eager(
      igrp.join(cgrp.hint("shuffle_hash"), Seq("doc_id")))
    val pairs = grouped.filter(col("doc_id") =!= col("img_gid"))
      .select(least(col("doc_id"), col("img_gid")).as("a_id"),
        greatest(col("doc_id"), col("img_gid")).as("b_id"))
      .unionByName(grouped.filter(col("doc_id") =!= col("cap_gid"))
        .select(least(col("doc_id"), col("cap_gid")).as("a_id"),
          greatest(col("doc_id"), col("cap_gid")).as("b_id")))
      .distinct()
    val aSide = grouped.select(col("doc_id").as("a_id"),
      col("img_gid").as("a_ig"), col("m_gid").as("a_mg"),
      col("cap_gid").as("a_cg"))
    val bSide = grouped.select(col("doc_id").as("b_id"),
      col("img_gid").as("b_ig"), col("m_gid").as("b_mg"),
      col("cap_gid").as("b_cg"))
    pairs.join(aSide.hint("shuffle_hash"), Seq("a_id"))
      .join(bSide.hint("shuffle_hash"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("a_ig") === col("b_ig")).cast("long").as("img_dup"),
        (col("a_mg") === col("b_mg")).cast("long").as("cap_dup"),
        (col("a_cg") === col("b_cg")).cast("long").as("cap_dup_near"),
        when(col("a_ig") === col("b_ig") && col("a_cg") === col("b_cg"),
            lit("both"))
          .when(col("a_ig") === col("b_ig"), lit("img_only"))
          .otherwise(lit("cap_only")).as("cell"))
  }

  /** The r18 bpeTrain (verbatim): per-round lazy 1-row checkpoint of
    * the winning rule consumed via crossJoin(broadcast(...)) — frozen
    * for the r19 A/B and diff against the driver-collected rule loop. */
  private def bpeTrainR18(docs: DataFrame,
      rounds: Int = graft.exts.TextAnalysis.BpeRounds): DataFrame = {
    var enc = docs.select(
      concat(lit(" "), concat_ws("  ", words2(col("text"))), lit(" "))
        .as("enc"))
    var rules = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val best = enc
        .select(words2(col("enc")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1)," +
            " i -> struct(element_at(w, i) AS pa," +
            "             element_at(w, i + 1) AS pb))")).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(1)
        .select(lit(r).as("round"), col("pa"), col("pb"),
          concat(col("pa"), lit("_"), col("pb")).as("merged"), col("cnt"))
        .localCheckpoint(false)
      rules = rules :+ best
      if (r < rounds) {
        enc = enc.crossJoin(broadcast(best.select(col("pa"), col("pb"),
            col("merged"))))
          .select(expr(
            "replace(enc, ' ' || pa || '  ' || pb || ' '," +
              " ' ' || merged || ' ')").as("enc"))
          .localCheckpoint(false)
      }
    }
    rules.reduce(_ unionByName _)
  }

  /** bpeTrain with the per-round corpus checkpoint REMOVED: round r's
    * pair count replays rounds 1..r-1's literal replaces from the scan
    * (Σr replace evaluations) instead of caching the rewritten corpus
    * per round. */
  private def bpeTrainNoCkpt(docs: DataFrame,
      rounds: Int = graft.exts.TextAnalysis.BpeRounds): DataFrame = {
    var enc = docs.select(
      concat(lit(" "), concat_ws("  ", words2(col("text"))), lit(" "))
        .as("enc"))
    var rules = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val best = enc
        .select(words2(col("enc")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1)," +
            " i -> struct(element_at(w, i) AS pa," +
            "             element_at(w, i + 1) AS pb))")).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(1)
        .select(lit(r).as("round"), col("pa"), col("pb"),
          concat(col("pa"), lit("_"), col("pb")).as("merged"), col("cnt"))
        .localCheckpoint(false)
      rules = rules :+ best
      if (r < rounds) {
        enc = enc.crossJoin(broadcast(best.select(col("pa"), col("pb"),
            col("merged"))))
          .select(expr(
            "replace(enc, ' ' || pa || '  ' || pb || ' '," +
              " ' ' || merged || ' ')").as("enc"))
      }
    }
    rules.reduce(_ unionByName _)
  }

  private def words2(text: org.apache.spark.sql.Column) =
    split(trim(text), "\\s+")

  /** The pre-r18 mmrSelect: MmrK−1 greedy rounds as Spark jobs
    * (broadcast + join + two aggregates per round) over the bounded
    * candidate frame — kept frozen so the driver-greedy equivalence
    * diff (`runMain graft.AbProbe diff mmr_select mmr_spark_old`)
    * stays reproducible. */
  private def mmrSparkOld(corpus0: DataFrame,
      maxQueryId: Long = 8): DataFrame = {
    import graft.exts.Similarity.{MmrCand, MmrK}
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, x => round(x.cast("double") *
        lit(graft.exts.Similarity.ProtoQ)).cast("long"))
    def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val cds = graft.exts.Similarity.bruteTopK(corpus0, maxQueryId, MmrCand)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val qside = corpus0
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
      .join(broadcast(cds), "query_id")
    val cand = corpus0
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("en"))
      .join(broadcast(qside), "neighbor_id")
      .withColumn("qq", quant(col("eq")))
      .withColumn("qn", quant(col("en")))
      .withColumn("rel", sq(col("qq"), col("qn")))
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("qn"), col("rel"))
      .localCheckpoint(false)
    var sel = cand.filter(col("rank") === 1)
      .select(col("query_id"), lit(1L).as("mmr_rank"),
        col("neighbor_id"), col("qn"))
    (2 to MmrK).foreach { r =>
      val scored = cand
        .join(broadcast(sel.select(col("query_id"),
            col("neighbor_id").as("sel_id"), col("qn").as("qs"))),
          Seq("query_id"))
        .filter(col("neighbor_id") =!= col("sel_id"))
        .withColumn("dv", sq(col("qn"), col("qs")))
        .groupBy(col("query_id"), col("neighbor_id"), col("rel"),
          col("qn"))
        .agg(min(col("dv")).as("divmin"),
          count(lit(1)).as("n_against"))
        .filter(col("n_against") === (r - 1).toLong)
      val pick = scored.groupBy(col("query_id"))
        .agg(max(struct((col("divmin") - col("rel")).as("sc"),
          (-col("neighbor_id")).as("n"), col("qn").as("q"))).as("m"))
        .select(col("query_id"), lit(r.toLong).as("mmr_rank"),
          (-col("m.n")).as("neighbor_id"), col("m.q").as("qn"))
      sel = sel.unionByName(pick)
    }
    sel
      .join(broadcast(cand.select(col("query_id"), col("neighbor_id"),
          col("rel"))),
        Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("mmr_rank"), col("rel").as("rel_dist_sq"))
  }

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

  /** The r18 rhoSelect (model-first, but source attached by a corpus-
    * scale join and the global counts aggregated from tfs directly) —
    * frozen for the r19 A/B and diff. */
  private def rhoSelectR18(docs: DataFrame): DataFrame = {
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
    val model = sbg
      .join(gbg.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(gctx.hint("shuffle_hash"), Seq("w1"))
      .join(sctx.hint("shuffle_hash"), Seq("source", "w1"))
      .withColumn("g_ppm", expr("(g_bg * 1000000) div g_ctx"))
      .withColumn("s_ppm", expr("(s_bg * 1000000) div s_ctx"))
      .select(col("source"), col("w1"), col("w2"),
        col("g_ppm"), col("s_ppm"))
    tfs
      .join(model.hint("shuffle_hash"), Seq("source", "w1", "w2"))
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
