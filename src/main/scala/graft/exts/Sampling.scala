package graft.exts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset-curation operators for training-data assembly (north star
  * extension): deterministic sampling, train/valid/test splitting, class
  * re-balancing, and distribution histograms.
  *
  * Sampling and splitting hash the *stable document id*, never `rand()`:
  * the assignment is reproducible run-to-run, independent of partitioning
  * and row order, and a document keeps its split forever (no train/test
  * leakage when the corpus is re-processed incrementally). All pure
  * per-row projections or single hash aggregates — no extra shuffles
  * beyond the final groupBy at any corpus size.
  */
object Sampling {

  /** Modulus the id is reduced by BEFORE the Knuth multiplier: with
    * id % 10⁹+7 < 2³⁰, the product stays under 2⁶³ for ANY id, where the
    * raw `id * 2654435761` wraps negative past id ≈ 3.5·10⁹ — below the
    * ids a 10¹¹-document corpus implies — yielding negative shard ids and
    * a sample gate that keeps everything. For id < 10⁹+7 (every fixture)
    * the reduction is the identity, so values are unchanged; the DuckDB
    * oracles carry the same reduction and stay bit-identical (DuckDB
    * would raise on the overflow rather than wrap, so without the
    * reduction the two engines diverge exactly at scale). */
  val HashMod = 1000000007L

  /** Overflow-safe multiplicative-hash product shared by every sampling /
    * splitting / sharding gate below (non-negative for ids ≥ 0). */
  private[graft] def mixed(id: Column): Column = (id % HashMod) * 2654435761L

  /** Knuth multiplicative-hash bucket in [0, 100): deterministic,
    * order-independent, overflow-safe, integer-exact on both engines. */
  def hashBucket(id: Column): Column = mixed(id) % 100

  /** Deterministic ~pct% sample of documents. Uniform ids hit each
    * language stratum at the same rate, so strata are preserved without a
    * per-group pass. */
  def sampleDocs(spark: SparkSession, dir: String, pct: Int = 10): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < pct)
      .select(col("doc_id"), col("lang"), col("bucket"))

  /** Quality-weighted deterministic sampling (the DCLM/FineWeb-style
    * "sample in proportion to quality" pass): each document's keep
    * probability rises with its stopword-fluency signal —
    * `p_x1000 = min(1000, 200 + 4·stopword_ratio_x1000)`, a 20% floor so
    * no stratum is wiped out, saturating at keep-everything for fluent
    * text. The coin flip is the same multiplicative id-hash as
    * [[sampleDocs]] at ‰ granularity, so the decision is reproducible
    * row-local arithmetic: no RNG state, no global pass, order-independent
    * and integer-exact on any engine. The stopword signal takes the MAX
    * across all language markers (the [[TextAnalysis.LangMarkers]]
    * multilingual convention), so non-English fluency is not penalized.
    * One codegen'd projection + filter — shuffle-free at any corpus
    * size. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val markers = graft.exts.TextAnalysis.LangMarkers.map {
      case (_, p) => regexp_count(col("text"), lit(p))
    }
    Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("n_stop", greatest(markers: _*))
      .withColumn("stop_x1000",
        expr("(n_stop * 1000) div greatest(n_tokens, 1)"))
      .withColumn("p_x1000",
        least(lit(1000L), lit(200L) + col("stop_x1000") * 4))
      .withColumn("bucket", mixed(col("doc_id")) % 1000)
      .filter(col("bucket") < col("p_x1000"))
      .select(col("doc_id"), col("lang"), col("p_x1000"), col("bucket"))
  }

  /** Stable 80/10/10 train/valid/test assignment, reported as per-language
    * split sizes (the aggregate a pipeline monitors for balance drift). */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("bucket", hashBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))

  /** Inverse-frequency class weights per language: weight_x1000 =
    * (largest class size × 1000) div class size — the up-weighting factor
    * an imbalanced-class sampler applies. Integer-exact. */
  def classBalanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val maxN = counts.agg(max(col("n_docs")).as("max_n"))
    counts.crossJoin(broadcast(maxN))
      .select(col("lang"), col("n_docs"),
        expr("(max_n * 1000) div n_docs").as("weight_x1000"))
  }

  /** Stratified sample: exactly `perClass` documents per language (fewer
    * only if the stratum is smaller), chosen by a deterministic
    * content-keyed ranking — row_number over (md5(text), doc_id) within
    * each language. Unlike [[sampleDocs]]'s uniform hash (which preserves
    * strata *proportions*), this equalizes strata absolutely — the
    * balanced-evaluation-set draw. One ranking window per stratum; the
    * shuffle is by `lang`, so skewed strata are the scale hazard — at
    * 100 TB, pre-filter with a per-lang uniform hash gate (keep ~2×
    * perClass survivors) so the window input per stratum is bounded. */
  def stratifiedSample(spark: SparkSession, dir: String,
      perClass: Int = 40): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("text")), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perClass)
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  /** Default target mixture (×1000 shares) for [[mixSources]]: the
    * "half English" recipe common to multilingual pretraining mixes. */
  val DefaultMixWeights: Seq[(String, Long)] =
    Seq("en" -> 500L, "es" -> 250L, "de" -> 125L, "fr" -> 125L)

  /** Source-mixture planning + execution: given target token *shares* per
    * source (language), compute the per-source sampling rate that realizes
    * the mixture at the largest feasible scale — no source is upsampled,
    * so `scale = min over sources of tokens(s)·1000 div weight(s)` and
    * `rate_x1000(s) = weight(s)·scale div (tokens(s)·1000)`, capped at
    * 1000. Documents are then kept by the same deterministic id hash as
    * [[sampleDocs]] (mod 1000 for rate resolution), and the realized
    * per-source doc/token counts are reported next to the plan.
    *
    * Scale shape: one stats pass (hash aggregate, map-side combined), a
    * 4-row broadcast of the rates, one filter pass — the corpus is never
    * shuffled. Everything integer, so the plan is engine-exact. */
  def mixSources(docs: DataFrame,
      weights: Seq[(String, Long)] = DefaultMixWeights): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toDF("lang", "w")
    val toks = docs.select(col("doc_id"), col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val stats = toks.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("t"))
      .join(broadcast(wdf), "lang")
    // scale = global min over the (sources-sized) aggregate — a window
    // over the whole tiny frame, NOT a second aggregate + cross join,
    // which would plan the corpus stats subtree twice.
    val rates = stats
      .withColumn("scale", min(expr("t * 1000 div w"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("rate_x1000", least(lit(1000L), expr("(w * scale) div t")))
    val kept = toks
      .join(broadcast(rates.select(col("lang"), col("rate_x1000"))), "lang")
      .filter(mixed(col("doc_id")) % 1000 < col("rate_x1000"))
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("n_tokens_kept"))
    rates.join(broadcast(kept), Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("t").as("n_tokens"),
        col("w").as("weight_x1000"), col("rate_x1000"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
  }

  def mixSources(spark: SparkSession, dir: String): DataFrame =
    mixSources(Tables.load(spark, dir, "documents"))

  /** Temperature-based source mixing (the mT5/multilingual-pretraining
    * recipe at τ = 2, i.e. sampling probability ∝ share^(1/2)): instead
    * of hand-assigned [[mixSources]] weights, each SOURCE's target weight
    * is derived from its own size — w(s) = ⌊√tokens(s)⌋ — which flattens
    * the head (a 100× bigger source gets only 10× the share) without the
    * degenerate uniform limit. The weight is an integer (IEEE `sqrt` is
    * correctly rounded and both engines floor the same double, so the
    * whole report stays engine-exact), and the rate law is exactly
    * [[mixSources]]'s no-upsampling largest-feasible-scale plan:
    * `scale = min_s tokens(s)·1000 div w(s)` — the most over-represented
    * source sets the thinning, the most under-represented keeps rate
    * 1000 — then the deterministic ‰ id-hash keeps each document.
    *
    * Scale shape: one token-stats pass (hash aggregate, map-side
    * combined), a sources-sized frame for the rate law (the global min is
    * a window over that tiny frame, not a second corpus pass), one
    * broadcast-join filter pass — the corpus is never shuffled. */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val stats = toks.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("t"))
      .withColumn("w",
        expr("cast(floor(sqrt(cast(t as double))) as bigint)"))
    val rates = stats
      .withColumn("scale", min(expr("t * 1000 div w"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("rate_x1000", least(lit(1000L), expr("(w * scale) div t")))
    val kept = toks
      .join(broadcast(rates.select(col("source"), col("rate_x1000"))),
        "source")
      .filter(mixed(col("doc_id")) % 1000 < col("rate_x1000"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("n_tokens_kept"))
    rates.join(broadcast(kept), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("t").as("n_tokens"),
        col("w").as("weight_sqrt"), col("rate_x1000"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
  }

  def mixTemperature(spark: SparkSession, dir: String): DataFrame =
    mixTemperature(Tables.load(spark, dir, "documents"))

  /** Multiplicative-weights rounds for [[mixDoremi]]. */
  val DoremiRounds = 4
  /** [[mixDoremi]] step size: the per-round multiplier is
    * (1e6 + DoremiEta·excess_ppm)/1e6, clamped to ≥ 1 before the
    * renormalization. */
  val DoremiEta = 2L

  /** DoReMi-style domain reweighting (the multiplicative-weights
    * mixture optimizer): domains whose proxy loss EXCEEDS the corpus
    * reference get upweighted round by round, easy domains shed weight —
    * the published recipe's structure with the proxy-model excess loss
    * replaced by the corpus-self bigram-LM perplexity surrogate
    * ([[TextAnalysis.lmScores]], already integer ppm) so the whole loop
    * is exact integer arithmetic and bit-reproducible across engines.
    * Per domain: (source, n_docs, loss_ppm, excess_ppm, weight_ppm)
    * after [[DoremiRounds]] rounds of
    * w ← clamp₁(w·(1e6 + η·excess) div 1e6), renormalized to ppm.
    *
    * Integer-division parity: a round's numerator can only go negative
    * when the multiplier does, and then BOTH engines' quotients are ≤ 0
    * (truncation vs floor differ by at most 1, both below the clamp), so
    * the clamp-to-1 erases the one place truncate-vs-floor semantics
    * could diverge.
    *
    * Scale shape: one corpus scoring pass (lmScores' hash aggregates)
    * joined to the source column on its own aggregation key, reduced to
    * ONE domains-sized frame; the reference loss and every round's
    * renormalization are windows over that tiny frame (the mix_sources
    * pattern — never a second aggregate + cross join, which would plan
    * the corpus subtree once per round). */
  def mixDoremi(docs: DataFrame): DataFrame = {
    val dom = TextAnalysis.lmScores(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("lm_score_ppm")).as("mass"))
      .withColumn("loss_ppm", expr("1000000 - mass div n_docs"))
      .drop("mass")
    val base = dom
      .withColumn("excess_ppm", col("loss_ppm") -
        expr("sum(loss_ppm * n_docs) OVER () div sum(n_docs) OVER ()"))
      .withColumn("weight_ppm", lit(1000000L))
    (1 to DoremiRounds).foldLeft(base) { (f, _) =>
      f.withColumn("weight_ppm", greatest(lit(1L),
          expr(s"(weight_ppm * (1000000 + $DoremiEta * excess_ppm))" +
            " div 1000000")))
        .withColumn("weight_ppm",
          expr("(weight_ppm * 1000000) div sum(weight_ppm) OVER ()"))
    }.select(col("source"), col("n_docs"), col("loss_ppm"),
      col("excess_ppm"), col("weight_ppm"))
  }

  def mixDoremi(spark: SparkSession, dir: String): DataFrame =
    mixDoremi(Tables.load(spark, dir, "documents"))

  /** [[unimaxAlloc]]'s per-source repeat cap: ×1000 epochs (4000 = a
    * source may be seen at most 4 times). */
  val UnimaxCapEpochsX1000 = 4000L
  /** [[unimaxAlloc]]'s training budget as ×1000 of total corpus tokens
    * (2000 = the run consumes 2× the corpus, so small sources hit the
    * epoch cap and the remainder waterfills over the large ones). */
  val UnimaxBudgetX1000 = 2000L

  /** UniMax-style budget allocation (the budget-constrained
    * closest-to-uniform mixture with a per-source repeat cap): give
    * every source as equal a share of the token budget as possible,
    * except no source repeats more than the epoch cap — small sources
    * saturate at cap·tokens and the freed budget waterfills over the
    * rest. The classic waterfill threshold computed CLOSED-FORM in
    * exact integers: sources sorted by capacity, a source saturates iff
    * its capacity fits under the even split of the budget remaining at
    * its rank (greedy condition — monotone in rank), every unsaturated
    * source gets the common level (budget − Σ saturated) div (#rest).
    * Per source: (source, n_docs, n_tokens, capacity, alloc_tokens,
    * epochs_x1000).
    *
    * Negative-division parity: budget − prefix can go negative inside
    * the saturation TEST, where truncate-vs-floor engines differ by 1 —
    * but a positive capacity compares below either result, so the
    * boolean agrees; the allocation itself only ever divides
    * non-negative values (saturation guarantees the remaining budget
    * covers the level).
    *
    * Scale shape: one token-stats pass (hash aggregate, map-side
    * combined) reduced to a sources-sized frame; sort, prefix sums,
    * threshold, and level are windows over that tiny frame — the
    * mix_sources pattern. */
  def unimaxAlloc(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = docs.select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("t"))
      .withColumn("capacity", expr(s"t * $UnimaxCapEpochsX1000 div 1000"))
    val byCap = Window.orderBy(col("capacity"), col("source"))
    stats
      .withColumn("budget",
        expr(s"sum(t) OVER () * $UnimaxBudgetX1000 div 1000"))
      .withColumn("rn", row_number().over(byCap).cast("long"))
      .withColumn("l", count(lit(1)).over(Window.partitionBy()))
      .withColumn("prefix", sum(col("capacity")).over(byCap))
      .withColumn("sat", expr(
        "capacity <= (budget - (prefix - capacity)) div (l - rn + 1)"))
      .withColumn("kstar", coalesce(
        max(when(col("sat"), col("rn"))).over(Window.partitionBy()),
        lit(0L)))
      .withColumn("satprefix", coalesce(
        max(when(col("sat"), col("prefix"))).over(Window.partitionBy()),
        lit(0L)))
      .withColumn("alloc_tokens", when(col("rn") <= col("kstar"),
          col("capacity"))
        .otherwise(expr("(budget - satprefix) div (l - kstar)")))
      .select(col("source"), col("n_docs"), col("t").as("n_tokens"),
        col("capacity"), col("alloc_tokens"),
        expr("alloc_tokens * 1000 div t").as("epochs_x1000"))
  }

  def unimaxAlloc(spark: SparkSession, dir: String): DataFrame =
    unimaxAlloc(Tables.load(spark, dir, "documents"))

  /** Training budget assumed by [[mixEpochs]], as a multiple ×1000 of the
    * weighted corpus's total tokens — 4× forces the repetition question
    * the planner exists to answer. */
  val EpochBudgetX1000 = 4000L

  /** Epochs of repetition that are "nearly free": beyond ~4 passes over
    * the same data, additional epochs return rapidly diminishing value
    * (Muennighoff et al., "Scaling Data-Constrained Language Models",
    * 2023) — the planner flags every source pushed past that knee. */
  val FreeEpochsX1000 = 4000L

  /** Hard ceiling on the epochs [[epochExpand]] will materialize for one
    * source. The plan can legitimately assign a HUGE epoch count to a
    * tiny source under a skewed mixture (desired ≫ available), and the
    * expansion builds a per-row sequence of that length — without a cap
    * a pathological weight table turns one row into a million-element
    * generator. 64 epochs is already 16× past the diminishing-returns
    * knee; anything above it is a mixture-design error the mix_epochs
    * report (repeat_excess, beyond_free) surfaces, not a stream worth
    * materializing. */
  val ExpandMaxEpochs = 64L

  /** Token-budget epoch planner — the data-constrained scaling question:
    * given the target mixture and a training budget of
    * [[EpochBudgetX1000]]‰ × total weighted tokens, how many EPOCHS of
    * each source does realizing the mixture require, and which sources
    * get repeated past the ~4-epoch point of diminishing returns? Where
    * [[mixSources]] answers "largest feasible scale with NO upsampling",
    * this answers the complementary deployment question once the budget
    * is fixed and repetition is on the table.
    *
    * Per source: desired = budget·w div Σw; epochs‰ = desired·1000 div
    * tokens; repeat_excess = max(desired − tokens, 0) (the tokens that
    * must come from repetition); beyond_free = 1 iff epochs‰ >
    * [[FreeEpochsX1000]]. All integer arithmetic.
    *
    * Scale shape: one token-stats pass (hash aggregate, map-side
    * combined); everything after is arithmetic over the sources-sized
    * frame (global sums as windows over that tiny frame, the
    * [[mixSources]] pattern — never a second corpus pass). */
  def mixEpochs(docs: DataFrame,
      weights: Seq[(String, Long)] = DefaultMixWeights): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toDF("lang", "w")
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    docs.select(col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("t"))
      .join(broadcast(wdf), "lang")
      .withColumn("w_sum", sum(col("w")).over(all))
      .withColumn("budget",
        expr(s"(sum(t) OVER () * $EpochBudgetX1000) div 1000"))
      .withColumn("desired_tokens", expr("(budget * w) div w_sum"))
      .withColumn("epochs_x1000", expr("(desired_tokens * 1000) div t"))
      .withColumn("repeat_excess", expr("greatest(desired_tokens - t, 0L)"))
      .withColumn("beyond_free",
        when(col("epochs_x1000") > FreeEpochsX1000, 1L).otherwise(0L))
      .select(col("lang"), col("t").as("n_tokens"),
        col("w").as("weight_x1000"), col("budget"), col("desired_tokens"),
        col("epochs_x1000"), col("repeat_excess"), col("beyond_free"))
  }

  def mixEpochs(spark: SparkSession, dir: String): DataFrame =
    mixEpochs(Tables.load(spark, dir, "documents"))

  /** The ACTION behind [[mixEpochs]] — materialize the epoch plan as a
    * deterministic (doc_id, lang, epoch_idx) training stream: every
    * weighted-language document appears once per FULL planned epoch, and
    * the fractional remainder epoch keeps each document by the same ‰
    * id-hash coin every sampler here uses ([[mixed]] — RNG-free,
    * order-independent, re-runnable). Pairs with mixEpochs exactly as
    * ccnet_sample pairs with ccnet_buckets.
    *
    * Scale shape: the plan is a languages-sized broadcast; the expansion
    * is one row-local explode of a ≤(epochs+1)-element sequence per doc —
    * the corpus is scanned twice (once for the plan's token stats, once
    * for the expansion) but never shuffled. Output volume is the planned
    * budget (~[[EpochBudgetX1000]]‰ of corpus rows), which is the point.
    * Per-source epochs are clamped at [[ExpandMaxEpochs]] (fractional
    * coin dropped past the clamp): a skewed mixture can plan a runaway
    * count for a tiny source, and that is a report-level finding
    * ([[mixEpochs]]' repeat_excess/beyond_free), not a sequence worth
    * generating per row. */
  def epochExpand(docs: DataFrame,
      weights: Seq[(String, Long)] = DefaultMixWeights): DataFrame = {
    val plan = mixEpochs(docs, weights)
      .select(col("lang"), col("epochs_x1000"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(plan), "lang")
      .withColumn("full_epochs",
        expr(s"least(epochs_x1000 div 1000, $ExpandMaxEpochs)"))
      .withColumn("frac",
        expr(s"CASE WHEN epochs_x1000 div 1000 > $ExpandMaxEpochs " +
          "THEN 0L ELSE epochs_x1000 % 1000 END"))
      .select(col("doc_id"), col("lang"), col("full_epochs"), col("frac"),
        explode(expr("sequence(0L, full_epochs)")).as("epoch_idx"))
      .filter(col("epoch_idx") < col("full_epochs") ||
        mixed(col("doc_id")) % 1000 < col("frac"))
      .select(col("doc_id"), col("lang"), col("epoch_idx"))
  }

  def epochExpand(spark: SparkSession, dir: String): DataFrame =
    epochExpand(Tables.load(spark, dir, "documents"))

  /** Shard assignment for training-data export: the id hash (same family
    * as [[hashBucket]]) maps every document to one of `nShards` shards —
    * deterministic, order-independent, and balanced in expectation, so
    * re-exporting an incrementally grown corpus never moves an existing
    * document between shards (downstream dataloader caches stay valid). */
  def shardPlan(docs: DataFrame, nShards: Int = 16): DataFrame =
    docs.withColumn("shard", mixed(col("doc_id")) % nShards)

  /** Per-shard manifest — the sidecar a training job reads instead of
    * listing files: doc/token/char totals and language spread per shard.
    * One projection + one hash aggregate (map-side combined); the token
    * counting streams through the same scan. */
  def shardManifest(docs: DataFrame, nShards: Int = 16): DataFrame =
    shardPlan(docs, nShards)
      .withColumn("n_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .groupBy(col("shard")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars_total"),
        count_distinct(col("lang")).as("n_langs"))

  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.load(spark, dir, "documents"))

  /** Write the corpus as `shard=<k>/` parquet partitions: one shuffle on
    * the shard key co-locates each shard into its own task, so each
    * partition directory is written by exactly one writer (no
    * many-small-files explosion from every task appending to every
    * shard — the `maxRecordsPerFile`-style knob then bounds file size
    * within a shard at real scale). */
  def writeShards(docs: DataFrame, outDir: String,
      nShards: Int = 16): Unit =
    shardPlan(docs, nShards)
      .repartition(col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  /** Greedy per-source selection under a token budget — the step that
    * EXECUTES a mixing recipe: each source contributes its
    * highest-quality documents until its token allowance is spent
    * (DoReMi/DCLM-style "best docs first, stop at the budget"). Quality
    * is the multilingual stopword-fluency signal (max marker count, the
    * [[TextAnalysis.LangMarkers]] convention), ×1000 integer ratio so
    * ordering and cumulative sums are engine-exact; ties break on doc_id
    * so the selected set is deterministic. A document is kept only if it
    * fits COMPLETELY inside the remaining budget of its running prefix
    * (greedy prefix rule, no partial documents).
    *
    * Scale shape: one exchange keyed by source + a per-source window
    * (running sum over the quality ordering). The sort is bounded per
    * source, not global; at 100 TB with few giant sources, pre-gate with
    * a coarse quality-band filter (keep the top bands only) so the
    * window input per source stays bounded — same refinement as
    * [[stratifiedSample]]. */
  def tokenBudgetSelect(docs: DataFrame,
      budgetPerSource: Long = 800L): DataFrame = {
    val markers = graft.exts.TextAnalysis.LangMarkers.map {
      case (_, p) => regexp_count(col("text"), lit(p))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_x1000").desc, col("doc_id"))
    docs
      .withColumn("n_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("n_stop", greatest(markers: _*))
      .withColumn("quality_x1000",
        expr("(n_stop * 1000) div greatest(n_tokens, 1)"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerSource)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("quality_x1000"), col("cum_tokens"))
  }

  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSelect(Tables.load(spark, dir, "documents"))

  /** Per-epoch training order: every document gets a fresh pseudo-random
    * position each epoch WITHOUT an RNG or a global sort — the epoch-seeded
    * multiplicative hash is the sort key, so the "shuffle" is (a) fully
    * deterministic and resumable (epoch + doc_id ⇒ position, forever),
    * (b) different between epochs, and (c) executed as a per-shard local
    * sort: rows hash-route to `nShards` shards and only each shard's
    * slice is ordered. At 100 TB the shard count scales with the corpus
    * (fixed rows-per-shard), so no task ever sorts more than a shard —
    * the dataloader reads shard files in position order and the global
    * order is exactly the (shard, pos) interleave.
    *
    * Output: one row per (epoch, document) with its shard and position;
    * all integer arithmetic (the hash constants are odd 32-bit primes, no
    * overflow for any realistic doc_id), engine-exact. */
  def trainingOrder(docs: DataFrame, epochs: Int = 2,
      nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("h",
        (mixed(col("doc_id")) + (col("epoch") + 1L) * 2246822519L)
          % HashMod)
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos", row_number().over(w))
      .select(col("epoch").cast("long").as("epoch"), col("doc_id"),
        col("shard"), col("pos"))
  }

  def trainingOrder(spark: SparkSession, dir: String): DataFrame =
    trainingOrder(Tables.load(spark, dir, "documents"))

  /** Curriculum ordering — [[trainingOrder]]'s epoch shuffle composed
    * with quality staging: documents are banded by the multilingual
    * fluency signal (width-100 ‰ bands) and each shard reads its
    * highest-fluency bands first, with the deterministic id-hash
    * shuffling WITHIN a band (curriculum stages present cleaner text
    * early; the hash keeps intra-stage order unbiased and resumable).
    * Same scale shape as trainingOrder: rows hash-route to shards, only
    * per-shard slices sort — no RNG, no global sort. */
  def curriculumOrder(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val markers = graft.exts.TextAnalysis.LangMarkers.map {
      case (_, p) => regexp_count(col("text"), lit(p))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("band").desc, col("h"), col("doc_id"))
    docs
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("n_stop", greatest(markers: _*))
      .withColumn("quality_x1000",
        expr("(n_stop * 1000) div greatest(n_tokens, 1)"))
      .withColumn("band", expr("quality_x1000 div 100"))
      .withColumn("h", mixed(col("doc_id")) % 1000000007L)
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("band"), col("pos"))
  }

  def curriculumOrder(spark: SparkSession, dir: String): DataFrame =
    curriculumOrder(Tables.load(spark, dir, "documents"))

  /** Token-count histogram: documents bucketed by whitespace-token count
    * (width-25 bins) — the length-distribution check before packing
    * sequences. One projection + one hash aggregate. */
  def tokenLenHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("bin_lo", expr("(n_tokens div 25) * 25"))
      .groupBy(col("bin_lo"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
}
