package graft.exts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persisted BM25 retrieval index: build ONCE per corpus snapshot, serve
  * every query batch — the [[LmIndex]]/[[DsirIndex]] train/apply split
  * for [[TextAnalysis.bm25Retrieve]]'s lexical retrieval.
  *
  * The artifact is the deployment shape of an inverted index at rest:
  * the postings frame (doc, term, tf, dl), the vocabulary df table, and
  * the 1-row normalization stats, each a parquet inside ONE committed
  * [[ArtifactStore]] entry keyed by (corpus dir, [[Tables.version]]) —
  * a fresh session or a separate job (the query-serving side vs the
  * nightly indexer) resolves the same entry and [[load]]s, so scoring a
  * batch runs ZERO corpus-text scans. The store's manifest check means
  * the entry provably belongs to this corpus (no hash-collision or
  * planted-path aliasing), its atomic publish means a reader can never
  * observe a partially written index, and the version in the key means
  * a corpus rewrite re-indexes instead of serving stale postings.
  * Postings and df are written bucketed BY TERM ([[TermBuckets]]
  * hash-partition directories), so the per-batch query-term probe
  * prunes files to the batch vocabulary's buckets instead of scanning
  * all postings — asserted on the executed plan in PipelineSpec.
  */
object Bm25Index {

  private[exts] val Kind = "bm25-index"

  /** Term-hash fan-out of the at-rest layout: postings and df are
    * written PARTITIONED BY `t_bucket = pmod(hash(term), TermBuckets)`,
    * so a query batch's term-keyed probe prunes to exactly the buckets
    * its vocabulary hashes into (directory-level `PartitionFilters`,
    * asserted in PipelineSpec) instead of scanning every postings file
    * — the lake-scale shape the docstring below names, now tested
    * behavior. 16 buckets match this harness's scale; a lake deployment
    * raises it into the thousands (the bucket count only changes WHICH
    * directories exist, never a result — Spark's murmur3 `hash` is
    * deterministic across sessions and jobs). */
  private[exts] val TermBuckets = 16

  /** Doc-hash shard count of the FORWARD postings copy (r19): the same
    * postings rows re-clustered by `doc_id` so every document's rows sit
    * in one file. When a batch's vocabulary probes EVERY term bucket
    * (stopword-heavy batches — term pruning is moot), [[scoreBatch]]
    * scans this copy instead: each (query, doc) partial score completes
    * within its scan task, so the pre-top-k exchange carries one row per
    * (query, doc) pair instead of one per (pair, map task) — measured
    * 33 → 2 MB at sf0.1. The standard inverted/forward index pairing at
    * rest; rows are identical, so results never depend on which copy
    * serves a batch. */
  private[exts] val DocShards = 16

  /** Artifact layout tag — in the resolve variant, so layout changes
    * (like adding the forward copy) rebuild instead of serving a
    * missing/mismatched shape. */
  private[exts] val VariantTag = s"t$TermBuckets-f$DocShards"

  private def termBucket = pmod(hash(col("term")), lit(TermBuckets))

  /** The index path for the `documents` corpus under `dir` — first call
    * per corpus snapshot builds and commits; later calls (any session,
    * any job) resolve the existing committed artifact. The variant tag
    * carries the bucket fan-out, so a layout change can never be served
    * to a reader expecting the other shape. */
  def path(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "documents"), variant = VariantTag) {
      staging =>
        val docs = Tables.load(spark, dir, "documents")
        save(TextAnalysis.bm25Postings(docs),
          TextAnalysis.bm25Stats(docs), staging)
    }

  /** Persist an index: postings + derived df + stats, both term-keyed
    * frames bucketed BY TERM (see [[TermBuckets]]). */
  def save(postings: DataFrame, stats: DataFrame, path: String): Unit = {
    postings.withColumn("t_bucket", termBucket)
      .write.mode("overwrite").partitionBy("t_bucket")
      .parquet(s"$path/postings")
    // forward copy: doc-clustered shards (see [[DocShards]])
    postings.repartition(DocShards, col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/postings_fwd")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("t_bucket", termBucket)
      .write.mode("overwrite").partitionBy("t_bucket")
      .parquet(s"$path/df")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a previously [[save]]d index: (postings, df, stats) — the
    * layout bucket column stripped, so every consumer sees the exact
    * pre-layout schema. */
  def load(spark: SparkSession,
      path: String): (DataFrame, DataFrame, DataFrame) =
    (ArtifactStore.readCached(spark, s"$path/postings").drop("t_bucket"),
      ArtifactStore.readCached(spark, s"$path/df").drop("t_bucket"),
      ArtifactStore.readCached(spark, s"$path/stats"))

  /** Postings + df pruned to exactly the term-hash buckets `qterms`'
    * vocabulary touches: the batch's distinct bucket ids collect to the
    * driver (metadata-scale — at most [[TermBuckets]] ints) and become
    * prunable partition literals, so the scan reads only those buckets'
    * files. Results are identical to the unpruned load — every batch
    * term's postings live in a probed bucket by construction. When the
    * batch probes EVERY bucket, term pruning buys nothing and the
    * FORWARD copy serves the postings instead (doc-clustered shards —
    * the per-(query, doc) partial aggregation completes map-side; see
    * [[DocShards]]); same rows, so the scores are identical either
    * way. */
  private def loadPruned(spark: SparkSession, path: String,
      qterms: DataFrame): (DataFrame, DataFrame) = {
    val buckets = qterms.select(termBucket.as("b")).distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    if (buckets.size >= TermBuckets)
      // full coverage: the bucket predicate is a tautology — read the
      // forward postings copy and the whole df table unfiltered
      (ArtifactStore.readCached(spark, s"$path/postings_fwd"),
        ArtifactStore.readCached(spark, s"$path/df").drop("t_bucket"))
    else
      (ArtifactStore.readCached(spark, s"$path/postings")
          .filter(col("t_bucket").isin(buckets: _*)).drop("t_bucket"),
        ArtifactStore.readCached(spark, s"$path/df")
          .filter(col("t_bucket").isin(buckets: _*)).drop("t_bucket"))
  }

  /** Score an incoming query batch (doc_id, text) against the persisted
    * index: the batch's DISTINCT terms broadcast onto the loaded postings
    * ([[TextAnalysis.bm25ScoreAgainst]] — candidates bounded by
    * Σ_queryterm df(term)), top-k per batch document. Batch ids live in
    * their own offset range, so no self-exclusion is needed; integer
    * scores round-trip parquet exactly, so results are bit-identical to
    * scoring against a freshly built inline index. */
  def scoreBatch(spark: SparkSession, dir: String, batch: DataFrame,
      k: Int = 10): DataFrame = {
    val p = path(spark, dir)
    val qterms = batch.select(col("doc_id").as("query_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+")))
        .as("term"))
    val (postings, dfr) = loadPruned(spark, p, qterms)
    val stats = ArtifactStore.readCached(spark, s"$p/stats")
    TextAnalysis.bm25ScoreAgainst(postings, stats, qterms, k,
      excludeSelf = false, dfrOpt = Some(dfr))
  }

  /** Incremental index maintenance — the reference's event-driven
    * maintenance pattern lifted to the text index (the emb_incremental →
    * ivf_maintenance sibling): merge an incoming document batch into the
    * persisted index WITHOUT rebuilding from the corpus text. New doc
    * ids are disjoint from indexed ids, so the merge is EXACTLY
    * equivalent to a full rebuild over corpus ∪ batch: postings are
    * unioned (doc-disjoint), per-term df adds, and the length stats add
    * — integer arithmetic throughout, so the equivalence is bit-exact
    * (the spec asserts it against a rebuilt index).
    *
    * Returns the vocabulary-level delta report a maintenance dashboard
    * consumes: one row per term TOUCHED by the batch — corpus df, batch
    * df, merged df, and a new_term flag — plus the merged avgdl carried
    * on every row (1-row stats broadcast). Cost: the batch's own
    * tokenize/agg + a batch-vocabulary probe of the persisted df table;
    * the corpus text is never scanned.
    *
    * Scale shape: the batch vocabulary is bounded by batch size; the
    * persisted df table joins it term-keyed (broadcast of the BATCH side
    * — never the vocabulary); the merged stats are one crossJoin of two
    * 1-row aggregates. */
  def mergeReport(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    val (_, dfr, stats) = load(spark, path(spark, dir))
    val bWithDl = batch.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val bdf = bWithDl
      .select(col("doc_id"), explode(array_distinct(col("ws"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df_batch"))
    val bstats = bWithDl.agg(count(lit(1)).as("n_docs_b"),
      sum(col("dl")).as("n_tokens_b"))
    val merged = stats.crossJoin(broadcast(bstats))
      .select(
        expr("((n_tokens + n_tokens_b) * 1000) div (n_docs + n_docs_b)")
          .as("avgdl_merged_x1000"))
    // batch vocab preserved on the left; the persisted df table arrives
    // term-keyed via shuffle-hash (an outer's preserved side can't be
    // the broadcast side, and the vocabulary exchange is Heaps'-law
    // bounded, never corpus-scale)
    bdf.join(dfr.hint("shuffle_hash"), Seq("term"), "left")
      .select(col("term"),
        coalesce(col("df"), lit(0L)).as("df_corpus"),
        col("df_batch"),
        (coalesce(col("df"), lit(0L)) + col("df_batch")).as("df_merged"),
        when(col("df").isNull, 1L).otherwise(0L).as("new_term"))
      .crossJoin(broadcast(merged))
  }

  /** Scoped cold-path eviction for this corpus snapshot (memo + disk). */
  private[graft] def evict(spark: SparkSession, dir: String): Unit =
    ArtifactStore.evict(spark, Kind, dir, Tables.version(dir, "documents"),
      variant = VariantTag)

  /** Test seam: drop memoized paths (delegates to the shared store). */
  private[graft] def clear(): Unit = ArtifactStore.clear()
}
