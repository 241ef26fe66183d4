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
  * Postings are written partitioned as they come off the (doc, term)
  * aggregate; at lake scale the same write would be bucketed BY TERM so
  * the per-batch query-term join prunes files instead of scanning all
  * postings.
  */
object Bm25Index {

  private[exts] val Kind = "bm25-index"

  /** The index path for the `documents` corpus under `dir` — first call
    * per corpus snapshot builds and commits; later calls (any session,
    * any job) resolve the existing committed artifact. */
  def path(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "documents")) { staging =>
      val docs = Tables.load(spark, dir, "documents")
      save(TextAnalysis.bm25Postings(docs),
        TextAnalysis.bm25Stats(docs), staging)
    }

  /** Persist an index: postings + derived df + stats. */
  def save(postings: DataFrame, stats: DataFrame, path: String): Unit = {
    postings.write.mode("overwrite").parquet(s"$path/postings")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/df")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a previously [[save]]d index: (postings, df, stats). */
  def load(spark: SparkSession,
      path: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/df"),
      spark.read.parquet(s"$path/stats"))

  /** Score an incoming query batch (doc_id, text) against the persisted
    * index: the batch's DISTINCT terms broadcast onto the loaded postings
    * ([[TextAnalysis.bm25ScoreAgainst]] — candidates bounded by
    * Σ_queryterm df(term)), top-k per batch document. Batch ids live in
    * their own offset range, so no self-exclusion is needed; integer
    * scores round-trip parquet exactly, so results are bit-identical to
    * scoring against a freshly built inline index. */
  def scoreBatch(spark: SparkSession, dir: String, batch: DataFrame,
      k: Int = 10): DataFrame = {
    val (postings, dfr, stats) = load(spark, path(spark, dir))
    val qterms = batch.select(col("doc_id").as("query_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+")))
        .as("term"))
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
    ArtifactStore.evict(spark, Kind, dir, Tables.version(dir, "documents"))

  /** Test seam: drop memoized paths (delegates to the shared store). */
  private[graft] def clear(): Unit = ArtifactStore.clear()
}
