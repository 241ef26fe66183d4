package graft.exts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persisted kNN-graph artifact: build the graph ONCE per corpus
  * snapshot, serve every graph consumer — the [[IvfIndex]]/[[Bm25Index]]
  * build/apply split applied to the single most reused derived structure
  * in the engine. Nine operators (knn_graph, knn_components,
  * cluster_purity, d4_prune, graph_pagerank, graph_lpa, graph_walks,
  * walk_skipgrams, graph_triangles) consume the same top-k cosine edge
  * list; before this artifact each rebuilt it from raw embeddings —
  * paying the dominant within-bucket candidate-scoring self-join per
  * invocation. At lake scale the graph is computed once at ingest and
  * maintained, exactly the reference's accumulate→threshold→rebuild
  * lifecycle (AwsTableManagementMetricsEvaluator.java:108-140) already
  * applied to the IVF and BM25 indexes here.
  *
  * The artifact is the [[Similarity.knnGraph]] edge frame (src_id,
  * dst_id, rank, mutual — longs and ints, so the parquet round-trip is
  * bit-exact and every consumer's result is identical to an inline
  * rebuild) committed to the shared [[ArtifactStore]] keyed by (corpus
  * dir, [[Tables.version]] of `embeddings`, k). Edges are written
  * bucketed BY src_id ([[SrcBuckets]] partition directories), so a
  * src-keyed lookup ([[edgesForSrcs]] — the ego-neighborhood /
  * serving-side read) prunes to its sources' buckets at the directory
  * level instead of scanning the whole edge list — asserted on the
  * executed plan in PipelineSpec. Whole-graph consumers read every
  * bucket exactly as before (the layout column is stripped on load).
  */
object KnnIndex {

  private[exts] val Kind = "knn-graph"

  /** src_id partition fan-out of the edge layout (16 matches this
    * harness; a lake deployment raises it — the bucket count changes
    * only which directories exist, never a result). Plain `src_id mod
    * SrcBuckets`: ids are dense, so modulo balances without hashing. */
  private[exts] val SrcBuckets = 16

  private def srcBucket = pmod(col("src_id"), lit(SrcBuckets.toLong))

  /** The committed artifact directory for (`dir`, k) — first call per
    * corpus snapshot builds the graph and commits; later calls (any
    * session, any job) resolve the existing entry. The variant carries
    * the bucket fan-out so a layout change is a different entry. */
  def path(spark: SparkSession, dir: String,
      k: Int = Similarity.KnnGraphK): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "embeddings"),
      variant = s"k$k-s$SrcBuckets") { staging =>
      save(Similarity.knnGraph(
        Tables.load(spark, dir, "embeddings"), k), staging)
    }

  /** Persist an edge frame ([[Similarity.knnGraph]] schema), bucketed
    * BY src_id (see [[SrcBuckets]]). */
  def save(edges: DataFrame, path: String): Unit =
    edges.withColumn("s_bucket", srcBucket)
      .write.mode("overwrite").partitionBy("s_bucket")
      .parquet(s"$path/edges")

  /** Load a previously [[save]]d edge frame — layout column stripped,
    * so consumers see the exact [[Similarity.knnGraph]] schema. */
  def load(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.readCached(spark, s"$path/edges").drop("s_bucket")

  /** The corpus's kNN edge list, artifact-backed: (src_id, dst_id,
    * rank, mutual) — built on first use, loaded thereafter. Every graph
    * consumer's (spark, dir) entry point reads through here. */
  def edges(spark: SparkSession, dir: String,
      k: Int = Similarity.KnnGraphK): DataFrame =
    load(spark, path(spark, dir, k))

  /** Src-keyed edge lookup against the committed layout: the requested
    * sources' buckets become partition literals (metadata-scale — at
    * most [[SrcBuckets]] longs), so the scan prunes to those
    * directories before any file IO; the residual src_id filter then
    * selects within them. Identical rows to
    * `edges(...).filter(src_id ∈ srcs)` — PipelineSpec asserts both the
    * equality and the `PartitionFilters` on the executed plan. */
  def edgesForSrcs(spark: SparkSession, dir: String, srcs: Seq[Long],
      k: Int = Similarity.KnnGraphK): DataFrame = {
    val buckets = srcs.map(s => ((s % SrcBuckets) + SrcBuckets)
      % SrcBuckets).distinct.sorted
    ArtifactStore.readCached(spark, s"${path(spark, dir, k)}/edges")
      .filter(col("s_bucket").isin(buckets: _*))
      .filter(col("src_id").isin(srcs: _*))
      .drop("s_bucket")
  }

  // ---- the derived COMPONENTS artifact (one level up the reuse
  //      chain: knn_components, cluster_purity and d4_prune all
  //      consume the same mutual-edge component frame, and the
  //      min-label loop over it is the dominant cost once the edge
  //      list itself is artifact-served) ----

  private[exts] val CompKind = "knn-components"

  /** The committed components artifact for (`dir`, k): the full
    * [[Similarity.knnComponentsFromEdges]] frame (vec_id, component,
    * cluster_size, is_canonical — longs and a boolean, parquet
    * round-trip bit-exact) over the [[edges]] artifact. Built on first
    * use; the component loop runs once per corpus snapshot instead of
    * once per consumer. */
  def componentsPath(spark: SparkSession, dir: String,
      k: Int = Similarity.KnnGraphK): String =
    ArtifactStore.resolve(spark, CompKind, dir,
      Tables.version(dir, "embeddings"), variant = s"k$k") { staging =>
      Similarity.knnComponentsFromEdges(edges(spark, dir, k))
        .write.mode("overwrite").parquet(s"$staging/components")
    }

  /** The corpus's mutual-kNN component frame, artifact-backed. */
  def components(spark: SparkSession, dir: String,
      k: Int = Similarity.KnnGraphK): DataFrame =
    ArtifactStore.readCached(spark,
      s"${componentsPath(spark, dir, k)}/components")

  /** Evict only the derived components artifact (test seam: after
    * doctoring the edge artifact in place, the derived frame must be
    * re-derived — in production both artifacts share the corpus
    * version, so they can never drift apart). */
  private[graft] def evictComponents(spark: SparkSession, dir: String,
      k: Int = Similarity.KnnGraphK): Unit =
    ArtifactStore.evict(spark, CompKind, dir,
      Tables.version(dir, "embeddings"), variant = s"k$k")

  /** Scoped cold-path eviction for this corpus snapshot (memo + disk). */
  private[graft] def evict(spark: SparkSession, dir: String,
      k: Int = Similarity.KnnGraphK): Unit = {
    ArtifactStore.evict(spark, Kind, dir,
      Tables.version(dir, "embeddings"), variant = s"k$k-s$SrcBuckets")
    ArtifactStore.evict(spark, CompKind, dir,
      Tables.version(dir, "embeddings"), variant = s"k$k")
  }

  /** Test seam: drop memoized paths (delegates to the shared store). */
  private[graft] def clear(): Unit = ArtifactStore.clear()
}
