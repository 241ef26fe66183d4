package graft.exts

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF centroid index lifecycle: build ONCE per (corpus, k, iters), reuse
  * across every search/dedup that needs the same cells.
  *
  * The reference delegates all heavy lifting to remote engines, but a real
  * vector-index deployment always splits *index build* from *query* — the
  * IVF literature assumes the coarse quantizer is trained offline and the
  * cell assignment is an artifact of the table layout, not of each query.
  * Round-5 profiling showed re-training inside every `sim_ivf` /
  * `dedup_semantic` invocation ran ~6 extra Spark jobs per query (the only
  * r4→r5 bench regression), so this object provides the split:
  *
  *  - [[centroids]] — [[ArtifactStore]]-backed: the first resolve per
  *    (corpus snapshot, k, iters) trains via
  *    [[Similarity.trainedCentroids]] and COMMITS the tiny result
  *    (k rows × dim floats — metadata-scale by construction: training is
  *    bounded to [[Similarity.IvfTrainSample]] vectors regardless of
  *    corpus size) as a parquet artifact; a fresh session or a separate
  *    job (query serving vs the nightly indexer) loads the committed
  *    entry instead of re-training. Within a session the collected rows
  *    memoize on the entry path, so later calls rebuild a LocalRelation
  *    with zero Spark jobs, exactly as before. IEEE float bits
  *    round-trip parquet exactly, so the loaded values are bit-identical
  *    to a fresh training run and every oracle hash is unchanged.
  *  - [[save]]/[[load]] — the raw persist/open seam the artifact entry is
  *    built through (also usable standalone to ship an index file to an
  *    explicit location). PipelineSpec asserts the round-trip reproduces
  *    identical search results.
  */
object IvfIndex {

  private[graft] val Kind = "ivf-centroids"

  // session memo: committed entry path → collected centroid rows (skips
  // the parquet open on repeat calls; the PATH is the identity — it
  // already encodes (root, dir-hash, variant, version))
  private val memo = new ConcurrentHashMap[String, Seq[(Long, Seq[Float])]]()

  /** The committed centroid artifact for (`dir`, k, iters) — first call
    * per corpus snapshot trains and commits; later calls (any session,
    * any job) resolve the existing entry. */
  def path(spark: SparkSession, dir: String,
      k: Int = Similarity.IvfCentroids,
      iters: Int = Similarity.IvfIters): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "embeddings"), variant = s"k$k-i$iters") {
      staging =>
        save(Similarity.trainedCentroids(
          Tables.load(spark, dir, "embeddings"), k, iters),
          s"$staging/centroids")
    }

  /** Trained centroids for the `embeddings` table under `dir`,
    * artifact-backed; the store key carries [[Tables.version]] of the
    * table's file listing so a corpus rewrite under the same path
    * re-trains instead of serving a stale index. Schema:
    * (cent_id BIGINT, cent ARRAY<FLOAT>), identical to
    * [[Similarity.trainedCentroids]]. */
  def centroids(spark: SparkSession, dir: String,
      k: Int = Similarity.IvfCentroids,
      iters: Int = Similarity.IvfIters): DataFrame = {
    val p = path(spark, dir, k, iters)
    val rows = memo.computeIfAbsent(p, _ =>
      collectRows(load(spark, s"$p/centroids")))
    fromRows(spark, rows)
  }

  private def collectRows(cent: DataFrame): Seq[(Long, Seq[Float])] =
    cent.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toIndexedSeq)
    }.toIndexedSeq

  private def fromRows(spark: SparkSession,
      rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("cent_id", "cent")
  }

  /** Persist a centroid frame as a single-file parquet artifact (k rows —
    * one file is the right layout; the artifact is broadcast at query
    * time, never scanned in parallel). */
  def save(cent: DataFrame, path: String): Unit =
    cent.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a previously [[save]]d index artifact. */
  def load(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.readCached(spark, path)

  /** Scoped cold-path eviction for this (corpus snapshot, k, iters)
    * entry (memo + disk). */
  private[graft] def evict(spark: SparkSession, dir: String,
      k: Int = Similarity.IvfCentroids,
      iters: Int = Similarity.IvfIters): Unit = {
    val version = Tables.version(dir, "embeddings")
    memo.remove(ArtifactStore.locate(spark, Kind, dir, version,
      variant = s"k$k-i$iters"))
    ArtifactStore.evict(spark, Kind, dir, version, variant = s"k$k-i$iters")
  }

  /** Test seam: drop all memoized indexes (on-disk artifacts remain —
    * use [[evict]] to remove those). */
  private[graft] def clear(): Unit = memo.clear()

  // ---- the index AT REST: cell-partitioned corpus layout ----

  /** Nearest-centroid cell for every (vec_id, embedding) row. */
  private[graft] def assigned(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    corpus.join(broadcast(centroids))
      .withColumn("cent_cos",
        Similarity.cosine(col("embedding"), col("cent")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** Write the corpus CLUSTERED BY CELL — one `cell=<id>/` parquet
    * directory per inverted-file cell. This is the 100 TB layout the IVF
    * design assumes: the cell is the partition key at rest, so a probe
    * reads only its own cells' files (directory-level pruning — verified
    * in PipelineSpec via `PartitionFilters` in the scan node) instead of
    * filtering the whole corpus post-scan. Build once at ingest alongside
    * [[save]]ing the centroid artifact. */
  def writeClustered(corpus: DataFrame, centroids: DataFrame,
      path: String): Unit =
    assigned(corpus, centroids).write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(path)

  /** IVF search against a [[writeClustered]] layout: queries are assigned
    * to their nprobe nearest cells (a broadcast-sized computation — the
    * query set is small by definition), and the corpus scan is filtered
    * to exactly those cell literals, so partition pruning skips every
    * other cell's files. Collecting the probed cell ids to the driver is
    * metadata-scale (≤ |queries|·nprobe ints) and is what turns the
    * probe set into prunable literals. Results are identical to the
    * unclustered [[Similarity.ivfSearch]] with the same centroids. */
  def searchClustered(spark: SparkSession, path: String,
      centroids: DataFrame, queries: DataFrame, k: Int = 5,
      nprobe: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"))
      .join(broadcast(centroids))
      .withColumn("cent_cos", Similarity.cosine(col("emb_q"), col("cent")))
      .withColumn("cent_rn", row_number().over(w))
      .filter(col("cent_rn") <= nprobe)
      .select(col("query_id"), col("emb_q"), col("cent_id").as("cell"))
    val probedCells = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val corpus = spark.read.parquet(path)
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("emb_n"), col("cell"))
    // bounded TopKPairs finish (≤k rows per query per mapper), same
    // (cos DESC, neighbor_id ASC) order as Similarity's search paths
    Similarity.topKByCosine(
      corpus.join(broadcast(q), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", Similarity.cosine(col("emb_q"), col("emb_n"))),
      k)
  }
}
