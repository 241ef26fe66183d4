package graft.exts

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *  - [[centroids]] — session-scoped memo keyed by (applicationId, dir, k,
  *    iters). First call trains via [[Similarity.trainedCentroids]] and
  *    collects the tiny result (k rows × dim floats — metadata-scale by
  *    construction: training is bounded to [[Similarity.IvfTrainSample]]
  *    vectors regardless of corpus size); later calls rebuild a
  *    LocalRelation from the cached rows with zero Spark jobs. The values
  *    are bit-identical to a fresh training run, so every oracle hash is
  *    unchanged.
  *  - [[save]]/[[load]] — persist the centroid frame as a parquet artifact
  *    next to the table (the "index file"), the form a 1000-executor
  *    deployment would ship: build once in the ingest job, load in every
  *    query job. PipelineSpec asserts the round-trip reproduces identical
  *    search results.
  */
object IvfIndex {

  private final case class Key(app: String, dir: String, k: Int, iters: Int)

  private val memo = new ConcurrentHashMap[Key, Seq[(Long, Seq[Float])]]()

  /** Trained centroids for the `embeddings` table under `dir` — memoized.
    * Schema: (cent_id BIGINT, cent ARRAY<FLOAT>), identical to
    * [[Similarity.trainedCentroids]]. */
  def centroids(spark: SparkSession, dir: String,
      k: Int = Similarity.IvfCentroids,
      iters: Int = Similarity.IvfIters): DataFrame = {
    val key = Key(spark.sparkContext.applicationId, dir, k, iters)
    val rows = memo.computeIfAbsent(key, _ =>
      collectRows(Similarity.trainedCentroids(
        Tables.load(spark, dir, "embeddings"), k, iters)))
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
    spark.read.parquet(path)

  /** Test seam: drop all memoized indexes. */
  private[graft] def clear(): Unit = memo.clear()
}
