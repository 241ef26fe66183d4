package graft.exts

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Trained bigram-LM artifact lifecycle: train ONCE per corpus snapshot,
  * apply to every scoring batch — the [[BpeIndex]]/[[IvfIndex]] split for
  * the [[TextAnalysis.lmTrain]] model.
  *
  * Unlike the merge table (rounds rows) or the centroids (k rows), the LM
  * has one row per distinct corpus bigram — Heaps-law sub-linear but
  * UNBOUNDED, so the artifact is a parquet table, never a driver-side
  * collect: the first call per (corpus, version) trains and writes the
  * model; later calls open the parquet (zero training jobs). Apply-side
  * join policy lives in [[TextAnalysis.lmScoreWith]] (AQE broadcast while
  * it fits, shuffled equi-join past the threshold; [[TextAnalysis.lmHead]]
  * prunes to a hard bound when the broadcast fast path must hold).
  *
  * The memo key carries [[Tables.version]] so a corpus rewrite under the
  * same path re-trains instead of serving a stale model.
  */
object LmIndex {

  private final case class Key(app: String, dir: String, version: Long)

  private val memo = new ConcurrentHashMap[Key, String]()

  /** The trained model for the `documents` table under `dir`, as a
    * parquet-backed frame (schema identical to [[TextAnalysis.lmTrain]]:
    * w1, w2, c_bg, c_ctx). First call per corpus snapshot trains and
    * [[save]]s; later calls [[load]]. Values are bit-identical to a
    * fresh training run (integer counts round-trip parquet exactly), so
    * every oracle hash is unchanged. */
  def model(spark: SparkSession, dir: String): DataFrame = {
    val key = Key(spark.sparkContext.applicationId, dir,
      Tables.version(dir, "documents"))
    val path = memo.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files
        .createTempDirectory("graft-lm-artifact").toString
      save(TextAnalysis.lmTrain(Tables.load(spark, dir, "documents")), p)
      p
    })
    load(spark, path)
  }

  /** Persist a trained model as a parquet artifact (partitioned by the
    * writer's parallelism — the model is read-broadcast or join-shuffled
    * at apply time, so file layout is not a probe path). */
  def save(lm: DataFrame, path: String): Unit =
    lm.write.mode("overwrite").parquet(path)

  /** Load a previously [[save]]d model artifact. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Test seam: drop all memoized models. */
  private[graft] def clear(): Unit = memo.clear()
}
