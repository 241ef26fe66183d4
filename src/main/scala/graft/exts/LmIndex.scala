package graft.exts

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Trained bigram-LM artifact lifecycle: train ONCE per corpus snapshot,
  * apply to every scoring batch — the [[BpeIndex]]/[[IvfIndex]] split for
  * the [[TextAnalysis.lmTrain]] model.
  *
  * Unlike the merge table (rounds rows) or the centroids (k rows), the LM
  * has one row per distinct corpus bigram — Heaps-law sub-linear but
  * UNBOUNDED, so the artifact is a parquet table, never a driver-side
  * collect. It lives in the shared [[ArtifactStore]] keyed by (corpus
  * dir, [[Tables.version]]): the first resolve per corpus snapshot
  * trains and commits; later calls — from THIS session, a fresh session,
  * or a different job entirely (the serving side vs the nightly trainer)
  * — open the committed parquet with zero training jobs. The store's
  * manifest check guarantees the entry belongs to this corpus, its
  * atomic publish means no reader ever observes a half-written model,
  * and the version in the key means a corpus rewrite re-trains instead
  * of serving stale counts. Apply-side join policy lives in
  * [[TextAnalysis.lmScoreWith]] (AQE broadcast while it fits, shuffled
  * equi-join past the threshold; [[TextAnalysis.lmHead]] prunes to a
  * hard bound when the broadcast fast path must hold).
  */
object LmIndex {

  private[graft] val Kind = "lm-bigram"

  /** The trained model for the `documents` table under `dir`, as a
    * parquet-backed frame (schema identical to [[TextAnalysis.lmTrain]]:
    * w1, w2, c_bg, c_ctx). First call per corpus snapshot trains and
    * commits to the [[ArtifactStore]]; later calls — any session, any
    * job — [[load]] the committed artifact. Values are bit-identical to
    * a fresh training run (integer counts round-trip parquet exactly),
    * so every oracle hash is unchanged. */
  def model(spark: SparkSession, dir: String): DataFrame =
    load(spark, ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "documents")) { staging =>
      save(TextAnalysis.lmTrain(Tables.load(spark, dir, "documents")),
        staging)
    })

  /** Persist a trained model as a parquet artifact (partitioned by the
    * writer's parallelism — the model is read-broadcast or join-shuffled
    * at apply time, so file layout is not a probe path). */
  def save(lm: DataFrame, path: String): Unit =
    lm.write.mode("overwrite").parquet(s"$path/model")

  /** Load a previously [[save]]d model artifact. */
  def load(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.readCached(spark, s"$path/model")

  /** Scoped cold-path eviction for this corpus snapshot (memo + disk). */
  private[graft] def evict(spark: SparkSession, dir: String): Unit =
    ArtifactStore.evict(spark, Kind, dir, Tables.version(dir, "documents"))

  /** Test seam: drop memoized paths (delegates to the shared store). */
  private[graft] def clear(): Unit = ArtifactStore.clear()
}
