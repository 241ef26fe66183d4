package graft.exts

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Trained DSIR score-table artifact lifecycle: train ONCE per corpus
  * snapshot, apply to every ingest batch — the [[LmIndex]]/[[BpeIndex]]
  * split for [[TextAnalysis.dsirHead]]'s importance model.
  *
  * The model is BOUNDED ([[TextAnalysis.DsirHeadTerms]] rows — the head
  * vocabulary with its ppm lean), so unlike the LM it could live as a
  * driver literal; it is still persisted as a parquet artifact so a fresh
  * session (or another job entirely — the ingest gate vs the nightly
  * trainer) scores batches without re-running the corpus scan. The memo
  * key carries [[Tables.version]] so a corpus rewrite under the same path
  * re-trains instead of serving a stale score table.
  */
object DsirIndex {

  private final case class Key(app: String, dir: String, version: Long)

  private val memo = new ConcurrentHashMap[Key, String]()

  /** The trained (term, s) score table for the `documents` table under
    * `dir`, parquet-backed. First call per corpus snapshot trains and
    * [[save]]s; later calls [[load]] (zero training jobs). Integer
    * scores round-trip parquet exactly, so results are bit-identical to
    * an inline [[TextAnalysis.dsirHead]]. */
  def scores(spark: SparkSession, dir: String): DataFrame = {
    val key = Key(spark.sparkContext.applicationId, dir,
      Tables.version(dir, "documents"))
    val path = memo.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files
        .createTempDirectory("graft-dsir-artifact").toString
      save(TextAnalysis.dsirHead(Tables.load(spark, dir, "documents")), p)
      p
    })
    load(spark, path)
  }

  /** Persist a trained score table as a parquet artifact. */
  def save(head: DataFrame, path: String): Unit =
    head.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a previously [[save]]d score-table artifact. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Test seam: drop all memoized score tables. */
  private[graft] def clear(): Unit = memo.clear()
}
