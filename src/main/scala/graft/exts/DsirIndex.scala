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
  * driver literal; it is still persisted as a parquet artifact under a
  * DETERMINISTIC path derived from (corpus dir, [[Tables.version]]), so a
  * fresh session — or another job entirely, the ingest gate vs the
  * nightly trainer — resolves the same path and [[load]]s without
  * re-running the corpus scan. The version in the path means a corpus
  * rewrite under the same dir re-trains instead of serving a stale score
  * table; the in-process memo only skips the exists() probe.
  */
object DsirIndex {

  private final case class Key(dir: String, version: Long)

  private val memo = new ConcurrentHashMap[Key, String]()

  /** Deterministic artifact path for a corpus snapshot: any session (or
    * separate JVM) training the same (dir, version) resolves here. */
  private def artifactPath(dir: String, version: Long): java.nio.file.Path =
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-dsir-index",
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
        + s"-v$version")

  /** The trained (term, s) score table for the `documents` table under
    * `dir`, parquet-backed. First call per corpus snapshot ANYWHERE on
    * this host trains and [[save]]s; later calls — including from a
    * fresh session or a different job — [[load]] (zero training jobs,
    * gated on the parquet writer's _SUCCESS marker). Integer scores
    * round-trip parquet exactly, so results are bit-identical to an
    * inline [[TextAnalysis.dsirHead]]. */
  def scores(spark: SparkSession, dir: String): DataFrame = {
    val key = Key(dir, Tables.version(dir, "documents"))
    val path = memo.computeIfAbsent(key, k => {
      val p = artifactPath(k.dir, k.version)
      if (!java.nio.file.Files.exists(p.resolve("_SUCCESS")))
        save(TextAnalysis.dsirHead(Tables.load(spark, dir, "documents")),
          p.toString)
      p.toString
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
