package graft.exts

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Trained BPE merge-table lifecycle: train ONCE per (corpus, rounds),
  * reuse across every encode batch — the same artifact split as
  * [[IvfIndex]] (centroids) and [[BloomIndex]] (membership sketch). A
  * tokenizer's merge table is the canonical ship-an-artifact case: it is
  * a handful of rows, it must be bit-stable across the whole corpus
  * lifetime (re-training on grown data would re-tokenize history), and
  * every ingest batch replays it unchanged.
  *
  *  - [[rules]] — [[ArtifactStore]]-backed: the first resolve per
  *    (corpus snapshot, rounds) trains via [[TextAnalysis.bpeTrain]] and
  *    COMMITS the tiny merge table (rounds rows) as a parquet artifact;
  *    a fresh session or a separate job (the encode side vs the nightly
  *    trainer) loads the committed entry instead of re-training — the
  *    bit-stability a tokenizer demands now holds across serving
  *    restarts, not just within one JVM. Within a session the collected
  *    rows memoize on the entry path, so later calls rebuild a
  *    LocalRelation with zero Spark jobs. Strings and integer counts
  *    round-trip parquet exactly, so every oracle hash is unchanged.
  *  - [[save]]/[[load]] — the raw persist/open seam the artifact entry
  *    is built through.
  */
object BpeIndex {

  private[graft] val Kind = "bpe-merges"

  /** (round, pa, pb, merged, cnt) — a tuple rather than a nested case
    * class so the LocalRelation encoder stays on the codegen path (Janino
    * cannot resolve object-private classes and falls back to interpreted
    * serialization). */
  private type Rule = (Int, String, String, String, Long)

  // session memo: committed entry path → collected merge rows
  private val memo = new ConcurrentHashMap[String, Seq[Rule]]()

  /** The committed merge-table artifact for (`dir`, rounds) — first call
    * per corpus snapshot trains and commits; later calls (any session,
    * any job) resolve the existing entry. */
  def path(spark: SparkSession, dir: String,
      rounds: Int = TextAnalysis.BpeRounds): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "documents"), variant = s"r$rounds") { staging =>
      save(TextAnalysis.bpeTrain(
        Tables.load(spark, dir, "documents"), rounds), s"$staging/rules")
    }

  /** Trained merge table for the `documents` table under `dir`,
    * artifact-backed; the store key carries [[Tables.version]] so a
    * corpus rewrite under the same path re-trains instead of serving
    * stale merges. Schema: (round INT, pa, pb, merged STRING,
    * cnt BIGINT), identical to [[TextAnalysis.bpeTrain]]. */
  def rules(spark: SparkSession, dir: String,
      rounds: Int = TextAnalysis.BpeRounds): DataFrame = {
    val p = path(spark, dir, rounds)
    val rows = memo.computeIfAbsent(p, _ =>
      load(spark, s"$p/rules").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .sortBy(_._1).toIndexedSeq)
    fromRows(spark, rows)
  }

  private def fromRows(spark: SparkSession, rows: Seq[Rule]): DataFrame = {
    import spark.implicits._
    rows.toDF("round", "pa", "pb", "merged", "cnt")
  }

  /** Persist the merge table as a single-file parquet artifact. */
  def save(rules: DataFrame, path: String): Unit =
    rules.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a previously [[save]]d merge-table artifact. */
  def load(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.readCached(spark, path)

  /** Scoped cold-path eviction for this (corpus snapshot, rounds) entry
    * (memo + disk). */
  private[graft] def evict(spark: SparkSession, dir: String,
      rounds: Int = TextAnalysis.BpeRounds): Unit = {
    val version = Tables.version(dir, "documents")
    memo.remove(ArtifactStore.locate(spark, Kind, dir, version,
      variant = s"r$rounds"))
    ArtifactStore.evict(spark, Kind, dir, version, variant = s"r$rounds")
  }

  /** Test seam: drop all memoized merge tables (on-disk artifacts
    * remain — use [[evict]] to remove those). */
  private[graft] def clear(): Unit = memo.clear()
}
