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
  *  - [[rules]] — session-scoped memo keyed by (applicationId, dir,
  *    rounds). First call trains via [[TextAnalysis.bpeTrain]] and
  *    collects the tiny merge table (rounds rows); later calls rebuild a
  *    LocalRelation with zero Spark jobs. Values are bit-identical to a
  *    fresh training run, so every oracle hash is unchanged.
  *  - [[save]]/[[load]] — the on-disk artifact form (build in the ingest
  *    job, load in every encode job).
  */
object BpeIndex {

  private final case class Key(app: String, dir: String, rounds: Int,
      version: Long)

  /** (round, pa, pb, merged, cnt) — a tuple rather than a nested case
    * class so the LocalRelation encoder stays on the codegen path (Janino
    * cannot resolve object-private classes and falls back to interpreted
    * serialization). */
  private type Rule = (Int, String, String, String, Long)

  private val memo = new ConcurrentHashMap[Key, Seq[Rule]]()

  /** Trained merge table for the `documents` table under `dir` —
    * memoized; the key carries [[Tables.version]] so a corpus rewrite
    * under the same path re-trains instead of serving stale merges.
    * Schema: (round INT, pa, pb, merged STRING, cnt BIGINT),
    * identical to [[TextAnalysis.bpeTrain]]. */
  def rules(spark: SparkSession, dir: String,
      rounds: Int = TextAnalysis.BpeRounds): DataFrame = {
    val key = Key(spark.sparkContext.applicationId, dir, rounds,
      Tables.version(dir, "documents"))
    val rows = memo.computeIfAbsent(key, _ =>
      TextAnalysis.bpeTrain(Tables.load(spark, dir, "documents"), rounds)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .toIndexedSeq)
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
    spark.read.parquet(path)

  /** Test seam: drop all memoized merge tables. */
  private[graft] def clear(): Unit = memo.clear()
}
