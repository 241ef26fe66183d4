package graft.exts

import java.io.{BufferedInputStream, BufferedOutputStream, File,
  FileInputStream, FileOutputStream}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.Tables

/** Corpus content-sketch lifecycle: build the Bloom filter ONCE per corpus
  * snapshot, reuse across every ingest batch — the [[IvfIndex]] pattern
  * applied to membership instead of similarity.
  *
  * The sketch covers `xxhash64(text)` of every corpus document at the
  * configured false-positive rate. It has NO false negatives, so a
  * negative probe is a definite "not in corpus"; positives are settled by
  * the exact verification join ([[Dedup.incrementalNew]]). Size is
  * ~1.2 bytes/key at 1% fpp — a few GB covers 10⁹ documents, which is
  * broadcast/artifact scale, vs re-shuffling corpus keys on EVERY batch
  * with a plain anti-join.
  *
  *  - [[sketch]] — session-scoped memo keyed by (applicationId, dir, fpp):
  *    first call scans the corpus once; later calls are free.
  *  - [[save]]/[[load]] — the sketch as an on-disk index artifact (the
  *    spark-sketch serialized form), built at ingest, loaded by every
  *    later batch job or streaming query.
  */
object BloomIndex {

  private final case class Key(app: String, dir: String, fpp: Double,
      version: Long)

  private val memo = new ConcurrentHashMap[Key, BloomFilter]()

  /** Content sketch of the `documents` table under `dir` — memoized.
    * The key carries [[Tables.version]] of the table's file listing, so
    * a corpus rewrite under the same path re-builds the sketch instead
    * of silently probing a stale one (Bloom false negatives for keys
    * added after the old build would pass landed docs as new). */
  def sketch(spark: SparkSession, dir: String,
      fpp: Double = 0.01): BloomFilter = {
    val key = Key(spark.sparkContext.applicationId, dir, fpp,
      Tables.version(dir, "documents"))
    memo.computeIfAbsent(key, _ =>
      build(Tables.load(spark, dir, "documents"), fpp))
  }

  /** Build a content sketch from any frame with a `text` column. The
    * expected-item count is the corpus count (one metadata-cheap job) so
    * the filter is sized to hold its target fpp. */
  def build(corpus: DataFrame, fpp: Double = 0.01): BloomFilter = {
    val n = math.max(corpus.count(), 1L)
    corpus.select(xxhash64(col("text")).as("h")).stat.bloomFilter("h", n, fpp)
  }

  /** Persist the sketch as an on-disk artifact (spark-sketch wire form). */
  def save(bf: BloomFilter, path: String): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new BufferedOutputStream(new FileOutputStream(f))
    try bf.writeTo(out) finally out.close()
  }

  /** Load a previously [[save]]d sketch artifact. */
  def load(path: String): BloomFilter = {
    val in = new BufferedInputStream(new FileInputStream(path))
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Test seam: drop all memoized sketches. */
  private[graft] def clear(): Unit = memo.clear()
}
