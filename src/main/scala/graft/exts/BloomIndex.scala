package graft.exts

import java.io.{BufferedInputStream, BufferedOutputStream}
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
  *  - [[sketch]] — [[ArtifactStore]]-backed: the first resolve per
  *    (corpus snapshot, fpp) scans the corpus once and COMMITS the
  *    serialized sketch; a fresh session or a separate job (the ingest
  *    gate vs the nightly builder) loads the committed bytes instead of
  *    re-scanning. Within a session the deserialized filter memoizes on
  *    the entry path, so later calls are free. The spark-sketch wire
  *    form round-trips exactly, so probe behavior is bit-identical to a
  *    fresh build.
  *  - [[save]]/[[load]] — the raw persist/open seam the artifact entry
  *    is built through (the spark-sketch serialized form).
  */
object BloomIndex {

  private[graft] val Kind = "bloom-sketch"

  // session memo: committed entry path → deserialized filter
  private val memo = new ConcurrentHashMap[String, BloomFilter]()

  /** The committed sketch artifact for (`dir`, fpp) — first call per
    * corpus snapshot builds and commits; later calls (any session, any
    * job) resolve the existing entry. */
  def path(spark: SparkSession, dir: String,
      fpp: Double = 0.01): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "documents"), variant = s"fpp$fpp") { staging =>
      save(build(Tables.load(spark, dir, "documents"), fpp),
        s"$staging/sketch.bloom")
    }

  /** Content sketch of the `documents` table under `dir`,
    * artifact-backed. The store key carries [[Tables.version]] of the
    * table's file listing, so a corpus rewrite under the same path
    * re-builds the sketch instead of silently probing a stale one
    * (Bloom false negatives for keys added after the old build would
    * pass landed docs as new). */
  def sketch(spark: SparkSession, dir: String,
      fpp: Double = 0.01): BloomFilter = {
    val p = path(spark, dir, fpp)
    memo.computeIfAbsent(p, _ => load(s"$p/sketch.bloom"))
  }

  /** Build a content sketch from any frame with a `text` column. The
    * expected-item count is the corpus count (one metadata-cheap job) so
    * the filter is sized to hold its target fpp. */
  def build(corpus: DataFrame, fpp: Double = 0.01): BloomFilter = {
    val n = math.max(corpus.count(), 1L)
    corpus.select(xxhash64(col("text")).as("h")).stat.bloomFilter("h", n, fpp)
  }

  /** Persist the sketch as an on-disk artifact (spark-sketch wire
    * form) — through the Hadoop FileSystem seam, so the store root may
    * live on any registered scheme (r16, with [[ArtifactStore]]). */
  def save(bf: BloomFilter, path: String): Unit = {
    val (fs, p) = ArtifactStore.resolvePath(path)
    fs.mkdirs(p.getParent)
    val out = new BufferedOutputStream(fs.create(p, true))
    try bf.writeTo(out) finally out.close()
  }

  /** Load a previously [[save]]d sketch artifact. */
  def load(path: String): BloomFilter = {
    val (fs, p) = ArtifactStore.resolvePath(path)
    val in = new BufferedInputStream(fs.open(p))
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Scoped cold-path eviction for this (corpus snapshot, fpp) entry
    * (memo + disk). */
  private[graft] def evict(spark: SparkSession, dir: String,
      fpp: Double = 0.01): Unit = {
    val version = Tables.version(dir, "documents")
    memo.remove(ArtifactStore.locate(spark, Kind, dir, version,
      variant = s"fpp$fpp"))
    ArtifactStore.evict(spark, Kind, dir, version, variant = s"fpp$fpp")
  }

  /** Test seam: drop all memoized sketches (on-disk artifacts remain —
    * use [[evict]] to remove those). */
  private[graft] def clear(): Unit = memo.clear()
}
