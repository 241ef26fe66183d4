package graft.exts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persisted media near-dup PAIR artifact: run all three media matchers
  * ONCE per corpus snapshot — image canonical-raster near-dup
  * ([[Multimodal.mmDupNear]]), video shared-footage
  * ([[Multimodal.mmVideoDups]]), audio shared-clip
  * ([[Multimodal.mmAudioDups]]) — and commit their tagged pair union to
  * the shared [[ArtifactStore]], exactly the [[KnnIndex]] edges /
  * components split applied to the media side: the matchers are ~all
  * codec work (every asset decoded three times across three fixtures),
  * and the disposition consumer ([[Multimodal.mmMediaVerdict]]) needs
  * only the match-sized pair frame. A serving session, a fresh JVM, or
  * a separate job resolves the committed entry and never decodes the
  * corpus; the [[Tables.version]] key means a corpus rewrite re-matches
  * instead of serving stale pairs, and the store's manifest + atomic
  * publish carry the usual identity/torn-write guarantees.
  *
  * Schema: (a_id, b_id, modality ∈ img|vid|aud), one row per
  * (matcher, pair) — longs and a tag string, so the parquet round-trip
  * is exact and the verdict consuming the artifact is bit-identical to
  * one recomputing the matchers inline.
  */
object MediaIndex {

  private[exts] val Kind = "media-pairs"

  /** The committed pair artifact for the corpus under `dir` — first
    * call per corpus snapshot runs the three matchers and commits;
    * later calls (any session, any job) resolve the existing entry. */
  def path(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, Kind, dir,
      Tables.version(dir, "documents")) { staging =>
      save(buildPairs(spark, dir), staging)
    }

  /** One tagged row per (matcher, pair) — the build side (all codec
    * passes live here; each matcher's scale shape is its own key's). */
  private[graft] def buildPairs(spark: SparkSession,
      dir: String): DataFrame = {
    val img = Multimodal.mmDupNear(spark, dir)
      .select(col("a_id"), col("b_id"))
      .withColumn("modality", lit("img"))
    val vid = Multimodal.mmVideoDups(spark, dir)
      .select(col("a_id"), col("b_id")).distinct()
      .withColumn("modality", lit("vid"))
    val aud = Multimodal.mmAudioDups(spark, dir)
      .select(col("a_id"), col("b_id")).distinct()
      .withColumn("modality", lit("aud"))
    img.unionByName(vid).unionByName(aud)
  }

  /** Persist a tagged pair frame. */
  def save(pairs: DataFrame, path: String): Unit =
    pairs.write.mode("overwrite").parquet(s"$path/pairs")

  /** Load a previously [[save]]d pair frame. */
  def load(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.readCached(spark, s"$path/pairs")

  /** The corpus's media near-dup pairs, artifact-backed. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    load(spark, path(spark, dir))

  // ---- the derived COMPONENTS artifact (the KnnIndex edges →
  //      components precedent on the media side: the disposition
  //      consumer's dominant per-query cost is the min-label loop over
  //      the pair union, and the loop's fixpoint is a pure function of
  //      the committed pairs — so it runs once per corpus snapshot) ----

  private[exts] val CompKind = "media-components"

  /** The committed component frame over the [[pairs]] artifact:
    * (doc_id, component, is_canonical) for every asset in ≥1 pair —
    * [[Dedup.dupComponents]]' fixpoint, longs + a boolean, parquet
    * round-trip bit-exact. Built on first use; the component loop runs
    * once per corpus snapshot instead of once per verdict. */
  def componentsPath(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, CompKind, dir,
      Tables.version(dir, "documents")) { staging =>
      Dedup.dupComponents(pairs(spark, dir)
          .select(col("a_id"), col("b_id")).distinct())
        .write.mode("overwrite").parquet(s"$staging/components")
    }

  /** The corpus's media-dup component frame, artifact-backed. */
  def components(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.readCached(spark,
      s"${componentsPath(spark, dir)}/components")

  /** Evict only the derived components artifact (test seam: after
    * doctoring the pair artifact in place, the derived frame must be
    * re-derived — in production both artifacts share the corpus
    * version, so they can never drift apart). */
  private[graft] def evictComponents(spark: SparkSession,
      dir: String): Unit =
    ArtifactStore.evict(spark, CompKind, dir,
      Tables.version(dir, "documents"))

  // ---- the CORPUS SIGNATURE artifact (the match-key side an
  //      incremental ingest gate probes: decode the corpus once per
  //      snapshot, serve every incoming batch) ----

  private[exts] val SigKind = "canon-sigs"

  /** The committed canonical-signature artifact for the corpus under
    * `dir`: one 6-long row per asset ([[Multimodal.CanonSig]] schema —
    * exact longs, parquet round-trip bit-identical). First call per
    * corpus snapshot decodes and commits; later calls (any session, any
    * job) resolve the existing entry. */
  def sigsPath(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, SigKind, dir,
      Tables.version(dir, "documents")) { staging =>
      Multimodal.canonicalSignatures(
          Multimodal.pngAssetsNearDups(spark, dir)).toDF()
        .write.mode("overwrite").parquet(s"$staging/sigs")
    }

  /** The corpus's canonical signatures, artifact-backed. */
  def sigs(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.readCached(spark, s"${sigsPath(spark, dir)}/sigs")

  // ---- the VIDEO / AUDIO per-position fingerprint artifacts (the
  //      corpus side of the run-matched incremental ingest gates:
  //      decode the corpus once per snapshot, probe every incoming
  //      clip/track batch against signatures only) ----

  private[exts] val VidSigKind = "vid-sigs"
  private[exts] val AudSigKind = "aud-sigs"

  /** The committed per-FRAME video fingerprint artifact
    * ([[Multimodal.GifFrameHash]] schema — exact longs, parquet
    * round-trip bit-identical): one decode pass per corpus snapshot,
    * served to [[Multimodal.mmVidIncrementalOver]]'s run probe. */
  def vidSigsPath(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, VidSigKind, dir,
      Tables.version(dir, "documents")) { staging =>
      Multimodal.videoFingerprints(
          Multimodal.gifClipAssets(spark, dir)).toDF()
        .write.mode("overwrite").parquet(s"$staging/sigs")
    }

  /** The corpus's per-frame video fingerprints, artifact-backed. */
  def vidSigs(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.readCached(spark, s"${vidSigsPath(spark, dir)}/sigs")

  /** The committed per-WINDOW audio fingerprint artifact
    * ([[Multimodal.WavWinFp]] schema), the audio gate's corpus side. */
  def audSigsPath(spark: SparkSession, dir: String): String =
    ArtifactStore.resolve(spark, AudSigKind, dir,
      Tables.version(dir, "documents")) { staging =>
      Multimodal.audioWindowFps(
          Multimodal.wavClipAssets(spark, dir)).toDF()
        .write.mode("overwrite").parquet(s"$staging/sigs")
    }

  /** The corpus's per-window audio fingerprints, artifact-backed. */
  def audSigs(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.readCached(spark, s"${audSigsPath(spark, dir)}/sigs")

  /** Scoped cold-path eviction for this corpus snapshot (memo + disk,
    * all five artifact kinds). */
  private[graft] def evict(spark: SparkSession, dir: String): Unit = {
    ArtifactStore.evict(spark, Kind, dir, Tables.version(dir, "documents"))
    ArtifactStore.evict(spark, CompKind, dir,
      Tables.version(dir, "documents"))
    ArtifactStore.evict(spark, SigKind, dir,
      Tables.version(dir, "documents"))
    ArtifactStore.evict(spark, VidSigKind, dir,
      Tables.version(dir, "documents"))
    ArtifactStore.evict(spark, AudSigKind, dir,
      Tables.version(dir, "documents"))
  }

  /** Test seam: drop memoized paths (delegates to the shared store). */
  private[graft] def clear(): Unit = ArtifactStore.clear()
}
