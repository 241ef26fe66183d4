package graft.stream

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.{Dedup, Multimodal}

/** The event-driven maintenance loop closed over the MEDIA INDEX — the
  * reference's commit → threshold → rebuild pattern
  * (AwsTableManagementMetricsEvaluator.java:64-140) on the fourth index
  * family (IVF: [[IndexLoop]]; BM25: [[LexIndexLoop]]; graph:
  * [[GraphIndexLoop]]; media signatures: here):
  *
  *  1. INGEST — each micro-batch of (doc_id, png) assets decodes to
  *     canonical signatures (BATCH work only) and is gated by the
  *     banded-Hamming probe against the CURRENT serving set — the
  *     committed version's signatures PLUS every already-admitted
  *     pending batch, so a duplicate of an asset admitted seconds ago
  *     is caught before any rebuild. Duplicates are dispositioned with
  *     a canonical pointer and NOT landed; novel assets' signatures
  *     land as a batch-tagged pending parquet.
  *  2. DRIFT SIGNAL — the admitted count since the last rebuild, pure
  *     driver metadata (the analog of the reference's commit count).
  *  3. DECIDE — admitted ≥ `rebuildAfter` trips the threshold; deciding
  *     is free every batch.
  *  4. ACT — pending merges into a FRESH immutable version directory
  *     (`v<k+1>/sigs` — the previous version stays intact for any
  *     in-flight reader, the [[GraphIndexLoop]] epoch discipline), the
  *     near-pair frame and component fixpoint recompute over
  *     SIGNATURES ONLY (zero codec work — the index's whole point), the
  *     serving [[State]] swaps atomically, and the health row the
  *     rebuild policy reads is emitted ON the loop (the reference's
  *     evaluator emits metrics on the maintenance path, not as a
  *     separate query).
  *
  * Batch application is idempotent: pending lands in batch-tagged dirs
  * written with overwrite, per-batch state markers persist the three
  * counters, and a replayed batch id ≤ the recorded last is skipped —
  * a checkpointed restart re-delivering a batch is a no-op.
  */
object MediaIndexLoop {

  /** Serving-state snapshot — all driver metadata. */
  final case class State(version: Long, nAssets: Long, nPending: Long,
      lastBatchId: Long)

  /** The atomically-swapped serving handle. */
  final class ServingMedia private[MediaIndexLoop] (
      private[stream] val root: String, initial: State) {
    private val ref = new AtomicReference[State](initial)
    def snapshot: State = ref.get()
    def version: Long = ref.get().version
    def nAssets: Long = ref.get().nAssets
    /** The CURRENT serving signature frame: the committed version's
      * sigs plus every admitted pending batch — one consistent read
      * per call (the state is snapshotted once). */
    def sigs(spark: SparkSession): DataFrame = {
      val s = ref.get()
      val base = spark.read.parquet(sigsDir(root, s.version))
      pendingDirs(root, s.version).foldLeft(base)((acc, p) =>
        acc.unionByName(spark.read.parquet(p.toString)))
    }
    private[stream] def state: State = ref.get()
    private[stream] def update(s: State): Unit = ref.set(s)
  }

  private def sigsDir(root: String, v: Long): String =
    s"$root/v$v/sigs"
  private def pendingRoot(root: String, v: Long): Path =
    Paths.get(s"$root/v$v/pending")
  private def pendingDirs(root: String, v: Long): Seq[Path] = {
    val pr = pendingRoot(root, v)
    if (!Files.isDirectory(pr)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val ls = Files.list(pr)
      try ls.iterator().asScala.toSeq.filter(Files.isDirectory(_))
        .sortBy(_.getFileName.toString)
      finally ls.close()
    }
  }

  private def metaDir(root: String): Path = Paths.get(root, "_meta")
  private def metaJson(s: State): String =
    s"""{"version":${s.version},"nAssets":${s.nAssets},""" +
      s""""nPending":${s.nPending},"lastBatchId":${s.lastBatchId}}"""
  private def writeMeta(root: String, s: State): Unit = {
    val dir = metaDir(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(
      s"state-b${s.lastBatchId}.json.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, metaJson(s).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(s"state-b${s.lastBatchId}.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
  private def readMeta(root: String): Option[State] = {
    val dir = metaDir(root)
    if (!Files.isDirectory(dir)) return None
    import scala.jdk.CollectionConverters._
    val ls = Files.list(dir)
    val files =
      try ls.iterator().asScala.toSeq
        .filter(_.getFileName.toString.matches("state-b-?\\d+\\.json"))
      finally ls.close()
    if (files.isEmpty) None
    else {
      val latest = files.maxBy(p => p.getFileName.toString
        .stripPrefix("state-b").stripSuffix(".json").toLong)
      val j = new String(Files.readAllBytes(latest), "UTF-8")
      def f(k: String): Long =
        s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).get.group(1).toLong
      Some(State(f("version"), f("nAssets"), f("nPending"),
        f("lastBatchId")))
    }
  }

  /** Bootstrap version 0 from a corpus signature frame. */
  def build(spark: SparkSession, corpusSigs: DataFrame,
      root: String): ServingMedia = {
    corpusSigs.write.mode("overwrite").parquet(sigsDir(root, 0L))
    val st = State(0L, corpusSigs.count(), 0L, -1L)
    writeMeta(root, st)
    new ServingMedia(root, st)
  }

  /** Restore a serving handle from the self-persisted state markers —
    * fails loudly if the recorded version's layout is missing (a stale
    * or torn export must not serve silently). */
  def reattach(spark: SparkSession, root: String): ServingMedia = {
    val st = readMeta(root).getOrElse(
      throw new IllegalStateException(
        s"mediaIndexLoop: no state markers under $root"))
    require(Files.isDirectory(Paths.get(sigsDir(root, st.version))),
      s"mediaIndexLoop: recorded v${st.version} layout missing under " +
        s"$root — stale export")
    new ServingMedia(root, st)
  }

  /** Apply ONE asset batch: gate, land survivors, maybe rebuild.
    * Returns the per-asset disposition frame (the
    * [[Multimodal.mmDupIncrementalOver]] shape). Idempotent: a batch id
    * ≤ the recorded last is a no-op returning an empty frame. */
  private[graft] def applyBatch(spark: SparkSession,
      serving: ServingMedia, batch: DataFrame, batchId: Long,
      rebuildAfter: Long,
      onHealth: (Long, DataFrame) => Unit): DataFrame = {
    import spark.implicits._
    val st = serving.state
    if (batchId <= st.lastBatchId)
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("batch_id", "n_matches", "matched_id", "min_hamming",
          "is_new")
    val assets = batch.select("doc_id", "png").as[Multimodal.PngAsset]
    val batchSigs = Multimodal.canonicalSignatures(assets).toDF()
      .localCheckpoint(false)
    val agg = Multimodal
      .nearMatchesAgainst(serving.sigs(spark), batchSigs)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("m_n"), min(col("corpus_id")).as("m_id"),
        min(col("hamming")).as("m_ham"))
    val verdicts = batchSigs.select(col("doc_id").as("batch_id"))
      .join(agg.hint("shuffle_hash"), Seq("batch_id"), "left")
      .select(col("batch_id"),
        coalesce(col("m_n"), lit(0L)).as("n_matches"),
        coalesce(col("m_id"), lit(-1L)).as("matched_id"),
        coalesce(col("m_ham"), lit(-1L)).as("min_hamming"),
        col("m_n").isNull.cast("long").as("is_new"))
      .localCheckpoint(false)
    // land the NOVEL assets' signatures as a batch-tagged pending dir
    // (overwrite ⇒ a torn earlier attempt is replaced, never doubled)
    val admitted = batchSigs.join(
      verdicts.filter(col("is_new") === 1L)
        .select(col("batch_id").as("doc_id")).hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")
    val nAdmitted = admitted.count()
    if (nAdmitted > 0)
      admitted.write.mode("overwrite").parquet(
        s"${pendingRoot(serving.root, st.version)}/batch-$batchId")
    var next = State(st.version, st.nAssets + nAdmitted,
      st.nPending + nAdmitted, batchId)
    if (next.nPending >= rebuildAfter) {
      // ACT: merge into a fresh immutable version dir; recompute the
      // pair frame + component fixpoint over SIGNATURES ONLY; emit the
      // health row the policy reads
      val sv = new ServingMedia(serving.root, next) // read sigs∪pending
      val merged = sv.sigs(spark).localCheckpoint(false)
      merged.write.mode("overwrite")
        .parquet(sigsDir(serving.root, next.version + 1))
      val pairs = Multimodal.nearPairs(merged).localCheckpoint(false)
      val comp = Dedup.dupComponents(
        pairs.select(col("a_id"), col("b_id")))
      next = State(next.version + 1, next.nAssets, 0L, batchId)
      onHealth(next.version, healthOver(merged, pairs, comp))
    }
    writeMeta(serving.root, next)
    serving.update(next)
    verdicts
  }

  /** The loop's health row (the media_health shape over the serving
    * signature index: image-signature pairs only — the loop maintains
    * the signature index, not the video/audio matchers). */
  private[graft] def healthOver(sigs: DataFrame, pairs: DataFrame,
      comp: DataFrame): DataFrame = {
    val nAssets = sigs.agg(count(lit(1)).as("n_assets"))
    val nPairs = pairs.agg(count(lit(1)).as("n_pairs"))
    val dup = pairs.select(col("a_id").as("doc_id"))
      .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
      .agg(count(lit(1)).as("n_dup_assets"))
    val c = comp.groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_components"),
        coalesce(max(col("sz")), lit(0L)).as("max_component"))
    nAssets.crossJoin(broadcast(nPairs)).crossJoin(broadcast(dup))
      .crossJoin(broadcast(c))
      .select(col("n_assets"), col("n_pairs"), col("n_dup_assets"),
        expr("n_dup_assets * 1000 div n_assets").as("dup_permille"),
        col("n_components"), col("max_component"))
  }

  /** Run the loop over a streaming (doc_id, png) asset frame. */
  def start(spark: SparkSession, serving: ServingMedia,
      assets: DataFrame, rebuildAfter: Long,
      sink: (DataFrame, Long) => Unit,
      onHealth: (Long, DataFrame) => Unit = (_, _) => ()): StreamingQuery =
    assets.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(applyBatch(spark, serving, batch, batchId, rebuildAfter,
            onHealth), batchId)
        }
      }
      .start()
}
