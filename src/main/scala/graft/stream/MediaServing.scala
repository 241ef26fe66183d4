package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.Multimodal

/** Online media ingest gate: a STREAM of incoming image assets against
  * the STATIC persisted canonical-signature artifact — the
  * [[Bm25Serving]]/[[AnnServing]]/[[GraphServing]] sibling for the
  * media side, closing the same build/apply/serve lifecycle for the
  * [[graft.exts.MediaIndex]] signature index (build: one corpus decode
  * per snapshot; apply: mm_dup_incremental; serve: here).
  *
  * Each micro-batch of (doc_id, png) assets runs the exact batch gate
  * ([[Multimodal.mmDupIncrementalOver]]) via `foreachBatch`: decode the
  * BATCH only, banded-Hamming match against the committed corpus
  * signatures, per-asset disposition out. Per-asset rows are
  * independent, so stream results are bit-identical to the batch path
  * under any arrival split — StreamSpec asserts that equality. The
  * corpus is never decoded on the serve side; a corpus rewrite (new
  * [[graft.Tables.version]]) resolves a fresh artifact at the next
  * batch's probe.
  *
  * @param assets streaming (doc_id BIGINT, png BINARY) frame
  * @param sink   called once per micro-batch with (verdicts, batchId);
  *               verdicts carry (batch_id, n_matches, matched_id,
  *               min_hamming, is_new)
  */
object MediaServing {
  def start(spark: SparkSession, dir: String, assets: DataFrame,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    assets.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import spark.implicits._
          sink(Multimodal.mmDupIncrementalOver(spark, dir,
            batch.select("doc_id", "png").as[Multimodal.PngAsset]),
            batchId)
        }
      }
      .start()

  /** The whole-lake serve path (r15): a streaming (doc_id, modality ∈
    * img|vid|aud, media) frame gated per micro-batch against the THREE
    * committed corpus artifacts — canonical signatures for images,
    * per-frame / per-window fingerprints for clips and tracks. Each
    * modality runs its exact batch gate, so stream results are
    * bit-identical to the registered mm_dup_incremental /
    * mm_vid_incremental / mm_aud_incremental keys under any arrival
    * split (StreamSpec asserts all three equalities). Verdicts:
    * (batch_id, modality, n_matches, matched_id, metric, is_new) —
    * metric is the min Hamming for images, the longest shared run for
    * the run-matched modalities. */
  def startMedia(spark: SparkSession, dir: String, assets: DataFrame,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    assets.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) sink(gateBatch(spark, dir, batch), batchId)
      }
      .start()

  /** The cross-modal PAIR serve path (r16): a streaming (doc_id, png,
    * caption) frame gated per micro-batch on BOTH sides — the image
    * against the committed corpus signature artifact, the caption
    * against the corpus caption md5 set — composed into the curation
    * disposition ([[Multimodal.mmPairGateOver]], the registered
    * mm_pair_gate semantics). Per-pair rows are independent, so stream
    * results are bit-identical to the batch key under any arrival
    * split (StreamSpec asserts the equality). Verdicts: (batch_id,
    * n_matches, matched_id, min_hamming, cap_dup, disposition). */
  def startPairs(spark: SparkSession, dir: String, pairs: DataFrame,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import spark.implicits._
          import org.apache.spark.sql.functions.col
          sink(Multimodal.mmPairGateOver(spark, dir,
            batch.select(col("doc_id"), col("png"))
              .as[Multimodal.PngAsset],
            batch.select(col("doc_id").as("batch_id"), col("caption"))),
            batchId)
        }
      }
      .start()

  /** [[startPairs]] with the caption NEAR-dup tier (r17) — the serve
    * form of the registered mm_pair_gate_near key
    * ([[Multimodal.mmPairGateNearOver]]): the caption side runs the
    * df-capped shingle-Jaccard gate against the distinct corpus caption
    * index instead of (only) the md5 set, so a tail-edited recaption of
    * a duplicate image DROPS at ingest rather than queueing for
    * recapture. The near index derives from the corpus alone, so
    * per-pair rows stay independent and stream ≡ batch under any
    * arrival split (StreamSpec asserts the equality). Verdicts:
    * (batch_id, n_matches, matched_id, min_hamming, cap_dup,
    * cap_near_matches, cap_dup_near, disposition). */
  def startPairsNear(spark: SparkSession, dir: String, pairs: DataFrame,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import spark.implicits._
          import org.apache.spark.sql.functions.col
          sink(Multimodal.mmPairGateNearOver(spark, dir,
            batch.select(col("doc_id"), col("png"))
              .as[Multimodal.PngAsset],
            batch.select(col("doc_id").as("batch_id"), col("caption"))),
            batchId)
        }
      }
      .start()

  /** One mixed-modality batch through the three artifact probes. */
  private[graft] def gateBatch(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def slice(m: String): DataFrame =
      batch.filter(col("modality") === m)
        .select(col("doc_id"), col("media"))
    val gates: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("img", s => Multimodal.mmDupIncrementalOver(spark, dir,
          s.toDF("doc_id", "png").as[Multimodal.PngAsset])
        .select(col("batch_id"), lit("img").as("modality"),
          col("n_matches"), col("matched_id"),
          col("min_hamming").as("metric"), col("is_new"))),
      ("vid", s => Multimodal.mmVidIncrementalOver(spark, dir,
          s.toDF("doc_id", "gif").as[Multimodal.GifAsset])
        .select(col("batch_id"), lit("vid").as("modality"),
          col("n_matches"), col("matched_id"),
          col("best_run").as("metric"), col("is_new"))),
      ("aud", s => Multimodal.mmAudIncrementalOver(spark, dir,
          s.toDF("doc_id", "wav").as[Multimodal.WavAsset])
        .select(col("batch_id"), lit("aud").as("modality"),
          col("n_matches"), col("matched_id"),
          col("best_run").as("metric"), col("is_new"))))
    gates.flatMap { case (m, gate) =>
      val s = slice(m)
      if (s.isEmpty) None else Some(gate(s))
    }.reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(Long, String, Long, Long, Long, Long)]
        .toDF("batch_id", "modality", "n_matches", "matched_id",
          "metric", "is_new"))
  }
}
