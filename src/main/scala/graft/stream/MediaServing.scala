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
}
