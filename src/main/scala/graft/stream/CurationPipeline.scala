package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.exts.{Dedup, Sampling, TextAnalysis}

/** Streaming corpus curation: the ingest-time shape of the batch
  * `corpus_curate` pipeline. Documents flow through
  *
  *   quality filter → exact dedup → shard assignment → partitioned sink
  *
  * entirely as a Structured Streaming query: the filter and shard
  * assignment are stateless per-row projections (fused into the source
  * scan), and the only state is the dedup's content-hash set, bounded by
  * the watermark horizon (`dropDuplicatesWithinWatermark` keyed on an
  * 8-byte xxhash64 — state tracks ingest rate × horizon, never corpus
  * size). The sink appends `shard=<k>/` parquet partitions with
  * exactly-once file commits via the checkpoint, so a crashed run resumes
  * without duplicating output — the always-on front door of a training
  * corpus, with the batch operators (near-dup sweeps, mixing, packing)
  * running behind it on the landed data.
  */
object CurationPipeline {

  /** @param docs streaming frame with at least (doc_id, text,
    *   ingest_ts_ms); extra columns pass through the filter untouched but
    *   only (doc_id, text, ingest_ts_ms, shard) reach the sink. */
  def run(docs: DataFrame, outDir: String, checkpointDir: String,
      watermarkDelay: String = "10 minutes"): StreamingQuery = {
    val kept = TextAnalysis.qualitySignals(docs)
      .filter(col("keep"))
      .select(col("doc_id"), col("text"), col("ingest_ts_ms"))
    Sampling.shardPlan(Dedup.streamingDedup(kept, watermarkDelay))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("shard")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
