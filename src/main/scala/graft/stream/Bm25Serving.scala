package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.Bm25Index

/** Online lexical retrieval: a STREAM of query documents against the
  * STATIC persisted BM25 index — the [[AnnServing]] sibling for the
  * text side, closing the same lifecycle for the inverted index (build:
  * [[Bm25Index.save]] via the nightly indexer; apply: bm25_batch;
  * serve: here).
  *
  * Each micro-batch of (doc_id, text) queries runs the exact batch
  * scorer ([[Bm25Index.scoreBatch]]) via `foreachBatch`, so per batch
  * the results are bit-identical to the batch path — StreamSpec asserts
  * that equality. The index artifacts (postings + df + stats parquet)
  * resolve by deterministic (dir, version) path, so every batch reuses
  * them with zero corpus-text scans, and a corpus rewrite (new
  * [[graft.Tables.version]]) is picked up at the next batch's probe.
  * Per-batch cost is batch × Σ_queryterm df(term) — the serving
  * deployment keeps batches bounded (micro-batch semantics), it never
  * lets them grow with the corpus.
  *
  * @param queries streaming (doc_id, text) frame
  * @param sink    called once per micro-batch with (results, batchId);
  *                results carry (query_id, doc_id, rank, score)
  */
object Bm25Serving {
  def start(spark: SparkSession, dir: String, queries: DataFrame,
      sink: (DataFrame, Long) => Unit, k: Int = 10): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(Bm25Index.scoreBatch(spark, dir, batch, k), batchId)
        }
      }
      .start()
}
