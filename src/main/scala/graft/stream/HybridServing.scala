package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.{Bm25Index, PqIndex, TextAnalysis}

/** Online HYBRID retrieval: a stream of (query_id, text, embedding)
  * queries served by reciprocal-rank fusion of BOTH persisted indexes —
  * the lexical [[Bm25Index]] (postings + df + stats parquets) and the
  * IVF×PQ vector index — composing the [[Bm25Serving]] and
  * [[AnnServing]] deployment shapes into the two-tower ranker
  * production search runs.
  *
  * Each micro-batch runs the exact index-served batch scorers
  * ([[Bm25Index.scoreBatch]], [[PqIndex.ivfPqSearchFor]]) and fuses
  * their top-k lists with [[TextAnalysis.rrfFuse]] — the SAME fusion
  * core the batch hybrid_search key is gated on, so serving cannot
  * drift from the oracle-checked definition. Per-batch cost is the two
  * bounded index probes (Σ_queryterm df + probed-cell ADC) plus a
  * fusion on queries×k rows; no corpus text or embedding scan anywhere.
  * StreamSpec asserts per-batch equality against the directly-composed
  * batch scorers.
  *
  * Query ids should live outside the corpus id range (the
  * [[AnnServing]] convention — vector search self-excludes on matching
  * ids; BM25 batch scoring never self-excludes).
  *
  * @param queries streaming (query_id, text, embedding) frame
  * @param sink    called once per micro-batch with (results, batchId);
  *                results carry (query_id, doc_id, rank, rrf_x1e6,
  *                lex_rank, vec_rank)
  */
object HybridServing {
  def start(spark: SparkSession, dir: String, queries: DataFrame,
      sink: (DataFrame, Long) => Unit, k: Int = TextAnalysis.HybridTopK,
      nprobe: Int = 1, codebookPath: Option[String] = None): StreamingQuery = {
    codebookPath.foreach(p => PqIndex.installCodebook(spark, dir, p))
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint()
          val lex = Bm25Index.scoreBatch(spark, dir,
            b.select(col("query_id").as("doc_id"), col("text")), k)
          val vec = PqIndex.ivfPqSearchFor(spark, dir,
            b.select(col("query_id"), col("embedding")), k, nprobe)
            .select(col("query_id"), col("neighbor_id").as("doc_id"),
              col("rank"))
          sink(TextAnalysis.rrfFuse(lex, vec, k), batchId)
        }
      }
      .start()
  }
}
