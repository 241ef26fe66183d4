package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.PqIndex

/** Online ANN serving: a STREAM of query vectors against the STATIC
  * IVF×PQ index — the fourth stage of the vector-index lifecycle this
  * engine ships (build: [[graft.exts.PqIndex.writeClusteredCodes]];
  * search: ivf_pq_search; maintain: ivf_maintenance; serve: here).
  *
  * Each micro-batch of queries runs the exact batch composed search
  * ([[PqIndex.ivfPqSearchFor]]) via `foreachBatch`, so per batch the
  * results are bit-identical to the batch path — StreamSpec asserts
  * that equality. This is the deployment shape for online vector
  * search over a periodically-rebuilt index: the index artifacts
  * (centroids + codebook) are session-memoized and version-keyed, so
  * every batch reuses them with zero Spark jobs, and an index rebuild
  * under the same path is picked up at the next batch. Per-batch work
  * is the probe + ADC over probed cells only; the corpus never
  * shuffles, and batch size × M×K distance tables stay broadcast.
  *
  * Query ids share the corpus id space (a query matching a corpus
  * vec_id excludes itself — the self-query convention every search key
  * in this engine uses); online clients should key queries outside the
  * corpus id range when self-exclusion is not wanted.
  *
  * @param queries streaming (query_id, embedding) frame
  * @param sink    called once per micro-batch with (results, batchId);
  *                results carry (query_id, neighbor_id, rank, dist_q)
  */
object AnnServing {
  /** @param codebookPath when set, the cold path LOADS the persisted PQ
    *   codebook artifact ([[PqIndex.installCodebook]] — one tiny parquet
    *   read, version-checked against the corpus listing) instead of
    *   paying the training loop on a serving restart. */
  def start(spark: SparkSession, dir: String, queries: DataFrame,
      sink: (DataFrame, Long) => Unit, k: Int = 5,
      nprobe: Int = 1, codebookPath: Option[String] = None): StreamingQuery = {
    codebookPath.foreach(p => PqIndex.installCodebook(spark, dir, p))
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(PqIndex.ivfPqSearchFor(spark, dir, batch, k, nprobe),
            batchId)
        }
      }
      .start()
  }

  /** Serve against a LIVE [[IndexLoop.ServingIndex]]: each query
    * micro-batch reads the index's CURRENT centroid version — a
    * maintenance bump from the ingest loop is picked up at the very next
    * batch, with the version that served each batch reported to the
    * sink. The codebook frame is passed explicitly (it is
    * centroid-independent, so one codebook serves every centroid
    * version of the same corpus — [[PqIndex.ivfPqSearchOver]]).
    *
    * With `codesPath` (an [[IndexLoop]]-maintained clustered layout),
    * each batch searches `<codesPath>/v<version>` via
    * [[PqIndex.searchClusteredCodesWith]] — the scan reads ONLY the
    * probed cells' files (partition pruning), the 100 TB serving shape.
    * Without it, the corpus's codes are re-derived per batch from
    * `corpusPath` — correct, but O(corpus) per batch; serving
    * deployments should pass the layout. The version is read ONCE per
    * batch and both the centroid snapshot and the layout directory come
    * from that read, so a concurrent bump cannot mix index pieces. */
  def serveWith(spark: SparkSession, corpusPath: String,
      index: IndexLoop.ServingIndex, cb: DataFrame, queries: DataFrame,
      sink: (DataFrame, Long, Long) => Unit, k: Int = 5,
      nprobe: Int = 1, codesPath: Option[String] = None): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val snap = index.snapshot
          val cent = IndexLoop.centroidsOf(spark, snap)
          val results = codesPath match {
            case Some(p) =>
              PqIndex.searchClusteredCodesWith(spark, s"$p/v${snap.version}",
                cent, cb, batch, k, nprobe)
            case None =>
              val emb = spark.read.parquet(corpusPath)
                .select(org.apache.spark.sql.functions.col("vec_id"),
                  org.apache.spark.sql.functions.col("embedding"))
              PqIndex.ivfPqSearchOver(emb, cent, cb, batch, k, nprobe)
          }
          sink(results, batchId, snap.version)
        }
      }
      .start()
}
