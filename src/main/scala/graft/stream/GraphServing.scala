package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.Similarity

/** Online neighbor serving over the LIVE kNN-graph layout — the serving
  * stage of the graph lifecycle (build: [[graft.exts.KnnIndex]];
  * incremental maintain: knn_incremental / [[GraphIndexLoop]]; serve:
  * here), the [[AnnServing.serveWith]] sibling for "who are this
  * vector's neighbors" lookups (the query a dedup reviewer, a
  * recommender, or a curation UI issues per item).
  *
  * Each micro-batch of (query_id, embedding) lookups reads the loop's
  * CURRENT layout version once, computes the batch's sign buckets at
  * that snapshot's width, and scans ONLY those bucket directories —
  * the layout is partitioned by the src vector's bucket and a node's
  * edges live exactly in its own bucket's directory, so the probe is
  * directory-pruned the same way [[AnnServing]] prunes probed cells
  * (collected bucket literals are batch-sized metadata). A width-drift
  * rebuild or a bucket-local merge from the ingest loop is picked up
  * at the very next query batch, with the serving version reported to
  * the sink.
  *
  * Per-batch cost: one batch-sized bucket computation + a pruned scan
  * of ≤ batch-many bucket directories; the graph never shuffles and
  * the corpus embeddings are never read.
  *
  * @param queries streaming (query_id, embedding) frame — the
  *                embedding is what locates the node's bucket; ids not
  *                present in the graph return no rows (an isolated or
  *                unknown vector has no edges, not an error)
  * @param sink    called per micro-batch with (results, batchId,
  *                version); results carry (query_id, dst_id, rank,
  *                mutual)
  */
object GraphServing {
  def serveWith(spark: SparkSession, graph: GraphIndexLoop.ServingGraph,
      queries: DataFrame,
      sink: (DataFrame, Long, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        if (!batch0.isEmpty) {
          val snap = graph.snapshot
          val batch = batch0
            .select(col("query_id"),
              Similarity.signBucketBits(col("embedding"), snap.bits)
                .as("bucket"))
            .localCheckpoint(true) // batch-sized
          // the probed buckets as literals — what turns the layout
          // read into directory pruning (AnnServing's probed-cell form)
          val buckets = batch.select(col("bucket")).distinct()
            .collect().map(_.getLong(0)).sorted
          // ONE consistent epoch dir for the whole batch — published
          // layouts are immutable (a racing merge publishes a NEW
          // epoch and swaps the handle), so this read can never hit
          // deleted files or a pre/post-merge mix
          val edges = spark.read
            .parquet(GraphIndexLoop.layoutDir(graph.graphPath, snap))
            .filter(col("bucket").isin(buckets.toIndexedSeq: _*))
          sink(
            edges.join(broadcast(batch),
                edges("bucket") === batch("bucket") &&
                  edges("src_id") === batch("query_id"))
              .select(col("query_id"), col("dst_id"), col("rank"),
                col("mutual")),
            batchId, snap.version)
        }
      }
      .start()
}
