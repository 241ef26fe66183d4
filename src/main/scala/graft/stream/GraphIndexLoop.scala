package graft.stream

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.exts.Similarity

/** The event-driven maintenance loop closed over the kNN GRAPH — the
  * reference's commit→threshold→action pattern
  * (AwsTableManagementMetricsEvaluator.java:64-140) applied to the most
  * reused derived structure in the engine, completing the r13 story:
  * [[graft.exts.KnnIndex]] made the graph a build-once artifact,
  * [[Similarity.knnIncremental]] made a single batch merge exact, and
  * this loop runs that maintenance continuously:
  *
  *  1. INGEST — each micro-batch of (vec_id, embedding) is gated by the
  *     emb_incremental near-dup rule ([[Similarity.embIncrementalGateAt]]
  *     at the graph's pinned bucket width); survivors land in the
  *     parquet corpus.
  *  2. MERGE — the graph layout AT REST is parquet PARTITIONED BY the
  *     src vector's sign bucket, so the batch's bucket-local rescore
  *     ([[Similarity.knnIncremental]]'s law: edges never cross buckets)
  *     lands as a DYNAMIC PARTITION OVERWRITE of exactly the touched
  *     bucket directories — O(batch × cell occupancy) IO per batch,
  *     untouched buckets' files are never rewritten or even read.
  *  3. DRIFT + REBUILD — the loop carries the corpus count; when growth
  *     pushes [[Similarity.adaptiveBucketBits]] past the pinned width,
  *     the O(corpus) full rebuild runs ONCE at the new width into a
  *     fresh `b<bits>` layout and the VERSION BUMPS — the
  *     accumulate→threshold→rebuild event, exactly when cell occupancy
  *     (and with it the merge's per-batch bound) would otherwise drift.
  *  4. SERVE — [[ServingGraph.edges]] reads whatever layout version is
  *     current; every [[Similarity]] `*FromEdges` consumer (components,
  *     pagerank, LPA, walks, triangles, purity, D4) runs against it
  *     unchanged.
  *
  * Per-batch cost is O(batch): the gate broadcast, the batch-bounded
  * rescore, and the touched-partition write; the corpus-scale rebuild
  * runs only when the width threshold trips — the same discipline as
  * [[IndexLoop]] (IVF cells) and [[LexIndexLoop]] (BM25 segments).
  */
object GraphIndexLoop {

  /** Driver-side metadata of the serving graph — three numbers; the
    * edges themselves live in the bucket-partitioned parquet layout. */
  final case class State(version: Long, bits: Int, nCorpus: Long)

  /** Atomically-swapped serving handle over a `graphPath` layout root:
    * the loop writes a new [[State]] per acted batch; consumers read
    * whatever version is current. */
  final class ServingGraph private[GraphIndexLoop] (
      val graphPath: String, initial: State) {
    private val ref = new AtomicReference[State](initial)
    def snapshot: State = ref.get()
    def version: Long = ref.get().version
    def nCorpus: Long = ref.get().nCorpus
    /** The CURRENT edge frame ([[Similarity.knnGraph]] schema plus the
      * `bucket` partition column) — one consistent layout read. */
    def edges(spark: SparkSession): DataFrame =
      spark.read.parquet(layoutDir(graphPath, ref.get().bits))
        .select(col("src_id"), col("dst_id"), col("rank"), col("mutual"))
    private[stream] def state: State = ref.get()
    private[stream] def update(s: State): Unit = ref.set(s)
  }

  private def layoutDir(root: String, bits: Int): String = s"$root/b$bits"

  /** Edge frame of `emb` at `bits`, carrying each edge's src bucket as
    * the layout partition key. */
  private def bucketedEdges(emb: DataFrame, bits: Int): DataFrame =
    Similarity.knnGraphOver(emb.select(col("vec_id"), col("embedding")),
        bits, Similarity.KnnGraphK)
      .join(emb.select(col("vec_id").as("src_id"),
          Similarity.signBucketBits(col("embedding"), bits).as("bucket"))
        .hint("shuffle_hash"),
        Seq("src_id"))

  /** Build the serving graph over a landed corpus: one full
    * [[Similarity.knnGraphOver]] pass at the corpus's adaptive width,
    * written bucket-partitioned. */
  def buildGraph(spark: SparkSession, corpusPath: String,
      graphPath: String,
      target: Long = Similarity.TargetCellVectors): ServingGraph = {
    val emb = spark.read.parquet(corpusPath)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val bits = Similarity.adaptiveBucketBits(n, target)
    bucketedEdges(emb, bits).write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(layoutDir(graphPath, bits))
    new ServingGraph(graphPath, State(0L, bits, n))
  }

  /** Persist the driver-side state (the layout is already durable). */
  def saveMeta(spark: SparkSession, g: ServingGraph, path: String): Unit = {
    import spark.implicits._
    val s = g.snapshot
    Seq((s.version, s.bits, s.nCorpus))
      .toDF("version", "bits", "n_corpus").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Reattach to a persisted layout — the serving restart's cold path
    * (one 1-row read; no graph work). */
  def loadMeta(spark: SparkSession, graphPath: String,
      metaPath: String): ServingGraph = {
    val m = spark.read.parquet(metaPath).first()
    new ServingGraph(graphPath,
      State(m.getLong(0), m.getInt(1), m.getLong(2)))
  }

  /** Start the ingest → gate → bucket-local merge → width-drift rebuild
    * loop over a streaming (vec_id, embedding) frame. `onCycle(batchId,
    * nSurvivors, version)` observes each batch — the reporter seam. */
  def start(spark: SparkSession, graph: ServingGraph, corpusPath: String,
      vectors: DataFrame, threshold: Double = 0.999,
      target: Long = Similarity.TargetCellVectors,
      onCycle: (Long, Long, Long) => Unit = (_, _, _) => ())
      : StreamingQuery = {
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.select(col("vec_id"), col("embedding"))
          .localCheckpoint(true) // batch-sized
        if (batch.isEmpty) { onCycle(batchId, 0L, graph.version) }
        else {
          val st = graph.state
          val corpus = spark.read.parquet(corpusPath)
            .select(col("vec_id"), col("embedding"))
          // 1) GATE at the graph's pinned width: corpus near-dups never
          // enter; same-batch twins keep the min id (the IndexLoop rule)
          val keepIds = Similarity.embIncrementalGateAt(corpus,
              batch.select(col("vec_id").as("batch_id"), col("embedding")),
              threshold, st.bits)
            .filter(!col("is_dup"))
            .select(col("batch_id").as("vec_id"))
          val bb = batch.withColumn("bucket",
            Similarity.signBucketBits(col("embedding"), st.bits))
          val laterTwins = bb.as("a").join(bb.as("b"),
              col("a.bucket") === col("b.bucket") &&
                col("a.vec_id") < col("b.vec_id") &&
                Similarity.cosine(col("a.embedding"), col("b.embedding"))
                  >= threshold)
            .select(col("b.vec_id").as("vec_id")).distinct()
          val survivors = batch.join(keepIds, Seq("vec_id"))
            .join(laterTwins, Seq("vec_id"), "left_anti")
            .localCheckpoint(true) // ≤ batch-sized, read three times
          val nNew = survivors.count()
          var version = st.version
          var bits = st.bits
          if (nNew > 0) {
            // 2) MERGE: rescore ONLY the touched buckets (pre-append
            // corpus ∪ survivors, members bounded by batch × occupancy)
            // and land them as a dynamic partition overwrite — the
            // bucket-locality law knn_incremental's oracle proves
            val touched = survivors
              .select(Similarity
                .signBucketBits(col("embedding"), st.bits).as("bucket"))
              .distinct()
            val members = corpus
              .select(col("vec_id"), col("embedding"),
                Similarity.signBucketBits(col("embedding"), st.bits)
                  .as("bucket"))
              .join(broadcast(touched), "bucket")
              .select(col("vec_id"), col("embedding"))
              .unionByName(survivors)
              .localCheckpoint(true) // bounded; feeds rescore twice
            survivors.write.mode("append").parquet(corpusPath)
            val mode0 =
              spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
              "dynamic")
            try bucketedEdges(members, st.bits)
              .write.mode(SaveMode.Overwrite)
              .partitionBy("bucket")
              .parquet(layoutDir(graph.graphPath, st.bits))
            finally mode0 match {
              case Some(v) => spark.conf
                .set("spark.sql.sources.partitionOverwriteMode", v)
              case None => spark.conf
                .unset("spark.sql.sources.partitionOverwriteMode")
            }
            // 3) DRIFT: corpus growth past the adaptive width's next
            // threshold → ONE full rebuild at the new width, version bump
            val want = Similarity
              .adaptiveBucketBits(st.nCorpus + nNew, target)
            if (want != st.bits) {
              val all = spark.read.parquet(corpusPath)
                .select(col("vec_id"), col("embedding"))
              bucketedEdges(all, want).write.mode(SaveMode.Overwrite)
                .partitionBy("bucket").parquet(layoutDir(graph.graphPath, want))
              bits = want
              version += 1
            }
          }
          graph.update(State(version, bits, st.nCorpus + nNew))
          onCycle(batchId, nNew, version)
        }
      }
      .start()
  }
}
