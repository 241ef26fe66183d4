package graft.stream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem registered under a NON-DEFAULT URI scheme: every
  * byte the loops move through it proves the IO goes through the
  * Hadoop-FileSystem seam (`Path.getFileSystem`) rather than java.nio —
  * the deployability contract of the r16 LoopCore port (an object-store
  * connector plugs into exactly this registration point). */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** Gates on the [[LoopCore]] machinery shared by the four
  * index-maintenance loops: marker escaping, marker retention, the
  * fresh-query-on-a-resumed-root guard, and the loops running end to
  * end against a non-default FileSystem scheme. */
class LoopCoreSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def registerGraftFs(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("marker string fields round-trip hostile content (quotes, backslashes, control chars)") {
    val root = tmp("loopcore-esc")
    val store = new LoopCore.MetaStore[String](root, "b",
      s => s"""{"ord":1,"v":${LoopCore.jsonStr(s)}}""",
      j => LoopCore.jsonString(j, "v"))
    val hostile = "he said \"hi\", path C:\\tmp\\x,\nnewline\tand \\\" mix"
    store.write(0L, hostile)
    assert(store.read(0L).contains(hostile),
      "escaped marker payload must round-trip byte-exact")
    assert(store.newest.contains(hostile))
    // a long-valued field NEXT TO the escaped string stays parseable
    val raw = LoopCore.readString(store.file(0L))
    assert(LoopCore.jsonLong(raw, "ord") === 1L)
  }

  test("marker retention: a long-running store keeps only the newest RetainMarkers states") {
    val root = tmp("loopcore-gc")
    val store = new LoopCore.MetaStore[Long](root, "b",
      n => s"""{"n":$n}""", j => LoopCore.jsonLong(j, "n"))
    (0L until 20L).foreach(i => store.write(i, i * 10))
    val markers = LoopCore.listDir(store.dir)
      .map(_._1).filter(_.startsWith("state-b"))
    assert(markers.size === LoopCore.RetainMarkers,
      s"markers must be bounded, got ${markers.size}: $markers")
    assert(store.newest.contains(190L),
      "the newest state must survive every sweep")
    assert(store.read(19L).contains(190L))
    assert(store.read(0L).isEmpty, "swept history must read as absent")
  }

  test("a new query without the original checkpoint is refused on a root with committed batches") {
    import spark.implicits._
    val root = tmp("loopcore-fresh")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents").select(col("doc_id"), col("text")).limit(20)
    val index = LexIndexLoop.buildIndex(spark, docs, root)
    // fresh root (build marker only, lastBatchId = -1): allowed
    LoopCore.requireCheckpointIfResuming("lexIndexLoop",
      index.snapshot.lastBatchId, None)
    // commit one batch, then a NEW checkpoint-less query on the same
    // root must fail loudly — its batch ids restart at 0 and the
    // replay guard would silently no-op them (the r15 ADVICE hazard)
    LexIndexLoop.applyBatch(spark, index, root,
      Seq((900001L, "alpha beta gamma")).toDF("doc_id", "text"), 0L,
      (_, _, _, _) => ())
    val err = intercept[IllegalStateException] {
      LexIndexLoop.start(spark, index, root,
        spark.readStream.schema("doc_id LONG, text STRING")
          .parquet(tmp("loopcore-in")))
    }
    assert(err.getMessage.contains("checkpoint"))
    // the durable form — same root, a checkpoint — is accepted
    val q = LexIndexLoop.start(spark, index, root,
      spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(tmp("loopcore-in2")),
      checkpoint = Some(tmp("loopcore-cp")))
    q.stop()
  }

  test("lex loop end to end on a non-default FileSystem scheme (graftfs://): segments, markers, compaction, retention, reattach") {
    import spark.implicits._
    registerGraftFs()
    val root = s"graftfs://${tmp("loopcore-lexfs")}/lex"
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents").select(col("doc_id"), col("text")).limit(20)
      .localCheckpoint(true)
    val index = LexIndexLoop.buildIndex(spark, corpus, root)
    assert(index.snapshot.mainPath.startsWith("graftfs://"),
      "segment paths must carry the scheme end to end")
    val base = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    // batch 0: 10 docs = 50% of 20 indexed > the 20% threshold →
    // compaction fires on the non-default scheme (delta write, marker,
    // composite rewrite)
    val b0 = base.take(10).map { case (id, t) => (id + 600000L, t) }.toSeq
    LexIndexLoop.applyBatch(spark, index, root,
      b0.toDF("doc_id", "text"), 0L, (_, _, _, _) => ())
    assert(index.version === 1L)
    assert(LoopCore.isDirectory(s"$root/v1"))
    assert(LoopCore.exists(s"$root/_meta/state-b0.json"))
    // batch 1: compaction 2 — compaction 1's absorbed delta p0 is
    // swept one generation late, v0 leaves the retain window; all
    // deletes go through the FileSystem seam
    val b1 = base.slice(10, 17)
      .map { case (id, t) => (id + 700000L, t) }.toSeq
    LexIndexLoop.applyBatch(spark, index, root,
      b1.toDF("doc_id", "text"), 1L, (_, _, _, _) => ())
    assert(index.version === 2L)
    assert(!LoopCore.exists(s"$root/p0"),
      "absorbed delta must be swept on the non-default scheme")
    // served results equal a fresh inline index over the full corpus
    val full = corpus.unionByName(b0.toDF("doc_id", "text"))
      .unionByName(b1.toDF("doc_id", "text"))
    val inline = graft.exts.TextAnalysis.bm25ScoreAgainst(
        graft.exts.TextAnalysis.bm25Postings(full),
        graft.exts.TextAnalysis.bm25Stats(full),
        base.take(3).map { case (id, t) => (id + 900000L, t) }.toSeq
          .toDF("doc_id", "text")
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(split(trim(col("text")), "\\s+")))
              .as("term")),
        10, excludeSelf = false)
      .collect().map(_.toString).toSet
    val served = LexIndexLoop.scoreAgainst(spark, index.snapshot,
        base.take(3).map { case (id, t) => (id + 900000L, t) }.toSeq
          .toDF("doc_id", "text"))
      .collect().map(_.toString).toSet
    assert(served === inline)
    // reattach resolves the newest marker through the scheme
    val re = LexIndexLoop.reattach(spark, root)
    assert(re.snapshot === index.snapshot)
  }

  test("graph loop on graftfs://: epoch publish via the copy branch (no hard links), served layout equals a rebuild") {
    import spark.implicits._
    registerGraftFs()
    val base = s"graftfs://${tmp("loopcore-graphfs")}"
    val corpusPath = s"$base/corpus"
    val graphPath = s"$base/graph"
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 100L)
      .write.parquet(corpusPath)
    val graph = GraphIndexLoop.buildGraph(spark, corpusPath, graphPath,
      target = 8L)
    val bits0 = graph.snapshot.bits
    def served(): Set[String] = graph.edges(spark)
      .collect().map(_.toString).toSet
    def rebuilt(): Set[String] = graft.exts.Similarity.knnGraphOver(
        spark.read.parquet(corpusPath)
          .select(col("vec_id"), col("embedding")),
        bits0, graft.exts.Similarity.KnnGraphK)
      .collect().map(_.toString).toSet
    assert(served() === rebuilt())
    // one non-drift batch: touched buckets rewrite, untouched buckets
    // flow through LoopCore.copyOrLink's COPY branch (graftfs is not
    // scheme "file", so the hard-link fast path must not be taken)
    val vecs = spark.read.parquet(corpusPath).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val (n1, v1) = GraphIndexLoop.applyBatch(spark, graph, corpusPath,
      Seq((2000001L, vecs(1L).map(x => -x)),
        (2000002L, vecs(2L).map(x => -x))).toDF("vec_id", "embedding"),
      0L, 0.999, 8L, (_, _) => ())
    assert(n1 === 2L && v1 === 0L)
    assert(graph.snapshot.epoch === 1L)
    assert(served() === rebuilt(), "merged epoch must equal a rebuild")
    // markers and layout live on the scheme; replay is a strict no-op
    assert(LoopCore.exists(s"$graphPath/_meta/state-e1.json"))
    val before = graph.snapshot
    val (rn, rv) = GraphIndexLoop.applyBatch(spark, graph, corpusPath,
      Seq((2000003L, vecs(3L).map(x => -x))).toDF("vec_id", "embedding"),
      0L, 0.999, 8L, (_, _) => fail("replay must not emit health"))
    assert(rn === 2L && rv === before.version)
    assert(graph.snapshot === before)
  }

  test("media loop: rejected-modality residue gets an explicit verdict row; within-batch chains resolve to a landed canonical") {
    import spark.implicits._
    import graft.exts.Multimodal
    val root = tmp("loopcore-media")
    // corpus: ONE image asset, id 100 — the canonical every chain must
    // terminate at; vid/aud start empty
    val corpusPng = Multimodal.encodeNearPng(4000004L)
    val imgSigs = Multimodal.canonicalSignatures(
      Seq((100L, corpusPng)).toDF("doc_id", "png")
        .as[Multimodal.PngAsset]).toDF()
    val vidSigs = Multimodal.videoFingerprints(
      Seq.empty[(Long, Array[Byte])].toDF("doc_id", "gif")
        .as[Multimodal.GifAsset]).toDF()
    val audSigs = Multimodal.audioWindowFps(
      Seq.empty[(Long, Array[Byte])].toDF("doc_id", "wav")
        .as[Multimodal.WavAsset]).toDF()
    val serving = MediaIndexLoop.build(spark, imgSigs, vidSigs, audSigs,
      root)
    // batch: ids 10 and 20 BOTH duplicate corpus 100 and each other;
    // 10 < 100 < ... so 20's raw min-matched pointer is 10 — a batch
    // asset that is itself gated and lands nowhere. Plus one asset in
    // an unknown modality.
    val batch = Seq(
      (10L, "img", corpusPng), (20L, "img", corpusPng),
      (777L, "txt", "not media".getBytes("UTF-8")))
      .toDF("doc_id", "modality", "media")
    val v = MediaIndexLoop.applyBatch(spark, serving, batch, 0L, 100L,
        (_, _) => ())
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(v((10L, "img"))._2 === 100L && v((10L, "img"))._3 === 0L,
      "direct corpus duplicate points at the corpus canonical")
    assert(v((20L, "img"))._2 === 100L,
      s"chained duplicate must resolve PAST the gated batch asset 10 " +
        s"to the landed canonical 100, got ${v((20L, "img"))}")
    assert(v((20L, "img"))._3 === 0L)
    assert(v((777L, "txt")) === ((0L, -1L, -1L)),
      "unknown modality must surface as an explicit rejected verdict " +
        "(is_new = -1), never vanish")
    // nothing landed for the rejected row, the batch still committed
    assert(serving.snapshot.lastBatchId === 0L)
    assert(serving.snapshot.nPending === 0L)
  }

  test("live fleet health: the four loops' serving states rank by threshold pressure; the needy family is first") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.exts.Multimodal
    val dir = "/root/testdata/sf0.001"
    // MEDIA — the planted needy family: rebuildAfter 4, two admitted
    // pending assets → 500‰ of its own threshold
    val mediaRoot = tmp("fleet-media")
    val corpusPng = Multimodal.encodeNearPng(4100004L)
    val serving = MediaIndexLoop.build(spark,
      Multimodal.canonicalSignatures(Seq((100L, corpusPng))
        .toDF("doc_id", "png").as[Multimodal.PngAsset]).toDF(),
      Multimodal.videoFingerprints(Seq.empty[(Long, Array[Byte])]
        .toDF("doc_id", "gif").as[Multimodal.GifAsset]).toDF(),
      Multimodal.audioWindowFps(Seq.empty[(Long, Array[Byte])]
        .toDF("doc_id", "wav").as[Multimodal.WavAsset]).toDF(),
      mediaRoot)
    MediaIndexLoop.applyBatch(spark, serving,
      Seq((10L, "img", Multimodal.encodeNearPng(4200004L)),
        (20L, "img", Multimodal.encodeNearPng(4300004L)))
        .toDF("doc_id", "modality", "media"), 0L, 100L, (_, _) => ())
    assert(serving.snapshot.nPending === 2L)
    // LEX — one pending doc over a 20-doc index → 250‰ of the 200‰
    // compaction threshold
    val lexRoot = tmp("fleet-lex")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).limit(20)
    val lex = LexIndexLoop.buildIndex(spark, docs, lexRoot)
    LexIndexLoop.applyBatch(spark, lex, lexRoot,
      Seq((910001L, "solo pending doc")).toDF("doc_id", "text"), 0L,
      (_, _, _, _) => ())
    assert(lex.snapshot.nPending === 1L)
    // IVF + GRAPH — built over the fixture embeddings, no ingest: low
    // pressure by construction
    val base = tmp("fleet-vec")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 100L).write.parquet(s"$base/corpus")
    val ivf = IndexLoop.buildIndex(spark, s"$base/corpus")
    val graph = GraphIndexLoop.buildGraph(spark, s"$base/corpus",
      s"$base/graph", target = 8L)
    val fleet = FleetHealth.snapshot(spark, (serving, 4L), lex, ivf,
        graph, graphTarget = 8L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(fleet.keySet === Set("media", "lex", "ivf", "graph"))
    // pressures are the loops' OWN decide quantities, closed form
    assert(fleet("media")._1 === 500L) // 2 pending / rebuildAfter 4
    assert(fleet("lex")._1 === 250L)   // 1*1e6 / (20*200)
    val gs = graph.snapshot
    assert(fleet("graph")._1 === gs.nCorpus * 1000L / (8L << gs.bits))
    // the planted needy family ranks FIRST
    assert(fleet("media")._2 === 1,
      s"media at 500 permille of its threshold must rank 1: $fleet")
    // zero-IO law: the live frame is built from serving-state
    // snapshots alone — its optimized plan is a LocalRelation (no
    // scans, no corpus reads; the rank is a window over 4 local rows)
    val plan = FleetHealth.pressures(spark, (serving, 4L), lex, ivf,
      graph, graphTarget = 8L).queryExecution.optimizedPlan
    assert(plan.collectLeaves().forall(_.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"live fleet frame must read no storage, got:\n$plan")
  }
}
