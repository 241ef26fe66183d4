package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    // Warm the session (codegen, shuffle machinery, parquet footers) so the
    // first timed query doesn't absorb JVM/session startup.
    spark.range(1000000L).repartition(8).groupBy((col("id") % 7).as("k"))
      .count().count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    // Min of THREE passes per query: steady-state throughput rather than
    // first-run plan-compilation cost, and enough samples that the
    // ±0.1 s fixed-latency jitter on sub-second queries (JIT deopt, GC
    // pause, noisy neighbor) stops reading as round-over-round
    // "regressions" — r7→r8 comparison chased exactly that noise. The
    // pass count is recorded in the output ("passes") so rounds compare
    // like with like. A crashed run is reported as -1 (plus an entry in
    // "errors"), never as its elapsed time.
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case t: Throwable =>
        errors += s"$name: ${t.getClass.getSimpleName}"
        -1.0
      }
    }
    val passes = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).map(_ => once(name, fn))
      // Any crashed pass → -1 (flakiness must be loud, not averaged
      // away); the error strings are recorded either way.
      val best = if (times.exists(_ < 0)) -1.0 else times.min
      name -> best
    }.toMap
    // Artifact-backed queries get an explicit cold/warm split: "cold"
    // re-runs the query with every session memo dropped (pays the
    // artifact build — Bloom sketch scan, IVF k-means, BPE training
    // loop, LM training write), "warm" re-runs against the rebuilt memo
    // (the per-batch steady state a deployment amortizes to). The main
    // "queries" numbers are min-of-passes and therefore warm already;
    // this section makes the one-time build cost visible instead of
    // inferred.
    def clearMemos(): Unit = {
      graft.exts.BloomIndex.clear()
      graft.exts.IvfIndex.clear()
      graft.exts.BpeIndex.clear()
      graft.exts.LmIndex.clear()
      graft.exts.PqIndex.clear()
    }
    val artifactQueries =
      Seq("dedup_incremental", "sim_ivf", "bpe_encode", "lm_score_batch",
        "pq_search", "ivf_pq_search", "ivf_pq_refine")
    val artifacts = artifactQueries
      .filter(SparkEntry.queries.contains)
      .map { name =>
        clearMemos()
        val cold = once(name, SparkEntry.queries(name))
        val warm = once(name, SparkEntry.queries(name))
        s"\"" + name + "\":{\"cold\":" + cold + ",\"warm\":" + warm + "}"
      }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.distinct.map(e => "\"" + e.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","passes":$passes,"queries":$qs,"artifacts":$artifacts,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
