package graft

import org.apache.spark.sql.SparkSession

/** Core-scaling probe (diagnostic main, not part of the engine): times
  * the named driver-contract queries at `SPARK_GRAFT_CPUS` cores over an
  * arbitrary corpus dir (e.g. the [[ScaleRehearsal]]-built sf1), min of
  * `reps` passes per query, one summary line per query — the r18-verdict
  * item 9 instrument: per-query 8-vs-32-core ratios at a scale where the
  * suite is data-bound rather than dispatch-bound.
  *
  * Usage: runMain graft.CoreSweep <dir> <reps> <query> [query ...]
  */
object CoreSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CoreSweep <dir> <reps> <query>...")
    val dir = args(0)
    val reps = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      // same engine shape as Bench (see the rationale there)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up, as in Bench
    import org.apache.spark.sql.functions.col
    spark.range(1000000L).repartition(8).groupBy((col("id") % 7).as("k"))
      .count().count()
    args.drop(2).foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sweep] cpus=$cpus%-3s $name%-28s min=${times.min}%7.2f s" +
        s"  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
