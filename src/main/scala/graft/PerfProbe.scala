package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the engine): times individual driver
  * queries under the same session shape as [[Bench]] (local[32], 32
  * shuffle partitions) to chase hot spots. Pass query names as args. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      time(s"$name #1")(fn(spark, dir).count())
      time(s"$name #2")(fn(spark, dir).count())
      time(s"$name #3")(fn(spark, dir).count())
    }
    spark.stop()
  }
}
