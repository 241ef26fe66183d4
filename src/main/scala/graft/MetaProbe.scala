package graft

import org.apache.spark.sql.SparkSession

/** Throwaway metadata-cost probe (diagnostic main): times the driver-side
  * cost of `spark.read.parquet` (file listing + footer/schema read +
  * analysis) against reusing an already-resolved DataFrame, and the cost
  * of a trivial action on each — isolating the per-query constant every
  * bench key pays before any data moves. */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tables = Seq("documents", "lineitem", "orders", "embeddings", "events")

    def timeN(name: String, n: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val per = (System.nanoTime() - t0) / 1e6 / n
      println(f"[meta] $name%-42s $per%8.2f ms/op  (n=$n)")
    }

    // warm
    tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").limit(1).count())

    timeN("read.parquet construct (5 tables)", 20) {
      tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet"))
    }
    val cached = tables.map(t => t -> spark.read.parquet(s"$dir/$t.parquet")).toMap
    timeN("reuse resolved df (noop)", 20) {
      tables.foreach(t => cached(t))
    }
    timeN("construct + limit(0).count", 10) {
      tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").limit(0).count())
    }
    timeN("reuse + limit(0).count", 10) {
      tables.foreach(t => cached(t).limit(0).count())
    }
    timeN("Tables.version walk (5 tables)", 50) {
      tables.foreach(t => Tables.version(dir, t))
    }
    spark.stop()
  }
}
