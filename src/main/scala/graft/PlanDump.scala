package graft

import org.apache.spark.sql.SparkSession

/** Plan-artifact dumper (diagnostic main, not part of the engine): writes
  * `.explain("formatted")` output for the named driver-contract queries to
  * `<outDir>/<query>_<tag>.txt`, under the same session shape as [[Bench]]
  * (local[32], 32 shuffle partitions, graft extensions) so the dumped plan
  * is the plan the bench actually runs.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
