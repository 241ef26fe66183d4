package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: what does an (almost) empty task cost? Runs tiny
  * 32-partition stages of increasing operator complexity and prints
  * per-stage task CPU, to isolate the per-task floor seen in r19's
  * fan-out experiments. Diagnostic main, not part of the engine. */
object TaskFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS", "200"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var label = ""
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val t = i.taskMetrics
        println(f"[floor] $label%-22s id=${i.stageId}%4d tasks=${i.numTasks}%3d " +
          f"run=${t.executorRunTime / 1e3}%7.2f s cpu=${t.executorCpuTime / 1e9}%7.2f s")
      }
    })
    def run(name: String)(f: => Unit): Unit = {
      label = name; f; Thread.sleep(200)
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm
    run("warm")(spark.range(1000000L).repartition(32).groupBy((col("id") % 7)
      .as("k")).count().count())
    run("warm2")(spark.range(1000000L).repartition(32).groupBy((col("id") % 7)
      .as("k")).count().count())
    // 1: bare range, 32 partitions, count
    run("range-count")(spark.range(0L, 3200L, 1L, 32).count())
    // 2: range -> hash agg by key
    run("range-agg")(spark.range(0L, 3200L, 1L, 32)
      .groupBy((col("id") % 97L).as("k")).count().count())
    // 3: tiny strings -> split+explode+agg (the bpe round shape)
    val docs = Tables.load(spark, dir, "documents")
      .select(concat(lit(" "), concat_ws("  ",
        split(trim(col("text")), "\\s+")), lit(" ")).as("enc"))
      .repartition(32).localCheckpoint(true)
    run("enc-count")(docs.count())
    run("enc-pairs-agg")(docs.select(explode(
        graft.functions.Signatures.bigram_pairs(col("enc"))).as("p"))
      .groupBy(col("p.pa"), col("p.pb")).count().count())
    run("enc-pairs-agg2")(docs.select(explode(
        graft.functions.Signatures.bigram_pairs(col("enc"))).as("p"))
      .groupBy(col("p.pa"), col("p.pb")).count().count())
    run("enc-len")(docs.select(length(col("enc")).as("l"))
      .groupBy((col("l") % 7L).as("k")).count().count())
    spark.stop()
  }
}
