package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway per-stage probe (diagnostic main, not part of the engine):
  * runs one registered query and prints every completed stage's task
  * count, summed executor run time, and name — for chasing where a
  * query's task time actually goes.
  *
  * Usage: runMain graft.StageProbe <query> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // same engine shape as Bench (see the rationale there)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val t = i.taskMetrics
        println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"run=${t.executorRunTime / 1e3}%8.2f s " +
          f"cpu=${t.executorCpuTime / 1e9}%8.2f s " +
          f"shR=${t.shuffleReadMetrics.totalBytesRead / 1e6}%7.1f MB " +
          f"shW=${t.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f MB  " +
          i.name.takeWhile(_ != '\n').take(110))
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length >= 2) args(1).toInt else 1
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, dir).count()
      println(f"[stage] ===== ${args(0)} rep $i wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Thread.sleep(500)
    spark.stop()
  }
}
