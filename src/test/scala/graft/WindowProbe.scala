package graft

/** Scratch probe (not a test): measures Window partition-key cardinality
  * vs child rows, to calibrate PlanGuard thresholds. */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_n"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val canary = corpus.join(broadcast(queries),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        graft.exts.Similarity.cosine(col("emb_q"), col("emb_n")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    println("=== optimized ===")
    println(canary.queryExecution.optimizedPlan.treeString)
  }
}
