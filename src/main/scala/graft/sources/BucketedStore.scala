package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout: co-located joins without a per-query shuffle.
  *
  * Writing both sides of a hot join bucketed by the join key (same bucket
  * count) lets Spark plan a SortMergeJoin with NO Exchange on either side —
  * the shuffle is paid once at write time instead of per query. At 100 TB
  * this converts the recurring fact⋈fact join cost (the one case broadcast
  * can't cover) from a full network shuffle into local reads.
  *
  * Bucketing requires the session catalog (`saveAsTable`), so tables get
  * catalog names under the local spark-warehouse.
  */
object BucketedStore {

  /** Write a DataFrame as a bucketed catalog table (dropping any previous
    * table AND its warehouse directory — a stale location from a dropped
    * catalog entry would otherwise fail the create). */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = java.nio.file.Paths.get(warehouse, tableName)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Read a bucketed table back from the catalog. */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
