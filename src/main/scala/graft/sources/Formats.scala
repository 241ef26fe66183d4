package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines source and sink support (extension — the reference has
  * no readers of its own beyond catalog tables, SURVEY.md §2.3). Explicit
  * schemas everywhere: at 100 TB schema inference would re-scan the corpus,
  * and silent type drift across files is worse than a failed read. */
object Formats {

  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(dir)

  /** ORC: columnar at-rest alternative to parquet (built into Spark).
    * Schema travels in the file, but reads still pass the expected schema
    * so drift fails loudly instead of surfacing as nulls. */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(dir)

  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  def writeJsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(dir)

  def readJsonLines(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(dir)
}
