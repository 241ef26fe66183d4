package graft.engine

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import graft.model.CompactionSpec
import graft.ops.Codegen

/** query_file_write (SURVEY.md §2.1): the reference uploads generated job
  * files to object storage before submitting — a `.sql` entrypoint for the
  * EKS SparkSqlJobDriver (EmrOnEksOptimizeDataExecutor.java:76) and a
  * generated 3-line PySpark wrapper script for EMR Serverless
  * (EmrServerlessOptimizeDataExecutor.java:41-44, 123-135), via
  * `createFile` (BaseEmrOptimizeDataExecutor.java:82-89). Locally the
  * object store is a directory; ids are caller-supplied (the reference's
  * random UUID file names are parameterized out for determinism,
  * SURVEY.md §7.4). */
object QueryFiles {

  /** The generated PySpark wrapper around a SQL statement — same shape as
    * the reference's PYTHON_JOB_TEMPLATE. */
  def pySparkScript(sql: String): String =
    Seq(
      "from pyspark.sql import SparkSession",
      "spark = (SparkSession.builder.getOrCreate())",
      s"""spark.sql("$sql").show()""").mkString("\n")

  /** Write content to `<dir>/<name>`, creating parents; overwrites. */
  def createFile(dir: String, name: String, content: String): Path = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    p
  }

  /** Write the `.sql` job entrypoint for a compaction spec (EKS path). */
  def writeSqlEntrypoint(dir: String, id: String, spec: CompactionSpec): Path =
    createFile(dir, s"query-$id.sql", Codegen.rewriteDataFilesSql(spec))

  /** Write the generated PySpark job script (Serverless path). */
  def writePySparkJob(dir: String, id: String, spec: CompactionSpec): Path =
    createFile(dir, s"job-$id.py",
      pySparkScript(Codegen.rewriteDataFilesSql(spec)))
}
