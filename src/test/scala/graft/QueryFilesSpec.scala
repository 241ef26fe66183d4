package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.QueryFiles
import graft.model.CompactionSpec

/** query_file_write: golden script text + file round-trips. */
class QueryFilesSpec extends AnyFunSuite {

  test("pyspark wrapper script matches the reference template shape") {
    assert(QueryFiles.pySparkScript("SELECT 1") ===
      """from pyspark.sql import SparkSession
        |spark = (SparkSession.builder.getOrCreate())
        |spark.sql("SELECT 1").show()""".stripMargin)
  }

  test("sql entrypoint file round-trips the generated command") {
    val dir = Files.createTempDirectory("graft-qf").toString
    val p = QueryFiles.writeSqlEntrypoint(dir, "j1",
      CompactionSpec("db.t", options = Map("k" -> "v")))
    assert(p.getFileName.toString === "query-j1.sql")
    assert(Files.readString(p) ===
      "CALL aws_ebtm.system.rewrite_data_files(table => 'db.t', " +
        "options => map('k','v'), strategy => 'binpack')")
  }

  test("pyspark job file embeds the command") {
    val dir = Files.createTempDirectory("graft-qf").toString
    val p = QueryFiles.writePySparkJob(dir, "j2", CompactionSpec("db.t2"))
    val content = Files.readString(p)
    assert(p.getFileName.toString === "job-j2.py")
    assert(content.startsWith("from pyspark.sql import SparkSession"))
    assert(content.contains("rewrite_data_files(table => 'db.t2'"))
    assert(content.endsWith(".show()"))
  }

  test("createFile overwrites existing content") {
    val dir = Files.createTempDirectory("graft-qf").toString
    QueryFiles.createFile(dir, "a.sql", "one")
    val p = QueryFiles.createFile(dir, "a.sql", "two")
    assert(Files.readString(p) === "two")
  }
}
