package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CompactionSpec, EngineConfig}

/** Maintenance-command generation (SURVEY.md §2.1 sql_options_literal,
  * rewrite_sql_codegen, athena_sql_codegen, spark_conf_flags).
  *
  * Producing the command *text* is reference behavior
  * (EMRSparkUtil.java:101-162, AthenaOptimizeDataExecutor.java:35), so the
  * engine keeps it — as pure Scala for the engine path and as codegen'd
  * string expressions (`format_string`/`concat`) for the per-table query
  * form, which stays inside whole-stage codegen at any scale.
  */
object Codegen {

  /** Catalog name used in generated Spark SQL (EMRSparkUtil.java:25). */
  val SparkCatalogName = "aws_ebtm"

  /** Options map → `map('k','v','k2','v2')` literal, iteration order of the
    * map preserved (EMRSparkUtil.java:136-162). */
  def optionsLiteral(options: Map[String, String]): String =
    options.map { case (k, v) => s"'$k','$v'" }.mkString("map(", ",", ")")

  /** Full compaction command with conditional options / strategy /
    * sort_order clauses (EMRSparkUtil.java:101-128). */
  def rewriteDataFilesSql(spec: CompactionSpec): String = {
    val sb = new StringBuilder
    sb.append(s"CALL $SparkCatalogName.system.rewrite_data_files")
    sb.append("(")
    sb.append(s"table => '${spec.table}'")
    if (spec.options.nonEmpty)
      sb.append(s", options => ${optionsLiteral(spec.options)}")
    if (spec.strategy.nonEmpty)
      sb.append(s", strategy => '${spec.strategy}'")
    spec.sortOrder.filter(_.nonEmpty).foreach(o =>
      sb.append(s", sort_order => '$o'"))
    sb.append(")")
    sb.toString
  }

  /** Athena dialect (AthenaOptimizeDataExecutor.java:35). */
  def athenaOptimizeSql(table: String): String =
    s"OPTIMIZE $table REWRITE DATA USING BIN_PACK;"

  /** Conf map → `--conf k=v` argument list (EMRSparkUtil.java:36-86). */
  def confFlags(confs: Map[String, String]): Seq[String] =
    confs.toSeq.sortBy(_._1).map { case (k, v) => s"--conf $k=$v" }

  // ---- per-table DataFrame forms over the snapshot log fixture ----

  /** Fixture table name for a table id column: `db.tbl_<id>`. */
  private def tblName(id: Column): Column =
    concat(lit("db.tbl_"), id)

  /** Per-table options literal with one data-driven option (commit count)
    * ahead of the reference defaults, keys in sorted order. */
  def optionsLiteralPerTable(log: DataFrame): DataFrame =
    log.groupBy(col("table_id")).agg(count(lit(1)).as("n_commits"))
      .select(
        col("table_id"),
        format_string(
          "map('commit-count','%s','max-file-group-size-bytes','10737418240','partial-progress.enabled','true')",
          col("n_commits")).as("options_sql"))

  /** Per-table full rewrite command (binpack, default options). */
  def rewriteSqlPerTable(log: DataFrame): DataFrame =
    log.select(col("table_id")).distinct().select(
      col("table_id"),
      format_string(
        s"CALL $SparkCatalogName.system.rewrite_data_files(table => '%s', " +
          "options => map('partial-progress.enabled','true'," +
          "'max-file-group-size-bytes','10737418240'), strategy => 'binpack')",
        tblName(col("table_id"))).as("rewrite_sql"))

  /** Per-table Athena command. */
  def athenaSqlPerTable(log: DataFrame): DataFrame =
    log.select(col("table_id")).distinct().select(
      col("table_id"),
      format_string("OPTIMIZE %s REWRITE DATA USING BIN_PACK;",
        tblName(col("table_id"))).as("athena_sql"))

  /** Per-table `--conf k=v` rows for the default compaction-job sizing
    * (AwsManageProperties.java:60-66): one row per (table, conf). */
  def confFlagRows(log: DataFrame): DataFrame = {
    val entries = EngineConfig.DefaultSparkConfigs.toSeq.sorted
      .map { case (k, v) => struct(lit(k).as("k"), lit(v).as("v")) }
    log.select(col("table_id")).distinct()
      .select(col("table_id"), explode(array(entries: _*)).as("e"))
      .select(
        col("table_id"),
        col("e.k").as("conf_key"),
        concat(lit("--conf "), col("e.k"), lit("="), col("e.v")).as("arg"))
  }
}
