package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.EngineConfig
import graft.ops.{Decide, EventOps}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * `(SparkSession, sfDir) => DataFrame`, with equivalent DuckDB SQL in
  * [[oracleSql]] where the operator is SQL-expressible. Column names and
  * output types are aligned between the two sides (the driver's compare
  * sorts columns by name and hashes values).
  */
object SparkEntry {

  private val packs: QueryPack = Seq(
    DecisionQueries.pack,
    MaintenanceQueries.pack,
    JobQueries.pack,
    RelationalQueries.pack,
    PipelineQueries.pack,
    StreamQueries.pack,
    AdvancedQueries.pack,
    TimeJoinQueries.pack
  ).foldLeft(QueryPack.empty)(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core decision query (SURVEY.md §2.1 should_optimize). */
  def entry(spark: SparkSession): DataFrame =
    Decide.shouldOptimize(
      EventOps.snapshotLog(spark, "/root/testdata/sf0.001"), EngineConfig())

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = packs.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.oracles
}
