package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.EngineConfig

/** Property-map projection operators (SURVEY.md §2.1 reporter_prop_strip,
  * props_prefix_select). The reference treats config as a flat
  * Map<String,String>; both operators exist here twice: as pure Scala map
  * functions (the engine path) and as DataFrame transforms over a key-value
  * relation (the query/oracle path — at scale per-table property maps are a
  * KV table, and these are plain pushdown-friendly filters/projections).
  */
object Props {

  /** reporter_prop_strip: drop the three recursion-guard keys before spawning
    * an inner catalog — the reporter registration plus both optimize-trigger
    * thresholds, exactly the set the reference removes
    * (AwsTableManagementMetricsEvaluator.java:93-99). Other
    * `metrics-reporter.*`-prefixed keys are kept, as in the reference. */
  val StrippedKeys: Set[String] = Set(
    EngineConfig.ReporterImplKey,
    EngineConfig.CommitThresholdKey,
    EngineConfig.TimeThresholdKey)

  def stripReporterProps(props: Map[String, String]): Map[String, String] =
    props.filterNot { case (k, _) => StrippedKeys.contains(k) }

  /** props_prefix_select: sub-map by key prefix, prefix stripped, defaults
    * when empty (PropertyUtil.propertiesWithPrefix, EMRSparkUtil.java:71-77). */
  def prefixSelect(props: Map[String, String], prefix: String,
      defaults: Map[String, String] = Map.empty): Map[String, String] = {
    val m = props.collect {
      case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
    }
    if (m.isEmpty) defaults else m
  }

  /** Deterministic KV fixture: a properties relation derived from events
    * (key shape chosen to exercise both reserved reporter keys and prefixed
    * config keys; value = event_type). Mirrored verbatim in the oracle SQL. */
  def propsRelation(spark: SparkSession, dir: String): DataFrame =
    EventOps.events(spark, dir).select(
      col("event_id"),
      when(col("event_id") % 10 === 0, lit("metrics-reporter-impl"))
        .when(col("event_id") % 10 === 1, lit("metrics-reporter.queue-size"))
        .when(col("event_id") % 10 === 2, lit("optimize-data.commit-threshold"))
        .when(col("event_id") % 10 === 3,
          lit("optimize-data.spark.configs.spark.executor.memory"))
        .when(col("event_id") % 10 === 4,
          lit("optimize-data.spark.configs.spark.executor.cores"))
        .when(col("event_id") % 10 === 5,
          lit("optimize-data.options.partial-progress.enabled"))
        .otherwise(concat(lit("other.prop."), col("event_id") % 10))
        .as("key"),
      col("event_type").as("value"))

  /** DataFrame form of reporter_prop_strip over the KV relation. */
  def stripReporterRelation(props: DataFrame): DataFrame =
    props.filter(!col("key").isin(StrippedKeys.toSeq.map(lit): _*))

  /** DataFrame form of props_prefix_select: keep prefix matches, strip the
    * prefix from the key. */
  def prefixSelectRelation(props: DataFrame, prefix: String): DataFrame =
    props.filter(col("key").startsWith(prefix))
      .select(
        col("event_id"),
        expr(s"substring(key, ${prefix.length + 1})").as("conf_key"),
        col("value"))
}
