package graft.exts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fleet-scope index health: ONE frame answering "which index family
  * needs maintenance next" — the reference's metrics-evaluator role
  * (AwsTableManagementMetricsEvaluator.java:64-140 reads per-table
  * telemetry and decides which tables to optimize) lifted one level,
  * from tables to the engine's four index families, and
  * small_file_metrics' sibling at fleet scope. Each family already
  * emits its own health row ([[Similarity.ivfMaintenance]],
  * [[Similarity.graphHealth]], [[Multimodal.mediaHealth]], the BM25
  * postings stats); this rollup normalizes each into one integer
  * `pressure_permille` and ranks the fleet.
  *
  * Per-family pressure (all integer permille, higher = needier):
  *  - `ivf`   — mean |cell occupancy − 1000|‰: cell-balance drift, the
  *    same quantity whose tails trip the split/merge verdicts.
  *  - `graph` — (1000 − mutual‰) + isolated‰: asymmetric edges plus
  *    disconnected nodes — both shrink under a rebuild at the right
  *    width.
  *  - `media` — dup‰ of assets: pair-involved assets the next pairs
  *    rebuild would fold into components.
  *  - `lex`   — posting density ‰ (Σdf per term·doc): a denser
  *    term-doc matrix makes each segment compaction rewrite more per
  *    landed doc.
  *
  * Scale shape: every branch ends in a ≤ handful-row aggregate before
  * the union; the final rank is a window over the 4-row fleet frame
  * (reduced-frame global window — the mix_sources pattern on the
  * PlanGuard justified list).
  */
object IndexFleet {

  /** Rank a (family, pressure_permille) frame: rank 1 = neediest;
    * ties break on family name so the order is total. Exposed
    * separately so a live deployment can feed the four loops' OWN
    * health rows (the spec plants a needy family through here). */
  def fleetRank(pressures: DataFrame): DataFrame =
    pressures.withColumn("rank",
      row_number().over(Window.orderBy(col("pressure_permille").desc,
        col("family"))).cast("int"))

  /** The registered `index_fleet_health` frame over one corpus dir. */
  def indexFleetHealth(spark: SparkSession, dir: String): DataFrame = {
    val ivf = Similarity.ivfMaintenance(spark, dir)
      .agg(expr("sum(abs(occupancy_x1000 - 1000)) div count(1)")
        .as("pressure_permille"))
      .select(lit("ivf").as("family"), col("pressure_permille"))
    val graph = Similarity.graphHealth(spark, dir)
      .select(lit("graph").as("family"),
        expr("(1000 - mutual_permille) + (n_isolated * 1000 div n_nodes)")
          .as("pressure_permille"))
    val media = Multimodal.mediaHealth(spark, dir)
      .select(lit("media").as("family"),
        col("dup_permille").as("pressure_permille"))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val lex = TextAnalysis.bm25Postings(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df")).as("sdf"), count(lit(1)).as("n_terms"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .select(lit("lex").as("family"),
        expr("sdf * 1000 div (n_terms * n_docs)").as("pressure_permille"))
    fleetRank(ivf.unionByName(graph).unionByName(media).unionByName(lex))
  }
}
