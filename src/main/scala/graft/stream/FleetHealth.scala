package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exts.{IndexFleet, Similarity}

/** LIVE fleet-scope index health — [[graft.exts.IndexFleet]]'s
  * corpus-level rollup fed by the four maintenance loops' OWN serving
  * states instead of a corpus recompute: the reference's evaluator
  * reads per-table telemetry to decide which tables to optimize next
  * (AwsTableManagementMetricsEvaluator.java:108-140); this frame reads
  * per-LOOP telemetry to decide which index family's threshold is
  * closest to tripping.
  *
  * Each family's pressure is progress toward (or beyond) that loop's
  * own ACT threshold, permille — 1000 means the next qualifying batch
  * trips the rebuild:
  *
  *  - `media` — pending admitted assets vs `rebuildAfter`
  *    ([[MediaIndexLoop]]'s decide quantity, verbatim);
  *  - `lex`   — pending docs vs the [[LexIndexLoop.MergePermille]]‰
  *    compaction threshold over the indexed count;
  *  - `ivf`   — permille of corpus vectors sitting in cells already
  *    outside the keep band (occupancy ×k vs 2×/½× of the total — the
  *    cross-multiplied split/merge quantity ivf_maintenance reports);
  *  - `graph` — corpus count vs the width-drift bound
  *    `target << bits` ([[GraphIndexLoop]] rebuilds when growth
  *    pushes the adaptive width past the pinned bits).
  *
  * Everything reads driver metadata (serving-state snapshots, the IVF
  * cell-stat map) — zero jobs, zero corpus IO; the rank is
  * [[IndexFleet.fleetRank]] on a 4-row frame. */
object FleetHealth {

  /** One (family, pressure_permille) row per live loop. `media` pairs
    * the serving handle with the loop's `rebuildAfter` (a start()
    * parameter, not part of the persisted state). */
  def pressures(spark: SparkSession,
      media: (MediaIndexLoop.ServingMedia, Long),
      lex: LexIndexLoop.ServingIndex,
      ivf: IndexLoop.ServingIndex,
      graph: GraphIndexLoop.ServingGraph,
      graphTarget: Long = Similarity.TargetCellVectors): DataFrame = {
    import spark.implicits._
    val (m, rebuildAfter) = media
    val mediaP = m.snapshot.nPending * 1000L / math.max(rebuildAfter, 1L)
    val ls = lex.snapshot
    val lexP =
      if (ls.nIndexed <= 0L) 0L
      else ls.nPending * 1000L * 1000L /
        (ls.nIndexed * LexIndexLoop.MergePermille)
    val is = ivf.snapshot
    val total = is.cellStats.values.map(_._1).sum
    val k = is.cellStats.size.toLong
    val ivfP =
      if (total <= 0L || k == 0L) 0L
      else is.cellStats.values.map(_._1)
        .filter(n => n * k > 2L * total || n * k * 2L < total)
        .sum * 1000L / total
    val gs = graph.snapshot
    val gBound = graphTarget << gs.bits
    val graphP = if (gBound <= 0L) 0L else gs.nCorpus * 1000L / gBound
    Seq(("media", mediaP), ("lex", lexP), ("ivf", ivfP),
      ("graph", graphP)).toDF("family", "pressure_permille")
  }

  /** [[pressures]] ranked — the live "which index family needs
    * maintenance next" frame (rank 1 = closest to its threshold). */
  def snapshot(spark: SparkSession,
      media: (MediaIndexLoop.ServingMedia, Long),
      lex: LexIndexLoop.ServingIndex,
      ivf: IndexLoop.ServingIndex,
      graph: GraphIndexLoop.ServingGraph,
      graphTarget: Long = Similarity.TargetCellVectors): DataFrame =
    IndexFleet.fleetRank(
      pressures(spark, media, lex, ivf, graph, graphTarget))
}
