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

  /** One fleet MAINTENANCE TICK — the reference's evaluator→executor
    * dispatch (AwsTableManagementMetricsEvaluator.java:75-82: read the
    * telemetry, pick what crossed the line, hand it to the executor)
    * closed at fleet scope: read the four loops' LIVE pressures
    * (driver-metadata arithmetic, zero jobs, zero corpus IO — the
    * [[pressures]] LocalRelation law), pick the rank-1 family, and
    * trigger exactly THAT family's existing ACT branch out of band:
    *
    *  - `media` → [[MediaIndexLoop.rebuildNow]] (merge pending into a
    *    fresh version dir);
    *  - `lex`   → [[LexIndexLoop.compactNow]] (compact main ∪ pending);
    *  - `ivf`   → [[IndexLoop.maintainNow]] (split-triggered cell
    *    maintenance — merge-only pressure never acts, the loop's own
    *    hysteresis rule; the handle's DECLARED codes wiring is
    *    resolved, so a codes-backed loop's dispatch rewrites `v<new>`
    *    before the version flips, and a handle whose wiring was never
    *    declared fails loudly instead of corrupting serving);
    *  - `graph` → [[GraphIndexLoop.rebuildNow]] (width-drift rebuild —
    *    acts only when the adaptive width actually moved).
    *
    * Every dispatched rebuild commits through its loop's own marker
    * protocol at a fresh commit ordinal with `lastBatchId` untouched,
    * so concurrent streams' replay guards are unaffected; the next
    * tick reads the acted family's pressure RESET from its swapped
    * serving state. Returns (family, acted) — acted is false when the
    * rank-1 family's own ACT trigger declines (nothing pending, no
    * split verdict, width unchanged), mirroring the reference's
    * evaluator passing over tables whose metrics retreated between
    * the decision and the action. */
  def maintenanceTick(spark: SparkSession,
      media: (MediaIndexLoop.ServingMedia, Long),
      lex: LexIndexLoop.ServingIndex,
      ivf: (IndexLoop.ServingIndex, String),
      graph: (GraphIndexLoop.ServingGraph, String),
      graphTarget: Long = Similarity.TargetCellVectors,
      maxPasses: Int = 4,
      onHealth: (String, Long, DataFrame) => Unit = (_, _, _) => ())
      : (String, Boolean) = {
    val ranked = snapshot(spark, media, lex, ivf._1, graph._1,
      graphTarget).collect()
    val first = ranked.find(_.getInt(2) == 1).get.getString(0)
    val acted = first match {
      case "media" => MediaIndexLoop.rebuildNow(spark, media._1,
        (v, h) => onHealth("media", v, h))
      case "lex" => LexIndexLoop.compactNow(spark, lex)
      case "ivf" => IndexLoop.maintainNow(spark, ivf._1, ivf._2,
        maxPasses)
      case "graph" => GraphIndexLoop.rebuildNow(spark, graph._1,
        graph._2, graphTarget, (v, h) => onHealth("graph", v, h))
    }
    (first, acted)
  }
}
