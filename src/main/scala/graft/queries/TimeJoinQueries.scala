package graft.queries

import graft.QueryPack
import graft.ops.{EventOps, TimeJoins}

/** Driver-contract queries for the temporal join operators. The Spark side
  * runs the shuffle-bounded rewrites (union+window as-of, bucketed range
  * join — [[graft.ops.TimeJoins]]); the oracles use DuckDB's *native*
  * ASOF JOIN / inequality join, so the rewrite semantics are checked
  * against an independent formulation, not a mirror of the same plan. */
object TimeJoinQueries {

  /** Events with epoch-ms timestamps — DuckDB side (matches
    * EventOps.events' `ts div 1000000`). */
  private val eCte =
    """e AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
      |  FROM events)""".stripMargin

  val pack: QueryPack = QueryPack(
    queries = Map(
      "join_asof" -> ((s, dir) =>
        TimeJoins.asofViewToPurchase(EventOps.events(s, dir))),
      "join_range_count" -> ((s, dir) =>
        TimeJoins.viewsBeforePurchase(EventOps.events(s, dir)))),

    oracles = Map(
      // p is pre-aggregated to one row per (user_id, ts_ms) — max
      // event_id, mirroring the Spark op's documented tie-break — so the
      // native ASOF JOIN (which leaves the pick among equal-timestamp
      // matches unspecified) is deterministic even if a fixture carries
      // duplicate purchase timestamps per user.
      "join_asof" ->
        s"""WITH $eCte,
           |v AS (SELECT event_id, user_id, ts_ms FROM e
           |      WHERE event_type = 'view'),
           |p AS (SELECT max(event_id) AS event_id, user_id, ts_ms FROM e
           |      WHERE event_type = 'purchase' GROUP BY user_id, ts_ms)
           |SELECT v.event_id AS event_id, v.user_id AS user_id,
           |       v.ts_ms AS ts_ms,
           |       p.event_id AS purchase_event_id,
           |       p.ts_ms AS purchase_ts_ms
           |FROM v ASOF JOIN p
           |  ON v.user_id = p.user_id AND v.ts_ms >= p.ts_ms""".stripMargin,

      "join_range_count" ->
        s"""WITH $eCte,
           |v AS (SELECT user_id, ts_ms FROM e WHERE event_type = 'view'),
           |p AS (SELECT event_id, user_id, ts_ms FROM e
           |      WHERE event_type = 'purchase')
           |SELECT p.event_id, p.user_id, p.ts_ms,
           |       count(v.ts_ms) AS n_views_before
           |FROM p LEFT JOIN v
           |  ON v.user_id = p.user_id
           | AND v.ts_ms >= p.ts_ms - 60000 AND v.ts_ms < p.ts_ms
           |GROUP BY 1, 2, 3""".stripMargin))
}
