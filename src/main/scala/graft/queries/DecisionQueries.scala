package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.model.EngineConfig
import graft.ops.{Decide, EventOps}

/** Driver-contract queries for the event/decision operators
  * (SURVEY.md §2.1 rows 1-9). Every oracle below recomputes the snapshot-log
  * derivation (FIXTURES.md §3) in DuckDB SQL so both engines run the same
  * pure rule over `events`. */
object DecisionQueries {

  private val cfg = EngineConfig()

  /** Epoch-ms constants pinned in graft.model.Fixture / Decide. */
  private val nowMs = Decide.NowMs                  // 2024-01-31T00:00:00Z
  private val staleMs = Decide.staleCutoffMs(cfg)   // now − 3 h

  private val writeOpsSql = "('click','purchase','signup','view')"

  /** Shared CTE: the snapshot log derived from events. */
  private val logCte =
    s"""log AS (
       |  SELECT user_id AS table_id, event_id AS snapshot_id,
       |         epoch_ms(ts) AS ts_ms,
       |         CASE WHEN event_type = 'purchase' THEN 'replace'
       |              ELSE 'append' END AS operation
       |  FROM events WHERE event_type IN $writeOpsSql)""".stripMargin

  /** Shared CTE: log restricted to commits newer than the last replace. */
  private val cutCte =
    s"""marked AS (
       |  SELECT *, max(CASE WHEN operation = 'replace' THEN ts_ms END)
       |              OVER (PARTITION BY table_id) AS lr
       |  FROM log),
       |cut AS (
       |  SELECT table_id, snapshot_id, ts_ms, operation FROM marked
       |  WHERE lr IS NULL OR ts_ms > lr)""".stripMargin

  val pack: QueryPack = QueryPack(
    queries = Map(
      "commit_event_filter" -> ((s, dir) =>
        EventOps.commitEvents(s, dir)
          .select(col("event_id"), col("user_id").as("table_id"),
            col("event_type"))),

      "event_json_encode" -> ((s, dir) => EventOps.jsonEncode(s, dir)),

      "table_ident_parse" -> ((s, dir) => EventOps.identParse(s, dir)),

      "snapshot_ancestor_scan" -> ((s, dir) => EventOps.ancestorScan(s, dir)),

      "optimize_cutoff" -> ((s, dir) =>
        Decide.optimizeCutoff(EventOps.snapshotLog(s, dir))
          .select("table_id", "snapshot_id", "ts_ms")),

      "time_threshold_pred" -> ((s, dir) =>
        Decide.timeThresholdPred(EventOps.snapshotLog(s, dir), cfg)
          .select("table_id", "snapshot_id", "ts_ms", "age_ms")),

      "commit_threshold_count" -> ((s, dir) =>
        Decide.commitThresholdCount(
          Decide.optimizeCutoff(EventOps.snapshotLog(s, dir)), cfg)
          .select("table_id", "snapshot_id", "commits_so_far", "triggered")),

      "should_optimize" -> ((s, dir) =>
        Decide.shouldOptimize(EventOps.snapshotLog(s, dir), cfg)),

      // Snapshot expiration (the other half of Iceberg table maintenance
      // next to compaction): a snapshot is expirable when it is BOTH
      // outside the retain-last-5 window AND older than the staleness
      // cutoff — the per-table window + predicate form of
      // expire_snapshots(older_than, retain_last).
      "expire_snapshots" -> ((s, dir) => {
        val w = Window.partitionBy(col("table_id"))
          .orderBy(col("ts_ms").desc, col("snapshot_id").desc)
        EventOps.snapshotLog(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") > 5 && col("ts_ms") <= staleMs)
          .select("table_id", "snapshot_id", "ts_ms")
      }),

      // Time-travel resolve + rollback plan (rollback_to_timestamp
      // analog): per table, the snapshot that was current as of the
      // staleness cutoff and how many newer snapshots a rollback would
      // orphan. Metadata-only — one window + one aggregate over the log;
      // tables born after the cutoff have nothing to roll back to and
      // are absent by construction.
      "snapshot_rollback" -> ((s, dir) => {
        val w = Window.partitionBy(col("table_id"))
          .orderBy(col("ts_ms").desc, col("snapshot_id").desc)
        val log = EventOps.snapshotLog(s, dir)
        val asof = log.filter(col("ts_ms") <= staleMs)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("table_id"), col("snapshot_id").as("rollback_to"),
            col("ts_ms").as("rollback_ts_ms"))
        val newer = log.filter(col("ts_ms") > staleMs)
          .groupBy(col("table_id")).agg(count(lit(1)).as("n_orphaned"))
        asof.join(newer, Seq("table_id"), "left")
          .select(col("table_id"), col("rollback_to"),
            col("rollback_ts_ms"),
            coalesce(col("n_orphaned"), lit(0L)).as("n_orphaned"))
      }),

      // Table-state diff between the staleness cutoff and now: commits
      // newly visible, superseded by an intervening replace, and kept —
      // the since-last-audit change report ([[EventOps.snapshotDiff]]).
      "snapshot_diff" -> ((s, dir) =>
        EventOps.snapshotDiff(EventOps.snapshotLog(s, dir), staleMs,
          Long.MaxValue)),

      // Commit cadence via lag(): per-commit gap to the previous commit of
      // the same table (-1 for a table's first commit) — the signal behind
      // the time-threshold trigger, and the lead/lag window shape.
      "commit_interarrival" -> ((s, dir) => {
        val w = Window.partitionBy(col("table_id"))
          .orderBy(col("ts_ms"), col("snapshot_id"))
        EventOps.snapshotLog(s, dir)
          .withColumn("gap_ms",
            coalesce(col("ts_ms") - lag(col("ts_ms"), 1).over(w), lit(-1L)))
          .select("table_id", "snapshot_id", "ts_ms", "gap_ms")
      }),

      // SCD2 history: turn the append-only snapshot log into
      // slowly-changing-dimension type-2 rows — per table, each commit is
      // a version with a [valid_from, valid_to] interval closed by the
      // next commit (open = current). One window pass (row_number + lead),
      // the standard change-tracking shape a warehouse derives from a
      // commit stream.
      "scd2_history" -> ((s, dir) => {
        val w = Window.partitionBy(col("table_id"))
          .orderBy(col("ts_ms"), col("snapshot_id"))
        EventOps.snapshotLog(s, dir)
          .withColumn("version", row_number().over(w))
          .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
          .select(
            col("table_id"), col("snapshot_id"),
            col("ts_ms").as("valid_from_ms"),
            col("version"),
            coalesce(col("next_ts") - 1, lit(-1L)).as("valid_to_ms"),
            col("next_ts").isNull.as("is_current"))
      })),

    oracles = Map(
      "commit_event_filter" ->
        s"""SELECT event_id, user_id AS table_id, event_type
           |FROM events WHERE event_type IN $writeOpsSql""".stripMargin,

      "event_json_encode" ->
        s"""SELECT event_id,
           |  to_json(struct_pack(event_id := event_id,
           |                      event_type := event_type))::VARCHAR AS ev_json,
           |  CAST(json_extract_string(props, '$$.k') AS INTEGER) AS prop_k
           |FROM events WHERE event_type IN $writeOpsSql""".stripMargin,

      "table_ident_parse" ->
        """SELECT n_nationkey,
          |  'glue.' || lower(n_name) || '.t' AS full_name,
          |  array_to_string(
          |    string_split('glue.' || lower(n_name) || '.t', '.')[2:],
          |    '.') AS table_ident
          |FROM nation""".stripMargin,

      "snapshot_ancestor_scan" ->
        s"""WITH $logCte
           |SELECT table_id, snapshot_id, ts_ms, operation,
           |  CAST(row_number() OVER (PARTITION BY table_id
           |       ORDER BY ts_ms DESC, snapshot_id DESC) AS INTEGER) AS rn
           |FROM log""".stripMargin,

      "optimize_cutoff" ->
        s"""WITH $logCte, $cutCte
           |SELECT table_id, snapshot_id, ts_ms FROM cut""".stripMargin,

      "time_threshold_pred" ->
        s"""WITH $logCte
           |SELECT table_id, snapshot_id, ts_ms, $nowMs - ts_ms AS age_ms
           |FROM log WHERE ts_ms <= $staleMs""".stripMargin,

      "commit_threshold_count" ->
        s"""WITH $logCte, $cutCte
           |SELECT table_id, snapshot_id,
           |  CAST(row_number() OVER (PARTITION BY table_id
           |       ORDER BY ts_ms DESC, snapshot_id DESC) AS INTEGER)
           |    AS commits_so_far,
           |  CAST(row_number() OVER (PARTITION BY table_id
           |       ORDER BY ts_ms DESC, snapshot_id DESC) AS INTEGER)
           |    >= ${cfg.commitThreshold} AS triggered
           |FROM cut""".stripMargin,

      "expire_snapshots" ->
        s"""WITH $logCte
           |SELECT table_id, snapshot_id, ts_ms FROM (
           |  SELECT table_id, snapshot_id, ts_ms,
           |    row_number() OVER (PARTITION BY table_id
           |      ORDER BY ts_ms DESC, snapshot_id DESC) AS rn
           |  FROM log)
           |WHERE rn > 5 AND ts_ms <= $staleMs""".stripMargin,

      "snapshot_rollback" ->
        s"""WITH $logCte,
           |resolved AS (
           |  SELECT table_id, snapshot_id AS rollback_to,
           |         ts_ms AS rollback_ts_ms
           |  FROM (SELECT table_id, snapshot_id, ts_ms,
           |          row_number() OVER (PARTITION BY table_id
           |            ORDER BY ts_ms DESC, snapshot_id DESC) AS rn
           |        FROM log WHERE ts_ms <= $staleMs)
           |  WHERE rn = 1),
           |newer AS (
           |  SELECT table_id, count(*) AS n FROM log
           |  WHERE ts_ms > $staleMs GROUP BY 1)
           |SELECT r.table_id, rollback_to, rollback_ts_ms,
           |  CAST(COALESCE(n, 0) AS BIGINT) AS n_orphaned
           |FROM resolved r LEFT JOIN newer USING (table_id)""".stripMargin,

      "snapshot_diff" ->
        s"""WITH $logCte,
           |s1 AS (
           |  SELECT table_id, snapshot_id FROM (
           |    SELECT table_id, snapshot_id, ts_ms,
           |      max(CASE WHEN operation = 'replace' THEN ts_ms END)
           |        OVER (PARTITION BY table_id) AS lr
           |    FROM log WHERE ts_ms <= $staleMs)
           |  WHERE lr IS NULL OR ts_ms >= lr),
           |s2 AS (
           |  SELECT table_id, snapshot_id FROM (
           |    SELECT table_id, snapshot_id, ts_ms,
           |      max(CASE WHEN operation = 'replace' THEN ts_ms END)
           |        OVER (PARTITION BY table_id) AS lr
           |    FROM log)
           |  WHERE lr IS NULL OR ts_ms >= lr)
           |SELECT COALESCE(s1.table_id, s2.table_id) AS table_id,
           |  CAST(sum(CASE WHEN s1.snapshot_id IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_added,
           |  CAST(sum(CASE WHEN s2.snapshot_id IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_removed,
           |  CAST(sum(CASE WHEN s1.snapshot_id IS NOT NULL
           |    AND s2.snapshot_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_kept
           |FROM s1 FULL JOIN s2
           |  ON s1.table_id = s2.table_id
           |  AND s1.snapshot_id = s2.snapshot_id
           |GROUP BY 1""".stripMargin,

      "commit_interarrival" ->
        s"""WITH $logCte
           |SELECT table_id, snapshot_id, ts_ms,
           |  COALESCE(ts_ms - lag(ts_ms) OVER (PARTITION BY table_id
           |    ORDER BY ts_ms, snapshot_id), -1) AS gap_ms
           |FROM log""".stripMargin,

      "scd2_history" ->
        s"""WITH $logCte
           |SELECT table_id, snapshot_id, ts_ms AS valid_from_ms,
           |  CAST(row_number() OVER w AS INTEGER) AS version,
           |  COALESCE(lead(ts_ms) OVER w - 1, -1) AS valid_to_ms,
           |  lead(ts_ms) OVER w IS NULL AS is_current
           |FROM log
           |WINDOW w AS (PARTITION BY table_id
           |             ORDER BY ts_ms, snapshot_id)""".stripMargin,

      "should_optimize" ->
        s"""WITH $logCte, $cutCte,
           |agg AS (
           |  SELECT table_id, count(*) AS n, min(ts_ms) AS oldest,
           |         max(CASE WHEN ts_ms <= $staleMs THEN 1 ELSE 0 END) AS stale
           |  FROM cut GROUP BY table_id),
           |t AS (SELECT DISTINCT table_id FROM log)
           |SELECT t.table_id,
           |  COALESCE(n, 0) AS n_commits_since_replace,
           |  COALESCE(oldest, -1) AS oldest_pending_ts_ms,
           |  COALESCE(stale, 0) = 1 AS time_triggered,
           |  (COALESCE(n, 0) >= ${cfg.commitThreshold}
           |    OR COALESCE(stale, 0) = 1) AS should_optimize
           |FROM t LEFT JOIN agg USING (table_id)""".stripMargin))
}
