package graft.queries

import graft.QueryPack
import graft.ops.JobOps

/** Driver-contract query for job lifecycle tracking (SURVEY.md §2.1
  * job_poll_state). */
object JobQueries {

  private val statusCte =
    """statuses AS (
      |  SELECT 'job_' || user_id AS job_id, event_id, epoch_ms(ts) AS ts_ms,
      |    CASE event_type
      |      WHEN 'click' THEN 'PENDING'
      |      WHEN 'view' THEN 'RUNNING'
      |      WHEN 'signup' THEN 'SCHEDULED'
      |      WHEN 'purchase' THEN 'SUCCEEDED'
      |      ELSE 'FAILED'
      |    END AS state
      |  FROM events)""".stripMargin

  val pack: QueryPack = QueryPack(
    queries = Map(
      "job_poll_state" -> ((s, dir) =>
        JobOps.latestJobState(JobOps.jobStatusLog(s, dir)))),
    oracles = Map(
      "job_poll_state" ->
        s"""WITH $statusCte,
           |ranked AS (
           |  SELECT job_id, state,
           |    row_number() OVER (PARTITION BY job_id
           |      ORDER BY ts_ms DESC, event_id DESC) AS rn
           |  FROM statuses)
           |SELECT job_id, state,
           |  state IN ('SUCCEEDED','FAILED','CANCELLED') AS is_terminal
           |FROM ranked WHERE rn = 1""".stripMargin))
}
