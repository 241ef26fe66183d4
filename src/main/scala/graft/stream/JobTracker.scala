package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{JobRun, JobState}

/** Streaming job-lifecycle tracker — the stateful-streaming form of the
  * reference's four poll loops (SURVEY.md §2.1 job_poll_state): instead of
  * a thread sleeping on a remote state API, job-status events flow through
  * `flatMapGroupsWithState` keyed by job id, and the tracker emits exactly
  * one record when a job reaches a terminal state.
  *
  * State per key is one (latestState, latestTs, emitted) record; terminal
  * jobs keep a tombstone so late duplicate statuses don't re-emit. With a
  * `tombstoneTtlMs` the tombstone is reclaimed by a processing-time state
  * timeout — at 100 TB-scale event volumes (millions of job ids over a
  * long-running query) unbounded tombstones are a state-store leak; the
  * TTL bounds state size at (jobs active within the TTL window).
  */
object JobTracker {

  final case class TrackerState(state: String, tsMillis: Long, emitted: Boolean)

  final case class TerminalEvent(
      jobId: String, finalState: String, tsMillis: Long, succeeded: Boolean)

  /** The per-group transition function (shared by streaming and tests).
    * `tombstoneTtlMs` > 0 arms a processing-time timeout after a terminal
    * emit; on the timeout callback the tombstone is dropped. */
  def track(tombstoneTtlMs: Long)(jobId: String, updates: Iterator[JobRun],
      state: GroupState[TrackerState]): Iterator[TerminalEvent] = {
    if (state.hasTimedOut) {
      // tombstone TTL expired: reclaim the state slot. A later duplicate
      // status for this job would re-open state, but only re-emit if it is
      // itself a fresh terminal transition — the TTL is chosen >> the
      // at-least-once redelivery horizon.
      state.remove()
      return Iterator.empty
    }
    val sorted = updates.toSeq.sortBy(_.tsMillis)
    var cur = state.getOption.getOrElse(TrackerState("SUBMITTED", 0L, emitted = false))
    var out = List.empty[TerminalEvent]
    sorted.foreach { u =>
      if (u.tsMillis >= cur.tsMillis && !cur.emitted) {
        cur = TrackerState(u.state, u.tsMillis, emitted = false)
        if (JobState.isTerminal(u.state)) {
          out ::= TerminalEvent(jobId, u.state, u.tsMillis,
            succeeded = u.state == "SUCCEEDED")
          cur = cur.copy(emitted = true)
        }
      }
    }
    state.update(cur)
    if (tombstoneTtlMs > 0 && cur.emitted)
      state.setTimeoutDuration(tombstoneTtlMs)
    out.reverseIterator
  }

  /** Wire the tracker over a (streaming) Dataset[JobRun]. Pass a positive
    * `tombstoneTtlMs` to reclaim terminal-job tombstones (recommended for
    * long-running queries); 0 keeps them forever (test/short-lived). */
  def terminalEvents(runs: Dataset[JobRun],
      tombstoneTtlMs: Long = 0L): Dataset[TerminalEvent] = {
    val spark = runs.sparkSession
    import spark.implicits._
    val timeout =
      if (tombstoneTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    runs.groupByKey(_.jobId)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        track(tombstoneTtlMs))
  }
}
