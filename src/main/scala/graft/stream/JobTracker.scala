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
  * jobs keep a tombstone so late duplicate statuses don't re-emit (reclaim
  * tombstones with a state timeout at scale).
  */
object JobTracker {

  final case class TrackerState(state: String, tsMillis: Long, emitted: Boolean)

  final case class TerminalEvent(
      jobId: String, finalState: String, tsMillis: Long, succeeded: Boolean)

  /** The per-group transition function (shared by streaming and tests). */
  def track(jobId: String, updates: Iterator[JobRun],
      state: GroupState[TrackerState]): Iterator[TerminalEvent] = {
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
    // terminal jobs keep a tombstone so late duplicates don't re-emit;
    // production pairs this with a state timeout to reclaim old tombstones
    state.update(cur)
    out.reverseIterator
  }

  /** Wire the tracker over a (streaming) Dataset[JobRun]. */
  def terminalEvents(runs: Dataset[JobRun]): Dataset[TerminalEvent] = {
    val spark = runs.sparkSession
    import spark.implicits._
    runs.groupByKey(_.jobId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(track)
  }
}
