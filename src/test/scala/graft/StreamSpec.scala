package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{DryRunExecutor, JobStateLog}
import graft.model.EngineConfig
import graft.ops.{Decide, EventOps}
import graft.stream.EventPipeline

/** Streaming pipeline tests: stream/batch decision parity and end-to-end
  * event → decision → dispatch (SURVEY.md §3.1 restated). */
class StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val cfg = EngineConfig()

  test("streamed should_optimize equals the batch decision") {
    val batch = Decide.shouldOptimize(EventOps.snapshotLog(spark, dir), cfg)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val streamed = EventPipeline.decisionsViaStream(spark, dir, cfg)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("pipeline dispatches one job per triggered table") {
    val log = new JobStateLog
    val result = EventPipeline.runOnce(spark, dir, cfg,
      _ => new DryRunExecutor(log))
    val triggered = result.decisions.count(_.getBoolean(4))
    assert(result.submittedJobs.size === triggered)
    assert(triggered > 0)
    // every submitted job reached a terminal state in the log
    result.submittedJobs.foreach { id =>
      assert(log.currentState(id) === Some("SUCCEEDED"))
    }
  }

  test("windowed metrics: batch/stream-shared aggregation is consistent") {
    val metrics = EventPipeline.windowedMetrics(
      EventOps.events(spark, dir), "1 day").collect()
    assert(metrics.nonEmpty)
    // totals across windows equal raw totals
    val totalEvents = metrics.map(_.getLong(2)).sum
    assert(totalEvents === EventOps.events(spark, dir).count())
    // window starts are day-aligned
    metrics.foreach(r => assert(r.getLong(0) % 86400000L === 0L))
  }
}
