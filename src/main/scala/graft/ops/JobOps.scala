package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.JobState

/** Job-lifecycle tracking as data (SURVEY.md §2.1 job_poll_state): the
  * reference polls four remote state APIs in a sleep loop; the relational
  * restatement is a latest-state-per-job query over an append-only
  * job-status log — one `row_number` window, shuffled by job id, which at
  * scale is an incremental "current state" view over billions of status
  * rows. */
object JobOps {

  /** Deterministic job-status log fixture derived from events: each user is
    * a job, event types map onto the union of the reference's four state
    * machines. Mirrored in oracle SQL. */
  def jobStatusLog(spark: SparkSession, dir: String): DataFrame =
    EventOps.events(spark, dir).select(
      concat(lit("job_"), col("user_id")).as("job_id"),
      col("event_id"),
      col("ts_ms"),
      when(col("event_type") === "click", "PENDING")
        .when(col("event_type") === "view", "RUNNING")
        .when(col("event_type") === "signup", "SCHEDULED")
        .when(col("event_type") === "purchase", "SUCCEEDED")
        .otherwise("FAILED").as("state"))

  /** Latest observed state per job + terminality — what each iteration of
    * the reference's poll loop computes. */
  def latestJobState(statusLog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("job_id"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    statusLog
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("job_id"),
        col("state"),
        col("state").isin(JobState.Terminal.toSeq: _*).as("is_terminal"))
  }
}
