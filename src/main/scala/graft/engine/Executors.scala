package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.model.{CompactionSpec, EngineConfig, JobRun, PollPolicy}
import graft.ops.Codegen

/** Executor SPI — the engine-binding abstraction (Executor.java:9-23) with
  * local implementations instead of AWS service calls: submit returns a job
  * id immediately, states accumulate in a [[JobStateLog]], and the
  * synchronous gate (AwsManageProperties.java:20-22) decides whether the
  * caller blocks on the poll loop (SURVEY.md §2.1 job_poll_state,
  * sync_async_gate).
  */
trait Executor {
  def initialize(table: String, properties: Map[String, String]): Unit
  /** Submit the maintenance job; returns the job id. */
  def execute(): String
}

/** Append-only job-state log: the local analog of the four remote state
  * APIs the reference polls (GetQueryExecution / DescribeStep / ...). */
final class JobStateLog {
  private val log = new ConcurrentLinkedQueue[JobRun]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  def append(run: JobRun): Unit = log.add(run)
  def all: Seq[JobRun] = log.iterator().asScala.toSeq
  /** Unique job sequence number (atomic — executors may share a log). */
  def nextJobSeq(): Long = seq.getAndIncrement()
  /** Latest observed state for a job, if any. */
  def currentState(jobId: String): Option[String] =
    all.filter(_.jobId == jobId).sortBy(_.tsMillis).lastOption.map(_.state)
}

object Executors {
  /** job_poll_state: block until the job leaves the engine's non-terminal
    * set, checking every sleepWaitMs — the loop shape of
    * AthenaOptimizeDataExecutor.java:122-155 and its three EMR siblings.
    * The per-engine machine (which states spin, which raise) comes from
    * the [[PollPolicy]]; the default is the local composite, which keeps
    * the union non-terminal set and the Athena-style raise on
    * FAILED/CANCELLED. */
  def waitForCompletion(log: JobStateLog, jobId: String,
      sleepWaitMs: Long, maxWaitMs: Long = 600000L,
      policy: PollPolicy = PollPolicy.Local): String = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    def cur(): String = log.currentState(jobId).getOrElse(policy.initial)
    var state = cur()
    while (policy.nonTerminal.contains(state)) {
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(s"job $jobId timed out in $state")
      Thread.sleep(sleepWaitMs)
      state = cur()
    }
    if (policy.raiseOn.contains(state))
      throw new IllegalStateException(s"job $jobId terminated: $state")
    state
  }

  /** executor_dynload (AwsTableManagementMetricsEvaluator.java:152-176):
    * resolve an executor implementation by configured name. Known names map
    * to strategy objects; unknown names fall back to reflective no-arg
    * construction, preserving the reference's open extension point. */
  def load(name: String, spark: SparkSession, log: JobStateLog): Executor =
    name match {
      case "local" => new LocalSparkExecutor(spark, log)
      case "dry-run" => new DryRunExecutor(log)
      case "athena-dry-run" => new AthenaDryRunExecutor(log)
      case className =>
        try Class.forName(className).getDeclaredConstructor()
          .newInstance().asInstanceOf[Executor]
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"cannot initialize executor $className", e)
        }
    }
}

/** Runs the compaction as an in-process Spark action on a Future — the
  * local analog of submitting to a remote engine. `input`/`output` dirs are
  * carried in properties (`local.input-dir` / `local.output-dir`). */
final class LocalSparkExecutor(spark: SparkSession, log: JobStateLog)
    extends Executor {
  private var table: String = _
  private var cfg: EngineConfig = EngineConfig()
  private var props: Map[String, String] = Map.empty
  @volatile private[engine] var lastJob: Option[Future[Unit]] = None

  override def initialize(table: String, properties: Map[String, String]): Unit = {
    this.table = table
    this.props = properties
    this.cfg = EngineConfig.fromProperties(properties)
  }

  override def execute(): String = {
    val jobId = s"local-$table-${log.nextJobSeq()}"
    val input = props.getOrElse("local.input-dir",
      throw new IllegalArgumentException("local.input-dir is required"))
    val output = props.getOrElse("local.output-dir",
      throw new IllegalArgumentException("local.output-dir is required"))
    val spec = CompactionSpec(table, cfg.strategy, cfg.options, cfg.sortOrder)
    val t0 = System.currentTimeMillis()
    log.append(JobRun(jobId, "SUBMITTED", t0))
    implicit val ec: ExecutionContext = ExecutionContext.global
    val job = Future {
      log.append(JobRun(jobId, "RUNNING", System.currentTimeMillis()))
      Compact.run(spark, spec, input, output)
      log.append(JobRun(jobId, "SUCCEEDED", System.currentTimeMillis()))
    }.recover { case e =>
      log.append(JobRun(jobId, "FAILED", System.currentTimeMillis()))
      throw e
    }
    lastJob = Some(job)
    if (cfg.synchronousEnabled)
      Executors.waitForCompletion(log, jobId, cfg.sleepWaitMs)
    jobId
  }

  /** Test/shutdown hook: block on the in-flight job if any. */
  private[graft] def awaitLast(): Unit =
    lastJob.foreach(f => Await.ready(f, Duration.Inf))
}

/** Athena-path analog of [[DryRunExecutor]]: emits the full
  * `StartQueryExecution`-shaped parameter block instead of calling AWS.
  * Faithful to AthenaOptimizeDataExecutor.java in the two places the
  * engines differ:
  *  - initialize REQUIRES the result-output bucket (:64) — missing prop
  *    rejects at initialize time, before any job is submitted;
  *  - the data-catalog property (default `AwsDataCatalog`,
  *    AwsManageProperties.java:33-35) rides into the execution context
  *    (:89-90). */
final class AthenaDryRunExecutor(log: JobStateLog) extends Executor {
  private var table: String = _
  private var cfg: EngineConfig = EngineConfig()
  var generatedParams: Option[String] = None

  override def initialize(table: String, properties: Map[String, String]): Unit = {
    this.table = table
    this.cfg = EngineConfig.fromProperties(properties)
    cfg.requireAthenaOutputBucket()
  }

  override def execute(): String = {
    val jobId = s"athena-$table-${log.nextJobSeq()}"
    generatedParams = Some(Codegen.athenaStartQueryParams(table, cfg))
    val now = System.currentTimeMillis()
    log.append(JobRun(jobId, "QUEUED", now))
    log.append(JobRun(jobId, "SUCCEEDED", now))
    jobId
  }
}

/** Emits the generated SQL instead of running anything — the codegen path
  * is itself reference behavior worth preserving (SURVEY.md §3.2). */
final class DryRunExecutor(log: JobStateLog) extends Executor {
  private var table: String = _
  private var cfg: EngineConfig = EngineConfig()
  var generatedSql: Option[String] = None

  override def initialize(table: String, properties: Map[String, String]): Unit = {
    this.table = table
    this.cfg = EngineConfig.fromProperties(properties)
  }

  override def execute(): String = {
    val jobId = s"dry-$table-${log.nextJobSeq()}"
    val spec = CompactionSpec(table, cfg.strategy, cfg.options, cfg.sortOrder)
    generatedSql = Some(Codegen.rewriteDataFilesSql(spec))
    val now = System.currentTimeMillis()
    log.append(JobRun(jobId, "SUBMITTED", now))
    log.append(JobRun(jobId, "SUCCEEDED", now))
    jobId
  }
}
