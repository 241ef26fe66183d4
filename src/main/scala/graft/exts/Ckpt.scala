package graft.exts

import org.apache.spark.sql.DataFrame

/** Materialization policy for shared intermediate frames — pricing the
  * resilience trade the r18 verdict flagged (guide §5).
  *
  * `localCheckpoint(eager = true)` stores the frame's blocks on
  * executors WITH LINEAGE TRUNCATED: on local[n] that is free
  * resilience-wise (one JVM — losing it loses the job either way), and
  * it is the measured-fastest materialization for the shingle
  * inverted-index family. On a real cluster, losing ONE executor loses
  * blocks that can no longer be recomputed, failing the job — at the
  * corpus scale these frames target, that trade should be explicit.
  *
  * Setting `spark.graft.checkpoint.reliable=true` (plus the standard
  * `sparkContext.setCheckpointDir(...)`) switches every shared-frame
  * materialization to a RELIABLE `checkpoint()`: blocks persist to the
  * checkpoint filesystem and survive executor loss, costing one
  * write+read round-trip through that FS. Results are identical either
  * way (CkptSpec pins it); only the failure/cost envelope moves. The
  * local default keeps the bench methodology and numbers comparable
  * round-over-round.
  *
  * NOTE (r18 ADVICE): materialization is EAGER, so merely CONSTRUCTING
  * a plan through here runs a Spark job — explain-only paths pay the
  * scan. That is deliberate: lazy cells race under concurrent consumers
  * (the r15 mmCaptionPairs lesson) and recompute the expensive pass.
  */
object Ckpt {

  /** Conf key: route shared-frame materializations to reliable
    * `checkpoint()` (requires a checkpoint dir). Default false. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Eagerly materialize a frame that feeds multiple consumers. */
  def eager(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(true) else df.localCheckpoint(true)

  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ReliableConf).exists(_.toBoolean)
}
