package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming global top-k terms by running frequency (complete output
  * mode): the groupBy counts aggregate incrementally in the state store
  * (state = one row per distinct term), and each trigger re-emits the
  * CURRENT top-k, ties broken lexicographically.
  *
  * Complete-mode sort+limit is the one place a "global sort" is fine at
  * scale: its input is the aggregate state — already reduced to distinct
  * terms by the incremental aggregation — and `limit(k)` compiles to
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows),
  * never a full sort. Contrast [[HeavyHitters]], which is append-mode and
  * emits each term once at its threshold crossing: top-k re-ranks every
  * trigger, heavy hitters notify once.
  */
object TopK {

  /** Current top-k terms with running document frequencies. Attach to
    * `writeStream.outputMode("complete")`. */
  def currentTopK(terms: Dataset[String], k: Int): DataFrame =
    terms.toDF("term")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)
}
