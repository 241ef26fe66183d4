package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert) semantics over plain DataFrames — the write-path
  * operator the reference delegates to Iceberg's copy-on-write MERGE
  * (the `rewrite_data_files` REPLACE commits it then manages are produced
  * by exactly this kind of rewrite). Re-expressed Spark-first as ONE
  * full-outer equi-join on the key:
  *
  *  - matched + op 'U'  → row takes the change payload
  *  - matched + op 'D'  → row dropped
  *  - matched + op 'I'  → insert ignored, base row kept (idempotent load)
  *  - unmatched + 'I'   → row inserted
  *  - unmatched + 'U'/'D' → change ignored (nothing to update/delete)
  *  - base row with no change → kept as-is
  *
  * At 100 TB the join shuffles both sides by the key once; a small
  * change-set broadcasts instead (Catalyst/AQE decides from real sizes),
  * so incremental loads ride the base scan. Combined with
  * [[graft.engine.Compact.partialProgress]] the rewrite commits per file
  * group — the same copy-on-write shape table formats implement.
  */
object Merge {

  /** Apply a change-set to `base`. `changes` must carry the same columns
    * as `base` plus an `op` column in {'U','I','D'}. Change keys must be
    * unique — a batch with several ops per key would otherwise yield
    * duplicated/contradictory rows out of the full-outer join, so the
    * precondition is enforced in-plan: a count over the change keys (the
    * small side — one narrow window, no extra driver action) raises at
    * execution time on the first duplicate. Pre-aggregate upstream if a
    * batch can legitimately carry several ops per key — last-writer-wins
    * is a `row_number` over the batch. */
  def applyChangeSet(base: DataFrame, changes: DataFrame,
      key: String): DataFrame = {
    require(changes.columns.contains("op"), "changes needs an 'op' column")
    val payload = base.columns.filterNot(_ == key).toIndexedSeq
    val perKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
    val guardedOp = when(count(lit(1)).over(perKey) > 1,
      raise_error(concat(lit(s"duplicate change key in merge batch: $key="),
        col(key).cast("string")))).otherwise(col("op"))
    val ch = changes.select(
      col(key).as("__ck") +:
        guardedOp.as("__op") +:
        payload.map(c => col(c).as(s"__c_$c")): _*)
    val joined = base.join(ch, col(key) === col("__ck"), "full_outer")
    val matched = col(key).isNotNull && col("__ck").isNotNull
    val keep =
      col("__op").isNull ||                            // untouched base row
      (matched && col("__op") === "U") ||              // update
      (matched && col("__op") === "I") ||              // ignored insert
      (col(key).isNull && col("__op") === "I")         // true insert
    val takeChange =
      (matched && col("__op") === "U") ||
        (col(key).isNull && col("__op") === "I")
    val outKey = when(takeChange, col("__ck")).otherwise(col(key)).as(key)
    val outCols = outKey +: payload.map(c =>
      when(takeChange, col(s"__c_$c")).otherwise(col(c)).as(c))
    joined.filter(keep).select(outCols: _*)
  }
}
