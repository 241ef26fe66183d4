package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salting.
  *
  * A shuffled equi-join on a hot key puts the whole hot partition on one
  * task. Salting splits each left-side key into `saltBuckets` synthetic
  * sub-keys and replicates the right side once per bucket, so the hot
  * key's rows spread over `saltBuckets` tasks. Use when AQE's skew-join
  * splitting isn't available (e.g. the skew is in the map output of a
  * single stage) or the hot keys are known a priori.
  *
  * At 100 TB this is the difference between a 4-hour straggler task and
  * an even 1000-task stage; the replication cost is |right| × buckets,
  * so keep the right side the smaller input.
  */
object Skew {

  /** Join left ⋈ right on `key` with the left side salted into
    * `saltBuckets` buckets. Both inputs must expose the column `key`;
    * output columns = left ++ right (minus the duplicate key). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // deterministic salt from the row content (not rand(): reproducible)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)),
        lit(saltBuckets))
        .cast("int"))
    val replicated = right
      .withColumn("__salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew diagnostic — the "plan before you run" report that
    * decides whether a key needs [[saltedEquiJoin]] (and with how many
    * buckets) BEFORE launching the 4-hour stage that straggles on it.
    * Emits the `topN` hottest keys with their row count, per-mille share
    * of the table, and the salt-bucket count that would spread the key
    * evenly over `parts` shuffle partitions
    * (`salt_buckets = max(1, rows·parts div total)` — a key holding 1/parts
    * of the data gets 1 bucket, a key holding half the table gets
    * parts/2).
    *
    * Scale shape: one hash aggregate on the key (map-side combined, so
    * the exchange carries ≤ distinct-keys rows), a 1-row total broadcast
    * back over the aggregate, and a distributed partial top-N
    * (TakeOrdered) — never a global sort, never a second scan of the
    * data. Integer arithmetic throughout. */
  def skewReport(events: DataFrame, key: String, topN: Int = 20,
      parts: Int = 32): DataFrame = {
    val counts = events.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total_rows"))
    counts.crossJoin(broadcast(total))
      .select(col(key), col("n_rows"), col("total_rows"),
        expr("n_rows * 1000 div total_rows").as("share_x1000"),
        greatest(lit(1L), expr(s"n_rows * $parts div total_rows"))
          .as("salt_buckets"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
  }
}
