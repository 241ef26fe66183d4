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
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltBuckets))
        .cast("int"))
    val replicated = right
      .withColumn("__salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
