package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4): salted joins and two-phase
  * aggregation for hot keys.
  *
  * AQE's skew-join split handles storage-level skew at runtime; salting
  * is the static complement when ONE key dominates so heavily (null
  * keys, a default tenant, an empty-string bucket) that even split
  * partitions hot-spot. Both are provided; prefer AQE until profiling
  * says otherwise.
  */
object Skew {

  /** Inner equi-join with the left side's hot keys spread over
    * `saltBuckets` partitions. Left rows get a random-free deterministic
    * salt (hash of all columns mod buckets — reproducible, no RNG on
    * executors); the right side is replicated `saltBuckets` times so
    * every (key, salt) pair finds its match. Replication cost is
    * |right| × buckets — use for dimension-sized right sides.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets)))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial + final) aggregation for a skewed group key:
    * first aggregate on (key, salt), then re-aggregate on key. Spark's
    * hash aggregate already does map-side partials; the explicit salt
    * phase additionally splits a hot REDUCE-side key across
    * `saltBuckets` reducers.
    */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
