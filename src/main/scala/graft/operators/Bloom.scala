package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned anti/semi joins (SURVEY.md §2.H).
  *
  * The 100 TB decontamination / incremental-load shape: drop from a
  * huge corpus every row whose key appears in a smallish key set
  * (benchmark membership, already-loaded ids). A plain `left_anti`
  * join shuffles the ENTIRE big side on the key. The bloom path
  * never shuffles the big side at all:
  *
  *   1. build a bloom filter over the key set (one pass over the
  *      small side, mergeable sketch, driver gets ~KBs–MBs of bits);
  *   2. broadcast it; filter the big side map-side. Rows the filter
  *      rejects are DEFINITELY absent from the key set (bloom has no
  *      false negatives) — they pass through with zero shuffle;
  *   3. only the "might contain" rows — true matches plus an
  *      `fpp`-sized sliver of false positives — go through the exact
  *      `left_anti` join to restore exactness.
  *
  * Result is bit-identical to the plain anti join (the bloom is a
  * pruning layer, never a correctness layer), which is how the DuckDB
  * oracle (a plain NOT IN) checks it. At fpp=1% the shuffled volume
  * drops from 100 TB to (matches + 1% of non-matches).
  *
  * Spark-first notes: the sketch is `DataFrameStatFunctions
  * .bloomFilter` (distributed build, partial sketches merged);
  * membership runs as a broadcast-closure predicate. Spark's own
  * runtime row-level filters inject the same shape automatically for
  * shuffle joins, but not for this "keep the big side unshuffled"
  * anti-join plan.
  */
object Bloom {

  /** Exact `big LEFT ANTI JOIN keys` with the big side pruned
    * map-side by a broadcast bloom filter over `keys`.
    *
    * The key set is counted first: the count is one cheap job over the
    * SMALL side, it sizes the sketch exactly (expectedKeys guesses
    * either waste bits or inflate fpp — never correctness), and it
    * guards the empty case (`stat.bloomFilter` NPEs on zero rows;
    * an empty denylist just means `big` passes through).
    */
  def antiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
               fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val nKeys = keys.count()
    if (nKeys == 0) return big
    val bf = keys.stat.bloomFilter(keyCol, nKeys, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    // boxed Long so NULL keys reach the closure: an anti join KEEPS
    // null-keyed rows (null never equi-matches), so they route clean
    val definitelyAbsent = udf((k: java.lang.Long) =>
      k == null || !bc.value.mightContainLong(k))
    val clean = big.filter(definitelyAbsent(col(keyCol)))
    val suspects = big.filter(!definitelyAbsent(col(keyCol)))
    clean.unionByName(suspects.join(keys, Seq(keyCol), "left_anti"))
  }

  /** Exact semi join, same pruning structure: bloom-negative rows are
    * dropped map-side; only suspects are verified by the exact join.
    */
  def semiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
               fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val nKeys = keys.count()
    if (nKeys == 0) return big.limit(0)
    val bf = keys.stat.bloomFilter(keyCol, nKeys, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    big.filter(mightContain(col(keyCol))).join(keys, Seq(keyCol), "left_semi")
  }
}
