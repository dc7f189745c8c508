package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (SURVEY §2 E17): assign documents to
  * fixed-token-budget sequences by greedy running count in id order.
  *
  * Scale design: a single global cumulative sum would serialize onto
  * one partition. Packing instead runs per SHARD (hash of the id):
  * each shard's cumsum is an independent window over its own partition,
  * and sequence ids are made globally unique by a shard prefix. Sharding
  * costs nothing semantically — training sequences have no cross-shard
  * meaning — and turns the cumsum into an embarrassingly parallel pass.
  */
object Packing {

  private val ShardStride = 1000000000L

  def packSequences(df: DataFrame, idCol: String, tokCol: String,
                    budgetTokens: Long, shards: Int = 1): DataFrame = {
    require(shards >= 1)
    val sharded = df.withColumn("__shard",
      pmod(xxhash64(col(idCol)), lit(shards.toLong)))
    val w = Window.partitionBy(col("__shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__cum", sum(col(tokCol)).over(w))
      .withColumn("seq_id",
        (col("__shard") * ShardStride +
          floor((col("__cum") - col(tokCol)) / budgetTokens)).cast("long"))
      .drop("__shard", "__cum")
  }

  /** E49: token-stream block packing — the LLM dataloader shape:
    * every doc's id sequence plus an EOS sentinel, concatenated in
    * doc-id order, cut into fixed `blockSize` blocks (docs SPAN block
    * boundaries; nothing is padded or dropped except the final
    * partial block is emitted short).
    *
    * The hard part at scale is the GLOBAL prefix sum that places each
    * doc in the stream — a bare `Window.orderBy(doc)` serializes onto
    * one partition. This runs it two-level instead: per-bucket totals
    * (keyed agg over doc-cardinality rows), an ordered prefix over
    * the BUCKET-cardinality frame (thousands of rows at 100 TB —
    * that window being single-partition is immaterial), offsets
    * broadcast back, then the within-bucket prefix as a keyed window.
    * Token placement is then embarrassingly parallel: global position
    * = bucket offset + within-bucket offset + in-doc position, block
    * = position div blockSize, and block assembly is ONE keyed
    * shuffle. All integer arithmetic.
    *
    * @param docs (idCol: long-castable doc id, idsCol: array of long
    *             token ids — e.g. Corpus.vocabEncode(asArray = true))
    * @return (block_id, n_ids, n_docs, ids position-ordered array)
    */
  def packTokenStream(docs: DataFrame, idCol: String, idsCol: String,
                      blockSize: Long, eos: Long = -1L,
                      bucketWidth: Long = 1024L): DataFrame = {
    require(blockSize > 0 && bucketWidth > 0)
    val d = docs.select(col(idCol).cast("long").as("did"),
        concat(col(idsCol), array(lit(eos))).as("ids"))
      .withColumn("n", size(col("ids")).cast("long"))
      .withColumn("bkt", floor(col("did") / bucketWidth).cast("long"))
    val bucketTotals = d.groupBy(col("bkt")).agg(sum(col("n")).as("bn"))
    val bucketPrefix = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketTotals
      .withColumn("boff", coalesce(sum(col("bn")).over(bucketPrefix), lit(0L)))
      .select(col("bkt"), col("boff"))
    val withinBucket = Window.partitionBy(col("bkt")).orderBy(col("did"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = d.join(broadcast(bucketOffsets), "bkt")
      .withColumn("woff", coalesce(sum(col("n")).over(withinBucket), lit(0L)))
      .withColumn("off", col("boff") + col("woff"))
    placed
      .select(col("did"), col("off"),
        posexplode(col("ids")).as(Seq("p", "tid")))
      .withColumn("gpos", col("off") + col("p"))
      .withColumn("block_id",
        floor(col("gpos") / blockSize).cast("long"))
      .groupBy(col("block_id"))
      .agg(count(lit(1)).as("n_ids"),
        countDistinct(col("did")).as("n_docs"),
        transform(array_sort(collect_list(struct(col("gpos"), col("tid")))),
          x => x.getField("tid")).as("ids"))
  }

  /** E57: deterministic epoch shuffle + shard assignment — the
    * dataloader's global permutation. Each row's shuffle key is a
    * content hash of (salt ‖ id), so the permutation is a pure function
    * of the data and the salt (= the epoch number): reproducible across
    * engines, runs, partitionings, and restarts, re-randomized by
    * changing the salt. shard = hash mod nShards (balanced in
    * expectation with no coordination), pos = rank within the shard by
    * (hash, id) — a per-shard sort over corpus/nShards rows, the same
    * work `repartitionByRange + sortWithinPartitions` does when writing
    * shard files; no global total order is ever materialized. The
    * (hash+1)/2³² dyadic-uniform trick from [[Sampling.weightedSample]]
    * keeps every step exactly portable.
    */
  /** Deterministic token-budget sampling — "give me ~N tokens for the
    * ablation, reproducibly": docs ordered by a content-keyed md5 hash
    * (a fixed pseudo-random permutation — no RNG state, identical on
    * any engine/run/partitioning), kept while the RUNNING token total
    * stays within budget. Rate-based gates (hashGate/mixture weights)
    * can't hit a token target; this cuts at the exact doc where the
    * budget crosses.
    *
    * The running total is the E49 two-level prefix sum — per-bucket
    * token sums (4096 hash-prefix buckets) → ordered offsets over the
    * bucket-cardinality frame only → within-bucket cumulative window —
    * so no single-partition window ever sees data-sized frames. All
    * integer arithmetic.
    *
    * @return (idCol, tokCol, cum_tokens, keep) for every doc;
    *         keep ⟺ cum_tokens ≤ budget.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokCol: String,
                        budget: Long): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val d = df.select(col(idCol), col(tokCol))
      .withColumn("__h", h)
      .withColumn("__bkt", expr("__h div 68719476736")) // 2^48 / 4096
    val totals = d.groupBy(col("__bkt"))
      .agg(sum(col(tokCol)).as("__bt"))
    val prefix = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__bt")).over(prefix), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val within = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.join(broadcast(offsets), "__bkt")
      .withColumn("cum_tokens",
        (col("__off") + sum(col(tokCol)).over(within)).cast("long"))
      .select(col(idCol), col(tokCol), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("keep"))
  }

  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: String): DataFrame = {
    require(nShards >= 1)
    val h = conv(substring(md5(
        concat(lit(salt), col(idCol).cast("string")).cast("binary")), 1, 8),
      16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col(idCol))
    df.select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
