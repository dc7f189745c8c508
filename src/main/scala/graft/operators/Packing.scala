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
}
