package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingStreamSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packing respects the token budget per sequence (any shard count)") {
    val docs = (1L to 500L).map(i => (i, 10L + i % 90)).toDF("id", "toks")
    for (shards <- Seq(1, 4)) {
      val packed = Packing.packSequences(docs, "id", "toks", 512L, shards)
      // every doc fully assigned, ids unique
      assert(packed.count() == 500)
      // a sequence's PRIOR tokens never exceed the budget (greedy rule:
      // a doc starts a new sequence once the budget is crossed)
      val seqTotals = packed.groupBy($"seq_id")
        .agg(sum($"toks").as("t"), count(lit(1)).as("n")).collect()
      assert(seqTotals.forall(r => r.getAs[Long]("t") < 512 + 100))
      if (shards > 1) {
        val nSeqs = seqTotals.length
        assert(nSeqs >= shards) // sequences spread across shards
      }
    }
  }

  test("streaming upsert sink merges batches by key (latest wins)") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val target = java.nio.file.Files.createTempDirectory("graft_up").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upc").toString
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "a"), (2L, "b"))
    val q1 = graft.streaming.StreamingEtl.upsertSink(
      input.toDF().toDF("k", "v"), Seq("k"), target, ckpt)
    q1.awaitTermination()
    input.addData((2L, "B2"), (3L, "c")) // update key 2, insert key 3
    val q2 = graft.streaming.StreamingEtl.upsertSink(
      input.toDF().toDF("k", "v"), Seq("k"), target, ckpt)
    q2.awaitTermination()
    val out = spark.read.parquet(target).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }
}
