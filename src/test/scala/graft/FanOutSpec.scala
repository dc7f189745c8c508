package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** graft.fanOut — the round-12 scale-adaptive spread for
  * under-parallelized inputs (guide §2.5 "unsplittable input"): a
  * single-row-group parquet table arrives as ~one scan partition, so
  * every scan-stage kernel runs on one core. fanOut repartitions such
  * an input to the session's core count and is a NO-OP (no exchange,
  * same plan object) once the input already has ≥ defaultParallelism
  * partitions — the "corpus never shuffles" discipline at scale.
  */
class FanOutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("fires on an under-parallelized input: partitions become " +
      "defaultParallelism, rows and content unchanged") {
    val df = table(spark, dir, "documents").select(col("doc_id"),
      col("text"))
    val target = spark.sparkContext.defaultParallelism
    assume(df.rdd.getNumPartitions < target,
      "fixture expects a narrow scan")
    val out = fanOut(df, col("doc_id"))
    assert(out.rdd.getNumPartitions == target)
    // same multiset of rows
    assert(out.count() == df.count())
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
  }

  test("keyless form spreads too") {
    val df = table(spark, dir, "documents").select(col("doc_id"))
    val target = spark.sparkContext.defaultParallelism
    val out = fanOut(df)
    assert(out.rdd.getNumPartitions == target)
    assert(out.count() == df.count())
  }

  test("no-op on an already-wide input: the SAME DataFrame comes " +
      "back (no exchange added)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0L, 1000L, 1L, target + 3).toDF("id")
    val out = fanOut(wide, col("id"))
    assert(out eq wide)
    val outNoKey = fanOut(wide)
    assert(outNoKey eq wide)
  }

  test("kernel results are partitioning-independent: knnClassifyEval " +
      "over a pre-spread corpus equals the plain-scan result") {
    val emb = table(spark, dir, "embeddings")
    val base = operators.Similarity.knnClassifyEval(
      emb, "vec_id", "label", "embedding", 5)
    // force the opposite layout: single partition in, fanOut spreads
    val one = operators.Similarity.knnClassifyEval(
      emb.coalesce(1), "vec_id", "label", "embedding", 5)
    assert(base.exceptAll(one).isEmpty && one.exceptAll(base).isEmpty)
  }
}
