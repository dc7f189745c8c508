package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin produces exactly the plain join's rows") {
    val li = table(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val o = table(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", 8).count()
    assert(salted == plain)
  }

  test("saltedCount matches plain groupBy counts") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val plain = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(ev, "event_type", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("approximate sketches land within tolerance of exact answers") {
    val li = table(spark, "/root/testdata/sf0.001", "lineitem")
    val exactD = li.select(countDistinct($"l_partkey")).collect()(0).getLong(0)
    val approxD = li.select(approx_count_distinct($"l_partkey"))
      .collect()(0).getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05)

    val exactP = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val approxP = li.select(percentile_approx($"l_extendedprice", lit(0.5),
      lit(1000))).collect()(0).getDouble(0)
    assert(math.abs(approxP - exactP) / exactP < 0.05)

    // datasketches HLL: union of per-group sketches ≈ global distinct
    val merged = li.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .collect()(0).getLong(0)
    assert(math.abs(merged - exactD).toDouble / exactD < 0.05)
  }
}
