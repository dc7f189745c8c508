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

  test("AQP rule: count(distinct) → HLL++ only when opted in") {
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.ApproxDistinctRewrite)) {
      // same Rule[LogicalPlan] GraftExtensions injects at session build;
      // the shared test session predates the extension, so attach the
      // rule through the runtime extension point
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.ApproxDistinctRewrite
    }
    val df = table(spark, "/root/testdata/sf0.001", "orders")
    def q = df.groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("nd"))
    try {
      // off by default — exact distinct survives
      val off = q.queryExecution.optimizedPlan.toString
      assert(off.contains("count(distinct") &&
        !off.contains("approx_count_distinct"), off.take(800))
      val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.graft.approx.countDistinct", "true")
      val on = q.queryExecution.optimizedPlan.toString
      assert(on.contains("approx_count_distinct"), on.take(800))
      val approx = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (k, e) =>
        assert(math.abs(approx(k) - e) <= math.max(3L, (e * 0.05).toLong),
          s"$k: approx ${approx(k)} vs exact $e")
      }
      // multi-column distinct is left exact (not expressible as one HLL)
      val multi = df.groupBy($"o_orderstatus")
        .agg(countDistinct($"o_custkey", $"o_orderpriority").as("nd2"))
        .queryExecution.optimizedPlan.toString
      assert(multi.contains("count(distinct") &&
        !multi.contains("approx_count_distinct"), multi.take(800))
    } finally spark.conf.unset("spark.graft.approx.countDistinct")
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

  test("count-min sketch: never under-counts, over-counts bounded by eps·N") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val terms = docs.select(explode(
      graft.functions.TextFunctions.words($"text")).as("term"))
    terms.cache()
    val n = terms.count()
    val exact = terms.groupBy($"term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val candidates = exact.keys.take(200).toSeq
    val est = graft.operators.Stats.cmsEstimates(terms, "term", candidates,
      eps = 0.001, confidence = 0.99).toMap
    candidates.foreach { t =>
      assert(est(t) >= exact(t), s"CMS under-counted $t: ${est(t)} < ${exact(t)}")
      assert(est(t) <= exact(t) + math.ceil(0.001 * n).toLong + 1,
        s"CMS over-count for $t beyond eps·N: ${est(t)} vs ${exact(t)} (N=$n)")
    }
    // mergeable: sketches of two halves, merged, give the same bounds —
    // the roll-up path for per-hour → per-day counts without a re-read
    val h1 = terms.limit((n / 2).toInt)
    val s1 = h1.stat.countMinSketch($"term", 0.001, 0.99, 42)
    val s2 = terms.exceptAll(h1).stat.countMinSketch($"term", 0.001, 0.99, 42)
    s1.mergeInPlace(s2)
    candidates.take(50).foreach { t =>
      assert(s1.estimateCount(t) >= exact(t))
    }
    terms.unpersist()
  }
}
