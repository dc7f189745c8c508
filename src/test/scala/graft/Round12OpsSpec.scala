package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Stats, TimeSeries}

/** Round-12 harness + operator coverage: window-scale bench
  * calibration (VERDICT r11 #1), slow-tail re-time trigger, sampler
  * pair-budget probes (VERDICT r11 #4), the pageTrend job-economy
  * rewrite's oracle-exact degenerate semantics (VERDICT r11 #7 +
  * ADVICE), and crostonPerKey null handling (ADVICE r11).
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("windowScale: a synthetic 2× slow window corrects back to the " +
      "clean estimate; the r10 fast-window shape reads scale < 1 and " +
      "the phantom cross-round drift corrects to parity") {
    // clean window at the reference floor: scale 1
    assert(math.abs(Bench.windowScale(Bench.CleanFloorRef, 0.30) - 1.0)
      < 1e-9)
    // a window whose host runs 2× slower than the clean median: the
    // canary floor doubles, raw query times inflate ~2×, and dividing
    // by the scale recovers the clean-window estimate
    val slow = Bench.windowScale(2 * Bench.CleanFloorRef, 0.5)
    assert(math.abs(slow - 2.0) < 1e-9)
    val trueTime = 1.4
    assert(math.abs((trueTime * slow) / slow - trueTime) < 1e-9)
    // the r10 phantom: an anomalously FAST previous window (floor at
    // the band bottom) makes an unchanged query look like +33% next
    // round; window_scale division restores parity
    val fast = Bench.windowScale(0.066, 0.070)
    assert(fast < 0.8 && fast > 0.5)
    val r10Sample = trueTime * fast   // what the fast window recorded
    val r11Sample = trueTime * 1.0    // a median window next round
    val rawRatio = r11Sample / r10Sample
    val corrected = (r11Sample / 1.0) / (r10Sample / fast)
    assert(rawRatio > 1.3, s"synthetic drift not phantom: $rawRatio")
    assert(math.abs(corrected - 1.0) < 1e-9,
      s"corrected ratio $corrected should be parity")
  }

  test("slowTail picks the previous artifact's top-k by time " +
      "(name-ordered under ties); retimeThreshold is 1.5 on the " +
      "tail, 2.5 off it") {
    val prev = (1 to 30).map(i => (f"q_$i%02d", i.toDouble)).toMap
    val tail = Bench.slowTail(prev, 20)
    assert(tail.size == 20 && tail("q_30") && tail("q_11") &&
      !tail("q_10"))
    assert(Bench.retimeThreshold("q_30", tail) == 1.5)
    assert(Bench.retimeThreshold("q_10", tail) == 2.5)
    assert(Bench.retimeThreshold("q_unseen", tail) == 2.5)
    val tied = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    assert(Bench.slowTail(tied, 2) == Set("q_a", "q_b"))
  }

  test("samplerStats ≡ hand counts (explicit and auto mod); " +
      "blockSamplerStats sums per-block pair work") {
    val df = (0L until 40L).map(i => (i, s"l${i % 3}"))
      .toDF("id", "lab")
    val (n, mod, q, pairs) =
      Similarity.samplerStats(df, "id", queryMod = 7)
    assert(n == 40 && mod == 7 && q == 6 && pairs == 240)
    // auto mod below the pair budget resolves to 1: full pair space
    val (n2, m2, q2, p2) = Similarity.samplerStats(df, "id")
    assert(n2 == 40 && m2 == 1 && q2 == 40 && p2 == 1600)
    val rows = (0L until 40L).map(i => (i, i % 3))
    val byBlk = rows.groupBy(_._2)
    val (bn, bmod, bq, bp) =
      Similarity.blockSamplerStats(df, "id", "lab", queryMod = 7)
    val expQ = rows.count(_._1 % 7 == 0).toLong
    val expP = byBlk.values
      .map(g => g.count(_._1 % 7 == 0).toLong * g.size).sum
    assert(bn == 40 && bmod == 7 && bq == expQ && bp == expP)
    val (_, bm1, _, bp1) = Similarity.blockSamplerStats(df, "id", "lab")
    assert(bm1 == 1 &&
      bp1 == byBlk.values.map(g => g.size.toLong * g.size).sum)
  }

  test("pageTrend degenerate semantics mirror the oracle: empty input " +
      "→ one (null, 0, null, null, null) row; k = 1 no longer throws " +
      "(null z, exact l2); all tasks incomplete → (0, k, n_dropped, " +
      "null, null)") {
    val empty = Seq.empty[(String, String, Long)].toDF("t", "s", "v")
    val r0 = Stats.pageTrend(empty, "t", "s", "v").head()
    assert(r0.isNullAt(0) && r0.getLong(1) == 0 && r0.isNullAt(2) &&
      r0.isNullAt(3) && r0.isNullAt(4))
    // k = 1: both single-row tasks are complete; each contributes
    // m2 = 2·1 + 1 − 1 = 2, so 2L = 1·(2+2) = 4; Var carrier = 0 → z null
    val k1 = Seq(("t1", "s1", 5L), ("t2", "s1", 6L)).toDF("t", "s", "v")
    val r1 = Stats.pageTrend(k1, "t", "s", "v").head()
    assert(r1.getLong(0) == 2 && r1.getLong(1) == 1 &&
      r1.getLong(2) == 0 && r1.getLong(3) == 4 && r1.isNullAt(4))
    // two systems but every task carries only one → nothing kept
    val inc = Seq(("t1", "s1", 1L), ("t2", "s2", 2L)).toDF("t", "s", "v")
    val r2 = Stats.pageTrend(inc, "t", "s", "v").head()
    assert(r2.getLong(0) == 0 && r2.getLong(1) == 2 &&
      r2.getLong(2) == 2 && r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("crostonPerKey: a null demand value counts the period but not " +
      "the demand (the oracle's v <> 0 skip); null key rows drop") {
    val rows = Seq(
      (Option(1L), "2024-01-01 00:00:00", 1L, Option(5.0)),
      (Option(1L), "2024-01-01 00:00:01", 2L, Option.empty[Double]),
      (Option(1L), "2024-01-01 00:00:02", 3L, Option(7.0)),
      (Option.empty[Long], "2024-01-01 00:00:03", 4L, Option(9.0)))
      .toDF("k", "tss", "tie", "v")
      .withColumn("ts", to_timestamp($"tss"))
    val got = TimeSeries.crostonPerKey(spark, rows, "k", "ts", "tie",
      "v", alpha = 0.3)
    val out = got.collect()
    assert(out.length == 1, "null-key row must not surface a key")
    val r = out.head
    // periods 3 (null demand at idx 2 counts), demands 2; q for the
    // second demand = 3 − 1 = 2
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - (7.0 * 0.3 + 5.0 * 0.7)) < 1e-12)
    assert(math.abs(r.getDouble(4) - (2.0 * 0.3 + 1.0 * 0.7)) < 1e-12)
  }
}
