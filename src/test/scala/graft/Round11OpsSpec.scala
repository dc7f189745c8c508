package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Loads, Sessions, Stats, TimeSeries, Validate}

/** Round-11 operators: one-way ANOVA F (C110), Cliff's delta (C111),
  * Mood's median test (C112), effect sizes d/g (C113), Pettitt
  * change-point (F40), SCD4 split (D15), rule quarantine (A17),
  * conversation QC stats (E117) — each against a brute-force
  * recompute on hand data, plus the degenerate edges.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("anovaF ≡ brute two-pass F; planted mean shift significant; " +
      "degenerate cases null") {
    val rows = Seq(("a", 10L), ("a", 12L), ("a", 11L), ("a", 13L),
      ("b", 20L), ("b", 22L), ("b", 21L),
      ("c", 10L), ("c", 30L), ("c", 20L))
    val got = Stats.anovaF(rows.toDF("g", "v"), "g", "v").head()
    // brute: textbook two-pass
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2.toDouble))
    val all = rows.map(_._2.toDouble)
    val gm = all.sum / all.size
    val ssb = groups.values.map { vs =>
      val m = vs.sum / vs.size; vs.size * (m - gm) * (m - gm) }.sum
    val ssw = groups.values.map { vs =>
      val m = vs.sum / vs.size; vs.map(x => (x - m) * (x - m)).sum }.sum
    val f = (ssb / (groups.size - 1)) / (ssw / (all.size - groups.size))
    assert(got.getLong(0) == 10L && got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - ssb) < 1e-5, s"ssb ${got.getDouble(2)} vs $ssb")
    assert(math.abs(got.getDouble(3) - ssw) < 1e-5, s"ssw ${got.getDouble(3)} vs $ssw")
    assert(math.abs(got.getDouble(4) - f) < 1e-4, s"f ${got.getDouble(4)} vs $f")
    // a strong planted shift dominates: F large
    val shifted = (1 to 50).map(i => ("lo", 100L + i % 3)) ++
      (1 to 50).map(i => ("hi", 500L + i % 3))
    assert(Stats.anovaF(shifted.toDF("g", "v"), "g", "v")
      .head().getDouble(4) > 1000.0)
    // one group → null F; zero within-variation → null F
    assert(Stats.anovaF(Seq(("a", 1L), ("a", 2L)).toDF("g", "v"),
      "g", "v").head().isNullAt(4))
    assert(Stats.anovaF(Seq(("a", 1L), ("b", 2L)).toDF("g", "v"),
      "g", "v").head().isNullAt(4))
  }

  test("cliffsDelta ≡ brute all-pairs; ties contribute 0; sign " +
      "convention (A dominant → positive)") {
    val a = Seq(5L, 7L, 7L, 9L)
    val b = Seq(4L, 7L, 6L)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val got = Stats.cliffsDelta(df, "g", "v", "A", "B").head()
    val gt = (for (x <- a; y <- b) yield if (x > y) 1 else 0).sum
    val lt = (for (x <- a; y <- b) yield if (x < y) 1 else 0).sum
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
    assert(got.getLong(2) == gt && got.getLong(3) == lt)
    val delta = (gt - lt).toDouble / (a.size * b.size)
    assert(math.abs(got.getDouble(4) - delta) < 1e-6)
    assert(got.getDouble(4) > 0) // A stochastically larger
    // total dominance → exactly ±1
    val dom = (Seq(10L, 11L).map(("A", _)) ++
      Seq(1L, 2L).map(("B", _))).toDF("g", "v")
    assert(Stats.cliffsDelta(dom, "g", "v", "A", "B")
      .head().getDouble(4) == 1.0)
    assert(Stats.cliffsDelta(dom, "g", "v", "B", "A")
      .head().getDouble(4) == -1.0)
  }

  test("moodMedian ≡ brute dichotomize-and-chi²; median convention ≡ " +
      "discreteQuantiles q5000; homogeneous margin → null") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 9L),
      ("b", 5L), ("b", 6L), ("b", 7L), ("b", 8L), ("b", 4L))
    val got = Stats.moodMedian(rows.toDF("g", "v"), "g", "v").head()
    // pooled q5000 median: smallest v with cum ≥ ceil(9/2) = 5
    val sortedV = rows.map(_._2).sorted
    val med = sortedV((sortedV.size + 1) / 2 - 1)
    assert(got.getLong(2) == med)
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2))
    val aTot = rows.count(_._2 > med)
    val n = rows.size
    val chi = groups.values.map { vs =>
      val ag = vs.count(_ > med).toDouble
      val bg = vs.size - ag
      val ea = vs.size.toDouble * aTot / n
      val eb = vs.size.toDouble * (n - aTot) / n
      (ag - ea) * (ag - ea) / ea + (bg - eb) * (bg - eb) / eb
    }.sum
    assert(got.getLong(0) == n && got.getLong(1) == 2 &&
      got.getLong(3) == aTot)
    assert(math.abs(got.getDouble(4) - chi) < 1e-6)
    // every value ≤ median (all equal) → empty above-margin → null
    val flat = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    assert(Stats.moodMedian(flat, "g", "v").head().isNullAt(4))
  }

  test("effectSize ≡ brute Cohen d + Hedges g; degenerate null") {
    val a = Seq(10L, 12L, 14L, 16L)
    val b = Seq(9L, 11L, 13L)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val got = Stats.effectSize(df, "g", "v", "A", "B").head()
    def mean(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    def ss(xs: Seq[Long]) = {
      val m = mean(xs); xs.map(x => (x - m) * (x - m)).sum }
    val varp = (ss(a) + ss(b)) / (a.size + b.size - 2)
    val d = (mean(a) - mean(b)) / math.sqrt(varp)
    val g = d * (1.0 - 3.0 / (4.0 * (a.size + b.size) - 9.0))
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
    assert(math.abs(got.getDouble(2) - mean(a)) < 1e-6)
    assert(math.abs(got.getDouble(3) - mean(b)) < 1e-6)
    assert(math.abs(got.getDouble(4) - d) < 1e-5)
    assert(math.abs(got.getDouble(5) - g) < 1e-5)
    // zero pooled variance → null d/g
    val z = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L))
      .toDF("g", "v")
    val zr = Stats.effectSize(z, "g", "v", "A", "B").head()
    assert(zr.isNullAt(4) && zr.isNullAt(5))
  }

  test("pettitt ≡ brute O(n²) U_t; planted level shift localized; " +
      "constant series p = 1") {
    // key k1: clean level shift after order 5 (values 10-ish → 50-ish)
    val s1 = Seq(10L, 11L, 10L, 12L, 11L, 50L, 51L, 50L, 52L, 51L)
    // key k2: constant
    val s2 = Seq(7L, 7L, 7L, 7L)
    val rows = s1.zipWithIndex.map { case (v, i) => ("k1", i + 1, v) } ++
      s2.zipWithIndex.map { case (v, i) => ("k2", i + 1, v) }
    val got = TimeSeries.pettitt(rows.toDF("k", "o", "v"), "k", "o", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4))))
      .toMap
    // brute U_t for k1
    def bruteU(xs: Seq[Long]): Seq[(Int, Long)] =
      (1 until xs.size).map { t =>
        val u = (for (i <- 0 until t; j <- t until xs.size)
          yield java.lang.Long.signum(xs(i) - xs(j)).toLong).sum
        (t, u)
      }
    val us = bruteU(s1)
    val k1K = us.map(x => math.abs(x._2)).max
    val k1T = us.filter(x => math.abs(x._2) == k1K).map(_._1).min
    val (n1, kStat1, tStar1, p1) = got("k1")
    assert(n1 == s1.size && kStat1 == k1K && tStar1 == k1T,
      s"got ${got("k1")} want ($k1K, $k1T)")
    assert(tStar1 == 5) // the shift boundary
    // exact brute p for this K/N: 2·exp(−6·25²/(10³+10²)) ≈ 0.0661 —
    // small but above 0.05 at N=10 (the approximation is conservative
    // on short series); assert the exact value, not a cutoff
    assert(math.abs(p1 - 2.0 * math.exp(-6.0 * k1K * k1K /
      (1000.0 + 100.0))) < 1e-6)
    assert(p1 < 0.1)
    val (n2, kStat2, _, p2) = got("k2")
    assert(n2 == s2.size && kStat2 == 0L && p2 == 1.0)
  }

  test("scd4: current ≡ latest per key, current ∪ history ≡ " +
      "scd2History, history valid_to always set") {
    val hist = Seq((1L, "a", 0), (1L, "b", 1), (1L, "c", 2),
      (2L, "x", 0), (3L, "y", 5)).toDF("k", "payload", "version")
    val (cur, old) = Loads.scd4(hist, Seq("k"), "version")
    val curRows = cur.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(curRows.toSeq == Seq((1L, "c", 2), (2L, "x", 0),
      (3L, "y", 5)))
    assert(!cur.columns.contains("valid_from") &&
      !cur.columns.contains("is_current"))
    val oldRows = old.collect().map(r => (r.getLong(0), r.getInt(2),
      r.getInt(r.fieldIndex("valid_from")),
      r.getInt(r.fieldIndex("valid_to")))).sortBy(x => (x._1, x._2))
    assert(oldRows.toSeq == Seq((1L, 0, 0, 1), (1L, 1, 1, 2)))
    assert(old.filter(col("valid_to").isNull).count() == 0)
    // reassembly: keys ∪ versions across both ≡ the input
    assert(cur.select("k", "version")
      .unionByName(old.select("k", "version")).count() == hist.count())
  }

  test("quarantine: planted violations with declaration-ordered " +
      "reasons; clean and null rows pass through") {
    val df = Seq(
      (1L, 50.0, "OK"),    // clean
      (2L, -5.0, "OK"),    // fails r1
      (3L, -1.0, "BAD"),   // fails r1 + r3 (order: r1,r3)
      (4L, 99999.0, "OK"), // fails r2
      (5L, Double.NaN, "OK") // NaN: both comparisons false → r1+r2
    ).toDF("id", "bal", "seg")
      .withColumn("bal", when(isnan(col("bal")),
        lit(null).cast("double")).otherwise(col("bal")))
    // id=5 now has NULL bal → null rule results → does NOT flag
    val out = Validate.quarantine(df, Seq(
      Validate.Rule("nonneg", col("bal") >= 0),
      Validate.Rule("under_1000", col("bal") < 1000),
      Validate.Rule("seg_ok", col("seg") === "OK")))
      .select("id", "reasons").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "nonneg", 3L -> "nonneg,seg_ok",
      4L -> "under_1000"))
  }

  test("ordinalAssociation ≡ brute all-pairs gamma/Somers; perfect " +
      "monotone → gamma 1; independence-ish small") {
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 2L), (1L, 1L))
    val got = Stats.ordinalAssociation(rows.toDF("x", "y"), "x", "y")
      .head()
    // brute over ALL row pairs
    var (c, d, tx) = (0L, 0L, 0L)
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 == x2) tx += 1
      else if ((x2 - x1) * (y2 - y1) > 0) c += 1
      else if ((x2 - x1) * (y2 - y1) < 0) d += 1
    }
    val n = rows.size.toLong
    assert(got.getLong(0) == n && got.getLong(1) == c &&
      got.getLong(2) == d, s"$got vs ($c, $d)")
    assert(math.abs(got.getDouble(3) - (c - d).toDouble / (c + d)) < 1e-6)
    val n0 = n * (n - 1) / 2
    assert(math.abs(got.getDouble(4) -
      (c - d).toDouble / (n0 - tx)) < 1e-6)
    // perfect monotone staircase: gamma = 1 exactly
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    assert(Stats.ordinalAssociation(mono.toDF("x", "y"), "x", "y")
      .head().getDouble(3) == 1.0)
  }

  test("pageTrend ≡ brute ordered-L; monotone-by-order strongly " +
      "positive; reversed order flips the sign") {
    // 4 tasks × 3 systems, values increase along system name order
    val up = for (t <- 1 to 4; (s, v) <- Seq(("s1", 10L), ("s2", 20L),
      ("s3", 30L))) yield (s"t$t", s, v + t)
    val gotUp = Stats.pageTrend(up.toDF("t", "s", "v"), "t", "s", "v")
      .head()
    // brute 2L: per task ranks are 1,2,3 → 2R = 2,4,6; L2 = Σ j·2R
    val l2 = 4L * (1 * 2 + 2 * 4 + 3 * 6)
    assert(gotUp.getLong(0) == 4 && gotUp.getLong(1) == 3 &&
      gotUp.getLong(3) == l2)
    val e2 = 4.0 * 3 * 16 / 2
    val v2 = 4.0 * 9 * 16 * 2 / 36.0
    assert(math.abs(gotUp.getDouble(4) -
      (l2 - e2) / math.sqrt(v2)) < 1e-6)
    assert(gotUp.getDouble(4) > 2.0)
    val down = up.map { case (t, s, v) => (t, s, -v) }
    val gotDown = Stats.pageTrend(down.toDF("t", "s", "v"),
      "t", "s", "v").head()
    assert(math.abs(gotDown.getDouble(4) + gotUp.getDouble(4)) < 1e-9)
    // incomplete task drops (the Friedman rule)
    val withPartial = up ++ Seq(("t9", "s1", 1L))
    val g3 = Stats.pageTrend(withPartial.toDF("t", "s", "v"),
      "t", "s", "v").head()
    assert(g3.getLong(0) == 4 && g3.getLong(2) == 1)
  }

  test("wilcoxonSignedRank ≡ brute midrank W+; zeros drop; ties " +
      "midranked; degenerate null") {
    val diffs = Seq(5L, -3L, 3L, 8L, 0L, -8L, 8L, 2L, -1L)
    val got = Stats.wilcoxonSignedRank(diffs.toDF("diff"), "diff")
      .head()
    // brute: drop zeros, midrank |d|, W+ = Σ ranks of positive d
    val nz = diffs.filter(_ != 0)
    val ads = nz.map(math.abs)
    def midrank(a: Long) =
      (ads.count(_ < a) + 1 + ads.count(_ <= a)) / 2.0
    val wPlus = nz.filter(_ > 0).map(d => midrank(math.abs(d))).sum
    val n = nz.size
    val tieSum = ads.groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * t * t - t).sum
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == (wPlus * 2).toLong)
    assert(got.getLong(2) == tieSum)
    val z = (wPlus - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tieSum / 48.0)
    assert(math.abs(got.getDouble(3) - z) < 1e-6, s"${got.getDouble(3)} vs $z")
    // all diffs zero → n = 0 → null z
    assert(Stats.wilcoxonSignedRank(Seq(0L, 0L).toDF("diff"), "diff")
      .head().isNullAt(3))
    // strongly one-sided: z large positive
    val pos = (1L to 30L).toDF("diff")
    assert(Stats.wilcoxonSignedRank(pos, "diff").head().getDouble(3) > 4)
  }

  test("crostonPerKey ≡ brute replay; zero-demand key emits no row; " +
      "partition independence") {
    val base = 1700000000000000L
    // k=1: demands at periods 2, 5, 6 (values 10, 20, 30); zeros between
    val s1 = Seq(0.0, 10.0, 0.0, 0.0, 20.0, 30.0, 0.0)
    // k=2: all zeros → no row
    val s2 = Seq(0.0, 0.0)
    val rows = s1.zipWithIndex.map { case (v, i) =>
      (1L, base + i * 1000000L, i.toLong, v) } ++
      s2.zipWithIndex.map { case (v, i) =>
        (2L, base + i * 1000000L, i.toLong, v) }
    val df = rows.toDF("k", "us", "tie", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = TimeSeries.crostonPerKey(spark, df, "k", "ts", "tie", "v",
      alpha = 0.3).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
    // brute replay
    val a = 0.3; val a1 = 1.0 - a
    var (z, p, last) = (0.0, 0.0, 0L)
    var nd = 0
    for ((v, i) <- s1.zipWithIndex if v != 0) {
      val q = (i + 1) - last; last = i + 1
      if (nd == 0) { z = v; p = q.toDouble }
      else { z = v * a + z * a1; p = q * a + p * a1 }
      nd += 1
    }
    val r = got.head
    assert(r.getLong(1) == s1.size && r.getLong(2) == nd)
    assert(r.getDouble(3) == z && r.getDouble(4) == p)
    assert(r.getDouble(5) == z / p)
    // partition independence: repartition(7) on shuffled input, same row
    val shuffled = df.orderBy(rand(42)).repartition(7)
    val got2 = TimeSeries.crostonPerKey(spark, shuffled, "k", "ts",
      "tie", "v", alpha = 0.3).collect()
    assert(got2.length == 1 && got2.head.getDouble(3) == z &&
      got2.head.getDouble(4) == p)
  }

  test("conversationStats ≡ brute transcript replay") {
    val base = 1700000000000000L // µs
    val rows = Seq(
      // conv 1: u,a,u,a — perfect alternation, gaps 10s/20s/30s
      (1L, base, 1L, "user", "hi"),
      (1L, base + 10000000L, 2L, "assistant", "hello!"),
      (1L, base + 30000000L, 3L, "user", "q"),
      (1L, base + 60000000L, 4L, "assistant", "a"),
      // conv 2: monologue of 3
      (2L, base, 5L, "user", "x"),
      (2L, base + 1000000L, 6L, "user", "yy"),
      (2L, base + 3000000L, 7L, "user", null),
      // conv 3: singleton
      (3L, base, 8L, "assistant", "solo"))
      .toDF("conv", "us", "eid", "role", "payload")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Sessions.conversationStats(rows, "conv", "ts", "eid",
        "role", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(got(1L) == ((4L, 2L, 10L, 3L, 1000000L, 20000000L)))
    assert(got(2L) == ((3L, 1L, 3L, 0L, 0L, 1500000L)))
    assert(got(3L) == ((1L, 1L, 4L, 0L, -1L, -1L)))
  }
}
