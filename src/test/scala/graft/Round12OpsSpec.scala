package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Similarity, Stats, TimeSeries}

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

  test("gTest ≡ brute 2·Σ O·ln(O/E); independence → near 0; single " +
      "row/col → null") {
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
      ("b", "y"), ("b", "y"), ("b", "y"), ("c", "x"))
    val got = Stats.gTest(rows.toDF("r", "c"), "r", "c").head()
    val n = rows.size.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.size)
    val rt = rows.groupBy(_._1).view.mapValues(_.size)
    val ct = rows.groupBy(_._2).view.mapValues(_.size)
    val g = 2.0 * cells.map { case ((r, c), o) =>
      o * math.log(o * n / (rt(r).toDouble * ct(c)))
    }.sum
    assert(got.getLong(0) == 8 && got.getLong(1) == 3 &&
      got.getLong(2) == 2 && got.getLong(3) == 2)
    assert(math.abs(got.getDouble(4) - g) < 1e-5,
      s"${got.getDouble(4)} vs $g")
    // perfectly proportional table → G = 0
    val indep = for (r <- Seq("a", "b"); c <- Seq("x", "y", "y"))
      yield (r, c)
    assert(math.abs(Stats.gTest(indep.toDF("r", "c"), "r", "c")
      .head().getDouble(4)) < 1e-9)
    // one column → dof 0, null G
    assert(Stats.gTest(Seq(("a", "x"), ("b", "x")).toDF("r", "c"),
      "r", "c").head().isNullAt(4))
  }

  test("levene ≡ brute mean-centered W; bartlett ≡ brute χ²; a " +
      "variance-inflated group drives both up; degenerates null") {
    val rows = Seq(("a", 10L), ("a", 12L), ("a", 11L), ("a", 13L),
      ("b", 20L), ("b", 40L), ("b", 5L), ("b", 55L),
      ("c", 30L), ("c", 31L), ("c", 29L))
    val df = rows.toDF("g", "v")
    val groups = rows.groupBy(_._1).view
      .mapValues(_.map(_._2.toDouble)).toMap
    val nAll = rows.size.toDouble
    val k = groups.size.toDouble
    // brute Levene: z = |x − mean|, one-way ANOVA on z
    val zs = groups.map { case (g, vs) =>
      val m = vs.sum / vs.size; g -> vs.map(x => math.abs(x - m)) }
    val zbar = zs.values.flatten.sum / nAll
    val ssb = zs.values.map { z =>
      val m = z.sum / z.size; z.size * (m - zbar) * (m - zbar) }.sum
    val ssw = zs.values.map { z =>
      val m = z.sum / z.size; z.map(x => (x - m) * (x - m)).sum }.sum
    val w = ((nAll - k) * ssb) / ((k - 1) * ssw)
    val gotW = Stats.levene(df, "g", "v").head()
    assert(gotW.getLong(0) == 11 && gotW.getLong(1) == 3)
    assert(math.abs(gotW.getDouble(2) - w) < 1e-5,
      s"levene ${gotW.getDouble(2)} vs $w")
    // brute Bartlett (values — a keyed map would collide on n_i)
    val s2s = groups.values.map { vs =>
      val m = vs.sum / vs.size
      (vs.size, vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1)) }
    val sp2 = s2s.map { case (ni, s2) => (ni - 1) * s2 }.sum / (nAll - k)
    val t = (nAll - k) * math.log(sp2) -
      s2s.map { case (ni, s2) => (ni - 1) * math.log(s2) }.sum
    val cc = 1.0 + (s2s.map { case (ni, _) => 1.0 / (ni - 1) }.sum -
      1.0 / (nAll - k)) / (3.0 * (k - 1))
    val gotB = Stats.bartlett(df, "g", "v").head()
    assert(gotB.getLong(0) == 11 && gotB.getLong(1) == 3)
    assert(math.abs(gotB.getDouble(2) - t / cc) < 1e-4,
      s"bartlett ${gotB.getDouble(2)} vs ${t / cc}")
    // a zero-variance group → null Bartlett (ln 0), Levene fine
    val flat = rows ++ Seq(("d", 7L), ("d", 7L))
    assert(Stats.bartlett(flat.toDF("g", "v"), "g", "v")
      .head().isNullAt(2))
    // single group → null both
    val one = Seq(("a", 1L), ("a", 5L), ("a", 9L)).toDF("g", "v")
    assert(Stats.levene(one, "g", "v").head().isNullAt(2))
    assert(Stats.bartlett(one, "g", "v").head().isNullAt(2))
  }

  test("ansariBradley ≡ brute end-distance midrank scores; a " +
      "compressed group scores high; empty side → null") {
    val a = Seq(48L, 50L, 52L, 49L, 51L)         // tight
    val b = Seq(10L, 90L, 20L, 80L, 30L, 70L)    // spread
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val got = Stats.ansariBradley(df, "g", "v", "A", "B").head()
    // brute: pooled midranks, score = min(R, N+1−R) with midranks
    val all = (a ++ b).sorted
    val nTot = all.size
    def midrank(x: Long) =
      (all.count(_ < x) + 1 + all.count(_ <= x)) / 2.0
    def score(x: Long) = {
      val r = midrank(x)
      math.min(r, nTot + 1 - r)
    }
    val wStat = a.map(score).sum
    val sAll = (a ++ b).map(score)
    val e = a.size * sAll.sum / nTot
    val v = a.size.toDouble * b.size *
      (nTot * sAll.map(x => x * x).sum - sAll.sum * sAll.sum) /
      (nTot.toDouble * nTot * (nTot - 1))
    val z = (wStat - e) / math.sqrt(v)
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
    assert(got.getLong(2) == (wStat * 2).toLong)
    assert(math.abs(got.getDouble(3) - z) < 1e-5,
      s"${got.getDouble(3)} vs $z")
    assert(got.getDouble(3) > 1.5, "tight group must score high")
    // one-sided empty → null z
    val onlyA = a.map(("A", _)).toDF("g", "v")
    assert(Stats.ansariBradley(onlyA, "g", "v", "A", "B")
      .head().isNullAt(3))
  }

  test("grubbs ≡ brute max-deviation G with the suspect value; " +
      "n < 3 → null") {
    val vs = Seq(10L, 12L, 11L, 13L, 9L, 40L, 11L)
    val got = Stats.grubbs(vs.toDF("v"), "v").head()
    val m = vs.map(_.toDouble).sum / vs.size
    val s = math.sqrt(vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1))
    val g = vs.map(x => math.abs(x - m)).max / s
    assert(got.getLong(0) == vs.size && got.getLong(1) == 40L)
    assert(math.abs(got.getDouble(2) - g) < 1e-6)
    assert(Stats.grubbs(Seq(1L, 2L).toDF("v"), "v").head().isNullAt(2))
    // tie on max deviation → larger value wins deterministically
    val sym = Seq(0L, 100L, 50L, 50L)
    assert(Stats.grubbs(sym.toDF("v"), "v").head().getLong(1) == 100L)
  }

  test("theilBetween ≡ brute Σ s_g·ln(s_g/p_g); equal means → 0; " +
      "concentration raises it") {
    val rows = Seq(("a", 100L), ("a", 100L), ("b", 100L), ("b", 100L))
    assert(math.abs(Stats.theilBetween(rows.toDF("g", "v"), "g", "v")
      .head().getDouble(3)) < 1e-9)
    val skew = Seq(("a", 1000L), ("a", 800L), ("b", 10L), ("b", 20L),
      ("c", 50L))
    val got = Stats.theilBetween(skew.toDF("g", "v"), "g", "v").head()
    val tot = skew.map(_._2).sum.toDouble
    val n = skew.size.toDouble
    val brute = skew.groupBy(_._1).map { case (_, g) =>
      val sg = g.map(_._2).sum / tot
      val pg = g.size / n
      sg * math.log(sg / pg)
    }.sum
    assert(got.getLong(0) == 5 && got.getLong(1) == 3 &&
      got.getLong(2) == skew.map(_._2).sum)
    assert(math.abs(got.getDouble(3) - brute) < 1e-6)
    assert(got.getDouble(3) > 0.3)
  }

  test("durbinWatson ≡ brute OLS-residual DW; alternating residuals " +
      "→ DW near 4, smooth trend → DW near 2-plus; n < 3 null") {
    // v = trend + alternating noise → strong NEGATIVE residual
    // autocorrelation → DW > 2
    val alt = (1 to 40).map(i =>
      ("k", i, 10L * i + (if (i % 2 == 0) 7L else -7L)))
    val df = alt.toDF("k", "o", "v")
    val got = TimeSeries.durbinWatson(df, "k", "o", "v").head()
    // brute: residuals from OLS on (t, v)
    val t = alt.map(_._2.toDouble); val y = alt.map(_._3.toDouble)
    val n = t.size
    val tm = t.sum / n; val ym = y.sum / n
    val b = t.zip(y).map { case (a, c) => (a - tm) * (c - ym) }.sum /
      t.map(a => (a - tm) * (a - tm)).sum
    val a0 = ym - b * tm
    val e = t.zip(y).map { case (a, c) => c - (a0 + b * a) }
    val dw = e.sliding(2).map { s => (s(1) - s(0)) * (s(1) - s(0)) }
      .sum / e.map(x => x * x).sum
    assert(got.getLong(1) == n)
    assert(math.abs(got.getDouble(2) - b) < 1e-9)
    assert(math.abs(got.getDouble(3) - dw) < 1e-5,
      s"${got.getDouble(3)} vs $dw")
    assert(got.getDouble(3) > 3.0)
    val tiny = Seq(("k", 1, 5L), ("k", 2, 9L)).toDF("k", "o", "v")
    assert(TimeSeries.durbinWatson(tiny, "k", "o", "v")
      .head().isNullAt(3))
  }

  test("ljungBox ≡ brute n(n+2)·Σ r²/(n−k); white-ish series small, " +
      "strongly periodic large; constant null") {
    val periodic = (1 to 60).map(i => (i, (100 + 50 * ((i % 4) - 2)).toLong))
    val got = TimeSeries.ljungBox(periodic.toDF("o", "v"), "o", "v", 4)
      .head()
    val y = periodic.map(_._2.toDouble)
    val n = y.size
    val m = y.sum / n
    val den = y.map(x => (x - m) * (x - m)).sum
    def r(k: Int) = y.dropRight(k).zip(y.drop(k))
      .map { case (a, c) => (a - m) * (c - m) }.sum / den
    val q = n * (n + 2.0) * (1 to 4).map(k => r(k) * r(k) / (n - k)).sum
    assert(got.getLong(0) == n && got.getLong(1) == 4)
    assert(math.abs(got.getDouble(2) - q) < 1e-4,
      s"${got.getDouble(2)} vs $q")
    assert(got.getDouble(2) > 30.0)
    val const = (1 to 20).map(i => (i, 5L)).toDF("o", "v")
    assert(TimeSeries.ljungBox(const, "o", "v", 4).head().isNullAt(2))
  }

  test("thetaPerKey ≡ brute SES + half-slope drift with the running " +
      "(1−α)ⁿ factor; 1-point key falls back to the level") {
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 100L),
      (1L, "2024-01-01 00:00:01", 2L, 140L),
      (1L, "2024-01-01 00:00:02", 3L, 180L),
      (1L, "2024-01-01 00:00:03", 4L, 230L),
      (2L, "2024-01-01 00:00:00", 1L, 500L))
      .toDF("k", "tss", "tie", "v")
      .withColumn("ts", to_timestamp($"tss"))
    val out = TimeSeries.thetaPerKey(spark, rows, "k", "ts", "tie",
        "v", alpha = 0.4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val alpha = 0.4; val a1 = 1.0 - alpha
    val vs = Seq(100L, 140L, 180L, 230L).map(_.toDouble)
    var l = vs.head; var w = a1
    vs.tail.foreach { v => l = v * alpha + l * a1; w = w * a1 }
    val t = (1 to 4).map(_.toDouble)
    val tm = t.sum / 4; val ym = vs.sum / 4
    val b = t.zip(vs).map { case (a, c) => (a - tm) * (c - ym) }.sum /
      t.map(a => (a - tm) * (a - tm)).sum
    val fc = l + (b / 2.0) * (1.0 - w) / alpha
    val r1 = out(1L)
    assert(r1.getLong(1) == 4)
    assert(math.abs(r1.getDouble(2) - l) < 1e-6)
    assert(math.abs(r1.getDouble(3) - b) < 1e-9)
    assert(math.abs(r1.getDouble(4) - fc) < 1e-6,
      s"${r1.getDouble(4)} vs $fc")
    val r2 = out(2L)
    assert(r2.getLong(1) == 1 && r2.isNullAt(3) &&
      r2.getDouble(4) == 500.0)
  }

  test("selfBleu2 ≡ brute multi-reference BLEU-2 per doc on a hand " +
      "corpus; duplicate docs score 1; unique-gram doc clips to 0") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),   // exact dup of 1
      (3L, "a dog ran in a park"),
      (4L, "the dog sat in the park"))
      .toDF("doc_id", "text")
    val got = Corpus.selfBleu2(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // brute per doc: clip vs max count over OTHER docs, BP vs the
    // closest other length (tie → shorter)
    def grams(s: String, n: Int) =
      s.split(" ").toSeq.sliding(n).map(_.mkString(" ")).toSeq
    val texts = Map(1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat", 3L -> "a dog ran in a park",
      4L -> "the dog sat in the park")
    def bleu(d: Long): Double = {
      val others = texts.keys.filter(_ != d).toSeq
      val ps = (1 to 2).map { n =>
        val cd = grams(texts(d), n).groupBy(identity).view
          .mapValues(_.size)
        val clipped = cd.map { case (g, c) =>
          val mx = others.map(o => grams(texts(o), n)
            .count(_ == g)).max
          math.min(c, mx)
        }.sum
        clipped.toDouble / cd.values.sum
      }
      val cLen = texts(d).split(" ").length
      val rLen = others.map(o => texts(o).split(" ").length)
        .minBy(rl => (math.abs(rl - cLen), rl))
      val bp = if (cLen >= rLen) 1.0
        else math.exp(1.0 - rLen.toDouble / cLen)
      bp * math.sqrt(ps.head * ps(1))
    }
    for (d <- texts.keys) {
      val r = got(d)
      assert(math.abs(r.getDouble(10) - bleu(d)) < 1e-6,
        s"doc $d: ${r.getDouble(10)} vs ${bleu(d)}")
    }
    assert(got(1L).getDouble(10) == 1.0 && got(2L).getDouble(10) == 1.0)
    // single-doc corpus: no reference → null
    val solo = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Corpus.selfBleu2(solo, "doc_id", "text").head().isNullAt(10))
  }

  test("charConditionalEntropy ≡ brute H(next|prev); cyclic text " +
      "→ 0; varied text > 0; 1-char doc null") {
    val docs = Seq((1L, "abcabcabcabc"), (2L, "the quick brown fox"),
      (3L, "x")).toDF("doc_id", "text")
    val got = Corpus.charConditionalEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: every prev char determines the next → H = 0
    assert(got(1L).getDouble(3) == 0.0)
    // brute for doc 2
    val txt = "the quick brown fox"
    val bgs = txt.sliding(2).toSeq
    val cab = bgs.groupBy(identity).view.mapValues(_.size)
    val ca = bgs.groupBy(_.charAt(0)).view.mapValues(_.size)
    val tt = bgs.size.toDouble
    val h = cab.map { case (bg, c) =>
      c * math.log(ca(bg.charAt(0)).toDouble / c) }.sum / tt
    assert(got(2L).getLong(1) == bgs.size)
    assert(math.abs(got(2L).getDouble(3) - h) < 1e-6)
    assert(got(2L).getDouble(3) > 0.1)
    assert(got(3L).getLong(1) == 0 && got(3L).isNullAt(3))
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
