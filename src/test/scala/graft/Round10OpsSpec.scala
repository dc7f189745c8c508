package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Stats, TimeSeries}

/** Round-10 operators: Friedman (C104), Cochran's Q (C105),
  * Krippendorff's alpha (C106), AMOC change-point (F34) — each against
  * a brute-force recompute on hand data, plus the degenerate edges.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("friedman ≡ brute midrank recompute; incomplete tasks dropped; " +
      "ties midranked") {
    // 4 tasks × 3 systems, one tie inside t3; t5 incomplete (dropped)
    val rows = Seq(
      ("t1", "A", 10L), ("t1", "B", 20L), ("t1", "C", 30L),
      ("t2", "A", 15L), ("t2", "B", 25L), ("t2", "C", 5L),
      ("t3", "A", 7L), ("t3", "B", 7L), ("t3", "C", 9L),
      ("t4", "A", 1L), ("t4", "B", 3L), ("t4", "C", 2L),
      ("t5", "A", 4L), ("t5", "B", 6L))
    val got = Stats.friedman(rows.toDF("t", "s", "v"), "t", "s", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    // brute: midranks per complete task
    val tasks = rows.groupBy(_._1).filter(_._2.size == 3) // t1..t4
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
    for ((_, obs) <- tasks; (sys, v) <- obs.map(o => o._2 -> o._3)) {
      val vs = obs.map(_._3)
      val mid = (vs.count(_ < v) + 1 + vs.count(_ <= v)) / 2.0
      rankSums(sys) = rankSums.getOrElse(sys, 0.0) + mid
    }
    val n = tasks.size; val k = 3
    val chi2 = 12.0 / (n * k * (k + 1)) *
      rankSums.values.map(r => r * r).sum - 3.0 * n * (k + 1)
    for ((sys, r2, nT, kS, nD, c6) <- got) {
      assert(r2 == (rankSums(sys) * 2).toLong, sys)
      assert(nT == n && kS == k && nD == 1)
      assert(math.abs(c6 - chi2) < 1e-6, s"$c6 vs $chi2")
    }
    // all-identical values: every midrank = (k+1)/2, χ² = 0
    val flat = Seq(("a", "A", 5L), ("a", "B", 5L), ("a", "C", 5L))
    assert(Stats.friedman(flat.toDF("t", "s", "v"), "t", "s", "v")
      .head().getDouble(5) == 0.0)
  }

  test("cochranQ ≡ hand Q; k=2 ≡ uncorrected McNemar; unanimous → null") {
    // classic 3-treatment table over 6 items
    val rows = Seq(
      (1L, "A", true), (1L, "B", true), (1L, "C", false),
      (2L, "A", true), (2L, "B", false), (2L, "C", false),
      (3L, "A", true), (3L, "B", true), (3L, "C", true),
      (4L, "A", false), (4L, "B", false), (4L, "C", false),
      (5L, "A", true), (5L, "B", false), (5L, "C", true),
      (6L, "A", true), (6L, "B", true), (6L, "C", false),
      (7L, "A", true)) // incomplete → dropped
    val r = Stats.cochranQ(rows.toDF("i", "s", "x"), "i", "s", "x").head()
    val k = 3
    val items = rows.groupBy(_._1).filter(_._2.size == k).values.toSeq
    val tj = items.flatten.groupBy(_._2)
      .map { case (_, v) => v.count(_._3).toLong }
    val ui = items.map(_.count(_._3).toLong)
    val nTot = ui.sum
    val q = (k - 1).toDouble * (k * tj.map(t => t * t).sum - nTot * nTot) /
      (k * nTot - ui.map(u => u * u).sum)
    assert(r.getLong(0) == 6 && r.getLong(1) == 1 && r.getLong(2) == 3)
    assert(math.abs(r.getDouble(4) - q) < 1e-6)
    // k = 2 reduces to McNemar WITHOUT continuity correction
    val two = Seq(
      (1L, "A", true), (1L, "B", false),  // n01
      (2L, "A", true), (2L, "B", false),  // n01
      (3L, "A", false), (3L, "B", true),  // n10
      (4L, "A", true), (4L, "B", true),
      (5L, "A", false), (5L, "B", false))
    val q2 = Stats.cochranQ(two.toDF("i", "s", "x"), "i", "s", "x")
      .head().getDouble(4)
    assert(math.abs(q2 - (2 - 1) * (2 - 1) * 1.0 / (2 + 1)) < 1e-6,
      s"q2=$q2 vs (b-c)^2/(b+c)=1/3")
    // unanimous items only → zero denominator → null
    val uni = Seq((1L, "A", true), (1L, "B", true),
      (2L, "A", false), (2L, "B", false))
    assert(Stats.cochranQ(uni.toDF("i", "s", "x"), "i", "s", "x")
      .head().isNullAt(4))
  }

  test("krippendorffAlpha ≡ brute coincidence recompute; singles " +
      "dropped; perfect agreement → 1") {
    // Krippendorff-style nominal data with missing ratings
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"),
      (4L, "a"), (4L, "a"), (4L, "b"), (4L, "b"),
      (5L, "b"), (5L, "b"),
      (6L, "c")) // single rating → dropped
    val r = Stats.krippendorffAlpha(rows.toDF("u", "v"), "u", "v").head()
    val units = rows.groupBy(_._1).filter(_._2.size >= 2).values
      .map(_.map(_._2))
    val n = units.map(_.size).sum
    val dO = units.map { vs =>
      val m = vs.size
      val agree = vs.groupBy(identity).values
        .map(g => g.size.toLong * (g.size - 1)).sum
      (m.toLong * (m - 1) - agree).toDouble / (m - 1)
    }.sum / n
    val catTotals = units.flatten.groupBy(identity)
      .map { case (_, v) => v.size.toLong }
    val dE = catTotals.map(c => c.toDouble * (n - c)).sum /
      (n.toDouble * (n - 1))
    val alpha = 1.0 - dO / dE
    assert(r.getLong(0) == 5 && r.getLong(1) == 1 && r.getLong(2) == n)
    // per-unit micro floor loses ≤ 1e-6 per unit
    assert(math.abs(r.getDouble(4) - alpha) < 1e-4,
      s"${r.getDouble(4)} vs $alpha")
    // perfect agreement across units → α = 1 exactly
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
    assert(Stats.krippendorffAlpha(perfect.toDF("u", "v"), "u", "v")
      .head().getDouble(4) == 1.0)
  }

  test("changePoint: planted level shift localized exactly; ties take " +
      "the smallest k; singleton null; partition-invariant") {
    // key 1: 5 rows at 100 then 5 at 900 → cp at k = 5
    val shift = (1 to 10).map(i =>
      (1L, i.toLong, if (i <= 5) 100L else 900L))
    // key 2: symmetric two-point series → s equal at every k, tie → k=1
    val tie = Seq((2L, 1L, 50L), (2L, 2L, 50L))
    // key 3: singleton
    val single = Seq((3L, 1L, 7L))
    val df = (shift ++ tie ++ single).toDF("key", "ord", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.changePoint(d, "key", "ord", "v").collect()
        .map(r => r.getLong(0) -> r).toMap
    val got = run(df)
    assert(got(1L).getLong(2) == 5L) // cp_k
    assert(got(1L).getLong(4) == 100L * 1000000) // mean_left_micro
    assert(got(1L).getLong(5) == 900L * 1000000)
    // brute s_max for key 1: max_k |10·P_k − k·P_10|
    val vals = shift.map(_._3)
    val pn = vals.sum
    val sMax = (1 to 9).map { kk =>
      math.abs(10L * vals.take(kk).sum - kk * pn)
    }.max
    assert(got(1L).getDecimal(3).longValueExact() == sMax)
    assert(got(2L).getLong(2) == 1L) // tie → smallest k
    assert(got(3L).isNullAt(2) && got(3L).isNullAt(3))
    // partitioning must not change anything
    val again = run(df.repartition(7))
    assert(got.keySet == again.keySet &&
      got.keySet.forall(k => got(k).toSeq == again(k).toSeq))
    // randomized ≡ brute argmax with smallest-k ties
    val rnd = new scala.util.Random(42)
    val series = (1 to 40).map(i => (9L, i.toLong, rnd.nextInt(1000).toLong))
    val g9 = run(series.toDF("key", "ord", "v"))(9L)
    val vs = series.map(_._3); val tot = vs.sum; val nn = vs.size
    val ss = (1 to nn - 1).map(kk =>
      kk -> math.abs(nn.toLong * vs.take(kk).sum - kk.toLong * tot))
    val bestS = ss.map(_._2).max
    val bestK = ss.filter(_._2 == bestS).map(_._1).min
    assert(g9.getLong(2) == bestK.toLong)
    assert(g9.getDecimal(3).longValueExact() == bestS)
  }

  test("countMin: never undercounts; exact when collision-free; " +
      "mergeable cell-wise; absent key bounded by collisions") {
    import graft.operators.Sketch
    val keys = (1L to 300L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i))
    val df = keys.toDF("id")
    val sk = Sketch.countMinBuild(df, "id", d = 4, w = 64)
    val est = Sketch.countMinEstimate(sk, df, "id", d = 4, w = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = keys.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    assert(truth.forall { case (k, c) => est(k) >= c },
      "CMS undercounted") // the one-sided guarantee
    // wide sketch + few keys → every estimate exact
    val few = (1L to 20L).flatMap(i => Seq.fill(3)(i)).toDF("id")
    val skWide = Sketch.countMinBuild(few, "id", d = 4, w = 4096)
    val estWide = Sketch.countMinEstimate(skWide, few, "id", 4, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(estWide.forall(_._2 == 3L), estWide.toString)
    // mergeable: sketch(a ++ b) == cell-wise sum of sketches
    val (a, b) = (keys.take(500).toDF("id"), keys.drop(500).toDF("id"))
    val merged = Sketch.countMinBuild(a, "id", 4, 64)
      .unionByName(Sketch.countMinBuild(b, "id", 4, 64))
      .groupBy("row_i", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketch.countMinBuild(df, "id", 4, 64)
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1)) ->
        r.getLong(2)).toMap ==
      whole.collect().map(r => (r.getInt(0), r.getLong(1)) ->
        r.getLong(2)).toMap)
  }

  test("brownForsythe ≡ brute recompute; spread gap detected; " +
      "zero within-spread → null") {
    import graft.operators.Stats
    // tight group A around 100, wide group B around 100
    val rows = Seq.tabulate(40)(i => ("A", 100L + (i % 3) - 1)) ++
      Seq.tabulate(40)(i => ("B", 100L + (i % 21) - 10))
    val r = Stats.brownForsythe(rows.toDF("g", "v"), "g", "v").head()
    assert(r.getLong(0) == 80 && r.getLong(1) == 2)
    // brute with the operator's documented micro quantization
    def medianOf(vs: Seq[Long]): Long = {
      val s = vs.sorted; s((vs.size - 1) / 2) // cum*1e4 >= n*5000 rule
    }
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val z = byG.map { case (g, vs) =>
      val m = medianOf(vs); g -> vs.map(v => math.abs(v - m))
    }
    val zbar = z.view.mapValues(zs => zs.sum * 1000000L / zs.size).toMap
    val nAll = rows.size; val k = 2
    val zAll = z.values.flatten.sum * 1000000L / nAll
    val ssb = z.map { case (g, zs) =>
      val dd = zbar(g) - zAll; BigDecimal(dd) * dd * zs.size }.sum
    val ssw = z.flatMap { case (g, zs) =>
      zs.map(x => { val dd = x * 1000000L - zbar(g); BigDecimal(dd) * dd })
    }.sum
    val w = ((nAll - k) * ssb).toDouble / ((k - 1) * ssw).toDouble
    assert(math.abs(r.getDouble(2) - w) < 1e-5, s"${r.getDouble(2)} vs $w")
    assert(r.getDouble(2) > 10.0, "planted spread gap must be loud")
    // all-constant groups: z ≡ 0 → SSW = 0 → null
    val const = Seq(("A", 5L), ("A", 5L), ("B", 9L), ("B", 9L))
    assert(Stats.brownForsythe(const.toDF("g", "v"), "g", "v")
      .head().isNullAt(2))
  }

  test("bleu2 ≡ hand clipped counts; identity → 1; brevity penalty; " +
      "no bigram overlap → 0") {
    import graft.operators.Corpus
    // pred "the cat sat", ref "the cat slept" → m1=2/3, m2=1/2
    val pairs = Seq((1L, "the cat sat", "the cat slept"))
      .toDF("pair_id", "pred", "ref")
    val r = Corpus.bleu2(pairs, "pair_id", "pred", "ref").head()
    assert(r.getLong(3) == 2 && r.getLong(4) == 3) // m1, t1
    assert(r.getLong(5) == 1 && r.getLong(6) == 2) // m2, t2
    val want = 1.0 * math.sqrt((2.0 / 3) * (1.0 / 2)) // c == r → BP 1
    assert(math.abs(r.getDouble(10) - want) < 1e-6)
    // identical pred/ref corpus → BLEU exactly 1
    val id = Seq((1L, "a b c d", "a b c d"), (2L, "x y", "x y"))
      .toDF("pair_id", "pred", "ref")
    assert(Corpus.bleu2(id, "pair_id", "pred", "ref")
      .head().getDouble(10) == 1.0)
    // short pred → BP = exp(1 − r/c) < 1 even with perfect precision
    val short = Seq((1L, "a b", "a b c d")).toDF("pair_id", "pred", "ref")
    val rs = Corpus.bleu2(short, "pair_id", "pred", "ref").head()
    assert(math.abs(rs.getDouble(9) - math.exp(1.0 - 4.0 / 2)) < 1e-6)
    // unigram overlap but ZERO shared bigrams → sqrt(p1·0) = 0, no
    // ln(0) blowup
    val noBi = Seq((1L, "a x b", "a y b")).toDF("pair_id", "pred", "ref")
    assert(Corpus.bleu2(noBi, "pair_id", "pred", "ref")
      .head().getDouble(10) == 0.0)
    // empty pred corpus → null scores, counts still emitted
    val empty = Seq((1L, "", "a b")).toDF("pair_id", "pred", "ref")
    assert(Corpus.bleu2(empty, "pair_id", "pred", "ref")
      .head().isNullAt(10))
  }

  test("cmh ≡ brute stratified recompute; Simpson stratification " +
      "flips the crude ratio; degenerate variance → null") {
    import graft.operators.Stats
    // two strata with opposite within-stratum balance (Simpson shape):
    // raw rows expanded from per-cell counts
    def rows(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val data = rows("s1", 60, 40, 20, 30) ++ rows("s2", 10, 30, 30, 40)
    val r = Stats.cmh(data.toDF("s", "e", "y"), "s", "e", "y").head()
    // brute per-stratum terms in stratum order with a 0.0-seeded fold
    val cellList = Seq(("s1", 60L, 40L, 20L, 30L),
      ("s2", 10L, 30L, 30L, 40L))
    var sd = 0.0; var sv = 0.0; var sad = 0.0; var sbc = 0.0
    for ((_, a, b, c, d) <- cellList) {
      val n = a + b + c + d
      sd += (a * d - b * c).toDouble / n
      sv += ((a + b) * (c + d)).toDouble * ((a + c) * (b + d)) /
        (n.toDouble * n * (n - 1))
      sad += (a * d).toDouble / n
      sbc += (b * c).toDouble / n
    }
    val cc = math.max(math.abs(sd) - 0.5, 0.0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 260)
    assert(math.abs(r.getDouble(4) - cc * cc / sv) < 1e-5)
    assert(math.abs(r.getDouble(5) - sad / sbc) < 1e-6)
    // balanced single stratum: ad = bc → Σd 0 → χ² = 0, OR = 1
    val bal = rows("x", 10, 10, 10, 10)
    val rb = Stats.cmh(bal.toDF("s", "e", "y"), "s", "e", "y").head()
    assert(rb.getDouble(4) == 0.0 && rb.getDouble(5) == 1.0)
    // all-exposed stratum: V = 0 and bc = 0 → both test fields null
    val degen = Seq(("z", true, true), ("z", true, false))
    val rd = Stats.cmh(degen.toDF("s", "e", "y"), "s", "e", "y").head()
    assert(rd.isNullAt(4) && rd.isNullAt(5))
  }

  test("rougeL ≡ brute LCS DP (randomized); cap semantics; " +
      "F = 2L/(m+n) micro anchors; native expr codegens") {
    import graft.operators.Corpus
    def bruteLcs(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.ofDim[Long](a.size + 1, b.size + 1)
      for (i <- 1 to a.size; j <- 1 to b.size)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.size)(b.size)
    }
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "c", "d", "e")
    val rows = (1L to 60L).map { i =>
      val p = Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(5)))
      val r = Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(5)))
      (i, p.mkString(" "), r.mkString(" "), p, r)
    }
    val got = Corpus.rougeL(
        rows.map(t => (t._1, t._2, t._3)).toDF("id", "pred", "ref"),
        "id", "pred", "ref", maxTokens = 32)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((i, _, _, p, r) <- rows) {
      val l = bruteLcs(p, r)
      assert(got(i).getLong(3) == l, s"pair $i")
      assert(got(i).getLong(6) ==
        2000000L * l / (p.size + r.size), s"pair $i f_micro")
    }
    // cap: only the first maxTokens per side participate
    val capped = Corpus.rougeL(
      Seq((1L, "x x x x x", "y y y x x")).toDF("id", "pred", "ref"),
      "id", "pred", "ref", maxTokens = 3).head()
    assert(capped.getLong(1) == 3 && capped.getLong(2) == 3)
    assert(capped.getLong(3) == 0) // "x x x" vs "y y y" — no overlap
    // identity → P = R = F = 1e6 exactly
    val idp = Corpus.rougeL(Seq((1L, "a b c", "a b c"))
      .toDF("id", "pred", "ref"), "id", "pred", "ref").head()
    assert(idp.getLong(4) == 1000000L && idp.getLong(6) == 1000000L)
    // the LCS expression must stay inside codegen (no fallback)
    val df = Seq(("a b", "b a")).toDF("p", "r")
      .select(graft.plans.TextNativeFunctions.lcsLength(
        org.apache.spark.sql.functions.split($"p", " "),
        org.apache.spark.sql.functions.split($"r", " "), 16).as("l"))
    assert(df.head().getLong(0) == 1L)
  }

  test("friedmanPosthoc ≡ brute mean ranks; CD thresholding; " +
      "incomplete tasks excluded like friedman") {
    import graft.operators.Stats
    // 3 systems, 10 tasks: C always best, A always worst → mean ranks
    // exactly 1, 2, 3; pairwise diffs 1e6 and 2e6
    val rows = (1 to 10).flatMap(t => Seq(
      (s"t$t", "A", 1L), (s"t$t", "B", 5L), (s"t$t", "C", 9L))) ++
      Seq(("t11", "A", 1L)) // incomplete → dropped
    val got = Stats.friedmanPosthoc(rows.toDF("t", "s", "v"),
        "t", "s", "v", cdMicro = 1500000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got.size == 3)
    assert(got(("A", "B")) == ((1000000L, 2000000L, 1000000L, false)))
    assert(got(("A", "C")) == ((1000000L, 3000000L, 2000000L, true)))
    assert(got(("B", "C")) == ((2000000L, 3000000L, 1000000L, false)))
    // tie case: equal values → shared midrank → zero diff
    val flat = (1 to 4).flatMap(t => Seq((s"t$t", "A", 7L),
      (s"t$t", "B", 7L)))
    val g2 = Stats.friedmanPosthoc(flat.toDF("t", "s", "v"),
      "t", "s", "v", 1L).head()
    assert(g2.getLong(4) == 0L && !g2.getBoolean(5))
  }

  test("changePoint raises loudly past the packed-argmax length bound") {
    // guard is plan-folded; a 2^21-row series is impractical to build,
    // so assert the guard EXPRESSION is present in the plan instead
    val df = Seq((1L, 1L, 5L), (1L, 2L, 9L)).toDF("key", "ord", "v")
    val plan = TimeSeries.changePoint(df, "key", "ord", "v")
      .queryExecution.analyzed.toString
    assert(plan.contains("raise_error"), plan.take(500))
  }
}
