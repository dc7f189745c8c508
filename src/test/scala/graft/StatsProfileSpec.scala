package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Corpus, Stats, Validate}

/** Semantics of the robust-stats + profiling operators and the BM25 /
  * inverted-index retrieval scores.
  */
class StatsProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("discreteQuantiles: exact rank semantics, no interpolation") {
    // 1..100 → p50 at rank 50 → value 50; p9500 → rank 95 → 95
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val q = Stats.discreteQuantiles(df, Seq("g"), "v", Seq(5000, 9500))
      .collect().head
    assert(q.getAs[Long]("q5000") == 50L)
    assert(q.getAs[Long]("q9500") == 95L)
    // duplicates: rank counts occurrences, not distinct values
    val dup = Seq.fill(99)(("g", 1L)).toDF("g", "v")
      .union(Seq(("g", 100L)).toDF("g", "v"))
    val q2 = Stats.discreteQuantiles(dup, Seq("g"), "v", Seq(9900, 9901))
      .collect().head
    assert(q2.getAs[Long]("q9900") == 1L)   // rank 99 → still the 1s
    assert(q2.getAs[Long]("q9901") == 100L) // rank 100 → the outlier
  }

  test("weightedQuantiles: weight mass, not row count, picks the value") {
    // values 1,2,3 with weights 1,1,8: half the MASS sits at 3, so the
    // weighted median is 3 while the unweighted median is 2
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 8L))
      .toDF("k", "v", "w")
    val r = Stats.weightedQuantiles(df, Seq("k"), "v", "w",
      Seq(5000, 9000)).head
    assert(r.getAs[Long]("q5000") == 3L)
    assert(r.getAs[Long]("q9000") == 3L)
    val u = Stats.discreteQuantiles(df, Seq("k"), "v", Seq(5000)).head
    assert(u.getAs[Long]("q5000") == 2L)
    // uniform weights ≡ unweighted for any p
    val uw = Seq(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L), ("g", 9L, 7L))
      .toDF("k", "v", "w")
    for (p <- Seq(1, 2500, 5000, 7500, 10000)) {
      assert(Stats.weightedQuantiles(uw, Seq("k"), "v", "w", Seq(p)).head
        .getAs[Long](s"q$p") ==
        Stats.discreteQuantiles(uw.select(col("k"), col("v")), Seq("k"),
          "v", Seq(p)).head.getAs[Long](s"q$p"))
    }
  }

  test("winsorize clamps to in-data values and preserves rows") {
    val df = ((1 to 98).map(i => ("g", 50L)) ++ Seq(("g", -1000L), ("g", 5000L)))
      .toDF("g", "v")
    val w = Stats.winsorize(df, Seq("g"), "v", 500, 9500)
    assert(w.count() == 100)
    val vals = w.select("v_w").distinct().collect().map(_.getLong(0)).toSet
    assert(vals == Set(50L)) // both outliers clamped to the p5/p95 value
    // clamped column never exceeds observed quantile bounds
    val mm = w.agg(min($"v_w"), max($"v_w")).collect().head
    assert(mm.getLong(0) == 50L && mm.getLong(1) == 50L)
  }

  test("profile: nulls, distincts, typed extremes") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("b", Some(3.5)))
      .toDF("s", "x")
    val p = Validate.profile(df, Seq("s"), Seq("x")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val s = p("s")
    assert(s.getAs[Long]("n") == 3 && s.getAs[Long]("n_null") == 0)
    assert(s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[String]("vmin_str") == "a" &&
      s.getAs[String]("vmax_str") == "b")
    assert(s.isNullAt(s.fieldIndex("vmin_num")))
    val x = p("x")
    assert(x.getAs[Long]("n_null") == 1 && x.getAs[Long]("n_distinct") == 2)
    assert(x.getAs[Double]("vmin_num") == 1.0 &&
      x.getAs[Double]("vmax_num") == 3.5)
  }

  test("heavyHitters: exact membership; freqItems is a superset of it") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(15)("c")
      ++ Seq.fill(5)("d")).toDF("v")
    val hh = Stats.heavyHitters(df, "v", phiBp = 1000) // ≥10%
      .collect().map(r => r.getAs[String]("v") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share")))).toMap
    assert(hh.keySet == Set("a", "b", "c"))
    assert(hh("a") == ((50L, 0.5)))
    assert(!hh.contains("d"))
    // boundary: exactly at threshold is IN (15/100 ≥ 10%; 5/100 < 10%)
    val atEdge = Stats.heavyHitters(df, "v", phiBp = 1500).collect()
      .map(_.getAs[String]("v")).toSet
    assert(atEdge == Set("a", "b", "c"))
    // freqItems (approximate, superset-guaranteed) covers the exact set
    val freq = df.stat.freqItems(Seq("v"), 0.10)
      .collect().head.getSeq[String](0).toSet
    assert(hh.keySet.subsetOf(freq))
  }

  test("bm25: rarer terms outscore common terms at equal tf") {
    val df = Seq((1L, "rare common common"), (2L, "common common other"),
      (3L, "common misc misc")).toDF("doc_id", "text")
    val out = Corpus.bm25(df, "text", "doc_id", TextFunctions.words)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("term")) ->
        r.getAs[Double]("bm25_raw")).toMap
    // df(rare)=1 < df(common)=3 → higher idf, positive score
    assert(out((1L, "rare")) > 0)
    assert(out((1L, "rare")) > out((1L, "common")))
    // common appears in every doc → idf ln((3-3+0.5)/(3+0.5)) < 0
    assert(out((1L, "common")) < 0)
  }

  test("invertedIndex: sorted capped postings, distinct per doc") {
    val df = Seq((3L, "b a"), (1L, "a a a"), (2L, "a c")).toDF("doc_id", "text")
    val out = Corpus.invertedIndex(df, "text", "doc_id",
        TextFunctions.words, cap = 2)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[String]("postings")))).toMap
    assert(out("a") == ((3L, "1,2")))  // df counts docs not occurrences; capped at 2
    assert(out("b") == ((1L, "3")))
    assert(out("c") == ((1L, "2")))
  }

  test("profileDrift flags null spike / cardinality collapse / range escape") {
    import graft.operators.Validate
    // ref: 100 rows, no nulls, s ∈ {a..j} (10 distinct), v ∈ [0, 99]
    val ref = (0 until 100)
      .map(i => (('a' + i % 10).toChar.toString, i.toDouble))
      .toDF("s", "v")
    // cur: v null on 1/5 rows (2000bp spike), s collapsed to 2 values,
    // v max escapes to 500
    val cur = (0 until 100).map { i =>
      (('a' + i % 2).toChar.toString,
        if (i % 5 == 0) null else java.lang.Double.valueOf(i + 401.0))
    }.toDF("s", "v")
    def prof(df: org.apache.spark.sql.DataFrame) =
      Validate.profile(df, strCols = Seq("s"), numCols = Seq("v"))
    val out = Validate.profileDrift(prof(ref), prof(cur),
        nullBpTol = 100, distinctBpTol = 2000)
      .collect().map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Boolean]("null_drift"), r.getAs[Boolean]("nd_drift"),
          r.getAs[Boolean]("range_escape"), r.getAs[Boolean]("any_drift"))))
      .toMap
    // v: 0 → 2000bp nulls (fires), distinct 100→80 = 2000bp (NOT >),
    // max 99 → 500 escapes
    assert(out("v") == ((true, false, true, true)))
    // s: no nulls either side; 10 → 2 distinct = 8000bp collapse fires;
    // strings carry no numeric range
    assert(out("s") == ((false, true, false, true)))
  }

  test("fdViolations: holding and violated dependencies, exact counts") {
    val df = Seq(
      ("k1", "a", "x"), ("k1", "a", "y"), // k1 → {a}: holds; k1 ⇒ 2 rhs2
      ("k2", "b", "x"), ("k2", "c", "x"), // k2 → {b,c}: violated
      ("k3", "d", "z"))
      .toDF("k", "v1", "v2")
    val got = Validate.fdViolations(df, Seq(
        ("k_to_v1", "k", "v1"), ("k_to_v2", "k", "v2")))
      .collect().map(r => r.getAs[String]("fd") ->
        ((r.getAs[Long]("n_lhs"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("max_rhs_per_lhs"),
          r.getAs[Double]("violation_rate")))).toMap
    assert(got("k_to_v1") == ((3L, 1L, 2L, 1.0 / 3.0)))
    assert(got("k_to_v2") == ((3L, 1L, 2L, 1.0 / 3.0)))
    // a key column is trivially FD-clean against itself
    val self = Validate.fdViolations(df, Seq(("self", "k", "k"))).head
    assert(self.getAs[Long]("n_violating") == 0L)
  }

  test("percentileCalibrate: exact integer percentiles, top-X% gate") {
    // scores 10,20,30,40 → ranks 1..4; keep top 25% ⟺ rank·10⁴ > n·7500
    // ⟺ rank > 3 → only the rank-4 row
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("id", "score")
    val got = Stats.percentileCalibrate(df, "id", "score", 2500L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("pct_bp"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) == ((1L, 2500L, false)))
    assert(got(2L) == ((2L, 5000L, false)))
    assert(got(3L) == ((3L, 7500L, false))) // boundary: 30000 > 30000 is false
    assert(got(4L) == ((4L, 10000L, true)))
    // equal scores: rank ties break on id — deterministic at any split
    val ties = Seq((9L, 5L), (3L, 5L), (7L, 5L)).toDF("id", "score")
    val r2 = Stats.percentileCalibrate(ties.repartition(5), "id", "score", 10000L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(r2 == Map(3L -> 1L, 7L -> 2L, 9L -> 3L))
  }

  test("ksDistance: brute-force CDF gap, identical groups → 0") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(80)(rnd.nextInt(40).toLong)
    val b = Seq.fill(50)(rnd.nextInt(40).toLong + 10)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = Stats.ksDistance(df.repartition(7), "g", "v", "A", "B").head
    // brute force over the union of values
    val vals = (a ++ b).distinct.sorted
    val dExp = vals.map(v => math.abs(
      a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)).max
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(r.getAs[Long]("d_num") == dExp)
    assert(r.getAs[Double]("d") ==
      dExp.toDouble / (a.size.toLong * b.size).toDouble)
    // a group compared against itself: every CDF gap is exactly 0
    val same = (a.map(("A", _)) ++ a.map(("B", _))).toDF("g", "v")
    assert(Stats.ksDistance(same, "g", "v", "A", "B").head
      .getAs[Long]("d_num") == 0L)
  }

  test("rocAuc: brute-force pair counting with half-ties; separation → 1") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(120)((rnd.nextBoolean(), rnd.nextInt(15).toLong))
    val df = rows.toDF("y", "s")
    val r = Stats.rocAuc(df.repartition(5), "y", "s").head
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(r.getAs[Long]("n_pos") == pos.size)
    assert(r.getAs[Long]("n_neg") == neg.size)
    assert(r.getAs[Long]("u2") == u2)
    assert(r.getAs[Double]("auc") ==
      u2.toDouble / (pos.size.toLong * neg.size * 2).toDouble)
    // perfectly separated scores → AUC exactly 1
    val sep = (1 to 10).map(i => (i > 5, i.toLong)).toDF("y", "s")
    assert(Stats.rocAuc(sep, "y", "s").head.getAs[Double]("auc") == 1.0)
  }

  test("contingencyProfile: independence → 0; hand-checked 2×2") {
    // counts o(a,b) = f(a)·g(b) — exactly independent: chi2 = mi = 0
    val ind = (for {
      (av, fa) <- Seq(("x", 2), ("y", 3))
      (bv, gb) <- Seq((1L, 4), (2L, 5))
      _ <- 1 to fa * gb
    } yield (av, bv)).toDF("a", "b")
    val ri = Stats.contingencyProfile(ind.repartition(6), "a", "b").head
    assert(ri.getAs[Long]("n") == 5 * 9)
    assert(ri.getAs[Long]("dof") == 1L)
    assert(ri.getAs[Double]("chi2") == 0.0)
    assert(ri.getAs[Double]("mi_nats") == 0.0)
    assert(ri.getAs[Double]("cramers_v") == 0.0)
    // hand-checked 2×2: cells (10,0 / 0,10) — full association
    val assoc = ((1 to 10).map(_ => ("x", 1L)) ++
      (1 to 10).map(_ => ("y", 2L))).toDF("a", "b")
    val ra = Stats.contingencyProfile(assoc, "a", "b").head
    assert(ra.getAs[Double]("chi2") == 20.0) // n·min(r-1,c-1) → V = 1
    assert(ra.getAs[Double]("cramers_v") == 1.0)
    assert(math.abs(ra.getAs[Double]("mi_nats") - math.log(2.0)) < 1e-6)
  }

  test("isotonicFit ≡ sequential pool-adjacent-violators on random bins") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val bins = (0 until 12).map { i =>
        val n = rnd.nextInt(20) + 1L
        (i.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val df = bins.toDF("bin", "n", "pos")
      val got = Stats.isotonicFit(df.repartition(5), "bin", "n", "pos")
        .collect().map(r => r.getAs[Long]("bin") ->
          r.getAs[Double]("iso")).toMap
      // classic PAV: merge adjacent pools while means decrease
      var pools = bins.map(b => (List(b._1), b._3, b._2)).toList
      var changed = true
      while (changed) {
        changed = false
        pools = pools.foldLeft(List.empty[(List[Long], Long, Long)]) {
          case (acc @ (pb, pp, pn) :: rest, (cb, cp, cn)) =>
            // violation ⟺ pp/pn > cp/cn  ⟺  pp·cn > cp·pn (exact)
            if (pp * cn > cp * pn) { changed = true
              (pb ++ cb, pp + cp, pn + cn) :: rest }
            else (cb, cp, cn) :: acc
          case (Nil, c) => List((c._1, c._2, c._3))
        }.reverse
      }
      val exp = pools.flatMap { case (bs, p, n) =>
        bs.map(_ -> p.toDouble / n.toDouble) }.toMap
      assert(got == exp, s"trial $trial: $got != $exp")
      // fitted curve is monotone non-decreasing
      val iso = (0L until 12L).map(got)
      assert(iso == iso.sorted)
    }
  }

  test("psi: identical halves ≈ 0, shifted distribution fires") {
    val rnd = new scala.util.Random(17)
    val base = Seq.fill(2000)(rnd.nextInt(10000).toLong)
    val a = base.toDF("v")
    // same distribution resampled → psi well under the 0.1 folklore cut
    val b1 = Seq.fill(2000)(rnd.nextInt(10000).toLong).toDF("v")
    val p1 = Stats.psi(a, b1, "v").head
    assert(p1.getAs[Long]("n_a") == 2000L && p1.getAs[Long]("n_b") == 2000L)
    assert(math.abs(p1.getAs[Double]("psi")) < 0.1)
    // hard location shift → psi far above 0.25
    val b2 = base.map(_ + 5000L).toDF("v")
    assert(Stats.psi(a, b2, "v").head.getAs[Double]("psi") > 0.25)
    // self-comparison: every bucket identical → psi exactly 0
    assert(Stats.psi(a, a, "v").head.getAs[Double]("psi") == 0.0)
  }

  test("gainsTable: hand case — top-score positives captured first") {
    // scores 10..1, positives at the top 3 scores
    val df = (1 to 10).map(i => (i >= 8, i.toLong, i.toLong))
      .toDF("y", "s", "id")
    val got = Stats.gainsTable(df.repartition(4), "y", "s", "id", 5)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("cum_pos"), r.getAs[Long]("capture_bp"),
          r.getAs[Long]("precision_bp")))).toMap
    // bucket 1 = scores {10, 9}: 2 positives → capture 2/3
    assert(got(1L) == ((2L, 2L, 2L, 6666L, 10000L)))
    // bucket 2 = scores {8, 7}: one more positive → all 3 captured
    assert(got(2L) == ((2L, 1L, 3L, 10000L, 7500L)))
    // remaining buckets add nothing; totals close at n=10
    assert(got(5L)._3 == 3L && got(5L)._4 == 10000L)
    assert(got.values.map(_._1).sum == 10L)
    // capture is monotone non-decreasing in bucket order
    val caps = (1L to 5L).map(got(_)._4)
    assert(caps == caps.sorted)
  }

}
