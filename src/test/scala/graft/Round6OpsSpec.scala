package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Corpus, Similarity, Stats, Validate}

/** Brute-force twins for the round-6 additions (A15 RR3, C84 conformal,
  * C85 time-decay attribution, E95 hard negatives, E96 TextRank) — the
  * gate proves engine parity; these prove the SEMANTICS against an
  * independently-computed answer.
  */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** First-8-hex md5 integer of a UTF-8 string — the repo's
    * content-keyed coin (Sampling.hashGate recipe), recomputed
    * independently of Spark.
    */
  private def md5h8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("randomRound3 ≡ hand RR3: multiples of 3, 2/3 coin, suppression") {
    val rows = (1 to 400).map(i => (s"g${i % 13}", i))
    val got = Validate.randomRound3(rows.toDF("g", "x"), Seq("g"), 6L)
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val brute = rows.groupBy(_._1).map { case (g, rs) =>
      val n = rs.size.toLong
      val rr3 =
        if (n < 6) None
        else if (n % 3 == 0) Some(n)
        else {
          val nearer = if (n % 3 == 1) n - 1 else n + 1
          val farther = if (n % 3 == 1) n + 2 else n - 2
          Some(if (md5h8(g) % 3 < 2) nearer else farther)
        }
      g -> rr3
    }
    assert(got == brute)
    // released values are always multiples of 3 within 2 of the truth
    got.foreach { case (g, v) =>
      v.foreach { r =>
        assert(r % 3 == 0 && math.abs(r - rows.count(_._1 == g)) <= 2)
      }
    }
  }

  test("splitConformal ≡ hand split + floor mean + rank quantile") {
    val rows = (1 to 500).map(i =>
      (s"t${i % 3}", i.toLong, (i * 7 % 97 + i % 11).toLong))
    val got = Stats.splitConformal(rows.toDF("g", "id", "cents"),
        "g", "cents", "id", alphaBp = 1000)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val brute = rows.groupBy(_._1).map { case (g, rs) =>
      val (tr, cal) = rs.partition(r => md5h8(r._2.toString) % 2 == 0)
      val yhat = tr.map(_._3).sum / tr.size // floor mean (all positive)
      val res = cal.map(r => (math.abs(r._3 - yhat), r._2))
        .sortBy(identity).map(_._1)
      val idx = math.min((9000L * (cal.size + 1) + 9999) / 10000,
        cal.size.toLong).toInt
      g -> (tr.size.toLong, cal.size.toLong, yhat, res(idx - 1))
    }
    assert(got == brute)
  }

  test("timeDecayAttribution ≡ sequential journey fold") {
    // one user, two journeys; second journey's touches at 0/1/3
    // half-lives before the conversion; a trailing orphan touch
    val hl = 100L // half-life in "us" for the test
    val ev = Seq(
      (1L, 0L, 1L, "click", 0L),
      (1L, 50L, 2L, "view", 0L),
      (1L, 100L, 3L, "purchase", 900L), // j0: click k=1, view k=0
      (1L, 200L, 4L, "view", 0L),       // j1: k=3
      (1L, 450L, 5L, "click", 0L),      // j1: k=1
      (1L, 500L, 6L, "view", 0L),       // j1: k=0
      (1L, 550L, 7L, "purchase", 1200L),
      (1L, 600L, 8L, "click", 0L),      // orphan: no credit
      (2L, 10L, 9L, "purchase", 77L))   // no touches: "none"
    val got = Analytics.timeDecayAttribution(
        ev.toDF("u", "us", "id", "et", "cents"),
        "u", "us", "id", "et", "cents", "purchase",
        halfLifeUs = hl, maxHalfLives = 20)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // j0: weights view 2^20, click 2^19 → total 3·2^19
    //   view:  900·1e6·2^20 div (3·2^19) = 600000000 → 600 cents
    //   click: 900·1e6·2^19 div (3·2^19) = 300000000 → 300 cents
    // j1: view(k=0) 2^20, click(k=1) 2^19, view(k=3) 2^17
    //   total = 2^17·(8+4+1) = 13·2^17
    //   views: 1200·1e6·(2^20+2^17) div (13·2^17) = (1200·1e6·9) div 13
    //   click: 1200·1e6·4 div 13
    val j1v = 1200L * 1000000 * 9 / 13
    val j1c = 1200L * 1000000 * 4 / 13
    val brute = Map(
      "view" -> (3L, 2L, (600000000L + j1v) / 1000000),
      "click" -> (2L, 2L, (300000000L + j1c) / 1000000),
      "none" -> (0L, 1L, 77L))
    assert(got == brute)
  }

  test("hardNegatives ≡ brute cross-label k-NN with (d2, id) ties") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 60).map { i =>
      (i.toLong, (i % 4).toLong,
        Seq.fill(6)((rnd.nextInt(2000) - 1000) / 1000.0f))
    }
    val got = Similarity.hardNegatives(rows.toDF("id", "lab", "v"),
        "id", "lab", "v", k = 3, queryMod = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    val brute = rows.filter(_._1 % 5 == 0).flatMap { case (qid, qlab, qv) =>
      val qq = quant(qv)
      rows.filter(r => r._1 != qid && r._2 != qlab)
        .map { case (cid, _, cv) =>
          val d2 = quant(cv).zip(qq).map { case (a, b) =>
            (a - b) * (a - b) }.sum
          (d2, cid)
        }
        .sorted.take(3).zipWithIndex
        .map { case ((d2, cid), i) =>
          (qid, i + 1L) -> (cid, d2) }
    }.toMap
    assert(got == brute)
  }

  test("cohenKappa ≡ hand contingency; degenerate one-cell null") {
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "a"), ("c", "c"), ("c", "c"), ("b", "b"))
    val got = Stats.cohenKappa(rows.toDF("ra", "rb"), "ra", "rb").head
    val n = rows.size.toLong
    val agree = rows.count(t => t._1 == t._2).toLong
    val cats = (rows.map(_._1) ++ rows.map(_._2)).distinct
    val pe = cats.map(c =>
      rows.count(_._1 == c).toLong * rows.count(_._2 == c)).sum
    val kappa = (agree * n - pe).toDouble / (n * n - pe).toDouble
    assert(got.getLong(0) == n && got.getLong(1) == agree)
    assert(got.getDouble(2) == kappa)
    // all mass in one cell: p_e = 1, kappa undefined -> null
    val degen = Stats.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("ra", "rb"), "ra", "rb").head
    assert(degen.isNullAt(2))
  }

  test("tukeyFences ≡ hand rank quartiles + doubled fence tests") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map(i =>
      (s"g${i % 2}", rnd.nextInt(1000).toLong + (if (i % 37 == 0) 50000L else 0L)))
    val got = Stats.tukeyFences(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val brute = rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size
      def q(p: Int) = vs(vs.indices.find(i =>
        (i + 1).toLong * 10000 >= n.toLong * p).get)
      val (q1, q3) = (q(2500), q(7500))
      val iqr = q3 - q1
      g -> (n.toLong, q1, q3,
        vs.count(v => v * 2 < q1 * 2 - 3 * iqr).toLong,
        vs.count(v => v * 2 > q3 * 2 + 3 * iqr).toLong)
    }
    assert(got == brute)
  }

  test("controlChart ≡ sequential I-MR fold") {
    val rows = Seq(
      ("a", "d1", 100L), ("a", "d1", 20L), ("a", "d2", 130L),
      ("a", "d3", 115L), ("a", "d4", 400L), // spike day
      ("b", "d1", 50L)) // single-day key: null MR-bar, no violations
    val got = graft.operators.TimeSeries.controlChart(
        rows.toDF("k", "day", "cents"), "k", "day", "cents")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4))).toMap
    // a: daily x = 120, 130, 115, 400; center = 765 div 4 = 191
    // MRs = 10, 15, 285 -> mrbar_milli = 310000 div 3 = 103333
    // violations: |x-191|*1e6 > 2660*103333 = 274,865,780
    //   -> |Δ| > 274.86... cents: only x=400 (209) NO... 209e6 < 274.9e6
    //   -> no violation?? recompute: 2660*103333 = 274,865,780;
    //      |400-191|=209 -> 209,000,000 < 274,865,780 -> 0 violations
    assert(got("a") == (4L, 191L, Some(103333L), 0L))
    assert(got("b") == (1L, 50L, None, 0L))
  }

  test("brierDecomposition: perfect-forecast degenerate = zero reliability") {
    // labels constant per score value and split-stable: the train
    // forecast per decile equals the cal outcome rate exactly when
    // every bucket is label-pure -> reliability 0, resolution =
    // o_bar(1-o_bar) at the micro grid (up to floor quantization)
    val rows = (1 to 400).map { i =>
      val s = if (i % 2 == 0) 100L else 900L
      (i.toLong, s >= 500L, s)
    }
    val r = Stats.brierDecomposition(rows.toDF("id", "y", "s"),
      "y", "s", "id").head
    val n = r.getLong(0)
    assert(n > 0)
    assert(r.getLong(3) == 0L, "pure buckets must have zero reliability")
    // resolution ≈ uncertainty for a perfectly-sharp forecast; both in
    // pico-units on the floored micro grid
    val unc = r.getLong(2); val res = r.getLong(4)
    assert(math.abs(res - unc) <= 2000000L,
      s"sharp forecast: resolution $res should approach uncertainty $unc")
  }

  test("hllMergeCounts: 3%-of-exact estimates; batch-split ≡ one-shot") {
    val rows = (1 to 20000).map(i => (s"g${i % 3}", (i * 13 % 4211).toLong, i))
    val df = rows.toDF("g", "k", "i")
    val exact = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).distinct.size.toLong }
    val oneShot = Stats.hllMergeCounts(df, "g", "k")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    oneShot.foreach { case (g, est) =>
      assert(math.abs(est - exact(g)) <= 0.03 * exact(g),
        s"$g: est $est vs exact ${exact(g)}")
    }
    // register-max associativity: two runs merged == one-shot sketch
    val run1 = Stats.hllMergeCounts(df.filter(col("i") % 2 === 0), "g", "k")
    val merged = Stats.hllMergeCounts(df.filter(col("i") % 2 =!= 0),
        "g", "k", prior = Some(run1.select(col("g"), col("sk"))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged == oneShot,
      "batch-split estimates must equal the one-shot sketch exactly")
  }

  test("scd3: changed / unchanged / inserted keys carry the right prev") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val upd = Seq((2L, 99L), (3L, 30L), (4L, 40L)).toDF("k", "v")
    val got = graft.operators.Loads.scd3(base, upd, Seq("k"), "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3))).toMap
    assert(got == Map(
      1L -> (10L, None, false),        // untouched
      2L -> (99L, Some(20L), true),    // changed: prev retained
      3L -> (30L, None, false),        // update equal: no change
      4L -> (40L, None, true)))        // insert: no prev
  }

  test("crossSourceDuplication ≡ hand fingerprint overlap matrix") {
    val docs = Seq(
      ("x", "A"), ("y", "A"), ("z", "A"),
      ("x", "B"), ("q", "B"),
      ("x", "C"), ("y", "C"), ("x", "C")) // in-source dup collapses
      .toDF("text", "src")
    val got = graft.operators.Corpus
      .crossSourceDuplication(docs, "text", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got == Map(
      ("A", "B") -> (3L, 2L, 1L, 333333L, 500000L),
      ("A", "C") -> (3L, 2L, 2L, 666666L, 1000000L),
      ("B", "C") -> (2L, 2L, 1L, 500000L, 500000L)))
  }

  test("textRank ≡ local integer PageRank over the adjacency graph") {
    val docs = Seq(
      "spark sort merge join sort spark",
      "merge sort table scan",
      "join table join spark").toDF("text")
    val got = Corpus.textRank(docs, "text", iterations = 5, topK = 30)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // brute: adjacent pairs, symmetrized + deduped, 5 integer rounds
    val adj = docs.collect().map(_.getString(0)).flatMap { t =>
      val w = t.split(" ")
      w.init.zip(w.tail)
    }.filter { case (a, b) => a != b }
    val edges = (adj ++ adj.map(_.swap)).distinct
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length
    val scale = 1000000000000L
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    val base = (15L * scale) / (100L * n)
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.HashMap.empty[String, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        inflow(d) += rank(s) / deg(s)
      }
      rank = nodes.map(w => w -> (base + (85L * inflow(w)) / 100L)).toMap
    }
    val brute = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(30)
    assert(got.toSeq == brute)
  }
}
