package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Stats}

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lastTouch: credits nearest preceding non-conversion, none if bare") {
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      (1L, 40L, 4L, "purchase"), // still credited to the click at t=20
      (2L, 10L, 5L, "purchase"), // no prior event → none
      (3L, 10L, 6L, "view"), (3L, 20L, 7L, "purchase"),
      (3L, 30L, 8L, "error"), (3L, 40L, 9L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.lastTouch(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .select($"event_id", $"channel").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "click", 4L -> "click", 5L -> "none",
      7L -> "view", 9L -> "error"))
  }

  test("lastTouch: tie on ts broken by the tie column deterministically") {
    val ev = Seq((1L, 10L, 1L, "view"), (1L, 10L, 2L, "click"),
      (1L, 10L, 3L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.lastTouch(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .select($"channel").head.getString(0)
    assert(got == "click") // event_id 2 sorts after 1 at the same ts
  }

  test("sequenceFunnel: full chain within gap counts, broken chains don't") {
    val ev = Seq(
      // user 1: view(0) → click(5) → purchase(9): both hops ≤ 10 ✓
      (1L, 0L, 1L, "view"), (1L, 5L, 2L, "click"), (1L, 9L, 3L, "purchase"),
      // user 2: view(0) → click(20): click too late, purchase not counted
      (2L, 0L, 4L, "view"), (2L, 20L, 5L, "click"), (2L, 25L, 6L, "purchase"),
      // user 3: click(5) with NO prior view → purchase not counted
      (3L, 5L, 7L, "click"), (3L, 9L, 8L, "purchase"),
      // user 4: chain ok but purchase 30 after click: too late
      (4L, 0L, 9L, "view"), (4L, 5L, 10L, "click"), (4L, 40L, 11L, "purchase"),
      // user 5: two purchases after one qualified click, both within gap
      (5L, 0L, 12L, "view"), (5L, 3L, 13L, "click"),
      (5L, 8L, 14L, "purchase"), (5L, 12L, 15L, "purchase"))
      .toDF("user_id", "us", "event_id", "event_type")
    val got = Analytics.sequenceFunnel(ev, "user_id", "us", "event_id",
        "event_type", "view", "click", "purchase", 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 2L))
  }

  test("keySkewProfile: hot-key diagnostics are exact") {
    // key a: 8 rows, b: 1, c: 1 → 10 rows, 3 keys, max 8
    val df = (Seq.fill(8)("a") ++ Seq("b", "c")).toDF("k")
    val r = Analytics.keySkewProfile(df, "k").head
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("max_key_rows") == 8L)
    assert(r.getAs[Double]("max_over_mean") == 8.0 * 3.0 / 10.0)
    assert(r.getAs[Long]("p50_key_rows") == 1L) // counts {8,1,1}: p50 = 1
    assert(r.getAs[Long]("p99_key_rows") == 8L)
  }

  test("madOutliers: flag is |x−med| > k·MAD with exact discrete medians") {
    // group g: values 1..9 plus 100 → med of {1..9,100} (10 values,
    // p50 rank 5) = 5; dev med = |x−5| sorted {0,1,1,2,2,3,3,4,4,95},
    // p50 = 2; outlier iff dev > 6 → only 100 (dev 95)
    val df = ((1L to 9L) :+ 100L).map(("g", _)).toDF("g", "v")
    val out = Stats.madOutliers(df, Seq("g"), "v", 3)
    val flagged = out.filter($"is_outlier").select($"v").collect()
      .map(_.getLong(0)).toSet
    assert(flagged == Set(100L))
    val r = out.head
    assert(out.select($"med").head.getLong(0) == 5L)
    assert(out.select($"mad").head.getLong(0) == 2L)
  }

  test("robustScale: (x−med)/IQR, null for constant groups") {
    val df = Seq(("a", 0L), ("a", 25L), ("a", 50L), ("a", 75L), ("a", 100L),
      ("b", 7L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val got = Stats.robustScale(df, Seq("g"), "v", "rs")
      .select($"g", $"v", $"rs").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    // a: q25=25, med=50, q75=75 → IQR 50; 0 → -1.0, 100 → 1.0
    assert(got(("a", 0L)) == -1.0)
    assert(got(("a", 50L)) == 0.0)
    assert(got(("a", 100L)) == 1.0)
    // constant group: IQR 0 → null, never a division blow-up
    assert(got(("b", 7L)) == null)
  }

  test("abTest: moments, Welch z and Wilson bounds match hand math") {
    val df = Seq(
      ("A", 100L, true), ("A", 200L, false), ("A", 300L, false),
      ("B", 400L, true), ("B", 500L, true), ("B", 600L, false), ("B", 700L, true))
      .toDF("variant", "cents", "converted")
    val got = Analytics.abTest(df, "variant", "cents", "converted")
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    val a = got("A"); val b = got("B")
    assert(a.getAs[Long]("n") == 3 && b.getAs[Long]("n") == 4)
    assert(a.getAs[Double]("metric_mean") == 200.0)
    assert(b.getAs[Double]("metric_mean") == 550.0)
    // exact-moment sample variances: (n·Sxx − Sx²)/(n(n−1))
    assert(a.getAs[Double]("metric_var") == 10000.0)
    assert(b.getAs[Double]("metric_var") == 200000.0 / 12)
    assert(a.isNullAt(a.fieldIndex("z_vs_first"))) // baseline itself
    val zExp = (550.0 - 200.0) /
      math.sqrt((200000.0 / 12) / 4.0 + 10000.0 / 3.0)
    assert(b.getAs[Double]("z_vs_first") == zExp)
    // Wilson replayed with the operator's op order (p=3/4, n=4)
    val zz = 3.8416; val p = 3.0 / 4.0; val n = 4.0
    val center = p + zz / (2.0 * n)
    val half = math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n)) * 1.96
    val den = 1.0 + zz / n
    assert(b.getAs[Double]("wilson_lo") == (center - half) / den)
    assert(b.getAs[Double]("wilson_hi") == (center + half) / den)
    // interval actually brackets the point estimate
    assert(b.getAs[Double]("wilson_lo") < p && p < b.getAs[Double]("wilson_hi"))
  }

  test("acf: alternating series hand-check, exact at any parallelism") {
    // x = [1,2,1,2]: n=4, S=6, dev = 4x−6 = [−2,2,−2,2], den = 16;
    // lag1: (−4)+(−4)+(−4) → −0.75; lag2: 4+4 → 0.5; lag3: −4 → −0.25
    val df = Seq(("a", 1L), ("b", 2L), ("c", 1L), ("d", 2L))
      .toDF("o", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.acf(d, "o", "x", Seq(1, 2, 3))
        .collect().map(r => (r.getAs[Long]("lag"),
          r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toSet
    val exp = Set((1L, 3L, -0.75), (2L, 2L, 0.5), (3L, 1L, -0.25))
    assert(run(df) == exp)
    assert(run(df.repartition(7)) == exp) // exact ints → bit-identical
    // constant series: zero variance → null acf (0/0), not a crash
    val const = graft.operators.TimeSeries.acf(
      Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("o", "x"), "o", "x", Seq(1))
      .collect()
    assert(const.head.isNullAt(2))
  }

  test("topPaths: in-session order, gap split, deterministic tie-break") {
    val rows = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "view"), (2L, 10L, "click"), (2L, 20L, "purchase"),
      (3L, 0L, "view"), (3L, 4000L, "click")) // gap > 1800s → 2 sessions
    val df = rows.toDF("user_id", "secs", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val got = graft.operators.Sessions
      .topPaths(df, "user_id", "ts", "event_type", 1800L, 2)
      .collect().map(r => (r.getAs[String]("path"),
        r.getAs[Long]("n_sessions"))).toSeq
    // "view>click>purchase" ×2 first; then the (click=1, view=1) tie
    // breaks path-ascending → "click"
    assert(got == Seq(("view>click>purchase", 2L), ("click", 1L)))
  }

  test("cusum: window algebra ≡ the clamped sequential recurrence") {
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 1L to 5L; t <- 1L to 40L)
      yield (k, t, t, 4000L + rnd.nextInt(4000).toLong) // cents
    val df = rows.toDF("user_id", "us", "event_id", "cents")
    val got = graft.operators.TimeSeries
      .cusumPerKey(df, "user_id", "us", "event_id", "cents",
        targetCents = 5000L, allowanceCents = 500L, hCents = 10000L)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("final_up"), r.getAs[Long]("max_up"),
          r.getAs[Long]("n_alarms_up"), r.getAs[Long]("final_dn"),
          r.getAs[Long]("max_dn"), r.getAs[Long]("n_alarms_dn")))).toMap
    // reference: the textbook fold s = max(0, s + d), per key in order
    val exp = rows.groupBy(_._1).map { case (k, rs) =>
      var su = 0L; var sd = 0L; var mu = 0L; var md = 0L; var au = 0L; var ad = 0L
      rs.sortBy(r => (r._2, r._3)).foreach { r =>
        su = math.max(0L, su + (r._4 - 5500L)); mu = math.max(mu, su)
        if (su > 10000L) au += 1
        sd = math.max(0L, sd + (4500L - r._4)); md = math.max(md, sd)
        if (sd > 10000L) ad += 1
      }
      k -> ((su, mu, au, sd, md, ad))
    }
    assert(got == exp)
    // the shift is actually detectable: drifting series alarms
    val drift = (1L to 30L).map(t => (9L, t, t, 6000L))
      .toDF("user_id", "us", "event_id", "cents")
    val d = graft.operators.TimeSeries.cusumPerKey(drift, "user_id", "us",
      "event_id", "cents", 5000L, 500L, 10000L).head
    assert(d.getAs[Long]("n_alarms_up") > 0 && d.getAs[Long]("n_alarms_dn") == 0)
  }

  test("globalValueRank ≡ bare global window, any partitioning/width") {
    val rnd = new scala.util.Random(3)
    // duplicate values force the tie-break; width 16 forces many buckets
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(300).toLong))
    val df = rows.toDF("k", "v").repartition(11)
    val expected = rows.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((k, _), idx) => k -> (idx + 1L) }.toMap
    for (width <- Seq(1L, 16L, 1L << 20)) {
      val got = Stats.globalValueRank(df, "v", "k", "rnk", width)
        .select($"k", $"rnk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"width=$width")
    }
  }

  private def bruteSkyline(pts: Seq[(Long, String, Double, Double)])
      : Set[Long] =
    pts.filter { case (_, k, x, y) =>
      !pts.exists { case (_, k2, x2, y2) =>
        k2 == k && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet

  test("skyline: randomized ≡ brute force, global and grouped") {
    val rnd = new scala.util.Random(42)
    val pts = (0L until 300L).map(i =>
      (i, s"g${rnd.nextInt(3)}", rnd.nextInt(40).toDouble,
        rnd.nextInt(40).toDouble))
    val df = pts.toDF("id", "grp", "x", "y")
    val dims = Seq("x" -> true, "y" -> true)
    val global = Analytics.skyline(spark, df, "id", dims, None)
      .select($"id").as[Long].collect().toSet
    assert(global == bruteSkyline(pts.map(p => (p._1, "", p._3, p._4))))
    val grouped = Analytics.skyline(spark, df, "id", dims, Some("grp"))
      .select($"id").as[Long].collect().toSet
    assert(grouped == bruteSkyline(pts))
  }

  test("skyline: duplicate Pareto points all survive; direction flips; " +
      "null dims drop; partition-independent") {
    val df = Seq(
      (1L, 10.0, 1.0), (2L, 10.0, 1.0), // duplicated frontier point
      (3L, 5.0, 5.0), (4L, 1.0, 10.0),
      (5L, 4.0, 4.0),                   // dominated by 3
      (6L, 0.0, 0.0)                    // dominated by all
    ).toDF("id", "x", "y")
    val up = Analytics.skyline(spark, df, "id",
      Seq("x" -> true, "y" -> true)).select($"id").as[Long].collect().toSet
    assert(up == Set(1L, 2L, 3L, 4L))
    // minimize both → the frontier flips to the bottom-left
    val dn = Analytics.skyline(spark, df, "id",
      Seq("x" -> false, "y" -> false)).select($"id").as[Long].collect().toSet
    assert(dn == Set(6L))
    // a null dim excludes the row entirely
    val withNull = Seq((1L, Some(10.0), 1.0), (2L, None, 99.0))
      .toDF("id", "x", "y")
    val nn = Analytics.skyline(spark, withNull, "id",
      Seq("x" -> true, "y" -> true)).select($"id").as[Long].collect().toSet
    assert(nn == Set(1L))
    // result is a pure set function of the data, not the partitioning
    val rnd = new scala.util.Random(7)
    val pts = (0L until 200L).map(i =>
      (i, "", rnd.nextInt(25).toDouble, rnd.nextInt(25).toDouble))
    val big = pts.toDF("id", "grp", "x", "y")
    val a = Analytics.skyline(spark, big.repartition(13), "id",
      Seq("x" -> true, "y" -> true)).select($"id").as[Long].collect().toSet
    val b = Analytics.skyline(spark, big.coalesce(1), "id",
      Seq("x" -> true, "y" -> true)).select($"id").as[Long].collect().toSet
    assert(a == b && a == bruteSkyline(pts))
  }

  test("skyline: 3 dimensions, randomized ≡ brute force") {
    val rnd = new scala.util.Random(23)
    val pts = (0L until 200L).map(i =>
      (i, rnd.nextInt(12).toDouble, rnd.nextInt(12).toDouble,
        rnd.nextInt(12).toDouble))
    val brute = pts.filter { case (_, x, y, z) =>
      !pts.exists { case (_, x2, y2, z2) =>
        x2 >= x && y2 >= y && z2 >= z && (x2 > x || y2 > y || z2 > z) }
    }.map(_._1).toSet
    val got = Analytics.skyline(spark,
        pts.toDF("id", "x", "y", "z").repartition(7), "id",
        Seq("x" -> true, "y" -> true, "z" -> true))
      .select($"id").as[Long].collect().toSet
    assert(got == brute)
  }

  test("skyline: anti-correlated worst case — the frontier IS the data") {
    // every point on x+y=100 with distinct x: nothing dominates
    // anything, all 101 points survive both plans
    val pts = (0L to 100L).map(i => (i, i.toDouble, (100 - i).toDouble))
    val df = pts.toDF("id", "x", "y")
    val got = Analytics.skyline(spark, df.repartition(9), "id",
      Seq("x" -> true, "y" -> true)).count()
    assert(got == 101L)
  }

  test("linearAttribution: equal integer split, none bucket, trailing drop") {
    val ev = Seq(
      // user 1, journey 1: view+click then a 100-cent purchase →
      //   each touch gets 100·10⁶ div 2 = 5·10⁷ µ¢ (50¢)
      (1L, 10L, 1L, "view", 0L), (1L, 20L, 2L, "click", 0L),
      (1L, 30L, 3L, "purchase", 100L),
      // user 1, journey 2: one view then a 7-cent purchase → view gets
      //   7·10⁶ div 1; then a TRAILING click that matches no conversion
      (1L, 40L, 4L, "view", 0L), (1L, 50L, 5L, "purchase", 7L),
      (1L, 60L, 6L, "click", 0L),
      // user 2: bare purchase → none in full
      (2L, 10L, 7L, "purchase", 33L),
      // user 3: THREE touches split 100 cents: 100·10⁶ div 3 =
      //   33333333 µ¢ each; view holds two of them
      (3L, 10L, 8L, "view", 0L), (3L, 20L, 9L, "view", 0L),
      (3L, 30L, 10L, "click", 0L), (3L, 40L, 11L, "purchase", 100L))
      .toDF("user_id", "ts", "event_id", "event_type", "cents")
    val got = Analytics.linearAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "cents", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // view: u1j1 5·10⁷ + u1j2 7·10⁶ + u3 2·33333333 µ¢ = 123666666 µ¢
    //   → div 10⁶ = 123¢ over 4 touches in 3 journeys
    assert(got("view") == ((4L, 3L, 123L)))
    // click: u1j1 50¢ + u3 33333333 µ¢ → 83333333 div 10⁶ = 83¢
    assert(got("click") == ((2L, 2L, 83L)))
    assert(got("none") == ((0L, 1L, 33L)))
    assert(!got.contains("purchase"))
  }

  test("linearAttribution: sums credit at most the converted value") {
    // floor division may drop < n_touches µ¢ per conversion, never adds
    val ev = Seq(
      (1L, 1L, 1L, "a", 0L), (1L, 2L, 2L, "b", 0L), (1L, 3L, 3L, "c", 0L),
      (1L, 4L, 4L, "purchase", 1000L),
      (2L, 1L, 5L, "a", 0L), (2L, 2L, 6L, "purchase", 999L))
      .toDF("user_id", "ts", "event_id", "event_type", "cents")
    val credited = Analytics.linearAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "cents", "purchase")
      .agg(sum($"credited_cents")).head.getLong(0)
    assert(credited <= 1999L && credited >= 1997L)
  }

  test("joinSizeProfile: predicted cardinality is EXACT, orphans split") {
    val l = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("x", 5))
      .toDF("k", "v") // a:3 b:1, x orphan-left
    val r = Seq(("a", 1), ("a", 2), ("b", 1), ("y", 9), ("z", 9))
      .toDF("k", "v") // a:2 b:1, y z orphan-right
    val p = Analytics.joinSizeProfile(l, r, "k", "k").head
    assert(p.getAs[Long]("n_keys_left") == 3L)
    assert(p.getAs[Long]("n_keys_right") == 4L)
    assert(p.getAs[Long]("n_keys_matched") == 2L)
    assert(p.getAs[Long]("rows_left") == 5L &&
      p.getAs[Long]("rows_right") == 5L)
    // a: 3·2 = 6, b: 1·1 = 1 → 7; the real join agrees
    assert(p.getAs[Long]("predicted_rows") == 7L)
    assert(p.getAs[Long]("max_key_out") == 6L)
    assert(l.join(r, Seq("k")).count() == 7L)
    // null keys never pair (inner-join semantics)
    val ln = Seq((Some("a"), 1), (None, 2)).toDF("k", "v")
    assert(Analytics.joinSizeProfile(ln, ln, "k", "k").head
      .getAs[Long]("predicted_rows") == 1L)
  }

  test("rrfFuse: both-list docs outrank single-list, absent adds zero") {
    // query 1: A ranks d1=1, d2=2; B ranks d2=1, d3=2 →
    //   d2: 1/62 + 1/61, d1: 1/61, d3: 1/62 → d2 first, then d1, d3
    val a = Seq((1L, "d1", 1L), (1L, "d2", 2L)).toDF("q", "d", "rank")
    val b = Seq((1L, "d2", 1L), (1L, "d3", 2L)).toDF("q", "d", "rank")
    val got = Analytics.rrfFuse(a, b, "q", "d", "rank", 60, 10)
      .collect().map(r => r.getAs[String]("d") ->
        ((r.getAs[Long]("fused_rank"), r.getAs[Double]("rrf")))).toMap
    assert(got("d2") == ((1L, 1.0 / 62 + 1.0 / 61)))
    assert(got("d1") == ((2L, 1.0 / 61)))
    assert(got("d3") == ((3L, 1.0 / 62)))
    // identical scores tie-break on doc id
    val t = Analytics.rrfFuse(
      Seq((1L, "z", 1L), (1L, "y", 1L)).toDF("q", "d", "rank").filter($"d" === "z"),
      Seq((1L, "y", 1L)).toDF("q", "d", "rank"),
      "q", "d", "rank", 60, 10).collect()
      .map(r => r.getAs[String]("d") -> r.getAs[Long]("fused_rank")).toMap
    assert(t == Map("y" -> 1L, "z" -> 2L)) // equal 1/61 → y < z
  }

  test("stateRuns: RLE islands split on state change, not time gaps") {
    val rows = Seq(
      (1L, 0L, 1L, "up"), (1L, 10L, 2L, "up"), (1L, 900L, 3L, "up"),
      (1L, 901L, 4L, "down"), (1L, 902L, 5L, "up"), // up again → NEW run
      (2L, 0L, 6L, "down"))
    val df = rows.toDF("user_id", "secs", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val got = graft.operators.Sessions
      .stateRuns(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id")) ->
        ((r.getAs[String]("state"), r.getAs[Long]("n_events"),
          r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))).toMap
    // user 1: up×3 (huge time gap does NOT split), down×1, up×1
    assert(got((1L, 1L)) == (("up", 3L, 0L, 900000000L)))
    assert(got((1L, 2L)) == (("down", 1L, 901000000L, 901000000L)))
    assert(got((1L, 3L)) == (("up", 1L, 902000000L, 902000000L)))
    assert(got((2L, 1L)) == (("down", 1L, 0L, 0L)))
    assert(got.size == 4)
  }

  test("timeWeightedAvg: step interpolation beats burst-skewed mean") {
    // gauge at 100 for 90µs, then burst-sampled at 0 ten times over
    // 10µs: unweighted mean ≈ 9, but the gauge spent 90% of the span
    // at 100 → TWA = 90
    val rows = (Seq((0L, 100L)) ++ (1L to 10L).map(i => (90L + i, 0L)))
      .zipWithIndex.map { case ((us, c), i) => ("g", us, i.toLong, c) }
    val df = rows.toDF("k", "us", "tie", "cents")
    val r = graft.operators.TimeSeries
      .timeWeightedAvg(df, "k", "us", "tie", "cents").head
    assert(r.getAs[Long]("n_samples") == 11L)
    assert(r.getAs[Long]("span_us") == 100L)
    // wsum = 100·(91−0) + 0·… = 9100 → 9100/100 = 91.0 (the first
    // sample holds until the FIRST burst sample at 91)
    assert(r.getAs[Double]("twa") == 91.0)
    // single sample: zero span → null, not a division blow-up
    val one = graft.operators.TimeSeries
      .timeWeightedAvg(Seq(("s", 5L, 1L, 7L)).toDF("k", "us", "tie", "cents"),
        "k", "us", "tie", "cents").head
    assert(one.isNullAt(one.fieldIndex("twa")))
  }

  test("latenessProfile: lateness vs running high-water mark, delay cuts") {
    // arrival order 1..5; event times: 100, 50 (late 50), 200,
    // 199 (late 1), 300 → n_late 2, max 50; delay>10 drops only the 50
    val df = Seq(("k", 100L, 1L), ("k", 50L, 2L), ("k", 200L, 3L),
      ("k", 199L, 4L), ("k", 300L, 5L))
      .toDF("k", "us", "arr")
    val r = graft.operators.TimeSeries
      .latenessProfile(df, "k", "us", "arr", Seq(10L)).head
    assert(r.getAs[Long]("n_events") == 5L)
    assert(r.getAs[Long]("n_late") == 2L)
    assert(r.getAs[Long]("max_late_us") == 50L)
    assert(r.getAs[Long]("n_late_gt_10") == 1L)
  }

  test("funnelSteps: strict sequential chaining, monotone survivors") {
    val ev = Seq(
      // u1 full chain in order
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      // u2: click BEFORE any view → stops at view
      (2L, 10L, 4L, "click"), (2L, 20L, 5L, "view"),
      // u3: view then purchase, never clicked → stops after view
      (3L, 10L, 6L, "view"), (3L, 20L, 7L, "purchase"),
      // u4: purchase, then view, then click → reaches click, not purchase
      (4L, 5L, 8L, "purchase"), (4L, 10L, 9L, "view"), (4L, 20L, 10L, "click"))
      .toDF("user_id", "us", "event_id", "event_type")
    val got = Analytics.funnelSteps(ev, "user_id", "us", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[String]("step") ->
        r.getAs[Long]("n_users")).toMap
    assert(got == Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L))
  }

  test("runsTest: alternating → many runs (z>0), blocks → few (z<0)") {
    // distinct values, odd count: the discrete median is the last
    // small value (dropped as a tie), leaving 20 perfectly
    // alternating rows → runs = 20
    val alt = (1 to 21).map(i =>
      (f"d$i%02d", if (i % 2 == 1) i.toLong else 100L + i)).toDF("day", "v")
    val ra = graft.operators.TimeSeries.runsTest(alt, "day", "v").head
    assert(ra.getAs[Long]("n_pos") == 10L && ra.getAs[Long]("n_neg") == 10L)
    assert(ra.getAs[Long]("n_runs") == 20L)
    assert(ra.getAs[Double]("z") > 3.0)
    // two solid blocks (median row dropped): exactly 2 runs
    val blk = (1 to 21).map(i =>
      (f"d$i%02d", if (i <= 10) i.toLong else 100L + i)).toDF("day", "v")
    val rb = graft.operators.TimeSeries.runsTest(blk, "day", "v").head
    assert(rb.getAs[Long]("n_runs") == 2L)
    assert(rb.getAs[Double]("z") < -3.0)
    // ties to the median are dropped (standard convention)
    val tie = Seq(("d1", 5L), ("d2", 5L), ("d3", 1L), ("d4", 9L))
      .toDF("day", "v")
    val rt = graft.operators.TimeSeries.runsTest(tie, "day", "v").head
    assert(rt.getAs[Long]("n_pos") + rt.getAs[Long]("n_neg") == 2L)
  }

  test("theilSen: outlier day cannot drag the median slope") {
    // y = 3x exactly, except one wild outlier at x=9: 36 of 45 pair
    // slopes are exactly 3 → the median is exactly 3.0 (OLS is not)
    val pts = (0L to 9L).map(x =>
      (x, if (x == 9) 1000L else 3 * x)).toDF("x", "y")
    val r = graft.operators.TimeSeries.theilSen(pts.repartition(4), "x", "y")
      .head
    assert(r.getAs[Long]("n_pairs") == 45L)
    assert(r.getAs[Double]("slope") == 3.0)
  }

  test("kaplanMeier: textbook hand case, censoring convention, " +
    "partition independence") {
    // durations 1e, 2e, 3c, 4e, 5c → S: 4/5, then ·3/4, then ·1/2
    val subj = Seq((1L, true), (2L, true), (3L, false), (4L, true),
      (5L, false)).toDF("dur", "ev")
    val got = graft.operators.TimeSeries.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("d"),
          r.getAs[Double]("s")))).toMap
    assert(got.keySet == Set(1L, 2L, 4L)) // censored times emit no row
    assert(got(1L) == ((5L, 1L, 0.8)))
    assert(got(2L) == ((4L, 1L, 0.6)))
    assert(got(4L) == ((2L, 1L, 0.3)))
    // tie convention: a censoring AT an event time is still at risk
    val tie = Seq((2L, true), (2L, false), (1L, true), (3L, false))
      .toDF("dur", "ev")
    val g2 = graft.operators.TimeSeries.kaplanMeier(tie, "dur", "ev")
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Long]("n_risk")).toMap
    assert(g2 == Map(1L -> 4L, 2L -> 3L))
    // bit-identical at any parallelism
    val a = graft.operators.TimeSeries.kaplanMeier(subj.repartition(4),
      "dur", "ev").collect().map(_.toSeq).toSet
    val b = graft.operators.TimeSeries.kaplanMeier(subj, "dur", "ev")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

}
