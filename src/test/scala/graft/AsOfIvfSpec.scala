package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Similarity}

class AsOfIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (2L, 100L, ts("2024-01-01 10:00:00")), // exactly at quote q1
      (3L, 100L, ts("2024-01-01 09:59:00")), // before any quote
      (4L, 200L, ts("2024-01-01 10:00:10"))
    ).toDF("trade_id", "acct", "t_ts")
    val quotes = Seq(
      (10L, 100L, ts("2024-01-01 10:00:00"), 1.5),
      (11L, 100L, ts("2024-01-01 10:00:04"), 2.5),
      (12L, 100L, ts("2024-01-01 10:00:06"), 3.5), // after trade 1
      (13L, 300L, ts("2024-01-01 09:00:00"), 9.9)  // other key
    ).toDF("quote_id", "acct", "q_ts", "px")
    val out = AsOf.asOfJoin(trades, quotes, Seq("acct"), "t_ts", "q_ts",
        Seq("quote_id", "px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("asof_quote_id")).map(_.toLong)).toMap
    assert(out(1L) == Some(11L)) // latest ≤ 10:00:05
    assert(out(2L) == Some(10L)) // tie: at-or-before is inclusive
    assert(out(3L) == None)      // nothing before → null
    assert(out(4L) == None)      // key 200 has no quotes
  }

  test("native AsOfJoinExec ≡ declarative union+window as-of join") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicksDecl = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value")
    val clicksNat = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"),
        $"event_id".as("c_event_id"), $"value".as("c_value"))

    val decl = graft.operators.AsOf.asOfJoin(purchases, clicksDecl,
        Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
      .select($"event_id", $"asof_event_id".as("m"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m"))).toMap
    val nat = graft.plans.AsOfNative.asOfJoin(purchases, clicksNat,
        "user_id", "c_user", "ts", "c_ts")
      .select($"event_id", $"c_event_id".as("m"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m"))).toMap
    assert(nat == decl)
    assert(nat.values.exists(_.isEmpty)) // some purchases precede any click
    assert(nat.values.exists(_.nonEmpty))
    // the physical plan is the custom exec, not a window rewrite
    val plan = graft.plans.AsOfNative.asOfJoin(purchases, clicksNat,
      "user_id", "c_user", "ts", "c_ts").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
  }

  test("TopKBy aggregate ≡ window ranking, including tie-breaks") {
    val e = table(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter($"vec_id" % 100 === 0)
    val win = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nn_id"), r.getAs[Double]("cos"))).toSet
    val agg = Similarity.bruteForceTopKAgg(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nn_id"), r.getAs[Double]("cos"))).toSet
    assert(win == agg)
    // explicit tie-break: equal scores keep the smaller id first
    val tied = Seq((1L, 1.0, 10L), (1L, 1.0, 7L), (1L, 0.5, 3L))
      .toDF("g", "score", "id")
      .groupBy($"g")
      .agg(graft.plans.TopKBy.topkBy($"score", $"id", 2).as("top"))
      .select(explode($"top").as("t")).select($"t.id").collect()
      .map(_.getLong(0)).toSeq
    assert(tied == Seq(7L, 10L))
  }

  test("kmeansTrain: inertia shrinks with iterations; trained centroids feed IVF") {
    import spark.implicits._
    val emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    def inertia(iters: Int): Double =
      graft.operators.Similarity
        .kmeansTrain(emb, "vec_id", "embedding", 8, iters)
        .agg(org.apache.spark.sql.functions.sum($"inertia")).head.getDouble(0)
    val i1 = inertia(1)
    val i5 = inertia(5)
    assert(i5 <= i1 * 1.0000001, s"inertia grew: $i1 -> $i5")
    // deterministic across input partitionings (same init, same cells)
    val a = graft.operators.Similarity
      .kmeansTrain(emb, "vec_id", "embedding", 8, 3)
      .select($"cid", $"n_assigned").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.operators.Similarity
      .kmeansTrain(emb.repartition(13), "vec_id", "embedding", 8, 3)
      .select($"cid", $"n_assigned").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // trained centroids slot straight into ivfTopK
    val cents = graft.operators.Similarity
      .kmeansTrain(emb, "vec_id", "embedding", 8, 3)
      .select($"cid".as("vec_id"), $"centroid".as("embedding"))
    val nn = graft.operators.Similarity.ivfTopK(
      emb, emb.limit(5), cents, "vec_id", "embedding", 3, 3)
    assert(nn.count() == 15)
  }

  test("kmeansFixedTrain: bit-identical across partitionings; inertia shrinks") {
    import spark.implicits._
    val emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame, iters: Int) =
      graft.operators.Similarity
        .kmeansFixedTrain(df, "vec_id", "embedding", 8, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // integer arithmetic ⇒ the FULL result (counts, inertia, centroid
    // digest) is bit-identical under repartitioning — the property the
    // hash gate rides; float kmeansTrain only promises count equality
    assert(run(emb, 3) == run(emb.repartition(13), 3))
    // Lloyd still descends in the integer formulation
    def inertia(iters: Int): Long =
      graft.operators.Similarity
        .kmeansFixedTrain(emb, "vec_id", "embedding", 8, iters)
        .agg(org.apache.spark.sql.functions.sum($"inertia")).head.getLong(0)
    assert(inertia(3) <= inertia(1))
  }

  test("pqFixedEncode: bit-identical code table across partitionings") {
    import spark.implicits._
    val emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity
        .pqFixedEncode(df, "vec_id", "embedding", 8, 16, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val a = run(emb)
    // m codes per vector, codes within [0, k)
    assert(a.size == emb.count() * 8)
    assert(a.forall { case (_, sb, c) => sb >= 0 && sb < 8 && c >= 0 && c < 16 })
    // integer Lloyd ⇒ bit-identical under repartitioning — the hash
    // gate's property (float pqTrain only promises recall)
    assert(a == run(emb.repartition(13)))
  }

  test("IVF probes recover most of brute-force top-k (recall)") {
    val e = table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" % 100 === 0) // 5 queries
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    val ivf = Similarity.ivfTopK(e, queries,
        e.filter($"vec_id" % 100 === 50), // 5 centroids
        "vec_id", "embedding", 5, 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall implausibly low for 2/5 cells")
    assert(ivf.nonEmpty)
  }

  test("int8 quantization: codes in range, roundtrip error ≤ half a step") {
    val e = table(spark, "/root/testdata/sf0.001", "embeddings")
    val codes = Similarity.quantizeInt8(e, "vec_id", "embedding")
    val mm = codes.agg(min($"code"), max($"code")).head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 255L)
    // per-dim roundtrip: |mn + code·scale − x| ≤ scale/2 (+fp slack)
    val flat = e.select($"vec_id".as("id"),
      posexplode(Similarity.toDouble($"embedding")).as(Seq("pos", "x")))
    val st = flat.groupBy($"pos").agg(min($"x").as("mn"), max($"x").as("mx"))
    val bad = codes.join(flat, Seq("id", "pos")).join(st, "pos")
      .withColumn("scale", ($"mx" - $"mn") / 255.0)
      .filter($"mx" =!= $"mn" &&
        abs($"mn" + $"code" * $"scale" - $"x") > $"scale" * 0.5 + 1e-12)
      .count()
    assert(bad == 0L, s"$bad elements beyond half-step roundtrip error")
  }

  test("quantized scan + exact rerank recovers brute-force top-k") {
    val e = table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    val quant = Similarity.quantizedTopK(e, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    assert(quant.size == exact.size)
    val recall = (exact & quant).size.toDouble / exact.size
    // 8-bit codes + 4k-candidate rerank: near-perfect recall expected
    assert(recall >= 0.9, s"quantized recall $recall below 0.9")
    // survivors' exact scores match brute force (rerank IS exact)
    val exactScores = Similarity.bruteForceTopK(e, queries, "vec_id",
        "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id")) ->
        r.getAs[Double]("cos")).toMap
    Similarity.quantizedTopK(e, queries, "vec_id", "embedding", 5)
      .collect().foreach { r =>
        val k = (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))
        exactScores.get(k).foreach { s =>
          assert(math.abs(r.getAs[Double]("cos") - s) < 1e-9)
        }
      }
  }

  test("PQ: codebooks train deterministically; codes in range; ADC recall") {
    val e = table(spark, "/root/testdata/sf0.001", "embeddings")
    val books = Similarity.pqTrain(e, "vec_id", "embedding",
      m = 8, k = 16, iters = 3)
    // 8 subspaces × 16 cells, 8-dim centroids
    assert(books.length == 8 * 16)
    assert(books.forall(_._3.length == 8))
    // training is a pure function of the data (content-keyed init)
    val again = Similarity.pqTrain(e.repartition(7), "vec_id", "embedding",
      m = 8, k = 16, iters = 3)
    books.zip(again).foreach { case ((s1, c1, v1), (s2, c2, v2)) =>
      assert(s1 == s2 && c1 == c2)
      v1.zip(v2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
    // codes: one per subspace, all within [0, k)
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", books)
    assert(enc.count() == e.count())
    val offRange = enc.select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" >= 16).count()
    assert(offRange == 0L)
    // ADC + exact rerank on the SYNTHETIC-NOISE embeddings: the test
    // vectors have no neighborhood structure (pairwise cosine ≈
    // N(0, 0.125), top-5 ≈ 0.3), which is the worst case for a 32×-
    // compressed code — a numpy reference implementation achieves
    // ~0.56 recall at rerank 4× and ~0.8 at 10× on this data. Assert
    // the 10× regime with margin.
    val queries = e.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    val pq = Similarity.pqTopK(e, queries, "vec_id", "embedding", books, 5,
        rerankFactor = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    assert(pq.size == exact.size)
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall $recall below 0.6 (noise-floor data)")
  }

  test("PQ on clustered vectors: near-perfect recall once candidates cover the cluster") {
    // 10 well-separated centers (40 members each) + small noise — PQ
    // codes nail the CLUSTER but quantize away the within-cluster
    // noise, so candidates must cover the ~40-member cluster for the
    // exact rerank to resolve the top-5: rerank 10×·k = 50 ⊇ 40.
    // Deterministic congruential 'noise' keeps the test reproducible.
    val rows = (0 until 400).map { i =>
      val c = i % 10
      val v = (0 until 64).map { j =>
        val center = if (j % 10 == c) 1.0 else 0.0
        val h = ((i * 131 + j * 31) % 97) / 97.0 - 0.5
        (center + 0.15 * h).toFloat
      }
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(df, "vec_id", "embedding",
      m = 8, k = 16, iters = 5)
    val queries = df.filter($"vec_id" % 80 === 0) // 5 queries
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    val pq = Similarity.pqTopK(df, queries, "vec_id", "embedding", books, 5,
        rerankFactor = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.9, s"PQ recall $recall below 0.9 on clustered data")
  }

  test("jlProject: integer-exact, partition-independent, JL distance band") {
    val rows = (0 until 200).map { i =>
      val v = (0 until 64).map(j =>
        (((i * 131 + j * 31) % 97) / 97.0 - 0.5).toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = Similarity.jlProject(df, "vec_id", "embedding", 16)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("j")) ->
        r.getAs[Long]("y")).toMap
    assert(proj.size == 200 * 16)
    // bit-identical under repartition
    val re = Similarity.jlProject(df.repartition(7), "vec_id", "embedding", 16)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("j")) ->
        r.getAs[Long]("y")).toMap
    assert(re == proj)
    // JL lemma sanity: E‖Δy‖² = k·‖Δc‖² on the centered int8 grid —
    // the MEAN ratio over many pairs lands near 1 (±1 signs,
    // k=16 → wide per-pair variance, tight mean)
    val codes = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("pos")) ->
        (r.getAs[Long]("code") - 128L)).toMap
    val ratios = for (a <- 0L until 40L; b <- (a + 1) to 40L) yield {
      val d2c = (0L until 64L).map(p =>
        math.pow((codes((a, p)) - codes((b, p))).toDouble, 2)).sum
      val d2y = (0L until 16L).map(j =>
        math.pow((proj((a, j)) - proj((b, j))).toDouble, 2)).sum
      d2y / (16.0 * d2c)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean ratio $mean outside band")
  }

  test("intrinsicDimension: recovers the manifold dimension, not the " +
    "ambient one") {
    // seeded Random: a hash affine in the dim index makes "independent"
    // coordinates perfectly correlated (the estimator caught exactly
    // that in an earlier draft of this test — the plane WAS a line)
    val rnd = new scala.util.Random(11)
    // 1-D manifold (a curve) embedded in 16 dims
    val line = (0 until 400).map { i =>
      val t = rnd.nextDouble()
      (i.toLong, 0L, (0 until 16).map(j =>
        if (j == 0) t.toFloat else 0f))
    }.toDF("vec_id", "label", "embedding")
    val d1 = Similarity.intrinsicDimension(line, "vec_id", "embedding",
      "label").head.getAs[Double]("id_mle")
    assert(d1 > 0.6 && d1 < 1.5, s"line ID $d1 not ≈ 1")
    // 2-D manifold in 16 dims
    val plane = (0 until 400).map { i =>
      (i.toLong, 0L, (0 until 16).map(j =>
        if (j <= 1) rnd.nextDouble().toFloat else 0f))
    }.toDF("vec_id", "label", "embedding")
    val d2 = Similarity.intrinsicDimension(plane, "vec_id", "embedding",
      "label").head.getAs[Double]("id_mle")
    assert(d2 > 1.4 && d2 < 2.8, s"plane ID $d2 not ≈ 2")
    assert(d2 > d1)
  }

  test("incrementalTopK ≡ full recompute over the union corpus") {
    val mk = (ids: Range, salt: Int) => ids.map { i =>
      (i.toLong, (0 until 16).map(j =>
        ((((i * 131 + j * 977 + salt) * 2654435761L) % 4096 + 4096) % 4096
          / 4096.0 - 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val old = mk(0 until 120, 0)
    val batch = mk(1000 until 1060, 7)
    val queries = mk(0 until 120, 0).filter(col("vec_id") % 17 === 0)
    val inc = Similarity.incrementalTopK(old, batch, queries,
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("nn_id"), r.getAs[Double]("cos")))).toMap
    val full = Similarity.bruteForceTopKAgg(old.union(batch), queries,
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("nn_id"), r.getAs[Double]("cos")))).toMap
    assert(inc == full)
    assert(inc.keys.map(_._1).toSet.size == 8) // all 8 queries served
  }

  test("annRecall: identity → 1, disjoint → 0, partial counted exactly") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("q_id", "nn_id")
    val same = Similarity.annRecall(exact, exact).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("recall")).toMap
    assert(same == Map(1L -> 1.0, 2L -> 1.0))
    val approx = Seq((1L, 10L), (1L, 99L), (1L, 12L), (2L, 98L), (2L, 97L))
      .toDF("q_id", "nn_id")
    val got = Similarity.annRecall(exact, approx).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("recall")))).toMap
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
  }

  test("powerIterationFixed: finds the correlated block, bit-identical " +
    "under repartition") {
    // dims 0..7 carry one shared signal (perfectly correlated block),
    // dims 8..15 independent noise — the dominant eigenvector must
    // concentrate on the block (quantization equalizes per-dim RANGES,
    // so only correlation structure can win)
    val rows = (0 until 300).map { i =>
      val s = ((i * 131) % 97) / 97.0 - 0.5
      val v = (0 until 16).map { j =>
        if (j < 8) s.toFloat
        else {
          // hashed noise — decorrelated across dims (a plain LCG in j
          // leaks cross-dim structure that rivals the signal block)
          val h = ((i.toLong * 1000003L + j) * 2654435761L) % 4096L
          (((h + 4096L) % 4096L) / 4096.0 - 0.5).toFloat
        }
      }
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.powerIterationFixed(df, "vec_id", "embedding", 5)
      .collect().map(r => r.getAs[Long]("pos") -> r.getAs[Long]("v")).toMap
    assert(got.size == 16)
    val blockMin = (0L to 7L).map(p => math.abs(got(p))).min
    val noiseMax = (8L to 15L).map(p => math.abs(got(p))).max
    assert(blockMin > 3 * noiseMax,
      s"block components $blockMin not dominant over noise $noiseMax")
    // renormalization pins the largest |component| at exactly 1e6
    assert(got.values.map(math.abs).max == 1000000L)
    val re = Similarity.powerIterationFixed(df.repartition(7), "vec_id",
        "embedding", 5)
      .collect().map(r => r.getAs[Long]("pos") -> r.getAs[Long]("v")).toMap
    assert(re == got)
  }
}
