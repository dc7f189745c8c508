package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions

/** Embedding similarity search (SURVEY.md §2.E5-E7).
  *
  * Scale design: the corpus side is NEVER shuffled or collected — it is
  * scanned once per search. The (small) query side is broadcast. The
  * LSH variant replaces the full scan with an equi-join on bucket
  * signatures, turning top-k search into a partitioned hash join that
  * scales to billions of vectors.
  */
object Similarity {

  /** Cast a float embedding to double once; all arithmetic then runs in
    * double on both the Spark and oracle side (bit-identical folds).
    */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Pair-work budget for the quadratic-by-design samplers
    * ([[knnClassifyEval]], [[hardNegatives]], [[silhouetteEval]],
    * [[intrinsicDimension]]): when the caller leaves `queryMod` at its
    * auto default (0), the sampling modulus is derived so that the
    * sample×corpus pair count stays ≤ this budget — total quadratic
    * work is then BOUNDED (≈ budget pairs) at any corpus size, and the
    * remaining linear passes dominate; a caller who never read the
    * scaladoc can no longer launch a 100 TB × 20 TB pair scan by
    * default. 2·10⁷ pairs ≈ a second of sqDist kernels at dim 64 on
    * one core — an evaluation-precision budget, not a capacity limit;
    * pass an explicit `queryMod` to trade cost for sample size.
    */
  val SamplerPairBudget: Long = 20000000L

  /** mod = max(1, ⌈pairs / budget⌉) in exact integer arithmetic —
    * mirrored verbatim in the DuckDB oracles as
    * `greatest(1, (pairs + budget-1) // budget)`, so the auto-sampled
    * gate queries stay hash-identical on both engines at any sf.
    * `pairs` is n² for the broadcast samplers (every query ranks
    * against the full corpus) and Σ n_blk² for the block-joined ones.
    */
  def autoQueryMod(pairs: Long, budget: Long = SamplerPairBudget): Long = {
    require(pairs >= 0 && budget >= 1,
      s"autoQueryMod: pairs=$pairs budget=$budget out of range")
    // Long throughout: at pairs > budget·Int.MaxValue (corpus ≥ ~2.1e8
    // rows, inside resolveQueryMod's n < 3e9 guard) an Int modulus would
    // silently wrap — possibly to 0 (pmod → null drops every row) —
    // while the DuckDB oracle computes it exactly in BIGINT.
    math.max(1L, (pairs + budget - 1) / budget)
  }

  /** Resolve a sampler's queryMod: explicit (> 0) wins; 0 = auto from
    * the corpus count (one cheap map-combined job). n is bounded so n²
    * stays an exact Long.
    */
  private def resolveQueryMod(queryMod: Int, df: DataFrame): Long =
    if (queryMod > 0) queryMod.toLong
    else {
      val n = df.count()
      require(n < 3000000000L,
        s"auto queryMod: corpus count $n overflows the exact n² bound")
      autoQueryMod(n * n)
    }

  /** Realized sampling parameters of the id-mod budgeted samplers
    * ([[knnClassifyEval]] / [[hardNegatives]] / [[silhouetteEval]])
    * over a corpus: (n_corpus, mod, n_query_sampled, pairs) with the
    * EXACT resolveQueryMod arithmetic. VERDICT r11 #4: bench artifacts
    * record these so cross-window variance on the sampler family is
    * attributable — window drift (same pairs, different time) vs
    * data-dependent work (different pairs).
    */
  def samplerStats(df: DataFrame, idCol: String,
                   queryMod: Int = 0): (Long, Long, Long, Long) = {
    val n = df.count()
    val mod =
      if (queryMod > 0) queryMod.toLong
      else {
        require(n < 3000000000L,
          s"samplerStats: corpus count $n overflows the exact n² bound")
        autoQueryMod(n * n)
      }
    val q =
      if (mod == 1L) n
      else df.filter(pmod(col(idCol).cast("long"), lit(mod)) === 0)
        .count()
    (n, mod, q, q * n)
  }

  /** [[samplerStats]] for the block-joined sampler
    * ([[intrinsicDimension]]): the pair space is Σ n_blk² (the actual
    * equi-join output), the modulus derives from it, and the realized
    * pair count is Σ over blocks of n_sampled_blk · n_blk.
    */
  def blockSamplerStats(df: DataFrame, idCol: String, blockCol: String,
                        queryMod: Int = 0): (Long, Long, Long, Long) = {
    val blocks = df.select(col(idCol).as("id"), col(blockCol).as("blk"))
    val full = blocks.groupBy(col("blk")).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") * col("n")), lit(0L)).as("p"),
        coalesce(sum(col("n")), lit(0L)).as("nt"))
      .head()
    val (pairSpace, n) = (full.getLong(0), full.getLong(1))
    val mod =
      if (queryMod > 0) queryMod.toLong else autoQueryMod(pairSpace)
    if (mod == 1L) (n, 1L, n, pairSpace)
    else {
      val s = blocks
        .withColumn("sampled",
          when(pmod(col("id").cast("long"), lit(mod)) === 0, 1L)
            .otherwise(0L))
        .groupBy(col("blk"))
        .agg(count(lit(1)).as("n"), sum(col("sampled")).as("q"))
        .agg(coalesce(sum(col("q")), lit(0L)).as("qt"),
          coalesce(sum(col("q") * col("n")), lit(0L)).as("pp"))
        .head()
      (n, mod, s.getLong(0), s.getLong(1))
    }
  }

  /** Per-row data-bound guard for the packed-key samplers, FOLDED INTO
    * the corpus projection of the main job (round-9 verdict: the eager
    * `agg().head` guard was a second linear corpus scan per call, paid
    * even when the result plan was never executed). Per-row validation
    * is sufficient: a pair's d2 ≤ max over its two rows of
    * dim·(2·mabs)² (mabs_q + mabs_c ≤ 2·max of the two), so each row
    * checks its own worst case against the worst possible id pack−1.
    * The guard rides the quantized-vector column BELOW the pair join —
    * evaluated once per corpus row inside the single scan, never per
    * pair, zero extra jobs.
    */
  private def packGuard(op: String, cid: Column, cv: Column,
                        pack: Double, idBits: Int): Column = {
    val mabs = aggregate(transform(cv, x => abs(x)), lit(0d),
      (acc, x) => greatest(acc, x))
    val d2Bound = size(cv).cast("double") * (mabs * 2) * (mabs * 2)
    when(cid < 0 || cid >= pack,
      raise_error(concat(lit(s"$op: id "), cid.cast("string"),
        lit(s" exceeds idBits=$idBits (must be in " +
          s"[0, ${pack.toLong}))"))).cast("array<double>"))
      .when(d2Bound * pack + (pack - 1) >= math.pow(2, 53),
        raise_error(concat(lit(s"$op: worst-case packed key "),
          (d2Bound * pack + (pack - 1)).cast("string"),
          lit(" exceeds 2^53 — lower idBits or rescale the " +
            "embeddings"))).cast("array<double>"))
      .otherwise(cv)
  }

  /** [[packGuard]]'s un-packed sibling for [[silhouetteEval]]: the
    * per-row worst-case d2 must fit the BIGINT-safe product bound.
    */
  private def d2Guard(op: String, cv: Column, maxD2: Double): Column = {
    val mabs = aggregate(transform(cv, x => abs(x)), lit(0d),
      (acc, x) => greatest(acc, x))
    val d2Bound = size(cv).cast("double") * (mabs * 2) * (mabs * 2)
    when(d2Bound > maxD2,
      raise_error(concat(lit(s"$op: worst-case d2 "),
        d2Bound.cast("string"),
        lit(s" exceeds the BIGINT-safe bound $maxD2 — lower `scale` " +
          "or rescale the embeddings"))).cast("array<double>"))
      .otherwise(cv)
  }

  /** Dot product — native one-pass codegen expression (plans.DotProduct).
    * [[dotComposed]] is the same fold via zip_with + aggregate, kept as
    * the executable spec: higher-order functions evaluate interpreted
    * with a per-pair array allocation, which IS the runtime for
    * pairwise similarity (NativeExprSpec asserts bit-equality).
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorFunctions.dotProduct(a, b)

  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(c: Column): Column = sqrt(dot(c, c))

  def l2NormComposed(c: Column): Column =
    sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** E6: brute-force cosine top-k. `queries` is broadcast (it must be
    * the small side); corpus norms are computed inline in the single
    * scan. Ranking is deterministic: cosine desc, then neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms are computed ONCE per vector (not per pair): at 1e9 corpus ×
    // 1e3 queries that is the difference between 64e12 and 64e9 mults
    val c = corpus.select(col(idCol).as("nn_id"),
      toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("q_id"),
      toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q), col("q_id") =!= col("nn_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** Sign-random-projection bucket signature: one bit per hyperplane.
    * Hyperplane p's weight at dimension d is ±1 from a deterministic
    * integer mix ((d*31 + p*17) mod 7 < 3) — reproducible everywhere,
    * no RNG state to ship to executors.
    */
  def srpBucket(vec: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = (0 until dims).map { d =>
        val w = if ((d * 31 + p * 17) % 7 < 3) 1.0 else -1.0
        element_at(vec, d + 1) * w
      }.reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, x) => a.bitwiseOR(x))
  }

  /** E7: LSH-bucketed ANN — candidates share the SRP bucket (equi-join),
    * then exact cosine rerank + top-k within candidates. Recall is
    * traded for never scanning the corpus per query; multi-probe can be
    * layered by unioning query buckets.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int, dims: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"),
      toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes, dims))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("q_id"),
      toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), planes, dims))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** E6 via the custom bounded-heap aggregate (plans.TopKBy): identical
    * output to [[bruteForceTopK]], but ranking needs no per-group sort
    * and PARTIALLY aggregates map-side — each map task ships ≤ k
    * candidates per query across the shuffle instead of the whole
    * scored corpus partition.
    */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"),
      toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("q_id"),
      toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q), col("q_id") =!= col("nn_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scored.groupBy(col("q_id"))
      .agg(graft.plans.TopKBy.topkBy(col("cos"), col("nn_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("nn_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.score"), 4).as("cos"))
  }

  /** Squared L2 distance — native (plans.SqDist), same left fold. */
  def sqDist(a: Column, b: Column): Column =
    graft.plans.VectorFunctions.sqDist(a, b)

  def sqDistComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, x) => acc + x)

  /** E7b: IVF (inverted-file) ANN — the other classic scale path.
    * Corpus vectors are assigned once to their nearest centroid (an
    * inverted index, partitioned by cell); each query probes only its
    * `nprobe` nearest cells and reranks exactly within them. Centroids
    * are broadcast both times; the corpus is scanned once for
    * assignment and once per search — never pairwise against queries.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nprobe: Int): DataFrame = {
    val cent = centroids.select(col(idCol).as("cid"),
      toDouble(col(vecCol)).as("centv"))
    val c = corpus.select(col(idCol).as("nn_id"),
      toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("q_id"),
      toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))

    // inverted index: corpus row → nearest centroid (one pass, k small)
    val assigned = c.join(broadcast(cent), lit(true))
      .withColumn("dist", sqDist(col("cv"), col("centv")))
      .groupBy(col("nn_id"))
      .agg(min_by(col("cid"), col("dist")).as("cell"),
        first(col("cv")).as("cv"), first(col("cn")).as("cn"))

    // query → its nprobe nearest cells
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("dist"), col("cid"))
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("dist", sqDist(col("qv"), col("centv")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("cid").as("cell"))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** E7c: k-means training for the IVF index (Lloyd's algorithm) —
    * how `ivfTopK`'s centroids are PRODUCED at scale. Per iteration:
    * one distributed pass assigns every vector to its nearest centroid
    * (k codegen'd sq_dist evaluations against broadcast literals —
    * the corpus never shuffles for the assignment), then the per-cell
    * per-dimension means are aggregated down to k·dim scalars; only
    * those cross the driver between iterations. Init is deterministic
    * content-keyed sampling (k lowest xxhash64 ids), so training is
    * reproducible across runs and partitionings (up to fp-summation
    * last bits; asserted in AsOfIvfSpec).
    *
    * @return (cid, centroid array<double>, n_assigned, inertia) — one
    *         row per cell from the FINAL assignment.
    */
  def kmeansTrain(corpus: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = corpus.select(col(idCol).as("id"),
        toDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic init: k lowest-hash vectors, cids in id order
      var cents: Array[(Int, Seq[Double])] = vecs
        .orderBy(xxhash64(col("id")), col("id")).limit(k)
        .orderBy(col("id")).collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1)) }

      def assign(cs: Array[(Int, Seq[Double])]) = {
        // argmin via array_position(dists, array_min(dists)) − 1: first
        // index achieving the min ≡ the old min-(distance, cid) struct
        // ordering (cs is cid-ordered), but with no struct comparator —
        // struct-compare codegen hits a janino bug ("redefinition of
        // r") and silently falls back to interpreted projection
        val dists = array(cs.sortBy(_._1).map { case (_, cv) =>
          sqDist(col("v"), typedLit(cv)) }: _*)
        vecs.withColumn("__d", dists)
          .select(col("id"), col("v"),
            (array_position(col("__d"), array_min(col("__d"))) - 1)
              .cast("int").as("cid"),
            array_min(col("__d")).as("d"))
      }

      for (_ <- 1 to iters) {
        val sums = assign(cents)
          .select(col("cid"), posexplode(col("v")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
          .collect() // k·dim tiny rows — the only driver traffic
        val byCell = sums.groupBy(_.getInt(0))
        cents = cents.map { case (cid, old) =>
          byCell.get(cid) match {
            case Some(rows) =>
              val dim = rows.map(r =>
                r.getInt(1) -> r.getDouble(2) / r.getLong(3)).toMap
              (cid, old.indices.map(dim))
            case None => (cid, old) // empty cell keeps its centroid
          }
        }
      }
      import spark.implicits._
      val centDf = cents.toSeq.toDF("cid", "centroid")
      assign(cents)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_assigned"), sum(col("d")).as("inertia"))
        .join(centDf, Seq("cid"))
        .select(col("cid").cast("long").as("cid"), col("centroid"),
          col("n_assigned"), col("inertia"))
    } finally vecs.unpersist()
  }

  /** H19b: engine-portable integer k-means — the fixed-point twin of
    * [[kmeansTrain]], same pattern as pageRankFixed / the md5-portable
    * simhash: every Lloyd step is exact arithmetic, so the trained
    * result is bit-identical on any engine or partitioning and can
    * carry a HARD hash-equality oracle gate (float k-means cannot:
    * per-cell mean and inertia are IEEE sums in partition order).
    *
    * The exactness ladder:
    *  1. vectors are int8-quantized first ([[quantizeInt8]]: floor on
    *     identically-computed doubles — bit-exact anywhere);
    *  2. squared-L2 distances are sums of D·(Δcode)² ≤ D·255² — exact
    *     integers, exactly representable in IEEE doubles, so even a
    *     partition-order double sum is deterministic;
    *  3. argmin ties break to the lowest cid (array_position-first,
    *     same as [[kmeansTrain]]);
    *  4. the centroid update is per-dim `sum DIV count` — INTEGER
    *     division, so centroids stay integral forever;
    *  5. inertia is a sum of exact integers < 2^53 — order-free.
    *
    * Init is the k vectors with the lowest `(md5(id), id)` — portable
    * to any engine with md5, unlike [[kmeansTrain]]'s xxhash64 —
    * cids assigned in id order over the selected k. Empty cells keep
    * their previous centroid.
    *
    * Same driver-traffic shape as [[kmeansTrain]]: only k·D scalars
    * cross the driver per iteration; the corpus never collects.
    *
    * @return one row per non-empty cell from the FINAL assignment:
    *         (cid, n_assigned, inertia, centroid_sum) — centroid_sum
    *         is Σ_d centroid[d], an exact integer digest of the
    *         trained centroid.
    */
  def kmeansFixedTrain(corpus: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val codes = quantizeInt8(corpus, idCol, vecCol)
    // round-12 measured: pinning this cache's width (fanOutDerived)
    // only added an exchange — the k=8 assign kernel is too light for
    // the extra stage to pay at any tested size. Left alone.
    val vecs = codes
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("code"))).as("pv"))
      .select(col("id"),
        transform(array_sort(col("pv")),
          p => p.getField("code").cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[(Int, Seq[Long])] = vecs
        .orderBy(md5(col("id").cast("string")), col("id")).limit(k)
        .orderBy(col("id")).collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).map(_.toLong)) }

      def assign(cs: Array[(Int, Seq[Long])]) = {
        val dists = array(cs.sortBy(_._1).map { case (_, cv) =>
          sqDist(col("v"), typedLit(cv.map(_.toDouble))) }: _*)
        vecs.withColumn("__d", dists)
          .select(col("id"), col("v"),
            (array_position(col("__d"), array_min(col("__d"))) - 1)
              .cast("int").as("cid"),
            array_min(col("__d")).as("d"))
      }

      for (_ <- 1 to iters) {
        val sums = assign(cents)
          .select(col("cid"), posexplode(col("v")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
          .collect() // k·dim tiny rows — the only driver traffic
        val byCell = sums.groupBy(_.getInt(0))
        cents = cents.map { case (cid, old) =>
          byCell.get(cid) match {
            case Some(rows) =>
              // exact integer division — centroids stay integral
              val dim = rows.map(r =>
                r.getInt(1) -> r.getLong(2) / r.getLong(3)).toMap
              (cid, old.indices.map(dim))
            case None => (cid, old)
          }
        }
      }
      import spark.implicits._
      val digest = cents.toSeq
        .map { case (cid, cv) => (cid.toLong, cv.sum) }
        .toDF("cid", "centroid_sum")
      assign(cents)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_assigned"),
          sum(col("d")).cast("long").as("inertia"))
        .select(col("cid").cast("long").as("cid"),
          col("n_assigned"), col("inertia"))
        .join(digest, Seq("cid"))
    } finally vecs.unpersist()
  }

  /** E79: k-center coreset selection — the Gonzalez (1985) greedy
    * 2-approximation of the metric k-center problem, the standard
    * DIVERSE-SUBSET selector for training data (Sener & Savarese
    * ICLR'18 core-set active learning): start from a deterministic
    * seed, repeatedly pick the point FARTHEST from the chosen set.
    * Unlike hash sampling it guarantees cover (every point within the
    * final radius of a center); unlike k-means it needs no
    * convergence loop — exactly k scans.
    *
    * Runs on the int8 grid with the [[kmeansFixedTrain]] exactness
    * ladder: integer distances (exact in double form), argmax ties to
    * the LOWEST id, md5-portable seed — bit-identical on any
    * engine/partitioning, hash-gateable. Each round is one argmax
    * scan (top-1, combinable) + one O(D) driver fetch + one in-row
    * running-min update with per-round localCheckpoint; the corpus
    * never shuffles.
    *
    * @return one row per selected center: (cid = pick order 0..k−1,
    *         center_id, n_assigned, max_d) — assignment/radius from
    *         the final argmin (ties to the lowest cid).
    */
  def kCenterSelect(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = quantizeInt8(corpus, idCol, vecCol)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("code"))).as("pv"))
      .select(col("id"),
        transform(array_sort(col("pv")),
          p => p.getField("code").cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = vecs
        .orderBy(md5(col("id").cast("string")), col("id")).limit(1)
        .collect().head
      var centers = Vector((seed.getLong(0), seed.getSeq[Double](1)))
      var cur = vecs.withColumn("mind",
        sqDist(col("v"), typedLit(centers.head._2)))
      for (_ <- 2 to k) {
        // farthest-first: top-1 by (running min dist DESC, id ASC) —
        // a combinable TakeOrdered, not a global sort
        val far = cur.orderBy(col("mind").desc, col("id").asc).limit(1)
          .select(col("id"), col("v")).collect().head
        centers :+= ((far.getLong(0), far.getSeq[Double](1)))
        cur = cur.withColumn("mind",
            least(col("mind"), sqDist(col("v"), typedLit(far.getSeq[Double](1)))))
          .localCheckpoint(true)
      }
      // final assignment: argmin over the k centers, ties to lowest cid
      val dists = array(centers.map { case (_, cv) =>
        sqDist(col("v"), typedLit(cv)) }: _*)
      import spark.implicits._
      val centerDf = centers.zipWithIndex
        .map { case ((id, _), i) => (i.toLong, id) }
        .toDF("cid", "center_id")
      vecs.withColumn("__d", dists)
        .select(col("id"),
          (array_position(col("__d"), array_min(col("__d"))) - 1)
            .cast("long").as("cid"),
          array_min(col("__d")).cast("long").as("d"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_assigned"), max(col("d")).as("max_d"))
        .join(centerDf, Seq("cid"))
        .select(col("cid"), col("center_id"), col("n_assigned"),
          col("max_d"))
    } finally vecs.unpersist()
  }

  /** Int8 scalar quantization of an embedding column — the 100 TB
    * memory/IO lever: 4× smaller vectors (float32 → uint8 codes) for
    * the candidate-scan stage of ANN, with exact rerank on the few
    * survivors. Per-dimension [min, max] comes from ONE aggregate over
    * the exploded corpus (dim-cardinality rows to the driver-free
    * broadcast join — the corpus itself never shuffles); codes are
    * `floor((x−mn)·255/(mx−mn) + 0.5)` clamped to [0, 255] — floor on
    * identically-computed doubles, so codes are bit-deterministic on
    * any engine (no HALF_UP/HALF_EVEN exposure). Constant dimensions
    * (mx = mn) code to 0.
    *
    * @return (id, pos, code) — one row per vector element, code ∈
    *         [0, 255]; re-assemble with collect_list over pos upstream
    *         of storage.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val flat = df.select(col(idCol).as("id"),
        posexplode(toDouble(col(vecCol))).as(Seq("pos", "x")))
    val stats = flat.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    flat.join(broadcast(stats), "pos")
      .select(col("id"), col("pos").cast("long").as("pos"),
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          least(greatest(
            floor((col("x") - col("mn")) * 255.0 / (col("mx") - col("mn"))
              + 0.5), lit(0L)), lit(255L))).as("code"))
  }

  /** Quantized ANN: cosine top-k where the CANDIDATE scan runs on the
    * int8 codes (¼ the bytes of float32 — at corpus scale the scan is
    * IO-bound, so this is the speedup) and only the `rerankFactor·k`
    * best candidates per query are re-scored exactly on the original
    * vectors. Codes are dequantized per-dimension (mn + code·scale) —
    * an affine map, so quantized cosine ranks ≈ true ranks and the
    * exact rerank repairs the boundary (recall asserted in
    * AsOfIvfSpec).
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, rerankFactor: Int = 4): DataFrame = {
    // approximate pass: quantize-dequantize the corpus vector inline so
    // the scan models the ¼-width read; candidates then rerank exactly
    val flat = corpus.select(col(idCol).as("nn_id"),
        posexplode(toDouble(col(vecCol))).as(Seq("pos", "x")))
    val st = flat.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val deq = flat.join(broadcast(st), "pos")
      .withColumn("scale",
        when(col("mx") === col("mn"), lit(0.0))
          .otherwise((col("mx") - col("mn")) / 255.0))
      .withColumn("xq", col("mn") +
        least(greatest(floor((col("x") - col("mn")) * 255.0 /
            when(col("mx") === col("mn"), lit(1.0))
              .otherwise(col("mx") - col("mn")) + 0.5),
          lit(0L)), lit(255L)).cast("double") * col("scale"))
      .groupBy(col("nn_id"))
      .agg(collect_list(struct(col("pos"), col("xq"))).as("pv"))
      .select(col("nn_id"),
        transform(array_sort(col("pv")), p => p.getField("xq")).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val scoredApprox = deq.join(broadcast(q), col("q_id") =!= col("nn_id"))
      .withColumn("cos_a", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_a").desc, col("nn_id"))
    val candidates = scoredApprox
      .withColumn("r", row_number().over(wA))
      .filter(col("r") <= k * rerankFactor)
      .select(col("q_id"), col("nn_id"))
    // exact rerank on the original vectors, candidates only
    val cTrue = corpus.select(col(idCol).as("nn_id"),
        toDouble(col(vecCol)).as("tv"))
      .withColumn("tn", l2Norm(col("tv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    candidates.join(cTrue, "nn_id").join(broadcast(q), "q_id")
      .withColumn("cos", dot(col("qv"), col("tv")) / (col("qn") * col("tn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), round(col("cos"), 4).as("cos"),
        col("rank"))
  }

  // ---------------------------------------------------------------- PQ

  /** E7d: product-quantization codebook training — m per-subspace
    * k-means (Jégou et al. 2011, "Product Quantization for Nearest
    * Neighbor Search"). The 64-dim vector splits into m contiguous
    * subvectors; each subspace gets its own k-centroid codebook, so a
    * vector stores as m small codes (m·log₂k bits ≈ 8 bytes vs 256
    * for float32 — the 32× memory/IO lever beyond int8's 4×).
    *
    * ALL m codebooks train in the SAME distributed Lloyd pass per
    * iteration: the corpus explodes once into (id, sub, subvec) rows,
    * assignment evaluates k sqDists against the broadcast per-sub
    * codebook literal, and the per-(sub, cell, dim) means collapse to
    * k·D scalars — the only driver traffic, exactly like
    * [[kmeansTrain]]. Init is the same deterministic content-keyed
    * sampling (k lowest-xxhash vectors, sliced per subspace), so
    * training is reproducible across runs and partitionings.
    *
    * @return driver-side codebooks: (sub, cid) → centroid (m·k rows
    *         of dim D/m — kilobytes; they are broadcast literals in
    *         every consumer, never a join side).
    */
  /** L2-normalize onto the unit sphere (norm computed once per row;
    * zero vectors pass through). PQ here targets COSINE retrieval, so
    * codebooks/codes/LUTs all live on the unit sphere, where
    * ‖a−b‖² = 2 − 2·cos(a,b) makes the L2 ADC ranking monotone with
    * cosine — without this, mixed vector norms wreck ADC recall.
    */
  private def unitVec(df: DataFrame, idCol: String,
                      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("rv"))
      .withColumn("nrm", l2Norm(col("rv")))
      .select(col("id"), when(col("nrm") > 0,
        transform(col("rv"), x => x / col("nrm")))
        .otherwise(col("rv")).as("uv"))

  /** (sub, cid) tuples → dense m×k×d nested array for the native
    * pq_codes / pq_lut expressions (plan-time reference object).
    */
  private def booksArray(books: Array[(Int, Int, Seq[Double])])
      : Array[Array[Array[Double]]] = {
    val m = books.map(_._1).max + 1
    val k = books.map(_._2).max + 1
    Array.tabulate(m, k)((s, c) =>
      books.find(b => b._1 == s && b._2 == c).get._3.toArray)
  }

  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, iters: Int): Array[(Int, Int, Seq[Double])] = {
    // one persisted (id, unit-vector) table: assignment happens
    // IN-ROW via the native pq_codes expression (no posexploded
    // m×-inflated subvector table, no per-iteration m·k-wide codegen
    // tree — the codebook rides along as a reference object, so each
    // Lloyd iteration compiles one short call instead of a fresh
    // 128-expression janino unit)
    // round-12: the per-iteration pq_codes kernel scans this cache —
    // spread an under-parallelized corpus before caching (no-op at
    // scale), so Lloyd iterations don't run on one core
    val uvDf = graft.fanOut(unitVec(corpus, idCol, vecCol), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic init: the k lowest-hash vectors seed EVERY
      // subspace (sliced), cids in id order. ONE scan (round 10,
      // VERDICT r9 #6): the hash-order limit runs directly on the
      // persisted unit-vector table instead of an id-only pre-pass +
      // a second isin filter scan — same ids (hash is on the id), one
      // fewer corpus job before training starts.
      val seedRows = uvDf
        .orderBy(xxhash64(col("id")), col("id")).limit(k)
        .orderBy(col("id")).collect()
      // dim derived from the seeds themselves (was a separate 1-row
      // probe job); empty corpus fails loudly here as before
      require(seedRows.nonEmpty, "pqTrain: empty corpus")
      val d0 = seedRows.head.getSeq[Double](1).size
      require(d0 % m == 0, s"dim $d0 not divisible by m=$m")
      val d = d0 / m
      var books: Array[(Int, Int, Seq[Double])] =
        (for (s <- 0 until m; (r, c) <- seedRows.zipWithIndex.toSeq)
          yield (s, c, r.getSeq[Double](1).slice(s * d, s * d + d))).toArray

      for (_ <- 1 to iters) {
        // per-(sub, cell, dim) sums collapse map-side to k·D scalars —
        // the only driver traffic, exactly like [[kmeansTrain]]. sub
        // and pos are recovered arithmetically from the flat vector
        // position, so the only explode is the component one the
        // aggregation needs anyway.
        val sums = uvDf
          .select(VectorFunctions.pqCodes(col("uv"), booksArray(books))
              .as("cids"),
            posexplode(col("uv")).as(Seq("p", "v")))
          .select(expr(s"p div $d").cast("int").as("sub"),
            element_at(col("cids"), expr(s"p div $d").cast("int") + 1)
              .as("cid"),
            expr(s"p % $d").cast("int").as("pos"), col("v"))
          .groupBy(col("sub"), col("cid"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect() // k·D tiny rows — the only driver traffic
        val byCell = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.map { case (s, c, old) =>
          byCell.get((s, c)) match {
            case Some(rows) =>
              val dims = rows.map(r =>
                r.getInt(2) -> (r.getDouble(3) / r.getLong(4))).toMap
              (s, c, old.indices.map(dims))
            case None => (s, c, old) // empty cell keeps its centroid
          }
        }
      }
      books
    } finally uvDf.unpersist()
  }

  /** H28b: engine-portable fixed-point PQ — integer Lloyd training of
    * all m subspace codebooks plus the code assignment, the
    * determinism twin of [[pqTrain]]/[[pqEncode]] (which stay the
    * cosine-recall path): operates on the int8-quantized grid with
    * the exact-arithmetic ladder of [[kmeansFixedTrain]] (integer
    * distances, argmin ties to the lowest cid, per-dim sum-DIV-count
    * updates, md5-portable init — the same k docs seed every
    * subspace), so the full code table is bit-identical on any
    * engine/partitioning and PQ TRAINING itself carries a hard hash
    * oracle (float PQ cannot: fp-order Lloyd).
    *
    * All m subspaces train in the SAME jobs via joint (id, sb) /
    * (sb, cid, lp) grouping keys — one assignment shuffle and one
    * k·D-scalar driver collect per iteration, not m of each. The
    * assignment argmin is `min(struct(dist, cid))` in an AGGREGATE
    * over the broadcast-joined (sb → k centroids) pairs: exact
    * integer dists make the struct min order-free, and no m·k-wide
    * codegen tree is ever built (the janino trap [[pqTrain]]'s
    * history records).
    *
    * @return (id, sb, code) — the m PQ codes per vector, one row per
    *         subspace.
    */
  def pqFixedEncode(corpus: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, iters: Int): DataFrame = {
    val d0 = corpus.select(size(col(vecCol))).head.getInt(0)
    require(d0 % m == 0, s"dim $d0 not divisible by m=$m")
    val d = d0 / m
    // int8 codes reassembled to one double vector per id — code values
    // are exact integers, so every sqDist the native pq_codes
    // expression computes is an exact integer in double form:
    // assignment is IN-ROW (pqTrain's plan shape), deterministic, no
    // per-candidate join or shuffle
    // round-12 measured: pinning this cache's width (fanOutDerived)
    // was a wash — the m-subspace assign kernel amortizes over few
    // rows here and AQE sizes the shuffle correctly at scale. Left
    // alone (pqTrain's NARROW cache keeps its fanOut: that one
    // measured 2.39s → 1.94s on q_ann_pq).
    val vecs = quantizeInt8(corpus, idCol, vecCol)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("code"))).as("pv"))
      .select(col("id"),
        transform(array_sort(col("pv")),
          p => p.getField("code").cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedIds = corpus.select(col(idCol).cast("long").as("id"))
        .orderBy(md5(col("id").cast("string")), col("id")).limit(k)
        .orderBy(col("id")).collect().map(_.getLong(0))
      val cidOf = seedIds.zipWithIndex.toMap
      var cents: Array[(Int, Int, Seq[Long])] = vecs
        .filter(col("id").isin(seedIds: _*))
        .collect()
        .flatMap { r =>
          val cid = cidOf(r.getLong(0))
          val full = r.getSeq[Double](1)
          (0 until m).map(s =>
            (s, cid, full.slice(s * d, s * d + d).map(_.toLong)))
        }

      def books(cs: Array[(Int, Int, Seq[Long])]) = {
        val arr = Array.ofDim[Array[Double]](m, k)
        cs.foreach { case (s, c, cv) => arr(s)(c) = cv.map(_.toDouble).toArray }
        arr
      }

      for (_ <- 1 to iters) {
        // per-(sub, cell, dim) sums collapse map-side to m·k·d scalars
        // — the only driver traffic, exactly like pqTrain; sums of
        // integral doubles are exact, update is integer division
        val sums = vecs
          .select(graft.plans.VectorFunctions.pqCodes(col("v"),
              books(cents)).as("cids"),
            posexplode(col("v")).as(Seq("p", "x")))
          .select(expr(s"p div $d").cast("int").as("sb"),
            element_at(col("cids"), expr(s"p div $d").cast("int") + 1)
              .as("cid"),
            expr(s"p % $d").cast("int").as("lp"), col("x"))
          .groupBy(col("sb"), col("cid"), col("lp"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .collect()
        val byCell = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
        cents = cents.map { case (sb, cid, old) =>
          byCell.get((sb, cid)) match {
            case Some(rows) =>
              val dims = rows.map(r =>
                r.getInt(2) -> r.getDouble(3).toLong / r.getLong(4)).toMap
              (sb, cid, old.indices.map(dims))
            case None => (sb, cid, old)
          }
        }
      }
      vecs.select(col("id"),
          posexplode(graft.plans.VectorFunctions.pqCodes(col("v"),
            books(cents))).as(Seq("sb", "code")))
        .select(col("id"), col("sb").cast("long").as("sb"),
          col("code").cast("long").as("code"))
        .localCheckpoint(true)
    } finally vecs.unpersist()
  }

  /** PQ encoding: vector → m codes (nearest per-subspace centroid,
    * ties to the lowest cid). One codegen-heavy scan, no shuffle —
    * codes stay co-partitioned with their row.
    *
    * @return (id, codes array<int> of length m)
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               books: Array[(Int, Int, Seq[Double])]): DataFrame =
    // one native pq_codes call per row (argmin per subspace, ties to
    // the lowest cid) — same arithmetic and fold order the unrolled
    // sqDist/array_min/array_position tree had, in a fraction of the
    // generated-code size
    unitVec(corpus, idCol, vecCol).select(col("id"),
      VectorFunctions.pqCodes(col("uv"), booksArray(books)).as("codes"))

  /** E7d: asymmetric-distance (ADC) PQ search. Per QUERY the m×k
    * lookup table of subspace distances is computed ONCE (m·k sqDists
    * — kilobytes, rides along in the broadcast row); the corpus scan
    * then evaluates Σₛ LUT[s][code[s]] — m array lookups per vector,
    * touching only the 8-byte codes instead of the 256-byte vector.
    * That lookup scan is the whole point of PQ: at 100 TB the
    * candidate pass reads 32× fewer bytes and does no float math per
    * dimension. Exact cosine rerank on the rerankFactor·k survivors
    * repairs quantization boundaries, as in [[quantizedTopK]].
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, books: Array[(Int, Int, Seq[Double])],
             k: Int, rerankFactor: Int = 4): DataFrame = {
    val m = books.map(_._1).max + 1
    val nc = books.map(_._2).max + 1
    val d = books(0)._3.length
    // round-12: the ADC lookup scan runs in enc's scan stage — spread
    // an under-parallelized corpus (no-op at scale)
    val enc = graft.fanOut(pqEncode(corpus, idCol, vecCol, books), col("id"))
      .withColumnRenamed("id", "nn_id")
    // per-query LUT over the UNIT-sphere query: lut[s][c] =
    // ||q̂_s − centroid_{s,c}||² (codebooks live on the unit sphere)
    val q = queries.select(col(idCol).as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .withColumn("qu", when(col("qn") > 0,
        transform(col("qv"), x => x / col("qn"))).otherwise(col("qv")))
      .withColumn("lut", VectorFunctions.pqLut(col("qu"), booksArray(books)))
    // the ADC scan: m statically-unrolled LUT lookups per corpus row —
    // pure codegen'd array indexing, no HOF, no float math per dim
    val approx = enc.join(broadcast(q), col("q_id") =!= col("nn_id"))
      .withColumn("adist", (0 until m).map(s =>
        element_at(element_at(col("lut"), s + 1),
          element_at(col("codes"), s + 1) + 1)).reduce(_ + _))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adist").asc, col("nn_id"))
    val candidates = approx.withColumn("r", row_number().over(wA))
      .filter(col("r") <= k * rerankFactor)
      .select(col("q_id"), col("nn_id"))
    val cTrue = corpus.select(col(idCol).as("nn_id"),
        toDouble(col(vecCol)).as("tv"))
      .withColumn("tn", l2Norm(col("tv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    candidates.join(cTrue, "nn_id")
      .join(broadcast(q.select(col("q_id"), col("qv"), col("qn"))), "q_id")
      .withColumn("cos", dot(col("qv"), col("tv")) / (col("qn") * col("tn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), round(col("cos"), 4).as("cos"),
        col("rank"))
  }

  /** E56: SemDeDup-shaped semantic dedup funnel (Abbas et al. 2023,
    * arXiv:2303.09540): embedding near-dup pairs above a cosine
    * threshold → transitive clusters → ONE keeper per cluster (min
    * id), every input vector getting a (cluster_id, n_members, keep)
    * verdict — the decision table a curation run applies.
    *
    * This is the oracle-checkable re-expression of the paper's
    * pipeline: the paper clusters with k-means purely to BOUND the
    * pair search; here the pair space is bounded by the caller's
    * blocking key (a label, an SRP-LSH bucket, or an IVF cell id —
    * q_ann_lsh/ivf machinery), which keeps every stage deterministic.
    * Scale shape: blocked self-join (per-block pair space), hybrid
    * connected components (driver union-find under the edge threshold,
    * min-label rounds above), then two keyed joins of cluster-
    * cardinality tables back to the corpus — nothing global.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    blockCol: String, threshold: Double): DataFrame = {
    val pairs = cosineNearDupPairs(df, idCol, vecCol, blockCol, threshold)
    val comp = Graph.connectedComponents(pairs, "id_a", "id_b")
    val members = comp.groupBy(col("comp")).agg(count(lit(1)).as("n"))
    df.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .join(members, Seq("comp"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("cluster_id"),
        coalesce(col("n"), lit(1L)).as("n_members"),
        (col("comp").isNull || col("comp") === col("id")).as("keep"))
  }

  /** Semantic decontamination: every corpus vector scored against a
    * broadcast EVAL-set of embeddings — the embedding-space complement
    * of the 8-gram decontaminate pass (E22): paraphrased or reformatted
    * benchmark items share no shingles but sit next to the original in
    * embedding space. Output is the full decision table (one row per
    * corpus vector with its nearest eval item and the verdict), the
    * blocklistScreen discipline.
    *
    * Scale shape: the eval set is benchmark-sized (thousands) →
    * broadcast; the corpus never shuffles for scoring, and the argmax
    * is ONE map-combinable aggregate (`max(struct(cos, −eval_id))` —
    * partial aggregation collapses each corpus id's |eval| scored rows
    * to one BEFORE the exchange, so only corpus-cardinality rows
    * shuffle). Norms computed once per vector on each side. Ties on
    * cosine break to the smallest eval id; comparisons on raw doubles
    * are engine-stable (same fold order both sides), rounding only at
    * output (3dp, the embed_dup rule).
    *
    * @return (vec_id, top_eval_id, cos, contaminated) for every corpus
    *         vector; contaminated ⟺ raw max cosine ≥ threshold.
    */
  def semanticDecontaminate(corpus: DataFrame, eval: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"),
        toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val e = eval.select(col(idCol).as("eval_id"),
        toDouble(col(vecCol)).as("ev"))
      .withColumn("en", l2Norm(col("ev")))
    c.join(broadcast(e))
      .withColumn("cos", dot(col("cv"), col("ev")) / (col("cn") * col("en")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("eval_id")).as("neg_id"))).as("m"))
      .select(col("vec_id"),
        (-col("m.neg_id")).as("top_eval_id"),
        round(col("m.cos"), 3).as("cos"),
        (col("m.cos") >= threshold).as("contaminated"))
  }

  /** E5: embedding near-duplicate pairs above a cosine threshold,
    * blocked by an equi-join key (here: a label / cluster id) so the
    * pair space is per-block, not global.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 3).as("cos"))
  }

  /** H40: intrinsic-dimension estimate (two-NN MLE — Facco et al.
    * 2017, Sci. Rep. 7:12140) — the embedding-space health number
    * (collapsed representations → d near 0-2; healthy text embeddings
    * → tens; d tracking the ambient dimension → noise, ANN pruning
    * won't work): d = 2N / Σ ln(sq2/sq1) over each point's two
    * nearest squared distances. Each ln argument is ONE division of
    * two per-pair IEEE-exact squared distances (no sqrt anywhere —
    * the √ cancels into the factor 2), zero-distance pairs (exact
    * duplicates) are discarded per the paper, and the ln sum folds in
    * id order (6dp — the ln rule).
    *
    * Scale shape: the pair search is BLOCKED on the caller's key
    * (label / SRP bucket / IVF cell — the semantic-dedup discipline),
    * so candidates are an equi-join, never n²; per-point top-2 rides
    * the map-side topk_by heap. At full corpus scale the same
    * estimator runs on ANN-candidate distances (approximate
    * neighbors bias d upward slightly — the blocked form here is
    * exact within blocks). A skewed block can still be quadratic, so
    * the auto default (queryMod = 0) derives a query-side sampling
    * modulus from Σ n_blk² — the ACTUAL pair count — keeping pair work
    * ≤ [[SamplerPairBudget]] (the MLE is unbiased under subsampling:
    * each sampled point's two-NN still ranks against its FULL block).
    *
    * @return one row: (n_points, id_mle).
    */
  def intrinsicDimension(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, queryMod: Int = 0): DataFrame = {
    require(queryMod >= 0)
    val v = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      toDouble(col(vecCol)).as("v"))
    val mod =
      if (queryMod > 0) queryMod.toLong
      else {
        val pairs = v.groupBy(col("blk"))
          .agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(col("n") * col("n")), lit(0L)).as("p"))
          .head.getLong(0)
        autoQueryMod(pairs)
      }
    // only sample when the budget demands it: at mod = 1 the unfiltered
    // frame is kept verbatim (ids need not even be numeric below budget)
    val a =
      if (mod > 1L) v.filter(pmod(col("id").cast("long"), lit(mod)) === 0)
      else v
    val b = v.select(col("id").as("other"), col("blk"),
      col("v").as("w"))
    val pairs = a.join(b, Seq("blk"))
      .filter(col("id") =!= col("other"))
      .withColumn("sq", VectorFunctions.sqDist(col("v"), col("w")))
      .filter(col("sq") > 0.0)
    val top2 = pairs.groupBy(col("id"))
      .agg(graft.plans.TopKBy.topkBy(col("sq") * -1, col("other"), 2)
        .as("t"))
      .filter(size(col("t")) === 2)
      .select(col("id"),
        log((col("t")(1)("score") * -1) / (col("t")(0)("score") * -1))
          .as("lnmu"))
    val one = top2
      .agg(array_sort(collect_list(struct(col("id"), col("lnmu"))))
        .as("arr"))
    one.select(size(col("arr")).cast("long").as("n_points"),
      round(lit(2.0) * size(col("arr")).cast("double") /
        aggregate(transform(col("arr"), x => x("lnmu")), lit(0.0), _ + _),
        6).as("id_mle"))
  }

  /** H39: incremental top-k similarity maintenance — the E40/E45
    * incremental-store discipline applied to ANN serving (the
    * interactive-session top-k pattern, cf. EDBT 2020's incremental
    * top-k framework): when a new vector batch arrives, the OLD
    * corpus is never rescored — the stored per-query top-k (k rows
    * per query, RAW scores) merges with the batch's top-k, and
    * top-k(top-k(old) ∪ top-k(batch)) ≡ top-k(old ∪ batch) EXACTLY
    * (any final member is in its side's top-k under the same total
    * (score desc, id) order — including ties). Here the store side is
    * computed inline for the gate; a deployment persists it and pays
    * only the batch scan + a (queries×2k)-row merge per ingest.
    *
    * @return (q_id, nn_id, rank, cos 4dp) — identical to a full
    *         recompute over the union corpus, which is what the
    *         oracle does.
    */
  def incrementalTopK(oldCorpus: DataFrame, batch: DataFrame,
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    def storedTop(corpus: DataFrame) = {
      val c = corpus.select(col(idCol).as("nn_id"),
        toDouble(col(vecCol)).as("cv"))
        .withColumn("cn", l2Norm(col("cv")))
      c.join(broadcast(q), col("q_id") =!= col("nn_id"))
        .withColumn("cos",
          dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .groupBy(col("q_id"))
        .agg(graft.plans.TopKBy.topkBy(col("cos"), col("nn_id"), k)
          .as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col.id").as("nn_id"),
          col("col.score").as("cos")) // RAW scores — the store format
    }
    storedTop(oldCorpus).union(storedTop(batch))
      .groupBy(col("q_id"))
      .agg(graft.plans.TopKBy.topkBy(col("cos"), col("nn_id"), k)
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("nn_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.score"), 4).as("cos"))
  }

  /** H38: ANN recall meta-evaluation — the fifth pre-flight number
    * (C40 skew / C48 join size / F20 lateness / E80 dedup eval):
    * score an approximate-NN configuration against the exact top-k
    * BEFORE trusting it on the full corpus. Inputs are any two
    * (q_id, nn_id, …) rankings (e.g. [[bruteForceTopKAgg]] as truth
    * and [[lshTopK]]/[[ivfTopK]]/[[pqTopK]] as candidate); output is
    * per-query exact-set size, hits, and recall (ONE division of
    * exact ints — raw-double safe). One keyed left join + one
    * aggregate, both query-set sized.
    */
  def annRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = approx.select(col("q_id"), col("nn_id"), lit(1L).as("__hit"))
    exact.select(col("q_id"), col("nn_id"))
      .join(hits, Seq("q_id", "nn_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** H36: Johnson–Lindenstrauss random projection (Achlioptas 2003
    * ±1 form) in EXACT integer arithmetic — the dimension-reduction
    * rung of the ANN ladder (compress 64-d to 16-d before LSH/IVF
    * when even int8 vectors dominate the scan): y_j = Σ_d s(j,d)·c_d
    * over the CENTERED int8 grid (c = code − 128), with the ±1 signs
    * md5-derived per (output dim, input dim) — no stored projection
    * matrix, engine-portable, and the projection is a pure integer
    * dot product: bit-identical on any engine/partitioning ⇒ hard
    * hash gate. Distance preservation (the JL lemma) is statistical
    * and spec-asserted, not oracled.
    *
    * Scale shape: the sign table is outDims×D (kilobytes, broadcast);
    * one (id, j)-keyed sum aggregate; the corpus shuffles once.
    *
    * @return (vec_id, j, y) — outDims rows per vector.
    */
  /** H37: fixed-point power iteration — the dominant eigenvector of
    * the int8-grid scatter matrix S = Σ c·cᵀ (c = code − 128), the
    * spectral member of the fixed-point-trainable family (PageRank /
    * k-means / PQ / perceptron): the corpus-sized work is ONE
    * distributed pass building S (a D×D integer matrix — the id-keyed
    * self-join collapses to D² cells under partial aggregation); the
    * iteration itself runs on D² driver scalars (the k-means
    * centroid-pull discipline — 4096 longs for D=64), in BigInt matvec
    * + truncating-division renormalization v ← sign(u)·(|u|·10⁶ div
    * max|u|), so every round is EXACT integer arithmetic and the final
    * eigenvector is bit-identical on any engine or partitioning ⇒
    * hard hash gate with the rounds unrolled in HUGEINT DuckDB SQL.
    *
    * PCA-lite caveat (documented, not hidden): S is the scatter of the
    * CENTERED-GRID codes (code − 128), not mean-centered per
    * dimension — the dominant direction of the raw second moment. For
    * whitening-grade PCA subtract per-dim means first.
    *
    * @return (pos, v) — the scaled (±10⁶) eigenvector, D rows.
    */
  def powerIterationFixed(df: DataFrame, idCol: String, vecCol: String,
                          iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val codes = quantizeInt8(df, idCol, vecCol)
      .select(col("id"), col("pos"), (col("code") - 128).as("c"))
    val left = codes.select(col("id"), col("pos").as("p"), col("c").as("ca"))
    val right = codes.select(col("id"), col("pos").as("q"), col("c").as("cb"))
    val scatter = left.join(right, "id")
      .groupBy(col("p"), col("q"))
      .agg(sum(col("ca") * col("cb")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val dims = scatter.keys.map(_._1).toSeq.distinct.sorted
    var v = dims.map(_ => BigInt(1000000))
    for (_ <- 1 to iters) {
      val u = dims.map(q => dims.zip(v).map { case (p, vp) =>
        BigInt(scatter.getOrElse((p, q), 0L)) * vp }.sum)
      val m = u.map(_.abs).max
      if (m > 0) v = u.map(x => BigInt(x.signum) * (x.abs * 1000000 / m))
    }
    dims.zip(v).map { case (p, x) => (p, x.toLong) }.toDF("pos", "v")
  }

  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                outDims: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val codes = quantizeInt8(df, idCol, vecCol)
    val dims = (0L until outDims.toLong).toDF("j")
    val signs = broadcast(dims.crossJoin(codes.select(col("pos")).distinct())
      .select(col("j"), col("pos"),
        (conv(substring(md5(concat(lit("jl"), col("j").cast("string"),
          lit("_"), col("pos").cast("string"))), 1, 1), 16, 10)
          .cast("long") % 2 * 2 - 1).as("sgn")))
    codes.join(signs, "pos")
      .groupBy(col("id"), col("j"))
      .agg(sum(col("sgn") * (col("code") - 128)).as("y"))
      .select(col("id").as("vec_id"), col("j"), col("y"))
  }

  /** Leave-one-out k-NN label-prediction accuracy over an embedding
    * column — the evaluation harness that answers "do these embeddings
    * actually carry the labels" (the local sibling of [[
    * labelCentroidCosine]]'s global separation view, and the
    * meta-evaluation family of dedup-eval / ANN-recall: quadratic by
    * design, run on a sample, never the corpus).
    *
    * Exactness: coordinates quantized once to integers (scale 10⁴), so
    * every squared distance is an integer-valued double (≤2⁵³ —
    * exact); neighbor selection packs (d2, id) into one orderable
    * number (d2·2^idBits + id, exact while < 2⁵³), so the map-side
    * partial top-k aggregate ([[graft.plans.TopKBy]] — no per-query
    * window over the candidate stream) breaks distance ties by id
    * identically on any engine; majority vote ties break by smallest
    * label; accuracy in floor-div micro-units.
    *
    * @return per true label: (label, n, n_correct, accuracy_micro).
    */
  def knnClassifyEval(df: DataFrame, idCol: String, labelCol: String,
                      vecCol: String, k: Int = 5,
                      idBits: Int = 20, queryMod: Int = 0): DataFrame = {
    require(k >= 1 && idBits >= 10 && idBits <= 30 && queryMod >= 0)
    val mod = resolveQueryMod(queryMod, df)
    val pack = math.pow(2, idBits)
    def quant(c: Column) = transform(c, e =>
      floor(e.cast("double") * 10000 + 0.5).cast("double"))
    // mod > 1: deterministic 1-in-mod QUERY sample (id mod) — the
    // harness is quadratic by design; the sample bounds the query side
    // while every query still ranks against the FULL corpus. mod = 0
    // (the default) derives the modulus from the corpus count so pair
    // work stays ≤ [[SamplerPairBudget]].
    val q = df
      .filter(pmod(col(idCol).cast("long"), lit(mod)) === 0)
      .select(col(idCol).cast("long").as("qid"),
        col(labelCol).cast("long").as("qlab"), quant(col(vecCol)).as("qv"))
    // loud guard (round-4 advice): the packed order is exact only while
    // every id fits idBits AND worst-case d2·2^idBits + id < 2^53.
    // Validate the DATA, not just the parameter — an oversized id or
    // distance must fail here, never silently bleed into the distance
    // bits and reorder neighbors. Folded into the corpus projection of
    // the main job (packGuard): one scan total, zero build-time jobs.
    // Staged parse-once select: quant computed as an attribute first,
    // the guard derives from it (the CLAUDE.md re-inline discipline).
    // round-12: the pair kernel below runs in the corpus's SCAN stage;
    // a single-row-group input would serialize all q·n sqDist work on
    // one core — spread it (no-op once the scan has ≥ cores partitions)
    val c = graft.fanOut(df.select(col(idCol).cast("long").as("cid"),
        quant(col(vecCol)).as("cv")), col("cid"))
      .select(col("cid"),
        packGuard("knnClassifyEval", col("cid"), col("cv"), pack,
          idBits).as("cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("packed",
        -(sqDist(col("qv"), col("cv")) * pack + col("cid").cast("double")))
    val top = scored.groupBy(col("qid"), col("qlab"))
      .agg(graft.plans.TopKBy.topkBy(col("packed"), col("cid"), k)
        .as("top"))
      .select(col("qid"), col("qlab"), explode(col("top")).as("t"))
      .select(col("qid"), col("qlab"), col("t.id").as("nid"))
    val lab = df.select(col(idCol).cast("long").as("nid"),
      col(labelCol).cast("long").as("nlab"))
    val votes = top.join(broadcast(lab), "nid")
      .groupBy(col("qid"), col("qlab"), col("nlab"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cnt").desc, col("nlab"))
    val pred = votes
      .withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1)
    pred.groupBy(col("qlab").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("nlab") === col("qlab"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        expr("n_correct * 1000000 div n").as("accuracy_micro"))
  }

  /** E95: hard-negative mining — for each anchor embedding, the k
    * nearest neighbors carrying a DIFFERENT label. The contrastive-
    * training data prep step (dense-retriever / embedding fine-tuning
    * recipes mine exactly this: negatives the current representation
    * already confuses are the ones worth training on), and the
    * error-analysis view of [[knnClassifyEval]]'s accuracy number.
    *
    * Same exactness machinery as [[knnClassifyEval]]: integer-quantized
    * coordinates (scale 10⁴) make every squared distance an exact
    * integer-valued double; (d2, id) packed into one orderable number
    * keeps the map-side partial top-k ([[graft.plans.TopKBy]])
    * tie-broken by id identically on any engine; the data bound is
    * validated loudly. The label constraint rides the pair-join
    * predicate, so the top-k heaps only ever see cross-label pairs.
    *
    * Plan shape: anchor sample broadcast, corpus scanned once — the
    * ANN-ladder discipline; quadratic by design on the 1-in-queryMod
    * anchor sample, the corpus never shuffles.
    *
    * @return (vec_id, label, rank, neg_id, neg_d2) — rank 1..k by
    *         ascending quantized squared distance, ties by neg_id.
    */
  def hardNegatives(df: DataFrame, idCol: String, labelCol: String,
                    vecCol: String, k: Int = 3,
                    idBits: Int = 20, queryMod: Int = 0): DataFrame = {
    require(k >= 1 && idBits >= 10 && idBits <= 30 && queryMod >= 0)
    val mod = resolveQueryMod(queryMod, df)
    val pack = math.pow(2, idBits)
    def quant(c: Column) = transform(c, e =>
      floor(e.cast("double") * 10000 + 0.5).cast("double"))
    val q = df
      .filter(pmod(col(idCol).cast("long"), lit(mod)) === 0)
      .select(col(idCol).cast("long").as("qid"),
        col(labelCol).cast("long").as("qlab"), quant(col(vecCol)).as("qv"))
    // loud data-bound guard (the knnClassifyEval discipline): packed
    // order is exact only while ids fit idBits and d2·2^idBits + id
    // stays under 2^53 — folded into the corpus projection (packGuard)
    // round-12: spread the pair-kernel stage (knnClassifyEval note)
    val c = graft.fanOut(df.select(col(idCol).cast("long").as("cid"),
        col(labelCol).cast("long").as("clab"),
        quant(col(vecCol)).as("cv")), col("cid"))
      .select(col("cid"), col("clab"),
        packGuard("hardNegatives", col("cid"), col("cv"), pack,
          idBits).as("cv"))
    val scored = c.join(broadcast(q),
        col("qid") =!= col("cid") && col("qlab") =!= col("clab"))
      .withColumn("packed",
        -(sqDist(col("qv"), col("cv")) * pack + col("cid").cast("double")))
    scored.groupBy(col("qid"), col("qlab"))
      .agg(graft.plans.TopKBy.topkBy(col("packed"), col("cid"), k)
        .as("top"))
      .select(col("qid"), col("qlab"), posexplode(col("top")))
      .select(col("qid").as("vec_id"), col("qlab").as("label"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neg_id"),
        // unpack the exact integer d2 back out of the packed key
        (((-col("col.score")) - col("col.id").cast("double")) / pack)
          .cast("long").as("neg_d2"))
  }

  /** Sampled silhouette evaluation (Rousseeuw, J. Comput. Appl. Math.
    * 1987) over a labeled embedding column — the clustering-quality
    * member of the meta-evaluation family ([[knnClassifyEval]] asks
    * "do the embeddings carry the labels"; this asks "are the label
    * clusters COMPACT and SEPARATED", the number a curation pipeline
    * checks before trusting cluster-level dedup or stratified splits).
    *
    * Exactness: coordinates quantized once to integers (scale 10² —
    * coarser than [[knnClassifyEval]]'s 10⁴ because silhouette values
    * pass through a micro-unit RATIO whose numerator carries d2·10¹²;
    * the bound below is what makes every product fit a BIGINT) so
    * every squared distance is an exact integer; per-(point, label)
    * distance sums are exact BIGINTs; a = mean distance to own label
    * (self excluded by the qid≠cid join, so the divisor is n_same−1
    * naturally), b = min over other labels of the mean distance, both
    * in overflow-free split floor division
    * (⌊sd·10⁶/cnt⌋ = (sd div cnt)·10⁶ + ((sd mod cnt)·10⁶) div cnt —
    * exact at any cluster size); s = (b−a)/max(a,b) in sign-explicit
    * floor-div micro-units (quotient truncation is sign-sensitive
    * across engines, so the sign is factored out before the division
    * — mirrored in the oracle). Singleton-cluster points (no same-
    * label neighbor) take s = 0, the sklearn convention.
    *
    * Data bound, validated loudly (the knnClassifyEval discipline):
    * max d2 = dim·(2·maxAbsQuant)² must stay ≤ 9.2·10⁶ so that
    * diff·10⁶ ≤ 9.2·10¹⁸ never wraps — true for any unit-ish
    * embedding at scale 10² (maxAbsQuant 100, dim ≤ 57000).
    *
    * Plan shape: the quadratic stage is query-sample × corpus with the
    * SAMPLE broadcast (the [[knnClassifyEval]] discipline — quadratic
    * by design, run on a 1-in-queryMod sample, corpus never shuffles);
    * everything after the pair aggregate is label-cardinality.
    *
    * @return per label: (label, n_pts, sum_sil_micro, min_sil_micro,
    *         max_sil_micro).
    */
  def silhouetteEval(df: DataFrame, idCol: String, labelCol: String,
                     vecCol: String, queryMod: Int = 0,
                     scale: Int = 100): DataFrame = {
    require(queryMod >= 0 && scale >= 1)
    val mod = resolveQueryMod(queryMod, df)
    def quant(c: Column) = transform(c, e =>
      floor(e.cast("double") * scale + 0.5).cast("double"))
    val q = df
      .filter(pmod(col(idCol).cast("long"), lit(mod)) === 0)
      .select(col(idCol).cast("long").as("qid"),
        col(labelCol).cast("long").as("qlab"), quant(col(vecCol)).as("qv"))
    // round-12: spread the pair-kernel stage (knnClassifyEval note)
    val c = graft.fanOut(df.select(col(idCol).cast("long").as("cid"),
        col(labelCol).cast("long").as("clab"),
        quant(col(vecCol)).as("cv")), col("cid"))
      .select(col("cid"), col("clab"),
        d2Guard("silhouetteEval", col("cv"), 9.2e6).as("cv"))
    // ⌊sd·10⁶ / cnt⌋ without the sd·10⁶ product (sd is corpus-sized)
    val meanMicro = "((sd div cnt) * 1000000 + ((sd % cnt) * 1000000) div cnt)"
    val perLabel = c.join(broadcast(q), col("qid") =!= col("cid"))
      .groupBy(col("qid"), col("qlab"), col("clab"))
      .agg(sum(sqDist(col("qv"), col("cv")).cast("long")).as("sd"),
        count(lit(1)).as("cnt"))
    val perPoint = perLabel.groupBy(col("qid"), col("qlab"))
      .agg(
        max(when(col("clab") === col("qlab"), expr(meanMicro)))
          .as("a_micro"),
        min(when(col("clab") =!= col("qlab"), expr(meanMicro)))
          .as("b_micro"))
    val s = perPoint.withColumn("s_micro",
      when(col("a_micro").isNull || col("b_micro").isNull ||
          greatest(col("a_micro"), col("b_micro")) === 0, lit(0L))
        .when(col("b_micro") >= col("a_micro"),
          expr("(b_micro - a_micro) * 1000000 div " +
            "greatest(a_micro, b_micro)"))
        .otherwise(-expr("(a_micro - b_micro) * 1000000 div " +
          "greatest(a_micro, b_micro)")))
    s.groupBy(col("qlab").as("label"))
      .agg(count(lit(1)).as("n_pts"),
        sum(col("s_micro")).as("sum_sil_micro"),
        min(col("s_micro")).as("min_sil_micro"),
        max(col("s_micro")).as("max_sil_micro"))
  }

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998) — the diversity-aware selection step a RAG retrieval
    * pipeline runs between ANN candidate generation and the context
    * window: greedily pick k items maximizing
    * λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s), so near-duplicate
    * passages don't crowd out coverage.
    *
    * Determinism: relevance and pairwise sims are the [[bruteForceTopK]]
    * cosine (per-vector norms, one division); the MMR objective is
    * scored as λbp·rel − (10000−λbp)·sim — two exact-integer scalings
    * and one subtraction of IEEE doubles, identical op order on any
    * engine — and every argmax breaks ties by smallest id, so the
    * selection sequence is a pure function of the inputs (the oracle
    * unrolls the same k greedy steps in SQL).
    *
    * Plan shape: the only corpus-sized stages are candidate-pool
    * generation (broadcast queries, MAP-SIDE partial top-k heaps via
    * the topk_by aggregate — each map task ships ≤ poolSize rows per
    * query, the corpus is never window-sorted or shuffled) and one
    * broadcast-pruned re-scan to re-attach pool vectors; the k greedy
    * rounds run on |queries|·pool rows with broadcast-sized joins.
    * poolSize and k are small constants, so lineage depth is bounded.
    *
    * @return (q_id, pick, sel_id, score) — pick = 1..k selection order,
    *         score = the winning MMR objective at 6dp.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int = 3, poolSize: Int = 20,
                lambdaBp: Int = 5500): DataFrame = {
    require(k >= 1 && poolSize >= k && lambdaBp >= 0 && lambdaBp <= 10000)
    // the unrolled in-row selection below re-embeds earlier picks'
    // expressions (~3^k growth after projection collapse) — fine for
    // the small-constant k MMR is for (scaladoc), fenced loudly
    require(k <= 8, s"mmrRerank: k=$k — the unrolled selection is " +
      "built for small k (≤ 8); larger k needs the iterative form")
    // round-12 measured: fanOut here REGRESSED (+0.3s) — the relevance
    // kernel is |queries|·n dots (tiny), while the greedy loop below is
    // job-count-bound; an extra exchange only deepens it. Left alone.
    val c = corpus.select(col(idCol).cast("long").as("cid"),
        toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    // topk_by orders (score desc, id asc) — exactly the pool rule; the
    // pool ids then prune a second corpus scan (broadcast semi-shape)
    // to re-attach vectors: scan beats shuffling the corpus by cid
    val top = c.join(broadcast(q), col("q_id") =!= col("cid"))
      .withColumn("rel", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .groupBy(col("q_id"))
      .agg(graft.plans.TopKBy.topkBy(col("rel"), col("cid"), poolSize)
        .as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.id").as("cid"), col("t.score").as("rel"))
    // round-12 rewrite: the k greedy rounds used to run as per-pick
    // anti-join + sim join + aggregate + window over the persisted
    // pool — ~25 AQE stage jobs of broadcast-sized work whose
    // scheduling dominated the query (measured 2.3s at sf0.1 with the
    // kernel itself trivial). The pool is ≤ poolSize rows per query BY
    // CONSTRUCTION, so collapse it to ONE row per query (array sorted
    // by cid — deterministic collect) and unroll the k argmax steps
    // IN-ROW: each step filters out picked cids, scores the rest with
    // the IDENTICAL fp expression order (λ·rel − (1−λ)·maxsim, maxsim
    // via the same dot/norm division, 0.0 literal for step 1), and
    // takes array_max of struct(score, −cid, el) ≡ the old window's
    // (score DESC, cid ASC) tie-break. Per-query work is
    // O(k·poolSize²·D) — bounded constants on the broadcast-sized
    // side; the corpus-sized stages are unchanged. Same oracle hash
    // (sf0.001 + sf0.01) and the Round4OpsSpec selection semantics.
    val pool = c.join(broadcast(top), Seq("cid"))
      .groupBy(col("q_id"))
      .agg(sort_array(collect_list(
        struct(col("cid"), col("rel"), col("cn"), col("cv")))).as("pool"))
    val lam = lit(lambdaBp.toDouble)
    val oneMinus = lit((10000 - lambdaBp).toDouble)
    def simTo(cEl: Column, sel: Column): Column =
      dot(cEl.getField("cv"), sel.getField("el").getField("cv")) /
        (cEl.getField("cn") * sel.getField("el").getField("cn"))
    // one pick: max by (score desc, cid asc) over unpicked elements;
    // null when the pool is exhausted (mirrors the loop form, where a
    // drained candidate set simply produced no row for that pick)
    def pick(poolC: Column, selected: Seq[Column]): Column = {
      val cand =
        if (selected.isEmpty) poolC
        else filter(poolC, c => selected
          .map(s => c.getField("cid") =!= s.getField("el").getField("cid"))
          .reduce(_ && _))
      val scored = transform(cand, c => {
        val ms =
          if (selected.isEmpty) lit(0.0)
          else selected.map(s => simTo(c, s)).reduce(greatest(_, _))
        struct((lam * c.getField("rel") - oneMinus * ms).as("score"),
          (-c.getField("cid")).as("negid"), c.as("el"))
      })
      array_max(scored)
    }
    var picks = Vector.empty[Column]
    for (_ <- 1 to k) picks :+= pick(col("pool"), picks)
    val out = pool
      .select(col("q_id"), posexplode(array(picks: _*)).as(Seq("i", "p")))
      .filter(col("p").isNotNull)
      .select(col("q_id"), (col("i") + 1).cast("long").as("pick"),
        col("p").getField("el").getField("cid").as("sel_id"),
        round(col("p").getField("score") / 10000d, 6).as("score"))
    out
  }

  /** Pairwise cosine similarity between LABEL CENTROIDS of an
    * embedding column — the class-separation health check run before
    * trusting labels for curation or eval splits (collapsed or
    * near-duplicate classes show up as cosine → 1).
    *
    * Exactness: each float coordinate is quantized once to an integer
    * (scale 10⁴, floor(x·s+0.5) on exactly-widened doubles); per-label
    * per-dim SUMS of those integers are the centroid carriers
    * (mean = sum/n shares n, and cosine is scale-invariant, so the
    * un-divided sum vectors give the SAME cosine — no float folds
    * anywhere). Dot products and norms of sum-vectors are exact
    * BIGINTs; the only IEEE ops are the final sqrt/division (6dp).
    *
    * Plan shape: posexplode → one (label, dim) aggregate collapses the
    * corpus to |labels|·D rows; the pair join runs on that tiny frame
    * keyed by dim, never on the corpus.
    *
    * @return per label pair a<b: (label_a, label_b, n_a, n_b, dot,
    *         cosine).
    */
  def labelCentroidCosine(df: DataFrame, labelCol: String,
                          vecCol: String, scale: Int = 10000): DataFrame = {
    val f = df.select(col(labelCol).cast("long").as("lab"),
        posexplode(col(vecCol)).as(Seq("d", "e")))
      .select(col("lab"), col("d"),
        floor(col("e").cast("double") * scale + 0.5).cast("long").as("q"))
    val s = f.groupBy(col("lab"), col("d")).agg(sum(col("q")).as("sv"))
    val meta = df.groupBy(col(labelCol).cast("long").as("lab"))
      .agg(count(lit(1)).as("n"))
    val norms = s.groupBy(col("lab"))
      .agg(sum(col("sv") * col("sv")).as("norm2"))
      .join(meta, "lab")
    val pairs = s.as("a").join(s.as("b"),
        col("a.d") === col("b.d") && col("a.lab") < col("b.lab"))
      .groupBy(col("a.lab").as("label_a"), col("b.lab").as("label_b"))
      .agg(sum(col("a.sv") * col("b.sv")).as("dot"))
    pairs
      .join(broadcast(norms.select(col("lab").as("label_a"),
        col("n").as("n_a"), col("norm2").as("na2"))), "label_a")
      .join(broadcast(norms.select(col("lab").as("label_b"),
        col("n").as("n_b"), col("norm2").as("nb2"))), "label_b")
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double"))), 6).as("cosine"))
  }
}
