package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-set similarity self-join with prefix filtering
  * (AllPairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al.
  * ICDE'08; reference pipeline's dedup semantics generalized to set
  * similarity, cf. reference transform.py dedup-by-key).
  *
  * The scale argument, and why this exists beside
  * `Dedup.ngramJaccardPairs`: the shingle self-join generates a
  * candidate for EVERY shared shingle, so a stop-shingle shared by k
  * docs contributes k² pair rows before the size filter sees them.
  * Prefix filtering bounds candidate generation instead of pruning it
  * after the fact: under any global token order, two sets with
  * J(a,b) ≥ τ MUST share a token among the first
  * `|x| − ⌈τ·|x|⌉ + 1` tokens of each (else the remaining suffixes are
  * too short to reach the required overlap ⌈τ·max(|a|,|b|)⌉). Ordering
  * tokens rarest-first makes those prefixes the LOW-df tokens, so the
  * quadratic blowup lands on tokens shared by few docs — the hot
  * head of the vocabulary never enters the join. At 100 TB this is
  * the difference between a bounded equi-join and a skew bomb.
  *
  * Plan shape: token df join (keyed on token) → per-doc rank window
  * (keyed on id) → prefix-token self equi-join (keyed on token) →
  * exact verify via two keyed array joins. No cross join, no
  * broadcast of anything data-sized, no driver-side state.
  *
  * Threshold is a rational `tauNum/tauDen` so every pruning and
  * acceptance test is EXACT integer arithmetic (`den·|∩| ≥
  * num·|∪|`) — bit-stable at any parallelism, engine-portable; the
  * only float op is the reported Jaccard value itself (one IEEE
  * division of exact ints).
  */
object SetSim {

  /** All pairs (doc_a < doc_b) whose distinct-token-set Jaccard
    * ≥ tauNum/tauDen. Output: doc_a, doc_b, inter, n_a, n_b, jacc.
    *
    * @param tokens text column → array column; the set elements. Word
    *               n-gram shingles (`TextFunctions.shingles`) make the
    *               relation a near-dup join; plain words make it a
    *               bag-of-words similarity join.
    */
  def jaccardSelfJoin(df: DataFrame, textCol: String, idCol: String,
                      tauNum: Int, tauDen: Int,
                      tokens: org.apache.spark.sql.Column =>
                        org.apache.spark.sql.Column =
                        TextFunctions.words): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"threshold must be a rational in (0,1]: $tauNum/$tauDen")
    // distinct token set per doc; feeds df counts, sizes, the prefix
    // join AND the verify arrays — materialize once (the
    // persist-the-shingle-table step of any similarity pipeline)
    val tok = graft.fanOut(df, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("dfreq"))
    val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("n"))

    // global total order = (df asc, token asc): rarest-first, ties
    // broken lexically — a pure function of the corpus, no dense-rank
    // global window needed (any total order satisfies the filter)
    val rankW = Window.partitionBy(col("id"))
      .orderBy(col("dfreq"), col("token"))
    val prefix = tok
      .join(dfreq, "token") // keyed join; token-cardinality side
      .withColumn("pos", row_number().over(rankW))
      .join(sizes, "id")
      // prefix length |x| − ⌈τ·|x|⌉ + 1 in exact integer arithmetic
      .filter(col("pos") <=
        col("n") - expr(s"($tauNum * n + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("id"), col("token"), col("n"))

    // candidate pairs: prefix ⋈ prefix on the token. The size-ratio
    // filter (J ≤ min/max ⇒ num·max ≤ den·min) rides the join
    // condition so impossible pairs never reach the distinct.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") &&
          col("a.id") < col("b.id") &&
          lit(tauNum) * greatest(col("a.n"), col("b.n")) <=
            lit(tauDen) * least(col("a.n"), col("b.n")))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()

    // exact verify: sorted distinct-token arrays per doc, candidate
    // pairs pick up both sides via keyed joins; |∩| via
    // array_intersect (codegen'd), acceptance in exact integers
    val arrs = tok.groupBy(col("id"))
      .agg(sort_array(collect_list(col("token"))).as("toks"))
    // near-dup-pair output (threshold survivors, corpus-small): seal —
    // materialize, release the persisted token table
    graft.sealResult(cand
      .join(arrs.select(col("id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(arrs.select(col("id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(lit(tauDen) * col("inter") >=
        lit(tauNum) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("n_a"), col("n_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jacc")),
      tok)
  }

  /** Containment self-join: pairs with |A∩B| / min(|A|,|B|) ≥ τ — the
    * ASYMMETRIC near-dup test: a trimmed, quoted, or excerpted doc
    * sits INSIDE a larger one with containment ≈ 1 while its Jaccard
    * can be arbitrarily low (the small set barely dents the union).
    * The curation complement to [[jaccardSelfJoin]]: Jaccard finds
    * same-size near-dups, containment finds subsumption.
    *
    * No prefix filter here — containment's required overlap scales
    * with the SMALLER set, so the prefix bound degenerates (a token
    * of x can always be the one its tiny partner shares). Candidates
    * come from the shared-token equi-join (the E2 shape: keyed,
    * never cartesian; rare-token corpora keep it bounded), and the
    * acceptance test is exact integers: den·|∩| ≥ num·min(|A|,|B|).
    */
  def containmentSelfJoin(df: DataFrame, textCol: String, idCol: String,
                          tauNum: Int, tauDen: Int,
                          tokens: org.apache.spark.sql.Column =>
                            org.apache.spark.sql.Column =
                            TextFunctions.words): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"threshold must be a rational in (0,1]: $tauNum/$tauDen")
    val tok = graft.fanOut(df, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.token") === col("b.token") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    graft.sealResult(inter
      .join(sizes.select(col("id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .filter(lit(tauDen) * col("inter") >=
        lit(tauNum) * least(col("n_a"), col("n_b")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("n_a"), col("n_b"),
        (col("inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment")),
      tok)
  }

  /** Brute-force reference: every shared-token pair, exact filter —
    * the executable spec `jaccardSelfJoin` is asserted against (and
    * the shape prefix filtering exists to avoid).
    */
  def jaccardNaive(df: DataFrame, textCol: String, idCol: String,
                   tauNum: Int, tauDen: Int,
                   tokens: org.apache.spark.sql.Column =>
                     org.apache.spark.sql.Column =
                     TextFunctions.words): DataFrame = {
    val tok = df.select(col(idCol).cast("long").as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.token") === col("b.token") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .filter(lit(tauDen) * col("inter") >=
        lit(tauNum) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("n_a"), col("n_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jacc"))
  }
}
