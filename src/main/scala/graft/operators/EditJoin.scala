package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-blocked edit-distance self-join (PassJoin-style; Li, Deng,
  * Feng & Wang's partition scheme — published, public algorithm).
  *
  * The naive blocked form compares every within-block pair with a
  * (banded) levenshtein — O(block²) kernel evaluations. Pigeonhole
  * kills almost all of them: split every indexed string into τ+1
  * contiguous segments; a string within edit distance τ must contain
  * at least one segment VERBATIM, starting within τ of its source
  * position (≤ τ errors can touch at most τ segments, and the
  * error-free segment's aligned copy shifts by at most the errors
  * before it). So:
  *
  *   candidates = equi-join on (block, indexedLen, slot, substring)
  *   result     = candidates verified with banded levenshtein
  *
  * Both sides are linear in the input (τ+1 segment rows indexed per
  * string, ≤ (2τ+1)²(τ+1) probe substrings per string), the join is an
  * ordinary shuffle-partitionable equi-join, and the expensive kernel
  * runs on the (tiny) candidate set instead of every pair. At 100 TB
  * this is the difference between a quadratic per-block blowup and a
  * linear signature pipeline.
  *
  * Strings shorter than τ+1 chars can't produce τ+1 non-empty segments
  * (pigeonhole void), so they are verified brute-force against their
  * whole block — an empty set for real-world name corpora.
  *
  * Reference basis: reference transform dedup compares cleaned names
  * for manual review (transform.py:171 `safe_val` feeds exact-match
  * dedup); this is the scale-correct fuzzy generalization.
  */
object EditJoin {

  /** All (targetLenDelta, slot, shift) probe combos for a given τ. */
  private def probeCombos(tau: Int): Seq[(Int, Int, Int)] =
    for {
      dn <- -tau to tau        // indexed length − probe length
      slot <- 0 to tau
      delta <- -tau to tau     // match-position shift
    } yield (dn, slot, delta)

  /** Self-join: unordered pairs (key_a < key_b) within `blockCol`
    * whose `strCol` values are within edit distance ≤ τ.
    *
    * @return columns (block, key_a, key_b, dist)
    */
  def selfJoin(df: DataFrame, keyCol: String, strCol: String,
               blockCol: String, tau: Int): DataFrame = {
    require(tau >= 1, s"tau must be ≥ 1, got $tau")
    val base = df.select(col(blockCol).as("block"), col(keyCol).as("key"),
        col(strCol).as("str"))
      .filter(col("str").isNotNull)

    // ---- index side: τ+1 segments per string (even split: the first
    // n % (τ+1) segments get the extra char) ----
    val n = length(col("str"))
    def segLen(nc: Column, slot: Column): Column =
      floor(nc / (tau + 1)).cast("int") +
        when(slot < nc % (tau + 1), 1).otherwise(0)
    def segStart(nc: Column, slot: Column): Column =
      (slot * floor(nc / (tau + 1)).cast("int") +
        least(slot, nc % (tau + 1))).cast("int")

    val slots = explode(lit((0 to tau).toArray)).as("slot")
    val index = base.filter(n >= tau + 1)
      .select(col("block"), col("key"), col("str"), n.as("n"), slots)
      .withColumn("seg",
        expr(s"substring(str, ${segStartSql("n", "slot", tau)} + 1, " +
          s"${segLenSql("n", "slot", tau)})"))

    // ---- probe side: for every candidate indexed length n' within ±τ
    // and every slot, the substring of the probe at the slot's start
    // position shifted by each |δ| ≤ τ ----
    // typed struct literals — field access, not per-row string parsing
    val probe = base
      .select(col("block"), col("key"), col("str"), n.as("np"),
        explode(typedLit(probeCombos(tau))).as("combo"))
      .withColumn("dn", col("combo._1"))
      .withColumn("slot", col("combo._2"))
      .withColumn("delta", col("combo._3"))
      .withColumn("n", col("np") + col("dn")) // indexed string's length
      .filter(col("n") >= tau + 1)
      .withColumn("len", segLen(col("n"), col("slot")))
      .withColumn("pos", segStart(col("n"), col("slot")) + col("delta"))
      .filter(col("pos") >= 0 && col("pos") + col("len") <= col("np"))
      .withColumn("seg", expr("substring(str, pos + 1, len)"))
      .select(col("block"), col("key"), col("str"), col("n"), col("slot"),
        col("seg"))
      .distinct() // a probe can hit the same (n, slot, seg) via several δ

    val candidates = probe.as("p")
      .join(index.as("i"),
        col("p.block") === col("i.block") && col("p.n") === col("i.n") &&
          col("p.slot") === col("i.slot") && col("p.seg") === col("i.seg") &&
          col("p.key") < col("i.key"))
      .select(col("p.block").as("block"),
        col("p.key").as("key_a"), col("i.key").as("key_b"),
        col("p.str").as("str_a"), col("i.str").as("str_b"))
      .distinct()

    // ---- pigeonhole-void remainder: strings shorter than τ+1 chars
    // can't be INDEXED (no τ+1 non-empty segments), so pairs whose
    // larger-key member is short are verified brute-force against the
    // block (empty for name-length corpora; correctness backstop).
    // Disjoint from `candidates` by construction: candidates' index
    // side is long-only, this one's is short-only, and both fix the
    // orientation key_a < key_b.
    val short = base.filter(n < tau + 1)
    val shortCand = base.as("p").join(short.as("i"),
        col("p.block") === col("i.block") && col("p.key") < col("i.key"))
      .select(col("p.block").as("block"),
        col("p.key").as("key_a"), col("i.key").as("key_b"),
        col("p.str").as("str_a"), col("i.str").as("str_b"))

    candidates.union(shortCand)
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), tau)
        .cast("long"))
      .filter(col("dist") >= 0)
      .select(col("block"), col("key_a"), col("key_b"), col("dist"))
  }

  // SQL-string forms of the segment arithmetic for use inside expr()
  private def segLenSql(n: String, slot: String, tau: Int): String =
    s"(cast(floor($n / ${tau + 1}) as int) + " +
      s"(case when $slot < $n % ${tau + 1} then 1 else 0 end))"
  private def segStartSql(n: String, slot: String, tau: Int): String =
    s"(cast($slot * floor($n / ${tau + 1}) + " +
      s"least($slot, $n % ${tau + 1}) as int))"
}
