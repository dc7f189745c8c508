package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi & Sunter (JASA 1969), the
  * canonical match/non-match decision theory, in an EXACT-RATIONAL
  * formulation so the scores are engine-deterministic and hash-
  * gateable (the textbook log₂(m/u) weight sums are transcendental
  * sums — the q_lm_score trap).
  *
  * Model: for candidate pair (a, b) and comparison fields i,
  *   LR = Π_i  agreeᵢ ? mᵢ/uᵢ : (1−mᵢ)/(1−uᵢ)
  * with mᵢ (P(agree | same entity)) a fixed rational prior mNum/mDen
  * (9/10 default — the standard assumption absent labeled pairs) and
  * uᵢ (P(agree | random pair)) ESTIMATED FROM THE DATA exactly:
  *   uᵢ = Σ_v n_v(n_v−1) / (N(N−1))
  * — the collision probability of the field's empirical distribution,
  * all integers. Each pair's LR is then a ratio of products of Long
  * constants, carried in DECIMAL(38,0) (3 fields at 15k records ≈
  * 10²⁸, inside decimal range) and emitted as lr_micro = ⌊LR·10⁶⌋ via
  * integral division — exact on any engine.
  *
  * Plan shape: one aggregate per field for the u statistics (tiny,
  * collected — they become PLAN-TIME constants in the pair predicate),
  * then ONE blocked self-join (the only data-sized shuffle, keyed on
  * the block column) with the field comparisons evaluated in-row. At
  * 100 TB blocking is the whole game (Newcombe's insight predating
  * FS): the join never leaves the block's key partition.
  *
  * @param blockCol  equality blocking key (pairs only form within it)
  * @param fields    comparison field columns (agree = exact equality)
  * @param minLrMicro decision threshold on lr_micro (LR·10⁶)
  * @return (id_a, id_b, n_agree, lr_micro) — candidate pairs at or
  *         above the threshold.
  */
object Linkage {

  def fsLinkage(df: DataFrame, idCol: String, blockCol: String,
                fields: Seq[String], mNum: Long = 9L, mDen: Long = 10L,
                minLrMicro: Long = 4000000L): DataFrame = {
    require(fields.nonEmpty && fields.size <= 4,
      s"1..4 comparison fields (decimal headroom): $fields")
    // exact u statistics: one count aggregate per field, k tiny rows
    // to the driver — they become plan-time Long constants below
    val n = df.count()
    require(n >= 2, "need at least two records")
    val uDen = n * (n - 1)
    val uNums = fields.map { f =>
      f -> df.groupBy(col(f)).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1)")).cast("long")).head.getLong(0)
    }
    uNums.foreach { case (f, uNum) =>
      require(uNum > 0 && uNum < uDen,
        s"degenerate field $f: constant or all-distinct (u=$uNum/$uDen)")
    }
    // the LR is a pure function of the k agreement bits — 2^k values,
    // computed ONCE on the driver in exact BigInt arithmetic (per
    // field: agree → (mNum·uDen)/(mDen·uNum), disagree →
    // ((mDen−mNum)·uDen)/(mDen·(uDen−uNum)); positive integral
    // division at the end). The per-pair hot path is then a single
    // array lookup on the bit pattern — no wide-decimal math per row
    // (the first cut did DECIMAL(38,0) products per pair: 2× the
    // whole query's cost at sf0.1).
    val lrByPattern: Seq[Long] = (0 until (1 << fields.size)).map { bits =>
      var num = BigInt(1000000)
      var den = BigInt(1)
      uNums.zipWithIndex.foreach { case ((_, uNum), i) =>
        if ((bits & (1 << i)) != 0) {
          num *= BigInt(mNum) * uDen; den *= BigInt(mDen) * uNum
        } else {
          num *= BigInt(mDen - mNum) * uDen
          den *= BigInt(mDen) * (uDen - uNum)
        }
      }
      (num / den).toLong
    }
    val prepared = df.select(col(idCol).as("id") +: col(blockCol).as("blk") +:
      fields.map(f => col(f)): _*)
    val a = prepared.toDF("id" +: "blk" +: fields.map(f => s"${f}_a"): _*)
    val b = prepared.toDF("idb" +: "blk" +: fields.map(f => s"${f}_b"): _*)
    val agrees = fields.map(f => col(s"${f}_a") === col(s"${f}_b"))
    val bits = agrees.zipWithIndex
      .map { case (c, i) => when(c, 1 << i).otherwise(0) }
      .reduce(_ + _)
    a.join(b, Seq("blk")).filter(col("id") < col("idb"))
      .withColumn("lr_micro",
        element_at(typedLit(lrByPattern), bits + 1))
      .filter(col("lr_micro") >= minLrMicro)
      .select(col("id").as("id_a"), col("idb").as("id_b"),
        agrees.map(when(_, 1L).otherwise(0L)).reduce(_ + _).as("n_agree"),
        col("lr_micro"))
  }

  /** H41: blocking-scheme evaluation (Newcombe blocking quality) —
    * the pre-flight number for [[fsLinkage]]'s ONE data-sized join:
    * how many candidate pairs a blocking key generates (reduction
    * ratio) and how many TRUE matches it retains (pairs
    * completeness), computed from block SIZES and a truth-pair
    * block-agreement join — the candidate pairs themselves are NEVER
    * materialized (Σ n(n−1)/2 from the size table), which is the
    * whole point of evaluating a blocking scheme before running it
    * at 100 TB.
    *
    * All exact integers (long — the q_join_size precedent; the
    * micro-unit numerators need total_pairs ≤ 9.2e12, i.e. N ≤ ~4M
    * entities per profile run — sample or widen to decimal beyond).
    *
    * @param truthPairs ground-truth match pairs (id_a, id_b).
    * @return one row: (n_entities, n_blocks, cand_pairs, total_pairs,
    *         reduction_micro, n_truth, n_covered, completeness_micro).
    */
  def blockingProfile(df: DataFrame, idCol: String, blockCol: String,
                      truthPairs: DataFrame): DataFrame = {
    val ents = df.select(col(idCol).as("id"), col(blockCol).as("blk"))
    val sizes = ents.groupBy(col("blk")).agg(count(lit(1)).as("n"))
    val blockStats = sizes.agg(
      sum(col("n")).as("n_entities"),
      count(lit(1)).as("n_blocks"),
      expr("sum(n * (n - 1)) div 2").as("cand_pairs"))
    val withTotal = blockStats.withColumn("total_pairs",
      expr("n_entities * (n_entities - 1) div 2"))
    val covered = truthPairs
      .join(ents.select(col("id").as("id_a"), col("blk").as("__ba")), "id_a")
      .join(ents.select(col("id").as("id_b"), col("blk").as("__bb")), "id_b")
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("__ba") === col("__bb"), 1L).otherwise(0L))
          .as("n_covered"))
    withTotal.crossJoin(broadcast(covered)).select(
      col("n_entities"), col("n_blocks"), col("cand_pairs"),
      col("total_pairs"),
      expr("((total_pairs - cand_pairs) * 1000000) div total_pairs")
        .as("reduction_micro"),
      col("n_truth"), col("n_covered"),
      expr("(1000000 * n_covered) div n_truth").as("completeness_micro"))
  }
}
