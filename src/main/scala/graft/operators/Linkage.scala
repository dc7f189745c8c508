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
}
