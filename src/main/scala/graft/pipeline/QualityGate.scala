package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G6: data-quality circuit breaker — the gate between transform and
  * load that the reference's test.py health check runs AFTER the
  * damage is done. A production pipeline wants the inverse: evaluate
  * the batch against its contract BEFORE publishing, abort the load
  * (not the whole run — the TaskDag failure cone handles downstream)
  * when the batch is out of contract, and say precisely WHY in the run
  * log.
  *
  * Composes the existing audit operators rather than re-deriving
  * stats: row-count delta vs the reference batch, per-column profile
  * drift (operators.Validate.profileDrift — null-rate spikes,
  * cardinality collapse, numeric range escape, all exact integer
  * tests), and distribution drift on chosen metric columns
  * (operators.Stats.psi, the 10-bucket population-stability index).
  * Everything reduces to profile-cardinality rows; the only
  * data-sized work is the one profile scan per side and one bucket
  * count per PSI column.
  */
object QualityGate {

  /** One failed check: `check` names the rule, `detail` says what
    * tripped it with the measured numbers.
    */
  final case class Breach(check: String, detail: String)

  final case class Verdict(pass: Boolean, breaches: Seq[Breach]) {
    /** Throw (for TaskDag bodies) when the gate failed. */
    def orAbort(): Unit =
      if (!pass) throw new IllegalStateException(
        "quality gate: " + breaches.map(b => s"${b.check}: ${b.detail}")
          .mkString("; "))
  }

  /** Evaluate `cur` against the reference batch `ref`.
    *
    * @param strCols / numCols columns profiled on both sides
    * @param rowDeltaBp   max |rows_cur − rows_ref| in basis points of
    *                     rows_ref (e.g. 2000 = ±20%)
    * @param nullBpTol    profileDrift null-rate tolerance (bp)
    * @param distinctBpTol profileDrift distinct-count tolerance (bp)
    * @param psiCols      numeric columns PSI-checked at `psiMax`
    *                     (industry convention: 0.1 watch, 0.25 act)
    */
  def evaluate(ref: DataFrame, cur: DataFrame,
               strCols: Seq[String], numCols: Seq[String],
               rowDeltaBp: Long = 2000L,
               nullBpTol: Int = 500, distinctBpTol: Int = 5000,
               psiCols: Seq[String] = Nil,
               psiMax: Double = 0.25,
               log: Option[RunLog] = None): Verdict = {
    import graft.operators.{Stats, Validate}
    val breaches = Seq.newBuilder[Breach]
    val pRef = graft.sealResult(
      Validate.profile(ref, strCols, numCols))
    val pCur = graft.sealResult(
      Validate.profile(cur, strCols, numCols))
    // row-count delta by exact cross-multiplication (no float rates)
    val nRef = pRef.select(max(col("n"))).head.getLong(0)
    val nCur = pCur.select(max(col("n"))).head.getLong(0)
    if (math.abs(nCur - nRef) * 10000L > rowDeltaBp * nRef)
      breaches += Breach("row_count",
        s"rows $nCur vs ref $nRef exceeds ±${rowDeltaBp}bp")
    Validate.profileDrift(pRef, pCur, nullBpTol, distinctBpTol)
      .filter(col("any_drift")).collect().foreach { r =>
        val which = Seq(
          if (r.getAs[Boolean]("null_drift")) Some("null-rate") else None,
          if (r.getAs[Boolean]("nd_drift")) Some("cardinality") else None,
          if (r.getAs[Boolean]("range_escape")) Some("range") else None)
          .flatten.mkString("+")
        breaches += Breach("profile_drift",
          s"${r.getAs[String]("col_name")}: $which " +
            s"(null ${r.getAs[Long]("null_ref")}→${r.getAs[Long]("null_cur")}, " +
            s"distinct ${r.getAs[Long]("nd_ref")}→${r.getAs[Long]("nd_cur")})")
      }
    psiCols.foreach { c =>
      val v = Stats.psi(ref.select(col(c)), cur.select(col(c)), c)
        .head.getAs[Double]("psi")
      if (v > psiMax)
        breaches += Breach("psi", f"$c: $v%.4f > $psiMax%.2f")
    }
    val out = Verdict(breaches.result().isEmpty, breaches.result())
    log.foreach { rl =>
      if (out.pass) rl.log("quality_gate", "batch", "ok")
      else out.breaches.foreach(b =>
        rl.log("quality_gate", "batch", "error",
          "check" -> b.check, "detail" -> b.detail))
    }
    out
  }
}
