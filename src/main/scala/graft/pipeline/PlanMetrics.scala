package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Post-execution physical-plan metrics — the programmatic form of the
  * "is there a shuffle here, and how big" audit the scale rules (§4)
  * prescribe. PlanAuditSpec asserts plan SHAPES at build time; this
  * reads the EXECUTED plan's SQLMetrics after an action, so a pipeline
  * can assert budgets ("this stage must not shuffle", "shuffle volume
  * < X per input GB") against real runs — on a 1000-executor job the
  * same numbers come from the same API, no UI scraping.
  *
  * AQE-aware: `AdaptiveSparkPlanExec`, materialized `QueryStageExec`s,
  * and reused exchanges are traversed into (a reused exchange's
  * metrics would otherwise be counted zero times).
  */
object PlanMetrics {

  final case class Summary(shuffles: Int, broadcasts: Int,
                           shuffleRecords: Long, shuffleBytes: Long)

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ nested).flatMap(nodes)
  }

  private def metric(p: SparkPlan, names: String*): Long =
    names.collectFirst {
      case n if p.metrics.contains(n) => p.metrics(n).value
    }.getOrElse(0L)

  /** IDENTITY-keyed dedup: case-class structural equality would merge
    * two physically separate but structurally identical exchanges
    * (the same subquery scanned twice with reuse disabled),
    * undercounting shuffles — a reused exchange is the same INSTANCE
    * reached twice, which is exactly what reference equality sees.
    */
  private def identityDistinct[T <: AnyRef](xs: Seq[T]): Seq[T] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[T, java.lang.Boolean]())
    xs.filter(seen.add)
  }

  /** Read metrics from an already-executed DataFrame (run an action
    * first — un-executed metrics read as zero, they don't throw).
    * Exchange operators are counted once per physical instance even
    * when the plan reuses them.
    */
  def summarize(df: DataFrame): Summary = {
    val all = identityDistinct(nodes(df.queryExecution.executedPlan))
    val shuffles = identityDistinct(
      all.collect { case s: ShuffleExchangeLike => s })
    val broadcasts = identityDistinct(
      all.collect { case b: BroadcastExchangeLike => b })
    Summary(
      shuffles.size,
      broadcasts.size,
      shuffles.map(metric(_, "shuffleRecordsWritten", "numOutputRows")).sum,
      shuffles.map(metric(_, "shuffleBytesWritten", "dataSize")).sum)
  }
}
