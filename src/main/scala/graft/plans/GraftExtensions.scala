package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring — the supported injection point for
  * graft's native expressions, so a deployment enables everything with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * and `simhash64` / `rolling_hash` resolve in ANY SQL context
  * (including pure-SQL submission paths where no Scala code runs),
  * unlike session-local temp-function registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash signature"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(string) - 64-bit polynomial content hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<double>, array<double>) - inner product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("sq_dist"),
      info("sq_dist", "sq_dist(array<double>, array<double>) - squared L2 distance"),
      (exprs: Seq[Expression]) => SqDist(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("marker_count"),
      info("marker_count",
        "marker_count(array<string>, marker, ...) - occurrences of any marker"),
      (exprs: Seq[Expression]) => MarkerCount(exprs.head,
        exprs.tail.map(e => e.eval(null).toString))))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
