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
    ext.injectFunction((FunctionIdentifier("zorder2"),
      info("zorder2", "zorder2(bigint, bigint) - 32-bit Morton interleave"),
      (exprs: Seq[Expression]) => ZOrder2(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(string) - Unicode NFC canonical form"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(string, string) - Jaro-Winkler similarity"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(string, k, w) - sorted distinct MOSS winnowing fingerprints"),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("char_entropy"),
      info("char_entropy", "char_entropy(string) - codepoint Shannon entropy (nats)"),
      (exprs: Seq[Expression]) => CharEntropy(exprs.head)))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // opt-in AQP: count(DISTINCT x) → HLL++ under spark.graft.approx.*
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
  }
}
