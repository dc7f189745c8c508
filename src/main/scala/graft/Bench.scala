package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Clean-floor band for the sf-independent canary job on this host:
    * min-of-3 floors over ~12 canary-clean runs band 0.066–0.12s
    * (SURVEY §7g.2). Recorded in the artifact so a reader can judge
    * the window without repo archaeology.
    */
  val CleanFloorBand: (Double, Double) = (0.066, 0.12)

  /** Floor plausibility gate = band ceiling + 25% host-drift headroom.
    * (r8 VERDICT #2) The endpoint-ratio tests anchor on
    * min(floor, post) and so absolve a window that was ALREADY
    * degraded at warm-up whenever the post sample lands clean:
    * BENCH_r08's accepted attempt had floor 0.172 (~2× the clean
    * band) with post 0.113 — ratio-clean, absolute-backstop-clean —
    * and recorded per-query outliers at 4.4× their solo re-times.
    * Past this gate the window is not clean no matter what the post
    * says; the absolute 0.35 backstop stays as the
    * sustained-contention catch for hosts with no recorded band.
    */
  val FloorGate: Double = CleanFloorBand._2 * 1.25

  /** Absolute gate for the worst MID-sweep sample (VERDICT r10 #5):
    * r9 and r10 both recorded mids above the clean-floor band ceiling
    * (0.136, 0.164) while reporting contended=false, because the mid
    * was only checked RELATIVE to min(floor, post) — clean endpoints
    * absolved a degraded middle, which is exactly the window shape
    * that manufactured the r9 q_knn_eval 3.55× scare. Mid samples are
    * now min-of-3 (a lone GC-debt single can't fake contention), so
    * they're held to the same absolute plausibility bar as the floor.
    */
  val MidGate: Double = FloorGate

  /** Clean-band median floor on this host (§7g.2: min-of-3 floors band
    * 0.066–0.12 over ~12 canary-clean runs; 0.35 documented as ~3× the
    * clean median). The reference point for [[windowScale]].
    */
  val CleanFloorRef: Double = 0.088

  /** VERDICT r11 #1: per-window speed calibration. The round-10→11
    * cross-round comparison lost its meaning to host-window luck — the
    * r10 driver window was anomalously FAST, so r11 showed a phantom
    * +8.8%/query with 17 untouched queries 1.2–1.54× up while the
    * builder's close sweeps read parity. window_scale = best endpoint
    * canary / clean-median reference: > 1 ⇒ this window's host ran
    * slower than the recorded clean median, < 1 ⇒ faster (the r10
    * shape). Cross-round ratios divide by it (drift-corrected ratio =
    * (t_b / scale_b) / (t_a / scale_a)); the raw samples stay in the
    * artifact untouched.
    */
  def windowScale(floor: Double, post: Double): Double =
    math.min(floor, post) / CleanFloorRef

  /** VERDICT r11 #1b: the previous artifact's top-k slowest queries —
    * the set whose auto re-time trigger drops from 2.5× to 1.5×. A
    * uniform ≤1.5× slow-tail drift passed unflagged through r11; the
    * tail is where cross-round claims live, so it re-times on a
    * tighter leash while the sub-tail keeps the 2.5× noise guard.
    */
  def slowTail(prevTimes: Map[String, Double], k: Int = 20): Set[String] =
    prevTimes.toSeq.sortBy { case (n, t) => (-t, n) }
      .take(k).map(_._1).toSet

  /** Auto re-time trigger for one query given the previous artifact's
    * slow-tail set (unit-tested with a synthetic slow window in
    * Round12OpsSpec).
    */
  def retimeThreshold(name: String, tail: Set[String]): Double =
    if (tail(name)) 1.5 else 2.5

  /** The contention verdict for one sweep attempt (unit-tested in
    * Round9OpsSpec: a floor-0.172/post-0.113 window — BENCH_r08's —
    * flags; a clean window passes).
    */
  def isContended(floor: Double, mid: Double, post: Double): Boolean = {
    val ref = math.min(floor, post)
    ref > 0.35 ||
      floor > FloorGate ||
      mid > MidGate ||
      math.max(floor, post) > 3 * ref ||
      mid > 4 * ref
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/EtlMain/tests: the MICROS events.parquet read
      // casts NTZ -> TimestampType, which is identity only in UTC — a
      // non-UTC host would silently benchmark a shifted workload
      .config("spark.sql.session.timeZone", "UTC")
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
    // equalize the OS page-cache state before timing anything: the
    // measured sweep is the FIRST sf-dir access (warm-up reads the
    // sf0.001 sibling), so a bench taken hours after the last sf read
    // pays cold virtio reads concentrated in the earliest queries
    // (observed: q_bfs 4.19s cold vs 0.85s cached — iterative queries
    // re-read parquet per job and multiply the latency). The CPU-only
    // canary cannot see disk state, so pre-fault the bytes instead.
    def prefault(dir: String): Unit = {
      val buf = new Array[Byte](1 << 20)
      def walk(f: java.io.File): Unit =
        // listFiles() is null for unreadable/missing dirs (e.g. a bad
        // SPARK_GRAFT_WARM_DIR) — skip rather than NPE before measuring
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
        else if (f.getName.endsWith(".parquet")) {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      walk(new java.io.File(dir))
    }
    prefault(sfDir); prefault(warmDir)
    // validity canary (round-4 lesson: BENCH_r04 was recorded under host
    // contention — a trivial `when`-ladder scan at 7.67s — and read as a
    // regression until re-measured). A fixed sf-independent micro-job is
    // timed after warm-up (floor = best of 3) and again after the sweep;
    // a run whose canary inflates >3× its own floor, or whose floor is
    // itself implausible for this job shape, self-flags as contended so
    // the recorded JSON is never mistaken for a clean measurement.
    // the canary must measure HOST health, not this run's own block-
    // manager debris: sweep caches + checkpoint RDDs before timing it
    // (same prelude every measured query gets)
    def sweep(): Unit = {
      spark.catalog.clearCache()
      // round-12 measurement hygiene: BLOCKING unpersist — the async
      // form let block-removal work from one query's debris land
      // inside the NEXT query's timed window (the sweep itself is
      // untimed, so waiting here is free accuracy)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def canary(): Double = {
      sweep()
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32).selectExpr("sum(id % 7)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    canary() // absorb codegen for the canary itself
    // best-of-N per query: local-mode timings are scheduling-noise-bound
    // at small SF; min is the standard stable estimator
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // the kernel-bound string-similarity queries ride C2's compilation
    // curve: their first measured iterations can be ~2× steady state
    // (SURVEY §7 root-caused the q_setsim_join band to JIT warm-up),
    // so they iterate more by default — recorded tails are C2-hot
    // numbers, not warm-up-curve samples
    val jitSensitive = Set("q_setsim_join", "q_jaro_winkler",
      "q_fuzzy_match", "q_edit_join", "q_winnow_pairs")
    def itersFor(name: String) =
      if (jitSensitive(name)) math.max(iters, 4) else iters
    // endpoint canaries are blind to contention that starts and ends
    // MID-run (observed: a 163s canary-clean run beside 141s cleans —
    // the interference was over before the post sample); sample the
    // canary periodically during the sweep and flag on the worst.
    val sorted = queries.toSeq.sortBy(_._1)
    val midEvery = math.max(1, sorted.size / 16)
    // one full measured sweep with its own floor/mid/post canaries and
    // contention verdict — extracted so a contended attempt can be
    // RETRIED rather than recorded (BENCH_r04 and BENCH_r06 were both
    // environment-corrupted driver artifacts; the canary detected the
    // contention but the run had no way to recover)
    case class Attempt(results: Seq[(String, Double)], floor: Double,
                       mid: Double, post: Double, contended: Boolean)
    def runSweep(): Attempt = {
      val canaryFloor = (1 to 3).map(_ => canary()).min
      val midSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
      val results = sorted.zipWithIndex.map { case ((name, fn), qi) =>
        // operators persist() intermediates and a 250-query run never
        // revisits them — without clearing, the block manager accretes
        // hundreds of dead cached datasets and late-alphabet queries
        // pay eviction churn + GC (observed: a trivial count inflating
        // 0.4s → 3s near the end of a full run). clearCache only reaches
        // CacheManager entries; sealed results also carry RDD-level
        // localCheckpoint blocks — sweep those too.
        sweep()
        // min-of-3 per sample point (r10 #5: mids are now gated
        // ABSOLUTELY at MidGate, so one or two GC-debt singles must
        // die in the min; a real interference window — seconds-long —
        // still survives all three)
        if (qi > 0 && qi % midEvery == 0)
          midSamples += (1 to 3).map(_ => canary()).min
        val times = (1 to itersFor(name)).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case scala.util.control.NonFatal(ex) =>
              System.err.println(s"bench run failed for $name: $ex")
          }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
      // symmetric with the floor: best-of-3 after a GC. A single post
      // sample right after 260 queries measures the run's own heap debt
      // (observed: 0.35s single vs 0.1s floor on an idle box, while
      // genuine host contention shows 10-70× on this job); min-of-3 on
      // a collected heap isolates the host signal the flag exists for.
      System.gc()
      val canaryPost = (1 to 3).map(_ => canary()).min
      // worst min-of-2 mid sample: calibrated on observed runs —
      // degraded sweeps (151-190s beside 141-155s cleans) showed mids
      // of 0.44-0.68 vs 0.07-0.10 clean canaries, while endpoint
      // canaries read clean; GC-debt singles (~0.35) die in the min.
      // All ratios anchor on min(floor, post), NOT the floor alone: a
      // run whose contention was already active at warm-up records an
      // inflated floor that would absolve every later sample (observed:
      // floor 0.153 = 2× clean, mid 0.582, post 0.077 — a 190s run that
      // floor-relative tests called clean). The absolute bound is the
      // sustained-contention backstop (canary inflated for the WHOLE
      // run): clean floors on this box band 0.066-0.12 over ~12 runs,
      // so 0.35 is ~3× the clean median with headroom for host drift.
      val canaryMid =
        if (midSamples.isEmpty) canaryFloor else midSamples.max
      val contended = isContended(canaryFloor, canaryMid, canaryPost)
      Attempt(results, canaryFloor, canaryMid, canaryPost, contended)
    }
    // retry the whole sweep when the canary trips (up to maxAttempts
    // total), so the recorded artifact is clean whenever the host
    // allows a clean window; every attempt's canary metadata survives
    // into the JSON as proof of what the host permitted
    val maxAttempts =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "3").toInt.max(1)
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Attempt]
    var done = false
    while (!done) {
      attempts += runSweep()
      done = !attempts.last.contended || attempts.size >= maxAttempts
      if (!done) {
        System.err.println(s"bench attempt ${attempts.size} contended " +
          s"(floor=${attempts.last.floor}, mid=${attempts.last.mid}, " +
          s"post=${attempts.last.post}) — retrying after backoff")
        Thread.sleep(15000L * attempts.size) // let the interference pass
      }
    }
    // record the first clean attempt; if the host never allowed one,
    // the least-contended (smallest mid canary) attempt with its flag
    val chosen = attempts.find(!_.contended)
      .getOrElse(attempts.minBy(_.mid))
    // ---- per-query outlier re-time (VERDICT r9 #1) ----------------
    // BENCH_r09 recorded q_knn_eval at 3.55× its r8 value inside an
    // otherwise clean window (mid 0.136 just above the clean band);
    // round-8 precedent is that such spikes re-time at historical
    // values solo. Make that re-time AUTOMATIC: any query reading
    // >2.5× its previous-round artifact value is re-timed once, both
    // samples recorded ("retimed" field), and the final map carries
    // the min — the best clean-steady-state estimate — so a drifted
    // window can no longer plant an unexplained outlier in the record.
    // Previous artifact: SPARK_GRAFT_BENCH_PREV, else newest
    // BENCH_r*.json in cwd; per-query values regex-extracted (the
    // artifact's parsed.queries holds the slow tail — exactly where
    // outliers live; sub-tail queries are too cheap to flag).
    // newest = largest NUMERIC round, not lexicographic filename —
    // zero-padding is what made raw sort work through r10, and
    // BENCH_r100 vs BENCH_r99 would silently pick the stale baseline
    val roundRe = "BENCH_r(\\d+)\\.json".r
    val prevPath = sys.env.get("SPARK_GRAFT_BENCH_PREV").orElse {
      Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .map(_.getName).flatMap(n => roundRe.findFirstMatchIn(n)
          .filter(_.matched == n).map(m => (m.group(1).toInt, n)))
        .sortBy(_._1).lastOption.map(_._2)
    }
    val prevTimes: Map[String, Double] = prevPath.map { p =>
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")
        "\"(q_[a-z0-9_]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case scala.util.control.NonFatal(_) =>
        Map.empty[String, Double] }
    }.getOrElse(Map.empty)
    val fnByName = queries
    val retimed = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double)]
    // top-20 slow tail of the previous artifact re-times at 1.5×, the
    // rest at 2.5× (VERDICT r11 #1: a uniform ≤1.5× tail drift passed
    // unflagged and rode host luck into the cross-round story)
    val tail = slowTail(prevTimes)
    val results = chosen.results.map { case (name, t) =>
      val outlier = prevTimes.get(name).exists(prev =>
        prev > 0 && t > retimeThreshold(name, tail) * prev && t > 0.5)
      if (!outlier) name -> t
      else {
        sweep()
        // a failed iteration must not contribute its (near-zero)
        // elapsed time as a "fast" sample — count it as +Inf, and if
        // EVERY iteration failed, skip the retime and keep the
        // original sample (the retimed field only ever records real
        // completed runs)
        val again = (1 to itersFor(name)).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fnByName(name)(spark, sfDir).count(); true }
          catch {
            case scala.util.control.NonFatal(ex) =>
              System.err.println(s"re-time failed for $name: $ex")
              false
          }
          if (ok) (System.nanoTime() - t0) / 1e9
          else Double.PositiveInfinity
        }.min
        if (again.isInfinite) {
          System.err.println(s"re-time of $name never completed — " +
            "keeping the original sample")
          name -> t
        } else {
          retimed += name -> ((t, again))
          name -> math.min(t, again)
        }
      }
    }
    val (canaryFloor, canaryMid, canaryPost, contended) =
      (chosen.floor, chosen.mid, chosen.post, chosen.contended)
    // ---- budgeted-sampler pair budgets (VERDICT r11 #4) ------------
    // the realized (n, mod, sampled queries, pairs) of the sampler
    // family at THIS sf, computed after the sweep (never perturbs the
    // timings): lets a reader decide whether a q_hard_negatives /
    // q_knn_eval spread across windows is host drift (same pairs) or
    // data-dependent work (different pairs)
    val pairBudgetsJson = try {
      val emb = graft.table(spark, sfDir, "embeddings")
      val (n, mod, q, pairs) =
        operators.Similarity.samplerStats(emb, "vec_id")
      val (bn, bmod, bq, bpairs) =
        operators.Similarity.blockSamplerStats(emb, "vec_id", "label")
      s""""pair_budgets":{"id_mod":{"n":$n,"mod":$mod,"q":$q,"pairs":$pairs},"block":{"n":$bn,"mod":$bmod,"q":$bq,"pairs":$bpairs}},"""
    } catch { case scala.util.control.NonFatal(ex) =>
      System.err.println(s"pair-budget probe failed: $ex"); ""
    }
    // millisecond precision keeps the JSON line short enough to survive
    // log-tail truncation by whatever captures our stdout (the r01 line
    // at full double precision was ~2.9k chars and got clipped)
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qsMap(entries: Seq[(String, Double)]) = entries
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The captured stdout window is a ~2000-char TAIL (observed in
    // BENCH_r0{1,2}.json), and the driver JSON-parses the last line.
    // So the LAST line must be (a) valid JSON and (b) short enough that
    // the 2000-char tail never clips its front. Print the full
    // per-query map FIRST (for humans / local logs), then a compact
    // summary line whose "queries" holds the slowest entries that fit
    // a 1500-char budget — the informative tail of the distribution.
    // sbt's "[success]" epilogue is suppressed via Global/showSuccess.
    val attemptsJson = attempts
      .map(a => s"""{"floor":${fmt(a.floor)},"mid":${fmt(a.mid)},"post":${fmt(a.post)},"contended":${a.contended}}""")
      .mkString("[", ",", "]")
    val retimedJson =
      if (retimed.isEmpty) ""
      else retimed.map { case (k, (a, b)) =>
        "\"" + k + "\":[" + fmt(a) + "," + fmt(b) + "]"
      }.mkString(""""retimed":{""", ",", "},")
    val canaryJson = s"""$retimedJson$pairBudgetsJson"canary_floor":${fmt(canaryFloor)},"canary_mid":${fmt(canaryMid)},"canary_post":${fmt(canaryPost)},"window_scale":${fmt(windowScale(canaryFloor, canaryPost))},"contended":$contended,"floor_band":[${fmt(CleanFloorBand._1)},${fmt(CleanFloorBand._2)}],"floor_gate":${fmt(FloorGate)},"attempts":$attemptsJson"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qsMap(results)},$canaryJson,"sf":"$sfDir"}""")
    val bySlowest = results.sortBy(-_._2)
    val keep = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // attempts metadata can add ~70 chars per retry to the tail line,
    // and each retimed entry ~35 — shave the per-query budget so the
    // compact line still survives a 2000-char tail capture
    var budget = 1500 - 80 * (attempts.size - 1) - retimedJson.length -
      pairBudgetsJson.length
    bySlowest.foreach { case (k, v) =>
      val cost = k.length + 12
      if (budget - cost >= 0) { keep += ((k, v)); budget -= cost }
    }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":${qsMap(keep.toSeq.sortBy(_._1))},$canaryJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
