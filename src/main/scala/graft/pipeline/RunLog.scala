package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Operational run log — the reference's logger.py analog
  * (setup_logger's dated file + rotation, log_*_stats per phase,
  * log_pipeline_summary), re-expressed as STRUCTURED JSONL instead of
  * formatted prose: one self-describing record per phase event, so the
  * log is both human-tailable and machine-aggregable (the reference
  * greps its own prose log to build summaries; a JSONL log IS the
  * summary input).
  *
  * Driver-side plain-JVM I/O by design: the run log records
  * orchestration state (phase outcomes, durations, row counts already
  * collected by the driver), never data rows — it must work exactly
  * the same on a laptop and on a 1000-executor cluster, where
  * `dir` would point at shared storage the driver can reach.
  *
  * Files are date-stamped like the reference (`etl_<yyyyMMdd>.jsonl`)
  * and size-rotated within the day (`.1` … `.maxFiles`, newest-first
  * shift — RotatingFileHandler semantics): an unattended scheduler
  * loop can run for months without unbounded growth.
  *
  * Record shape (flat, stable keys first):
  * {"ts":"2024-01-01T00:00:00Z","run_id":"…","phase":"extract",
  *  "entity":"customers","status":"ok","duration_ms":123,
  *  "rows_out":5022,…extra fields…}
  */
final class RunLog(dir: String, val runId: String,
                   maxBytes: Long = 10L * 1024 * 1024,
                   maxFiles: Int = 5,
                   echo: Boolean = true,
                   clock: () => java.time.Instant =
                     () => java.time.Instant.now()) {

  private val dirPath: Path = Paths.get(dir)
  Files.createDirectories(dirPath)

  private def today: String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .withZone(java.time.ZoneOffset.UTC).format(clock())

  def currentFile: Path = dirPath.resolve(s"etl_$today.jsonl")

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => if (n.isNaN || n.isInfinite) "null" else n.toString
    case n: Float => jsonVal(n.toDouble)
    case s => "\"" + esc(s.toString) + "\""
  }

  /** Shift .maxFiles−1 → gone, .i → .i+1, current → .1 (newest-first,
    * RotatingFileHandler semantics). Called before an append that
    * would grow the file past `maxBytes`.
    */
  private def rotate(f: Path): Unit = {
    val last = dirPath.resolve(s"${f.getFileName}.$maxFiles")
    Files.deleteIfExists(last)
    for (i <- (maxFiles - 1) to 1 by -1) {
      val from = dirPath.resolve(s"${f.getFileName}.$i")
      if (Files.exists(from))
        Files.move(from, dirPath.resolve(s"${f.getFileName}.${i + 1}"))
    }
    if (Files.exists(f))
      Files.move(f, dirPath.resolve(s"${f.getFileName}.1"))
  }

  /** Append one structured record. `fields` go after the standard
    * keys; values are rendered as JSON numbers/booleans when they are,
    * strings otherwise.
    */
  def log(phase: String, entity: String, status: String,
          fields: (String, Any)*): Unit = synchronized {
    val std = Seq(
      "ts" -> clock().toString,
      "run_id" -> runId,
      "phase" -> phase,
      "entity" -> entity,
      "status" -> status)
    val line = (std ++ fields)
      .map { case (k, v) => "\"" + esc(k) + "\":" + jsonVal(v) }
      .mkString("{", ",", "}")
    val f = currentFile
    if (Files.exists(f) &&
        Files.size(f) + line.length + 1 > maxBytes) rotate(f)
    Files.write(f, (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    if (echo) println(s"[etl] $phase $entity: $status " +
      fields.map { case (k, v) => s"$k=$v" }.mkString(" "))
  }

  /** Run `body`, recording duration and ok/error status; errors are
    * logged (exception class + message, the reference's log_error) and
    * rethrown — the log never swallows a failure.
    */
  def timed[T](phase: String, entity: String,
               fields: T => Seq[(String, Any)] = (_: T) => Nil)
              (body: => T): T = {
    val t0 = System.nanoTime()
    try {
      val r = body
      log(phase, entity, "ok",
        (fields(r) :+ ("duration_ms" -> (System.nanoTime() - t0) / 1000000L)): _*)
      r
    } catch {
      case scala.util.control.NonFatal(ex) =>
        log(phase, entity, "error",
          "error_class" -> ex.getClass.getName,
          "error" -> String.valueOf(ex.getMessage),
          "duration_ms" -> (System.nanoTime() - t0) / 1000000L)
        throw ex
    }
  }
}

object RunLog {
  /** Fresh run id: UTC second timestamp + 4 hex of randomness — sorts
    * chronologically, collides never in practice.
    */
  def newRunId(): String = {
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    f"$ts-${scala.util.Random.nextInt(0x10000)}%04x"
  }

  /** Aggregate a day's JSONL into per-phase totals — the reference's
    * log_pipeline_summary, derived FROM the log instead of carried in
    * parallel dicts. Purely driver-side string work over a file the
    * driver wrote; no Spark session involved.
    *
    * @return (phase, n_ok, n_error, sum of rows_out over ok records)
    */
  def summarize(file: Path): Seq[(String, Long, Long, Long)] = {
    if (!Files.exists(file)) return Nil
    val phaseRe = """"phase":"([^"]*)"""".r
    val statusRe = """"status":"([^"]*)"""".r
    val rowsRe = """"rows_out":(-?\d+)""".r
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(Files.readAllLines(file)).asScala
    lines.toSeq
      .flatMap { l =>
        for (p <- phaseRe.findFirstMatchIn(l);
             s <- statusRe.findFirstMatchIn(l))
          yield (p.group(1), s.group(1),
            rowsRe.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(0L))
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (phase, rs) =>
        (phase,
          rs.count(_._2 == "ok").toLong,
          rs.count(_._2 == "error").toLong,
          rs.filter(_._2 == "ok").map(_._3).sum)
      }
  }
}
