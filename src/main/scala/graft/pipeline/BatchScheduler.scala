package graft.pipeline

import java.time.{Duration, LocalDateTime, LocalTime}

/** Batch-window scheduling (SURVEY §2.G2) — the reference's
  * `BankingBatchScheduler` (main.py:321): twice-daily / daily /
  * biweekly windows, a concurrency lock, and a catch-up run at startup.
  *
  * The production-grade Spark-native form of all of this is Structured
  * Streaming (`Trigger.AvailableNow` per window + checkpointing as the
  * lock — see StreamingSpec); this class keeps the reference's
  * cron-style surface for deployments that want explicit windows. The
  * window arithmetic is a PURE function (`nextRun`) so it is testable
  * without sleeping.
  */
object BatchScheduler {

  sealed trait Schedule
  /** Runs at `anchor` and `anchor`+12h every day. */
  final case class TwiceDaily(anchor: LocalTime) extends Schedule
  final case class Daily(at: LocalTime) extends Schedule
  /** Runs on two fixed days of week at `at` (reference: Wed + Sun). */
  final case class BiWeekly(day1: java.time.DayOfWeek,
                            day2: java.time.DayOfWeek,
                            at: LocalTime) extends Schedule

  /** Earliest scheduled instant strictly after `now`. */
  def nextRun(schedule: Schedule, now: LocalDateTime): LocalDateTime =
    schedule match {
      case TwiceDaily(anchor) =>
        val slots = Seq(anchor, anchor.plusHours(12)).sorted
          .map(t => now.toLocalDate.atTime(t))
        (slots ++ slots.map(_.plusDays(1))).filter(_.isAfter(now)).min
      case Daily(at) =>
        val today = now.toLocalDate.atTime(at)
        if (today.isAfter(now)) today else today.plusDays(1)
      case BiWeekly(d1, d2, at) =>
        (0 to 7).iterator
          .map(i => now.toLocalDate.plusDays(i.toLong).atTime(at))
          .filter(t => t.getDayOfWeek == d1 || t.getDayOfWeek == d2)
          .filter(_.isAfter(now))
          .next()
    }

  /** Whether a catch-up ("health check") run should fire at startup:
    * the reference always runs once on start (main.py:338); here it is
    * conditional on having missed the previous window.
    */
  def missedWindow(schedule: Schedule, lastRun: Option[LocalDateTime],
                   now: LocalDateTime): Boolean =
    lastRun match {
      case None => true
      case Some(last) =>
        // a window was missed iff the next run after `last` is ≤ now
        !nextRun(schedule, last).isAfter(now)
    }

  /** File-based concurrency lock (the reference's in-process lock,
    * made multi-process-safe): atomically created, stale after
    * `staleAfter`.
    */
  final class FileLock(path: java.nio.file.Path,
                       staleAfter: Duration = Duration.ofHours(6)) {
    def tryAcquire(now: java.time.Instant = java.time.Instant.now()): Boolean =
      try {
        java.nio.file.Files.createFile(path)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val mtime = java.nio.file.Files.getLastModifiedTime(path).toInstant
          if (Duration.between(mtime, now).compareTo(staleAfter) > 0) {
            java.nio.file.Files.deleteIfExists(path)
            tryAcquire(now) // stale lock from a dead run: break it
          } else false
      }

    def release(): Unit = java.nio.file.Files.deleteIfExists(path)
  }
}
