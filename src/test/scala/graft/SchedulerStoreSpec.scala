package graft

import java.time.{DayOfWeek, LocalDateTime, LocalTime}
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BatchScheduler
import graft.pipeline.BatchScheduler._
import graft.sources.ParquetStagingStore

class SchedulerStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0100 = LocalTime.of(1, 0)

  test("twice-daily windows: 01:00 and 13:00, wrapping past midnight") {
    val s = TwiceDaily(t0100)
    def next(s0: String) = nextRun(s, LocalDateTime.parse(s0)).toString
    assert(next("2026-08-12T00:30:00") == "2026-08-12T01:00")
    assert(next("2026-08-12T01:00:00") == "2026-08-12T13:00") // strictly after
    assert(next("2026-08-12T12:59:59") == "2026-08-12T13:00")
    assert(next("2026-08-12T13:00:01") == "2026-08-13T01:00")
  }

  test("daily and biweekly windows") {
    assert(nextRun(Daily(LocalTime.of(3, 0)),
      LocalDateTime.parse("2026-08-12T03:00:00")).toString == "2026-08-13T03:00")
    // 2026-08-12 is a Wednesday
    val bw = BiWeekly(DayOfWeek.WEDNESDAY, DayOfWeek.SUNDAY, t0100)
    assert(nextRun(bw, LocalDateTime.parse("2026-08-12T02:00:00"))
      .toString == "2026-08-16T01:00") // next Sunday
    assert(nextRun(bw, LocalDateTime.parse("2026-08-12T00:30:00"))
      .toString == "2026-08-12T01:00") // later today
  }

  test("missed-window catch-up matches the reference's startup run") {
    val s = Daily(LocalTime.of(3, 0))
    val now = LocalDateTime.parse("2026-08-12T10:00:00")
    assert(missedWindow(s, None, now)) // never ran → catch up
    assert(missedWindow(s, Some(LocalDateTime.parse("2026-08-11T03:01:00")), now))
    assert(!missedWindow(s, Some(LocalDateTime.parse("2026-08-12T03:01:00")), now))
  }

  test("file lock: exclusive, re-acquirable after release, breaks stale") {
    val p = java.nio.file.Files.createTempDirectory("graft_lock")
      .resolve("lock")
    val l1 = new FileLock(p); val l2 = new FileLock(p)
    assert(l1.tryAcquire())
    assert(!l2.tryAcquire())
    l1.release()
    assert(l2.tryAcquire())
    // stale lock from a dead run is broken
    val l3 = new FileLock(p, java.time.Duration.ofSeconds(1))
    assert(l3.tryAcquire(java.time.Instant.now().plusSeconds(10)))
    l3.release()
  }

  test("ParquetStagingStore read/write/upsert semantics") {
    val store = new ParquetStagingStore(
      java.nio.file.Files.createTempDirectory("graft_store").toString)
    store.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t", SaveMode.Overwrite)
    assert(store.read(spark, "t").count() == 2)
    store.upsert(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), "t", Seq("k"))
    val out = store.read(spark, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }
}
