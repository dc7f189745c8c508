package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, VersionedTable}

/** H34: cross-table atomic snapshots — consistency, time travel,
  * torn-publish invisibility, orphan vacuum.
  */
class SnapshotCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def root(): String =
    Files.createTempDirectory("snapcat").toString

  test("publish is all-or-nothing across tables; reads are consistent") {
    val r = root()
    val s1 = SnapshotCatalog.publish(r, Map(
      "cust" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      "ord" -> Seq((10L, 1L)).toDF("oid", "cust_id")))
    val s2 = SnapshotCatalog.publish(r, Map(
      "cust" -> Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      "ord" -> Seq((10L, 1L), (11L, 3L)).toDF("oid", "cust_id")))
    assert(Seq(s1, s2) == Seq(1L, 2L))
    // latest resolves the PAIR from snapshot 2 — the FK introduced
    // there (cust 3 / ord 11) is visible on both sides together
    assert(SnapshotCatalog.read(spark, r, "cust").count() == 3)
    assert(SnapshotCatalog.read(spark, r, "ord").count() == 2)
    // pinned cross-table time travel: snapshot 1 is the OLD pair
    assert(SnapshotCatalog.read(spark, r, "cust", Some(1L)).count() == 2)
    assert(SnapshotCatalog.read(spark, r, "ord", Some(1L)).count() == 1)
  }

  test("a torn publish (table versions without a manifest) is invisible") {
    val r = root()
    SnapshotCatalog.publish(r,
      Map("t" -> Seq((1L, "x")).toDF("id", "v")))
    // simulate a crash between the table write and the manifest
    // commit: the version lands, the manifest never does
    VersionedTable.write(Seq((9L, "torn")).toDF("id", "v"), s"$r/t")
    assert(VersionedTable.versions(spark, s"$r/t") == Seq(1L, 2L))
    // readers still resolve through the last manifest — v2 invisible
    val got = SnapshotCatalog.read(spark, r, "t")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
    // vacuum sweeps the orphan
    val (dropped, deleted) = SnapshotCatalog.vacuum(spark, r, keep = 1)
    assert(dropped.isEmpty && deleted == 1)
    assert(VersionedTable.versions(spark, s"$r/t") == Seq(1L))
  }

  test("vacuum retention drops old snapshots and their exclusive versions") {
    val r = root()
    (1 to 3).foreach { i =>
      SnapshotCatalog.publish(r,
        Map("t" -> (1 to i).map(j => (j.toLong, s"r$j")).toDF("id", "v")))
    }
    val (dropped, deleted) = SnapshotCatalog.vacuum(spark, r, keep = 1)
    assert(dropped == Seq(1L, 2L))
    assert(deleted == 2) // t versions 1 and 2 were only referenced by them
    // the surviving snapshot still reads fully
    assert(SnapshotCatalog.read(spark, r, "t").count() == 3)
    // pinned reads of dropped snapshots now fail loudly
    intercept[IllegalArgumentException] {
      SnapshotCatalog.read(spark, r, "t", Some(1L))
    }
  }
}
