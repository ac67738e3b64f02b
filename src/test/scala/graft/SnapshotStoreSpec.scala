package graft

import graft.sources.SnapshotStore

/** X141: versioned snapshot tables — linear history, time-travel reads,
  * metadata-only rollback, and the failure contract (a commit that dies
  * before the pointer swap is invisible). */
class SnapshotStoreSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("X141: overwrite/append build linear versions; every old version " +
      "stays readable; rollback is a new metadata-only version") {
    val dir = java.nio.file.Files.createTempDirectory("snap_").toString
    val ss = new SnapshotStore(spark, dir)
    assert(ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      === 1L)
    assert(ss.commitAppend("t", Seq((3L, "c")).toDF("k", "v")) === 2L)
    assert(ss.commitOverwrite("t", Seq((9L, "z")).toDF("k", "v")) === 3L)
    assert(rows(ss.readVersion("t", 1)) === Set((1L, "a"), (2L, "b")))
    assert(rows(ss.readVersion("t", 2)) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(ss.readCurrent("t")) === Set((9L, "z")))
    // rollback: current content returns to v2, but as version 4 —
    // history is append-only and the bad v3 remains auditable
    assert(ss.rollback("t", 2) === 4L)
    assert(rows(ss.readCurrent("t")) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(ss.readVersion("t", 3)) === Set((9L, "z")))
    assert(ss.versions("t") === (1L to 4L))
  }

  test("X141: a commit that dies before the pointer swap leaves the old " +
      "version fully readable; vacuum removes only the orphan") {
    val dir = java.nio.file.Files.createTempDirectory("snap_fail_").toString
    val ss = new SnapshotStore(spark, dir)
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    // the commit's pre-swap half: data + manifest staged, pointer untouched
    ss.stage("t", 2L, Some(Seq((2L, "b")).toDF("k", "v")), Seq("v2"))
    assert(ss.currentVersion("t") === 1L)
    assert(ss.versions("t") === Seq(1L))
    assert(rows(ss.readCurrent("t")) === Set((1L, "a")))
    intercept[IllegalArgumentException](ss.readVersion("t", 2L))
    // vacuum deletes exactly the abandoned dir, not committed data
    assert(ss.vacuum("t") === Seq("v2"))
    assert(rows(ss.readCurrent("t")) === Set((1L, "a")))
    // a retried commit then lands as version 2 and reads back whole
    assert(ss.commitAppend("t", Seq((2L, "b")).toDF("k", "v")) === 2L)
    assert(rows(ss.readCurrent("t")) === Set((1L, "a"), (2L, "b")))
    assert(ss.vacuum("t") === Nil)
  }

  test("X141b: commitMerge applies a CDC diff as a new version; a bad " +
      "merge is undone by metadata-only rollback") {
    val dir = java.nio.file.Files.createTempDirectory("snap_merge_").toString
    val ss = new SnapshotStore(spark, dir)
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val b = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    ss.commitOverwrite("t", a)
    // update 2, delete 3, insert 4 — applied while v1's files are read
    assert(ss.commitMerge("t", "k",
      graft.ops.CdcOps.snapshotDiff(a, b, "k", Seq("v"))) === 2L)
    assert(rows(ss.readCurrent("t")) === Set((1L, "a"), (2L, "B"), (4L, "d")))
    ss.rollback("t", 1L)
    assert(rows(ss.readCurrent("t")) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(ss.readVersion("t", 2L)) ===
      Set((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("X141: unknown versions and first-commit appends fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("snap_err_").toString
    val ss = new SnapshotStore(spark, dir)
    intercept[IllegalArgumentException](
      ss.commitAppend("t", Seq((1L, "a")).toDF("k", "v")))
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException](ss.readVersion("t", 0L))
    intercept[IllegalArgumentException](ss.readVersion("t", 2L))
  }
}
