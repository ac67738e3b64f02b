package graft

import org.apache.spark.sql.functions._
import graft.ops.CdcOps

/** Pins the CDC operators: diff classification on a hand fixture, the
  * MERGE round trip applyDiff(A, diff(A,B)) ≡ B at row level, and diff
  * self-identity (diff(B,B) is all-unchanged).
  */
class CdcOpsSpec extends SparkSpec {

  import spark.implicits._

  private val cmp = Seq("v", "w")

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("k", "v", "w")

  test("snapshotDiff classifies insert / delete / update / unchanged") {
    val a = snap((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
    val b = snap((1L, "x", 10L), (2L, "y", 99L), (4L, "n", 40L))
    val got = CdcOps.snapshotDiff(a, b, "k", cmp)
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "update",
      3L -> "delete", 4L -> "insert"))
  }

  test("applyDiff(A, diff(A,B)) reproduces B exactly") {
    // pseudo-random snapshots with all four change classes, many partitions
    val a = spark.range(0, 2000)
      .select(col("id").as("k"), concat(lit("v"), col("id") % 7).as("v"),
        (col("id") * 31 % 1000).as("w"))
      .filter(col("id") % 11 =!= 3) // these become inserts
      .repartition(13)
    val b = spark.range(0, 2000)
      .select(col("id").as("k"), concat(lit("v"), col("id") % 7).as("v"),
        when(col("id") % 5 === 0, col("id") * 31 % 1000 + 1)
          .otherwise(col("id") * 31 % 1000).as("w")) // %5 → updates
      .filter(col("id") % 13 =!= 4) // these become deletes
      .repartition(7)
    val applied = CdcOps.applyDiff(
      a, CdcOps.snapshotDiff(a, b, "k", cmp), "k")
    val gotRows = applied.as[(Long, String, Long)].collect().toSet
    val wantRows = b.as[(Long, String, Long)].collect().toSet
    assert(gotRows == wantRows)
  }

  test("diff of a snapshot with itself is all-unchanged") {
    val b = snap((1L, "x", 10L), (2L, "y", 20L))
    val types = CdcOps.snapshotDiff(b, b, "k", cmp)
      .select("change_type").distinct().as[String].collect().toSeq
    assert(types == Seq("unchanged"))
  }
}
