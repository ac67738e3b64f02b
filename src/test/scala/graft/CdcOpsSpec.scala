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

  test("applyDiffToPartitionedTable: only touched partitions rewritten, " +
      "untouched files byte-identical, emptied partition dropped") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_part_")
      .resolve("t").toString
    def mk(ids: Seq[Long], updated: Boolean) = {
      val rows = ids.map(k => (k, (k % 5).toInt,
        if (updated && k % 5 == 1) s"u$k" else s"v$k"))
      rows.toDF("k", "p", "v")
    }
    // base: keys 0..49 over partitions p=0..4
    val a = mk(0L until 50L, updated = false)
    a.write.partitionBy("p").parquet(dir)
    // b: p=1 values updated, p=2 fully deleted, inserts arrive in new p=5
    val b = mk((0L until 50L).filter(_ % 5 != 2), updated = true)
      .unionByName(Seq((100L, 5, "v100"), (101L, 5, "v101")).toDF("k", "p", "v"))
    def partFiles(p: Int): Set[(String, Long, Long)] = {
      val d = new java.io.File(s"$dir/p=$p")
      if (!d.exists) Set.empty
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified, f.length)).toSet
    }
    val before = Map(0 -> partFiles(0), 3 -> partFiles(3), 4 -> partFiles(4))
    val diff = CdcOps.snapshotDiff(a, b, "k", Seq("p", "v"))

    // the pruned base scan the operator plans: untouched partitions are
    // eliminated at planning time, visible as PartitionFilters on the scan
    val touched = CdcOps.touchedPartitions(diff, "p")
    assert(touched.toSet == Set(1, 2, 5))
    val scanPlan = spark.read.parquet(dir)
      .filter(col("p").isin(touched: _*))
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters:") && scanPlan.contains("p#"),
      s"expected a partition-pruned scan in:\n$scanPlan")

    CdcOps.applyDiffToPartitionedTable(dir, diff, "k", "p")
    // untouched partition files never rewritten — same names, mtimes, sizes
    Seq(0, 3, 4).foreach(p => assert(partFiles(p) == before(p),
      s"partition p=$p was rewritten but not touched"))
    // emptied partition directory dropped (dynamic overwrite alone leaves it)
    assert(partFiles(2).isEmpty)
    // round trip: table now equals B exactly
    val got = spark.read.parquet(dir).select("k", "v", "p")
      .as[(Long, String, Int)].collect().toSet
    val want = b.select("k", "v", "p").as[(Long, String, Int)].collect().toSet
    assert(got == want)
  }

  test("partitioned apply: an update that MOVES a row across partitions " +
      "cleans the old partition (both sides count as touched)") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_move_")
      .resolve("t").toString
    val a = Seq((1L, 0, "a"), (2L, 1, "b"), (3L, 0, "c"))
      .toDF("k", "p", "v")
    a.write.partitionBy("p").parquet(dir)
    // key 1 moves p=0 → p=3; key 3 stays, so p=0 survives with one row
    val b = Seq((1L, 3, "a"), (2L, 1, "b"), (3L, 0, "c"))
      .toDF("k", "p", "v")
    val diff = CdcOps.snapshotDiff(a, b, "k", Seq("p", "v"))
    val touched = CdcOps.applyDiffToPartitionedTable(dir, diff, "k", "p")
    // the OLD partition must be touched, or key 1 would survive twice
    assert(touched.toSet == Set(0, 3))
    val got = spark.read.parquet(dir).select("k", "v", "p")
      .as[(Long, String, Int)].collect().toSet
    assert(got == b.select("k", "v", "p").as[(Long, String, Int)]
      .collect().toSet)
    assert(spark.read.parquet(dir).filter(col("k") === 1L).count() === 1)
  }

  test("partitioned apply: emptied partitions with ESCAPED directory names " +
      "(colon in value) are found and dropped via listing, not path guess") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_esc_")
      .resolve("t").toString
    val a = Seq((1L, "us:east", "a"), (2L, "eu", "b"))
      .toDF("k", "p", "v")
    a.write.partitionBy("p").parquet(dir)
    // Spark %XX-escapes the colon in the directory name
    val dirs = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(dirs.exists(_.startsWith("p=us%3Aeast")), s"escaping changed? $dirs")
    val b = Seq((2L, "eu", "b")).toDF("k", "p", "v") // region fully deleted
    val diff = CdcOps.snapshotDiff(a, b, "k", Seq("p", "v"))
    CdcOps.applyDiffToPartitionedTable(dir, diff, "k", "p")
    val after = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(!after.exists(_.startsWith("p=us%3Aeast")),
      s"stale escaped partition dir survived: $after")
    assert(spark.read.parquet(dir).select("k").as[Long].collect().toSeq
      === Seq(2L))
  }

  test("maintainJoinView ≡ recomputed join under inserts/deletes/updates " +
      "on both sides; the view rides a broadcast anti join (never shuffles)") {
    import org.apache.spark.sql.functions._
    // fact A: (pk, fk, v) — old state
    val oldA = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c"),
      (4L, 30L, "d")).toDF("pk", "fk", "v")
    // new state: pk2 updated (payload), pk3 deleted, pk5 inserted,
    // pk4 re-pointed to a new dim key
    val newA = Seq((1L, 10L, "a"), (2L, 10L, "B"), (4L, 20L, "d"),
      (5L, 30L, "e")).toDF("pk", "fk", "v")
    val oldB = Seq((10L, 100.0), (20L, 200.0), (30L, 300.0))
      .toDF("fk", "w")
    // dim: 20 updated, 30 deleted
    val newB = Seq((10L, 100.0), (20L, 222.0)).toDF("fk", "w")
    val view = oldA.join(oldB, "fk").select("pk", "fk", "v", "w")
    val changedA = Seq(2L, 3L, 4L, 5L).toDF("pk")
    val changedB = Seq(20L, 30L).toDF("fk")
    val maintained = CdcOps.maintainJoinView(view, "pk", "fk",
      newA, newB, changedA, changedB)
    val got = maintained.as[(Long, Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    val want = newA.join(newB, "fk").select("pk", "fk", "v", "w")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got === want)
    // pk1 untouched, pk2 updated, pk3 gone, pk4 re-pointed to updated 20,
    // pk5 inserted at a DELETED dim key -> dropped by the inner join
    assert(got === Seq((1L, 10L, "a", 100.0), (2L, 10L, "B", 100.0),
      (4L, 20L, "d", 222.0)))
    // plan shape: the keep branch anti-joins via BROADCAST under AQE —
    // the view side has no shuffle exchange feeding a sort-merge join
    maintained.collect()
    val plan = maintained.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"expected broadcast anti join:\n$plan")
  }

  test("maintainJoinView: an untouched view survives an empty change " +
      "batch bit-for-bit") {
    import org.apache.spark.sql.functions._
    val a = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("pk", "fk", "v")
    val b = Seq((10L, 1.5), (20L, 2.5)).toDF("fk", "w")
    val view = a.join(b, "fk").select("pk", "fk", "v", "w")
    val out = CdcOps.maintainJoinView(view, "pk", "fk", a, b,
      spark.emptyDataset[Long].toDF("pk"),
      spark.emptyDataset[Long].toDF("fk"))
    assert(out.as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
      === view.as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("X142b: refreshSumView — initial + incremental ≡ from-scratch, " +
      "emptied groups dropped, redelivery commits nothing, a crashed " +
      "claim recovers via releaseDeadClaims") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def viewRows = ss.readTable("v", "agg")
      .select("g", "sum_m", "n_rows") // name-pinned past n_vals
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def scratch = ss.readCurrent("t").groupBy("g")
      .agg(sum("m").as("s"), count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // v1: groups 1..3; group 3 has a single row (to be emptied later)
    ss.commitOverwrite("t", Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 1L)
    assert(viewRows === scratch)
    // v2 append + v3 rewrite (update group 1, DELETE all of group 3) —
    // one refresh folds both steps through the changelog
    ss.commitAppend("t", Seq((2L, 100L), (4L, 1L)).toDF("g", "m"))
    ss.commitOverwrite("t", Seq((1L, 11L), (1L, 20L), (2L, 5L), (2L, 100L),
      (4L, 1L)).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 2L)
    assert(viewRows === scratch)
    assert(!viewRows.exists(_._1 === 3L), "emptied group must drop")
    // redelivery: same watermark ⇒ NO commit, not even a version
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 2L)
    assert(ss.currentVersion("v") === 2L)
    // a crashed refresh left its claim: the retry fails RETRYABLY, then
    // lands after the single-writer claim recovery
    ss.commitAppend("t", Seq((5L, 50L)).toDF("g", "m"))
    ss.claim("v", 3L)
    intercept[graft.sources.ConcurrentCommitException](
      CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m"))
    ss.releaseDeadClaims("v")
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 3L)
    assert(viewRows === scratch)
    // the watermark rode in the same commit: v3's meta names src v4
    assert(ss.readTableVersion("v", 3L, "meta").head().getLong(0) === 4L)
    // time travel: the view's own v1 still serves the v1 aggregate
    assert(ss.readTableVersion("v", 1L, "agg").count() === 3L)
  }

  test("X142b: refreshSumView with EMPTY dims (a global-total view) " +
      "refreshes incrementally — the r13-ADVICE reduce-on-Nil crash") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_g_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def total = ss.readTable("v", "agg").select("sum_m", "n_rows")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ss.commitOverwrite("t", Seq((1L, 10L), (2L, 5L)).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq.empty, "m") === 1L)
    assert(total === Set((15L, 2L)))
    // the incremental path (the branch that crashed on reduce(Nil))
    ss.commitAppend("t", Seq((3L, 100L)).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq.empty, "m") === 2L)
    assert(total === Set((115L, 3L)))
    // a rewrite with deletes folds through too
    ss.commitOverwrite("t", Seq((3L, 100L)).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq.empty, "m") === 3L)
    assert(total === Set((100L, 1L)))
  }

  test("X142i: refreshStatsView — moments fold invertibly under " +
      "inserts, scattered deletes, updates, and emptied groups " +
      "(≡ from-scratch at every refresh, never touching the source); " +
      "redelivery commits nothing; empty dims work") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_st_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def viewRows = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    def scratch = ss.readCurrent("t").groupBy("g")
      .agg(sum("m").as("s"), sum(col("m") * col("m")).as("q"),
        count(col("m")).as("nv"), count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // v1: groups 1..3; group 3 single-row (emptied later)
    ss.commitOverwrite("t", Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "m") === 1L)
    assert(viewRows === scratch)
    // append + rewrite (update group 1's 10→11, DELETE all of group 3,
    // delete one interior row of group 2) — ONE refresh folds both; the
    // deletes that would dirty a min/max view subtract exactly here
    ss.commitAppend("t", Seq((2L, 100L), (4L, 1L)).toDF("g", "m"))
    ss.commitOverwrite("t", Seq((1L, 11L), (1L, 20L), (2L, 100L),
      (4L, 1L)).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "m") === 2L)
    assert(viewRows === scratch)
    assert(!viewRows.exists(_._1 === 3L), "emptied group must drop")
    // redelivery: same watermark ⇒ NO commit, not even a version
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "m") === 2L)
    assert(ss.currentVersion("v") === 2L)
    // time travel: the view's own v1 still serves the v1 moments
    assert(ss.readTableVersion("v", 1L, "agg").count() === 3L)
  }

  test("X142i: refreshStatsView with EMPTY dims (a global-total view) " +
      "refreshes incrementally, deletes included") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_stg_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def total = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    ss.commitOverwrite("t", Seq((1L, 3L), (2L, 4L)).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq.empty, "m") === 1L)
    assert(total === Set((7L, 25L, 2L, 2L)))
    ss.commitAppend("t", Seq((3L, 10L)).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq.empty, "m") === 2L)
    assert(total === Set((17L, 125L, 3L, 3L)))
    // a rewrite with deletes subtracts both moments
    ss.commitOverwrite("t", Seq((3L, 10L)).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq.empty, "m") === 3L)
    assert(total === Set((10L, 100L, 1L, 1L)))
  }

  test("X142i: refreshStatsView DECIMAL moments fold EXACTLY — the " +
      "incremental sumsq equals the from-scratch sum(p*p) to the last " +
      "decimal digit (the sign-multiplication precision-loss regression)") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_dec_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def dec(s: String) = new java.math.BigDecimal(s)
    def mk(rows: Seq[(Long, String)]) = rows.map { case (g, p) =>
      (g, dec(p)) }.toDF("g", "p")
      .select(col("g"), col("p").cast("decimal(18,4)").as("p"))
    // scale-4 values whose squares need all 8 fractional digits: any
    // rounding in the delta fold shows up against from-scratch
    ss.commitOverwrite("t", mk(Seq((1L, "0.0001"), (1L, "123.4567"),
      (2L, "9999999.9999"))))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "p") === 1L)
    // delete one odd-square row + insert another — pure delta territory
    ss.commitOverwrite("t", mk(Seq((1L, "0.0001"), (1L, "7.0003"),
      (2L, "9999999.9999"))))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "p") === 2L)
    val got = ss.readTable("v", "agg").collect()
      .map(r => r.getLong(0) -> ((r.getDecimal(1), r.getDecimal(2))))
      .toMap
    def scratchOf(g: Long) = ss.readCurrent("t").filter(col("g") === g)
      .agg(sum(col("p")).as("s"), sum(col("p") * col("p")).as("q"))
      .head()
    Seq(1L, 2L).foreach { g =>
      val want = scratchOf(g)
      assert(got(g)._1.compareTo(want.getDecimal(0)) === 0 &&
        got(g)._2.compareTo(want.getDecimal(1)) === 0,
        s"group $g moments drifted: got ${got(g)} want $want")
    }
    // and the values are bit-exact rationals, not approximations
    assert(got(1L)._2.compareTo(
      dec("0.0001").pow(2).add(dec("7.0003").pow(2))) === 0)
  }

  test("X142i: refreshStatsView is NULL-exact — a group whose last " +
      "non-null measure is deleted reads NULL moments (not 0), folded " +
      "purely from n_vals, matching the from-scratch SQL sum") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_null_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def aggRows = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getLong(3), r.getLong(4))).toSet
    // group 1: one real + one NULL measure; group 2: all-NULL from birth
    ss.commitOverwrite("t", Seq((1L, Some(10L)), (1L, None),
      (2L, None)).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "m") === 1L)
    assert(aggRows === Set((1L, Some("10"), 1L, 2L), (2L, None, 0L, 1L)))
    // delete group 1's ONLY non-null row: 10 + (−10) = 0 is the trap —
    // the true sum over {NULL} is NULL, and n_vals=0 proves it
    ss.commitOverwrite("t", Seq((1L, Option.empty[Long]),
      (2L, Option.empty[Long])).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "m") === 2L)
    assert(aggRows === Set((1L, None, 0L, 1L), (2L, None, 0L, 1L)))
    // and a later insert resurrects real moments from the NULL state
    ss.commitAppend("t", Seq((1L, Some(4L))).toDF("g", "m"))
    assert(CdcOps.refreshStatsView(ss, "t", "v", Seq("g"), "m") === 3L)
    assert(aggRows === Set((1L, Some("4"), 1L, 2L), (2L, None, 0L, 1L)))
  }

  test("X142b: refreshSumView is NULL-exact — a group whose last " +
      "non-null measure is deleted reads NULL sum_m (not the folded " +
      "0), via the n_vals discipline; a later insert resurrects; the " +
      "feed-driven foldSumViewStep shares the same merge") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_sumn_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def aggRows = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getLong(2), r.getLong(3))).toSet
    // group 1: one real + one NULL measure; group 2: all-NULL from birth
    ss.commitOverwrite("t", Seq((1L, Some(10L)), (1L, None),
      (2L, None)).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 1L)
    assert(aggRows === Set((1L, Some("10"), 1L, 2L), (2L, None, 0L, 1L)))
    // delete group 1's ONLY non-null row: 10 + (−10) = 0 is the trap —
    // the true SQL sum over {NULL} is NULL, and n_vals=0 proves it
    ss.commitOverwrite("t", Seq((1L, Option.empty[Long]),
      (2L, Option.empty[Long])).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 2L)
    assert(aggRows === Set((1L, None, 0L, 1L), (2L, None, 0L, 1L)))
    // a later insert resurrects a real sum from the NULL state
    ss.commitAppend("t", Seq((1L, Some(4L))).toDF("g", "m"))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 3L)
    assert(aggRows === Set((1L, Some("4"), 1L, 2L), (2L, None, 0L, 1L)))
    // the feed-driven fold hits the same branch (shared commitSumDelta):
    // replay the whole history into a second view step by step
    val dir2 = java.nio.file.Files.createTempDirectory("ivm_sumn2_").toString
    val s2 = new graft.sources.SnapshotStore(spark, dir2)
    Seq(Seq((1L, Some(10L)), (1L, None), (2L, None)),
      Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])))
      .foreach(rows => s2.commitOverwrite("t", rows.toDF("g", "m")))
    // step v1 = the feed's initial-snapshot batch (all inserts)
    CdcOps.foldSumViewStep(s2, "v", Seq("g"), "m",
      s2.readVersion("t", 1L).withColumn("_change", lit("insert"))
        .withColumn("_commit_v", lit(1L)), 1L)
    CdcOps.foldSumViewStep(s2, "v", Seq("g"), "m",
      s2.changesBetween("t", 1L, 2L), 2L)
    assert(s2.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getLong(2), r.getLong(3))).toSet
      === Set((1L, None, 0L, 1L), (2L, None, 0L, 1L)))
    // a LEGACY-format view (persisted before n_vals existed) must
    // refresh, not die on an unresolved column: n_vals backfills as
    // n_rows (the old format's every-row-counted assumption)
    val dir3 = java.nio.file.Files.createTempDirectory("ivm_sumo_").toString
    val s3 = new graft.sources.SnapshotStore(spark, dir3)
    s3.commitOverwrite("t", Seq((1L, 10L)).toDF("g", "m"))        // src v1
    s3.commitTables("v", overwrites = Map(
      "agg" -> Seq((1L, 10L, 1L)).toDF("g", "sum_m", "n_rows"),
      "meta" -> spark.range(1).select(lit(1L).as("src_v"))))
    s3.commitAppend("t", Seq((1L, 5L)).toDF("g", "m"))            // src v2
    assert(CdcOps.refreshSumView(s3, "t", "v", Seq("g"), "m") === 2L)
    assert(s3.readTable("v", "agg")
      .select("g", "sum_m", "n_vals", "n_rows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet === Set((1L, 15L, 2L, 2L)))
  }

  test("X142j: refreshTopKView — inserts merge-and-truncate (no source " +
      "contact), below-kth deletes fold clean, an in-array delete " +
      "recomputes EXACTLY that group, sub-k arrays dirty on any " +
      "delete, NULL measures never enter or dirty, emptied groups " +
      "drop, redelivery commits nothing") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_tk_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    val K = 3
    def viewRows = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .toSet
    def scratch = ss.readCurrent("t").groupBy("g")
      .agg(slice(sort_array(collect_list(col("m")), asc = false), 1, K)
        .as("tk"), count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .toSet
    def refresh() = CdcOps.refreshTopKView(ss, "t", "v", Seq("g"), "m", K)
    // g=1: 5 values (full array + below-kth tail); g=2: SUB-K (2 values);
    // g=3: one row with a NULL measure; g=4: single row (emptied later)
    ss.commitOverwrite("t", Seq((1L, Some(50L)), (1L, Some(40L)),
      (1L, Some(30L)), (1L, Some(20L)), (1L, Some(10L)),
      (2L, Some(7L)), (2L, Some(5L)), (3L, None), (4L, Some(1L)))
      .toDF("g", "m"))
    assert(refresh() === ((1L, 0L)))
    assert(viewRows === scratch)
    assert(viewRows.contains((3L, Nil, 1L)), "NULL measures stay out")
    // insert-only refresh: batch top-Ks merge in, zero recomputes —
    // including a value that displaces g=1's kth (45 pushes out 30)
    ss.commitAppend("t", Seq((1L, Some(45L)), (2L, Some(9L)),
      (5L, Some(100L))).toDF("g", "m"))
    assert(refresh() === ((2L, 0L)))
    assert(viewRows === scratch)
    assert(viewRows.contains((1L, List(50L, 45L, 40L), 6L)))
    // deletes: g=1 loses 20 (below kth=40 → CLEAN, n_rows-only fold),
    // g=2 loses 5 (= its stored kth → in-array, DIRTY), g=3's null row
    // deleted (never dirties — no values were represented; the clean
    // fold drops the emptied group), g=4 emptied (sub-k array → dirty)
    ss.commitOverwrite("t", Seq((1L, Some(50L)), (1L, Some(45L)),
      (1L, Some(40L)), (1L, Some(30L)), (1L, Some(10L)),
      (2L, Some(9L)), (2L, Some(7L)), (5L, Some(100L)))
      .toDF("g", "m"))
    val (v3, dirty3) = refresh()
    assert(v3 === 3L && dirty3 === 2L,
      s"exactly {g=2 kth-delete, g=4 sub-k} recompute, got $dirty3")
    assert(viewRows === scratch)
    assert(!viewRows.exists(_._1 === 4L), "emptied group must drop")
    // an IN-ARRAY delete: g=1 loses its max → that one group recomputes
    ss.commitOverwrite("t", Seq((1L, Some(45L)), (1L, Some(40L)),
      (1L, Some(30L)), (1L, Some(10L)), (2L, Some(9L)), (2L, Some(7L)),
      (5L, Some(100L))).toDF("g", "m"))
    val (v4, dirty4) = refresh()
    assert(v4 === 4L && dirty4 === 1L, s"only g=1 recomputes, got $dirty4")
    assert(viewRows === scratch)
    assert(viewRows.contains((1L, List(45L, 40L, 30L), 4L)))
    // redelivery commits nothing; time travel serves v1's arrays
    assert(refresh() === ((4L, 0L)) && ss.currentVersion("v") === 4L)
    assert(ss.readTableVersion("v", 1L, "agg").count() === 4L)
  }

  test("X142g: refreshMinMaxView — incremental ≡ from-scratch under " +
      "inserts, interior deletes (clean fold), extreme deletes (dirty " +
      "recompute), updates, and emptied groups; dirty set is EXACTLY " +
      "the fallen-extreme groups; redelivery commits nothing; crashed " +
      "claim recovers; empty dims work") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_mm_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def viewRows = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    def scratch = ss.readCurrent("t").groupBy("g")
      .agg(min("m").as("mn"), max("m").as("mx"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // v1: g=1 {10,20,30}, g=2 {5,50}, g=3 {7}
    ss.commitOverwrite("t", Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 5L), (2L, 50L), (3L, 7L)).toDF("g", "m"))
    assert(CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
      === ((1L, 0L)))
    assert(viewRows === scratch)
    // v2 append: extends g=1's max, adds g=4 — insert-only, zero dirty
    ss.commitAppend("t", Seq((1L, 99L), (4L, 1L)).toDF("g", "m"))
    assert(CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
      === ((2L, 0L)))
    assert(viewRows === scratch)
    // v3 rewrite: g=1 loses INTERIOR 20 (clean: n adjusts, extremes
    // survive), g=2 loses its max 50 (dirty), g=3 emptied (dirty,
    // dropped), g=4 updated 1→2 (delete-at-extreme ⇒ dirty)
    ss.commitOverwrite("t", Seq((1L, 10L), (1L, 30L), (1L, 99L),
      (2L, 5L), (4L, 2L)).toDF("g", "m"))
    assert(CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
      === ((3L, 3L)), "dirty must be exactly {g=2, g=3, g=4}")
    assert(viewRows === scratch)
    assert(!viewRows.exists(_._1 === 3L), "emptied group must drop")
    assert(viewRows.contains((1L, 10L, 99L, 3L)),
      "interior delete must fold clean (no recompute) yet adjust n")
    // redelivery: same watermark ⇒ NO commit, not even a version
    assert(CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
      === ((3L, 0L)))
    assert(ss.currentVersion("v") === 3L)
    // crashed refresh claim: retry fails retryably, recovery lands
    ss.commitAppend("t", Seq((5L, 500L)).toDF("g", "m"))
    ss.claim("v", 4L)
    intercept[graft.sources.ConcurrentCommitException](
      CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m"))
    ss.releaseDeadClaims("v")
    assert(CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
      === ((4L, 0L)))
    assert(viewRows === scratch)
    // time travel: the view's own v1 still serves the v1 extremes
    assert(ss.readTableVersion("v", 1L, "agg").count() === 3L)
    // empty dims (global extremes), incl. the incremental delete path
    val dir2 = java.nio.file.Files.createTempDirectory("ivm_mm_g_").toString
    val ss2 = new graft.sources.SnapshotStore(spark, dir2)
    ss2.commitOverwrite("t", Seq((1L, 10L), (2L, 50L)).toDF("g", "m"))
    assert(CdcOps.refreshMinMaxView(ss2, "t", "v", Seq.empty, "m")
      === ((1L, 0L)))
    ss2.commitOverwrite("t", Seq((1L, 10L), (3L, 20L)).toDF("g", "m"))
    assert(CdcOps.refreshMinMaxView(ss2, "t", "v", Seq.empty, "m")
      === ((2L, 1L)), "the global max fell — the one group recomputes")
    assert(ss2.readTable("v", "agg").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((10L, 20L, 2L)))
  }

  test("X142g: a NULL-measure group emptied by deletes DROPS from the " +
      "view — its d_min/d_max are NULL so the dirty predicate cannot " +
      "fire, and the clean fold must filter the n_rows=0 phantom " +
      "instead of serving a row the from-scratch aggregate has no " +
      "row for") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_mmn_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    // g=1: TWO all-NULL-measure rows (distinct keys so the overwrite
    // diff deletes both); g=2: a normal survivor group
    ss.commitOverwrite("t", Seq((1L, 1L, None: Option[Long]),
      (2L, 1L, None), (3L, 2L, Some(5L))).toDF("k", "g", "m"))
    assert(CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
      === ((1L, 0L)))
    // the stored g=1 row: NULL extremes, n_rows=2 (count counts rows)
    val r1 = ss.readTable("v", "agg").filter(col("g") === 1L).head()
    assert(r1.isNullAt(r1.fieldIndex("min_m")) &&
      r1.getAs[Long]("n_rows") === 2L)
    // delete BOTH g=1 rows: d_min/d_max NULL → not dirty; the clean
    // fold lands n_rows=0 and must DROP the group
    ss.commitOverwrite("t", Seq((3L, 2L, Some(5L))).toDF("k", "g", "m"))
    val (v2, dirty) = CdcOps.refreshMinMaxView(ss, "t", "v", Seq("g"), "m")
    assert(v2 === 2L && dirty === 0L,
      s"an all-NULL-measure delete must fold clean, got dirty=$dirty")
    val served = ss.readTable("v", "agg").collect()
      .map(r => (r.getLong(r.fieldIndex("g")),
        r.getAs[Long]("n_rows"))).toSet
    assert(served === Set((2L, 1L)),
      s"the emptied NULL group must drop from the view, got $served")
    // catch-up refresh over an insert-then-delete of the SAME value
    // into an all-NULL group: the stored extremes are NULL so the
    // value comparisons cannot fire — the NULL-extremes dirty clause
    // must force the recompute, or the dead value would serve as the
    // group's extreme forever
    val dir2 = java.nio.file.Files.createTempDirectory("ivm_mmn2_").toString
    val s2 = new graft.sources.SnapshotStore(spark, dir2)
    s2.commitOverwrite("t", Seq((1L, 1L, None: Option[Long]),
      (2L, 1L, None)).toDF("k", "g", "m"))                         // v1
    assert(CdcOps.refreshMinMaxView(s2, "t", "v", Seq("g"), "m")
      === ((1L, 0L)))
    s2.commitAppend("t", Seq((3L, 1L, Some(5L))).toDF("k", "g", "m")) // v2
    s2.commitOverwrite("t", Seq((1L, 1L, None: Option[Long]),
      (2L, 1L, None)).toDF("k", "g", "m"))                         // v3
    val (v2c, dirty2) = CdcOps.refreshMinMaxView(s2, "t", "v",
      Seq("g"), "m")
    assert(v2c === 2L && dirty2 === 1L,
      s"the NULL-extremes group must recompute, got dirty=$dirty2")
    val r2 = s2.readTable("v", "agg").head()
    assert(r2.isNullAt(r2.fieldIndex("min_m")) &&
      r2.isNullAt(r2.fieldIndex("max_m")) &&
      r2.getAs[Long]("n_rows") === 2L,
      "the dead 5 must not survive as the group's extreme")
  }

  test("X142c: refreshJoinView — incremental ≡ recomputed join under " +
      "changes to either side; one-sided refreshes; redelivery commits " +
      "nothing; crashed claim recovers") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_join_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def viewRows = ss.readTable("v", "view").select("g", "k", "m", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    def scratch = ss.readCurrent("a").join(ss.readCurrent("b"), "g")
      .select("g", "k", "m", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    ss.commitOverwrite("a", Seq((1L, 10L, 5L), (2L, 20L, 6L), (3L, 30L, 7L))
      .toDF("k", "g", "m"))
    ss.commitOverwrite("b", Seq((10L, "x"), (20L, "y"), (30L, "z"))
      .toDF("g", "s"))
    assert(CdcOps.refreshJoinView(ss, "a", "b", "v", "k", "g") === 1L)
    assert(viewRows === scratch)
    // fact side: append a row joining g=10, delete k=3, move k=2 to g=30
    ss.commitAppend("a", Seq((4L, 10L, 8L)).toDF("k", "g", "m"))
    ss.commitMerge("a", "k",
      CdcOps.snapshotDiff(ss.readVersion("a", 2L),
        Seq((1L, 10L, 5L), (2L, 30L, 6L), (4L, 10L, 8L)).toDF("k", "g", "m"),
        "k", Seq("g", "m")).filter(col("change_type") =!= "unchanged"))
    assert(CdcOps.refreshJoinView(ss, "a", "b", "v", "k", "g") === 2L)
    assert(viewRows === scratch)
    // dimension side ONLY: rename segment of g=10; drop g=30 (its fact
    // rows must leave the inner join)
    ss.commitMerge("b", "g",
      CdcOps.snapshotDiff(ss.readVersion("b", 1L),
        Seq((10L, "X"), (20L, "y")).toDF("g", "s"),
        "g", Seq("s")).filter(col("change_type") =!= "unchanged"))
    assert(CdcOps.refreshJoinView(ss, "a", "b", "v", "k", "g") === 3L)
    assert(viewRows === scratch)
    assert(!viewRows.exists(_._4 == "z"), "dropped dimension must leave")
    // redelivery: both watermarks current ⇒ no commit
    assert(CdcOps.refreshJoinView(ss, "a", "b", "v", "k", "g") === 3L)
    assert(ss.currentVersion("v") === 3L)
    // crashed refresh claim: retry fails retryably, then lands after the
    // single-writer claim sweep; watermark pair rides the commit
    ss.commitAppend("b", Seq((40L, "w")).toDF("g", "s"))
    ss.claim("v", 4L)
    intercept[graft.sources.ConcurrentCommitException](
      CdcOps.refreshJoinView(ss, "a", "b", "v", "k", "g"))
    ss.releaseDeadClaims("v")
    assert(CdcOps.refreshJoinView(ss, "a", "b", "v", "k", "g") === 4L)
    assert(viewRows === scratch)
    val m = ss.readTableVersion("v", 4L, "meta").head()
    assert(m.getAs[Long]("src_a_v") === 3L && m.getAs[Long]("src_b_v") === 3L)
  }

  test("X142b: refreshSumView keeps a NULL dimension group single — " +
      "the merge join is null-safe, so refresh stays ≡ from-scratch") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_null_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def df(rows: (java.lang.Long, Long)*) = rows.toDF("g", "m")
    ss.commitOverwrite("t", df((null, 10L), (1L, 5L), (null, 20L)))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 1L)
    ss.commitAppend("t", df((null, 7L), (2L, 3L)))
    assert(CdcOps.refreshSumView(ss, "t", "v", Seq("g"), "m") === 2L)
    val got = ss.readTable("v", "agg").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((None, 37L, 3L), (Some(1L), 5L, 1L),
      (Some(2L), 3L, 1L)),
      "the null group must merge into ONE row with the combined sum")
  }

  test("X142f: refreshDistinctView — sketch union ≡ bound vs exact after " +
      "multi-step refresh; a deleting changelog is refused loudly; " +
      "redelivery commits nothing") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_hll_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    val base = spark.range(0, 3000).select((col("id") % 4).as("g"),
      (col("id") % 700).as("u"))
    ss.commitOverwrite("t", base.filter(col("id") % 3 === 0))
    assert(CdcOps.refreshDistinctView(ss, "t", "v", Seq("g"), "u") === 1L)
    ss.commitAppend("t", base.filter(col("id") % 3 === 1))
    ss.commitAppend("t", base.filter(col("id") % 3 === 2))
    assert(CdcOps.refreshDistinctView(ss, "t", "v", Seq("g"), "u") === 2L)
    assert(CdcOps.refreshDistinctView(ss, "t", "v", Seq("g"), "u") === 2L)
    assert(ss.currentVersion("v") === 2L, "redelivery must commit nothing")
    val est = CdcOps.distinctViewEstimate(ss, "v", Seq("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = ss.readCurrent("t").groupBy("g")
      .agg(countDistinct(col("u")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= math.max(2L, (n * 0.05).toLong),
        s"group $g: estimate ${est(g)} vs exact $n")
    }
    // a deleting commit poisons the changelog for sketches: refuse loudly
    ss.commitMerge("t", "u",
      CdcOps.snapshotDiff(ss.readCurrent("t").filter(col("g") === 0L)
          .select("u", "g").groupBy("u").agg(first("g").as("g")),
        spark.range(0).select(col("id").as("u"), col("id").as("g")),
        "u", Seq("g")).filter(col("change_type") =!= "unchanged"))
    val e = intercept[IllegalArgumentException](
      CdcOps.refreshDistinctView(ss, "t", "v", Seq("g"), "u"))
    assert(e.getMessage.contains("DELETES"))
  }

  test("X142l: refreshExactDistinctView — exact COUNT(DISTINCT) under " +
      "births, support-only churn (ZERO transitions), key deaths, and " +
      "emptied groups; NULL keys never count; redelivery commits " +
      "nothing; crashed claim recovers; compaction folds dead pairs; " +
      "empty dims work") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_xd_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def viewRows = CdcOps.exactDistinctOf(ss, "v", Seq("g")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def scratch = ss.readCurrent("t").filter(col("u").isNotNull)
      .groupBy("g").agg(countDistinct(col("u")).as("nd")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // v1: g=1 {a,a,b}, g=2 {c}, g=3 {null only} (never counts)
    ss.commitOverwrite("t", Seq((1L, Some("a")), (1L, Some("a")),
      (1L, Some("b")), (2L, Some("c")), (3L, Option.empty[String]))
      .toDF("g", "u"))
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u",
      nBuckets = 4) === ((1L, 0L)))
    assert(viewRows === scratch)
    assert(viewRows === Set((1L, 2L), (2L, 1L)),
      "an all-NULL-key group must not appear")
    // v2 append: a THIRD copy of (1, a) — pure support churn — plus a
    // birth in g=2 and a fresh group g=4
    ss.commitAppend("t", Seq((1L, "a"), (2L, "d"), (4L, "e")).toDF("g", "u"))
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
      === ((2L, 2L)), "exactly the two births transition")
    assert(viewRows === scratch)
    // v3 rewrite: g=1 keeps ONE 'a' (support 3→1: no transition) and
    // loses 'b' (death); g=2 loses 'd' (death); g=4 emptied (death,
    // group drops); g=5 born with duplicated support
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "c"), (5L, "f"),
      (5L, "f")).toDF("g", "u"))
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
      === ((3L, 4L)),
      "transitions must be exactly {b dies, d dies, e dies, f born}")
    assert(viewRows === scratch)
    assert(viewRows === Set((1L, 1L), (2L, 1L), (5L, 1L)))
    // redelivery: same watermark ⇒ NO commit, not even a version
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
      === ((3L, 0L)))
    assert(ss.currentVersion("v") === 3L)
    // the view time-travels: its v2 still serves the pre-rewrite counts
    assert(CdcOps.exactDistinctOf(ss, "v", Seq("g"), Some(2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (2L, 2L), (4L, 1L)))
    // crashed refresh claim: retry fails retryably, recovery lands
    ss.commitAppend("t", Seq((6L, "z")).toDF("g", "u"))
    ss.claim("v", 4L)
    intercept[graft.sources.ConcurrentCommitException](
      CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u"))
    ss.releaseDeadClaims("v")
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
      === ((4L, 1L)))
    assert(viewRows === scratch)
    // compaction: merge-on-read deltas fold to one row per LIVE pair
    CdcOps.compactDistinctViewExact(ss, "v", Seq("g"), "u")
    assert(ss.readTable("v", "cnt").count() === 4L,
      "exactly the four live (g, u) pairs must survive the fold")
    assert(viewRows === scratch)
    // and the folded state keeps refreshing correctly
    ss.commitAppend("t", Seq((6L, "z"), (6L, "y")).toDF("g", "u"))
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
      === ((6L, 1L)), "one birth (y); the z append is support-only")
    assert(viewRows === scratch)
    // empty dims: a global distinct count, delete path included
    val dir2 = java.nio.file.Files.createTempDirectory("ivm_xdg_").toString
    val ss2 = new graft.sources.SnapshotStore(spark, dir2)
    ss2.commitOverwrite("t", Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("k", "u"))
    assert(CdcOps.refreshExactDistinctView(ss2, "t", "v", Seq.empty, "u")
      === ((1L, 0L)))
    ss2.commitOverwrite("t", Seq((1L, "a")).toDF("k", "u"))
    assert(CdcOps.refreshExactDistinctView(ss2, "t", "v", Seq.empty, "u")
      === ((2L, 1L)), "b dies globally; a keeps support")
    assert(ss2.readTable("v", "agg").collect().map(_.getLong(0)).toSeq
      === Seq(1L))
  }

  test("r16: the IVM probe broadcast gate — a BULK-DELETE refresh folds " +
      "identically through the broadcast regime and the shuffle " +
      "fallback (spark.graft.broadcastProbeMaxRows=0), for both the " +
      "exact-distinct and SCD2 views; the hint is present under the " +
      "gate and absent above it") {
    import org.apache.spark.sql.functions._
    def scratchOf(ss: graft.sources.SnapshotStore) =
      ss.readCurrent("t").filter(col("u").isNotNull)
        .groupBy("g").agg(countDistinct(col("u")).as("nd")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def runDistinct(maxRows: String): Set[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("gate_xd_").toString
      val ss = new graft.sources.SnapshotStore(spark, dir)
      spark.conf.set("spark.graft.broadcastProbeMaxRows", maxRows)
      try {
        val base = spark.range(0L, 4000L).select(
          (col("id") % 8L).as("g"), concat(lit("u"), col("id")).as("u"))
        ss.commitOverwrite("t", base)
        CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u",
          nBuckets = 4)
        // the GDPR-purge shape: one refresh folds a bulk delete of 95%
        ss.commitOverwrite("t", base.filter(col("id") % 20L === 0L))
        CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
        val out = CdcOps.exactDistinctOf(ss, "v", Seq("g")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(out === scratchOf(ss))
        out
      } finally spark.conf.unset("spark.graft.broadcastProbeMaxRows")
    }
    assert(runDistinct((1L << 22).toString) === runDistinct("0"),
      "the two probe regimes must fold the identical view")
    def runScd2(maxRows: String): Set[(Long, String, Long, Option[Long])] = {
      val dir = java.nio.file.Files.createTempDirectory("gate_s2_").toString
      val ss = new graft.sources.SnapshotStore(spark, dir)
      spark.conf.set("spark.graft.broadcastProbeMaxRows", maxRows)
      try {
        val base = spark.range(0L, 3000L).select(col("id").as("k"),
          concat(lit("a"), col("id")).as("attr"))
        ss.commitOverwrite("t", base)
        CdcOps.refreshScd2View(ss, "t", "v", "k", nBuckets = 4)
        // bulk churn: 2/3 of the keys update, 1/6 die
        ss.commitOverwrite("t", base.filter(col("k") % 6L =!= 5L)
          .withColumn("attr", when(col("k") % 3L =!= 0L,
            concat(lit("b"), col("k"))).otherwise(col("attr"))))
        CdcOps.refreshScd2View(ss, "t", "v", "k")
        CdcOps.scd2Of(ss, "v").collect().map(r => (r.getLong(0),
          r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      } finally spark.conf.unset("spark.graft.broadcastProbeMaxRows")
    }
    assert(runScd2((1L << 22).toString) === runScd2("0"),
      "the two probe regimes must append the identical history")
    // the hint itself: present at-or-under the gate, absent above it
    // (the analyzed plan carries the ResolvedHint node; whether the
    // planner then still broadcasts a tiny unhinted frame is its call)
    import spark.implicits._
    val probe = Seq(1L, 2L).toDF("id")
    def hinted(n: Long) = CdcOps.probeSide(probe, n)
      .queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hinted(2L), "under the gate the probe must carry the hint")
    assert(!hinted(Long.MaxValue),
      "above the gate the hint must be absent (planner-chosen join)")
  }

  test("X142m: refreshScd2View — validity intervals reconstruct EVERY " +
      "source version's content; updates close-and-open at one commit; " +
      "delete + later re-insert yields two intervals; one refresh folds " +
      "many commits; history is never rewritten (append-only subs); " +
      "redelivery commits nothing; duplicate keys refuse at build") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("scd2_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def asOf(v: Long): Set[(Long, String)] =
      CdcOps.scd2Of(ss, "v").filter(col("valid_from_v") <= v &&
          (col("valid_to_v").isNull || col("valid_to_v") > v))
        .select("k", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    def srcAt(v: Long): Set[(Long, String)] =
      ss.readVersion("t", v).select("k", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    // duplicate keys refuse at build
    ss.commitOverwrite("dup", Seq((1L, "a"), (1L, "b")).toDF("k", "attr"))
    intercept[IllegalArgumentException](
      CdcOps.refreshScd2View(ss, "dup", "vdup", "k"))
    // t v1 {1→a, 2→b, 3→c}; build the view off it
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "attr"))
    assert(CdcOps.refreshScd2View(ss, "t", "v", "k", nBuckets = 4)
      === ((1L, 0L)))
    // THREE source commits, ONE refresh: v2 updates 1→a2 and deletes 3;
    // v3 updates 1→a3; v4 re-inserts 3→c2 and inserts 4→d
    ss.commitMerge("t", "k", CdcOps.snapshotDiff(ss.readCurrent("t"),
      Seq((1L, "a2"), (2L, "b")).toDF("k", "attr"), "k", Seq("attr"))
      .filter(col("change_type") =!= "unchanged"))
    ss.commitMerge("t", "k", CdcOps.snapshotDiff(ss.readCurrent("t"),
      Seq((1L, "a3"), (2L, "b")).toDF("k", "attr"), "k", Seq("attr"))
      .filter(col("change_type") =!= "unchanged"))
    ss.commitAppend("t", Seq((3L, "c2"), (4L, "d")).toDF("k", "attr"))
    // events: v2 = close(1)+open(1)+close(3), v3 = close(1)+open(1),
    // v4 = open(3)+open(4) → 7
    assert(CdcOps.refreshScd2View(ss, "t", "v", "k") === ((2L, 7L)))
    // the intervals reconstruct EVERY version's exact content
    (1L to 4L).foreach(v => assert(asOf(v) === srcAt(v), s"as-of v$v"))
    // key 3: deleted then re-inserted → TWO intervals
    val k3 = CdcOps.scd2Of(ss, "v").filter(col("k") === 3L)
      .select("attr", "valid_from_v", "valid_to_v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(k3 === Set(("c", 1L, 2L), ("c2", 4L, -1L)))
    // key 1: three intervals, middle one [2, 3)
    assert(CdcOps.scd2Of(ss, "v").filter(col("k") === 1L).count() === 3L)
    // redelivery commits nothing
    assert(CdcOps.refreshScd2View(ss, "t", "v", "k") === ((2L, 0L)))
    assert(ss.currentVersion("v") === 2L)
    // history is append-only: the refresh touched no existing open row
    // (the view's own changelog for the opens sub has NO deletes)
    assert(ss.changesBetweenTable("v", "opens", 1L, 2L)
      .filter(col("_change") === "delete").isEmpty,
      "a refresh must never rewrite history")
    // the view time-travels: its v1 serves only the build intervals
    assert(ss.readTableVersion("v", 1L, "opens").count() === 3L)
  }

  test("X142m: a refresh whose source grew a DUPLICATE key refuses " +
      "loudly (rank pairing would silently serve wrong history); the " +
      "view is untouched and heals once the source is fixed") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("scd2_dup_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "attr"))
    CdcOps.refreshScd2View(ss, "t", "v", "k", nBuckets = 4)
    // the store happily appends a SECOND live row for key 1 — the view
    // must refuse the fold, not corrupt
    ss.commitAppend("t", Seq((1L, "x")).toDF("k", "attr"))
    val e = intercept[IllegalArgumentException](
      CdcOps.refreshScd2View(ss, "t", "v", "k"))
    assert(e.getMessage.contains("one-live-row-per-key"))
    assert(ss.currentVersion("v") === 1L, "the refused fold commits nothing")
    // the source heals (removes the duplicate); the catch-up refresh
    // folds BOTH commits and the duplicate cancels inside the range
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "attr"))
    assert(CdcOps.refreshScd2View(ss, "t", "v", "k")._1 === 2L)
    assert(CdcOps.scd2Of(ss, "v").filter(col("valid_to_v").isNull)
      .count() === 3L)
  }

  test("X142l: an EMPTY-dims (global) view keeps its single row at 0 " +
      "when the last key dies — matching SELECT COUNT(DISTINCT) over " +
      "an emptied table") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_xd0_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "a")).toDF("k", "u"))
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq.empty, "u")
      === ((1L, 0L)))
    ss.commitOverwrite("t", Seq.empty[(Long, String)].toDF("k", "u"))
    assert(CdcOps.refreshExactDistinctView(ss, "t", "v", Seq.empty, "u")
      === ((2L, 1L)), "the one global key dies")
    assert(CdcOps.exactDistinctOf(ss, "v", Seq.empty).collect()
      .map(_.getLong(0)).toSeq === Seq(0L),
      "the global row must read 0, not vanish")
  }

  test("r16: compactScd2View seals closed intervals (append-only), " +
      "resets the event subs to the open tail, preserves scd2Of content " +
      "at EVERY source version, keeps folding correctly afterwards, and " +
      "a second compaction appends only the newly-closed intervals") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("scd2_cmp_").toString
    val ss = new graft.sources.SnapshotStore(spark, dir)
    def intervals: Set[(Long, String, Long, Long)] =
      CdcOps.scd2Of(ss, "v").collect().map(r => (r.getLong(0),
        r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    def asOf(v: Long): Set[(Long, String)] =
      CdcOps.scd2Of(ss, "v").filter(col("valid_from_v") <= v &&
          (col("valid_to_v").isNull || col("valid_to_v") > v))
        .select("k", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    def srcAt(v: Long): Set[(Long, String)] =
      ss.readVersion("t", v).select("k", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    // churn: build {1,2,3}; update 1, delete 3; update 1 again; re-insert 3
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "attr"))
    CdcOps.refreshScd2View(ss, "t", "v", "k", nBuckets = 4)
    ss.commitMerge("t", "k", CdcOps.snapshotDiff(ss.readCurrent("t"),
      Seq((1L, "a2"), (2L, "b")).toDF("k", "attr"), "k", Seq("attr"))
      .filter(col("change_type") =!= "unchanged"))
    ss.commitMerge("t", "k", CdcOps.snapshotDiff(ss.readCurrent("t"),
      Seq((1L, "a3"), (2L, "b")).toDF("k", "attr"), "k", Seq("attr"))
      .filter(col("change_type") =!= "unchanged"))
    ss.commitAppend("t", Seq((3L, "c2"), (4L, "d")).toDF("k", "attr"))
    CdcOps.refreshScd2View(ss, "t", "v", "k")
    val before = intervals
    val vPre = ss.currentVersion("v")
    // COMPACT: content identical, events reset to the open tail
    val vC = CdcOps.compactScd2View(ss, "v")
    assert(vC === vPre + 1)
    assert(intervals === before,
      "compaction must preserve the interval content exactly")
    (1L to 4L).foreach(v => assert(asOf(v) === srcAt(v),
      s"post-compaction as-of v$v must still reconstruct the source"))
    assert(ss.readTable("v", "closes").isEmpty,
      "every close pairs — the closes sub resets to empty")
    assert(ss.readTable("v", "opens").count() === 4L,
      "opens must hold exactly the live keys' open rows")
    assert(ss.readTable("v", "sealed").count() === 3L,
      "exactly the closed intervals seal: 1:[a), 1:[a2), 3:[c)")
    // time travel to the pre-compaction view version is unaffected
    assert(CdcOps.scd2Of(ss, "v", Some(vPre)).count() === before.size)
    // the view keeps folding on the compacted layout
    ss.commitMerge("t", "k", CdcOps.snapshotDiff(ss.readCurrent("t"),
      Seq((1L, "a4"), (2L, "b"), (3L, "c2")).toDF("k", "attr"),
      "k", Seq("attr")).filter(col("change_type") =!= "unchanged"))
    CdcOps.refreshScd2View(ss, "t", "v", "k")
    (1L to 5L).foreach(v => assert(asOf(v) === srcAt(v),
      s"post-compaction fold as-of v$v"))
    // from-scratch parity: an independent rebuild over the same source
    val dir2 = java.nio.file.Files.createTempDirectory("scd2_ref_").toString
    val ss2 = new graft.sources.SnapshotStore(spark, dir2)
    (1L to 5L).foreach { v =>
      ss2.commitOverwrite("t", ss.readVersion("t", v))
      CdcOps.refreshScd2View(ss2, "t", "v", "k", nBuckets = 4)
    }
    assert(intervals === CdcOps.scd2Of(ss2, "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet,
      "compacted + folded must equal the from-scratch history")
    // second compaction: sealed APPENDS only the intervals the v5 fold
    // closed (1:a3 and the deleted 4:d); earlier sealed rows are never
    // rewritten
    val sealedBefore = ss.readTable("v", "sealed").count()
    val vC2 = CdcOps.compactScd2View(ss, "v")
    assert(ss.readTable("v", "sealed").count() === sealedBefore + 2,
      "exactly the two newly-closed intervals append")
    assert(ss.changesBetweenTable("v", "sealed", vC2 - 1, vC2)
      .filter(col("_change") === "delete").isEmpty,
      "sealed history must never rewrite")
    assert(intervals === before
      ++ Set((1L, "a3", 3L, 5L), (1L, "a4", 5L, -1L), (4L, "d", 4L, 5L))
      -- Set((1L, "a3", 3L, -1L), (4L, "d", 4L, -1L)),
      "the full interval set tracks the fold across both compactions")
  }

  test("unescapePathName inverts Hive %XX escaping") {
    assert(CdcOps.unescapePathName("us%3Aeast") === "us:east")
    assert(CdcOps.unescapePathName("us%20east") === "us east")
    assert(CdcOps.unescapePathName("a%3Ab%25c") === "a:b%c")
    assert(CdcOps.unescapePathName("plain") === "plain")
    assert(CdcOps.unescapePathName("trail%2") === "trail%2") // not a code
  }
}
