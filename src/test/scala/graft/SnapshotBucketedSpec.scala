package graft

import graft.sources.{SnapshotStore, SubBucket}
import org.apache.spark.sql.functions._

/** The versioned-BUCKETED sub-table layout (x120d/x32g/x68d): bucketed
  * state tables (novelty census, IVF assignments, semdedup state) under
  * SnapshotStore's atomic multi-table commits + CAS. Folds in the three
  * 4.1.2 mechanics findings the exploratory ScratchBucketSpec validated
  * (partitioned+bucketed saveAsTable append/prune/no-shuffle-join; DDL
  * re-registration + recoverPartitions; drop-partition retry cycle),
  * which that spec's scaladoc scheduled for deletion once folded here. */
class SnapshotBucketedSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
    df.select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet


  test("bucketed sub: build → append → overwrite; every version " +
      "time-travels; reads are partition-pruned to manifest members") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_"))
    val spec = SubBucket("cell", 4)
    try {
      ss.commitTables("ix",
        overwrites = Map(
          "assigned" -> Seq((1L, 0), (2L, 1), (3L, 2)).toDF("id", "cell"),
          "meta" -> Seq(Tuple1(4)).toDF("n_cells")),
        buckets = Map("assigned" -> spec))
      // append needs NO spec repeat — the persisted one governs
      ss.commitTables("ix",
        appends = Map("assigned" -> Seq((4L, 0), (5L, 3)).toDF("id", "cell")))
      ss.commitTables("ix",
        overwrites = Map("assigned" -> Seq((9L, 1)).toDF("id", "cell")))
      assert(rows(ss.readTableVersion("ix", 1, "assigned"))
        === Set((1L, 0), (2L, 1), (3L, 2)))
      assert(rows(ss.readTableVersion("ix", 2, "assigned"))
        === Set((1L, 0), (2L, 1), (3L, 2), (4L, 0), (5L, 3)))
      assert(rows(ss.readTable("ix", "assigned")) === Set((9L, 1)))
      // plain sub rides the same group untouched
      assert(ss.readTable("ix", "meta").head().getInt(0) === 4)
      // partition pruning: the v1 read opens ONLY commit_v=1 files
      val v1 = ss.readTableVersion("ix", 1, "assigned")
      assert(v1.inputFiles.nonEmpty &&
        v1.inputFiles.forall(_.contains("commit_v=1")),
        v1.inputFiles.mkString("\n"))
      // the v2 read opens 1 and 2, never the overwrite's partition
      val v2 = ss.readTableVersion("ix", 2, "assigned")
      assert(v2.inputFiles.forall(f =>
        f.contains("commit_v=1") || f.contains("commit_v=2")))
    } finally ss.dropCatalogTables("ix")
  }

  test("bucketed sub: bucket-key join and aggregation run with NO " +
      "exchange on the index side (the co-location contract)") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_join_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" ->
          (1L to 200L).map(i => (i, (i % 8).toInt)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 8)))
      ss.commitTables("ix",
        appends = Map("assigned" ->
          (201L to 260L).map(i => (i, (i % 8).toInt)).toDF("id", "cell")))
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val ix = ss.readTable("ix", "assigned")
        // bucket-key aggregation: zero exchanges anywhere
        val agg = ix.groupBy("cell").count()
        val aggPlan = agg.queryExecution.executedPlan.toString
        assert(aggPlan.contains("Bucketed: true"), aggPlan)
        assert(!aggPlan.contains("Exchange"),
          s"bucket-key agg must not shuffle:\n$aggPlan")
        assert(agg.count() === 8)
        // probe join: exactly ONE exchange (the probe side) — the index
        // scan side is never shuffled
        val probe = (0 to 3).map(c => (c, s"q$c")).toDF("cell", "q")
        val j = ix.join(probe, Seq("cell"))
        val jPlan = j.queryExecution.executedPlan.toString
        assert(jPlan.contains("Bucketed: true"), jPlan)
        assert(jPlan.sliding("Exchange".length).count(_ == "Exchange") === 1,
          s"probe join must exchange only the probe side:\n$jPlan")
        assert(j.count() === 131) // cells 0..3 of ids 1..260: 32+33+33+33
      }
    } finally ss.dropCatalogTables("ix")
  }

  test("kill-at-the-seam: a fully-staged bucketed commit (partition " +
      "written, manifest written) dies pre-swap — readers never see it; " +
      "the retry of the SAME version cleans the crashed partition") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_kill_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" -> Seq((1L, 0), (2L, 1)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      // stage v2 completely, die before the swap
      ss.claim("ix", 2L)
      ss.stageTables("ix", 2L,
        Map("assigned" -> Seq((3L, 2)).toDF("id", "cell")), Map.empty)
      assert(ss.currentVersion("ix") === 1L)
      assert(rows(ss.readTable("ix", "assigned")) === Set((1L, 0), (2L, 1)))
      // the crashed claim blocks v2 until released (single-writer story)
      intercept[graft.sources.ConcurrentCommitException](
        ss.commitTables("ix",
          appends = Map("assigned" -> Seq((4L, 3)).toDF("id", "cell"))))
      assert(ss.releaseDeadClaims("ix") === Seq("v2"))
      // retry with DIFFERENT content: the dead attempt's partition files
      // must not bleed into the landed version
      ss.commitTables("ix",
        appends = Map("assigned" -> Seq((7L, 3)).toDF("id", "cell")))
      assert(ss.currentVersion("ix") === 2L)
      assert(rows(ss.readTable("ix", "assigned"))
        === Set((1L, 0), (2L, 1), (7L, 3)))
    } finally ss.dropCatalogTables("ix")
  }

  test("fresh-session re-registration: after the catalog entry is " +
      "dropped, the next read re-registers from disk (DDL + bucket-spec " +
      "file) and the bucketed scan still engages") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_fresh_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" ->
          (1L to 50L).map(i => (i, (i % 4).toInt)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      ss.commitTables("ix",
        appends = Map("assigned" -> Seq((99L, 1)).toDF("id", "cell")))
      val before = rows(ss.readTable("ix", "assigned"))
      // simulate a fresh session: the registration is gone, disk remains
      ss.dropCatalogTables("ix")
      val re = ss.readTable("ix", "assigned")
      assert(rows(re) === before)
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val p = ss.readTable("ix", "assigned").groupBy("cell").count()
          .queryExecution.executedPlan.toString
        assert(p.contains("Bucketed: true") && !p.contains("Exchange"), p)
      }
      // time travel also survives re-registration
      assert(rows(ss.readTableVersion("ix", 1, "assigned")) ===
        (1L to 50L).map(i => (i, (i % 4).toInt)).toSet)
    } finally ss.dropCatalogTables("ix")
  }

  test("snapshot isolation: a reader pinned at v sees byte-identical " +
      "results while a concurrent commit lands v+1 (the relation-cache " +
      "staleness family)") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_iso_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" ->
          (1L to 40L).map(i => (i, (i % 4).toInt)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      val pinned = ss.readTableVersion("ix", 1, "assigned")
      val before = rows(pinned)
      // concurrent commit mutates the catalog table (new partition +
      // refresh) while the reader's plan is live
      ss.commitTables("ix",
        appends = Map("assigned" -> Seq((100L, 0), (101L, 1)).toDF("id", "cell")))
      assert(rows(pinned) === before, "pinned read drifted mid-commit")
      // a re-resolved pinned read (fresh plan, post-commit) agrees too
      assert(rows(ss.readTableVersion("ix", 1, "assigned")) === before)
      assert(rows(ss.readTable("ix", "assigned")).size === 42)
    } finally ss.dropCatalogTables("ix")
  }

  test("layout immutability: a conflicting SubBucket, a plain-then-" +
      "bucketed flip, and a reserved commit_v column all fail loudly") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_guard_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" -> Seq((1L, 0)).toDF("id", "cell"),
          "meta" -> Seq(Tuple1(1)).toDF("k")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      // conflicting spec on append
      intercept[IllegalArgumentException](ss.commitTables("ix",
        appends = Map("assigned" -> Seq((2L, 1)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 8))))
      // a sub with plain history cannot become bucketed
      intercept[IllegalArgumentException](ss.commitTables("ix",
        appends = Map("meta" -> Seq(Tuple1(2)).toDF("k")),
        buckets = Map("meta" -> SubBucket("k", 2))))
      // reserved partition column
      intercept[IllegalArgumentException](ss.commitTables("ix2",
        overwrites = Map("a" -> Seq((1L, 0L)).toDF("id", "commit_v")),
        buckets = Map("a" -> SubBucket("id", 2))))
    } finally { ss.dropCatalogTables("ix"); ss.dropCatalogTables("ix2") }
  }

  test("empty bucketed append commits a version whose read is unchanged " +
      "(no files written, no cruft)") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_empty_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" -> Seq((1L, 0)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      ss.commitTables("ix", appends = Map("assigned" ->
        Seq.empty[(Long, Int)].toDF("id", "cell")))
      assert(ss.currentVersion("ix") === 2L)
      assert(rows(ss.readTable("ix", "assigned")) === Set((1L, 0)))
      assert(rows(ss.readTableVersion("ix", 1, "assigned")) === Set((1L, 0)))
      // r13-ADVICE regression: the empty append's manifest entry has NO
      // partition dir on disk (Spark's empty bucketed write) — the
      // changelog over a range containing it must expand that entry to
      // nothing, not PATH_NOT_FOUND on the missing dir
      assert(ss.changesBetweenTable("ix", "assigned", 1L, 2L).count() === 0L)
      ss.commitTables("ix", appends = Map("assigned" ->
        Seq((7L, 3)).toDF("id", "cell")))
      val ch = ss.changesBetweenTable("ix", "assigned", 1L, 3L).collect()
      assert(ch.length === 1 && ch.head.getAs[String]("_change") === "insert"
        && ch.head.getAs[Long]("id") === 7L)
    } finally ss.dropCatalogTables("ix")
  }

  test("compactBucketed folds accumulated partitions into one (~one " +
      "file per bucket) without changing content; history still " +
      "time-travels; the co-location contract survives") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_cpt_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" ->
          (1L to 40L).map(i => (i, (i % 4).toInt)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      (1 to 5).foreach { b =>
        ss.commitTables("ix", appends = Map("assigned" ->
          Seq((100L + b, b % 4)).toDF("id", "cell")))
      }
      val before = rows(ss.readTable("ix", "assigned"))
      val preFiles = ss.readTable("ix", "assigned").inputFiles.length
      val v = ss.compactBucketed("ix", "assigned")
      assert(v === 7L)
      assert(rows(ss.readTable("ix", "assigned")) === before)
      val cur = ss.readTable("ix", "assigned")
      assert(cur.inputFiles.forall(_.contains(s"commit_v=$v")),
        "compacted version must read only its own partition")
      // repartition-on-key bounds files to ~nBuckets (exact bucket/task
      // alignment isn't guaranteed, so allow a small factor)
      assert(cur.inputFiles.length <= 2 * 4 &&
        cur.inputFiles.length < preFiles,
        s"expected a bounded handful of files, got " +
          s"${cur.inputFiles.length} (pre-compact $preFiles)")
      // pre-compact versions still time-travel whole
      assert(rows(ss.readTableVersion("ix", 6, "assigned")) === before)
      assert(rows(ss.readTableVersion("ix", 1, "assigned")).size === 40)
      // bucketing still engages on the compacted layout
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val p = ss.readTable("ix", "assigned").groupBy("cell").count()
          .queryExecution.executedPlan.toString
        assert(p.contains("Bucketed: true") && !p.contains("Exchange"), p)
      }
      // expire + sweep then reclaims the pre-compact partitions
      ss.expireVersions("ix", keepFrom = 7L)
      val dd = java.nio.file.Paths.get(
        new java.net.URI(cur.inputFiles.head)).getParent.getParent
      assert(!java.nio.file.Files.exists(dd.resolve("commit_v=1")))
      assert(java.nio.file.Files.exists(dd.resolve(s"commit_v=$v")))
      assert(rows(ss.readTable("ix", "assigned")) === before)
    } finally ss.dropCatalogTables("ix")
  }

  test("retention: expire + vacuum reclaims exactly the commit_v " +
      "partitions only dead versions reference, and drops them from the " +
      "catalog; live history keeps reading") {
    val ss = new SnapshotStore(spark, tmp("snapbkt_vac_"))
    try {
      ss.commitTables("ix",
        overwrites = Map("assigned" -> Seq((1L, 0), (2L, 1)).toDF("id", "cell")),
        buckets = Map("assigned" -> SubBucket("cell", 4)))
      ss.commitTables("ix",
        appends = Map("assigned" -> Seq((3L, 2)).toDF("id", "cell")))
      // v3 overwrites: partitions 1 and 2 stay alive ONLY through v1/v2
      ss.commitTables("ix",
        overwrites = Map("assigned" -> Seq((9L, 3)).toDF("id", "cell")))
      val dd = java.nio.file.Paths.get(
        new java.net.URI(ss.readTable("ix", "assigned").inputFiles.head))
        .getParent.getParent
      assert(java.nio.file.Files.exists(dd.resolve("commit_v=1")))
      // no partition is reclaimable while v1/v2 are live (the dry run's
      // other categories list spent claims — routine, not data)
      assert(ss.vacuumDryRun("ix").orphanDirs.isEmpty)
      ss.expireVersions("ix", keepFrom = 3L)
      // the expire-time sweep already reclaimed the dead partitions
      assert(!java.nio.file.Files.exists(dd.resolve("commit_v=1")))
      assert(!java.nio.file.Files.exists(dd.resolve("commit_v=2")))
      assert(java.nio.file.Files.exists(dd.resolve("commit_v=3")))
      assert(rows(ss.readTable("ix", "assigned")) === Set((9L, 3)))
      intercept[IllegalArgumentException](
        ss.readTableVersion("ix", 1, "assigned"))
      // the catalog no longer declares the reclaimed partitions
      val parts = spark.sql(
        s"SHOW PARTITIONS ${ss.catalogTableName("ix", "assigned")}")
        .collect().map(_.getString(0)).toSet
      assert(parts === Set("commit_v=3"))
    } finally ss.dropCatalogTables("ix")
  }
}
