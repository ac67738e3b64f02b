package graft

import org.apache.spark.sql.functions._
import graft.sources.{SnapshotSql, SnapshotStore}

/** The minimal SQL front-end (r16 scope decision): time-traveled SELECTs
  * via `VERSION AS OF` / `TAG AS OF`, DESCRIBE HISTORY, and the CALL
  * maintenance procedures — each behaving exactly like its Scala API
  * (the SQL layer is a token rewrite + dispatch, never a second
  * implementation). */
class SnapshotSqlSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore(prefix: String): (SnapshotStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    (new SnapshotStore(spark, dir), dir)
  }

  test("SELECT: current / VERSION AS OF / TAG AS OF reads, two versions " +
      "of one table in a single query, CTEs and joins around the " +
      "rewrite, non-store names passing through untouched") {
    val (ss, _) = mkStore("sql_sel_")
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    ss.tag("t", "rel", 1L)
    ss.commitAppend("t", Seq((3L, "c")).toDF("k", "v"))
    assert(SnapshotSql.sql(ss, "SELECT count(*) AS n FROM t")
      .head().getLong(0) === 3L)
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t VERSION AS OF 1").head().getLong(0) === 2L)
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t TAG AS OF 'rel'").head().getLong(0) === 2L)
    // both versions of one table in ONE statement
    val grown = SnapshotSql.sql(ss,
      """SELECT cur.k FROM t cur
        |LEFT ANTI JOIN t VERSION AS OF 1 old ON cur.k = old.k""".stripMargin)
    assert(grown.collect().map(_.getLong(0)).toSeq === Seq(3L))
    // CTEs compose around the rewrite
    assert(SnapshotSql.sql(ss,
      """WITH c AS (SELECT k FROM t VERSION AS OF 1)
        |SELECT count(*) AS n FROM c""".stripMargin).head().getLong(0) === 2L)
    // a non-store name (temp view) passes through to Spark untouched
    Seq((1L, 10L)).toDF("k", "w").createOrReplaceTempView("sqlspec_other")
    assert(SnapshotSql.sql(ss,
      """SELECT o.w FROM t JOIN sqlspec_other o ON t.k = o.k""")
      .head().getLong(0) === 10L)
    spark.catalog.dropTempView("sqlspec_other")
    // the rewrite's temp views do not leak into the session
    assert(!spark.catalog.tableExists("graft_sql_t_v1"))
  }

  test("group sub-table reads: FROM <group>.<sub> resolves one sub " +
      "(bucketed included), composes with VERSION AS OF, and the " +
      "unaliased reference binds under the sub name") {
    val (ss, _) = mkStore("sql_grp_")
    ss.commitTables("g", overwrites = Map(
      "cnt" -> Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      "meta" -> Seq(Tuple1(7L)).toDF("w")),
      buckets = Map("cnt" -> graft.sources.SubBucket("k", 4)))
    ss.commitTables("g", appends = Map(
      "cnt" -> Seq((3L, 30L)).toDF("k", "n")))
    assert(SnapshotSql.sql(ss,
      "SELECT sum(cnt.n) AS s FROM g.cnt").head().getLong(0) === 60L)
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS c FROM g.cnt VERSION AS OF 1")
      .head().getLong(0) === 2L)
    assert(SnapshotSql.sql(ss,
      """SELECT c.k, m.w FROM g.cnt c CROSS JOIN g.meta m
        |WHERE c.k = 1""".stripMargin).head().getLong(1) === 7L)
  }

  test("TIMESTAMP AS OF resolves to the newest version committed at or " +
      "before the instant (Delta's rule), accepts the FOR prefix, and " +
      "refuses an instant older than the live history") {
    val (ss, dir) = mkStore("sql_ts_")
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    ss.commitAppend("t", Seq((2L, "b")).toDF("k", "v"))
    // pin the commit clock deterministically (manifest mtimes)
    def setT(v: Long, iso: String): Unit =
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(dir, "t", "meta", s"v$v"),
        java.nio.file.attribute.FileTime.fromMillis(
          java.sql.Timestamp.valueOf(iso).getTime))
    setT(1L, "2026-08-01 10:00:00")
    setT(2L, "2026-08-10 10:00:00")
    assert(ss.versionAsOfTimestamp("t",
      java.sql.Timestamp.valueOf("2026-08-05 00:00:00").getTime) === 1L)
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t TIMESTAMP AS OF '2026-08-05 00:00:00'")
      .head().getLong(0) === 1L)
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t FOR TIMESTAMP AS OF '2026-08-11 00:00:00'")
      .head().getLong(0) === 2L)
    // FOR VERSION AS OF (the Iceberg spelling) also accepted
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t FOR VERSION AS OF 1").head().getLong(0)
      === 1L)
    val e = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t TIMESTAMP AS OF '2026-07-01 00:00:00'"))
    assert(e.getMessage.contains("no live version"))
  }

  test("masking (r17): FROM/JOIN inside string literals, comments and " +
      "backtick identifiers passes through byte-unchanged while real " +
      "references around them still rewrite") {
    val (ss, _) = mkStore("sql_mask_")
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    ss.tag("t", "rel", 1L)
    // a literal whose TEXT names the store table must not be rewritten —
    // the r16 defect shape: the literal's value silently changed
    val r = SnapshotSql.sql(ss,
      "SELECT count(*) AS n, 'excerpt from t' AS note FROM t " +
        "WHERE 'from t' = 'from t'").head()
    assert(r.getLong(0) === 2L)
    assert(r.getString(1) === "excerpt from t")
    // SQL '' escaping inside the literal stays intact too
    assert(SnapshotSql.sql(ss,
      "SELECT 'it''s from t' AS s FROM t LIMIT 1").head().getString(0)
      === "it's from t")
    // line and block comments naming the table are left alone; the real
    // reference on the next line still rewrites (count proves it read t)
    assert(SnapshotSql.sql(ss,
      """SELECT count(*) AS n -- counted from t yesterday
        |FROM t /* join t version as of 99 would be wrong here */
        |""".stripMargin).head().getLong(0) === 2L)
    // a BACKTICKED identifier is never treated as a store reference
    Seq((1L, 7L)).toDF("k", "w").createOrReplaceTempView("from_like")
    assert(SnapshotSql.sql(ss,
      "SELECT w FROM `from_like`").head().getLong(0) === 7L)
    spark.catalog.dropTempView("from_like")
    // TAG AS OF still resolves THROUGH the mask (the tag text recovers
    // from the original by offset), beside a literal red herring
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM t TAG AS OF 'rel' WHERE v <> 'from t'")
      .head().getLong(0) === 2L)
  }

  test("TIMESTAMP AS OF parses in the SESSION timezone (r17): the same " +
      "statement resolves to different versions under different " +
      "spark.sql.session.timeZone settings, never the JVM default") {
    val (ss, dir) = mkStore("sql_tz_")
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    ss.commitAppend("t", Seq((2L, "b")).toDF("k", "v"))
    def setT(v: Long, instantUtc: String): Unit =
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(dir, "t", "meta", s"v$v"),
        java.nio.file.attribute.FileTime.fromMillis(
          java.time.Instant.parse(instantUtc).toEpochMilli))
    setT(1L, "2026-08-04T10:00:00Z")
    setT(2L, "2026-08-04T20:00:00Z")
    // '2026-08-05 00:00:00' = 2026-08-05T00:00Z under UTC (after v2) but
    // 2026-08-04T15:00Z under Asia/Tokyo (+9, before v2)
    val stmt = "SELECT count(*) AS n FROM t TIMESTAMP AS OF " +
      "'2026-08-05 00:00:00'"
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      assert(SnapshotSql.sql(ss, stmt).head().getLong(0) === 2L)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      assert(SnapshotSql.sql(ss, stmt).head().getLong(0) === 1L)
      // an unparseable instant refuses loudly and names the session zone
      val e = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
        "SELECT count(*) AS n FROM t TIMESTAMP AS OF 'next tuesday'"))
      assert(e.getMessage.contains("session timezone"))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("CALL parses SQL-standard '' escapes (r17): an add_check " +
      "predicate containing a quoted string round-trips; adjacent " +
      "strings without a comma refuse loudly") {
    val (ss, _) = mkStore("sql_esc_")
    ss.commitOverwrite("t", Seq((1L, "ok")).toDF("k", "v"))
    SnapshotSql.sql(ss, "CALL add_check('t', 'not_bad', 'v <> ''bad''')")
    assert(ss.checks("t").get("not_bad").contains("v <> 'bad'"))
    intercept[IllegalArgumentException](
      ss.commitAppend("t", Seq((2L, "bad")).toDF("k", "v")))
    ss.commitAppend("t", Seq((3L, "fine")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      SnapshotSql.sql(ss, "CALL tag('t' 'oops', 1)"))
    assert(e.getMessage.contains("cannot parse CALL arguments"))
  }

  test("concurrent sql calls on one session (r17): per-call unique view " +
      "names mean N racing readers of the same (table, version) never " +
      "drop each other's views") {
    val (ss, _) = mkStore("sql_conc_")
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    ss.commitAppend("t", Seq((3L, "c")).toDF("k", "v"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Future.sequence((1 to 4).map(_ => Future {
      (1 to 12).map { _ =>
        SnapshotSql.sql(ss,
          "SELECT count(*) AS n FROM t VERSION AS OF 1").head().getLong(0)
      }
    }))
    assert(Await.result(runs, 120.seconds).flatten.forall(_ == 2L))
  }

  test("FROM CHANGES(t, a, b) (r17): the changelog as a composable " +
      "relation — filters/joins/aggregates apply, group subs resolve, " +
      "non-store names pass through, literals stay masked") {
    val (ss, _) = mkStore("sql_chg_")
    ss.commitOverwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    ss.commitAppend("t", Seq((3L, "c")).toDF("k", "v"))
    ss.commitOverwrite("t", Seq((1L, "a"), (3L, "c2")).toDF("k", "v"))
    // full grammar composes around the TVF
    val r = SnapshotSql.sql(ss,
      """SELECT _change, count(*) AS n FROM changes(t, 1, 3)
        |GROUP BY _change ORDER BY _change""".stripMargin).collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    // v1→v2: +3 insert; v2→v3: delete 2 and old 3, insert new 3
    assert(r("insert") === 2L && r("delete") === 2L)
    // joins back to a snapshot read in the same statement
    assert(SnapshotSql.sql(ss,
      """SELECT count(*) AS n FROM changes(t, 2, 3) ch
        |JOIN t VERSION AS OF 1 old ON ch.k = old.k
        |WHERE ch._change = 'delete'""".stripMargin).head().getLong(0)
      === 1L)
    // group sub changelog
    ss.commitTables("g", overwrites = Map(
      "cnt" -> Seq((1L, 10L)).toDF("k", "n")))
    ss.commitTables("g", appends = Map(
      "cnt" -> Seq((2L, 20L)).toDF("k", "n")))
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM changes(g.cnt, 1, 2)")
      .head().getLong(0) === 1L)
    // a non-store name passes through to Spark (which then refuses —
    // proving we never intercepted it)
    intercept[Exception](SnapshotSql.sql(ss,
      "SELECT * FROM changes(not_ours, 1, 2)").collect())
    // the literal hazard stays closed on the TVF pass too
    assert(SnapshotSql.sql(ss,
      "SELECT 'from changes(t, 1, 2)' AS s FROM t LIMIT 1")
      .head().getString(0) === "from changes(t, 1, 2)")
  }

  test("CALL named arguments (r17): `name => value` resolves against " +
      "the procedure's signature in any order; trailing optionals may " +
      "be omitted; gaps, unknown names, duplicates and mixed styles " +
      "refuse loudly") {
    val (ss, _) = mkStore("sql_named_")
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    ss.commitAppend("t", Seq((2L, "b")).toDF("k", "v"))
    // out-of-order named args land exactly like positional
    SnapshotSql.sql(ss, "CALL tag(version => 1, table => 't', " +
      "name => 'rel')")
    assert(ss.readTag("t", "rel") === 1L)
    // trailing optionals may be omitted (clone's source_version)
    SnapshotSql.sql(ss, "CALL clone(table => 'dev', source => 't')")
    assert(ss.currentVersion("dev") === 1L)
    // unknown name refuses naming the signature
    val e1 = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "CALL tag(tbl => 't', name => 'x', version => 1)"))
    assert(e1.getMessage.contains("unknown argument") &&
      e1.getMessage.contains("table"))
    // a GAP before a later argument refuses (silent position shifts
    // would call with wrong values)
    val e2 = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "CALL tag(table => 't', version => 1)"))
    assert(e2.getMessage.contains("omits an argument"))
    // mixing styles refuses
    val e3 = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "CALL tag('t', name => 'x', version => 1)"))
    assert(e3.getMessage.contains("one style"))
    // duplicates refuse
    intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "CALL tag(table => 't', table => 'u', name => 'x', version => 1)"))
    // update_where named calls resolve against (table, predicate, set)
    // since r18 — omitting the set clause refuses as an empty SET
    val e4 = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "CALL update_where(table => 't', predicate => 'k = 1')"))
    assert(e4.getMessage.contains("empty SET clause"))
  }

  test("CALL rollback / compact_keyed / compact_delete_keys (r17) drive " +
      "the same machinery as the Scala API") {
    val (ss, _) = mkStore("sql_call2_")
    ss.commitOverwriteKeyed("t", "k", spark.range(0L, 100L)
      .select(col("id").as("k"), (col("id") % 5).as("v")), numFiles = 4)
    ss.commitAppend("t", Seq((500L, 1L)).toDF("k", "v"))
    SnapshotSql.sql(ss, "CALL rollback('t', 1)")
    assert(ss.currentVersion("t") === 3L &&
      ss.readCurrent("t").count() === 100L)
    SnapshotSql.sql(ss, "CALL compact_keyed('t', 'k', 2)")
    assert(ss.currentVersion("t") === 4L)
    ss.commitDeleteKeys("t", Seq(3L).toDF("k"))
    val st = SnapshotSql.sql(ss, "CALL compact_delete_keys('t')")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(st("version") === "6")
    assert(ss.deleteKeysAt("t", 6L).isEmpty,
      "the CALL must fold the vector away")
    assert(ss.readCurrent("t").count() === 99L)
  }

  test("DESCRIBE HISTORY and the CALL maintenance procedures drive the " +
      "same machinery as the Scala API: tag/expire/vacuum, clone + " +
      "fast-forward publish, CHECK add (violating commit refuses), " +
      "changes, unknown procedure refuses loudly") {
    val (ss, _) = mkStore("sql_call_")
    ss.commitOverwrite("t", Seq((1L, 5.0)).toDF("k", "m"))
    ss.commitAppend("t", Seq((2L, 6.0)).toDF("k", "m"))
    assert(SnapshotSql.sql(ss, "DESCRIBE HISTORY t").count() === 2L)
    SnapshotSql.sql(ss, "CALL tag('t', 'rel', 2)")
    assert(ss.readTag("t", "rel") === 2L)
    SnapshotSql.sql(ss, "CALL delete_tag('t', 'rel')")
    // clone → evolve → publish (fast-forward), all through SQL
    SnapshotSql.sql(ss, "CALL clone('dev', 't')")
    ss.commitAppend("dev", Seq((3L, 7.0)).toDF("k", "m"))
    SnapshotSql.sql(ss, "CALL publish('t', 'dev')")
    assert(ss.readCurrent("t").count() === 3L)
    // diverge then resolve through CALL merge_from_table (three-way)
    ss.commitAppend("dev", Seq((10L, 1.0)).toDF("k", "m"))
    ss.commitAppend("t", Seq((20L, 2.0)).toDF("k", "m"))
    intercept[graft.sources.ConcurrentCommitException](
      SnapshotSql.sql(ss, "CALL publish('t', 'dev')"))
    SnapshotSql.sql(ss, "CALL merge_from_table('t', 'dev', 'k')")
    assert(ss.readCurrent("t").count() === 5L,
      "the SQL merge must land both sides' rows")
    // checks: declared via SQL, enforced at the next commit
    SnapshotSql.sql(ss, "CALL add_check('t', 'pos', 'm > 0')")
    intercept[IllegalArgumentException](
      ss.commitAppend("t", Seq((4L, -1.0)).toDF("k", "m")))
    SnapshotSql.sql(ss, "CALL drop_check('t', 'pos')")
    // changes: the changelog surfaces as a frame
    assert(SnapshotSql.sql(ss, "CALL changes('t', 1, 2)")
      .filter(col("_change") === "insert").count() === 1L)
    // retention via SQL: expire then vacuum (dry run names, run removes)
    SnapshotSql.sql(ss, "CALL expire_versions('t', 5)")
    assert(ss.versions("t") === Seq(5L))
    SnapshotSql.sql(ss, "CALL vacuum_dry_run('t')")
    SnapshotSql.sql(ss, "CALL vacuum('t')")
    assert(ss.readCurrent("t").count() === 5L)
    val e = intercept[IllegalArgumentException](
      SnapshotSql.sql(ss, "CALL no_such_proc('x')"))
    assert(e.getMessage.contains("unknown procedure"))
  }

  test("mutation statements (r18): DELETE FROM ... WHERE and UPDATE " +
      "... SET ... WHERE dispatch to the predicate CoW commits — " +
      "clauses recover from the masked match (keywords inside " +
      "literals never split them), SET parses top-level commas only, " +
      "pre-image semantics hold, and <group>.<sub> routes per-sub") {
    val (ss, _) = mkStore("sql_mut_")
    ss.commitOverwriteKeyed("t", "k", spark.range(0L, 400L)
      .select(col("id").as("k"), (col("id") % 7).as("v"),
        concat(lit("w"), col("id") % 3).as("s")), numFiles = 4)
    // DELETE: a literal containing ' WHERE ' must not split the clause
    val st = SnapshotSql.sql(ss,
      "DELETE FROM t WHERE k < 30 AND s <> 'x WHERE y'")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(st("version") === "2" && st("files_reused") === "3",
      s"the statement must hit the zone-pruned CoW path: $st")
    assert(ss.readCurrent("t").count() === 370L)
    // UPDATE with multi-assignment: commas inside a function call and
    // a quoted string stay inside ONE SET expression; pre-image rules
    val st2 = SnapshotSql.sql(ss,
      "UPDATE t SET v = v + 1, s = concat(s, ',', 'a=b') WHERE v = 0")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(st2("version") === "3")
    val row = ss.readCurrent("t").filter(col("k") === 35L).head()
    assert(row.getLong(1) === 1L && row.getString(2) === "w2,a=b",
      s"SET must evaluate on the pre-image: $row")
    // trailing semicolon + line comment parse fine
    SnapshotSql.sql(ss, "DELETE FROM t WHERE k = 31; -- cleanup")
    assert(ss.readCurrent("t").count() === 369L)
    // a non-store table passes through to Spark (which refuses DELETE)
    intercept[Exception](SnapshotSql.sql(ss,
      "DELETE FROM not_ours WHERE k = 1"))
    assert(ss.currentVersion("t") === 4L)
    // group subs: one atomic version, the other sub untouched
    ss.commitTables("g", overwrites = Map(
      "data" -> Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("k", "v"),
      "idx" -> Seq((1L, "a")).toDF("k", "s")))
    val st3 = SnapshotSql.sql(ss, "DELETE FROM g.data WHERE k = 3")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(st3("version") === "2" && st3("sub") === "data")
    assert(ss.readTableVersion("g", 2L, "data").count() === 2L)
    assert(ss.readTableVersion("g", 2L, "idx").count() === 1L)
    SnapshotSql.sql(ss, "UPDATE g.data SET v = v + 10 WHERE v = 0")
    assert(ss.readTableVersion("g", 3L, "data")
      .filter(col("k") === 1L).head().getLong(1) === 10L)
    // the CALL spellings route the same sub dispatch
    SnapshotSql.sql(ss, "CALL delete_where('g.data', 'k = 2')")
    assert(ss.readTableVersion("g", 4L, "data").count() === 1L)
  }

  test("CHANGES bounds (r18): tags and timestamps resolve per bound — " +
      "\"what changed between releases\" is one SQL query; integers " +
      "unchanged; an unknown bound refuses naming both paths") {
    val (ss, _) = mkStore("sql_chb_")
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    ss.tag("t", "rel-a", 1L)
    ss.commitAppend("t", Seq((2L, "b"), (3L, "c")).toDF("k", "v"))
    ss.tag("t", "rel-b", 2L)
    val ch = SnapshotSql.sql(ss,
      """SELECT c.k, c._change FROM CHANGES(t, 'rel-a', 'rel-b') c
        |JOIN t cur ON c.k = cur.k ORDER BY c.k""".stripMargin)
    assert(ch.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((2L, "insert"), (3L, "insert")),
      "tag-bounded changes must compose with joins")
    // mixed: integer + tag
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM CHANGES(t, 1, 'rel-b')")
      .head().getLong(0) === 2L)
    // timestamp bound: everything before now = full history to v2
    // (formatted in the SESSION timezone — the same zone the bound
    // resolves in)
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    val ts = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 60000L),
      zone).format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(SnapshotSql.sql(ss,
      s"SELECT count(*) AS n FROM CHANGES(t, 'rel-a', '$ts')")
      .head().getLong(0) === 2L)
    val e = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "SELECT * FROM CHANGES(t, 'nope', 2)"))
    assert(e.getMessage.contains("neither a tag") &&
      e.getMessage.contains("rel-a"), s"refusal names both paths: $e")
  }

  test("CALL update_where named arguments (r18): set => 'col = expr, " +
      "...' resolves against (table, predicate, set); the 3-argument " +
      "positional set-clause form works too; variadic pairs unchanged") {
    val (ss, _) = mkStore("sql_uwn_")
    ss.commitOverwrite("t", Seq((1L, 0L, 9L), (2L, 5L, 9L))
      .toDF("k", "v", "w"))
    SnapshotSql.sql(ss, "CALL update_where(table => 't', " +
      "predicate => 'v = 0', set => 'v = v + 1, w = v')")
    val r = ss.readCurrent("t").orderBy("k").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r === Seq((1L, 1L, 0L), (2L, 5L, 9L)),
      s"named set-clause must keep pre-image semantics: $r")
    // 3-arg positional set clause
    SnapshotSql.sql(ss, "CALL update_where('t', 'k = 2', 'w = w + 100')")
    assert(ss.readCurrent("t").filter(col("k") === 2L).head().getLong(2)
      === 109L)
    // the variadic pair form still dispatches
    SnapshotSql.sql(ss, "CALL update_where('t', 'k = 1', 'w', 'w - 1')")
    assert(ss.readCurrent("t").filter(col("k") === 1L).head().getLong(2)
      === -1L)
  }

  test("CALL changes bounds parity (r18 second wave): tags resolve in " +
      "the procedure form like the TVF, and '<group>.<sub>' routes to " +
      "the per-sub changelog") {
    val (ss, _) = mkStore("sql_chc_")
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    ss.tag("t", "rel-a", 1L)
    ss.commitAppend("t", Seq((2L, "b")).toDF("k", "v"))
    ss.tag("t", "rel-b", 2L)
    assert(SnapshotSql.sql(ss, "CALL changes('t', 'rel-a', 'rel-b')")
      .count() === 1L)
    assert(SnapshotSql.sql(ss, "CALL changes('t', 1, 'rel-b')")
      .count() === 1L, "mixed integer + tag bounds")
    val e = intercept[IllegalArgumentException](
      SnapshotSql.sql(ss, "CALL changes('t', 'nope', 2)"))
    assert(e.getMessage.contains("neither a tag"))
    // group sub parity
    ss.commitTables("g", overwrites = Map(
      "data" -> Seq((1L, 0L)).toDF("k", "v")))
    ss.commitTables("g", appends = Map(
      "data" -> Seq((2L, 1L)).toDF("k", "v")))
    assert(SnapshotSql.sql(ss, "CALL changes('g.data', 1, 2)")
      .count() === 1L)
  }

  test("statement parsing review fixes (r18): a SET expression holding " +
      "a scalar subquery with its own WHERE splits at the depth-0 " +
      "WHERE, duplicate SET columns refuse, backslash-escaped quotes " +
      "inside SET literals parse whole, and escaped quotes in CHANGES " +
      "tag bounds resolve") {
    val (ss, _) = mkStore("sql_rf_")
    ss.commitOverwrite("t", Seq((1L, 0L, "x"), (2L, 5L, "y"))
      .toDF("k", "v", "s"))
    // the subquery's WHERE sits at paren depth 1 — the statement's own
    // depth-0 WHERE is the boundary (pre-fix: mis-split ParseException)
    SnapshotSql.sql(ss,
      "UPDATE t SET v = (SELECT max(x) FROM VALUES (7),(9) AS q(x) " +
        "WHERE x < 8) WHERE k = 1")
    assert(ss.readCurrent("t").filter(col("k") === 1L).head().getLong(1)
      === 7L, "the subquery SET value must assign")
    // duplicate assignments refuse (SQL semantics; .toMap kept the last)
    val e = intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "UPDATE t SET v = v + 1, v = 0 WHERE k = 2"))
    assert(e.getMessage.contains("more than once"))
    intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "CALL update_where('t', 'k = 2', 'v', '1', 'v', '2')"))
    // a backslash-escaped quote inside a SET literal stays ONE literal
    SnapshotSql.sql(ss,
      """UPDATE t SET s = 'a\'b', v = 42 WHERE k = 2""")
    val r2 = ss.readCurrent("t").filter(col("k") === 2L).head()
    assert(r2.getLong(1) === 42L && r2.getString(2) === "a'b",
      s"escaped-quote SET literal must parse whole: $r2")
    // tag names are charset-fenced ([A-Za-z0-9._-]+) so escaped quotes
    // can never reach a tag lookup; the single-pass unescape still
    // keeps '' doubling exact through a CHANGES bound
    ss.tag("t", "rel.1", 1L)
    ss.tag("t", "now", 3L)
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS n FROM CHANGES(t, 'rel.1', 'now')")
      .head().getLong(0) > 0L)
  }

  test("masking hardening (r18): nested block comments stay fully " +
      "masked (a store reference in the nested tail is untouched), " +
      "backslash-escaped quotes keep the literal intact, doubled " +
      "backticks stay inside one identifier, and a failing rewrite " +
      "leaks no temp views") {
    val (ss, _) = mkStore("sql_mask_")
    ss.commitOverwrite("t", Seq((1L, "a")).toDF("k", "v"))
    def graftViews(): Seq[String] = spark.catalog.listTables()
      .collect().filter(t => t.isTemporary &&
        t.name.startsWith("graft_sql_")).map(_.name).toSeq
    // nested comment: pre-r18 the tail after the INNER close unmasked,
    // so `TAG AS OF 'missing'` would resolve (and throw) on a query
    // Spark itself accepts
    assert(SnapshotSql.sql(ss,
      "SELECT 42 AS x /* a /* b */ FROM t TAG AS OF 'missing' */")
      .head().getInt(0) === 42)
    // backslash escape: the literal must survive byte-for-byte even
    // though it contains ` from t`
    assert(SnapshotSql.sql(ss, """SELECT 'it\'s from t' AS s""")
      .head().getString(0) === "it's from t")
    // doubled backticks: one identifier, no mask desync after it
    assert(SnapshotSql.sql(ss,
      "SELECT count(*) AS `n``x` FROM t").head().getLong(0) === 1L)
    // a rewrite that throws AFTER registering views must drop them
    val before = graftViews()
    intercept[IllegalArgumentException](SnapshotSql.sql(ss,
      "SELECT a.k FROM t a JOIN t TAG AS OF 'missing' b ON a.k = b.k"))
    assert(graftViews() === before,
      "a failing rewrite must not leak temp views into the catalog")
  }
}
