package graft

import java.nio.file.Files
import java.time.LocalDate
import graft.app.EtlEltWine
import graft.flow.Pipeline._
import graft.sources.TableStore

/** End-to-end recomposition of the reference's DAGs (SURVEY §3):
  * ETL + ELT + dataset-triggered downstream chart, including W10
  * idempotency (rerun must not duplicate rows). */
class EtlEltWineSpec extends SparkSpec {

  def freshApp(): EtlEltWine = {
    val dir = Files.createTempDirectory("graft_store_").toString
    new EtlEltWine(spark, new TableStore(spark, dir))
  }

  val monday = RunConfig(clock = () => LocalDate.of(2026, 8, 10))
  val sunday = RunConfig(clock = () => LocalDate.of(2026, 8, 9))

  test("ETL loads 1,060 filtered rows; both datasets trigger downstream") {
    val app = freshApp()
    val (etl, down) = app.runAll(sunday) // Sunday → report branch (fast)
    assert(etl.succeeded("load_duckdb"))
    assert(etl.value[Map[String, Long]]("load_duckdb")("row_count") === 1060L)
    assert(etl.value[Map[String, Long]]("load_postgres")("row_count") === 4898L)
    // branch: Sunday → print_report, ml skipped (reference weekday<=5 logic)
    assert(etl.succeeded("print_report"))
    assert(etl.outcomes("ml_train") === Skipped)
    // W4: both datasets updated → downstream fired
    assert(down.isDefined)
    val d = down.get
    // Sunday weekday=6 → duckdb extract branch
    assert(d.succeeded("extract_duckdb"))
    assert(d.outcomes("extract_pg") === Skipped)
    assert(d.value[Map[String, Long]]("chart_kde")("row_count") === 1060L)
    // KDE table: 3 classes × 14 grid points
    assert(app.store.read("kde_chart").count() === 42L)
  }

  test("W10: rerunning the ETL is idempotent (keyed append ignores dups)") {
    val app = freshApp()
    app.runAll(sunday)
    val (etl2, _) = app.runAll(sunday)
    assert(etl2.value[Map[String, Long]]("load_duckdb")("row_count") === 1060L)
  }

  test("upsertKeyed replaces same-key rows and appends new keys") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val store = new graft.sources.TableStore(spark, dir)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val n = store.upsertKeyed("t", "k", Seq((2L, "B"), (3L, "c")).toDF("k", "v"))
    assert(n === 3L)
    val rows = store.read("t").orderBy("k").as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("compact merges accumulated small files, preserving rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val store = new graft.sources.TableStore(spark, dir)
    store.overwrite("t", Seq((1L, "a")).toDF("k", "v"))
    (2L to 6L).foreach { i =>
      store.appendKeyed("t", "k", Seq((i, s"v$i")).toDF("k", "v"))
    }
    def nFiles = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/t"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = store.read("t").orderBy("k").as[(Long, String)].collect().toSeq
    assert(nFiles >= 6, s"expected one file per append, saw $nFiles")
    val n = store.compact("t")
    assert(n === 6L)
    assert(nFiles === 1, "compaction should leave a single data file")
    val after = store.read("t").orderBy("k").as[(Long, String)].collect().toSeq
    assert(after === before)
  }

  test("compact preserves nested partition layout (values byte-identical) " +
    "and refuses bucketed tables") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2_").toString
    val store = new graft.sources.TableStore(spark, dir)
    // two partition levels; leading-zero values catch type-inference
    // round-trips (code=01 must NOT come back as code=1)
    store.overwritePartitioned("pt",
      Seq((1L, "01", "x"), (2L, "02", "y"), (3L, "01", "y"))
        .toDF("k", "code", "grp"), Seq("code", "grp"))
    store.compact("pt")
    def ls(rel: String): Seq[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$rel"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.contains("=")).toSeq.sorted
      } finally s.close()
    }
    assert(ls("pt") === Seq("code=01", "code=02"))
    assert(ls("pt/code=01") === Seq("grp=x", "grp=y"))
    assert(store.read("pt").count() === 3)
    store.overwriteBucketed("bt_compact", Seq((1L, "x")).toDF("k", "v"), "k", 4)
    try {
      val e = intercept[IllegalArgumentException](store.compact("bt_compact"))
      assert(e.getMessage.contains("bucketed"))
      // a DIFFERENT store whose same-named table is plain parquet must not
      // trip the guard (the catalog entry lives at another location)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_compact3_").toString
      val store2 = new graft.sources.TableStore(spark, dir2)
      store2.overwrite("bt_compact", Seq((9L, "z")).toDF("k", "v"))
      assert(store2.compact("bt_compact") === 1L)
    } finally spark.sql("DROP TABLE IF EXISTS bt_compact")
  }

  test("appendKeyed releases its checkpoint blocks after the write") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val store = new graft.sources.TableStore(spark, dir)
    store.overwrite("t", Seq((1L, "a")).toDF("k", "v"))
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    (2L to 4L).foreach { i =>
      store.appendKeyed("t", "k", Seq((i, s"v$i")).toDF("k", "v"))
    }
    assert(persisted <= before,
      s"checkpoint blocks leaked: $before -> $persisted persistent RDDs")
  }

  test("partitioned store: writes partition dirs, reads prune at plan time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val store = new graft.sources.TableStore(spark, dir)
    val n = store.overwritePartitioned("ev",
      env.events.withColumn("day", to_date(col("ts"))), Seq("day"))
    assert(n === env.events.count())
    // partition pruning visible in the scan: one day selected → the plan's
    // file index reports a partition filter, not a full scan + filter
    spark.catalog.clearCache()
    val q = store.read("ev").filter(col("day") === "2024-01-05")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"expected partition filter in plan:\n$plan")
    assert(q.count() > 0)
  }

  test("Observation metrics ride the load without a second scan " +
    "(the reference's XCom row_count, Spark-native)") {
    // the reference XComs {"row_count": n} after each load by re-counting;
    // observe() attaches the metrics to the write job itself — at 100 TB
    // a second count() pass over the loaded table is a real cost
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit, sum}
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_obs_").toString)
    val obs = Observation("load_metrics")
    val df = env.orders.observe(obs,
      count(lit(1)).as("row_count"),
      sum("o_totalprice").as("total_price"))
    store.overwrite("orders_observed", df)
    val m = obs.get
    assert(m("row_count") == env.orders.count())
    assert(m("total_price").asInstanceOf[Double] > 0)
  }

  test("format round trip: orc/csv/json overwrite + schema'd read-back ≡ parquet") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_fmt_").toString)
    val df = env.orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .limit(500)
    val want = df.collect().map(_.toString).sorted.toSeq
    for (fmt <- Seq("orc", "csv", "json")) {
      store.overwriteFormat(s"orders_$fmt", df, fmt)
      val back = store.readFormat(s"orders_$fmt", fmt, df.schema)
      assert(back.schema == df.schema, s"$fmt schema drift")
      assert(back.collect().map(_.toString).sorted.toSeq == want,
        s"$fmt round trip lost or altered rows")
    }
  }

  test("W3: expandPar runs the fan-out concurrently with ordered results") {
    import graft.flow.FanOut
    val out = FanOut.expandPar(Seq(3, 1, 2), parallelism = 3) { x =>
      Thread.sleep(x * 50L); x * 10
    }
    assert(out.flatMap(_.toOption) === Seq(30, 10, 20))
    val failing = FanOut.expandPar(Seq(1, 2))(x =>
      if (x == 2) throw new RuntimeException("boom") else x)
    assert(failing.head.isSuccess && failing(1).isFailure)
  }

  test("ELT in-store transform filters and projects") {
    val app = freshApp()
    val (etl, _) = app.runAll(sunday)
    val n = etl.value[Long]("transform_in_store")
    assert(n > 0 && n < 4898)
  }
}
