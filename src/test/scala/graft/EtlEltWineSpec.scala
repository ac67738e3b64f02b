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

  test("ELT in-store transform filters and projects") {
    val app = freshApp()
    val (etl, _) = app.runAll(sunday)
    val n = etl.value[Long]("transform_in_store")
    assert(n > 0 && n < 4898)
  }
}
