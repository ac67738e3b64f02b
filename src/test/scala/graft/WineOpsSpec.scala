package graft

import org.apache.spark.sql.Row
import graft.ops.WineOps

/** Golden-value tests from the reference's own data (SURVEY §5.2 layer 2;
  * values in FIXTURES.md §1, computed by running the reference pandas
  * pipeline at threshold=7, frac=1.0). */
class WineOpsSpec extends SparkSpec {

  lazy val wine = WineOps.extract(spark)
  lazy val filtered = WineOps.transform(7)(wine)

  test("S1-S3: extract loads 4,898 rows with contiguous 1-based ids") {
    assert(wine.count() === 4898)
    val ids = wine.select("id").orderBy("id").collect().map(_.getInt(0))
    assert(ids.head === 1 && ids.last === 4898)
    assert(ids.toSeq === (1 to 4898))
  }

  test("S2: normalizeColumns rewrites spaces to underscores") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("fixed acidity", "citric acid")
    assert(WineOps.normalizeColumns(df).columns.toSeq ===
      Seq("fixed_acidity", "citric_acid"))
  }

  test("S4: frac=1.0 sample is the identity; frac=0.5 is binomial-ish") {
    assert(WineOps.sampleFraction(1.0, 1)(wine).count() === 4898)
    val n = WineOps.sampleFraction(0.5, 1)(wine).count()
    assert(n > 2000 && n < 2900, s"sampled $n of 4898 at frac=0.5")
  }

  test("P4+P5: threshold=7 keeps 1,060 rows, classes {7:880, 8:175, 9:5}") {
    assert(filtered.count() === 1060)
    val classes = filtered.groupBy("quality").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(classes === Map(7 -> 880L, 8 -> 175L, 9 -> 5L))
    assert(filtered.filter(!org.apache.spark.sql.functions.col("high_quality")).count() === 0)
  }

  test("A1 flagship: per-quality alcohol stats match the reference values") {
    val rows = WineOps.flagshipReport(filtered).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(9, 8, 7))
    def check(r: Row, mean: Double, median: Double, std: Double,
              mn: Double, mx: Double, n: Long): Unit = {
      assert(math.abs(r.getDouble(1) - mean) < 1e-6, s"mean ${r.getDouble(1)} != $mean")
      assert(math.abs(r.getDouble(2) - median) < 1e-6)
      assert(math.abs(r.getDouble(3) - std) < 1e-6)
      assert(r.getDouble(4) === mn && r.getDouble(5) === mx && r.getLong(6) === n)
    }
    check(rows(0), 12.180000, 12.5, 1.013410, 10.4, 12.9, 5)
    check(rows(1), 11.636000, 12.0, 1.280138, 8.5, 14.0, 175)
    check(rows(2), 11.367936, 11.4, 1.246536, 8.6, 14.2, 880)
  }

  test("ELT transform: projection + sulfur filter matches reference golden") {
    val out = WineOps.eltTransform(wine)
    assert(out.columns.toSeq === Seq("quality", "alcohol"))
    // golden: total_sulfur_dioxide < 125 keeps 2,005 of 4,898 rows
    // (computed from the reference CSV)
    assert(out.count() === 2005L)
  }
}
