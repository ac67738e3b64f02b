package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesOps

/** X117 truncated adjusted EWMA: parity with a driver-side pandas-style
  * reference fold, renormalization at key starts, and weight exactness. */
class TimeSeriesOpsSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: pandas ewm(adjust=True) truncated to the last k+1 values. */
  private def refEwma(vs: Seq[Double], alpha: Double, k: Int): Seq[Double] = {
    val beta = 1.0 - alpha
    vs.indices.map { i =>
      val lo = math.max(0, i - k)
      val terms = (lo to i).reverse.map(j => vs(j) * math.pow(beta, i - j))
      val weights = (lo to i).map(j => math.pow(beta, i - j))
      terms.sum / weights.sum
    }
  }

  test("X117: ewmaAdjusted matches the truncated reference fold per key") {
    val rows = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (1L, 4L, 0.0),
      (2L, 5L, 5.0), (2L, 6L, 5.0), (2L, 7L, 50.0))
    val df = rows.toDF("k", "seq", "v")
    val out = TimeSeriesOps.ewmaAdjusted(df, "k", Seq(col("seq")), "v",
        alpha = 0.5, k = 10)
      .orderBy("k", "seq").select("k", "ewma").as[(Long, Double)].collect()
    val want1 = refEwma(Seq(10.0, 20.0, 30.0, 0.0), 0.5, 10)
    val want2 = refEwma(Seq(5.0, 5.0, 50.0), 0.5, 10)
    val got1 = out.filter(_._1 == 1L).map(_._2).toSeq
    val got2 = out.filter(_._1 == 2L).map(_._2).toSeq
    got1.zip(want1).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    got2.zip(want2).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    // first row of each key is the raw value (weights renormalize to w0)
    assert(got1.head === 10.0)
    assert(got2.head === 5.0)
  }

  test("X117: truncation bound — beyond k lags old values stop mattering") {
    // 15 values; with k=3 the EWMA at the last row must equal the EWMA of
    // a series where the first 11 values are replaced by garbage
    val tail = Seq(1.0, 2.0, 3.0, 4.0)
    val a = (1 to 11).map(_ => 999.0) ++ tail
    val b = (1 to 11).map(_ => -5.0) ++ tail
    def lastEwma(vs: Seq[Double]): Double = {
      val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
        .toDF("k", "seq", "v")
      TimeSeriesOps.ewmaAdjusted(df, "k", Seq(col("seq")), "v", 0.5, 3)
        .orderBy(desc("seq")).select("ewma").as[Double].head()
    }
    assert(lastEwma(a) === lastEwma(b))
  }

  test("X117: dyadic alpha yields exact binary weights and exact SQL text") {
    val w = TimeSeriesOps.ewmaWeights(0.5, 10)
    assert(w(0) === 1.0 && w(1) === 0.5 && w(10) === math.pow(0.5, 10))
    // SQL literals round-trip to the same doubles
    val sql = TimeSeriesOps.ewmaWeightSql(0.5, 10)
    sql.zip(w).foreach { case (s, d) => assert(s.toDouble === d) }
    assert(sql(10) === "0.0009765625")
  }

  test("X117: ties in the order columns are broken by the tiebreaker " +
      "(total order requirement)") {
    // two rows share seq; tiebreak on id makes lag() deterministic
    val df = Seq((1L, 1L, 1L, 4.0), (1L, 1L, 2L, 8.0), (1L, 2L, 3L, 2.0))
      .toDF("k", "seq", "id", "v")
    val out = TimeSeriesOps.ewmaAdjusted(df, "k",
        Seq(col("seq"), col("id")), "v", 0.5, 10)
      .orderBy("id").select("ewma").as[Double].collect()
    assert(out(0) === 4.0)
    assert(out(1) === (8.0 + 4.0 * 0.5) / 1.5)
    assert(out(2) === (2.0 + 8.0 * 0.5 + 4.0 * 0.25) / 1.75)
  }
}
