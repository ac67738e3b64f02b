package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X117: time-series smoothing features over keyed event streams.
  *
  * Exponentially-weighted moving averages are the standard decay feature a
  * monitoring / feature-engineering pipeline computes per entity (pandas
  * `ewm(adjust=True)`, Flink's decaying counters). The textbook recurrence
  * y_i = α·v_i + (1-α)·y_{i-1} is inherently sequential — on Spark that
  * shape needs either a per-key sorted fold (mapGroups: loses codegen,
  * materializes each group) or a O(n²) expanding window. The practical
  * distributed formulation is the TRUNCATED adjusted EWMA:
  *
  *   y_i = Σ_{d=0..K} v_{i-d}·β^d / Σ_{d=0..K, i-d exists} β^d,  β = 1-α
  *
  * identical to pandas' adjust=True up to the dropped tail, whose total
  * weight is β^{K+1}/(1-β) — for α=1/2, K=10 that is < 0.1%: below any
  * feature pipeline's noise floor. The win at 100 TB: the whole column is
  * ONE window over (key, ts) — a single hash shuffle on the key, an
  * in-partition sort, and a fixed chain of K+1 codegen'd lag() reads; no
  * state, no iteration, no group materialization.
  *
  * Numeric determinism (what lets the driver HASH this output against
  * DuckDB): the numerator and denominator are built as explicit
  * left-associated `+` chains — the association every SQL engine gives the
  * written expression — so both engines execute the same IEEE operation
  * sequence. With a dyadic α (1/2, 1/4, ...) the weights β^d are exact
  * binary doubles, so the only rounding is the shared addition order.
  */
object TimeSeriesOps {

  /** Truncated adjusted EWMA (see object doc) of `valueCol` per `keyCol`,
    * ordered by `orderCols` (must be a total order within a key or the
    * lag() reads are nondeterministic — pass a unique tiebreaker).
    * Appends `outCol` to the input row. K+1 weights β^0..β^K; rows closer
    * than K to the key's start renormalize over the weights present. */
  def ewmaAdjusted(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                   valueCol: String, alpha: Double, k: Int,
                   outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1] expected, got $alpha")
    require(k >= 0, s"nonnegative lag depth expected, got $k")
    require(!df.columns.exists(_.startsWith("__ewma_lag")),
      "ewmaAdjusted: input already has '__ewma_lag*' columns — a collision " +
        "would corrupt the lag chain then drop the caller's column")
    require(!df.columns.contains(outCol),
      s"ewmaAdjusted: input already has a '$outCol' column; pass a " +
        "distinct outCol")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val weights = ewmaWeights(alpha, k)
    // materialize each lag ONCE as a named column — num and den both
    // reference it, so the Window node evaluates k lags, not 2k
    val lagged = (1 to k).foldLeft(df) { (acc, d) =>
      acc.withColumn(s"__ewma_lag$d", lag(col(valueCol), d).over(w))
    }
    def lagD(d: Int): Column =
      if (d == 0) col(valueCol) else col(s"__ewma_lag$d")
    val num = (0 to k).map(d => coalesce(lagD(d) * lit(weights(d)), lit(0.0)))
      .reduceLeft(_ + _)
    val den = (0 to k).map(d =>
        when(lagD(d).isNotNull, lit(weights(d))).otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    lagged.withColumn(outCol, num / den)
      .drop((1 to k).map(d => s"__ewma_lag$d"): _*)
  }

  /** β^d for d = 0..k as EXACT decimal strings → doubles. Computed with
    * BigDecimal so a dyadic α yields weights that are exactly-representable
    * binary doubles AND short decimal literals — the same constants an
    * oracle SQL text embeds (see [[ewmaWeightSql]]). */
  def ewmaWeights(alpha: Double, k: Int): IndexedSeq[Double] = {
    val beta = BigDecimal(1.0) - BigDecimal(alpha)
    (0 to k).map(d => beta.pow(d).toDouble)
  }

  /** The weight literals as SQL text (exact decimal form), for building an
    * oracle expression with bit-identical constants. */
  def ewmaWeightSql(alpha: Double, k: Int): IndexedSeq[String] = {
    val beta = BigDecimal(1.0) - BigDecimal(alpha)
    (0 to k).map(d => beta.pow(d).underlying.stripTrailingZeros.toPlainString)
  }
}
