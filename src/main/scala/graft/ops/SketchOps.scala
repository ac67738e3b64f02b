package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Mergeable-sketch aggregates beyond HLL (x7_approx_distinct) and the GK
  * quantile sketch (x7_approx_quantile): count-min frequency estimation.
  * The sketch is built distributed (one pass, mergeable partials — the
  * 100 TB shape); only the fixed-size sketch reaches the driver, which
  * then answers point-frequency queries for the candidate keys.
  */
object SketchOps {

  /** Estimated occurrence counts for `candidates` of column `keyCol`,
    * via a count-min sketch built in one distributed pass. Guarantees
    * (property-tested): estimate >= true count; estimate <= true count
    * + eps * N with probability >= confidence. */
  def cmsCounts(df: DataFrame, keyCol: String, candidates: Seq[String],
                eps: Double = 0.0001, confidence: Double = 0.999,
                seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val sketch = df.stat.countMinSketch(keyCol, eps, confidence, seed)
    val rows = candidates.map(k => Row(k, sketch.estimateCount(k)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField(keyCol, StringType, nullable = false),
        StructField("est_n", LongType, nullable = false))))
  }

  /** Misra-Gries heavy-hitters summary: ≤ k (item, count-estimate)
    * entries from ONE pass with mergeable partials — the deterministic-
    * guarantee companion to CMS (which answers point queries but cannot
    * enumerate the heavy items without a candidate list). Guarantees,
    * all checked by `x98_mg_bound`/spec against exact counts:
    *   est(x) <= true(x);  true(x) - est(x) <= N/(k+1);
    *   every x with true(x) > N/(k+1) IS in the summary.
    * Which LIGHT items ride along is merge-order-dependent — only the
    * bounds are deterministic, so the contract checks bounds, never the
    * tail membership.
    *
    * Scale shape: the buffer is a ≤(2k) map per partition, merged
    * pairwise on the driver-bound reduce path like any Aggregator
    * partial — bytes moved are O(k · partitions), independent of N.
    * The k-th-largest subtraction at merge keeps the summed error
    * within the additive budget (Agarwal et al., "Mergeable summaries"). */
  final class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    require(k >= 1)
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      if (b.contains(x)) b.updated(x, b(x) + 1L)
      else if (b.size < k) b.updated(x, 1L)
      else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (m, (x, c)) =>
        m.updated(x, m.getOrElse(x, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count from everything: at most k
        // survive, and the subtraction is bounded by the merge's own mass
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** One-pass MG summary of `col` as a driver map (≤ k entries). */
  def mgHeavyHitters(df: DataFrame, keyCol: String, k: Int): Map[String, Long] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string")).na.drop().as[String]
      .select(new MisraGries(k).toColumn).head()
  }
}
