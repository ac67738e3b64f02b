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
}
