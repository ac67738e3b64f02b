package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.RelOps

/** Pins the distributed rank/prefix-sum operators to their single-partition
  * window equivalents — the semantics are classic SQL; the point of the
  * RelOps versions is the multi-partition plan shape.
  */
class RelOpsSpec extends SparkSpec {

  import spark.implicits._

  test("globalCumSum equals a single-partition running-total window") {
    // ragged values incl. zeros; 37 partitions to force many range splits
    val df = spark.range(0, 5000).select(col("id"),
        (pmod(col("id") * 2654435761L, lit(97))).as("v"))
      .repartition(37)
    val got = RelOps.globalCumSum(df, Seq(col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(want))
    assert(got.last._2 == df.agg(sum("v")).as[Long].head())
  }

  test("globalCumSum handles null values as zero-contribution rows") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)), (4L, None))
      .toDF("id", "v").repartition(3)
    val got = RelOps.globalCumSum(df, Seq(col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(5L, 5L, 12L, 12L))
  }

  test("globalCumSum refuses a colliding output column") {
    val df = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      RelOps.globalCumSum(df, Seq(col("id")), "v", "v")
    }
  }

  test("globalRowNumber refuses a colliding output column") {
    val df = Seq((1L, 2L)).toDF("id", "rn")
    intercept[IllegalArgumentException] {
      RelOps.globalRowNumber(df, Seq(col("id")))
    }
  }
}
