package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X10 (reference dags/include/utils.py:255-304): per-class Gaussian KDE as
  * a declarative DataFrame query (SURVEY §2.7). The reference loops classes
  * through matplotlib/scipy; here one plan evaluates every class: per-class
  * Scott bandwidth h = n^(-1/5)·σ̂ (σ̂ = stddev ddof=1, scipy gaussian_kde
  * convention), then density(x) = Σᵢ exp(-½((x-vᵢ)/h)²) / (n·h·√2π) over a
  * fixed evaluation grid.
  *
  * Scale: stats is one small aggregate (broadcast into the join); the grid
  * cross join multiplies rows by |grid| before the final aggregate — all
  * map-side until the single groupBy shuffle on (class, x).
  */
object KdeOps {

  def kdeByClass(classCol: String, valueCol: String, grid: Seq[Double])(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gridDf = grid.toDF("x")
    val stats = df.groupBy(classCol).agg(
      count(lit(1)).as("kde_n"),
      stddev_samp(valueCol).as("kde_sd"))
      .withColumn("kde_h", col("kde_sd") * pow(col("kde_n"), lit(-0.2)))
    df.join(broadcast(stats), classCol)
      .crossJoin(broadcast(gridDf))
      .groupBy(col(classCol), col("x"), col("kde_n"), col("kde_h"))
      .agg(sum(exp(lit(-0.5) * pow((col("x") - col(valueCol)) / col("kde_h"), lit(2)))).as("ksum"))
      .select(col(classCol), col("x"),
        round(col("ksum") / (col("kde_n") * col("kde_h") * lit(math.sqrt(2 * math.Pi))), 6)
          .as("density"))
  }
}
