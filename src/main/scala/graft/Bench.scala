package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    // Warm the session (parquet reader, codegen, shuffle infra) so the
    // first timed query doesn't absorb ~5s of one-time JVM/session cost.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()
    spark.range(1000).groupBy(org.apache.spark.sql.functions.col("id") % 10)
      .count().collect()
    val errors = scala.collection.mutable.ListBuffer[String]()
    // A failed query reports null (not its wall time) and is excluded from
    // the headline total, so the metric only aggregates successful runs.
    val results: Seq[(String, Option[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> None
        }
      }
    val qs = results.map { case (k, v) =>
        s"\"" + k + "\":" + v.map(_.toString).getOrElse("null")
      }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
