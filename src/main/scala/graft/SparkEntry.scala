package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared in graft.queries.* as (Env => DataFrame, oracle SQL)
  * pairs; this object just adapts them to the driver's shape.
  */
object SparkEntry {

  def registry: Seq[Query] = {
    val all = CoreQueries.all ++ JoinQueries.all ++ EventQueries.all ++
      TextQueries.all ++ AnalyticQueries.all ++ FunctionQueries.all ++
      HeadlineQueries.all ++ BreadthQueries.all ++ TpchQueries.all ++
      ExtendedFunctionQueries.all ++ CorpusQueries.all ++ SetOpQueries.all ++
      FuzzyQueries.all ++ EmbeddingQueries.all ++ TrainPrepQueries.all ++
      ProfilingQueries.all ++ GraphQueries.all ++ CdcQueries.all ++
      SequenceQueries.all
    // toMap would silently drop a duplicate name from the driver contract
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all.head.run(Env(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { q =>
      q.name -> ((spark: SparkSession, dir: String) => q.run(Env(spark, dir)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
