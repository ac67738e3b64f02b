package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazily created). */
trait SparkSpec extends AnyFunSuite {
  // same tuned builder production sessions use (GraftSession is the one
  // source of truth for engine config — specs must not diverge)
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  def sfDir = "/root/testdata/sf0.001"
  def env: Env = Env(spark, sfDir)
}
