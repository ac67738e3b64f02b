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

  /** Run `f` with SQL confs set, restoring previous values after —
    * shared by every spec that pins plan shapes under AQE/broadcast
    * toggles (one definition; copies drifted across three specs once). */
  def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
