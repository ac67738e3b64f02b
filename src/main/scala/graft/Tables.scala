package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas

/** Table access for a scale-factor directory of parquet tables.
  *
  * Every read declares its schema explicitly (skips footer-merge inference
  * and fails loudly on drift). Reads stay lazy: Catalyst prunes columns and
  * pushes filters into the parquet scan, so an `Env.lineitem` followed by
  * `.select(...).filter(...)` reads only the referenced columns/row groups —
  * the ELT "transform in the store" semantics (SURVEY §3.2) for free.
  */
final case class Env(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.schema(Schemas.byName(name)).parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** events.ts arrives as TIMESTAMP_MICROS in current testdata but was
    * TIMESTAMP(NANOS) in earlier drops (illegal for Spark's reader). Probe
    * the footer once per path: NANOS files read as raw longs (legacy conf)
    * and floor-convert ns→µs (matching DuckDB's truncation); MICROS files
    * read straight into TimestampType. */
  def events: DataFrame = {
    val path = s"$dir/events.parquet"
    if (Env.eventsTsIsLegacyNanos(spark, path)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(Schemas.eventsRaw).parquet(path).withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.schema(Schemas.events).parquet(path)
  }
  /** Streaming analog of [[events]]: same footer-adaptive ts handling over
    * a directory of events parquet files (file-source streams need a dir). */
  def eventsStream(streamDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    if (Env.eventsTsIsLegacyNanos(spark, streamDir)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.readStream.schema(Schemas.eventsRaw).parquet(streamDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.readStream.schema(Schemas.events).parquet(streamDir)
  }

  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Env {
  private val legacyNanosByPath =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** True iff the parquet footer types events.ts as TIMESTAMP(NANOS).
    * One driver-side footer read per distinct path, cached for the JVM —
    * at 100 TB this never touches row groups. With nanosAsLong set a NANOS
    * column infers as LongType; MICROS infers as TimestampType. */
  private[graft] def eventsTsIsLegacyNanos(
      spark: SparkSession, path: String): Boolean =
    legacyNanosByPath.computeIfAbsent(path, { p =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val inferred = spark.read.parquet(p).schema
      inferred.find(_.name == "ts")
        .exists(_.dataType == org.apache.spark.sql.types.LongType)
    }).booleanValue()
}
