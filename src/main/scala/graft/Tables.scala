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

  /** events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's reader.
    * Read it as raw nanos (legacy conf, runtime-settable) and floor-convert
    * to a micros TimestampType, matching DuckDB's ns→µs truncation. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
