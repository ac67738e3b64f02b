package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for every engine boundary (SURVEY §1.2: schemas are
  * declared, never inferred, at engine boundaries — schema drift is a
  * silent-corruption source at 100 TB).
  *
  * Star-schema / events / documents / embeddings shapes mirror the driver
  * testdata (FIXTURES.md §2, verified against parquet footers). The wine
  * schema mirrors the reference DDL (reference dags/etl_elt_wine.py:129-144)
  * with FLOAT widened to double (SURVEY caveat C2).
  */
object Schemas {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Logical events schema: ts is a micros TimestampType. Files written as
    * TIMESTAMP_MICROS read directly with this schema; files written as
    * TIMESTAMP(NANOS) — which Spark's reader rejects as a timestamp — go
    * through [[eventsRaw]] plus a ns→µs floor-convert (Env.events picks the
    * path per file footer, so either vintage of testdata works). */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Legacy-nanos arrival schema: with spark.sql.legacy.parquet.nanosAsLong
    * a TIMESTAMP(NANOS) column arrives as raw nanos (LongType); Env.events
    * converts to TimestampType (micros, floor-truncated — matching DuckDB's
    * native ns→µs truncation). Only used when the footer says NANOS. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val byName: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Wine table as loaded by the reference ETL (id assigned on ingest,
    * high_quality derived in transform). Reference: DuckDB DDL at
    * dags/etl_elt_wine.py:129-144; CSV header data/winequality-white.csv:1. */
  val wineRaw: StructType = StructType(Seq(
    StructField("fixed_acidity", DoubleType),
    StructField("volatile_acidity", DoubleType),
    StructField("citric_acid", DoubleType),
    StructField("residual_sugar", DoubleType),
    StructField("chlorides", DoubleType),
    StructField("free_sulfur_dioxide", DoubleType),
    StructField("total_sulfur_dioxide", DoubleType),
    StructField("density", DoubleType),
    StructField("pH", DoubleType),
    StructField("sulphates", DoubleType),
    StructField("alcohol", DoubleType),
    StructField("quality", IntegerType)))

  /** Wine feature columns (reference dags/include/utils.py:52-67). */
  val wineFeatures: Seq[String] = Seq(
    "fixed_acidity", "volatile_acidity", "citric_acid", "residual_sugar",
    "chlorides", "free_sulfur_dioxide", "total_sulfur_dioxide", "density",
    "pH", "sulphates", "alcohol")
}
