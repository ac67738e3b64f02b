package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function and aggregate breadth (engine completeness beyond the
  * reference's minimal F-surface): string/math/conditional/cast/date
  * families, distinct aggregates, argmin/argmax, ordered array_agg,
  * null semantics, scalar subquery. All oracle-checked.
  */
object FunctionQueries {

  val all: Seq[Query] = Seq(

    Query("f7_string_funcs",
      Some("""SELECT c_custkey,
             |  substring(c_name, 1, 8) AS pre,
             |  concat_ws('|', c_mktsegment, c_name) AS joined,
             |  lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
             |  length(c_name) AS name_len,
             |  CAST(c_name LIKE 'Customer#%24' AS BOOLEAN) AS like24,
             |  coalesce(split_part(c_name, '#', 2), '') AS num_part
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.select(col("c_custkey"),
          substring(col("c_name"), 1, 8).as("pre"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
          lpad(col("c_custkey").cast("string"), 6, "0").as("padded"),
          length(col("c_name")).as("name_len"),
          col("c_name").like("Customer#%24").as("like24"),
          // Spark getItem past the end yields NULL where DuckDB split_part
          // yields '' — coalesce both sides to '' for parity
          coalesce(split(col("c_name"), "#").getItem(1), lit("")).as("num_part"))
        .orderBy("c_custkey")),

    Query("f8_math_funcs",
      Some("""SELECT o_orderkey,
             |  abs(o_totalprice - 250000) AS dist_mid,
             |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
             |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
             |  round(sqrt(o_totalprice), 6) AS sqrt_p,
             |  round(ln(o_totalprice), 6) AS ln_p,
             |  round(pow(o_totalprice / 100000, 2), 6) AS pow_p
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          abs(col("o_totalprice") - 250000).as("dist_mid"),
          ceil(col("o_totalprice") / 1000).as("ceil_k"),
          floor(col("o_totalprice") / 1000).as("floor_k"),
          round(sqrt(col("o_totalprice")), 6).as("sqrt_p"),
          round(log(col("o_totalprice")), 6).as("ln_p"),
          round(pow(col("o_totalprice") / 100000, 2), 6).as("pow_p"))
        .orderBy("o_orderkey")),

    Query("f9_conditional",
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice >= 300000 THEN 'high'
             |       WHEN o_totalprice >= 100000 THEN 'mid'
             |       ELSE 'low' END AS bucket,
             |  coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_norm,
             |  least(o_totalprice, 250000.0) AS capped,
             |  greatest(o_totalprice, 250000.0) AS floored
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          when(col("o_totalprice") >= 300000, "high")
            .when(col("o_totalprice") >= 100000, "mid")
            .otherwise("low").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending"))
            .as("status_norm"),
          least(col("o_totalprice"), lit(250000.0)).as("capped"),
          greatest(col("o_totalprice"), lit(250000.0)).as("floored"))
        .orderBy("o_orderkey")),

    // double→int goes through floor() on BOTH sides: a bare CAST rounds
    // to nearest in DuckDB but truncates in Spark — the values here are
    // non-negative, so floor ≡ truncation and the semantics align by
    // construction, not by data luck.
    Query("f10_casts",
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(floor(l_quantity) AS BIGINT) AS qty_int,
             |  CAST(l_orderkey AS VARCHAR) AS key_str,
             |  CAST(l_shipdate AS DATE) AS ship_day,
             |  CAST(CAST(floor(l_discount * 100) AS INT) AS DOUBLE) AS disc_pct
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      env => env.lineitem.select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("long").as("qty_int"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_shipdate").cast("date").as("ship_day"),
          floor(col("l_discount") * 100).cast("int").cast("double").as("disc_pct"))
        .orderBy("l_orderkey", "l_linenumber")),

    Query("f11_date_arith",
      Some("""SELECT o_orderkey,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due,
             |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
             |  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_q
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTHS")).as("plus_q"))
        .orderBy("o_orderkey")),

    Query("a6_distinct_agg",
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  round(sum(DISTINCT l_quantity), 4) AS sum_dq,
             |  round(avg(DISTINCT l_quantity), 6) AS avg_dq
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      env => env.lineitem.groupBy("l_returnflag").agg(
          countDistinct("l_partkey").as("n_parts"),
          round(sum_distinct(col("l_quantity")), 4).as("sum_dq"),
          round(expr("avg(DISTINCT l_quantity)"), 6).as("avg_dq"))
        .orderBy("l_returnflag")),

    // Caveat: min_by/arg_min pick arbitrarily on ordering-value ties in
    // BOTH engines (DuckDB 1.0 arg_min accepts no composite key to break
    // them). Verified tie-free on this data at sf0.01 and sf0.1: no group
    // has two orders sharing its min or max o_totalprice.
    Query("a7_minmax_by",
      Some("""SELECT o_orderstatus,
             |  arg_min(o_orderkey, o_totalprice) AS cheapest_key,
             |  arg_max(o_orderkey, o_totalprice) AS priciest_key,
             |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      env => env.orders.groupBy("o_orderstatus").agg(
          min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_key"),
          max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_key"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("o_orderstatus")),

    // The aggregated list is serialized to a CSV string for the comparison:
    // the driver's pandas hash step cannot sort/hash raw array cells. The
    // ordering is numeric (sorted before the cast) so both engines agree.
    Query("a8_array_agg",
      Some("""SELECT o_custkey,
             |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
             |    AS order_keys,
             |  count(*) AS n
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 3
             |ORDER BY o_custkey""".stripMargin),
      env => env.orders.groupBy("o_custkey").agg(
          concat_ws(",", transform(sort_array(collect_list(col("o_orderkey"))),
            _.cast("string"))).as("order_keys"),
          count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy("o_custkey")),

    Query("f12_null_semantics",
      Some("""SELECT
             |  count(*) AS n_all,
             |  count(masked) AS n_nonnull,
             |  count(*) - count(masked) AS n_null,
             |  count(*) FILTER (WHERE masked IS NOT DISTINCT FROM 5) AS n_five
             |FROM (SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
             |        THEN NULL
             |        ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS masked
             |      FROM events)""".stripMargin),
      env => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        val base = env.events.select(
          when(k % 3 === 0, lit(null)).otherwise(k).as("masked"))
        base.agg(
          count(lit(1)).as("n_all"),
          count(col("masked")).as("n_nonnull"),
          (count(lit(1)) - count(col("masked"))).as("n_null"),
          count(when(col("masked") <=> 5, 1)).as("n_five"))
      }),

    // Correlated-subquery shape: orders above their own customer's average
    // order value. Decorrelated to a per-key window average — the plan
    // Catalyst's RewriteCorrelatedScalarSubquery would produce, with one
    // shuffle on the correlation key.
    Query("x16_correlated_subquery",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM (
             |  SELECT o_orderkey, o_custkey, o_totalprice,
             |    round(avg(o_totalprice) OVER (PARTITION BY o_custkey), 4) AS cavg
             |  FROM orders)
             |WHERE o_totalprice > cavg ORDER BY o_orderkey""".stripMargin),
      env => {
        // cavg rounded before the comparison: an unrounded double in a
        // row-membership predicate lets cross-engine summation-order noise
        // flip which rows survive (repo round-before-compare discipline)
        val w = Window.partitionBy("o_custkey")
        env.orders
          .withColumn("cavg", round(avg("o_totalprice").over(w), 4))
          .filter(col("o_totalprice") > col("cavg"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      }),

    // Scalar subquery: orders above the global average price.
    Query("x12_scalar_subquery",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (SELECT round(avg(o_totalprice), 4) FROM orders)
             |ORDER BY o_orderkey""".stripMargin),
      env => {
        val avgPrice = env.orders.agg(round(avg("o_totalprice"), 4).as("avg_p"))
        env.orders.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_p"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      })
  )
}
