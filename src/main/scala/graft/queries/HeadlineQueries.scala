package graft.queries

import org.apache.spark.sql.functions._

/** Headline analytical queries in classic TPC-H shapes over the testdata
  * star schema — the multi-join plans a warehouse engine lives on. Dims
  * (nation/region) broadcast; fact-fact joins shuffle on their keys and
  * AQE picks broadcast when the filtered side collapses. Each ends in a
  * deterministic ORDER BY (+ tiebreak under LIMIT).
  */
object HeadlineQueries {

  private val revenue = sum(col("l_extendedprice") * (lit(1) - col("l_discount")))

  val all: Seq[Query] = Seq(

    // Q3 shape: revenue of building-segment orders shipped after a date.
    Query("x13_shipping_priority",
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  o_orderdate, o_orderpriority
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin),
      env => env.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(env.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(env.lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(revenue, 4).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(20)),

    // Q5 shape: revenue per ASIA nation from locally-supplied lineitems.
    Query("x14_local_supplier_volume",
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      env => env.customer
        .join(env.orders
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(env.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(env.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(env.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(env.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(revenue, 4).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))),

    // Q10 shape: top customers by returned-item revenue.
    Query("x15_returned_item_reporting",
      Some("""SELECT c_custkey, c_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  c_acctbal, n_name
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      env => env.customer
        .join(env.orders, col("c_custkey") === col("o_custkey"))
        .join(env.lineitem.filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(env.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round(revenue, 4).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)),

    // Q1 shape: the pricing-summary report — one wide scan, map-side
    // partial aggregation into a handful of groups; the canonical
    // scan-throughput benchmark for a columnar engine.
    Query("x40_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  round(sum(l_extendedprice), 4) AS sum_base,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  round(avg(l_extendedprice), 6) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      env => env.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base"),
          round(revenue, 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q18 shape: large-volume customers — a HAVING-gated aggregate joined
    // back to its facts. The quantity-sum gate compares on the rounded
    // aggregate on both sides (round-before-membership discipline); the
    // quantities themselves are integral so the sums are double-exact.
    Query("x41_large_volume_customers",
      Some("""WITH big AS (
             |  SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING round(sum(l_quantity), 4) > 150)
             |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
             |  round(o_totalprice, 2) AS price, sum_qty
             |FROM big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY price DESC, o_orderkey LIMIT 100""".stripMargin),
      env => {
        val big = env.lineitem.groupBy("l_orderkey")
          .agg(round(sum("l_quantity"), 4).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        big.join(env.orders, col("o_orderkey") === col("l_orderkey"))
          .join(env.customer, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), round(col("o_totalprice"), 2).as("price"),
            col("sum_qty"))
          .orderBy(desc("price"), col("o_orderkey"))
          .limit(100)
      })
  )
}
