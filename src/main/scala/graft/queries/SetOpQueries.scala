package graft.queries

import org.apache.spark.sql.functions._

/** Bag-semantics set operators (ALL variants — o3/o4/o5 cover the
  * distinct forms) and explicit grouping-level identification
  * (GROUPING()/grouping_id over ROLLUP — a11's sentinel-coalesce pattern
  * shown with the standard introspection functions instead).
  */
object SetOpQueries {

  val all: Seq[Query] = Seq(

    // INTERSECT ALL: multiplicity = min(count_left, count_right) per value.
    Query("o6_intersect_all",
      Some("""SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
             |INTERSECT ALL
             |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH'
             |ORDER BY k""".stripMargin),
      env => env.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
        .intersectAll(env.orders.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_custkey").as("k")))
        .orderBy("k")),

    // EXCEPT ALL: multiplicity = max(0, count_left - count_right).
    Query("o7_except_all",
      Some("""SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
             |EXCEPT ALL
             |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH'
             |ORDER BY k""".stripMargin),
      env => env.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
        .exceptAll(env.orders.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_custkey").as("k")))
        .orderBy("k")),

    // ROLLUP with GROUPING() markers instead of null-sentinel coalescing:
    // the grouping flags disambiguate "aggregated-away" from "data null"
    // — the standard way to consume multi-level aggregates.
    Query("a17_grouping_id",
      Some("""SELECT coalesce(o_orderstatus, '') AS status,
             |  coalesce(o_orderpriority, '') AS prio,
             |  GROUPING(o_orderstatus) AS g_status,
             |  GROUPING(o_orderpriority) AS g_prio,
             |  count(*) AS n
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY g_status, g_prio, status, prio""".stripMargin),
      env => env.orders
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio"),
          count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("")).as("status"),
          coalesce(col("o_orderpriority"), lit("")).as("prio"),
          col("g_status"), col("g_prio"), col("n"))
        .orderBy("g_status", "g_prio", "status", "prio"))
  )
}
