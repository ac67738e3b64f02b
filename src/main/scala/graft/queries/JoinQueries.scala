package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.RelOps

/** Relational extensions X1-X8 (SURVEY §2.2/§2.3/§2.4) over the star
  * schema. Scale posture: dims are broadcast explicitly (X2) or left to
  * Catalyst/AQE stats (X1); windowed ranking shuffles once on its
  * partition keys; top-k plans TakeOrderedAndProject (no full sort).
  */
object JoinQueries {

  val all: Seq[Query] = Seq(

    // X1: fact-to-fact equi join + aggregate (revenue per order status).
    Query("x1_join_agg",
      Some("""SELECT o.o_orderstatus,
             |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
             |  count(*) AS n
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin),
      env => env.lineitem
        .join(env.orders, col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy("o_orderstatus")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // X2: snowflake dim chain with explicit broadcast of the small dims.
    Query("x2_broadcast_join",
      Some("""SELECT r.r_name, count(*) AS n_cust,
             |  round(sum(c.c_acctbal), 4) AS total_bal
             |FROM customer c
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin),
      env => env.customer
        .join(broadcast(env.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(env.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
             round(sum("c_acctbal"), 4).as("total_bal"))
        .orderBy("r_name")),

    // X3: left semi — customers that have at least one order (EXISTS).
    Query("x3_semi_join",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      env => env.customer
        .join(env.orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // X3: left anti — customers with no high-value order (NOT EXISTS; the
    // S6 core). The price filter keeps the result non-empty at every
    // fixture scale: every customer has SOME order, so the unfiltered
    // variant returned 0 rows on both engines and proved nothing.
    Query("x3_anti_join",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin),
      env => env.customer
        .join(env.orders.filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // X4: range join — clicks within the hour preceding each purchase.
    Query("x4_range_join",
      Some("""SELECT p.event_id, count(c.event_id) AS n_clicks
             |FROM events p LEFT JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             |  AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin),
      env => {
        val p = env.events.filter(col("event_type") === "purchase").alias("p")
        val c = env.events.filter(col("event_type") === "click").alias("c")
        p.join(c,
            col("c.user_id") === col("p.user_id") &&
              col("c.ts") >= col("p.ts") - expr("INTERVAL 1 HOUR") &&
              col("c.ts") <= col("p.ts"),
            "left")
          .groupBy(col("p.event_id").as("event_id"))
          .agg(count(col("c.event_id")).as("n_clicks"))
          .orderBy("event_id")
      }),

    // X4b: as-of join — for each purchase, the latest click at-or-before it.
    Query("x4_asof_join",
      Some("""SELECT p.event_id, c.event_id AS click_id, c.ts AS click_ts
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             |  AND c.ts <= p.ts
             |WHERE p.event_type = 'purchase'
             |QUALIFY row_number() OVER (PARTITION BY p.event_id
             |  ORDER BY c.ts DESC, c.event_id DESC) = 1
             |ORDER BY p.event_id""".stripMargin),
      env => {
        val purchases = env.events.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = env.events.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        RelOps.asOfJoinMerge(purchases, clicks, "user_id", "event_id", "ts", "ts", "event_id")
          .select(col("event_id"), col("asof_id").as("click_id"),
                  col("asof_ts").as("click_ts"))
          .orderBy("event_id")
      }),

    // X4c: FORWARD as-of — for each purchase, the earliest click at-or-
    // after it (the "next touchpoint" direction); same one-shuffle merge
    // shape as X4b, mirrored frame. Ties: earliest ts, then smallest id.
    Query("x4_asof_forward",
      // comparisons at µs (CAST truncates the parquet ns): the engine
      // operates on µs timestamps, and a same-µs pair with different ns
      // would otherwise classify differently in the two engines
      Some("""SELECT p.event_id, c.event_id AS click_id, c.ts AS click_ts
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             |  AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
             |WHERE p.event_type = 'purchase'
             |QUALIFY row_number() OVER (PARTITION BY p.event_id
             |  ORDER BY CAST(c.ts AS TIMESTAMP), c.event_id) = 1
             |ORDER BY p.event_id""".stripMargin),
      env => {
        val purchases = env.events.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = env.events.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        RelOps.asOfJoinMergeForward(purchases, clicks,
            "user_id", "event_id", "ts", "ts", "event_id")
          .select(col("event_id"), col("asof_id").as("click_id"),
            col("asof_ts").as("click_ts"))
          .orderBy("event_id")
      }),

    // X4d: NEAREST as-of — the closest click either side, backward
    // preferred on equal gap (pandas merge_asof 'nearest'). Both direction
    // picks ride ONE user_id exchange (two window frames over the same
    // sort). The oracle mirrors the tie rules exactly: gap, then
    // direction (backward first), then id (largest for backward — the
    // X4b rule — smallest for forward).
    Query("x4_asof_nearest",
      Some("""SELECT p.event_id, c.event_id AS click_id, c.ts AS click_ts
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             |WHERE p.event_type = 'purchase'
             |QUALIFY row_number() OVER (PARTITION BY p.event_id
             |  ORDER BY
             |    CASE WHEN CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |      THEN epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))
             |      ELSE epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP)) END,
             |    CASE WHEN CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP) THEN 0 ELSE 1 END,
             |    CASE WHEN CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |      THEN -c.event_id ELSE c.event_id END) = 1
             |ORDER BY p.event_id""".stripMargin),
      env => {
        val purchases = env.events.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = env.events.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        RelOps.asOfJoinMergeNearest(purchases, clicks,
            "user_id", "event_id", "ts", "ts", "event_id")
          .select(col("event_id"), col("asof_id").as("click_id"),
            col("asof_ts").as("click_ts"))
          .orderBy("event_id")
      }),

    // X5: windowed ranking — top 3 orders per customer by price.
    Query("x5_topn_per_group",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin),
      env => RelOps.topNPerGroup(3, Seq("o_custkey"),
          Seq(desc("o_totalprice"), col("o_orderkey")))(
          env.orders.select("o_custkey", "o_orderkey", "o_totalprice"))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")),

    // X6: global top-k (TakeOrderedAndProject, no full sort).
    Query("x6_topk",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      env => RelOps.topK(10, Seq(desc("o_totalprice"), col("o_orderkey")))(
        env.orders.select("o_orderkey", "o_totalprice"))),

    // X7: approx distinct (HLL++). Not hash-matchable against an exact
    // oracle by design → rows-only check (no oracle entry).
    Query("x7_approx_distinct",
      None,
      env => env.orders.agg(
        approx_count_distinct("o_custkey").as("approx_custs"))),

    // X7b: approximate percentile (Greenwald-Khanna sketch) — the
    // streaming/mergeable complement to the exact interpolated percentile
    // in a1/a12; at 100 TB the exact TypedImperative percentile holds all
    // values per group, the sketch holds O(1/ε). Engine-specific → rows
    // only; PropertySpec pins it within ε-rank of the exact answer.
    Query("x7_approx_quantile",
      None,
      env => env.lineitem.groupBy("l_returnflag").agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("approx_median"))
        .orderBy("l_returnflag")),

    // X7c: the sketch CONTRACTS, driver-checked. The sketch values
    // themselves are engine-specific (rows-only above, ε-pinned by
    // PropertySpec locally), but their guarantees are not: GK with
    // accuracy=1000 must return a value whose exact rank is within
    // ~0.001·N of the target, and HLL++ at rsd=0.05 lands within a few
    // rsd of the true count. These queries compute the invariant IN the
    // engine (sketch joined back against exact ranks/counts) and emit a
    // boolean; the oracle emits `true` unconditionally — so a sketch
    // regression flips the hash in the driver artifact instead of only
    // failing a local spec.
    Query("x7_quantile_bound",
      Some("""SELECT l_returnflag, true AS within_band
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
      env => {
        val ap = env.lineitem.groupBy("l_returnflag")
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("m"), count(lit(1)).as("n"))
        env.lineitem.join(broadcast(ap), "l_returnflag")
          .groupBy(col("l_returnflag"), col("n"))
          .agg(sum(when(col("l_extendedprice") <= col("m"), 1L)
              .otherwise(0L)).as("r_le"),
            sum(when(col("l_extendedprice") < col("m"), 1L)
              .otherwise(0L)).as("r_lt"))
          // rank window [N·(0.5−ε)−1, N·(0.5+ε)+1], ε = 1/accuracy, the ±1
          // absorbing discreteness at tiny group sizes
          .select(col("l_returnflag"),
            (col("r_le") >= floor(col("n") * 0.499) - 1 &&
             col("r_lt") <= ceil(col("n") * 0.501) + 1).as("within_band"))
          .orderBy("l_returnflag")
      }),

    Query("x7_distinct_bound",
      Some("SELECT true AS within_band"),
      env => env.orders.agg(
          approx_count_distinct("o_custkey", 0.05).as("a"),
          countDistinct(col("o_custkey")).as("e"))
        .select((abs(col("a") - col("e")) <= col("e") * 0.15)
          .as("within_band"))),

    // X8: union by name with missing columns null-filled.
    Query("x8_union_by_name",
      Some("""SELECT * FROM (
             |  SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal,
             |    c_mktsegment AS segment, 'customer' AS side FROM customer
             |  UNION ALL BY NAME
             |  SELECT s_acctbal AS acctbal, s_suppkey AS key, s_name AS name,
             |    'supplier' AS side FROM supplier)
             |ORDER BY side, key""".stripMargin),
      env => {
        val c = env.customer.select(
          col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"),
          lit("customer").as("side"))
        val s = env.supplier.select(
          col("s_acctbal").as("acctbal"), col("s_suppkey").as("key"),
          col("s_name").as("name"), lit("supplier").as("side"))
        RelOps.unionByNameLoose(s)(c).orderBy("side", "key")
      }),

    // X78: bloom-join — lineitems of URGENT orders via a bloom prefilter
    // of the dim keys + exact semi-join recheck. The oracle is the PLAIN
    // semi-join: a hash match proves the bloom path is exact (recheck
    // removes every false positive, bloom admits no false negative).
    Query("x78_bloom_semi",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
             |                     WHERE o_orderpriority = '1-URGENT')
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      env => RelOps.bloomSemiJoin(
          env.lineitem.select("l_orderkey", "l_linenumber", "l_quantity"),
          env.orders.filter(col("o_orderpriority") === "1-URGENT"),
          "l_orderkey", "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber")),

    // X78b: the bloom CONTRACT, hash-checked (x7c discipline): the sketch
    // admits NO false negative (every true match passes the prefilter),
    // and the observed false-positive rate over true non-matches sits
    // within 3× the configured fpp (generous: expectedItems is sized
    // above the real key count, so the realized fpp is far below
    // nominal). Computed in-engine; the oracle emits the guaranteed
    // outcome, so a sketch regression (hashing mismatch between build
    // and probe, serialization corruption) flips the driver hash.
    Query("x78_bloom_bound",
      Some("SELECT true AS no_false_negatives, true AS fp_within_band"),
      env => {
        import graft.functions.BloomMightContain
        val dim = env.orders.filter(col("o_orderpriority") === "1-URGENT")
        val bf = dim.stat.bloomFilter(
          xxhash64(col("o_orderkey")), 1000000L, 0.01)
        BloomMightContain.register(env.spark)
        val keys = dim.select(col("o_orderkey").as("__graft_bk")).distinct()
        val flagged = env.lineitem.select("l_orderkey")
          .withColumn("bloom_pass", BloomMightContain.bloom_might_contain(
            xxhash64(col("l_orderkey")), bf))
          .join(keys, col("l_orderkey") === col("__graft_bk"), "left")
          .withColumn("is_match", col("__graft_bk").isNotNull)
        flagged.agg(
            sum(when(col("is_match") && !col("bloom_pass"), 1)
              .otherwise(0)).as("fn"),
            sum(when(!col("is_match") && col("bloom_pass"), 1)
              .otherwise(0)).as("fp"),
            sum(when(!col("is_match"), 1).otherwise(0)).as("nonmatch"))
          .select((col("fn") === 0).as("no_false_negatives"),
            (col("fp") <= greatest(col("nonmatch") * 0.03, lit(1.0)))
              .as("fp_within_band"))
      })
  )
}
