package graft.queries

import org.apache.spark.sql.functions._

/** Second function-breadth pass: map-typed columns, array construction /
  * set algebra, ordered string aggregation, mode/median, cryptographic
  * hashes, bitwise operators, epoch/format round trips, cross/self joins
  * and a recursive CTE. All oracle-checked.
  *
  * Comparator discipline: arrays/maps never reach the driver's hash
  * compare raw — they are serialized to CSV strings (sorted first where
  * either engine leaves order unspecified), and list cells are kept
  * integral so double formatting can't differ between engines.
  */
object ExtendedFunctionQueries {

  val all: Seq[Query] = Seq(

    // Map-typed column: construct, extract, keys, filtered size. The map
    // lives only inside the Spark plan; outputs are scalar so the oracle
    // computes the same values directly.
    Query("f21_map_funcs",
      Some("""SELECT o_orderkey,
             |  o_orderkey % 7 AS qty7,
             |  2 AS n_keys,
             |  'mod5,mod7' AS key_csv,
             |  (o_orderkey % 7) + (o_orderkey % 5) AS val_sum,
             |  CAST(o_orderkey % 7 > 3 AS INT) + CAST(o_orderkey % 5 > 3 AS INT) AS n_big
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => {
        val m = map(lit("mod7"), col("o_orderkey") % 7,
          lit("mod5"), col("o_orderkey") % 5)
        env.orders.select(col("o_orderkey"),
            element_at(m, "mod7").as("qty7"),
            size(m).as("n_keys"),
            concat_ws(",", array_sort(map_keys(m))).as("key_csv"),
            aggregate(map_values(m), lit(0L), (acc, x) => acc + x).as("val_sum"),
            size(map_filter(m, (_, v) => v > 3)).as("n_big"))
          .orderBy("o_orderkey")
      }),

    // Array set algebra + construction over integral cells: sort, distinct,
    // union, intersect, except, slice, flatten, contains, position.
    // DuckDB's list_distinct leaves order unspecified → both sides sort
    // before serializing.
    Query("f22_array_breadth",
      Some("""WITH t AS (
             |  SELECT o_orderkey,
             |    [o_orderkey % 7, o_orderkey % 5, o_orderkey % 7, 3] AS a,
             |    [o_orderkey % 5, 4] AS b
             |  FROM orders)
             |SELECT o_orderkey,
             |  array_to_string(list_sort(a), ',') AS sorted_csv,
             |  array_to_string(list_sort(list_distinct(a)), ',') AS dedup_csv,
             |  array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_csv,
             |  array_to_string(list_sort(list_distinct(
             |    list_filter(a, x -> list_contains(b, x)))), ',') AS isect_csv,
             |  coalesce(array_to_string(list_sort(list_distinct(
             |    list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS except_csv,
             |  array_to_string(a[2:3], ',') AS slice_csv,
             |  array_to_string(flatten([a, b]), ',') AS flat_csv,
             |  list_contains(a, 3) AS has3,
             |  list_position(a, 3) AS pos3
             |FROM t ORDER BY o_orderkey""".stripMargin),
      env => {
        val a = array(col("o_orderkey") % 7, col("o_orderkey") % 5,
          col("o_orderkey") % 7, lit(3L))
        val b = array(col("o_orderkey") % 5, lit(4L))
        def csv(c: org.apache.spark.sql.Column) =
          concat_ws(",", transform(c, _.cast("string")))
        env.orders.select(col("o_orderkey"),
            csv(array_sort(a)).as("sorted_csv"),
            csv(array_sort(array_distinct(a))).as("dedup_csv"),
            csv(array_sort(array_distinct(array_union(a, b)))).as("union_csv"),
            csv(array_sort(array_distinct(array_intersect(a, b)))).as("isect_csv"),
            csv(array_sort(array_distinct(array_except(a, b)))).as("except_csv"),
            csv(slice(a, 2, 2)).as("slice_csv"),
            csv(flatten(array(a, b))).as("flat_csv"),
            array_contains(a, 3L).as("has3"),
            array_position(a, 3L).as("pos3"))
          .orderBy("o_orderkey")
      }),

    // Parallel-array zip + positional explode: one row per index with
    // both arrays' elements — the columnar "zip longest" reshape.
    Query("f26_zip_explode",
      Some("""WITH t AS (
             |  SELECT o_orderkey,
             |    [o_orderkey % 7, o_orderkey % 5, 3] AS a,
             |    [o_orderkey % 3, o_orderkey % 2, o_orderkey % 11] AS b
             |  FROM orders)
             |SELECT o_orderkey, i AS idx, a[i+1] AS av, b[i+1] AS bv
             |FROM t, UNNEST(range(3)) u(i)
             |ORDER BY o_orderkey, idx""".stripMargin),
      env => {
        val a = array(col("o_orderkey") % 7, col("o_orderkey") % 5, lit(3L))
        val b = array(col("o_orderkey") % 3, col("o_orderkey") % 2,
          col("o_orderkey") % 11)
        env.orders.select(col("o_orderkey"), posexplode(arrays_zip(a, b)))
          .select(col("o_orderkey"), col("pos").as("idx"),
            col("col.0").as("av"), col("col.1").as("bv"))
          .orderBy("o_orderkey", "idx")
      }),

    // Robust statistics: median absolute deviation per group — two exact
    // interpolated medians (group median joined back, then median of the
    // absolute deviations). DuckDB's mad() is the same composition.
    Query("a18_mad",
      Some("""SELECT l_returnflag, round(mad(l_quantity), 6) AS mad_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      env => {
        val med = env.lineitem.groupBy(col("l_returnflag").as("mf"))
          .agg(expr("percentile(l_quantity, 0.5)").as("m"))
        env.lineitem.join(broadcast(med), col("l_returnflag") === col("mf"))
          .groupBy("l_returnflag")
          .agg(round(expr("percentile(abs(l_quantity - m), 0.5)"), 6).as("mad_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      }),

    // Ratio-to-report: aggregate then window-share within the outer group
    // — the percent-of-total BI shape (share of status revenue held by
    // each priority).
    Query("x66_share_of_total",
      Some("""WITH a AS (
             |  SELECT o_orderstatus AS status, o_orderpriority AS prio,
             |    sum(o_totalprice) AS r
             |  FROM orders GROUP BY 1, 2)
             |SELECT status, prio, round(r, 4) AS revenue,
             |  round(r / sum(r) OVER (PARTITION BY status), 6) AS share
             |FROM a ORDER BY status, prio""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        env.orders
          .groupBy(col("o_orderstatus").as("status"),
            col("o_orderpriority").as("prio"))
          .agg(sum("o_totalprice").as("r"))
          .select(col("status"), col("prio"),
            round(col("r"), 4).as("revenue"),
            round(col("r") / sum("r").over(Window.partitionBy("status")), 6)
              .as("share"))
          .orderBy("status", "prio")
      }),

    // Ordered string aggregation (LISTAGG): distinct values, sorted, joined.
    Query("a15_listagg",
      Some("""SELECT o_orderstatus,
             |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prio_csv,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      env => env.orders.groupBy("o_orderstatus")
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
            .as("prio_csv"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Mode + exact interpolated median per group. The mode is unique by
    // construction (line numbers 1..k decay monotonically), so DuckDB's
    // arbitrary tie-break can't diverge.
    Query("a16_mode_median",
      Some("""SELECT l_returnflag,
             |  mode(l_linenumber) AS mode_line,
             |  round(median(l_quantity), 6) AS median_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      env => env.lineitem.groupBy("l_returnflag")
        .agg(mode(col("l_linenumber")).as("mode_line"),
          round(median(col("l_quantity")), 6).as("median_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Cryptographic hashes for content addressing: md5 + sha256 (the
    // engine-portable subset; xxhash64 stays engine-internal for shuffles).
    Query("f23_hash_funcs",
      Some("""SELECT c_custkey, md5(c_name) AS h_md5,
             |  sha256(c_name) AS h_sha256,
             |  length(md5(c_name)) AS md5_len
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.select(col("c_custkey"),
          md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha256"),
          length(md5(col("c_name"))).as("md5_len"))
        .orderBy("c_custkey")),

    // Bitwise operators on keys: shifts, and/or/xor, complement, bit_count.
    Query("f24_bitwise",
      Some("""SELECT o_orderkey,
             |  o_orderkey << 2 AS shl,
             |  o_orderkey >> 1 AS shr,
             |  o_orderkey & 15 AS band,
             |  o_orderkey | 8 AS bor,
             |  xor(o_orderkey, 5) AS bxor,
             |  ~o_orderkey AS bnot,
             |  bit_count(o_orderkey) AS popcnt
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          shiftleft(col("o_orderkey"), 2).as("shl"),
          shiftright(col("o_orderkey"), 1).as("shr"),
          col("o_orderkey").bitwiseAND(15).as("band"),
          col("o_orderkey").bitwiseOR(8).as("bor"),
          col("o_orderkey").bitwiseXOR(5).as("bxor"),
          bitwise_not(col("o_orderkey")).as("bnot"),
          bit_count(col("o_orderkey")).as("popcnt"))
        .orderBy("o_orderkey")),

    // Epoch round trip + format strings + constructed dates. Session TZ is
    // UTC on both engines, so epoch seconds agree.
    Query("f25_epoch_format",
      Some("""SELECT o_orderkey,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  strftime(o_orderdate, '%Y-%m') AS ym,
             |  strftime(o_orderdate, '%j') AS doy3,
             |  CAST(make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS VARCHAR) AS jan1,
             |  CAST(CAST(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)) AS TIMESTAMP)
             |       AS VARCHAR) || ' rt' AS roundtrip
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_format(col("o_orderdate"), "DDD").as("doy3"),
          make_date(year(col("o_orderdate")), lit(1), lit(1)).cast("string")
            .as("jan1"),
          concat(to_timestamp(unix_timestamp(col("o_orderdate"))).cast("string"),
            lit(" rt")).as("roundtrip"))
        .orderBy("o_orderkey")),

    // Explicit cross join: small-dim cartesian (region x order statuses).
    Query("x53_cross_join",
      Some("""SELECT r_name, o_orderstatus
             |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
             |ORDER BY r_name, o_orderstatus""".stripMargin),
      env => env.region.select("r_name")
        .crossJoin(env.orders.select("o_orderstatus").distinct())
        .orderBy("r_name", "o_orderstatus")),

    // Self join: same-customer order pairs placed within 10 days — the
    // classic self-equi-join + range predicate; one shuffle on custkey,
    // per-customer groups stay small (~10 orders) so no pair blow-up.
    Query("x54_self_join_pairs",
      Some("""SELECT a.o_orderkey AS k1, b.o_orderkey AS k2,
             |  a.o_custkey AS cust,
             |  datediff('day', a.o_orderdate, b.o_orderdate) AS gap_days
             |FROM orders a JOIN orders b
             |  ON a.o_custkey = b.o_custkey
             |  AND a.o_orderkey < b.o_orderkey
             |  AND b.o_orderdate >= a.o_orderdate
             |  AND b.o_orderdate <= a.o_orderdate + INTERVAL 10 DAY
             |ORDER BY k1, k2""".stripMargin),
      env => {
        val a = env.orders.select(col("o_orderkey").as("k1"),
          col("o_custkey").as("cust"), col("o_orderdate").as("d1"))
        val b = env.orders.select(col("o_orderkey").as("k2"),
          col("o_custkey").as("cust2"), col("o_orderdate").as("d2"))
        a.join(b, col("cust") === col("cust2") && col("k1") < col("k2") &&
            col("d2") >= col("d1") &&
            col("d2") <= col("d1") + expr("INTERVAL 10 DAY"))
          .select(col("k1"), col("k2"), col("cust"),
            datediff(col("d2"), col("d1")).cast("long").as("gap_days"))
          .orderBy("k1", "k2")
      }),

    // Recursive CTE: a generated month spine (no fact scan in the
    // recursion) joined to per-month order counts — the recursive pattern
    // a date-dimension build uses.
    Query("x55_recursive_cte",
      Some("""WITH RECURSIVE months(m) AS (
             |  SELECT DATE '1995-01-01'
             |  UNION ALL
             |  SELECT m + INTERVAL 1 MONTH FROM months
             |  WHERE m < DATE '2001-08-01')
             |SELECT CAST(m AS VARCHAR) AS month_start, count(o_orderkey) AS n
             |FROM months LEFT JOIN orders
             |  ON date_trunc('month', o_orderdate) = m
             |GROUP BY m ORDER BY m""".stripMargin),
      env => {
        env.orders.createOrReplaceTempView("orders_rec")
        env.spark.sql(
          """WITH RECURSIVE months(m) AS (
            |  SELECT DATE '1995-01-01'
            |  UNION ALL
            |  SELECT m + INTERVAL 1 MONTH FROM months
            |  WHERE m < DATE '2001-08-01')
            |SELECT CAST(m AS STRING) AS month_start, count(o_orderkey) AS n
            |FROM months LEFT JOIN orders_rec
            |  ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
            |GROUP BY m ORDER BY m""".stripMargin)
      })
  )
}
