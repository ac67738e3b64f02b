package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytical completeness beyond the reference's surface (a user of a
  * full engine expects these): multi-level aggregation (rollup/cube),
  * pivot, and frame/offset window functions. All oracle-checked.
  *
  * Null-level rows from rollup/cube are coalesced to a sentinel on BOTH
  * sides so engine-specific null orderings can't flip the compare.
  */
object AnalyticQueries {

  val all: Seq[Query] = Seq(

    Query("x9_rollup",
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 4) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin),
      env => env.orders
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")),

    Query("x9_cube",
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  count(*) AS n, round(sum(l_quantity), 4) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin),
      env => env.lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")),

    // Pivot: one column per l_linestatus value. Spark pivot() with explicit
    // value list (no extra distinct pass — the scale-correct form); oracle
    // uses FILTER aggregates to produce identical column names.
    Query("x9_pivot",
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity) FILTER (l_linestatus = 'F'), 4) AS F,
             |  round(sum(l_quantity) FILTER (l_linestatus = 'O'), 4) AS O
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      env => env.lineitem
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 4))
        .orderBy("l_returnflag")),

    // Unpivot (pandas melt analog): wide per-row measures → long
    // (key, measure, value) triples.
    Query("x9_unpivot",
      Some("""SELECT l_orderkey, l_linenumber, measure, value FROM (
             |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
             |             l_extendedprice, l_discount FROM lineitem)
             |  ON l_quantity, l_extendedprice, l_discount
             |  INTO NAME measure VALUE value)
             |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin),
      env => env.lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")),

    // Array explode: one row per token position (lateral unnest).
    Query("x9_explode",
      Some("""SELECT doc_id, i AS pos, t[i + 1] AS tok FROM (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents WHERE doc_id < 20),
             |  UNNEST(range(len(t))) u(i)
             |ORDER BY doc_id, pos""".stripMargin),
      env => env.documents.filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+")))
        .withColumnRenamed("pos", "pos").withColumnRenamed("col", "tok")
        .orderBy("doc_id", "pos")),

    // Frame window: per-customer running order total in date order.
    Query("x5_running_sum",
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS UNBOUNDED PRECEDING), 4) AS running_total
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      env => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        env.orders.select(col("o_custkey"), col("o_orderkey"),
            round(sum("o_totalprice").over(w), 4).as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    // Offset window: previous/next event value per user.
    Query("x5_lag_lead",
      Some("""SELECT event_id,
             |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
             |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v
             |FROM events ORDER BY event_id""".stripMargin),
      env => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        env.events.select(col("event_id"),
            lag("value", 1).over(w).as("prev_v"),
            lead("value", 1).over(w).as("next_v"))
          .orderBy("event_id")
      }),

    // SCD type-2 temporal versioning: collapse a change log (orders per
    // customer per day) into effective-dated version intervals —
    // [valid_from, valid_to) with the current version open-ended at a
    // sentinel date, plus a version ordinal. The explicit
    // repartition(o_custkey) makes the daily aggregate, the lead()
    // interval window, AND the version numbering all reuse ONE exchange:
    // HashPartitioning(custkey) satisfies the (custkey, date) clustering
    // the aggregate needs and the custkey windows need — vs two shuffles
    // if the aggregate is allowed to partition on the composite key.
    Query("x85_scd2_intervals",
      Some("""WITH daily AS (SELECT o_custkey, o_orderdate AS valid_from,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS day_total
             |  FROM orders GROUP BY 1, 2)
             |SELECT o_custkey, valid_from,
             |  coalesce(lead(valid_from) OVER (PARTITION BY o_custkey
             |      ORDER BY valid_from), DATE '2200-01-01') AS valid_to,
             |  day_total,
             |  row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY valid_from) AS version
             |FROM daily ORDER BY o_custkey, valid_from""".stripMargin),
      env => {
        val w = Window.partitionBy("o_custkey").orderBy("valid_from")
        env.orders
          .select("o_custkey", "o_orderdate", "o_totalprice")
          .repartition(col("o_custkey"))
          .groupBy(col("o_custkey"), col("o_orderdate").as("valid_from"))
          // DECIMAL(18,4) sum, not round(sum(double), 4): double addition is
          // order-dependent and Spark/DuckDB reduce in different orders, so
          // with ~15k (custkey, date) groups one sum lands on a .xxxx5
          // rounding boundary and the hash flips (it did, at sf0.01 — r5's
          // only red row). Decimal summation is exact and order-free; the
          // final double cast is deterministic on both engines.
          .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").as("day_total"))
          // Sentinel 2200-01-01, NOT the classic 9999-12-31: the far-future
          // date is outside pandas' datetime64[ns] range (max 2262-04-11),
          // so a comparison harness converting dates to ns timestamps
          // mangles exactly the open-ended rows on one side — r5's x85
          // "hash mismatch" reproduced as zero value diffs engine-to-engine
          // but an out-of-range sentinel. Any in-range sentinel sorts after
          // all real order dates (max 1998-08-02), which is all SCD2 needs.
          .select(col("o_custkey"), col("valid_from"),
            coalesce(lead("valid_from", 1).over(w),
              to_date(lit("2200-01-01"))).as("valid_to"),
            col("day_total"),
            row_number().over(w).as("version"))
          .orderBy("o_custkey", "valid_from")
      }),

    // X127: point-in-time join — every heavy lineitem reads the
    // customer's SCD2 daily-total VERSION effective at ship time
    // (RelOps.pitJoin: one merge-window pass, zero row multiplication).
    // The oracle recomputes the same pick as the BETWEEN interval join
    // over the tiled x85 intervals — equal by construction when
    // intervals tile, so a hash match certifies the merge formulation
    // against the textbook range-join semantics. day_total rides x85's
    // DECIMAL(18,4) discipline, so the doubles agree exactly.
    Query("x127_pit_join",
      Some("""WITH daily AS (SELECT o_custkey, o_orderdate AS valid_from,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS day_total
             |  FROM orders GROUP BY 1, 2),
             |scd AS (SELECT o_custkey, valid_from,
             |    coalesce(lead(valid_from) OVER (PARTITION BY o_custkey
             |        ORDER BY valid_from), TIMESTAMP '2200-01-01') AS valid_to,
             |    day_total,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY valid_from) AS version
             |  FROM daily),
             |f AS (SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
             |    l.l_shipdate
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  WHERE l.l_quantity >= 48)
             |SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.l_shipdate,
             |  s.day_total, s.version
             |FROM f JOIN scd s ON f.o_custkey = s.o_custkey
             |  AND f.l_shipdate >= s.valid_from AND f.l_shipdate < s.valid_to
             |ORDER BY f.l_orderkey, f.l_linenumber""".stripMargin),
      env => {
        val w = Window.partitionBy("o_custkey").orderBy("valid_from")
        val scd = env.orders
          .select("o_custkey", "o_orderdate", "o_totalprice")
          .repartition(col("o_custkey"))
          .groupBy(col("o_custkey"), col("o_orderdate").as("valid_from"))
          .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").as("day_total"))
          .select(col("o_custkey"), col("valid_from"),
            col("day_total"), row_number().over(w).as("version"))
        val facts = env.lineitem.filter(col("l_quantity") >= 48)
          .join(env.orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_linenumber", "o_custkey", "l_shipdate")
        graft.ops.RelOps.pitJoin(facts, scd, "o_custkey",
            "l_shipdate", "valid_from", Seq("day_total", "version"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    // X127b: PIT join against a VERSIONED feature table — the feature-
    // store composition of two proven pieces (r12 verdict #8): each
    // SnapshotStore version is a feature PUBLISH, and training-time
    // reproducibility is pitJoin over readVersion(v) — "features as of
    // the v1 publish", immune to every publish since. The query commits
    // publish 1 (daily totals from pre-1998 orders only), then publish 2
    // (the full recompute — different totals AND version numbering), and
    // joins the facts against the TIME-TRAVELED v1. The oracle recomputes
    // the BETWEEN interval join over exactly the v1 content — a hash
    // match certifies both the time travel (v2 must not bleed in) and
    // the merge-window pick against textbook range-join semantics.
    Query("x127b_versioned_pit",
      Some("""WITH daily AS (SELECT o_custkey, o_orderdate AS valid_from,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS day_total
             |  FROM orders WHERE o_orderdate < DATE '1998-01-01'
             |  GROUP BY 1, 2),
             |scd AS (SELECT o_custkey, valid_from,
             |    coalesce(lead(valid_from) OVER (PARTITION BY o_custkey
             |        ORDER BY valid_from), TIMESTAMP '2200-01-01') AS valid_to,
             |    day_total,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY valid_from) AS version
             |  FROM daily),
             |f AS (SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
             |    l.l_shipdate
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  WHERE l.l_quantity >= 48)
             |SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.l_shipdate,
             |  s.day_total, s.version
             |FROM f JOIN scd s ON f.o_custkey = s.o_custkey
             |  AND f.l_shipdate >= s.valid_from AND f.l_shipdate < s.valid_to
             |ORDER BY f.l_orderkey, f.l_linenumber""".stripMargin),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x127b_") {
        dir =>
        val ss = new graft.sources.SnapshotStore(env.spark, dir)
        val w = Window.partitionBy("o_custkey").orderBy("valid_from")
        def publish(orders: org.apache.spark.sql.DataFrame) = orders
          .select("o_custkey", "o_orderdate", "o_totalprice")
          .repartition(col("o_custkey"))
          .groupBy(col("o_custkey"), col("o_orderdate").as("valid_from"))
          .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").as("day_total"))
          .select(col("o_custkey"), col("valid_from"),
            col("day_total"), row_number().over(w).as("version"))
        ss.commitOverwrite("feat",
          publish(env.orders.filter(col("o_orderdate") < lit("1998-01-01"))))
        ss.commitOverwrite("feat", publish(env.orders))
        require(ss.currentVersion("feat") == 2L, "two publishes committed")
        val facts = env.lineitem.filter(col("l_quantity") >= 48)
          .join(env.orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_linenumber", "o_custkey", "l_shipdate")
        graft.ops.RelOps.pitJoin(facts, ss.readVersion("feat", 1L),
            "o_custkey", "l_shipdate", "valid_from",
            Seq("day_total", "version"))
          .orderBy("l_orderkey", "l_linenumber")
      })
  )
}
