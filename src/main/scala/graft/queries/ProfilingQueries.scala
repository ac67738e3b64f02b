package graft.queries

import org.apache.spark.sql.functions._
import graft.Env
import graft.ops.{DqOps, RelOps, SimilarityOps}

/** Data-profiling / quality-control operators — the inspection surface an
  * engine runs before committing a 100 TB corpus to training: per-column
  * statistical profiles, distributional outlier detection, doc-in-doc
  * containment, and deterministic per-group sampling for manual audit.
  * All oracle-checked against DuckDB.
  */
object ProfilingQueries {

  val all: Seq[Query] = Seq(

    // X90: per-column profile (count / nulls / distinct / min / max / avg)
    // over the lineitem measures — the summarize() a data-quality gate runs
    // on every ingest. Unpivot-first (stack), then ONE grouped aggregate:
    // the count(DISTINCT) forces a shuffle on (col_name, value) — high
    // cardinality, evenly spread — with map-side partials; the final
    // 4-group rollup is trivial. Equivalent work to Spark's multi-distinct
    // Expand, but the plan stays one straight aggregate pipeline.
    // The mean is summed in DECIMAL (exact, associative — double summation
    // order differs across engines and flipped the 6th decimal), cast to
    // double, THEN divided: both engines see bit-identical doubles.
    Query("x90_column_profile",
      Some("""WITH u AS (
             |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
             |SELECT col_name, count(*) AS n_rows,
             |  count(*) - count(v) AS n_null,
             |  count(DISTINCT v) AS n_distinct,
             |  round(min(v), 6) AS min_v, round(max(v), 6) AS max_v,
             |  round(CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE)
             |    / count(v), 6) AS avg_v
             |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin),
      env => env.lineitem
        .selectExpr("""stack(4,
          'l_quantity', l_quantity,
          'l_extendedprice', l_extendedprice,
          'l_discount', l_discount,
          'l_tax', l_tax) AS (col_name, v)""")
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("v"))).as("n_null"),
          countDistinct(col("v")).as("n_distinct"),
          round(min("v"), 6).as("min_v"),
          round(max("v"), 6).as("max_v"),
          round(sum(col("v").cast("decimal(28,10)")).cast("double")
            / count(col("v")), 6).as("avg_v"))
        .orderBy("col_name")),

    // X91: per-type z-score outlier audit over the event stream — the
    // "values 3σ out" anomaly gate. Two passes: per-type moments (one tiny
    // aggregate, broadcast back on the 5-value type key), then a stateless
    // rescan that never shuffles the facts. |z| is rounded to 6 BEFORE the
    // >3 comparison on both engines so last-ulp stddev summation noise
    // cannot flip a boundary event.
    Query("x91_value_outliers",
      Some("""WITH s AS (SELECT event_type, avg(value) AS m,
             |    stddev_samp(value) AS sd FROM events GROUP BY event_type)
             |SELECT e.event_type, count(*) AS n,
             |  count(*) FILTER (
             |    WHERE round(abs((value - m) / sd), 6) > 3) AS n_outliers,
             |  round(max(abs((value - m) / sd)), 6) AS max_abs_z
             |FROM events e JOIN s ON e.event_type = s.event_type
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),
      env => {
        val ev = env.events.select("event_type", "value")
        val s = ev.groupBy("event_type")
          .agg(avg("value").as("m"), stddev_samp("value").as("sd"))
        ev.join(broadcast(s), "event_type")
          .withColumn("az", round(abs((col("value") - col("m")) / col("sd")), 6))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(when(col("az") > 3, 1)).as("n_outliers"),
            max("az").as("max_abs_z"))
          .orderBy("event_type")
      }),

    // X92: doc-in-doc containment pairs — C = |A∩B| / min(|A|,|B|), the
    // asymmetric cousin of x31's Jaccard that catches a short document
    // embedded in a long one (J ≈ |A|/|B| ≈ 0, C = 1). Exact ground-truth
    // formulation over the shingle inverted index; the 100 TB path feeds
    // MinHash-banded candidates into the same scorer (scaladoc on
    // SimilarityOps.shingleContainmentPairs).
    Query("x92_containment",
      Some(s"WITH ${OracleCtes.shinglePairs}\n" +
        """SELECT id_a, id_b,
          |  round(i / least(sa.z, sb.z), 6) AS containment
          |FROM pr JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
          |WHERE round(i / least(sa.z, sb.z), 6) >= 0.8
          |ORDER BY id_a, id_b""".stripMargin),
      env => SimilarityOps.shingleContainmentPairs(env.documents, "doc_id",
          "text", maxShingleDf = 256)
        .orderBy("id_a", "id_b")),

    // X93: deterministic k-per-group audit sample — 5 orders per priority,
    // chosen by md5(key) ranking: uniform-ish, reproducible across engines,
    // reruns, and task retries (rand() is none of those), and stable as the
    // table grows only at the margin. One shuffle on the group key; the
    // per-group sort is top-k pruned (RelOps.topNPerGroup rides a window,
    // and k rows per group leave each partition).
    Query("x93_group_sample",
      Some("""WITH s AS (SELECT o_orderpriority, o_orderkey,
             |    md5(CAST(o_orderkey AS VARCHAR)) AS sk FROM orders)
             |SELECT o_orderpriority, o_orderkey, sk,
             |  row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY sk, o_orderkey) AS rn
             |FROM s QUALIFY rn <= 5
             |ORDER BY o_orderpriority, rn""".stripMargin),
      env => {
        val s = env.orders.select(col("o_orderpriority"), col("o_orderkey"),
          md5(col("o_orderkey").cast("string")).as("sk"))
        RelOps.topNPerGroup(5, Seq("o_orderpriority"),
            Seq(col("sk"), col("o_orderkey")))(s)
          .select("o_orderpriority", "o_orderkey", "sk", "rn")
          .orderBy("o_orderpriority", "rn")
      }),

    // X94: deterministic weighted sample (Efraimidis-Spirakis A-ES) —
    // 100 orders drawn with inclusion probability ∝ o_totalprice, the
    // quality-weighted subsample a curation pipeline takes when it can't
    // keep everything. The exponential priority -ln(u)/w uses a
    // hash-uniform u (md5 prefix), so the SAME 100 rows come out of both
    // engines, every rerun, and every task retry — the sample is
    // oracle-EXACT, not statistically-similar. PropertySpec pins the
    // weighting actually biases toward heavy rows.
    Query("x94_weighted_sample",
      Some("""WITH s AS (
             |  SELECT o_orderkey, o_totalprice,
             |    (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
             |      + 0.5) / 4294967296.0 AS u
             |  FROM orders)
             |SELECT o_orderkey, o_totalprice,
             |  round(-ln(u) / o_totalprice, 9) AS priority
             |FROM s ORDER BY -ln(u) / o_totalprice, o_orderkey
             |LIMIT 100""".stripMargin),
      env => RelOps.weightedSample(100, "o_orderkey", col("o_totalprice"))(
          env.orders.select("o_orderkey", "o_totalprice"))
        .select(col("o_orderkey"), col("o_totalprice"),
          round(col("priority"), 9).as("priority"))),

    // X96: declarative constraint suite (the Deequ/expectations gate) —
    // completeness, key uniqueness, bounds, domain, regex, row count in
    // ONE aggregation pass per table, plus one anti-join per FK check;
    // failures are REPORTED rows, not exceptions (the uniqueness(
    // l_orderkey) check is deliberately unsatisfiable, pinning that a
    // failed constraint flows through with passed=false). Oracle computes
    // every metric/verdict independently in SQL.
    Query("x96_dq_constraints",
      Some("""WITH li AS (SELECT
             |    round(CAST(count(l_returnflag) AS DOUBLE) / count(*), 6) AS comp_rf,
             |    round(CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE)
             |      / count(*), 6) AS uniq_pk,
             |    round(CAST(count(DISTINCT l_orderkey) AS DOUBLE) / count(*), 6) AS uniq_ok,
             |    round(CAST(count(*) FILTER (WHERE l_quantity BETWEEN 1 AND 50) AS DOUBLE)
             |      / count(l_quantity), 6) AS bnd_qty,
             |    round(CAST(count(*) FILTER (WHERE l_returnflag IN ('A','N','R')) AS DOUBLE)
             |      / count(l_returnflag), 6) AS set_rf,
             |    CAST(count(*) AS DOUBLE) AS n_rows
             |  FROM lineitem),
             |ord AS (SELECT
             |    round(CAST(count(*) FILTER (WHERE regexp_matches(o_orderpriority,
             |      '^[1-5]-[A-Z ]+$')) AS DOUBLE) / count(o_orderpriority), 6) AS m_prio
             |  FROM orders),
             |fk1 AS (SELECT
             |    round(CAST(count(*) FILTER (WHERE o.o_orderkey IS NOT NULL) AS DOUBLE)
             |      / count(*), 6) AS m,
             |    count(*) FILTER (WHERE o.o_orderkey IS NULL) = 0 AS ok
             |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |    ON l.l_orderkey = o.o_orderkey),
             |fk2 AS (SELECT
             |    round(CAST(count(*) FILTER (WHERE c.c_custkey IS NOT NULL) AS DOUBLE)
             |      / count(*), 6) AS m,
             |    count(*) FILTER (WHERE c.c_custkey IS NULL) = 0 AS ok
             |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |    ON o.o_custkey = c.c_custkey)
             |SELECT * FROM (
             |  SELECT 'completeness(l_returnflag)' AS "check", comp_rf AS metric,
             |    comp_rf >= 1.0 AS passed FROM li
             |  UNION ALL SELECT 'uniqueness(l_orderkey,l_linenumber)', uniq_pk,
             |    uniq_pk >= 1.0 FROM li
             |  UNION ALL SELECT 'uniqueness(l_orderkey)', uniq_ok,
             |    uniq_ok >= 0.99 FROM li
             |  UNION ALL SELECT 'bounds(l_quantity)', bnd_qty, bnd_qty >= 1.0 FROM li
             |  UNION ALL SELECT 'in_set(l_returnflag)', set_rf, set_rf >= 1.0 FROM li
             |  UNION ALL SELECT 'row_count', n_rows, n_rows >= 1 FROM li
             |  UNION ALL SELECT 'matches(o_orderpriority)', m_prio, m_prio >= 1.0 FROM ord
             |  UNION ALL SELECT 'fk(l_orderkey->o_orderkey)', m, ok FROM fk1
             |  UNION ALL SELECT 'fk(o_custkey->c_custkey)', m, ok FROM fk2)
             |ORDER BY "check"""".stripMargin),
      env => {
        import graft.ops.DqOps
        import graft.ops.DqOps._
        val li = DqOps.runChecks(env.lineitem, Seq(
          Completeness("l_returnflag"),
          Uniqueness(Seq("l_orderkey", "l_linenumber")),
          Uniqueness(Seq("l_orderkey"), minRatio = 0.99),
          Bounds("l_quantity", 1, 50),
          InSet("l_returnflag", Seq("A", "N", "R")),
          RowCount(1L, Long.MaxValue)))
        val ord = DqOps.runChecks(env.orders, Seq(
          Matches("o_orderpriority", "^[1-5]-[A-Z ]+$")))
        li.unionAll(ord)
          .unionAll(DqOps.fkCheck(env.lineitem, "l_orderkey",
            env.orders, "o_orderkey"))
          .unionAll(DqOps.fkCheck(env.orders, "o_custkey",
            env.customer, "c_custkey"))
          .orderBy("check")
      }),

    // X131: PSI distribution drift between the pre-1998 and post-1998
    // order-value populations — the monitoring metric a production feed
    // thresholds on. Fixed-width bins (deterministic, engine-exact), one
    // conditional-count pass over the union, totals by broadcast; terms
    // follow the x60 ln discipline. Bins empty on either side report
    // counts with a NULL term (excluded from PSI, visibly).
    Query("x131_psi_drift",
      Some("""WITH b AS (
             |  SELECT CAST(least(floor(o_totalprice / 75000), 7) AS INT) AS bin,
             |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
             |      THEN 0 ELSE 1 END) AS BIGINT) AS n_b
             |  FROM orders GROUP BY 1),
             |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             |        CAST(sum(n_b) AS BIGINT) AS tb FROM b)
             |SELECT bin, n_a, n_b,
             |  round(CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE), 6) AS p_a,
             |  round(CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS p_b,
             |  CASE WHEN n_a > 0 AND n_b > 0 THEN
             |    round((CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE)
             |         - CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE))
             |      * ln((CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE))
             |          / (CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE))), 6)
             |  END AS psi_term
             |FROM b CROSS JOIN t ORDER BY bin""".stripMargin),
      env => DqOps.psiDrift(env.orders,
          col("o_totalprice"),
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
          binWidth = 75000.0, maxBin = 7)
        .orderBy("bin"))
  )
}
