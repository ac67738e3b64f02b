package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Breadth pass 2 — analytical completeness beyond the round-1 surface:
  * outer joins, set operators, ranking-window variety, statistical
  * aggregates, grouping sets, regex/array/string/date function families,
  * and corpus-analysis text operators (document frequency, repetition,
  * character-class profiles, Gopher-style quality rules). All
  * oracle-checked (SURVEY §5.2 discipline: deterministic ORDER BY on a
  * unique key, identical aliases both sides, derived doubles rounded,
  * nulls coalesced to sentinels so the driver's hash never sees NaN/None
  * ambiguity).
  */
object BreadthQueries {

  val all: Seq[Query] = Seq(

    // ---- Outer joins -----------------------------------------------------

    // Left outer: every customer row survives; customers without orders
    // carry sentinel order columns. (reference basis: S6 anti-join is the
    // only join in the reference — outer variants declared for engine
    // completeness, SURVEY §2.2 X1-X4 family.)
    Query("x17_left_outer_join",
      Some("""SELECT c.c_custkey,
             |  coalesce(o.o_orderkey, -1) AS okey,
             |  c.c_mktsegment,
             |  coalesce(o.o_totalprice, 0.0) AS price
             |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             |ORDER BY c.c_custkey, okey""".stripMargin),
      env => {
        val c = env.customer
        val o = env.orders
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("okey"),
          col("c_mktsegment"),
          coalesce(col("o_totalprice"), lit(0.0)).as("price"))
        .orderBy("c_custkey", "okey")
      }),

    // Full outer with genuine both-side-only keys: even-keyed customers vs
    // per-customer order spend (odd spenders only on the right, orderless
    // even customers only on the left).
    Query("x18_full_outer_join",
      Some("""WITH a AS (SELECT c_custkey, c_acctbal FROM customer
             |           WHERE c_custkey % 2 = 0),
             |b AS (SELECT o_custkey, round(sum(o_totalprice), 4) AS spend
             |      FROM orders GROUP BY o_custkey)
             |SELECT coalesce(c_custkey, o_custkey) AS k,
             |  coalesce(c_acctbal, -1.0) AS bal,
             |  coalesce(spend, -1.0) AS spend
             |FROM a FULL OUTER JOIN b ON c_custkey = o_custkey
             |ORDER BY k""".stripMargin),
      env => {
        val a = env.customer.filter(col("c_custkey") % 2 === 0)
          .select("c_custkey", "c_acctbal")
        val b = env.orders.groupBy("o_custkey")
          .agg(round(sum("o_totalprice"), 4).as("spend"))
        a.join(b, a("c_custkey") === b("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
            coalesce(col("c_acctbal"), lit(-1.0)).as("bal"),
            coalesce(col("spend"), lit(-1.0)).as("spend"))
          .orderBy("k")
      }),

    // ---- Set operators (distinct semantics, like SQL) --------------------

    Query("o3_intersect",
      Some("""SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
             |INTERSECT
             |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH'
             |ORDER BY k""".stripMargin),
      env => env.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
        .intersect(env.orders.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_custkey").as("k")))
        .orderBy("k")),

    Query("o4_except",
      Some("""SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
             |EXCEPT
             |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH'
             |ORDER BY k""".stripMargin),
      env => env.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
        .except(env.orders.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_custkey").as("k")))
        .orderBy("k")),

    Query("o5_union_distinct",
      Some("""SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000
             |UNION
             |SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
             |ORDER BY k""".stripMargin),
      env => env.orders.filter(col("o_totalprice") > 350000)
        .select(col("o_custkey").as("k"))
        .union(env.customer.filter(col("c_acctbal") < 0)
          .select(col("c_custkey").as("k")))
        .distinct()
        .orderBy("k")),

    // ---- Window variety (X5 family) --------------------------------------

    // rank/dense_rank/percent_rank/cume_dist are tie-stable (they depend
    // only on the ordering value); ntile needs a total order → key tiebreak.
    Query("x5_ntile_ranks",
      Some("""SELECT o_orderkey,
             |  rank() OVER w AS rnk,
             |  dense_rank() OVER w AS drnk,
             |  round(percent_rank() OVER w, 6) AS prnk,
             |  round(cume_dist() OVER w, 6) AS cdist,
             |  ntile(4) OVER w2 AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice),
             |  w2 AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      env => {
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
        val w2 = Window.partitionBy("o_orderstatus")
          .orderBy("o_totalprice", "o_orderkey")
        env.orders.select(col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w2).as("quartile"))
        .orderBy("o_orderkey")
      }),

    Query("x5_first_last",
      Some("""SELECT o_orderkey,
             |  first_value(o_orderkey) OVER w AS first_k,
             |  last_value(o_orderkey) OVER w AS last_k,
             |  coalesce(nth_value(o_orderkey, 2) OVER w, -1) AS second_k
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin),
      env => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        env.orders.select(col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_k"),
          last(col("o_orderkey")).over(w).as("last_k"),
          coalesce(nth_value(col("o_orderkey"), 2).over(w), lit(-1L))
            .as("second_k"))
        .orderBy("o_orderkey")
      }),

    // ---- Statistical aggregates ------------------------------------------

    // Bivariate + dispersion aggregates. Rounding must absorb cross-engine
    // summation-order noise: the variances are O(1e9) where accumulated
    // double noise can reach O(0.1) absolute, so they round to the
    // hundreds place (negative scale, spacing 100 ≫ noise); covariances
    // and correlations are mean-scale and keep finer rounding.
    Query("a9_stats_agg",
      Some("""SELECT l_returnflag,
             |  round(corr(l_quantity, l_extendedprice), 6) AS r,
             |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
             |  round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_p,
             |  round(var_samp(l_extendedprice), -2) AS var_s,
             |  round(var_pop(l_extendedprice), -2) AS var_p,
             |  round(stddev_pop(l_quantity), 6) AS sd_p
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      env => env.lineitem.groupBy("l_returnflag").agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("r"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("cov_s"),
          round(covar_pop("l_quantity", "l_extendedprice"), 2).as("cov_p"),
          round(var_samp("l_extendedprice"), -2).as("var_s"),
          round(var_pop("l_extendedprice"), -2).as("var_p"),
          round(stddev_pop("l_quantity"), 6).as("sd_p"))
        .orderBy("l_returnflag")),

    // ---- Grouping sets (beyond rollup/cube: arbitrary combinations) ------

    // Expressed in SQL on both engines — the Dataset API has no grouping
    // sets; this exercises Catalyst's Expand-based grouping-sets path.
    Query("a11_grouping_sets",
      Some("""SELECT coalesce(o_orderstatus, '@total') AS status,
             |  coalesce(o_orderpriority, '@total') AS prio,
             |  count(*) AS n,
             |  round(sum(o_totalprice), 4) AS spend
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY status, prio""".stripMargin),
      env => {
        env.orders.createOrReplaceTempView("orders_gsets")
        env.spark.sql(
          """SELECT coalesce(o_orderstatus, '@total') AS status,
            |  coalesce(o_orderpriority, '@total') AS prio,
            |  count(*) AS n,
            |  round(sum(o_totalprice), 4) AS spend
            |FROM orders_gsets
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY status, prio""".stripMargin)
      }),

    // ---- Function families -----------------------------------------------

    // Regex: extract / replace-all / match. RE2 (DuckDB) has no lookahead —
    // patterns kept lookahead-free so both engines see the same language.
    Query("f13_regexp",
      Some("""SELECT c_custkey,
             |  regexp_extract(c_name, '([0-9]+)$', 1) AS num_part,
             |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
             |  regexp_matches(c_name, '00+1') AS has_001
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("num_part"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
          col("c_name").rlike("00+1").as("has_001"))
        .orderBy("c_custkey")),

    // Array higher-order functions over a generated sequence (results
    // serialized to CSV strings — the driver's comparator can't hash raw
    // array cells).
    Query("f14_array_hof",
      Some("""SELECT o_orderkey,
             |  array_to_string(list_transform(generate_series(1, 2 + o_orderkey % 4),
             |    x -> x * x), ',') AS squares,
             |  array_to_string(list_filter(generate_series(1, 2 + o_orderkey % 4),
             |    x -> x % 2 = 0), ',') AS evens,
             |  CAST(list_sum(generate_series(1, 2 + o_orderkey % 4)) AS BIGINT) AS total
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => {
        val arr = sequence(lit(1L), lit(2L) + col("o_orderkey") % 4)
        env.orders.select(col("o_orderkey"),
          concat_ws(",", transform(transform(arr, x => x * x),
            _.cast("string"))).as("squares"),
          concat_ws(",", transform(filter(arr, x => x % 2 === 0),
            _.cast("string"))).as("evens"),
          aggregate(arr, lit(0L), (acc, x) => acc + x).as("total"))
        .orderBy("o_orderkey")
      }),

    // String breadth: edit distance, reverse/repeat, position, left/right,
    // character-set trims.
    Query("f16_string_extra",
      Some("""SELECT c_custkey,
             |  levenshtein(c_name, 'Customer#000000001') AS lev,
             |  reverse(c_mktsegment) AS rev_seg,
             |  repeat(left(c_name, 4), 2) AS rep4,
             |  strpos(c_name, '#') AS hash_pos,
             |  right(c_name, 3) AS tail3,
             |  ltrim(c_name, 'Custoerm') AS lt,
             |  rtrim(c_name, '0123456789') AS rt
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.select(col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000000001")).as("lev"),
          reverse(col("c_mktsegment")).as("rev_seg"),
          repeat(expr("left(c_name, 4)"), 2).as("rep4"),
          instr(col("c_name"), "#").as("hash_pos"),
          expr("right(c_name, 3)").as("tail3"),
          ltrim(col("c_name"), "Custoerm").as("lt"),
          rtrim(col("c_name"), "0123456789").as("rt"))
        .orderBy("c_custkey")),

    // Date-part breadth. weekofyear is ISO-8601 in both engines; month
    // addition clamps to end-of-month in both.
    Query("f17_date_parts",
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y,
             |  quarter(o_orderdate) AS q,
             |  month(o_orderdate) AS m,
             |  weekofyear(o_orderdate) AS wk,
             |  dayofyear(o_orderdate) AS doy,
             |  last_day(o_orderdate) AS eom,
             |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          weekofyear(col("o_orderdate")).as("wk"),
          dayofyear(col("o_orderdate")).as("doy"),
          last_day(col("o_orderdate")).as("eom"),
          add_months(col("o_orderdate"), 2).as("plus2m"))
        .orderBy("o_orderkey")),

    // ---- Corpus analysis (X33/X35/X36 text-pipeline additions) -----------

    // Document frequency + IDF of whitespace tokens across the corpus —
    // the building block of TF-IDF scoring without hashing (oracle-able,
    // unlike HashingTF vectors). Top 100 by df for a bounded result.
    Query("x35_doc_frequency",
      Some("""WITH tok AS (
             |  SELECT DISTINCT doc_id, t AS token FROM (
             |    SELECT doc_id,
             |      unnest(list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |        x -> x <> '')) AS t
             |    FROM documents)),
             |nd AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT token, count(*) AS df,
             |  round(ln((SELECT n_docs FROM nd) / count(*)), 6) AS idf
             |FROM tok GROUP BY token
             |ORDER BY df DESC, token LIMIT 100""".stripMargin),
      env => {
        // token array projected into its own column before the explode —
        // generator inlining would re-run the regex split per output row
        val toks = env.documents.select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        val tok = toks.select(col("doc_id"),
            explode_outer(col("toks")).as("token"))
          .filter(col("token").isNotNull && col("token") =!= "")
          .distinct()
        val nDocs = env.documents.agg(count(lit(1)).as("n_docs"))
        tok.groupBy("token").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .select(col("token"), col("df"),
            round(log(col("n_docs") / col("df")), 6).as("idf"))
          .orderBy(desc("df"), col("token"))
          .limit(100)
      }),

    // Repetition ratio: most-frequent-token share per document — a
    // standard LLM-corpus quality signal (high ratio = boilerplate/spam).
    Query("x36_repetition",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '')) AS t
             |  FROM documents),
             |cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
             |agg AS (SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_tok
             |        FROM cnt GROUP BY doc_id)
             |SELECT doc_id, top_c, n_tok, round(top_c / n_tok, 6) AS rep_ratio
             |FROM agg ORDER BY doc_id""".stripMargin),
      env => {
        val toks = env.documents.select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        val tok = toks.select(col("doc_id"),
            explode_outer(col("toks")).as("t"))
          .filter(col("t").isNotNull && col("t") =!= "")
        tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(max("c").as("top_c"), sum("c").as("n_tok"))
          .select(col("doc_id"), col("top_c"), col("n_tok"),
            round(col("top_c") / col("n_tok"), 6).as("rep_ratio"))
          .orderBy("doc_id")
      }),

    // Character-class profile per document: digit/upper/whitespace/punct
    // fractions (ASCII classes — identical sets in Java regex and RE2).
    Query("x33_charclass_stats",
      Some("""SELECT doc_id, length(text) AS n_chars,
             |  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
             |    / greatest(length(text), 1), 6) AS digit_frac,
             |  round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
             |    / greatest(length(text), 1), 6) AS upper_frac,
             |  round((length(text) - length(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')))
             |    / greatest(length(text), 1), 6) AS space_frac,
             |  round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
             |    / greatest(length(text), 1), 6) AS punct_frac
             |FROM documents ORDER BY doc_id""".stripMargin),
      env => {
        val n = length(col("text"))
        val d = greatest(n, lit(1))
        def frac(cls: String) =
          round((n - length(regexp_replace(col("text"), cls, ""))) / d, 6)
        env.documents.select(col("doc_id"), n.as("n_chars"),
          frac("[0-9]").as("digit_frac"),
          frac("[A-Z]").as("upper_frac"),
          frac("[ \\t\\n\\x0B\\f\\r]").as("space_frac"),
          frac("\\p{Punct}").as("punct_frac"))
        .orderBy("doc_id")
      }),

    // Gopher-style quality rules (Rae et al. 2021 §A1.1, public): word
    // count bounds, mean word length window, alphabetic-word fraction,
    // bullet-line fraction. keep is derived from the ROUNDED metrics on
    // both sides so boundary ulp noise can't flip the verdict.
    Query("x33_gopher_rules",
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '') AS ws,
             |    str_split(text, chr(10)) AS lines
             |  FROM documents)
             |SELECT doc_id,
             |  len(ws) AS n_words,
             |  round(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
             |    / greatest(len(ws), 1), 6) AS mean_wlen,
             |  round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
             |    / greatest(len(ws), 1), 6) AS alpha_frac,
             |  round(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*]')))
             |    / greatest(len(lines), 1), 6) AS bullet_frac,
             |  (len(ws) BETWEEN 50 AND 100000)
             |    AND (round(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
             |          / greatest(len(ws), 1), 6) BETWEEN 3 AND 10)
             |    AND (round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
             |          / greatest(len(ws), 1), 6) >= 0.8)
             |    AS keep
             |FROM w ORDER BY doc_id""".stripMargin),
      env => {
        val ws = filter(split(lower(trim(col("text"))), "\\s+"),
          x => x =!= "")
        val lines = split(col("text"), "\n")
        val base = env.documents.select(col("doc_id"),
          ws.as("ws"), lines.as("lines"))
        val nWords = size(col("ws")).cast("long")
        val meanWlen = round(
          aggregate(transform(col("ws"), x => length(x).cast("long")),
            lit(0L), (acc, x) => acc + x) / greatest(nWords, lit(1L)), 6)
        val alphaFrac = round(
          size(filter(col("ws"), x => x.rlike("[a-z]"))).cast("long") /
            greatest(nWords, lit(1L)), 6)
        val bulletFrac = round(
          size(filter(col("lines"), l => l.rlike("^\\s*[-*]"))).cast("long") /
            greatest(size(col("lines")).cast("long"), lit(1L)), 6)
        base.select(col("doc_id"),
            nWords.as("n_words"),
            meanWlen.as("mean_wlen"),
            alphaFrac.as("alpha_frac"),
            bulletFrac.as("bullet_frac"))
          .withColumn("keep",
            col("n_words").between(50, 100000) &&
            col("mean_wlen").between(3, 10) &&
            (col("alpha_frac") >= 0.8))
          .orderBy("doc_id")
      }),

    // TF-IDF top terms per document (hash-free, fully oracle-able unlike
    // HashingTF vectors): tf·idf scored, rounded BEFORE ranking, token
    // tiebreak. One token explode feeds both the tf and df branches.
    Query("x35_tfidf_top_terms",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '')) AS t
             |  FROM documents),
             |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
             |df AS (SELECT t, count(DISTINCT doc_id) AS df FROM tok GROUP BY t),
             |nd AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, t AS token,
             |    round(tf * ln((SELECT n_docs FROM nd) / df), 6) AS tfidf
             |  FROM tf JOIN df USING (t))
             |SELECT doc_id, token, tfidf,
             |  row_number() OVER (PARTITION BY doc_id
             |    ORDER BY tfidf DESC, token) AS rn
             |FROM scored QUALIFY rn <= 3
             |ORDER BY doc_id, rn""".stripMargin),
      env => {
        val toks = env.documents.select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        val tok = toks.select(col("doc_id"),
            explode_outer(col("toks")).as("t"))
          .filter(col("t").isNotNull && col("t") =!= "")
          .localCheckpoint() // feeds both the tf and df branches once
        val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        val dfreq = tok.select("doc_id", "t").distinct()
          .groupBy("t").agg(count(lit(1)).as("df"))
        val nDocs = env.documents.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "t").crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("t").as("token"),
            round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
        graft.ops.RelOps.topNPerGroup(3, Seq("doc_id"),
          Seq(desc("tfidf"), col("token")))(scored)
          .select("doc_id", "token", "tfidf", "rn")
          .orderBy("doc_id", "rn")
      }),

    // Composed C4-style cleaning pipeline: a document survives iff it is
    // the canonical copy of its normalized content (exact-dedup winner),
    // passes the Gopher word-count/length/alpha gates, and is not
    // repetition-dominated. The composition is the point — dedup ⨯
    // quality ⨯ repetition in one plan, the daily shape of an LLM-corpus
    // refresh.
    Query("x37_clean_pipeline",
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
             |    list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '') AS ws
             |  FROM documents),
             |canon AS (SELECT min(doc_id) AS doc_id FROM w GROUP BY h),
             |tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
             |rep AS (
             |  SELECT doc_id, round(max(c) / sum(c), 6) AS rep_ratio FROM (
             |    SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t)
             |  GROUP BY doc_id),
             |gop AS (
             |  SELECT doc_id,
             |    len(ws) AS n_words,
             |    round(list_sum(list_transform(ws, x -> length(x)))
             |      / greatest(len(ws), 1), 6) AS mean_wlen,
             |    round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
             |      / greatest(len(ws), 1), 6) AS alpha_frac
             |  FROM w)
             |SELECT g.doc_id, g.n_words, r.rep_ratio
             |FROM gop g
             |JOIN canon c ON g.doc_id = c.doc_id
             |JOIN rep r ON g.doc_id = r.doc_id
             |WHERE g.n_words BETWEEN 50 AND 100000
             |  AND g.mean_wlen BETWEEN 3 AND 10
             |  AND g.alpha_frac >= 0.8
             |  AND r.rep_ratio <= 0.5
             |ORDER BY g.doc_id""".stripMargin),
      env => {
        val ws = filter(split(lower(trim(col("text"))), "\\s+"), x => x =!= "")
        val w = env.documents.select(col("doc_id"),
            graft.ops.TextOps.fingerprint(col("text")).as("h"), ws.as("ws"))
          .localCheckpoint() // shared by the canon / rep / gopher branches
        val canon = w.groupBy("h").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val tok = w.select(col("doc_id"), explode_outer(col("ws")).as("t"))
          .filter(col("t").isNotNull)
        val rep = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(round(max("c") / sum("c"), 6).as("rep_ratio"))
        val nWords = size(col("ws")).cast("long")
        val gop = w.select(col("doc_id"), nWords.as("n_words"),
          round(aggregate(transform(col("ws"), x => length(x).cast("long")),
            lit(0L), (acc, x) => acc + x) / greatest(nWords, lit(1L)), 6)
            .as("mean_wlen"),
          round(size(filter(col("ws"), x => x.rlike("[a-z]"))).cast("long") /
            greatest(nWords, lit(1L)), 6).as("alpha_frac"))
        gop.join(canon, "doc_id").join(rep, "doc_id")
          .filter(col("n_words").between(50, 100000) &&
            col("mean_wlen").between(3, 10) &&
            (col("alpha_frac") >= 0.8) && (col("rep_ratio") <= 0.5))
          .select("doc_id", "n_words", "rep_ratio")
          .orderBy("doc_id")
      }),

    // S4b: stratified sample — per-stratum downsampling, the class
    // rebalancer of a training-data pipeline. Seeded Bernoulli per
    // stratum → rows-only (no cross-engine RNG parity); per-stratum
    // binomial bounds + seed determinism pinned in PropertySpec.
    Query("s12_stratified_sample",
      None,
      env => graft.ops.RelOps.stratifiedSample("o_orderpriority",
          Map[Any, Double]("1-URGENT" -> 0.5, "2-HIGH" -> 0.1), seed = 7)(
          env.orders)
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")),

    // S4c: the stratified-sample CONTRACT, hash-checked (x7c discipline):
    // each stratum's sampled count must sit within 6σ of its binomial
    // expectation (σ = sqrt(n·f·(1−f)); the +1 absorbs discreteness).
    // With the committed seed the count is a fixed number, so this is a
    // deterministic gate — a sampler regression (wrong fraction applied,
    // stratum leakage, seed drift) lands ~f·n away from the expectation
    // and flips the hash in the driver artifact.
    Query("s12b_sample_bound",
      Some("""SELECT o_orderpriority, true AS within_band FROM orders
             |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      env => {
        val sampled = graft.ops.RelOps.stratifiedSample("o_orderpriority",
            Map[Any, Double]("1-URGENT" -> 0.5, "2-HIGH" -> 0.1), seed = 7)(
            env.orders)
          .groupBy("o_orderpriority").agg(count(lit(1)).as("k"))
        env.orders
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .withColumn("f",
            when(col("o_orderpriority") === "1-URGENT", 0.5).otherwise(0.1))
          .join(sampled, Seq("o_orderpriority"), "left_outer")
          .select(col("o_orderpriority"),
            (abs(coalesce(col("k"), lit(0L)) - col("f") * col("n")) <=
              sqrt(col("n") * col("f") * (lit(1.0) - col("f"))) * 6 + 1)
              .as("within_band"))
          .orderBy("o_orderpriority")
      }),

    // PII scrubbing: email/phone/URL masking plus a per-doc hit count —
    // the redaction stage of a C4-style cleaning pipeline. Patterns are
    // RE2-compatible (no lookahead) so both engines match identically.
    // The fixture corpus carries no PII, so the query APPENDS a
    // deterministic doc_id-derived contact line on both engines first —
    // the masking and counting logic is genuinely exercised, not
    // vacuously green. regexp_extract_all takes explicit group 0: Spark's
    // default is group 1, which THROWS on zero-capture-group patterns
    // (DuckDB's default is the full match).
    Query("x38_pii_redact",
      Some("""WITH d AS (SELECT doc_id,
             |  text || ' contact user' || doc_id ||
             |    '@example.com or https://ex.org/u/' || doc_id ||
             |    ' tel +1 (555) 010-' || doc_id AS text
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |    'https?://[^\s]+', '[URL]', 'g'),
             |    '\+?[0-9][0-9()\-\. ]{7,}[0-9]', '[PHONE]', 'g') AS clean_text,
             |  len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0)) AS n_emails,
             |  len(regexp_extract_all(text, 'https?://[^\s]+', 0)) AS n_urls
             |FROM d ORDER BY doc_id""".stripMargin),
      env => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val url = "https?://[^\\s]+"
        val phone = "\\+?[0-9][0-9()\\-\\. ]{7,}[0-9]"
        val withPii = env.documents.select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or https://ex.org/u/"), col("doc_id"),
            lit(" tel +1 (555) 010-"), col("doc_id")).as("text"))
        withPii.select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            email, "[EMAIL]"), url, "[URL]"), phone, "[PHONE]")
            .as("clean_text"),
          size(regexp_extract_all(col("text"), lit(email), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("text"), lit(url), lit(0)))
            .as("n_urls"))
        .orderBy("doc_id")
      }),

    // TPC-H Q4 shape: orders with at least one long-latency lineitem —
    // EXISTS over a non-equi condition, planned as a left-semi join.
    Query("x42_order_priority_check",
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey
             |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      env => env.orders.join(env.lineitem,
          col("l_orderkey") === col("o_orderkey") &&
            (col("l_shipdate") > col("o_orderdate") + expr("interval 60 days")),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // TPC-H Q6 shape: the forecasting-revenue-change scan — pure
    // filter + global aggregate, entirely pushdown-able predicates.
    Query("x43_revenue_change",
      Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin),
      env => env.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"))),

    // Regression aggregates — single-pass bivariate OLS over groups, the
    // SQL-standard regr_* family both engines implement natively.
    Query("a14_regr_family",
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
             |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
             |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
             |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      env => env.lineitem.groupBy("l_returnflag").agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2)
            .as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6)
            .as("avgx"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4)
            .as("avgy"))
        .orderBy("l_returnflag")),

    // Boolean + bitwise aggregates and FILTER-style conditional counts.
    Query("f19_bool_bit_aggs",
      Some("""SELECT o_orderstatus,
             |  bool_and(o_totalprice > 1000) AS all_above_1k,
             |  bool_or(o_totalprice > 400000) AS any_above_400k,
             |  bit_and(o_custkey) AS band,
             |  bit_or(o_custkey) AS bor,
             |  bit_xor(o_custkey) AS bxor,
             |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      env => env.orders.groupBy("o_orderstatus").agg(
          bool_and(col("o_totalprice") > 1000).as("all_above_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_above_400k"),
          bit_and(col("o_custkey")).as("band"),
          bit_or(col("o_custkey")).as("bor"),
          bit_xor(col("o_custkey")).as("bxor"),
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"))
        .orderBy("o_orderstatus")),

    // try_cast: malformed input yields null instead of failing the job —
    // the ingest-hardening semantics both engines share.
    Query("f20_try_cast",
      Some("""SELECT c_custkey,
             |  coalesce(TRY_CAST(c_name AS BIGINT), -1) AS name_as_num,
             |  coalesce(TRY_CAST(split_part(c_name, '#', 2) AS BIGINT), -1) AS tail_num,
             |  coalesce(TRY_CAST('not a date' AS DATE), DATE '1970-01-01') AS bad_date
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.select(col("c_custkey"),
          coalesce(col("c_name").try_cast("bigint"), lit(-1L))
            .as("name_as_num"),
          coalesce(split(col("c_name"), "#").getItem(1).try_cast("bigint"),
            lit(-1L)).as("tail_num"),
          coalesce(lit("not a date").try_cast("date"),
            lit("1970-01-01").cast("date")).as("bad_date"))
        .orderBy("c_custkey")),

    // ---- Batch 2: quantiles, histogram, time-series, decorrelation -------

    // Multi-quantile in one aggregate pass (exact linear interpolation,
    // like pandas median / DuckDB quantile_cont). The quantile array is
    // serialized element-rounded to CSV for the comparator.
    Query("a12_quantiles",
      Some("""SELECT l_returnflag,
             |  array_to_string(list_transform(
             |    quantile_cont(l_quantity, [0.25, 0.5, 0.75, 0.95]),
             |    x -> CAST(round(x, 6) AS VARCHAR)), ',') AS quartiles
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      env => env.lineitem.groupBy("l_returnflag").agg(
          concat_ws(",", transform(
            percentile(col("l_quantity"),
              array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))),
            x => round(x, 6).cast("string"))).as("quartiles"))
        .orderBy("l_returnflag")),

    // Fixed-width histogram — the classic OLAP binning shape (floor-based
    // bucketing is cross-engine-exact on non-negative values).
    Query("a13_histogram",
      Some("""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  round(min(o_totalprice), 2) AS lo,
             |  round(max(o_totalprice), 2) AS hi
             |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin),
      env => env.orders
        .groupBy(floor(col("o_totalprice") / 50000).as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
        .orderBy("bucket")),

    // Gap-filled hourly series with last-observation-carried-forward: a
    // generated hour spine (data-driven bounds) left-joined to hourly
    // sums; missing hours carry the previous observed value. The spine ⨯
    // type frame is tiny (hours × 5) — the heavy side is the one
    // aggregation pass over events.
    Query("x25_gap_fill",
      Some("""WITH b AS (SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS t0,
             |                  date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS t1
             |           FROM events),
             |spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
             |          FROM b),
             |types AS (SELECT DISTINCT event_type FROM events),
             |hourly AS (
             |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
             |    round(sum(value), 4) AS v
             |  FROM events GROUP BY h, event_type)
             |SELECT s.h, t.event_type,
             |  coalesce(v, -1.0) AS v_raw,
             |  coalesce(last_value(v IGNORE NULLS) OVER (
             |    PARTITION BY t.event_type ORDER BY s.h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS v_locf
             |FROM spine s CROSS JOIN types t
             |LEFT JOIN hourly ON hourly.h = s.h AND hourly.event_type = t.event_type
             |ORDER BY t.event_type, s.h""".stripMargin),
      env => {
        // ONE scan of events: the hourly aggregate is checkpointed (it is
        // tiny — hours × types) and the spine bounds and type list derive
        // from it instead of re-scanning the fact table. min/max of the
        // truncated hours ≡ truncation of min/max ts, and every type with
        // any event appears in hourly, so semantics are unchanged.
        val hourly = env.events
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(round(sum("value"), 4).as("v"))
          .localCheckpoint()
        val bounds = hourly.agg(min(col("h")).as("t0"), max(col("h")).as("t1"))
        val spine = bounds.select(explode(sequence(col("t0"), col("t1"),
          expr("interval 1 hour"))).as("h"))
        val types = hourly.select(col("event_type")).distinct()
        val w = Window.partitionBy(col("t.event_type")).orderBy(col("s.h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.as("s").crossJoin(broadcast(types).as("t"))
          .join(hourly.as("hr"),
            col("hr.h") === col("s.h") &&
              col("hr.event_type") === col("t.event_type"), "left")
          .select(col("s.h").as("h"), col("t.event_type").as("event_type"),
            coalesce(col("v"), lit(-1.0)).as("v_raw"),
            coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1.0))
              .as("v_locf"))
          .orderBy("event_type", "h")
      }),

    // RANGE window frame over a day-number ordering: 7-day moving spend
    // per customer (value-based frame, not row-based — rows outside the
    // range are excluded even when adjacent).
    Query("x26_range_frame",
      Some("""SELECT o_orderkey,
             |  round(sum(o_totalprice) OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov7
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => {
        val day = datediff(col("o_orderdate").cast("date"),
          lit("1990-01-01").cast("date"))
        val w = Window.partitionBy("o_custkey").orderBy(day)
          .rangeBetween(-6, Window.currentRow)
        env.orders.select(col("o_orderkey"),
            round(sum("o_totalprice").over(w), 4).as("mov7"))
          .orderBy("o_orderkey")
      }),

    // Correlated EXISTS through the SQL path — exercises Catalyst's
    // RewriteCorrelatedScalarSubquery/decorrelation into a semi join.
    Query("x19_exists_subquery",
      Some("""SELECT c_custkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |    AND o.o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin),
      env => {
        env.customer.createOrReplaceTempView("customer_ex")
        env.orders.createOrReplaceTempView("orders_ex")
        env.spark.sql(
          """SELECT c_custkey FROM customer_ex c
            |WHERE EXISTS (SELECT 1 FROM orders_ex o
            |  WHERE o.o_custkey = c.c_custkey
            |    AND o.o_orderpriority = '1-URGENT')
            |ORDER BY c_custkey""".stripMargin)
      }),

    // NOT IN subquery — the null-aware anti-join path (distinct from plain
    // left anti: one null in the subquery empties the result under SQL
    // three-valued logic; both engines implement that semantics).
    Query("x19_not_in_subquery",
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey NOT IN
             |  (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
             |ORDER BY c_custkey""".stripMargin),
      env => {
        env.customer.createOrReplaceTempView("customer_ni")
        env.orders.createOrReplaceTempView("orders_ni")
        env.spark.sql(
          """SELECT c_custkey FROM customer_ni
            |WHERE c_custkey NOT IN
            |  (SELECT o_custkey FROM orders_ni WHERE o_totalprice > 200000)
            |ORDER BY c_custkey""".stripMargin)
      }),

    // LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    // SQL-standard top-n-per-outer-row shape, planned as a LateralJoin
    // (distinct from the window-function formulation in x5_topn_per_group).
    Query("x44_lateral_topn",
      Some("""SELECT r.r_name, n.n_name, n.sub_customers FROM region r,
             |LATERAL (
             |  SELECT n_name, count(c_custkey) AS sub_customers
             |  FROM nation JOIN customer ON c_nationkey = n_nationkey
             |  WHERE n_regionkey = r.r_regionkey
             |  GROUP BY n_name ORDER BY sub_customers DESC, n_name LIMIT 2) n
             |ORDER BY r.r_name, n.n_name""".stripMargin),
      env => {
        env.region.createOrReplaceTempView("region_lat")
        env.nation.createOrReplaceTempView("nation_lat")
        env.customer.createOrReplaceTempView("customer_lat")
        env.spark.sql(
          """SELECT r.r_name, n.n_name, n.sub_customers FROM region_lat r,
            |LATERAL (
            |  SELECT n_name, count(c_custkey) AS sub_customers
            |  FROM nation_lat JOIN customer_lat ON c_nationkey = n_nationkey
            |  WHERE n_regionkey = r.r_regionkey
            |  GROUP BY n_name ORDER BY sub_customers DESC, n_name LIMIT 2) n
            |ORDER BY r.r_name, n.n_name""".stripMargin)
      }),

    // Cohort retention: per first-activity day, how many users return
    // exactly 1 and 7 days later — the D1/D7 retention table of event
    // analytics. One distinct-activity frame feeds cohort + both
    // retention joins.
    Query("x28_retention",
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
             |  FROM events),
             |cohort AS (SELECT user_id, min(d) AS d0 FROM act GROUP BY user_id)
             |SELECT d0, count(*) AS cohort_n,
             |  count(r1.user_id) AS d1_retained,
             |  count(r7.user_id) AS d7_retained
             |FROM cohort f
             |LEFT JOIN act r1 ON r1.user_id = f.user_id AND r1.d = f.d0 + 1
             |LEFT JOIN act r7 ON r7.user_id = f.user_id AND r7.d = f.d0 + 7
             |GROUP BY d0 ORDER BY d0""".stripMargin),
      env => {
        val act = env.events.select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("d")).distinct()
        val cohort = act.groupBy("user_id").agg(min("d").as("d0"))
        cohort.as("f")
          .join(act.as("r1"),
            col("r1.user_id") === col("f.user_id") &&
              col("r1.d") === date_add(col("f.d0"), 1), "left")
          .join(act.as("r7"),
            col("r7.user_id") === col("f.user_id") &&
              col("r7.d") === date_add(col("f.d0"), 7), "left")
          .groupBy(col("f.d0").as("d0"))
          .agg(count(lit(1)).as("cohort_n"),
            count(col("r1.user_id")).as("d1_retained"),
            count(col("r7.user_id")).as("d7_retained"))
          .orderBy("d0")
      }),

    // Per-window top-k: the busiest event type of every hour — windowed
    // aggregation composed with ranked selection (hopping dashboards'
    // bread and butter).
    Query("x29_window_topk",
      Some("""WITH hourly AS (
             |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h,
             |    event_type, count(*) AS n, round(sum(value), 4) AS sum_v
             |  FROM events GROUP BY h, event_type)
             |SELECT h, event_type, n, sum_v,
             |  row_number() OVER (PARTITION BY h
             |    ORDER BY n DESC, event_type) AS rn
             |FROM hourly QUALIFY rn <= 2
             |ORDER BY h, rn""".stripMargin),
      env => {
        val hourly = env.events
          .groupBy(window(col("ts"), "1 hour")("start").as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_v"))
        graft.ops.RelOps.topNPerGroup(2, Seq("h"),
          Seq(desc("n"), col("event_type")))(hourly)
          .select("h", "event_type", "n", "sum_v", "rn")
          .orderBy("h", "rn")
      }),

    // Conversion funnel: users whose first purchase follows their first
    // signup within 24 h. One aggregation per event type + an equi join on
    // user — no event-to-event pairwise work.
    Query("x27_funnel",
      Some("""WITH s AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s_ts
             |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS p_ts
             |      FROM events e JOIN s ON e.user_id = s.user_id
             |      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s.s_ts
             |      GROUP BY e.user_id)
             |SELECT count(*) AS n_signup,
             |  count(p_ts) AS n_converted,
             |  count(CASE WHEN epoch(p_ts) - epoch(s_ts) <= 86400 THEN 1 END)
             |    AS n_converted_24h
             |FROM s LEFT JOIN p ON s.user_id = p.user_id""".stripMargin),
      env => {
        val ev = env.events
        val s = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("s_ts"))
        val p = ev.filter(col("event_type") === "purchase").as("e")
          .join(s.as("s"), Seq("user_id"))
          .filter(col("ts") >= col("s_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        s.join(p, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_signup"),
            count(col("p_ts")).as("n_converted"),
            count(when(unix_micros(col("p_ts")) / 1e6 -
              unix_micros(col("s_ts")) / 1e6 <= 86400, 1))
              .as("n_converted_24h"))
      })
  )
}
