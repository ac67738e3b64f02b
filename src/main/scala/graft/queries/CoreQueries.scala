package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Env
import graft.ops.RelOps

/** One driver-verifiable query per SURVEY §2 inventory row (S/P/A/O/F
  * groups), instantiated over the testdata star schema (FIXTURES.md usage
  * mapping: wine-shaped operators run over lineitem/orders analogues).
  *
  * Discipline (SURVEY §5.2): every query ends in a deterministic orderBy
  * on a unique key, selects an explicit aliased column list, and rounds
  * derived doubles to 6 so DuckDB/Spark float association order can't flip
  * the driver's hash compare.
  */
final case class Query(name: String, oracle: Option[String], run: Env => DataFrame)

/** Shared DuckDB-oracle CTE fragments — ONE definition of the shingle /
  * Jaccard-pair machinery used by x31 (pairs), x62 (clusters) and x63
  * (survivors). The Scala side's single definition is
  * SimilarityOps.ngramJaccardPairs; changing tokenization, shingle
  * length (3) or threshold (0.5) means changing exactly these two
  * places. */
object OracleCtes {
  /** tok/sh/sz/pr: tokenize → distinct 3-gram shingles → sizes →
    * intersection counts per candidate pair. Splice after WITH or
    * WITH RECURSIVE. */
  val shinglePairs: String =
    """tok AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
      |  FROM tok, UNNEST(range(len(t) - 2)) u(i)),
      |sz AS (SELECT doc_id, count(*) AS z FROM sh GROUP BY doc_id),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** shinglePairs + the >= 0.5 Jaccard edge list. */
  val jaccardEdges: String = shinglePairs + """,
      |edges AS (
      |  SELECT id_a AS a, id_b AS b
      |  FROM pr JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      |  WHERE round(i / (sa.z + sb.z - i), 6) >= 0.5)""".stripMargin

  /** jaccardEdges symmetrized + recursive min-root reachability →
    * cl(doc_id, comp). Requires WITH RECURSIVE. */
  val components: String = jaccardEdges + """,
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach(id, root) AS (
      |  SELECT DISTINCT a, a FROM sym
      |  UNION
      |  SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.id),
      |cl AS (SELECT id AS doc_id, min(root) AS comp FROM reach GROUP BY id)""".stripMargin
}

object CoreQueries {

  val all: Seq[Query] = Seq(

    // ---- Aggregations ----------------------------------------------------

    // A1 flagship (reference dags/etl_elt_wine.py:423-428 restated over
    // lineitem): per-group mean/median/std/min/max/count.
    Query("a1_group_stats",
      Some("""SELECT l_returnflag,
             |  round(avg(l_quantity), 6) AS mean_v,
             |  round(quantile_cont(l_quantity, 0.5), 6) AS median_v,
             |  round(stddev_samp(l_quantity), 6) AS std_v,
             |  min(l_quantity) AS min_v,
             |  max(l_quantity) AS max_v,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      env => RelOps.groupStats("l_returnflag", "l_quantity")(env.lineitem)
        .orderBy("l_returnflag")),

    // A2 (reference dags/etl_elt_wine.py:190 etc): row count.
    Query("a2_count",
      Some("SELECT count(*) AS n FROM lineitem"),
      env => env.lineitem.agg(count(lit(1)).as("n"))),

    // A3 (reference README.md:95-105, Metabase BI query): group count, sorted.
    Query("a3_group_count",
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      env => env.orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // A4 (reference dags/include/utils.py:263): distinct values sorted desc.
    Query("a4_distinct_desc",
      Some("""SELECT DISTINCT o_orderpriority FROM orders
             |ORDER BY o_orderpriority DESC""".stripMargin),
      env => env.orders.select("o_orderpriority").distinct()
        .orderBy(desc("o_orderpriority"))),

    // A5 (reference dags/etl_elt_wine.py:430): count of distinct groups.
    Query("a5_count_distinct",
      Some("SELECT count(DISTINCT o_custkey) AS n FROM orders"),
      env => env.orders.agg(countDistinct("o_custkey").as("n"))),

    // ---- Projections / filters ------------------------------------------

    // P1 (reference dags/etl_elt_wine.py:270): narrow projection.
    Query("p1_project",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // P2 (reference dags/include/utils.py:52-67): wide feature projection.
    Query("p2_wide_project",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |  l_discount, l_tax, l_returnflag, l_linestatus
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      env => env.lineitem.select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber")),

    // P3 (reference dags/include/utils.py:69): drop a column.
    Query("p3_drop",
      Some("""SELECT c_custkey, c_name, c_nationkey, c_mktsegment
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.drop("c_acctbal").orderBy("c_custkey")),

    // P4 (reference dags/etl_elt_wine.py:185-188): derived boolean column.
    Query("p4_derived_flag",
      Some("""SELECT o_orderkey, o_totalprice,
             |  o_totalprice >= 300000 AS high_value
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => RelOps.deriveFlag("high_value", col("o_totalprice") >= 300000)(
          env.orders.select("o_orderkey", "o_totalprice"))
        .orderBy("o_orderkey")),

    // P5 (reference dags/etl_elt_wine.py:189): parameterized >= filter.
    Query("p5_filter_ge",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_totalprice >= 300000 ORDER BY o_orderkey""".stripMargin),
      env => env.orders.filter(col("o_totalprice") >= 300000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // P6 (reference dags/etl_elt_wine.py:270): constant < filter on double.
    Query("p6_filter_lt",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity < 25 ORDER BY l_orderkey, l_linenumber""".stripMargin),
      env => env.lineitem.filter(col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // P7 (reference dags/include/utils.py:274-276): equality filter per class.
    Query("p7_filter_eq",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin),
      env => env.orders.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")),

    // ---- Sorts / set ops -------------------------------------------------

    // O1 (reference dags/etl_elt_wine.py:428): sort desc (tiebroken).
    Query("o1_sort_desc",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin),
      env => env.orders.select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))),

    // O2 (reference dags/etl_elt_wine.py:216): column-order canonicalization.
    Query("o2_canon_cols",
      Some("""SELECT l_linenumber, l_orderkey, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      env => env.lineitem.select("l_linenumber", "l_orderkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // S6 (reference dags/etl_elt_wine.py:214-217): INSERT OR IGNORE BY NAME
    // as dedup + anti-join. "Existing" = keys divisible by 3; "incoming" =
    // high-price orders; result = incoming rows whose key is genuinely new.
    Query("s6_keyed_append",
      Some("""WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
             |incoming AS (SELECT * FROM orders WHERE o_totalprice > 100000)
             |SELECT i.o_orderkey, i.o_custkey, i.o_orderstatus, i.o_totalprice,
             |       i.o_orderdate, i.o_orderpriority
             |FROM incoming i
             |WHERE NOT EXISTS (SELECT 1 FROM existing e
             |                  WHERE e.o_orderkey = i.o_orderkey)
             |ORDER BY i.o_orderkey""".stripMargin),
      env => {
        val existing = env.orders.filter(col("o_orderkey") % 3 === 0)
        val incoming = env.orders.filter(col("o_totalprice") > 100000)
        RelOps.newRowsOnly(existing, "o_orderkey")(incoming)
          .orderBy("o_orderkey")
      }),

    // ---- Scalar functions ------------------------------------------------

    // F1 (reference dags/include/utils.py:33): integer arithmetic.
    Query("f1_arith",
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_orderkey * 10 + l_linenumber AS line_uid
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      env => env.lineitem.select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("line_uid"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F3 (reference dags/include/utils.py:32,310): string normalize.
    Query("f3_string",
      Some("""SELECT c_custkey,
             |  regexp_replace(lower(c_name), 'customer#', 'c_') AS norm_name
             |FROM customer ORDER BY c_custkey""".stripMargin),
      env => env.customer.select(col("c_custkey"),
          regexp_replace(lower(col("c_name")), "customer#", "c_").as("norm_name"))
        .orderBy("c_custkey")),

    // F4 (reference dags/etl_elt_wine.py:305): date parts. DuckDB dayofweek
    // is Sun=0..Sat=6, Spark's is Sun=1..Sat=7 (SURVEY caveat C4) — the
    // oracle shifts by one to align.
    Query("f4_date",
      Some("""SELECT o_orderkey, year(o_orderdate) AS o_year,
             |  month(o_orderdate) AS o_month, day(o_orderdate) AS o_day,
             |  dayofweek(o_orderdate) + 1 AS o_dow
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          dayofweek(col("o_orderdate")).as("o_dow"))
        .orderBy("o_orderkey")),

    // F5 (reference dags/include/utils.py:231-233): rounding for reporting.
    // Divisor 7 (not 100): dividing 2-decimal prices by 100 lands exactly on
    // .xx5 round-to-even boundaries where Spark (decimal HALF_UP) and DuckDB
    // (binary round) legitimately disagree; /7 makes ties measure-zero.
    Query("f5_round",
      Some("""SELECT o_orderkey, round(o_totalprice / 7.0, 2) AS price_w
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      env => env.orders.select(col("o_orderkey"),
          round(col("o_totalprice") / 7.0, 2).as("price_w"))
        .orderBy("o_orderkey")),

    // F6 (SURVEY §2.5): JSON field extraction from events.props.
    Query("f6_json",
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
             |FROM events ORDER BY event_id""".stripMargin),
      env => env.events.select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .orderBy("event_id"))
  )
}
