package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Env
import graft.ops.RelOps

/** Behavioral sequence analytics over the event stream: regex matching on
  * per-user event journeys (the poor man's MATCH_RECOGNIZE), Markov
  * transition matrices, and frequent-path mining. Event order is pinned to
  * (µs timestamp, event_id) in BOTH engines — event_id is unique, so window
  * functions and ordered aggregations are deterministic despite timestamp
  * ties.
  *
  * Scale posture: everything here shuffles once on user_id (window or
  * journey aggregation) and then aggregates tiny keyed state (event-type
  * pairs/paths/patterns). Journey strings are bounded by events-per-user —
  * the same per-group bound the session/funnel queries rely on; a user with
  * unbounded history would need windowed journeys (split by session id)
  * before this surface, not a different operator.
  */
object SequenceQueries {

  /** lead(col) over the deterministic per-user event order. */
  private def nextEv(c: Column, n: Int): Column =
    lead(c, n).over(Window.partitionBy("user_id").orderBy("ts", "event_id"))

  private val patterns = Seq(
    ("browse_to_buy", "v.*c.*p"), // view … click … purchase subsequence
    ("error_retry", "e.*e"),      // at least two errors
    ("signup_first", "^s"))       // journey starts with signup

  val all: Seq[Query] = Seq(

    // X110: regex journey match — each user's history becomes an ordered
    // first-letter string ('vcpse…'), counted against behavioral regexes.
    // One shuffle builds every journey (sort_array over collected
    // (ts, event_id, letter) structs — the Spark idiom for an ORDER BY
    // inside an aggregate); each pattern is then a codegen rlike scan of
    // 1-row-per-user, unioned. Patterns stay literals (whole-stage
    // codegen), not a pattern column.
    Query("x110_sequence_match",
      Some("""WITH j AS (SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS journey
             |  FROM events GROUP BY user_id)
             |SELECT 'browse_to_buy' AS pattern,
             |  count(*) FILTER (WHERE regexp_matches(journey, 'v.*c.*p')) AS n_users,
             |  count(*) AS n_total FROM j
             |UNION ALL SELECT 'error_retry',
             |  count(*) FILTER (WHERE regexp_matches(journey, 'e.*e')), count(*) FROM j
             |UNION ALL SELECT 'signup_first',
             |  count(*) FILTER (WHERE regexp_matches(journey, '^s')), count(*) FROM j
             |ORDER BY pattern""".stripMargin),
      env => {
        val journeys = env.events
          .select(col("user_id"),
            struct(col("ts"), col("event_id"),
              substring(col("event_type"), 1, 1).as("e")).as("s"))
          .groupBy("user_id")
          .agg(array_join(transform(sort_array(collect_list(col("s"))),
            x => x.getField("e")), "").as("journey"))
        val counted = patterns.map { case (name, re) =>
          journeys.agg(
            count(when(col("journey").rlike(re), 1)).as("n_users"),
            count(lit(1)).as("n_total"))
            .select(lit(name).as("pattern"), col("n_users"), col("n_total"))
        }
        counted.reduce(_.unionByName(_)).orderBy("pattern")
      }),

    // X111: Markov transition matrix — P(next event | event) from the
    // lead() pairs. One user_id window shuffle, then a 25-key aggregate;
    // the per-source normalization rides a second tiny window over the
    // aggregated matrix, never over the events.
    Query("x111_transition_matrix",
      Some("""WITH o AS (SELECT event_type AS src,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
             |  FROM events)
             |SELECT src, dst, count(*) AS n,
             |  round(CAST(count(*) AS DOUBLE)
             |    / sum(count(*)) OVER (PARTITION BY src), 6) AS p
             |FROM o WHERE dst IS NOT NULL
             |GROUP BY src, dst ORDER BY src, dst""".stripMargin),
      env => {
        val pairs = env.events
          .select(col("event_type").as("src"), nextEv(col("event_type"), 1).as("dst"))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        pairs
          .withColumn("p", round(col("n").cast("double")
            / sum("n").over(Window.partitionBy("src")), 6))
          .orderBy("src", "dst")
      }),

    // X112: frequent 3-step paths — the top-15 event trigrams across all
    // user histories. Two leads on the same window (one shuffle), a path
    // aggregate, then global top-k (TakeOrderedAndProject — no full sort).
    Query("x112_top_paths",
      Some("""WITH o AS (SELECT substr(event_type, 1, 1) AS e0,
             |    lead(substr(event_type, 1, 1)) OVER w AS e1,
             |    lead(substr(event_type, 1, 1), 2) OVER w AS e2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP), event_id))
             |SELECT e0 || '>' || e1 || '>' || e2 AS path, count(*) AS n
             |FROM o WHERE e2 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin),
      env => {
        val e = substring(col("event_type"), 1, 1)
        val grams = env.events
          .select(e.as("e0"), nextEv(e, 1).as("e1"), nextEv(e, 2).as("e2"))
          .filter(col("e2").isNotNull)
          .select(concat_ws(">", col("e0"), col("e1"), col("e2")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
        RelOps.topK(15, Seq(desc("n"), col("path")))(grams)
          .select("path", "n")
      }),

    // X113: MATCH_RECOGNIZE with predicates on MEASURES — not just event
    // order (x110's journey regex) but row values: "a view followed within
    // the next 3 events by a purchase worth > 20", per user, with the
    // first qualifying purchase's value as the match measure. Bounded
    // lookahead = k lead() columns over ONE user_id window shuffle (all
    // whole-stage codegen); the measure is a CASE cascade picking the
    // first hit, exactly MATCH_RECOGNIZE's FIRST(B.value) semantics for
    // pattern A B{0,2} B'.
    Query("x113_predicate_match",
      Some("""WITH o AS (SELECT user_id, event_type,
             |    lead(event_type, 1) OVER w AS t1, lead(value, 1) OVER w AS v1,
             |    lead(event_type, 2) OVER w AS t2, lead(value, 2) OVER w AS v2,
             |    lead(event_type, 3) OVER w AS t3, lead(value, 3) OVER w AS v3
             |  FROM events WINDOW w AS (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP), event_id)),
             |m AS (SELECT user_id,
             |    CASE WHEN t1 = 'purchase' AND v1 > 20 THEN v1
             |         WHEN t2 = 'purchase' AND v2 > 20 THEN v2
             |         WHEN t3 = 'purchase' AND v3 > 20 THEN v3 END AS hit
             |  FROM o WHERE event_type = 'view')
             |SELECT user_id, count(hit) AS n_matches,
             |  round(CAST(sum(CAST(hit AS DECIMAL(18,4))) AS DOUBLE), 4) AS matched_value
             |FROM m GROUP BY user_id HAVING count(hit) > 0
             |ORDER BY user_id""".stripMargin),
      env => SequencePlans.predicateMatch(env.events)),

    // X114: variable-length pattern (MATCH_RECOGNIZE A{3,}) with measures
    // over the matched SPAN — runs of ≥3 consecutive 'error' events per
    // user, each streak reporting its length and total value. The
    // unbounded-run shape lead() cannot express: gaps-and-islands instead
    // (island id = global row_number − per-type row_number, constant
    // exactly along a run). Two window functions over the SAME user_id
    // exchange, then a tiny keyed aggregate; measures summed as decimal
    // (order-free) before the presentation cast.
    Query("x114_error_streaks",
      Some("""WITH r AS (SELECT user_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rt
             |  FROM events)
             |SELECT user_id, min(rn) AS start_rn, count(*) AS streak_len,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS streak_value
             |FROM r WHERE event_type = 'error'
             |GROUP BY user_id, rn - rt HAVING count(*) >= 3
             |ORDER BY user_id, start_rn""".stripMargin),
      env => SequencePlans.errorStreaks(env.events))
  )
}
