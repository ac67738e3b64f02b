package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** X20-X24 (SURVEY §2.9): streaming window operators verified in batch mode
  * — the same DataFrame expressions run under readStream (see
  * graft.streaming.StreamOps); here the batch semantics are oracle-checked
  * against DuckDB. Spark's window()/session_window() align to the epoch,
  * as does DuckDB time_bucket (hour/minute granularities).
  */
object EventQueries {

  val all: Seq[Query] = Seq(

    // X20: tumbling 1-hour window per event type.
    Query("x20_tumbling_window",
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
             |  count(*) AS n, round(sum(value), 4) AS sum_v
             |FROM events GROUP BY w_start, event_type
             |ORDER BY w_start, event_type""".stripMargin),
      env => env.events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_v"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_v"))
        .orderBy("w_start", "event_type")),

    // X21: sliding 1-hour window, 15-minute slide (each event lands in 4
    // windows; the oracle materializes the 4 shifted 15-min buckets).
    Query("x21_sliding_window",
      Some("""SELECT w_start, event_type, count(*) AS n,
             |  round(sum(value), 4) AS sum_v
             |FROM (
             |  SELECT time_bucket(INTERVAL '15 minutes', ts)
             |           - k.k * INTERVAL '15 minutes' AS w_start,
             |         event_type, value
             |  FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS k(k))
             |GROUP BY w_start, event_type
             |ORDER BY w_start, event_type""".stripMargin),
      env => env.events
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_v"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_v"))
        .orderBy("w_start", "event_type")),

    // X22: session windows (30-minute gap) per user. Spark session_window
    // end = last event + gap; the oracle rebuilds sessions with the
    // classic lag + cumulative-sum-of-new-session-flags formulation.
    Query("x22_session_window",
      Some("""WITH s AS (
             |  SELECT user_id, event_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_id, ts, CASE WHEN prev_ts IS NULL
             |    OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM s),
             |g AS (
             |  SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM f)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n
             |FROM g GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin),
      env => env.events
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n"))
        .orderBy("user_id", "session_start")),

    // X22b: the STATEFUL sessionization (flatMapGroupsWithState's
    // gap-merge fold), run in batch over each user's full history so the
    // state logic itself is oracle-checked — the streaming-only behaviors
    // (watermark drop, timeout emission) stay pinned by StreamOpsSpec.
    // session_end here is the LAST EVENT time (what the stateful op
    // tracks), not last+gap as session_window reports in x22.
    Query("x22b_sessionize_state",
      Some("""WITH s AS (
             |  SELECT user_id, event_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_id, ts, CASE WHEN prev_ts IS NULL
             |    OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM s),
             |g AS (
             |  SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM f)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) AS session_end, count(*) AS n
             |FROM g GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin),
      env => {
        import graft.streaming.StreamOps
        val spark = env.spark
        import spark.implicits._
        val ds = env.events.select(col("user_id"), col("ts"))
          .as[StreamOps.SessionEvent]
        StreamOps.sessionizeBatch(30L * 60L * 1000L)(ds)
          .toDF()
          .orderBy("user_id", "session_start")
      }),

    // X24: stateful dedup, batch analog — first event per (user, type).
    Query("x24_dedup_first",
      Some("""SELECT user_id, event_type, event_id, ts FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
             |  ORDER BY ts, event_id) = 1
             |ORDER BY user_id, event_type""".stripMargin),
      env => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        env.events.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      }),

    // X10 (reference dags/include/utils.py:255-304): per-class Gaussian KDE
    // of event value, Scott bandwidth, fixed evaluation grid.
    Query("x10_kde",
      Some("""WITH stats AS (
             |  SELECT event_type, count(*) AS n, stddev_samp(value) AS sd
             |  FROM events GROUP BY event_type
             |  HAVING stddev_samp(value) IS NOT NULL AND stddev_samp(value) > 0),
             |grid AS (SELECT 25.0 * i AS x FROM UNNEST(range(14)) t(i)),
             |pts AS (
             |  SELECT e.event_type, g.x, e.value, s.n,
             |         s.sd * power(s.n, -0.2) AS h
             |  FROM events e JOIN stats s USING (event_type) CROSS JOIN grid g)
             |SELECT event_type, x,
             |  round(sum(exp(-0.5 * pow((x - value) / h, 2)))
             |        / (any_value(n) * any_value(h) * sqrt(2 * pi())), 6) AS density
             |FROM pts GROUP BY event_type, x
             |ORDER BY event_type, x""".stripMargin),
      env => graft.ops.KdeOps.kdeByClass("event_type", "value",
          (0 until 14).map(_ * 25.0))(env.events)
        .orderBy("event_type", "x"))
      ,

    // X115: time-weighted average per user — each value holds until the
    // next event (step interpolation), so TWA = Σ v·Δt / Σ Δt over the
    // user's timeline: the canonical irregular-time-series aggregate
    // (sensor/position/price data). One user_id window shuffle (lead),
    // µs-integer interval arithmetic (exact, cross-engine), DECIMAL
    // numerator (order-free), and ONE double division at the end —
    // the x107 quotient discipline.
    Query("x115_time_weighted_avg",
      Some("""WITH o AS (SELECT user_id, value,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
             |      PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS t_next
             |  FROM events)
             |SELECT user_id, count(*) AS n_intervals,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,4)) * (t_next - t))
             |        AS DOUBLE)
             |    / CAST(sum(t_next - t) AS DOUBLE), 6) AS twa
             |FROM o WHERE t_next IS NOT NULL
             |GROUP BY user_id HAVING sum(t_next - t) > 0
             |ORDER BY user_id""".stripMargin),
      env => SequencePlans.timeWeightedAvg(env.events)),

    // X117: truncated adjusted EWMA (α=1/2, K=10) of `value` per user in
    // event-time order — the decay feature column (pandas ewm
    // adjust=True, truncated; see TimeSeriesOps). The oracle embeds the
    // SAME exact-decimal weight literals in the SAME left-associated
    // chain, so both engines execute an identical IEEE operation
    // sequence and the raw doubles hash-match with NO rounding — dyadic
    // α makes every weight an exact binary double.
    Query("x117_ewma",
      Some {
        val ws = graft.ops.TimeSeriesOps.ewmaWeightSql(0.5, 10)
        val num = ws.zipWithIndex.map { case (w, d) =>
          if (d == 0) s"coalesce(value * $w, 0)"
          else s"coalesce(lag(value, $d) OVER w * $w, 0)"
        }.mkString(" + ")
        val den = ws.zipWithIndex.map { case (w, d) =>
          if (d == 0) s"CASE WHEN value IS NOT NULL THEN $w ELSE 0 END"
          else s"CASE WHEN lag(value, $d) OVER w IS NOT NULL THEN $w ELSE 0 END"
        }.mkString(" + ")
        s"""SELECT event_id, user_id, value,
           |  ($num) / ($den) AS ewma
           |FROM events
           |WINDOW w AS (PARTITION BY user_id
           |             ORDER BY CAST(ts AS TIMESTAMP), event_id)
           |ORDER BY event_id""".stripMargin
      },
      env => graft.ops.TimeSeriesOps.ewmaAdjusted(env.events,
          "user_id", Seq(col("ts"), col("event_id")), "value",
          alpha = 0.5, k = 10)
        .select("event_id", "user_id", "value", "ewma")
        .orderBy("event_id")),

    // X117b contract: the STREAMING exact recurrence (StreamOps.ewmaBatch,
    // the batch run of the O(1)-state fold) agrees with x117's truncated
    // window formulation within the analytic tail bound — the dropped
    // weight past K=10 lags is β^(K+1)/(1-β) < 0.2% of the value scale.
    // An oracle-checked band (the x7/x31b discipline): if either
    // formulation's arithmetic, ordering, or state logic drifts, the gap
    // blows past the band and the driver hash catches it corpus-wide.
    Query("x117b_ewma_parity",
      Some("SELECT true AS within_band, true AS nonvacuous"),
      env => {
        import env.spark.implicits._
        import graft.streaming.StreamOps
        val ev = env.events
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .as[StreamOps.EwmaEvent]
        val exact = StreamOps.ewmaBatch(0.5)(ev).toDF()
          .select(col("event_id"), col("ewma").as("y_exact"))
        val trunc = graft.ops.TimeSeriesOps.ewmaAdjusted(env.events,
            "user_id", Seq(col("ts"), col("event_id")), "value", 0.5, 10)
          .select(col("event_id"), col("value"), col("ewma").as("y_trunc"))
        exact.join(trunc, "event_id")
          .agg(max(abs(col("y_exact") - col("y_trunc"))).as("d"),
            max(abs(col("value"))).as("m"),
            count(lit(1)).as("n"))
          .select((col("d") <= col("m") * 0.005).as("within_band"),
            (col("n") > lit(0L)).as("nonvacuous"))
      })
  )
}
