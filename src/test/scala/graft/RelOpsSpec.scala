package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.RelOps

/** Pins the distributed rank/prefix-sum operators to their single-partition
  * window equivalents — the semantics are classic SQL; the point of the
  * RelOps versions is the multi-partition plan shape.
  */
class RelOpsSpec extends SparkSpec {

  import spark.implicits._

  test("globalCumSum equals a single-partition running-total window") {
    // ragged values incl. zeros; 37 partitions to force many range splits
    val df = spark.range(0, 5000).select(col("id"),
        (pmod(col("id") * 2654435761L, lit(97))).as("v"))
      .repartition(37)
    val got = RelOps.globalCumSum(df, Seq(col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(want))
    assert(got.last._2 == df.agg(sum("v")).as[Long].head())
  }

  test("globalCumSum handles null values as zero-contribution rows") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)), (4L, None))
      .toDF("id", "v").repartition(3)
    val got = RelOps.globalCumSum(df, Seq(col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(5L, 5L, 12L, 12L))
  }

  test("globalCumSum refuses a colliding output column") {
    val df = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      RelOps.globalCumSum(df, Seq(col("id")), "v", "v")
    }
  }

  test("globalRowNumber refuses a colliding output column") {
    val df = Seq((1L, 2L)).toDF("id", "rn")
    intercept[IllegalArgumentException] {
      RelOps.globalRowNumber(df, Seq(col("id")))
    }
  }

  test("as-of join tie rules: same-time inclusion, per-direction id ties, " +
      "backward preferred on equal gaps") {
    // crafted ties the generated events data never produces (no same-user
    // same-µs collisions there), so these documented rules would otherwise
    // be exercised by nothing
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val rights = Seq(
      (10L, 1L, ts("10:00")), (11L, 1L, ts("10:00")), // same-ts tie
      (20L, 1L, ts("10:04")))
      .toDF("event_id", "user_id", "ts")
    val lefts = Seq(
      (1L, 1L, ts("10:00")), // same ts as two rights
      (2L, 1L, ts("10:02")), // exactly between 10:00 and 10:04
      (3L, 1L, ts("10:07")), // only a preceding right
      (4L, 1L, ts("09:00"))) // only following rights (same-ts pair)
      .toDF("event_id", "user_id", "ts")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, String, String) => org.apache.spark.sql.DataFrame) =
      f(lefts, rights, "user_id", "event_id", "ts", "ts", "event_id")
        .select("event_id", "asof_id").as[(Long, Long)].collect().toMap
    // backward: same-ts rights INCLUDED, ties to LARGEST id; no-match drops
    assert(run(RelOps.asOfJoinMerge) ===
      Map(1L -> 11L, 2L -> 11L, 3L -> 20L))
    // forward: same-ts rights INCLUDED, ties to SMALLEST id
    assert(run(RelOps.asOfJoinMergeForward) ===
      Map(1L -> 10L, 2L -> 20L, 4L -> 10L))
    // nearest: gap 0 via the backward side (its tie rule), EQUAL gaps
    // (left 2: 120 s both ways) prefer backward, single-sided lefts take
    // whichever side exists
    assert(run(RelOps.asOfJoinMergeNearest) ===
      Map(1L -> 11L, 2L -> 11L, 3L -> 20L, 4L -> 10L))
  }

  test("X127: pitJoin picks the version effective at fact time — boundary " +
    "inclusive on valid_from, facts before the first version drop") {
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val dim = Seq(
      (1L, t("2024-01-01"), 10.0, 1L),
      (1L, t("2024-02-01"), 20.0, 2L),
      (1L, t("2024-03-01"), 30.0, 3L),
      (2L, t("2024-06-01"), 99.0, 1L)
    ).toDF("k", "valid_from", "price", "version")
    val facts = Seq(
      (100L, 1L, t("2024-01-15")),  // inside v1
      (101L, 1L, t("2024-02-01")),  // ON the v2 boundary → v2 (inclusive)
      (102L, 1L, t("2024-12-31")),  // after last version → open-ended v3
      (103L, 1L, t("2023-12-31")),  // before first version → drops
      (104L, 2L, t("2024-07-01")),  // other key
      (105L, 3L, t("2024-07-01"))   // key with no versions → drops
    ).toDF("fact_id", "k", "ts")
    val got = RelOps.pitJoin(facts, dim, "k", "ts", "valid_from",
        Seq("price", "version"))
      .select("fact_id", "price", "version")
      .as[(Long, Double, Long)].collect().toSet
    assert(got === Set((100L, 10.0, 1L), (101L, 20.0, 2L),
      (102L, 30.0, 3L), (104L, 99.0, 1L)))
    // parity with the textbook BETWEEN interval join over tiled intervals
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("valid_from")
    val tiled = dim.withColumn("valid_to",
      coalesce(lead("valid_from", 1).over(w),
        lit(t("2200-01-01"))))
    val between = facts.join(tiled,
        facts("k") === tiled("k") && facts("ts") >= tiled("valid_from") &&
          facts("ts") < tiled("valid_to"))
      .select("fact_id", "price", "version")
      .as[(Long, Double, Long)].collect().toSet
    assert(between === got)
  }

  test("X78: bloomSemiJoin is bit-identical to the plain semi-join") {
    val fact = env.lineitem.select("l_orderkey", "l_linenumber")
    val dim = env.orders.filter($"o_orderpriority" === "1-URGENT")
    val bloomed = RelOps.bloomSemiJoin(fact, dim, "l_orderkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    val plain = fact
      .join(dim, $"l_orderkey" === $"o_orderkey", "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(plain.nonEmpty)
    assert(bloomed === plain)
  }

  test("X78b: BloomMightContain — nulls, no false negatives, codegen plan") {
    import graft.functions.BloomMightContain
    val dim = spark.range(0, 1000).toDF("k")
    val bf = dim.stat.bloomFilter(xxhash64($"k"), 10000L, 0.01)
    BloomMightContain.register(spark)
    val probe = spark.range(0, 2000).toDF("k")
      .withColumn("k", when($"k" === 1999, lit(null)).otherwise($"k"))
      .withColumn("pass",
        BloomMightContain.bloom_might_contain(xxhash64($"k"), bf))
    val rows = probe.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0),
       if (r.isNullAt(1)) null else java.lang.Boolean.valueOf(r.getBoolean(1))))
    // xxhash64 hashes NULL to a non-null long, so the probe stays non-null
    // (semi-join equality still rejects the row; exactness is the
    // recheck's job) — pin that the expression itself never throws on the
    // null-bearing input and every true key passes (no false negatives)
    assert(rows.length === 2000)
    val trueKeys = rows.filter(t => t._1 >= 0 && t._1 < 1000)
    assert(trueKeys.forall(_._2 == java.lang.Boolean.TRUE))
    // fpp band: ~1% nominal on the 999 non-member longs
    val fps = rows.count(t => t._1 >= 1000 && t._2 == java.lang.Boolean.TRUE)
    assert(fps <= 30, s"observed $fps false positives of 999 at fpp=0.01")
    // the probe must run inside whole-stage codegen as a scan-side filter:
    // the executed plan shows `*(n) Filter bloommightcontain(...)` pushed
    // below the projection (Catalyst treats the expression as an ordinary
    // deterministic predicate, so filter pushdown applies to it)
    val planStr = probe.filter($"pass").queryExecution.executedPlan.toString
    assert(planStr.contains("Filter bloommightcontain"))
    assert(planStr.linesIterator.exists(l =>
      l.contains("bloommightcontain") && l.trim.startsWith("+- *")))
  }
}
