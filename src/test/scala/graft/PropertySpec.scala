package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.RelOps

/** Property-based layer (SURVEY §5.2 layer 3) for invariants no SQL oracle
  * can check: idempotency, sample bounds, approx-distinct error, windowed
  * ranking invariants. Generators sample with a fixed seed — deterministic
  * across runs (SURVEY §7.4 non-determinism caveat). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic scalacheck sampling (no forAll runner dependency). */
  def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  lazy val orders = env.orders.cache()

  test("W10/S6: keyed append is idempotent — applying twice equals once") {
    samples(Gen.choose(2L, 7L), 5).distinct.foreach { mod =>
      val existing = orders.filter($"o_orderkey" % mod === 0)
      val incoming = orders.filter($"o_totalprice" > 200000)
      val once = RelOps.newRowsOnly(existing, "o_orderkey")(incoming)
      // append `once` to existing, then re-offer the same incoming batch
      val after = existing.unionByName(once)
      val twice = RelOps.newRowsOnly(after, "o_orderkey")(incoming)
      assert(twice.count() === 0L)
    }
  }

  test("S6: appended keys are disjoint from existing and unique") {
    val existing = orders.filter($"o_orderkey" % 3 === 0)
    val fresh = RelOps.newRowsOnly(existing, "o_orderkey")(orders)
    assert(fresh.join(existing, Seq("o_orderkey"), "left_semi").count() === 0)
    assert(fresh.select("o_orderkey").distinct().count() === fresh.count())
  }

  test("S4: seeded sample count stays within binomial bounds") {
    samples(Gen.choose(0.2, 0.8), 5).foreach { frac =>
      val n = orders.count().toDouble
      val got = graft.ops.WineOps.sampleFraction(frac, 1)(orders).count().toDouble
      val sd = math.sqrt(n * frac * (1 - frac))
      assert(math.abs(got - n * frac) < 6 * sd + 1,
        s"sample $got far from ${n * frac} (frac=$frac)")
    }
  }

  test("X7: approx_count_distinct lands within the configured rsd") {
    val exact = orders.select(countDistinct("o_custkey")).as[Long].head().toDouble
    val approx = orders.select(approx_count_distinct("o_custkey", 0.05))
      .as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact < 0.15,
      s"approx $approx vs exact $exact beyond 3x rsd")
  }

  test("X7b: percentile_approx lands within epsilon-rank of the exact median") {
    // GK sketch guarantee: result is a value whose rank is within ε·n of
    // the target rank (ε = 1/accuracy = 1/1000 here)
    val exact = orders.select(
      percentile(col("o_totalprice"), lit(0.5))).as[Double].head()
    val approx = orders.select(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .as[Double].head()
    val n = orders.count()
    val eps = math.ceil(n / 1000.0).toLong + 1
    val rankBelow = orders.filter(col("o_totalprice") <= approx).count()
    assert(math.abs(rankBelow - n / 2) <= 2 * eps,
      s"approx median $approx (rank $rankBelow) too far from n/2=${n / 2}; exact $exact")
  }

  test("X7c: count-min sketch never underestimates, overestimate bounded") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val exact = env.events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.0001
    val est = graft.ops.SketchOps.cmsCounts(env.events, "event_type", types,
        eps = eps).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    types.foreach { t =>
      assert(est(t) >= exact(t), s"CMS underestimated $t: ${est(t)} < ${exact(t)}")
      assert(est(t) <= exact(t) + (eps * n).toLong + 1,
        s"CMS overestimate out of bound for $t: ${est(t)} vs ${exact(t)} (N=$n)")
    }
  }

  test("X7d: daily-HLL-union rollup estimates match exact distinct within 5%") {
    val est = SparkEntry.queries("x64_hll_rollup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05,
        s"HLL union estimate off >5% for $k: ${est(k)} vs exact $n")
    }
  }

  test("S4b: stratifiedSample respects per-stratum fractions within bounds") {
    val fracs = Map[Any, Double]("1-URGENT" -> 0.5, "2-HIGH" -> 0.1)
    val sampled = graft.ops.RelOps.stratifiedSample(
      "o_orderpriority", fracs, seed = 7)(orders)
    val got = sampled.groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    // only listed strata survive
    assert(got.keySet.subsetOf(fracs.keySet.map(_.toString)))
    fracs.foreach { case (k, f) =>
      val n = orders.filter(col("o_orderpriority") === k.toString).count().toDouble
      val kept = got.getOrElse(k.toString, 0L).toDouble
      val sd = math.sqrt(n * f * (1 - f))
      assert(math.abs(kept - n * f) < 6 * sd + 1,
        s"stratum $k kept $kept, expected ~${n * f}")
    }
    // seeded determinism: same seed → identical row SET, not just count
    val again = graft.ops.RelOps.stratifiedSample(
      "o_orderpriority", fracs, seed = 7)(orders)
    assert(sampled.select("o_orderkey").except(again.select("o_orderkey"))
      .count() === 0)
    assert(again.select("o_orderkey").except(sampled.select("o_orderkey"))
      .count() === 0)
  }

  test("X5: topNPerGroup emits <= n rows per group, ranks contiguous from 1") {
    samples(Gen.choose(1, 5), 3).distinct.foreach { n =>
      val top = RelOps.topNPerGroup(n, Seq("o_custkey"),
        Seq(desc("o_totalprice"), col("o_orderkey")))(orders)
      val byGroup = top.groupBy("o_custkey")
        .agg(count(lit(1)).as("c"), max("rn").as("mx"), min("rn").as("mn"))
      assert(byGroup.filter($"c" > n).count() === 0)
      assert(byGroup.filter($"mn" =!= 1 || $"mx" =!= $"c").count() === 0)
    }
  }

  test("X8: unionByNameLoose preserves row counts and null-fills gaps") {
    val a = orders.select($"o_orderkey".as("key"), $"o_totalprice".as("price"))
    val b = env.customer.select($"c_custkey".as("key"), $"c_name".as("name"))
    val u = RelOps.unionByNameLoose(b)(a)
    assert(u.count() === a.count() + b.count())
    assert(u.filter($"price".isNull).count() === b.count())
    assert(u.filter($"name".isNull).count() === a.count())
  }

  test("asOfJoinMerge ≡ range-join+window as-of formulation") {
    val purchases = env.events.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = env.events.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val merge = RelOps.asOfJoinMerge(purchases, clicks,
        "user_id", "event_id", "ts", "ts", "event_id")
      .select($"event_id", $"asof_id", $"asof_ts")
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    val joinWin = RelOps.asOfJoin(purchases, clicks,
        "user_id", "event_id", "ts", "ts", "event_id")
      .select(col("l.event_id"), col("r.event_id"), col("r.ts"))
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    assert(merge === joinWin)
    assert(merge.nonEmpty)
  }

  test("salted join ≡ plain join (row multiset), spreads hot keys") {
    val li = env.lineitem.select("l_orderkey", "l_quantity")
    val o = env.orders.select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"), "inner")
    val salted = RelOps.saltedJoin(li, o, "l_orderkey", salt = 8)
    assert(salted.count() === plain.count())
    // same multiset of rows: compare per-key aggregates
    val a = plain.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity" * $"o_totalprice"), 4).as("s"))
    val b = salted.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity" * $"o_totalprice"), 4).as("s"))
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("X94: weightedSample biases toward heavy rows, is deterministic, " +
      "and plans a TakeOrderedAndProject (no global sort)") {
    import org.apache.spark.sql.functions._
    import graft.ops.RelOps
    val base = env.orders.select("o_orderkey", "o_totalprice")
    val sample = RelOps.weightedSample(200, "o_orderkey",
      col("o_totalprice"))(base)
    // inclusion prob ∝ price → the sampled mean price must sit clearly
    // above the population mean (E[w·p]/E[p] > E[p]); 1.1× is far below
    // the expected lift but far above noise for n=200
    val popMean = base.agg(avg("o_totalprice")).head.getDouble(0)
    val samMean = sample.agg(avg("o_totalprice")).head.getDouble(0)
    assert(samMean > 1.1 * popMean,
      s"no weight bias: sample mean $samMean vs population $popMean")
    // rerun → identical selection (hash-uniform, not rand())
    val a = sample.select("o_orderkey").as[Long].collect().sorted.toSeq
    val b = RelOps.weightedSample(200, "o_orderkey",
        col("o_totalprice"))(base)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(a === b && a.size === 200)
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort?\n$plan")
  }

  test("W9: TaskGroup namespaces stages and intra-group deps only") {
    import graft.flow.{Pipeline, TaskGroup}
    import graft.flow.Pipeline._
    val grouped = TaskGroup("ml", Seq(
      Stage("prep", deps = Seq("outside"), fn = _ => 1),
      Stage("train", deps = Seq("prep"), fn = _ => 2)))
    assert(grouped.map(_.name) === Seq("ml.prep", "ml.train"))
    assert(grouped(1).deps === Seq("ml.prep"))
    assert(grouped(0).deps === Seq("outside"))
    val p = new Pipeline("g", Stage("outside", fn = _ => 0) +: grouped)
    assert(p.run().succeeded("ml.train"))
  }

  test("X69: DSIR scores lift the target domain, and the hashed-bucket " +
    "feature space agrees with the exact vocabulary") {
    import graft.ops.TextOps
    val docs = env.documents
    val raw = TextOps.dsirScores(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .cache()
    // the premise of importance resampling: in-domain docs must score
    // higher ON AVERAGE than out-of-domain docs under the target weights
    val Seq(enMean, otherMean) = raw
      .groupBy((col("lang") === "en").as("tgt"))
      .agg(avg("dsir_score").as("m"))
      .orderBy(desc("tgt")).select("m").as[Double].collect().toSeq
    assert(enMean > otherMean,
      s"target lift violated: en $enMean <= other $otherMean")
    // hashed features (the 100 TB path) must reproduce the exact-vocab
    // selection almost verbatim at low collision load
    def top20(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .orderBy(desc("dsir_score"), col("doc_id"))
      .limit(20).select("doc_id").as[Long].collect().toSeq
    val exactTop = top20(raw)
    val hashedTop = top20(TextOps.dsirScores(docs, "doc_id", "text",
      isTarget = col("lang") === "en", nBuckets = 1 << 16))
    val overlap = exactTop.toSet.intersect(hashedTop.toSet).size
    assert(overlap >= 16, s"hashed top-20 overlap only $overlap/20")
    raw.unpersist()
  }

  test("X77: BPE merge learning reproduces the classic reference run " +
    "and applyMerges segments unseen words with the learned table") {
    import graft.ops.BpeOps
    // Sennrich et al.'s canonical corpus (no end-of-word marker)
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = BpeOps.learnMerges(wc, nMerges = 5)
    assert(merges === Seq(
      (1, "e", "s", 9L),   // newest(6) + widest(3); tie with (s,t) -> lex
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),   // low(5) + lower(2); tie with (o,w) -> lex
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)))  // 3-way tie at 6 -> (e,w) lexicographically
    // inference side: the learned table segments a word NOT in training
    val seg = Seq("lowest").toDF("w")
      .select(BpeOps.applyMerges(col("w"),
        merges.map(m => (m._2, m._3))).as("sym"))
      .as[Seq[String]].head()
    assert(seg === Seq("low", "est"))
    // leftmost-first merge order: "aaa" under (a,a) -> [aa, a]
    val aaa = Seq("aaa").toDF("w")
      .select(BpeOps.applyMerges(col("w"), Seq(("a", "a"))).as("sym"))
      .as[Seq[String]].head()
    assert(aaa === Seq("aa", "a"))
    // early exhaustion: single-char vocab has no pairs -> empty table
    assert(BpeOps.learnMerges(Seq(("a", 3L)).toDF("word", "freq"), 4).isEmpty)
  }

  test("X77b: encodeVocab segments each distinct word once, round-trips, " +
    "and agrees with direct applyMerges") {
    import graft.ops.BpeOps
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = BpeOps.learnMerges(wc, nMerges = 5).map(m => (m._2, m._3))
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "newest widest lowest low"),   // "lowest" unseen in training
      (3L, "low low low")                  // repeats collapse in the vocab
    ).toDF("doc_id", "text")
    val enc = BpeOps.encodeVocab(docs, "text", merges)
    val rows = enc.collect().map(r => r.getAs[String]("word") ->
      (r.getAs[scala.collection.Seq[String]]("syms"), r.getAs[Int]("n_syms"),
        r.getAs[Int]("n_chars"), r.getAs[Boolean]("round_trip_ok"))).toMap
    // 5 distinct words despite 10 occurrences — vocabulary-shaped work
    assert(rows.size === 5)
    assert(rows("low")._1 === Seq("low"))
    assert(rows("lowest")._1 === Seq("low", "est"))
    assert(rows("newest")._1 === Seq("n", "ew", "est"))
    assert(rows.values.forall(_._4), "every word must round-trip")
    assert(rows.values.forall { case (syms, n, nc, _) =>
      n === syms.size && n >= 1 && n <= nc })
  }

  test("X69b: frozen DSIR weights score a batch consistently; fully " +
    "out-of-vocabulary docs produce no score row") {
    import graft.ops.TextOps
    val dir = java.nio.file.Files.createTempDirectory("dsir_w").toString
    val store = new graft.sources.TableStore(spark, dir)
    val corpus = Seq(
      (1L, "alpha beta gamma", true), (2L, "alpha beta", true),
      (3L, "delta epsilon", false), (4L, "delta delta zeta", false))
      .toDF("doc_id", "text", "tgt")
    TextOps.buildDsirWeights(store, "w", corpus, "doc_id", "text", $"tgt")
    val batch = Seq(
      (10L, "alpha beta"),          // target-like -> positive score
      (11L, "delta zeta"),          // raw-like -> negative score
      (12L, "omicron sigma tau"))   // fully OOV -> no row
      .toDF("doc_id", "text")
    val scores = TextOps.scoreDsirBatch(store, "w", batch, "doc_id", "text")
      .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    assert(scores.keySet === Set(10L, 11L))
    assert(scores(10L) > 0 && scores(11L) < 0,
      s"expected target-like positive / raw-like negative, got $scores")
    // partial OOV: unseen words are neutral — same score as without them
    val part = TextOps.scoreDsirBatch(store, "w",
        Seq((20L, "alpha beta omicron unknownword")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("dsir_score").as[Double].head()
    assert(math.abs(part - scores(10L)) < 1e-12)
  }
}
