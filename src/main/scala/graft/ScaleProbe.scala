package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan fact-table scale-up probe: replicates lineitem/orders/customer
  * N× with remapped keys (dims stay fixed — dimensions grow slower than
  * facts in a real warehouse) and times representative heavy shapes.
  * This is the methodology behind the scale tables in ROUND_NOTES.md:
  * it answers "does the per-row work scale linearly once the fixed
  * planning/shuffle-setup constants amortize?" without needing a larger
  * generated dataset.
  *
  * Usage: scripts/run.sh graft.ScaleProbe [sfDir] [factors...]
  * e.g.   SPARK_GRAFT_CPUS=32 scripts/run.sh graft.ScaleProbe \
  *          /root/testdata/sf0.1 1 10 30
  */
object ScaleProbe {

  /** Replicate df `factor`× in-plan, striding each key column so the
    * copies don't collide (keeps join fan-outs realistic). */
  def scaled(df: DataFrame, factor: Int, keyStrides: Map[String, Long]): DataFrame =
    if (factor == 1) df
    else {
      val rep = df.withColumn("__i", explode(sequence(lit(0L), lit(factor - 1L))))
      keyStrides.foldLeft(rep) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + col("__i") * stride)
      }.drop("__i")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numeric = args.drop(1).filter(a => a.nonEmpty && a.forall(_.isDigit))
    val factors = if (numeric.nonEmpty) numeric.map(_.toInt).toSeq else Seq(1, 10, 30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val env = Env(spark, sfDir)
    env.lineitem.limit(100).count() // warm session

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // the probe measures the SHIPPED formulations — plans come from
    // graft.queries.TpchPlans, parameterized on the scaled fact frames
    import graft.queries.TpchPlans

    // naive Q13 (outer join moves one row per ORDER) kept as the contrast
    // case for the shipped pre-aggregated formulation below
    def q13naive(ord: DataFrame, cust: DataFrame): Long =
      cust.join(ord.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist")).count()

    // Skew probe: a join where one hot customer owns ~half the fact rows.
    // AQE's skew-join splitting (on by default) carves the hot partition
    // into parallel splits; RelOps.saltedJoin is the manual fallback.
    // Run once at the largest factor.
    def qskew(f: Int): Unit = {
      val hotOrd = scaled(env.orders, f,
          Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
        .withColumn("o_custkey",
          when(col("o_orderkey") % 2 === 0, lit(0L)).otherwise(col("o_custkey")))
      val cust = scaled(env.customer, f, Map("c_custkey" -> 10000000L))
      def agg(j: DataFrame): Long =
        j.groupBy("c_nationkey").agg(round(sum("o_totalprice"), 4).as("s")).count()
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        time(s"skew_join_aqe ${f}x")(agg(hotOrd.join(cust,
          col("o_custkey") === col("c_custkey"))))
        time(s"skew_join_salted ${f}x")(agg(ops.RelOps.saltedJoin(
          hotOrd, cust.withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey", salt = 16)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }

    // Corpus mode (`graft.ScaleProbe <sfDir> docs`): 10× the documents
    // table as 10-copy near-dup FAMILIES (each copy appends a distinct
    // marker token, so copies stay ~0.9 Jaccard to the original) and run
    // pair-finding + connected-components clustering over the result —
    // the dedup path under genuine duplicate pressure (5k families →
    // ~225k pair edges at sf0.1), where near-dup output is inherently
    // quadratic in copies and CC has real work to do.
    if (args.contains("docs")) {
      val docs10 = env.documents.select("doc_id", "text")
        .withColumn("__i", explode(sequence(lit(0L), lit(9L))))
        .select((col("doc_id") * 100 + col("__i")).as("doc_id"),
          concat(col("text"), lit(" copymark"), col("__i")).as("text"))
      // LSH scale path: banding avoids the all-pairs shingle join
      val lshEdges = ops.SimilarityOps.minhashNearDups("doc_id", "text")(docs10)
        .select(col("id_a").as("a"), col("id_b").as("b"))
        .localCheckpoint(false)
      time("corpus10x_lsh_pairs")(lshEdges.count())
      time("corpus10x_cc_only")(
        ops.SimilarityOps.connectedComponents(lshEdges)
          .select(countDistinct("comp")).head.getLong(0))
      // exact ground-truth path: quadratic in family size by nature.
      // The driver queries' opt-in df cap (256) is oracle-generous, and at 10× corpus
      // growth the BASE corpus's common shingles (df ≈ 25 at sf0.1)
      // multiply to df ≈ 250 — still under it, so candidates from
      // common shingles grow ~df² and the default-cap run shows the
      // hot-shingle pressure building. cap=64 is the tuned-guard run:
      // common shingles leave candidate generation (families still share
      // dozens of RARE shingles, so the pair set barely moves) and the
      // runtime returns to the linear regime. This pair of numbers is
      // the df-cap knob's justification at scale.
      time("corpus10x_exact_jaccard_cap256")(
        ops.SimilarityOps.ngramJaccardPairs(docs10, "doc_id", "text",
          maxShingleDf = 256).count())
      time("corpus10x_exact_jaccard_cap64")(
        ops.SimilarityOps.ngramJaccardPairs(docs10, "doc_id", "text",
          maxShingleDf = 64).count())
      // boilerplate pressure: every doc additionally ends with the SAME
      // sentence — one shingle with df = |corpus|. Without the guard the
      // pair join alone would generate ~|corpus|²/2 candidates (1.25G
      // here — unrunnable); with it the boilerplate shingle drops out of
      // candidate generation while scores still count it via the
      // hot-set term.
      val boiler = docs10.withColumn("text",
        concat(col("text"), lit(" all rights reserved worldwide")))
      time("corpus10x_exact_jaccard_boiler_cap64")(
        ops.SimilarityOps.ngramJaccardPairs(boiler, "doc_id", "text",
          maxShingleDf = 64).count())
      spark.stop(); return
    }

    // Substring-dedup mode (`graft.ScaleProbe <sfDir> substr [factors...]`):
    // the X39 rolling-window pipeline under its two bounding regimes.
    // "alldup" replicates each doc f× VERBATIM (fresh ids) — every window
    // becomes duplicated, so hits ≈ all windows and spans cover whole
    // docs: the output-maximal regime (work is linear in input even at
    // 100% duplication because there is no pair join anywhere — the
    // census is a groupBy, hits a semi-join, spans a per-doc window).
    // "unique" mutates every copy's tokens (per-copy digit suffix via
    // regexp on word boundaries) so NO window repeats across copies —
    // f disjoint token universes, each reproducing only the base
    // corpus's natural duplication: the census-heavy regime where output
    // stays proportionally tiny. Real corpora
    // sit between the two; both must scale sublinearly for the operator
    // to hold at 100 TB.
    if (args.contains("substr")) {
      for (f <- factors) {
        val copies = env.documents.select("doc_id", "text")
          .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
        val alldup = copies
          .select((col("doc_id") * 100 + col("__i")).as("doc_id"),
            col("text"))
        // word-boundary digit injection: every token gains a per-copy
        // suffix, so windows differ across copies but counts/positions
        // keep the base corpus's shape
        val unique = copies
          .select((col("doc_id") * 100 + col("__i")).as("doc_id"),
            regexp_replace(col("text"), lit("(\\w+)"),
              concat(lit("$1c"), col("__i").cast("string"))).as("text"))
        time(s"substr_spans_alldup ${f}x")(
          ops.SimilarityOps.duplicatedSpans(alldup, "doc_id", "text")
            .agg(count(lit(1)).as("n"), sum("span_tokens").as("force"))
            .head.getLong(0))
        time(s"substr_spans_unique ${f}x")(
          ops.SimilarityOps.duplicatedSpans(unique, "doc_id", "text")
            .agg(count(lit(1)).as("n"), sum("span_tokens").as("force"))
            .head.getLong(0))
      }
      spark.stop(); return
    }

    // Train-prep mode (`graft.ScaleProbe <sfDir> trainprep [factors...]`):
    // scale the inputs of the x67/x80/x81 shapes and time them — the
    // sub-quadratic claims on sorted-neighborhood fuzzy matching and the
    // distributed prefix-sum packing are backed by these numbers
    // (ROUND_NOTES.md scale tables).
    if (args.contains("trainprep")) {
      import graft.queries.TrainPrepPlans
      for (f <- factors) {
        // part names replicated with a per-copy suffix: copies stay
        // lexicographically adjacent (worst case for neighborhood width —
        // maximum true-positive density) without being byte-identical
        val p = scaled(env.part.select("p_partkey", "p_name"), f,
            Map("p_partkey" -> 1000000000L))
          .withColumn("p_name",
            concat(col("p_name"), lit(" v"),
              (col("p_partkey") / 1000000000L).cast("int")))
        val docs = scaled(env.documents.select("doc_id", "text"), f,
          Map("doc_id" -> 1000000000L))
        // plans below come from TrainPrepPlans — the SHIPPED formulations
        // (same discipline as the TpchPlans path). Each is forced through
        // an aggregate that consumes its payload columns, so Catalyst
        // cannot column-prune the measured work (a bare count() would
        // drop e.g. the chunk_text materialization from the plan).
        time(s"x67_sn_jw_pairs ${f}x")(
          TrainPrepPlans.snJwPairs(p).count())
        time(s"x80_chunking ${f}x")(
          TrainPrepPlans.contextChunks(docs)
            .agg(count(lit(1)).as("n"),
              sum(length(col("chunk_text"))).as("chars"),
              sum(col("chunk_ntok")).as("toks"))
            .head.getLong(0))
        time(s"x81_packing_cumsum ${f}x")(
          TrainPrepPlans.tokenPacking(docs)
            .agg(count(lit(1)).as("n"),
              sum(col("pack_tokens") + col("n_docs")
                + col("first_doc") + col("last_doc")).as("force"))
            .head.getLong(0))
        // factors must measure independently: evict whatever checkpoint
        // blocks the shapes above pinned (Bench does the same per query)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Embed mode (`graft.ScaleProbe <sfDir> embed [factors...]`): scale the
    // embeddings corpus f× — each copy gets a fresh vec_id and its vector
    // ROTATED by the copy index (rotation preserves the norm and component
    // distribution, and distinct rotations of a dense vector are near-
    // orthogonal, so copies model corpus GROWTH, not duplicate inflation).
    // Labels repeat, so label blocks grow f× → the exact within-label kNN
    // (x72) does f²× pair work BY DEFINITION, while the IVF kNN join (x73,
    // nLists grown ~sqrt(N) per its scaladoc) should stay near-linear —
    // that contrast is the point of the probe. Plans come from
    // EmbeddingPlans — the same builders the shipped queries use.
    if (args.contains("embed")) {
      import graft.queries.EmbeddingPlans
      graft.functions.VecCosine.register(spark)
      for (f <- factors) {
        val emb = env.embeddings
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double")).as("v0"))
          .withColumn("__i", explode(sequence(lit(0), lit(f - 1))))
          .select((col("vec_id") * 1000 + col("__i")).as("vec_id"),
            col("label"),
            transform(sequence(lit(0), lit(63)),
              j => element_at(col("v0"), pmod(j + col("__i"), lit(64)) + 1))
              .as("v"))
        val nLists = math.max(16, 16 * math.sqrt(f.toDouble).round.toInt)
        time(s"x72_exact_label_knn ${f}x")(
          EmbeddingPlans.labelKnn(emb, k = 3)
            .agg(count(lit(1)).as("n"), sum("cos_sim").as("force"))
            .head.getLong(0))
        time(s"x73_ivf_knn_join ${f}x nLists=$nLists")(
          EmbeddingPlans.ivfKnnJoin(emb, k = 5, nLists = nLists, nProbe = 6)
            .agg(count(lit(1)).as("n"), sum("cos_sim").as("force"))
            .head.getLong(0))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Time-series/novelty mode (`graft.ScaleProbe <sfDir> tseries
    // [factors...]`): the round-10 session additions under growth.
    //  - EWMA: f× events with strided user/event ids (user-count growth,
    //    the realistic axis) — one hash exchange + sort per key
    //    partition, so time must scale ~linearly in rows.
    //  - Novelty: f× documents as near-copy families (marker token per
    //    copy) — heavy duplicate-gram pressure: each gram's hash
    //    partition carries f owners, the worst case for the window-min.
    //    Work is one gram-sized shuffle → ~linear in f.
    if (args.contains("tseries")) {
      for (f <- factors) {
        val ev = scaled(env.events.select("event_id", "user_id", "ts", "value"),
          f, Map("event_id" -> 10000000L, "user_id" -> 1000000L))
        time(s"ewma_x$f")(
          ops.TimeSeriesOps.ewmaAdjusted(ev, "user_id",
            Seq(col("ts"), col("event_id")), "value", 0.5, 10).count())
        val docsF = env.documents.select("doc_id", "text")
          .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
          .select((col("doc_id") * 1000 + col("__i")).as("doc_id"),
            concat(col("text"), lit(" nvmark"), col("__i")).as("text"))
        time(s"novelty_x$f")(
          ops.SimilarityOps.ngramNovelty(docsF, "doc_id", "text", 5).count())
        // BM25 under the same corpus growth: the token scan filters to the
        // query terms immediately, so the per-(doc,term) side is bounded
        // by matching docs — time must track the single corpus pass.
        time(s"bm25_x$f")(
          ops.RetrievalOps.bm25Scores(docsF, "doc_id", "text",
            Seq("window", "merge", "join")).count())
        // bm25Scores pins its tokenized corpus (builder-function rule);
        // sweep per factor or earlier factors' blocks distort later ones
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Retrieval/curation mode (`graft.ScaleProbe <sfDir> retrieval
    // [factors...]`): the persisted-retrieval and end-to-end shapes.
    //  - BM25 persisted index: build is the one corpus-sized job
    //    (~linear); probe reads postings FILTERED to the query terms
    //    (pushdown — cost tracks matching docs, never re-tokenizes);
    //    append of a FIXED batch against an f× index must stay ~flat —
    //    that flat line IS the O(batch) ingestion claim.
    //  - RRF: legs are result sets; fusing two f×-sized legs is two
    //    range-partition ranks + one full-outer join on ids — linear in
    //    leg size with no corpus term.
    //  - Curation pipeline (the x136 composition): per-copy-suffixed
    //    vocabulary (corpus growth, not duplicate inflation — copies
    //    can't pair with each other and the df cap stays calibrated),
    //    so pair-gen + components + fingerprint should scale ~linearly.
    if (args.contains("retrieval")) {
      import graft.sources.TableStore
      import org.apache.spark.sql.expressions.Window
      for (f <- factors) {
        // marker-suffix growth: same vocabulary, f× docs — df and
        // matching-doc counts grow with the corpus (the BM25 axis)
        val docsF = env.documents.select("doc_id", "text")
          .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
          .select((col("doc_id") * 1000 + col("__i")).as("doc_id"),
            concat(col("text"), lit(" rvmark"), col("__i")).as("text"))
          .localCheckpoint()
        val dir = java.nio.file.Files.createTempDirectory("probe_ret_")
        try {
          val store = new TableStore(spark, dir.toString)
          time(s"bm25_index_build_x$f") {
            ops.RetrievalOps.buildBm25Index(store, "bm", docsF,
              "doc_id", "text"); f.toLong
          }
          time(s"bm25_probe_x$f")(
            ops.RetrievalOps.probeBm25Index(store, "bm", "doc_id",
              Seq("window", "merge", "join")).count())
          val legA = ops.RetrievalOps.probeBm25Index(store, "bm", "doc_id",
              Seq("window", "merge", "join"))
            .select(col("doc_id"), col("bm25").as("score"))
          val legB = docsF.select(col("doc_id"),
            (pmod(xxhash64(col("doc_id")), lit(100000L)) / 100000.0)
              .as("score"))
          time(s"rrf_x$f")(
            ops.RetrievalOps.rrfFuse(Seq(legA, legB), "doc_id", "score")
              .count())
          // fixed-size batch at fresh ids against the f× index
          val batch = env.documents.select("doc_id", "text")
            .filter(col("doc_id") < 2000)
            .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
          time(s"bm25_append_fixed_x$f")(
            ops.RetrievalOps.appendBm25Batch(store, "bm", batch,
              "doc_id", "text"))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        // fresh-vocabulary growth for the pair-driven pipeline
        val docsC = env.documents.select("doc_id", "text")
          .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
          .select((col("doc_id") * 1000 + col("__i")).as("doc_id"),
            concat_ws(" ", transform(
              filter(split(lower(trim(col("text"))), "\\s+"),
                t => t =!= ""),
              t => concat(t, lit("_"), col("__i")))).as("text"))
          .localCheckpoint()
        time(s"curation_x$f") {
          val edges = ops.SimilarityOps
            .ngramJaccardPairs(docsC, "doc_id", "text", maxShingleDf = 256)
            .select(col("id_a").as("a"), col("id_b").as("b"))
          val base = ops.SimilarityOps.leakageSafeSplit(docsC, "doc_id",
            edges, Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
          val keeper = docsC
            .select(col("doc_id"),
              ops.TextOps.fingerprint(col("text")).as("h"))
            .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
            .select("doc_id", "keeper")
          // quality gate is a same-scan projection; the growing terms
          // timed here are pair-gen, components, and the keeper shuffle
          base.join(keeper, "doc_id").count()
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Components mode (`graft.ScaleProbe <sfDir> components [factors...]`):
    // x62c's ingestion claim. Persisted component state built over an
    // f×-grown pair graph (the one-time cost — grows with the corpus),
    // then a FIXED batch of edges (1k merges of existing components + 1k
    // fresh pairs) appends. From-scratch CC cost grows with f — that is
    // the per-batch clustering bill the pre-x62c curation pipeline paid —
    // while the append must stay ~flat: reduced-graph CC is O(batch
    // components) and the state contributes one broadcast-probed columnar
    // scan + a partition-pruned write, never corpus-wide pair work or
    // corpus-wide label propagation. The end-to-end block replays the
    // real ingest loop: minhash-probe a fixed doc batch for its pairs,
    // fold them into the state — the incremental replacement for
    // curation_x$f's pair-gen + from-scratch CC.
    if (args.contains("components")) {
      import graft.sources.TableStore
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_cc_")
        try {
          val store = new TableStore(spark, dir.toString)
          val n = 200000L * f
          val base = spark.range(0L, n / 2)
            .select((col("id") * 2).as("a"), (col("id") * 2 + 1).as("b"))
          time(s"cc_build_x$f")(
            ops.SimilarityOps.buildComponentsState(store, "cc", base))
          val merges = spark.range(0L, 1000L)
            .select((col("id") * 4 + 1).as("a"), (col("id") * 4 + 2).as("b"))
          val freshB = spark.range(0L, 1000L)
            .select((col("id") * 2 + 10000000000L).as("a"),
              (col("id") * 2 + 10000000001L).as("b"))
          time(s"cc_append_fixed_x$f")(
            ops.SimilarityOps.appendComponentEdges(store, "cc",
              merges.unionByName(freshB)))
          // compaction is the deliberate O(corpus) maintenance op that
          // bounds merge-on-read amplification — linear, run rarely
          time(s"cc_compact_x$f")(
            ops.SimilarityOps.compactComponentsState(store, "cc"))
          time(s"cc_scratch_x$f") {
            val all = base.unionByName(merges).unionByName(freshB)
            val c = ops.SimilarityOps.connectedComponents(all)
            val k = c.count(); ops.RelOps.releaseCheckpoint(c); k
          }
          // end-to-end ingest: fixed 2k-doc batch → minhash probe for its
          // pairs → fold into the f× component state (fresh-vocab copies,
          // the curation probe's growth regime)
          val docsC = env.documents.select("doc_id", "text")
            .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
            .select((col("doc_id") * 1000 + col("__i")).as("doc_id"),
              concat_ws(" ", transform(
                filter(split(lower(trim(col("text"))), "\\s+"),
                  t => t =!= ""),
                t => concat(t, lit("_"), col("__i")))).as("text"))
            .localCheckpoint()
          ops.SimilarityOps.buildMinhashIndex(store, "mh", docsC,
            "doc_id", "text")
          val corpusEdges = ops.SimilarityOps
            .minhashNearDups("doc_id", "text")(docsC)
            .select(col("id_a").as("a"), col("id_b").as("b"))
          ops.SimilarityOps.buildComponentsState(store, "ccd", corpusEdges)
          val batchDocs = env.documents.select("doc_id", "text")
            .filter(col("doc_id") < 2000)
            .select((col("doc_id") + 900000000L).as("doc_id"),
              concat(col("text"), lit(" fresh_batch_vocab")).as("text"))
          time(s"cc_ingest_e2e_fixed_x$f") {
            val batchPairs = ops.SimilarityOps.probeMinhashIndex(store,
                "mh", batchDocs, "doc_id", "text")
              .select(col("id_a").as("a"), col("id_b").as("b"))
            ops.SimilarityOps.appendMinhashBatch(store, "mh", batchDocs,
              "doc_id", "text")
            ops.SimilarityOps.appendComponentEdges(store, "ccd", batchPairs)
          }
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Round-14 mode (`graft.ScaleProbe <sfDir> r14 [factors...]`): the
    // four round-14 families under growth.
    //  - vcc_*: x62d versioned components — build is the ~linear floor;
    //    a FIXED 2k-edge append must stay ~flat (the x62c claim, now
    //    with the id-bucketed state: the reconciliation aggregates
    //    bucket-locally, so the append adds no state shuffle at any
    //    size); compact is the deliberate O(state) maintenance op;
    //    a time-traveled v1 read is bounded by v1's partitions.
    //  - dv_*: deletion vectors on an f×-grown keyed table (16 files
    //    fixed) — a FIXED 2k-key SCATTERED delete must stay ~flat
    //    (O(keys) sidecar, zero files rewritten); the merged read is
    //    the ~linear scan floor; the changelog of a CLUSTERED delete
    //    step is bounded by the files its key range touches (zone-
    //    pruned via the zonekey marker), NOT the table; the fold is
    //    honest O(touched files) — scattered deletes touch all.
    //  - mm_*: min/max view — init ~linear; a FIXED insert-only refresh
    //    is O(changes) + the FIXED-cardinality view rewrite (~flat).
    //  - feed_*: drainChangeFeed of ONE fixed append version — the
    //    manifest fast path reads only the appended files (~flat).
    if (args.contains("r14")) {
      import graft.sources.SnapshotStore
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_r14_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          // versioned components (mirrors the x62c `components` mode
          // numbers for the flat-append comparison)
          val n = 200000L * f
          val base = spark.range(0L, n / 2)
            .select((col("id") * 2).as("a"), (col("id") * 2 + 1).as("b"))
          time(s"vcc_build_x$f")(
            ops.SimilarityOps.buildComponentsStateVersioned(ss, "cc", base))
          val merges = spark.range(0L, 1000L)
            .select((col("id") * 4 + 1).as("a"), (col("id") * 4 + 2).as("b"))
          val freshB = spark.range(0L, 1000L)
            .select((col("id") * 2 + 10000000000L).as("a"),
              (col("id") * 2 + 10000000001L).as("b"))
          time(s"vcc_append_fixed_x$f")(
            ops.SimilarityOps.appendComponentEdgesVersioned(ss, "cc",
              merges.unionByName(freshB)))
          time(s"vcc_compact_x$f")(
            ops.SimilarityOps.compactComponentsStateVersioned(ss, "cc"))
          time(s"vcc_read_v1_x$f")(ops.SimilarityOps
            .readComponentsStateVersioned(ss, "cc", Some(1L)).count())
          ss.dropCatalogTables("cc")
          // deletion vectors
          val nk = 1000000L * f
          val keyed = spark.range(0L, nk)
            .select(col("id").as("k"), (col("id") % 97).as("c"))
          time(s"dv_keyed_commit_x$f")(
            ss.commitOverwriteKeyed("t", "k", keyed, numFiles = 16))
          val step = math.max(1L, nk / 2000L)
          time(s"dv_delete_scattered_fixed_x$f")(
            ss.commitDeleteKeys("t", spark.range(0L, nk, step)
              .select(col("id").as("k"))))                         // v2
          time(s"dv_read_merged_x$f")(ss.readCurrent("t").count())
          time(s"dv_delete_clustered_x$f")(
            ss.commitDeleteKeys("t", spark.range(0L, 2000L)
              .select(col("id").as("k"))))                         // v3
          time(s"dv_chg_clustered_x$f")(
            ss.changesBetween("t", 2L, 3L).count())
          time(s"dv_fold_x$f")(ss.compactDeleteKeys("t")._1)
          // min/max view + change feed (1000 groups fixed)
          val src = spark.range(0L, nk)
            .select((col("id") % 1000).as("g"), col("id").as("m"))
          ss.commitOverwrite("s", src)                             // v1
          time(s"mm_init_x$f") {
            graft.ops.CdcOps.refreshMinMaxView(ss, "s", "v",
              Seq("g"), "m")._1
          }
          val ck = dir.resolve("feed_ck").toString
          // consume history untimed so the timed drain sees ONE version
          graft.streaming.StreamOps.drainChangeFeed(ss, "s", ck)(
            (ch, _) => { ch.count(): Unit })
          ss.commitAppend("s", spark.range(0L, 2000L)
            .select((col("id") % 1000).as("g"),
              (col("id") + nk).as("m")))                           // v2
          time(s"mm_refresh_ins_fixed_x$f") {
            graft.ops.CdcOps.refreshMinMaxView(ss, "s", "v",
              Seq("g"), "m")._1
          }
          time(s"feed_drain_fixed_x$f") {
            var rows = 0L
            graft.streaming.StreamOps.drainChangeFeed(ss, "s", ck)(
              (ch, _) => { rows += ch.count() })
            rows
          }
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Round-14 second-wave mode (`graft.ScaleProbe <sfDir> r14b
    // [factors...]`):
    //  - opt_pack_fixed: a FIXED 10-append small-file debt packs ~flat
    //    on an f×-grown keyed table (reused files never move — the
    //    O(debt) claim of optimizeSmallFiles).
    //  - rc_local vs ck_full: reclustering a LOCAL 2-file overlap
    //    component is bounded by the component's rows (~1/8 of the
    //    table here), while compactKeyed pays the full rewrite — the
    //    gap is the O(overlap)-vs-O(table) claim.
    //  - sv_refresh_del_fixed: the stats view folds a FIXED scattered
    //    delete batch ~flat at any source size — the invertibility
    //    payoff (min/max must re-derive dirty groups for the same
    //    batch).
    //  - tk_refresh_ins_fixed: the top-k view folds a FIXED insert
    //    batch ~flat (merge-and-truncate, no source contact).
    if (args.contains("r14b")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_r14b_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val nk = 1000000L * f
          val keyed = spark.range(0L, nk)
            .select(col("id").as("k"), (col("id") % 97).as("c"))
          ss.commitOverwriteKeyed("t", "k", keyed, numFiles = 16)
          // fixed small-file debt: 10 tiny appends beyond the key range
          (1 to 10).foreach(i => ss.commitAppend("t",
            spark.range(nk + i * 1000L, nk + i * 1000L + 100L)
              .select(col("id").as("k"), lit(0L).as("c")).coalesce(1)))
          time(s"opt_pack_fixed_x$f")(
            ss.optimizeSmallFiles("t", 128L << 20, 64L << 10)._1)
          // local overlap: two straddling merges at the TOP of the key
          // space form a 2-file component; the rest stays disjoint
          val oldV = lit(null).cast("struct<c:bigint>").as("old_v")
          def insDiff(from: Long, until: Long) =
            spark.range(from, until).select(col("id").as("k"),
              lit("insert").as("change_type"), oldV,
              struct((col("id") % 97).as("c")).as("new_v"))
          def updDiff(k: Long) = spark.range(k, k + 1)
            .select(col("id").as("k"), lit("update").as("change_type"),
              oldV, struct(lit(999L).as("c")).as("new_v"))
          ss.commitMergeCow("t", "k",
            updDiff(nk - 1).unionByName(insDiff(nk + 20000L, nk + 20100L)))
          ss.commitMergeCow("t", "k",
            updDiff(nk * 29L / 32L)
              .unionByName(insDiff(nk + 20100L, nk + 20200L)))
          time(s"rc_local_x$f")(ss.optimizeClustering("t")._1)
          time(s"ck_full_x$f")(ss.compactKeyed("t", "k", numFiles = 16))
          // invertible stats view under fixed scattered deletes
          val src = spark.range(0L, nk).select(col("id").as("k"),
            (col("id") % 1000).as("g"), col("id").as("m"))
          ss.commitOverwriteKeyed("s", "k", src, numFiles = 16)
          time(s"sv_init_x$f")(
            CdcOps.refreshStatsView(ss, "s", "sv", Seq("g"), "m"))
          val step = math.max(1L, nk / 2000L)
          ss.commitDeleteKeys("s", spark.range(0L, nk, step)
            .select(col("id").as("k")))
          time(s"sv_refresh_del_fixed_x$f")(
            CdcOps.refreshStatsView(ss, "s", "sv", Seq("g"), "m"))
          // top-k view under a fixed insert batch (vector folded first —
          // appends refuse an active vector by design)
          ss.compactDeleteKeys("s")
          time(s"tk_init_x$f")(
            CdcOps.refreshTopKView(ss, "s", "tv", Seq("g"), "m", 10)._1)
          ss.commitAppend("s", spark.range(0L, 2000L)
            .select((col("id") + 2 * nk).as("k"), (col("id") % 1000).as("g"),
              (col("id") + 2 * nk).as("m")))
          time(s"tk_refresh_ins_fixed_x$f")(
            CdcOps.refreshTopKView(ss, "s", "tv", Seq("g"), "m", 10)._1)
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Hot-group top-k mode (`graft.ScaleProbe <sfDir> topkhot
    // [factors...]`): ONE group holds ~all rows (the billion-row
    // leaderboard key) — the adversarial shape for refreshTopKView's
    // build/recompute aggregation. The bounded two-phase build (per-
    // input-partition truncate, then merge) keeps every aggregation
    // buffer at O(partition's group rows) and the merge at
    // O(partitions × k) — so tkh_build must scale ~linearly (scan-
    // bound) with NO hot-group memory blowup, and tkh_recompute (the
    // hot group's max deleted → exactly that group re-derives) must
    // track the build, not explode. A one-phase collect_list would
    // buffer the entire hot group (f×1M values in ONE buffer) before
    // truncating to k=10.
    if (args.contains("topkhot")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_tkh_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val nk = 1000000L * f
          // ~99.9% of rows land in g=0; a few slivers keep the group-by
          // honest (it cannot be optimized to a global aggregate)
          val src = spark.range(0L, nk).select(col("id").as("k"),
            when(col("id") % 1000L === 0L, col("id") % 7L + 1L)
              .otherwise(0L).as("g"),
            col("id").as("m"))
          ss.commitOverwrite("t", src)
          time(s"tkh_build_x$f")(
            CdcOps.refreshTopKView(ss, "t", "v", Seq("g"), "m", 10)._1)
          // delete the hot group's MAX (id = nk−1 is in g=0: nk ≡ 0 mod
          // 1000 ⇒ nk−1 ≡ 999) — exactly ONE dirty group, whose
          // recompute re-aggregates the hot group end-to-end through
          // the same bounded path
          val target = src.filter(col("k") =!= nk - 1L)
          ss.commitMerge("t", "k",
            CdcOps.snapshotDiff(src, target, "k", Seq("g", "m"))
              .filter(col("change_type") =!= "unchanged"))
          time(s"tkh_recompute_x$f") {
            val (v, dirty) = CdcOps.refreshTopKView(
              ss, "t", "v", Seq("g"), "m", 10)
            require(dirty == 1L,
              s"the deleted max must dirty exactly g=0, got $dirty")
            v
          }
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Vector-aware merge mode (`graft.ScaleProbe <sfDir> vmerge
    // [factors...]`): X141w's cost claim — a FIXED scattered delete
    // vector (2k keys in the low 1/8 of the key space) + a FIXED CoW
    // merge (one max-key update + 100 beyond-max inserts) absorb in
    // ONE commit whose cost is O(vector-touched + merge-touched files
    // + changes), NOT O(table): on an f×-grown 32-file keyed table the
    // rewrite set stays ~5 files (the low-range slice + the max file),
    // so vm_absorb should grow only with the FIXED rewrite slice's
    // rows (~f×/8 of a 32nd... ~flat per-file bytes × fixed file
    // count), while vm_reused (printed as the row count surrogate)
    // certifies the reuse never shrinks.
    if (args.contains("vmerge")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_vm_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val nk = 1000000L * f
          val src = spark.range(0L, nk).select(col("id").as("k"),
            (col("id") % 97).as("c"))
          ss.commitOverwriteKeyed("t", "k", src, numFiles = 32)     // v1
          // fixed 2k-key scattered vector, low 1/8 of the key space
          val step = math.max(1L, nk / 8 / 2000L)
          ss.commitDeleteKeys("t",
            spark.range(0L, nk / 8, step).select(col("id").as("k"))) // v2
          val cur = ss.readCurrent("t")
          val target = cur.withColumn("c",
              when(col("k") === nk - 1L, lit(999L)).otherwise(col("c")))
            .unionByName(spark.range(nk + 1L, nk + 101L)
              .select(col("id").as("k"), lit(0L).as("c")))
          time(s"vm_absorb_x$f") {
            val (_, reused) = ss.commitMergeCow("t", "k",
              CdcOps.snapshotDiff(cur, target, "k", Seq("c"))
                .filter(col("change_type") =!= "unchanged"))
            require(reused >= 24,
              s"the absorb must reuse the untouched files, got $reused")
            require(ss.deleteKeysAt("t", 3L).isEmpty,
              "the absorb must clear the vector")
            reused.toLong
          }
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Round-15 second-wave mode (`graft.ScaleProbe <sfDir> r15b
    // [factors...]`): the clone/publish and exact-distinct cost claims.
    // X141x: cloneTable and commitFromTable are O(metadata) — cl_clone /
    // cl_publish should be FLAT at every factor; the publish-step
    // changelog reads only the branch's changed files (canonical-
    // identity cancellation), so cl_pub_changelog tracks the FIXED
    // 500-row branch change, not the f×-grown table. X142l: the view
    // build is O(state) (grows with f); a FIXED batch's refresh writes
    // O(batch) (cnt appends = batch pairs) — its only state-bound piece
    // is the 3-column columnar probe scan, so xd_refresh should grow
    // far slower than xd_build; xd_serve is O(groups), flat.
    if (args.contains("r15b")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_r15b_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val nk = 1000000L * f
          val src = spark.range(0L, nk).select(col("id").as("k"),
            (col("id") % 97).as("c"))
          ss.commitOverwriteKeyed("main", "k", src, numFiles = 32)
          time(s"cl_clone_x$f")(ss.cloneTable("dev", "main"))
          // FIXED branch change: 500 low-range deletes — one file's slice
          val cur = ss.readCurrent("dev")
          val target = cur.filter(
            !(col("k") < 1000L && col("k") % 2 === 0L))
          time(s"cl_branch_cow_x$f") {
            val (_, reused) = ss.commitMergeCow("dev", "k",
              CdcOps.snapshotDiff(cur, target, "k", Seq("c"))
                .filter(col("change_type") =!= "unchanged"))
            require(reused == 31,
              s"the fixed low-range branch change must touch ONE file, " +
                s"reused=$reused")
            reused.toLong
          }
          time(s"cl_publish_x$f")(ss.commitFromTable("main", "dev"))
          time(s"cl_pub_changelog_x$f") {
            val n = ss.changesBetween("main", 1L, 2L).count()
            require(n == 500L,
              s"the publish step must diff to the branch's 500 deletes " +
                s"(shared files cancel), got $n")
            n
          }
          // --- X142l exact-distinct: f×-grown state, FIXED batch
          val docs = spark.range(0L, nk).select(col("id").as("k"),
            (col("id") % 32).as("g"), expr("id div 4").as("u"))
          ss.commitOverwrite("t", docs)
          time(s"xd_build_x$f")(
            CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")._1)
          // fixed batch: 20k support-churn rows (existing pairs under
          // fresh keys) + 1000 births beyond the key space
          ss.commitAppend("t",
            docs.filter(col("k") < 20000L)
              .select((col("k") + nk).as("k"), col("g"), col("u"))
              .unionByName(spark.range(0L, 1000L).select(
                (col("id") + 2L * nk).as("k"), (col("id") % 32).as("g"),
                (col("id") + 10L * nk).as("u"))))
          time(s"xd_refresh_x$f") {
            val (_, moves) = CdcOps.refreshExactDistinctView(ss, "t", "v",
              Seq("g"), "u")
            require(moves == 1000L,
              s"exactly the 1000 births must transition, got $moves")
            moves
          }
          time(s"xd_serve_x$f")(
            CdcOps.exactDistinctOf(ss, "v", Seq("g")).count())
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Round-17 mode (`graft.ScaleProbe <sfDir> r17`): the driver-side
    // PLANNING-COST claim at a high file count (the one O(files)
    // surface the r16 verdict flagged as unguarded). A keyed table
    // commits at 4096 files — an order of magnitude past every spec's
    // file count — then each O(files) planning surface is timed:
    // the CoW merge's touch-set planning (which must stay O(changes)
    // in files REWRITTEN, require-pinned), clusteringDepth's endpoint
    // sweep, and the optimize no-op (per-file sizing). Finally the
    // new fence itself: a cap below the file count must refuse
    // loudly, naming the knob, committing nothing.
    if (args.contains("r17")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      val files = 4096
      val dir = java.nio.file.Files.createTempDirectory("probe_r17_")
      try {
        val ss = new SnapshotStore(spark, dir.toString)
        val src = spark.range(0L, files * 200L)
          .select(col("id").as("k"), (col("id") % 97).as("v"))
        time(s"plan_commit_f$files")(
          ss.commitOverwriteKeyed("t", "k", src, numFiles = files))
        val diff = CdcOps.snapshotDiff(ss.readCurrent("t"),
          ss.readCurrent("t").withColumn("v",
            when(col("k") < 200L, col("v") + 1000L).otherwise(col("v"))),
          "k", Seq("v")).filter(col("change_type") =!= "unchanged")
          .localCheckpoint()
        time(s"plan_depth_f$files")(ss.clusteringDepth("t", 1L).toLong)
        time(s"plan_optimize_noop_f$files")(
          ss.optimizeSmallFiles("t", targetBytes = 1L,
            smallBelowBytes = 0L)._2.toLong)
        time(s"plan_cow_merge_f$files") {
          val (_, reused) = ss.commitMergeCow("t", "k", diff)
          require(reused >= files - 8,
            s"the touch set must stay O(changes): reused $reused of $files")
          reused.toLong
        }
        spark.conf.set("spark.graft.maxPlannedFiles", "1024")
        try {
          val refusal =
            try { ss.commitMergeCow("t", "k", diff); None }
            catch { case e: IllegalArgumentException => Some(e) }
          require(refusal.exists(_.getMessage.contains("maxPlannedFiles")),
            s"the planning fence must fire at 4096 > cap 1024: $refusal")
          println(s"GUARD plan_cap_f$files: loud refusal, nothing committed")
        } finally spark.conf.unset("spark.graft.maxPlannedFiles")
        graft.ops.RelOps.releaseCheckpoint(diff)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(dir.toFile)
      spark.stop(); return
    }

    // Round-18 mode (`graft.ScaleProbe <sfDir> r18`): the predicate-
    // mutation DISCOVERY cost claim at a high file count — the r17
    // verdict's X144 weak grade was exactly this plan ("the discovery
    // scan reads the whole table"). A keyed+bloomed table commits at
    // 4096 files, then: (a) zone-pruned discovery for a ~1% retention
    // cut names its candidates WITHOUT opening the other ~99% (count
    // require-pinned, wall timed); (b) the bloom point path prunes an
    // absent-id DELETE to ~zero candidates and the mutation no-ops;
    // (c) the full retention DELETE WHERE commits with reuse pinned
    // O(touched). The opaque-predicate fallback is timed for contrast.
    if (args.contains("r18")) {
      import graft.sources.SnapshotStore
      val files = 4096
      val dir = java.nio.file.Files.createTempDirectory("probe_r18_")
      try {
        val ss = new SnapshotStore(spark, dir.toString)
        ss.declareBloom("t", "v", bits = 1 << 13)
        val rows = files * 200L
        val src = spark.range(0L, rows)
          .select(col("id").as("k"), (col("id") % 100000).as("v"))
        time(s"commit_keyed_bloom_f$files")(
          ss.commitOverwriteKeyed("t", "k", src, numFiles = files))
        val cut = rows / 100 // the ~1% retention horizon
        time(s"disc_zone_pruned_f$files") {
          val (cand, skip) =
            ss.pruneFilesForPredicate("t", 1L, s"k < $cut")
          require(cand.size <= files / 50 && skip.size >= files - files / 50,
            s"a 1% cut must candidate ~1% of files: ${cand.size}")
          cand.size.toLong
        }
        time(s"disc_opaque_fallback_f$files")(
          ss.pruneFilesForPredicate("t", 1L, "k % 7 = 3")._1.size.toLong)
        time(s"disc_bloom_point_f$files") {
          val (cand, _) =
            ss.pruneFilesForPredicate("t", 1L, "v = 100001")
          require(cand.size <= files / 100,
            s"an absent bloom point must candidate ~0 files: ${cand.size}")
          cand.size.toLong
        }
        time(s"delete_where_noop_f$files") {
          val (_, r) = ss.commitDeleteWhere("t", "v = 100001")
          require(r == -1, "the absent-point delete must no-op")
          0L
        }
        time(s"delete_where_retention_f$files") {
          val (_, reused) = ss.commitDeleteWhere("t", s"k < $cut")
          require(reused >= files - files / 50,
            s"the rewrite must stay O(touched): reused $reused of $files")
          reused.toLong
        }
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(dir.toFile)
      spark.stop(); return
    }

    // Round-16 mode (`graft.ScaleProbe <sfDir> r16 [factors...]`): the
    // broadcast-gate and SCD2-compaction cost claims.
    //  - bd_refresh_auto / bd_refresh_shuffle: ONE exact-distinct
    //    refresh folding a 95% BULK DELETE of an f×-grown source — the
    //    GDPR-purge workload whose touched-pair frame is state-sized.
    //    `auto` runs the shipped size gate (broadcast below
    //    spark.graft.broadcastProbeMaxRows, shuffle fallback above);
    //    `shuffle` forces the fallback (gate=0). Both must produce the
    //    IDENTICAL view (required in-probe); neither may OOM — the
    //    pre-r16 unconditional broadcast is exactly what dies here at
    //    large f.
    //  - scd2_read_raw_rN vs scd2_read_sealed_rN: a FIXED-size
    //    dimension under N churn rounds — the raw read replays all
    //    history (rank pairing grows with N); after compactScd2View
    //    the read pairs only the open tail, so the sealed read should
    //    stay FLAT as N grows (the r15 verdict's unbounded-read gap,
    //    closed and measured).
    if (args.contains("r16")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      for (f <- factors) {
        val nk = 500000L * f
        def runRefresh(maxRows: String, label: String): Long = {
          val dir = java.nio.file.Files.createTempDirectory("probe_r16_")
          try {
            val ss = new SnapshotStore(spark, dir.toString)
            val docs = spark.range(0L, nk).select(col("id").as("k"),
              (col("id") % 32).as("g"), expr("id div 4").as("u"))
            ss.commitOverwrite("t", docs)
            CdcOps.refreshExactDistinctView(ss, "t", "v", Seq("g"), "u")
            ss.commitOverwrite("t", docs.filter(col("k") % 20 === 0L))
            spark.conf.set("spark.graft.broadcastProbeMaxRows", maxRows)
            try time(s"${label}_x$f")(
              CdcOps.refreshExactDistinctView(ss, "t", "v",
                Seq("g"), "u")._2)
            finally spark.conf.unset("spark.graft.broadcastProbeMaxRows")
            CdcOps.exactDistinctOf(ss, "v", Seq("g"))
              .agg(sum(col("n_distinct"))).head().getLong(0)
          } finally org.apache.commons.io.FileUtils
            .deleteDirectory(dir.toFile)
        }
        val a = runRefresh((1L << 22).toString, "bd_refresh_auto")
        val s = runRefresh("0", "bd_refresh_shuffle")
        require(a == s,
          s"the two probe regimes diverged: auto=$a shuffle=$s")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      // SCD2 read cost vs churn depth, fixed 100k-key dimension: each
      // round updates the same 20k keys (close+open per round), so
      // history grows linearly in rounds while content stays fixed
      for (rounds <- Seq(4, 12)) {
        val dir = java.nio.file.Files.createTempDirectory("probe_r16s_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val dim = spark.range(0L, 100000L).select(col("id").as("k"),
            (col("id") % 1000).as("attr"))
          ss.commitOverwrite("d", dim)
          CdcOps.refreshScd2View(ss, "d", "v", "k")
          for (r <- 1 to rounds) {
            val target = ss.readCurrent("d").withColumn("attr",
              when(col("k") < 20000L, col("attr") + 1L)
                .otherwise(col("attr")))
            ss.commitMerge("d", "k", CdcOps.snapshotDiff(
              ss.readCurrent("d"), target, "k", Seq("attr"))
              .filter(col("change_type") =!= "unchanged"))
            CdcOps.refreshScd2View(ss, "d", "v", "k")
          }
          time(s"scd2_read_raw_r$rounds")(
            CdcOps.scd2Of(ss, "v").count())
          time(s"scd2_compact_r$rounds")(CdcOps.compactScd2View(ss, "v"))
          time(s"scd2_read_sealed_r$rounds")(
            CdcOps.scd2Of(ss, "v").count())
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Versioned-bucketed state mode (`graft.ScaleProbe <sfDir> vstate
    // [factors...]`): x120d's layout claims under census growth.
    //  - vnv_build: writes the f× census — ~linear, the floor.
    //  - vnv_probe_fixed: FIXED 2k-doc batch against the f× census —
    //    the census side is ONE bucketed columnar scan joined with no
    //    exchange; growth is the scan, never shuffle or pair work.
    //  - vnv_append_fixed: FIXED batch folded as ONE atomic commit —
    //    must stay ~flat (registry anti-join + delta-gram bucketed
    //    partition write, O(batch) bytes regardless of census size).
    //  - vnv_probe_v1: time-traveled probe after appends — partition
    //    pruning reads ONLY the build's commit_v=1 partition, so it
    //    matches the pre-append probe cost no matter how many batches
    //    landed since.
    //  - vnv_compact: the deliberate O(census) maintenance op.
    // CDC-source / bloom / IVM mode (`graft.ScaleProbe <sfDir> vcdc
    // [factors...]`): the round-13 snapshot-layer additions under table
    // growth (orders ×f, keyed on o_orderkey; customer cardinality and
    // file count stay FIXED, so view size and probe fan-out are layout
    // properties).
    //  - keyed_commit: the f× keyed+bloomed overwrite — ~linear floor
    //    (also measures the bloom's one-extra-aggregate overhead: the
    //    same commit without a declared bloom is the `plain_commit` row).
    //  - chg_append_fixed: changelog of a FIXED 2k-row append against
    //    the f× table — must stay ~flat (manifest-derived fast path,
    //    reads ONLY the appended files).
    //  - chg_cow_fixed: changelog across a CoW merge updating a FIXED
    //    low-key slice — bounded by the REWRITTEN files (per-file rows
    //    grow ×f at fixed file count; the table is 32× bigger than what
    //    the diff reads).
    //  - ivm_init / ivm_refresh_fixed: refreshSumView full build
    //    (~linear) vs a fixed-batch incremental refresh (O(changes) +
    //    the FIXED-size view rewrite — flat).
    //  - bloom_probe_point: point lookup of 20 keys on the f× table —
    //    opens only bloom-matching files; driver prune work is
    //    O(files × probes), fixed.
    if (args.contains("vcdc")) {
      import graft.sources.SnapshotStore
      import graft.ops.CdcOps
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_vcdc_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val ord = scaled(env.orders, f, Map("o_orderkey" -> 10000000L))
            .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
              col("o_totalprice").cast("decimal(18,4)").as("p"))
            .localCheckpoint()
          time(s"plain_commit_x$f")(
            ss.commitOverwriteKeyed("plain", "k", ord, numFiles = 32))
          ss.declareBloom("t", "k")
          time(s"keyed_commit_x$f")(
            ss.commitOverwriteKeyed("t", "k", ord, numFiles = 32))
          val batch = ord.filter(col("k") < 2000)
            .select((col("k") + 900000000L).as("k"), col("cust"), col("p"))
            .localCheckpoint()
          ss.commitAppend("t", batch)
          time(s"chg_append_fixed_x$f")(ss.changesBetween("t", 1L, 2L).count())
          val lowKeys = ord.filter(col("k") < 2000)
          val repriced = lowKeys.withColumn("p",
            (col("p") + lit(new java.math.BigDecimal("1.00")))
              .cast("decimal(18,4)"))
          val diff = CdcOps.snapshotDiff(lowKeys, repriced, "k",
            Seq("cust", "p")).filter(col("change_type") =!= "unchanged")
          val v3 = ss.commitMergeCow("t", "k", diff)._1
          time(s"chg_cow_fixed_x$f")(
            ss.changesBetween("t", v3 - 1, v3).count())
          // IVM: view over the FIXED customer dimension
          ss.commitOverwrite("s", ord)
          time(s"ivm_init_x$f")(
            CdcOps.refreshSumView(ss, "s", "v", Seq("cust"), "p"))
          ss.commitAppend("s", batch)
          time(s"ivm_refresh_fixed_x$f")(
            CdcOps.refreshSumView(ss, "s", "v", Seq("cust"), "p"))
          val probes: Seq[Any] = (0L until 20L).map(i => i * 37L + 1L)
          time(s"bloom_probe_point_x$f")(
            ss.readVersionPoint("t", 1L, "k", probes).count())
          ops.RelOps.releaseCheckpoint(ord)
          ops.RelOps.releaseCheckpoint(batch)
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    if (args.contains("vstate")) {
      import graft.sources.SnapshotStore
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_vstate_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val docsC = env.documents.select("doc_id", "text")
            .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
            .select((col("doc_id") * 1000 + col("__i")).as("doc_id"),
              concat_ws(" ", transform(
                filter(split(lower(trim(col("text"))), "\\s+"),
                  t => t =!= ""),
                t => concat(t, lit("_"), col("__i")))).as("text"))
            .localCheckpoint()
          time(s"vnv_build_x$f")(
            ops.SimilarityOps.buildNoveltyIndexVersioned(ss, "nv", docsC,
              "doc_id", "text", 5))
          val batch = env.documents.select("doc_id", "text")
            .filter(col("doc_id") < 2000)
            .select((col("doc_id") + 900000000L).as("doc_id"),
              concat(col("text"), lit(" fresh_batch_vocab")).as("text"))
            .localCheckpoint()
          time(s"vnv_probe_fixed_x$f") {
            val p = ops.SimilarityOps.probeNoveltyIndexVersioned(ss, "nv",
              batch, "doc_id", "text")
            val n = p.count(); ops.RelOps.releaseCheckpoint(p); n
          }
          time(s"vnv_append_fixed_x$f")(
            ops.SimilarityOps.appendNoveltyBatchVersioned(ss, "nv", batch,
              "doc_id", "text"))
          val batch2 = batch.select((col("doc_id") + 10000000L).as("doc_id"),
            col("text"))
          ops.SimilarityOps.appendNoveltyBatchVersioned(ss, "nv", batch2,
            "doc_id", "text")
          time(s"vnv_probe_v1_x$f") {
            val p = ops.SimilarityOps.probeNoveltyIndexVersioned(ss, "nv",
              batch, "doc_id", "text", version = Some(1L))
            val n = p.count(); ops.RelOps.releaseCheckpoint(p); n
          }
          time(s"vnv_compact_x$f")(ss.compactBucketed("nv", "grams"))
          ss.dropCatalogTables("nv")
          ops.RelOps.releaseCheckpoint(docsC)
          ops.RelOps.releaseCheckpoint(batch)
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Snapshot-store mode (`graft.ScaleProbe <sfDir> snapshot
    // [factors...]`): the x141 commit layer under table growth.
    //  - commitOverwrite: writes the f× table — ~linear, the floor.
    //  - commitAppend (FIXED batch): writes only the batch + one manifest
    //    line — must stay ~flat against the f× table.
    //  - rollback: METADATA-ONLY (manifest copy + pointer swap) — must be
    //    ~constant milliseconds regardless of table size; that constant
    //    line IS the undo-story claim.
    //  - readVersion aggregate: scans the listed dirs — ~linear.
    if (args.contains("snapshot")) {
      import graft.sources.SnapshotStore
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_snap_")
        try {
          val ss = new SnapshotStore(spark, dir.toString)
          val ord = scaled(env.orders.select("o_orderkey", "o_totalprice"),
            f, Map("o_orderkey" -> 1000000000L)).localCheckpoint()
          time(s"snap_overwrite_x$f")(
            { ss.commitOverwrite("t", ord); ord.count() })
          val batch = env.orders.select("o_orderkey", "o_totalprice")
            .filter(col("o_orderkey") < 2000)
            .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
              col("o_totalprice"))
          time(s"snap_append_fixed_x$f")(
            { ss.commitAppend("t", batch); 2L })
          time(s"snap_rollback_x$f")(ss.rollback("t", 1L))
          time(s"snap_read_v2_x$f")(ss.readVersion("t", 2L).count())
          // CoW merge: keyed layout with file count growing f× while the
          // change set stays FIXED inside the base-copy key range — the
          // touched-file set is constant, so merge time must hold ~flat
          // against the f× table (the O(touched files), not O(table),
          // claim; reused files are carried by reference)
          val ordK = scaled(env.orders
              .select(col("o_orderkey").as("k"),
                col("o_totalprice").cast("decimal(18,4)").as("p")),
            f, Map("k" -> 1000000000L)).localCheckpoint()
          ss.commitOverwriteKeyed("tk", "k", ordK, numFiles = 16 * f)
          val target = ordK.filter(!(col("k") < 30000 && col("k") % 10 === 5))
            .select(col("k"), when(col("k") < 30000 && col("k") % 10 === 3,
                round(col("p") * lit(new java.math.BigDecimal("1.05")), 2))
              .otherwise(col("p")).cast("decimal(18,4)").as("p"))
          val diff = ops.CdcOps.snapshotDiff(ordK, target, "k", Seq("p"))
            .filter(col("change_type") =!= "unchanged").localCheckpoint()
          time(s"snap_cow_merge_fixed_x$f") {
            val (_, reused) = ss.commitMergeCow("tk", "k", diff)
            reused.toLong
          }
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Media mode (`graft.ScaleProbe <sfDir> media [factors...]`): the
    // multimodal dedup family under corpus growth. Fresh ids per copy →
    // fresh random payloads, so pair output stays ~0 and the measured
    // cost is the honest decode+hash scan (linear) plus the banded join
    // (near-linear — random hashes collide on a band with p ≈ 2^-13).
    if (args.contains("media")) {
      import graft.ops.MultimodalOps
      import spark.implicits._
      for (f <- factors) {
        val ids = env.documents.select("doc_id")
          .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
          .select((col("doc_id") * 1000 + col("__i")).as("doc_id"))
        val media = MultimodalOps.synthesize(ids, "doc_id")
          .as[MultimodalOps.MediaRow]
        time(s"image_neardup_x$f")(
          MultimodalOps.imageNearDups(media).count())
        time(s"audio_neardup_x$f")(
          MultimodalOps.audioNearDups(media).count())
        time(s"video_neardup_x$f")(
          MultimodalOps.videoNearDups(media).count())
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // LLM-prep mode (`graft.ScaleProbe <sfDir> llmprep [factors...]`):
    // the round-10 published-method operators under corpus growth.
    //  - SemDeDup: f× embeddings via component rotation (fresh vectors;
    //    rotation preserves within-copy cosines, so each copy carries the
    //    base corpus's natural tau-pairs — output grows linearly).
    //    nClusters scales with f so the EXPECTED CELL SIZE stays
    //    constant — the paper's regime — keeping per-row pair-join work
    //    bounded; the KMeans fit (linear passes) is the growing term.
    //  - DSIR: f× documents (fresh ids, same text) — the vocabulary is
    //    invariant under replication, so the weight table stays fixed
    //    while the tokenize/score side scales linearly.
    //  - BPE: the merge loop runs on the VOCABULARY table; corpus growth
    //    changes only the single wordCounts pass, so learn time must
    //    stay ~flat — that flatness IS the scale claim.
    if (args.contains("llmprep")) {
      graft.functions.VecCosine.register(spark)
      for (f <- factors) {
        // checkpointed: a DERIVED vector expression inlines into the
        // op-side norm fold (the assignCells scaladoc trap) — real
        // corpora read ce as a parquet attribute, so materialize to match
        val emb = env.embeddings
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v0"))
          .withColumn("__i", explode(sequence(lit(0), lit(f - 1))))
          .select((col("vec_id") * 1000 + col("__i")).as("c_id"),
            transform(sequence(lit(0), lit(63)),
              j => element_at(col("v0"), pmod(j + col("__i"), lit(64)) + 1))
              .as("ce"))
          .localCheckpoint()
        val nClusters = 10 * f
        time(s"semdedup ${f}x nClusters=$nClusters")(
          ops.SimilarityOps.semDedup(emb, nClusters, tau = 0.4,
              fitSampleRows = 20000)
            .filter(col("dropped")).count())
        val docsF = env.documents.select("doc_id", "text", "lang")
          .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
          .select((col("doc_id") * 1000 + col("__i")).as("doc_id"),
            col("text"), col("lang"))
        time(s"dsir_scores ${f}x")(
          ops.TextOps.dsirScores(docsF, "doc_id", "text",
              isTarget = col("lang") === "en")
            .agg(count(lit(1)).as("n"), sum("dsir_score").as("force"))
            .head.getLong(0))
        time(s"bpe_learn5 ${f}x")(
          ops.BpeOps.learnMerges(
            ops.BpeOps.wordCounts(docsF, "text"), nMerges = 5).size.toLong)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Graph/CDC mode (`graft.ScaleProbe <sfDir> graph [factors...]`):
    // two growth regimes for the co-purchase graph ops. "grow" strides
    // BOTH keys — f disjoint copies of the graph (corpus growth: node and
    // edge count scale f×, density constant). "densify" strides only the
    // order key — same part universe under f× baskets, so the thinned
    // (w≥2) graph gains edges and the degree distribution fattens: the
    // worst case for wedge enumeration and PageRank fan-in. CDC diff/apply
    // scale on the orders table (pure key-shuffle shapes).
    if (args.contains("graph")) {
      for (f <- factors) {
        val grow = scaled(env.lineitem.select("l_orderkey", "l_partkey"), f,
          Map("l_orderkey" -> 1000000000L, "l_partkey" -> 100000000L))
        val densify = scaled(env.lineitem.select("l_orderkey", "l_partkey"), f,
          Map("l_orderkey" -> 1000000000L))
        def thinned(inc: DataFrame) = ops.GraphOps.coOccurrenceEdges(
          inc, "l_orderkey", "l_partkey", minWeight = 2L).select("a", "b")
        time(s"graph_degrees_grow ${f}x")(
          ops.GraphOps.degrees(ops.GraphOps.coOccurrenceEdges(
              grow, "l_orderkey", "l_partkey").select("a", "b"))
            .agg(count(lit(1)).as("n"), sum("degree").as("force"))
            .head.getLong(0))
        time(s"graph_degrees_grow_selfjoin ${f}x")(
          ops.GraphOps.degrees(ops.GraphOps.coOccurrenceEdgesBySelfJoin(
              grow, "l_orderkey", "l_partkey").select("a", "b"))
            .agg(count(lit(1)).as("n"), sum("degree").as("force"))
            .head.getLong(0))
        time(s"graph_triangles_grow ${f}x")(
          ops.GraphOps.triangleStats(thinned(grow)).head.getAs[Long]("n_triangles"))
        time(s"graph_triangles_densify ${f}x")(
          ops.GraphOps.triangleStats(thinned(densify)).head.getAs[Long]("n_triangles"))
        time(s"graph_pagerank_densify ${f}x")(
          ops.GraphOps.pageRank(thinned(densify), iters = 3)
            .agg(count(lit(1)).as("n")).head.getLong(0))
        val ordF = scaled(env.orders, f, Map("o_orderkey" -> 1000000000L))
        val snapA = ordF.filter(col("o_orderkey") % 10 =!= 7)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
            col("o_totalprice").cast("decimal(18,4)").as("price"))
        val snapB = ordF.filter(col("o_orderkey") % 10 =!= 5)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
            when(col("o_orderkey") % 10 === 3,
                round(col("o_totalprice").cast("decimal(18,4)")
                  * lit(new java.math.BigDecimal("1.05")), 2))
              .otherwise(col("o_totalprice").cast("decimal(18,4)"))
              .cast("decimal(18,4)").as("price"))
        time(s"cdc_diff_apply ${f}x")(
          ops.CdcOps.applyDiff(snapA,
              ops.CdcOps.snapshotDiff(snapA, snapB, "o_orderkey",
                Seq("o_custkey", "o_orderpriority", "price")), "o_orderkey")
            .agg(count(lit(1)).as("n"), sum("price").as("force"))
            .head.getLong(0))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Round-8 mode (`graft.ScaleProbe <sfDir> round8 [factors...]`): the
    // scale claims of the round-8 operators.
    //  - Z-order: write cost ~linear (one approxQuantile pass per column +
    //    one range shuffle); the non-leading-column pruned read stays
    //    ~flat while total files grow f× (files READ constant, files
    //    SKIPPED grow — the zone-map asymmetry x109c certifies exact).
    //  - BFS: f disjoint graph copies, sources in ONE copy — per round
    //    the frontier BROADCASTS against the edge list (no edge shuffle),
    //    so cost is a linear edge-list scan per round, not a shuffle that
    //    grows with reach; at 100 TB the edge list would be bucketed on
    //    `a` to make the scan a pruned probe.
    //  - TF-IDF pairs: f× corpus with per-copy-suffixed vocabulary
    //    (corpus growth, not duplicate inflation): per-term join fan-out
    //    is df-capped, so pair work scales with corpus, not df².
    //  - IVM: FIXED change batch against an f× materialized view —
    //    maintain (view scan + broadcast anti/semi, no view shuffle) vs
    //    recomputing the join from scratch.
    if (args.contains("round8")) {
      import graft.sources.TableStore
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory("probe_r8_")
        try {
          val store = new TableStore(spark, dir.toString)
          val ord = scaled(env.orders.select("o_orderkey", "o_totalprice"),
            f, Map("o_orderkey" -> 1000000000L))
          time(s"zorder_write ${f}x files=${16 * f}")(
            store.overwriteZordered("z", ord,
              Seq("o_totalprice", "o_orderkey"), numFiles = 16 * f))
          store.buildManifestMulti("z", Seq("o_totalprice", "o_orderkey"))
          // fixed absolute key range (~3% of the base copy) -> constant
          // matching rows; copies live at strided offsets so surviving
          // files stay ~constant while total files grow f×
          time(s"zorder_skip_read ${f}x")(
            store.skippingReadMulti("z",
              Seq(("o_orderkey", 0L, 5000L))).count())
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)

        val grow = scaled(env.lineitem.select("l_orderkey", "l_partkey"), f,
          Map("l_orderkey" -> 1000000000L, "l_partkey" -> 100000000L))
        val edges = ops.GraphOps.coOccurrenceEdges(
            grow, "l_orderkey", "l_partkey", minWeight = 2L)
          .select("a", "b").localCheckpoint()
        val nodes = edges.select(col("a").as("id"))
          .union(edges.select(col("b").as("id"))).distinct()
        val sources = ops.RelOps.topK(3, Seq(col("id")))(nodes)
        time(s"bfs_hops_grow ${f}x")(
          ops.GraphOps.shortestHops(edges, sources, maxHops = 4).count())

        val docsF =
          if (f == 1) env.documents.select("doc_id", "text")
          else env.documents.select("doc_id", "text")
            .withColumn("__i", explode(sequence(lit(0L), lit(f - 1L))))
            .select((col("doc_id") * 100 + col("__i")).as("doc_id"),
              // per-copy token suffix: fully disjoint vocabulary per copy
              array_join(transform(split(col("text"), "\\s+"),
                t => concat(t, lit("q"), col("__i"))), " ").as("text"))
        // cap 256 ≈ N/20 for the sf0.1 base corpus; per-copy-suffixed
        // vocab keeps every copy's df distribution equal to the base's,
        // so the same absolute cap stays calibrated across factors
        time(s"tfidf_pairs ${f}x")(
          ops.SimilarityOps.tfidfCosinePairs(docsF, "doc_id", "text",
            minSim = 0.5, maxTermDf = 256L).count())

        val dirV = java.nio.file.Files.createTempDirectory("probe_r8v_")
        try {
          val storeV = new TableStore(spark, dirV.toString)
          val dim = scaled(env.customer, f, Map("c_custkey" -> 1000000000L))
            .select(col("c_custkey").as("o_custkey"),
              col("c_acctbal").as("acctbal"))
          val ordV = scaled(
            env.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            f, Map("o_orderkey" -> 1000000000L, "o_custkey" -> 1000000000L))
          storeV.overwrite("v", ordV.join(dim, "o_custkey")
            .select("o_orderkey", "o_custkey", "o_totalprice", "acctbal"))
          val view = storeV.read("v")
          // fixed-size batch: only base-copy keys (< 2000) change
          val newA = ordV.withColumn("o_totalprice",
            when(col("o_orderkey") < 2000, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")))
          val changedA = ordV.filter(col("o_orderkey") < 2000)
            .select("o_orderkey")
          val changedB = dim.filter(lit(false)).select("o_custkey")
          time(s"ivm_maintain ${f}x")(
            ops.CdcOps.maintainJoinView(view, "o_orderkey", "o_custkey",
              newA, dim, changedA, changedB).count())
          time(s"ivm_recompute ${f}x")(
            newA.join(dim, "o_custkey").count())
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dirV.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Storage mode (`graft.ScaleProbe <sfDir> storage [factors...]`):
    // the x108/x109 lakehouse shapes under growth. Partitioned CDC apply:
    // partition COUNT grows with f (8f partitions) so each partition's
    // size stays constant — a fixed-size batch touching ONE partition
    // should then apply in ~flat time while the table grows f×; that flat
    // line IS the O(touched)-not-O(table) claim. Skipping read: file
    // count grows with f (16f clustered files) while the queried range is
    // fixed — files READ stay ~constant, files SKIPPED grow with f, so
    // the pruned read should also hold ~flat against an f× table.
    if (args.contains("storage")) {
      import graft.sources.TableStore
      for (f <- factors) {
        val dir = java.nio.file.Files.createTempDirectory(s"probe_storage_")
        try {
          val store = new TableStore(spark, dir.toString)
          val ord = scaled(
            env.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            f, Map("o_orderkey" -> 1000000000L))
          val nParts = 8 * f
          val pt = ord.withColumn("p", pmod(col("o_orderkey"), lit(nParts)))
          store.overwritePartitioned("t", pt, Seq("p"))
          val batch = pt.filter(col("p") === 0)
            .limit(1000)
            .withColumn("o_totalprice", col("o_totalprice") + 1)
          time(s"x108_partitioned_apply ${f}x parts=$nParts")(
            store.applyChangesPartitioned("t", "o_orderkey", "p",
              batch, batch.limit(0)))
          store.overwriteClustered("c", ord, "o_orderkey", numFiles = 16 * f)
          store.buildManifest("c", "o_orderkey")
          // fixed absolute key range: the matching row count is constant
          // across factors (copies live at strided key offsets)
          time(s"x109_skipping_read ${f}x files=${16 * f}")(
            store.skippingRead("c", "o_orderkey", 0L, 200000L).count())
          time(s"x109_full_filter ${f}x")(
            store.read("c")
              .filter(col("o_orderkey").between(0L, 200000L)).count())
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(dir.toFile)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // Seq/PQ mode (`graft.ScaleProbe <sfDir> seqpq [factors...]`): the
    // x113-x115 sequence shapes over an f×-replicated event stream with
    // STRIDED user ids (more users, same per-user history — corpus
    // growth, the one-shuffle-per-query claim should scale linearly) and
    // the PQ encode+ADC-search pipeline over an f×-grown embedding corpus
    // (training cost is sample-capped = flat; encode+scan ~linear).
    if (args.contains("seqpq")) {
      import graft.queries.SequencePlans
      import graft.ops.PqOps
      for (f <- factors) {
        val ev = scaled(env.events
            .select("event_id", "user_id", "event_type", "value", "ts"),
          f, Map("event_id" -> 1000000000L, "user_id" -> 100000000L))
        time(s"x113_predicate_match ${f}x")(
          SequencePlans.predicateMatch(ev)
            .agg(count(lit(1)).as("n"), sum("matched_value").as("force"))
            .head.getLong(0))
        time(s"x114_error_streaks ${f}x")(
          SequencePlans.errorStreaks(ev)
            .agg(count(lit(1)).as("n"), sum("streak_value").as("force"))
            .head.getLong(0))
        time(s"x115_time_weighted_avg ${f}x")(
          SequencePlans.timeWeightedAvg(ev)
            .agg(count(lit(1)).as("n"), sum("twa").as("force"))
            .head.getLong(0))
        // embeddings grown as in embed mode: fresh ids, rotated copies
        val emb = env.embeddings
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v0"))
          .withColumn("__i", explode(sequence(lit(0), lit(f - 1))))
          .select((col("vec_id") * 1000 + col("__i")).as("c_id"),
            transform(sequence(lit(0), lit(63)),
              j => element_at(col("v0"), pmod(j + col("__i"), lit(64)) + 1))
              .as("ce"))
        val q = emb.filter(col("c_id") < 5)
          .select(col("c_id").as("q_id"), col("ce").as("qe"))
        time(s"x76_pq_train_encode_search ${f}x")({
          val cb = PqOps.train(emb, "ce")
          val codes = PqOps.encode(emb, "c_id", "ce", cb)
          PqOps.adcTopK(q, codes, cb, emb, k = 10).count()
        })
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    for (f <- factors) {
      val li = scaled(env.lineitem, f, Map("l_orderkey" -> 1000000000L))
      val ord = scaled(env.orders, f,
        Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
      val cust = scaled(env.customer, f, Map("c_custkey" -> 10000000L))
      time(s"q7_volume_shipping ${f}x")(
        TpchPlans.volumeShipping(li, ord, cust, env.supplier, env.nation).count())
      time(s"q9_product_profit ${f}x")(
        TpchPlans.productProfit(li, ord, env.part, env.supplier, env.nation).count())
      time(s"q13_naive_outer_join ${f}x")(q13naive(ord, cust))
      time(s"q13_shipped_preagg ${f}x")(
        TpchPlans.customerDistribution(ord, cust).count())
      time(s"q19_disjunctive ${f}x")(
        TpchPlans.disjunctivePredicates(li, env.part).count())
    }
    qskew(factors.max)
    spark.stop()
  }
}
