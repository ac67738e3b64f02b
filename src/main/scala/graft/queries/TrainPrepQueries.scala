package graft.queries

import org.apache.spark.sql.functions._
import graft.Env
import graft.ops.{RelOps, TextOps}

/** Training-data preparation operators — the context-window and
  * corpus-composition half of an LLM data pipeline, complementing the
  * dedup/quality families (X30-X38): sliding-window chunking, token-budget
  * document packing, stratified sampling, weighted source mixing, and
  * curriculum bucketing. Every query is DuckDB-oracle-checked; sampling
  * uses deterministic key arithmetic (not rand()) so results are
  * reproducible across engines, reruns, and task retries — which is what
  * a 100 TB pipeline needs for lineage anyway.
  */
object TrainPrepQueries {

  val all: Seq[Query] = Seq(

    // X80: sliding token-window chunking with stride — cutting documents
    // into overlapping context windows (window 8 tokens, stride 4; real
    // pipelines use 2k/1k with identical plans). One projection computes
    // the token array once per doc (TextOps boundary — the O(tokens²)
    // re-inline trap is documented on TextOps.withShingles), one explode
    // over the start offsets, no shuffle until the output sort. Output
    // volume is tokens/stride rows per doc — linear in corpus tokens.
    Query("x80_context_chunks",
      Some("""WITH tok AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS t
             |  FROM documents),
             |st AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
             |ch AS (SELECT doc_id, i // 4 AS chunk_idx, t[i+1:i+8] AS chunk
             |       FROM st, UNNEST(range(0, n, 4)) u(i))
             |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS chunk_ntok,
             |  array_to_string(chunk, ' ') AS chunk_text
             |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin),
      env => TrainPrepPlans.contextChunks(env.documents)
        .orderBy("doc_id", "chunk_idx")),

    // X81: token-budget document packing — assigning whole documents to
    // fixed-capacity training bins (256 tokens here; 4k/8k in practice) by
    // their START OFFSET in the doc_id-ordered token stream. The running
    // total comes from RelOps.globalCumSum — a two-pass distributed prefix
    // sum (range partition + per-partition window + broadcast offsets),
    // NOT the single-partition `Window.orderBy` that dies at 100 TB.
    // Offset-binning is the deterministic, shuffle-light packing variant
    // (a doc may straddle its bin boundary; bins are decided by where the
    // doc starts) — exact first-fit packing is inherently sequential.
    Query("x81_token_packing",
      Some("""WITH d AS (SELECT doc_id, len(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS ntok
             |  FROM documents),
             |c AS (SELECT doc_id, ntok,
             |        sum(ntok) OVER (ORDER BY doc_id) AS cum FROM d)
             |SELECT CAST((cum - ntok) // 256 AS BIGINT) AS pack_id,
             |  count(*) AS n_docs,
             |  CAST(sum(ntok) AS BIGINT) AS pack_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM c GROUP BY pack_id ORDER BY pack_id""".stripMargin),
      env => TrainPrepPlans.tokenPacking(env.documents).orderBy("pack_id")),

    // X82: stratified sampling — per-stratum keep rates (downsample the
    // over-represented strata) via DETERMINISTIC key arithmetic
    // (o_orderkey % 10 < rate), not rand(): cross-engine checkable, and at
    // scale reproducible under task retry (rand() re-draws on recompute;
    // spark's stat.sampleBy is the seeded alternative when key hashing is
    // unavailable). The rates dim is 5 rows — broadcast join, no shuffle
    // on the fact side until the final tiny aggregate.
    Query("x82_stratified_sample",
      Some("""WITH rates(pri, r) AS (VALUES ('1-URGENT', 8), ('2-HIGH', 6),
             |  ('3-MEDIUM', 4), ('4-NOT SPECIFIED', 2), ('5-LOW', 1)),
             |k AS (SELECT o_orderpriority, count(*) AS n_total,
             |        count(*) FILTER (WHERE o_orderkey % 10 < r) AS n_kept
             |      FROM orders JOIN rates ON o_orderpriority = pri
             |      GROUP BY o_orderpriority)
             |SELECT o_orderpriority, n_total, n_kept,
             |  round(CAST(n_kept AS DOUBLE) / n_total, 6) AS rate
             |FROM k ORDER BY o_orderpriority""".stripMargin),
      env => {
        import env.spark.implicits._
        val rates = Seq(("1-URGENT", 8), ("2-HIGH", 6), ("3-MEDIUM", 4),
          ("4-NOT SPECIFIED", 2), ("5-LOW", 1)).toDF("pri", "r")
        env.orders.select("o_orderkey", "o_orderpriority")
          .join(broadcast(rates), col("o_orderpriority") === col("pri"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_total"),
            count(when(pmod(col("o_orderkey"), lit(10)) < col("r"), 1))
              .as("n_kept"))
          .withColumn("rate",
            round(col("n_kept").cast("double") / col("n_total"), 6))
          .orderBy("o_orderpriority")
      }),

    // X83: weighted dataset mixing — compose the training corpus from
    // per-language keep rates (emulating e.g. "upsample non-English"
    // mixture weights). Same deterministic doc_id % 10 gate; output is the
    // actual mixed manifest (doc_id, lang), not just counts, because the
    // mix IS the artifact a pipeline hands to the trainer. Broadcast of a
    // 5-row weights dim; the corpus never shuffles.
    Query("x83_source_mix",
      Some("""WITH w(l, r) AS (VALUES ('en', 4), ('de', 10), ('es', 10),
             |  ('fr', 10), ('zh', 10))
             |SELECT doc_id, lang FROM documents JOIN w ON lang = l
             |WHERE doc_id % 10 < r ORDER BY doc_id""".stripMargin),
      env => {
        import env.spark.implicits._
        val w = Seq(("en", 4), ("de", 10), ("es", 10), ("fr", 10),
          ("zh", 10)).toDF("l", "r")
        env.documents.select("doc_id", "lang")
          .join(broadcast(w), col("lang") === col("l"))
          .filter(pmod(col("doc_id"), lit(10)) < col("r"))
          .select("doc_id", "lang")
          .orderBy("doc_id")
      }),

    // X84: curriculum bucketing — quartile the corpus by length and report
    // per-bucket composition (curriculum schedules feed short→long or
    // easy→hard). Two-pass: exact quartile thresholds (one tiny scalar
    // aggregate, broadcast back), then a stateless bucket assignment —
    // scale-safe where a global ntile() window is not (single partition).
    // Thresholds rounded to 6 before comparing so a cross-engine last-ulp
    // difference in the interpolated quantile cannot flip a boundary doc.
    Query("x84_curriculum_buckets",
      Some("""WITH q AS (SELECT round(quantile_cont(n_chars, 0.25), 6) AS q1,
             |  round(quantile_cont(n_chars, 0.50), 6) AS q2,
             |  round(quantile_cont(n_chars, 0.75), 6) AS q3 FROM documents),
             |b AS (SELECT doc_id, n_chars,
             |        CASE WHEN n_chars <= q1 THEN 0 WHEN n_chars <= q2 THEN 1
             |             WHEN n_chars <= q3 THEN 2 ELSE 3 END AS bucket
             |      FROM documents CROSS JOIN q)
             |SELECT bucket, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  round(avg(n_chars), 6) AS avg_chars
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
      env => {
        val q = env.documents.agg(
          round(percentile(col("n_chars"), lit(0.25)), 6).as("q1"),
          round(percentile(col("n_chars"), lit(0.50)), 6).as("q2"),
          round(percentile(col("n_chars"), lit(0.75)), 6).as("q3"))
        env.documents.select("doc_id", "n_chars")
          .crossJoin(broadcast(q))
          .withColumn("bucket",
            when(col("n_chars") <= col("q1"), 0)
              .when(col("n_chars") <= col("q2"), 1)
              .when(col("n_chars") <= col("q3"), 2)
              .otherwise(3))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            round(avg("n_chars"), 6).as("avg_chars"))
          .orderBy("bucket")
      }),

    // X86: BPE vocabulary induction, round one — corpus-wide adjacent
    // character-pair frequencies weighted by word count (the argmax pair
    // is the first merge a byte-pair tokenizer learns). Two shuffles
    // total: word counts (map-side combined), then pair counts over the
    // DISTINCT-word frame — the pair explode runs on |vocab| rows, not
    // |corpus tokens|, which is the difference between 26² work and a
    // corpus-sized explode at 100 TB.
    Query("x86_bpe_pair_counts",
      Some("""WITH words AS (SELECT t AS w, count(*) AS wn FROM (
             |    SELECT unnest(list_filter(
             |      string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS t
             |    FROM documents) GROUP BY t),
             |p AS (SELECT w[i+1:i+2] AS pair, wn
             |      FROM words, UNNEST(range(len(w) - 1)) u(i)
             |      WHERE len(w) >= 2)
             |SELECT pair, CAST(sum(wn) AS BIGINT) AS n
             |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin),
      env => {
        val words = env.documents
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("wn"))
        words.filter(length(col("w")) >= 2)
          .select(col("wn"),
            explode(transform(sequence(lit(0), length(col("w")) - 2),
              i => col("w").substr(i + 1, lit(2)))).as("pair"))
          .groupBy("pair").agg(sum("wn").as("n"))
          .orderBy(desc("n"), col("pair"))
          .limit(50)
      }),

    // X77: BPE tokenizer TRAINING (BpeOps.learnMerges) — the iterative
    // merge loop x86's single census is one round of. Rows-only: the
    // learned table is inherently iterative (each rank conditions on all
    // prior merges), which no single SQL statement reproduces; the
    // classic-corpus golden spec pins the algorithm, and the first-rank
    // row is exactly x86's top pair (oracle-checked there). Output is
    // driver-bounded by construction (nMerges rows).
    Query("x77_bpe_learn",
      None,
      env => {
        import env.spark.implicits._
        val wc = graft.ops.BpeOps.wordCounts(env.documents, "text")
        graft.ops.BpeOps.learnMerges(wc, nMerges = 12)
          .toDF("rank", "left", "right", "pair_freq")
          .orderBy("rank")
      }),

    // X77b: corpus encoding with the learned tokenizer — the serve side
    // of x77, in the vocabulary-shaped formulation (encode each DISTINCT
    // word once, join the segmentation map back; BpeOps.encodeVocab).
    // The oracle can't replay BPE merges in SQL, so the contract pins
    // what SQL can see exactly — per-doc word counts — plus the three
    // invariants any correct BPE encode satisfies corpus-wide: token
    // count per doc is bounded by [words, chars], and every encoded word
    // concatenates back to itself (round_trip_ok). A broken fold, merge
    // table, or join flips a boolean and the driver hash catches it; the
    // exact segmentations are pinned by the golden spec on the classic
    // reference corpus.
    Query("x77b_bpe_encode",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '')) AS word
             |  FROM documents)
             |SELECT doc_id, count(*) AS n_words,
             |  true AS bpe_le_chars, true AS bpe_ge_words,
             |  true AS round_trip_ok
             |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      env => {
        import graft.ops.BpeOps
        val wc = BpeOps.wordCounts(env.documents, "text")
        val merges = BpeOps.learnMerges(wc, nMerges = 8)
          .map(m => (m._2, m._3))
        val enc = BpeOps.encodeVocab(env.documents, "text", merges)
          .select("word", "n_syms", "n_chars", "round_trip_ok")
        env.documents
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("word"))
          .join(enc, "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum("n_syms").as("__nt"),
            sum("n_chars").as("__nc"),
            bool_and(col("round_trip_ok")).as("round_trip_ok"))
          .select(col("doc_id"), col("n_words"),
            (col("__nt") <= col("__nc")).as("bpe_le_chars"),
            (col("__nt") >= col("n_words")).as("bpe_ge_words"),
            col("round_trip_ok"))
          .orderBy("doc_id")
      }),

    // X87: deterministic training-order shuffle — a reproducible
    // pseudo-random permutation of the corpus via md5(doc_id) (md5 is the
    // hash both engines share; the point is any keyed hash), with the
    // global position assigned by RelOps.globalRowNumber — range-partition
    // + zipWithIndex, NOT the single-partition global row_number window.
    // Reproducible shuffling matters for resumable training runs: the
    // epoch order must survive job restarts and engine swaps.
    Query("x87_train_order",
      Some("""WITH s AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
             |  FROM documents)
             |SELECT doc_id, shuffle_key,
             |  row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos
             |FROM s ORDER BY pos""".stripMargin),
      env => {
        val s = env.documents.select(col("doc_id"),
          md5(col("doc_id").cast("string")).as("shuffle_key"))
        RelOps.globalRowNumber(s, Seq(col("shuffle_key"), col("doc_id")),
            rnCol = "pos")
          .orderBy("pos")
      }),

    // X88: scalar (int8-style) embedding quantization audit — codes =
    // round((v-mn)/(mx-mn)*255), reconstruction error vs the dequantized
    // value, reported per code bucket. The compression decision a 100 TB
    // embedding store makes (4× smaller, how much recall risk?): the
    // [mn,mx] range is one tiny aggregate broadcast back, the quantize/
    // dequantize is stateless per component, and only the 16-bucket audit
    // aggregate leaves the executors. Arithmetic is ordered identically
    // on both engines so the doubles agree bit-for-bit before rounding;
    // max() is association-free, avg() is rounded to 6.
    Query("x88_embedding_quantization",
      Some("""WITH u AS (SELECT unnest(embedding::DOUBLE[]) AS v FROM embeddings),
             |s AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
             |q AS (SELECT v, CAST(round((v - mn)/(mx - mn)*255, 0) AS INT) AS code,
             |        mn, mx FROM u CROSS JOIN s),
             |d AS (SELECT code, abs(v - (mn + code/255.0*(mx - mn))) AS err FROM q)
             |SELECT code // 16 AS bucket, count(*) AS n,
             |  round(avg(err), 6) AS avg_err, round(max(err), 6) AS max_err
             |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin),
      env => {
        val u = env.embeddings
          .select(explode(col("embedding")).as("xf"))
          .select(col("xf").cast("double").as("v"))
        val s = u.agg(min("v").as("mn"), max("v").as("mx"))
        u.crossJoin(broadcast(s))
          .withColumn("code",
            round((col("v") - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("int"))
          .withColumn("err", abs(col("v") -
            (col("mn") + col("code").cast("double") / 255.0 * (col("mx") - col("mn")))))
          .groupBy(expr("code div 16").as("bucket"))
          .agg(count(lit(1)).as("n"), round(avg("err"), 6).as("avg_err"),
            round(max("err"), 6).as("max_err"))
          .orderBy("bucket")
      })
  )
}
