package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{SimilarityOps, TextOps}

/** Corpus-curation operators a training-data pipeline runs beyond the
  * X30-X33 dedup/quality families: quality-aware dedup (keep the best
  * representative, not the first), benchmark-contamination detection
  * (n-gram overlap against a held-out set), and corpus-level token
  * statistics (Zipf ranks, bigram conditional probabilities). All
  * oracle-checked.
  */
object CorpusQueries {

  /** ONE oracle text for x125 (from-scratch BM25), x125b (the persisted-
    * index probe after all commits) and x125c (probe after deletes +
    * compaction, `where` restricting to the surviving corpus) — every
    * index-path contract is literally "same answer as a full recompute
    * over the corpus the index should represent", so they share the SQL. */
  private def bm25OracleOver(where: String): Option[String] = {
    val c = graft.ops.RetrievalOps.bm25Constants(1.2, 0.75)
    Some(s"""WITH tok AS (
           |  SELECT doc_id,
           |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
           |      t -> t <> '') AS t
           |  FROM documents $where),
           |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |        CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl FROM tok),
           |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM tok),
           |w AS (SELECT doc_id, unnest(t) AS w FROM tok),
           |tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
           |       FROM w WHERE w IN ('window', 'merge', 'join')
           |       GROUP BY doc_id, w),
           |dfq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w)
           |SELECT tf.doc_id, count(*) AS n_hit,
           |  round(sum(ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
           |    * (tf.tf * ${c("k1p1")})
           |    / (tf.tf + ${c("k1")} * (${c("oneMinusB")}
           |        + ${c("b")} * dl.dl / s.avgdl))), 6) AS bm25
           |FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id) CROSS JOIN s
           |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin)
  }

  private val bm25Oracle: Option[String] = bm25OracleOver("")

  /** ONE oracle for x129 (one-shot), x129b (plain incremental state) and
    * x129c (versioned state, pinned-version assignment): every split
    * contract is "same assignment as the from-scratch recursive-CTE
    * clustering + md5-uniform draw", so they share the SQL verbatim. */
  private val leakageSplitOracle: Option[String] =
    Some(s"WITH RECURSIVE ${OracleCtes.components},\n" +
      """alldocs AS (
        |  SELECT d.doc_id, coalesce(cl.comp, d.doc_id) AS comp
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |s AS (SELECT doc_id, comp,
        |  (('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 8))::BIGINT
        |    + 0.5) / 4294967296.0 AS u
        |  FROM alldocs)
        |SELECT doc_id, comp,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin)

  /** The ONE wave rule behind every incremental-components query (x62c/
    * x129b plain layout, x62d/x129c versioned — duplicating it would let
    * the rule drift between queries whose oracles all assume the same
    * ingest): pair-graph edges classified by the newest "arrival wave"
    * of their endpoints. Returns the CHECKPOINTED edge frame (caller
    * releases) and the per-wave slice. */
  private def waveEdgeSlices(env: graft.Env)
      : (org.apache.spark.sql.DataFrame,
         Int => org.apache.spark.sql.DataFrame) = {
    val edges = SimilarityOps
      .ngramJaccardPairs(env.documents, "doc_id", "text",
        maxShingleDf = 256)
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint()
    def wave(c: org.apache.spark.sql.Column) =
      when(c % 5 =!= 0, 0).when(c % 10 === 0, 1).otherwise(2)
    val wmax = greatest(wave(col("a")), wave(col("b")))
    (edges, w => edges.filter(wmax === w))
  }

  /** The wave-ingestion loop behind x62c and x129b: component state
    * built on the old corpus then folded per wave, the last wave retried
    * (must append NOTHING — labels already merged). Leaves
    * `<name>_comps` in the store; edges are checkpointed and released
    * here (a throwing ingest step would otherwise leak the blocks for
    * the rest of the verify session). */
  private def waveIngestComponents(env: graft.Env,
      store: graft.sources.TableStore, name: String): Unit = {
    val (edges, slice) = waveEdgeSlices(env)
    try {
      SimilarityOps.buildComponentsState(store, name, slice(0))
      SimilarityOps.appendComponentEdges(store, name, slice(1))
      SimilarityOps.appendComponentEdges(store, name, slice(2))
      val retried = SimilarityOps.appendComponentEdges(store, name, slice(2))
      require(retried == 0L,
        s"retried edge batch must append nothing, appended $retried")
    } finally graft.ops.RelOps.releaseCheckpoint(edges)
  }

  /** [[waveIngestComponents]] on the VERSIONED-bucketed layout (x62d/
    * x129c): same wave rule, each fold ONE atomic CASed commit; the
    * retried wave must commit nothing — not even a version. */
  private def waveIngestComponentsVersioned(env: graft.Env,
      ss: graft.sources.SnapshotStore, name: String): Unit = {
    val (edges, slice) = waveEdgeSlices(env)
    try {
      SimilarityOps.buildComponentsStateVersioned(ss, name, slice(0))
      SimilarityOps.appendComponentEdgesVersioned(ss, name, slice(1))
      SimilarityOps.appendComponentEdgesVersioned(ss, name, slice(2))
      val vBefore = ss.currentVersion(name)
      val retried = SimilarityOps.appendComponentEdgesVersioned(ss, name,
        slice(2))
      require(retried == 0L && ss.currentVersion(name) == vBefore,
        s"retried edge batch must commit nothing (appended $retried)")
    } finally graft.ops.RelOps.releaseCheckpoint(edges)
  }

  /** The x136 curation composition (exact dedup → near-dup components →
    * Gopher quality gate → cluster-aware split) over ANY corpus frame —
    * the ONE implementation behind x136 (full corpus, per-doc output)
    * and x136b (corpus snapshots committed as dataset-release versions).
    * Returns (doc_id, disposition, split), unordered. */
  private def curationDispositions(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {

        import org.apache.spark.sql.expressions.Window
                val edges = SimilarityOps
          .ngramJaccardPairs(docs, "doc_id", "text", maxShingleDf = 256)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        // comp + split from X129 (comp label = component min id)
        val base = SimilarityOps.leakageSafeSplit(docs, "doc_id", edges,
          Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
        // exact-dup keeper per content fingerprint
        val keeper = docs
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("h"))
          .withColumn("keeper",
            min("doc_id").over(Window.partitionBy("h")))
          .select("doc_id", "keeper")
        // Gopher keep booleans (x33's rules)
        val ws = filter(split(lower(trim(col("text"))), "\\s+"),
          x => x =!= "")
        val nWords = size(col("ws")).cast("long")
        val quality = docs.select(col("doc_id"), ws.as("ws"))
          .select(col("doc_id"),
            (nWords.between(50, 100000) &&
              round(aggregate(transform(col("ws"),
                  x => length(x).cast("long")), lit(0L), (acc, x) => acc + x)
                / greatest(nWords, lit(1L)), 6).between(3, 10) &&
              (round(size(filter(col("ws"), x => x.rlike("[a-z]")))
                .cast("long") / greatest(nWords, lit(1L)), 6) >= 0.8))
              .as("keep"))
        base.join(keeper, "doc_id").join(quality, "doc_id")
          .select(col("doc_id"),
            when(col("doc_id") =!= col("keeper"), "exact_dup")
              .when(col("comp") =!= col("doc_id"), "near_dup")
              .when(!col("keep"), "low_quality")
              .otherwise("kept").as("disposition"),
            when(col("doc_id") === col("keeper") &&
              col("comp") === col("doc_id") && col("keep"), col("split"))
              .as("split"))
          
  }

  /** The x136 disposition pipeline as DuckDB SQL over `documents $where`,
    * every CTE name suffixed with `sfx` so TWO corpus snapshots compose in
    * one WITH RECURSIVE (x136b's dataset releases). Emits `disp<sfx>`
    * (doc_id, disposition). Mirrors OracleCtes.components + the x136
    * oracle stage for stage. */
  private def dispositionCtesOver(where: String, sfx: String): String =
    s"""tok$sfx AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      t -> t <> '') AS t
       |  FROM documents $where),
       |sh$sfx AS (
       |  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
       |  FROM tok$sfx, UNNEST(range(len(t) - 2)) u(i)),
       |sz$sfx AS (SELECT doc_id, count(*) AS z FROM sh$sfx GROUP BY doc_id),
       |pr$sfx AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh$sfx a JOIN sh$sfx b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges$sfx AS (
       |  SELECT id_a AS a, id_b AS b
       |  FROM pr$sfx JOIN sz$sfx sa ON id_a = sa.doc_id
       |    JOIN sz$sfx sb ON id_b = sb.doc_id
       |  WHERE round(i / (sa.z + sb.z - i), 6) >= 0.5),
       |sym$sfx AS (SELECT a, b FROM edges$sfx UNION SELECT b, a FROM edges$sfx),
       |reach$sfx(id, root) AS (
       |  SELECT DISTINCT a, a FROM sym$sfx
       |  UNION
       |  SELECT sy.b, r.root FROM reach$sfx r JOIN sym$sfx sy ON sy.a = r.id),
       |cl$sfx AS (SELECT id AS doc_id, min(root) AS comp
       |  FROM reach$sfx GROUP BY id),
       |fp$sfx AS (SELECT doc_id,
       |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
       |  FROM documents $where),
       |fpk$sfx AS (SELECT h, min(doc_id) AS keeper FROM fp$sfx GROUP BY h),
       |q$sfx AS (SELECT doc_id,
       |    (len(ws) BETWEEN 50 AND 100000)
       |      AND (round(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
       |            / greatest(len(ws), 1), 6) BETWEEN 3 AND 10)
       |      AND (round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
       |            / greatest(len(ws), 1), 6) >= 0.8) AS keep
       |  FROM (SELECT doc_id,
       |      list_filter(str_split_regex(lower(trim(text)), '\\s+'),
       |        x -> x <> '') AS ws FROM documents $where) t),
       |dall$sfx AS (SELECT d.doc_id, coalesce(cl$sfx.comp, d.doc_id) AS comp
       |  FROM (SELECT doc_id FROM documents $where) d
       |  LEFT JOIN cl$sfx ON d.doc_id = cl$sfx.doc_id),
       |disp$sfx AS (SELECT f.doc_id,
       |  CASE WHEN f.doc_id <> fpk$sfx.keeper THEN 'exact_dup'
       |       WHEN a.comp <> f.doc_id THEN 'near_dup'
       |       WHEN NOT q$sfx.keep THEN 'low_quality'
       |       ELSE 'kept' END AS disposition
       |FROM fp$sfx f JOIN fpk$sfx USING (h) JOIN q$sfx USING (doc_id)
       |  JOIN dall$sfx a USING (doc_id))""".stripMargin

  val all: Seq[Query] = Seq(

    // Quality-aware exact dedup: cluster on the content fingerprint, keep
    // the LONGEST member (ties → smallest id) rather than x30's min-id —
    // the keep-best policy a curation pipeline actually wants. One
    // window over the hash; no join.
    Query("x56_dedup_keep_best",
      Some("""SELECT doc_id,
             |  sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
             |  n_chars
             |FROM (
             |  SELECT doc_id, text, n_chars,
             |    row_number() OVER (
             |      PARTITION BY sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |      ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        env.documents
          .withColumn("h", TextOps.fingerprint(col("text")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("h").orderBy(desc("n_chars"), col("doc_id"))))
          .filter(col("rn") === 1)
          .select("doc_id", "h", "n_chars")
          .orderBy("doc_id")
      }),

    // X97: per-source distribution drift — KL(P_source || P_corpus) over
    // token unigrams, the "did this slice's language shift" diagnostic a
    // curation pipeline runs per ingest source / time bucket. One token
    // explode feeds a pinned (source, token, c) aggregate; source totals,
    // corpus token counts, and the grand total all derive from it (no
    // re-tokenization). Every source token exists in the corpus
    // distribution by construction, so no zero-division; KL terms use
    // the IDENTICAL arithmetic expression in both engines and sum as
    // DECIMAL(38,15) (order-free), rounded to 6.
    Query("x97_source_kl",
      Some("""WITH tok AS (
             |  SELECT source,
             |    unnest(list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '')) AS t
             |  FROM documents),
             |stc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
             |st AS (SELECT source, sum(c) AS tot_s FROM stc GROUP BY source),
             |ct AS (SELECT t, sum(c) AS c_t FROM stc GROUP BY t),
             |gt AS (SELECT sum(c) AS big_t FROM stc)
             |SELECT s.source, CAST(st.tot_s AS BIGINT) AS n_tokens,
             |  round(CAST(sum(CAST((s.c / st.tot_s)
             |    * ln((s.c * gt.big_t) / (st.tot_s * ct.c_t))
             |    AS DECIMAL(38,15))) AS DOUBLE), 6) AS kl
             |FROM stc s JOIN st USING (source) JOIN ct USING (t) CROSS JOIN gt
             |GROUP BY s.source, st.tot_s ORDER BY s.source""".stripMargin),
      env => {
        val stc = env.documents.select(col("source"),
            explode_outer(TextOps.tokens(col("text"))).as("t"))
          .filter(col("t").isNotNull)
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val st = stc.groupBy("source").agg(sum("c").as("tot_s"))
        val ct = stc.groupBy("t").agg(sum("c").as("c_t"))
        val gt = stc.agg(sum("c").as("big_t"))
        stc.join(st, "source").join(ct, "t").crossJoin(broadcast(gt))
          .groupBy(col("source"), col("tot_s").as("n_tokens"))
          .agg(round(sum(((col("c") / col("tot_s"))
              * log((col("c") * col("big_t")) / (col("tot_s") * col("c_t"))))
              .cast("decimal(38,15)"))
            .cast("double"), 6).as("kl"))
          .orderBy("source")
      }),

    // TF-IDF weighted cosine pairs — the weighted sparse similarity join:
    // shared RARE vocabulary scores topical/template near-duplicates that
    // contiguous-shingle Jaccard under-scores. The vector space is terms
    // with df <= 64 by definition (hot terms are idf≈0 stopwords that
    // only inflate the inverted-index fan-out); norms and dot products
    // sum DECIMAL(38,15) terms and round to 6 before the threshold, so
    // both engines see bit-identical cosines (the pageRank discipline).
    Query("x35b_tfidf_cosine",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '')) AS t
             |  FROM documents),
             |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
             |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t
             |        HAVING count(*) <= 64),
             |nd AS (SELECT count(*) AS n_docs FROM documents),
             |w AS (SELECT doc_id, t, tf * ln((SELECT n_docs FROM nd) / df) AS w
             |      FROM tf JOIN dfq USING (t)),
             |nrm AS (SELECT doc_id,
             |    sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,15))) AS DOUBLE)) AS nrm
             |  FROM w GROUP BY doc_id),
             |u AS (SELECT w.doc_id, t, w.w / nrm AS wn
             |      FROM w JOIN nrm USING (doc_id)),
             |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    round(CAST(sum(CAST(a.wn * b.wn AS DECIMAL(38,15))) AS DOUBLE), 6) AS cosine
             |  FROM u a JOIN u b ON a.t = b.t AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, cosine FROM pr
             |WHERE cosine >= 0.5 ORDER BY id_a, id_b""".stripMargin),
      env => SimilarityOps.tfidfCosinePairs(env.documents, "doc_id", "text",
          minSim = 0.5, maxTermDf = 64L)
        .orderBy("id_a", "id_b")),

    // Benchmark-contamination check: corpus documents sharing >= 3 distinct
    // 3-gram shingles with the held-out set (source 'src0' stands in for
    // the benchmark). Shingles hash to longs before the join (equality on
    // xxhash64 ≡ equality on the string at ~2^-64 collision odds), and the
    // benchmark side deduplicates then broadcasts — at 100 TB the corpus
    // side streams map-only against the (small) benchmark shingle set.
    Query("x57_contamination",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
             |  FROM tok, UNNEST(range(len(t) - 2)) u(i)),
             |bench AS (SELECT DISTINCT s FROM sh JOIN documents USING (doc_id)
             |          WHERE source = 'src0'),
             |corp AS (SELECT sh.doc_id, sh.s FROM sh JOIN documents USING (doc_id)
             |         WHERE source <> 'src0')
             |SELECT corp.doc_id, count(*) AS n_overlap
             |FROM corp JOIN bench ON corp.s = bench.s
             |GROUP BY corp.doc_id HAVING count(*) >= 3
             |ORDER BY corp.doc_id""".stripMargin),
      env => {
        // checkpoint the shingle frame: the bench and corp branches both
        // consume it, and without the cut the O(corpus) tokenize+shingle+
        // hash lineage would run twice (same reason x60 checkpoints its
        // bigram frame)
        val sh = TextOps.explodeShingles(env.documents.select("doc_id", "text"),
            "doc_id", "text", 3)
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
          .localCheckpoint()
        val srcOf = env.documents.select(col("doc_id"), col("source"))
        val bench = sh.join(srcOf.filter(col("source") === "src0"), "doc_id")
          .select("h").distinct()
        val corp = sh.join(srcOf.filter(col("source") =!= "src0"), "doc_id")
        corp.join(broadcast(bench), "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_overlap"))
          .filter(col("n_overlap") >= 3)
          .orderBy("doc_id")
      }),

    // X120: per-document n-gram novelty — fraction of each doc's distinct
    // 5-grams FIRST introduced by that doc (first occurrence = smallest
    // doc id). The memorization-census companion to x57's contamination
    // check: x57 guards the eval set, novelty scores redundancy inside
    // the training corpus itself. Spark attributes on xxhash64(gram)
    // (census counts only — collision odds quantified in the scaladoc);
    // the oracle attributes on the gram string, so a hash match also
    // certifies the hashed formulation exact on this corpus.
    Query("x120_ngram_novelty",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
             |      || ' ' || t[i+5] AS s
             |  FROM tok, UNNEST(range(len(t) - 4)) u(i)),
             |own AS (SELECT s, min(doc_id) AS owner FROM sh GROUP BY s)
             |SELECT sh.doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_novel,
             |  round(CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) AS novelty_ratio
             |FROM sh JOIN own USING (s)
             |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin),
      env => SimilarityOps.ngramNovelty(env.documents, "doc_id", "text", 5)
        .orderBy("doc_id")),

    // X120c: the incremental novelty score — build the first-seen gram
    // census on the corpus (doc_id ≤ 3/5·max), probe one batch, COMMIT
    // it, probe the next — and the union of probe outputs must equal the
    // from-scratch x120 score restricted to the batch ids, which the
    // oracle recomputes directly in SQL (a FULL hash gate, stronger than
    // the x31c/x39c parity booleans — novelty is SQL-expressible, so the
    // incremental path gets the exact-oracle treatment). Exercises build,
    // probe, append-only commit, and the post-commit probe in one query.
    Query("x120c_incremental_novelty",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
             |      || ' ' || t[i+5] AS s
             |  FROM tok, UNNEST(range(len(t) - 4)) u(i)),
             |own AS (SELECT s, min(doc_id) AS owner FROM sh GROUP BY s)
             |SELECT sh.doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_novel,
             |  round(CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) AS novelty_ratio
             |FROM sh JOIN own USING (s)
             |WHERE sh.doc_id > (SELECT (max(doc_id) * 3) // 5 FROM documents)
             |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x120c_") {
        dir =>
        val store = new graft.sources.TableStore(env.spark, dir)
        val maxId = env.documents.agg(max("doc_id")).head().getLong(0)
        val (t1, t2) = (maxId * 3 / 5, maxId * 4 / 5)
        val corpus = env.documents.filter(col("doc_id") <= t1)
        val batch1 = env.documents
          .filter(col("doc_id") > t1 && col("doc_id") <= t2)
        val batch2 = env.documents.filter(col("doc_id") > t2)
        SimilarityOps.buildNoveltyIndex(store, "nv", corpus,
          "doc_id", "text", 5)
        val p1 = SimilarityOps.probeNoveltyIndex(store, "nv", batch1,
          "doc_id", "text")
        SimilarityOps.appendNoveltyBatch(store, "nv", batch1,
          "doc_id", "text")
        val p2 = SimilarityOps.probeNoveltyIndex(store, "nv", batch2,
          "doc_id", "text")
        p1.unionByName(p2).orderBy("doc_id")
      }),

    // X120d: the VERSIONED novelty census — x120c's lifecycle routed
    // through SnapshotStore's atomic multi-table commits on the
    // versioned-BUCKETED layout (grams h-bucketed under commit_v
    // partitions; the plain layout's grams/docs two-step append can tear
    // between them). Build v1, probe batch1, commit it (v2), RETRY the
    // commit (must commit nothing — not even a version), probe batch2,
    // then stage a THIRD append completely (grams + docs partitions +
    // manifest) and DIE before the pointer swap — v2 must keep serving,
    // and a TIME-TRAVELED batch1 probe at v1 must equal the original.
    // Output = p1 ∪ p2, hash-gated against the same from-scratch SQL
    // recompute as x120c.
    Query("x120d_versioned_novelty",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |      t -> t <> '') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
             |      || ' ' || t[i+5] AS s
             |  FROM tok, UNNEST(range(len(t) - 4)) u(i)),
             |own AS (SELECT s, min(doc_id) AS owner FROM sh GROUP BY s)
             |SELECT sh.doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_novel,
             |  round(CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) AS novelty_ratio
             |FROM sh JOIN own USING (s)
             |WHERE sh.doc_id > (SELECT (max(doc_id) * 3) // 5 FROM documents)
             |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x120d_") {
        dir =>
        val ss = new graft.sources.SnapshotStore(env.spark, dir)
        val maxId = env.documents.agg(max("doc_id")).head().getLong(0)
        val (t1, t2) = (maxId * 3 / 5, maxId * 4 / 5)
        val corpus = env.documents.filter(col("doc_id") <= t1)
        val batch1 = env.documents
          .filter(col("doc_id") > t1 && col("doc_id") <= t2)
        val batch2 = env.documents.filter(col("doc_id") > t2)
        SimilarityOps.buildNoveltyIndexVersioned(ss, "nv", corpus,
          "doc_id", "text", 5)
        val p1 = SimilarityOps.probeNoveltyIndexVersioned(ss, "nv", batch1,
          "doc_id", "text")
        val n1 = SimilarityOps.appendNoveltyBatchVersioned(ss, "nv",
          batch1, "doc_id", "text")
        require(n1 > 0L, "append must ingest the batch")
        val retried = SimilarityOps.appendNoveltyBatchVersioned(ss, "nv",
          batch1, "doc_id", "text")
        require(retried == 0L && ss.currentVersion("nv") == 2L,
          "retried append must commit nothing — not even a version")
        val p2 = SimilarityOps.probeNoveltyIndexVersioned(ss, "nv", batch2,
          "doc_id", "text")
        // kill-at-the-seam: a third append fully staged (grams + docs
        // commit_v=3 partitions + the manifest), dead before the swap
        val ghost = env.documents.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
        val gFresh = SimilarityOps.noveltyFreshVersioned(ss, "nv", 2L,
          ghost, "doc_id")
        ss.claim("nv", 3L)
        ss.stageTables("nv", 3L,
          SimilarityOps.noveltyAppendTables(ss, "nv", 2L, gFresh,
            "doc_id", "text"), Map.empty)
        graft.ops.RelOps.releaseCheckpoint(gFresh)
        require(ss.currentVersion("nv") == 2L, "death before swap: v2 holds")
        // time travel: probing batch1 against v1 re-derives p1 exactly
        // re-alias the v1 probe's columns: both probes inherit batch1's
        // doc_id attribute, which trips the ambiguous-self-join check
        val p1v1 = SimilarityOps.probeNoveltyIndexVersioned(ss, "nv",
            batch1, "doc_id", "text", version = Some(1L))
          .select(col("doc_id").as("v_doc_id"), col("n_grams").as("v_ng"),
            col("n_novel").as("v_nn"))
        val drift = p1.join(p1v1,
            col("doc_id") === col("v_doc_id") &&
            col("n_grams") === col("v_ng") &&
            col("n_novel") === col("v_nn"), "full_outer")
          .filter(col("doc_id").isNull || col("v_doc_id").isNull).count()
        require(drift == 0L, s"time-traveled v1 probe drifted: $drift rows")
        val out = p1.unionByName(p2).orderBy("doc_id")
        ss.dropCatalogTables("nv")
        out
      }),

    // X125: BM25 keyword-retrieval scoring (Okapi with Lucene's
    // non-negative idf) for a fixed 3-term query — the ranking half of a
    // retrieval pipeline next to the vector paths. The oracle recomputes
    // the full formula in SQL with the SAME left-associated expression
    // and shortest-roundtrip constant literals (RetrievalOps
    // .bm25Constants), tf/df/dl cast to double before arithmetic on both
    // sides, avgdl as exact-long total / count; per-doc sums (≤3 terms)
    // round to 6 (the x60 ln discipline).
    Query("x125_bm25", bm25Oracle,
      env => graft.ops.RetrievalOps.bm25Scores(env.documents,
          "doc_id", "text", Seq("window", "merge", "join"))
        .orderBy("doc_id")),

    // X125b: the incremental-BM25 contract — build the persisted inverted
    // index on the corpus prefix (doc_id ≤ 3/5·max), commit two batches
    // (the second committed TWICE: the retried commit must add nothing,
    // or the additive stats fold would double-count), then probe the
    // index. The probe must hash-match the from-scratch x125 score over
    // the FULL corpus — the oracle recomputes it directly, a full hash
    // gate (BM25 is SQL-expressible, so the incremental path gets the
    // exact-oracle treatment like x120c, stronger than the x31c parity
    // boolean). Exercises build, append-only commit, idempotent retry,
    // the additive (n, tt) stats fold, and the shared score join.
    Query("x125b_incremental_bm25", bm25Oracle,
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x125b_") {
        dir =>
        import graft.ops.RetrievalOps
        val store = new graft.sources.TableStore(env.spark, dir)
        val maxId = env.documents.agg(max("doc_id")).head().getLong(0)
        val (t1, t2) = (maxId * 3 / 5, maxId * 4 / 5)
        val batch2 = env.documents.filter(col("doc_id") > t2)
        RetrievalOps.buildBm25Index(store, "bm",
          env.documents.filter(col("doc_id") <= t1), "doc_id", "text")
        RetrievalOps.appendBm25Batch(store, "bm",
          env.documents.filter(col("doc_id") > t1 && col("doc_id") <= t2),
          "doc_id", "text")
        RetrievalOps.appendBm25Batch(store, "bm", batch2, "doc_id", "text")
        val retried = RetrievalOps.appendBm25Batch(store, "bm", batch2,
          "doc_id", "text")
        require(retried == 0L,
          s"retried commit must be a no-op, added $retried docs")
        RetrievalOps.probeBm25Index(store, "bm", "doc_id",
          Seq("window", "merge", "join")).orderBy("doc_id")
      }),

    // X125c: the delete + compaction half of the index lifecycle — build
    // on the full corpus, tombstone-delete every doc_id % 7 == 0 (the
    // retried delete must remove 0 — the negative stats row must not
    // double-subtract), compact (physical rewrite dropping tombstones,
    // stats collapsed to one canonical row), then probe. The probe must
    // hash-match a from-scratch recompute over the SURVIVING corpus,
    // which the oracle runs directly; the probe-unchanged-across-
    // compaction equality is pinned in RetrievalOpsSpec.
    Query("x125c_bm25_delete_compact",
      bm25OracleOver("WHERE doc_id % 7 <> 0"),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x125c_") {
        dir =>
        import graft.ops.RetrievalOps
        val store = new graft.sources.TableStore(env.spark, dir)
        RetrievalOps.buildBm25Index(store, "bm", env.documents,
          "doc_id", "text")
        val victims = env.documents.filter(col("doc_id") % 7 === 0)
          .select("doc_id")
        val n1 = RetrievalOps.deleteBm25Docs(store, "bm", victims, "doc_id")
        require(n1 > 0L, "expected deletions")
        val n2 = RetrievalOps.deleteBm25Docs(store, "bm", victims, "doc_id")
        require(n2 == 0L, s"retried delete must be a no-op, removed $n2")
        RetrievalOps.compactBm25Index(store, "bm")
        RetrievalOps.probeBm25Index(store, "bm", "doc_id",
          Seq("window", "merge", "join")).orderBy("doc_id")
      }),

    // X125d: the ATOMIC versioned index — the whole BM25 group
    // (postings/dl/stats/tombstones) committed through SnapshotStore
    // .commitTables: build v1 on the corpus prefix, append a batch (v2),
    // retry the append (must commit NOTHING — not even a version), then
    // stage a THIRD append completely (every data dir + the manifest,
    // exactly what the real append publishes) and DIE before the pointer
    // swap. The probe must keep serving version 2's mutually-consistent
    // index — the oracle recomputes BM25 from scratch over exactly the
    // v2 corpus (doc_id ≤ 4/5·max), a full hash gate. The audit passes
    // at every live version because torn states are unconstructible
    // under multi-table commits (the r11 verdict's top item).
    Query("x125d_versioned_bm25_index",
      bm25OracleOver(
        "WHERE doc_id <= (SELECT (max(doc_id) * 4) // 5 FROM documents)"),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x125d_") {
        dir =>
        import graft.ops.RetrievalOps
        val ss = new graft.sources.SnapshotStore(env.spark, dir)
        val maxId = env.documents.agg(max("doc_id")).head().getLong(0)
        val (t1, t2) = (maxId * 3 / 5, maxId * 4 / 5)
        RetrievalOps.buildBm25IndexVersioned(ss, "bm",
          env.documents.filter(col("doc_id") <= t1), "doc_id", "text")
        val batch1 = env.documents
          .filter(col("doc_id") > t1 && col("doc_id") <= t2)
        RetrievalOps.appendBm25BatchVersioned(ss, "bm", batch1,
          "doc_id", "text")
        val retried = RetrievalOps.appendBm25BatchVersioned(ss, "bm",
          batch1, "doc_id", "text")
        require(retried == 0L && ss.currentVersion("bm") == 2L,
          "retried append must commit nothing — not even a version")
        // kill-at-the-seam: the next append stages EVERYTHING (fresh
        // anti-join, tokenization, all three sub-table dirs, the
        // manifest) and dies before the swap
        val batch2 = env.documents.filter(col("doc_id") > t2)
        val base2 = RetrievalOps.freshBaseVersioned(ss, "bm",
          ss.currentVersion("bm"), batch2, "doc_id", "text")
        ss.claim("bm", 3L)
        ss.stageTables("bm", 3L, RetrievalOps.indexTablesOf(base2),
          Map.empty)
        graft.ops.RelOps.releaseCheckpoint(base2)
        require(ss.currentVersion("bm") == 2L, "death before swap: v2 holds")
        Seq(1L, 2L).foreach { v =>
          require(RetrievalOps.auditBm25IndexVersioned(ss, "bm",
            Some(v))._1, s"audit must pass at version $v")
        }
        RetrievalOps.probeBm25IndexVersioned(ss, "bm", "doc_id",
          Seq("window", "merge", "join")).orderBy("doc_id")
      }),

    // X126: hybrid-retrieval fusion — the BM25 keyword leg (x125's query)
    // and an embedding-cosine leg (similarity to vec 0) combined by
    // reciprocal-rank fusion, the calibration-free hybrid-search
    // combiner. Ranks come from scores ROUNDED to 6 on both engines (a
    // last-ulp wobble cannot flip a rank), tie-broken by id; the fusion
    // sum is a fixed-order chain of exact divisions, so the output
    // doubles hash-match with NO rounding.
    Query("x126_rrf_hybrid", {
      val c = graft.ops.RetrievalOps.bm25Constants(1.2, 0.75)
      Some(s"""WITH tok AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             |      t -> t <> '') AS t
             |  FROM documents),
             |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |        CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl FROM tok),
             |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM tok),
             |w AS (SELECT doc_id, unnest(t) AS w FROM tok),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
             |       FROM w WHERE w IN ('window', 'merge', 'join')
             |       GROUP BY doc_id, w),
             |dfq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
             |bm AS (SELECT tf.doc_id,
             |  round(sum(ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
             |    * (tf.tf * ${c("k1p1")})
             |    / (tf.tf + ${c("k1")} * (${c("oneMinusB")}
             |        + ${c("b")} * dl.dl / s.avgdl))), 6) AS score
             |  FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id) CROSS JOIN s
             |  GROUP BY tf.doc_id),
             |ra AS (SELECT doc_id,
             |  row_number() OVER (ORDER BY score DESC, doc_id) AS r0 FROM bm),
             |cos AS (SELECT e.vec_id AS doc_id,
             |  round(list_cosine_similarity(e.embedding::DOUBLE[],
             |    q.embedding::DOUBLE[]), 6) AS score
             |  FROM embeddings e CROSS JOIN
             |    (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
             |rb AS (SELECT doc_id,
             |  row_number() OVER (ORDER BY score DESC, doc_id) AS r1 FROM cos)
             |SELECT doc_id,
             |  CAST(CASE WHEN r0 IS NOT NULL THEN 1 ELSE 0 END
             |    + CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS n_legs,
             |  coalesce(1.0 / (60 + r0), 0.0)
             |    + coalesce(1.0 / (60 + r1), 0.0) AS rrf
             |FROM ra FULL OUTER JOIN rb USING (doc_id)
             |ORDER BY doc_id""".stripMargin)
      },
      env => {
        import graft.ops.RetrievalOps
        graft.functions.VecCosine.register(env.spark)
        val legA = RetrievalOps.bm25Scores(env.documents, "doc_id", "text",
            Seq("window", "merge", "join"))
          .select(col("doc_id"), col("bm25").as("score"))
        val q = env.embeddings.filter(col("vec_id") === 0)
          .select(transform(col("embedding"), v => v.cast("double")).as("qv"))
        val legB = env.embeddings
          .select(col("vec_id").as("doc_id"),
            transform(col("embedding"), v => v.cast("double")).as("v"))
          .crossJoin(broadcast(q))
          .select(col("doc_id"),
            round(graft.functions.VecCosine.vec_cosine(col("v"), col("qv")),
              6).as("score"))
        RetrievalOps.rrfFuse(Seq(legA, legB), "doc_id", "score")
          .orderBy("doc_id")
      }),

    // Zipf profile: global top-20 tokens with rank and corpus share — the
    // sanity check run on every tokenized corpus. The token-frequency
    // aggregate is checkpointed so the corpus tokenizes ONCE: both the
    // broadcast total and the ranked output read the (vocabulary-sized)
    // counts, not the raw corpus.
    Query("x58_zipf_topk",
      Some("""WITH w AS (
             |  SELECT unnest(list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS w
             |  FROM documents),
             |f AS (SELECT w, count(*) AS c FROM w GROUP BY w)
             |SELECT w, c,
             |  row_number() OVER (ORDER BY c DESC, w) AS rank,
             |  round(c / (SELECT sum(c) FROM f), 6) AS share
             |FROM f ORDER BY rank LIMIT 20""".stripMargin),
      env => {
        val f = env.documents
          .withColumn("toks", TextOps.tokens(col("text")))
          .select(explode_outer(col("toks")).as("w"))
          .filter(col("w").isNotNull)
          .groupBy("w").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val total = f.agg(sum("c").cast("double").as("tot"))
        f.crossJoin(broadcast(total))
          .select(col("w"), col("c"),
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(desc("c"), col("w"))).as("rank"),
            round(col("c") / col("tot"), 6).as("share"))
          .orderBy("rank").limit(20)
      }),

    // Bigram language-model statistics: top-20 bigrams by occurrence
    // (NOT per-doc-distinct — LM counts want every occurrence) with the
    // conditional probability p(w2 | w1). Both counts come from the same
    // exploded bigram frame: the prefix total is a windowed sum over the
    // first token, so the corpus is tokenized exactly once.
    Query("x59_bigram_stats",
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS t
             |  FROM documents),
             |bg AS (
             |  SELECT t[i+1] AS w1, t[i+2] AS w2
             |  FROM tok, UNNEST(range(len(t) - 1)) u(i)),
             |c AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY w1, w2)
             |SELECT w1, w2, n,
             |  round(n / sum(n) OVER (PARTITION BY w1), 6) AS p_cond,
             |  row_number() OVER (ORDER BY n DESC, w1, w2) AS rank
             |FROM c ORDER BY rank LIMIT 20""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        val bg = env.documents
          .withColumn("t", TextOps.tokens(col("text")))
          .filter(size(col("t")) >= 2)
          .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
            i => struct(element_at(col("t"), i + 1).as("w1"),
              element_at(col("t"), i + 2).as("w2")))).as("p"))
          .select(col("p.w1"), col("p.w2"))
        bg.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
          .withColumn("p_cond",
            round(col("n") / sum("n").over(Window.partitionBy("w1")), 6))
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("n"), col("w1"), col("w2"))))
          .orderBy("rank").limit(20)
      }),

    // Bigram language-model scoring of each document against the corpus
    // model — the KenLM/CCNet-style perplexity filter as one plan: the
    // corpus bigram conditional probabilities join back to every bigram
    // occurrence, and a document's score is the mean log-probability.
    // The same exploded bigram frame feeds both the model and the
    // scoring side (localCheckpoint: 3 consumers, one tokenize).
    Query("x60_lm_score",
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS t
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
             |  FROM tok, UNNEST(range(len(t) - 1)) u(i)),
             |c2 AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY w1, w2),
             |p AS (SELECT w1, w2, n / (sum(n) OVER (PARTITION BY w1)) AS pr
             |      FROM c2)
             |SELECT doc_id, round(avg(ln(pr)), 6) AS lm_score,
             |  count(*) AS n_bigrams
             |FROM bg JOIN p USING (w1, w2)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        val bg = env.documents
          .withColumn("t", TextOps.tokens(col("text")))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("t")) - 2),
              i => struct(element_at(col("t"), i + 1).as("w1"),
                element_at(col("t"), i + 2).as("w2")))).as("p"))
          .select(col("doc_id"), col("p.w1"), col("p.w2"))
          .localCheckpoint()
        val probs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
          .withColumn("pr", col("n") / sum("n").over(Window.partitionBy("w1")))
          .select("w1", "w2", "pr")
        bg.join(probs, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(round(avg(log(col("pr"))), 6).as("lm_score"),
            count(lit(1)).as("n_bigrams"))
          .orderBy("doc_id")
      }),

    // Near-dup CLUSTERS: connected components over the exact Jaccard pair
    // graph — the transitive-closure step that turns pairwise matches
    // into dedup groups (A~B, B~C ⇒ {A,B,C} even when A,C never pair).
    // Spark side: iterative min-label propagation, one shuffle per round,
    // checkpointed (SimilarityOps.connectedComponents — no edge list ever
    // reaches the driver). Oracle: recursive CTE reachability + min root.
    Query("x62_dedup_clusters",
      Some(s"WITH RECURSIVE ${OracleCtes.components}\n" +
        "SELECT doc_id, comp FROM cl ORDER BY doc_id"),
      env => {
        val edges = SimilarityOps
          .ngramJaccardPairs(env.documents, "doc_id", "text",
            maxShingleDf = 256)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        SimilarityOps.connectedComponents(edges)
          .select(col("id").as("doc_id"), col("comp"))
          .orderBy("doc_id")
      }),

    // X62c: INCREMENTAL components — the persisted (id, comp) state
    // ingests edge batches union-find-style (r11 verdict #2: clustering
    // was the one dedup stage without an O(batch) path). Waves model
    // arriving doc batches: build on the old-corpus edges, append the
    // wave-1 edges, append wave-2, retry wave-2 (must write NOTHING —
    // labels already merged ⇒ the reduced graph is empty). The final
    // state must hash-match x62's from-scratch recursive-CTE oracle over
    // the union of all edges — the same full-hash gate x120c gets.
    Query("x62c_incremental_components",
      Some(s"WITH RECURSIVE ${OracleCtes.components}\n" +
        "SELECT doc_id, comp FROM cl ORDER BY doc_id"),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x62c_") {
        dir =>
        val store = new graft.sources.TableStore(env.spark, dir)
        waveIngestComponents(env, store, "cc")
        // fold the merge-on-read deltas; reconciled labels must not move
        SimilarityOps.compactComponentsState(store, "cc")
        SimilarityOps.readComponentsState(store, "cc")
          .select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
      }),

    // X62d: the VERSIONED component state — x62c's lifecycle routed
    // through SnapshotStore's atomic CASed commits on the id-BUCKETED
    // layout, closing the last index family outside the versioned store
    // (minhash/BM25/novelty/IVF/SemDeDup graduated in r12/r13). Build
    // v1 on the wave-0 edges, fold waves 1 and 2 (one atomic version
    // each), RETRY wave 2 (must commit nothing — not even a version),
    // then stage a GHOST relabel completely (comps commit_v partition +
    // manifest) and DIE before the pointer swap — the pinned version
    // must keep serving; self-heal via releaseDeadClaims (the streaming
    // sink's recovery), compact (the retry path clears the crashed
    // partition before rewriting), and require a TIME-TRAVELED v1 read
    // ≡ a from-scratch CC over exactly the wave-0 edges. Output = the
    // reconciled labels, hash-gated against x62's recursive-CTE oracle
    // over the union of all edges.
    Query("x62d_versioned_components",
      Some(s"WITH RECURSIVE ${OracleCtes.components}\n" +
        "SELECT doc_id, comp FROM cl ORDER BY doc_id"),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x62d_") {
        dir =>
        val ss = new graft.sources.SnapshotStore(env.spark, dir)
        val (edges, slice) = waveEdgeSlices(env)
        try {
          SimilarityOps.buildComponentsStateVersioned(ss, "cc", slice(0))
          SimilarityOps.appendComponentEdgesVersioned(ss, "cc", slice(1))
          SimilarityOps.appendComponentEdgesVersioned(ss, "cc", slice(2))
          val vPin = ss.currentVersion("cc")
          val retried = SimilarityOps.appendComponentEdgesVersioned(ss,
            "cc", slice(2))
          require(retried == 0L && ss.currentVersion("cc") == vPin,
            "retried batch must commit nothing — not even a version")
          // kill-pre-swap: a ghost relabel fully staged, dead pre-swap
          val ghostRaw = slice(2)
            .select((col("a") + 900000000L).as("a"),
              (col("b") + 900000000L).as("b")).localCheckpoint()
          val ghost = SimilarityOps.componentAppendRows(
            ss.readTableVersion("cc", vPin, "comps"), ghostRaw)
          ss.claim("cc", vPin + 1)
          ss.stageTables("cc", vPin + 1, Map("comps" -> ghost), Map.empty)
          graft.ops.RelOps.releaseCheckpoint(ghost)
          graft.ops.RelOps.releaseCheckpoint(ghostRaw)
          require(ss.currentVersion("cc") == vPin,
            "death before swap: the pinned version holds")
          // single-writer self-heal, then compaction re-claims the dead
          // number and clears its crashed commit_v partition
          ss.releaseDeadClaims("cc")
          SimilarityOps.compactComponentsStateVersioned(ss, "cc")
          // time travel: v1 ≡ from-scratch CC over exactly wave 0
          val scratch = SimilarityOps.connectedComponents(slice(0))
          val v1 = SimilarityOps
            .readComponentsStateVersioned(ss, "cc", Some(1L))
            .select(col("id").as("v_id"), col("comp").as("v_comp"))
          val drift = scratch.join(v1,
              col("id") === col("v_id") && col("comp") === col("v_comp"),
              "full_outer")
            .filter(col("id").isNull || col("v_id").isNull).count()
          graft.ops.RelOps.releaseCheckpoint(scratch)
          require(drift == 0L, s"time-traveled v1 state drifted: $drift")
          // checkpoint BEFORE dropping the catalog registration — the
          // lazy read re-resolves the table name at collect time (the
          // probeNoveltyCore discipline); swept per-query by the harness
          val state = SimilarityOps.readComponentsStateVersioned(ss, "cc")
            .localCheckpoint()
          ss.dropCatalogTables("cc")
          state.select(col("id").as("doc_id"), col("comp"))
            .orderBy("doc_id")
        } finally graft.ops.RelOps.releaseCheckpoint(edges)
      }),

    // X129: leakage-safe split — train/val/test assigned by NEAR-DUP
    // CLUSTER (x62's components; singletons are their own cluster), so a
    // test doc can never have a near-copy in train. Deterministic
    // md5-uniform on the cluster label against literal cumulative bounds
    // (x94's discipline) — reproducible across engines and reruns, and
    // the oracle recomputes the whole assignment including the recursive
    // CC.
    Query("x129_leakage_safe_split", leakageSplitOracle,
      env => {
        val edges = SimilarityOps
          .ngramJaccardPairs(env.documents, "doc_id", "text",
            maxShingleDf = 256)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        SimilarityOps.leakageSafeSplit(env.documents, "doc_id", edges,
            Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
          .orderBy("doc_id")
      }),

    // X129b: the leakage-safe split served FROM THE PERSISTED COMPONENT
    // STATE — the incremental curation path x62c enables: edges ingest
    // in waves (build + two appends + no-op retry, as in x62c), then the
    // split assignment reads readComponentsState instead of running a
    // from-scratch CC. Must hash-match x129's EXACT oracle (which does
    // recompute everything from scratch) — proving a per-batch ingest
    // loop reproduces the one-shot curation split byte-for-byte, the
    // flattening answer to the r11 verdict's curation-probe item.
    Query("x129b_incremental_split", leakageSplitOracle,
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x129b_") {
        dir =>
        val store = new graft.sources.TableStore(env.spark, dir)
        waveIngestComponents(env, store, "cc")
        SimilarityOps.assignSplitsByComponent(env.documents, "doc_id",
            SimilarityOps.readComponentsState(store, "cc"),
            Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
          .orderBy("doc_id")
      }),

    // X129c: the leakage-safe split drawn from a PINNED VERSION of the
    // versioned component state — training-time reproducibility (the
    // x127b feature-table contract) for dedup state: the split's
    // version is pinned by a NAMED TAG (X141v), then a BRIDGE edge
    // joining two real components relabels the current state
    // (require-pinned to actually commit) AND a keep-last-1 retention
    // policy runs — which, without the tag, would expire the pinned
    // version and silently break reproducibility (the r14 verdict's
    // missing-tags gap). The tag clamps the sweep, so the tag-resolved
    // assignment still hash-matches the oracle computed over the
    // pre-bridge edge set. The plain x62c layout cannot make this
    // promise — its state has no versions to pin.
    Query("x129c_versioned_split", leakageSplitOracle,
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x129c_") {
        dir =>
        import env.spark.implicits._
        val ss = new graft.sources.SnapshotStore(env.spark, dir)
        waveIngestComponentsVersioned(env, ss, "cc")
        ss.tag("cc", "split-pin", ss.currentVersion("cc"))
        val vPin = ss.readTag("cc", "split-pin")
        // two distinct current component labels, deterministically; a
        // bridge between their min members MUST relabel (the labels
        // differ), making the pin below load-bearing
        val comps = SimilarityOps.readComponentsStateVersioned(ss, "cc")
          .groupBy("comp").agg(min("id").as("m"))
          .orderBy("comp").limit(2).collect()
        if (comps.length == 2) {
          val bridged = SimilarityOps.appendComponentEdgesVersioned(ss,
            "cc", Seq((comps(0).getLong(1), comps(1).getLong(1)))
              .toDF("a", "b"))
          require(bridged > 0L && ss.currentVersion("cc") > vPin,
            "bridge edge must relabel the current state")
        }
        // the nightly sweep: keep-last-1 WANTS to expire vPin; the tag
        // must clamp it so the pinned split stays reproducible
        ss.expireByPolicy("cc", keepLast = 1)
        require(ss.versions("cc").head == vPin,
          s"the tag must hold the retention floor at v$vPin")
        // resolve the pin THROUGH the tag + materialize before dropping
        // the catalog registration (the x62d/probeNoveltyCore discipline)
        val pinned = SimilarityOps.readComponentsStateVersioned(ss, "cc",
          Some(ss.readTag("cc", "split-pin"))).localCheckpoint()
        ss.dropCatalogTables("cc")
        SimilarityOps.assignSplitsByComponent(env.documents, "doc_id",
            pinned, Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
          .orderBy("doc_id")
      }),

    // X139: the dataset card — per-source corpus summary (doc/token
    // volumes, mean length, quality-pass and exact-dup counts, language
    // breadth) in ONE tokenize pass + one window over the fingerprint +
    // one grouped rollup: the numbers a dataset release documents, and
    // the per-ingest report a 100 TB pipeline appends to its lineage
    // table. Token totals are exact longs (mean = one deterministic
    // division), so everything hashes exactly.
    Query("x139_dataset_card",
      Some("""WITH d AS (SELECT doc_id, source, lang,
             |    list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |      x -> x <> '') AS ws,
             |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
             |  FROM documents),
             |e AS (SELECT doc_id, source, lang,
             |    min(doc_id) OVER (PARTITION BY h) AS keeper,
             |    len(ws) AS nw,
             |    (len(ws) BETWEEN 50 AND 100000)
             |      AND (round(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
             |            / greatest(len(ws), 1), 6) BETWEEN 3 AND 10)
             |      AND (round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
             |            / greatest(len(ws), 1), 6) >= 0.8) AS keep
             |  FROM d)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(nw) AS BIGINT) AS n_tokens,
             |  round(CAST(sum(nw) AS DOUBLE) / count(*), 6) AS mean_tokens,
             |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_exact_dup,
             |  count(DISTINCT lang) AS n_langs
             |FROM e GROUP BY source ORDER BY source""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        val ws = filter(split(lower(trim(col("text"))), "\\s+"),
          x => x =!= "")
        val nWords = size(col("ws")).cast("long")
        val keep = nWords.between(50, 100000) &&
          round(aggregate(transform(col("ws"),
              x => length(x).cast("long")), lit(0L), (acc, x) => acc + x)
            / greatest(nWords, lit(1L)), 6).between(3, 10) &&
          (round(size(filter(col("ws"), x => x.rlike("[a-z]")))
            .cast("long") / greatest(nWords, lit(1L)), 6) >= 0.8)
        env.documents
          .select(col("doc_id"), col("source"), col("lang"), ws.as("ws"),
            TextOps.fingerprint(col("text")).as("h"))
          .withColumn("keeper",
            min("doc_id").over(Window.partitionBy("h")))
          .select(col("source"), col("lang"), nWords.as("nw"),
            keep.as("keep"), (col("doc_id") =!= col("keeper")).as("is_dup"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("nw").as("n_tokens"),
            round(sum("nw").cast("double") / count(lit(1)), 6)
              .as("mean_tokens"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
            countDistinct("lang").as("n_langs"))
          .orderBy("source")
      }),

    // X136: the END-TO-END curation pipeline as one plan — the flagship
    // composition a corpus team actually runs: exact dedup (fingerprint,
    // keep-min-id) → near-dup dedup (Jaccard components, keep the
    // component label = min id) → Gopher quality gate (x33's rules) →
    // cluster-aware leakage-safe split (X129) for the survivors. One
    // disposition row per document with the FIRST failing stage named;
    // split is null unless kept. The oracle recomputes every stage in
    // SQL (fingerprint groups, recursive-CTE components, quality
    // booleans, md5-uniform split), so the hash gates the whole chain's
    // composition, not just its pieces.
    Query("x136_curation_pipeline",
      Some(s"WITH RECURSIVE ${OracleCtes.components},\n" +
        """fp AS (SELECT doc_id,
          |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
          |  FROM documents),
          |fpk AS (SELECT h, min(doc_id) AS keeper FROM fp GROUP BY h),
          |q AS (SELECT doc_id,
          |    (len(ws) BETWEEN 50 AND 100000)
          |      AND (round(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
          |            / greatest(len(ws), 1), 6) BETWEEN 3 AND 10)
          |      AND (round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
          |            / greatest(len(ws), 1), 6) >= 0.8) AS keep
          |  FROM (SELECT doc_id,
          |      list_filter(str_split_regex(lower(trim(text)), '\s+'),
          |        x -> x <> '') AS ws FROM documents) t),
          |allc AS (SELECT d.doc_id, coalesce(cl.comp, d.doc_id) AS comp
          |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
          |u AS (SELECT doc_id, comp,
          |  (('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 8))::BIGINT
          |    + 0.5) / 4294967296.0 AS uu FROM allc)
          |SELECT f.doc_id,
          |  CASE WHEN f.doc_id <> fpk.keeper THEN 'exact_dup'
          |       WHEN u.comp <> f.doc_id THEN 'near_dup'
          |       WHEN NOT q.keep THEN 'low_quality'
          |       ELSE 'kept' END AS disposition,
          |  CASE WHEN f.doc_id = fpk.keeper AND u.comp = f.doc_id AND q.keep
          |    THEN CASE WHEN uu < 0.8 THEN 'train' WHEN uu < 0.9 THEN 'val'
          |         ELSE 'test' END END AS split
          |FROM fp f JOIN fpk USING (h) JOIN q USING (doc_id)
          |  JOIN u USING (doc_id)
          |ORDER BY f.doc_id""".stripMargin),
      env => curationDispositions(env.documents).orderBy("doc_id")),

    // X136b: dataset releases as NAMED TAGS on snapshot versions — the
    // rounds-10+11 capstone, upgraded by X141v: the curation pipeline's
    // disposition table commits through SnapshotStore per corpus
    // snapshot (v1 = the initial 4/5 corpus, v2 = the full corpus),
    // each release TAGGED by name; a keep-last-1 retention policy then
    // runs and the tag must keep release-1 readable (without it the
    // sweep expires v1 and the published release 404s — the r14
    // verdict's missing-tags gap). Both releases read back through
    // their TAGS — release-1 via time travel. The oracle runs the
    // ENTIRE x136 pipeline TWICE (suffix-parameterized CTEs over each
    // corpus snapshot, incl. the recursive components) and aggregates
    // dispositions per release, so the hash gates the composition of
    // curation × versioned storage × named releases end to end.
    Query("x136b_versioned_curation",
      Some("WITH RECURSIVE " +
        dispositionCtesOver(
          "WHERE doc_id <= (SELECT max(doc_id) * 4 // 5 FROM documents)",
          "_a") + ",\n" +
        dispositionCtesOver("", "_b") + "\n" +
        """SELECT * FROM (
          |  SELECT 'v1_initial_release' AS version, disposition,
          |    count(*) AS n FROM disp_a GROUP BY disposition
          |  UNION ALL
          |  SELECT 'v2_full_release' AS version, disposition,
          |    count(*) AS n FROM disp_b GROUP BY disposition)
          |ORDER BY version, disposition""".stripMargin),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x136b_") {
        dir =>
        val ss = new graft.sources.SnapshotStore(env.spark, dir)
        val cut = env.documents.agg(max("doc_id")).head().getLong(0) * 4 / 5
        ss.commitOverwrite("release",
          curationDispositions(env.documents.filter(col("doc_id") <= cut))
            .select("doc_id", "disposition"))
        ss.tag("release", "release-1", 1L)
        ss.commitOverwrite("release",
          curationDispositions(env.documents)
            .select("doc_id", "disposition"))
        ss.tag("release", "release-2", 2L)
        // the nightly sweep wants only the last version; the tag must
        // hold the floor so the published release-1 stays addressable
        ss.expireByPolicy("release", keepLast = 1)
        require(ss.versions("release") == Seq(1L, 2L),
          "tagged releases must survive the keep-last-1 policy")
        def agg(label: String,
                df: org.apache.spark.sql.DataFrame) =
          df.groupBy("disposition").agg(count(lit(1)).as("n"))
            .select(lit(label).as("version"), col("disposition"), col("n"))
        agg("v1_initial_release", ss.readTagged("release", "release-1"))
          .unionByName(agg("v2_full_release",
            ss.readTagged("release", "release-2")))
          .orderBy("version", "disposition")
      }),

    // End-to-end near-dup dedup: every document lands in a cluster
    // (its connected component, or itself if it pairs with nothing) and
    // each cluster keeps its best representative (longest text, ties to
    // the smallest id) — the final "survivors" list a curation pipeline
    // feeds downstream, with cluster size for audit.
    Query("x63_neardup_survivors",
      Some(s"WITH RECURSIVE ${OracleCtes.components},\n" +
        """alldocs AS (
          |  SELECT d.doc_id, coalesce(cl.comp, d.doc_id) AS comp, d.n_chars
          |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
          |SELECT comp, doc_id AS kept_doc_id, n_members FROM (
          |  SELECT comp, doc_id,
          |    count(*) OVER (PARTITION BY comp) AS n_members,
          |    row_number() OVER (PARTITION BY comp
          |      ORDER BY n_chars DESC, doc_id) AS rn
          |  FROM alldocs) t
          |WHERE rn = 1 ORDER BY comp""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        val edges = SimilarityOps
          .ngramJaccardPairs(env.documents, "doc_id", "text",
            maxShingleDf = 256)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        val clusters = SimilarityOps.connectedComponents(edges)
          .withColumnRenamed("id", "doc_id")
        val allDocs = env.documents.select("doc_id", "n_chars")
          .join(clusters, Seq("doc_id"), "left_outer")
          .withColumn("comp", coalesce(col("comp"), col("doc_id")))
        allDocs
          .withColumn("n_members", count(lit(1)).over(Window.partitionBy("comp")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("comp").orderBy(desc("n_chars"), col("doc_id"))))
          .filter(col("rn") === 1)
          .select(col("comp"), col("doc_id").as("kept_doc_id"), col("n_members"))
          .orderBy("comp")
      }),

    // The SCALE path of x62: same connected-components clustering, but
    // the pair graph comes from MinHash+LSH banding instead of the exact
    // all-pairs Jaccard join — at 100 TB only this path runs. Rows-only
    // (engine-specific minhash); SimilarityOpsSpec asserts the clusters
    // equal the exact-pair clusters.
    Query("x65_minhash_clusters",
      None,
      env => {
        val edges = SimilarityOps
          .minhashNearDups("doc_id", "text")(env.documents)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        SimilarityOps.connectedComponents(edges)
          .select(col("id").as("doc_id"), col("comp"))
          .orderBy("doc_id")
      }),

    // Sketch-partial-merge rollup: per-DAY HLL sketches of distinct
    // customers, unioned up to per-priority totals — the mergeable-
    // aggregate pattern a 100 TB rollup table lives on (daily sketch
    // partials persist once; any coarser rollup is a cheap union, never
    // a re-scan of the facts). Engine-specific sketch hashing →
    // rows-only; estimate accuracy vs exact distinct is pinned in
    // PropertySpec (X7d).
    Query("x64_hll_rollup",
      None,
      env => {
        val daily = env.orders
          .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        daily.groupBy("o_orderpriority")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("approx_custs"))
          .orderBy("o_orderpriority")
      }),

    // Count-min-sketch point-frequency estimates for the event types —
    // the third mergeable sketch in the family (HLL distinct, GK
    // quantiles, CMS frequencies). Sketch built in one distributed pass;
    // only the fixed-size sketch reaches the driver. Engine-specific
    // hashing → rows-only; the CMS guarantees (no underestimate, bounded
    // overestimate) are property-tested in PropertySpec (X7c).
    Query("x61_cms_counts",
      None,
      env => graft.ops.SketchOps.cmsCounts(env.events,
          "event_type", Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("event_type")),

    // X61b: the CMS CONTRACT, hash-checked (x7c discipline): a count-min
    // estimate never underestimates, and overestimates by at most ε·N
    // (ε = 1e-4, N = stream length) with confidence 1−δ. Computed
    // in-engine against the exact counts; the oracle emits the guaranteed
    // outcome, so a sketch regression (hashing, depth/width sizing,
    // merge) flips the hash in the driver artifact. The +1 absorbs the
    // ceil at tiny ε·N.
    Query("x61_cms_bound",
      Some("""SELECT event_type, true AS within_band FROM events
             |WHERE event_type IN
             |  ('click','error','purchase','signup','view')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      env => {
        val cands = Seq("click", "error", "purchase", "signup", "view")
        val est = graft.ops.SketchOps.cmsCounts(env.events,
          "event_type", cands)
        val exact = env.events.filter(col("event_type").isin(cands: _*))
          .groupBy("event_type").agg(count(lit(1)).as("exact_n"))
        val total = env.events.agg(count(lit(1)).as("stream_n"))
        exact.join(broadcast(est), "event_type")
          .crossJoin(broadcast(total))
          .select(col("event_type"),
            (col("est_n") >= col("exact_n") &&
             col("est_n") <= col("exact_n") +
               ceil(col("stream_n") * 0.0001) + 1).as("within_band"))
          .orderBy("event_type")
      }),

    // X98: Misra-Gries heavy-hitters contract — the enumeration
    // companion to CMS point queries: one mergeable-summary pass over
    // ~150k document tokens with k=32 must (a) contain EVERY token whose
    // true count exceeds N/(k+1), (b) never overestimate, (c) never
    // underestimate by more than N/(k+1). Which light tokens ride along
    // is merge-order-dependent, so the contract checks the bounds, never
    // tail membership; the oracle recomputes exact counts and n_heavy.
    Query("x98_mg_bound",
      Some("""WITH tok AS (
             |  SELECT unnest(list_filter(str_split_regex(lower(trim(text)), '\s+'),
             |    x -> x <> '')) AS t
             |  FROM documents),
             |c AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM c)
             |SELECT (SELECT count(*) FROM c, tot
             |        WHERE n > big_n / 33.0) AS n_heavy,
             |  true AS heavy_all_present, true AS est_bounded""".stripMargin),
      env => {
        val k = 32
        val toks = env.documents
          .select(explode_outer(TextOps.tokens(col("text"))).as("t"))
          .filter(col("t").isNotNull)
        // one distributed pass; only the <=k-entry summary reaches the
        // driver (same fixed-size-sketch discipline as cmsCounts)
        val mg = graft.ops.SketchOps.mgHeavyHitters(toks, "t", k)
        val est = env.spark.createDataFrame(mg.toSeq).toDF("t", "est")
        val exact = toks.groupBy("t").agg(count(lit(1)).as("n"))
        val tot = exact.agg(sum("n").cast("bigint").as("big_n"))
        exact.join(broadcast(est), Seq("t"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("thr", col("big_n") / lit((k + 1).toDouble))
          .agg(
            sum(when(col("n") > col("thr"), 1L).otherwise(0L)).as("n_heavy"),
            coalesce(expr("bool_and(CASE WHEN n > thr THEN est IS NOT NULL END)"),
              lit(true)).as("heavy_all_present"),
            coalesce(expr("bool_and(CASE WHEN est IS NOT NULL " +
              "THEN est <= n AND n - est <= thr END)"),
              lit(true)).as("est_bounded"))
      }),

    // X64b: the HLL ROLLUP contract, hash-checked: the per-priority
    // estimate obtained by UNIONING daily sketch partials (the mergeable-
    // aggregate path x64_hll_rollup persists) must land within 15% of the
    // exact distinct count — the same 3·rsd-style band x7_distinct_bound
    // uses, generous against the default lgConfigK=12 sketch's ~1.6% rsd.
    // This checks the MERGE specifically: a partial-union bug (double
    // counting, register clobbering) shifts the estimate far outside the
    // band while a per-day sketch alone might still look sane.
    Query("x64_hll_bound",
      Some("""SELECT o_orderpriority, true AS within_band
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      env => {
        val daily = env.orders
          .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        val est = daily.groupBy("o_orderpriority")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
        val exact = env.orders.groupBy("o_orderpriority")
          .agg(countDistinct(col("o_custkey")).as("e"))
        exact.join(est, "o_orderpriority")
          .select(col("o_orderpriority"),
            (abs(col("a") - col("e")) <= col("e") * 0.15).as("within_band"))
          .orderBy("o_orderpriority")
      }),

    // X69: DSIR data selection (TextOps.dsirScores) — importance-score
    // every document against the English subset as the target domain and
    // select the top 20. The oracle recomputes the full add-1-smoothed
    // unigram log-ratio pipeline in SQL. Ordering is on the ROUNDED score
    // (6 dp) with doc_id tiebreak so a last-ulp double disagreement
    // between engines cannot flip ranks.
    Query("x69_dsir_select",
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS t
             |  FROM documents),
             |dc AS (
             |  SELECT doc_id, lang, word, count(*) AS n
             |  FROM (SELECT doc_id, lang, unnest(t) AS word FROM tok)
             |  GROUP BY 1, 2, 3),
             |ft AS (SELECT word, sum(n) AS nr,
             |    sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS nt
             |  FROM dc GROUP BY 1),
             |tot AS (SELECT sum(nr) AS tot_r, sum(nt) AS tot_t,
             |    CAST(count(*) AS DOUBLE) AS vocab FROM ft),
             |wt AS (SELECT word,
             |    ln((nt + 1.0) / (tot_t + vocab))
             |      - ln((nr + 1.0) / (tot_r + vocab)) AS w
             |  FROM ft, tot),
             |sc AS (SELECT dc.doc_id, CAST(sum(dc.n) AS BIGINT) AS n_tokens,
             |    round(sum(dc.n * wt.w) / sum(dc.n), 6) AS dsir_score
             |  FROM dc JOIN wt USING (word) GROUP BY 1)
             |SELECT doc_id, n_tokens, dsir_score,
             |  row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS rank
             |FROM sc ORDER BY dsir_score DESC, doc_id LIMIT 20""".stripMargin),
      env => {
        import org.apache.spark.sql.expressions.Window
        TextOps.dsirScores(env.documents, "doc_id", "text",
            isTarget = col("lang") === "en")
          .withColumn("dsir_score", round(col("dsir_score"), 6))
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("dsir_score"), col("doc_id"))))
          .select("doc_id", "n_tokens", "dsir_score", "rank")
          .orderBy(desc("dsir_score"), col("doc_id")).limit(20)
      }),

    // X69b: the DSIR train/serve split — fit the weight table on the
    // first 4/5 of the corpus (by id), persist it, score the held-out
    // 1/5 with one tokenize + one weight join (O(batch), corpus never
    // re-read). The oracle refits the weights and rescores the batch in
    // SQL; out-of-vocabulary score-time words drop out of both sums on
    // both sides. Top-10 selection of the held-out batch, hash-gated.
    Query("x69b_dsir_score_batch",
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, list_filter(
             |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS t
             |  FROM documents),
             |dc AS (
             |  SELECT doc_id, lang, word, count(*) AS n
             |  FROM (SELECT doc_id, lang, unnest(t) AS word FROM tok)
             |  GROUP BY 1, 2, 3),
             |cut AS (SELECT (max(doc_id) * 4) // 5 AS cut FROM documents),
             |ft AS (SELECT word, sum(n) AS nr,
             |    sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS nt
             |  FROM dc, cut WHERE doc_id <= cut GROUP BY 1),
             |tot AS (SELECT sum(nr) AS tot_r, sum(nt) AS tot_t,
             |    CAST(count(*) AS DOUBLE) AS vocab FROM ft),
             |wt AS (SELECT word,
             |    ln((nt + 1.0) / (tot_t + vocab))
             |      - ln((nr + 1.0) / (tot_r + vocab)) AS w
             |  FROM ft, tot),
             |sc AS (SELECT dc.doc_id, CAST(sum(dc.n) AS BIGINT) AS n_tokens,
             |    round(sum(dc.n * wt.w) / sum(dc.n), 6) AS dsir_score
             |  FROM dc JOIN wt USING (word), cut
             |  WHERE dc.doc_id > cut GROUP BY 1)
             |SELECT doc_id, n_tokens, dsir_score,
             |  row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS rank
             |FROM sc ORDER BY dsir_score DESC, doc_id LIMIT 10""".stripMargin),
      env => CdcQueries.withTempTableSummary(env.spark, "graft_x69b_") {
        dir =>
        import org.apache.spark.sql.expressions.Window
        val store = new graft.sources.TableStore(env.spark, dir)
        val maxId = env.documents.agg(max("doc_id")).head().getLong(0)
        val cut = maxId * 4 / 5
        TextOps.buildDsirWeights(store, "x69b_dsir",
          env.documents.filter(col("doc_id") <= cut), "doc_id", "text",
          isTarget = col("lang") === "en")
        TextOps.scoreDsirBatch(store, "x69b_dsir",
            env.documents.filter(col("doc_id") > cut), "doc_id", "text")
          .withColumn("dsir_score", round(col("dsir_score"), 6))
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("dsir_score"), col("doc_id"))))
          .select("doc_id", "n_tokens", "dsir_score", "rank")
          .orderBy(desc("dsir_score"), col("doc_id")).limit(10)
      })
  )
}
