package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X33 text-analysis operators for LLM-data pipelines (SURVEY §2.10).
  * Everything stays inside whole-stage codegen: built-in string/array
  * functions and higher-order lambdas, no Scala UDFs in the hot path.
  */
object TextOps {

  /** Whitespace tokenization of lowercased text. Empty tokens are dropped:
    * split on blank input yields [""], which would otherwise count a
    * phantom token and give every blank document an identical shingle/
    * simhash signature. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Word n-gram shingles (distinct) from a token array, for Jaccard /
    * minhash dedup. slice() is 1-based; sequence() enumerates 0-based
    * shingle start offsets. Documents shorter than n shingle to empty. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** shingles(text) re-evaluates the tokenizing split() for every shingle
    * offset (O(tokens²) regex work per doc) because the token array is
    * inlined into the slice lambda. Fine for tiny inputs/tests; hot paths
    * must use `withShingles`, which projects the token array into its own
    * column first — Catalyst keeps the projection boundary (non-cheap
    * alias referenced 3×), so split() runs once per document. */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** Adds `out` = n-gram shingle array of `textCol`, tokenizing once per
    * row. ~10× faster than shingles() on real documents. */
  def withShingles(df: org.apache.spark.sql.DataFrame, textCol: String,
                   n: Int, out: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn(out, shinglesFromTokens(col("__toks"), n))
      .drop("__toks")

  /** One (id, shingle) row per document shingle. Uses explode_outer + a
    * null filter instead of explode: InferFiltersFromGenerate would infer
    * `size(shingles)>0` for a plain explode and push it below the token
    * projection, re-inlining the O(tokens²) shingle expression into the
    * filter (measured 35× slower at sf0.1). */
  def explodeShingles(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    withShingles(df, textCol, n, "__sh")
      .select(col(idCol), explode_outer(col("__sh")).as("s"))
      .filter(col("s").isNotNull)

  /** Token count per document. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Punctuation character count (quality-scoring feature). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;]", ""))

  /** Stopword occurrences (quality-scoring feature). */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

  def stopwordCount(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t)))
  }

  /** BPE-ish subword token count: counts matches of a wordpiece-style
    * pattern (letter runs / single digits / punctuation runs). The pattern
    * avoids lookahead so Java regex (Spark) and RE2 (DuckDB oracle) agree. */
  val bpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Document fingerprint: content hash over whitespace-normalized text —
    * the scalable exact-dedup key (X30). */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** Heuristic language ID from character-class and stopword signals.
    * A real pipeline plugs in trained n-gram profiles; the operator shape
    * (pure column expression, no shuffle) is what matters at scale. */
  def langIdHeuristic(text: Column): Column = {
    val t = lower(text)
    when(length(regexp_replace(t, "[^\\u4e00-\\u9fff]", "")) > 0, lit("zh"))
      .when(t.rlike("\\b(der|die|das|und|nicht|ist)\\b"), lit("de"))
      .when(t.rlike("\\b(el|la|los|las|es|y|que)\\b"), lit("es"))
      .when(t.rlike("\\b(le|les|est|et|une|dans)\\b"), lit("fr"))
      .otherwise(lit("en"))
  }

  /** X69: DSIR-style data-selection scoring (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection for Language Models via Importance
    * Resampling"): score every raw-corpus document by how target-like its
    * unigram distribution is. weight(w) = ln p_target(w) − ln p_raw(w)
    * with add-1 smoothing over the raw vocabulary; a document's score is
    * its token-frequency-weighted mean log-ratio, so selection = take the
    * top-scored docs (or Gumbel-resample on the scores).
    *
    * One tokenize pass feeds everything: (doc, feature) counts roll up to
    * per-feature raw/target totals (map-side partial aggs), the weight
    * table joins back on the feature key, and the per-doc score is one
    * more aggregate — three shuffles total, none of them all-pairs.
    *
    * `nBuckets` = 0 keeps raw words as features (exact; SQL-oracle-able).
    * At 100 TB vocabulary the paper's formulation hashes features into a
    * fixed bucket space — nBuckets > 0 switches the SAME plan to
    * pmod(xxhash64(word), nBuckets) keys, bounding the weight table (it
    * then broadcasts) at the cost of collision noise; the spec pins
    * hashed≈raw rank agreement.
    *
    * `isTarget` marks the in-domain rows (e.g. lang = 'en', a quality
    * flag, or a join against a curated seed set).
    * Returns (idCol, n_tokens, dsir_score). */
  def dsirScores(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, isTarget: Column,
                 nBuckets: Int = 0): org.apache.spark.sql.DataFrame = {
    val dc = docFeatureCounts(docs, idCol, textCol,
      Some(isTarget), nBuckets)
    scoreWithWeights(dc, dsirWeightsFromCounts(dc, nBuckets), idCol,
      nBuckets)
  }

  /** Per-(doc, feature) token counts — the shared first pass of the DSIR
    * train and score sides. feat = raw word (nBuckets = 0) or hashed
    * bucket. */
  private[graft] def docFeatureCounts(
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      isTarget: Option[Column], nBuckets: Int): org.apache.spark.sql.DataFrame = {
    val feat = if (nBuckets > 0) pmod(xxhash64(col("word")), lit(nBuckets))
               else col("word")
    val base = docs.select(col(idCol) +:
      isTarget.map(_.as("is_tgt")).toSeq :+
      explode(tokens(col(textCol))).as("word"): _*)
    val keys = Seq(idCol) ++ isTarget.map(_ => "is_tgt") :+ "feat"
    base.withColumn("feat", feat)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** The add-1-smoothed log-likelihood-ratio weight table from a
    * (doc, is_tgt, feat, n) count frame. */
  private[graft] def dsirWeightsFromCounts(
      dc: org.apache.spark.sql.DataFrame,
      nBuckets: Int): org.apache.spark.sql.DataFrame = {
    val featTotals = dc.groupBy("feat")
      .agg(sum("n").as("nr"),
        sum(when(col("is_tgt"), col("n")).otherwise(0L)).as("nt"))
    val totals = featTotals
      .agg(sum("nr").as("tot_r"), sum("nt").as("tot_t"),
        count(lit(1)).cast("double").as("vocab"))
    featTotals.crossJoin(totals)
      .select(col("feat"),
        (log((col("nt") + 1.0) / (col("tot_t") + col("vocab"))) -
          log((col("nr") + 1.0) / (col("tot_r") + col("vocab")))).as("w"))
  }

  /** Token-weighted mean log-ratio per doc. Features absent from the
    * weight table (out-of-vocabulary at score time) drop out of BOTH
    * sums — an unseen word is evidence for neither side. */
  private[graft] def scoreWithWeights(
      dc: org.apache.spark.sql.DataFrame,
      weightsRaw: org.apache.spark.sql.DataFrame, idCol: String,
      nBuckets: Int): org.apache.spark.sql.DataFrame = {
    // bucketed feature spaces are bounded (weight table rows <= nBuckets)
    // — broadcast so the score join is map-side; a raw vocabulary scales
    // with the corpus and must shuffle-join
    val weights = if (nBuckets > 0) broadcast(weightsRaw) else weightsRaw
    dc.join(weights, "feat")
      .groupBy(idCol)
      .agg(sum("n").as("n_tokens"),
        (sum(col("n") * col("w")) / sum("n")).as("dsir_score"))
  }

  /** X69b: the TRAIN/SERVE split of DSIR — fit the weight table once on a
    * reference corpus and persist it; every arriving batch is scored with
    * one tokenize pass + one join against the frozen table, O(batch)
    * work, corpus never re-read (the X31c/X32f/X68c ingestion
    * discipline on the selection side). */
  def buildDsirWeights(store: graft.sources.TableStore, name: String,
                       docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, isTarget: Column,
                       nBuckets: Int = 0): Unit = {
    val dc = docFeatureCounts(docs, idCol, textCol, Some(isTarget), nBuckets)
    store.overwrite(s"${name}_weights", dsirWeightsFromCounts(dc, nBuckets))
    // the feature space is part of the model: persist it so the score
    // side cannot silently tokenize into a different space (a raw-vs-
    // hashed or bucket-count mismatch would join to nothing and be
    // indistinguishable from an all-OOV batch)
    val spark = docs.sparkSession
    import spark.implicits._
    store.overwrite(s"${name}_meta", Seq(nBuckets).toDF("n_buckets"))
  }

  /** Score a batch against persisted weights — see [[buildDsirWeights]].
    * The feature space (raw words vs hashed buckets and the bucket
    * count) is read from the persisted model, never re-specified.
    * Returns (idCol, n_tokens, dsir_score); docs whose every token is
    * out-of-vocabulary produce no row (no evidence, no score). */
  def scoreDsirBatch(store: graft.sources.TableStore, name: String,
                     batch: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val nBuckets = store.read(s"${name}_meta").head().getInt(0)
    scoreWithWeights(
      docFeatureCounts(batch, idCol, textCol, None, nBuckets),
      store.read(s"${name}_weights"), idCol, nBuckets)
  }
}
