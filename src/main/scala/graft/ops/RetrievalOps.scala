package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X125: keyword-retrieval scoring over the corpus — the ranking half a
  * retrieval-augmented pipeline needs next to the vector paths (X32/X72):
  * BM25 (Robertson & Zaragoza 2009, the Okapi formulation with Lucene's
  * non-negative idf).
  *
  * Scale shape: the corpus explodes to tokens ONCE and filters to the
  * query's terms IMMEDIATELY — the per-(doc, term) tf table is bounded by
  * |terms| · |matching docs|, not corpus size, and every subsequent join
  * key (term, doc) is tiny. df and the corpus stats (N, total tokens) are
  * scalar-sized; at 100 TB the only corpus-sized job is the one filtered
  * token scan, and a real deployment would serve it from a persisted
  * inverted index (the X35b table) instead of re-tokenizing per query.
  *
  * Numeric discipline (x60's): tf/df/dl cast to double BEFORE arithmetic,
  * every expression left-associated exactly as the oracle SQL writes it,
  * avgdl derived as exact-long token total / doc count (ONE deterministic
  * division, not a float mean), final per-doc sum rounded to 6.
  */
object RetrievalOps {

  /** BM25 scores of every document matching ≥1 query term.
    * Returns (idCol, n_hit, bm25), one row per matching doc. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
    // corpus stats: exact long total / long count — deterministic division
    val stats = base.agg(count(lit(1)).as("n"),
      sum(size(col("__t"))).as("tt")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val dl = base.select(col(idCol),
      size(col("__t")).cast("double").as("__dl"))
    val tf = base
      .select(col(idCol), explode(col("__t")).as("__w"))
      .filter(col("__w").isin(terms: _*))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfq = tf.groupBy("__w").agg(count(lit(1)).cast("double").as("__df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val score = idf * (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl)))
    tf.join(broadcast(dfq), "__w")
      .join(dl, idCol)
      .select(col(idCol), score.as("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"), round(sum(col("__s")), 6).as("bm25"))
  }

  /** The oracle-side constants of [[bm25Scores]] as shortest-roundtrip
    * literals, so a SQL text can embed bit-identical doubles. */
  def bm25Constants(k1: Double, b: Double): Map[String, String] = Map(
    "k1" -> k1.toString, "k1p1" -> (k1 + 1.0).toString,
    "oneMinusB" -> (1.0 - b).toString, "b" -> b.toString)

  /** X126: reciprocal-rank fusion (Cormack et al. SIGIR'09) of N retrieval
    * legs — the standard hybrid-search combiner (keyword BM25 + embedding
    * cosine) that needs only RANKS, never score calibration across legs:
    * rrf(d) = Σ_legs 1/(k + rank_leg(d)), absent legs contributing 0.
    *
    * Determinism discipline: each leg ranks by (score desc, id) with
    * scores already rounded to 6 (so a last-ulp score wobble can't flip a
    * rank), via the distributed range-partition row-number (never a
    * single-partition global window); the fusion sum is a fixed-order
    * coalesce chain of exact divisions — the output doubles are
    * bit-identical cross-engine with NO rounding. Legs are RESULT SETS
    * (top-k sized), so the full-outer fusion join is small by
    * construction; the corpus-sized work lives in the legs.
    *
    * rankings: (idCol, scoreCol) frames. Returns (idCol, n_legs, rrf). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val ranked = rankings.zipWithIndex.map { case (df, i) =>
      RelOps.globalRowNumber(df.select(col(idCol), col(scoreCol)),
          Seq(desc(scoreCol), col(idCol)), rnCol = s"__r$i")
        .select(col(idCol), col(s"__r$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(k) + col(s"__r$i")), lit(0.0)))
      .reduceLeft(_ + _)
    val nLegs = rankings.indices
      .map(i => when(col(s"__r$i").isNotNull, 1L).otherwise(0L))
      .reduceLeft(_ + _)
    joined.select(col(idCol), nLegs.as("n_legs"), rrf.as("rrf"))
  }
}
