package graft

import org.apache.spark.sql.functions._
import graft.ops.{PqOps, SimilarityOps}

/** Product quantization: codebook shapes, deterministic + scale-invariant
  * encoding, the 64× compression claim, and ADC search recall against the
  * exact cosine ground truth. */
class PqOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val cand = env.embeddings
    .withColumn("e", transform(col("embedding"), v => v.cast("double")))
    .select(col("vec_id").as("c_id"), col("e").as("ce"))
    .cache()

  private lazy val cb = PqOps.train(cand, "ce")

  test("train: m codebooks of k codewords over dim/m-dim subspaces") {
    assert(cb.m === 8 && cb.k === 16 && cb.subDim === 8)
    assert(cb.centers.length === 8)
    assert(cb.centers.forall(_.length === 16))
    assert(cb.centers.forall(_.forall(_.length === 8)))
  }

  test("encode: deterministic, one byte per subspace (64x compression)") {
    val a = PqOps.encode(cand, "c_id", "ce", cb).collect()
      .map(c => c.c_id -> c.code.toSeq).toMap
    val b = PqOps.encode(cand, "c_id", "ce", cb).collect()
      .map(c => c.c_id -> c.code.toSeq).toMap
    assert(a === b)
    assert(a.values.forall(_.length === 8)) // 8 bytes vs 64 doubles = 64x
  }

  test("encode is scale-invariant (normalization happens inside)") {
    val scaled = cand.withColumn("ce", transform(col("ce"), v => v * 5.0))
    val a = PqOps.encode(cand, "c_id", "ce", cb).collect()
      .map(c => c.c_id -> c.code.toSeq).toMap
    val s = PqOps.encode(scaled, "c_id", "ce", cb).collect()
      .map(c => c.c_id -> c.code.toSeq).toMap
    assert(a === s)
  }

  test("adcTopK vs exact cosine: recall at this sf, quality ratio always") {
    val q = cand.filter(col("c_id") < 5)
      .select(col("c_id").as("q_id"), col("ce").as("qe"))
    val codes = PqOps.encode(cand, "c_id", "ce", cb)
    val pq = PqOps.adcTopK(q, codes, cb, cand, k = 10)
    assert(pq.schema.fieldNames.toSeq === Seq("q_id", "c_id", "cos_sim", "rn"))
    assert(pq.groupBy("q_id").count().filter(col("count") =!= 10).count() === 0)
    // no self-matches in the pool
    assert(pq.filter(col("q_id") === col("c_id")).count() === 0)
    val exact = SimilarityOps.cosineTopK(q, cand, 10)
    // recall floor is a SANITY bound (chance level here is 10/500 = 0.02,
    // observed ~0.5): on this near-random geometry exact membership is
    // tie-noise — codebook init alone moves it ±0.1 — which is why the
    // DRIVER contract (x76_pq_quality) is the distance ratio, not recall
    val hits = pq.join(exact.select("q_id", "c_id"), Seq("q_id", "c_id"),
      "left_semi").count()
    val total = exact.count()
    assert(hits.toDouble / total >= 0.4,
      s"PQ recall@10 ${hits.toDouble / total} below 0.4")
    // the quality contract itself, at spec scale: per-query mean top-10
    // cosine within 20% of exact
    val pqm = pq.groupBy("q_id").agg(avg("cos_sim").as("pm"))
    val exm = exact.groupBy("q_id").agg(avg("cos_sim").as("em"))
    val bad = exm.join(pqm, "q_id")
      .filter(col("pm") < col("em") * 0.8).count()
    assert(bad === 0, "PQ mean top-10 cosine fell below 0.8x exact")
  }
}
