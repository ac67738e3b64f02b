package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X30-X32 dedup / similarity-search operators (SURVEY §2.10), designed for
  * the 100 TB posture: no all-pairs comparisons — candidates come from
  * hash-bucket joins (LSH banding) or a small broadcast query side.
  */
object SimilarityOps {

  /** Exact dedup by content hash: one row per distinct content, keeping the
    * smallest doc id (deterministic canonical pick). Single shuffle on the
    * 256-bit hash; at 100 TB this is the only exact-dedup formulation that
    * works — dropDuplicates over raw text would shuffle full documents. */
  def exactDedup(idCol: String, textCol: String)(df: DataFrame): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "h", "n_dups")

  /** Deterministic MinHash signature over a shingle array: k independent
    * hash slots, slot j = min over shingles of xxhash64(j || shingle).
    * Pure column expression (codegen), no fitted model or RNG state —
    * reproducible across runs/partitions, unlike ml.feature.MinHashLSH. */
  def minhashSignature(shinglesCol: String, k: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(1), lit(k)),
      j => array_min(transform(col(shinglesCol),
        s => xxhash64(concat(j.cast("string"), lit(":"), s)))))

  /** Near-dup candidate pairs via MinHash + LSH banding, verified with
    * exact Jaccard. `bands`×`rowsPerBand` = signature length. Each doc
    * emits `bands` (band-index, band-hash) keys; docs sharing any band key
    * become candidates — the scalable alternative to an all-pairs join.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashNearDups(idCol: String, textCol: String, shingleLen: Int = 3,
                      bands: Int = 8, rowsPerBand: Int = 4,
                      threshold: Double = 0.5)(df: DataFrame): DataFrame = {
    val k = bands * rowsPerBand
    val docs = df.select(col(idCol).as("id"),
        TextOps.shingles(col(textCol), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature("sh", k))
    // band key = hash of the band's signature slice
    val banded = docs.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash from a token array: explode tokens, per-bit signed
    * vote, reassemble. One shuffle on the doc id; the 64 per-bit sums are
    * a single wide aggregate (codegen-friendly), not 64 passes. */
  def simhash(idCol: String, textCol: String)(df: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums: Seq[org.apache.spark.sql.Column] = (0 until 64).map { b =>
      sum(when(col("th").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1))
        .as(s"b$b")
    }
    val withBits = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val simhashExpr = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
    withBits.select(col("id"), simhashExpr.as("simhash"))
  }

  /** Exact top-k cosine neighbours of each query vector. The query side is
    * expected to be small (broadcast); candidates stream through one scan.
    * Math in double, mirroring DuckDB list_cosine_similarity
    * (dot / sqrt(||a||²·||b||²)), rounded before ranking so cross-engine
    * last-ulp noise can't flip the rank order. */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val dot = aggregate(zip_with(col("qe"), col("ce"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val n2 = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0.0), (acc, v) => acc + v * v)
    val scored = broadcast(queries).crossJoin(candidates)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_sim", round(dot / sqrt(n2(col("qe")) * n2(col("ce"))), 6))
    RelOps.topNPerGroup(k, Seq("q_id"), Seq(desc("cos_sim"), col("c_id")))(scored)
      .select("q_id", "c_id", "cos_sim", "rn")
  }
}
