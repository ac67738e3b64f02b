package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) + asymmetric-distance (ADC) search — the
  * memory half of the ANN story. IVF (`SimilarityOps.ivfCosineTopK`) bounds
  * WHICH vectors a query scores; PQ bounds what each vector COSTS: a 64-dim
  * float64 embedding (512 B) compresses to m=8 one-byte codes (64×), so at
  * 100 TB the codes table sits in memory where raw vectors cannot. Search
  * never touches raw vectors until the final exact rerank of a small pool.
  *
  * Public-knowledge basis: Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search" (TPAMI 2011) — m subspaces × k codewords,
  * per-query lookup tables, ADC = Σ_m lut[m][code[m]].
  *
  * Vectors are L2-normalized before training/encoding, so squared-L2 ADC
  * ranks identically to cosine (‖a−b‖² = 2 − 2cosθ) and composes with the
  * cosine operators' contracts.
  *
  * Scale posture: training fits m tiny KMeans models (k=16 centroids each)
  * over one checkpointed normalized pass; encoding is mapPartitions with
  * broadcast codebooks (narrow); ADC search broadcasts per-query LUTs
  * (m·k doubles each) and keeps a per-partition top-R heap, so only
  * R·|queries| rows per partition ever shuffle — the full codes table is
  * scanned but never moved.
  */
object PqOps {

  /** [m][k][subDim] codewords over L2-normalized inputs. */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
                             centers: Array[Array[Array[Double]]])
    extends Serializable

  final case class PqCode(c_id: Long, code: Array[Byte])

  private def l2n(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def subDistSq(nv: Array[Double], center: Array[Double],
      offset: Int): Double = {
    var d = 0.0; var j = 0
    while (j < center.length) {
      val diff = nv(offset + j) - center(j); d += diff * diff; j += 1
    }
    d
  }

  /** Seeded Lloyd's iterations over an in-memory sample — the m codebook
    * fits are driver-side ON PURPOSE: the training sample is driver-sized
    * by construction (≤sampleCap × dim doubles ≈ 4 MB), and profiling
    * showed 8 distributed KMeans fits over it cost ~7-14 s of pure job
    * scheduling where this loop costs milliseconds. The DATA-side passes
    * (encode, search) stay distributed. */
  private def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val n = points.length
    val d = points(0).length
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(points.indices.toVector).take(math.min(k, n))
      .map(points(_).clone).padTo(k, points(0).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      points.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var ki = 0
        while (ki < k) {
          val dist = subDistSq(p, centers(ki), 0)
          if (dist < bd) { bd = dist; best = ki }
          ki += 1
        }
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += p(j); j += 1 }
      }
      var ki = 0
      while (ki < k) {
        if (counts(ki) > 0) centers(ki) = sums(ki).map(_ / counts(ki))
        ki += 1
      }
      it += 1
    }
    centers
  }

  /** Train m seeded codebooks of k codewords each, on a capped sample
    * (classic PQ practice — codebooks need thousands of points per
    * subspace, not the corpus; k·subDim parameters are over-determined
    * long before 8k rows). k=16 (4-bit codes) measured as good as k=234
    * on this corpus: the synthetic embeddings are near-random (top
    * cosines ~0.35), so neighbor margins sit below quantization error at
    * ANY codebook size — which is why the driver contract is distance
    * QUALITY, not set recall (see x76_pq_quality), and why richer
    * codebooks are not worth their cost here. */
  def train(vecs: DataFrame, vecCol: String, m: Int = 8, k: Int = 16,
      seed: Long = 42L, maxIter: Int = 5, sampleCap: Int = 8192): Codebooks = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // orderBy before limit: a bare limit takes whatever rows arrive first,
    // so codebooks (and everything hash-gated downstream, x76_pq_quality)
    // would depend on partition layout and scan order. Ordering by a
    // CONTENT HASH (not the vector itself — lexicographic order takes a
    // contiguous corner of the space and skews the codebooks on any
    // corpus where storage order correlates with content) gives a
    // deterministic pseudo-random representative sample; tie-break on
    // the vector for a total order. orderBy+limit still plans as
    // TakeOrderedAndProject (per-partition top-k heap, no full shuffle),
    // so the sample costs one scan — the same scan the limit needed.
    val sample = vecs.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol)), col(vecCol)).limit(sampleCap)
      .as[Seq[Double]].collect().map(v => l2n(v.toArray))
    require(sample.nonEmpty, "PQ training needs at least one vector")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val centers = Array.tabulate(m) { i =>
      lloyd(sample.map(_.slice(i * subDim, (i + 1) * subDim)),
        k, maxIter, seed + i)
    }
    Codebooks(m, k, subDim, centers)
  }

  /** Encode each vector as m nearest-codeword bytes. Narrow: codebooks ride
    * a broadcast, codes are born in the partition that owns the vector. */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): Dataset[PqCode] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    vecs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val c = bc.value
        it.map { case (id, v) =>
          val nv = l2n(v.toArray)
          val code = new Array[Byte](c.m)
          var mi = 0
          while (mi < c.m) {
            var best = 0; var bestD = Double.MaxValue; var ki = 0
            while (ki < c.k) {
              val d = subDistSq(nv, c.centers(mi)(ki), mi * c.subDim)
              if (d < bestD) { bestD = d; best = ki }
              ki += 1
            }
            code(mi) = best.toByte; mi += 1
          }
          PqCode(id, code)
        }
      }
  }

  /** ADC top-k with exact rerank: per-query [m][k] LUTs broadcast, one
    * narrow scan of the codes keeps a per-partition top-`rerankPool` heap
    * per query (only pool·|queries| rows shuffle), then the pooled
    * candidate ids join back to raw vectors for an exact cosine rerank.
    * `queries` must be a SMALL probe set (LUTs are built driver-side) —
    * the same contract as cosineTopK's broadcast side. Output matches
    * cosineTopK: (q_id, c_id, cos_sim, rn).
    *
    * `rerankPool` ≤ 0 means auto: max(50, |codes|/50) — the pool must
    * scale with the corpus (a fixed 50 is 10% of a 500-vector corpus but
    * 0.3% of 15k, and recall@10 degrades accordingly; 2% of the corpus
    * held recall ~1.0 at every tested sf). Still tiny in absolute terms:
    * the pool is what shuffles and what the exact rerank scores.
    *
    * CALLER OBLIGATION: the codes table is pinned via localCheckpoint (it
    * feeds both the pool-sizing count and the scan); the blocks stay
    * pinned until the session's sweep or an explicit
    * `RelOps.releaseCheckpoint` on the returned plan's inputs. Bench and
    * Verify sweep persistent RDDs per query; long-lived sessions calling
    * this repeatedly must do the same (the connectedComponents
    * discipline). */
  def adcTopK(queries: DataFrame, codes: Dataset[PqCode], cb: Codebooks,
      candidates: DataFrame, k: Int, rerankPool: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    graft.functions.VecCosine.register(spark)
    // pin the codes before the pool sizing count — otherwise the count
    // and the pool scan each re-run the whole encode lineage
    val codesP = codes.localCheckpoint()
    val pool0 = if (rerankPool > 0) rerankPool
      else math.max(50L, codesP.count() / 50L).toInt
    val qs = queries.select(col("q_id").cast("long"), col("qe"))
      .as[(Long, Seq[Double])].collect()
    val luts = qs.map { case (qid, qv) =>
      val nq = l2n(qv.toArray)
      val t = Array.ofDim[Double](cb.m, cb.k)
      var mi = 0
      while (mi < cb.m) {
        var ki = 0
        while (ki < cb.k) {
          t(mi)(ki) = subDistSq(nq, cb.centers(mi)(ki), mi * cb.subDim)
          ki += 1
        }
        mi += 1
      }
      (qid, t)
    }
    val bc = spark.sparkContext.broadcast(luts)
    val pool = codesP.mapPartitions { it =>
      val ls = bc.value
      // per-query bounded max-heaps: evict the WORST once over capacity,
      // so each partition emits at most rerankPool rows per query
      val heaps = ls.map { case (qid, _) =>
        qid -> collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by(_._1))
      }
      it.foreach { pc =>
        var qi = 0
        while (qi < ls.length) {
          val (qid, t) = ls(qi)
          if (pc.c_id != qid) {
            var d = 0.0; var mi = 0
            while (mi < t.length) { d += t(mi)(pc.code(mi) & 0xff); mi += 1 }
            val h = heaps(qi)._2
            if (h.size < pool0) h.enqueue((d, pc.c_id))
            else if (d < h.head._1) { h.dequeue(); h.enqueue((d, pc.c_id)) }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (d, cid) => (qid, cid, d) }
      }
    }.toDF("q_id", "c_id", "adist")
    // global pool per query, then exact cosine rerank of pool members only
    val pooled = RelOps.topNPerGroup(pool0, Seq("q_id"),
      Seq(asc("adist"), col("c_id")))(pool)
      .select("q_id", "c_id")
    val rescored = pooled
      .join(candidates, "c_id")
      .join(broadcast(queries), "q_id")
      .withColumn("cos_sim",
        round(graft.functions.VecCosine.vec_cosine(col("qe"), col("ce")), 6))
    RelOps.topNPerGroup(k, Seq("q_id"), Seq(desc("cos_sim"), col("c_id")))(rescored)
      .select("q_id", "c_id", "cos_sim", "rn")
  }
}
