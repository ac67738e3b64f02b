package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps._

/** Multimodal plumbing: schema, determinism, batch shape, narrowness.
  * The codec itself is a declared [STUB]; these tests pin the operator
  * contracts a real codec would slot into. */
class MultimodalOpsSpec extends SparkSpec {

  import spark.implicits._

  lazy val media = MultimodalOps.synthesize(env.documents, "doc_id").cache()

  test("synthesize: deterministic payloads, typed schema") {
    val rows = media.orderBy("media_id").limit(3).collect()
    val again = MultimodalOps.synthesize(env.documents, "doc_id")
      .orderBy("media_id").limit(3).collect()
    assert(rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ===
      again.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq)
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "media_type", "payload"))
    assert(rows.forall(_.getAs[Array[Byte]]("payload").length === 64))
  }

  test("decodeMeta: per-partition decode preserves rows, adds typed meta") {
    val decoded = MultimodalOps.decodeMeta(media.as[MediaRow])
    assert(decoded.count() === media.count())
    val m = decoded.filter(_.media_id == 0L).head().meta
    val m2 = MultimodalOps.decodeMeta(media.as[MediaRow])
      .filter(_.media_id == 0L).head().meta
    assert(m === m2) // deterministic decode
    assert(m.width >= 64 && m.height >= 64)
    // narrowness: decode must not change partitioning
    assert(decoded.rdd.getNumPartitions === media.rdd.getNumPartitions)
  }

  test("extractFeatures: fixed-dim normalized vectors") {
    val feats = MultimodalOps.extractFeatures(media.as[MediaRow], dim = 16)
    val f = feats.filter(_.media_id == 1L).head().features
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-3) // histogram normalized by length
  }

  test("extracted features compose with the similarity operators end-to-end") {
    import org.apache.spark.sql.functions._
    // media payload → feature vector → exact cosine top-k: the full
    // multimodal similarity-search path over one narrow pipeline
    val feats = MultimodalOps.extractFeatures(media.as[MediaRow], dim = 16)
      .toDF().withColumn("e", transform(col("features"), v => v.cast("double")))
    val q = feats.filter(col("media_id") < 3)
      .select(col("media_id").as("q_id"), col("e").as("qe"))
    val c = feats.select(col("media_id").as("c_id"), col("e").as("ce"))
    val topk = graft.ops.SimilarityOps.cosineTopK(q, c, 5)
    assert(topk.count() === 15) // 3 queries × 5 neighbours
    assert(topk.filter(col("cos_sim") > 1.000001 || col("cos_sim") < -1.000001)
      .count() === 0)
  }

  test("resizeMeta caps the longest edge; sampleFrames bounds frame count") {
    val decoded = MultimodalOps.decodeMeta(media.as[MediaRow]).toDF()
    val resized = MultimodalOps.resizeMeta(decoded, maxDim = 256)
    import org.apache.spark.sql.functions._
    val bad = resized.filter(greatest(col("meta_resized.width"),
      col("meta_resized.height")) > 256).count()
    assert(bad === 0)
    val frames = MultimodalOps.sampleFrames(decoded, everyMs = 10000, maxFrames = 5)
    assert(frames.count() > 0)
    val perVideo = frames.groupBy("media_id").count()
    assert(perVideo.filter(col("count") > 5).count() === 0)
  }
}
