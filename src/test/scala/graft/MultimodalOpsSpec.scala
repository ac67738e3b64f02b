package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps._

/** Multimodal operators over REAL encoded payloads: byte-exact codec round
  * trips, format validation, golden content checksums, and the Spark-side
  * contracts (schema, determinism, narrowness). */
class MultimodalOpsSpec extends SparkSpec {

  import spark.implicits._

  lazy val media = MultimodalOps.synthesize(env.documents, "doc_id").cache()

  test("BMP codec: byte-exact pixel round trip, bottom-up storage handled") {
    val img = MediaGen.image(42L)
    val bytes = MediaCodec.encodeBmp(img)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val back = MediaCodec.decodeBmp(bytes)
    assert(back.width === img.width && back.height === img.height)
    assert(back.bgr.toSeq === img.bgr.toSeq) // every pixel byte survives
    // width 17 → rowLen 51, pad 1: the un-padding path is exercised
    val odd = MediaCodec.Image(17, 3, Array.tabulate(17 * 3 * 3)(_.toByte))
    assert(MediaCodec.decodeBmp(MediaCodec.encodeBmp(odd)).bgr.toSeq === odd.bgr.toSeq)
  }

  test("WAV codec: sample-exact round trip, negative samples intact") {
    val a = MediaCodec.Audio(8000, Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 12345))
    val back = MediaCodec.decodeWav(MediaCodec.encodeWav(a))
    assert(back.sampleRate === 8000)
    assert(back.samples.toSeq === a.samples.toSeq)
  }

  test("video container: random-access frame decode equals full decode") {
    val v = MediaGen.video(44L) // id%3==2 → video, 2+44%4=2 frames
    val bytes = MediaCodec.encodeVideo(v)
    val (n, ms) = MediaCodec.videoHeader(bytes)
    assert(n === v.frames.length && ms === MediaGen.MsPerFrame)
    val full = MediaCodec.decodeVideo(bytes)
    (0 until n).foreach { i =>
      assert(MediaCodec.decodeFrame(bytes, i).bgr.toSeq === full.frames(i).bgr.toSeq)
    }
  }

  test("corrupted payloads throw instead of decoding garbage") {
    intercept[IllegalArgumentException](MediaCodec.decodeBmp("nope".getBytes))
    intercept[IllegalArgumentException](MediaCodec.decodeWav(new Array[Byte](50)))
    intercept[IllegalArgumentException](MediaCodec.videoHeader("GV99xxxx".getBytes))
  }

  test("synthesize: deterministic REAL payloads with correct magic per type") {
    val rows = media.orderBy("media_id").limit(9).collect()
    val again = MultimodalOps.synthesize(env.documents, "doc_id")
      .orderBy("media_id").limit(9).collect()
    assert(rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ===
      again.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq)
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "media_type", "payload"))
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      r.getAs[String]("media_type") match {
        case "image" => assert(p(0) == 'B' && p(1) == 'M')
        case "audio" => assert(new String(p, 0, 4, "US-ASCII") === "RIFF")
        case "video" => assert(new String(p, 0, 4, "US-ASCII") === "GV01")
      }
    }
  }

  test("decodeMeta: parsed header fields match the generator arithmetic") {
    val decoded = MultimodalOps.decodeMeta(media.as[MediaRow])
    assert(decoded.count() === media.count())
    decoded.filter(_.media_id < 9L).collect().foreach { d =>
      val id = d.media_id
      d.media_type match {
        case "image" =>
          assert(d.meta.width === 16 + (id % 48).toInt)
          assert(d.meta.height === 16 + ((id / 3) % 32).toInt)
          assert(d.meta.durationMs === 0L)
        case "audio" =>
          assert(d.meta.durationMs === 1000L + (id % 32) * 100L)
        case "video" =>
          assert(d.meta.width === 16 + (id % 16).toInt)
          assert(d.meta.durationMs === (2 + (id % 4)) * 40L)
      }
    }
    // narrowness: decode must not change partitioning
    assert(decoded.rdd.getNumPartitions === media.rdd.getNumPartitions)
  }

  test("golden content checksums: pixel/sample bytes are pinned, not just shapes") {
    // independently recompute from the generator definition — if either the
    // encoder or decoder shifted a byte, these sums move
    def sumBytes(b: Array[Byte]): Long = b.foldLeft(0L)((s, x) => s + (x & 0xff))
    val img = MediaGen.image(0L)
    val viaCodec = MediaCodec.decodeBmp(MediaCodec.encodeBmp(img))
    assert(sumBytes(viaCodec.bgr) === sumBytes(img.bgr))
    val expected = {
      var s = 0L; var i = 0
      val w = 16; val h = 16 // id 0: 16+(0%48), 16+((0/3)%32)
      while (i < w * h * 3) { s += (MediaGen.mix(0L * 0x10001L + i) & 0xff); i += 1 }
      s
    }
    assert(sumBytes(viaCodec.bgr) === expected)
  }

  test("extractFeatures: fixed-dim normalized vectors over decoded content") {
    val feats = MultimodalOps.extractFeatures(media.as[MediaRow], dim = 16)
    val f = feats.filter(_.media_id == 1L).head().features
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-3) // histogram normalized by count
    // golden: histogram of id=1's WAV high bytes, recomputed independently
    val a = MediaGen.audio(1L)
    val hist = new Array[Float](16)
    a.samples.foreach(s => hist((((s >> 8) + 128) & 0xff) % 16) += 1f)
    val exp = hist.map(_ / a.samples.length)
    assert(f.toSeq === exp.toSeq)
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

  test("resizeMeta caps the longest edge; sampleFrames emits pinned content") {
    val decoded = MultimodalOps.decodeMeta(media.as[MediaRow]).toDF()
    val resized = MultimodalOps.resizeMeta(decoded, maxDim = 32)
    import org.apache.spark.sql.functions._
    val bad = resized.filter(greatest(col("meta_resized.width"),
      col("meta_resized.height")) > 32).count()
    assert(bad === 0)
    val frames = MultimodalOps.sampleFrames(media.as[MediaRow],
      everyMs = 80, maxFrames = 5)
    assert(frames.count() > 0)
    val perVideo = frames.toDF().groupBy("media_id").count()
    assert(perVideo.filter(col("count") > 5).count() === 0)
    // golden frame mean for id=2 (video, 2+2%4=4 frames), frame at 80ms → idx 2
    val s = frames.filter(f => f.media_id == 2L && f.frame_ms == 80L).head()
    val img = MediaGen.video(2L).frames(2)
    var sum = 0L
    img.bgr.foreach(b => sum += (b & 0xff))
    val exp = math.rint(sum.toDouble / img.bgr.length * 1e6) / 1e6
    assert(s.frame_mean === exp)
    assert(s.frame_w === img.width && s.frame_h === img.height)
  }
}
