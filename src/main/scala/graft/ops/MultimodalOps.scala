package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star): image/audio/video as opaque
  * `BinaryType` payloads + typed metadata, processed batch-wise per
  * partition. The Spark-side plumbing — schema, partitioning, batch shape —
  * is real and tested; the codec calls are STUBS (deterministic fakes, this
  * container ships no image/audio libraries), marked [STUB] below. A real
  * deployment swaps `FakeCodec` for JNI/library calls without touching the
  * operator shapes.
  *
  * Scale posture: payloads never shuffle — decode/feature-extract are
  * mapPartitions over the scan (narrow); only extracted features/metadata
  * (small) flow into joins/aggregations downstream.
  */
object MultimodalOps {

  final case class MediaMeta(width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, media_type: String,
                            payload: Array[Byte])
  final case class DecodedRow(media_id: Long, media_type: String,
                              payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** [STUB] deterministic stand-in for an image/audio codec: "decodes" a
    * payload by hashing bytes into plausible dimensions, and "extracts"
    * features as a normalized byte histogram. Deterministic → testable. */
  object FakeCodec {
    def decode(payload: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(payload)
      MediaMeta(width = 64 + math.abs(h % 1920), height = 64 + math.abs((h / 7) % 1080),
        durationMs = math.abs(h.toLong % 600000L))
    }
    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val hist = new Array[Float](dim)
      payload.foreach(b => hist((b & 0xff) % dim) += 1f)
      val n = math.max(1, payload.length).toFloat
      hist.map(_ / n)
    }
  }

  /** Deterministic synthetic media table from any id column — fake payloads
    * whose bytes derive from the id (sha-256 expanded), so every test run
    * and every partition layout sees identical binaries. */
  def synthesize(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      // pmod, not %: Spark % keeps the dividend's sign, so a negative id
      // would index 0/-1 (crash or silently pick the last element)
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      // payload = sha512 of the id string, as raw bytes (64 bytes)
      unhex(sha2(col(idCol).cast("string"), 512)).as("payload"))

  /** Decode stage: batch-wise per partition (the real codec would amortize
    * library init per batch exactly here). Narrow — no shuffle. */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init happens once here ([STUB]: nothing to init)
      rows.map(r => DecodedRow(r.media_id, r.media_type, r.payload,
        FakeCodec.decode(r.payload)))
    }
  }

  /** Feature extraction: payload → fixed-dim float vector, ready for the
    * X32 similarity operators. Narrow, batch-shaped. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r =>
      MediaFeatures(r.media_id, FakeCodec.features(r.payload, dim))))
  }

  /** Resize: pure metadata transform (a real pipeline would rewrite the
    * payload; the plumbing — column ops on the meta struct — is identical). */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("meta.width"), col("meta.height")))
    decoded.withColumn("meta_resized", struct(
      (col("meta.width") * scale).cast("int").as("width"),
      (col("meta.height") * scale).cast("int").as("height"),
      col("meta.durationMs").as("durationMs")))
  }

  /** Frame sampling for video rows: emit one row per sampled frame offset —
    * pure column ops (sequence + explode), no codec involvement until a
    * downstream decode consumes (media_id, frame_ms). */
  def sampleFrames(decoded: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_ms", explode(slice(
        sequence(lit(0L), col("meta.durationMs"), lit(everyMs)),
        1, maxFrames)))
      .select("media_id", "frame_ms")
}
