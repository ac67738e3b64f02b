package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video as opaque `BinaryType`
  * payloads + typed metadata, processed batch-wise per partition. The
  * payloads are REAL encoded bytes — 24bpp BMP and baseline PNG images
  * (zlib via java.util.zip — a real-world format the decoder reads from
  * found data: chunk walking, split IDATs, CRC checks, all five scanline
  * filters), RIFF/WAVE PCM16 audio, and a length-prefixed container of
  * BMP frames for video — built and parsed in-engine (`MediaCodec`), no
  * external libraries. Decode means validating magic/CRC and header
  * fields and extracting pixel/sample content; a production deployment
  * swaps MediaCodec for JPEG/Opus/H.264 library calls without touching
  * the operator shapes.
  *
  * Scale posture: payloads never shuffle — synthesize/decode/feature-extract
  * are mapPartitions over the scan (narrow); only extracted features and
  * metadata (small) flow into joins/aggregations downstream.
  */
object MultimodalOps {

  final case class MediaMeta(width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, media_type: String,
                            payload: Array[Byte])
  final case class DecodedRow(media_id: Long, media_type: String,
                              container: String, payload: Array[Byte],
                              meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, features: Array[Float])
  final case class FrameSample(media_id: Long, frame_ms: Long,
                               frame_w: Int, frame_h: Int, frame_mean: Double)

  /** Real single-file codecs over standard byte layouts. Every decode
    * validates magic numbers and reads actual little-endian header fields —
    * a corrupted payload throws, it does not hash its way to an answer. */
  object MediaCodec {

    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
    }
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], off: Int): Int =
      rd16(b, off) | (rd16(b, off + 2) << 16)

    /** Decoded image: BGR bytes, row-major TOP-down (decode un-flips the
      * BMP's bottom-up storage and strips row padding). */
    final case class Image(width: Int, height: Int, bgr: Array[Byte])
    final case class Audio(sampleRate: Int, samples: Array[Short])
    final case class Video(msPerFrame: Int, frames: Vector[Image])

    /** 24bpp uncompressed BMP: 14-byte file header + 40-byte
      * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes. */
    def encodeBmp(img: Image): Array[Byte] = {
      val rowLen = img.width * 3
      val pad = (4 - rowLen % 4) % 4
      val dataLen = (rowLen + pad) * img.height
      val out = new Array[Byte](54 + dataLen)
      out(0) = 'B'; out(1) = 'M'
      le32(out, 2, out.length); le32(out, 10, 54)
      le32(out, 14, 40); le32(out, 18, img.width); le32(out, 22, img.height)
      le16(out, 26, 1); le16(out, 28, 24); le32(out, 34, dataLen)
      var y = 0
      while (y < img.height) {
        // BMP stores rows bottom-up: file row y is image row (height-1-y)
        val src = (img.height - 1 - y) * rowLen
        System.arraycopy(img.bgr, src, out, 54 + y * (rowLen + pad), rowLen)
        y += 1
      }
      out
    }

    def decodeBmp(bytes: Array[Byte]): Image = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP payload")
      require(rd32(bytes, 14) == 40 && rd16(bytes, 28) == 24,
        "unsupported BMP variant")
      val w = rd32(bytes, 18); val h = rd32(bytes, 22)
      val off = rd32(bytes, 10)
      val rowLen = w * 3; val pad = (4 - rowLen % 4) % 4
      val bgr = new Array[Byte](rowLen * h)
      var y = 0
      while (y < h) {
        System.arraycopy(bytes, off + y * (rowLen + pad),
          bgr, (h - 1 - y) * rowLen, rowLen)
        y += 1
      }
      Image(w, h, bgr)
    }

    // ---- PNG: baseline 8-bit truecolor (color type 2), non-interlaced —
    // a REAL-WORLD format, pure JVM (zlib via java.util.zip, CRC32 per
    // chunk). The decoder reads found data, not just its own output: it
    // walks the chunk stream (skipping ancillary chunks like tEXt/pHYs),
    // concatenates split IDATs, verifies every chunk CRC, inflates, and
    // reverses all five scanline filters (None/Sub/Up/Average/Paeth).
    // The encoder picks each row's filter by the minimum-sum-of-absolute-
    // differences heuristic (standard libpng practice), so round trips
    // exercise the de-filter paths with realistic filter mixes.

    private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a)

    private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = ((v >>> 24) & 0xff).toByte; b(off + 1) = ((v >>> 16) & 0xff).toByte
      b(off + 2) = ((v >>> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
    }
    private def rdBe32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      be32(out, 0, data.length)
      System.arraycopy(typ.getBytes("US-ASCII"), 0, out, 4, 4)
      System.arraycopy(data, 0, out, 8, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      be32(out, 8 + data.length, crc.getValue.toInt)
      out
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    def encodePng(img: Image): Array[Byte] = {
      val w = img.width; val h = img.height; val stride = w * 3
      // PNG stores RGB top-down; Image carries BGR
      val rgb = new Array[Byte](stride * h)
      var i = 0
      while (i < rgb.length) {
        rgb(i) = img.bgr(i + 2); rgb(i + 1) = img.bgr(i + 1)
        rgb(i + 2) = img.bgr(i); i += 3
      }
      val raw = new Array[Byte](h * (1 + stride))
      val cand = Array.ofDim[Byte](5, stride)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < stride) {
          val v = rgb(y * stride + x) & 0xff
          val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
          val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
          val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
          cand(0)(x) = v.toByte
          cand(1)(x) = ((v - left) & 0xff).toByte
          cand(2)(x) = ((v - up) & 0xff).toByte
          cand(3)(x) = ((v - ((left + up) >> 1)) & 0xff).toByte
          cand(4)(x) = ((v - paeth(left, up, ul)) & 0xff).toByte
          x += 1
        }
        var best = 0; var bestSad = Long.MaxValue; var f = 0
        while (f < 5) {
          var sad = 0L; var j = 0
          while (j < stride) { sad += math.abs(cand(f)(j).toInt); j += 1 }
          if (sad < bestSad) { bestSad = sad; best = f }
          f += 1
        }
        raw(y * (1 + stride)) = best.toByte
        System.arraycopy(cand(best), 0, raw, y * (1 + stride) + 1, stride)
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val zOut = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val ihdr = new Array[Byte](13)
      be32(ihdr, 0, w); be32(ihdr, 4, h)
      ihdr(8) = 8; ihdr(9) = 2 // 8-bit, truecolor; compression/filter/interlace 0
      val out = new java.io.ByteArrayOutputStream()
      out.write(PngSig)
      out.write(pngChunk("IHDR", ihdr))
      out.write(pngChunk("IDAT", zOut.toByteArray))
      out.write(pngChunk("IEND", Array.emptyByteArray))
      out.toByteArray
    }

    def decodePng(bytes: Array[Byte]): Image = {
      require(bytes.length >= 8 &&
        PngSig.indices.forall(i => bytes(i) == PngSig(i)), "not a PNG payload")
      var off = 8
      var w = -1; var h = -1; var seenIhdr = false; var seenEnd = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!seenEnd) {
        require(off + 12 <= bytes.length, "truncated PNG")
        val len = rdBe32(bytes, off)
        require(len >= 0 && off + 12 + len <= bytes.length,
          "truncated PNG chunk")
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, off + 4, 4 + len)
        require(crc.getValue.toInt == rdBe32(bytes, off + 8 + len),
          s"PNG chunk $typ fails CRC — corrupted payload")
        typ match {
          case "IHDR" =>
            require(len == 13, "malformed IHDR")
            w = rdBe32(bytes, off + 8); h = rdBe32(bytes, off + 12)
            require(bytes(off + 16) == 8 && bytes(off + 17) == 2 &&
              bytes(off + 18) == 0 && bytes(off + 19) == 0 &&
              bytes(off + 20) == 0,
              "unsupported PNG variant: need 8-bit truecolor non-interlaced")
            seenIhdr = true
          case "IDAT" => idat.write(bytes, off + 8, len)
          case "IEND" => seenEnd = true
          case _ => () // ancillary chunk (tEXt, pHYs, gAMA, …): skip
        }
        off += 12 + len
      }
      require(seenIhdr && w > 0 && h > 0, "PNG missing IHDR")
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride))
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || !inflater.needsInput(), "truncated PNG pixel data")
        got += n
      }
      inflater.end()
      require(got == raw.length,
        s"PNG pixel data short: $got of ${raw.length} bytes")
      // de-filter into top-down RGB, then swap to the Image's BGR order
      val rgb = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xff
        require(f <= 4, s"bad PNG filter type $f")
        val ro = y * (1 + stride) + 1
        var x = 0
        while (x < stride) {
          val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
          val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
          val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff
                   else 0
          val v = raw(ro + x) & 0xff
          val d = f match {
            case 0 => v
            case 1 => v + left
            case 2 => v + up
            case 3 => v + ((left + up) >> 1)
            case _ => v + paeth(left, up, ul)
          }
          rgb(y * stride + x) = (d & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val bgr = new Array[Byte](stride * h)
      var i = 0
      while (i < bgr.length) {
        bgr(i) = rgb(i + 2); bgr(i + 1) = rgb(i + 1); bgr(i + 2) = rgb(i)
        i += 3
      }
      Image(w, h, bgr)
    }

    /** Sniff-dispatch image decode: a found corpus mixes formats, so the
      * payload's magic bytes — not the column's declared type — pick the
      * codec. Unknown magic falls through to decodePng's loud failure. */
    def decodeImage(bytes: Array[Byte]): Image =
      if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
        decodeBmp(bytes)
      else decodePng(bytes)

    /** RIFF/WAVE, PCM 16-bit mono little-endian: canonical 44-byte header. */
    def encodeWav(a: Audio): Array[Byte] = {
      val dataLen = a.samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      le32(out, 4, 36 + dataLen)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      le32(out, 16, 16); le16(out, 20, 1); le16(out, 22, 1)
      le32(out, 24, a.sampleRate); le32(out, 28, a.sampleRate * 2)
      le16(out, 32, 2); le16(out, 34, 16)
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      le32(out, 40, dataLen)
      var i = 0
      while (i < a.samples.length) { le16(out, 44 + i * 2, a.samples(i) & 0xffff); i += 1 }
      out
    }

    def decodeWav(bytes: Array[Byte]): Audio = {
      require(bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a WAV payload")
      require(rd16(bytes, 20) == 1 && rd16(bytes, 22) == 1 && rd16(bytes, 34) == 16,
        "unsupported WAV variant")
      // canonical 44-byte layout only: the data chunk must sit right after
      // fmt. Real-world WAVs may interleave LIST/fact chunks there; without
      // this check their chunk-interior bytes would be read as the data
      // length — silently decoded garbage, violating the corrupted-payloads-
      // throw contract. (Chunk walking is a deliberate non-goal; a payload
      // that needs it is "unsupported", loudly.)
      require(bytes(36) == 'd' && bytes(37) == 'a' &&
        bytes(38) == 't' && bytes(39) == 'a',
        "unsupported WAV layout: expected canonical data chunk at offset 36")
      val rate = rd32(bytes, 24)
      val n = rd32(bytes, 40) / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = rd16(bytes, 44 + i * 2).toShort; i += 1 }
      Audio(rate, samples)
    }

    /** Minimal video container — "GV01" magic, u16 frame count, u16 ms per
      * frame, then length-prefixed (u32) BMP blobs. The random-access shape
      * (walk prefixes, decode ONE frame) is what sampleFrames exploits. */
    def encodeVideo(v: Video): Array[Byte] = {
      val blobs = v.frames.map(encodeBmp)
      val out = new Array[Byte](8 + blobs.map(_.length + 4).sum)
      out(0) = 'G'; out(1) = 'V'; out(2) = '0'; out(3) = '1'
      le16(out, 4, v.frames.length); le16(out, 6, v.msPerFrame)
      var off = 8
      blobs.foreach { b =>
        le32(out, off, b.length); System.arraycopy(b, 0, out, off + 4, b.length)
        off += 4 + b.length
      }
      out
    }

    private def checkVideo(bytes: Array[Byte]): Unit =
      require(bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'V' &&
        bytes(2) == '0' && bytes(3) == '1', "not a GV01 payload")

    def videoHeader(bytes: Array[Byte]): (Int, Int) = { // (frames, msPerFrame)
      checkVideo(bytes); (rd16(bytes, 4), rd16(bytes, 6))
    }

    /** Decode a single frame without touching the other blobs. */
    def decodeFrame(bytes: Array[Byte], idx: Int): Image = {
      val (n, _) = videoHeader(bytes)
      require(idx >= 0 && idx < n, s"frame $idx out of $n")
      var off = 8; var i = 0
      while (i < idx) { off += 4 + rd32(bytes, off); i += 1 }
      decodeBmp(java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + rd32(bytes, off)))
    }

    def decodeVideo(bytes: Array[Byte]): Video = {
      val (n, ms) = videoHeader(bytes)
      Video(ms, Vector.tabulate(n)(decodeFrame(bytes, _)))
    }
  }

  /** Deterministic content generator: splitmix64 drives pixel/sample bytes,
    * dimensions are simple modular functions of the id — which makes the
    * DECODED header fields SQL-expressible, so x34_decode_meta can oracle
    * the full encode→bytes→parse round trip (the content itself is pinned
    * by golden checksums in MultimodalOpsSpec). */
  object MediaGen {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    val MsPerFrame = 40 // 25 fps

    def mediaType(id: Long): String =
      (((id % 3) + 3) % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }

    def image(id: Long): MediaCodec.Image = {
      val w = 16 + (id % 48).toInt; val h = 16 + ((id / 3) % 32).toInt
      val bgr = new Array[Byte](w * h * 3)
      var i = 0
      while (i < bgr.length) {
        bgr(i) = (mix(id * 0x10001L + i) & 0xff).toByte; i += 1
      }
      MediaCodec.Image(w, h, bgr)
    }

    def audio(id: Long): MediaCodec.Audio = {
      // 8 samples per ms at 8 kHz → durationMs = 1000 + (id % 32) * 100 exact
      val n = 8000 + (id % 32).toInt * 800
      val samples = Array.tabulate(n)(i => (mix(id * 0x20001L + i) & 0xffff).toShort)
      MediaCodec.Audio(8000, samples)
    }

    def video(id: Long): MediaCodec.Video = {
      val frames = 2 + (id % 4).toInt
      val w = 16 + (id % 16).toInt; val h = 12 + (id % 8).toInt
      MediaCodec.Video(MsPerFrame, Vector.tabulate(frames) { f =>
        val bgr = new Array[Byte](w * h * 3)
        var i = 0
        while (i < bgr.length) {
          bgr(i) = (mix(id * 0x30001L + f * 1000003L + i) & 0xff).toByte; i += 1
        }
        MediaCodec.Image(w, h, bgr)
      })
    }

    def payload(id: Long): Array[Byte] = mediaType(id) match {
      // alternate image ids between BMP and PNG — the corpus mixes
      // formats like found data, and decodeImage sniffs the magic
      case "image" => if (((id / 3) % 2) == 0) MediaCodec.encodeBmp(image(id))
                      else MediaCodec.encodePng(image(id))
      case "audio" => MediaCodec.encodeWav(audio(id))
      case _       => MediaCodec.encodeVideo(video(id))
    }
  }

  /** Deterministic synthetic media table from any id column — REAL encoded
    * payloads (BMP/PNG/WAV/GV01) whose content derives from the id, so every
    * test run and every partition layout sees identical binaries. Narrow:
    * payload bytes are born inside the partition that owns the id. */
  def synthesize(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions(_.map(id =>
        MediaRow(id, MediaGen.mediaType(id), MediaGen.payload(id))))
      .toDF()
  }

  /** Decode stage: batch-wise per partition (a real codec would amortize
    * library init per batch exactly here). Parses actual header bytes:
    * BMP/PNG dims (container sniffed from the magic, like found data),
    * WAV sample count / rate, GV01 frame count. The sniffed container
    * name rides along so format mix is queryable — and hash-gated in
    * x34_decode_meta. Narrow. */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (container, meta) = r.media_type match {
          case "image" =>
            val fmt = if (r.payload.length >= 2 && r.payload(0) == 'B' &&
              r.payload(1) == 'M') "bmp" else "png"
            val img = MediaCodec.decodeImage(r.payload)
            (fmt, MediaMeta(img.width, img.height, 0L))
          case "audio" =>
            val a = MediaCodec.decodeWav(r.payload)
            ("wav", MediaMeta(0, 0, a.samples.length.toLong * 1000L / a.sampleRate))
          case _ =>
            val (n, ms) = MediaCodec.videoHeader(r.payload)
            val first = MediaCodec.decodeFrame(r.payload, 0)
            ("gv01", MediaMeta(first.width, first.height, n.toLong * ms))
        }
        DecodedRow(r.media_id, r.media_type, container, r.payload, meta)
      }
    }
  }

  /** Feature extraction: payload → fixed-dim float vector over DECODED
    * content (pixel bytes for image/video, 16-bit samples bucketed by high
    * byte for audio) — a normalized histogram, ready for the X32 similarity
    * operators. Narrow, batch-shaped. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val hist = new Array[Float](dim)
      var n = 0
      def add(b: Int): Unit = { hist(b % dim) += 1f; n += 1 }
      r.media_type match {
        case "image" => MediaCodec.decodeImage(r.payload).bgr.foreach(b => add(b & 0xff))
        case "audio" => MediaCodec.decodeWav(r.payload).samples
          .foreach(s => add(((s >> 8) + 128) & 0xff))
        case _ => MediaCodec.decodeVideo(r.payload).frames
          .foreach(_.bgr.foreach(b => add(b & 0xff)))
      }
      val total = math.max(1, n).toFloat
      MediaFeatures(r.media_id, hist.map(_ / total))
    })
  }

  /** Resize: pure metadata transform (a real pipeline would rewrite the
    * payload; the plumbing — column ops on the meta struct — is identical). */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    // audio rows carry 0×0 dims — the greatest(..., 1) floor keeps the
    // scale division ANSI-safe (scale clamps to 1.0, dims pass through)
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("meta.width"), col("meta.height"), lit(1)))
    decoded.withColumn("meta_resized", struct(
      (col("meta.width") * scale).cast("int").as("width"),
      (col("meta.height") * scale).cast("int").as("height"),
      col("meta.durationMs").as("durationMs")))
  }

  /** X34e: 64-bit perceptual difference hash (dHash — the public
    * aHash/dHash family used for image near-dup detection at scale):
    * integer ITU-R 601 luma, box-averaged onto a 9×8 grid, one bit per
    * horizontally-adjacent cell pair (left < right). All-integer
    * arithmetic ⇒ bit-identical across partitions/JVMs, and EXACTLY
    * invariant to uniform brightness shifts (gradients are preserved —
    * the property that makes it a perceptual hash, spec-pinned). */
  def dHash64(img: MediaCodec.Image): Long = {
    val w = img.width; val h = img.height
    require(w >= 9 && h >= 8, s"dHash64 needs >= 9x8 pixels, got ${w}x$h")
    val sums = new Array[Long](72)   // 8 rows × 9 cols
    val counts = new Array[Long](72)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        val luma = (77 * (img.bgr(i + 2) & 0xff) +
          150 * (img.bgr(i + 1) & 0xff) + 29 * (img.bgr(i) & 0xff)) >> 8
        val cell = gy * 9 + x * 9 / w
        sums(cell) += luma; counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val a = sums(r * 9 + c) / counts(r * 9 + c)
        val b = sums(r * 9 + c + 1) / counts(r * 9 + c + 1)
        if (a < b) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** X34f: 64-bit perceptual hash of an audio clip — the dHash idea on
    * the energy envelope: mean |amplitude| over 65 equal windows, one bit
    * per adjacent-window comparison. All-integer and deterministic;
    * ROBUST to uniform volume scaling (envelope ORDER survives scaling up
    * to integer-quantization ties near equal-energy windows — unlike the
    * image dHash's brightness invariance, which is exact) and to
    * low-order sample noise. */
  def audioDHash64(a: MediaCodec.Audio): Long = {
    val n = a.samples.length
    require(n >= 65, s"audioDHash64 needs >= 65 samples, got $n")
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 65 / n).toInt
      sums(w) += math.abs(a.samples(i).toLong); counts(w) += 1
      i += 1
    }
    var bits = 0L
    var w = 0
    while (w < 64) {
      if (sums(w) / counts(w) < sums(w + 1) / counts(w + 1))
        bits |= 1L << w
      w += 1
    }
    bits
  }

  /** X34e: image near-duplicate pairs by perceptual hash — the multimodal
    * member of the dedup families. dHash computes INSIDE the decode
    * mapPartitions (payload bytes never shuffle; only 16-byte (id, hash)
    * rows flow on), then SimilarityOps.bandedHammingPairs finds every pair within
    * the Hamming budget exactly. */
  def imageNearDups(media: Dataset[MediaRow],
                    maxHamming: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    SimilarityOps.bandedHammingPairs(
      media.filter(col("media_type") === "image").as[MediaRow]
        .mapPartitions(_.map(r =>
          (r.media_id, dHash64(MediaCodec.decodeImage(r.payload)))))
        .toDF("media_id", "h"),
      "media_id", "h", maxHamming)
  }

  /** X34f: audio near-duplicate pairs by envelope hash — same shape as
    * [[imageNearDups]] with [[audioDHash64]] on the decode side. */
  def audioNearDups(media: Dataset[MediaRow],
                    maxHamming: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    SimilarityOps.bandedHammingPairs(
      media.filter(col("media_type") === "audio").as[MediaRow]
        .mapPartitions(_.map(r =>
          (r.media_id, audioDHash64(MediaCodec.decodeWav(r.payload)))))
        .toDF("media_id", "h"),
      "media_id", "h", maxHamming)
  }

  /** X34g: video near-duplicate pairs by shared perceptual FRAMES — the
    * composition a video pipeline runs: every frame dHashes inside the
    * decode pass (payloads never shuffle), frame hashes equi-join
    * EXACTLY (64-bit random-frame collisions are 2⁻⁶⁴ noise), and a pair
    * qualifies when at least `minSharedFrames` frames match. Returns
    * (id_a, id_b, n_shared), id_a < id_b. */
  def videoNearDups(media: Dataset[MediaRow],
                    minSharedFrames: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    val frames = media.filter(col("media_type") === "video").as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val (n, _) = MediaCodec.videoHeader(r.payload)
        (0 until n).iterator.map(f =>
          (r.media_id, dHash64(MediaCodec.decodeFrame(r.payload, f))))
      })
      .toDF("media_id", "fh")
    frames.as("a").join(frames.as("b"), Seq("fh"))
      .filter(col("a.media_id") < col("b.media_id"))
      // n_shared counts DISTINCT shared frame hashes, so a frame repeated
      // inside one clip cannot inflate the pair combinatorially
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("fh"))
      .distinct()
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
  }

  /** Frame sampling for video rows: every `everyMs` (capped at `maxFrames`),
    * seek to the frame via the container's length prefixes, decode THAT
    * frame only, and emit its dims + mean pixel value — content-level
    * output, not just offsets. Narrow: the payload never leaves its
    * partition; only (id, ms, dims, mean) rows flow on. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
      maxFrames: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "video").as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val (n, ms) = MediaCodec.videoHeader(r.payload)
        val durationMs = n.toLong * ms
        Iterator.from(0).map(_ * everyMs).takeWhile(_ < durationMs)
          .take(maxFrames).map { t =>
            val img = MediaCodec.decodeFrame(r.payload, (t / ms).toInt)
            var sum = 0L
            img.bgr.foreach(b => sum += (b & 0xff))
            FrameSample(r.media_id, t, img.width, img.height,
              math.rint(sum.toDouble / img.bgr.length * 1e6) / 1e6)
          }
      })
  }
}
