package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling for training-data pipelines: opaque `binary`
 * payload columns + typed metadata, content sniffing, and executor-side
 * batch "decode" / resize / frame-sample plumbing.
 *
 * Image (PNG/JPEG) and audio (WAV) paths decode for REAL through the
 * JDK's own codecs (javax.imageio, javax.sound.sampled — no external
 * jars): header metadata, full pixel decode, and a decode→scale→re-encode
 * resize, exercised end-to-end by [[realPayload]] fixtures and oracled in
 * DuckDB via closed-form round-trip checks. VIDEO decodes container
 * metadata for REAL through an ISO-BMFF box walker ([[parseMp4Meta]]:
 * tkhd track dims, stsz sample count, mvhd timescale — written by
 * [[encodeMp4]], a standards-conforming metadata muxer). The one stubbed
 * boundary left is frame PIXEL decode (the JDK ships no video codec;
 * [[frameSampleStub]] emits real frame indices off the real sample count
 * with pseudo-payload hashes) — swapping it for a JNI/library codec keeps
 * every plan shape identical.
 *
 * Scale design: decode runs per-partition on executors via `mapPartitions`
 * (one codec context per partition, not per row); payloads stay columnar
 * binary end-to-end; metadata extraction is a cheap header sniff.
 */
object Multimodal {

  // ImageIO's default useCache=true backs every ImageInputStream with a
  // TEMP FILE, so each header sniff / decode / re-encode of an in-memory
  // byte[] payload paid a disk round-trip (create + write + delete in
  // java.io.tmpdir) before the codec saw a byte. All payloads here arrive
  // as columnar binary already in memory — decode straight from it.
  // (Object initializer: runs once per executor JVM on first use.)
  javax.imageio.ImageIO.setUseCache(false)

  /** Media metadata schema attached next to a binary payload column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_length", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  private val PNG = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private val JPEG = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  private val WAV = "RIFF".getBytes
  private val MP4 = "ftyp".getBytes

  private def startsWith(b: Array[Byte], magic: Array[Byte], off: Int = 0): Boolean =
    b.length >= off + magic.length && magic.indices.forall(i => b(off + i) == magic(i))

  /** Sniff the media type from magic bytes (real logic — works on any real
    * payload too). */
  def sniffType(payload: Array[Byte]): String = {
    if (payload == null || payload.isEmpty) "empty"
    else if (startsWith(payload, PNG)) "image/png"
    else if (startsWith(payload, JPEG)) "image/jpeg"
    else if (startsWith(payload, WAV)) "audio/wav"
    else if (payload.length > 8 && startsWith(payload, MP4, 4)) "video/mp4"
    else "application/octet-stream"
  }

  /** STUB decode: deterministic pseudo-dimensions derived from the payload
    * hash — fallback for payloads that are not decodable images (synthetic
    * fixtures with magic headers but no real image data). */
  def fakeDecodeDims(payload: Array[Byte]): (Int, Int) = {
    val h = Dedup.fnv64(new String(payload.map(b => (b & 0x7f).toChar)))
    (256 + (Math.floorMod(h, 8L) * 64).toInt, 256 + (Math.floorMod(h >> 8, 8L) * 64).toInt)
  }

  /** REAL image-dimension decode for PNG/JPEG via javax.imageio (in the
    * JDK, no extra jars). Header-only: ImageReader.getWidth/getHeight read
    * metadata without decoding pixel data. Returns None when no installed
    * reader recognizes the payload. */
  def decodeImageDims(payload: Array[Byte]): Option[(Int, Int)] =
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(in); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } finally if (in != null) in.close()
    } catch { case _: Exception => None }

  /** REAL audio header decode for WAV/AIFF/AU via javax.sound.sampled (in
    * the JDK, no extra jars): AudioFileFormat reads the header only.
    * Returns (sampleRate, channels, frameLength); None when the payload is
    * not a parseable audio file (synthetic fixtures with a WAV magic but no
    * fmt chunk fall back to the stub rate). */
  def decodeAudioMeta(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val aff = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
      val fmt = aff.getFormat
      Some((fmt.getSampleRate.toInt, fmt.getChannels, aff.getFrameLength))
    } catch { case _: Exception => None }

  /** Attach a typed metadata struct next to `binCol`. byte_length is
    * computed natively (`length` on binary = octet count, codegen'd); only
    * the sniff + decode kernels go through typed UDFs. Image dims, audio
    * sample rate / frame count, and video container metadata (tkhd dims +
    * stsz sample count via [[parseMp4Meta]]) all decode for REAL
    * (javax.imageio / javax.sound / the ISO-BMFF walker); undecodable
    * payloads fall back to the deterministic stubs. */
  def attachMetadata(df: DataFrame, binCol: String): DataFrame = {
    val sniff = udf((b: Array[Byte]) => sniffType(b))
    // One decode kernel per payload: (width, height, sample_rate,
    // n_frames) — a video payload parses its MP4 container exactly ONCE
    // (split dims/audio UDFs used to walk the same boxes twice per row).
    val decode = udf((b: Array[Byte], t: String) =>
      if (t == null) (0, 0, 0, 0)
      else if (t.startsWith("image/")) {
        val (w, h) = decodeImageDims(b).getOrElse(fakeDecodeDims(b)) // real decode; stub fallback
        (w, h, 0, 0)
      } else if (t.startsWith("video/"))
        parseMp4Meta(b) // real box walk; 0x0 dims + 32-frame stub fallback
          .map { case (w, h, n) => (w, h, 0, n) }.getOrElse((0, 0, 0, 32))
      else if (t.startsWith("audio/")) {
        val (sr, n) = decodeAudioMeta(b).map(m => (m._1, m._3)).getOrElse((16000, 0)) // real decode; stub fallback
        (0, 0, sr, n)
      } else (0, 0, 0, 0))
    df.withColumn("_mt", sniff(col(binCol)))
      .withColumn("_mm", decode(col(binCol), col("_mt")))
      .withColumn("media_meta", struct(
        col("_mt").as("media_type"),
        length(col(binCol)).cast("long").as("byte_length"),
        col("_mm._1").as("width"),
        col("_mm._2").as("height"),
        col("_mm._3").as("sample_rate"),
        col("_mm._4").as("n_frames")))
      .drop("_mt", "_mm")
  }

  /** Feature-extraction schema: fixed-width float vector per payload. */
  def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /**
   * Executor-side batch "decode + featurize" over partitions: the real
   * plumbing for a codec that amortizes setup per partition. The decode
   * kernel itself is a deterministic STUB seeded by the payload byte
   * length (closed-form so the DuckDB oracle can mirror it exactly).
   */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("feature", ArrayType(FloatType, false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // >>> per-partition codec init would go here (real decoder handle) <<<
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val h = if (payload == null) 0L else payload.length.toLong
        val feat = Array.tabulate(dim) { i =>
          (((h * (i + 1) * 0x9E3779B97F4A7C15L) >>> 40).toInt % 1000) / 1000.0f
        }
        Row.fromSeq(r.toSeq :+ feat.toSeq)
      }
    }(enc)
  }

  /** STUB resize: re-derives dimensions capped to a max edge; real impl
    * would transcode the payload. Plumbing (column shapes) is real. */
  def resizeStub(df: DataFrame, maxEdge: Int): DataFrame = {
    require(df.schema.fieldNames.contains("media_meta"), "attachMetadata first")
    df.withColumn("media_meta", struct(
      col("media_meta.media_type"),
      col("media_meta.byte_length"),
      least(col("media_meta.width"), lit(maxEdge)).as("width"),
      least(col("media_meta.height"), lit(maxEdge)).as("height"),
      col("media_meta.sample_rate"),
      col("media_meta.n_frames")))
  }

  /** STUB frame sampling for video payloads: emits every k-th frame index
    * with a per-frame pseudo-payload hash (real impl: demux + decode). */
  def frameSampleStub(df: DataFrame, binCol: String, everyK: Int): DataFrame = {
    val frameUdf = udf((b: Array[Byte], nFrames: Int) => {
      if (b == null || nFrames <= 0) Seq.empty[(Int, Long)]
      else (0 until nFrames by everyK).map(i => (i, Dedup.fnv64(i + ":" + b.length)))
    })
    df.withColumn("_frames", frameUdf(col(binCol), col("media_meta.n_frames")))
      .withColumn("frame", explode(col("_frames")))
      .select(col("*"), col("frame._1").as("frame_index"), col("frame._2").as("frame_hash"))
      .drop("_frames", "frame")
  }

  // ------------------------------------------------------------------
  // REAL media kernels (JDK-only: javax.imageio + javax.sound.sampled;
  // no external codec jars). These replace the r11 "decode kernels
  // stubbed" state: fixtures below emit genuinely decodable PNG/JPEG/WAV
  // payloads, so attachMetadata/resizeImages/pixelStats exercise the real
  // decode path end-to-end, and the DuckDB oracle checks the full
  // encode→decode round trip via closed-form expected values.
  // ------------------------------------------------------------------

  /** Encode a solid-color RGB image as PNG (lossless — pixels round-trip
    * exactly). Headless-safe: BufferedImage + ImageIO need no display. */
  def encodePng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode a solid-color RGB image as JPEG (dims exact; pixels lossy —
    * pixel-level oracles use PNG only). */
  def encodeJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Hand-assemble a canonical PCM16 mono WAV (44-byte RIFF/fmt/data
    * header + samples) — byte-deterministic, parseable by
    * javax.sound.sampled. Sample i is a small deterministic sawtooth. */
  def encodeWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits/sample
    bb.put("data".getBytes); bb.putInt(dataLen)
    var i = 0
    while (i < nSamples) { bb.putShort(((i % 64) * 512 - 16384).toShort); i += 1 }
    bb.array()
  }

  /** Assemble a structurally REAL ISO-BMFF (MP4) container carrying only
    * metadata boxes — `ftyp` + `moov(mvhd, trak(tkhd, mdia(mdhd,
    * minf(stbl(stsz)))))` with big-endian sizes/types per ISO/IEC
    * 14496-12. No codec payload (`mdat` absent): the JDK ships no video
    * codec, and the engine's video contract is container METADATA — track
    * dimensions from `tkhd` (16.16 fixed point), sample count from
    * `stsz`, duration/timescale from `mvhd`. Any standards-conforming
    * demuxer parses this header. */
  def encodeMp4(w: Int, h: Int, nFrames: Int, timescale: Int = 600): Array[Byte] = {
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length); bb.put(tp.getBytes("ASCII")); bb.put(payload)
      bb.array()
    }
    def full(tp: String, payload: Array[Byte]): Array[Byte] =
      box(tp, Array[Byte](0, 0, 0, 0) ++ payload) // version 0, flags 0
    val duration = nFrames * timescale / 24 // nominal 24 fps
    val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "isom".getBytes)
    val mvhd = full("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0); bb.putInt(0)              // creation, modification
      bb.putInt(timescale); bb.putInt(duration)
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0) // rate, volume, reserved
      bb.putLong(0)                            // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt) // identity matrix
      (1 to 6).foreach(_ => bb.putInt(0))      // pre_defined
      bb.putInt(2)                             // next_track_ID
      bb.array()
    })
    val tkhd = full("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(80)
      bb.putInt(0); bb.putInt(0)              // creation, modification
      bb.putInt(1); bb.putInt(0)              // track_ID, reserved
      bb.putInt(duration); bb.putLong(0)      // duration, reserved
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0) // layer, group, volume, reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(w << 16); bb.putInt(h << 16)  // 16.16 fixed-point dims
      bb.array()
    })
    val mdhd = full("mdhd", {
      val bb = java.nio.ByteBuffer.allocate(20)
      bb.putInt(0); bb.putInt(0); bb.putInt(timescale); bb.putInt(duration)
      bb.putShort(0x55C4.toShort); bb.putShort(0) // language 'und', pre_defined
      bb.array()
    })
    val stsz = full("stsz", {
      val bb = java.nio.ByteBuffer.allocate(8)
      bb.putInt(1000)      // constant sample_size (no per-sample table)
      bb.putInt(nFrames)   // sample_count
      bb.array()
    })
    val moov = box("moov", mvhd ++ box("trak",
      tkhd ++ box("mdia", mdhd ++ box("minf", box("stbl", stsz)))))
    ftyp ++ moov
  }

  /** REAL ISO-BMFF box walk: (width, height, n_frames) from `tkhd`/`stsz`.
    * Tolerates unknown sibling boxes, 64-bit `size==1` largesize headers,
    * `size==0` ("to end of file"), and version-1 `tkhd` (64-bit times);
    * any structural violation returns None (caller falls back to the
    * documented stub values). */
  def parseMp4Meta(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var w, h, frames = -1
    def walk(from: Int, to: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val bb = java.nio.ByteBuffer.wrap(payload)
        val size0 = bb.getInt(off).toLong & 0xFFFFFFFFL
        val tp = new String(payload, off + 4, 4, "ASCII")
        var hdr = 8L
        val size =
          // largesize sits AFTER the 4 type bytes: absolute offset off+8
          // (a relative read after getInt landed on the type bytes and
          // returned garbage for any real >4GB-mdat file).
          if (size0 == 1) { if (off + 16 > to) return false; hdr = 16; bb.getLong(off + 8) }
          else if (size0 == 0) (to - off).toLong
          else size0
        if (size < hdr || off + size > to) return false
        val body = off + hdr.toInt
        tp match {
          case t if containers(t) => if (!walk(body, off + size.toInt)) return false
          case "tkhd" =>
            if (body >= payload.length) return false
            val v = payload(body) & 0xFF
            // fullbox verflags (4) + creation/modification/track_ID/
            // reserved/duration (v0 = 20, v1 = 32) + reserved int[2] (8)
            // + layer/group/volume/reserved (8) + matrix (36) → dims.
            val fixed = body + 4 + (if (v == 1) 32 else 20) + 8 + 8 + 36
            if (fixed + 8 > off + size) return false
            val db = java.nio.ByteBuffer.wrap(payload)
            w = db.getInt(fixed) >>> 16; h = db.getInt(fixed + 4) >>> 16
          case "stsz" =>
            // fullbox verflags (4) + sample_size (4) → sample_count.
            if (body + 12 > off + size) return false
            frames = java.nio.ByteBuffer.wrap(payload).getInt(body + 8)
          case _ => ()
        }
        off += size.toInt
      }
      true
    }
    try {
      if (!walk(0, payload.length)) None
      else if (w >= 0 && h >= 0 && frames >= 0) Some((w, h, frames)) else None
    } catch { case _: Exception => None }
  }

  /** Deterministic REAL payloads keyed by id — the decodable counterpart
    * of [[syntheticPayload]]. Closed forms (mirrored by the DuckDB
    * oracles; all arithmetic is integer):
    *   id % 4 == 0 → PNG,  w = 16 + id%13, h = 16 + (id/13)%11,
    *                 color r = id%256, g = (id*7)%256, b = (id*13)%256
    *   id % 4 == 1 → JPEG, w = 12 + id%9,  h = 12 + (id/9)%7
    *   id % 4 == 2 → WAV,  rate = 8000 + (id%5)*4000, frames = 64 + id%64
    *   id % 4 == 3 → MP4,  w = 32 + (id%10)*8, h = 32 + ((id/10)%10)*8,
    *                 frames = 24 + id%48 (real ISO-BMFF metadata boxes via
    *                 [[encodeMp4]]; frame PIXEL decode stays out of scope —
    *                 no codec in the JDK). */
  def realPayload(idCol: Column): Column = {
    val mk = udf((id: Long) => (id % 4) match {
      case 0 =>
        val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
        encodePng((16 + id % 13).toInt, (16 + (id / 13) % 11).toInt, rgb)
      case 1 =>
        val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
        encodeJpeg((12 + id % 9).toInt, (12 + (id / 9) % 7).toInt, rgb)
      case 2 => encodeWav((8000 + (id % 5) * 4000).toInt, (64 + id % 64).toInt)
      case _ => encodeMp4((32 + (id % 10) * 8).toInt, (32 + (id / 10) % 10 * 8).toInt,
        (24 + id % 48).toInt)
    })
    mk(idCol)
  }

  /** REAL image resize: decode → scale to fit `maxEdge` (integer floor
    * arithmetic: nw = max(1, w*maxEdge/max(w,h)), same for nh; images
    * already inside the edge pass through untouched) → re-encode as PNG
    * (lossless, so a follow-up decode sees the exact resized dims).
    * Non-image payloads pass through unchanged. Runs via mapPartitions so
    * a real codec context is created once per partition, not per row. */
  def resizeImages(df: DataFrame, binCol: String, maxEdge: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val t = sniffType(payload)
        val resized =
          if (t != "image/png" && t != "image/jpeg") payload
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            if (img == null || math.max(img.getWidth, img.getHeight) <= maxEdge) payload
            else {
              val m = math.max(img.getWidth, img.getHeight)
              val nw = math.max(1, img.getWidth * maxEdge / m)
              val nh = math.max(1, img.getHeight * maxEdge / m)
              val dst = new java.awt.image.BufferedImage(nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              out.toByteArray
            }
          } catch { case _: Exception => payload }
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** REAL pixel decode: per-image mean R/G/B (integer mean over all
    * pixels). PNG is lossless, so for the solid-color fixtures the means
    * equal the fill color exactly — the oracle checks that closed form.
    * Non-decodable payloads yield nulls. */
  def pixelStats(df: DataFrame, binCol: String): DataFrame = {
    val stats = udf((b: Array[Byte]) => {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          Some(((sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
        }
      } catch { case _: Exception => None }
    })
    df.withColumn("_px", stats(col(binCol)))
      .withColumn("mean_r", col("_px._1"))
      .withColumn("mean_g", col("_px._2"))
      .withColumn("mean_b", col("_px._3"))
      .drop("_px")
  }

  /** Build a deterministic synthetic payload column from a text column —
    * gives tests/fixtures real binary bytes with valid magic headers. */
  def syntheticPayload(textCol: Column, idCol: Column): Column = {
    val mk = udf((t: String, id: Long) => {
      val body = (if (t == null) "" else t).getBytes("UTF-8")
      val magic: Array[Byte] = (id % 4) match {
        case 0 => Array[Byte](0x89.toByte, 'P', 'N', 'G')
        case 1 => Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
        case 2 => "RIFF".getBytes
        case _ => Array[Byte](0, 0, 0, 8) ++ "ftyp".getBytes
      }
      magic ++ body
    })
    mk(textCol, idCol)
  }
}
