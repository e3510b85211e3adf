package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling for training-data pipelines: opaque `binary`
 * payload columns + typed metadata, content sniffing, and executor-side
 * batch "decode" / resize / frame-sample plumbing.
 *
 * The actual media codecs are NOT available in this environment, so the
 * decode kernels are STUBBED with deterministic fakes (clearly marked) —
 * the Spark-side contract (schemas, mapPartitions batching, partitioning,
 * column shapes) is real and tested. Swapping `fakeDecode*` for a JNI/
 * library decode keeps every plan shape identical.
 *
 * Scale design: decode runs per-partition on executors via `mapPartitions`
 * (one codec context per partition, not per row); payloads stay columnar
 * binary end-to-end; metadata extraction is a cheap header sniff.
 */
object Multimodal {

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
    * Returns (sampleRate, channels); None when the payload is not a
    * parseable audio file (synthetic fixtures with a WAV magic but no fmt
    * chunk fall back to the stub rate). */
  def decodeAudioMeta(payload: Array[Byte]): Option[(Int, Int)] =
    try {
      val fmt = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(payload)).getFormat
      Some((fmt.getSampleRate.toInt, fmt.getChannels))
    } catch { case _: Exception => None }

  /** Attach a typed metadata struct next to `binCol`. byte_length is
    * computed natively (`length` on binary = octet count, codegen'd); only
    * the sniff + decode kernels go through typed UDFs. Image dims and
    * audio sample rates decode for REAL (javax.imageio / javax.sound);
    * undecodable payloads fall back to the deterministic stubs. */
  def attachMetadata(df: DataFrame, binCol: String): DataFrame = {
    val sniff = udf((b: Array[Byte]) => sniffType(b))
    val dims = udf((b: Array[Byte], t: String) =>
      if (t != null && t.startsWith("image/"))
        decodeImageDims(b).getOrElse(fakeDecodeDims(b)) // real decode; stub fallback
      else (0, 0))
    val rate = udf((b: Array[Byte], t: String) =>
      if (t != null && t.startsWith("audio/"))
        decodeAudioMeta(b).map(_._1).getOrElse(16000) // real decode; stub fallback
      else 0)
    df.withColumn("_mt", sniff(col(binCol)))
      .withColumn("_dims", dims(col(binCol), col("_mt")))
      .withColumn("media_meta", struct(
        col("_mt").as("media_type"),
        length(col(binCol)).cast("long").as("byte_length"),
        col("_dims._1").as("width"),
        col("_dims._2").as("height"),
        rate(col(binCol), col("_mt")).as("sample_rate"),
        when(col("_mt").startsWith("video/"), lit(32)).otherwise(lit(0)).as("n_frames")))
      .drop("_mt", "_dims")
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
