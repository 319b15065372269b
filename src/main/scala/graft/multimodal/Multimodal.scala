package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages that run per-partition in bounded-size batches.
  *
  * The Spark-side mechanics (schema, batching, partition preservation,
  * column pruning before the expensive stage) are real and tested, and
  * so is the default decode path: [[JvmCodec]] decodes images
  * (ImageIO), PCM audio (AudioSystem) and MJPEG-in-AVI video (RIFF
  * walk + per-frame ImageIO) on the pure JDK. [[StubCodec]] remains
  * for scale/plumbing tests (it decodes ANY bytes deterministically);
  * richer codecs (MP4/H.264, CLIP embeddings) swap in at the same
  * `Codec` seam without touching the pipeline.
  */
object Multimodal {

  /** Typed metadata accompanying every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),       // image | audio | video
    StructField("n_bytes", LongType),
    StructField("digest", StringType)))

  /** Attach a payload + metadata struct to any DataFrame with a source
    * column (here: utf-8 bytes of `textCol` stand in for media bytes —
    * the testdata has no real media; the schema is what matters). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        when(pmod(col(idCol), lit(3)) === 0, "image")
          .when(pmod(col(idCol), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        octet_length(col(textCol)).cast(LongType).as("n_bytes"),
        sha2(col(textCol), 256).as("digest")))

  /** What a decode produces, whatever the codec. */
  final case class Decoded(
      width: Int, height: Int, channels: Int, frames: Int,
      meanIntensity: Double)

  /** The codec seam. Real implementations decode bytes; the stub is
    * deterministic arithmetic on the payload so tests are stable. */
  trait Codec extends Serializable {
    def decode(kind: String, payload: Array[Byte]): Option[Decoded]
  }

  /** Deterministic fake: "dimensions" derived from payload length,
    * "intensity" = mean unsigned byte. Kept for scale/plumbing tests —
    * it decodes ANY bytes, so corpus-sized runs need no real media.
    * The REAL decode path is [[JvmCodec]]. */
  object StubCodec extends Codec {
    override def decode(kind: String, payload: Array[Byte]): Option[Decoded] = {
      if (payload == null || payload.isEmpty) None
      else {
        val n = payload.length
        val mean = payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
        val d = kind match {
          case "image" => Decoded(n % 640 + 1, n % 480 + 1, 3, 1, mean)
          case "audio" => Decoded(0, 0, 2, n / 4 + 1, mean)
          case "video" => Decoded(n % 640 + 1, n % 480 + 1, 3, n / 1024 + 1, mean)
          case _ => return None
        }
        Some(d)
      }
    }
  }

  /** REAL native decode on the pure JDK — no external libraries:
    *
    *  - image: `javax.imageio.ImageIO` (PNG / JPEG / BMP / GIF ship
    *    with the JRE). width/height/bands from the decoded raster;
    *    meanIntensity = mean over EVERY sample of every band (exact
    *    double sum over integer samples).
    *  - audio: `javax.sound.sampled.AudioSystem` (WAV / AIFF / AU).
    *    channels/frames from the stream; meanIntensity = mean
    *    absolute amplitude normalized to [0, 1] (16-bit signed and
    *    8-bit unsigned PCM; other encodings -> None rather than a
    *    wrong number).
    *  - video: MJPEG/DIB-in-AVI on the pure JDK — the RIFF walker
    *    below collects the `movi` list's per-frame video chunks (ids
    *    `##dc`/`##db`: compressed/uncompressed frames of stream ##)
    *    and decodes EACH frame with ImageIO. `##dc` MJPEG frames are
    *    plain JPEGs; `##db` frames from STANDARD writers are
    *    headerless DIB pixel data (no BITMAPFILEHEADER — ImageIO
    *    alone returns null), so the walker also captures each video
    *    stream's `strf` BITMAPINFOHEADER from the `hdrl` list and
    *    synthesizes the 14-byte BITMAPFILEHEADER + strf prefix that
    *    turns the raw payload into a decodable BMP (a `##db` payload
    *    that is ALREADY a full BMP — some cooperating writers — still
    *    decodes via the direct attempt first). width/height/channels
    *    come from the first decoded frame, `frames` counts decoded
    *    frames, and meanIntensity is the mean over every sample of
    *    every band of every frame. Non-AVI bytes, foreign codecs
    *    (frames ImageIO has no reader for even with the synthesized
    *    header) and truncated chunk trees all return None. Other
    *    containers (MP4/H.264 et al.) still need a JavaCV/ffmpeg
    *    binding at this SAME seam (the per-batch init hook in
    *    [[extractFeatures]] exists to amortize that load).
    *
    * Any parse failure returns None — the per-row error-isolation
    * contract (a corrupt file must never kill the partition).
    * `ImageIO.setUseCache(false)` keeps decoding in-memory: the
    * default file cache would do temp-dir I/O per image per executor
    * thread. MultimodalJvmSpec round-trips real encoded bytes
    * (deterministic synthetic pixels/samples/frames) through this
    * codec inside the batched pipeline and checks the EXACT means. */
  object JvmCodec extends Codec {
    javax.imageio.ImageIO.setUseCache(false)

    override def decode(kind: String, payload: Array[Byte]): Option[Decoded] = {
      if (payload == null || payload.isEmpty) return None
      try {
        kind match {
          case "image" => decodeImage(payload)
          case "audio" => decodeAudio(payload)
          case "video" => decodeVideo(payload)
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Sum of every raster sample plus the sample count — shared by the
      * single-image and per-video-frame paths so both means obey the
      * same bytes-in law. */
    private def rasterSum(img: java.awt.image.BufferedImage): (Int, Int, Int, Double, Long) = {
      val raster = img.getRaster
      val bands = raster.getNumBands
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      (w, h, bands, sum, w.toLong * h * bands)
    }

    private def decodeImage(payload: Array[Byte]): Option[Decoded] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None // ImageIO signals "no reader" with null, not an exception
      else {
        val (w, h, bands, sum, n) = rasterSum(img)
        Some(Decoded(w, h, bands, 1, if (n == 0) 0.0 else sum / n))
      }
    }

    /** MJPEG/DIB-in-AVI: RIFF chunk walk -> per-frame ImageIO decode.
      * The walker is iterative over a byte array (LISTs recurse at
      * most a few levels; sizes are validated against the buffer
      * before any slice, so truncated or hostile chunk trees fall out
      * as None, never as an out-of-bounds throw). */
    private def decodeVideo(payload: Array[Byte]): Option[Decoded] = {
      if (payload.length < 12) return None
      def fourcc(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def u32(off: Int): Long =
        (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
          ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      // a video data chunk id is <2-digit stream number>dc|db
      def isFrameChunk(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      val frames = Seq.newBuilder[(Int, Int, Int)] // (stream#, dataOff, dataLen)
      // hdrl stream headers in document order: stream i's strh fccType
      // + its strf payload bounds (the BITMAPINFOHEADER for vids)
      val streams = scala.collection.mutable.ArrayBuffer.empty[(String, Option[(Int, Int)])]
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourcc(off)
          val size = u32(off + 4) // unsigned — cannot be negative
          val end = off + 8 + size // Long: no overflow on hostile sizes
          if (id == "LIST" || id == "RIFF") {
            // a truncated LIST still yields its fully-present children:
            // descend into the available prefix (keep-what-parsed)
            if (size >= 4 && off + 12 <= to)
              walk(off + 12, math.min(end, to.toLong).toInt)
          } else if (id == "strh" && size >= 4 && end <= to) {
            streams += ((fourcc(off + 8), None))
          } else if (id == "strf" && size > 0 && end <= to
              && streams.nonEmpty && streams.last._2.isEmpty) {
            streams(streams.length - 1) =
              (streams.last._1, Some((off + 8, size.toInt)))
          } else if (isFrameChunk(id) && size > 0 && end <= to) {
            frames += ((id.substring(0, 2).toInt, off + 8, size.toInt))
          }
          if (end > to) return // truncated tail: nothing more to parse
          off = end.toInt + (size.toInt & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      // standard-writer `##db` frames are headerless DIB pixel data:
      // synthesize BITMAPFILEHEADER(14) + strf(BITMAPINFOHEADER [+
      // palette]) + pixels so ImageIO's BMP reader takes them
      def asBmp(stream: Int, at: Int, len: Int): Option[Array[Byte]] =
        streams.lift(stream).collect {
          case ("vids", Some((so, sl))) if sl >= 40 =>
            val fileSize = 14 + sl + len
            val dataOff = 14 + sl
            val out = new Array[Byte](fileSize)
            out(0) = 'B'; out(1) = 'M'
            def putU32(o: Int, v: Int): Unit = {
              out(o) = (v & 0xff).toByte
              out(o + 1) = ((v >> 8) & 0xff).toByte
              out(o + 2) = ((v >> 16) & 0xff).toByte
              out(o + 3) = ((v >> 24) & 0xff).toByte
            }
            putU32(2, fileSize); putU32(10, dataOff)
            System.arraycopy(payload, so, out, 14, sl)
            System.arraycopy(payload, at, out, 14 + sl, len)
            out
        }
      var w = 0; var h = 0; var bands = 0
      var sum = 0.0; var n = 0L; var decoded = 0
      for ((stream, at, len) <- frames.result()) {
        // direct attempt first (JPEG `##dc`; full-BMP `##db` from
        // cooperating writers), then the synthesized-header DIB path
        val direct = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, at, len))
        val img =
          if (direct != null) direct
          else asBmp(stream, at, len).map(b => javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b))).orNull
        if (img != null) { // foreign codec frames skip, same isolation rule
          val (fw, fh, fb, fsum, fn) = rasterSum(img)
          if (decoded == 0) { w = fw; h = fh; bands = fb }
          sum += fsum; n += fn; decoded += 1
        }
      }
      if (decoded == 0) None
      else Some(Decoded(w, h, bands, decoded, if (n == 0) 0.0 else sum / n))
    }

    private def decodeAudio(payload: Array[Byte]): Option[Decoded] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val data = in.readAllBytes()
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val mean: Option[Double] =
          if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) {
            var sum = 0.0; var i = 0
            while (i + 1 < data.length) {
              val s =
                if (fmt.isBigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
                else (data(i + 1) << 8) | (data(i) & 0xff)
              sum += math.abs(s.toShort.toInt); i += 2
            }
            val n = data.length / 2
            Some(if (n == 0) 0.0 else sum / n / 32768.0)
          } else if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
              && bits == 8) {
            var sum = 0.0; var i = 0
            while (i < data.length) { sum += math.abs((data(i) & 0xff) - 128); i += 1 }
            Some(if (data.isEmpty) 0.0 else sum / data.length / 128.0)
          } else None // exotic encodings: refuse rather than mis-measure
        val frames =
          if (in.getFrameLength >= 0) in.getFrameLength
          else if (fmt.getFrameSize > 0) data.length.toLong / fmt.getFrameSize
          else 0L
        mean.map(m => Decoded(0, 0, fmt.getChannels, frames.toInt, m))
      } finally in.close()
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("frames", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** Decode + feature-extract, batched per partition (the Scala
    * equivalent of `mapInPandas`: bounded batches keep peak memory at
    * batchSize x payload, independent of partition row count). Input
    * must have (idCol, payload, meta); rows the codec rejects are
    * dropped (per-file error isolation, like the EDINET parsers). */
  def extractFeatures(df: DataFrame, idCol: String, codec: Codec,
      batchSize: Int = 64): DataFrame = {
    val pruned = df.select(col(idCol).cast(LongType).as("id"),
      col("payload"), col("meta.kind").as("kind"))
    val enc = RowEncoder.encoderFor(featureSchema)
    pruned.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would amortize per-batch init (model load, JNI
        // handle) here — this is the seam the batching exists for
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val kind = r.getString(2)
          codec.decode(kind, payload).map(d =>
            Row(id, kind, d.width, d.height, d.channels, d.frames, d.meanIntensity))
        }
      }
    }(enc)
  }

  /** Embedding stage at the same codec seam: payload bytes -> a unit
    * `array<float>` vector. The stub derives a normalized byte-bigram
    * histogram — deterministic, content-sensitive, identical inputs give
    * identical vectors, so downstream ANN/dedup (graft.operators.
    * Similarity) is testable end-to-end. A real encoder (CLIP et al.)
    * replaces the per-batch closure; batching amortizes model init
    * exactly as in [[extractFeatures]]. */
  def embedPayload(df: DataFrame, idCol: String, dim: Int = 64,
      batchSize: Int = 64): DataFrame = {
    require(dim > 0)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", org.apache.spark.sql.types.ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init seam (model load) lives here
          batch.iterator.flatMap { r =>
            val payload = r.getAs[Array[Byte]](1)
            if (payload == null || payload.length < 2) None
            else {
              val hist = new Array[Float](dim)
              var i = 0
              while (i < payload.length - 1) {
                val bigram = ((payload(i) & 0xff) * 131 + (payload(i + 1) & 0xff)) % dim
                hist(bigram) += 1f
                i += 1
              }
              val norm = math.sqrt(hist.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
              val unit = if (norm == 0f) hist else hist.map(_ / norm)
              Some(Row(r.getLong(0), unit.toSeq))
            }
          }
        }
      }(enc)
  }

  /** "Resize" stage: deterministic byte subsampling (every factor-th
    * byte) standing in for a pixel resize — binary in, binary out, same
    * schema, so downstream stages are oblivious. Real impl: codec
    * resize in the same per-partition loop. */
  def resizePayload(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    require(factor >= 1)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val resized =
            if (payload == null) null
            else payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
          Row(r.getLong(0), resized)
        }
      }(enc)
  }

  /** Frame sampling for video-kind rows: emit one row per sampled frame
    * index (0, step, 2*step, ... < frames). */
  def sampleFrames(features: DataFrame, step: Int): DataFrame =
    features
      .filter(col("kind") === "video")
      // frames=0 (codec parsed but empty) would make sequence(0,-1,step)
      // throw and kill the job — drop such rows, same isolation contract
      // as extractFeatures
      .filter(col("frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("frames") - 1, lit(step))))
      .select(col("id"), col("frame_idx"), col("width"), col("height"))
}
