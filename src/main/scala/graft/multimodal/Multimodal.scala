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
  * column pruning before the expensive stage) are real and tested. The
  * codec itself is a STUB: this container ships no image/audio
  * libraries, so [[StubCodec]] produces deterministic fake decodes with
  * the same interface a real codec (JavaCV/TwelveMonkeys/ffmpeg) would
  * have. Swap `Codec` implementations to go live; nothing else changes.
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
    *  - video: None — the JDK ships no video codec; a JavaCV/ffmpeg
    *    binding plugs into this SAME seam (the per-batch init hook in
    *    [[extractFeatures]] exists to amortize exactly that load).
    *
    * Any parse failure returns None — the per-row error-isolation
    * contract (a corrupt file must never kill the partition).
    * `ImageIO.setUseCache(false)` keeps decoding in-memory: the
    * default file cache would do temp-dir I/O per image per executor
    * thread. MultimodalJvmSpec round-trips real encoded bytes
    * (deterministic synthetic pixels/samples) through this codec
    * inside the batched pipeline and checks the EXACT means. */
  object JvmCodec extends Codec {
    javax.imageio.ImageIO.setUseCache(false)

    override def decode(kind: String, payload: Array[Byte]): Option[Decoded] = {
      if (payload == null || payload.isEmpty) return None
      try {
        kind match {
          case "image" => decodeImage(payload)
          case "audio" => decodeAudio(payload)
          case _ => None // video: no JDK codec — see scaladoc
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    private def decodeImage(payload: Array[Byte]): Option[Decoded] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None // ImageIO signals "no reader" with null, not an exception
      else {
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
        val n = w.toLong * h * bands
        Some(Decoded(w, h, bands, 1, if (n == 0) 0.0 else sum / n))
      }
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
