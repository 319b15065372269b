package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal.{Decoded, JvmCodec}

/** Proves the REAL decode path with real encoded bytes: deterministic
  * synthetic pixels/samples are encoded with the JDK's own writers
  * (PNG/BMP/JPEG via ImageIO, WAV via AudioSystem), then decoded by
  * [[Multimodal.JvmCodec]] — means are checked EXACTLY for the
  * lossless formats (integer-valued double sums are order-free), and
  * the batched pipeline drops corrupt rows without killing the
  * partition. This closes the round-7 "codec seam" residual for every
  * format the JDK ships; video remains the documented JavaCV seam.
  */
class MultimodalJvmSpec extends SparkSpec {

  // deterministic 8x6 3-band test image; sample (x, y, b) fixed by formula
  private val W = 8
  private val H = 6
  private val B = 3
  private def sampleAt(x: Int, y: Int, b: Int): Int = (x * 31 + y * 7 + b * 13) % 256

  private def testImage(): BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    for (y <- 0 until H; x <- 0 until W; b <- 0 until B)
      r.setSample(x, y, b, sampleAt(x, y, b))
    img
  }

  private def encodeImage(fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(testImage(), fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  private val expectedImageMean: Double = {
    var sum = 0.0
    for (y <- 0 until H; x <- 0 until W; b <- 0 until B) sum += sampleAt(x, y, b)
    sum / (W * H * B)
  }

  // deterministic 500-frame mono 16-bit PCM ramp
  private val FRAMES = 500
  private def pcmSample(i: Int): Int = (i * 37 % 2001) - 1000

  private def testWav(): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed, little-endian
    val raw = new Array[Byte](FRAMES * 2)
    for (i <- 0 until FRAMES) {
      val s = pcmSample(i)
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, FRAMES)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val expectedWavMean: Double = {
    var sum = 0.0
    for (i <- 0 until FRAMES) sum += math.abs(pcmSample(i))
    sum / FRAMES / 32768.0
  }

  test("PNG decodes exactly: dims, bands, and the precise sample mean") {
    val Some(d) = JvmCodec.decode("image", encodeImage("png"))
    assert(d == Decoded(W, H, B, 1, expectedImageMean))
  }

  test("BMP decodes exactly (second lossless container, same bytes-in law)") {
    val Some(d) = JvmCodec.decode("image", encodeImage("bmp"))
    assert(d == Decoded(W, H, B, 1, expectedImageMean))
  }

  test("JPEG decodes with exact dims; mean within lossy tolerance") {
    val Some(d) = JvmCodec.decode("image", encodeImage("jpg"))
    assert((d.width, d.height, d.channels, d.frames) == ((W, H, B, 1)))
    assert(math.abs(d.meanIntensity - expectedImageMean) < 8.0,
      s"JPEG mean ${d.meanIntensity} too far from $expectedImageMean")
  }

  test("WAV decodes exactly: channels, frames, normalized mean amplitude") {
    val Some(d) = JvmCodec.decode("audio", testWav())
    assert(d == Decoded(0, 0, 1, FRAMES, expectedWavMean))
  }

  test("corrupt bytes and unsupported kinds isolate to None, never throw") {
    val junk = Array.tabulate[Byte](64)(i => (i * 73 + 11).toByte)
    assert(JvmCodec.decode("image", junk).isEmpty)
    assert(JvmCodec.decode("audio", junk).isEmpty)
    // a valid PNG under the video kind: no JDK video codec — refused
    assert(JvmCodec.decode("video", encodeImage("png")).isEmpty)
    assert(JvmCodec.decode("image", Array.emptyByteArray).isEmpty)
    assert(JvmCodec.decode("image", null).isEmpty)
  }

  test("batched pipeline with the real codec: exact features, corrupt row dropped") {
    import spark.implicits._
    val junk = Array.tabulate[Byte](64)(i => (i * 73 + 11).toByte)
    val rows = Seq(
      (1L, encodeImage("png"), "image"),
      (2L, testWav(), "audio"),
      (3L, junk, "image")) // must vanish, not kill the partition
    val df = rows.toDF("id", "payload", "kind")
      .withColumn("meta", struct(col("kind").as("kind"),
        lit(0L).as("n_bytes"), lit("").as("digest")))
    val got = Multimodal.extractFeatures(df, "id", JvmCodec, batchSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getDouble(6))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == (("image", W, H, B, 1, expectedImageMean)))
    assert(got(2L) == (("audio", 0, 0, 1, FRAMES, expectedWavMean)))
  }
}
