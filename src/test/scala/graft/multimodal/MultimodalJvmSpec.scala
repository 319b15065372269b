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
  * (PNG/BMP/JPEG via ImageIO, WAV via AudioSystem, frames boxed into
  * hand-built RIFF-AVI containers), then decoded by
  * [[Multimodal.JvmCodec]] — means are checked EXACTLY for the
  * lossless formats (integer-valued double sums are order-free), and
  * the batched pipeline drops corrupt rows without killing the
  * partition. With the MJPEG-in-AVI walker, every media leg now has a
  * real pure-JDK decode; only richer containers (MP4/H.264) remain at
  * the JavaCV seam.
  */
class MultimodalJvmSpec extends SparkSpec {

  // deterministic 8x6 3-band test image; sample (x, y, b) fixed by
  // formula, shifted per video frame k so frames differ
  private val W = 8
  private val H = 6
  private val B = 3
  private def sampleAt(x: Int, y: Int, b: Int, k: Int = 0): Int =
    (x * 31 + y * 7 + b * 13 + k * 29) % 256

  private def testImage(k: Int = 0): BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    for (y <- 0 until H; x <- 0 until W; b <- 0 until B)
      r.setSample(x, y, b, sampleAt(x, y, b, k))
    img
  }

  private def encodeImage(fmt: String, k: Int = 0): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(testImage(k), fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  private val expectedImageMean: Double = {
    var sum = 0.0
    for (y <- 0 until H; x <- 0 until W; b <- 0 until B) sum += sampleAt(x, y, b)
    sum / (W * H * B)
  }

  // ---- hand-built RIFF-AVI (the container JvmCodec's walker parses) ----

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  private def list(typ: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ children)

  /** Minimal spec-shaped AVI: hdrl with a zeroed avih (the walker keys
    * on frame chunks, not the header) + a movi list of frame chunks. */
  private def aviOf(frameId: String, frames: Seq[Array[Byte]]): Array[Byte] = {
    val body = list("hdrl", chunk("avih", new Array[Byte](56))) ++
      list("movi", frames.flatMap(f => chunk(frameId, f)).toArray)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4) ++
      "AVI ".getBytes("US-ASCII") ++ body
  }

  /** Minimal AVI with a REAL `hdrl` video stream declaration: avih +
    * LIST strl [strh(vids) + strf(BITMAPINFOHEADER)] — what standard
    * writers emit, and what the codec needs to reconstruct headerless
    * `##db` DIB frames. */
  private def aviWithVidsHeader(frameId: String, frames: Seq[Array[Byte]]): Array[Byte] = {
    val strl = list("strl",
      chunk("strh", "vids".getBytes("US-ASCII") ++ new Array[Byte](52)) ++
        chunk("strf", infoHeader()))
    val body = list("hdrl", chunk("avih", new Array[Byte](56)) ++ strl) ++
      list("movi", frames.flatMap(f => chunk(frameId, f)).toArray)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4) ++
      "AVI ".getBytes("US-ASCII") ++ body
  }

  private val dibRowSize = (W * 3 + 3) / 4 * 4

  /** 40-byte BITMAPINFOHEADER: 24-bit, W x H, bottom-up. */
  private def infoHeader(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(40).putInt(W).putInt(H).putShort(1).putShort(24)
      .putInt(0).putInt(dibRowSize * H).putInt(0).putInt(0)
      .putInt(0).putInt(0)
    b.array()
  }

  /** What a STANDARD writer puts in a `00db` chunk: headerless
    * bottom-up BGR pixel rows, 4-byte-aligned — NOT a BMP file. */
  private def dibPixels(k: Int): Array[Byte] = {
    val out = new Array[Byte](dibRowSize * H)
    for (y <- 0 until H; x <- 0 until W) {
      val o = (H - 1 - y) * dibRowSize + x * 3
      out(o) = sampleAt(x, y, 2, k).toByte // blue
      out(o + 1) = sampleAt(x, y, 1, k).toByte // green
      out(o + 2) = sampleAt(x, y, 0, k).toByte // red
    }
    out
  }

  private val VID_FRAMES = 3

  private val expectedVideoMean: Double = {
    var sum = 0.0
    for (k <- 0 until VID_FRAMES; y <- 0 until H; x <- 0 until W; b <- 0 until B)
      sum += sampleAt(x, y, b, k)
    sum / (VID_FRAMES.toLong * W * H * B)
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

  test("BMP-frame AVI (00db) decodes EXACTLY: dims, bands, frame count, multi-frame mean") {
    // BMP frames are lossless, so the 3-frame mean is checked to the
    // bit, same law as the single-image PNG/BMP tests
    val avi = aviOf("00db", (0 until VID_FRAMES).map(k => encodeImage("bmp", k)))
    val Some(d) = JvmCodec.decode("video", avi)
    assert(d == Decoded(W, H, B, VID_FRAMES, expectedVideoMean))
  }

  test("headerless-DIB AVI (00db from standard writers): strf-synthesized header decodes EXACTLY") {
    // raw pixel payloads ImageIO alone cannot read — the codec must
    // rebuild BITMAPFILEHEADER + strf from the hdrl stream declaration;
    // lossless, so all three frames and the multi-frame mean are exact
    val avi = aviWithVidsHeader("00db", (0 until VID_FRAMES).map(dibPixels))
    val Some(d) = JvmCodec.decode("video", avi)
    assert(d == Decoded(W, H, B, VID_FRAMES, expectedVideoMean))
  }

  test("headerless-DIB frames with no vids strf are cleanly excluded, never mis-decoded") {
    // an AVI whose hdrl declares no video stream: the raw payload has
    // no reconstructable header -> zero decodable frames -> None (the
    // old behavior silently miscounted such files' frames)
    val avi = aviOf("00db", Seq(dibPixels(0)))
    assert(JvmCodec.decode("video", avi).isEmpty)
  }

  test("MJPEG AVI (00dc JPEG frames): exact dims and frame count; mean within lossy tolerance") {
    val avi = aviOf("00dc", (0 until VID_FRAMES).map(k => encodeImage("jpg", k)))
    val Some(d) = JvmCodec.decode("video", avi)
    assert((d.width, d.height, d.channels, d.frames) == ((W, H, B, VID_FRAMES)))
    assert(math.abs(d.meanIntensity - expectedVideoMean) < 8.0,
      s"MJPEG mean ${d.meanIntensity} too far from $expectedVideoMean")
  }

  test("AVI walker isolation: truncated tree keeps parsed frames; foreign-codec frames skip") {
    val good = encodeImage("bmp", 0)
    // truncate mid-way through the second frame chunk: frame 1 survives
    val full = aviOf("00db", Seq(good, encodeImage("bmp", 1)))
    val cut = full.take(full.length - good.length / 2)
    val Some(d) = JvmCodec.decode("video", cut)
    assert(d.frames == 1 && (d.width, d.height) == ((W, H)))
    // frames ImageIO has no reader for (a fake fourcc's junk payload)
    // skip; zero decodable frames -> None, not a throw
    val junkFrames = aviOf("00dc", Seq(Array.tabulate[Byte](64)(i => (i * 73 + 11).toByte)))
    assert(JvmCodec.decode("video", junkFrames).isEmpty)
  }

  test("corrupt bytes and unsupported kinds isolate to None, never throw") {
    val junk = Array.tabulate[Byte](64)(i => (i * 73 + 11).toByte)
    assert(JvmCodec.decode("image", junk).isEmpty)
    assert(JvmCodec.decode("audio", junk).isEmpty)
    // a valid PNG under the video kind: not a RIFF-AVI — refused
    assert(JvmCodec.decode("video", encodeImage("png")).isEmpty)
    assert(JvmCodec.decode("video", junk).isEmpty)
    assert(JvmCodec.decode("image", Array.emptyByteArray).isEmpty)
    assert(JvmCodec.decode("image", null).isEmpty)
  }

  test("batched pipeline with the real codec: exact features for all THREE modalities, corrupt row dropped") {
    import spark.implicits._
    val junk = Array.tabulate[Byte](64)(i => (i * 73 + 11).toByte)
    val avi = aviOf("00db", (0 until VID_FRAMES).map(k => encodeImage("bmp", k)))
    val rows = Seq(
      (1L, encodeImage("png"), "image"),
      (2L, testWav(), "audio"),
      (3L, junk, "image"), // must vanish, not kill the partition
      (4L, avi, "video"))
    val df = rows.toDF("id", "payload", "kind")
      .withColumn("meta", struct(col("kind").as("kind"),
        lit(0L).as("n_bytes"), lit("").as("digest")))
    val got = Multimodal.extractFeatures(df, "id", JvmCodec, batchSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getDouble(6))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L) == (("image", W, H, B, 1, expectedImageMean)))
    assert(got(2L) == (("audio", 0, 0, 1, FRAMES, expectedWavMean)))
    assert(got(4L) == (("video", W, H, B, VID_FRAMES, expectedVideoMean)))
  }
}
