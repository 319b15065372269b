package graft.edinet

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Model._

/** S6/S7 + A2: ZIP handling (reference src/utils/helper.py:35-121).
  *
  * The reference saves the ZIP to disk, extracts everything, rglobs for
  * the target extension, picks the largest member by size, copies it to
  * a conventional filename, and deletes the temp dir. Here the archive
  * bytes stream through `ZipInputStream` inside the task — no temp
  * files, bounded memory (one member at a time), and the "largest
  * member" argmax happens in the same pass.
  */
object ArchiveExtract {

  val extractedSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),   // synthetic E{...} name
    StructField("content", BinaryType),
    StructField("member", StringType),
    StructField("member_size", LongType)))

  private val enc = RowEncoder.encoderFor(extractedSchema)

  /** S7: format dispatch — csvFlag '1' wins over xbrlFlag '1', else the
    * document is skipped (reference src/utils/helper.py:104-121). */
  def targetExtension(csvFlag: String, xbrlFlag: String): Option[String] =
    if (csvFlag == "1") Some("csv")
    else if (xbrlFlag == "1") Some("xbrl")
    else None

  /** Extract the largest member with the wanted extension from each
    * archive row (zipBytes, edinetCode, submitYmd, docType, ext) and
    * emit it under the conventional `E{code}_{ymd}_{type}.{ext}` name.
    * Bad archives / missing members are skipped, never fatal (N3). */
  def extractBest(spark: SparkSession, archives: DataFrame): DataFrame = {
    archives.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("zip")
        val code = r.getAs[String]("edinetCode")
        val ymd = r.getAs[String]("submitYmd")
        val docType = r.getAs[String]("docTypeCode")
        val ext = r.getAs[String]("ext")
        try {
          val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
          var bestName: String = null
          var bestBytes: Array[Byte] = null
          var entry = zin.getNextEntry
          while (entry != null) {
            if (!entry.isDirectory && entry.getName.toLowerCase.endsWith("." + ext)) {
              val buf = new java.io.ByteArrayOutputStream()
              val chunk = new Array[Byte](64 * 1024)
              var n = zin.read(chunk)
              while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
              val content = buf.toByteArray
              // A2: largest member wins (helper.py:77)
              if (bestBytes == null || content.length > bestBytes.length) {
                bestName = entry.getName
                bestBytes = content
              }
            }
            entry = zin.getNextEntry
          }
          zin.close()
          if (bestBytes == null) Iterator.empty
          else Iterator.single(Row(
            s"E${code.stripPrefix("E")}_${ymd}_$docType.$ext",
            bestBytes, bestName, bestBytes.length.toLong))
        } catch { case _: Exception => Iterator.empty }
      }
    }(enc)
  }
}
