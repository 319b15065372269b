package graft.edinet

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Model._

/** A1 + F8/F9: best-file-per-company selection over the extracted-file
  * manifest (reference src/transform.py:109-145).
  *
  * Filename convention `E{digits}_{yyyymmdd}_{docType}.{csv|xbrl}`
  * (reference src/utils/helper.py:82-86). Priority: docType 130
  * (correction) beats 120. The reference's dict only overwrites when
  * `doc_type == '130'` ("if company_code not in company_files or
  * doc_type == 130", src/transform.py:133), so when corrections exist
  * the LAST 130 wins, and with no correction the FIRST seen file wins —
  * reproduced with a carried ingest-sequence column and a window sort
  * whose tiebreak direction depends on the doc type.
  */
object BestFile {

  private val FilenamePattern = "E(\\d+)_(\\d+)_(\\d+)\\.(csv|xbrl)"

  /** Parse a manifest of file paths into (file, edinet_code, submit_ymd,
    * doc_type, fmt, seq). `seq` is the ingest order (reference list
    * order); rows whose filename doesn't match the convention are
    * dropped with the same silent-skip semantics as the reference's
    * regex guard (src/transform.py:127-131). */
  def parseManifest(files: DataFrame, pathCol: String = "path",
      seqCol: String = "seq"): DataFrame = {
    val fname = element_at(split(col(pathCol), "/"), -1)
    files
      .withColumn("fname", fname)
      .withColumn("edinet_code", concat(lit("E"), regexp_extract(col("fname"), FilenamePattern, 1)))
      .withColumn("submit_ymd", regexp_extract(col("fname"), FilenamePattern, 2))
      .withColumn("doc_type", regexp_extract(col("fname"), FilenamePattern, 3))
      .withColumn("fmt", regexp_extract(col("fname"), FilenamePattern, 4))
      .filter(col("doc_type") =!= "") // non-matching filenames skipped
      .drop("fname")
  }

  /** Top-1-per-company: corrected (130) wins; among 130s the last
    * ingest seq wins (every 130 overwrites), among plain filings the
    * FIRST seq wins (non-130s never overwrite an existing entry).
    * One shuffle on edinet_code over the (tiny) manifest — the selection
    * happens BEFORE any expensive statement parsing, preserving the
    * reference's dedup-before-parse ordering (SURVEY §4). */
  def bestPerCompany(manifest: DataFrame, seqCol: String = "seq"): DataFrame = {
    val isCorrection = col("doc_type") === correctionDocType
    val w = Window.partitionBy(col("edinet_code"))
      .orderBy(
        isCorrection.desc,
        when(isCorrection, -col(seqCol)).otherwise(col(seqCol)).asc)
    manifest
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
