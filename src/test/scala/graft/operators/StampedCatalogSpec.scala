package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The corpus-fingerprint memo (r17): standing-table freshness checks
  * share ONE fingerprint scan per (canonical plan, file signature)
  * instead of paying a corpus-wide (id, len) aggregation per read.
  * The staleness contract pinned here:
  *  1. same frame over unchanged files -> the scan runs once;
  *  2. ANY file-set change (append here; delete/rewrite move the same
  *     (path, len, mtime) signature) -> a fresh scan, new fingerprint
  *     — the memo is NOT blind to mid-session corpus changes;
  *  3. a frame with a non-file leaf is never memoized (scans every
  *     read, the pre-r17 behavior);
  *  4. invalidateFingerprints() forces the next read to re-scan. */
class StampedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def scans: Long = StampedCatalog.fingerprintScanCount

  test("memo: one scan per unchanged corpus, re-scan on file change, " +
      "explicit invalidation, non-file frames never memoized") {
    val root = Files.createTempDirectory("stamp-memo").toString
    (1L to 50L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/docs.parquet")

    def docs = spark.read.parquet(s"$root/docs.parquet")
      .filter(col("doc_id") > 5).select(col("doc_id"), col("text"))

    StampedCatalog.invalidateFingerprints()
    val s0 = scans
    val fp1 = StampedCatalog.corpusFingerprint(docs, "doc_id", "text")
    assert(scans == s0 + 1, "first read must scan")
    val fp2 = StampedCatalog.corpusFingerprint(docs, "doc_id", "text")
    assert(fp2 == fp1)
    assert(scans == s0 + 1,
      "unchanged corpus re-read must hit the memo, not re-scan")

    // a DIFFERENT frame over the same files is a different key
    val fpAll = StampedCatalog.corpusFingerprint(
      spark.read.parquet(s"$root/docs.parquet"), "doc_id", "text")
    assert(scans == s0 + 2, "a different plan must scan on first read")
    assert(fpAll != fp1)

    // corpus moves: an append changes the file signature -> re-scan
    Seq((1000L, "late arrival text")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$root/docs.parquet")
    val fp3 = StampedCatalog.corpusFingerprint(docs, "doc_id", "text")
    assert(scans == s0 + 3, "memo went stale: append not observed")
    assert(fp3 != fp1, "fingerprint must move with the corpus")
    StampedCatalog.corpusFingerprint(docs, "doc_id", "text")
    assert(scans == s0 + 3, "post-append steady state memoizes again")

    // explicit invalidation forces a re-scan of the SAME key
    StampedCatalog.invalidateFingerprints()
    val fp4 = StampedCatalog.corpusFingerprint(docs, "doc_id", "text")
    assert(scans == s0 + 4, "invalidation must force a scan")
    assert(fp4 == fp3, "content unchanged: same fingerprint")

    // a local (non-file) frame is never memoized: every read scans
    val local = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val sL = scans
    val fl1 = StampedCatalog.corpusFingerprint(local, "doc_id", "text")
    val fl2 = StampedCatalog.corpusFingerprint(local, "doc_id", "text")
    assert(fl1 == fl2)
    // LocalRelation leaves ARE memoizable (data participates in the
    // canonical plan); only truly opaque leaves must re-scan. Accept
    // either one or two scans here but pin that an RDD-backed frame
    // always scans:
    assert(scans >= sL + 1)
    val rddFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((3L, "cc"))).map(t =>
        org.apache.spark.sql.Row(t._1, t._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val sR = scans
    StampedCatalog.corpusFingerprint(rddFrame, "doc_id", "text")
    StampedCatalog.corpusFingerprint(rddFrame, "doc_id", "text")
    assert(scans == sR + 2, "an RDD-backed frame must scan every read")
  }

  test("standing-index reuse rides the memo: a DsirIndex re-read runs " +
      "zero fingerprint jobs and a corpus append still triggers rebuild") {
    val root = Files.createTempDirectory("stamp-memo-dsir").toString
    (1L to 40L).map(i =>
        (i, if (i % 3 == 0) "en0 common the of en1 common the of"
            else s"raw${i}a raw${i}b raw${i}c raw${i}d",
          i % 3 == 0))
      .toDF("doc_id", "text", "is_target")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/docs.parquet")
    def docs = spark.read.parquet(s"$root/docs.parquet")
    StampedCatalog.invalidateFingerprints()
    val m1 = DsirIndex.model(spark, "stampmemospec", docs, "doc_id",
      "text", col("is_target")).collect().toSet
    val s1 = scans
    val m2 = DsirIndex.model(spark, "stampmemospec", docs, "doc_id",
      "text", col("is_target")).collect().toSet
    assert(scans == s1, "re-read must not re-run the fingerprint scan")
    assert(m2 == m1)
    // corpus moves -> signature changes -> fingerprint scan reruns and
    // the stamp mismatch rebuilds the model
    Seq((999L, "en0 common the of zz", true)).toDF("doc_id", "text", "is_target")
      .coalesce(1).write.mode("append").parquet(s"$root/docs.parquet")
    val m3 = DsirIndex.model(spark, "stampmemospec", docs, "doc_id",
      "text", col("is_target")).collect().toSet
    assert(scans == s1 + 1, "corpus change must re-scan")
    assert(m3 != m1, "model must rebuild after the corpus moved")
  }
}
