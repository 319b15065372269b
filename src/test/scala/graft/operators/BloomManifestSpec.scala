package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File-level Bloom manifest: point lookups open a strict subset of
  * files, never lose a row, and record their own parameters.
  */
class BloomManifestSpec extends SparkSpec {

  import spark.implicits._

  private def layout(): (String, Int) = {
    val root = java.nio.file.Files.createTempDirectory("bloom-manifest").toString
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val parts = 8
    docs.repartition(parts, col("doc_id"))
      .write.mode("overwrite").parquet(s"$root/data")
    val n = Maintenance.writeBloomManifest(spark, s"$root/data",
      s"$root/manifest", "doc_id")
    assert(n == parts, s"one manifest row per file: got $n, expected $parts")
    (root, parts)
  }

  test("point lookup equals the full-scan filter and opens fewer files") {
    val (root, parts) = layout()
    val full = spark.read.parquet(s"$root/data")
    val m = spark.read.parquet(s"$root/manifest")
    val meta = m.select(col("m_bits"), col("k_hashes")).head()
    for (id <- Seq(0L, 17L, 123L, 499L)) {
      val got = Maintenance.readPointLookup(spark, s"$root/data",
        s"$root/manifest", "doc_id", id.toString)
        .select("doc_id", "source", "n_chars").collect().toSet
      val want = full.filter(col("doc_id") === id)
        .select("doc_id", "source", "n_chars").collect().toSet
      assert(got == want, s"lookup $id diverged from full scan")
      assert(want.nonEmpty, s"test key $id missing from corpus")
      // pruning is real: the survivor set is smaller than the layout
      val survivors = m.filter(Sketches.bloomMightContain(col("bloom"),
        lit(id.toString), meta.getInt(0), meta.getInt(1))).count()
      assert(survivors < parts,
        s"lookup $id pruned nothing ($survivors of $parts files)")
    }
  }

  test("absent key: no false negatives means a miss is provably a miss") {
    val (root, _) = layout()
    val got = Maintenance.readPointLookup(spark, s"$root/data",
      s"$root/manifest", "doc_id", "99999999")
    assert(got.isEmpty, "absent key must return no rows")
  }

  test("manifest rows carry their build parameters") {
    val (root, _) = layout()
    val m = spark.read.parquet(s"$root/manifest")
    val r = m.select("m_bits", "k_hashes").distinct().collect()
    assert(r.length == 1 && r.head.getInt(0) == 1024 && r.head.getInt(1) == 4)
  }
}
