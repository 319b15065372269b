package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persistent SRP-LSH index: probe equals the in-memory operator, an
  * append sequence is BIT-IDENTICAL to a full rebuild (deterministic
  * planes — the no-training half of the index story), and mismatched
  * signing parameters fail loud via the stamped table properties. */
class SrpIndexSpec extends SparkSpec {

  private val (bits, dim, tables) = (5, 64, 4)

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val built: Unit = Similarity.buildSrpIndex(
    emb, "vec_id", "embedding", bits, dim, tables, "srp_assign")

  test("persisted probe == in-memory lshTopK, both probe paths") {
    built
    val queries = emb.filter(col("vec_id") < 8)
    val want = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, bits = bits, dim = dim, tables = tables).collect().toSet
    for (bc <- Seq(true, false)) {
      val got = Similarity.probeSrpIndex(spark, "srp_assign", queries,
        "vec_id", "embedding", k = 5, bits, dim, tables,
        broadcastProbes = bc).collect().toSet
      assert(got == want, s"broadcastProbes=$bc diverged")
    }
  }

  test("append sequence == full rebuild, bit-identical (planes are deterministic)") {
    built
    Similarity.buildSrpIndex(emb.filter(col("vec_id") % 4 =!= 0),
      "vec_id", "embedding", bits, dim, tables, "srp_assign_inc")
    Similarity.appendSrpIndex(spark, "srp_assign_inc",
      emb.filter(col("vec_id") % 8 === 0), "vec_id", "embedding",
      bits, dim, tables)
    Similarity.appendSrpIndex(spark, "srp_assign_inc",
      emb.filter(col("vec_id") % 8 === 4), "vec_id", "embedding",
      bits, dim, tables)
    // the table CONTENTS match the full build exactly — not just the
    // probe results: nothing trained, so nothing can drift
    val inc = spark.table("srp_assign_inc")
      .select("neighbor_id", "t", "bucket").collect().toSet
    val full = spark.table("srp_assign")
      .select("neighbor_id", "t", "bucket").collect().toSet
    assert(inc == full)
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.probeSrpIndex(spark, "srp_assign_inc", queries,
      "vec_id", "embedding", k = 5, bits, dim, tables).collect().toSet
    val want = Similarity.probeSrpIndex(spark, "srp_assign", queries,
      "vec_id", "embedding", k = 5, bits, dim, tables).collect().toSet
    assert(got == want)
  }

  test("mismatched signing parameters fail loud via stamped properties") {
    built
    val queries = emb.filter(col("vec_id") < 8)
    val e = intercept[IllegalArgumentException] {
      Similarity.probeSrpIndex(spark, "srp_assign", queries,
        "vec_id", "embedding", k = 5, bits = 8, dim = dim, tables = tables)
    }
    assert(e.getMessage.contains("graft.srp.bits"))
    assert(e.getMessage.contains("foreign bucket spaces"))
  }

  test("generic compaction bounds the appended table's files, probe unchanged") {
    built
    val queries = emb.filter(col("vec_id") < 8)
    val before = Similarity.probeSrpIndex(spark, "srp_assign_inc", queries,
      "vec_id", "embedding", k = 5, bits, dim, tables).collect().toSet
    val filesBefore = spark.table("srp_assign_inc").inputFiles.length
    val n = Similarity.compactBucketedTable(spark, "srp_assign_inc", 8,
      Seq("t", "bucket"))
    // properties survive on this catalog or the probe would throw; the
    // compaction doc covers catalogs where they don't (re-stamp)
    spark.sql("ALTER TABLE srp_assign_inc SET TBLPROPERTIES(" +
      s"'graft.srp.bits'='$bits','graft.srp.dim'='$dim'," +
      s"'graft.srp.tables'='$tables')")
    assert(n <= 8L && n < filesBefore,
      s"files must drop ($filesBefore -> $n)")
    val after = Similarity.probeSrpIndex(spark, "srp_assign_inc", queries,
      "vec_id", "embedding", k = 5, bits, dim, tables).collect().toSet
    assert(after == before)
  }
}
