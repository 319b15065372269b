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
    // compaction re-stamps graft.* properties onto the rewritten table
    // itself — no manual re-stamp, the probe below validates them
    val props = spark.sql("SHOW TBLPROPERTIES srp_assign_inc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.srp.bits").contains(bits.toString) &&
      props.get("graft.srp.dim").contains(dim.toString) &&
      props.get("graft.srp.tables").contains(tables.toString),
      s"compaction must carry the signing stamp; got $props")
    assert(n <= 8L && n < filesBefore,
      s"files must drop ($filesBefore -> $n)")
    val after = Similarity.probeSrpIndex(spark, "srp_assign_inc", queries,
      "vec_id", "embedding", k = 5, bits, dim, tables).collect().toSet
    assert(after == before)
  }

  test("an UNSTAMPED table refuses probe and append — missing is as loud as mismatched") {
    // simulate the stamp-loss path (a catalog whose DROP/RENAME drops
    // properties): build, then strip the graft.* stamp
    Similarity.buildSrpIndex(emb.filter(col("vec_id") < 32),
      "vec_id", "embedding", bits, dim, tables, "srp_assign_bare")
    spark.sql("ALTER TABLE srp_assign_bare UNSET TBLPROPERTIES(" +
      "'graft.srp.bits','graft.srp.dim','graft.srp.tables')")
    val queries = emb.filter(col("vec_id") < 8)
    val eProbe = intercept[RuntimeException] {
      Similarity.probeSrpIndex(spark, "srp_assign_bare", queries,
        "vec_id", "embedding", k = 5, bits, dim, tables)
    }
    assert(eProbe.getMessage.contains("no graft.srp.bits stamp"))
    val eAppend = intercept[RuntimeException] {
      Similarity.appendSrpIndex(spark, "srp_assign_bare",
        emb.filter(col("vec_id") >= 32 && col("vec_id") < 40),
        "vec_id", "embedding", bits, dim, tables)
    }
    assert(eAppend.getMessage.contains("re-stamp"))
  }
}
