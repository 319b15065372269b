package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {

  test("compaction collapses a sprayed directory to few files, content intact") {
    val root = java.nio.file.Files.createTempDirectory("compact")
    val sprayed = root.resolve("sprayed").toString
    val compacted = root.resolve("compacted").toString

    // simulate micro-batch sprawl: 64 tiny files
    graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(64).write.parquet(sprayed)
    val before = new java.io.File(sprayed).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)

    val after = Maintenance.compactParquet(spark, sprayed, compacted,
      targetFileBytes = 10L * 1024 * 1024)
    assert(after < 8, s"still $after files")

    val a = spark.read.parquet(sprayed)
    val b = spark.read.parquet(compacted)
    assert(b.count() == 6000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("incremental keyedStats fold == direct recompute, any batch split or fold tree") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 5000L).map(i => (s"k${rnd.nextInt(7)}", i, rnd.nextInt(1000).toLong))
    val df = rows.toDF("source", "id", "v")
    val direct = Maintenance.keyedStats(df, "source", "v").collect().toSet

    for (nBatches <- Seq(1, 3, 8)) {
      val batches = (0 until nBatches).map(i =>
        df.filter(pmod(col("id"), lit(nBatches)) === i))
      // left fold
      val folded = batches.map(Maintenance.keyedStats(_, "source", "v"))
        .reduce((r, b) => Maintenance.mergeKeyedStats(r, b, "source"))
      assert(folded.collect().toSet == direct, s"nBatches=$nBatches left fold diverged")
      // reversed fold tree: associativity/commutativity in practice
      val foldedRev = batches.reverse.map(Maintenance.keyedStats(_, "source", "v"))
        .reduce((r, b) => Maintenance.mergeKeyedStats(b, r, "source"))
      assert(foldedRev.collect().toSet == direct, s"nBatches=$nBatches reversed fold diverged")
    }
  }

  test("keyedStats summary stays key-cardinality sized; batches with missing keys merge") {
    import spark.implicits._
    val b1 = Seq(("a", 1L), ("a", 3L)).toDF("source", "v")
    val b2 = Seq(("b", 10L)).toDF("source", "v") // 'a' absent entirely
    val merged = Maintenance.mergeKeyedStats(
      Maintenance.keyedStats(b1, "source", "v"),
      Maintenance.keyedStats(b2, "source", "v"), "source")
    assert(merged.count() == 2)
    val byKey = merged.collect().map(r => r.getString(0) -> r).toMap
    assert(byKey("a").getLong(1) == 2 && byKey("a").getLong(2) == 4 &&
      byKey("a").getLong(3) == 1 && byKey("a").getLong(4) == 3 &&
      byKey("a").getDecimal(5).longValueExact == 10)
    assert(byKey("b").getLong(1) == 1 && byKey("b").getDecimal(5).longValueExact == 100)
  }

  test("vsumsq stays exact where a LongType square would wrap") {
    import spark.implicits._
    // 4e9^2 = 1.6e19 > Long.MaxValue (9.2e18): the old long
    // accumulator wrapped silently here
    val v = 4000000000L
    val s = Maintenance.keyedStats(Seq(("k", v), ("k", v)).toDF("source", "v"),
      "source", "v").collect()
    assert(s.length == 1)
    val expected = new java.math.BigDecimal(v).pow(2)
      .multiply(new java.math.BigDecimal(2))
    assert(s.head.getDecimal(5).compareTo(expected) == 0,
      s"vsumsq=${s.head.getDecimal(5)} expected $expected")
  }
}
