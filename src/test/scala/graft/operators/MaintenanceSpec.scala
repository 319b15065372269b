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
}
