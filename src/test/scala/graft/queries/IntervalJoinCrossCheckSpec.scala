package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Randomized cross-check of the interval join against a brute-force
  * Scala reference (seed 7) — the same style of evidence as the as-of
  * join's, independent of the DuckDB oracle. */
class IntervalJoinCrossCheckSpec extends SparkSpec {
  import spark.implicits._

  test("q43 semantics match brute force on random events") {
    val rnd = new scala.util.Random(7)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(4).toLong, new Timestamp(base + rnd.nextInt(36000) * 1000L))
    }
    val expected = (for {
      a <- events
      b <- events
      if a._2 == b._2 && a._1 != b._1
      gap = b._3.getTime - a._3.getTime
      if gap >= 0 && gap <= 5 * 60 * 1000
    } yield (a._1, b._1)).toSet

    val dir = java.nio.file.Files.createTempDirectory("ij-cross")
    events.toDF("event_id", "user_id", "ts")
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0))
      .withColumn("event_type", org.apache.spark.sql.functions.lit("x"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.parquet(dir.resolve("events.parquet").toString)

    val got = AdvancedQueries.all.find(_.name == "q43_interval_join").get
      .run(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
