package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("TopKByPrice == window row_number under every partitioning") {
    // keys unique, prices deliberately collide to exercise the tiebreak
    val rows = (1L to 97L).map(k => (s"g${k % 5}", k, (k % 7).toDouble))
    val expected = rows.toDF("g", "key", "price")
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("price").desc, col("key"))))
      .filter(col("rn") <= 3)
      .select(col("g"), col("rn").cast("long").as("rnk"),
        col("key"), col("price"))
      .as[(String, Long, Long, Double)].collect().toSet
    for (parts <- Seq(1, 4, 16)) {
      val got = spark.createDataset(rows).repartition(parts)
        .groupByKey(_._1)
        .mapValues(r => Aggregators.KeyedPrice(r._2, r._3))
        .agg(new Aggregators.TopKByPrice(3).toColumn)
        .flatMap { case (g, rs) =>
          rs.zipWithIndex.map { case (r, i) => (g, (i + 1).toLong, r.key, r.price) }
        }.collect().toSet
      assert(got == expected, s"parts=$parts diverged")
    }
  }

  test("TopKByPrice matches Spark SQL ordering on NaN and signed zero") {
    // Spark's ORDER BY price DESC ranks NaN FIRST (largest) and treats
    // -0.0 == 0.0 (key tiebreak decides)
    val rows = Seq(
      ("g", 1L, Double.NaN), ("g", 2L, -0.0), ("g", 3L, 0.0), ("g", 4L, -1.0))
    val expected = rows.toDF("g", "key", "price")
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("price").desc, col("key"))))
      .filter(col("rn") <= 3)
      .select(col("rn").cast("long"), col("key"))
      .as[(Long, Long)].collect().toSet
    val got = spark.createDataset(rows).repartition(2)
      .groupByKey(_._1)
      .mapValues(r => Aggregators.KeyedPrice(r._2, r._3))
      .agg(new Aggregators.TopKByPrice(3).toColumn)
      .flatMap { case (_, rs) =>
        rs.zipWithIndex.map { case (r, i) => ((i + 1).toLong, r.key) }
      }.collect().toSet
    assert(got == expected)
  }

  test("TopKByPrice rejects k < 1") {
    intercept[IllegalArgumentException] { new Aggregators.TopKByPrice(0) }
  }

  test("TopKByPrice buffer stays bounded at k through reduce and merge") {
    val agg = new Aggregators.TopKByPrice(3)
    var buf = agg.zero
    (1L to 50L).foreach { k =>
      buf = agg.reduce(buf, Aggregators.KeyedPrice(k, (k % 11).toDouble))
      assert(buf.rows.size <= 3)
    }
    val merged = agg.merge(buf, buf)
    assert(merged.rows.size <= 3)
    // best row survives: price 10 occurs first at key 10
    assert(agg.finish(merged).head == Aggregators.KeyedPrice(10L, 10.0))
  }
}
