package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class SrpBucketsSpec extends SparkSpec {

  test("one-pass native buckets == composed per-table srpSignature on real vectors") {
    val e = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val v = e.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val both = v.select(
      col("vec_id"),
      SrpBuckets(spark, col("v"), 8, 4, 64).as("native"),
      array((0 until 4).map(t => Similarity.srpSignature(col("v"), 8, 64, t)): _*)
        .as("composed"))
    assert(both.filter(col("native") =!= col("composed")).isEmpty)
  }
}
