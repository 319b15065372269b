package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class SrpBucketsSpec extends SparkSpec {

  test("column built under one session analyzes in a cloned session " +
      "(no temp-function registry dependence)") {
    val c = SrpBuckets(spark, col("v"), 5, 2, 4)
    val vec = Seq(0.5, -0.25, 1.0, -1.0)
    val want = {
      import spark.implicits._
      Seq(Tuple1(vec)).toDF("v").select(c.as("b")).collect()
        .head.getSeq[Long](0)
    }
    val s2 = spark.newSession()
    val got = s2.createDataFrame(Seq(Tuple1(vec))).toDF("v")
      .select(c.as("b")).collect().head.getSeq[Long](0)
    assert(got == want)
  }

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
