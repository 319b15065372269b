package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  test("merge-walk count == size(array_intersect) on sorted distinct arrays") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val sets = docs.select(col("doc_id"), col("lang"),
      array_sort(graft.operators.Dedup.charNgramHashes(col("text"), 3)).as("gs"))
    val l = sets.as("l")
    val r = sets.as("r")
    val both = l.join(r, col("l.lang") === col("r.lang") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(
        SortedIntersectSize(spark, col("l.gs"), col("r.gs")).as("native"),
        size(array_intersect(col("l.gs"), col("r.gs"))).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).isEmpty)
    assert(both.count() > 0)
  }

  test("edges: empty, disjoint, identical, subset") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(2L, 3L))
    ).toDF("a", "b")
      .select(SortedIntersectSize(spark, col("a"), col("b")).as("c"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 3, 2))
  }
}
