package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteSortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Seq(3L, 1L, 2L), Seq(2L, 4L, 3L)),
    (Seq(9L), Seq(8L))
  ).toDF("a", "b")

  test("rule rewrites size(array_intersect(array_sort, array_sort)) to the merge walk") {
    val plan = df.select(
      expr("size(array_intersect(array_sort(a), array_sort(b)))").as("n"))
      .queryExecution.analyzed
    val rewritten = RewriteSortedIntersect(plan)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[SortedIntersectSize])),
      s"no rewrite in:\n$rewritten")
  }

  test("rewritten plan returns builtin answers on duplicate-element inputs") {
    // end-to-end through the injected rule: with duplicates on both sides
    // the rewrite must still equal the (deduplicating) builtin
    val dups = Seq(
      (Seq(1L, 2L, 1L), Seq(1L, 3L, 1L)),
      (Seq(2L, 2L, 2L), Seq(2L, 2L)),
      (Seq(1L, 2L, 3L), Seq(3L, 2L, 1L))
    ).toDF("a", "b")
    val n = dups.select(
      expr("size(array_intersect(array_sort(a), array_sort(b)))").as("n"))
    val plan = n.queryExecution.analyzed
    assert(RewriteSortedIntersect(plan).expressions
      .exists(_.exists(_.isInstanceOf[SortedIntersectSize])))
    val viaRule = spark.sessionState.executePlan(RewriteSortedIntersect(plan))
      .executedPlan.executeCollect().map(_.getInt(0)).toSeq
    assert(viaRule == Seq(1, 1, 3))
  }

  test("rule leaves non-eligible shapes alone (unsorted args, string elements)") {
    val unsorted = df.select(expr("size(array_intersect(a, b))"))
      .queryExecution.analyzed
    assert(!RewriteSortedIntersect(unsorted).expressions
      .exists(_.exists(_.isInstanceOf[SortedIntersectSize])))
    val strings = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
      .select(expr("size(array_intersect(array_sort(a), array_sort(b)))"))
      .queryExecution.analyzed
    assert(!RewriteSortedIntersect(strings).expressions
      .exists(_.exists(_.isInstanceOf[SortedIntersectSize])))
  }
}
