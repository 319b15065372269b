package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{HilbertIndex32, Pmd5Hash60, RewriteSortedIntersect, SimHash60, SortedIntersectSize}

/** Session-extension entry point: makes the engine's native expressions
  * available as SQL functions in ANY session configured with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (cluster deployment path — no code changes in the consuming app).
  * Locally, `SimHash60.register(spark)` / `SortedIntersectSize.register`
  * do the same for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[Expression]) => SimHash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hilbert32"),
      new ExpressionInfo(classOf[HilbertIndex32].getName, "hilbert32"),
      (children: Seq[Expression]) => HilbertIndex32(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pmd5_60"),
      new ExpressionInfo(classOf[Pmd5Hash60].getName, "pmd5_60"),
      (children: Seq[Expression]) => Pmd5Hash60.build(children)))
    // size(array_intersect(array_sort(a), array_sort(b))) -> merge walk
    ext.injectOptimizerRule(_ => RewriteSortedIntersect)
    // grouped top-k operator: partial/final bounded heaps, no sort
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
