package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DataType

/** Grouped top-k as a first-class physical operator — the whole-operator
  * rung of the custom-Catalyst ladder (expression < rule < plan node +
  * strategy + exec), completing what SimHash60/SrpBuckets (expressions)
  * and RewriteSortedIntersect (rule) started.
  *
  * WHY an operator: the DataFrame spelling of "first k rows per key
  * under an order" is `row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k` — and WindowExec must SORT every partition by
  * (key, order) before it can number anything: O(n log n) comparisons
  * on ALL n rows, full-width rows through the sort buffers, spills at
  * scale. But top-k doesn't need a sort: a bounded heap per key sees
  * every row once — O(n log k), and only the k survivors are ever
  * buffered. For k=3 over a billion-row partition that is the
  * difference between sorting a billion rows and one heap-peek per row
  * (the same asymmetry TakeOrderedAndProject already exploits for the
  * GLOBAL top-k; this is its per-key generalization).
  *
  * Physical shape (mirrors partial/final aggregation):
  *
  *   PartialTopKPerKeyExec   -- map-side: <= k rows per (input split,
  *                              key) survive, BEFORE the shuffle, so
  *                              the exchange moves at most
  *                              splits x keys x k rows, not n
  *         -> Exchange(hashpartitioning(keys))   [from EnsureRequirements]
  *   FinalTopKPerKeyExec     -- each key now wholly in one partition:
  *                              the same heap pass is exact
  *
  * Memory: one k-row heap per distinct key per partition — the hash-
  * aggregation state class, without sort spill files. For per-partition
  * key cardinalities where even that state cannot fit, fall back to the
  * window form (which spills); the operator targets the common
  * selection shape (k and per-partition distinct keys both modest).
  *
  * Determinism: callers must pass a TOTAL order (tie-break on a unique
  * column) — same contract every `limit` in the registry already obeys.
  * Output rows are the exact winner SET; inner heap order is
  * unspecified (rank, if wanted, is a window over the k-bounded result).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** One pass of bounded per-key heaps over a partition. Rows are
    * normalized to UnsafeRow and copied ONLY when they enter a heap
    * (<= keys x k copies per partition, not per row). */
  def partitionTopK(
      iter: Iterator[InternalRow],
      schema: Array[DataType],
      boundKeys: Seq[Expression],
      ord: LazilyGeneratedOrdering,
      k: Int): Iterator[InternalRow] = {
    val toUnsafe = UnsafeProjection.create(schema)
    val keyProj = UnsafeProjection.create(boundKeys)
    val rowOrd = new Ordering[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
    }
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
    while (iter.hasNext) {
      val u = toUnsafe(iter.next()) // reused buffer — copy only on keep
      heaps.get(keyProj(u)) match {
        case Some(pq) =>
          if (pq.size < k) pq.enqueue(u.copy())
          else if (ord.lt(u, pq.head)) { pq.dequeue(); pq.enqueue(u.copy()) }
        case None =>
          val pq = mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
          pq.enqueue(u.copy())
          heaps.put(keyProj(u).copy(), pq)
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side stage: per-(input split, key) top-k. No distribution
  * requirement — runs where the data already is; emitting <= k rows per
  * local key is what shrinks the shuffle. */
case class PartialTopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKPerKeyExec =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output.map(_.dataType).toArray
    val boundKeys = keys.map(BindReferences.bindReference(_, child.output))
    val ord = new LazilyGeneratedOrdering(
      order.map(BindReferences.bindReference(_, child.output)))
    val kk = k
    child.execute().mapPartitions(
      TopKPerKeyExec.partitionTopK(_, schema, boundKeys, ord, kk),
      preservesPartitioning = true)
  }
}

/** Reduce-side stage: requires co-location by key (EnsureRequirements
  * plants the hash exchange), after which the same heap pass is the
  * exact global answer per key. */
case class FinalTopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKPerKeyExec =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output.map(_.dataType).toArray
    val boundKeys = keys.map(BindReferences.bindReference(_, child.output))
    val ord = new LazilyGeneratedOrdering(
      order.map(BindReferences.bindReference(_, child.output)))
    val kk = k
    child.execute().mapPartitions(
      TopKPerKeyExec.partitionTopK(_, schema, boundKeys, ord, kk),
      preservesPartitioning = true)
  }
}

/** Plans [[TopKPerKeyNode]] as partial -> (exchange) -> final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      FinalTopKPerKeyExec(keys, order, k,
        PartialTopKPerKeyExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** First `k` rows per key group under `orderSpec` (column name ->
    * ascending?), as a new DataFrame. The order MUST be total (include
    * a unique tie-break column) for deterministic output. Project the
    * input down to needed columns first — a custom node is opaque to
    * Catalyst's column pruning. */
  def topK(df: DataFrame, keyCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    GraftSqlBridge.ensureStrategy(spark, TopKPerKeyStrategy)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyNode(keyCols.map(attr), order, k, analyzed))
  }
}
