package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.Portable

/** All k minhash family members in ONE pass over the hash array.
  *
  * The composed form ([[Portable.minhash]]) spells member i as
  * `coalesce(array_min(transform(hs, h -> (a_i*h + b_i) % P)), MaxValue)`
  * — k separate higher-order-function trees, each allocating a
  * full-size intermediate array and each evaluated OUTSIDE whole-stage
  * codegen (HOF lambdas are interpreted), so a k=16 signature walks and
  * allocates the hash array 16 times per row. This expression keeps k
  * running minima and walks the array once with zero intermediate
  * allocation; implements `doGenCode`, so the surrounding projection
  * stays inside whole-stage codegen — preference (b) of the
  * custom-operator ladder, like [[Pmd5Hash60]]/[[SrpBuckets]].
  *
  * Value equivalence is exact: same family parameters
  * ([[Portable.minhashParams]]), same `(a*h + b) % P` Java remainder
  * arithmetic, null ELEMENTS skipped (transform maps them to null and
  * array_min ignores nulls), and an empty/all-null/NULL input yields
  * Long.MaxValue per member (the composed coalesce) — so every DuckDB
  * oracle spelling `list_min(list_transform(...))` stays valid.
  * MinhashAllSpec property-checks equality against the composed form.
  * Output is never null (dataType array<long> of length k).
  */
case class MinhashAll(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"minhash_all_$k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_all requires ARRAY<BIGINT> input, got ${other.simpleString}")
  }

  @transient private lazy val as: Array[Long] =
    (0 until k).map(Portable.minhashParams(_)._1).toArray
  @transient private lazy val bs: Array[Long] =
    (0 until k).map(Portable.minhashParams(_)._2).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinhashAll.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], as, bs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.expressions.MinhashAll.compute(
          ${childGen.isNull} ? null : ${childGen.value}, $asRef, $bsRef);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashAll =
    copy(child = newChild)
}

object MinhashAll {

  /** One pass, k running minima. Null input / empty array / all-null
    * elements leave members at Long.MaxValue — the composed coalesce.
    * Called from generated code (static forwarder). */
  def compute(v: ArrayData, as: Array[Long], bs: Array[Long]): GenericArrayData = {
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    if (v != null) {
      val n = v.numElements()
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val h = v.getLong(i)
          var j = 0
          while (j < k) {
            val x = (as(j) * h + bs(j)) % Portable.MinhashP
            if (x < out(j)) out(j) = x
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Session-free Column builder — see [[CharNgramHashes60.apply]]:
    * embedding the expression (GraftSqlBridge.column) instead of
    * registering a temp function means no dependence on which session
    * analyzes the frame. */
  def apply(hashes: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinhashAll(org.apache.spark.sql.GraftSqlBridge.expression(hashes), k))
}
