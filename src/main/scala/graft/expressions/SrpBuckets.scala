package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.operators.Similarity

/** All SRP-LSH bucket ids (every table) in ONE pass over the vector.
  *
  * The composed form builds `tables x bits` separate fold expressions,
  * each re-walking the vector with its own 64-element literal array —
  * correct, but the codegen balloons and the vector is read 32 times
  * per row. This expression keeps `tables x bits` accumulators and
  * walks the vector once; each accumulator still sums dimensions in
  * ascending order, so every projection (and therefore every bucket)
  * is bit-identical to the composed form and to the DuckDB oracle.
  *
  * The plane matrix is deterministic ([[Similarity.planeComponent]]),
  * shipped via `ctx.addReferenceObj` — a flat double[] in the generated
  * code, no per-row hashing, no literal-tree blowup.
  */
case class SrpBuckets(child: Expression, bits: Int, tables: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  @transient private lazy val planes: Array[Double] = {
    // layout: [(t*bits + j) * dim + (i-1)]
    val arr = new Array[Double](tables * bits * dim)
    for (t <- 0 until tables; j <- 0 until bits; i <- 1 to dim)
      arr((t * bits + j) * dim + (i - 1)) = Similarity.planeComponent(t, j, i)
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nProj = tables * bits
    val acc = new Array[Double](nProj)
    var i = 0
    while (i < dim) {
      val x = v.getDouble(i)
      var p = 0
      while (p < nProj) {
        acc(p) += x * planes(p * dim + i)
        p += 1
      }
      i += 1
    }
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        if (acc(t * bits + j) > 0) sig |= (1L << j)
        j += 1
      }
      buckets(t) = sig
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[]")
    val nProj = tables * bits
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val buckets = ctx.freshName("buckets")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      s"""
         |final double[] $acc = new double[$nProj];
         |for (int $i = 0; $i < $dim; $i++) {
         |  final double $x = $c.getDouble($i);
         |  for (int $p = 0; $p < $nProj; $p++) {
         |    $acc[$p] += $x * $planesRef[$p * $dim + $i];
         |  }
         |}
         |final long[] $buckets = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ($acc[$t * $bits + $j] > 0) $sig |= (1L << $j);
         |  }
         |  $buckets[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** Session-free Column form (the Pmd5Hash60 rule): the expression
    * rides inside the Column, so any session — including a streaming
    * foreachBatch clone — can analyze the frame. */
  def apply(spark: SparkSession, vecD: Column, bits: Int, tables: Int, dim: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(SrpBuckets(
      org.apache.spark.sql.GraftSqlBridge.expression(vecD), bits, tables, dim))
}
