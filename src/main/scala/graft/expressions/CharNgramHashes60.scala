package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Portable

/** Distinct char n-gram hashes in ONE pass over the text bytes — the
  * native form of `Dedup.charNgramHashes`:
  * `array_distinct(transform(sequence(1, len-n+1), i ->
  *    pmd5(substr(text, i, n)) % MinhashP))`.
  *
  * The composed spelling is an interpreted higher-order function that
  * allocates the index array, one UTF8String per window (len-n+1
  * substrings), the transformed array, and then a second distinct
  * pass — per ROW, on the engine's densest text primitive (trigram
  * hashing touches every character of the corpus). This expression
  * walks the UTF-8 bytes once: window i's hash is md5 over the byte
  * RANGE [charOff(i), charOff(i+n)) (md5 of a substring's UTF-8 bytes
  * IS md5 over that range — no slice ever materializes), reduced to
  * the same 60-bit value by [[Pmd5Hash60.hash60]]'s digest math, mod
  * MinhashP; distinctness via an open-addressed long set, emission in
  * FIRST-OCCURRENCE order (array_distinct's order). Bit-identical to
  * the composed form on any input incl. multibyte and invalid lead
  * bytes (CharNgramSpec property-checks it; char boundaries come from
  * Spark's own UTF8String.numBytesForFirstByte, not a mirror), so the
  * DuckDB `charNgramHashesSql` oracles stay valid. Null text -> null;
  * fewer than n chars -> empty array. ONE documented divergence: a
  * TRUNCATED trailing multibyte char is hashed over the string's real
  * bytes (clamped), where UTF8String.substring walks past numBytes and
  * copies row-padding garbage — an unsafe read, not reproducible
  * behavior (CharNgramSpec pins the clamp).
  */
case class CharNgramHashes60(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"char_ngram_hashes_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes requires STRING input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramHashes60.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharNgramHashes60.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes60 =
    copy(child = newChild)
}

object CharNgramHashes60 {

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** One pass: distinct n-gram hashes in first-occurrence order.
    * Called from generated code (static forwarder). */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    // char start offsets (numChars + 1 sentinel)
    val offs = new Array[Int](s.numChars() + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      offs(c) = b
      // Spark's own lead-byte table (public static) — NOT a local
      // mirror: its mapping of invalid lead bytes (0xC0/0xC1 and
      // 0xF5–0xFF advance 1, continuation bytes advance 1) is exactly
      // the walk numChars()/substr() use, so the native n-gram windows
      // share char boundaries with the composed substr form even on
      // malformed UTF-8 (a hand table that advanced 2/4 there broke
      // the bit-identity claim).
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(c) = bytes.length
    val numChars = c
    if (numChars < n) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = numChars - n + 1
    // open-addressed set sized for the window count (hashes are
    // pmd5 % MinhashP >= 0, so -1 marks an empty slot)
    var cap = java.lang.Integer.highestOneBit(nGrams * 2 - 1) << 1
    if (cap < 16) cap = 16
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    val out = new Array[Long](nGrams)
    var outLen = 0
    val md = digests.get()
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offs(i), offs(i + n) - offs(i))
      val d = md.digest()
      val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
      val h = h60 % Portable.MinhashP
      var slot = (h & (cap - 1)).toInt
      var seen = false
      while (!seen && table(slot) != -1L) {
        if (table(slot) == h) seen = true
        else slot = (slot + 1) & (cap - 1)
      }
      if (!seen) {
        table(slot) = h
        out(outLen) = h
        outLen += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** Session-free Column builder: the expression is embedded in the
    * Column directly (GraftSqlBridge.column), so ANY session can
    * analyze the resulting frame — the earlier temp-function
    * registration bound the column to whichever session was active at
    * construction time and failed analysis everywhere else. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CharNgramHashes60(org.apache.spark.sql.GraftSqlBridge.expression(text), n))
}
