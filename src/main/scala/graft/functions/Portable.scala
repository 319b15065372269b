package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, cross-engine-portable column combinators.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` only, so
  * it stays inside whole-stage codegen (no UDFs) AND has a bit-identical
  * DuckDB SQL equivalent — the property the driver's oracle compare needs.
  *
  * The workhorse is [[pmd5]]: a 60-bit hash both engines compute identically
  * (`conv(substr(md5(s),1,15),16,10)` in Spark ==
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)` in DuckDB). Murmur3
  * (`hash`) / `xxhash64` are Spark-only, so they can't be oracled.
  */
object Portable {

  /** 60-bit portable hash of a string column (first 15 hex chars of md5). */
  def pmd5(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Salted variant: independent hash family member `i` (for MinHash etc.). */
  def pmd5Salted(i: Int, c: Column): Column = pmd5(concat(lit(s"$i:"), c))

  /** DuckDB SQL text equivalent of [[pmd5]] applied to SQL fragment `s`. */
  def pmd5Sql(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"

  def pmd5SaltedSql(i: Int, s: String): String = pmd5Sql(s"concat('$i:', $s)")

  /** Whitespace tokens (single-space split — the corpus is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** `n`-word shingles joined by a space: one string per window position.
    * Empty result if the document has fewer than `n` tokens.
    *
    * Spark: transform(sequence(0, size-n), i -> concat_ws(' ', slice(toks, i+1, n)))
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** DuckDB equivalent of [[wordShingles]] over SQL fragment `textSql`. */
  def wordShinglesSql(textSql: String, n: Int): String = {
    val toks = s"string_split($textSql, ' ')"
    s"""CASE WHEN len($toks) < $n THEN []
       | ELSE list_transform(generate_series(1, len($toks) - ${n - 1}),
       |        i -> array_to_string(list_slice($toks, i, i + ${n - 1}), ' '))
       | END""".stripMargin.replaceAll("\n", " ")
  }

  /** MinHash value for hash-family member `i` over an array-of-strings column.
    * Empty array -> Long.MaxValue sentinel (kept deterministic). */
  def minhash(i: Int, shingles: Column): Column =
    coalesce(
      array_min(transform(shingles, s => pmd5(concat(lit(s"$i:"), s)))),
      lit(Long.MaxValue))

  def minhashSql(i: Int, shinglesSql: String): String =
    s"coalesce(list_min(list_transform($shinglesSql, s -> ${pmd5Sql(s"concat('$i:', s)")})), ${Long.MaxValue})"

  /** Polynomial rolling-hash fingerprint over the token sequence, mod 1e9+7.
    * h_0 = 0; h_k = (h_{k-1} * 31 + (pmd5(tok) % 1e6)) % 1e9+7 — all
    * intermediates < 2^45, so no 64-bit overflow in either engine. */
  val FpMod = 1000000007L
  def rollingFingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (h, t) => (h * 31L + pmod(pmd5(t), lit(1000000L))) % FpMod)

  def rollingFingerprintSql(textSql: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($textSql, ' '), t -> ${pmd5Sql("t")} % 1000000)), (h, x) -> (h * 31 + x) % $FpMod)"
}
