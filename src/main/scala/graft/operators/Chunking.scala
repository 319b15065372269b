package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable

/** Content-defined chunking (CDC): split documents at rolling-hash
  * boundaries so chunk edges move WITH the content — an insertion
  * shifts at most the chunk it lands in, leaving every other chunk
  * hash intact. That is the property fixed-size blocks lack, and it is
  * what makes sub-document dedup work: shared boilerplate between
  * documents (headers, licenses, templated sections) collapses onto
  * identical chunk hashes regardless of where it sits in each doc.
  *
  * The rolling hash is a w-char window of per-char portable hashes
  * combined with fixed 31^k weights in exact integer arithmetic
  * (chars reduced mod 2^16 so the weighted sum stays far inside
  * Long) — deterministic on every engine, which keeps the operator
  * oracle-checkable; production CDC would add min/max chunk bounds
  * (FastCDC-style) on the same skeleton.
  *
  * Scale: the whole computation is a per-row projection (no shuffle,
  * no per-pair work); the chunk table shuffles only for the dedup
  * aggregation, keyed by the 60-bit chunk hash — 8-byte keys, never
  * chunk text.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, chunk_len, chunk_hash).
    * Boundaries fall after positions i (i >= w, i < len) where the
    * window hash divides `divisor`; expected chunk length ~ divisor
    * chars. */
  def cdcChunks(df: DataFrame, textCol: String, idCol: String,
      w: Int = 8, divisor: Int = 64): DataFrame = {
    val text = col(textCol)
    val n = length(text)
    // per-char 16-bit hashes, materialized as a column: lambda
    // references re-evaluate their argument expression, so the interior
    // boundary filter below must read a bound column, not the transform
    val chars = when(n >= 1,
      transform(sequence(lit(1), n), j => Portable.pmd5(text.substr(j, lit(1))) % 65536))
      .otherwise(array().cast(ArrayType(LongType)))
    // guard every sequence(): Spark generates DESCENDING sequences when
    // stop < start, where DuckDB's generate_series is simply empty
    val pow31 = Seq.iterate(1L, w)(_ * 31L)
    def windowHash(i: Column): Column =
      (0 until w).map(k => element_at(col("__ch"), i - k) * lit(pow31(k)))
        .reduce(_ + _)
    val interior = when(n >= w,
      filter(sequence(lit(w), n), i => windowHash(i) % divisor === 0 && i < n))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val chunks = transform(sequence(lit(1), size(col("__b")) - 1), x =>
      struct(
        x.as("idx"),
        (element_at(col("__b"), x + 1) - element_at(col("__b"), x)).as("clen"),
        Portable.pmd5(text.substr(
          element_at(col("__b"), x) + 1,
          element_at(col("__b"), x + 1) - element_at(col("__b"), x))).as("chash")))
    df.withColumn("__ch", chars)
      .withColumn("__b", concat(array(lit(0)), interior, array(n)))
      .select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol),
        col("c.idx").as("chunk_idx"),
        col("c.clen").cast(LongType).as("chunk_len"),
        col("c.chash").as("chunk_hash"))
  }

  /** Cross-document duplicate chunks: chunk hashes appearing in more
    * than one document, with occurrence stats — the sub-document dedup
    * report (boilerplate detection). Groups on the 8-byte hash only. */
  def duplicateChunks(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy("chunk_hash")
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_copies"),
        min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") > 1)
}
