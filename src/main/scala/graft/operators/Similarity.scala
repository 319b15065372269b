package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), plus embedding-based near-dup detection.
  *
  * Scale design:
  *  - brute force = broadcast(queries) x corpus — linear in corpus size,
  *    no shuffle of the corpus, window top-k partitioned by query;
  *  - LSH = deterministic random-hyperplane signatures; candidate
  *    generation is an equi-join on the signature bucket, cutting the
  *    scanned fraction to ~2^-bits per query while keeping the same
  *    scoring expression.
  *
  * Dot products fold left-to-right in doubles (`aggregate`), so scores
  * are bit-reproducible (and match DuckDB's `list_reduce` fold).
  */
object Similarity {

  /** Deterministic left-fold dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); corpus is scanned once. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Deterministic pseudo-random hyperplane component: plane `j`,
    * dimension `i` -> uniform in [-1, 1) derived from the portable hash
    * (reproducible across engines and runs — no RNG state). */
  private def planeComponent(j: Int, i: Column): Column =
    (pmod(Portable.pmd5(concat(lit(s"p$j,"), i.cast(StringType))), lit(2000L))
      .cast(DoubleType) - 1000.0) / 1000.0

  /** Sign-random-projection signature: `bits` hyperplanes -> one long
    * bucket id per vector. */
  def srpSignature(vec: Column, bits: Int): Column = {
    val dims = sequence(lit(1), size(vec))
    (0 until bits).map { j =>
      val proj = aggregate(dims, lit(0.0),
        (acc, i) => acc + element_at(vec, i).cast(DoubleType) * planeComponent(j, i))
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine top-k but only among corpus vectors
    * in the same SRP bucket as the query. Candidate generation is an
    * equi-join on the bucket id. Recall < 1 by construction; `bits`
    * trades recall for scan fraction. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      srpSignature(col(vecCol), bits).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      srpSignature(col(vecCol), bits).as("bucket")))
    val scored = q.join(c, Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Embedding near-duplicate pairs within equal-`blockCol` groups:
    * pairs (a<b) with cosine >= threshold. Equi-join on the block key —
    * no cross product. */
  def blockedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val s = df.select(col(idCol), col(blockCol), col(vecCol).as("v"))
    val l = s.as("l")
    val r = s.as("r")
    l.join(r, col(s"l.$blockCol") === col(s"r.$blockCol") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        cosine(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
