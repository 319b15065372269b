package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Tables.t

/** Similarity-search queries over `embeddings` (array<float>, 64-dim):
  * brute-force cosine top-k (exact baseline), SRP-LSH bucketed ANN
  * (the scale path), and blocked embedding near-dup pairs.
  */
object SimilarityQueries {

  private val TOPK = 5
  private val NQ = 8        // query vectors: vec_id < NQ
  private val BITS = 8      // SRP signature width
  private val COS_T = 0.3   // near-dup threshold (corpus max ~0.45)

  /** DuckDB: deterministic left-fold dot product of two list exprs. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** DuckDB: SRP bucket id — must mirror Similarity.srpSignature exactly
    * (same plane hash salt, same fold order). */
  private def srpSql(v: String): String =
    (0 until BITS).map { j =>
      val plane = s"(CAST(${graft.functions.Portable.pmd5Sql(s"concat('p$j,', CAST(i AS VARCHAR))")} % 2000 AS DOUBLE) - 1000.0) / 1000.0"
      val proj = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, len($v)), i -> CAST($v[i] AS DOUBLE) * $plane)), (acc, x) -> acc + x)"
      s"CASE WHEN $proj > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q31_ann_bruteforce",
      s"Exact ANN baseline: top-$TOPK cosine neighbors for $NQ query " +
        "vectors — broadcast queries x one corpus scan, window top-k.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          e, e.filter(col("vec_id") < NQ), "vec_id", "embedding", TOPK)
      },
      Some(s"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${cosineSql("q.embedding", "c.embedding")} AS score
          FROM embeddings q JOIN embeddings c ON q.vec_id < $NQ)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q32_embedding_neardup",
      s"Embedding near-dup pairs: cosine >= $COS_T within equal-label " +
        "blocks (equi-join candidate generation).",
      (s, dir) =>
        Similarity.blockedCosinePairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label", COS_T),
      Some(s"""
        SELECT l.vec_id AS id_a, r.vec_id AS id_b,
               ${cosineSql("l.embedding", "r.embedding")} AS cos
        FROM embeddings l JOIN embeddings r
          ON l.label = r.label AND l.vec_id < r.vec_id
        WHERE ${cosineSql("l.embedding", "r.embedding")} >= $COS_T""")),
    // ----------------------------------------------------------------
    Q(
      "q33_ann_lsh",
      s"SRP-LSH bucketed ANN ($BITS-bit signatures): same scoring, " +
        "candidates restricted to the query's bucket via equi-join — " +
        "the path that survives a 100x corpus.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.lshTopK(
          e, e.filter(col("vec_id") < NQ), "vec_id", "embedding", TOPK, BITS)
      },
      Some(s"""
        WITH sig AS (
          SELECT vec_id, embedding, ${srpSql("embedding")} AS bucket
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${cosineSql("q.embedding", "c.embedding")} AS score
          FROM sig q JOIN sig c ON q.bucket = c.bucket
          WHERE q.vec_id < $NQ)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK"""))
  )
}
