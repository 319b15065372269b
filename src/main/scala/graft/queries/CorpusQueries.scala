package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.queries.Tables.t

/** Corpus-analytics queries a training-data pipeline needs beyond
  * dedup/similarity: reproducible sampling, inverted-index
  * construction, and corpus-weighted term ranking. All shuffle on
  * bounded keys and avoid driver-side state — each would run unchanged
  * on a 1000-executor corpus.
  */
object CorpusQueries {

  private val SAMPLE_PCT = 10  // q50 keep rate
  private val MIN_DF = 5       // q51 posting-list df floor
  private val POSTINGS = 10    // q51 postings kept per token
  private val RANK_DOCS = 50   // q52 docs ranked (doc_id bound)
  private val TOP_TERMS = 5    // q52 terms per doc

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q50_hash_sample",
      s"Deterministic $SAMPLE_PCT% corpus sample by content-free hash " +
        "threshold on the key: pmd5('s:'||doc_id) % 100 < " +
        s"$SAMPLE_PCT. The reproducible way to sample at corpus scale " +
        "— no RNG state, stable across retries, engines and runs; the " +
        "filter runs inside the scan's codegen stage (zero shuffles, " +
        "3-column ReadSchema).",
      (s, dir) =>
        t(s, dir, "documents")
          .filter(
            Portable.pmd5(concat(lit("s:"), col("doc_id").cast("string"))) % 100
              < SAMPLE_PCT)
          .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ${Portable.pmd5Sql("concat('s:', CAST(doc_id AS VARCHAR))")} % 100
              < $SAMPLE_PCT""")),
    // ----------------------------------------------------------------
    Q(
      "q51_inverted_index",
      "Inverted-index construction: explode distinct tokens, group by " +
        s"token, keep document frequency and the first $POSTINGS " +
        s"postings (ascending doc_id) for tokens with df >= $MIN_DF. " +
        "One shuffle on the token key; the posting truncation bounds " +
        "the per-token payload, so stopword-grade skew cannot blow up " +
        "a reducer (full posting lists would be chunked by (token, " +
        "doc_id range) at corpus scale — same key join).",
      (s, dir) => {
        val docs = t(s, dir, "documents").repartition(col("doc_id"))
        docs
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("token"))
          .groupBy("token")
          .agg(
            count(lit(1)).as("df"), // tokens pre-distinct per doc
            array_join(
              slice(sort_array(collect_list(col("doc_id"))), 1, POSTINGS), ",")
              .as("postings"))
          .filter(col("df") >= MIN_DF)
      },
      Some(s"""
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, $POSTINGS), ',')
                 AS postings
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents)
        GROUP BY token
        HAVING count(*) >= $MIN_DF""")),
    // ----------------------------------------------------------------
    Q(
      "q52_idf_top_terms",
      s"Corpus-weighted top-$TOP_TERMS terms per document (doc_id < " +
        s"$RANK_DOCS): score = tf * N / df over the FULL corpus df — " +
        "a log-free idf weighting kept in exact integer products so " +
        "both engines divide identical operands (ln() is libm-" +
        "dependent and would break bit equality). tf shuffles only " +
        "the ranked slice; df is one full-corpus token aggregation; " +
        "the join is a plain token equi-join.",
      (s, dir) => {
        val docs = t(s, dir, "documents").repartition(col("doc_id"))
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        // corpus count straight off the scan — the defensive repartition
        // would add a full-corpus shuffle to a metadata-cheap count
        val n = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        val dfreq = toks.select("doc_id", "token").distinct()
          .groupBy("token").agg(count(lit(1)).as("df"))
        val tf = toks.filter(col("doc_id") < RANK_DOCS)
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token").asc)
        tf.join(dfreq, "token")
          .crossJoin(broadcast(n)) // one-row frame
          .select(col("doc_id"), col("token"),
            (col("tf").cast("double") * col("n_docs") / col("df")).as("score"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= TOP_TERMS)
          .select("doc_id", "rank", "token", "score")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        dfreq AS (
          SELECT token, CAST(count(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
        tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE doc_id < $RANK_DOCS GROUP BY doc_id, token),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.df AS score
          FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        SELECT doc_id, rank, token, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOP_TERMS"""))
  )
}
