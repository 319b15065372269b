package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Portable, TextAnalysis => TA}
import graft.queries.Tables.t

/** Text-analysis queries over the `documents` table: token counting,
  * corpus profiling, language-ID heuristic, quality scoring, document
  * fingerprinting. North-star operators for training-data pipelines
  * (BASELINE.json); no counterpart in the reference (its only text
  * handling is filename parsing, src/transform.py:120).
  */
object TextQueries {

  // Fake "languages" with discriminative marker sets over the synthetic
  // vocabulary; the heuristic itself is corpus-agnostic.
  private val markers: Seq[(String, Seq[String])] = Seq(
    "sqlish" -> Seq("table", "row", "column", "query", "filter"),
    "sparkish" -> Seq("spark", "shuffle", "partition", "stream", "batch"),
    "plain" -> Seq("the", "a", "fast", "slow", "small", "big"))

  private def markerHitsSql(ms: Seq[String]): String =
    s"len(list_intersect(list_distinct(string_split(text, ' ')), [${ms.map(m => s"'$m'").mkString(", ")}]))"

  private val stop = TA.EnMarkers
  private val stopListSql = s"[${stop.map(m => s"'$m'").mkString(", ")}]"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q21_token_stats",
      "Token counting: whitespace tokens, regex (BPE-ish) tokens, " +
        "distinct tokens, mean token length — per document.",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          TA.tokenCount(col("text")).as("n_tokens"),
          TA.regexTokenCount(col("text")).as("n_tokens_regex"),
          TA.distinctTokenCount(col("text")).as("n_distinct"),
          TA.meanTokenLen(col("text")).as("mean_token_len")),
      Some("""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(regexp_extract_all(text, '\w+|[^\w\s]', 0)) AS n_tokens_regex,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                 / len(string_split(text, ' ')) AS mean_token_len
        FROM documents""")),
    // ----------------------------------------------------------------
    Q(
      "q22_text_profile",
      "Corpus profile rollup by language: doc counts, token totals, " +
        "exact mean chars, source fan-out.",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("n_tokens", TA.tokenCount(col("text")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast(LongType)).as("total_tokens"),
            (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy(col("lang")),
      Some("""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
               count(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang ORDER BY lang""")),
    // ----------------------------------------------------------------
    Q(
      "q23_lang_id",
      "Language-ID heuristic: distinct-marker-hit argmax with fixed " +
        "tie-break, 'und' fallback; compared against the labeled lang.",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          col("lang"),
          TA.langIdHeuristic(col("text"), markers).as("pred_lang")),
      Some(s"""
        SELECT doc_id, lang,
               CASE
                 WHEN s0 >= s1 AND s0 >= s2 AND s0 > 0 THEN 'sqlish'
                 WHEN s1 >= s2 AND s1 > 0 THEN 'sparkish'
                 WHEN s2 > 0 THEN 'plain'
                 ELSE 'und' END AS pred_lang
        FROM (SELECT doc_id, lang, text,
                     ${markerHitsSql(markers(0)._2)} AS s0,
                     ${markerHitsSql(markers(1)._2)} AS s1,
                     ${markerHitsSql(markers(2)._2)} AS s2
              FROM documents)""")),
    // ----------------------------------------------------------------
    Q(
      "q24_quality_score",
      "Quality scoring: length norm + type-token ratio + stopword " +
        "ratio -> composite score and bucket.",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            TA.typeTokenRatio(col("text")).as("ttr"),
            TA.stopwordRatio(col("text"), stop).as("stop_ratio"),
            TA.qualityScore(col("text"), stop).as("score"))
          .withColumn("bucket",
            when(col("score") >= 0.7, "high")
              .when(col("score") >= 0.5, "medium")
              .otherwise("low")),
      Some(s"""
        SELECT doc_id, ttr, stop_ratio, score,
               CASE WHEN score >= 0.7 THEN 'high'
                    WHEN score >= 0.5 THEN 'medium'
                    ELSE 'low' END AS bucket
        FROM (
          SELECT doc_id, ttr, stop_ratio,
                 least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
                   + ttr * 0.4 + stop_ratio * 0.2 AS score, text
          FROM (
            SELECT doc_id, text,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')) AS ttr,
                   CAST(len(list_filter(string_split(text, ' '),
                            tk -> list_contains($stopListSql, tk))) AS DOUBLE)
                     / len(string_split(text, ' ')) AS stop_ratio
            FROM documents))""")),
    // ----------------------------------------------------------------
    Q(
      "q25_fingerprint",
      "Document fingerprinting: polynomial rolling hash over the token " +
        "sequence (order-sensitive, unlike the set-based measures).",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          Portable.rollingFingerprint(col("text")).as("fp")),
      Some(s"""
        SELECT doc_id, ${Portable.rollingFingerprintSql("text")} AS fp
        FROM documents"""))
  )
}
