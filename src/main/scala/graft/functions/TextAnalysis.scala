package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column combinators for training-data pipelines:
  * token counting, quality scoring, language-ID heuristics.
  *
  * All pure `functions._` compositions (codegen'd, no UDFs) with
  * bit-equivalent DuckDB forms for the oracle — integer ratios become
  * exact double divisions, which both engines compute identically.
  */
object TextAnalysis {

  /** Ascending 1..hi index array, EMPTY when hi < 1 — the guarded form
    * of the bigram/adjacency idiom `sequence(lit(1), size(w) - 1)`.
    * Spark's `sequence` steps DOWNWARD when stop < start, so a 1-token
    * document would yield [1, 0] and a consuming `element_at(w, 0)`
    * throws at runtime, where the mirrored DuckDB `range(1, len(w))`
    * yields the empty list — a crash-vs-empty engine/oracle divergence
    * on degenerate inputs (no harness table contains one: min doc is
    * 10 tokens / 44 chars — this guard is the contract for corpora
    * that do). Every adjacency-window site routes through here. */
  def indices1(hi: Column): Column =
    when(hi >= 1, sequence(lit(1), hi)).otherwise(array().cast("array<int>"))

  /** Whitespace-token count (single-space corpus). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** Regex word-count: `\w+` runs — the "BPE-ish" proxy tokenizer. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Distinct-token count (vocabulary size of the doc). */
  def distinctTokenCount(text: Column): Column = size(array_distinct(split(text, " ")))

  /** Mean token length in chars, as an exact integer-ratio double. */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    // total chars minus separators = length - (n-1)
    (length(text) - n + 1).cast(DoubleType) / n
  }

  /** Ratio of stopword occurrences to tokens. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(text, " ")
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast(DoubleType) / size(toks)
  }

  /** Type-token ratio: distinct/total — a repetition signal. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast(DoubleType) / tokenCount(text)

  /** Composite quality score in [0,1]-ish: favors longer docs with
    * diverse vocabulary and a sane stopword rate. Deterministic double
    * arithmetic (same expression shape as the DuckDB oracle). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenNorm = least(length(text).cast(DoubleType) / lit(500.0), lit(1.0))
    lenNorm * lit(0.4) + typeTokenRatio(text) * lit(0.4) +
      stopwordRatio(text, stopwords) * lit(0.2)
  }

  /** Count of DISTINCT marker words present (set semantics — matches
    * DuckDB `len(list_intersect(...))` on distinct token sets). */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(split(text, " ")), array(markers.map(lit): _*)))

  /** Language-ID n-gram/marker heuristic: argmax over per-language marker
    * sets with a fixed tie-break order (first wins), 'und' when nothing
    * matches. Works on any corpus; discriminative power depends on the
    * marker lists. */
  def langIdHeuristic(text: Column, markerSets: Seq[(String, Seq[String])]): Column = {
    val scores = markerSets.map { case (lang, ms) => lang -> markerHits(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && sc > 0, lit(lang)).otherwise(acc)
    }
  }

  val EnMarkers = Seq("the", "a", "of", "and", "is")
  val DataMarkers = Seq("table", "row", "column", "query")
  val SparkMarkers = Seq("spark", "shuffle", "partition", "executor")
}
