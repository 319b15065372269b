package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable

/** The Gopher-style rule-based quality gate (Rae et al. 2021,
  * Appendix A — the public heuristic-filter recipe), stated ONCE and
  * shared by the batch audit query (q273), the composed admission
  * matrix (q275) and [[graft.streaming.CurateStream]]'s ingest-time
  * rule gate — the bucketsOf discipline: the deployed gate and its
  * oracle cannot drift because they are the same code.
  *
  * Every threshold is CROSS-MULTIPLIED into pure integer comparisons
  * so no ratio is ever computed, and each rule has a DuckDB spelling
  * the oracles interpolate. The rule SHAPES are Appendix A's; three
  * CONSTANTS deliberately deviate from the paper, recalibrated to the
  * synthetic short-document corpus so no conjunct is vacuous (q273's
  * description states each deviation): word count lower bound 30
  * (paper: 50), mean word length in [4.4, 10] (paper: [3, 10]), and a
  * corpus-matched stop list (the paper's 'the be to of and that have
  * with' never inflects here).
  *
  * SCALE SHAPE: the four metrics are ONE per-row projection (the
  * token split runs once per row and feeds all rules) — no join, no
  * window, no shuffle; the gate is the cheapest stage of any pipeline
  * it joins, which is exactly why recipes run rules first.
  */
object GopherRules {

  val MinWords = 30L
  val MaxWords = 100000L
  /** Mean word length bounds, lower stated in tenths (4.4 -> 44). */
  val MeanLenLoTenths = 44L
  val MeanLenHi = 10L
  val Stops: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it")
  val MinStopHits = 2L
  /** Lexical diversity distinct/total >= 2/5, spelled 5*nd >= 2*nw. */
  val DiversityNum = 2L
  val DiversityDen = 5L

  // -------- repetition rules (Appendix A's other half, q277) --------
  // Character-coverage definition, stated: covered = occurrences x
  // gram STRING length (overlaps counted — exact integers, identical
  // in both engines; the paper's de-overlapped variant needs an
  // interval union that buys nothing at these thresholds). Top-n-gram
  // thresholds are the paper's (0.20/0.18/0.16); the duplicate-gram
  // rule deviates: the paper binds dup {5..10}-grams, but this
  // corpus's synthetic docs never repeat a 5-gram internally (probed:
  // 0/500 at sf0.01), so the rule is recalibrated to n = 3 with a
  // zero-tolerance threshold (27/500 fire) — a vacuous conjunct
  // audits nothing.
  /** Max coverage by ANY SINGLE n-gram (occurrences x gram string
    * length, the max taken over grams BY COVERAGE — a deviation from
    * the paper, which takes the single most FREQUENT gram's coverage;
    * a longer-but-rarer gram can dominate here, making this bound the
    * stricter of the two) as a PERCENT of doc chars. */
  val TopGramMaxPct: Seq[(Int, Long)] = Seq(2 -> 20L, 3 -> 18L, 4 -> 16L)
  /** Duplicate-gram size and its max covered percent (0 = none). */
  val DupGramN = 3
  val DupGramMaxPct = 0L

  /** The four per-row metrics every rule derives from: word count,
    * word characters (exact for a single-space-separated text), stop
    * word hits, distinct words. One token split feeds all four. */
  def metrics(text: Column): (Column, Column, Column, Column) = {
    val ts = split(text, " ")
    (size(ts).cast(LongType),
      (length(text) - size(ts) + 1).cast(LongType),
      size(filter(ts, x => x.isin(Stops: _*))).cast(LongType),
      size(array_distinct(ts)).cast(LongType))
  }

  /** The four rules over [[metrics]] output columns (named nw, wchars,
    * stopw, ndist), keyed by the rule's audit name. */
  def rules(nw: Column, wchars: Column, stopw: Column,
      ndist: Column): Seq[(String, Column)] = Seq(
    "r_wc" -> (nw >= MinWords && nw <= MaxWords),
    "r_mwl" -> (lit(10) * wchars >= lit(MeanLenLoTenths) * nw &&
      wchars <= lit(MeanLenHi) * nw),
    "r_stop" -> (stopw >= MinStopHits),
    "r_div" -> (lit(DiversityDen) * ndist >= lit(DiversityNum) * nw))

  /** All four rules as one admission predicate over the raw text —
    * NULL-safe (a null text fails closed): the form an ingest gate
    * filters with. */
  def passes(text: Column): Column = {
    val (nw, wchars, stopw, ndist) = metrics(text)
    coalesce(rules(nw, wchars, stopw, ndist).map(_._2).reduce(_ && _),
      lit(false))
  }

  /** DuckDB spelling of [[metrics]] as SELECT-list fragments over a
    * text column reference. */
  def metricsDuckSql(text: String): Seq[String] = Seq(
    s"CAST(len(string_split($text, ' ')) AS BIGINT) AS nw",
    s"CAST(len($text) - len(string_split($text, ' ')) + 1 AS BIGINT)" +
      " AS wchars",
    s"CAST(len(list_filter(string_split($text, ' '), x -> " +
      s"list_contains([${Stops.map(w => s"'$w'").mkString(",")}], x)))" +
      " AS BIGINT) AS stopw",
    s"CAST(len(list_distinct(string_split($text, ' '))) AS BIGINT)" +
      " AS ndist")

  /** DuckDB spelling of [[rules]] over the [[metricsDuckSql]] aliases,
    * same keys, same order. */
  def rulesDuckSql: Seq[(String, String)] = Seq(
    "r_wc" -> s"nw >= $MinWords AND nw <= $MaxWords",
    "r_mwl" -> (s"10 * wchars >= $MeanLenLoTenths * nw AND " +
      s"wchars <= $MeanLenHi * nw"),
    "r_stop" -> s"stopw >= $MinStopHits",
    "r_div" -> s"$DiversityDen * ndist >= $DiversityNum * nw")

  /** Per-document REPETITION flags over any (idCol, textCol) frame —
    * the shared statement behind the q277 audit and the CurateStream
    * repetition gate (deployed gate and oracle cannot drift): ONE
    * explode produces every (n, gram) instance for all top-gram sizes
    * in a single pass (an 8-byte gram hash travels, never the gram
    * text), counts are (doc, n, hash)-keyed aggregations, flags pivot
    * with conditional aggregation. Coverage = occurrences x gram
    * string length vs length(textCol), cross-multiplied integers; a
    * document too short to form a size's gram passes that rule
    * vacuously. Output: one row per INPUT document —
    * (idCol, r_top2, r_top3, r_top4, r_dup3, rep_pass), flags
    * non-null. */
  def repetitionFlags(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ts = split(col(textCol), " ")
    val gram = (i: Column, n: Column) => {
      val g = concat_ws(" ", slice(ts, i, n))
      struct(n.as("n"), Portable.pmd5(g).as("gh"),
        length(g).cast(LongType).as("gl"))
    }
    val ns = array(TopGramMaxPct.map(p => lit(p._1)): _*)
    val g = docs.select(col(idCol), length(col(textCol)).cast(LongType)
        .as("nc"),
        explode(flatten(transform(sequence(lit(1), size(ts)),
          i => filter(transform(ns,
            n => when(i + n - 1 <= size(ts), gram(i, n))),
            x => x.isNotNull)))).as("g"))
      .select(col(idCol), col("nc"), col("g.n").as("n"),
        col("g.gh").as("gh"), col("g.gl").as("gl"))
    val cnt = g.groupBy(col(idCol), col("n"), col("gh"))
      .agg(count(lit(1)).as("cnt"), max(col("gl")).as("gl"),
        max(col("nc")).as("nc"))
    val pdn = cnt.groupBy(col(idCol), col("n"))
      .agg(max(col("cnt") * col("gl")).as("topcov"),
        coalesce(sum(when(col("cnt") > 1, col("cnt") * col("gl"))),
          lit(0L)).as("dupcov"),
        max(col("nc")).as("nc"))
    val topRules = TopGramMaxPct.map { case (n, pct) =>
      coalesce(max(when(col("n") === n,
        col("topcov") * 100 <= lit(pct) * col("nc"))), lit(true))
        .as(s"r_top$n")
    }
    val dupRule = coalesce(max(when(col("n") === DupGramN,
      col("dupcov") * 100 <= lit(DupGramMaxPct) * col("nc"))), lit(true))
      .as("r_dup3")
    val flags = pdn.groupBy(col(idCol))
      .agg(topRules.head, (topRules.tail :+ dupRule): _*)
    val flagCols = TopGramMaxPct.map(p => s"r_top${p._1}") :+ "r_dup3"
    docs.select(col(idCol))
      .join(flags, Seq(idCol), "left")
      .select(col(idCol) +:
        flagCols.map(c => coalesce(col(c), lit(true)).as(c)): _*)
      .withColumn("rep_pass", flagCols.map(col).reduce(_ && _))
  }
}
