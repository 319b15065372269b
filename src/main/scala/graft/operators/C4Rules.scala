package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable

/** The C4 cleaning recipe (Raffel et al. 2020, §2.2 — the line-level
  * structural filter + keep-one span dedup that produced C4 from
  * Common Crawl), stated ONCE and shared by the batch audit query
  * (q283), the span-dedup corpus rewrite (q284), the composed
  * admission matrix (q275) and [[graft.streaming.CurateStream]]'s
  * ingest-time page gate — the GopherRules discipline: the deployed
  * gate and its oracle are the same code.
  *
  * LINE MAPPING, stated: this corpus has no newlines and no
  * punctuation, so C4's "line" is derived by CONTENT-DEFINED
  * segmentation (the rsync/LBFS chunking idea): a sentence ends at
  * every word whose portable 60-bit hash is ≡ 0 (mod
  * [[SentModulus]]). Boundaries move with the words themselves, so
  * shared text produces IDENTICAL sentences regardless of its offset
  * inside a document — the property C4's cross-document span dedup
  * needs and a fixed-width segmentation cannot give (an inserted word
  * would shift every later window). The mapping preserves each rule's
  * intent:
  *   - "retain lines ending in terminal punctuation" -> words after
  *     the last boundary form an UNTERMINATED tail and drop (the
  *     boundary word IS the terminal punctuation);
  *   - "retain lines with >= 5 words" -> sentences with fewer than
  *     [[MinSentWords]] words drop (the paper's constant);
  *   - "discard pages with < 3 sentences" -> documents with fewer
  *     than [[MinSentences]] surviving sentences drop (the paper's
  *     constant);
  *   - "discard all but one of any three-sentence span occurring more
  *     than once" -> [[spanDedup]], first occurrence wins (winner =
  *     min (doc, position); the paper keeps "one" unspecified — the
  *     pin makes both engines and every replay agree).
  * The page-level term rules (badwords, "lorem ipsum", braces) are
  * the q88/q92 blocklist shape, already first-class; this operator
  * carries the structural half.
  *
  * SCALE SHAPE: segmentation and both line rules are ONE per-row
  * array projection (split once; boundary filter, slice and word
  * counts are array lambdas over it) — no join, no window, no
  * shuffle, and the gate form ([[pagePass]]) is a pure predicate. The
  * span dedup's irreducible exchange is the span-hash aggregation:
  * 64-bit span HASHES travel, never span text, and only documents
  * that actually lose a span pay the sentence-level reassembly
  * exchange ([[Dedup.cutRepeatedRuns]]'s untouched-bypass shape).
  */
object C4Rules {

  /** Content-defined boundary modulus: a word ends a sentence iff
    * pmd5(word) % SentModulus == 0 (~1/5 of the corpus vocabulary;
    * mean sentence ~6 words — probed non-vacuous for every rule at
    * sf0.01). Interpolated into the DuckDB oracles, never
    * hand-copied. */
  val SentModulus = 5L
  /** C4's "at least 5 words per line" constant, verbatim. */
  val MinSentWords = 5L
  /** C4's "at least 3 sentences per page" constant, verbatim. */
  val MinSentences = 3L
  /** C4's dedup grain: spans of three consecutive sentences. */
  val SpanSentences = 3

  /** Version of [[spansOf]]'s span-hash construction. Span hashes are
    * engine-internal for BATCH queries, but the streaming span index
    * ([[graft.streaming.SpanDedupStream]]) PERSISTS them in its
    * append-only span log — so a scheme change must never mix with
    * rows hashed under an older scheme (equal spans would land in
    * different groups and silently survive dedup). Appends stamp this
    * version; reads fall back to re-deriving from the page log when
    * the standing log is not entirely at the current version, and
    * compaction migrates the log (r17, the r16 advisory's fix).
    * History: 1 = pmd5 of the space-joined span text (pre-r16);
    * 2 = xxhash64 over the three sentence pmd5 hashes (r16+). */
  val SpanHashVersion = 2L

  private def toks(text: Column): Column = split(text, " ")

  /** 1-based positions of the boundary words (sentence terminators). */
  private def bpos(ts: Column): Column =
    filter(sequence(lit(1), size(ts)),
      i => Portable.pmd5(element_at(ts, i)) % SentModulus === 0)

  /** Sentence structs from a token array and its boundary-position
    * array — the ONE construction every consumer stages through.
    *
    * SHAPE MATTERS HERE: interpreted higher-order functions have no
    * common-subexpression elimination, so an `element_at(bp, j)`
    * inside a per-sentence lambda would re-run the WHOLE boundary
    * filter (one pmd5 per word) for every sentence — measured 60+ s
    * for a 5000-doc corpus. zip_with over bp and its shifted self
    * binds each lambda to ELEMENT VALUES instead, so bp evaluates a
    * constant number of times per row regardless of sentence count
    * (and call sites that can stage through projections make ts/bp
    * attribute references — one evaluation per row, total). */
  private def sentencesFrom(ts: Column, bp: Column): Column =
    // slice(bp, 1, size-1) needs size >= 1; sequence is never built,
    // so the boundary-free doc just yields the empty sentence array
    when(size(bp) === 0,
      array().cast("array<struct<nw:bigint,sent:string>>"))
      .otherwise(zip_with(
        concat(array(lit(0)), slice(bp, lit(1), size(bp) - 1)), bp,
        (p, e) => struct((e - p).cast(LongType).as("nw"),
          concat_ws(" ", slice(ts, p + 1, e - p)).as("sent"))))

  /** All TERMINATED sentences as array<struct<nw, sent>> — words after
    * the last boundary are not in any sentence (the terminal-
    * punctuation rule). Empty array when the document has no boundary
    * word. Word counts come from boundary deltas: no re-split. */
  def sentences(text: Column): Column = {
    val ts = toks(text)
    sentencesFrom(ts, bpos(ts))
  }

  /** Sentences surviving both line rules, in document order. */
  def keptSentences(text: Column): Column =
    filter(sentences(text), s => s.getField("nw") >= MinSentWords)

  /** The page gate: >= [[MinSentences]] surviving sentences — the
    * SAME statement q283 audits, q275 scores and CurateStream's
    * c4Gate filters with. */
  def pagePass(text: Column): Column =
    size(keptSentences(text)) >= MinSentences

  /** Per-document audit struct for q283: terminated sentences, line-
    * rule drops, the unterminated-tail flag, survivors, the page
    * verdict. One projection; every field derives from one split. */
  def audit(text: Column): Column = {
    val ts = toks(text)
    val bp = bpos(ts)
    val sents = sentences(text)
    val kept = filter(sents, s => s.getField("nw") >= MinSentWords)
    struct(
      size(sents).cast(LongType).as("n_sent"),
      (size(sents) - size(kept)).cast(LongType).as("n_short"),
      // get() is 0-based and NULL-safe on the empty array (ANSI
      // element_at(bp, 0) would throw): no boundary at all means the
      // whole document is tail -> unterminated, via coalesce.
      coalesce(get(bp, size(bp) - 1) < size(ts), lit(true))
        .as("unterminated"),
      size(kept).cast(LongType).as("n_kept"),
      (size(kept) >= MinSentences).as("page_pass"))
  }

  /** Pages passing the structural rules, with their kept-sentence
    * arrays: (idCol, kept). The span-dedup working set.
    *
    * @note persist the result if more than one consumer folds it (the
    *   [[spanDedup]] composition does); freed by the harness's
    *   clearCache-after-terminal-action contract. */
  def pages(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // staged projections: ts and bp MATERIALIZE once per row (multi-
    // referenced non-cheap expressions, so CollapseProject keeps the
    // stages), and every sentence lambda then works on attribute
    // references — the per-row cost is one split + one pmd5 pass
    docs.select(col(idCol), toks(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        bpos(col("__ts")).as("__bp"))
      .select(col(idCol),
        sentencesFrom(col("__ts"), col("__bp")).as("__sents"))
      // The page gate must evaluate on the `kept` ATTRIBUTE above the
      // staged projections — a plain deterministic predicate is pushed
      // below every Project AND below the caller's spread() exchange,
      // inlining the whole segmentation pipeline into one interpreted
      // scan-side filter on the single input split: measured 5.1 s vs
      // 0.25 s at sf0.1 (r16; guide §2.5 input skew + §7.2
      // duplicated-subtree). TWO barriers are needed (r17):
      //  - a condition-level one is NOT enough: PushPredicateThrough-
      //    NonJoin only checks condition determinism at REPARTITION
      //    boundaries; through a Project it pushes ANY condition by
      //    alias substitution, so the r16 spelling (`|| spark_
      //    partition_id() < 0` in the filter) stopped at the exchange
      //    but still inlined the segmentation below the projections —
      //    the gate re-ran the whole HOF pipeline per row and the
      //    projections above re-ran it again for survivors (the guide
      //    §4.4 duplicated-evaluation shape, verified in the r16
      //    committed plan: Filter (9) under Project (10..12));
      //  - so the barrier is a FIELD of the kept-projection itself:
      //    `__barrier = spark_partition_id()` makes the projection's
      //    field list nondeterministic, which pushDownPredicate
      //    refuses to substitute through — the gate stays ABOVE the
      //    projection, reads the `kept` attribute, and the
      //    segmentation evaluates ONCE per row (r16: twice; r15: once
      //    but on one core). `__barrier < 0` is always false, `||`
      //    short-circuits, and the column is dropped right above —
      //    ExplainAuditSpec locks the gate filter HOF-free and above
      //    an exchange on a single-split corpus.
      .select(col(idCol), filter(col("__sents"),
        s => s.getField("nw") >= MinSentWords).as("kept"),
        spark_partition_id().as("__barrier"))
      .filter(size(col("kept")) >= MinSentences || col("__barrier") < 0)
      .select(col(idCol), col("kept"))

  /** [[pages]] with kept as a plain sentence-string array — the form
    * [[rebuiltText]] folds and the streaming span index appends. */
  def pageRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    pages(docs, idCol, textCol).select(col(idCol),
      transform(col("kept"), s => s.getField("sent")).as("kept"))

  /** One row per three-sentence span occurrence over a page frame
    * (idCol, kept: array<string>): (idCol, spos, sh) — spos the
    * 1-based kept-sentence index of the span's first sentence, sh a
    * 64-bit hash of the span's SENTENCE-HASH triple. Only hashes leave
    * the row: span text never shuffles.
    *
    * Hash construction (r16, guide §1.2 "per-task work"): each kept
    * sentence is pmd5-hashed ONCE per page row (a staged projection —
    * multi-referenced, so CollapseProject keeps it materialized), and
    * a span's key is xxhash64 over its three sentence hashes. Equal
    * spans == equal sentence triples == equal keys, so the dedup's
    * equality classes are untouched; vs hashing each space-joined
    * span string this md5s 1x the sentence bytes instead of 3x and
    * never builds a span string. sh is engine-internal (the oracle
    * derives its own span grouping; no output column carries sh), so
    * the non-portable xxhash64 combine is safe here — dedup semantics
    * need only a collision-free equality key, and 64 bits over
    * sentence-hash triples is strictly wider than the 60-bit span
    * hash it replaces. */
  def spansOf(pg: DataFrame, idCol: String): DataFrame =
    pg.select(col(idCol), col("kept"),
        transform(col("kept"), s => Portable.pmd5(s)).as("__hs"))
      .select(col(idCol),
        explode(transform(
          sequence(lit(1), size(col("kept")) - (SpanSentences - 1)),
          j => struct(j.cast(LongType).as("spos"),
            xxhash64((0 until SpanSentences).map(k =>
              element_at(col("__hs"), j + k)): _*)
              .as("sh")))).as("sp"))
      .select(col(idCol), col("sp.spos").as("spos"), col("sp.sh").as("sh"))

  /** Kept-sentence indices removed by the keep-one rule: every
    * occurrence of a duplicated span EXCEPT the global first
    * (min (doc, spos)) surrenders its [[SpanSentences]] sentences.
    * A winner's sentence can still fall to a DIFFERENT losing span
    * covering it — deterministic, stated, and what sentence-grain
    * removal means. Output: (idCol, kidx) distinct. */
  def removedSentences(spans: DataFrame, idCol: String): DataFrame = {
    val win = spans.groupBy(col("sh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col(idCol).as("i"), col("spos").as("p"))).as("win"))
      .filter(col("cnt") > 1)
      .select(col("sh"), col("win"))
    spans.join(win, Seq("sh"))
      .filter(!(col(idCol) === col("win.i") && col("spos") === col("win.p")))
      .select(col(idCol),
        explode(sequence(col("spos"),
          col("spos") + (SpanSentences - 1))).as("kidx"))
      .distinct()
  }

  /** The full C4 structural pass + keep-one span dedup, applied IN
    * PLACE: line rules drop short/unterminated sentences, thin pages
    * leave, duplicated three-sentence spans keep their first
    * occurrence only, and `textCol` is rewritten from the surviving
    * sentences (documents consumed entirely leave the corpus; a page
    * reduced below [[MinSentences]] by the DEDUP stays — C4 does not
    * re-apply the page rule after dedup). All other columns pass
    * through. Untouched pages bypass reassembly: only documents that
    * lost a span pay the sentence-level exchange.
    *
    * @note persists the page frame (it feeds the span pass, the
    *   untouched bypass and the reassembly); freed by the harness's
    *   clearCache-after-terminal-action contract. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pg = pageRows(docs, idCol, textCol).persist()
    val out = rebuiltText(pg, idCol)
    docs.join(out, Seq(idCol)) // inner: gone docs drop
      .withColumn(textCol, col("__txt"))
      .select(docs.columns.toIndexedSeq.map(col): _*)
  }

  /** The span resolution + reassembly fold over a page frame
    * (idCol, kept: array<string>): one (idCol, __txt) row per
    * surviving page. ONE statement shared by [[spanDedup]] and the
    * streaming span index ([[graft.streaming.SpanDedupStream]]'s
    * read fold), so the batch rewrite and the stream can never
    * disagree about what the deduped corpus is. */
  private[graft] def rebuiltText(pg: DataFrame, idCol: String): DataFrame =
    rebuiltTextFrom(pg, spansOf(pg, idCol), idCol)

  /** [[rebuiltText]] with the span table supplied — the streaming
    * span index hashes each document's spans ONCE at ingest and folds
    * its standing span log here, so reads never re-hash history. */
  private[graft] def rebuiltTextFrom(pg: DataFrame, sp: DataFrame,
      idCol: String): DataFrame = {
    val rem = removedSentences(sp, idCol)
    val affected = rem.select(col(idCol)).distinct()
    val untouched = pg.join(affected, Seq(idCol), "left_anti")
      .select(col(idCol), array_join(col("kept"), " ").as("__txt"))
    val rebuilt = pg.join(affected, Seq(idCol), "left_semi")
      .select(col(idCol), posexplode(col("kept")))
      .select(col(idCol), (col("pos") + 1).cast(LongType).as("kidx"),
        col("col").as("__tk"))
      .join(rem, Seq(idCol, "kidx"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("kidx"), col("__tk")))),
        r => r.getField("__tk")), " ").as("__txt"))
    untouched.unionByName(rebuilt)
  }

  // ------------------------------------------------------------------
  // DuckDB spellings (interpolated by the oracles — same constants,
  // same arithmetic; the staged CTE keeps the md5 work single-pass).
  // ------------------------------------------------------------------

  /** CTE chain `<p>toks` -> `<p>bnds` -> `<p>sent` over `fromSql`
    * (which must expose `doc_id` and `textSql`): `<p>sent` has
    * (doc_id, kept) where kept = the surviving sentence list.
    * Mirrors [[keptSentences]]. */
  def keptCtes(prefix: String, fromSql: String, textSql: String): String = {
    val p = prefix
    s"""${p}toks AS (
       |  SELECT doc_id, string_split($textSql, ' ') AS ts FROM $fromSql),
       |${p}bnds AS (
       |  SELECT doc_id, ts,
       |         list_filter(generate_series(1, len(ts)),
       |           i -> ${Portable.pmd5Sql("ts[i]")} % $SentModulus = 0)
       |           AS bp
       |  FROM ${p}toks),
       |${p}sent AS (
       |  SELECT doc_id,
       |         list_filter(
       |           list_transform(generate_series(1, len(bp)),
       |             j -> array_to_string(list_slice(ts,
       |                    CASE WHEN j = 1 THEN 1 ELSE bp[j-1] + 1 END,
       |                    bp[j]), ' ')),
       |           s -> len(string_split(s, ' ')) >= $MinSentWords)
       |           AS kept
       |  FROM ${p}bnds)""".stripMargin
  }

  /** SQL predicate equivalent of [[pagePass]] over a `kept` column. */
  def pagePassSql: String = s"len(kept) >= $MinSentences"

  /** The C4 page-TERM rule (the recipe's badwords / 'lorem ipsum' /
    * brace drops): a page passes iff it contains NO blocklisted term.
    * ONE statement shared by the q91 audit, the q275 matrix column
    * and [[graft.streaming.CurateStream]]'s termGate. Scan-stage: one
    * arrays_overlap per row; a production-sized list broadcasts
    * instead of inlining (stated at q91). */
  def termPass(text: Column, terms: Seq[String]): Column =
    !arrays_overlap(split(text, " "), array(terms.map(lit): _*))

  /** DuckDB twin of [[termPass]] applied to SQL fragment `textSql`. */
  def termPassSql(textSql: String, terms: Seq[String]): String =
    s"len(list_intersect(string_split($textSql, ' '), " +
      s"[${terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")}])) = 0"
}
