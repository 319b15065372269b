package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.queries.Tables.{spread, t}

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
  private val CDC_W = 8        // q55 rolling-hash window (chars)
  private val CDC_DIV = 64     // q55 boundary divisor (~avg chunk len)

  /** DuckDB twin of [[Chunking.cdcChunks]] as a `chunks` CTE (one row
    * per chunk: doc_id, idx, clen, chash). Boundary positions must be
    * assembled order-safely — DuckDB's list_distinct does NOT preserve
    * order, so the interior list is filtered below length(text)
    * instead of deduplicated against the final boundary. */
  private val chunksCte: String = {
    val pow31 = Seq.iterate(1L, CDC_W)(_ * 31L)
    val hsum = (0 until CDC_W).map(k => s"ch[i-$k] * ${pow31(k)}").mkString(" + ")
    s"""chars AS (
       |          SELECT doc_id, text,
       |                 list_transform(generate_series(1, length(text)),
       |                   j -> ${Portable.pmd5Sql("substr(text, j, 1)")} % 65536) AS ch
       |          FROM documents),
       |        bounds AS (
       |          SELECT doc_id, text,
       |                 list_concat(list_concat(
       |                   [CAST(0 AS BIGINT)],
       |                   list_filter(list_filter(generate_series($CDC_W, length(text)),
       |                                 i -> ($hsum) % $CDC_DIV = 0),
       |                               p -> p < length(text))),
       |                   [CAST(length(text) AS BIGINT)]) AS b
       |          FROM chars),
       |        chunks AS (
       |          SELECT doc_id, c.idx, c.clen, c.chash
       |          FROM (SELECT doc_id,
       |                 unnest(list_transform(generate_series(1, len(b) - 1), x ->
       |                   struct_pack(idx := x,
       |                     clen := b[x+1] - b[x],
       |                     chash := ${Portable.pmd5Sql(
                               "substr(text, CAST(b[x] + 1 AS INTEGER), CAST(b[x+1] - b[x] AS INTEGER))")}))) AS c
       |                FROM bounds))""".stripMargin
  }

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
      "q60_stratified_sample",
      "Stratified (per-source) deterministic sampling — data-mixing " +
        "rates per stratum: 50% of src0, 25% of src1, 10% of " +
        "everything else, all by the same content-free hash threshold " +
        "as q50 (no RNG state, reproducible, scan-stage filter). The " +
        "shape of every training-mixture job: rates vary by stratum, " +
        "selection stays a pure projection.",
      (s, dir) => {
        val keyHash =
          Portable.pmd5(concat(lit("s:"), col("doc_id").cast("string"))) % 100
        val rate = when(col("source") === "src0", 50)
          .when(col("source") === "src1", 25)
          .otherwise(10)
        t(s, dir, "documents")
          .filter(keyHash < rate)
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some(s"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ${Portable.pmd5Sql("concat('s:', CAST(doc_id AS VARCHAR))")} % 100
              < CASE WHEN source = 'src0' THEN 50
                     WHEN source = 'src1' THEN 25 ELSE 10 END""")),
    // ----------------------------------------------------------------
    Q(
      "q51_inverted_index",
      "Inverted-index construction: explode distinct tokens, group by " +
        s"token, keep document frequency and the first $POSTINGS " +
        s"postings (ascending doc_id) for tokens with df >= $MIN_DF. " +
        "One shuffle on the token key; postings are bounded BEFORE the " +
        "aggregation buffer (row_number over the token partition, kept " +
        s"only while <= $POSTINGS), so a stopword-grade token gathers " +
        s"at most $POSTINGS ids per reducer — never the full corpus " +
        "(full posting lists would be chunked by (token, doc_id range) " +
        "at corpus scale — same key join).",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        // the window and the groupBy share hash(token) partitioning, so
        // this is still ONE Exchange; collect_list skips the nulls the
        // `when` produces past the cap, bounding the per-token buffer
        val byToken = Window.partitionBy(col("token")).orderBy(col("doc_id"))
        docs
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("token"))
          .withColumn("rn", row_number().over(byToken))
          .groupBy("token")
          .agg(
            count(lit(1)).as("df"), // tokens pre-distinct per doc
            array_join(
              sort_array(collect_list(when(col("rn") <= POSTINGS, col("doc_id")))), ",")
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
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
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
        WHERE rank <= $TOP_TERMS""")),
    // ----------------------------------------------------------------
    Q(
      "q55_cdc_chunks",
      s"Content-defined chunking: rolling-hash boundaries ($CDC_W-char " +
        s"window, divisor $CDC_DIV ~ avg chunk length) split each " +
        "document so chunk edges move WITH the content — an insertion " +
        "shifts only the chunk it lands in, the property fixed blocks " +
        "lack. Pure per-row projection: no shuffle, no pair work.",
      (s, dir) =>
        graft.operators.Chunking.cdcChunks(
          spread(t(s, dir, "documents"), col("doc_id")),
          "text", "doc_id", CDC_W, CDC_DIV),
      Some(s"""
        WITH $chunksCte
        SELECT doc_id, CAST(idx AS INTEGER) AS chunk_idx,
               clen AS chunk_len, chash AS chunk_hash
        FROM chunks""")),
    // ----------------------------------------------------------------
    Q(
      "q56_duplicate_chunks",
      "Sub-document dedup over the CDC chunks: chunk hashes shared by " +
        "more than one document (boilerplate, templated sections) with " +
        "occurrence stats. The dedup aggregation shuffles 8-byte chunk " +
        "hashes, never chunk text.",
      (s, dir) =>
        graft.operators.Chunking.duplicateChunks(
          graft.operators.Chunking.cdcChunks(
            spread(t(s, dir, "documents"), col("doc_id")),
            "text", "doc_id", CDC_W, CDC_DIV),
          "doc_id"),
      Some(s"""
        WITH $chunksCte
        SELECT chash AS chunk_hash,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS first_doc
        FROM chunks
        GROUP BY chash
        HAVING count(DISTINCT doc_id) > 1"""))
  )
}
