package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.Portable
import graft.queries.Tables.{boundedRank, spread, t}

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
  private val SEARCH_TERMS = Seq("data", "join") // q107 AND-search terms
  private val SEARCH_K = 10    // q107/q118 results returned
  // q118 OR-search terms: one rare ('dup', df ~25 at every SF — the
  // IDF weight that should dominate) plus two near-ubiquitous terms
  private val OR_TERMS = Seq("dup", "join", "scan")
  private val CDC_DIV = 64     // q55 boundary divisor (~avg chunk len)
  private val KMV_K = 32       // q69 sketch size (rel error ~ 1/sqrt(k))
  private val PRI_K = 20       // q136 sample size
  private val DF_CAP = 50      // q140: tokens with df above this are dropped
  private val COS2_TH_BP = 2500 // q140: cos^2 >= 0.25 i.e. cosine >= 0.5
  // q136 uniform-variate resolution: u = (pmd5 % 2^30 + 1) / 2^30.
  // 30 bits keeps w * 1000 * 2^30 (~1e16 at document scale) safely
  // inside BIGINT on BOTH engines — the full 60-bit hash could push
  // w * 2^60 / (h+1) past 2^63 for unlucky tiny h, where Spark's div
  // overflows to null but DuckDB's HUGEINT does not.
  private val PRI_U = 1L << 30

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
        HAVING count(DISTINCT doc_id) > 1""")),
    // ----------------------------------------------------------------
    Q(
      "q65_bow_dedup",
      "Bag-of-words (word-order-insensitive) dedup: documents whose " +
        "distinct-token SETS are identical — template renderings and " +
        "shuffled boilerplate that exact hashing misses entirely (this " +
        "corpus: 21 groups / 75 docs at sf0.01, all invisible to q26). " +
        "The canonical key = sorted distinct tokens re-joined, hashed; " +
        "the groupBy shuffles an 8-byte hash + doc_id, never text. " +
        "Sits between exact dedup (q26) and similarity dedup (q28/q59) " +
        "in the dedup-strictness ladder.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        docs
          .select(col("doc_id"),
            Portable.pmd5(col("text")).as("raw_hash"),
            Portable.pmd5(
              array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
              .as("bow_hash"))
          .groupBy("bow_hash")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("raw_hash")).as("n_raw_variants"),
            min(col("doc_id")).as("keep_id"))
          .filter(col("n_docs") > 1)
      },
      Some(s"""
        WITH norm AS (
          SELECT doc_id, ${Portable.pmd5Sql("text")} AS raw_hash,
                 ${Portable.pmd5Sql(
                   "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')")}
                   AS bow_hash
          FROM documents)
        SELECT bow_hash, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT raw_hash) AS BIGINT) AS n_raw_variants,
               min(doc_id) AS keep_id
        FROM norm GROUP BY bow_hash HAVING count(*) > 1""")),
    // ----------------------------------------------------------------
    Q(
      "q66_boilerplate_frac",
      "Per-document boilerplate fraction: of a document's CDC chunks " +
        "(q55), the share whose chunk hash also appears in ANOTHER " +
        "document — the per-doc quality signal built from the corpus-" +
        "level q56 view, used to drop template-dominated docs. The " +
        "multiplicity aggregation and the join back both move only " +
        "(doc_id, 8-byte chunk hash) pairs; chunk text never shuffles.",
      (s, dir) => {
        val chunks = graft.operators.Chunking.cdcChunks(
          spread(t(s, dir, "documents"), col("doc_id")),
          "text", "doc_id", CDC_W, CDC_DIV)
          .select(col("doc_id"), col("chunk_hash"))
        val mult = chunks.groupBy("chunk_hash")
          .agg(countDistinct(col("doc_id")).as("nd"))
        chunks.join(mult, "chunk_hash")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
          .select(col("doc_id"), col("n_chunks"), col("n_shared"),
            (col("n_shared").cast("double") / col("n_chunks")).as("boiler_frac"))
      },
      Some(s"""
        WITH $chunksCte,
        mult AS (
          SELECT chash, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY chash)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                 AS boiler_frac
        FROM chunks JOIN mult USING (chash)
        GROUP BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "q67_collocations",
      "Top-20 corpus collocations by log-free PMI: score = c(w1,w2) * " +
        "N / (c(w1) * c(w2)) over adjacent-token bigrams, min count 5 " +
        "— integer products, ONE double division, so both engines " +
        "divide identical operands (ln() is libm-dependent). Bigram " +
        "and unigram counts are token-keyed aggregations; the final " +
        "rank runs on the tiny min-count-filtered survivor set.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        // bg feeds four consumers shuffling on different keys (bigram
        // counts, both unigram branches, the global N) — unmaterialized,
        // Spark re-splits and re-explodes the corpus per consumer.
        // persist keeps lineage; the harness frees it via clearCache.
        val bg = docs.select(split(col("text"), " ").as("ts"))
          .select(explode(when(size(col("ts")) >= 2,
            transform(sequence(lit(1), size(col("ts")) - 1),
              i => struct(element_at(col("ts"), i).as("w1"),
                element_at(col("ts"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .persist()
        val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        val cu = bg.select(col("w1").as("w"))
          .unionAll(bg.select(col("w2").as("w")))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val n = bg.agg(count(lit(1)).as("nb"))
        // Top-k via orderBy+limit → TakeOrderedAndProject: each partition
        // keeps a 20-row heap, the driver merges 20-row heaps. The rank
        // window runs AFTER limit(20), over a 20-row frame — a global
        // row_number over the unbounded survivor set would funnel every
        // qualifying bigram through one partition (billions at 100 TB).
        cb.filter(col("c_ab") >= 5)
          .join(cu.select(col("w").as("w1"), col("c").as("ca")), "w1")
          .join(cu.select(col("w").as("w2"), col("c").as("cb2")), "w2")
          .crossJoin(broadcast(n)) // one-row frame
          .select(col("w1"), col("w2"), col("c_ab"),
            ((col("c_ab") * col("nb")).cast("double") / (col("ca") * col("cb2")))
              .as("pmi_score"))
          .orderBy(col("pmi_score").desc, col("w1").asc, col("w2").asc)
          .limit(20)
          .withColumn("rank",
            boundedRank(col("c_ab"))(
              col("pmi_score").desc, col("w1").asc, col("w2").asc))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        bg AS (
          SELECT ts[i] AS w1, ts[i+1] AS w2
          FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks)),
        cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY w1, w2),
        cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT w1 AS w FROM bg UNION ALL SELECT w2 FROM bg) GROUP BY w),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bg)
        SELECT w1, w2, c_ab, pmi_score, rank FROM (
          SELECT w1, w2, c_ab,
                 CAST(c_ab * nb AS DOUBLE) / (a.c * b.c) AS pmi_score,
                 CAST(row_number() OVER (
                   ORDER BY CAST(c_ab * nb AS DOUBLE) / (a.c * b.c) DESC, w1, w2)
                   AS INTEGER) AS rank
          FROM cb JOIN cu a ON cb.w1 = a.w JOIN cu b ON cb.w2 = b.w CROSS JOIN n
          WHERE c_ab >= 5)
        WHERE rank <= 20""")),
    // ----------------------------------------------------------------
    Q(
      "q68_corpus_datasheet",
      "The corpus datasheet: per (source, lang) stratum WITH rollup " +
        "subtotals — doc/token counts, mean length, distinct-content " +
        "and distinct-bag-of-words counts, and the reorder-duplication " +
        "rate (10.8% corpus-wide at sf0.01; exact dup rate is 0). One " +
        "pass, one rollup aggregation; the distinct counts shuffle " +
        "8-byte hashes. The first table every dataset card needs.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        docs
          .select(col("source"), col("lang"),
            size(split(col("text"), " ")).as("ntok"),
            Portable.pmd5(col("text")).as("h"),
            Portable.pmd5(
              array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
              .as("bh"))
          .rollup("source", "lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("n_tokens"),
            (sum(col("ntok")).cast("double") / count(lit(1))).as("avg_tokens"),
            countDistinct(col("h")).as("n_distinct"),
            countDistinct(col("bh")).as("n_bow_distinct"))
          .select(
            coalesce(col("source"), lit("<all>")).as("source"),
            coalesce(col("lang"), lit("<all>")).as("lang"),
            col("n_docs"), col("n_tokens"), col("avg_tokens"),
            col("n_distinct"), col("n_bow_distinct"),
            (lit(1.0) - col("n_bow_distinct").cast("double") / col("n_docs"))
              .as("reorder_dup_rate"))
      },
      Some(s"""
        WITH d AS (
          SELECT source, lang, len(string_split(text, ' ')) AS ntok,
                 ${Portable.pmd5Sql("text")} AS h,
                 ${Portable.pmd5Sql(
                   "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')")}
                   AS bh
          FROM documents)
        SELECT coalesce(source, '<all>') AS source,
               coalesce(lang, '<all>') AS lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS n_tokens,
               CAST(sum(ntok) AS DOUBLE) / count(*) AS avg_tokens,
               CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
               CAST(count(DISTINCT bh) AS BIGINT) AS n_bow_distinct,
               1.0 - CAST(count(DISTINCT bh) AS DOUBLE) / count(*) AS reorder_dup_rate
        FROM d GROUP BY ROLLUP(source, lang)""")),
    // ----------------------------------------------------------------
    Q(
      "q69_kmv_distinct",
      s"KMV (bottom-$KMV_K) distinct-count sketch vs exact: per-source " +
        "distinct 3-word-shingle cardinality estimated from the " +
        s"$KMV_K smallest shingle hashes — (k-1) * 2^60 / h_k over the " +
        "pmd5 space. The sketch aggregator's buffer is BOUNDED at k " +
        "longs with map-side combine (a custom typed Aggregator), so " +
        "the shuffle ships k values per partition per group where the " +
        "exact count ships every distinct value — the sketch family's " +
        "whole point at corpus scale. Min-k of a set is order-" +
        "insensitive, so the estimate is bit-deterministic and oracle-" +
        "checkable (measured ~16% mean |error| at k=32, the expected " +
        "1/sqrt(k)). n_exact rides along as the ground-truth column.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sh = docs.select(col("source"), split(col("text"), " ").as("ts"))
          .select(col("source"), explode(when(size(col("ts")) >= 3,
            transform(sequence(lit(1), size(col("ts")) - 2),
              i => concat_ws(" ", element_at(col("ts"), i),
                element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))))
            .otherwise(array().cast("array<string>"))).as("sgl"))
        val minK = udaf(new graft.functions.Aggregators.MinKHash(KMV_K),
          org.apache.spark.sql.Encoders.scalaLong)
        sh
          .select(col("source"), col("sgl"),
            Portable.pmd5(concat(lit("kmv:"), col("sgl"))).as("h"))
          .groupBy("source")
          .agg(
            countDistinct(col("sgl")).as("n_exact"),
            minK(col("h")).as("hk0"))
          .select(col("source"), col("n_exact"),
            when(col("hk0") > 0, col("hk0")).as("h_k"),
            when(col("hk0") > 0,
              lit((KMV_K - 1).toDouble) * lit(1152921504606846976.0) / col("hk0"))
              .as("kmv_estimate"))
      },
      Some(s"""
        WITH sh AS (
          SELECT source,
                 ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sgl
          FROM (SELECT source, string_split(text, ' ') AS ts FROM documents),
               unnest(generate_series(1, len(ts) - 2)) AS t(i)),
        ex AS (
          SELECT source, CAST(count(DISTINCT sgl) AS BIGINT) AS n_exact
          FROM sh GROUP BY source),
        hs AS (
          SELECT DISTINCT source, ${Portable.pmd5Sql("concat('kmv:', sgl)")} AS h
          FROM sh),
        r AS (
          SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM hs),
        kk AS (
          SELECT source, max(CASE WHEN rn = $KMV_K THEN h END) AS h_k
          FROM r GROUP BY source)
        SELECT source, n_exact, h_k,
               ${KMV_K - 1} * 1152921504606846976.0 / h_k AS kmv_estimate
        FROM ex JOIN kk USING (source)""")),
    // ----------------------------------------------------------------
    Q(
      "q107_term_search",
      s"Multi-term AND search over the corpus — the retrieval consumer " +
        s"of q51's inverted index: documents containing EVERY query " +
        s"term (${SEARCH_TERMS.mkString("'", "', '", "'")}), ranked by " +
        s"summed term frequency (ties by doc_id), top $SEARCH_K. The " +
        "term filter runs in the scan stage BEFORE the shuffle, so " +
        "only matching (doc_id, token) rows — |terms| per doc at most " +
        "— ever move; at corpus scale the scan side is replaced by " +
        "q51's postings join (same key, same shape), never a text " +
        "rescan.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token").isin(SEARCH_TERMS: _*))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("token")).as("nt"),
            count(lit(1)).as("tf_total"))
          .filter(col("nt") === SEARCH_TERMS.size)
          .orderBy(col("tf_total").desc, col("doc_id").asc)
          .limit(SEARCH_K)
          .select(col("doc_id"), col("tf_total"))
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, t AS token
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          WHERE t IN (${SEARCH_TERMS.mkString("'", "', '", "'")}))
        SELECT doc_id, CAST(count(*) AS BIGINT) AS tf_total
        FROM tok
        GROUP BY doc_id
        HAVING count(DISTINCT token) = ${SEARCH_TERMS.size}
        ORDER BY tf_total DESC, doc_id ASC
        LIMIT $SEARCH_K""")),
    // ----------------------------------------------------------------
    Q(
      "q118_ranked_or_search",
      s"IDF-weighted OR retrieval — q107's AND search relaxed to " +
        s"any-term matching with rarity weighting: score = sum over " +
        s"matched terms of tf * bitlength(N div df), an integer IDF " +
        "surrogate (floor(log2) + 1 via the exact length(bin(x)) " +
        "identity — no transcendental log whose last-ulp rounding " +
        "could diverge across engines). Rare terms dominate common " +
        "ones; ranking is the total order (score desc, doc_id asc), " +
        s"top $SEARCH_K. Term filter runs scan-stage; df and N are " +
        "k-row/1-row broadcast frames; at corpus scale the scan side " +
        "is q51's postings join.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val total = docs.agg(count(lit(1)).as("n_docs"))
        val tok = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token").isin(OR_TERMS: _*))
        val dfreq = tok.groupBy(col("token"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val weights = dfreq.crossJoin(broadcast(total))
          .select(col("token"), expr("length(bin(n_docs div df))").as("w"))
        tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
          .join(broadcast(weights), "token")
          .groupBy(col("doc_id"))
          .agg(sum(col("tf") * col("w")).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(SEARCH_K)
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, t AS token
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          WHERE t IN (${OR_TERMS.mkString("'", "', '", "'")})),
        total AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        w AS (
          SELECT token, CAST(length(bin(n_docs // df)) AS BIGINT) AS w
          FROM (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                FROM tok GROUP BY token), total)
        SELECT doc_id, CAST(sum(tf * w.w) AS BIGINT) AS score
        FROM (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, token) tf
        JOIN w USING (token)
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT $SEARCH_K""")),
    // ----------------------------------------------------------------
    Q(
      "q133_bm25",
      "BM25 ranked retrieval — q118's IDF weighting completed with " +
        "term-frequency saturation and document-length normalization, " +
        "in EXACT integer arithmetic: k1 and b are DEFINED as the " +
        "rationals 6/5 and 3/4 (the canonical 1.2/0.75), avgdl enters " +
        "as the exact ratio t_toks/n_docs, and cross-multiplying " +
        "clears every denominator: per-term score_milli = w * 1000 * " +
        "44*tf*T div (20*tf*T + 6*T + 18*dl*N) with w = q118's " +
        "length(bin(N div df)) integer IDF — floored at milli " +
        "precision per term, so both engines sum identical integers " +
        "(a float BM25 would drift with reduction order). Products " +
        "route through DECIMAL(38,0)/HUGEINT: w*44000*tf*T passes " +
        "2^63 on a trillion-token corpus while 38 digits hold to " +
        "1e38. Term filter and dl projection run scan-stage; df/N/T " +
        "are k-row/1-row broadcasts; the dl join is a doc_id key " +
        "join (at corpus scale: co-located against doc_id-bucketed " +
        s"storage). Top $SEARCH_K under the total order " +
        "(score desc, doc_id).",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val docsLen = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"))
        val totals = docsLen.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("t_toks"))
        val tok = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token").isin(OR_TERMS: _*))
        val dfreq = tok.groupBy(col("token"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val weights = dfreq.crossJoin(broadcast(totals))
          .select(col("token"),
            expr("CAST(length(bin(n_docs div df)) AS BIGINT)").as("w"),
            col("n_docs"), col("t_toks"))
        tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
          .join(docsLen, "doc_id")
          .join(broadcast(weights), "token")
          .withColumn("term_milli", expr(
            "CAST(w * 1000 * 44 * tf * CAST(t_toks AS DECIMAL(38,0)) div " +
              "(20 * tf * CAST(t_toks AS DECIMAL(38,0)) " +
              "+ 6 * CAST(t_toks AS DECIMAL(38,0)) " +
              "+ 18 * dl * CAST(n_docs AS DECIMAL(38,0))) AS BIGINT)"))
          .groupBy(col("doc_id")).agg(sum(col("term_milli")).as("score_milli"))
          .orderBy(col("score_milli").desc, col("doc_id").asc)
          .limit(SEARCH_K)
      },
      Some(s"""
        WITH dl AS (
          SELECT doc_id, CAST(length(string_split(text, ' ')) AS BIGINT) AS dl
          FROM documents),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS t_toks FROM dl),
        tok AS (
          SELECT doc_id, t AS token
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          WHERE t IN (${OR_TERMS.mkString("'", "', '", "'")})),
        dfq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                FROM tok GROUP BY token),
        w AS (SELECT token, CAST(length(bin(n_docs // df)) AS BIGINT) AS w,
                     n_docs, t_toks
              FROM dfq, tot),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        terms AS (
          SELECT tf.doc_id,
                 CAST(w.w * 1000 * 44 * tf.tf * CAST(w.t_toks AS HUGEINT) //
                      (20 * tf.tf * CAST(w.t_toks AS HUGEINT)
                       + 6 * CAST(w.t_toks AS HUGEINT)
                       + 18 * dl.dl * CAST(w.n_docs AS HUGEINT)) AS BIGINT) AS term_milli
          FROM tf JOIN dl USING (doc_id) JOIN w USING (token))
        SELECT doc_id, CAST(sum(term_milli) AS BIGINT) AS score_milli
        FROM terms GROUP BY doc_id
        ORDER BY score_milli DESC, doc_id ASC
        LIMIT $SEARCH_K""")),
    // ----------------------------------------------------------------
    Q(
      "q136_priority_sample",
      "Weighted sampling without replacement by PRIORITY sampling " +
        "(Duffield-Lund-Thorup): each document draws the " +
        "deterministic uniform u = (pmd5(doc_id) % 2^30 + 1)/2^30 and " +
        s"competes on priority w/u (w = n_chars); the top $PRI_K " +
        "priorities are the sample, and tau (the priority of rank " +
        s"${PRI_K + 1}) yields the Horvitz-Thompson estimation weight " +
        "max(w, tau) under which subset sums are unbiased for the " +
        "population — the long-doc-favoring sample q50's uniform coin " +
        "cannot give, with the correction factor a downstream " +
        "estimator needs. Priorities are exact integers (milli scale, " +
        "u cleared by cross-multiplication; see PRI_U for the " +
        "overflow-safety bound), the sample is the total order " +
        "(priority desc, doc_id), and the global top-k plans as " +
        "TakeOrderedAndProject — per-partition k-row heaps, never a " +
        "full sort; tau is a 1-row broadcast.",
      (s, dir) => {
        val pri = spread(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), col("n_chars").cast(LongType).as("w"),
            ((Portable.pmd5(col("doc_id").cast(StringType)) % PRI_U) + 1)
              .as("hp"))
          .select(col("doc_id"), col("w"),
            expr(s"w * 1000 * $PRI_U div hp").as("pm"))
        val top = pri.orderBy(col("pm").desc, col("doc_id")).limit(PRI_K + 1)
        top.persist()
        // tau is the priority of rank K+1; when the population itself
        // has <= K members there is no rank K+1 and EVERY member is
        // sampled with certainty — HT weight = w exactly, i.e. tau = 0
        // (min over the full top frame would instead be a sample
        // member's own priority and bias subset sums upward)
        val tau = top.agg(
          when(count(lit(1)) <= PRI_K, lit(0L)).otherwise(min(col("pm")))
            .as("tau"))
        top.orderBy(col("pm").desc, col("doc_id")).limit(PRI_K)
          .crossJoin(broadcast(tau))
          .select(col("doc_id"), col("w"), col("pm").as("priority_milli"),
            greatest(col("w") * 1000, col("tau")).as("est_weight_milli"))
      },
      Some(s"""
        WITH pri AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                 (CAST(n_chars AS BIGINT) * 1000 * $PRI_U) //
                 ((${Portable.pmd5Sql("CAST(doc_id AS VARCHAR)")} % $PRI_U) + 1) AS pm
          FROM documents),
        top AS (SELECT * FROM pri ORDER BY pm DESC, doc_id LIMIT ${PRI_K + 1}),
        tau AS (SELECT CASE WHEN count(*) <= $PRI_K THEN 0
                       ELSE min(pm) END AS tau FROM top)
        SELECT doc_id, w, pm AS priority_milli,
               greatest(w * 1000, tau) AS est_weight_milli
        FROM top, tau
        ORDER BY pm DESC, doc_id
        LIMIT $PRI_K""")),
    // ----------------------------------------------------------------
    Q(
      "q140_tfidf_pairs",
      "Weighted all-pairs document similarity — tf-idf COSINE over " +
        "the postings join (the IR-weighted complement of q59's " +
        "unweighted Jaccard ssjoin): token weight = tf x q118's " +
        "integer IDF, partial dot products accumulate per shared " +
        "token, and the score is cos^2 in basis points — dot^2 x " +
        "10000 div (norm_a x norm_b), exact integer arithmetic with " +
        "the squares in DECIMAL(38,0)/HUGEINT, so no sqrt and no " +
        s"float drift; pairs kept at cos^2 >= $COS2_TH_BP bp " +
        "(cosine >= 0.5). Tokens with df > " + DF_CAP + " are dropped " +
        "BY DEFINITION (both engines identically): at any corpus " +
        "size the postings self-join fans out at most df^2 pairs per " +
        "token, so the cap bounds the join the way q59's rare-first " +
        "prefix does — ubiquitous tokens carry bitlen IDF ~1 and " +
        "barely move the cosine anyway. Token tf table persists once " +
        "and feeds df, weights, norms and dots.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val total = docs.agg(count(lit(1)).as("n_docs"))
        val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        tf.persist()
        val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= DF_CAP)
        val weights = tf.join(dfreq, "tok").crossJoin(broadcast(total))
          .select(col("doc_id"), col("tok"),
            (col("tf") * expr("CAST(length(bin(n_docs div df)) AS BIGINT)")).as("w"))
        weights.persist()
        val norms = weights.groupBy(col("doc_id"))
          .agg(sum(expr("CAST(w * w AS DECIMAL(38,0))")).as("norm"))
        val dots = weights.as("a")
          .join(weights.as("b"), Seq("tok"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(sum(col("a.w") * col("b.w")).as("dot"))
        dots
          .join(norms.select(col("doc_id").as("doc_a"), col("norm").as("norm_a")), "doc_a")
          .join(norms.select(col("doc_id").as("doc_b"), col("norm").as("norm_b")), "doc_b")
          .withColumn("cos2_bp", expr(
            "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 10000 div (norm_a * norm_b) AS BIGINT)"))
          .filter(col("cos2_bp") >= COS2_TH_BP)
          .select(col("doc_a"), col("doc_b"), col("dot"), col("cos2_bp"))
      },
      Some(s"""
        WITH tf AS (
          SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
          GROUP BY 1, 2),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY 1 HAVING count(*) <= $DF_CAP),
        w AS (SELECT doc_id, tok,
                     tf * CAST(length(bin(n_docs // df)) AS BIGINT) AS w
              FROM tf JOIN dfq USING (tok), tot),
        norms AS (SELECT doc_id, sum(CAST(w * w AS HUGEINT)) AS norm
                  FROM w GROUP BY 1),
        dots AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(sum(a.w * b.w) AS BIGINT) AS dot
          FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, dot,
               CAST(CAST(dot AS HUGEINT) * dot * 10000
                    // (na.norm * nb.norm) AS BIGINT) AS cos2_bp
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b
        WHERE CAST(dot AS HUGEINT) * dot * 10000 // (na.norm * nb.norm)
              >= $COS2_TH_BP"""))
  )
}
