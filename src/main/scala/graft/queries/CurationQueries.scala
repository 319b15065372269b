package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable
import graft.operators.{Dedup, Maintenance, PrioritySample, Sketches}
import graft.queries.Tables.{boundedRank, spread, t}

/** Corpus-curation toolbox: tokenizer-training statistics, term
  * blocklist filtering and redaction (the relational shape of a PII
  * scrub — the testdata corpus has no PII-like spans, so the mask set
  * is a term list; the plumbing is identical), the quantized-embedding
  * datasheet, and bounded-memory heavy hitters. Every query keeps the
  * heavy stage scan-local: per-row projections at the scan, tiny
  * dimension sides broadcast, sketches where the exact answer would
  * shuffle the full domain.
  */
object CurationQueries {

  /** Blocklist for q91/q92: one common term and one rare term, so the
    * filter exercises both the hot and the cold path of the match. */
  private val BLOCK = Seq("slow", "dup")
  /** q275's matrix blocklist: 'dup' alone — rare in the corpus (~4%
    * of training docs at sf0.01), so the term-gate taint column is
    * non-vacuous without drowning every other gate's admitted set
    * (q91's two-term list blocks ~80% — right for drop STATISTICS,
    * wrong for a side-by-side matrix). */
  private val MatrixBlock = Seq("dup")
  private val MASK = "<MASK>"
  private val TOPP = 20 // q90: merge-candidate pairs reported
  private val MG_K = 64  // q94: Misra-Gries counters; threshold = N/64
  private val CMS_D = 4   // q124: count-min hash rows
  private val CMS_W = 64  // q124: counters per row
  private val CMS_PROBES = 10 // q124: audited tokens
  private val DIM = 64   // q93: embedding dimensionality
  private val HBINS = 64 // q95: histogram bins per source
  private val TOPK_G = 3 // q96: rows kept per group
  private val CUT_L = 20 // q97: repeated-run gram width (matches q78)
  // q144: fixed probe keys (present at every SF; the oracle mirrors
  // the same IN-list, so values — not pruning — are what's compared)
  private val BLOOM_LOOKUP_IDS = Seq(7L, 123L, 404L)
  // q282: shares carried as integer parts-per-1e8 (q177's convention —
  // the count product runs in DECIMAL(38,0)/HUGEINT so a trillion-char
  // stratum cannot wrap). Interpolated into the oracle.
  private val MIX_SHARE_E8 = 100000000L

  private def blockSql = BLOCK.map(b => s"'$b'").mkString(", ")

  /** The DSIR score-and-keep oracle CTE chain (toks..keepd) — ONE
    * DuckDB statement of Dsir.scoreSelf + resampleKeep, shared by
    * every resampling consumer (q270/q276/q279/q280) so the scoring
    * arithmetic cannot drift between them. Callers append their own
    * tail after `keepd`. */
  private def dsirKeepCtes: String = s"""toks AS (
          SELECT doc_id, lang = 'en' AS tgt, string_split(text, ' ') AS ts
          FROM documents),
        uni AS (SELECT doc_id, tgt, unnest(ts) AS f FROM toks),
        bi AS (
          SELECT doc_id, tgt, ts[i] || ' ' || ts[i + 1] AS f
          FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        feats AS (
          SELECT doc_id, tgt, ${Portable.pmd5Sql("f")} % ${graft.operators.Dsir.DefaultBuckets} AS bucket
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        cr AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS cr
          FROM feats GROUP BY 1),
        ct AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS ct
          FROM feats WHERE tgt GROUP BY 1),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS tr,
                 CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS tt
          FROM feats),
        w AS (
          SELECT bucket,
                 ${graft.operators.Dsir.flog2DuckSql(
                   s"(coalesce(ct, 0) + 1) * (tr + ${graft.operators.Dsir.DefaultBuckets})",
                   s"(coalesce(cr, 0) + 1) * (tt + ${graft.operators.Dsir.DefaultBuckets})")} AS bits
          FROM cr FULL JOIN ct USING (bucket) CROSS JOIN tot),
        scored AS (
          SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(sum(bits) AS BIGINT) AS weight_bits
          FROM feats f JOIN w USING (bucket) GROUP BY 1),
        dec AS (
          SELECT doc_id,
                 ${graft.operators.Dsir.floorDivDuckSql(
                   "weight_bits", "n_feats")} AS wb_norm
          FROM scored),
        keepd AS (
          SELECT doc_id, wb_norm,
                 ${graft.operators.Dsir.resampleKeepDuckSql("wb_norm",
                   Portable.pmd5Sql(
                     "concat('dsirk:', CAST(doc_id AS VARCHAR))") +
                     s" % ${1L << graft.operators.Dsir.ResampleUniformBits}"
                   )} AS keep
          FROM dec)"""

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q90_bpe_first_merge",
      "BPE tokenizer training, step 1: adjacent character-pair counts " +
        s"weighted by word frequency — the top-$TOPP merge candidates " +
        "the first BPE iteration would rank. The corpus collapses to " +
        "its word-frequency table FIRST (one map-side-combined agg), " +
        "so pair explosion runs over the VOCABULARY, not the corpus — " +
        "at 100 TB the vocab table is millions of rows where the " +
        "corpus is trillions, and later merge iterations rescan only " +
        "it. The final ranking window sees the LIMIT-" + TOPP +
        " slice only.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val wf = docs.select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy(col("w")).agg(count(lit(1)).as("f"))
        val pairs = wf.select(col("f"),
          explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("f")).as("n"))
        pairs.orderBy(col("n").desc, col("pair")).limit(TOPP)
          .withColumn("rnk",
            boundedRank(col("n"))(col("n").desc, col("pair")).cast(LongType))
      },
      Some(s"""
        WITH wf AS (
          SELECT w, CAST(count(*) AS BIGINT) AS f
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY w),
        pairs AS (
          SELECT substring(w, i, 2) AS pair, f
          FROM wf, unnest(generate_series(1, length(w) - 1)) AS u(i)),
        agg AS (
          SELECT pair, CAST(sum(f) AS BIGINT) AS n FROM pairs GROUP BY pair)
        SELECT pair, n,
               CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rnk
        FROM agg ORDER BY n DESC, pair LIMIT $TOPP""")),
    // ----------------------------------------------------------------
    Q(
      "q91_blocklist_filter",
      "Term-blocklist filter statistics (the C4 badwords recipe; same " +
        "shape as a PII-bearing-document drop): a document is dropped " +
        "when it contains ANY blocklisted term; per source, kept/" +
        "dropped counts and the drop fraction. The blocklist is a " +
        "literal array at the scan (a real list would broadcast); the " +
        "match is one arrays_overlap per row, scan-stage, and only " +
        "(source, flag) ever reaches the shuffle.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        // the predicate is C4Rules.termPass — ONE statement shared
        // with CurateStream's termGate and the q275 matrix column
        docs.select(col("source"),
          (!graft.operators.C4Rules.termPass(col("text"), BLOCK))
            .as("blocked"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("blocked"), 1L).otherwise(0L)).as("n_dropped"))
          .select(col("source"), col("n_docs"),
            col("n_dropped"),
            (col("n_dropped").cast(DoubleType) / col("n_docs")).as("drop_frac"))
      },
      Some(s"""
        WITH d AS (
          SELECT source,
                 len(list_intersect(string_split(text, ' '),
                     [$blockSql])) > 0 AS blocked
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS drop_frac
        FROM d GROUP BY source""")),
    // ----------------------------------------------------------------
    Q(
      "q92_redaction",
      "Term redaction (the PII-scrub plumbing, with a term list as the " +
        "detector): every blocklisted token is replaced by a mask " +
        "token; output per affected document is the masked-token count " +
        "and the digest of the redacted text — the content-addressable " +
        "identity the scrubbed corpus is re-deduplicated under. Pure " +
        "per-row projection at the scan; the full redacted text never " +
        "shuffles (only its 16-byte digest does), and unaffected " +
        "documents are filtered out before any exchange.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val toks = split(col("text"), " ")
        docs.select(col("doc_id"),
          size(filter(toks, tk => tk.isin(BLOCK: _*))).cast(LongType)
            .as("n_masked"),
          md5(array_join(transform(toks,
            tk => when(tk.isin(BLOCK: _*), lit(MASK)).otherwise(tk)), " "))
            .as("redacted_md5"))
          .filter(col("n_masked") > 0)
      },
      Some(s"""
        SELECT * FROM (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                      tk -> tk IN ($blockSql))) AS BIGINT) AS n_masked,
                 md5(array_to_string(list_transform(string_split(text, ' '),
                      tk -> CASE WHEN tk IN ($blockSql) THEN '$MASK' ELSE tk END),
                      ' ')) AS redacted_md5
          FROM documents)
        WHERE n_masked > 0""")),
    // ----------------------------------------------------------------
    Q(
      "q93_embedding_dimstats",
      "Quantized-embedding datasheet: per-dimension count, code sum, " +
        "mean and variance of the int8 codes (q57's max-abs scale, " +
        "floor codes) — dead or saturated dimensions here indict the " +
        "encoder before a billion-vector index is built on it. Codes " +
        "are INTEGER, so the sums commute under any partitioning and " +
        "the variance is cross-multiplied integer arithmetic down to " +
        "one final double division — bit-deterministic on any engine, " +
        "unlike a float running variance. The cross products run in " +
        "DECIMAL(38,0) (HUGEINT on the oracle side): n*ss hits 2^63 " +
        "at only ~7.5e8 vectors, below the design point, while 38 " +
        "digits hold past 1e30. One posexplode x " + DIM + " per " +
        "vector at the scan, one map-side-combined agg on a " +
        s"$DIM-row key space.",
      (s, dir) => {
        val e = spread(t(s, dir, "embeddings"), col("vec_id"))
        val prepped = e.select(
          transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
          .withColumn("scale",
            aggregate(col("v"), lit(0.0), (a, x) => greatest(a, abs(x))) / 127)
        prepped.select(posexplode(transform(col("v"),
          x => when(col("scale") === 0, lit(0L))
            .otherwise(floor(x / col("scale")).cast(LongType)))))
          .select((col("pos") + 1).cast(LongType).as("dim"),
            col("col").as("code"))
          .groupBy(col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("code")).as("s"),
            // DECIMAL sum: a BIGINT ss would overflow n*ss below the
            // design point (see the query doc)
            sum((col("code") * col("code")).cast(DecimalType(38, 0))).as("ss"))
          .select(col("dim"), col("n"), col("s"),
            (col("s").cast(DoubleType) / col("n")).as("mean_code"),
            ((col("n").cast(DecimalType(38, 0)) * col("ss")
              - col("s").cast(DecimalType(38, 0)) * col("s").cast(DecimalType(38, 0)))
              .cast(DoubleType)
              / (col("n").cast(DecimalType(38, 0)) * col("n").cast(DecimalType(38, 0)))
              .cast(DoubleType)).as("var_code"))
      },
      Some(s"""
        WITH pv AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        sc AS (
          SELECT v,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> abs(x))),
                   (a, x) -> greatest(a, x)) / 127 AS scale
          FROM pv),
        codes AS (
          SELECT CAST(i AS BIGINT) AS dim,
                 CAST(CASE WHEN scale = 0 THEN 0
                      ELSE floor(v[i] / scale) END AS BIGINT) AS code
          FROM sc, unnest(generate_series(1, $DIM)) AS u(i)),
        agg AS (
          SELECT dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(code) AS BIGINT) AS s,
                 sum(code * code) AS ss -- HUGEINT, the decimal mirror
          FROM codes GROUP BY dim)
        SELECT dim, n, s,
               CAST(s AS DOUBLE) / n AS mean_code,
               CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS var_code
        FROM agg""")),
    // ----------------------------------------------------------------
    Q(
      "q94_heavy_hitters",
      s"Exact heavy hitters in two bounded passes: a Misra-Gries sketch " +
        s"($MG_K counters per partition, mapPartitions) yields a " +
        "candidate set PROVABLY containing every token above the N/" +
        MG_K + " frequency bar; pass 2 exact-counts candidates only " +
        "and applies the bar in cross-multiplied integer form. The " +
        "exact one-pass groupBy would shuffle the full token domain; " +
        "here the shuffle carries at most (k-1) x partitions " +
        "candidates plus their partial counts — the only heavy-hitter " +
        "shape that survives a trillion-token corpus with a " +
        "billion-term vocabulary.",
      (s, dir) => {
        import s.implicits._
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
        toks.persist()
        val cands = Sketches.misraGriesCandidates(toks.as[String], MG_K)
          .toDF("tok")
        val total = toks.agg(count(lit(1)).as("total"))
        toks.join(broadcast(cands), "tok")
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .filter(col("cnt") * MG_K > col("total"))
          .select(col("tok"), col("cnt"), col("total").as("total_tokens"),
            (col("cnt").cast(DoubleType) / col("total")).as("freq"))
      },
      Some(s"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks)
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt, total AS total_tokens,
               CAST(count(*) AS DOUBLE) / total AS freq
        FROM toks CROSS JOIN tot
        GROUP BY tok, total
        HAVING CAST(count(*) AS BIGINT) * $MG_K > total""")),
    // ----------------------------------------------------------------
    Q(
      "q124_countmin_sketch",
      s"Count-min sketch audit — the mergeable POINT-FREQUENCY sketch " +
        s"beside KLL (ranks, q101) and KMV (distinct, q69): a $CMS_D x " +
        s"$CMS_W grid of counters where row i increments cell " +
        s"hash_i(token) mod $CMS_W, and a token's estimate is the MIN " +
        "over its d cells — never below the exact count, above it only " +
        "by colliding traffic (<= eN/w in expectation per row). Cells " +
        "are sums, so shard grids merge by cell-wise addition and the " +
        "shuffle carries at most d*w=" + (CMS_D * CMS_W) + " keys per " +
        "partition after map-side combine — bounded state regardless " +
        s"of vocabulary size, where q94's exact pass shuffles a " +
        "candidate set. The audited output joins the estimate to the " +
        s"exact count for the top-$CMS_PROBES tokens (q84's " +
        "sketch-vs-truth pattern): overcount >= 0 is the sketch's " +
        "one-sided guarantee, checked per row.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
        toks.persist()
        def cells = array((0 until CMS_D).map(i =>
          Portable.pmd5Salted(i, col("tok")) % CMS_W): _*)
        val cms = toks
          .select(posexplode(cells).as(Seq("row_i", "cell")))
          .groupBy(col("row_i"), col("cell")).agg(count(lit(1)).as("cellval"))
        val probes = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(CMS_PROBES)
        probes
          .select(col("tok"), col("cnt"),
            posexplode(cells).as(Seq("row_i", "cell")))
          .join(broadcast(cms), Seq("row_i", "cell"))
          .groupBy(col("tok"), col("cnt"))
          .agg(min(col("cellval")).as("est_cnt"))
          .select(col("tok"), col("cnt").as("exact_cnt"), col("est_cnt"),
            (col("est_cnt") - col("cnt")).as("overcount"))
      },
      Some(s"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        cells AS (
          ${(0 until CMS_D).map(i =>
            s"SELECT $i AS row_i, ${Portable.pmd5SaltedSql(i, "tok")} % $CMS_W AS cell FROM toks")
            .mkString("\n          UNION ALL ")}),
        cms AS (
          SELECT row_i, cell, CAST(count(*) AS BIGINT) AS cellval
          FROM cells GROUP BY 1, 2),
        cnts AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY tok),
        probes AS (SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok LIMIT $CMS_PROBES),
        pc AS (
          ${(0 until CMS_D).map(i =>
            s"SELECT tok, cnt, $i AS row_i, ${Portable.pmd5SaltedSql(i, "tok")} % $CMS_W AS cell FROM probes")
            .mkString("\n          UNION ALL ")})
        SELECT tok, cnt AS exact_cnt, min(cellval) AS est_cnt,
               min(cellval) - cnt AS overcount
        FROM pc JOIN cms USING (row_i, cell)
        GROUP BY tok, cnt""")),
    // ----------------------------------------------------------------
    Q(
      "q95_quantile_refine",
      "Two-pass histogram-refine EXACT quantiles — the implementation " +
        "of the scale path q85's full-sort window only gestures at. " +
        s"Pass 1 folds each source into a $HBINS-bin equi-width " +
        "histogram (bounded state, map-side combined) and walks the " +
        "cumulative counts to the single bin holding each target rank; " +
        "pass 2 exact-ranks ONLY inside chosen bins — the window sees " +
        "n/bins rows instead of n. Same type-1 definition as q85 " +
        "(value at rank ceil(q*n), integer arithmetic throughout), so " +
        "the oracle is q85's: exact answers from bounded memory.",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        val stats = d.groupBy(col("source")).agg(
          count(lit(1)).as("n"), min(col("n_tokens")).as("lo"),
          max(col("n_tokens")).as("hi"))
        // integer bin width (Column./ is DOUBLE division — use SQL div);
        // every value lands in exactly one of HBINS bins
        val binned = d.join(broadcast(stats), "source")
          .withColumn("width", expr(
            s"greatest((hi - lo + ${HBINS - 1}) div $HBINS, cast(1 as bigint))"))
          .withColumn("bin", expr(
            s"least((n_tokens - lo) div width, cast(${HBINS - 1} as bigint))"))
        val hist = binned.groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
        import s.implicits._
        val qs = Seq(50L, 90L, 99L).toDF("q")
        val cumW = Window.partitionBy(col("source"), col("q"))
          .orderBy(col("bin"))
        // the bin containing rank r: first bin whose cumulative count
        // reaches r (cum >= r and cum - cnt < r)
        val chosen = hist.join(broadcast(stats.select(col("source"), col("n"))), "source")
          .crossJoin(broadcast(qs))
          .withColumn("r", expr("(n * q + 99) div 100"))
          .withColumn("cum", sum(col("cnt")).over(cumW))
          .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
          .select(col("source"), col("q"), col("bin"),
            (col("r") - (col("cum") - col("cnt"))).as("r_in_bin"))
        val rankW = Window.partitionBy(col("source"), col("q"))
          .orderBy(col("n_tokens"), col("doc_id"))
        binned.join(broadcast(chosen), Seq("source", "bin"))
          .withColumn("rk", row_number().over(rankW).cast(LongType))
          .filter(col("rk") === col("r_in_bin"))
          .groupBy(col("source"))
          .agg(max(col("n")).as("n_docs"),
            max(when(col("q") === 50, col("n_tokens"))).as("p50"),
            max(when(col("q") === 90, col("n_tokens"))).as("p90"),
            max(when(col("q") === 99, col("n_tokens"))).as("p99"))
      },
      Some("""
        WITH d AS (
          SELECT source, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        r AS (
          SELECT source, n_tokens,
                 row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM d)
        SELECT source, n AS n_docs,
               max(CASE WHEN rn = (n*50 + 99) // 100 THEN n_tokens END) AS p50,
               max(CASE WHEN rn = (n*90 + 99) // 100 THEN n_tokens END) AS p90,
               max(CASE WHEN rn = (n*99 + 99) // 100 THEN n_tokens END) AS p99
        FROM r GROUP BY source, n""")),
    // ----------------------------------------------------------------
    Q(
      "q96_topk_per_group",
      "Top-k per group through a BOUNDED typed Aggregator (k=3 priciest " +
        "orders per priority): the buffer never exceeds k rows, so " +
        "map-side combine ships at most k rows per group per partition " +
        "— where the row_number() window formulation shuffles EVERY " +
        "row of every group to one task and sorts it. Top-k of a set " +
        "is order-insensitive and (price DESC, key ASC) is a total " +
        "order, so ranks are bit-deterministic under any partitioning; " +
        "the oracle IS the window formulation — same answer, " +
        "unbounded shuffle.",
      (s, dir) => {
        import s.implicits._
        import graft.functions.Aggregators
        t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .mapValues(r => Aggregators.KeyedPrice(r._2, r._3))
          .agg(new Aggregators.TopKByPrice(TOPK_G).toColumn)
          .flatMap { case (prio, rows) =>
            rows.zipWithIndex.map { case (r, i) =>
              (prio, (i + 1).toLong, r.key, r.price)
            }
          }
          .toDF("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
      },
      Some(s"""
        SELECT o_orderpriority, CAST(rn AS BIGINT) AS rnk,
               o_orderkey, o_totalprice
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= $TOPK_G""")),
    // ----------------------------------------------------------------
    Q(
      "q97_exactsubstr_cut",
      s"ExactSubstr CUT — applying q78's repeated-run mask: every token " +
        s"covered by a corpus-duplicated $CUT_L-gram is removed and the " +
        "cut document's identity (token counts + digest of the " +
        "rewritten text) comes back, the step that actually produces " +
        "the deduplicated corpus. Grams and positions travel as " +
        "integers; the one token-level exchange (reassembly by doc_id) " +
        "is the inverted-index cost q51 already budgets (~tokens x " +
        "16 B) — at corpus scale it becomes a co-located join against " +
        "doc_id-bucketed storage. A fully-duplicated doc cuts to " +
        "nothing and exits the corpus (both engines drop it).",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val withTs = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
        val runs = Dedup.repeatedGramRuns(docs, "doc_id", "text", CUT_L)
        // overlapping runs (start gap < CUT_L) cover shared tokens — distinct
        val covered = runs.select(col("doc_id"),
          explode(sequence(col("mn"), col("mx") + (CUT_L - 1))).as("pos"))
          .distinct()
        val affected = runs.select(col("doc_id")).distinct()
        val tokPos = withTs.join(affected, "doc_id")
          .select(col("doc_id"), size(col("ts")).cast(LongType).as("n"),
            posexplode(col("ts")))
          .select(col("doc_id"), col("n"),
            (col("pos") + 1).cast(LongType).as("pos"), col("col").as("tk"))
        tokPos.join(covered, Seq("doc_id", "pos"), "left_anti")
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n_tokens"),
            (max(col("n")) - count(lit(1))).as("n_removed"),
            md5(array_join(transform(
              sort_array(collect_list(struct(col("pos"), col("tk")))),
              r => r.getField("tk")), " ")).as("cut_md5"))
      },
      Some(s"""
        WITH ${Portable.repeatedRunCtesSql(CUT_L)},
        cov AS (
          SELECT DISTINCT doc_id, p AS pos
          FROM runs, unnest(generate_series(mn, mx + ${CUT_L - 1})) u(p)),
        tok AS (
          SELECT d.doc_id, i AS pos, ts[i] AS tk, len(ts) AS n
          FROM d JOIN (SELECT DISTINCT doc_id FROM runs) a USING (doc_id),
               unnest(generate_series(1, len(ts))) v(i)),
        kept AS (
          SELECT t.doc_id, t.pos, t.tk, t.n
          FROM tok t LEFT JOIN cov c
            ON t.doc_id = c.doc_id AND t.pos = c.pos
          WHERE c.pos IS NULL)
        SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
               CAST(max(n) - count(*) AS BIGINT) AS n_removed,
               md5(string_agg(tk, ' ' ORDER BY pos)) AS cut_md5
        FROM kept GROUP BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "q102_incremental_stats",
      "Incremental datasheet maintenance: the corpus arrives as 3 " +
        "hash-split ingest batches; each contributes an O(batch) " +
        "algebraic summary (cnt/sum/min/max/sumsq of n_chars per " +
        "source, map-side combined) and Maintenance.mergeKeyedStats " +
        "folds it into the running summary — O(summary) rows per fold, " +
        "never a corpus rescan. The oracle recomputes from the whole " +
        "table in one GROUP BY, so the hash match PROVES incremental " +
        "== recompute exactly (integer state, no float drift, fold-" +
        "tree insensitive). At 100 TB each batch is its own file set; " +
        "re-filtering one table here stands in for that arrival order.",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
        def batch(i: Int) = d.filter(
          Portable.pmd5(concat(lit("b:"), col("doc_id").cast(StringType))) % 3 === i)
        (0 until 3).map(i => Maintenance.keyedStats(batch(i), "source", "n_chars"))
          .reduce((run, b) => Maintenance.mergeKeyedStats(run, b, "source"))
          .select(col("source"), col("cnt").as("n_docs"),
            col("vsum").as("sum_chars"), col("vmin").as("min_chars"),
            col("vmax").as("max_chars"),
            // vsumsq rides as DECIMAL(38,0) (exact for any long input);
            // n_chars totals fit comfortably in BIGINT at read time
            col("vsumsq").cast("long").as("sumsq_chars"))
      },
      Some("""
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS sumsq_chars
        FROM documents GROUP BY source""")),
    // ----------------------------------------------------------------
    Q(
      "q114_manifest_box",
      "File-level data skipping end-to-end: orders re-laid out " +
        "z-ordered on (o_custkey, epoch(o_orderdate)) with a per-file " +
        "min/max manifest (Maintenance.zorderWrite + writeManifest), " +
        "then a selective 2-D box answered via readWithManifest — " +
        "only files whose ranges intersect the box are OPENED, the " +
        "planning-level skip parquet row-group stats cannot give " +
        "(they prune after listing + footer reads; at 100 TB the " +
        "per-file planning cost dominates selective queries). The " +
        "oracle is the plain full-scan form, so the hash match proves " +
        "the pruned read drops no rows; ZorderSpec measures the " +
        "file-count drop. Layout + manifest build is the write-once " +
        "cost any catalog pays, charged here to keep the query " +
        "self-contained.",
      (s, dir) => {
        val orders = t(s, dir, "orders")
          .withColumn("o_epoch", unix_timestamp(col("o_orderdate")))
        val root = java.nio.file.Files.createTempDirectory("graft-q114").toString
        // scratch layout is per-call (no cross-run staleness); handed
        // to the filesystem's exit hook so repeated runs don't pile up
        val rootPath = new org.apache.hadoop.fs.Path(root)
        rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .deleteOnExit(rootPath)
        Maintenance.zorderWrite(orders, col("o_custkey"), col("o_epoch"),
          s"$root/data", 16)
        Maintenance.writeManifest(s, s"$root/data", s"$root/manifest",
          Seq("o_custkey", "o_epoch"))
        val pruned = Maintenance.readWithManifest(s, s"$root/data",
          s"$root/manifest",
          Map("o_custkey" -> (10L, 40L), "o_epoch" -> (852076800L, 873071999L)))
        // residual filter: the manifest prunes FILES; exact bounds
        // still apply row-level (same rows as the full scan by
        // construction — the oracle compare proves it)
        pruned.filter(col("o_custkey").between(10, 40) &&
            col("o_epoch").between(852076800L, 873071999L))
          .select(col("o_orderkey"), col("o_custkey"), col("o_epoch"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch
        FROM orders
        WHERE o_custkey BETWEEN 10 AND 40
          AND epoch(o_orderdate) BETWEEN 852076800 AND 873071999""")),
    // ----------------------------------------------------------------
    Q(
      "q144_bloom_lookup",
      "Bloom-manifest point lookup end-to-end — q114's file skipping " +
        "for EQUALITY probes on a column the layout is not sorted by " +
        "(min/max ranges cannot prune those): documents re-laid out " +
        "across 8 hash files, a per-file Bloom manifest built " +
        "(Maintenance.writeBloomManifest), and three doc_id lookups " +
        "answered via readPointLookup — only files whose bitmap MIGHT " +
        "contain the key are opened, the exact equality filter " +
        "removes bloom false positives, and no-false-negatives means " +
        "a miss never loses a row. The oracle is the plain IN-list " +
        "scan, so the hash match proves pruning drops nothing; " +
        "BloomManifestSpec measures the file-count drop. Layout + " +
        "manifest build is the write-once catalog cost, charged here " +
        "to keep the query self-contained.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val root = java.nio.file.Files.createTempDirectory("graft-q144").toString
        val rootPath = new org.apache.hadoop.fs.Path(root)
        rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .deleteOnExit(rootPath)
        docs.repartition(8, col("doc_id"))
          .write.mode("overwrite").parquet(s"$root/data")
        Maintenance.writeBloomManifest(s, s"$root/data", s"$root/manifest",
          "doc_id")
        // one batched manifest probe for all three keys (r16): same
        // rows as unioning per-key lookups, one manifest scan + one
        // pruned read instead of three of each
        Maintenance.readPointLookupMany(s, s"$root/data", s"$root/manifest",
            "doc_id", BLOOM_LOOKUP_IDS.map(_.toString))
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      },
      Some(s"""
        SELECT doc_id, source, lang, n_chars
        FROM documents
        WHERE doc_id IN (${BLOOM_LOOKUP_IDS.mkString(", ")})""")),
    // ----------------------------------------------------------------
    Q(
      "q117_curriculum_tiers",
      "Length-curriculum ladder: ntile(4) difficulty tiers per source " +
        "under the deterministic total order (n_chars, doc_id), with " +
        "per-(source, tier) count and char bounds — the schedule table " +
        "a curriculum-ordered training run reads tier by tier. The " +
        "window partitions by source (never global), and both engines " +
        "share ntile's leading-buckets-get-the-remainder definition, " +
        "so tiers match row-for-row.",
      (s, dir) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        t(s, dir, "documents")
          .withColumn("tier", ntile(4).over(w).cast(LongType))
          .groupBy(col("source"), col("tier"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("chars_lo"),
            max(col("n_chars")).as("chars_hi"))
      },
      Some("""
        SELECT source, tier, CAST(count(*) AS BIGINT) AS n_docs,
               min(n_chars) AS chars_lo, max(n_chars) AS chars_hi
        FROM (SELECT source, n_chars, doc_id,
                     ntile(4) OVER (PARTITION BY source
                       ORDER BY n_chars ASC, doc_id ASC) AS tier
              FROM documents)
        GROUP BY source, tier""")),
    // ----------------------------------------------------------------
    Q(
      "q121_mixture_epochs",
      "Domain-mixture epoch table — the keep-everything half of q73's " +
        "rebalancing story: instead of discarding docs, each language " +
        "stratum gets an epoch MULTIPLIER in basis points toward a " +
        "uniform target mixture, weight_bp = (total div n_langs) * " +
        "10000 div cnt (under-represented strata repeat > 1x, " +
        "over-represented < 1x — the DoReMi/data-mixing input table). " +
        "The quotient order keeps every intermediate below total * " +
        "10000 (no corpus-scale product of two counts); one keyed agg " +
        "+ a 1-row broadcast, stratum-cardinality output.",
      (s, dir) => {
        val c = t(s, dir, "documents")
          .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        val tot = c.agg(sum(col("cnt")).as("total"),
          count(lit(1)).as("n_langs"))
        c.crossJoin(broadcast(tot))
          .select(col("lang"), col("cnt"),
            expr("cnt * 10000 div total").as("share_bp"),
            expr("(total div n_langs) * 10000 div cnt").as("weight_bp"))
      },
      Some("""
        WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
                   FROM documents GROUP BY lang),
        s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS n_langs FROM c)
        SELECT lang, cnt,
               cnt * 10000 // total AS share_bp,
               (total // n_langs) * 10000 // cnt AS weight_bp
        FROM c, s""")),
    // ----------------------------------------------------------------
    Q(
      "q132_hll_distinct",
      "HyperLogLog distinct-count audit — the mergeable CARDINALITY " +
        "sketch beside KMV (q69), count-min (q124), Bloom (q126) and " +
        s"KLL (q101): ${Sketches.HLL_M} 6-bit-max registers per " +
        "source, register[b] = max rho over keys hashing to bucket b, " +
        "merge = element-wise MAX (the '__all__' row is BUILT from the " +
        "per-source registers, proving shards sketch independently). " +
        "State is constant per group at any cardinality — the property " +
        "that replaces a trillion-key count(distinct) shuffle with " +
        s"${Sketches.HLL_M} integers per shard. The estimate is exact " +
        "integer arithmetic end to end: alpha as the rational " +
        s"${Sketches.HLL_ALPHA_MILLI}/1000, power sums as shifted " +
        "BIGINTs, the divide in DECIMAL(38,0)/HUGEINT, and the " +
        "small-range linear-counting table precomputed driver-side so " +
        "no query-time ln ties the result to an engine's libm. The " +
        "exact count(distinct) column is the test-scale AUDIT side " +
        "(q84/q124's sketch-vs-truth pattern), not the scale path.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val toks = docs.select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        toks.persist()
        val regsSrc = Sketches.hllRegisters(toks, "source", "tok")
        // consumed twice (union arm + the '__all__' max-merge): cache
        // the 64 x |sources| register rows so the token-stream
        // aggregation behind them runs once
        regsSrc.persist()
        val regs = regsSrc.unionByName(
          Sketches.hllMerge(regsSrc, "source", "__all__"))
        val est = Sketches.hllEstimate(regs, "source")
        val exact = toks.groupBy(col("source"))
          .agg(countDistinct(col("tok")).as("exact_distinct"))
          .unionByName(toks.agg(countDistinct(col("tok")).as("exact_distinct"))
            .select(lit("__all__").as("source"), col("exact_distinct")))
        est.join(exact, "source")
          .select(col("source"), col("exact_distinct"), col("v_empty"),
            col("s_pow"), col("est_raw_milli"), col("est_milli"),
            expr("CAST(abs(CAST(est_milli AS DECIMAL(38,0)) " +
              "- CAST(exact_distinct AS DECIMAL(38,0)) * 1000) * 10000 " +
              "div (exact_distinct * 1000) AS BIGINT)").as("err_bp"))
      },
      Some(s"""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        hh AS (
          SELECT source, ${Portable.pmd5Sql("tok")} AS h FROM toks),
        rho AS (
          SELECT source, h % ${Sketches.HLL_M} AS bucket,
                 CASE WHEN h // ${Sketches.HLL_M} = 0 THEN ${Sketches.HLL_RHO_BITS + 1}
                      ELSE ${Sketches.HLL_RHO_BITS + 1} - length(bin(h // ${Sketches.HLL_M})) END AS rho
          FROM hh),
        regs_src AS (
          SELECT source, bucket, max(rho) AS register FROM rho GROUP BY 1, 2),
        regs AS (
          SELECT source, bucket, register FROM regs_src
          UNION ALL
          SELECT '__all__' AS source, bucket, max(register) AS register
          FROM regs_src GROUP BY 2),
        srcs AS (
          SELECT DISTINCT source FROM toks UNION ALL SELECT '__all__'),
        dense AS (
          SELECT s.source, b.bucket, coalesce(r.register, 0) AS register
          FROM srcs s CROSS JOIN (SELECT unnest(range(${Sketches.HLL_M})) AS bucket) b
          LEFT JOIN regs r ON r.source = s.source AND r.bucket = b.bucket),
        agg AS (
          SELECT source,
                 CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
                 CAST(sum(CAST(1 AS BIGINT) << CAST(${Sketches.HLL_RHO_BITS + 1} - register AS INT)) AS BIGINT) AS s_pow
          FROM dense GROUP BY 1),
        est0 AS (
          SELECT source, v_empty, s_pow,
                 CAST(CAST('${Sketches.HLL_EST_NUMERATOR}' AS HUGEINT) // s_pow AS BIGINT) AS est_raw_milli
          FROM agg),
        est AS (
          SELECT source, v_empty, s_pow, est_raw_milli,
                 CASE WHEN est_raw_milli <= ${Sketches.HLL_LC_CUTOFF_MILLI} AND v_empty > 0
                      THEN ([${Sketches.HLL_LC_MILLI.mkString(", ")}])[CAST(v_empty AS INT)]
                      ELSE est_raw_milli END AS est_milli
          FROM est0),
        ex AS (
          SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
          FROM toks GROUP BY 1
          UNION ALL
          SELECT '__all__', CAST(count(DISTINCT tok) AS BIGINT) FROM toks)
        SELECT e.source, ex.exact_distinct, e.v_empty, e.s_pow,
               e.est_raw_milli, e.est_milli,
               CAST(abs(CAST(e.est_milli AS HUGEINT) - CAST(ex.exact_distinct AS HUGEINT) * 1000) * 10000
                    // (ex.exact_distinct * 1000) AS BIGINT) AS err_bp
        FROM est e JOIN ex ON e.source = ex.source""")),
    // ----------------------------------------------------------------
    Q(
      "q146_k_anonymity",
      "k-anonymity audit over quasi-identifiers — the re-identification " +
        "risk datasheet a PII review asks for before release (q92's " +
        "redaction masks direct identifiers; THIS measures what the " +
        "indirect ones still leak): customers grouped by the QI tuple " +
        "(nation, market segment, account-balance band of 1000), " +
        "every group's size k folded into the standard risk histogram " +
        "— k=1 (unique, re-identifiable), 2-4, 5-9, 10+ — with group " +
        "and row counts and each band's share of all rows in integer " +
        "basis points. Two keyed aggregations: the QI groupBy shuffles " +
        "three narrow columns (never names or payloads), the " +
        "band-cardinality histogram is a 4-row roll-up, and the total " +
        "joins back as a broadcast 1-row frame — no unpartitioned " +
        "window anywhere. The balance band is floor(acctbal/1000): " +
        "one IEEE double divide + floor, bit-identical across engines.",
      (s, dir) => {
        val g = t(s, dir, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal") / 1000.0).as("bal_band"))
          .agg(count(lit(1)).as("k"))
        val h = g
          .groupBy(when(col("k") === 1, 1L).when(col("k") <= 4, 2L)
            .when(col("k") <= 9, 5L).otherwise(10L).as("bucket_lo"))
          .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
        val tot = h.agg(sum(col("n_rows")).as("total"))
        h.crossJoin(broadcast(tot))
          .select(col("bucket_lo"),
            when(col("bucket_lo") === 1, "k=1")
              .when(col("bucket_lo") === 2, "k=2-4")
              .when(col("bucket_lo") === 5, "k=5-9")
              .otherwise("k>=10").as("k_bucket"),
            col("n_groups"), col("n_rows"),
            expr("n_rows * 10000 div total").as("rows_bp"))
          .orderBy("bucket_lo")
      },
      Some("""
        WITH g AS (
          SELECT c_nationkey, c_mktsegment,
                 floor(c_acctbal / 1000.0) AS bal_band, count(*) AS k
          FROM customer GROUP BY 1, 2, 3),
        h AS (
          SELECT CASE WHEN k = 1 THEN 1 WHEN k <= 4 THEN 2
                      WHEN k <= 9 THEN 5 ELSE 10 END AS bucket_lo,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(k) AS BIGINT) AS n_rows
          FROM g GROUP BY 1),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM h)
        SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo,
               CASE bucket_lo WHEN 1 THEN 'k=1' WHEN 2 THEN 'k=2-4'
                    WHEN 5 THEN 'k=5-9' ELSE 'k>=10' END AS k_bucket,
               n_groups, n_rows,
               n_rows * 10000 // total AS rows_bp
        FROM h, tot ORDER BY bucket_lo""")),
    // ----------------------------------------------------------------
    Q(
      "q154_l_diversity",
      "l-diversity audit — k-anonymity's (q146) necessary complement: " +
        "a large QI group still leaks when every member SHARES the " +
        "sensitive value (homogeneity attack — group size protects " +
        "identity, not attributes). Customers group by the QI pair " +
        "(nation, balance band); per group l = exact distinct count " +
        "of the sensitive market segment; the report is the l " +
        "histogram — groups, rows, and row share in integer basis " +
        "points — where l = 1 rows are fully attribute-disclosed " +
        "however large their group. Same two-aggregation shape as " +
        "q146: the QI shuffle carries (int, long, segment), the " +
        "histogram is <= 5 rows, the total broadcasts back.",
      (s, dir) => {
        val g = t(s, dir, "customer")
          .groupBy(col("c_nationkey"),
            floor(col("c_acctbal") / 1000.0).as("bal_band"))
          .agg(count(lit(1)).as("k"),
            countDistinct(col("c_mktsegment")).as("l"))
        val h = g.groupBy(col("l"))
          .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
        val tot = h.agg(sum(col("n_rows")).as("total"))
        h.crossJoin(broadcast(tot))
          .select(col("l"), col("n_groups"), col("n_rows"),
            expr("n_rows * 10000 div total").as("rows_bp"))
          .orderBy("l")
      },
      Some("""
        WITH g AS (
          SELECT c_nationkey, floor(c_acctbal / 1000.0) AS bal_band,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
          FROM customer GROUP BY 1, 2),
        h AS (
          SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(k) AS BIGINT) AS n_rows
          FROM g GROUP BY l),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM h)
        SELECT l, n_groups, n_rows, n_rows * 10000 // total AS rows_bp
        FROM h, tot ORDER BY l""")),
    // ----------------------------------------------------------------
    Q(
      "q229_coverage_select",
      "Greedy maximum-coverage corpus selection — the facility-" +
        "location data-selection recipe (pick the doc covering the " +
        "most of the feature space, then repeatedly the doc adding " +
        "the most NOT-yet-covered features): the submodular-greedy " +
        "1-1/e approximation, here the first TWO rounds so every " +
        "pick is SQL-expressible and oracled exactly (the k-round " +
        "operator loop is the BPE/q90 shape — one 1-row argmax job " +
        "per round, only the covered set carries between rounds). " +
        "Features are distinct BIGRAMS (the q61 idiom) — the unigram " +
        "vocabulary of this synthetic corpus is so small one doc " +
        "covers it entirely, the q215-class saturation the bigram " +
        "space (916 vs 95-per-doc at sf0.01) avoids, keeping round " +
        "2's marginal-gain machinery genuinely exercised. Round 1 " +
        "is an argmax over per-doc distinct-bigram counts; round 2 " +
        "anti-joins each doc's bigrams against the winner's covered " +
        "set (broadcast — one doc's features) and argmaxes the " +
        "MARGINAL gain; ties break on doc_id so both engines pick " +
        "identically. Scale: features shuffle as (doc, feature) " +
        "pairs once per round, the covered set stays broadcast-size " +
        "for small k, and nothing ever materializes pairwise doc " +
        "overlaps. Output binds picks, marginal gains and the " +
        "running covered-feature total into the gate.",
      (s, dir) => {
        val w = split(col("text"), " ")
        // persisted: the per-doc bigram-set projection is the expensive
        // stage and the plan references it from FIVE places (both
        // argmaxes, the covered set, and the output union's branches) —
        // unpersisted, each reference re-runs the concat+distinct over
        // the whole corpus (measured 14.6 s -> the cache collapses the
        // recomputes; same contract as q197's edge persist)
        // @note persists an internal projection; call
        // spark.catalog.clearCache() after the terminal action
        // spread (r16): the bigram concat+distinct projection below is
        // the query's dominant compute and documents is a single-split
        // scan at bench scale — unspread it ran on ONE core (measured
        // 38 tasks / 2.6-3.4 s; guide §2.5). No-op on multi-split scans.
        val sets = spread(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"),
          // indices1: empty (not [1,0] + element_at(w,0) crash) on a
          // 1-token doc, matching the oracle's range(1, len(w))
          array_distinct(transform(
            graft.functions.TextAnalysis.indices1(size(w) - 1),
            i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
            .as("ts")).persist()
        val p1 = sets.select(col("doc_id"),
            size(col("ts")).cast(LongType).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
        val cov1 = sets
          .join(broadcast(p1.select(col("doc_id"))), "doc_id")
          .select(explode(col("ts")).as("tok"))
        val p2 = sets.select(col("doc_id"), explode(col("ts")).as("tok"))
          .join(broadcast(cov1), Seq("tok"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
        p1.select(lit(1L).as("pick_round"), col("doc_id"), col("gain"),
            col("gain").as("covered_total"))
          .unionByName(
            p2.crossJoin(broadcast(p1.select(col("gain").as("g1"))))
              .select(lit(2L).as("pick_round"), col("doc_id"), col("gain"),
                (col("g1") + col("gain")).as("covered_total")))
      },
      Some("""
        WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sets AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1]
                                FOR i IN range(1, len(w))]) AS ts
          FROM words),
        p1 AS (
          SELECT doc_id, CAST(len(ts) AS BIGINT) AS gain
          FROM sets ORDER BY gain DESC, doc_id LIMIT 1),
        cov1 AS (
          SELECT DISTINCT unnest(s.ts) AS tok
          FROM sets s JOIN p1 USING (doc_id)),
        toks AS (SELECT doc_id, unnest(ts) AS tok FROM sets),
        g2 AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
          FROM toks WHERE tok NOT IN (SELECT tok FROM cov1)
          GROUP BY doc_id),
        p2 AS (SELECT doc_id, gain FROM g2
               ORDER BY gain DESC, doc_id LIMIT 1)
        SELECT CAST(1 AS BIGINT) AS pick_round, doc_id, gain,
               gain AS covered_total
        FROM p1
        UNION ALL
        SELECT CAST(2 AS BIGINT), p2.doc_id, p2.gain, p1.gain + p2.gain
        FROM p2, p1""")),
    // ----------------------------------------------------------------
    Q(
      "q233_hilbert_locality",
      "Hilbert-curve clustering datasheet over orders' (custkey, " +
        "order-day) plane: scale both dims to 16 bits against their " +
        "global min/max (exact integer arithmetic, the q114 z-order " +
        "scaling), map each order to its position on the order-16 " +
        "Hilbert curve with the engine's native codegen expression, " +
        "cut the curve into 256 equal position ranges (= the file " +
        "boundaries a curve-ordered rewrite would draw), and report " +
        "each range's row count and raw-dimension bounding box — the " +
        "min/max manifest a curve-clustered layout ships, whose " +
        "per-file tightness IS the data-skipping win (the curve's " +
        "continuity keeps consecutive positions grid-adjacent, so " +
        "boxes stay compact where the Z curve's power-of-two jumps " +
        "stretch them; HilbertSpec measures the file-skip difference " +
        "on the written layouts). SCALE SHAPE: one 1-row min/max " +
        "broadcast, then the curve index is a scan-stage projection " +
        "(one codegen'd expression node — the 16-round rotation loop " +
        "cannot be composed Column arithmetic without 16 chained " +
        "projections or an exponential expression tree) and the " +
        "roll-up map-side-combines to <=256 rows per task. The oracle " +
        "states the SAME rounds as 16 chained CTE steps, so the hash " +
        "match proves the native expression against a from-first-" +
        "principles SQL spelling of the public xy2d algorithm.",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_custkey").as("xv"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast(LongType).as("yv"))
        val st = o.agg(min(col("xv")).as("xmin"), max(col("xv")).as("xmax"),
          min(col("yv")).as("ymin"), max(col("yv")).as("ymax"))
        def scale(v: String, lo: String, hi: String) =
          expr(s"CAST(CAST(($v - $lo) AS DECIMAL(38,0)) * 65535" +
            s" div greatest(CAST(1 AS BIGINT), $hi - $lo) AS BIGINT)")
        val h = o.crossJoin(broadcast(st))
          .withColumn("sx", scale("xv", "xmin", "xmax"))
          .withColumn("sy", scale("yv", "ymin", "ymax"))
          .withColumn("h", graft.expressions.HilbertIndex32(s,
            col("sx"), col("sy")))
        h.withColumn("bucket", expr("h div 16777216"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("xv")).as("cust_min"), max(col("xv")).as("cust_max"),
            min(col("yv")).as("day_min"), max(col("yv")).as("day_max"))
      },
      Some {
        // the 16 xy2d rounds as chained CTE steps: each step reads the
        // PREVIOUS step's (hx, hy, hd) — references inside one SELECT
        // see the input row, so the rotation uses the pre-round values
        // exactly as the native expression does
        val rounds = (0 until 16).map { i =>
          val sBit = 1L << (15 - i)
          val prev = if (i == 0) "h0" else s"r${i - 1}"
          s"""r$i AS (
          SELECT xv, yv,
                 CASE WHEN (hy & $sBit) != 0 THEN hx
                      WHEN (hx & $sBit) != 0 THEN ${sBit - 1} - hy
                      ELSE hy END AS hx,
                 CASE WHEN (hy & $sBit) != 0 THEN hy
                      WHEN (hx & $sBit) != 0 THEN ${sBit - 1} - hx
                      ELSE hx END AS hy,
                 hd + CAST(${sBit * sBit} AS BIGINT) * xor(
                   CASE WHEN (hx & $sBit) != 0 THEN 3 ELSE 0 END,
                   CASE WHEN (hy & $sBit) != 0 THEN 1 ELSE 0 END) AS hd
          FROM $prev)"""
        }.mkString(",\n        ")
        s"""
        WITH o AS (
          SELECT o_custkey AS xv,
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT) AS yv
          FROM orders),
        st AS (
          SELECT min(xv) AS xmin, max(xv) AS xmax,
                 min(yv) AS ymin, max(yv) AS ymax
          FROM o),
        h0 AS (
          SELECT xv, yv,
                 CAST(CAST((xv - xmin) AS HUGEINT) * 65535
                      // greatest(1, xmax - xmin) AS BIGINT) AS hx,
                 CAST(CAST((yv - ymin) AS HUGEINT) * 65535
                      // greatest(1, ymax - ymin) AS BIGINT) AS hy,
                 CAST(0 AS BIGINT) AS hd
          FROM o CROSS JOIN st),
        $rounds
        SELECT hd // 16777216 AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               min(xv) AS cust_min, max(xv) AS cust_max,
               min(yv) AS day_min, max(yv) AS day_max
        FROM r15 GROUP BY 1"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q247_priority_sample",
      "Weighted sample without replacement per source via PRIORITY " +
        "SAMPLING (Duffield-Lund-Thorup): 5 docs per source drawn " +
        "with probability increasing in weight (w = n_chars), plus " +
        "the DLT subset-sum estimator est_w = max(w, tau) whose " +
        "expectations are exactly the group weight totals — the " +
        "data-mixing primitive for quality/length-weighted corpus " +
        "subsetting with an unbiased token-count estimate riding " +
        "along. Priority = w / u with u a deterministic keyed-hash " +
        "uniform — spelled as ONE IEEE division of two exactly-" +
        "representable integers (w x 2^30+1 < 2^53 over the hash+1), " +
        "so both engines produce identical bits with NO ln() anywhere " +
        "(the q52/q67 libm rule); tau is the (k+1)-th priority, NULL " +
        "(-> est_w = w exactly) for groups at or under k. SCALE " +
        "SHAPE: selection runs through the custom grouped top-k " +
        "operator (plans.TopKPerKey — per-split bounded heaps, " +
        "shuffle capped at splits x sources x (k+1) rows, no " +
        "partition sort); the rank/tau split is a window over the " +
        "ALREADY-REDUCED (k+1)-per-group survivor frame and tau " +
        "joins back on the source key.",
      (s, dir) => {
        import graft.operators.PrioritySample
        val K = 5
        val prior = PrioritySample.withPriority(
          spread(t(s, dir, "documents"), col("doc_id")),
          "source", "doc_id", "n_chars")
        PrioritySample.estimate(
          PrioritySample.topSummary(prior, "source", "doc_id", K),
          "source", "doc_id", K)
      },
      Some(s"""
        WITH p AS (
          SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
                 CAST(CAST(n_chars AS BIGINT) * ${PrioritySample.M + 1} AS DOUBLE)
                   / (${Portable.pmd5Sql("concat('pri:', CAST(doc_id AS VARCHAR))")}
                      % ${PrioritySample.M} + 1) AS priority
          FROM documents),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY source
                      ORDER BY priority DESC, doc_id ASC) AS rn
          FROM p),
        tau AS (
          SELECT source, priority AS tau FROM ranked WHERE rn = 6)
        SELECT ranked.source, doc_id, w, priority,
               greatest(CAST(w AS DOUBLE), coalesce(tau, 0.0)) AS est_w
        FROM ranked LEFT JOIN tau ON ranked.source = tau.source
        WHERE rn <= 5""")),
    // ----------------------------------------------------------------
    Q(
      "q265_dsir_weights",
      "DSIR importance weighting over hashed n-gram features (Xie et " +
        "al. 2023) — the data-selection signal the curation stack was " +
        "missing: every document scored by how much more likely its " +
        "hashed unigram+bigram stream is under the TARGET " +
        "distribution (lang = 'en', the quality-reference corpus) " +
        "than under the RAW corpus it sits in. weight_bits = signed " +
        "sum over feature instances of floor(log2(p_t(b)/p_r(b))) " +
        "with Laplace-smoothed bucket probabilities p(b) = " +
        "(c+1)/(T+B), B = 1024 portable-hash buckets — the ratio is " +
        "a ratio of INTEGER products ((ct+1)(Tr+B))/((cr+1)(Tt+B)), " +
        "so the signed floor-log2 extends q262's bitlength trick to " +
        "ratios < 1: positive side bitlength(num div den) - 1, " +
        "negative side -ceil(log2(den/num)) split by the exact-" +
        "power-of-two test (den % num = 0 and q & (q-1) = 0) — NO " +
        "floats anywhere, both engines state the arithmetic " +
        "identically (exact while (Tt+1)(Tr+B) < 2^63, ~3e9 feature " +
        "instances per side; the DECIMAL(38) restatement covers " +
        "~1e18 — see operators.Dsir). Resampling mechanics ride " +
        "q83/q136/q247; this is the weight those samplers consume. " +
        "SCALE SHAPE: text explodes ONCE into hashed instances (an " +
        "8-byte bucket travels, never the token; instance frame " +
        "persisted — it feeds both count sides and the scoring agg); " +
        "bucket counts are B-bounded aggs (map-side combine does " +
        "nearly all the work); the <= B-row weight table BROADCASTS " +
        "to the scoring join; one bounded row per document crosses " +
        "the final shuffle.",
      (s, dir) => {
        import graft.operators.Dsir
        Dsir.scoreSelf(spread(t(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", col("lang") === "en", Dsir.DefaultBuckets)
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, lang = 'en' AS tgt, string_split(text, ' ') AS ts
          FROM documents),
        uni AS (SELECT doc_id, tgt, unnest(ts) AS f FROM toks),
        bi AS (
          SELECT doc_id, tgt, ts[i] || ' ' || ts[i + 1] AS f
          FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        feats AS (
          SELECT doc_id, tgt, ${Portable.pmd5Sql("f")} % 1024 AS bucket
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        cr AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS cr
          FROM feats GROUP BY 1),
        ct AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS ct
          FROM feats WHERE tgt GROUP BY 1),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS tr,
                 CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS tt
          FROM feats),
        w AS (
          SELECT bucket,
                 ${graft.operators.Dsir.flog2DuckSql(
                   "(coalesce(ct, 0) + 1) * (tr + 1024)",
                   "(coalesce(cr, 0) + 1) * (tt + 1024)")} AS bits
          FROM cr FULL JOIN ct USING (bucket) CROSS JOIN tot)
        SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(bits) AS BIGINT) AS weight_bits
        FROM feats f JOIN w USING (bucket) GROUP BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q268_dsir_heldout",
      "Cross-batch DSIR scoring — q265's deployment shape and the " +
        "ORACLE for [[graft.streaming.DsirStream]]'s never-seen-" +
        "bucket path (the q263-to-LmStream relationship, restated " +
        "for the importance model): the bucket model trains on the " +
        "TRAINING split (doc_id >= 100) only — raw counts from all " +
        "training docs, target counts from its lang = 'en' subset — " +
        "and scores the HELD-OUT batch (doc_id < 100), the arriving-" +
        "data selection gate where q265's self-trained inner joins " +
        "cannot go. Held-out feature instances whose hash bucket the " +
        "model never saw take the fully smoothed ct = cr = 0 default " +
        "flog2(Tr+B, Tt+B) — spelled as a LEFT join with COALESCE " +
        "onto the default bits, identical on both engines, the same " +
        "signed integer floor-log2 as q265. SCALE SHAPE: q265's — " +
        "training text explodes once into 8-byte bucket ids, counts " +
        "are B-bounded aggs, the <= B-row weight table plus the " +
        "1-row totals broadcast into the eval-side scoring joins; " +
        "scoring N arriving documents never rescans training text " +
        "(DsirStream makes the same read incremental).",
      (s, dir) => {
        import graft.operators.Dsir
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val train = docs.filter(col("doc_id") >= 100)
        // persisted: feeds the raw AND target count aggregations (q67
        // cache convention; the harness frees it via clearCache)
        val tf = Dsir.featureBuckets(
          train.select(col("doc_id"), (col("lang") === "en").as("__tgt"),
            col("text")),
          "text", Dsir.DefaultBuckets, Seq("doc_id", "__tgt")).persist()
        val cr = tf.groupBy("bucket").agg(count(lit(1)).as("cr"))
        val ct = tf.filter(col("__tgt")).groupBy("bucket")
          .agg(count(lit(1)).as("ct"))
        Dsir.scoreInstances(
          Dsir.featureBuckets(docs.filter(col("doc_id") < 100),
            "text", Dsir.DefaultBuckets, Seq("doc_id")),
          "doc_id", cr, ct, Dsir.DefaultBuckets)
      },
      Some(s"""
        WITH ttoks AS (
          SELECT doc_id, lang = 'en' AS tgt, string_split(text, ' ') AS ts
          FROM documents WHERE doc_id >= 100),
        tuni AS (SELECT doc_id, tgt, unnest(ts) AS f FROM ttoks),
        tbi AS (
          SELECT doc_id, tgt, ts[i] || ' ' || ts[i + 1] AS f
          FROM ttoks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        tfeats AS (
          SELECT doc_id, tgt, ${Portable.pmd5Sql("f")} % 1024 AS bucket
          FROM (SELECT * FROM tuni UNION ALL SELECT * FROM tbi)),
        cr AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS cr
          FROM tfeats GROUP BY 1),
        ct AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS ct
          FROM tfeats WHERE tgt GROUP BY 1),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS tr,
                 CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS tt
          FROM tfeats),
        w AS (
          SELECT bucket,
                 ${graft.operators.Dsir.flog2DuckSql(
                   "(coalesce(ct, 0) + 1) * (tr + 1024)",
                   "(coalesce(cr, 0) + 1) * (tt + 1024)")} AS bits
          FROM cr FULL JOIN ct USING (bucket) CROSS JOIN tot),
        etoks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
          WHERE doc_id < 100),
        euni AS (SELECT doc_id, unnest(ts) AS f FROM etoks),
        ebi AS (
          SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS f
          FROM etoks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        efeats AS (
          SELECT doc_id, ${Portable.pmd5Sql("f")} % 1024 AS bucket
          FROM (SELECT * FROM euni UNION ALL SELECT * FROM ebi)),
        scored AS (
          SELECT e.doc_id,
                 coalesce(w.bits,
                   ${graft.operators.Dsir.flog2DuckSql(
                     "tot.tr + 1024", "tot.tt + 1024")}) AS bits
          FROM efeats e LEFT JOIN w USING (bucket) CROSS JOIN tot)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(bits) AS BIGINT) AS weight_bits
        FROM scored GROUP BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q270_dsir_resample",
      "DSIR importance RESAMPLING end-to-end — the step the paper is " +
        "actually about (q265 produces weight_bits; this consumes " +
        "them as a keep probability and reports the resampled " +
        "mixture): each document's per-feature mean log2 importance " +
        "wb_norm = floor(weight_bits / n_feats) sets keep probability " +
        "min(1, 2^wb_norm), realized with NO floats against the " +
        "standing pmd5 sampling hash (the q83/q136/q247 mechanics): " +
        "keep iff pmd5('dsirk:' || id) % 2^30 < 2^clamp(30 + wb_norm, " +
        "0, 30) — wb_norm >= 0 keeps always, each bit below halves " +
        "the probability, same id -> same draw on both engines. The " +
        "floor division is spelled via truncating division over non-" +
        "negative operands ONLY (Spark div truncates toward zero, " +
        "DuckDB // floors — they agree exactly there), so the " +
        "arithmetic is stated identically. Output: the per-source " +
        "resampled mixture — docs kept, retained bp, surviving chars " +
        "and total kept normalized weight, the numbers a mixture " +
        "designer actually reads. SCALE SHAPE: q265's scoring shape " +
        "feeds a PURE PER-ROW integer projection (no shuffle, no " +
        "state), one narrow row per doc joins back to (doc_id, " +
        "source, n_chars), and the aggregation is source-bounded.",
      (s, dir) => {
        import graft.operators.Dsir
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val kept = Dsir.resampleKeep(
          Dsir.scoreSelf(docs, "doc_id", "text", col("lang") === "en",
            Dsir.DefaultBuckets),
          "doc_id")
        kept.join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("n_chars")).otherwise(0L))
              .as("kept_chars"),
            sum(when(col("keep"), col("wb_norm")).otherwise(0L))
              .as("kept_wb_norm_sum"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            expr("n_kept * 10000 div n_docs").as("kept_bp"),
            col("kept_chars"), col("kept_wb_norm_sum"))
      },
      Some(s"""
        WITH ${dsirKeepCtes}
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
               CAST(count(*) FILTER (WHERE keep) AS BIGINT) * 10000
                 // CAST(count(*) AS BIGINT) AS kept_bp,
               CAST(coalesce(sum(d.n_chars) FILTER (WHERE keep), 0)
                 AS BIGINT) AS kept_chars,
               CAST(coalesce(sum(wb_norm) FILTER (WHERE keep), 0)
                 AS BIGINT) AS kept_wb_norm_sum
        FROM keepd JOIN documents d USING (doc_id)
        GROUP BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q271_admission_matrix",
      "The COMPOSED admission gate matrix — the four independent " +
        "deployment gates of the curation stack scored side by side " +
        "for every training document (doc_id >= 100), CurateStream's " +
        "gate FAMILY as one batch table (exact hash gate + LSH " +
        "near-dup gate + token decon + the round-13 SEMANTIC decon " +
        "gate): (1) exact-dup taint = same content " +
        "hash as an EARLIER doc (arrival order = doc_id order, the " +
        "landed-corpus-first rule the stream enforces); (2) near-dup " +
        "taint = a verified LSH pair (q28's banding + exact Jaccard " +
        "at the q160 threshold) with an earlier doc — the PAIR-BASED " +
        "batch rule, deliberately STRICTER than sequenced ingest on " +
        "near-dup CHAINS (200~201~202 with 200!~202: ingest lands " +
        "202 because tainted 201 never landed to compare against; " +
        "this matrix taints every later pair member, so its " +
        "n_admitted lower-bounds the stream's landed count — the " +
        "conservative reading a release audit wants); (3) token decon " +
        "taint = cross-set LSH candidate vs the eval suite verified " +
        "at the same Jaccard (q58/q160 stage-4 rule); (4) semantic " +
        "decon taint = embedding cosine >= the q267 threshold " +
        "against the eval suite via the SAME SRP-LSH decomposition " +
        "(probe side = training, the srpIndexMatchesAcross stream-" +
        "gate direction). Output: one row per source with each " +
        "gate's taint count and the admitted count (all four gates " +
        "clean) — the release-audit table a mixture owner signs " +
        "off. SCALE SHAPE: ONE corpus-width minhash/banding pass " +
        "and ONE tokenization pass feed gates 2 AND 3 (persisted, " +
        "the q160 discipline); gate 4 buckets the corpus-side " +
        "vectors once and shuffle-merges probes (broadcastProbes = " +
        "false — the offline-batch path; the stream twin broadcasts " +
        "its batch instead); gate flags join as narrow (doc_id) " +
        "sets; the final aggregation is source-bounded.",
      (s, dir) => {
        import graft.operators.Similarity
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val K = DedupQueries.K; val RPB = DedupQueries.RPB
        val NB = DedupQueries.NB; val JT = DedupQueries.JT
        // gate 1: exact content, earlier doc wins
        val hashed = docs.select(col("doc_id"),
          Portable.pmd5(col("text")).as("__h"))
        val dupTaint = hashed
          .join(hashed.groupBy("__h").agg(min("doc_id").as("__keeper")),
            "__h")
          .filter(col("doc_id") =!= col("__keeper")).select("doc_id")
        // gates 2+3 share ONE banding pass and ONE token pass
        val banded = Dedup.bandKeys(
          Dedup.minhashSignature(docs, "text", K, DedupQueries.SHINGLE),
          K, RPB).persist()
        val sets = docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ts")).persist()
        val ndTaint = Dedup.lshCandidates(banded, "doc_id", NB)
          .join(sets.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("ts", "ts_a"), "id_a")
          .join(sets.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("ts", "ts_b"), "id_b")
          .filter(Dedup.jaccard(col("ts_a"), col("ts_b")) >= JT)
          .select(col("id_b").as("doc_id")).distinct()
        val tokTaint = Dedup.lshCandidatesAcross(
            banded.filter(col("doc_id") >= 100),
            banded.filter(col("doc_id") < 100), "doc_id", NB)
          .select(col("id_l").as("train_id"), col("id_r").as("eval_id"))
          .join(sets.select(col("doc_id").as("train_id"),
            col("ts").as("ts_t")), "train_id")
          .join(sets.select(col("doc_id").as("eval_id"),
            col("ts").as("ts_e")), "eval_id")
          .filter(Dedup.jaccard(col("ts_t"), col("ts_e")) >= JT)
          .select(col("train_id").as("doc_id")).distinct()
        // gate 4: corpus = eval suite, probes = training (the stream-
        // gate direction; SrpIndexDeconSpec pins it == the index read)
        val e = spread(t(s, dir, "embeddings"), col("vec_id"))
        val semTaint = Similarity.srpCosineMatchesAcross(
            e.filter(col("vec_id") < 100), e.filter(col("vec_id") >= 100),
            "vec_id", "embedding", SimilarityQueries.COS_T,
            bits = SimilarityQueries.ND_BITS, dim = 64,
            tables = SimilarityQueries.ND_TABLES, broadcastProbes = false)
          .filter(col("n_matches") > 0)
          .select(col("eval_id").as("doc_id"))
        def flag(df: DataFrame, name: String) =
          df.distinct().withColumn(name, lit(1L))
        docs.filter(col("doc_id") >= 100).select(col("doc_id"), col("source"))
          .join(flag(dupTaint, "__dup"), Seq("doc_id"), "left")
          .join(flag(ndTaint, "__nd"), Seq("doc_id"), "left")
          .join(flag(tokTaint, "__tok"), Seq("doc_id"), "left")
          .join(flag(semTaint, "__sem"), Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("__dup"), lit(0L))).as("n_exact_dup"),
            sum(coalesce(col("__nd"), lit(0L))).as("n_neardup"),
            sum(coalesce(col("__tok"), lit(0L))).as("n_token_contam"),
            sum(coalesce(col("__sem"), lit(0L))).as("n_sem_contam"),
            sum(when(coalesce(col("__dup"), lit(0L)) === 0L &&
              coalesce(col("__nd"), lit(0L)) === 0L &&
              coalesce(col("__tok"), lit(0L)) === 0L &&
              coalesce(col("__sem"), lit(0L)) === 0L, 1L).otherwise(0L))
              .as("n_admitted"))
      },
      Some(s"""
        ${DedupQueries.pairsCte},
        h AS (SELECT doc_id, ${Portable.pmd5Sql("text")} AS h
              FROM documents),
        dupt AS (
          SELECT h.doc_id FROM h
          JOIN (SELECT h, min(doc_id) AS keeper FROM h GROUP BY 1) k
            USING (h)
          WHERE doc_id <> keeper),
        ndt AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
        ccand AS (
          SELECT DISTINCT l.doc_id AS train_id, r.doc_id AS eval_id
          FROM bk l JOIN bk r ON l.band = r.band AND l.key = r.key
          WHERE l.doc_id >= 100 AND r.doc_id < 100),
        tokt AS (
          SELECT DISTINCT train_id AS doc_id FROM (
            SELECT train_id,
                   CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                     / len(list_distinct(a.ts || b.ts)) AS j
            FROM ccand JOIN sets a ON ccand.train_id = a.doc_id
                       JOIN sets b ON ccand.eval_id = b.doc_id)
          WHERE j >= ${DedupQueries.JT}),
        ${SimilarityQueries.prepCte()},
        cpv AS (SELECT * FROM prep WHERE vec_id < 100),
        qpv AS (SELECT * FROM prep WHERE vec_id >= 100),
        cbk2 AS (
          ${(0 until SimilarityQueries.ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, " +
              s"${SimilarityQueries.srpSql("v", tb,
                SimilarityQueries.ND_BITS)} AS bucket FROM cpv")
            .mkString("\n          UNION ALL ")}),
        qbk2 AS (
          ${(0 until SimilarityQueries.ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, " +
              s"${SimilarityQueries.srpSql("v", tb,
                SimilarityQueries.ND_BITS)} AS bucket FROM qpv")
            .mkString("\n          UNION ALL ")}),
        scand AS (
          SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
          FROM qbk2 q JOIN cbk2 c ON q.t = c.t AND q.bucket = c.bucket),
        semt AS (
          SELECT DISTINCT qid AS doc_id FROM (
            SELECT scand.qid,
                   ${SimilarityQueries.scoreSql("q", "c")} AS score
            FROM scand JOIN qpv q ON q.vec_id = scand.qid
                       JOIN cpv c ON c.vec_id = scand.cid)
          WHERE score >= ${SimilarityQueries.COS_T})
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_exact_dup,
               CAST(count(*) FILTER (WHERE nd) AS BIGINT) AS n_neardup,
               CAST(count(*) FILTER (WHERE tok) AS BIGINT)
                 AS n_token_contam,
               CAST(count(*) FILTER (WHERE sem) AS BIGINT)
                 AS n_sem_contam,
               CAST(count(*) FILTER (WHERE NOT dup AND NOT nd
                 AND NOT tok AND NOT sem) AS BIGINT) AS n_admitted
        FROM (
          SELECT d.doc_id, d.source,
                 d.doc_id IN (SELECT doc_id FROM dupt) AS dup,
                 d.doc_id IN (SELECT doc_id FROM ndt) AS nd,
                 d.doc_id IN (SELECT doc_id FROM tokt) AS tok,
                 d.doc_id IN (SELECT doc_id FROM semt) AS sem
          FROM documents d WHERE d.doc_id >= 100)
        GROUP BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q275_recipe_matrix",
      "The FULL public-curation-recipe admission matrix — q271's four " +
        "gates extended with the recipe's five quality gates, so the " +
        "entire CurateStream gate family (ruleGate + repetitionGate + " +
        "c4Gate + termGate + bucketGate + exact + near-dup + token " +
        "decon + semantic decon) is scored " +
        "side by side for every training document (doc_id >= 100) in " +
        "ONE oracled batch table: (0) Gopher rule taint = " +
        "GopherRules.passes fails — the SAME shared statement the " +
        "stream gate filters with and q273 audits per rule; (0b) Gopher " +
        "repetition taint = GopherRules.repetitionFlags fails — q277's " +
        "shared statement, the repetitionGate's exact decision; (0c) " +
        "C4 structural page taint = C4Rules.pagePass fails — q283's " +
        "shared statement, the c4Gate's exact decision; (0d) C4 page-" +
        "TERM taint = C4Rules.termPass fails on the rare matrix " +
        "blocklist — q91's shared statement, the termGate's exact " +
        "decision; (1) CCNet " +
        "bucket taint = tail-bucket or unscorable under a FROZEN " +
        "reference LM (the eval split doc_id < 100 plays Wikipedia's " +
        "role, q274's smoothed left-join arithmetic with the splits " +
        "swapped), terciles per language via the shared " +
        "CcnetStream.bucketedOf fold (tie-to-lower, enforced support " +
        "guard); (2) exact-dup taint (earlier doc wins); (3) verified " +
        "LSH near-dup taint; (4) token decon taint vs the eval suite; " +
        "(5) semantic decon taint via SRP-LSH (probe side = training, " +
        "broadcastProbes = false — the offline-batch path). Output per " +
        "source: each gate's taint count and the all-clean admitted " +
        "count — the release-audit row a mixture owner signs off, now " +
        "covering every deployed gate. SCALE SHAPE: the rule and C4 " +
        "page gates are pure per-row projections; the LM side explodes the reference split " +
        "once (persisted, feeds both count tables) and scores via " +
        "vocabulary-keyed broadcast left joins; the boundary window " +
        "runs over the support-bounded histogram and broadcasts back; " +
        "gates 3+4 share ONE minhash/banding pass and ONE token pass " +
        "(persisted, the q160/q271 discipline); gate flags join as " +
        "narrow (doc_id) sets; the final aggregation is " +
        "source-bounded.",
      (s, dir) => {
        import graft.operators.{GopherRules, Similarity}
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val K = DedupQueries.K; val RPB = DedupQueries.RPB
        val NB = DedupQueries.NB; val JT = DedupQueries.JT
        val train = docs.filter(col("doc_id") >= 100)
        // gate 0: Gopher structural rules (shared with CurateStream)
        val ruleTaint = train.filter(!GopherRules.passes(col("text")))
          .select("doc_id")
        // gate 0b: Gopher REPETITION rules (q277's shared statement)
        val repTaint = GopherRules.repetitionFlags(train, "doc_id", "text")
          .filter(!col("rep_pass")).select("doc_id")
        // gate 0c: C4 structural page rule (q283's shared statement —
        // the SAME predicate CurateStream's c4Gate filters with)
        val c4Taint = train
          .filter(!graft.operators.C4Rules.pagePass(col("text")))
          .select("doc_id")
        // gate 0d: C4 page-TERM rule (q91's shared statement over the
        // rare matrix blocklist — the termGate's exact decision)
        val termTaint = train
          .filter(!graft.operators.C4Rules.termPass(col("text"),
            MatrixBlock))
          .select("doc_id")
        // gate 1: CCNet bucket vs the frozen reference LM
        def bigrams(d: DataFrame) = d
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .select(col("doc_id"), explode(when(size(col("ts")) >= 2,
            transform(sequence(lit(1), size(col("ts")) - 1),
              i => struct(element_at(col("ts"), i).as("w1"),
                element_at(col("ts"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
            .as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val ref = docs.filter(col("doc_id") < 100)
        // persisted: feeds the c12 AND c1 model aggregations
        val rbg = bigrams(ref).persist()
        val rc12 = rbg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val rc1 = rbg.groupBy("w1").agg(count(lit(1)).as("c1"))
        val rv = ref.select(explode(split(col("text"), " ")).as("tok"))
          .agg(countDistinct(col("tok")).as("v"))
        // persisted: the shared fold consumes perDoc three times
        val perDoc = bigrams(train)
          .join(rc12, Seq("w1", "w2"), "left")
          .join(rc1, Seq("w1"), "left")
          .crossJoin(broadcast(rv)) // one-row frame
          .select(col("doc_id"),
            (length(bin(expr(
              "(coalesce(c1, 0L) + v) div (coalesce(c12, 0L) + 1)"))) - 1)
              .cast(LongType).as("bits"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sb"))
          .select(col("doc_id"), expr("1000 * sb div n_bigrams").as("mbits"))
          .join(train.select(col("doc_id"), col("lang"), col("n_chars")),
            Seq("doc_id"))
          .persist()
        val bucketTaint = train.select(col("doc_id"))
          .join(graft.streaming.CcnetStream.bucketedOf(perDoc)
            .select(col("doc_id"), col("bucket")), Seq("doc_id"), "left")
          // unscorable (no bigrams) fails closed, like the stream gate
          .filter(col("bucket").isNull || col("bucket") === "tail")
          .select("doc_id")
        // gate 2: exact content, earlier doc wins
        val hashed = docs.select(col("doc_id"),
          Portable.pmd5(col("text")).as("__h"))
        val dupTaint = hashed
          .join(hashed.groupBy("__h").agg(min("doc_id").as("__keeper")),
            "__h")
          .filter(col("doc_id") =!= col("__keeper")).select("doc_id")
        // gates 3+4 share ONE banding pass and ONE token pass
        val banded = Dedup.bandKeys(
          Dedup.minhashSignature(docs, "text", K, DedupQueries.SHINGLE),
          K, RPB).persist()
        val sets = docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ts")).persist()
        val ndTaint = Dedup.lshCandidates(banded, "doc_id", NB)
          .join(sets.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("ts", "ts_a"), "id_a")
          .join(sets.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("ts", "ts_b"), "id_b")
          .filter(Dedup.jaccard(col("ts_a"), col("ts_b")) >= JT)
          .select(col("id_b").as("doc_id")).distinct()
        val tokTaint = Dedup.lshCandidatesAcross(
            banded.filter(col("doc_id") >= 100),
            banded.filter(col("doc_id") < 100), "doc_id", NB)
          .select(col("id_l").as("train_id"), col("id_r").as("eval_id"))
          .join(sets.select(col("doc_id").as("train_id"),
            col("ts").as("ts_t")), "train_id")
          .join(sets.select(col("doc_id").as("eval_id"),
            col("ts").as("ts_e")), "eval_id")
          .filter(Dedup.jaccard(col("ts_t"), col("ts_e")) >= JT)
          .select(col("train_id").as("doc_id")).distinct()
        // gate 5: semantic decon, stream-gate direction
        val e = spread(t(s, dir, "embeddings"), col("vec_id"))
        val semTaint = Similarity.srpCosineMatchesAcross(
            e.filter(col("vec_id") < 100), e.filter(col("vec_id") >= 100),
            "vec_id", "embedding", SimilarityQueries.COS_T,
            bits = SimilarityQueries.ND_BITS, dim = 64,
            tables = SimilarityQueries.ND_TABLES, broadcastProbes = false)
          .filter(col("n_matches") > 0)
          .select(col("eval_id").as("doc_id"))
        def flag(df: DataFrame, name: String) =
          df.distinct().withColumn(name, lit(1L))
        train.select(col("doc_id"), col("source"))
          .join(flag(ruleTaint, "__rl"), Seq("doc_id"), "left")
          .join(flag(repTaint, "__rep"), Seq("doc_id"), "left")
          .join(flag(c4Taint, "__c4"), Seq("doc_id"), "left")
          .join(flag(termTaint, "__tb"), Seq("doc_id"), "left")
          .join(flag(bucketTaint, "__bk"), Seq("doc_id"), "left")
          .join(flag(dupTaint, "__dup"), Seq("doc_id"), "left")
          .join(flag(ndTaint, "__nd"), Seq("doc_id"), "left")
          .join(flag(tokTaint, "__tok"), Seq("doc_id"), "left")
          .join(flag(semTaint, "__sem"), Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("__rl"), lit(0L))).as("n_rule_fail"),
            sum(coalesce(col("__rep"), lit(0L))).as("n_repetition"),
            sum(coalesce(col("__c4"), lit(0L))).as("n_c4_fail"),
            sum(coalesce(col("__tb"), lit(0L))).as("n_term_block"),
            sum(coalesce(col("__bk"), lit(0L))).as("n_tail_bucket"),
            sum(coalesce(col("__dup"), lit(0L))).as("n_exact_dup"),
            sum(coalesce(col("__nd"), lit(0L))).as("n_neardup"),
            sum(coalesce(col("__tok"), lit(0L))).as("n_token_contam"),
            sum(coalesce(col("__sem"), lit(0L))).as("n_sem_contam"),
            sum(when(coalesce(col("__rl"), lit(0L)) === 0L &&
              coalesce(col("__rep"), lit(0L)) === 0L &&
              coalesce(col("__c4"), lit(0L)) === 0L &&
              coalesce(col("__tb"), lit(0L)) === 0L &&
              coalesce(col("__bk"), lit(0L)) === 0L &&
              coalesce(col("__dup"), lit(0L)) === 0L &&
              coalesce(col("__nd"), lit(0L)) === 0L &&
              coalesce(col("__tok"), lit(0L)) === 0L &&
              coalesce(col("__sem"), lit(0L)) === 0L, 1L).otherwise(0L))
              .as("n_admitted"))
      },
      Some(s"""
        ${DedupQueries.pairsCte},
        h AS (SELECT doc_id, ${Portable.pmd5Sql("text")} AS h
              FROM documents),
        dupt AS (
          SELECT h.doc_id FROM h
          JOIN (SELECT h, min(doc_id) AS keeper FROM h GROUP BY 1) k
            USING (h)
          WHERE doc_id <> keeper),
        ndt AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
        ccand AS (
          SELECT DISTINCT l.doc_id AS train_id, r.doc_id AS eval_id
          FROM bk l JOIN bk r ON l.band = r.band AND l.key = r.key
          WHERE l.doc_id >= 100 AND r.doc_id < 100),
        tokt AS (
          SELECT DISTINCT train_id AS doc_id FROM (
            SELECT train_id,
                   CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                     / len(list_distinct(a.ts || b.ts)) AS j
            FROM ccand JOIN sets a ON ccand.train_id = a.doc_id
                       JOIN sets b ON ccand.eval_id = b.doc_id)
          WHERE j >= ${DedupQueries.JT}),
        ${SimilarityQueries.prepCte()},
        cpv AS (SELECT * FROM prep WHERE vec_id < 100),
        qpv AS (SELECT * FROM prep WHERE vec_id >= 100),
        cbk2 AS (
          ${(0 until SimilarityQueries.ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, " +
              s"${SimilarityQueries.srpSql("v", tb,
                SimilarityQueries.ND_BITS)} AS bucket FROM cpv")
            .mkString("\n          UNION ALL ")}),
        qbk2 AS (
          ${(0 until SimilarityQueries.ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, " +
              s"${SimilarityQueries.srpSql("v", tb,
                SimilarityQueries.ND_BITS)} AS bucket FROM qpv")
            .mkString("\n          UNION ALL ")}),
        scand AS (
          SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
          FROM qbk2 q JOIN cbk2 c ON q.t = c.t AND q.bucket = c.bucket),
        semt AS (
          SELECT DISTINCT qid AS doc_id FROM (
            SELECT scand.qid,
                   ${SimilarityQueries.scoreSql("q", "c")} AS score
            FROM scand JOIN qpv q ON q.vec_id = scand.qid
                       JOIN cpv c ON c.vec_id = scand.cid)
          WHERE score >= ${SimilarityQueries.COS_T}),
        rm AS (
          SELECT doc_id,
                 ${graft.operators.GopherRules.metricsDuckSql("text")
                   .mkString(",\n                 ")}
          FROM documents WHERE doc_id >= 100),
        rulet AS (
          SELECT doc_id FROM rm
          WHERE NOT (${graft.operators.GopherRules.rulesDuckSql
            .map(_._2).mkString(" AND ")})),
        gtoks AS (
          SELECT doc_id, CAST(len(text) AS BIGINT) AS gnc,
                 string_split(text, ' ') AS ts
          FROM documents WHERE doc_id >= 100),
        grm AS (
          SELECT doc_id, gnc, n,
                 ${Portable.pmd5Sql("g")} AS gh,
                 CAST(len(g) AS BIGINT) AS gl
          FROM (
            SELECT doc_id, gnc, nn.n AS n,
                   list_aggregate(ts[i:i+nn.n-1], 'string_agg', ' ') AS g
            FROM gtoks,
                 unnest(generate_series(1, len(ts))) AS u(i),
                 (SELECT unnest([${graft.operators.GopherRules
                   .TopGramMaxPct.map(_._1).mkString(", ")}]) AS n) AS nn
            WHERE i + nn.n - 1 <= len(ts))),
        gcnt AS (
          SELECT doc_id, n, gh, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(max(gl) AS BIGINT) AS gl,
                 CAST(max(gnc) AS BIGINT) AS gnc
          FROM grm GROUP BY 1, 2, 3),
        gpdn AS (
          SELECT doc_id, n, max(cnt * gl) AS topcov,
                 coalesce(sum(CASE WHEN cnt > 1 THEN cnt * gl END), 0)
                   AS dupcov,
                 max(gnc) AS gnc
          FROM gcnt GROUP BY 1, 2),
        rept AS (
          SELECT doc_id FROM (
            SELECT doc_id,
                   ${graft.operators.GopherRules.TopGramMaxPct
                     .map { case (n, pct) =>
                       s"coalesce(max(CASE WHEN n = $n THEN " +
                         s"topcov * 100 <= $pct * gnc END), true) AS r_top$n"
                     }.mkString(",\n                   ")},
                   coalesce(max(CASE WHEN n = ${graft.operators
                     .GopherRules.DupGramN} THEN dupcov * 100 <=
                     ${graft.operators.GopherRules.DupGramMaxPct} * gnc
                     END), true) AS r_dup3
            FROM gpdn GROUP BY 1)
          WHERE NOT (r_top2 AND r_top3 AND r_top4 AND r_dup3)),
        ${graft.operators.C4Rules.keptCtes("mx",
          "(SELECT doc_id, text FROM documents WHERE doc_id >= 100) c4s",
          "text")},
        c4t AS (
          SELECT doc_id FROM mxsent
          WHERE NOT (${graft.operators.C4Rules.pagePassSql})),
        tbt AS (
          SELECT doc_id FROM documents
          WHERE doc_id >= 100 AND NOT (${graft.operators.C4Rules
            .termPassSql("text", MatrixBlock)})),
        rtoks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
          WHERE doc_id < 100),
        rbg AS (
          SELECT ts[i] AS w1, ts[i + 1] AS w2
          FROM rtoks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        rc12 AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
          FROM rbg GROUP BY 1, 2),
        rc1 AS (
          SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM rbg GROUP BY 1),
        rv AS (
          SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
          FROM (SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE doc_id < 100)),
        strn AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
          WHERE doc_id >= 100),
        sbg AS (
          SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          FROM strn, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        perdoc AS (
          SELECT s.doc_id,
                 CAST(1000 * sum(bits) AS BIGINT) // count(*) AS mbits,
                 any_value(d.lang) AS lang
          FROM (SELECT sbg.doc_id,
                       CAST(length(printf('%b',
                         (COALESCE(rc1.c1, 0) + rv.v)
                           // (COALESCE(rc12.c12, 0) + 1))) - 1 AS BIGINT)
                         AS bits
                FROM sbg
                LEFT JOIN rc12 ON sbg.w1 = rc12.w1 AND sbg.w2 = rc12.w2
                LEFT JOIN rc1 ON sbg.w1 = rc1.w1
                CROSS JOIN rv) s
          JOIN documents d ON d.doc_id = s.doc_id
          GROUP BY s.doc_id),
        hist AS (
          SELECT lang,
                 ${graft.streaming.CcnetStream.guardDuckSql("mbits")}
                   AS mbits,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM perdoc GROUP BY lang, perdoc.mbits),
        nlang AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                  FROM perdoc GROUP BY 1),
        cum AS (
          SELECT hist.lang, mbits,
                 sum(cnt) OVER (PARTITION BY hist.lang ORDER BY mbits)
                   AS cum, n
          FROM hist JOIN nlang USING (lang)),
        bounds AS (
          SELECT lang,
                 min(CASE WHEN cum >= (n + 2) // 3 THEN mbits END) AS b1,
                 min(CASE WHEN cum >= (2 * n + 2) // 3 THEN mbits END)
                   AS b2
          FROM cum GROUP BY 1),
        buck AS (
          SELECT p.doc_id,
                 CASE WHEN mbits <= b1 THEN 'head'
                      WHEN mbits <= b2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM perdoc p JOIN bounds USING (lang)),
        buckt AS (
          SELECT d.doc_id FROM documents d LEFT JOIN buck USING (doc_id)
          WHERE d.doc_id >= 100
            AND (buck.bucket IS NULL OR buck.bucket = 'tail'))
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE rl) AS BIGINT) AS n_rule_fail,
               CAST(count(*) FILTER (WHERE rep) AS BIGINT)
                 AS n_repetition,
               CAST(count(*) FILTER (WHERE c4) AS BIGINT) AS n_c4_fail,
               CAST(count(*) FILTER (WHERE tb) AS BIGINT)
                 AS n_term_block,
               CAST(count(*) FILTER (WHERE bkt) AS BIGINT)
                 AS n_tail_bucket,
               CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_exact_dup,
               CAST(count(*) FILTER (WHERE nd) AS BIGINT) AS n_neardup,
               CAST(count(*) FILTER (WHERE tok) AS BIGINT)
                 AS n_token_contam,
               CAST(count(*) FILTER (WHERE sem) AS BIGINT)
                 AS n_sem_contam,
               CAST(count(*) FILTER (WHERE NOT rl AND NOT rep
                 AND NOT c4 AND NOT tb AND NOT bkt AND NOT dup
                 AND NOT nd AND NOT tok AND NOT sem) AS BIGINT)
                 AS n_admitted
        FROM (
          SELECT d.doc_id, d.source,
                 d.doc_id IN (SELECT doc_id FROM rulet) AS rl,
                 d.doc_id IN (SELECT doc_id FROM rept) AS rep,
                 d.doc_id IN (SELECT doc_id FROM c4t) AS c4,
                 d.doc_id IN (SELECT doc_id FROM tbt) AS tb,
                 d.doc_id IN (SELECT doc_id FROM buckt) AS bkt,
                 d.doc_id IN (SELECT doc_id FROM dupt) AS dup,
                 d.doc_id IN (SELECT doc_id FROM ndt) AS nd,
                 d.doc_id IN (SELECT doc_id FROM tokt) AS tok,
                 d.doc_id IN (SELECT doc_id FROM semt) AS sem
          FROM documents d WHERE d.doc_id >= 100)
        GROUP BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q276_resampled_mixture",
      "Per-source EPOCH WEIGHTS over the DSIR-resampled corpus — the " +
        "mixture table the resampling exists to feed (the paper's " +
        "deliverable is the resampled training mixture, not the " +
        "weights): q270's keep decision (same scoreSelf + resampleKeep " +
        "code, same integer arithmetic both engines) selects the kept " +
        "set, then q121's epoch-multiplier arithmetic prices each " +
        "source ON THAT SET — share_bp = kept_chars * 10000 div " +
        "total_kept_chars, and epoch_weight_bp = (total div n_sources) " +
        "* 10000 div kept_chars, the repeat factor toward a uniform " +
        "per-source character budget (under-represented-after-" +
        "resampling sources repeat > 1x). The quotient order keeps " +
        "every intermediate below total * 10000 — no corpus-scale " +
        "product of two counts. A source whose documents are all " +
        "resampled away has no row: nothing to schedule (source-" +
        "bounded output either way). SCALE SHAPE: q270's scoring " +
        "shape (broadcast weight table, narrow shuffles) feeds a " +
        "per-row keep projection, one narrow row per kept doc joins " +
        "back to (source, n_chars), then a source-bounded aggregation " +
        "and a 1-row broadcast.",
      (s, dir) => {
        import graft.operators.Dsir
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val kept = Dsir.resampleKeep(
            Dsir.scoreSelf(docs, "doc_id", "text", col("lang") === "en",
              Dsir.DefaultBuckets), "doc_id")
          .filter(col("keep"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            Seq("doc_id"))
        // the mixture arithmetic is Dsir.mixtureWeights — the ONE
        // statement MixtureStream's read also folds with
        Dsir.mixtureWeights(kept.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("kept_chars")))
      },
      Some(s"""
        WITH ${dsirKeepCtes},
        kept AS (
          SELECT k.doc_id, d.source, d.n_chars
          FROM keepd k JOIN documents d USING (doc_id) WHERE keep),
        c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(n_chars) AS BIGINT) AS kept_chars
          FROM kept GROUP BY 1),
        s AS (SELECT CAST(sum(kept_chars) AS BIGINT) AS total_chars,
                     CAST(count(*) AS BIGINT) AS n_sources FROM c)
        SELECT source, n_kept, kept_chars,
               kept_chars * 10000 // total_chars AS share_bp,
               (total_chars // n_sources) * 10000 // kept_chars
                 AS epoch_weight_bp
        FROM c, s""")),
    // ----------------------------------------------------------------
    Q(
      "q279_epoch_schedule",
      "The EPOCH MANIFEST a training scheduler actually reads — " +
        "q276's per-source weights closed into a concrete repeat " +
        "plan over the DSIR-resampled corpus: each source gets the " +
        "uniform character budget B = total_kept_chars div " +
        "n_sources, realized as full_epochs = B div kept_chars " +
        "complete passes plus a PARTIAL pass of tail_chars = B mod " +
        "kept_chars, and the partial pass is a DETERMINISTIC prefix " +
        "— kept documents in doc_id order, taken while the running " +
        "character total before the document is still under " +
        "tail_chars (so the last tail document may overshoot; " +
        "sched_chars reports the realized total). All integer " +
        "arithmetic, stated identically in both engines. Scoring " +
        "reads the STANDING DsirIndex model table (graft_dsirmdl_ " +
        "catalog table, stamp-rebuilt only when the corpus moves) — " +
        "the model is a training-time constant, not per-query work. " +
        "SCALE SHAPE: one feature explode + broadcast weight join " +
        "(the model table is <= 1024 rows), a per-row keep " +
        "projection, ONE cumulative window per source over the " +
        "narrow kept frame, and a source-bounded aggregation with " +
        "broadcast per-source totals.",
      (s, dir) => {
        import graft.operators.{Dsir, DsirIndex}
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val model = DsirIndex.model(s, "mix", docs, "doc_id", "text",
          col("lang") === "en")
        // persisted: feeds the per-source totals AND the cumulative
        // window (q274's perDoc convention; harness frees via clearCache)
        val kept = Dsir.resampleKeep(
            DsirIndex.scoreFromModel(docs, "doc_id", "text", model),
            "doc_id")
          .filter(col("keep"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("n_chars"))
          .persist()
        val c = kept.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("kept_chars"))
        val tot = c.agg(sum(col("kept_chars")).as("total_chars"),
          count(lit(1)).as("n_sources"))
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        val cum = kept.withColumn("cum_before",
          coalesce(sum(col("n_chars")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        // c is source-bounded, tot is one row — both broadcast
        cum.join(broadcast(c), Seq("source"))
          .crossJoin(broadcast(tot))
          .withColumn("budget_chars", expr("total_chars div n_sources"))
          .withColumn("full_epochs", expr("budget_chars div kept_chars"))
          .withColumn("tail_chars", expr("budget_chars % kept_chars"))
          .groupBy(col("source"), col("n_kept"), col("kept_chars"),
            col("budget_chars"), col("full_epochs"), col("tail_chars"))
          .agg(sum(when(col("cum_before") < col("tail_chars"), 1L)
              .otherwise(0L)).as("tail_docs"),
            coalesce(sum(when(col("cum_before") < col("tail_chars"),
              col("n_chars"))), lit(0L)).as("__tail_sched"))
          .select(col("source"), col("n_kept"), col("kept_chars"),
            col("budget_chars"), col("full_epochs"), col("tail_chars"),
            col("tail_docs"),
            (col("full_epochs") * col("kept_chars") + col("__tail_sched"))
              .as("sched_chars"))
      },
      Some(s"""
        WITH ${dsirKeepCtes},
        kept AS (
          SELECT k.doc_id, d.source, d.n_chars
          FROM keepd k JOIN documents d USING (doc_id) WHERE keep),
        c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(n_chars) AS BIGINT) AS kept_chars
          FROM kept GROUP BY 1),
        s AS (SELECT CAST(sum(kept_chars) AS BIGINT) AS total_chars,
                     CAST(count(*) AS BIGINT) AS n_sources FROM c),
        cum AS (
          SELECT source, doc_id, n_chars,
                 CAST(coalesce(sum(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
          FROM kept),
        b AS (
          SELECT c.source, n_kept, kept_chars,
                 total_chars // n_sources AS budget_chars,
                 (total_chars // n_sources) // kept_chars AS full_epochs,
                 (total_chars // n_sources) % kept_chars AS tail_chars
          FROM c, s)
        SELECT b.source, n_kept, kept_chars, budget_chars, full_epochs,
               tail_chars,
               CAST(count(*) FILTER (WHERE cum_before < tail_chars)
                 AS BIGINT) AS tail_docs,
               CAST(full_epochs * kept_chars
                 + coalesce(sum(n_chars)
                     FILTER (WHERE cum_before < tail_chars), 0)
                 AS BIGINT) AS sched_chars
        FROM b JOIN cum ON b.source = cum.source
        GROUP BY 1, 2, 3, 4, 5, 6""")),
    // ----------------------------------------------------------------
    Q(
      "q280_mixture_from_model",
      "q276's mixture table scored from the STANDING model — the " +
        "deployment form of the resampled-mixture query: q276 " +
        "retrains the DSIR bucket counts inline every run (correct, " +
        "but the model is a per-corpus-generation constant), while " +
        "this query reads the persisted DsirIndex catalog table " +
        "(graft_dsirmdl_mix: one row per feature bucket, cr/ct " +
        "counts, stamp-rebuilt only when the corpus fingerprint " +
        "moves) and must produce the IDENTICAL mixture — the oracle " +
        "is q276's from-scratch restatement, so the hash match " +
        "proves standing-model scoring == inline training, the " +
        "freshness contract a scheduler depends on. SCALE SHAPE: " +
        "the corpus explodes into hashed features exactly once " +
        "(scoring only — the training counts are a <= 1024-row " +
        "table scan that BROADCASTS into the weight join), then " +
        "q276's narrow keep projection, source-bounded aggregation " +
        "and 1-row broadcast.",
      (s, dir) => {
        import graft.operators.{Dsir, DsirIndex}
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val model = DsirIndex.model(s, "mix", docs, "doc_id", "text",
          col("lang") === "en")
        val kept = Dsir.resampleKeep(
            DsirIndex.scoreFromModel(docs, "doc_id", "text", model),
            "doc_id")
          .filter(col("keep"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            Seq("doc_id"))
        // the mixture arithmetic is Dsir.mixtureWeights — the ONE
        // statement MixtureStream's read also folds with
        Dsir.mixtureWeights(kept.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("kept_chars")))
      },
      Some(s"""
        WITH ${dsirKeepCtes},
        kept AS (
          SELECT k.doc_id, d.source, d.n_chars
          FROM keepd k JOIN documents d USING (doc_id) WHERE keep),
        c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(n_chars) AS BIGINT) AS kept_chars
          FROM kept GROUP BY 1),
        s AS (SELECT CAST(sum(kept_chars) AS BIGINT) AS total_chars,
                     CAST(count(*) AS BIGINT) AS n_sources FROM c)
        SELECT source, n_kept, kept_chars,
               kept_chars * 10000 // total_chars AS share_bp,
               (total_chars // n_sources) * 10000 // kept_chars
                 AS epoch_weight_bp
        FROM c, s""")),
    // ----------------------------------------------------------------
    Q(
      "q282_resampled_temperature",
      "Temperature-scaled mixture weights ON the DSIR-resampled " +
        "corpus — q177's T = 2 recipe (weight proportional to " +
        "sqrt(share), the multilingual upsampling that boosts rare " +
        "strata less aggressively than q276's uniform budget) " +
        "composed with q270's keep decision: shares are computed " +
        "over KEPT characters, so the temperature smooths what the " +
        "importance resampling actually shipped, not the raw corpus. " +
        "Engine-exact throughout (q177's argument): shares are " +
        "integer parts-per-1e8 with the count product in " +
        "DECIMAL(38,0), sqrt of an exact integer-valued double is " +
        "IEEE correctly rounded, floor and the bp normalization are " +
        "integers. Scoring reads the STANDING DsirIndex model (the " +
        "q280 path — the model is a per-generation constant). SCALE " +
        "SHAPE: one feature explode + broadcast weight join, a " +
        "narrow keep projection, a source-bounded aggregation, two " +
        "1-row broadcasts — nothing grows with the corpus after the " +
        "scoring pass.",
      (s, dir) => {
        import graft.operators.{Dsir, DsirIndex}
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val model = DsirIndex.model(s, "mix", docs, "doc_id", "text",
          col("lang") === "en")
        val kept = Dsir.resampleKeep(
            DsirIndex.scoreFromModel(docs, "doc_id", "text", model),
            "doc_id")
          .filter(col("keep"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            Seq("doc_id"))
        val c = kept.groupBy(col("source"))
          .agg(sum(col("n_chars")).as("kept_chars"))
        val tot = c.agg(sum(col("kept_chars")).as("total_chars"))
        val w = c.crossJoin(broadcast(tot))
          .withColumn("share_e8", expr("CAST(CAST(kept_chars AS " +
            s"DECIMAL(38,0)) * $MIX_SHARE_E8 div total_chars AS BIGINT)"))
          .withColumn("w",
            floor(sqrt(col("share_e8").cast(DoubleType))).cast(LongType))
        val ws = w.agg(sum(col("w")).as("wsum"))
        w.crossJoin(broadcast(ws))
          .select(col("source"), col("kept_chars"), col("share_e8"),
            col("w").as("sqrt_share_e4"),
            expr("w * 10000 div wsum").as("weight_bp"))
      },
      Some(s"""
        WITH ${dsirKeepCtes},
        kept AS (
          SELECT k.doc_id, d.source, d.n_chars
          FROM keepd k JOIN documents d USING (doc_id) WHERE keep),
        c AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS kept_chars
          FROM kept GROUP BY 1),
        s AS (SELECT CAST(sum(kept_chars) AS BIGINT) AS total_chars
              FROM c),
        tw AS (
          SELECT source, kept_chars,
                 CAST(CAST(kept_chars AS HUGEINT) * $MIX_SHARE_E8
                   // total_chars AS BIGINT) AS share_e8,
                 CAST(floor(sqrt(CAST(CAST(CAST(kept_chars AS HUGEINT)
                   * $MIX_SHARE_E8 // total_chars AS BIGINT) AS DOUBLE)))
                   AS BIGINT) AS tws
          FROM c CROSS JOIN s),
        ws AS (SELECT CAST(sum(tws) AS BIGINT) AS wsum FROM tw)
        SELECT source, kept_chars, share_e8, tws AS sqrt_share_e4,
               CAST(tws * 10000 // wsum AS BIGINT) AS weight_bp
        FROM tw CROSS JOIN ws""")),
    // ----------------------------------------------------------------
    Q(
      "q288_token_epoch_schedule",
      "q279's epoch manifest restated in TRAINING TOKENS — the unit a " +
        "scheduler actually budgets (q279 budgets characters; a " +
        "tokenizer changes per-source costs non-uniformly, so the " +
        "token plan is NOT a rescaling of the char plan): the two " +
        "standing models COMPOSED — each kept document (DSIR " +
        "resample against the frozen graft_dsirmdl_ table, q280's " +
        "path) is priced in BPE tokens under the frozen BpeIndex " +
        "merge table (q286's map join), and the uniform TOKEN budget " +
        "B = total_kept_tokens div n_sources closes into full_epochs " +
        "+ a deterministic doc_id-ordered partial pass exactly as " +
        "q279 does for characters. All integer arithmetic; both " +
        "models are stamp-guarded per-generation constants, and the " +
        "oracle retrains BOTH from scratch, so the hash match proves " +
        "the composed standing-model path == inline end to end. " +
        "SCALE SHAPE: one feature explode + broadcast weight join " +
        "(DSIR), one exploded-word map join against the tokenized " +
        "vocab (BPE), ONE cumulative window per source over narrow " +
        "(doc_id, source, tok) rows, source-bounded aggregation with " +
        "broadcast totals.",
      (s, dir) => {
        import graft.operators.{Bpe, BpeIndex, Dsir, DsirIndex}
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val model = DsirIndex.model(s, "mix", docs, "doc_id", "text",
          col("lang") === "en")
        val merges = BpeIndex.mergeList(s, "docs", docs, "doc_id", "text")
        val tv = Bpe.tokenizedVocab(docs, "text", merges)
          .select(col("word"), size(col("form")).cast(LongType).as("ntok"))
        val ptok = docs.select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("word"))
          .join(tv, Seq("word"))
          .groupBy(col("doc_id"), col("source"))
          .agg(sum(col("ntok")).as("tok"))
        // persisted: feeds the per-source totals AND the cumulative
        // window (q279's kept convention; harness frees via clearCache)
        val kept = Dsir.resampleKeep(
            DsirIndex.scoreFromModel(docs, "doc_id", "text", model),
            "doc_id")
          .filter(col("keep"))
          .join(ptok, Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("tok"))
          .persist()
        val c = kept.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("kept_tokens"))
        val tot = c.agg(sum(col("kept_tokens")).as("total_tokens"),
          count(lit(1)).as("n_sources"))
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        val cum = kept.withColumn("cum_before",
          coalesce(sum(col("tok")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        cum.join(broadcast(c), Seq("source"))
          .crossJoin(broadcast(tot))
          .withColumn("budget_tokens", expr("total_tokens div n_sources"))
          .withColumn("full_epochs", expr("budget_tokens div kept_tokens"))
          .withColumn("tail_tokens", expr("budget_tokens % kept_tokens"))
          .groupBy(col("source"), col("n_kept"), col("kept_tokens"),
            col("budget_tokens"), col("full_epochs"), col("tail_tokens"))
          .agg(sum(when(col("cum_before") < col("tail_tokens"), 1L)
              .otherwise(0L)).as("tail_docs"),
            coalesce(sum(when(col("cum_before") < col("tail_tokens"),
              col("tok"))), lit(0L)).as("__tail_sched"))
          .select(col("source"), col("n_kept"), col("kept_tokens"),
            col("budget_tokens"), col("full_epochs"), col("tail_tokens"),
            col("tail_docs"),
            (col("full_epochs") * col("kept_tokens") + col("__tail_sched"))
              .as("sched_tokens"))
      },
      Some(s"""
        WITH ${dsirKeepCtes},
        ${graft.operators.Bpe.trainCtes("documents",
          graft.operators.Bpe.Rounds)},
        btv AS (
          SELECT word, CAST(len(form) AS BIGINT) AS ntok
          FROM v${graft.operators.Bpe.Rounds}),
        ptok AS (
          SELECT doc_id, source, CAST(sum(ntok) AS BIGINT) AS tok
          FROM (SELECT doc_id, source,
                       unnest(string_split(text, ' ')) AS word
                FROM documents) w
          JOIN btv USING (word)
          GROUP BY 1, 2),
        tkept AS (
          SELECT k.doc_id, p.source, p.tok
          FROM keepd k JOIN ptok p USING (doc_id) WHERE keep),
        tc AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(tok) AS BIGINT) AS kept_tokens
          FROM tkept GROUP BY 1),
        tts AS (SELECT CAST(sum(kept_tokens) AS BIGINT) AS total_tokens,
                       CAST(count(*) AS BIGINT) AS n_sources FROM tc),
        tcum AS (
          SELECT source, doc_id, tok,
                 CAST(coalesce(sum(tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
          FROM tkept),
        tb AS (
          SELECT tc.source, n_kept, kept_tokens,
                 total_tokens // n_sources AS budget_tokens,
                 (total_tokens // n_sources) // kept_tokens AS full_epochs,
                 (total_tokens // n_sources) % kept_tokens AS tail_tokens
          FROM tc, tts)
        SELECT tb.source, n_kept, kept_tokens, budget_tokens, full_epochs,
               tail_tokens,
               CAST(count(*) FILTER (WHERE cum_before < tail_tokens)
                 AS BIGINT) AS tail_docs,
               CAST(full_epochs * kept_tokens
                 + coalesce(sum(tok)
                     FILTER (WHERE cum_before < tail_tokens), 0)
                 AS BIGINT) AS sched_tokens
        FROM tb JOIN tcum ON tb.source = tcum.source
        GROUP BY 1, 2, 3, 4, 5, 6"""))
  )
}
