package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.queries.Tables.{spread, t}

/** Corpus-profiling / selection queries (q177+): temperature-scaled
  * mixture weights, token-budget selection, concurrency sweep-lines,
  * positional phrase retrieval, winsorized datasheet stats, per-node
  * graph clustering — the layer that turns the dedup/quality signals
  * into concrete data-selection decisions.
  *
  * Shared design rules (same as the rest of the registry): exact
  * integer/decimal accumulation wherever a sum crosses a shuffle;
  * doubles appear only in final scalar formulas whose operands are
  * already exact and whose operations (sqrt, one division) are
  * IEEE-correctly-rounded, so results are bit-identical across
  * engines; no unpartitioned windows over unbounded input; joins
  * keyed on narrow columns only.
  */
object ProfilingQueries {

  /** q177: share scale — shares are carried as integer parts-per-1e8
    * so their square roots land on the 1e4 (basis-point) scale. */
  private val SHARE_E8 = 100000000L
  // HRW shard-score modulus (2^50): packed as (hash % P50)*16 + shard,
  // max 2^54 — overflow-free BIGINT. Interpolated into the oracle SQL
  // (never hand-copied — the q270-modulus rule).
  private val P50 = 1L << 50

  /** q178: per-source token budget. Sized so the greedy selection is a
    * real cut at every test SF (keeps ~40-80% of each source). */
  private val BUDGET_TOKENS = 1000L

  /** q179: width of the activity window each event opens, seconds. */
  private val CONC_WINDOW_SECS = 300

  /** q180: the phrase searched for, in order. Chosen from the testdata
    * vocabulary so the query returns hits at every SF. */
  private val PHRASE = Seq("slow", "hash", "batch")

  /** q180: result rows returned. */
  private val PHRASE_K = 20

  /** q238: Benford expected first-digit shares, exact basis points
    * (floor of log10(1 + 1/d) * 1e4 for d = 1..9) — literals, so both
    * engines share the identical table with no transcendental calls. */
  private val BENFORD_BP = Seq(3010L, 1760L, 1249L, 969L, 791L, 669L,
    579L, 511L, 457L)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q177_temperature_mix",
      "Temperature-scaled mixture weights (T = 2, i.e. p^(1/2)) per " +
        "language — the multilingual-training recipe that upsamples " +
        "rare languages less aggressively than q121's uniform target: " +
        "weight proportional to sqrt(share). Every step is engine-" +
        "exact: shares are integer parts-per-1e8 (the count product " +
        "runs in DECIMAL(38,0) so a trillion-doc stratum cannot wrap " +
        "Long), sqrt of an exact integer-valued double is IEEE " +
        "correctly rounded, and the final normalization is integer " +
        "basis points. One map-side-combined count per stratum, then " +
        "arithmetic on a languages-row frame — two 1-row broadcast " +
        "joins, nothing that grows with the corpus.",
      (s, dir) => {
        val c = t(s, dir, "documents")
          .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        val tot = c.agg(sum(col("cnt")).as("total"))
        val w = c.crossJoin(broadcast(tot))
          .withColumn("share_e8",
            expr(s"CAST(CAST(cnt AS DECIMAL(38,0)) * $SHARE_E8 div total AS BIGINT)"))
          .withColumn("w",
            floor(sqrt(col("share_e8").cast(DoubleType))).cast(LongType))
        val ws = w.agg(sum(col("w")).as("wsum"))
        w.crossJoin(broadcast(ws))
          .select(col("lang"), col("cnt"), col("share_e8"),
            col("w").as("sqrt_share_e4"),
            expr("w * 10000 div wsum").as("weight_bp"))
      },
      Some(s"""
        WITH c AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        w AS (
          SELECT lang, cnt,
                 CAST(CAST(cnt AS HUGEINT) * $SHARE_E8 // total AS BIGINT) AS share_e8,
                 CAST(floor(sqrt(CAST(CAST(CAST(cnt AS HUGEINT) * $SHARE_E8 // total AS BIGINT) AS DOUBLE))) AS BIGINT) AS w
          FROM c CROSS JOIN tot),
        ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM w)
        SELECT lang, cnt, share_e8, w AS sqrt_share_e4,
               CAST(w * 10000 // wsum AS BIGINT) AS weight_bp
        FROM w CROSS JOIN ws""")),
    // ----------------------------------------------------------------
    Q(
      "q178_token_budget",
      "Greedy token-budget selection: each source spends a fixed " +
        s"$BUDGET_TOKENS-token budget on its docs in descending " +
        "vocabulary-richness order (distinct-token count, doc_id " +
        "ties) — a doc is kept iff the running token total THROUGH it " +
        "fits the budget. The selection scan is one source-partitioned " +
        "running-sum window (never global), so each stratum selects " +
        "independently and in parallel; output is per-source kept/" +
        "total counts and integer basis-point coverage (the kept-sum " +
        "product runs in DECIMAL(38,0) — a petatoken stratum cannot " +
        "wrap Long).",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast(LongType)
            .as("n_distinct"))
        val r = d.withColumn("run", sum(col("n_tokens")).over(
          Window.partitionBy(col("source"))
            .orderBy(col("n_distinct").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tots = d.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("total_tokens"),
            count(lit(1)).as("total_docs"))
        r.join(tots, "source")
          .groupBy(col("source"), col("total_docs"), col("total_tokens"))
          .agg(
            sum(when(col("run") <= BUDGET_TOKENS, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("run") <= BUDGET_TOKENS, col("n_tokens")).otherwise(0L))
              .as("tokens_kept"))
          .select(col("source"), col("total_docs"), col("total_tokens"),
            col("n_kept"), col("tokens_kept"),
            expr("CAST(CAST(tokens_kept AS DECIMAL(38,0)) * 10000" +
              " div total_tokens AS BIGINT)").as("coverage_bp"))
      },
      Some(s"""
        WITH d AS (
          SELECT source, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
          FROM documents),
        r AS (
          SELECT source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY n_distinct DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS run
          FROM d),
        tots AS (
          SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(count(*) AS BIGINT) AS total_docs
          FROM d GROUP BY 1)
        SELECT source, total_docs, total_tokens,
               CAST(count(*) FILTER (WHERE run <= $BUDGET_TOKENS) AS BIGINT) AS n_kept,
               CAST(coalesce(sum(n_tokens) FILTER (WHERE run <= $BUDGET_TOKENS), 0) AS BIGINT) AS tokens_kept,
               CAST(CAST(coalesce(sum(n_tokens) FILTER (WHERE run <= $BUDGET_TOKENS), 0) AS HUGEINT) * 10000 // total_tokens AS BIGINT) AS coverage_bp
        FROM r JOIN tots USING (source)
        GROUP BY source, total_docs, total_tokens""")),
    // ----------------------------------------------------------------
    Q(
      "q179_daily_peak_load",
      "Daily peak concurrency by sweep-line: every event opens a " +
        s"$CONC_WINDOW_SECS-second activity window; the day's peak is " +
        "the maximum number of simultaneously-open windows among " +
        "those that STARTED that day (so no cross-day carry state). " +
        "Each event becomes a +1 point at its start and a -1 at its " +
        "end; a day-partitioned running sum over (time, delta) order " +
        "— ends sort before starts at the same instant, the half-open " +
        "[s, e) convention — and its max is the peak. The max is " +
        "order-insensitive within equal (time, delta) ties (a run of " +
        "-1s only descends, a run of +1s peaks at its end), so the " +
        "result is deterministic under any partitioning. Day " +
        "partitions bound the window state; a day too large for one " +
        "task splits into hour shards plus one bounded carry-in count " +
        "per shard boundary — same sweep, same answer.",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("ts"))
        val pts = ev.select(col("day"), col("ts").as("tp"), lit(1L).as("delta"))
          .unionAll(ev.select(col("day"),
            (col("ts") + expr(s"INTERVAL $CONC_WINDOW_SECS SECONDS")).as("tp"),
            lit(-1L).as("delta")))
        pts.withColumn("run", sum(col("delta")).over(
            Window.partitionBy(col("day")).orderBy(col("tp"), col("delta"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("day"))
          .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_windows"),
            max(col("run")).as("peak"))
      },
      Some(s"""
        WITH pts AS (
          SELECT CAST(ts AS DATE) AS day, ts AS tp, CAST(1 AS BIGINT) AS delta
          FROM events
          UNION ALL
          SELECT CAST(ts AS DATE) AS day,
                 ts + INTERVAL $CONC_WINDOW_SECS SECOND AS tp,
                 CAST(-1 AS BIGINT) AS delta
          FROM events),
        sw AS (
          SELECT day, delta,
                 sum(delta) OVER (PARTITION BY day ORDER BY tp, delta
                   ROWS UNBOUNDED PRECEDING) AS run
          FROM pts)
        SELECT day,
               CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_windows,
               CAST(max(run) AS BIGINT) AS peak
        FROM sw GROUP BY day""")),
    // ----------------------------------------------------------------
    Q(
      "q180_phrase_search",
      "Exact phrase retrieval ('" + PHRASE.mkString(" ") + "') over a " +
        "POSITIONAL inverted index — the adjacency signal q107's " +
        "bag-of-terms AND-search structurally misses. Tokens carry " +
        "their in-document position; the phrase is three postings " +
        "joins on (doc_id, pos) with the later terms' positions " +
        "shifted back, so only the phrase terms' postings — a " +
        "per-term sliver of the corpus — ever leave the scan. " +
        "Positions are RELATIVE in the join (pos+1, pos+2), so the " +
        "0- vs 1-based explode bases of the two engines cancel. Top " +
        s"$PHRASE_K by occurrence count under a total order. At " +
        "corpus scale the tokenize-and-filter scan is replaced by " +
        "q51's postings table keyed (token, doc_id, pos) — same " +
        "join, no rescan.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val tk = docs
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(col("tok").isin(PHRASE: _*))
          .persist()
        val a = tk.filter(col("tok") === PHRASE(0))
          .select(col("doc_id"), col("pos"))
        val b = tk.filter(col("tok") === PHRASE(1))
          .select(col("doc_id").as("doc_b"), (col("pos") - 1).as("pos_b"))
        val c = tk.filter(col("tok") === PHRASE(2))
          .select(col("doc_id").as("doc_c"), (col("pos") - 2).as("pos_c"))
        a.join(b, col("doc_id") === col("doc_b") && col("pos") === col("pos_b"))
          .join(c, col("doc_id") === col("doc_c") && col("pos") === col("pos_c"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
          .orderBy(col("n_occ").desc, col("doc_id"))
          .limit(PHRASE_K)
      },
      Some(s"""
        WITH tk AS (
          SELECT doc_id, i AS pos, arr[i] AS tok
          FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
               unnest(generate_series(1, len(arr))) u(i)
          WHERE arr[i] IN (${PHRASE.mkString("'", "', '", "'")}))
        SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        FROM tk a
        JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                 AND b.tok = '${PHRASE(1)}'
        JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
                 AND c.tok = '${PHRASE(2)}'
        WHERE a.tok = '${PHRASE(0)}'
        GROUP BY 1 ORDER BY n_occ DESC, a.doc_id LIMIT $PHRASE_K""")),
    // ----------------------------------------------------------------
    Q(
      "q181_winsorized_stats",
      "Winsorized per-source token-length datasheet: exact type-1 " +
        "p10/p90 clips (q85's rank-selection machinery) and the mean " +
        "after clipping outliers to them — the robust location " +
        "estimate a truncation budget should be set from (a handful " +
        "of megadocs can drag the raw mean past p90). Integer " +
        "throughout: clips and sums are BIGINT, and the only double " +
        "is the final one-division mean of two exact integers — " +
        "bit-identical on both engines. One source-partitioned rank " +
        "window, then a broadcast-size per-source clip dim joined " +
        "back for one more aggregation pass.",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_tokens"), col("doc_id"))
        val qs = d.withColumn("rn", row_number().over(w).cast(LongType))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("source"))))
          .groupBy(col("source"))
          .agg(
            max(when(col("rn") === expr("(n*10 + 99) div 100"),
              col("n_tokens"))).as("lo_clip"),
            max(when(col("rn") === expr("(n*90 + 99) div 100"),
              col("n_tokens"))).as("hi_clip"))
        d.join(broadcast(qs), "source")
          .groupBy(col("source"), col("lo_clip"), col("hi_clip"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("raw_sum"),
            sum(least(greatest(col("n_tokens"), col("lo_clip")),
              col("hi_clip"))).as("wins_sum"))
          .select(col("source"), col("n_docs"), col("lo_clip"), col("hi_clip"),
            col("raw_sum"), col("wins_sum"),
            (col("wins_sum").cast(DoubleType) / col("n_docs")).as("wins_mean"))
      },
      Some("""
        WITH d AS (
          SELECT source, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        r AS (
          SELECT source, n_tokens,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_tokens, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM d),
        qs AS (
          SELECT source,
                 max(CASE WHEN rn = (n*10 + 99) // 100 THEN n_tokens END) AS lo_clip,
                 max(CASE WHEN rn = (n*90 + 99) // 100 THEN n_tokens END) AS hi_clip
          FROM r GROUP BY source, n)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, lo_clip, hi_clip,
               CAST(sum(n_tokens) AS BIGINT) AS raw_sum,
               CAST(sum(least(greatest(n_tokens, lo_clip), hi_clip)) AS BIGINT) AS wins_sum,
               CAST(sum(least(greatest(n_tokens, lo_clip), hi_clip)) AS DOUBLE)
                 / count(*) AS wins_mean
        FROM d JOIN qs ON d.source = qs.source
        GROUP BY d.source, lo_clip, hi_clip""")),
    // ----------------------------------------------------------------
    Q(
      "q182_clustering_coeff",
      "Per-node clustering coefficient over the SimHash near-dup " +
        "graph (q49's Hamming<=3 edges) — q75's global triangle " +
        "census localized: a node whose neighborhood closes into " +
        "triangles sits INSIDE a template cluster; an open star is a " +
        "hub linking unrelated near-dups. Triangles enumerate by " +
        "q75's edge-iterator (sorted out-neighbor lists, one " +
        "array-intersect per edge — wedges never materialize), then " +
        "each triangle credits its three corners; the coefficient is " +
        "integer basis points of closed wedges, so every engine " +
        "emits identical rows. Work is edges x intersect; memory is " +
        "bounded by max out-degree (production caps hub degrees " +
        "first, as q75 documents).",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sigs = docs.select(col("doc_id"),
          Dedup.simhash(s, col("text")).as("sig"))
        val e = Dedup.simhashHammingPairs(sigs, "doc_id", "sig",
          maxHamming = 3, bands = 4, bandBits = 15)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .persist()
        val adj = e.groupBy(col("a"))
          .agg(sort_array(collect_list(col("b"))).as("nbrs"))
        // triangle (a < b < c): c ranges over N+(a) ∩ N+(b) at edge (a,b)
        val tri = e
          .join(adj.select(col("a").as("u"), col("nbrs").as("na")),
            col("a") === col("u"))
          .join(adj.select(col("a").as("v"), col("nbrs").as("nb")),
            col("b") === col("v"))
          .select(col("a"), col("b"),
            explode(array_intersect(col("na"), col("nb"))).as("c"))
        val tcnt = tri.select(col("a").as("v"))
          .unionAll(tri.select(col("b").as("v")))
          .unionAll(tri.select(col("c").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("tri"))
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("degree"))
        deg.filter(col("degree") >= 2)
          .join(tcnt, Seq("v"), "left")
          .withColumn("n_triangles", coalesce(col("tri"), lit(0L)))
          .select(col("v").as("doc_id"), col("degree"), col("n_triangles"),
            expr("n_triangles * 10000 div (degree * (degree - 1) div 2)")
              .as("closed_bp"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 60), j ->
                   CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0
                        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
          FROM (SELECT doc_id,
                       list_transform(list_distinct(string_split(text, ' ')),
                                      tk -> ${graft.functions.Portable.pmd5Sql("tk")}) AS hs
                FROM documents)),
        bk AS (
          ${(0 until 4).map(b =>
            s"SELECT doc_id, sig, $b AS band, (sig >> ${b * 15}) & 32767 AS key FROM sh")
            .mkString("\n          UNION ALL ")}),
        e AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
          WHERE bit_count(xor(l.sig, r.sig)) <= 3),
        tri AS (
          SELECT e1.a, e1.b, e2.b AS c
          FROM e e1 JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        tcnt AS (
          SELECT v, CAST(count(*) AS BIGINT) AS tri
          FROM (SELECT a AS v FROM tri UNION ALL
                SELECT b FROM tri UNION ALL
                SELECT c FROM tri)
          GROUP BY 1),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS degree
          FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
          GROUP BY 1)
        SELECT deg.v AS doc_id, degree,
               CAST(coalesce(tri, 0) AS BIGINT) AS n_triangles,
               CAST(coalesce(tri, 0) * 10000 // (degree * (degree - 1) // 2) AS BIGINT) AS closed_bp
        FROM deg LEFT JOIN tcnt ON deg.v = tcnt.v
        WHERE degree >= 2""")),
    // ----------------------------------------------------------------
    Q(
      "q183_trailing_week",
      "Trailing-7-day revenue per order priority through a RANGE " +
        "window frame — the time-keyed frame ROWS frames cannot " +
        "express (a missing day must still count toward the week: the " +
        "frame is value-bounded, not row-bounded). The window input " +
        "is the PRE-AGGREGATED (priority, day) frame — bounded at " +
        "priorities x calendar days rows at any corpus scale, so the " +
        "per-priority partition holds a few thousand rows where the " +
        "raw orders would be billions; the heavy lifting is the one " +
        "map-side-combined daily aggregation. Money sums in " +
        "DECIMAL(12,2) partials, cast to double only at output.",
      (s, dir) => {
        val dec12 = DecimalType(12, 2)
        val d = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("priority"),
            to_date(col("o_orderdate")).as("day"))
          .agg(sum(col("o_totalprice").cast(dec12)).as("day_rev"))
        val w = Window.partitionBy(col("priority"))
          .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
          .rangeBetween(-6, 0)
        d.withColumn("week_rev", sum(col("day_rev")).over(w))
          .select(col("priority"), col("day"),
            col("day_rev").cast(DoubleType).as("day_revenue"),
            col("week_rev").cast(DoubleType).as("trailing7_revenue"))
      },
      Some("""
        WITH d AS (
          SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
                 sum(CAST(o_totalprice AS DECIMAL(12,2))) AS day_rev
          FROM orders GROUP BY 1, 2)
        SELECT priority, day, CAST(day_rev AS DOUBLE) AS day_revenue,
               CAST(sum(day_rev) OVER (PARTITION BY priority ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS trailing7_revenue
        FROM d""")),
    // ----------------------------------------------------------------
    Q(
      "q184_unpivot_measures",
      "UNPIVOT (wide-to-long melt) of lineitem's four measure columns " +
        "into (measure, value) rows with per-(returnflag, measure) " +
        "count / sum / mean — the reshape every per-metric datasheet " +
        "needs. Spark's stack() explodes the four measures inside the " +
        "scan projection, so the table is read ONCE (the SQL " +
        "formulation is a 4-way self-union — four scans — and serves " +
        "as the oracle precisely because the answers must agree). " +
        "Values quantize to DECIMAL(12,2) before any sum crosses a " +
        "shuffle; the mean is one exact-integer division in doubles.",
      (s, dir) => {
        val m = t(s, dir, "lineitem").select(col("l_returnflag"),
          expr("stack(4, " +
            "'quantity', CAST(l_quantity AS DECIMAL(12,2)), " +
            "'extendedprice', CAST(l_extendedprice AS DECIMAL(12,2)), " +
            "'discount', CAST(l_discount AS DECIMAL(12,2)), " +
            "'tax', CAST(l_tax AS DECIMAL(12,2))) AS (measure, value)"))
        m.groupBy(col("l_returnflag"), col("measure"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_d"))
          .select(col("l_returnflag"), col("measure"), col("n"),
            col("sum_d").cast(DoubleType).as("total"),
            (col("sum_d").cast(DoubleType) / col("n")).as("avg_value"))
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag, 'quantity' AS measure,
                 CAST(l_quantity AS DECIMAL(12,2)) AS value FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'extendedprice',
                 CAST(l_extendedprice AS DECIMAL(12,2)) FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'discount',
                 CAST(l_discount AS DECIMAL(12,2)) FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'tax',
                 CAST(l_tax AS DECIMAL(12,2)) FROM lineitem)
        SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS DOUBLE) AS total,
               CAST(sum(value) AS DOUBLE) / count(*) AS avg_value
        FROM m GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q197_link_prediction",
      "Common-neighbor link prediction over the SimHash near-dup graph " +
        "(q49's Hamming<=3 edges): the top-20 NON-adjacent doc pairs " +
        "sharing the most neighbors — transitive near-dup candidates " +
        "the banding's direct comparison missed (A~B and B~C at " +
        "Hamming 3 puts A,C up to 6 apart — outside every band), which " +
        "is both a recall audit of the LSH gate and the candidate " +
        "generator a second exact-verify pass would consume. Wedges " +
        "enumerate through each center vertex (deg^2 per node, q75's " +
        "cost class), under Graph.cappedWedgeCounts' HARD degree cap " +
        "(64): a viral duplicate-template hub at near-dup scale (deg " +
        "10^5 -> 10^10 wedge rows on one shuffle key) is excluded " +
        "from enumeration and LOGGED, not silently truncated — the " +
        "oracle states the identical cap, so common_neighbors = " +
        "shared non-hub neighbors is the statistic on both engines " +
        "and per-center work stays <= cap^2 whatever the degree " +
        "distribution. The wedge self-join beats per-center adjacency " +
        "arrays (measured 4.5 s vs 41 s at sf0.1): it stays in " +
        "codegen'd UnsafeRow land and parallelizes across edges. The " +
        "missing-edge check is a LEFT ANTI join against the edge " +
        "list, and the top-20 rides per-partition heaps under a total " +
        "order. Only 8-byte ids move at every stage — text and " +
        "signatures never reach the wedge join.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sigs = docs.select(col("doc_id"),
          Dedup.simhash(s, col("text")).as("sig"))
        val e = Dedup.simhashHammingPairs(sigs, "doc_id", "sig",
          maxHamming = 3, bands = 4, bandBits = 15)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .persist()
        graft.operators.Graph.cappedWedgeCounts(e, "a", "b", degCap = 64L)
          .join(e, col("id_a") === col("a") && col("id_b") === col("b"),
            "left_anti")
          .select(col("id_a"), col("id_b"), col("common_neighbors"))
          .orderBy(col("common_neighbors").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 60), j ->
                   CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0
                        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
          FROM (SELECT doc_id,
                       list_transform(list_distinct(string_split(text, ' ')),
                                      tk -> ${graft.functions.Portable.pmd5Sql("tk")}) AS hs
                FROM documents)),
        bk AS (
          ${(0 until 4).map(b =>
            s"SELECT doc_id, sig, $b AS band, (sig >> ${b * 15}) & 32767 AS key FROM sh")
            .mkString("\n          UNION ALL ")}),
        e AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
          WHERE bit_count(xor(l.sig, r.sig)) <= 3),
        und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg
                FROM und GROUP BY 1),
        cand AS (
          SELECT n1.b AS id_a, n2.b AS id_b,
                 CAST(count(*) AS BIGINT) AS common_neighbors
          FROM und n1 JOIN und n2 ON n1.a = n2.a AND n1.b < n2.b
          JOIN deg d ON d.v = n1.a AND d.deg <= 64
          GROUP BY 1, 2)
        SELECT id_a, id_b, common_neighbors
        FROM cand
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.a = cand.id_a AND e.b = cand.id_b)
        ORDER BY common_neighbors DESC, id_a, id_b LIMIT 20""")),
    // ----------------------------------------------------------------
    Q(
      "q230_rendezvous_shards",
      "Rendezvous (highest-random-weight) sharding and its resharding " +
        "churn law — the data-placement primitive that decides WHERE " +
        "each of 100 TB of documents lives: every doc independently " +
        "scores each shard with a keyed hash and lands on the argmax, " +
        "so adding a 9th shard to an 8-shard fleet moves ONLY the docs " +
        "whose new shard's score tops their old winner — an expected " +
        "1/9 of the corpus, every move INTO the new shard — where " +
        "naive hash-mod-N reassigns ~8/9 of everything. The query " +
        "computes both assignments per doc and reports, per old HRW " +
        "shard, the doc count and how many move under each scheme; " +
        "hrw_moved == hrw_to_new row-for-row IS the stability law, " +
        "and the two global churn columns (integer basis points) show " +
        "~1111 bp vs ~8889 bp. SCALE SHAPE: assignment is 9 codegen'd " +
        "hash projections evaluated scan-side per row — no ring state, " +
        "no lookup table, no shuffle of anything wider than the 8-key " +
        "group column; the aggregation map-side-combines to <=8 rows " +
        "per task. Scores pack (hash mod 2^50)*16 + shard into one " +
        "BIGINT (max 2^54, overflow-free) so the argmax is a plain " +
        "greatest() and hash ties break deterministically toward the " +
        "higher shard index in BOTH engines.",
      (s, dir) => {
        def score(sh: Int) =
          (graft.functions.Portable.pmd5(
            concat(col("doc_id").cast(StringType), lit(s"#$sh")))
            % P50) * 16 + sh
        val base = graft.functions.Portable.pmd5(col("doc_id").cast(StringType))
        val perDoc = t(s, dir, "documents").select(
          greatest((0 until 8).map(score): _*).as("old16"),
          greatest((0 until 9).map(score): _*).as("new16"),
          (base % 8).as("m8"), (base % 9).as("m9"))
          .select((col("old16") % 16).as("shard"),
            (col("new16") % 16).as("shard_new"),
            col("m8"), col("m9"))
        val byShard = perDoc.groupBy(col("shard")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("shard_new") =!= col("shard"), 1L).otherwise(0L))
            .as("hrw_moved"),
          sum(when(col("shard_new") === 8 && col("shard_new") =!= col("shard"),
            1L).otherwise(0L)).as("hrw_to_new"),
          sum(when(col("m8") =!= col("m9"), 1L).otherwise(0L)).as("mod_moved"))
        val tot = byShard.agg(sum(col("n_docs")).as("total_docs"),
          sum(col("hrw_moved")).as("hm"), sum(col("mod_moved")).as("mm"))
        byShard.crossJoin(broadcast(tot))
          .select(col("shard"), col("n_docs"), col("hrw_moved"),
            col("hrw_to_new"), col("mod_moved"), col("total_docs"),
            expr("hm * 10000 div total_docs").as("hrw_churn_bp"),
            expr("mm * 10000 div total_docs").as("mod_churn_bp"))
      },
      Some {
        def scoreSql(sh: Int) =
          s"(${graft.functions.Portable.pmd5Sql(
            s"concat(CAST(doc_id AS VARCHAR), '#$sh')")} % $P50) * 16 + $sh"
        val baseSql = graft.functions.Portable.pmd5Sql("CAST(doc_id AS VARCHAR)")
        s"""
        WITH perdoc AS (
          SELECT greatest(${(0 until 8).map(scoreSql).mkString(",\n                          ")}) % 16 AS shard,
                 greatest(${(0 until 9).map(scoreSql).mkString(",\n                          ")}) % 16 AS shard_new,
                 $baseSql % 8 AS m8,
                 $baseSql % 9 AS m9
          FROM documents),
        byshard AS (
          SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN shard_new <> shard THEN 1 ELSE 0 END) AS BIGINT) AS hrw_moved,
                 CAST(sum(CASE WHEN shard_new = 8 AND shard_new <> shard THEN 1 ELSE 0 END) AS BIGINT) AS hrw_to_new,
                 CAST(sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved
          FROM perdoc GROUP BY shard),
        tot AS (
          SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs,
                 CAST(sum(hrw_moved) AS BIGINT) AS hm,
                 CAST(sum(mod_moved) AS BIGINT) AS mm
          FROM byshard)
        SELECT shard, n_docs, hrw_moved, hrw_to_new, mod_moved, total_docs,
               hm * 10000 // total_docs AS hrw_churn_bp,
               mm * 10000 // total_docs AS mod_churn_bp
        FROM byshard CROSS JOIN tot"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q238_benford_audit",
      "Benford first-digit audit of order amounts — the forensic " +
        "data-quality screen: naturally-occurring multi-magnitude " +
        "amounts follow P(d) = log10(1 + 1/d), and a stratum that " +
        "departs sharply (uniform first digits, spikes at 5/9) marks " +
        "fabricated or unit-broken data before it poisons a corpus. " +
        "Expected shares ship as exact basis-point LITERALS (floor of " +
        "log10(1+1/d) x 1e4 — no per-row transcendentals), the first " +
        "digit is substr of the decimal rendering of positive integer " +
        "cents (identical in both engines — no float formatting), and " +
        "each digit row reports observed count, observed bp, expected " +
        "bp, absolute gap, plus the total L1 distance in bp repeated " +
        "per row (one 1-row broadcast). One map-side-combined count " +
        "over the scan; all arithmetic on the 9-row digit frame. The " +
        "synthetic amounts are uniform-ish, so the BIG distance is " +
        "the point — the audit flags them, and the hash gate proves " +
        "both engines compute the identical verdict.",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "orders").select(
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"))
          .where(col("cents") > 0)
          .select(substring(col("cents").cast(StringType), 1, 1).as("digit"))
        val obs = d.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        val tot = obs.agg(sum(col("n_obs")).as("n_tot"))
        val exp = BENFORD_BP.zipWithIndex
          .map { case (bp, i) => (s"${i + 1}", bp) }
          .toDF("digit", "expected_bp")
        val rows = obs.crossJoin(broadcast(tot))
          .join(broadcast(exp), "digit")
          .withColumn("obs_bp", expr("n_obs * 10000 div n_tot"))
          .withColumn("gap_bp", abs(col("obs_bp") - col("expected_bp")))
        val l1 = rows.agg(sum(col("gap_bp")).as("l1_bp"))
        rows.crossJoin(broadcast(l1))
          .select(col("digit"), col("n_obs"), col("n_tot"), col("obs_bp"),
            col("expected_bp"), col("gap_bp"), col("l1_bp"))
      },
      Some(s"""
        WITH d AS (
          SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                   AS BIGINT) AS VARCHAR), 1, 1) AS digit
          FROM orders
          WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) > 0),
        obs AS (
          SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
        tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM obs),
        exp AS (
          ${BENFORD_BP.zipWithIndex.map { case (bp, i) =>
            s"SELECT '${i + 1}' AS digit, CAST($bp AS BIGINT) AS expected_bp"
          }.mkString("\n          UNION ALL ")}),
        rows_ AS (
          SELECT obs.digit, n_obs, n_tot,
                 n_obs * 10000 // n_tot AS obs_bp, expected_bp,
                 abs(n_obs * 10000 // n_tot - expected_bp) AS gap_bp
          FROM obs CROSS JOIN tot JOIN exp ON exp.digit = obs.digit),
        l1 AS (SELECT CAST(sum(gap_bp) AS BIGINT) AS l1_bp FROM rows_)
        SELECT digit, n_obs, n_tot, obs_bp, expected_bp, gap_bp, l1_bp
        FROM rows_ CROSS JOIN l1"""))
  )
}
