package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Portable, TextAnalysis => TA}
import graft.operators.{Dedup, Sketches}
import graft.queries.Tables.{boundedRank, spread, t}

/** Training-pipeline assembly queries: the operations that turn a raw
  * corpus into a training mix — exact n-gram decontamination, sequence
  * packing, mixture balancing, winnowing fingerprints, dup-graph
  * triangle census, ingest anomaly flags, and containment-based eval
  * leakage. Each is shaped for a 1000-executor corpus: candidate
  * generation is always an equi-join or a broadcast of the provably
  * small side, never an all-pairs scan of the big one.
  */
object PipelineQueries {

  private val NGRAM = 13       // q71 decontamination n-gram width (GPT-3 uses 13)
  private val RUN_L = 20       // q78 repeated-substring gram width (words)
  private val RES_K = 7        // q79 fixed sample size per stratum
  private val BUDGET = 2048L   // q72 tokens per packed sequence
  private val MIX_SALT = 7     // q73 sampling-hash salt
  private val WIN_K = 5        // q74 winnowing gram width (words)
  private val WIN_W = 4        // q74 winnowing window (grams)
  private val EVAL_MAX = 100   // eval slice: doc_id < 100 (same split as q58)
  private val BLOOM_M = 1 << 18 // q126 bloom bits (32 KB bitmap)
  private val BLOOM_K = 4       // q126 hash functions

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q71_ngram_decontam",
      s"Exact $NGRAM-gram decontamination (the GPT-3/PaLM recipe): for " +
        "every (train, eval) document pair, the number of distinct " +
        s"$NGRAM-word grams they share. Grams ship as 8-byte pmd5 " +
        "hashes, never as text; the join is a gram-hash equi-join and " +
        "the eval side of it is the held-out suite — small by " +
        "construction, so it broadcasts at any corpus scale. " +
        "Complements q58 (near-dup LSH) with the exact-substring " +
        "signal LSH cannot give.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        // one gram projection feeds both sides of the join; persisted so
        // the shingle hashing runs once, freed by the harness's
        // clearCache-after-terminal-action contract
        val grams = docs.select(col("doc_id"),
          explode(array_distinct(transform(
            Portable.wordShingles(col("text"), NGRAM),
            g => Portable.pmd5(g)))).as("gram"))
          .persist()
        grams.filter(col("doc_id") >= EVAL_MAX)
          .withColumnRenamed("doc_id", "train_id")
          .join(grams.filter(col("doc_id") < EVAL_MAX)
            .withColumnRenamed("doc_id", "eval_id"), "gram")
          .groupBy(col("train_id"), col("eval_id"))
          .agg(count(lit(1)).as("n_shared"))
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   ${Portable.wordShinglesSql("text", NGRAM)},
                   g -> ${Portable.pmd5Sql("g")}))) AS gram
          FROM documents)
        SELECT l.doc_id AS train_id, r.doc_id AS eval_id,
               count(*) AS n_shared
        FROM g l JOIN g r ON l.gram = r.gram
        WHERE l.doc_id >= $EVAL_MAX AND r.doc_id < $EVAL_MAX
        GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q72_sequence_packing",
      s"Sequence packing (concatenate-and-chop): documents stream in " +
        s"doc_id order per source into $BUDGET-token training " +
        "sequences; a doc belongs to the bin where it starts. One " +
        "running-sum window per source — packing is inherently " +
        "sequential, so the unit of parallelism is the stream, and at " +
        "corpus scale each source is further split into hash-shards " +
        "packed independently (bin boundaries don't cross shards).",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("bin_id", expr(s"(cum - n_tokens) div $BUDGET"))
          .groupBy(col("source"), col("bin_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
        SELECT source, CAST((cum - n_tokens) // $BUDGET AS BIGINT) AS bin_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM c GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q73_mixture_downsample",
      "Mixture balancing: deterministically downsample every language " +
        "to the rarest one's size (uniform target mixture). The keep " +
        "rule is integer-exact — pmd5(doc_id) % n_lang < n_min keeps " +
        "an expected n_min docs per language with zero RNG state, so " +
        "the sample is reproducible row-by-row on any cluster. The " +
        "per-language counts are a tiny dim that broadcasts; the keep " +
        "filter is scan-stage.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val counts = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_orig"))
        val minN = counts.agg(min(col("n_orig")).as("min_n"))
        val kept = docs
          .join(broadcast(counts), "lang")
          .crossJoin(broadcast(minN))
          .filter(
            Portable.pmd5Salted(MIX_SALT, col("doc_id").cast(StringType))
              % col("n_orig") < col("min_n"))
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        counts.join(kept, Seq("lang"), "left")
          .select(col("lang"), col("n_orig"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      },
      Some(s"""
        WITH c AS (SELECT lang, count(*) AS n_orig FROM documents GROUP BY 1),
        m AS (SELECT min(n_orig) AS min_n FROM c),
        k AS (
          SELECT d.lang, count(*) AS n_kept
          FROM documents d JOIN c USING (lang) CROSS JOIN m
          WHERE ${Portable.pmd5SaltedSql(MIX_SALT, "CAST(doc_id AS VARCHAR)")}
                  % n_orig < min_n
          GROUP BY 1)
        SELECT c.lang, c.n_orig, coalesce(k.n_kept, 0) AS n_kept
        FROM c LEFT JOIN k USING (lang)""")),
    // ----------------------------------------------------------------
    Q(
      "q74_winnow_fingerprints",
      s"Robust winnowing (the MOSS fingerprint scheme): per document, " +
        s"the rightmost-minimum $WIN_K-gram hash in every window of " +
        s"$WIN_W consecutive grams is selected; fingerprints chosen in " +
        "more than one document localize SHARED SUBSTRINGS (guarantee: " +
        s"any match of ${WIN_K + WIN_W - 1}+ words is caught). " +
        s"Selection is a pure per-row projection; only ~2/${WIN_W + 1} " +
        "of gram hashes are selected and reach the fingerprint " +
        "shuffle.",
      (s, dir) => {
        // a selected POSITION determines its fingerprint (fp = g[pos]),
        // so the per-window argmin dedups on the bare position list —
        // cheaper than struct dedup and expressible in both engines
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val gh = transform(Portable.wordShingles(col("text"), WIN_K),
          g => Portable.pmd5(g))
        val sel = docs.select(col("doc_id"), gh.as("g"))
          .select(col("doc_id"), col("g"),
            explode(
              when(size(col("g")) < WIN_W, array().cast(ArrayType(LongType)))
                .otherwise(array_distinct(transform(
                  sequence(lit(1), size(col("g")) - (WIN_W - 1)), p => {
                    val sl = slice(col("g"), p, lit(WIN_W))
                    (p + lit(WIN_W) - array_position(reverse(sl), array_min(sl)))
                      .cast(LongType)
                  })))).as("pos"))
          .select(col("doc_id"),
            element_at(col("g"), col("pos").cast(IntegerType)).as("fp"))
        sel.groupBy(col("fp"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_sites"))
          .filter(col("n_docs") > 1)
      },
      Some(s"""
        WITH gh AS (
          SELECT doc_id,
                 list_transform(${Portable.wordShinglesSql("text", WIN_K)},
                   g -> ${Portable.pmd5Sql("g")}) AS g
          FROM documents),
        sel AS (
          SELECT doc_id,
                 g[CAST(unnest(list_distinct(list_transform(
                   generate_series(1, len(g) - ${WIN_W - 1}), p ->
                     CAST(p + $WIN_W - list_position(
                       list_reverse(list_slice(g, p, p + ${WIN_W - 1})),
                       list_min(list_slice(g, p, p + ${WIN_W - 1}))) AS BIGINT))))
                   AS INTEGER)] AS fp
          FROM gh)
        SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_sites
        FROM sel GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""")),
    // ----------------------------------------------------------------
    Q(
      "q75_triangle_count",
      "Triangle census of the near-dup graph (q49's SimHash " +
        "Hamming<=3 edges): a dense triangle neighborhood is a " +
        "template cluster, not a pairwise accident — the standard " +
        "graph-shape signal on top of pairwise dedup. Edge-iterator " +
        "algorithm: id-oriented out-neighbor lists, one sorted-merge " +
        "intersect per edge (each triangle counted once, at its " +
        "lowest-id edge) — the 30M wedge rows a naive two-path join " +
        "would shuffle never materialize; work is edges x " +
        "intersect, memory is bounded by max out-degree (= near-dup " +
        "cluster size; production caps hub degrees before counting).",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sigs = docs.select(col("doc_id"),
          Dedup.simhash(s, col("text")).as("sig"))
        // the edge list feeds the adjacency build and the per-edge
        // probe; persist or the signature + band pipeline runs twice
        val e = Dedup.simhashHammingPairs(sigs, "doc_id", "sig",
          maxHamming = 3, bands = 4, bandBits = 15)
          .select(col("id_a").as("a"), col("id_b").as("b"))
          .persist()
        val adj = e.groupBy(col("a"))
          .agg(sort_array(collect_list(col("b"))).as("nbrs"))
        // |N+(a) ∩ N+(b)| = triangles whose two smallest ids are (a,b)
        e.join(adj.select(col("a").as("u"), col("nbrs").as("na")),
            col("a") === col("u"))
          .join(adj.select(col("a").as("v"), col("nbrs").as("nb")),
            col("b") === col("v"))
          .select(graft.expressions.SortedIntersectSize(
            s, col("na"), col("nb")).as("tc"))
          .agg(coalesce(sum(col("tc")), lit(0L)).as("n_triangles"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 60), j ->
                   CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0
                        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
          FROM (SELECT doc_id,
                       list_transform(list_distinct(string_split(text, ' ')),
                                      tk -> ${Portable.pmd5Sql("tk")}) AS hs
                FROM documents)),
        bk AS (
          ${(0 until 4).map(b =>
            s"SELECT doc_id, sig, $b AS band, (sig >> ${b * 15}) & 32767 AS key FROM sh")
            .mkString("\n          UNION ALL ")}),
        e AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
          WHERE bit_count(xor(l.sig, r.sig)) <= 3)
        SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""")),
    // ----------------------------------------------------------------
    Q(
      "q76_event_anomaly",
      "Ingest anomaly flags: hourly event counts per type, flagged " +
        "where the count sits more than 3 sample standard deviations " +
        "from the type's mean. The z^2 test is cross-multiplied into " +
        "pure BIGINT arithmetic — (m*c - tot)^2 * (m-1) > 9 * m * " +
        "(m*ss - tot^2) — so the flag is bit-deterministic on any " +
        "engine (no float variance accumulation order to disagree " +
        "on). Per-type stats are a tiny broadcast dim.",
      (s, dir) => {
        val h = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val st = h.groupBy(col("event_type"))
          .agg(count(lit(1)).as("m"), sum(col("cnt")).as("tot"),
            sum(col("cnt") * col("cnt")).as("ss"))
        val dev = col("m") * col("cnt") - col("tot")
        h.join(broadcast(st), "event_type")
          .select(col("event_type"), col("hr"), col("cnt"),
            (dev * dev * (col("m") - 1) >
              lit(9L) * col("m") * (col("m") * col("ss") - col("tot") * col("tot")))
              .as("is_anomaly"))
      },
      Some("""
        WITH h AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(cnt) AS BIGINT) AS tot,
                 CAST(sum(cnt * cnt) AS BIGINT) AS ss
          FROM h GROUP BY 1)
        SELECT h.event_type, hr, cnt,
               (m*cnt - tot) * (m*cnt - tot) * (m - 1)
                 > 9 * m * (m*ss - tot*tot) AS is_anomaly
        FROM h JOIN st USING (event_type)""")),
    // ----------------------------------------------------------------
    Q(
      "q77_containment_join",
      "Containment leakage check: training docs whose token set covers " +
        ">= 90% of an eval doc's tokens (|T ∩ E| / |E|) — the " +
        "asymmetric signal Jaccard-LSH structurally misses (a short " +
        "eval doc inside a long train doc has LOW Jaccard). The eval " +
        "suite is small by construction, so its hashed token sets " +
        "broadcast and the check is ONE scan of the corpus; the " +
        "verify is a sorted-merge intersect (codegen), and the " +
        "threshold is applied in integer cross-multiplied form so " +
        "both engines cut the same pairs.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sets = docs.select(col("doc_id"),
          array_sort(transform(array_distinct(split(col("text"), " ")),
            tk => Portable.pmd5(tk))).as("ths"))
        val ev = broadcast(sets.filter(col("doc_id") < EVAL_MAX)
          .select(col("doc_id").as("eval_id"), col("ths").as("e_ths")))
        val isz = graft.expressions.SortedIntersectSize(
          s, col("ths"), col("e_ths"))
        sets.filter(col("doc_id") >= EVAL_MAX)
          .withColumnRenamed("doc_id", "train_id")
          .crossJoin(ev)
          .withColumn("isz", isz)
          .filter(col("isz") * 10 >= size(col("e_ths")) * 9)
          .select(col("train_id"), col("eval_id"),
            (col("isz").cast(DoubleType) / size(col("e_ths")))
              .as("containment"))
      },
      Some(s"""
        WITH sets AS (
          SELECT doc_id,
                 list_sort(list_transform(list_distinct(string_split(text, ' ')),
                   tk -> ${Portable.pmd5Sql("tk")})) AS ths
          FROM documents)
        SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
               CAST(len(list_intersect(t.ths, e.ths)) AS DOUBLE)
                 / len(e.ths) AS containment
        FROM sets t, sets e
        WHERE t.doc_id >= $EVAL_MAX AND e.doc_id < $EVAL_MAX
          AND len(list_intersect(t.ths, e.ths)) * 10 >= 9 * len(e.ths)""")),
    // ----------------------------------------------------------------
    Q(
      "q78_repeated_substrings",
      s"Exact-substring dedup signal (the suffix-array recipe of " +
        "'Deduplicating Training Data Makes Language Models Better', " +
        s"grams instead of suffixes): positional $RUN_L-word gram " +
        "hashes that occur more than once in the corpus, merged into " +
        "maximal per-doc runs by the gaps-and-islands window (pos - " +
        "row_number is constant within a run). Output per affected " +
        "doc: run count and repeated-token total — the mask an " +
        "ExactSubstr cut step would remove. Grams travel as 8-byte " +
        "hashes; duplicate detection is a count over those keys, and " +
        "the run merge is a per-doc window — no text ever shuffles.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        Dedup.repeatedGramRuns(docs, "doc_id", "text", RUN_L)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_runs"),
            sum(col("mx") - col("mn") + RUN_L).as("repeated_tokens"))
      },
      Some(s"""
        WITH ${Portable.repeatedRunCtesSql(RUN_L)}
        SELECT doc_id, count(*) AS n_runs,
               CAST(sum(mx - mn + $RUN_L) AS BIGINT) AS repeated_tokens
        FROM runs GROUP BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "q79_reservoir_sample",
      s"Deterministic fixed-size sample: exactly min($RES_K, n) docs " +
        "per source, chosen by rank over a salted portable hash — the " +
        "reproducible stand-in for reservoir sampling (same sample on " +
        "any cluster, any partitioning, any day). Complements q60 " +
        "(rate-based, variable-size) with the fixed-quota shape. " +
        "Rank-k per stratum is a per-stratum window; for a huge " +
        "stratum the production form pre-filters with a hash " +
        "threshold a hair above k/n, then exact-ranks the survivors — " +
        "same output, no full sort.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val hk = Portable.pmd5Salted(11, col("doc_id").cast(StringType))
        val w = Window.partitionBy(col("source")).orderBy(hk, col("doc_id"))
        docs.select(col("doc_id"), col("source"), hk.as("hk"))
          .withColumn("rk", row_number().over(w).cast(LongType))
          .filter(col("rk") <= RES_K)
          .select(col("source"), col("rk"), col("doc_id"))
      },
      Some(s"""
        SELECT source, rk, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY ${Portable.pmd5SaltedSql(11, "CAST(doc_id AS VARCHAR)")},
                            doc_id) AS rk
          FROM documents)
        WHERE rk <= $RES_K""")),
    // ----------------------------------------------------------------
    Q(
      "q80_online_anomaly",
      "Online anomaly flags — the batch twin of the stateful " +
        "streaming detector (EventsStream.anomalyStream): each hourly " +
        "bucket is tested against the running stats of its type's " +
        "PRIOR hours only (prefix window), the semantics a single-pass " +
        "stream can actually deliver. Same cross-multiplied BIGINT " +
        "z^2 test as q76, so stream and batch flags agree " +
        "bit-for-bit; first two hours of a type are never flagged " +
        "(variance undefined). One shuffle serves the bucket agg and " +
        "the prefix window.",
      (s, dir) => {
        val h = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val dev = col("m_prior") * col("cnt") - col("tot")
        h.select(col("event_type"), col("hr"), col("cnt"),
            count(lit(1)).over(w).as("m_prior"),
            coalesce(sum(col("cnt")).over(w), lit(0L)).as("tot"),
            coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)).as("ss"))
          .select(col("event_type"), col("hr"), col("cnt"), col("m_prior"),
            (col("m_prior") >= 2 &&
              dev * dev * (col("m_prior") - 1) >
                lit(9L) * col("m_prior") *
                  (col("m_prior") * col("ss") - col("tot") * col("tot")))
              .as("is_anomaly"))
      },
      Some("""
        WITH h AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        p AS (
          SELECT event_type, hr, cnt,
                 CAST(count(*) OVER w AS BIGINT) AS m_prior,
                 CAST(coalesce(sum(cnt) OVER w, 0) AS BIGINT) AS tot,
                 CAST(coalesce(sum(cnt * cnt) OVER w, 0) AS BIGINT) AS ss
          FROM h
          WINDOW w AS (PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_type, hr, cnt, m_prior,
               m_prior >= 2 AND
                 (m_prior*cnt - tot) * (m_prior*cnt - tot) * (m_prior - 1)
                   > 9 * m_prior * (m_prior*ss - tot*tot) AS is_anomaly
        FROM p""")),
    // ----------------------------------------------------------------
    Q(
      "q81_label_centroids",
      "Pairwise label-centroid cosine over the embedding corpus — the " +
        "class-confusion structure a curation pipeline reads before " +
        "balancing. Floats are first int8-quantized per vector (q57's " +
        "max-abs scale, floor codes), then aggregated as INTEGER " +
        "dimension sums — integer addition commutes, so the centroid " +
        "is bit-deterministic under any partitioning (a raw float sum " +
        "would depend on reduction order). Per-label sums are one " +
        "map-side-combined agg; the pairwise cosine runs on labels^2 " +
        "x dims scalars — nothing at corpus scale.",
      (s, dir) => {
        val pv = t(s, dir, "embeddings").select(col("label"),
          transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
        val withScale = pv.withColumn("scale",
          aggregate(col("v"), lit(0.0d), (a, x) => greatest(a, abs(x))) / 127)
        val sums = withScale
          .select(col("label"), posexplode(transform(col("v"), x =>
            when(col("scale") === 0d, lit(0L))
              .otherwise(floor(x / col("scale")).cast(LongType)))))
          .select(col("label"), (col("pos") + 1).as("dim"), col("col").as("c"))
          .groupBy(col("label"), col("dim")).agg(sum(col("c")).as("sc"))
          .persist()
        sums.select(col("label").as("label_a"), col("dim"), col("sc").as("sa"))
          .join(sums.select(col("label").as("label_b"), col("dim"),
            col("sc").as("sb")), Seq("dim"))
          .filter(col("label_a") < col("label_b"))
          .groupBy(col("label_a"), col("label_b"))
          .agg(sum(col("sa") * col("sb")).as("dot"),
            sum(col("sa") * col("sa")).as("na2"),
            sum(col("sb") * col("sb")).as("nb2"))
          .select(col("label_a"), col("label_b"),
            (col("dot").cast(DoubleType) /
              sqrt(col("na2").cast(DoubleType) * col("nb2").cast(DoubleType)))
              .as("centroid_cos"))
      },
      Some("""
        WITH pv AS (
          SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        sc AS (
          SELECT label, v,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) / 127 AS scale
          FROM pv),
        codes AS (
          SELECT label, i AS dim,
                 CAST(CASE WHEN scale = 0 THEN 0
                      ELSE floor(v[i] / scale) END AS BIGINT) AS c
          FROM sc, unnest(generate_series(1, 64)) t(i)),
        sums AS (
          SELECT label, dim, CAST(sum(c) AS BIGINT) AS sc2
          FROM codes GROUP BY 1, 2),
        pairs AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 CAST(sum(a.sc2 * b.sc2) AS BIGINT) AS dot,
                 CAST(sum(a.sc2 * a.sc2) AS BIGINT) AS na2,
                 CAST(sum(b.sc2 * b.sc2) AS BIGINT) AS nb2
          FROM sums a JOIN sums b USING (dim)
          WHERE a.label < b.label
          GROUP BY 1, 2)
        SELECT label_a, label_b,
               CAST(dot AS DOUBLE)
                 / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) AS centroid_cos
        FROM pairs""")),
    // ----------------------------------------------------------------
    Q(
      "q83_quality_resample",
      "Quality-weighted resampling: each doc is kept with probability " +
        "equal to its q24 quality score — soft filtering (hard " +
        "thresholds cliff-edge the distribution; proportional " +
        "sampling preserves a gradient). The coin is pmd5(doc_id) % " +
        "2^20 < floor(score * 2^20): one deterministic integer " +
        "compare, reproducible row-by-row on any cluster, applied at " +
        "scan stage (no shuffle).",
      (s, dir) => {
        val scored = t(s, dir, "documents").select(
          col("doc_id"), col("lang"),
          TA.qualityScore(col("text"), TA.EnMarkers).as("score"))
        scored.filter(
          Portable.pmd5Salted(13, col("doc_id").cast(StringType)) % lit(1048576L)
            < floor(col("score") * 1048576).cast(LongType))
      },
      Some {
        val stopList = s"[${TA.EnMarkers.map(m => s"'$m'").mkString(", ")}]"
        s"""
        SELECT doc_id, lang, score FROM (
          SELECT doc_id, lang,
                 least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
                   + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) * 0.4
                   + CAST(len(list_filter(string_split(text, ' '),
                            tk -> list_contains($stopList, tk))) AS DOUBLE)
                       / len(string_split(text, ' ')) * 0.2 AS score
          FROM documents)
        WHERE ${Portable.pmd5SaltedSql(13, "CAST(doc_id AS VARCHAR)")} % 1048576
                < floor(score * 1048576)"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q85_length_quantiles",
      "Per-source token-length quantiles (p50/p90/p99) by exact rank " +
        "selection — the datasheet numbers that drive packing and " +
        "truncation budgets. Type-1 quantile (value at rank " +
        "ceil(q*n)) in pure integer arithmetic; one window per " +
        "stratum, conditional-max extraction, no approximation — at " +
        "corpus scale the same ranks come from a two-pass histogram " +
        "refine, same definition.",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_tokens"), col("doc_id"))
        d.withColumn("rn", row_number().over(w).cast(LongType))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
          .groupBy(col("source"), col("n"))
          .agg(
            max(when(col("rn") === expr("(n*50 + 99) div 100"), col("n_tokens"))).as("p50"),
            max(when(col("rn") === expr("(n*90 + 99) div 100"), col("n_tokens"))).as("p90"),
            max(when(col("rn") === expr("(n*99 + 99) div 100"), col("n_tokens"))).as("p99"))
          .select(col("source"), col("n").as("n_docs"),
            col("p50"), col("p90"), col("p99"))
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
      "q86_vocab_coverage",
      "Vocabulary coverage curve: the fraction of corpus token MASS " +
        "the top-k most frequent tokens cover, at k in {10, 20, 50} — " +
        "the number that sizes a vocabulary (and predicts the OOV " +
        "rate a cut would leave, q63's complement). Token counting is " +
        "one map-side-combined agg; the ranking window runs over the " +
        "LIMIT-50 slice only, never the full vocabulary, so the " +
        "single-partition window holds 50 rows at any corpus size.",
      (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("f"))
        val total = tf.agg(sum(col("f")).as("total"))
        import s.implicits._
        val ks = Seq(10, 20, 50).toDF("k")
        val top = tf.orderBy(col("f").desc, col("tok")).limit(50)
          .withColumn("rnk", boundedRank(col("f"))(col("f").desc, col("tok")))
        top.crossJoin(broadcast(total))
          .crossJoin(broadcast(ks))
          .groupBy(col("k"), col("total"))
          .agg(sum(when(col("rnk") <= col("k"), col("f")).otherwise(0L))
            .as("covered_tokens"))
          .select(col("k"), col("covered_tokens"),
            col("total").as("total_tokens"),
            (col("covered_tokens").cast(DoubleType) / col("total"))
              .as("coverage"))
      },
      Some("""
        WITH tf AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS f
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok),
        tot AS (SELECT CAST(sum(f) AS BIGINT) AS total FROM tf),
        top AS (
          SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rnk
          FROM tf ORDER BY f DESC, tok LIMIT 50)
        SELECT k, CAST(sum(CASE WHEN rnk <= k THEN f ELSE 0 END) AS BIGINT) AS covered_tokens,
               total AS total_tokens,
               CAST(sum(CASE WHEN rnk <= k THEN f ELSE 0 END) AS DOUBLE) / total AS coverage
        FROM top CROSS JOIN tot
             CROSS JOIN (SELECT unnest([10, 20, 50]) AS k) ks
        GROUP BY k, total""")),
    // ----------------------------------------------------------------
    Q(
      "q88_anomaly_bursts",
      "Incident bursts: q76's flagged hours merged into maximal " +
        "consecutive runs per event type (gaps-and-islands on the " +
        "epoch-hour sequence) — a sustained multi-hour burst is an " +
        "incident, an isolated spike is noise, and the distinction is " +
        "what an on-call actually pages on. One window per type over " +
        "the already-tiny flagged set.",
      (s, dir) => {
        val h = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val st = h.groupBy(col("event_type"))
          .agg(count(lit(1)).as("m"), sum(col("cnt")).as("tot"),
            sum(col("cnt") * col("cnt")).as("ss"))
        val dev = col("m") * col("cnt") - col("tot")
        val flagged = h.join(broadcast(st), "event_type")
          .filter(dev * dev * (col("m") - 1) >
            lit(9L) * col("m") * (col("m") * col("ss") - col("tot") * col("tot")))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        flagged
          .withColumn("grp",
            expr(s"unix_micros(hr) div ${Units.HourUs}") - row_number().over(w))
          .groupBy(col("event_type"), col("grp"))
          .agg(min(col("hr")).as("start_hr"), max(col("hr")).as("end_hr"),
            count(lit(1)).as("n_hours"), max(col("cnt")).as("peak_cnt"))
          .select(col("event_type"), col("start_hr"), col("end_hr"),
            col("n_hours"), col("peak_cnt"))
      },
      Some(s"""
        WITH h AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(cnt) AS BIGINT) AS tot,
                 CAST(sum(cnt * cnt) AS BIGINT) AS ss
          FROM h GROUP BY 1),
        f AS (
          SELECT h.event_type, hr, cnt
          FROM h JOIN st USING (event_type)
          WHERE (m*cnt - tot) * (m*cnt - tot) * (m - 1)
                  > 9 * m * (m*ss - tot*tot)),
        d AS (
          SELECT event_type, hr, cnt,
                 epoch_us(hr) // ${Units.HourUs}
                   - row_number() OVER (PARTITION BY event_type ORDER BY hr) AS grp
          FROM f)
        SELECT event_type, min(hr) AS start_hr, max(hr) AS end_hr,
               count(*) AS n_hours, CAST(max(cnt) AS BIGINT) AS peak_cnt
        FROM d GROUP BY event_type, grp""")),
    // ----------------------------------------------------------------
    Q(
      "q101_sketch_quantiles",
      "Per-source n_chars quantiles (p25/p50/p75/p99) from the ONE-PASS " +
        "mergeable KLL sketch (functions/Kll): map-side combine ships a " +
        "bounded O(k log(n/k)) buffer per group per partition instead " +
        "of q85's full-stratum window sort or q95's second scan. " +
        "Capacity here (2^17) exceeds every stratum at test SF, so the " +
        "sketch is provably EXACT and the oracle is the same integer " +
        "rank-selection q85 uses (the q94 Misra-Gries exactness " +
        "pattern); at 100 TB capacity drops to ~4096 for one-pass " +
        "quantiles with ~1% rank error — KllSketchSpec proves the " +
        "bounded-state and error-bound claims in the compaction regime.",
      (s, dir) => {
        import s.implicits._
        import graft.functions.Kll
        t(s, dir, "documents").select(col("source"), col("n_chars"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(new Kll.QuantileSketchLong(1 << 17, Seq(25, 50, 75, 99)).toColumn)
          .map { case (src, qs) => (src, qs(0), qs(1), qs(2), qs(3)) }
          .toDF("source", "p25", "p50", "p75", "p99")
      },
      Some("""
        WITH r AS (
          SELECT source, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM documents)
        SELECT source,
               max(CASE WHEN rn = greatest(1, (n*25 + 99) // 100) THEN n_chars END) AS p25,
               max(CASE WHEN rn = greatest(1, (n*50 + 99) // 100) THEN n_chars END) AS p50,
               max(CASE WHEN rn = greatest(1, (n*75 + 99) // 100) THEN n_chars END) AS p75,
               max(CASE WHEN rn = greatest(1, (n*99 + 99) // 100) THEN n_chars END) AS p99
        FROM r GROUP BY source""")),
    // ----------------------------------------------------------------
    Q(
      "q109_value_quantiles",
      "Per-(type, hour) value quantiles through the KLL sketch on a " +
        "TWO-part key — the batch twin of the streaming quantile " +
        "monitor (EventsStream.quantileStream, whose per-bucket state " +
        "is this same mergeable buffer). Values floor to integer " +
        "micro-units first, so ranks carry no float drift; capacity " +
        "exceeds every bucket at test SF, making the sketch exact " +
        "against the oracle's rank selection (the q101 gate). At " +
        "corpus scale the same one-pass plan holds with bounded " +
        "buffers and ~1% rank error.",
      (s, dir) => {
        import s.implicits._
        import graft.functions.Kll
        t(s, dir, "events")
          .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
            floor(col("value") * 1000000).cast(LongType).as("v"))
          .as[(String, java.sql.Timestamp, Long)]
          .groupByKey(r => (r._1, r._2))
          .mapValues(_._3)
          .agg(new Kll.QuantileSketchLong(1 << 15, Seq(50, 99)).toColumn,
            count(lit(1)).as[Long])
          .map { case ((et, hr), qs, n) => (et, hr, n, qs(0), qs(1)) }
          .toDF("event_type", "hr", "n", "p50_micro", "p99_micro")
      },
      Some("""
        WITH d AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(floor(value * 1000000) AS BIGINT) AS v
          FROM events),
        r AS (
          SELECT event_type, hr, v,
                 row_number() OVER (PARTITION BY event_type, hr ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY event_type, hr) AS n
          FROM d)
        SELECT event_type, hr, CAST(n AS BIGINT) AS n,
               max(CASE WHEN rn = greatest(1, (n*50 + 99) // 100) THEN v END) AS p50_micro,
               max(CASE WHEN rn = greatest(1, (n*99 + 99) // 100) THEN v END) AS p99_micro
        FROM r GROUP BY event_type, hr, n""")),
    // ----------------------------------------------------------------
    Q(
      "q126_bloom_decontam",
      s"Bloom-gated decontamination: per TRAIN document, how many of " +
        s"its distinct $NGRAM-grams appear anywhere in the eval suite " +
        "— q71's signal folded per train doc, computed through the " +
        "MEMBERSHIP sketch that completes the family (KLL ranks q101, " +
        "KMV distinct q69, count-min frequencies q124). The eval " +
        s"grams build a $BLOOM_M-bit / $BLOOM_K-hash bitmap " +
        s"(${BLOOM_M / 8192} KB, ONE row) that broadcasts at ANY eval " +
        "cardinality — this is the explicit, mergeable form of the " +
        "runtime bloom join filter: where a hash-set semi-join stops " +
        "broadcasting at millions of eval grams, the bitmap stays " +
        "fixed-size, candidates drop out at the SCAN, and only bloom " +
        "survivors (true hits + a ~e-3 false-positive trickle) enter " +
        "the exact verify join. No false negative is possible — the " +
        "oracle is the PLAIN exact join, so the hash match PROVES the " +
        "prefilter dropped nothing; BloomSpec pins mergeability " +
        "(bloom(A)|bloom(B) == bloom(A u B)) and the measured FP rate.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val grams = docs.select(col("doc_id"),
          explode(array_distinct(transform(
            Portable.wordShingles(col("text"), NGRAM),
            g => Portable.pmd5(g)))).as("gram"))
          .persist()
        val evalGrams = grams.filter(col("doc_id") < EVAL_MAX)
          .select(col("gram")).distinct()
        val bloom = Sketches.bloomBuild(evalGrams, "gram", BLOOM_M, BLOOM_K)
        grams.filter(col("doc_id") >= EVAL_MAX)
          .crossJoin(broadcast(bloom))
          .filter(Sketches.bloomMightContain(
            col("bloom"), col("gram"), BLOOM_M, BLOOM_K))
          .select(col("doc_id").as("train_id"), col("gram"))
          .join(evalGrams, "gram")
          .groupBy(col("train_id"))
          .agg(count(lit(1)).as("n_eval_grams"))
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   ${Portable.wordShinglesSql("text", NGRAM)},
                   g -> ${Portable.pmd5Sql("g")}))) AS gram
          FROM documents),
        eg AS (SELECT DISTINCT gram FROM g WHERE doc_id < $EVAL_MAX)
        SELECT g.doc_id AS train_id, CAST(count(*) AS BIGINT) AS n_eval_grams
        FROM g JOIN eg USING (gram)
        WHERE g.doc_id >= $EVAL_MAX
        GROUP BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q226_temporal_split",
      "Leakage-safe TEMPORAL train/val/test split with embargo gaps — " +
        "the time-series counterpart of q123's component-keyed split: " +
        "when samples are autocorrelated in time, a random split leaks " +
        "(a validation event's near-simultaneous neighbors sit in " +
        "train), so the cuts are strictly chronological and an EMBARGO " +
        "band of 1% of the observed range is DROPPED after each cut " +
        "(train <= t60 | gap | val <= t80 | gap | test), the purged " +
        "split of the financial-ML literature. Cut points derive from " +
        "one (min, max) aggregate — a 1-row broadcast — in pure " +
        "integer micros arithmetic; classification is then a single " +
        "stateless scan, so the split of a 100 TB event log is one " +
        "pass + one tiny agg. Output: per-split row count and exact " +
        "micros bounds, from which the no-overlap law (min of val > " +
        "max of train + embargo) is checkable in the report itself.",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
        val bounds = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        e.crossJoin(broadcast(bounds))
          .select(col("event_id"), col("us"),
            expr("lo + (hi - lo) * 60 div 100").as("t60"),
            expr("lo + (hi - lo) * 80 div 100").as("t80"),
            expr("(hi - lo) div 100").as("gap"))
          .select(col("event_id"), col("us"),
            when(col("us") <= col("t60"), "train")
              .when(col("us") > col("t60") + col("gap")
                && col("us") <= col("t80"), "val")
              .when(col("us") > col("t80") + col("gap"), "test")
              .otherwise("embargo").as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            min(col("us")).as("min_us"), max(col("us")).as("max_us"))
      },
      Some("""
        WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
        m AS (
          SELECT event_id, us,
                 lo + (hi - lo) * 60 // 100 AS t60,
                 lo + (hi - lo) * 80 // 100 AS t80,
                 (hi - lo) // 100 AS gap
          FROM e, b),
        s AS (
          SELECT event_id, us,
                 CASE WHEN us <= t60 THEN 'train'
                      WHEN us > t60 + gap AND us <= t80 THEN 'val'
                      WHEN us > t80 + gap THEN 'test'
                      ELSE 'embargo' END AS split
          FROM m)
        SELECT split, CAST(count(*) AS BIGINT) AS n,
               min(us) AS min_us, max(us) AS max_us
        FROM s GROUP BY split""")),
    // ----------------------------------------------------------------
    Q(
      "q227_mix_temperature",
      "Temperature-scaled mixture sampling (the mT5/CC multilingual " +
        "recipe, alpha = 0.5): per-source sampling mass is " +
        "n_docs^alpha — here floor(sqrt(n_docs)), EXACT in both " +
        "engines because IEEE-754 sqrt is correctly rounded and the " +
        "floor lands on the same integer — so small sources are " +
        "up-weighted relative to their share and the head source " +
        "stops dominating the mix. Integer allocation per source is " +
        "w * target div sum(w) (capped at the source's population); " +
        "the CONCRETE sample is then the allocation-prefix of each " +
        "source's docs under portable-hash order — deterministic, " +
        "uniform within source, reproducible across engines — " +
        "realized as a per-source rank window over (hash, doc_id). " +
        "Scale: the weight/allocation table is sources-cardinality " +
        "planner metadata (broadcast back); the rank pass shuffles " +
        "(source, hash, id) triples only, never text; per-source " +
        "rank state is one counter. Output binds the EXACT sample " +
        "identity into the gate: per source, the allocation, the " +
        "realized sample size and the sum of sampled doc_ids.",
      (s, dir) => {
        val target = 120L
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
        val counts = d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w", expr("CAST(floor(sqrt(n_docs)) AS BIGINT)"))
        val tot = counts.agg(sum(col("w")).as("wsum"))
        val alloc = counts.crossJoin(broadcast(tot))
          .withColumn("alloc",
            least(col("n_docs"), expr(s"w * $target div wsum")))
        val ranked = d
          .withColumn("h",
            Portable.pmd5(concat(lit("mix:"), col("doc_id").cast("string"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("h"), col("doc_id"))))
        ranked.join(broadcast(alloc.select(col("source"), col("n_docs"),
            col("w"), col("alloc"))), "source")
          .filter(col("rk") <= col("alloc"))
          .groupBy(col("source"), col("n_docs"), col("w"), col("alloc"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("doc_id")).as("sum_sampled_ids"))
      },
      Some(s"""
        WITH counts AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(floor(sqrt(count(*))) AS BIGINT) AS w
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM counts),
        alloc AS (
          SELECT source, n_docs, w,
                 least(n_docs, w * 120 // wsum) AS alloc
          FROM counts, tot),
        ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY
                   ${Portable.pmd5Sql("concat('mix:', CAST(doc_id AS VARCHAR))")},
                   doc_id) AS rk
          FROM documents)
        SELECT a.source, a.n_docs, a.w, a.alloc,
               CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(r.doc_id) AS BIGINT) AS sum_sampled_ids
        FROM ranked r JOIN alloc a ON r.source = a.source
        WHERE r.rk <= a.alloc
        GROUP BY a.source, a.n_docs, a.w, a.alloc"""))
  )
}
