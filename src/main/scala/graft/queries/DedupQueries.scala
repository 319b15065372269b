package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Portable, TextAnalysis => TA}
import graft.operators.{Dedup, Graph}
import graft.queries.Tables.{spread, t}

/** Deduplication queries over `documents`: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. North-star operators (BASELINE.json); the reference's
  * only dedup is best-file-per-company (src/transform.py:109-145), which
  * q06 covers — these generalize it to content-based near-dup at scale.
  */
object DedupQueries {

  private[queries] val K = 16          // minhash family size
  private[queries] val RPB = 4         // rows per LSH band -> 4 bands
  private[queries] val NB = K / RPB
  private[queries] val SHINGLE = 3     // words per shingle
  private[queries] val JT = 0.8        // near-dup verification threshold
  private val KCORE_K = 2      // q131: minimum in-core degree
  private val KCORE_ROUNDS = 6 // q131: fixed peel rounds (GraphSpec: >= depth)
  private val PR_ITERS = 5    // q70 power-iteration rounds
  private val LPA_ROUNDS = 3  // q148 synchronous label-propagation rounds

  // q152 admission-gate thresholds (basis points / tokens). Set so the
  // harness corpus genuinely splits: the short-doc gate and the
  // near-dup gate each reject sources at sf0.01 (values re-measured in
  // the q152 doc-string claim).
  private val GATE_SHORT_TOKENS = 20
  private val GATE_SHORT_MAX_BP = 1500
  private val GATE_DIV_MIN_BP = 2000
  private val GATE_ND_MAX_BP = 1500

  /** q59 corpus slice (doc_id < SSJOIN_SCOPE). The harness's synthetic
    * corpus is adversarially PAIR-DENSE for an exact-complete ssjoin:
    * ~25% of ALL document pairs share 80% vocabulary (template
    * renders; word order differs, so shingle-LSH passes them over),
    * which makes the verified-pair OUTPUT itself quadratic in the
    * slice — at 500 docs q59 already emits every one of those pairs.
    * A real web corpus has ppm-level pair density, where the
    * prefix-join fan-out (bounded by rare-first prefixes), not the
    * answer size, is the cost — so the scope is a harness-density
    * knob, not an algorithmic limit; PrefixSsjoinSpec proves
    * completeness on an adversarial template corpus independent of
    * this slice and at a second threshold (3/4). */
  private val SSJOIN_SCOPE = 500

  /** DuckDB: m0..m15 minhash columns from a hash list column. */
  private def minhashColsSql(hs: String = "hs"): String =
    (0 until K).map(i => s"${Portable.minhashSql(i, hs)} AS m$i").mkString(",\n               ")

  private def bandExprSql(b: Int): String = {
    val parts = (b * RPB until (b + 1) * RPB).map(i => s"CAST(m$i AS VARCHAR)").mkString(", ")
    Portable.pmd5Sql(s"concat_ws(',', $parts)")
  }

  private val sigCte = s"""
        WITH sig AS (
          SELECT doc_id, ${minhashColsSql()}
          FROM (SELECT doc_id, ${Portable.shingleHashesFromTokensSql("th")} AS hs
                FROM (SELECT doc_id, ${Portable.tokenHashesSql("text")} AS th
                      FROM documents)))"""

  /** The q28 LSH-verified near-dup pair pipeline, shared with q48's
    * transitive clustering: band-key equi-join candidates, exact
    * token-set Jaccard verification at [[JT]]. */
  private def lshVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    // the testdata table is one small parquet file = one input split;
    // spread rows before the (expensive) signature projection so all
    // cores shingle+hash — on a real corpus the file count does this
    val docs = spread(t(s, dir, "documents"), col("doc_id"))
    lshVerifiedPairsFrom(bandedOf(docs), tokenSetsOf(docs))
  }

  /** The corpus-width minhash+banding pass — THE expensive text scan
    * of the LSH family. Factored out so multi-stage queries (q160's
    * funnel) compute it ONCE, persist, and feed every stage that needs
    * band keys, instead of re-scanning the corpus per stage. */
  private def bandedOf(docs: DataFrame): DataFrame =
    Dedup.bandKeys(Dedup.minhashSignature(docs, "text", K, SHINGLE), K, RPB)

  /** Token-set projection for Jaccard verification — the second
    * corpus-width text pass, shared the same way. */
  private def tokenSetsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))

  /** [[lshVerifiedPairs]] over ALREADY-COMPUTED band keys and token
    * sets (possibly persisted by the caller). */
  private def lshVerifiedPairsFrom(banded: DataFrame, sets: DataFrame): DataFrame = {
    val cands = Dedup.lshCandidates(banded, "doc_id", NB)
    cands
      .join(sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed("ts", "ts_a"), "id_a")
      .join(sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed("ts", "ts_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("ts_a"), col("ts_b")).as("jaccard"))
      .filter(col("jaccard") >= JT)
  }

  /** DuckDB twin of [[lshVerifiedPairs]] as a `pairs` CTE. */
  private[queries] val pairsCte = s"""$sigCte,
        banded AS (
          SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")}
          FROM sig),
        bk AS (
          ${(0 until NB).map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
        sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents),
        pairs AS (
          SELECT id_a, id_b,
                 CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                   / len(list_distinct(a.ts || b.ts)) AS jaccard
          FROM cand JOIN sets a ON cand.id_a = a.doc_id
                    JOIN sets b ON cand.id_b = b.doc_id
          WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                   / len(list_distinct(a.ts || b.ts)) >= $JT)"""

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q26_exact_dedup",
      "Exact dedup via hash-groupBy on two independently-salted 60-bit " +
        "content hashes (16-byte compound key, ~2^-120 pair collision): " +
        "one representative (min doc_id) + copy count per distinct " +
        "text. The shuffle key never carries the document body.",
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "text", "doc_id"),
      Some(s"""
        SELECT ${Portable.pmd5Sql("text")} AS text_hash,
               ${Portable.pmd5SaltedSql(1, "text")} AS text_hash2,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q122_dedup_survival",
      "Per-source exact-dedup survival — the 'dedup pressure' " +
        "diagnostic a crawl-mix owner reads before retraining: docs " +
        "whose doc_id is the keeper (min over its content-hash group, " +
        "q26's rule) counted per source, as survivors, total, and " +
        "survival basis points. Low survival = the source is mostly " +
        "re-crawl of content seen elsewhere. Shuffles the 16-byte " +
        "hash key + 8-byte ids only; source-cardinality output.",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val keep = Dedup.exact(d, "text", "doc_id")
          .select(col("keep_id").as("doc_id"))
        val keptAgg = d.select(col("source"), col("doc_id"))
          .join(keep, Seq("doc_id"), "left_semi")
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept0"))
        // left join from totals: a source whose every doc lost to a
        // smaller keeper elsewhere still reports (survival 0), it
        // must not vanish from the diagnostic
        d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .join(keptAgg, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_kept0"), lit(0L)).as("n_kept"),
            expr("coalesce(n_kept0, 0) * 10000 div n_docs").as("survival_bp"))
      },
      Some(s"""
        WITH keep AS (
          SELECT min(doc_id) AS doc_id
          FROM documents
          GROUP BY ${Portable.pmd5Sql("text")}, ${Portable.pmd5SaltedSql(1, "text")}),
        kept AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept0
          FROM documents d JOIN keep USING (doc_id)
          GROUP BY source),
        tot AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source)
        SELECT source, n_docs,
               coalesce(n_kept0, 0) AS n_kept,
               coalesce(n_kept0, 0) * 10000 // n_docs AS survival_bp
        FROM tot LEFT JOIN kept USING (source)""")),
    // ----------------------------------------------------------------
    Q(
      "q27_minhash_bands",
      s"MinHash signatures ($K salted hashes over $SHINGLE-word " +
        s"shingles) folded into $NB LSH band keys per document.",
      (s, dir) => {
        val sig = Dedup.minhashSignature(t(s, dir, "documents"), "text", K, SHINGLE)
        Dedup.bandKeys(sig, K, RPB)
          .select(col("doc_id") +: (0 until NB).map(b => col(s"b$b")): _*)
      },
      Some(s"""$sigCte
        SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")}
        FROM sig""")),
    // ----------------------------------------------------------------
    Q(
      "q28_lsh_dup_pairs",
      "MinHash-LSH near-dup pipeline: band-key equi-join generates " +
        "candidate pairs (no cross product), exact token-set Jaccard " +
        s"verifies at threshold $JT.",
      (s, dir) => lshVerifiedPairs(s, dir),
      Some(s"""$pairsCte
        SELECT id_a, id_b, jaccard FROM pairs""")),
    // ----------------------------------------------------------------
    Q(
      "q48_neardup_components",
      "Transitive near-dup clustering: connected components (large-" +
        "star/small-star to fixpoint) over the q28 LSH-verified pair " +
        "graph — a duplicate chain A~B~C lands in ONE cluster even " +
        "though A and C share no edge. Output: every clustered doc " +
        "with its component representative (min doc_id).",
      (s, dir) =>
        Dedup.connectedComponents(lshVerifiedPairs(s, dir))
          .select(col("id").as("doc_id"), col("comp")),
      Some(s"""${pairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b, id_a FROM pairs),
        walk(id, r) AS (
          SELECT src, src FROM sym
          UNION
          SELECT w.id, s.dst FROM walk w JOIN sym s ON w.r = s.src)
        SELECT id AS doc_id, MIN(r) AS comp FROM walk GROUP BY id""")),
    // ----------------------------------------------------------------
    Q(
      "q131_kcore",
      s"$KCORE_K-core of the near-dup pair graph: $KCORE_ROUNDS fixed " +
        "peeling rounds drop every doc whose surviving degree is " +
        s"< $KCORE_K and re-restrict the edges, leaving only CYCLIC " +
        "duplication structure — template families and boilerplate " +
        "rings — where q48's components also keep incidental chains. " +
        "The k-core is UNIQUE (peeling order can't change it), so the " +
        "plan-time round count just has to cover the peel depth: " +
        "GraphSpec asserts rounds and rounds+1 agree at test scale, " +
        "and a production run with unknown depth loops driver-side " +
        "until the edge count stabilizes (each round already " +
        "materializes CC-style, so plan depth is constant). Each " +
        "round is one count agg on 8-byte node ids " +
        "plus two semi-joins against the shrinking survivor set — " +
        "nothing ever grows. Output: surviving docs with their " +
        "in-core degree, plus the convergence CERTIFICATE at_fixpoint " +
        "(at the true k-core every survivor has degree >= k, so any " +
        "false row is proof the fixed round count undershot the peel " +
        "depth — truncation shows in the data instead of silently " +
        "passing the mirrored-oracle compare).",
      (s, dir) =>
        Graph.kCore(lshVerifiedPairs(s, dir), k = KCORE_K, rounds = KCORE_ROUNDS)
          .withColumn("at_fixpoint", col("core_degree") >= KCORE_K),
      Some {
        val peels = (1 to KCORE_ROUNDS).map { r =>
          s"""k$r AS MATERIALIZED (
          SELECT src AS node FROM (
            SELECT src, count(*) AS n FROM e${r - 1} GROUP BY src)
          WHERE n >= $KCORE_K),
        e$r AS MATERIALIZED (
          SELECT e.src, e.dst FROM e${r - 1} e
          JOIN k$r a ON e.src = a.node
          JOIN k$r b ON e.dst = b.node)"""
        }.mkString(",\n        ")
        s"""$pairsCte,
        e0 AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs),
        $peels
        SELECT src AS id, CAST(count(*) AS BIGINT) AS core_degree,
               CAST(count(*) AS BIGINT) >= $KCORE_K AS at_fixpoint
        FROM e$KCORE_ROUNDS GROUP BY src"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q82_cluster_representatives",
      "Canonical-document selection — the KEEP side of transitive " +
        "dedup: per q48 near-dup component, the representative the " +
        "cluster collapses to (most characters wins; lowest doc_id " +
        "breaks ties — an integer argmax, so every engine picks the " +
        "same doc). Output per component: representative and member " +
        "count. Same component machinery as q48; the argmax is ONE " +
        "grouped aggregation (count + min(struct(-n_chars, doc_id)) — " +
        "the struct's lexicographic order IS the (chars DESC, id ASC) " +
        "pick, and doc_id is a total tiebreak), shuffling 24 " +
        "bytes/doc once; r16's spelling paid a second groupBy plus an " +
        "equi-join back onto a persisted member frame for the same " +
        "rows (r17, guide §2.4 — one Exchange instead of three).",
      (s, dir) => {
        val comps = Dedup.connectedComponents(lshVerifiedPairs(s, dir))
          .select(col("id").as("doc_id"), col("comp"))
        comps
          .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
            "doc_id")
          .groupBy(col("comp"))
          .agg(count(lit(1)).as("n_members"),
            min(struct((-col("n_chars")).as("nc"), col("doc_id").as("d")))
              .as("__w"))
          .select(col("comp"), col("__w.d").as("rep_id"), col("n_members"))
      },
      Some(s"""${pairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b, id_a FROM pairs),
        walk(id, r) AS (
          SELECT src, src FROM sym
          UNION
          SELECT w.id, s.dst FROM walk w JOIN sym s ON w.r = s.src),
        comps AS (SELECT id AS doc_id, MIN(r) AS comp FROM walk GROUP BY id),
        j AS (
          SELECT c.doc_id, c.comp, d.n_chars
          FROM comps c JOIN documents d USING (doc_id)),
        st AS (
          SELECT comp, count(*) AS n_members, max(n_chars) AS max_chars
          FROM j GROUP BY 1)
        SELECT j.comp, min(j.doc_id) AS rep_id, n_members
        FROM j JOIN st USING (comp)
        WHERE n_chars = max_chars
        GROUP BY j.comp, n_members""")),
    // ----------------------------------------------------------------
    Q(
      "q123_leakage_safe_split",
      "Leakage-safe train/val/test assignment — the reason dedup runs " +
        "BEFORE splitting: each document's split is a portable-hash " +
        "bucket (90/5/5) of its near-dup COMPONENT representative " +
        "(q48's min-id; unclustered docs represent themselves), so two " +
        "near-duplicates — even a chain A~B~C where A and C share no " +
        "edge — can never land on opposite sides of the eval boundary. " +
        "Membership is a pure function of the representative: " +
        "reproducible across runs, engines and partitionings, and new " +
        "data never reassigns an old doc unless its cluster merges. " +
        "The CC pass is the paid cost (q48, one job per round); the " +
        "assignment itself is a doc_id equi-join against the clustered " +
        "subset plus a per-row hash — no new shuffle class at 100 TB.",
      (s, dir) => {
        val comps = Dedup.connectedComponents(lshVerifiedPairs(s, dir))
          .select(col("id").as("doc_id"), col("comp"))
        t(s, dir, "documents").select(col("doc_id"))
          .join(comps, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("rep"))
          .withColumn("bucket",
            Portable.pmd5(concat(lit("split:"), col("rep").cast("string"))) % 100)
          .select(col("doc_id"), col("rep"),
            when(col("bucket") < 90, "train")
              .when(col("bucket") < 95, "val")
              .otherwise("test").as("split"))
      },
      Some(s"""${pairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b, id_a FROM pairs),
        walk(id, r) AS (
          SELECT src, src FROM sym
          UNION
          SELECT w.id, s.dst FROM walk w JOIN sym s ON w.r = s.src),
        comps AS (SELECT id AS doc_id, MIN(r) AS comp FROM walk GROUP BY id),
        rep AS (
          SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS rep
          FROM documents d LEFT JOIN comps c USING (doc_id))
        SELECT doc_id, rep,
               CASE
                 WHEN ${Portable.pmd5Sql("concat('split:', CAST(rep AS VARCHAR))")} % 100 < 90 THEN 'train'
                 WHEN ${Portable.pmd5Sql("concat('split:', CAST(rep AS VARCHAR))")} % 100 < 95 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM rep""")),
    // ----------------------------------------------------------------
    Q(
      "q84_minhash_accuracy",
      s"Sketch-accuracy audit: for every LSH candidate pair, the " +
        s"MinHash ESTIMATE of Jaccard (fraction of the $K signature " +
        "slots agreeing) next to the exact token-set value — the " +
        "measurement that justifies (or indicts) the sketch family's " +
        "K before a full-corpus run commits to it. Signature compare " +
        "is K integer equalities per candidate; the exact verify " +
        "reuses the token sets the pipeline already builds.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sig = Dedup.bandKeys(
          Dedup.minhashSignature(docs, "text", K, SHINGLE), K, RPB)
          .persist()
        val cands = Dedup.lshCandidates(sig, "doc_id", NB)
        val sigA = sig.select(
          col("doc_id").as("id_a") +: (0 until K).map(i => col(s"m$i").as(s"a$i")): _*)
        val sigB = sig.select(
          col("doc_id").as("id_b") +: (0 until K).map(i => col(s"m$i").as(s"b$i")): _*)
        val sets = docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ts"))
        val agree = (0 until K)
          .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
          .reduce(_ + _)
        cands
          .join(sigA, "id_a").join(sigB, "id_b")
          .join(sets.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            (agree.cast("double") / K).as("est_jaccard"),
            Dedup.jaccard(col("ts_a"), col("ts_b")).as("jaccard"))
      },
      Some(s"""$sigCte,
        banded AS (
          SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")},
                 ${(0 until K).map(i => s"m$i").mkString(", ")}
          FROM sig),
        bk AS (
          ${(0 until NB).map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
        sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents)
        SELECT id_a, id_b,
               CAST(${(0 until K)
                 .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
                 .mkString(" + ")} AS DOUBLE) / $K AS est_jaccard,
               CAST(len(list_intersect(sa.ts, sb.ts)) AS DOUBLE)
                 / (len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts))) AS jaccard
        FROM cand JOIN sig a ON cand.id_a = a.doc_id
                  JOIN sig b ON cand.id_b = b.doc_id
                  JOIN sets sa ON cand.id_a = sa.doc_id
                  JOIN sets sb ON cand.id_b = sb.doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "q87_source_contamination",
      "Cross-source duplication matrix: q28's verified near-dup pairs " +
        "bucketed by unordered source pair — which sources copy which " +
        "(mirror sites, syndication, scraper overlap). The input is " +
        "the already-bounded pair set; the source lookup is a " +
        "broadcast-size dim join, and the matrix is at most " +
        "sources^2/2 rows regardless of corpus size.",
      (s, dir) => {
        val pairs = lshVerifiedPairs(s, dir).select(col("id_a"), col("id_b"))
        val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
          .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""$pairsCte,
        src AS (SELECT doc_id, source FROM documents)
        SELECT least(a.source, b.source) AS source_a,
               greatest(a.source, b.source) AS source_b,
               count(*) AS n_pairs
        FROM pairs JOIN src a ON pairs.id_a = a.doc_id
                   JOIN src b ON pairs.id_b = b.doc_id
        GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q89_crosslang_neardup",
      "Cross-language near-dup detection: q30's character-3-gram LSH " +
        "pipeline, restricted to pairs whose language LABELS disagree " +
        "— mislabeled duplicates and boilerplate that survives " +
        "translation-ish rewrites. Char grams are the lang-agnostic " +
        "signal word-level shingles can't give; threshold 0.8 with " +
        "the same size-band gate and sorted-merge verify.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val withSet = docs.select(col("doc_id"), col("lang"),
          array_sort(Dedup.charNgramHashes(col("text"), 3)).as("gs"))
          .withColumn("sz", size(col("gs")))
          .persist()
        val banded = Dedup.bandKeys(
          Dedup.minhashFromHashes(
            withSet.filter(col("sz") > 0).select("doc_id", "gs"), "gs", K),
          K, RPB)
        val cands = Dedup.lshCandidates(banded, "doc_id", NB)
        val sets = withSet.select(col("doc_id"), col("lang"), col("gs"), col("sz"))
        val inter = graft.expressions.SortedIntersectSize(s, col("gs_a"), col("gs_b"))
        cands
          .join(sets.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
            col("gs").as("gs_a"), col("sz").as("sz_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
            col("gs").as("gs_b"), col("sz").as("sz_b")), "id_b")
          .filter(col("lang_a") =!= col("lang_b"))
          .select(col("id_a"), col("id_b"), col("lang_a"), col("lang_b"),
            when(
              col("sz_a").cast("double") >= col("sz_b") * 0.8 &&
                col("sz_b").cast("double") >= col("sz_a") * 0.8,
              inter.cast("double") / (col("sz_a") + col("sz_b") - inter))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.8)
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, lang, gs, len(gs) AS sz
          FROM (SELECT doc_id, lang,
                 ${graft.operators.Dedup.charNgramHashesSql("text", 3)} AS gs
                FROM documents)),
        sig AS (
          SELECT doc_id, ${minhashColsSql("gs")}
          FROM g WHERE sz > 0),
        banded AS (
          SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")}
          FROM sig),
        bk AS (
          ${(0 until NB).map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
        SELECT id_a, id_b, lang_a, lang_b, jaccard FROM (
          SELECT id_a, id_b, a.lang AS lang_a, b.lang AS lang_b,
                 CASE WHEN CAST(a.sz AS DOUBLE) >= b.sz * 0.8
                       AND CAST(b.sz AS DOUBLE) >= a.sz * 0.8
                      THEN CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                             / (a.sz + b.sz - len(list_intersect(a.gs, b.gs)))
                      END AS jaccard
          FROM cand JOIN g a ON cand.id_a = a.doc_id
                    JOIN g b ON cand.id_b = b.doc_id
          WHERE a.lang != b.lang)
        WHERE jaccard >= 0.8""")),
    // ----------------------------------------------------------------
    Q(
      "q29_simhash",
      "60-bit SimHash signature per document over distinct-token " +
        "hashes (bit-majority vote).",
      (s, dir) =>
        spread(t(s, dir, "documents"), col("doc_id")).select(
          col("doc_id"),
          Dedup.simhash(s, col("text")).as("simhash")),
      Some(s"""
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 60), j ->
                 CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0
                      THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
        FROM (SELECT doc_id,
                     list_transform(list_distinct(string_split(text, ' ')),
                                    tk -> ${Portable.pmd5Sql("tk")}) AS hs
              FROM documents)""")),
    // ----------------------------------------------------------------
    Q(
      "q30_ngram_jaccard",
      "Character 3-gram Jaccard near-dup pairs: candidates come from " +
        s"MinHash-LSH band keys ($K hashes, $NB bands) computed over " +
        "the SAME 3-gram hash set the verifier measures, then exact " +
        "set verification at 0.9. Band-key equi-join candidates keep " +
        "pair work bounded as the corpus grows — a low-cardinality " +
        "(lang, source) block would be quadratic in corpus size " +
        "(pairs at J>=0.9 share a band with p ~ 0.99).",
      (s, dir) => {
        // single-file table: spread before the n-gram projection;
        // hashed n-grams SORTED once per row so the verification is a
        // native two-pointer merge (no per-pair hash set)
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        // materialize the projection: it feeds the signature pipeline
        // and both verify-phase joins — unmaterialized, Spark
        // recomputes the hashing 3-4x. persist keeps lineage and the
        // bench/verify harness frees it via clearCache between queries.
        // (At real corpus scale this materializes to storage: same idea.)
        val withSet = docs.select(col("doc_id"),
          array_sort(Dedup.charNgramHashes(col("text"), 3)).as("gs"))
          .withColumn("sz", size(col("gs")))
          .persist()

        // candidate phase: minhash the 3-gram set, band, equi-join on
        // (band, key). Empty sets are excluded — their all-sentinel
        // signature would otherwise form one degenerate all-pairs
        // bucket, and an empty set can never reach J >= 0.9 anyway.
        val banded = Dedup.bandKeys(
          Dedup.minhashFromHashes(
            withSet.filter(col("sz") > 0).select("doc_id", "gs"), "gs", K),
          K, RPB)
        val cands = Dedup.lshCandidates(banded, "doc_id", NB)

        // verify phase: arrays fetched only for candidate pairs (plain
        // id equi-joins — AQE broadcasts a side when it is small; a
        // hint would force shipping the whole gs table at corpus
        // scale). The size band is a NECESSARY condition for
        // jaccard >= 0.9 (min(|A|,|B|) >= 0.9*max), and gating the
        // merge-walk behind `when` keeps Catalyst from reordering the
        // expensive intersect in front of it.
        val sets = withSet.select(col("doc_id"), col("gs"), col("sz"))
        val inter = graft.expressions.SortedIntersectSize(s, col("gs_a"), col("gs_b"))
        cands
          .join(sets.select(col("doc_id").as("id_a"),
            col("gs").as("gs_a"), col("sz").as("sz_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"),
            col("gs").as("gs_b"), col("sz").as("sz_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            when(
              col("sz_a").cast("double") >= col("sz_b") * 0.9 &&
                col("sz_b").cast("double") >= col("sz_a") * 0.9,
              inter.cast("double") / (col("sz_a") + col("sz_b") - inter))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.9)
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, gs, len(gs) AS sz
          FROM (SELECT doc_id,
                 ${graft.operators.Dedup.charNgramHashesSql("text", 3)} AS gs
                FROM documents)),
        sig AS (
          SELECT doc_id, ${minhashColsSql("gs")}
          FROM g WHERE sz > 0),
        banded AS (
          SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")}
          FROM sig),
        bk AS (
          ${(0 until NB).map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM bk l JOIN bk r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
        SELECT id_a, id_b, jaccard FROM (
          SELECT id_a, id_b,
                 CASE WHEN CAST(a.sz AS DOUBLE) >= b.sz * 0.9
                       AND CAST(b.sz AS DOUBLE) >= a.sz * 0.9
                      THEN CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                             / (a.sz + b.sz - len(list_intersect(a.gs, b.gs)))
                      END AS jaccard
          FROM cand JOIN g a ON cand.id_a = a.doc_id
                    JOIN g b ON cand.id_b = b.doc_id)
        WHERE jaccard >= 0.9""")),
    // ----------------------------------------------------------------
    Q(
      "q58_decontaminate",
      "Train/eval decontamination: training docs (doc_id >= 100) whose " +
        "content near-duplicates a held-out eval doc (doc_id < 100) — " +
        "MinHash-LSH band keys joined ACROSS the two sets (no cross " +
        s"product; the small eval side broadcasts), exact token-set " +
        s"Jaccard verified at $JT. The standard pre-training leakage " +
        "check, built from the same signature family as q28.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        // the doc_id filters sit BELOW the signature projection, so the
        // corpus is signed exactly once across the two branches
        val banded = Dedup.bandKeys(
          Dedup.minhashSignature(docs, "text", K, SHINGLE), K, RPB)
        val cands = Dedup.lshCandidatesAcross(
          banded.filter(col("doc_id") >= 100),
          banded.filter(col("doc_id") < 100), "doc_id", NB)
          .select(col("id_l").as("train_id"), col("id_r").as("eval_id"))
        val sets = docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ts"))
        cands
          .join(sets.select(col("doc_id").as("train_id"), col("ts").as("ts_t")), "train_id")
          .join(sets.select(col("doc_id").as("eval_id"), col("ts").as("ts_e")), "eval_id")
          .select(col("train_id"), col("eval_id"),
            Dedup.jaccard(col("ts_t"), col("ts_e")).as("jaccard"))
          .filter(col("jaccard") >= JT)
      },
      Some(s"""$sigCte,
        banded AS (
          SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")}
          FROM sig),
        bk AS (
          ${(0 until NB).map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT l.doc_id AS train_id, r.doc_id AS eval_id
          FROM bk l JOIN bk r ON l.band = r.band AND l.key = r.key
          WHERE l.doc_id >= 100 AND r.doc_id < 100),
        sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents)
        SELECT train_id, eval_id, jaccard FROM (
          SELECT train_id, eval_id,
                 CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                   / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS jaccard
          FROM cand JOIN sets a ON cand.train_id = a.doc_id
                    JOIN sets b ON cand.eval_id = b.doc_id)
        WHERE jaccard >= $JT""")),
    // ----------------------------------------------------------------
    Q(
      "q59_prefix_ssjoin",
      "Prefix-filtering set-similarity join (ssjoin/PPJoin family): " +
        "tokens ordered rare-first by global frequency; a pair at " +
        "Jaccard >= 4/5 must share a token inside each side's " +
        "|T|-ceil(0.8|T|)+1 prefix, so the prefix equi-join is an " +
        "EXACT-COMPLETE candidate generator — the deterministic " +
        "counterpart to q28's probabilistic LSH. Rational threshold " +
        "keeps the prefix length in exact integer arithmetic. Scoped " +
        "to a SSJOIN_SCOPE-doc slice — a harness-density knob (see " +
        "the constant's rationale), not an algorithmic limit: the " +
        "synthetic corpus is template-heavy (~25% of ALL pairs share " +
        "80% vocabulary — word order differs, so shingle-LSH skips " +
        "them), and completeness means the output IS every such pair; " +
        "a real corpus has ppm-level density.",
      (s, dir) =>
        Dedup.prefixFilterPairs(
          spread(t(s, dir, "documents").filter(col("doc_id") < SSJOIN_SCOPE),
            col("doc_id")),
          "text", "doc_id", tNum = 4, tDen = 5),
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
          FROM documents WHERE doc_id < $SSJOIN_SCOPE),
        dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
        sorted AS (
          SELECT doc_id, list(tok ORDER BY df, tok) AS ts,
                 CAST(count(*) AS BIGINT) AS sz
          FROM toks JOIN dfreq USING (tok) GROUP BY doc_id),
        pre AS (
          SELECT doc_id,
                 unnest(list_slice(ts, 1, CAST(sz - ((4*sz + 4) // 5) + 1 AS INTEGER))) AS ptok
          FROM sorted),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM pre l JOIN pre r ON l.ptok = r.ptok AND l.doc_id < r.doc_id)
        SELECT id_a, id_b,
               CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                 / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS jaccard
        FROM cand JOIN sorted a ON cand.id_a = a.doc_id
                  JOIN sorted b ON cand.id_b = b.doc_id
        WHERE len(list_intersect(a.ts, b.ts)) * 5 >=
              4 * (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))""")),
    // ----------------------------------------------------------------
    Q(
      "q49_simhash_hamming",
      "SimHash Hamming near-dup pairs — the consumer of q29's " +
        "signatures: each 60-bit signature is pigeonholed into 4 " +
        "15-bit band keys (Hamming <= 3 forces at least one identical " +
        "band, so the band equi-join is a complete, non-cartesian " +
        "candidate generator), then one xor+popcount per candidate " +
        "verifies the distance.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val sigs = docs.select(col("doc_id"),
          Dedup.simhash(s, col("text")).as("sig"))
        Dedup.simhashHammingPairs(sigs, "doc_id", "sig",
          maxHamming = 3, bands = 4, bandBits = 15)
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
            .mkString("\n          UNION ALL ")})
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
               CAST(bit_count(xor(l.sig, r.sig)) AS INTEGER) AS hamming
        FROM bk l JOIN bk r
          ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.sig, r.sig)) <= 3""")),
    // ----------------------------------------------------------------
    Q(
      "q70_pagerank",
      "PageRank over the near-dup graph (q28's verified pairs, " +
        s"symmetrized): $PR_ITERS damped power-iteration rounds, " +
        "r = 0.15 + 0.85 * sum of in-neighbor shares — surfaces the " +
        "CENTER of each duplicate cluster (the doc most connected to " +
        "other near dups), a finer signal than q48's flat components " +
        "for choosing cluster representatives. Each round is one edge " +
        "equi-join + one aggregation keyed on the 8-byte node id; " +
        "contributions fold in ascending neighbor order so every " +
        "double is bit-reproducible (the k-means trick). No driver-" +
        "side iteration over data — only the round count is driver-" +
        "controlled, like trainIvfCentroids.",
      (s, dir) =>
        // operators.Graph.pageRank: edge list persisted pre-partitioned
        // on src (all rounds reuse one partitioning, freed by the
        // harness clearCache contract); at PR_ITERS <= the default
        // truncation stride the plan is the plain unrolled form the
        // oracle mirrors, while a 30-iteration production run truncates
        // its plan every 5 rounds (GraphSpec proves bit-equality)
        Graph.pageRank(lshVerifiedPairs(s, dir).select("id_a", "id_b"),
            iters = PR_ITERS)
          .select(col("id").as("doc_id"), col("r").as("pagerank")),
      Some(s"""$pairsCte,
        sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
        pr0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) AS r FROM deg),
        ${(1 to PR_ITERS).map(t => s"""
        pr$t AS (
          SELECT dst AS id,
                 0.15 + 0.85 * list_reduce(
                   list_prepend(CAST(0 AS DOUBLE), list(r / deg ORDER BY src)),
                   (acc, x) -> acc + x) AS r
          FROM sym JOIN deg USING (src) JOIN pr${t - 1} p ON p.id = sym.src
          GROUP BY dst)""").mkString(",")}
        SELECT id AS doc_id, r AS pagerank FROM pr$PR_ITERS""")),
    // ----------------------------------------------------------------
    Q(
      "q110_novelty_rate",
      "Cross-snapshot n-gram novelty — the ingest-side complement of " +
        "q58's decontamination: treating two hash-halves of the corpus " +
        "as yesterday's corpus (A) and today's batch (B), the fraction " +
        "of B's distinct 3-word shingles unseen ANYWHERE in A, per " +
        "source, in integer basis points. Low novelty = the batch is " +
        "mostly re-crawl; high = genuinely new text. Grams travel as " +
        "8-byte hashes from the scan stage on (text never shuffles); " +
        "the anti-join is q58's cost class, and at corpus scale the " +
        "A side is the persisted gram index the ingest gate already " +
        "maintains, not a rescan.",
      (s, dir) => {
        // the gram expression stays INLINE in the generator, and the
        // A/B branches re-run the scan, on measurement: the runtime
        // subexpression cache already evaluates the token-hash array
        // once per row, so hoisting __th/__hs behind withColumn
        // projections only adds interpreted array copies (0.9 s ->
        // 3.4 s warm at sf0.1), and persisting the exploded gram frame
        // is worse still (4.7 s) — ~tokens cached rows plus losing the
        // scan-fused filter+distinct
        val d = spread(t(s, dir, "documents"), col("doc_id"))
          .select(col("source"),
            (Portable.pmd5(concat(lit("d:"), col("doc_id").cast("string"))) % 2)
              .as("half"),
            explode(Portable.shingleHashesFromTokens(
              Portable.tokenHashes(col("text")))).as("g"))
        val a = d.filter(col("half") === 0).select(col("g")).distinct()
        val b = d.filter(col("half") === 1).select(col("source"), col("g")).distinct()
        val novel = b.join(a, Seq("g"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_novel"))
        b.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
          .join(novel, Seq("source"), "left")
          .select(col("source"), col("n_grams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            expr("coalesce(n_novel, 0) * 10000 div n_grams").as("novelty_bp"))
      },
      Some(s"""
        WITH th AS (
          SELECT doc_id, source,
                 ${Portable.pmd5Sql("concat('d:', CAST(doc_id AS VARCHAR))")} % 2 AS half,
                 ${Portable.tokenHashesSql("text")} AS th
          FROM documents),
        g AS (
          SELECT source, half, unnest(${Portable.shingleHashesFromTokensSql("th")}) AS g
          FROM th),
        a AS (SELECT DISTINCT g FROM g WHERE half = 0),
        b AS (SELECT DISTINCT source, g FROM g WHERE half = 1),
        n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM b GROUP BY source),
        nov AS (
          SELECT b.source, CAST(count(*) AS BIGINT) AS n_novel
          FROM b LEFT JOIN a ON b.g = a.g
          WHERE a.g IS NULL GROUP BY b.source)
        SELECT source, n_grams,
               coalesce(n_novel, 0) AS n_novel,
               coalesce(n_novel, 0) * 10000 // n_grams AS novelty_bp
        FROM n LEFT JOIN nov USING (source)""")),
    // ----------------------------------------------------------------
    Q(
      "q148_label_propagation",
      "Deterministic label-propagation communities over the near-dup " +
        s"graph (q28's verified pairs): $LPA_ROUNDS synchronous " +
        "rounds, each node adopting its neighbors' most frequent " +
        "label with ties to the smallest — the cheap community signal " +
        "BETWEEN q48's flat components (LPA can split a chain the " +
        "transitive closure fuses) and q70's per-node centrality. " +
        "Each round is one pre-partitioned edge join plus two keyed " +
        "aggregations; the per-node argmax folds as min(struct(-n, " +
        "lbl)) — no window, no sort, 16 bytes per node per round — " +
        "and long runs truncate plan depth on the pageRank stride. " +
        "Output is the community roster: label, member count, id span.",
      (s, dir) =>
        Graph.labelPropagation(lshVerifiedPairs(s, dir).select("id_a", "id_b"),
            rounds = LPA_ROUNDS)
          .groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_members"),
            min(col("id")).as("min_doc"), max(col("id")).as("max_doc")),
      Some(s"""$pairsCte,
        sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM sym),
        ${(1 to LPA_ROUNDS).map(t => s"""
        l$t AS (
          SELECT id, lbl FROM (
            SELECT sym.dst AS id, p.lbl,
                   row_number() OVER (PARTITION BY sym.dst
                     ORDER BY count(*) DESC, p.lbl ASC) AS rnk
            FROM sym JOIN l${t - 1} p ON p.id = sym.src
            GROUP BY sym.dst, p.lbl)
          WHERE rnk = 1)""").mkString(",")}
        SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
               min(id) AS min_doc, max(id) AS max_doc
        FROM l$LPA_ROUNDS GROUP BY lbl""")),
    // ----------------------------------------------------------------
    Q(
      "q152_admission_gate",
      "Per-source corpus ADMISSION GATE — the go/no-go datasheet a " +
        "mixer consults before a source enters the training mix, " +
        "composing three gates of three cost classes: a short-doc " +
        s"share (< $GATE_SHORT_TOKENS tokens, <= $GATE_SHORT_MAX_BP " +
        "bp — one scan-stage projection), 3-gram diversity " +
        s"(>= $GATE_DIV_MIN_BP bp distinct/total, q120's " +
        "mode-collapse monitor — grams travel as 8-byte hashes), and " +
        s"near-dup incidence (docs in any q28 verified pair, <= " +
        s"$GATE_ND_MAX_BP bp — the LSH pipeline, already bounded). " +
        "All shares are integer basis points; `admitted` is the " +
        "conjunction, so the report carries both the verdict and " +
        "WHICH gate failed. Sources genuinely split on this corpus: " +
        "the short-doc and near-dup gates each reject some sources.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val perSrc = docs
          .select(col("source"),
            (size(split(col("text"), " ")) < GATE_SHORT_TOKENS).as("short"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("short"), 1L).otherwise(0L)).as("n_short"))
        val div = docs.select(col("source"),
            explode(Portable.shingleHashesFromTokens(
              Portable.tokenHashes(col("text")))).as("g"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_grams"), countDistinct(col("g")).as("n_distinct"))
        val touched = lshVerifiedPairs(s, dir)
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
          .join(t(s, dir, "documents").select(col("doc_id"), col("source")), "doc_id")
          .groupBy(col("source")).agg(count(lit(1)).as("n_neardup"))
        perSrc.join(div, Seq("source"))
          .join(touched, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            expr("n_short * 10000 div n_docs").as("short_bp"),
            expr("n_distinct * 10000 div n_grams").as("diversity_bp"),
            coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
            expr("coalesce(n_neardup, 0) * 10000 div n_docs").as("neardup_bp"))
          .withColumn("admitted",
            col("short_bp") <= GATE_SHORT_MAX_BP &&
              col("diversity_bp") >= GATE_DIV_MIN_BP &&
              col("neardup_bp") <= GATE_ND_MAX_BP)
      },
      Some(s"""$pairsCte,
        base AS (
          SELECT source,
                 CASE WHEN len(string_split(text, ' ')) < $GATE_SHORT_TOKENS
                      THEN 1 ELSE 0 END AS short
          FROM documents),
        ps AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(short) AS BIGINT) AS n_short
          FROM base GROUP BY source),
        g AS (
          SELECT source, unnest(${Portable.shingleHashesFromTokensSql("th")}) AS g
          FROM (SELECT source, ${Portable.tokenHashesSql("text")} AS th
                FROM documents)),
        dv AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
          FROM g GROUP BY source),
        tch AS (
          SELECT d.source, CAST(count(*) AS BIGINT) AS n_neardup
          FROM (SELECT DISTINCT doc_id FROM (
                  SELECT id_a AS doc_id FROM pairs
                  UNION ALL SELECT id_b FROM pairs)) t
          JOIN documents d ON d.doc_id = t.doc_id
          GROUP BY d.source),
        rpt AS (
          SELECT ps.source, n_docs,
                 n_short * 10000 // n_docs AS short_bp,
                 n_distinct * 10000 // n_grams AS diversity_bp,
                 coalesce(n_neardup, 0) AS n_neardup,
                 coalesce(n_neardup, 0) * 10000 // n_docs AS neardup_bp
          FROM ps JOIN dv USING (source) LEFT JOIN tch USING (source))
        SELECT source, n_docs, short_bp, diversity_bp, n_neardup, neardup_bp,
               (short_bp <= $GATE_SHORT_MAX_BP
                 AND diversity_bp >= $GATE_DIV_MIN_BP
                 AND neardup_bp <= $GATE_ND_MAX_BP) AS admitted
        FROM rpt""")),
    // ----------------------------------------------------------------
    Q(
      "q160_curation_funnel",
      "The end-to-end curation funnel — every stage a real pipeline " +
        "runs before training, SEQUENCED, with survivor counts and " +
        "retained bp at each cut: (0) raw corpus; (1) quality filter " +
        "(q24's exact composite at 0.5); (2) exact dedup keepers " +
        "(min doc per content digest, q26's rule); (3) near-dup " +
        "cluster representatives — q28's verified pairs RESTRICTED " +
        "to the surviving set, components to fixpoint, one rep each " +
        "(q48+q82's rule applied mid-funnel); (4) eval held-out and " +
        "contaminated train docs removed (q58's cross-set rule — a " +
        "per-doc predicate, so computing it on the full corpus " +
        "equals computing it on survivors). The one-line answer to " +
        "'how much data is left, and which stage ate it'. Every " +
        "stage reuses the proven operator and its oracle CTEs; the " +
        "funnel output is 5 rows at any corpus size.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val q1 = docs
          .filter(TA.qualityScore(col("text"), TA.EnMarkers) >= 0.5)
          .select(col("doc_id"), col("text"))
        val s2 = q1.select(col("doc_id"), Portable.pmd5(col("text")).as("h"))
          .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        // ONE corpus-width minhash/banding pass and ONE tokenization
        // pass for the whole funnel: stage 3's verified pairs AND
        // stage 4's decon banding read the same persisted frames —
        // at 100 TB the second full text scan was the funnel's
        // dominant avoidable cost (released by the Verify/Bench
        // clearCache convention after the terminal action)
        val banded = bandedOf(docs).persist()
        val sets = tokenSetsOf(docs).persist()
        val rp = lshVerifiedPairsFrom(banded, sets).select("id_a", "id_b")
          .join(s2.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
          .join(s2.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
        val nonrep = Dedup.connectedComponents(rp)
          .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
        val s3 = s2.join(nonrep, Seq("doc_id"), "left_anti")
        val cands = Dedup.lshCandidatesAcross(
          banded.filter(col("doc_id") >= 100),
          banded.filter(col("doc_id") < 100), "doc_id", NB)
          .select(col("id_l").as("train_id"), col("id_r").as("eval_id"))
        val contaminated = cands
          .join(sets.select(col("doc_id").as("train_id"), col("ts").as("ts_t")),
            "train_id")
          .join(sets.select(col("doc_id").as("eval_id"), col("ts").as("ts_e")),
            "eval_id")
          .filter(Dedup.jaccard(col("ts_t"), col("ts_e")) >= JT)
          .select("train_id").distinct()
        val s4 = s3.filter(col("doc_id") >= 100)
          .join(contaminated.withColumnRenamed("train_id", "doc_id"),
            Seq("doc_id"), "left_anti")
        def row(i: Int, name: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(i.toLong).as("stage"), lit(name).as("stage_name"),
              col("n_docs"))
        val stages = row(0, "raw", docs)
          .unionAll(row(1, "quality", q1))
          .unionAll(row(2, "exact_dedup", s2))
          .unionAll(row(3, "neardup_reps", s3))
          .unionAll(row(4, "decontaminated", s4))
        val n0 = docs.agg(count(lit(1)).as("n0"))
        stages.crossJoin(broadcast(n0))
          .select(col("stage"), col("stage_name"), col("n_docs"),
            expr("n_docs * 10000 div n0").as("retained_bp"))
          .orderBy("stage")
      },
      Some {
        val stopList = s"[${TA.EnMarkers.map(m => s"'$m'").mkString(", ")}]"
        s"""${pairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        q1 AS (
          SELECT doc_id FROM (
            SELECT doc_id,
                   least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
                     + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) * 0.4
                     + CAST(len(list_filter(string_split(text, ' '),
                         tk -> list_contains($stopList, tk))) AS DOUBLE)
                       / len(string_split(text, ' ')) * 0.2 AS score
            FROM documents)
          WHERE score >= 0.5),
        s2 AS (
          SELECT min(doc_id) AS doc_id
          FROM (SELECT doc_id, ${Portable.pmd5Sql("text")} AS h
                FROM documents WHERE doc_id IN (SELECT doc_id FROM q1))
          GROUP BY h),
        rp AS (
          SELECT id_a, id_b FROM pairs
          WHERE id_a IN (SELECT doc_id FROM s2)
            AND id_b IN (SELECT doc_id FROM s2)),
        rsym AS (SELECT id_a AS src, id_b AS dst FROM rp
                 UNION SELECT id_b, id_a FROM rp),
        walk(id, r) AS (
          SELECT src, src FROM rsym
          UNION
          SELECT w.id, s.dst FROM walk w JOIN rsym s ON w.r = s.src),
        comp AS (SELECT id, MIN(r) AS comp FROM walk GROUP BY id),
        s3 AS (
          SELECT doc_id FROM s2
          WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> comp)),
        ccand AS (
          SELECT DISTINCT l.doc_id AS train_id, r.doc_id AS eval_id
          FROM bk l JOIN bk r ON l.band = r.band AND l.key = r.key
          WHERE l.doc_id >= 100 AND r.doc_id < 100),
        contaminated AS (
          SELECT DISTINCT train_id FROM (
            SELECT train_id,
                   CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                     / len(list_distinct(a.ts || b.ts)) AS j
            FROM ccand JOIN sets a ON ccand.train_id = a.doc_id
                       JOIN sets b ON ccand.eval_id = b.doc_id)
          WHERE j >= $JT),
        s4 AS (
          SELECT doc_id FROM s3
          WHERE doc_id >= 100
            AND doc_id NOT IN (SELECT train_id FROM contaminated)),
        n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        stages AS (
          SELECT 0 AS stage, 'raw' AS stage_name, (SELECT n FROM n0) AS n_docs
          UNION ALL SELECT 1, 'quality',
            (SELECT CAST(count(*) AS BIGINT) FROM q1)
          UNION ALL SELECT 2, 'exact_dedup',
            (SELECT CAST(count(*) AS BIGINT) FROM s2)
          UNION ALL SELECT 3, 'neardup_reps',
            (SELECT CAST(count(*) AS BIGINT) FROM s3)
          UNION ALL SELECT 4, 'decontaminated',
            (SELECT CAST(count(*) AS BIGINT) FROM s4))
        SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs,
               n_docs * 10000 // (SELECT n FROM n0) AS retained_bp
        FROM stages ORDER BY stage"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q215_bucket_preflight",
      "LSH bucket-population PRE-FLIGHT — the diagnostic that predicts " +
        "a quadratic candidate blowup BEFORE anyone pays for it: for " +
        "q30's exact banding config, the 10 heaviest (band, key) " +
        "buckets with their populations and implied pair work " +
        "C(pop, 2), plus corpus-wide bucket count and total pair work " +
        "on every row (a 1-row broadcast). A healthy corpus shows " +
        "single-digit bucket populations; a saturated one (template " +
        "floods, tiny effective alphabets — the measured " +
        "ARCHITECTURE.md stress case that spilled past 79 GB) shows " +
        "corpus-scale buckets here for the cost of ONE keyed count, " +
        "and the pipeline routes to Dedup.lshCandidatesCapped or " +
        "upstream cleanup instead of the pair join. Same cost class " +
        "as q104's key-skew profile, applied to the similarity index.",
      (s, dir) => {
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
        val withSet = docs.select(col("doc_id"),
          array_sort(Dedup.charNgramHashes(col("text"), 3)).as("gs"))
          .withColumn("sz", size(col("gs")))
        val banded = Dedup.bandKeys(
          Dedup.minhashFromHashes(
            withSet.filter(col("sz") > 0).select("doc_id", "gs"), "gs", K),
          K, RPB)
        val bk = banded.select(col("doc_id"),
          expr(s"stack($NB, ${(0 until NB).map(b => s"$b, b$b").mkString(", ")})")
            .as(Seq("band", "key")))
        val pops = bk.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("pop"))
          // C(pop, 2) through DECIMAL(38,0): pop * (pop - 1) on Long
          // wraps silently past pop ~ 4.3e9 (Spark non-ANSI) where
          // DuckDB's BIGINT raises — exactly the q104 overflow class;
          // the decimal product is exact and `div` is integral
          .withColumn("pair_work",
            expr("CAST(CAST(pop AS DECIMAL(38,0)) * (pop - 1) div 2 AS BIGINT)"))
        val totals = pops.agg(count(lit(1)).as("n_buckets"),
          sum(col("pair_work")).as("total_pair_work"))
        pops.orderBy(col("pair_work").desc, col("band"), col("key"))
          .limit(10)
          .join(broadcast(totals))
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, gs, len(gs) AS sz
          FROM (SELECT doc_id,
                 ${graft.operators.Dedup.charNgramHashesSql("text", 3)} AS gs
                FROM documents)),
        sig AS (
          SELECT doc_id, ${minhashColsSql("gs")}
          FROM g WHERE sz > 0),
        banded AS (
          SELECT doc_id, ${(0 until NB).map(b => s"${bandExprSql(b)} AS b$b").mkString(", ")}
          FROM sig),
        bk AS (
          ${(0 until NB).map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
            .mkString("\n          UNION ALL ")}),
        pops AS (
          SELECT band, key, CAST(count(*) AS BIGINT) AS pop,
                 CAST(CAST(count(*) AS HUGEINT) * (count(*) - 1) // 2
                   AS BIGINT) AS pair_work
          FROM bk GROUP BY 1, 2),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(sum(pair_work) AS BIGINT) AS total_pair_work
          FROM pops)
        SELECT band, key, pop, pair_work, n_buckets, total_pair_work
        FROM (SELECT * FROM pops
              ORDER BY pair_work DESC, band, key LIMIT 10), t"""))
  )
}
