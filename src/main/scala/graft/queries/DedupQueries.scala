package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.Dedup
import graft.queries.Tables.t

/** Deduplication queries over `documents`: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. North-star operators (BASELINE.json); the reference's
  * only dedup is best-file-per-company (src/transform.py:109-145), which
  * q06 covers — these generalize it to content-based near-dup at scale.
  */
object DedupQueries {

  private val K = 16          // minhash family size
  private val RPB = 4         // rows per LSH band -> 4 bands
  private val NB = K / RPB
  private val SHINGLE = 3     // words per shingle
  private val JT = 0.8        // near-dup verification threshold

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
    val docs = t(s, dir, "documents").repartition(col("doc_id"))
    val banded = Dedup.bandKeys(
      Dedup.minhashSignature(docs, "text", K, SHINGLE), K, RPB)
    val cands = Dedup.lshCandidates(banded, "doc_id", NB)
    val sets = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ts"))
    cands
      .join(sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed("ts", "ts_a"), "id_a")
      .join(sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed("ts", "ts_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("ts_a"), col("ts_b")).as("jaccard"))
      .filter(col("jaccard") >= JT)
  }

  /** DuckDB twin of [[lshVerifiedPairs]] as a `pairs` CTE. */
  private val pairsCte = s"""$sigCte,
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
      "q29_simhash",
      "60-bit SimHash signature per document over distinct-token " +
        "hashes (bit-majority vote).",
      (s, dir) =>
        t(s, dir, "documents").repartition(col("doc_id")).select(
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
      "Character 3-gram Jaccard near-dup pairs, blocked on " +
        "(lang, source) — candidate generation is an equi-join on the " +
        "block key, then exact set verification at 0.9.",
      (s, dir) => {
        // single-file table: spread before the n-gram projection (above);
        // hashed n-grams SORTED once per row so the n^2 verification is a
        // native two-pointer merge (no per-pair hash set)
        val docs = t(s, dir, "documents").repartition(col("doc_id"))
        // materialize the projection: it feeds the candidate join (both
        // sides) and both verify-phase broadcasts — unmaterialized,
        // Spark recomputes the hashing 3-4x. localCheckpoint (not
        // persist) so the blocks are freed on GC with no unpersist
        // bookkeeping. (At real corpus scale this materializes to
        // storage instead of memory: same idea.)
        val withSet = docs.select(col("doc_id"), col("lang"), col("source"),
          array_sort(Dedup.charNgramHashes(col("text"), 3)).as("gs"))
          .withColumn("sz", size(col("gs")))
          .localCheckpoint()

        // candidate phase joins ONLY the narrow columns — the blocked
        // join would otherwise materialize both ~2KB n-gram arrays for
        // every candidate pair before the size band can prune; the size
        // band is a NECESSARY condition for jaccard >= 0.9
        // (min(|A|,|B|) >= 0.9*max)
        val slim = withSet.select("doc_id", "lang", "source", "sz")
        val cands = slim.as("l")
          .join(slim.as("r"),
            col("l.lang") === col("r.lang") &&
              col("l.source") === col("r.source") &&
              col("l.doc_id") < col("r.doc_id") &&
              col("l.sz").cast("double") >= col("r.sz") * 0.9 &&
              col("r.sz").cast("double") >= col("l.sz") * 0.9)
          .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))

        // verify phase: arrays fetched only for surviving pairs
        val sets = withSet.select(col("doc_id"), col("gs"), col("sz"))
        val inter = graft.expressions.SortedIntersectSize(s, col("gs_a"), col("gs_b"))
        cands
          .join(broadcast(sets.select(col("doc_id").as("id_a"),
            col("gs").as("gs_a"), col("sz").as("sz_a"))), "id_a")
          .join(broadcast(sets.select(col("doc_id").as("id_b"),
            col("gs").as("gs_b"), col("sz").as("sz_b"))), "id_b")
          .select(col("id_a"), col("id_b"),
            (inter.cast("double") / (col("sz_a") + col("sz_b") - inter)).as("jaccard"))
          .filter(col("jaccard") >= 0.9)
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, lang, source, gs, len(gs) AS sz
          FROM (SELECT doc_id, lang, source,
                 ${graft.operators.Dedup.charNgramHashesSql("text", 3)} AS gs
                FROM documents))
        SELECT id_a, id_b, jaccard FROM (
          SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                 CASE WHEN CAST(l.sz AS DOUBLE) >= r.sz * 0.9
                       AND CAST(r.sz AS DOUBLE) >= l.sz * 0.9
                      THEN CAST(len(list_intersect(l.gs, r.gs)) AS DOUBLE)
                             / (l.sz + r.sz - len(list_intersect(l.gs, r.gs)))
                      END AS jaccard
          FROM g l JOIN g r
            ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id)
        WHERE jaccard >= 0.9"""))
  )
}
