package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix array by prefix doubling (Manber–Myers): the
  * lexicographic rank of EVERY suffix of every document, built in
  * O(log maxDocLen) rounds of pure integer work.
  *
  * Suffix ranks are the index structure behind the exact-substring
  * family (longest repeated substring = memorization risk, exact
  * substring dedup, corpus-wide pattern counts). The naive spelling —
  * materialize each suffix string and sort — ships O(n * avgSuffixLen)
  * bytes, QUADRATIC in document length; that is the oracle's spelling,
  * and the hash match proves the doubling construction equal to it.
  *
  * Round structure: rank_1 = dense rank of the single character at
  * each position; the round at shift d extends each suffix's sort key
  * from its first d characters to its first 2d by pairing
  * (rank_d(pos), rank_d(pos + d)) — the second component via ONE
  * equi-join on (doc, pos) against the same rank table shifted by d,
  * missing tail = sentinel 0 (sorts below every real rank, which is
  * exactly "shorter suffix first" when a suffix is a prefix of
  * another). Re-ranking the pairs is [[denseRankOf]] on the DISTINCT
  * pair set. Rounds stop when every rank is distinct or the covered
  * prefix length reaches the longest document (remaining ties are
  * true duplicate suffixes — e.g. duplicated documents — and stay
  * tied, identical to the oracle's dense_rank over equal strings).
  *
  * SCALE SHAPE: after the one character-projection pass, text never
  * moves again — every round shuffles only (doc, pos, rank) triples
  * (24-byte rows) and a distinct-pair frame of at most n skinny rows.
  * Each round's output is localCheckpoint-truncated with the
  * predecessor's blocks released deterministically (the
  * [[Coverage.freeCheckpoint]] contract), so lineage and plan depth
  * stay O(1) across rounds; round count is log2 of the LONGEST
  * DOCUMENT (documents bound suffix comparisons), not of the corpus.
  */
object SuffixArray {

  /** Lexicographic dense rank of every suffix.
    *
    * @return one row per (document, 1-based position): (`idCol`,
    *         `pos` BIGINT, `suffix_rank` BIGINT) — rank 1 = smallest
    *         suffix; equal suffixes (across or within docs) share a
    *         rank and the rank space has no gaps (dense), matching
    *         `dense_rank() OVER (ORDER BY suffix)`.
    */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast(LongType).as("__id"),
      col(textCol).as("__t"))
    // the ONLY pass that touches text: one char per position
    val chars = base
      .select(col("__id"), col("__t"),
        explode(graft.functions.TextAnalysis.indices1(length(col("__t"))))
          .as("__pos"))
      .select(col("__id"), col("__pos"),
        expr("substring(__t, __pos, 1)").as("__k"))
    val (cm, freeCm) = denseRankOf(chars.select("__k").distinct(), Seq("__k"))
    var ranks = chars.join(cm, Seq("__k"))
      .select(col("__id"), col("__pos"), col("__gr").as("__r"))
      .localCheckpoint(true)
    var freeRanks = Coverage.freeCheckpoint(ranks)
    freeCm()
    // dense ranks => max == #distinct; NULL on an empty slice
    def distinctRanks(): Long = ranks.agg(max(col("__r"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val total = ranks.count()
    var nDist = distinctRanks()
    val maxLen = base.agg(max(length(col("__t")))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getInt(0).toLong
    }
    var d = 1L // ranks currently order by the first d characters
    while (nDist < total && d < maxLen) {
      val shifted = ranks.select(col("__id"),
        (col("__pos") - d).cast("int").as("__pos"), col("__r").as("__r2"))
      val pairs = ranks.join(shifted, Seq("__id", "__pos"), "left")
        .select(col("__id"), col("__pos"), col("__r"),
          coalesce(col("__r2"), lit(0L)).as("__r2"))
      val (rm, freeRm) = denseRankOf(
        pairs.select("__r", "__r2").distinct(), Seq("__r", "__r2"))
      val next = pairs.join(rm, Seq("__r", "__r2"))
        .select(col("__id"), col("__pos"), col("__gr").as("__r"))
        .localCheckpoint(true)
      val freeNext = Coverage.freeCheckpoint(next)
      freeRm()
      freeRanks()
      ranks = next; freeRanks = freeNext
      nDist = distinctRanks()
      d *= 2
    }
    // the caller's terminal action reads the final checkpoint blocks;
    // they are session-lived like any cached frame (harness clearCache
    // does not reach RDD blocks — bounded: one 24-byte row per suffix)
    ranks.select(col("__id").as(idCol), col("__pos").cast(LongType).as("pos"),
      col("__r").as("suffix_rank"))
  }

  /** Repeated-substring candidates — the memorization/contamination
    * audit built on [[suffixRanks]]: the longest repeated substring of
    * a corpus is the maximum longest-common-prefix over suffixes that
    * are ADJACENT in suffix order (the classic suffix-array reduction
    * — non-adjacent pairs never beat the adjacent chain between them),
    * so one pass over rank adjacency finds every repeat.
    *
    * Two pair families cover sorted adjacency exactly:
    *  - intra-rank (equal suffixes — duplicate documents/tails): a
    *    rank-partitioned lag window chains tie members in (doc, pos)
    *    order; their common prefix is the WHOLE suffix, reported at
    *    full length;
    *  - cross-rank (rank r's last member vs rank r+1's first): LCP by
    *    a bounded character fold over `cap`-char snippets — reported
    *    LCP saturates at `cap`, which is the audit's point (a repeat
    *    that long is flagged whatever its true extent).
    *
    * SCALE SHAPE: suffix STRINGS never materialize — each suffix
    * carries one `cap`-char snippet (O(n x cap) bytes, linear where
    * the naive sort is quadratic); the tie window partitions by rank
    * (bounded groups), the boundary join is an equi-join on the rank
    * key, and the LCP fold is a codegen'd higher-order function over
    * a <= cap integer sequence.
    *
    * @return one row per adjacent pair: (d1, p1, d2, p2) witnesses,
    *         `lcp_len` (BIGINT; full length for equal suffixes,
    *         `cap`-saturated otherwise), `snippet` (the common prefix,
    *         <= cap chars). */
  def repeatedSubstrings(docs: DataFrame, idCol: String, textCol: String,
      cap: Int = 80): DataFrame = {
    require(cap >= 1)
    val ranks = suffixRanks(docs, idCol, textCol)
    val base = docs.select(col(idCol).cast(LongType).as("__id"),
      col(textCol).as("__t"))
    val snips = ranks.join(base, col(idCol) === col("__id"))
      .select(col(idCol), col("pos"), col("suffix_rank").as("__r"),
        expr(s"substring(__t, CAST(pos AS INT), $cap)").as("__snip"),
        (length(col("__t")) - col("pos") + 1).as("__suf_len"))
    // (a) equal suffixes: chain tie members; LCP = the full suffix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__r")).orderBy(col(idCol), col("pos"))
    val intra = snips
      .select(col(idCol), col("pos"), col("__snip"), col("__suf_len"),
        lag(col(idCol), 1).over(w).as("d1"),
        lag(col("pos"), 1).over(w).as("p1"))
      .filter(col("d1").isNotNull)
      .select(col("d1"), col("p1"), col(idCol).as("d2"), col("pos").as("p2"),
        col("__suf_len").cast(LongType).as("lcp_len"), col("__snip").as("__s2"))
    // (b) rank boundary: last of r meets first of r+1; LCP by snippet fold
    val reps = snips.groupBy(col("__r")).agg(
      min(struct(col(idCol), col("pos"), col("__snip"))).as("lo"),
      max(struct(col(idCol), col("pos"), col("__snip"))).as("hi"))
    val lcpExpr = "coalesce(array_min(filter(" +
      "sequence(1, least(length(xs), length(ys))), " +
      "i -> substr(xs, i, 1) <> substr(ys, i, 1))) - 1, " +
      "least(length(xs), length(ys)))"
    val cross = reps.select(col("__r"), col("hi")).alias("a")
      .join(reps.select((col("__r") - 1).as("__r"), col("lo")).alias("b"),
        Seq("__r"))
      .select(col(s"hi.$idCol").as("d1"), col("hi.pos").as("p1"),
        col(s"lo.$idCol").as("d2"), col("lo.pos").as("p2"),
        col("hi.__snip").as("xs"), col("lo.__snip").as("ys"))
      .select(col("d1"), col("p1"), col("d2"), col("p2"),
        expr(lcpExpr).cast(LongType).as("lcp_len"), col("ys").as("__s2"))
    intra.unionByName(cross)
      .select(col("d1"), col("p1"), col("d2"), col("p2"), col("lcp_len"),
        expr(s"substr(__s2, 1, CAST(least(lcp_len, $cap) AS INT))")
          .as("snippet"))
  }

  /** Global DENSE rank of an already-distinct key frame, without an
    * unpartitioned window: `orderBy` range-partitions and sorts (the
    * scalable total order), and `zipWithIndex` assigns each row its
    * global position — on distinct rows, row position IS the dense
    * rank. Deterministic: the sorted order of a distinct frame is
    * unique, so partition boundaries (sampled by the range exchange)
    * cannot change any rank, only balance. Returns the frame plus
    * `__gr` and a release handle for the sort's cache (zipWithIndex
    * runs a per-partition count job first — uncached, the range sort
    * would execute twice). */
  private[operators] def denseRankOf(dist: DataFrame,
      keys: Seq[String]): (DataFrame, () => Unit) = {
    val spark = dist.sparkSession
    val sorted = dist.orderBy(keys.map(col): _*)
    val schema = StructType(sorted.schema.fields :+ StructField("__gr", LongType))
    val srdd = sorted.rdd.persist()
    val out = spark.createDataFrame(
      srdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
    (out, () => { srdd.unpersist(blocking = false); () })
  }
}
