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
