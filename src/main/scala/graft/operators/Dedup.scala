package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable

/** Deduplication operators for large-scale document corpora.
  *
  * Scale design (100 TB): every variant avoids the O(n^2) all-pairs join.
  *  - exact: one hash-groupBy shuffle on a 60-bit content hash (never on
  *    the full text — the shuffle key stays 8 bytes);
  *  - MinHash/LSH: shingle -> k salted minhashes -> band keys; candidate
  *    pairs come from an equi-join on (band index, band hash), which
  *    partitions/shuffles like any key join — no cross product;
  *  - SimHash: one 60-bit signature per doc, groupable/bucketable;
  *  - n-gram Jaccard: exact verification restricted to blocked candidate
  *    pairs (equi-join on block keys).
  *
  * Everything is built from codegen'd `functions._` expressions over the
  * portable hash ([[Portable.pmd5]]) so results are reproducible across
  * engines (and oracle-checkable against DuckDB).
  */
object Dedup {

  /** Exact dedup: one representative row (min of `idCol`) per distinct
    * value of `textCol`, with the duplicate count. Groups by TWO
    * independently-salted 60-bit content hashes — a fixed 16-byte
    * shuffle key regardless of document size, with joint collision
    * probability ~2^-120 per pair (a single 60-bit hash starts merging
    * distinct documents around 10^9 of them). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(
      Portable.pmd5(col(textCol)).as("text_hash"),
      Portable.pmd5Salted(1, col(textCol)).as("text_hash2"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** k-member minhash signature over 3-word shingles: columns
    * m0..m(k-1). md5 is paid once per TOKEN (not per shingle, not per
    * family member): token hashes are materialized, shingle hashes are
    * arithmetic combinations, and the k members are affine maps
    * (see [[Portable]]). */
  def minhashSignature(df: DataFrame, textCol: String, k: Int, shingleLen: Int): DataFrame = {
    require(shingleLen == 3, "token-combine construction is fixed at 3-word shingles")
    val withTh = df.withColumn("__th", Portable.tokenHashes(col(textCol)))
    val withHs = withTh
      .withColumn("__hs", Portable.shingleHashesFromTokens(col("__th")))
      .drop("__th")
    val sig = (0 until k).map(i => Portable.minhash(i, col("__hs")).as(s"m$i"))
    withHs.select(col("*") +: sig: _*).drop("__hs")
  }

  /** Band keys over a minhash signature: bands of `rowsPerBand` hashes,
    * each band hashed to one 60-bit key. Output columns b0..b(nBands-1). */
  def bandKeys(sig: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val parts = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"m$i").cast(StringType))
      Portable.pmd5(concat_ws(",", parts: _*)).as(s"b$b")
    }
    sig.select(col("*") +: bands: _*)
  }

  /** LSH candidate pairs: docs sharing at least one band key. The
    * explode turns each doc into `nBands` (bandIdx, bandKey) rows; the
    * self-equi-join on those keys is a normal shuffle join — this is the
    * piece that scales where a cross join cannot. Pairs sharing several
    * bands are deduplicated with `distinct`. */
  def lshCandidates(banded: DataFrame, idCol: String, nBands: Int): DataFrame = {
    val bandStructs = array((0 until nBands).map(b =>
      struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)
    val exploded = banded
      .select(col(idCol), explode(bandStructs).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
      // self-joined below: without persist the whole upstream signature
      // pipeline (shingle + minhash) runs once PER SIDE
      .persist()
    val l = exploded.as("l")
    val r = exploded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** Token-hash array for SimHash (full-width pmd5 over distinct tokens). */
  def simhashTokenHashes(textCol: Column): Column =
    transform(array_distinct(split(textCol, " ")), t => Portable.pmd5(t))

  /** 60-bit SimHash over the doc's distinct tokens — composed-SQL form
    * (60 bit-passes). Kept as the portable reference implementation;
    * [[simhash]] is the production path. */
  def simhashComposed(textCol: Column): Column = {
    val hs = simhashTokenHashes(textCol)
    aggregate(
      transform(sequence(lit(0), lit(59)), j =>
        when(
          aggregate(hs, lit(0L),
            (acc, h) => acc +
              (call_function("shiftright", h, j).bitwiseAND(lit(1L)) * 2 - 1)) > 0,
          call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc + b)
  }

  /** 60-bit SimHash, production path: native one-pass Catalyst
    * expression ([[graft.expressions.SimHash60]], codegen'd) over the
    * same token hashes — bit-identical to [[simhashComposed]]. Takes the
    * session because Spark 4's Column<->Expression seam is the function
    * registry. */
  def simhash(spark: org.apache.spark.sql.SparkSession, textCol: Column): Column =
    graft.expressions.SimHash60(spark, simhashTokenHashes(textCol))

  /** Exact token-set Jaccard similarity between two array columns
    * (inputs must already be distinct sets). Union size is derived as
    * |A|+|B|-|A∩B| — one hash-set pass per pair instead of also
    * materializing `array_distinct(concat(a,b))`. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      (size(a) + size(b) - size(array_intersect(a, b)))

  /** Blocked near-duplicate pairs by exact token-set Jaccard: candidate
    * pairs are restricted to equal `blockCols` (an equi-join, shuffle-
    * partitioned by block key), then verified with the exact measure. */
  def blockedJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame = {
    val withSet = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        array_distinct(split(col(textCol), " ")).as("ts"): _*)
    val l = withSet.as("l")
    val r = withSet.as("r")
    val blockCond = blockCols.map(c => col(s"l.$c") === col(s"r.$c")).reduce(_ && _)
    l.join(r, blockCond && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(
        col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        jaccard(col("l.ts"), col("r.ts")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Character n-gram distinct-set column for [[jaccard]] verification. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) < n, array().cast(ArrayType(StringType)))
        .otherwise(transform(
          sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))

  /** Hashed variant: n-grams reduced to 31-bit longs via the portable
    * hash. Set intersections then compare longs, not strings — the
    * per-pair verification cost at corpus scale. In-doc hash collisions
    * merge set members deterministically on BOTH engines, so oracle
    * equality holds. */
  def charNgramHashes(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) < n, array().cast(ArrayType(LongType)))
        .otherwise(transform(
          sequence(lit(1), length(text) - (n - 1)),
          i => Portable.pmd5(text.substr(i, lit(n))) % Portable.MinhashP)))

  def charNgramHashesSql(textSql: String, n: Int): String =
    s"""list_distinct(CASE WHEN length($textSql) < $n THEN CAST([] AS BIGINT[])
       | ELSE list_transform(generate_series(1, length($textSql) - ${n - 1}),
       |        i -> ${Portable.pmd5Sql(s"substr($textSql, i, $n)")} % ${Portable.MinhashP})
       | END)""".stripMargin.replaceAll("\n", " ")

  /** Top-1-per-group representative selection after near-dup clustering:
    * given (id_a, id_b) duplicate edges, keep the smallest id of each
    * direct-duplicate neighborhood (single-hop; full transitive closure
    * is an iterative connected-components job, out of relational scope). */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
}
