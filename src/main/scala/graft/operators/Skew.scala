package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling: two-stage salted aggregation.
  *
  * A groupBy on a low-cardinality hot key (5 event types over 100 TB of
  * events) funnels each key through ONE reducer. Salting splits every
  * key into `saltBuckets` sub-keys for the wide partial stage, then
  * merges partials in a tiny final stage. Both stages are ordinary
  * hash aggregations, so results are identical to the direct groupBy —
  * the salt must be DETERMINISTIC (derived from a data column, never
  * rand()) or retries/oracles break.
  *
  * AQE's skew-join splitting covers joins; this covers aggregations,
  * where AQE does not re-split a hot group.
  */
object Skew {

  /** Salted count+sum aggregation: count(*) and sum of each (column ->
    * alias) pair, grouped by `keys`. Sums should be of exact types
    * (decimal/long) — partial-merge order then cannot change results. */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Column,
      saltBuckets: Int,
      sums: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltFrom, lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__n"),
        sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__s$i") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        sums.zipWithIndex.map { case ((_, alias), i) => sum(col(s"__s$i")).as(alias) }: _*)
  }

  /** Salted inner equi-join for a KNOWN-skewed probe side: each probe
    * row gets a deterministic salt in [0, buckets) (derived from a data
    * column — never rand(), or retries/oracles break), the build side
    * replicates every row `buckets` times, and the join runs on
    * (key, salt) — so one hot key's rows spread over `buckets` reducers
    * instead of funneling through one. Result is row-identical to the
    * plain join: salting only refines the partitioning, every
    * (probe row, build row) match still meets in exactly one bucket.
    *
    * This is the STATIC form for a skew known at authoring time (a
    * celebrity user, a null-sentinel key); AQE's skew-join split is the
    * adaptive complement but only engages when a sort-merge join's
    * partition sizes trip its thresholds at runtime — a hot key hidden
    * inside an otherwise-balanced hash join, or a broadcast-disabled
    * medium build side, still wants the explicit salt. Cost: the build
    * side shuffles `buckets` x its size — use only when build is the
    * small side (yet too big or too dynamic to broadcast).
    *
    * NULL safety: `saltFrom` is coalesced to 0 before the pmod — a
    * NULL salt expression would otherwise make the derived `__salt`
    * NULL and the equi-join silently DROP that probe row (breaking the
    * row-identical contract above). Which bucket a row lands in is
    * arbitrary for correctness (every build row exists in every
    * bucket); 0 just pins nulls deterministically — note that if the
    * null-salt rows are themselves the hot set, a constant bucket
    * re-concentrates them, so prefer a rarely-null salt column. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFrom: Column, buckets: Int): DataFrame = {
    val p = probe.withColumn("__salt", pmod(coalesce(saltFrom, lit(0)), lit(buckets)))
    val b = build.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
