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
}
