package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Occupancy-aware, tie-respecting bucket ids — the data-driven
  * replacement for fixed-width value buckets in the pair-decomposition
  * operators ([[TheilSen]], q253's Kendall classes).
  *
  * Fixed widths (`x div 64`) are correct for ANY positive width but
  * hand the intra-bucket self-join O(m^2) work when values pile into
  * one bucket — heavily tied telemetry is the COMMON case, not the
  * edge. Equi-depth buckets bound the occupancy instead:
  *
  *  - bucket boundaries come from the per-group cumulative tie counts
  *    (one window over the DISTINCT values, never the rows), so every
  *    "light" bucket holds < 2*targetOcc rows by construction;
  *  - a HEAVY value (tie count >= targetOcc) gets a singleton bucket
  *    of its own. Singleton buckets are single-VALUED, so every
  *    intra-bucket pair compares equal — the decomposition classes
  *    that need strict value order can skip them entirely, which is
  *    exactly what kills the O(m^2) blow-up: the 10^5-rows-3-values
  *    corpus produces three singleton buckets and ZERO intra-bucket
  *    join rows.
  *
  * Bucket ids are monotone non-decreasing in the value (equal values
  * share an id; distinct buckets imply strict value order), which is
  * the only property the pair decompositions rely on — so swapping
  * these ids for fixed-width ones changes NO query result, only the
  * join sizes. Proof of monotonicity: a light value at cumulative
  * count c gets id 2*(c div occ); a heavy one 2*(c div occ) + 1; any
  * value after a heavy one has its cumulative count advanced by
  * >= occ, so its id strictly exceeds the heavy id, and heavy ids are
  * odd while light ids are even, so a heavy bucket can never absorb a
  * neighbor.
  */
object Buckets {

  /** Per distinct (keys..., v): (keys..., v, bkt, light) with `bkt`
    * monotone in v within each key group, light buckets bounded by
    * < 2*targetOcc rows, heavy (tie mass >= targetOcc) values alone
    * in their bucket. `rows` carries one row per DATA row
    * (multiplicity = tie count) unless `weightCol` names a
    * pre-aggregated count column (the tie-collapsed frames). */
  def equiDepth(rows: DataFrame, keys: Seq[String], v: String,
      targetOcc: Long, weightCol: Option[String] = None): DataFrame = {
    require(targetOcc > 0, "targetOcc must be positive")
    require(keys.nonEmpty, "at least one group key")
    val mass = weightCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    val t = rows.groupBy((keys :+ v).map(col): _*).agg(mass.as("__t"))
    val prev = Window.partitionBy(keys.map(col): _*).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("__cumb", coalesce(sum(col("__t")).over(prev), lit(0L)))
      .select(keys.map(col) ++ Seq(col(v),
        (lit(2L) * expr(s"__cumb div ${targetOcc}L")
          + when(col("__t") >= targetOcc, 1L).otherwise(0L)).as("bkt"),
        (col("__t") < targetOcc).as("light")): _*)
  }
}
