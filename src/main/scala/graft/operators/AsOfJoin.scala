package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the most recent right row
  * with the same key and time <= left time (inclusive), deterministic
  * tie-break on the right payload.
  *
  * Spark has no asof join operator; the scalable composition is
  * union + window, NOT a theta-join-then-argmax:
  *   1. tag both sides, union them (no join at all),
  *   2. one shuffle+sort per key on (time, side, payload),
  *   3. running `last(payload, ignoreNulls)` carries the newest right
  *      payload into every subsequent left row,
  *   4. keep left rows.
  * Cost: one shuffle of |L|+|R| rows and one sort — the same shape as
  * any windowed aggregation, no quadratic per-key work, skew bounded by
  * the hottest key like any window (salt the key if that matters).
  * (Preference (a) of the custom-op ladder: composition expresses the
  * semantics exactly, so no custom plan node is warranted.)
  */
object AsOfJoin {

  /** @param left       left rows (the "probe" side, e.g. events)
    * @param leftKey    join key column in `left`
    * @param leftTime   event-time column in `left`
    * @param right      right rows (the "state" side, e.g. orders)
    * @param rightKey   join key column in `right`
    * @param rightTime  event-time column in `right`
    * @param rightPayload column of `right` to carry (also the tie-break:
    *                     max payload wins among equal times)
    * @return `left.*` plus `asof_<rightPayload>` (null when no right row
    *         at or before the left time)
    */
  def backward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightPayload: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(rightPayload).dataType))
    val r = right
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), col(rightPayload).as("__p"))
    // left columns nulled on the right side
    val rAligned = leftCols.foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.toIndexedSeq.map(col): _*)

    // rights sort before lefts at equal time (inclusive match); among
    // equal-time rights the LAST (max payload) wins the carry.
    // The carry wraps the payload in a struct: `last(payload ignoreNulls)`
    // would skip a right row whose payload IS null and resurrect an older
    // one — the struct is non-null for every right row, so the newest
    // right ROW wins even when its payload is null.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__carry",
        last(when(col("__side") === 0, struct(col("__p"))), ignoreNulls = true).over(w))
      .withColumn(s"asof_$rightPayload", col("__carry.__p"))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__p", "__carry")
  }
}
