package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CUSUM changepoint detection over per-(series, day) revenue sums —
  * the shared core of q256 and [[graft.streaming.CusumStream]].
  *
  * The sufficient statistic is the per-(event_type, day) cent sum:
  * it MERGES BY ADDITION (a stream appends per-batch day deltas and
  * the exact statistic is recovered at read time), and the
  * changepoint argmax_tau |n*S_tau - tau*S_n| is an exact integer
  * function of the merged table — no float, no division except the
  * final milli floors (values nonnegative, so Spark's truncating div
  * and DuckDB's flooring // agree).
  */
object Cusum {

  /** The mergeable per-(type, day) cent-sum table: (g, day, x).
    * `events` needs (ts, event_type, value). */
  def daily(events: DataFrame): DataFrame =
    events.select(
        col("event_type").as("g"), to_date(col("ts")).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("g"), col("day")).agg(sum(col("cents")).as("x"))

  /** The changepoint per series from a (possibly pre-merged) daily
    * table: (event_type, n, tau, change_day, gap, mean_before_milli,
    * mean_after_milli). Ties break toward the earliest day; series
    * with a single day are dropped (no interior split exists). */
  def changepoints(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
    val pre = daily
      .withColumn("tau", row_number().over(w).cast(LongType))
      .withColumn("s", sum(col("x")).over(w))
    val tot = pre.groupBy(col("g"))
      .agg(max(col("tau")).as("n"), sum(col("x")).as("sn"))
    val scored = pre.join(broadcast(tot), Seq("g"))
      .filter(col("tau") < col("n"))
      .withColumn("gap",
        abs(col("n") * col("s") - col("tau") * col("sn")))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("gap").desc, col("tau").asc)))
      .filter(col("rn") === 1)
      .select(col("g").as("event_type"), col("n"), col("tau"),
        col("day").as("change_day"), col("gap"),
        expr("CAST(1000 * s div tau AS BIGINT)")
          .as("mean_before_milli"),
        expr("CAST(1000 * (sn - s) div (n - tau) AS BIGINT)")
          .as("mean_after_milli"))
  }
}
