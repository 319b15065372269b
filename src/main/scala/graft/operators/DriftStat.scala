package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Two-sample distribution-drift statistics (KS sup-norm + the
  * Wasserstein-1 transport cost) over a MERGEABLE histogram — the
  * shared core of q251/q252 and [[graft.streaming.DriftStream]].
  *
  * The sufficient statistic for both norms is the per-(week, cents)
  * count pair (cp, cc): histograms merge by addition, so a stream can
  * append per-batch deltas and recover the exact statistics at read
  * time, and a batch engine can compute them in ONE window pass —
  * cumulative counts, the support gap to the next observed value, and
  * the per-week totals all come from the same partitioned sort.
  *
  * Exactness: D = max |cumP*nC - cumC*nP| (integer max) and W1 =
  * sum(|cumP*nC - cumC*nP| * gap) (integer sum, DECIMAL(38,0)
  * accumulation), each finished by one floor division onto bp /
  * millicents — no float ever accumulates, so the statistics are
  * bit-identical under any partitioning and any batch split.
  */
object DriftStat {

  /** The mergeable per-week histogram of purchase/click values in
    * cents: (week, cents, cp, cc). `events` needs (ts, event_type,
    * value); week is days-since-2024-01-01 div 7 (the harness
    * testdata epoch). */
  def histogram(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("purchase", "click"))
      .select(
        expr("datediff(to_date(ts), DATE '2024-01-01') div 7").as("week"),
        (col("value").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("cents"),
        when(col("event_type") === "purchase", 1L)
          .otherwise(0L).as("is_p"))
      .groupBy(col("week"), col("cents"))
      .agg(sum(col("is_p")).as("cp"),
        sum(lit(1L) - col("is_p")).as("cc"))

  /** Both drift norms from a (possibly pre-merged) histogram, one
    * window pass: (week, n_purchase, n_click, ks_bp, w1_millicents).
    * Weeks missing either population are dropped (both statistics are
    * undefined there). */
  def stats(hist: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val ow = Window.partitionBy(col("week")).orderBy(col("cents"))
    val cw = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(col("week"))
    hist
      .withColumn("cum_p", sum(col("cp")).over(cw))
      .withColumn("cum_c", sum(col("cc")).over(cw))
      .withColumn("gap", lead(col("cents"), 1).over(ow) - col("cents"))
      .withColumn("n_p", sum(col("cp")).over(tw))
      .withColumn("n_c", sum(col("cc")).over(tw))
      .filter(col("n_p") > 0 && col("n_c") > 0)
      .withColumn("diff", abs(col("cum_p").cast(dec38) * col("n_c")
        - col("cum_c").cast(dec38) * col("n_p")))
      .groupBy(col("week"), col("n_p"), col("n_c"))
      .agg(max(col("diff")).as("dmax"),
        sum(when(col("gap").isNotNull, col("diff") * col("gap"))
          .otherwise(lit(0L).cast(dec38))).as("w1num"))
      .select(col("week"),
        col("n_p").as("n_purchase"), col("n_c").as("n_click"),
        expr("CAST(dmax * 10000 div (n_p * n_c) AS BIGINT)").as("ks_bp"),
        expr("CAST(w1num * 1000 div (n_p * n_c) AS BIGINT)")
          .as("w1_millicents"))
  }
}
