package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Histogram-coarsened Spearman rank correlation — the shared core of
  * q259 and [[graft.streaming.SpearmanStream]].
  *
  * The sufficient statistic is the per-(source, xb, yb) cell count of
  * the coarsened signals (chars div 16, tokens div 4): cells MERGE BY
  * ADDITION, so a stream can append per-batch deltas and recover the
  * exact statistic at read time, and the batch engine computes it
  * with rank windows over the bounded bucket support — midranks of a
  * bucketed histogram ARE the midranks of its ties (ranks c+1..c+t
  * average to a doubled 2c+t+1), so the coarsening is a statement,
  * not an approximation. Output math and the enforced n <= 3e4
  * DECIMAL(38,0) exactness guard are q248's.
  */
object SpearmanHist {

  private val dec38 = DecimalType(38, 0)

  /** The mergeable joint histogram: (source, xb, yb, cnt). `docs`
    * needs (source, n_chars, text). */
  def cells(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        expr("n_chars div 16").as("xb"),
        expr("CAST(size(split(text, ' ')) AS BIGINT) div 4").as("yb"))
      .groupBy(col("source"), col("xb"), col("yb"))
      .agg(count(lit(1)).as("cnt"))

  /** Signed rho^2 in bp from a (possibly pre-merged) cell table:
    * (source, n, rho2s_bp). Constant marginals are filtered; n past
    * the exactness bound raises — identically to the DuckDB oracle. */
  def rho(cells: DataFrame): DataFrame = {
    // doubled midrank of every row in bucket v: rows hold ranks
    // c+1..c+t (c = mass below), averaging to c + (t+1)/2 — doubled:
    // 2c + t + 1, one integer per BUCKET
    def marg(bcol: String, out: String) = {
      val m = cells.groupBy(col("source"), col(bcol))
        .agg(sum(col("cnt")).as("t"))
      val prev = Window.partitionBy(col("source")).orderBy(col(bcol))
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("c", coalesce(sum(col("t")).over(prev), lit(0L)))
        .select(col("source"), col(bcol),
          (lit(2L) * col("c") + col("t") + 1L).as(out))
    }
    val r = cells.join(marg("xb", "mx2"), Seq("source", "xb"))
      .join(marg("yb", "my2"), Seq("source", "yb"))
    val m = r.groupBy(col("source")).agg(
      sum(col("cnt").cast(dec38)).as("n"),
      sum(col("cnt").cast(dec38) * col("mx2")).as("sx"),
      sum(col("cnt").cast(dec38) * col("my2")).as("sy"),
      sum(col("cnt").cast(dec38) * col("mx2") * col("my2")).as("sxy"),
      sum(col("cnt").cast(dec38) * col("mx2") * col("mx2")).as("sxx"),
      sum(col("cnt").cast(dec38) * col("my2") * col("my2")).as("syy"))
    m.select(col("source"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("d1"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("d2"))
      .filter(col("d1") > 0 && col("d2") > 0)
      .select(col("source"), col("n").cast(LongType).as("n"),
        when(col("n") > 30000,
          raise_error(concat(lit("q259_spearman_hist: group "),
            col("source"),
            lit(" exceeds the n<=30000 DECIMAL(38,0) exactness" +
              " bound; widen the histogram buckets")))
            .cast(LongType))
          .otherwise(when(col("num") < 0, -1L).otherwise(1L)
            * expr("num * num * 10000 div (d1 * d2)"))
          .cast(LongType).as("rho2s_bp"))
  }
}
