package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Histogram-coarsened Spearman rank correlation — the shared core of
  * q259/q261 and [[graft.streaming.SpearmanStream]].
  *
  * The sufficient statistic is the per-(source, xb, yb) cell count of
  * the coarsened signals (chars div 16, tokens div 4): cells MERGE BY
  * ADDITION, so a stream can append per-batch deltas and recover the
  * exact statistic at read time, and the batch engine computes it
  * with rank windows over the bounded bucket support — midranks of a
  * bucketed histogram ARE the midranks of its ties (ranks c+1..c+t
  * average to a doubled 2c+t+1), so the coarsening is a statement,
  * not an approximation.
  *
  * Two output forms share the moment algebra:
  *  - [[rho]] — q248's EXACT quotient `num^2*10^4 div (d1*d2)`.
  *    Its intermediate is `rho^2 * d1 * d2 * 10^4 <= 10^4*(n^2(n^2-1)/3)^2`
  *    (untied doubled midranks maximize d1 = n*sxx - sx^2 at
  *    n^2(n^2-1)/3, and num^2 <= d1*d2 by Cauchy-Schwarz), which stays
  *    inside DECIMAL(38,0) (< 10^38) only for n <= ~23,400 — NOT the
  *    3e4 this repo once enforced (at n = 3e4 the intermediate clears
  *    7e38 for |rho| near 1, where Spark's ANSI DECIMAL overflow and
  *    DuckDB's HUGEINT overflow fire at DIFFERENT |rho|, breaking the
  *    fail-identically contract). The enforced bound is n <= 20,000,
  *    safely under the derived 23,400 on both engines.
  *  - [[rhoScaled]] — the REAL large-n path: rho^2 = b_yx * b_xy, the
  *    product of the two rank-regression slopes, each floor-quantized
  *    to centi-rho units: `(|num|*100 div d1) * (|num|*100 div d2)`.
  *    No squared moment ever forms — the largest intermediate is
  *    |num|*100 <= 100*n^4/3, inside DECIMAL(38,0) to n = 10^9, the
  *    enforced bound (a 50,000x raise over [[rho]]). The stated
  *    rounding: each slope floors independently, so the bp output can
  *    sit below the exact `rho^2*10^4` by up to ~(q1+q2+1) where
  *    q1*q2 <= 10^4 — i.e. centi-rho precision, identical on both
  *    engines because floor division of non-negative integers agrees
  *    between Spark `div` and DuckDB `//`. The quotients themselves
  *    fit LONG: d1 >= n^2(n-1) for any non-constant tie structure
  *    (two value groups of sizes t1+t2 = n sit n doubled-midrank
  *    units apart, giving d1 = t1*t2*n^2 >= (n-1)*n^2; more groups
  *    only widen), so q1 <= 100*sqrt(d2/d1) <= 100*sqrt(n/3) < 2e6
  *    at the bound.
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

  /** Shared integer moments from a (possibly pre-merged) cell table:
    * (source, n, num, d1, d2) as DECIMAL(38,0), constant marginals
    * filtered (rho is undefined there on both engines). */
  private def moments(cells: DataFrame): DataFrame = {
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
  }

  /** Signed rho^2 in bp, EXACT quotient (q248's math): (source, n,
    * rho2s_bp). n past the derived exactness bound raises —
    * identically to the DuckDB oracle (see object doc for why the
    * bound is 20,000, not the looser 3e4 once claimed). The scale
    * path past it is [[rhoScaled]] (q261) — NOT wider histogram
    * buckets: the doubled midranks scale with the ROW count n, so no
    * bucket width extends this bound. */
  def rho(cells: DataFrame): DataFrame =
    moments(cells)
      .select(col("source"), col("n").cast(LongType).as("n"),
        when(col("n") > 20000,
          raise_error(concat(lit("q259_spearman_hist: group "),
            col("source"),
            lit(" exceeds the n<=20000 DECIMAL(38,0) exactness" +
              " bound; use q261_spearman_scaled (centi-rho" +
              " slope-product, exact to n<=1e9)")))
            .cast(LongType))
          .otherwise(when(col("num") < 0, -1L).otherwise(1L)
            * expr("num * num * 10000 div (d1 * d2)"))
          .cast(LongType).as("rho2s_bp"))

  /** [[rhoScaled]]'s enforced per-group bound: the slope-product
    * intermediates stay inside DECIMAL(38,0)/HUGEINT to n <= 10^9.
    * Named so the q261 oracle interpolates it (never hand-copies —
    * the q270-modulus rule). */
  val ScaledMaxN: Long = 1000000000L

  /** Signed rho^2 in bp at LARGE n — the slope-product form (see
    * object doc): sign(num) * (|num|*100 div d1) * (|num|*100 div d2),
    * centi-rho quantization, enforced to n <= [[ScaledMaxN]] per
    * group. */
  def rhoScaled(cells: DataFrame): DataFrame =
    moments(cells)
      .select(col("source"), col("n").cast(LongType).as("n"),
        when(col("n") > ScaledMaxN,
          raise_error(concat(lit("q261_spearman_scaled: group "),
            col("source"),
            lit(" exceeds the n<=1e9 DECIMAL(38,0) slope-product" +
              " bound; shard the group (cells merge by addition)")))
            .cast(LongType))
          .otherwise(when(col("num") < 0, -1L).otherwise(1L)
            * (expr("abs(num) * 100 div d1")
              * expr("abs(num) * 100 div d2")))
          .cast(LongType).as("rho2s_bp"))
}
