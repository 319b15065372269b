package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Portable

/** Priority sampling (Duffield–Lund–Thorup 2005): a weighted sample
  * WITHOUT replacement of k items per group, plus the DLT subset-sum
  * estimator, in arithmetic both engines reproduce bit-identically.
  *
  * Priority = w / u with u a keyed-hash uniform in (0, 1): spelled as
  * ONE IEEE division `(w * (2^30+1)) / (h + 1)` of two exactly-
  * representable integers (numerator < 2^53 for any weight < 2^23),
  * so there is no ln() anywhere — the classic Efraimidis–Spirakis
  * exponential key needs `-ln(u)/w`, and the repo's libm rule
  * (q52/q67) bans ln from oracled outputs because JVM Math.log and
  * DuckDB's C libm are not bit-contracted to agree. DLT priorities
  * are the published log-free alternative with near-optimal subset-sum
  * variance: take the top k+1 priorities, sample = top k, threshold
  * tau = the (k+1)-th, estimator est_w = max(w, tau) — unbiased for
  * any subset-sum query over the group, and exactly w when the group
  * has at most k members (tau absent).
  *
  * The top-(k+1) summary is MERGEABLE (order statistics of a union =
  * order statistics of concatenated per-part summaries), which is what
  * [[graft.streaming.SampleStream]] exploits: each micro-batch appends
  * only its own top-(k+1) per group, and the reservoir is recovered at
  * read time by merging summaries — never by rescanning the corpus.
  *
  * SCALE SHAPE: selection runs through the custom grouped top-k
  * operator ([[graft.plans.TopKPerKey]] — per-split bounded heaps,
  * shuffle capped at splits x groups x (k+1) rows, no partition
  * sort); the rank/tau split windows over the already-reduced
  * survivor frame.
  */
object PrioritySample {

  /** Hash modulus: u = (pmd5 % 2^30 + 1) / (2^30 + 1). */
  val M: Long = 1L << 30

  /** Attach the deterministic priority column. Output: (`groupCol`,
    * `idCol`, `w` BIGINT, `priority` DOUBLE). */
  def withPriority(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String): DataFrame =
    df.select(col(groupCol), col(idCol),
        col(weightCol).cast(LongType).as("w"),
        (Portable.pmd5(concat(lit("pri:"), col(idCol).cast("string")))
          % M).as("__h"))
      .select(col(groupCol), col(idCol), col("w"),
        ((col("w") * (M + 1)).cast(DoubleType) / (col("__h") + 1))
          .as("priority"))

  /** The mergeable per-group summary: top k+1 rows by (priority desc,
    * id asc) through the bounded-heap operator. */
  def topSummary(pri: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame =
    graft.plans.TopKPerKey.topK(pri, Seq(groupCol),
      Seq(("priority", false), (idCol, true)), k + 1)

  /** Finish a summary into the sample + estimator: rank within the
    * (<= k+1)-row groups, tau = the (k+1)-th priority (NULL when the
    * group holds <= k members), est_w = max(w, tau). */
  def estimate(summary: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(idCol).asc)
    val ranked = summary.withColumn("__rn", row_number().over(w))
    val tau = ranked.filter(col("__rn") === k + 1)
      .select(col(groupCol), col("priority").as("__tau"))
    ranked.filter(col("__rn") <= k)
      .join(tau, Seq(groupCol), "left")
      .select(col(groupCol), col(idCol), col("w"), col("priority"),
        greatest(col("w").cast(DoubleType),
          coalesce(col("__tau"), lit(0.0))).as("est_w"))
  }
}
