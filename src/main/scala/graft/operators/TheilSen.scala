package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Theil–Sen slope estimator — the MEDIAN of all pairwise slopes
  * (y_j - y_i)/(x_j - x_i) per group — computed WITHOUT ever
  * materializing a pair on the engine side.
  *
  * The statistic is integerized first: each pair's slope contributes
  * its floor at milli scale, `slope_milli = (1000 * dy) div dx`
  * (floor, x_i < x_j so dx > 0), and the estimator is the lower
  * median of that integer multiset — well-defined on both engines
  * with no rational ordering and no division anywhere in THIS
  * implementation (the oracle, which does divide, adds a positive
  * offset so its floor `//` agrees for negative dy).
  *
  * The selection runs by PARAMETRIC SEARCH: for a probe t,
  *
  *   slope_milli <= t  <=>  1000*dy <= (t+1)*dx - 1
  *                     <=>  z_j < z_i  where  z = 1000*y - (t+1)*x
  *
  * so `count(slope <= t)` is the number of INVERSIONS of z against
  * x-order — counted distributed by the q253 bucket decomposition
  * (cross-bucket pairs fold into the (bx, bz) cell table, bounded by
  * the value RANGE; only intra-bucket pairs compare exact values) —
  * and the median is pinned by a branching binary search over t:
  * fifteen probes per round shrink every group's candidate interval
  * 16x, so ~6 rounds cover the full +/-2^21 milli-slope range. Each
  * round is ONE distributed count job for ALL groups at once; the
  * per-group search state (g, k, lo, hi) stays a DataFrame —
  * nothing per-group ever lands on the driver — and is
  * localCheckpoint-truncated per round (the Coverage/SuffixArray
  * lineage contract). Pairs with x_i = x_j have no slope and are
  * excluded from both the count and the median index.
  *
  * SCALE SHAPE: per round, the corpus projection is touched once
  * (persisted across rounds), the cell-pair join is bounded by
  * bucket-grid size, and intra-bucket joins by bucket width — the
  * naive O(n^2) pair frame (which the DuckDB oracle states, proving
  * the search exact) never exists. Magnitudes: z ~ 1000*y + 2^21*x
  * must fit a BIGINT — any real feature scale does.
  */
object TheilSen {

  /** Milli-slope search range: answers lie in [-2^21, 2^21). The
    * oracle's offset M must dominate 1000*|dy|, so |dy| < 2^21/1000
    * per pair — documented, generous for the harness features. */
  val MaxAbsMilli: Long = 1L << 21

  /** Count, per (group, probe), the pairs with x_i < x_j and
    * z_j < z_i — the q253 three-class bucket decomposition. `zb`
    * needs (g, pid, x, z, bx, bz). */
  private def inversions(zb: DataFrame): DataFrame = {
    val cells = zb.groupBy(col("g"), col("pid"), col("bx"), col("bz"))
      .agg(count(lit(1)).as("cnt"))
    val a = cells.as("c1")
      .join(cells.as("c2"), col("c1.g") === col("c2.g")
        && col("c1.pid") === col("c2.pid"))
      .filter(col("c1.bx") < col("c2.bx") && col("c2.bz") < col("c1.bz"))
      .groupBy(col("c1.g").as("g"), col("c1.pid").as("pid"))
      .agg(sum(col("c1.cnt") * col("c2.cnt")).as("c"))
    val bfr = zb.as("p1")
      .join(zb.as("p2"), col("p1.g") === col("p2.g")
        && col("p1.pid") === col("p2.pid")
        && col("p1.bx") === col("p2.bx"))
      .filter(col("p1.x") < col("p2.x") && col("p2.z") < col("p1.z"))
      .groupBy(col("p1.g").as("g"), col("p1.pid").as("pid"))
      .agg(count(lit(1)).as("c"))
    val cfr = zb.as("p1")
      .join(zb.as("p2"), col("p1.g") === col("p2.g")
        && col("p1.pid") === col("p2.pid")
        && col("p1.bz") === col("p2.bz"))
      .filter(col("p1.bx") < col("p2.bx") && col("p2.z") < col("p1.z"))
      .groupBy(col("p1.g").as("g"), col("p1.pid").as("pid"))
      .agg(count(lit(1)).as("c"))
    a.unionByName(bfr).unionByName(cfr)
      .groupBy(col("g"), col("pid")).agg(sum(col("c")).as("cnt"))
  }

  /** Lower-median pairwise milli-slope per group:
    * (g, n_pairs, theilsen_milli). Groups with no sloped pair (fewer
    * than two distinct x) are absent. `xBucketW`/`zBucketW` trade
    * cross-bucket folding against intra-bucket exact work — any
    * positive widths are correct (the spec runs degenerate widths). */
  def slopeMilli(df: DataFrame, g: String, xCol: String, yCol: String,
      xBucketW: Long = 64L, zBucketW: Long = 4096L): DataFrame = {
    require(xBucketW > 0 && zBucketW > 0)
    val b = df
      .select(col(g).as("g"), col(xCol).cast(LongType).as("x"),
        col(yCol).cast(LongType).as("y"))
      .withColumn("bx", expr(s"x div $xBucketW"))
      // referenced every search round — persist once, release at end
      .persist()

    // median index k = (np + 1) div 2 over the x-distinct pairs
    val xt = b.groupBy(col("g"), col("x")).agg(count(lit(1)).as("t"))
    val np = xt.groupBy(col("g"))
      .agg(sum(col("t")).as("n"), sum(expr("t * (t - 1) div 2")).as("tx"))
      .select(col("g"), (expr("n * (n - 1) div 2") - col("tx")).as("np"))
      .filter(col("np") > 0)
    var search = np
      .select(col("g"), col("np"), expr("(np + 1) div 2").as("k"),
        lit(-MaxAbsMilli).as("lo"), lit(MaxAbsMilli).as("hi"))
      .localCheckpoint()

    def maxSpan(s: DataFrame): Long =
      s.agg(max(col("hi") - col("lo"))).head().getLong(0)
    while (maxSpan(search) > 0) {
      // fifteen probes split every open interval 16x; closed groups
      // carry their answer through untouched
      val probes = search.filter(col("lo") < col("hi"))
        .select(col("g"), col("k"), col("lo"), col("hi"),
          explode(expr(
            "transform(sequence(1, 15), i -> lo + (hi - lo) * i div 16)"))
            .as("t"))
        .select(col("g"), col("t")).distinct()
      val zb = b.join(broadcast(probes.withColumnRenamed("t", "__t")
          .withColumn("pid", col("__t"))), "g")
        .select(col("g"), col("pid"), col("x"),
          (lit(1000L) * col("y") - (col("pid") + 1L) * col("x")).as("z"),
          col("bx"))
        .withColumn("bz", expr(s"z div $zBucketW"))
      // A probe below every pair's slope has ZERO inversions and so
      // no row in the class counts at all — left-join back onto the
      // probe grid and coalesce, or such probes would vanish from the
      // min/max update and an interval whose probes all sit below the
      // answer would never move again (the infinite loop the first
      // cut of this search had on an exact-line corpus).
      val counts = probes.withColumnRenamed("t", "pid")
        .join(inversions(zb), Seq("g", "pid"), "left")
        .select(col("g"), col("pid"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
      // cnt(t) is monotone in t: the new interval is
      //   hi' = min probe with cnt >= k,  lo' = max probe with cnt < k, +1
      val next = search.join(
          counts.withColumnRenamed("pid", "t"), Seq("g"), "left")
        .groupBy(col("g"), col("np"), col("k"), col("lo"), col("hi"))
        .agg(
          min(when(col("cnt") >= col("k"), col("t"))).as("hi_c"),
          max(when(col("cnt") < col("k"), col("t") + 1)).as("lo_c"))
        .select(col("g"), col("np"), col("k"),
          greatest(col("lo"), coalesce(col("lo_c"), col("lo"))).as("lo"),
          least(col("hi"), coalesce(col("hi_c"), col("hi"))).as("hi"))
      search = next.localCheckpoint()
    }
    val out = search.select(col("g"), col("np").as("n_pairs"),
      col("lo").as("theilsen_milli"))
    b.unpersist()
    out
  }
}
