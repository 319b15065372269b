package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted isotonic (non-decreasing) regression over binned
  * levels — the calibration-curve smoother (PAVA) in its CLOSED
  * minimax form, with every comparison done on exact rationals.
  *
  * The classical pool-adjacent-violators algorithm is a sequential
  * stack scan — inherently serial per series. This operator instead
  * evaluates the equivalent minimax characterization
  *
  *   fitted[i] = max_{j<=i} min_{k>=i} avg(y[j..k])
  *
  * over the level prefix sums, which is pure relational algebra: one
  * pair frame from the prefix-sum self-join, one range join onto the
  * level index, two grouped reductions. Every avg comparison
  * cross-multiplies (n1*d2 <?> n2*d1) in DECIMAL(38,0) — no division
  * anywhere, so the fit is EXACT and engine-portable; division-free
  * rationals only ever leave as floor-scaled integers at the query
  * layer. The reductions fold a sort_array'd candidate list with an
  * exact comparator (strict less keeps the new element), so the
  * selected representative is deterministic; with ties, candidate
  * VALUES are equal and every downstream output (floored bp, pool
  * boundaries) is representative-invariant.
  *
  * SCALE SHAPE: the corpus never reaches the minimax — callers bin
  * x to at most B levels per group FIRST (one groupBy producing the
  * sufficient statistics (w, y-sum) per level — at 100 TB that is the
  * only full-data pass), and the minimax then costs O(B^3) rows per
  * group, a CONSTANT once B is fixed (B=32 -> ~5K rows/group),
  * embarrassingly parallel across groups. Magnitude bound: per-group
  * |y-sum| and weight must fit ~1e18 so DECIMAL(38,0) cross products
  * are exact — any binned real-data scale does.
  *
  * PAVA equivalence (minimax == sequential pool-merging) is pinned by
  * IsotonicSpec against a BigInt stack reference.
  */
object Isotonic {

  /** Isotonic fit over per-level sufficient statistics.
    *
    * Input: one row per (g, lvl) with weight `w` (> 0) and y-sum `y`
    * (the SUM of y over the level's rows, not the mean). Output: one
    * row per level with the level index `i` (1-based by lvl order),
    * the exact fitted value as `fn`/`fd` (unreduced rational — equal
    * values may carry different representatives; emit only
    * value-invariant projections), and `pool` — 1-based id of the
    * constant-value run the level belongs to (pool boundaries tested
    * by exact cross-multiplied strict increase). */
  def fitLevels(levels: DataFrame, g: String, lvlCol: String,
      wCol: String, yCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col("g")).orderBy(col("i"))
    val pre = levels
      .select(col(g).as("g"), col(lvlCol).as("lvl"),
        col(wCol).cast("long").as("w"), col(yCol).cast("long").as("y"))
      .withColumn("i", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("lvl"))))
      .withColumn("S", sum(col("y")).over(wOrd))
      .withColumn("Wc", sum(col("w")).over(wOrd))
    // prefix boundary frame: i = 0 (empty prefix) plus every level
    val b0 = pre.select(col("g"), col("i"), col("S"), col("Wc"))
      .unionByName(pre.groupBy(col("g")).agg(count(lit(1)).as("_n"))
        .select(col("g"), lit(0).as("i"), lit(0L).as("S"), lit(0L).as("Wc")))
    // every contiguous run [j..k]: n/d = its y-sum / weight
    val pairs = b0.as("a").join(pre.as("b"),
        col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .select(col("a.g").as("g"), (col("a.i") + 1).as("j"),
        col("b.i").as("k"),
        (col("b.S") - col("a.S")).as("n"),
        (col("b.Wc") - col("a.Wc")).as("d"))
    // runs covering level i; equi-join on g, range predicate j<=i<=k
    val triples = pairs.join(
        pre.select(col("g"), col("i")).withColumnRenamed("g", "g2"),
        col("g") === col("g2") && col("j") <= col("i") && col("i") <= col("k"))
      .select(col("g"), col("i"), col("j"), col("k"), col("n"), col("d"))
    // exact rational fold: min (op "<") or max (op ">") of n/d over a
    // sort_array'd candidate list, comparing by cross-multiplication
    // (d > 0 throughout, so the inequality direction is preserved);
    // strict compare keeps the incumbent on ties, so the result is the
    // first extremal-VALUE element in canonical array order —
    // deterministic, and value-equal across representatives
    def foldFrac(grouped: DataFrame, op: String): DataFrame =
      grouped
        .withColumn("cand", expr(
          s"""aggregate(slice(cands, 2, size(cands) - 1), cands[0],
             |  (acc, x) -> IF(CAST(x.n AS DECIMAL(38,0)) * acc.d $op
             |                 CAST(acc.n AS DECIMAL(38,0)) * x.d,
             |              x, acc))""".stripMargin))
        .select(col("g"), col("i"),
          col("cand.n").as("n"), col("cand.d").as("d"))
    val mins = foldFrac(
      triples.groupBy(col("g"), col("i"), col("j"))
        .agg(sort_array(collect_list(struct(col("n"), col("d"), col("k"))))
          .as("cands"))
        .select(col("g"), col("i"), col("cands")), "<")
      // per (g,i,j) we folded over k; now max over j per (g,i)
    val fitted = foldFrac(
      mins.groupBy(col("g"), col("i"))
        .agg(sort_array(collect_list(struct(col("n"), col("d"))))
          .as("cands")), ">")
    // pool id: running count of strict increases between neighbors
    val stepped = fitted
      .withColumn("pn", lag(col("n"), 1).over(wOrd))
      .withColumn("pd", lag(col("d"), 1).over(wOrd))
      .withColumn("step", when(col("pn").isNull, lit(1))
        .when(expr("CAST(pn AS DECIMAL(38,0)) * d < CAST(n AS DECIMAL(38,0)) * pd"),
          lit(1)).otherwise(lit(0)))
      .withColumn("pool", sum(col("step")).over(wOrd))
    pre.select(col("g"), col("lvl"), col("i"), col("w"), col("y"))
      .join(stepped.select(col("g"), col("i"),
        col("n").as("fn"), col("d").as("fd"), col("pool")), Seq("g", "i"))
  }
}
