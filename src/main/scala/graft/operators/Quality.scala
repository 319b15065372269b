package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ shape): a
  * caller states WHAT must hold — completeness, value domains,
  * uniqueness, referential integrity — and gets back one audit row per
  * constraint: `(check_name, checked, violations, pass)`. A training
  * pipeline runs this as its admission gate: a snapshot whose report
  * has any `pass = false` row never reaches the mixer.
  *
  * Scale design, by check class:
  *  - ROW checks (not-null / range / set membership) compile to ONE
  *    conditional-aggregation pass over the table regardless of how
  *    many constraints are registered — each is a
  *    `sum(CASE WHEN pred THEN 0 ELSE 1)` column in the same agg, so
  *    100 constraints still cost one scan, map-side combined, and the
  *    shuffle carries one partial row per partition.
  *  - UNIQUE checks shuffle only the key columns (8-byte ids, never
  *    payload): `groupBy(key).count` then a one-row roll-up; each
  *    registered key is its own shuffle (keys differ, so they cannot
  *    share one).
  *  - REFERENTIAL checks are a distinct-project of the dimension's key
  *    plus a left anti join from the fact's non-null foreign keys —
  *    the caller flags small dimensions for broadcast so the fact
  *    table never shuffles; un-flagged (large) dimensions fall back to
  *    a key-only shuffled anti join.
  *
  * Violation semantics: a row whose predicate evaluates to NULL (e.g.
  * a range check over a NULL value) counts as a violation — a
  * constraint passes only when it provably holds, mirroring
  * `COALESCE(pred, false)` on both engines. NULL foreign keys are NOT
  * referential violations (SQL FK semantics); state a separate
  * not-null row check when the key must also be present.
  */
object Quality {

  /** One row-level constraint: `pred` must hold on every row. */
  final case class RowCheck(name: String, pred: Column)

  /** Key uniqueness: `violations` counts every row that shares its key
    * tuple with another row (the duplicated rows themselves, not the
    * number of duplicated keys — so the count answers "how many rows
    * would a dedup touch"). */
  final case class UniqueCheck(name: String, keyCols: Seq[String])

  /** Foreign-key containment: every non-null `fkCol` value must appear
    * in `dim.pkCol`. `broadcastDim = true` for dimensions small enough
    * to ship to every executor (the usual star-schema case). */
  final case class RefCheck(name: String, fkCol: String, dim: DataFrame,
      pkCol: String, broadcastDim: Boolean = true)

  private val OUT_COLS = Seq("check_name", "checked", "violations")

  /** Audit `df` against the given constraints; one output row per
    * constraint: `(check_name, checked BIGINT, violations BIGINT,
    * pass BOOLEAN)`. `checked` counts the rows the constraint applies
    * to: all rows for row/unique checks, non-null foreign-key rows for
    * referential checks. */
  def report(df: DataFrame, rowChecks: Seq[RowCheck],
      uniqueChecks: Seq[UniqueCheck] = Nil,
      refChecks: Seq[RefCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty || refChecks.nonEmpty,
      "at least one constraint is required")
    val parts =
      rowSection(df, rowChecks).toSeq ++
        uniqueChecks.map(uniqueSection(df, _)) ++
        refChecks.map(refSection(df, _))
    parts.reduce(_ unionAll _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check_name")
  }

  /** All row checks in ONE aggregation pass (see class doc). */
  private def rowSection(df: DataFrame, checks: Seq[RowCheck]): Option[DataFrame] =
    if (checks.isEmpty) None
    else {
      val aggs = count(lit(1)).as("checked") +:
        checks.zipWithIndex.map { case (c, i) =>
          // coalesce: sum over an EMPTY table is NULL — the constraint
          // vacuously passes with 0 violations, it doesn't return NULL
          coalesce(sum(when(coalesce(c.pred, lit(false)), 0L).otherwise(1L)),
            lit(0L)).as(s"v_$i")
        }
      Some(df.agg(aggs.head, aggs.tail: _*)
        .select(col("checked"), explode(array(checks.zipWithIndex.map {
          case (c, i) =>
            struct(lit(c.name).as("check_name"), col(s"v_$i").as("violations"))
        }: _*)).as("c"))
        .select(col("c.check_name"), col("checked"), col("c.violations")))
    }

  private def uniqueSection(df: DataFrame, c: UniqueCheck): DataFrame =
    df.groupBy(c.keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
      // coalesce: an empty table has zero key groups, so both sums are
      // NULL — the constraint vacuously passes with checked = 0
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("checked"),
        coalesce(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(lit(c.name).as("check_name") +: OUT_COLS.tail.map(col): _*)

  /** One pass over the fact's key column: project + null-filter, join
    * the (distinct, usually broadcast) dimension keys left-outer, and
    * count matches/misses in the same aggregate — no separate
    * row-count scan. `checked` is therefore the number of rows the
    * constraint APPLIES to (non-null foreign keys). */
  private def refSection(df: DataFrame, c: RefCheck): DataFrame = {
    val keys0 = c.dim.select(col(c.pkCol).as("__pk")).distinct()
    val keys = if (c.broadcastDim) broadcast(keys0) else keys0
    df.select(col(c.fkCol)).filter(col(c.fkCol).isNotNull)
      .join(keys, col(c.fkCol) === col("__pk"), "left_outer")
      .agg(count(lit(1)).as("checked"),
        coalesce(sum(when(col("__pk").isNull, 1L).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(lit(c.name).as("check_name") +: OUT_COLS.tail.map(col): _*)
  }
}
