package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection over per-document feature sets —
  * the submodular facility-location recipe behind coverage-driven
  * training-data selection (pick the document covering the most of the
  * feature space, then repeatedly the document adding the most
  * not-yet-covered features; the greedy prefix carries the classic
  * 1 - 1/e approximation guarantee).
  *
  * Execution shape is the BPE-training one (q90): ONE job per round
  * whose driver-side traffic is a single argmax row — never the gain
  * table, never a feature list. The covered set stays distributed
  * (accumulated as a features DataFrame and broadcast into the
  * anti-join while it is small; Spark demotes the hint on its own if a
  * pathological corpus grows it past broadcast range). Nothing ever
  * materializes pairwise document overlaps — the O(n^2) trap a naive
  * "most-novel vs all previously picked" join would hit.
  *
  * q229 is the 2-round SQL-expressible slice of exactly this loop,
  * oracled against DuckDB; CoverageSpec proves the k-round loop equals
  * a from-first-principles reference on a planted corpus.
  *
  * @param sets (`idCol`, `featCol`: array of distinct features) — one
  *             row per candidate document
  * @param k    rounds; selection stops early when no candidate adds a
  *             new feature (marginal gain would be 0)
  * @return picks in selection order: (id, marginal gain)
  */
object Coverage {

  def greedySelect(sets: DataFrame, idCol: String, featCol: String,
      k: Int): Seq[(Long, Long)] = {
    require(k > 0, "need k > 0 rounds")
    val spark = sets.sparkSession
    val pairs = sets.select(col(idCol).as("__id"),
      explode(col(featCol)).as("__f"))
    var covered: Option[DataFrame] = None
    val picks = Seq.newBuilder[(Long, Long)]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val marginal = covered
        .map(c => pairs.join(broadcast(c), Seq("__f"), "left_anti"))
        .getOrElse(pairs)
        .groupBy(col("__id")).agg(count(lit(1)).as("__gain"))
        .orderBy(col("__gain").desc, col("__id").asc)
        .limit(1)
        .collect() // exactly ONE row crosses to the driver per round
      marginal.headOption match {
        case Some(row) =>
          val id = row.getLong(0)
          picks += ((id, row.getLong(1)))
          val winnerFeats = pairs.filter(col("__id") === id)
            .select(col("__f")).distinct()
          covered = Some(covered.map(_.union(winnerFeats).distinct())
            .getOrElse(winnerFeats))
          round += 1
        case None => exhausted = true // every feature covered
      }
    }
    picks.result()
  }
}
