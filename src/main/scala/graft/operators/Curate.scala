package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis => TA}

/** The composed training-data curation pipeline: quality gate ->
  * language filter -> eval decontamination -> exact dedup ->
  * (optional) ExactSubstr cut -> near-dup removal, as one chained
  * transform over a documents frame. Each stage
  * is the corresponding standalone operator; this is the glue a corpus
  * job actually runs.
  *
  * Stage order is cost-ordered on purpose: the scalar quality/language
  * filters (codegen'd projections, no shuffle) shrink the corpus BEFORE
  * the dedup stages pay their shuffles — the same filter-before-expensive
  * discipline as the reference's filter-before-download (SURVEY §4).
  * Decontamination sits before dedup for the same reason: a tainted doc
  * must not survive either way, so drop it before it costs signature
  * work, and band the EVAL side too — it is small by construction, so
  * its bands broadcast (the q58 shape).
  */
object Curate {

  final case class Config(
      minQuality: Double = 0.5,
      keepLangs: Seq[String] = Nil, // empty = keep all
      stopwords: Seq[String] = TA.EnMarkers,
      minhashK: Int = 16,
      bandsRows: Int = 4,
      shingleLen: Int = 3,
      nearDupThreshold: Double = 0.8,
      // ExactSubstr cut (Lee et al. 2021): rewrite docs with corpus-
      // duplicated cutGramLen-word runs removed, AFTER exact dedup
      // (so a doc's own copies don't mask-cut it) and BEFORE near-dup
      // (signatures must see the cut text)
      cutRepeatedRuns: Boolean = false,
      cutGramLen: Int = 20)

  /** @param evalDocs held-out eval suite (same textCol/idCol schema);
    *                 when present, train docs whose token sets near-dup
    *                 an eval doc at `nearDupThreshold` are dropped.
    * @return curated frame with the same schema as the input. */
  def apply(docs: DataFrame, textCol: String, idCol: String,
      cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame = {
    // 1-2: scalar gates, pure projection
    val gated = docs
      .filter(TA.qualityScore(col(textCol), cfg.stopwords) >= cfg.minQuality)
    val langFiltered =
      if (cfg.keepLangs.isEmpty) gated
      else gated.filter(
        TA.langIdHeuristic(col(textCol), Seq(
          "sqlish" -> Seq("table", "row", "column", "query", "filter"),
          "sparkish" -> Seq("spark", "shuffle", "partition", "stream", "batch"),
          "plain" -> Seq("the", "a", "fast", "slow", "small", "big")))
          .isin(cfg.keepLangs: _*))

    // 3: eval decontamination (cross-table LSH, q58 shape) — the small
    // eval side's bands broadcast; verified taints leave via anti-join
    val decontaminated = evalDocs match {
      case None => langFiltered
      case Some(ev) =>
        val nb = cfg.minhashK / cfg.bandsRows
        def banded(df: DataFrame) = Dedup.bandKeys(
          Dedup.minhashSignature(df, textCol, cfg.minhashK, cfg.shingleLen),
          cfg.minhashK, cfg.bandsRows)
        val cands = Dedup.lshCandidatesAcross(
          banded(langFiltered), banded(ev), idCol, nb)
        val tset = array_distinct(split(col(textCol), " "))
        val tainted = cands
          .join(langFiltered.select(col(idCol).as("id_l"), tset.as("__ts_l")), "id_l")
          .join(ev.select(col(idCol).as("id_r"), tset.as("__ts_r")), "id_r")
          .filter(Dedup.jaccard(col("__ts_l"), col("__ts_r")) >= cfg.nearDupThreshold)
          .select(col("id_l").as(idCol)).distinct()
        langFiltered.join(tainted, Seq(idCol), "left_anti")
    }

    // 4: exact dedup — keep each content hash's min-id representative
    val keep = Dedup.exact(decontaminated, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val exactDeduped = decontaminated.join(keep, Seq(idCol), "left_semi")

    // 5 (optional): ExactSubstr cut — rewrite away corpus-duplicated
    // runs; near-dup signatures below must see the CUT text
    val afterCut =
      if (!cfg.cutRepeatedRuns) exactDeduped
      else Dedup.cutRepeatedRuns(exactDeduped, idCol, textCol, cfg.cutGramLen)

    // 6: near-dup removal via MinHash-LSH candidates + exact verify
    val banded = Dedup.bandKeys(
      Dedup.minhashSignature(afterCut, textCol, cfg.minhashK, cfg.shingleLen),
      cfg.minhashK, cfg.bandsRows)
    val cands = Dedup.lshCandidates(banded, idCol, cfg.minhashK / cfg.bandsRows)
    val sets = afterCut.select(col(idCol),
      array_distinct(split(col(textCol), " ")).as("__ts"))
    val verified = cands
      .join(sets.select(col(idCol).as("id_a"), col("__ts").as("__ts_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__ts").as("__ts_b")), "id_b")
      .filter(Dedup.jaccard(col("__ts_a"), col("__ts_b")) >= cfg.nearDupThreshold)
      .select("id_a", "id_b")
    Dedup.dropNearDuplicates(afterCut, idCol, verified)
  }
}
