package graft.queries

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec, FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.{SparkEntry, SparkSpec}

/** Physical-plan audit: locks the shapes the 100 TB design depends on,
  * so a future edit that de-optimizes a plan fails loudly instead of
  * silently regressing at scale.
  *
  * Plans are built against a PRODUCTION-SHAPED copy of the testdata —
  * every table rewritten as more files than the session's parallelism —
  * because that is the case [[Tables.spread]] must leave untouched: on
  * a multi-file corpus no query may shuffle a raw document/embedding
  * payload that nothing has reduced or derived from yet. AQE is off
  * while plans are built so the audited shape is the static one
  * (runtime re-planning only ever improves on it).
  */
class ExplainAuditSpec extends SparkSpec {

  /** Raw corpus payloads that must never feed a shuffle unreduced. */
  private val PayloadCols = Set("text", "embedding")

  private lazy val dir: String = {
    val root = java.nio.file.Files.createTempDirectory("explain-audit").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { tb =>
      spark.read.parquet(s"/root/testdata/sf0.001/$tb.parquet")
        .repartition(16)
        .write.parquet(s"$root/$tb.parquet")
    }
    root
  }

  private def withStaticPlans[T](body: => T): T = {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.catalog.clearCache() // some queries persist projections
    }
  }

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  /** Is this subtree a pure column selection over a file scan — no
    * derived columns, no aggregation, nothing reduced? A shuffle fed by
    * such a subtree ships scan output verbatim. */
  @tailrec
  private def columnSelectionOverScan(p: SparkPlan): Boolean = p match {
    case w: WholeStageCodegenExec => columnSelectionOverScan(w.child)
    case i: InputAdapter => columnSelectionOverScan(i.child)
    case c: ColumnarToRowExec => columnSelectionOverScan(c.child)
    case f: FilterExec => columnSelectionOverScan(f.child)
    case pr: ProjectExec if pr.projectList.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case _ => false
        } => columnSelectionOverScan(pr.child)
    case _: FileSourceScanExec => true
    case _ => false
  }

  /** Shuffles that ship a raw text/embedding payload straight off the
    * scan — the full-corpus-shuffle anti-pattern. */
  private def rawPayloadShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect {
      case e: ShuffleExchangeExec
          if columnSelectionOverScan(e.child) &&
            e.output.exists(a => PayloadCols(a.name)) => e
    }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case e: ShuffleExchangeExec => e }

  test("no registered query shuffles a raw text/embedding payload") {
    withStaticPlans {
      // q48 drives jobs eagerly while assembling its result (the CC
      // fixpoint loop) — its per-round plans are q28's, audited here.
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(_ == "q48_neardup_components")
      val offenders = names.flatMap { n =>
        val raw = rawPayloadShuffles(planOf(n))
        if (raw.isEmpty) Nil else Seq(s"$n -> ${raw.head.simpleStringWithNodeId()}")
      }
      assert(offenders.isEmpty,
        s"raw corpus payload shuffled by: ${offenders.mkString("; ")}")
    }
  }

  test("pure-projection queries plan with zero shuffles") {
    withStaticPlans {
      for (n <- Seq("q50_hash_sample", "q60_stratified_sample",
          "q55_cdc_chunks", "q57_int8_quantize", "q25_fingerprint",
          "q21_token_stats", "q23_lang_id", "q24_quality_score",
          "q83_quality_resample", "q92_redaction")) {
        val s = shuffles(planOf(n))
        assert(s.isEmpty, s"$n should be scan-stage only, found: " +
          s.map(_.simpleStringWithNodeId()).mkString("; "))
      }
    }
  }

  test("no audited query plans a cartesian product") {
    withStaticPlans {
      for (n <- Seq("q08_enrich_join", "q28_lsh_dup_pairs",
          "q30_ngram_jaccard", "q31_ann_bruteforce", "q33_ann_lsh",
          "q44_ann_ivf", "q45_edit_distance", "q59_prefix_ssjoin",
          "q63_oov_rate",
          // round-6 additions: label equi-join (q103), pool windows
          // (q106), time-cell equi-join + left join back (q108)
          "q103_semantic_dedup", "q106_diverse_ann", "q108_attribution")) {
        val cart = planOf(n).collect { case c: CartesianProductExec => c }
        assert(cart.isEmpty, s"$n plans a cartesian product")
      }
    }
  }

  test("q08 enriches through broadcast dimension joins") {
    withStaticPlans {
      val bhj = planOf("q08_enrich_join")
        .collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.size >= 2,
        s"nation/region dims must broadcast, found ${bhj.size} broadcast joins")
    }
  }

  test("ANN queries broadcast the small side, never a cartesian") {
    withStaticPlans {
      for (n <- Seq("q31_ann_bruteforce", "q44_ann_ivf")) {
        val p = planOf(n)
        val bc = p.collect {
          case j: BroadcastNestedLoopJoinExec => j: SparkPlan
          case j: BroadcastHashJoinExec => j: SparkPlan
        }
        assert(bc.nonEmpty, s"$n: queries/centroids side must broadcast")
      }
    }
  }
}
