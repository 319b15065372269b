package graft.queries

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, AttributeSet, BinaryComparison, Expression, In, Literal, StartsWith}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec, FilterExec, GenerateExec, InputAdapter, LocalTableScanExec, ProjectExec, RDDScanExec, RangeExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

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

  /** Every registered query's static physical plan, built ONCE and
    * shared by the registry-wide sweeps (planning 113 queries is the
    * expensive part; the tree walks are free). q48 is excluded: it
    * drives jobs eagerly while assembling its result (the CC fixpoint
    * loop) — its per-round plans are q28's, audited individually.
    */
  private lazy val allPlans: Seq[(String, SparkPlan)] = withStaticPlans {
    // q245 drives its doubling rounds eagerly during construction like
    // q48's CC fixpoint; its per-round shapes are the audited join +
    // range-sort primitives and SuffixArraySpec pins the construction
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Set("q48_neardup_components", "q245_suffix_ranks",
        "q246_repeated_substrings"))
      .map(n => n -> planOf(n))
  }

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
    val offenders = allPlans.flatMap { case (n, p) =>
      val raw = rawPayloadShuffles(p)
      if (raw.isEmpty) Nil else Seq(s"$n -> ${raw.head.simpleStringWithNodeId()}")
    }
    assert(offenders.isEmpty,
      s"raw corpus payload shuffled by: ${offenders.mkString("; ")}")
  }

  // ------------------------------------------------------------------
  // Registry-wide sweeps: every current AND FUTURE query is audited, so
  // the q67 class of bug (a global ranking window over unbounded input)
  // fails in CI instead of surfacing as a 100 TB incident.
  // ------------------------------------------------------------------

  test("registry sweep: no query plans an unpartitioned window") {
    // An empty window partition spec funnels the operator's entire
    // input through one task. Bounded post-limit ranks go through
    // Tables.boundedRank, which carries an explicit single-bucket
    // partition spec — so ANY empty spec here is a scale bug.
    val offenders = allPlans.flatMap { case (n, p) =>
      p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          s"$n -> ${w.simpleStringWithNodeId()}"
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned window in: ${offenders.mkString("; ")}")
  }

  /** The file scan directly under `p`, looking through the codegen
    * wrappers a post-pushdown filter sits above. */
  @tailrec
  private def scanUnder(p: SparkPlan): Option[FileSourceScanExec] = p match {
    case w: WholeStageCodegenExec => scanUnder(w.child)
    case i: InputAdapter => scanUnder(i.child)
    case c: ColumnarToRowExec => scanUnder(c.child)
    case s: FileSourceScanExec => Some(s)
    case _ => None
  }

  /** Conjuncts of `cond` that the parquet reader could evaluate:
    * a literal comparison / IN / prefix match on an atomic-typed
    * column the scan itself outputs. Derived-expression predicates
    * (pmod(id, k) = 0, length(text) > n, ...) are correctly NOT
    * pushable and excluded. */
  private def pushableConjuncts(cond: Expression,
      scanOut: AttributeSet): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    def scanAtomic(a: AttributeReference): Boolean =
      scanOut.contains(a) && (a.dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      })
    split(cond).filter {
      case bc: BinaryComparison => (bc.left, bc.right) match {
        case (a: AttributeReference, _: Literal) => scanAtomic(a)
        case (_: Literal, a: AttributeReference) => scanAtomic(a)
        case _ => false
      }
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        scanAtomic(a)
      case StartsWith(a: AttributeReference, _: Literal) => scanAtomic(a)
      case _ => false
    }
  }

  test("registry sweep: every literal-comparison filter over a file scan reaches the reader as a pushed filter") {
    // a predicate evaluated ONLY post-scan reads the whole table at
    // 100 TB; when a filter with reader-evaluable conjuncts sits
    // directly on a scan, the scan must advertise a non-empty
    // PushedFilters. No allowlist needed today: every current query
    // either pushes (flagged here if it regresses) or filters on a
    // derived expression the classifier correctly skips.
    val sites = allPlans.flatMap { case (n, p) =>
      p.collect { case f: FilterExec => f }.flatMap { f =>
        scanUnder(f.child).toSeq.flatMap { s =>
          val pushable = pushableConjuncts(f.condition, s.outputSet)
          if (pushable.isEmpty) Nil
          else Seq((n, pushable, s.metadata.getOrElse("PushedFilters", "[]")))
        }
      }
    }
    val offenders = sites.collect { case (n, pushable, "[]") =>
      s"$n: [${pushable.map(_.sql).mkString(" AND ")}] not pushed to its scan"
    }
    assert(offenders.isEmpty,
      s"pushable predicates evaluated post-scan only:\n  ${offenders.mkString("\n  ")}")
    // vacuity guard: the classifier must actually be finding the
    // registry's filter-over-scan sites (dozens exist — the TPC-H
    // shapes alone contribute many)
    assert(sites.size >= 20,
      s"pushdown sweep classified only ${sites.size} sites — classifier broke")
  }

  test("filters push to the parquet scan; projections prune the read schema") {
    val byName = allPlans.toMap
    // classic pushable predicates: q186's segment + order-date bounds
    // (TPC-H Q3 shape), q187's region-name equality (Q5 shape). A
    // filter evaluated post-scan instead of inside the reader reads
    // the whole table at 100 TB.
    for (n <- Seq("q186_shipping_priority", "q187_regional_volume")) {
      val scans = byName(n).collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"$n plans no file scan")
      assert(scans.exists(_.metadata.get("PushedFilters")
          .exists(v => v.startsWith("[") && v != "[]")),
        s"$n: no scan carries a pushed filter — " +
          scans.map(_.metadata.getOrElse("PushedFilters", "?")).mkString(", "))
    }
    // column pruning: the pricing summary touches 7 of lineitem's 16
    // columns — a scan reading them all is a 2x+ IO regression
    val q01Scans = byName("q01_pricing_summary")
      .collect { case s: FileSourceScanExec => s }
    assert(q01Scans.nonEmpty && q01Scans.forall(_.output.length <= 8),
      s"q01 scan width ${q01Scans.map(_.output.length).mkString(",")} — " +
        "column pruning regressed")
  }

  test("registry sweep: no query plans a cartesian product") {
    val offenders = allPlans.flatMap { case (n, p) =>
      p.collect { case _: CartesianProductExec => n }
    }
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString("; ")}")
  }

  /** Queries whose documented REFERENCE path scores every (query,
    * corpus-vector) pair by design: the broadcast side is the held-out
    * query/probe set, small by construction. Everything else must keep
    * nested-loop joins to provably tiny broadcast frames. */
  private val BruteForceAllowed = Set(
    "q31_ann_bruteforce", // the exact-recall baseline the ANN family is measured against
    "q44_ann_ivf",        // Lloyd rounds broadcast the k-centroid frame; k is a plan-time constant
    "q77_containment_join", // eval-suite token sets broadcast: small by construction (the q31 shape)
    "q103_semantic_dedup", // within-cluster pairs after a label equi-join; probe side broadcast
    "q106_diverse_ann",   // re-rank joins the k-row ANN pool to itself
    "q119_hard_negatives", // q31's shape: the held-out query set broadcasts, label filter post-join
    "q125_ann_pq",        // the per-query LUT maps broadcast: one row per held-out query
    "q130_jl_distortion", // bounded audit slice self-joins under an id inequality
    "q196_knn_classify",  // q31's shape: the held-out query set broadcasts; vote runs on the k-row result
    "q203_knn_eval")      // q196's search reused; eval rolls up the k-row result

  test("registry sweep: nested-loop joins only broadcast provably tiny frames") {
    // A BroadcastNestedLoopJoin is safe iff its broadcast side cannot
    // grow with the corpus: a global (no-grouping-key) aggregate is
    // 1 row; a LocalTableScan is a driver literal; allowlisted ANN
    // reference paths broadcast the held-out query set. Anything else
    // is an accidental O(N*M) at scale.
    def tinyBuild(j: BroadcastNestedLoopJoinExec): Boolean = {
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      def provablyTiny(p: SparkPlan): Boolean = p.exists {
        case h: HashAggregateExec => h.groupingExpressions.isEmpty
        case s: SortAggregateExec => s.groupingExpressions.isEmpty
        // collect_list/map_from_entries global aggs (bloom bitmaps,
        // ordered-fold vectors) plan as ObjectHashAggregate — same
        // 1-row-by-construction proof as the hash/sort cases
        case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
        case _: LocalTableScanExec => true
        // spark.range(k) with a plan-time-constant k (seed frames)
        case r: RangeExec => r.numElements <= 1024
        // orderBy(...).limit(k) plans as TakeOrderedAndProject — the
        // limit is a plan-time constant, so the frame is <= k rows by
        // construction (q229's greedy argmax broadcasts a 1-row frame
        // this way); same proof for the plain limit operators
        case tk: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
          tk.limit <= 1024
        case l: org.apache.spark.sql.execution.GlobalLimitExec => l.limit <= 1024
        case l: org.apache.spark.sql.execution.CollectLimitExec => l.limit <= 1024
        // a reused broadcast is as tiny as the exchange it reuses —
        // ReusedExchangeExec is a leaf, so recurse into the original
        case r: ReusedExchangeExec => provablyTiny(r.child)
        case _ => false
      }
      provablyTiny(build)
    }
    val offenders = allPlans.flatMap { case (n, p) =>
      if (BruteForceAllowed(n)) Nil
      else p.collect {
        case j: BroadcastNestedLoopJoinExec if !tinyBuild(j) =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }
          s"$n -> ${j.nodeName} building [${build.collect { case x => x.nodeName }.mkString(" <- ")}]"
      }
    }
    assert(offenders.isEmpty,
      s"nested-loop join over a non-tiny broadcast in: ${offenders.mkString("; ")}")
  }

  private lazy val planMap: Map[String, SparkPlan] = allPlans.toMap

  test("pure-projection queries plan with zero shuffles") {
    for (n <- Seq("q50_hash_sample", "q60_stratified_sample",
        "q55_cdc_chunks", "q57_int8_quantize", "q25_fingerprint",
        "q21_token_stats", "q23_lang_id", "q24_quality_score",
        "q83_quality_resample", "q92_redaction")) {
      val s = shuffles(planMap(n))
      assert(s.isEmpty, s"$n should be scan-stage only, found: " +
        s.map(_.simpleStringWithNodeId()).mkString("; "))
    }
  }

  test("q08 enriches through broadcast dimension joins") {
    val bhj = planMap("q08_enrich_join")
      .collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2,
      s"nation/region dims must broadcast, found ${bhj.size} broadcast joins")
  }

  test("q171 bucketed SMB join runs with zero shuffles under the merge join") {
    // the whole point of the bucketed layout: neither fact side
    // exchanges — bucket i merge-joins bucket i in place. Only the
    // post-join aggregation may shuffle.
    val smj = planMap("q171_smb_join").collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "q171 must plan a sort-merge join")
    val joinSideShuffles = smj.flatMap(shuffles)
    assert(joinSideShuffles.isEmpty,
      "bucketed join sides must not exchange, found: " +
        joinSideShuffles.map(_.simpleStringWithNodeId()).mkString("; "))
  }

  test("q176 routes its per-basket selection through the custom grouped top-k operator") {
    // round-7 ask: the row_number()<=N spelling re-implemented what
    // plans.TopKPerKey does natively (and pays a full partition sort
    // for it). Pin the migrated plan: Partial+Final heap execs present,
    // and no WindowExec left (the oracle keeps the window SPELLING;
    // the engine must not keep the window PLAN).
    val p = planMap("q176_session_paths")
    assert(p.exists { case _: graft.plans.PartialTopKPerKeyExec => true; case _ => false },
      s"expected PartialTopKPerKeyExec in:\n$p")
    assert(p.exists { case _: graft.plans.FinalTopKPerKeyExec => true; case _ => false },
      s"expected FinalTopKPerKeyExec in:\n$p")
    // the ONLY window left is the rank over the 20-row post-limit frame
    // (bounded by construction); the per-basket selection itself must
    // not contribute one
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.size <= 1,
      s"only the post-limit rank window may remain, found ${windows.size}")
  }

  test("q243 broadcasts the part slice and nation; facts join on their keys") {
    // TPC-H Q9 shape: the name-sliced part table and the nation name
    // are the broadcast dims; orders and supplier join shuffled on
    // orderkey/suppkey. A plan that shuffles the gear slice (or worse,
    // broadcasts a fact) regresses the 100 TB hierarchy.
    val p = planMap("q243_product_profit")
    val bhj = p.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2,
      s"part slice + nation must broadcast, found ${bhj.size} broadcast joins")
  }

  test("q244 plans one fact-fact join and map-combined CASE counts — no window, no extra pass") {
    val p = planMap("q244_delay_classes")
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "Q12's CASE counts must be conditional aggregation, not windows")
    // two join inputs + one 4-row aggregation exchange is the whole
    // shuffle budget; a second aggregation pass or a repartition would
    // show up as a fourth exchange
    val s = shuffles(p)
    assert(s.size <= 3, s"expected <= 3 exchanges, found ${s.size}: " +
      s.map(_.simpleStringWithNodeId()).mkString("; "))
    val aggs = p.collect { case h: HashAggregateExec => h }
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      "the CASE counts must partial-aggregate map-side")
  }

  test("ANN queries broadcast the small side, never a cartesian") {
    for (n <- Seq("q31_ann_bruteforce", "q44_ann_ivf", "q278_semdedup")) {
      val bc = planMap(n).collect {
        case j: BroadcastNestedLoopJoinExec => j: SparkPlan
        case j: BroadcastHashJoinExec => j: SparkPlan
      }
      assert(bc.nonEmpty, s"$n: queries/centroids side must broadcast")
    }
  }

  test("q278 semdedup: the within-cell pair stage stays a CELL-KEYED " +
      "equi-join carrying the dominance predicate — never a cartesian " +
      "or nested loop — under the occupancy guard") {
    // isolation: q278 persists its assignment frame; build alone so the
    // registry fixture cannot splice foreign cached pipelines in
    val nodes = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q278_semdedup"))
    }
    // the centroid-assignment cross joins (corpus x broadcast k-row
    // model table) are the adjudicated LUT shape; the ban is on the
    // PAIR stage — any nested-loop/cartesian carrying the pair-side
    // columns means the cell equi-key was lost
    val pairCols = Set("__oid", "__ov", "__on", "__ocs")
    val bad = nodes.collect {
      case j: CartesianProductExec => j.nodeName
      case j: BroadcastNestedLoopJoinExec
          if j.output.exists(a => pairCols(a.name)) => j.nodeName
    }
    assert(bad.isEmpty,
      s"q278's pair stage must never degrade to a cartesian/nested loop: $bad")
    // the pair stage: an equi-join whose ONLY key is `cell` and whose
    // condition carries the pushed dominance/cosine predicate — the
    // shape that keeps the quadratic work cell-confined. A guard edit
    // that lost the cell key would surface here as zero matches (the
    // cosine filter alone cannot equi-join).
    def cellKeyed(keys: Seq[Expression]): Boolean =
      keys.size == 1 && keys.head.references.size == 1 &&
        keys.head.references.head.name == "cell"
    val pairJoins = nodes.collect {
      case j: SortMergeJoinExec
          if cellKeyed(j.leftKeys) && j.condition.isDefined => j.nodeName
      case j: ShuffledHashJoinExec
          if cellKeyed(j.leftKeys) && j.condition.isDefined => j.nodeName
      case j: BroadcastHashJoinExec
          if cellKeyed(j.leftKeys) && j.condition.isDefined => j.nodeName
    }
    assert(pairJoins.nonEmpty,
      "q278's pair stage must plan as a cell-keyed hash/merge join " +
        "with the dominance predicate as its condition")
  }

  test("q279/q280/q282/q288 score from the STANDING dsir model table — " +
      "one feature explode, a broadcast weight join, no inline " +
      "training counts (q288 additionally reads the standing BPE " +
      "merge table)") {
    for (n <- Seq("q279_epoch_schedule", "q280_mixture_from_model",
        "q282_resampled_temperature", "q288_token_epoch_schedule")) {
      val nodes = withStaticPlans {
        spark.catalog.clearCache()
        expandedNodes(planOf(n))
      }
      // the model is read from the catalog table, never recounted
      assert(nodes.exists {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_dsirmdl_"))
        case _ => false
      }, s"$n must read the graft_dsirmdl_ catalog table")
      // exactly ONE corpus-width feature explode (scoring); the
      // inline-training shape would add a second instance pipeline
      val gens = nodes.collect {
        case g: GenerateExec if g.output.exists(_.name == "__feat") => g
      }
      assert(gens.size == 1,
        s"$n must explode features exactly once, found ${gens.size}")
      // the <= 1024-row weight table broadcasts into the scoring join
      assert(nodes.exists {
        case j: BroadcastHashJoinExec =>
          j.leftKeys.exists(_.references.exists(_.name == "bucket")) ||
            j.rightKeys.exists(_.references.exists(_.name == "bucket"))
        case _ => false
      }, s"$n: the bucket-keyed weight join must broadcast")
      if (n == "q288_token_epoch_schedule") {
        // the frozen merge LIST is driver metadata (collected at
        // construction), so the table scan cannot appear in the plan —
        // standing-ness is proven by the stamp: a REPLAN must reuse
        // the table, never retrain
        val before = graft.operators.BpeIndex.buildCount
        withStaticPlans { spark.catalog.clearCache(); planOf(n) }
        assert(graft.operators.BpeIndex.buildCount == before,
          "q288 must reuse the standing BPE merge table on replan, " +
            "never retrain")
      }
    }
  }

  test("window-form top-k auto-rewrite reaches its known registry queries") {
    // documents the rewrite's reach and pins that it stays active in
    // engine sessions: every query here spells grouped top-k (or argmax)
    // as row_number()<=k / rn=1 and must now plan the heap operator
    val rewritten = allPlans.collect {
      case (n, p) if p.exists {
        case _: graft.plans.FinalTopKPerKeyExec => true; case _ => false
      } => n
    }.toSet
    // q176 calls the operator directly; the rest arrive via the rewrite
    assert(rewritten.contains("q176_session_paths"))
    assert(rewritten.contains("q204_topk_operator"),
      s"q204's window spelling must rewrite; rewritten = $rewritten")
    assert(rewritten.size >= 3,
      s"expected the rewrite to reach several registry queries, got $rewritten")
  }

  // ------------------------------------------------------------------
  // Round-14 class locks: the round-13 queries (and the q160 rewrite)
  // pinned to the scale shapes they were designed with, so an innocent
  // edit cannot silently reintroduce the expensive form.
  // ------------------------------------------------------------------

  /** All nodes of `p`, descending through cached-relation plans and
    * nested AQE wrappers. Each DISTINCT cached relation expands once —
    * a persisted frame shared by two consumers counts its compute
    * ONCE, which is exactly what the single-pass locks measure. */
  /** Single-split copy of the fixture — the bench-scale layout where
    * [[Tables.spread]] MUST fire. The r16 single-core-cliff fixes
    * (q284's gate pushdown barrier, q229/q45's spread-before-
    * projection) have no observable shape on the multi-file fixture
    * (spread is a no-op there), so their locks plan against this. */
  private lazy val dir1: String = {
    val root = java.nio.file.Files.createTempDirectory("explain-audit-1f").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tb =>
      spark.read.parquet(s"/root/testdata/sf0.001/$tb.parquet")
        .coalesce(1)
        .write.parquet(s"$root/$tb.parquet")
    }
    root
  }

  /** Is a file scan reachable from `p` WITHOUT crossing a stage
    * boundary (shuffle/broadcast exchange, cached table)? A node whose
    * expensive expression is in the same stage as the scan runs on the
    * scan's split count — ONE core on a single-split corpus (guide
    * §2.5; the r16 cliffs). */
  private def scanInSameStage(p: SparkPlan): Boolean = p match {
    case _: ShuffleExchangeExec => false
    case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => false
    case _: InMemoryTableScanExec => false
    case _: ReusedExchangeExec => false
    case _: FileSourceScanExec => true
    case other => other.children.exists(scanInSameStage)
  }

  test("r16 cliff fixes hold on a single-split corpus: q229's bigram " +
      "HOFs, q45's levenshtein and q284's segmentation all evaluate " +
      "ABOVE an exchange, and q284's page gate keeps its pushdown barrier") {
    import org.apache.spark.sql.catalyst.expressions.{HigherOrderFunction, Levenshtein, SparkPartitionID}
    def hasHof(n: SparkPlan): Boolean = n.expressions.exists(_.exists {
      case _: HigherOrderFunction => true
      case _ => false
    })
    def hasLev(n: SparkPlan): Boolean = n.expressions.exists(_.exists {
      case _: Levenshtein => true
      case _ => false
    })
    def offenders(nodes: Seq[SparkPlan], pred: SparkPlan => Boolean) =
      nodes.filter(n => pred(n) && !n.isInstanceOf[FileSourceScanExec] &&
        n.children.exists(scanInSameStage))

    for ((q, pred, what) <- Seq[(String, SparkPlan => Boolean, String)](
      ("q229_coverage_select", hasHof, "bigram concat+distinct HOFs"),
      ("q45_edit_distance", hasLev, "per-pair levenshtein"),
      ("q284_c4_span_dedup", hasHof, "content-defined segmentation HOFs"))) {
      val nodes = withStaticPlans {
        spark.catalog.clearCache()
        expandedNodes(SparkEntry.queries(q)(spark, dir1)
          .queryExecution.executedPlan)
      }
      val exp = nodes.filter(pred)
      assert(exp.nonEmpty, s"$q: lock is vacuous — no node carries $what")
      val off = offenders(nodes, pred)
      assert(off.isEmpty,
        s"$q: $what evaluate in the SCAN stage of a single-split corpus " +
          s"(the r16 one-core cliff is back): " +
          off.map(_.simpleStringWithNodeId()).mkString("; "))
      if (q == "q284_c4_span_dedup") {
        // the gate itself (the r17 field-level barrier shape): the
        // kept-projection carries a nondeterministic `__barrier` field
        // (spark_partition_id), and the gate Filter reads the `kept`
        // and `__barrier` ATTRIBUTES — never the segmentation inline.
        // A Catalyst change that resumes substituting the predicate
        // through the projection (re-running the segmentation per
        // filter evaluation, or — worse — inlining it into the
        // scan-side filter) turns red here instead of silently slow.
        val barrierProjects = nodes.collect {
          case pr: ProjectExec if pr.projectList.exists(_.exists {
              case _: SparkPartitionID => true
              case _ => false
            }) => pr
        }
        assert(barrierProjects.nonEmpty,
          "q284: the kept-projection's spark_partition_id barrier " +
            "field is gone")
        val gateFilters = nodes.collect {
          case f: FilterExec
              if f.condition.references.exists(_.name == "__barrier") => f
        }
        assert(gateFilters.nonEmpty,
          "q284: no Filter reads the __barrier attribute — the page " +
            "gate moved or lost its barrier")
        assert(gateFilters.forall(f => !f.condition.exists {
            case _: HigherOrderFunction => true
            case _ => false
          }),
          "q284: the page gate inlined the segmentation (it must read " +
            "the staged `kept` attribute)")
      }
    }
  }

  private def expandedNodes(p: SparkPlan): Seq[SparkPlan] = {
    val seenCaches = scala.collection.mutable.Set[AnyRef]()
    def walk(pl: SparkPlan): Seq[SparkPlan] = {
      val nodes = pl.collect { case n => n }
      nodes ++ nodes.flatMap {
        case s: InMemoryTableScanExec
            if seenCaches.add(s.relation.cacheBuilder) =>
          walk(s.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => Nil
      }
    }
    walk(p)
  }

  test("q160 funnel plans exactly ONE corpus-width minhash pass") {
    // the round-12 single-pass rewrite, now locked: the verified-pairs
    // stage AND the decon banding must read the same persisted banded
    // frame — a second MinhashAll projection is a second full text
    // scan, the funnel's dominant avoidable cost at 100 TB
    val minhashNodes = expandedNodes(planMap("q160_curation_funnel"))
      .filter(_.expressions.exists(_.exists {
        case _: graft.expressions.MinhashAll => true
        case _ => false
      }))
    assert(minhashNodes.size == 1,
      s"q160 must compute minhash signatures exactly once, found " +
        s"${minhashNodes.size}: ${minhashNodes.map(_.nodeName).mkString(", ")}")
  }

  test("q264 reads the persisted suffix index — no inline rebuild") {
    val nodes = expandedNodes(planMap("q264_anylen_decontam"))
    assert(nodes.exists {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("graft_sufidx_"))
      case _ => false
    }, "q264 must read its ranks from the graft_sufidx_ catalog table")
    // an inline SuffixArray.suffixRanks build would surface as
    // checkpointed RDD scans where the catalog read sits
    val rddScans = nodes.collect { case r: RDDScanExec => r }
    assert(rddScans.isEmpty,
      s"q264 must not embed a checkpointed ranks build: " +
        rddScans.map(_.nodeName).mkString(", "))
  }

  test("q266 longest match: replanning reuses the standing suffix " +
      "index files (no rebuild while the corpus is fresh)") {
    withStaticPlans {
      planOf("q266_longest_match") // builds graft_sufidx_m10 if absent
      def location(): String =
        spark.sql("DESCRIBE TABLE EXTENDED graft_sufidx_m10").collect()
          .find(_.getString(0) == "Location").map(_.getString(1)).get
      // a rebuild rewrites the managed dir with fresh part-file UUIDs,
      // so the file-name set (not the stable warehouse path) is the
      // rebuild detector
      def partFiles(): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(location())
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.listStatus(p).map(_.getPath.getName).filter(_.startsWith("part-"))
          .toSet
      }
      val before = partFiles()
      planOf("q266_longest_match")
      assert(partFiles() == before,
        "a fresh corpus must not rebuild the suffix index between runs")
    }
  }

  test("q265/q268 DSIR: the <= B-row weight table BROADCASTS into the " +
      "scoring join; every shuffle ships only narrow key/count columns") {
    for (n <- Seq("q265_dsir_weights", "q268_dsir_heldout")) {
      val p = planMap(n)
      assert(p.exists {
        case j: BroadcastHashJoinExec => j.joinType == LeftOuter
        case _ => false
      }, s"$n: the per-instance scoring join must broadcast the weight table")
      // nothing corpus-width shuffles but (id, bucket) and the bounded
      // count aggregations — a wide exchange means the rewrite died
      val wide = shuffles(p).filter(e =>
        e.output.size > 4 || e.output.exists(a => PayloadCols(a.name)))
      assert(wide.isEmpty,
        s"$n: a shuffle ships more than narrow key/count columns: " +
          wide.map(_.output.map(_.name).mkString("(", ",", ")"))
            .mkString("; "))
    }
  }

  test("q270 keeps q265's broadcast-weight shape; q271 plans exactly " +
      "one banding pass for its two LSH gates") {
    // q270: the resample decision is a pure per-row projection on top
    // of the scoring join — the weight table still broadcasts and no
    // shuffle ships a raw payload
    val p270 = planMap("q270_dsir_resample")
    assert(p270.exists {
      case j: BroadcastHashJoinExec => j.joinType == LeftOuter
      case _ => false
    }, "q270: the weight table must broadcast into the scoring join")
    assert(shuffles(p270).forall(e =>
      !e.output.exists(a => PayloadCols(a.name))),
      "q270: a shuffle ships a raw payload")
    // q271: the near-dup gate AND the token-decon gate must read ONE
    // persisted banding frame (the q160 single-pass discipline). Built
    // in ISOLATION: the registry-wide fixture leaves other queries'
    // persisted frames registered, and CacheManager substitution can
    // splice a foreign cached pipeline into this plan tree
    val mh = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q271_admission_matrix"))
    }.filter(_.expressions.exists(_.exists {
        case _: graft.expressions.MinhashAll => true
        case _ => false
      }))
    assert(mh.size == 1,
      s"q271 must compute minhash signatures exactly once, found " +
        s"${mh.size}: ${mh.map(_.nodeName).mkString(", ")}")
  }

  test("q263/q269 LMs: every model join is a vocabulary-keyed broadcast " +
      "left join over an AGGREGATED side; nothing sort-merge joins") {
    for ((n, wantJoins) <- Seq("q263_bigram_surprise_heldout" -> 2,
        "q269_backoff_surprise" -> 5)) {
      val p = planMap(n)
      val lefts = p.collect {
        case j: BroadcastHashJoinExec if j.joinType == LeftOuter => j
      }
      assert(lefts.size == wantJoins,
        s"$n: expected $wantJoins vocabulary-keyed broadcast left joins " +
          s"(one per model count table), got ${lefts.size}")
      lefts.foreach { j =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        assert(build.exists {
          case _: HashAggregateExec | _: ObjectHashAggregateExec |
              _: SortAggregateExec => true
          case _ => false
        }, s"$n: a model join broadcasts an un-aggregated side")
      }
      assert(p.collect { case s: SortMergeJoinExec => s }.isEmpty,
        s"$n: model joins must broadcast, never sort-merge")
    }
  }

  // ------------------------------------------------------------------
  // Round-15 class locks: the round-14 curation-recipe queries pinned
  // to the scale shapes they were designed with.
  // ------------------------------------------------------------------

  /** Peel execution wrappers until the first structural node — used to
    * assert what a Window/Sort ACTUALLY consumes. */
  @tailrec
  private def peeled(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => peeled(w.child)
    case i: InputAdapter => peeled(i.child)
    case c: ColumnarToRowExec => peeled(c.child)
    case s: SortExec => peeled(s.child)
    case e: ShuffleExchangeExec => peeled(e.child)
    case pr: ProjectExec => peeled(pr.child)
    case other => other
  }

  /** The boundary-window lock shared by q272 and q274 (and the
    * CcnetStream read path, which routes through the same bucketsOf
    * fold q274 plans): every Window in the plan must consume a
    * (lang, mbits)-grouped HASH AGGREGATE — the support-bounded
    * histogram — never per-document (corpus-width) rows. A window
    * whose sort ingests the corpus is exactly the q67 class of bug
    * the recipe's never-sorts-the-corpus claim rules out. */
  private def assertHistogramWindow(name: String, nodes: Seq[SparkPlan]): Unit = {
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"$name must plan the tercile boundary window")
    windows.foreach { w =>
      peeled(w.child) match {
        case a: HashAggregateExec =>
          val keys = a.groupingExpressions.map(_.name).toSet
          assert(keys == Set("lang", "mbits"),
            s"$name: the boundary window must run over the (lang, mbits) " +
              s"histogram aggregate, found grouping $keys")
        case other => fail(
          s"$name: the boundary window consumes ${other.nodeName} — a " +
            "corpus-width sort, not the support-bounded histogram")
      }
    }
  }

  test("q272 ccnet buckets: tercile boundaries fold over the bounded " +
      "(lang, mbits) histogram — never a corpus sort — and the corpus " +
      "explodes into bigrams exactly ONCE") {
    // isolation: q272 persists its bigram frame; the registry fixture
    // could splice foreign cached pipelines into the walked tree
    val nodes = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q272_ccnet_buckets"))
    }
    assertHistogramWindow("q272", nodes)
    val bigramGens = nodes.collect {
      case g: GenerateExec if g.output.exists(_.name == "b") => g
    }
    assert(bigramGens.size == 1,
      s"q272 must explode the corpus into bigrams exactly once (the " +
        s"persisted frame feeds both count tables), found " +
        s"${bigramGens.size}")
  }

  test("q281 quality mixture: q272's scoring shape rides through — one " +
      "bigram explode, histogram-window boundaries, and the keep " +
      "projection adds no corpus-width stage") {
    // isolation: q281 persists the shared bigram/perDoc frames
    val nodes = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q281_quality_mixture"))
    }
    assertHistogramWindow("q281", nodes)
    val bigramGens = nodes.collect {
      case g: GenerateExec if g.output.exists(_.name == "b") => g
    }
    assert(bigramGens.size == 1,
      s"q281 must explode the corpus into bigrams exactly once (the " +
        s"shared ccnetPerDoc persist), found ${bigramGens.size}")
    // the sampled keep decision is scan/projection work — no extra
    // window or generate beyond the scoring pipeline's own
    val wins = nodes.collect { case w: WindowExec => w }
    assert(wins.size == 1,
      s"q281 must plan exactly the boundary window, found ${wins.size}")
  }

  test("q273 gopher rules: the gate is ONE per-row projection over the " +
      "scan — no joins, no windows, no explode — and only narrow " +
      "aggregates shuffle") {
    val p = planMap("q273_gopher_rules")
    val structural = p.collect {
      case j: BroadcastHashJoinExec => j.nodeName
      case j: SortMergeJoinExec => j.nodeName
      case j: BroadcastNestedLoopJoinExec => j.nodeName
      case j: CartesianProductExec => j.nodeName
      case w: WindowExec => w.nodeName
      case g: GenerateExec => g.nodeName
    }
    assert(structural.isEmpty,
      s"q273 must stay a pure scan-stage projection, found: " +
        s"${structural.mkString(", ")}")
    assert(p.collect { case f: FileSourceScanExec => f }.size == 1,
      "q273 must read the corpus exactly once")
    shuffles(p).foreach { e =>
      assert(!e.output.exists(a => PayloadCols(a.name)) &&
        e.output.size <= 8,
        s"q273: the only shuffle is the source-bounded aggregation, " +
          s"saw ${e.output.map(_.name).mkString("(", ",", ")")}")
    }
  }

  test("q274 ccnet heldout: the frozen-LM scoring joins are " +
      "vocabulary-keyed broadcast LEFT joins over aggregated model " +
      "tables (q263's class), the training corpus explodes once, and " +
      "the tercile fold keeps q272's histogram-window shape") {
    val nodes = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q274_ccnet_heldout"))
    }
    val lefts = nodes.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftOuter => j
    }
    assert(lefts.size == 2,
      s"q274: expected 2 vocabulary-keyed broadcast left joins (c12, " +
        s"c1), got ${lefts.size}")
    lefts.foreach { j =>
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      assert(build.exists {
        case _: HashAggregateExec | _: ObjectHashAggregateExec |
            _: SortAggregateExec => true
        case _: InMemoryTableScanExec => true // aggregated + persisted
        case _ => false
      }, "q274: a model join broadcasts an un-aggregated side")
    }
    assert(nodes.collect { case s: SortMergeJoinExec => s }.isEmpty,
      "q274: model joins must broadcast, never sort-merge")
    // the TRAINING corpus explodes into bigrams exactly once (the
    // persisted frame feeds c12 AND c1); the eval split explodes once
    // more for scoring — two bigram explodes total, never three
    val bigramGens = nodes.collect {
      case g: GenerateExec if g.output.exists(_.name == "b") => g
    }
    assert(bigramGens.size == 2,
      s"q274: expected exactly 2 bigram explodes (train persisted + " +
        s"eval scoring), found ${bigramGens.size}")
    assertHistogramWindow("q274", nodes)
  }

  test("q275 nine-gate matrix: ONE minhash pass feeds both LSH gates, " +
      "two bigram explodes feed the LM gate, the tercile fold keeps " +
      "the histogram-window class, and nothing sort-merge joins") {
    val nodes = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q275_recipe_matrix"))
    }
    val mh = nodes.filter(_.expressions.exists(_.exists {
      case _: graft.expressions.MinhashAll => true
      case _ => false
    }))
    assert(mh.size == 1,
      s"q275 must compute minhash signatures exactly once, found " +
        s"${mh.size}: ${mh.map(_.nodeName).mkString(", ")}")
    val bigramGens = nodes.collect {
      case g: GenerateExec if g.output.exists(_.name == "b") => g
    }
    assert(bigramGens.size == 2,
      s"q275: expected exactly 2 bigram explodes (reference persisted " +
        s"+ training scoring), found ${bigramGens.size}")
    assertHistogramWindow("q275", nodes)
    // the LM model joins broadcast over AGGREGATED sides (q263's
    // class); the narrow flag joins and the broadcastProbes=false
    // semantic verify are ALLOWED to sort-merge under static planning
    // (AQE upgrades the flag joins at runtime; the semantic path is
    // the documented offline shuffle-merge shape)
    val modelJoins = nodes.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftOuter &&
          (j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }).exists {
            case _: HashAggregateExec | _: ObjectHashAggregateExec |
                _: SortAggregateExec => true
            case _ => false
          } => j
    }
    assert(modelJoins.size >= 2,
      s"q275: the c12/c1 model joins must broadcast aggregated sides, " +
        s"found ${modelJoins.size}")
  }

  test("q277 repetition rules: ALL gram sizes come from ONE explode " +
      "(a single corpus pass) and no shuffle ships text") {
    val p = planMap("q277_repetition_rules")
    val gens = p.collect { case g: GenerateExec => g }
    assert(gens.size == 1,
      s"q277 must produce every (n, gram) instance in one explode, " +
        s"found ${gens.size}: ${gens.map(_.nodeName).mkString(", ")}")
    assert(shuffles(p).forall(e =>
      !e.output.exists(a => PayloadCols(a.name))),
      "q277: a shuffle ships a raw payload — only gram hashes travel")
  }

  test("q283 C4 line audit is ONE per-row array projection + a " +
      "source-bounded aggregation — no join, no explode, narrow " +
      "shuffles only") {
    val p = planMap("q283_c4_line_audit")
    val joins = p.collect {
      case j: SortMergeJoinExec => j.nodeName
      case j: BroadcastHashJoinExec => j.nodeName
      case j: ShuffledHashJoinExec => j.nodeName
      case j: CartesianProductExec => j.nodeName
      case j: BroadcastNestedLoopJoinExec => j.nodeName
    }
    assert(joins.isEmpty, s"q283 grew a join: $joins")
    assert(p.collect { case g: GenerateExec => g }.isEmpty,
      "q283 must not explode — sentence metrics are array lambdas " +
        "inside the scan-stage projection")
    assert(shuffles(p).forall(e =>
      !e.output.exists(a => PayloadCols(a.name))),
      "q283: a shuffle ships the raw text payload")
  }

  test("q284 C4 span dedup: winner resolution is a SPAN-HASH-keyed " +
      "equi-join, untouched pages bypass via anti joins, never a " +
      "cartesian") {
    // isolation: q284 persists its page frame; build alone so the
    // registry fixture cannot splice foreign cached pipelines in
    val nodes = withStaticPlans {
      spark.catalog.clearCache()
      expandedNodes(planOf("q284_c4_span_dedup"))
    }
    val bad = nodes.collect {
      case j: CartesianProductExec => j.nodeName
      case j: BroadcastNestedLoopJoinExec => j.nodeName
    }
    assert(bad.isEmpty, s"q284 degraded to a cartesian/nested loop: $bad")
    def shKeyed(keys: Seq[Expression]): Boolean =
      keys.size == 1 && keys.head.references.size == 1 &&
        keys.head.references.head.name == "sh"
    val winnerJoins = nodes.collect {
      case j: SortMergeJoinExec if shKeyed(j.leftKeys) => j.nodeName
      case j: ShuffledHashJoinExec if shKeyed(j.leftKeys) => j.nodeName
      case j: BroadcastHashJoinExec if shKeyed(j.leftKeys) => j.nodeName
    }
    assert(winnerJoins.nonEmpty,
      "q284's winner resolution must join on the 60-bit span hash — " +
        "losing the sh key means span text or a corpus window crept in")
    val antis = nodes.collect {
      case j: SortMergeJoinExec if j.joinType == LeftAnti => j
      case j: ShuffledHashJoinExec if j.joinType == LeftAnti => j
      case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
    }
    assert(antis.size >= 2,
      "q284 must keep BOTH anti joins: the untouched-page bypass and " +
        s"the removed-sentence subtraction; found ${antis.size}")
  }

  test("q286 BPE tokenization: the corpus joins the vocab map BY WORD " +
      "and token ARRAYS never cross an exchange") {
    // building this plan runs the q285 trainer's driver rounds (the
    // q48/q245 eager-construction class) — cheap at the fixture scale
    val p = planMap("q286_bpe_tokenize")
    def wordKeyed(keys: Seq[Expression]): Boolean =
      keys.nonEmpty && keys.forall(k => k.references.size == 1 &&
        k.references.head.name == "word")
    val wordJoins = expandedNodes(p).collect {
      case j: SortMergeJoinExec if wordKeyed(j.leftKeys) => j.nodeName
      case j: ShuffledHashJoinExec if wordKeyed(j.leftKeys) => j.nodeName
      case j: BroadcastHashJoinExec if wordKeyed(j.leftKeys) => j.nodeName
    }
    assert(wordJoins.nonEmpty,
      "q286 must tokenize by joining exploded words against the " +
        "vocab map on the word key")
    val arrayShuffles = shuffles(p).filter(_.output.exists(
      _.dataType.isInstanceOf[ArrayType]))
    assert(arrayShuffles.isEmpty,
      "q286: a symbol/token array crossed an exchange — only token " +
        "COUNTS may leave the vocab table")
  }

  test("q276 resampled mixture keeps q270's broadcast-weight scoring " +
      "shape; only narrow key/count columns shuffle") {
    val p = planMap("q276_resampled_mixture")
    assert(p.exists {
      case j: BroadcastHashJoinExec => j.joinType == LeftOuter
      case _ => false
    }, "q276: the weight table must broadcast into the scoring join")
    val wide = shuffles(p).filter(e =>
      e.output.size > 4 || e.output.exists(a => PayloadCols(a.name)))
    assert(wide.isEmpty,
      s"q276: a shuffle ships more than narrow key/count columns: " +
        wide.map(_.output.map(_.name).mkString("(", ",", ")"))
          .mkString("; "))
  }

  // -------------------------------------------------------------------
  // The q139 lesson (round 7's only red row): a query that ships a
  // DIVISION-PRODUCED double to the gate is engine-exact locally yet
  // hash-fragile at the driver — the registry convention is integer
  // basis points via cross-multiplication. This sweep turns that
  // convention into CI: a float-valued output column is a failure
  // unless the query is allowlisted WITH a same-bits justification
  // (a value both engines must produce bit-identically: one cast of an
  // exact decimal/integer, or one division of two exact integers whose
  // IEEE rounding is deterministic — never accumulated float state).
  // -------------------------------------------------------------------

  /** query -> why its float output is bit-stable across engines. Four
    * mechanism families cover the registry (every entry is also
    * empirically hash-green at the driver across rounds — the tags say
    * WHY that holds, so a new query can be judged against them):
    *
    *  - EXACT_CAST: the double is ONE output-stage cast of an exact
    *    DECIMAL/BIGINT aggregate (house money convention), and/or ONE
    *    division of exact values, spelled identically in the oracle.
    *    IEEE-754 casts and single divisions are correctly rounded, so
    *    both engines produce the same bits; no accumulated float state.
    *  - STORED: a stored-double source column passed through or
    *    SELECTED (min/max/argmax/lag-fill/median pick, possibly one
    *    correctly-rounded +/- mirrored in the oracle) — selection, not
    *    accumulation.
    *  - VECTOR_FOLD: float dot products/cosines via ordered folds with
    *    the SAME association order spelled in the oracle — bit-identical
    *    accumulation by construction.
    *  - MIRRORED_SEQ: a scalar float evaluation sequence (log/PMI/power
    *    iteration/corr) stated verbatim in both engines — same ops,
    *    same order, same bits.
    *
    * A NEW float output must either fit one of these (add it below) or
    * be restated float-free (integer basis points via
    * cross-multiplication — the q139 fix). */
  private val FloatOutputJustified: Map[String, String] = {
    val EXACT_CAST = "one cast of an exact DECIMAL/BIGINT aggregate and/or ONE exact-value division, mirrored in the oracle"
    val STORED = "stored-double column passthrough/selection, no accumulation"
    val VECTOR_FOLD = "ordered-fold vector arithmetic, same association order in the oracle"
    val MIRRORED_SEQ = "identical scalar float op sequence stated verbatim in both engines"
    Seq(
      EXACT_CAST -> Seq(
        "q01_pricing_summary", "q08_enrich_join", "q10_union_all",
        "q111_cube", "q16_date_bucket", "q183_trailing_week",
        "q184_unpivot_measures", "q186_shipping_priority",
        "q187_regional_volume", "q188_returned_revenue",
        "q190_promo_share", "q191_min_cost_supplier", "q192_big_orders",
        "q194_dormant_rich", "q195_revenue_share",
        "q198_disjunctive_revenue", "q199_bilateral_trade",
        "q19_window_hourly", "q200_market_share", "q202_salted_join",
        "q205_kmv_intersection", "q208_top_supplier",
        "q210_small_qty_revenue", "q216_grouping_sets",
        "q218_schema_drift_union", "q220_forecast_revenue",
        "q222_important_parts", "q243_product_profit",
        // priority + est_w: ONE IEEE division of exactly-representable
        // integers and a max over exact values — no ln() (libm rule)
        "q247_priority_sample",
        "q35_sessionize", "q36_rollup",
        "q39_salted_agg", "q40_weighted_avg", "q53_window_analytics",
        "q54_sliding_window", "q62_json_extract", "q21_token_stats",
        "q22_text_profile", "q24_quality_score", "q28_lsh_dup_pairs",
        "q30_ngram_jaccard", "q58_decontaminate", "q59_prefix_ssjoin",
        "q61_repetition_stats", "q63_oov_rate", "q66_boilerplate_frac",
        "q68_corpus_datasheet", "q69_kmv_distinct",
        "q77_containment_join", "q84_minhash_accuracy",
        "q86_vocab_coverage", "q89_crosslang_neardup",
        "q91_blocklist_filter", "q94_heavy_hitters",
        "q168_sorted_neighborhood", "q181_winsorized_stats"),
      STORED -> Seq(
        "q02_company_filter", "q04_doc_semi_join", "q06_best_per_group",
        "q07_argmax", "q09_limit_ordered", "q137_ohlc_bars",
        "q138_gap_fill", "q142_scd2_intervals", "q166_weighted_median",
        "q167_skyline", "q172_mad_outliers", "q46_median",
        "q96_topk_per_group"),
      VECTOR_FOLD -> Seq(
        "q267_semantic_decontam",
        "q31_ann_bruteforce", "q32_embedding_neardup", "q33_ann_lsh",
        "q44_ann_ivf", "q64_ann_multiprobe", "q81_label_centroids",
        "q106_diverse_ann", "q119_hard_negatives", "q125_ann_pq",
        "q150_ann_ivfpq", "q185_kcenter_coreset", "q130_jl_distortion",
        "q57_int8_quantize", "q93_embedding_dimstats",
        "q174_multimodal_decode"),
      MIRRORED_SEQ -> Seq(
        "q52_idf_top_terms", "q67_collocations", "q70_pagerank",
        "q127_pca_power", "q129_pca_deflate", "q164_acf",
        "q170_changepoint", "q99_grouped_corr", "q83_quality_resample",
        // selected integer micro-values enter ONE mirrored lerp
        // (vLo + frac*(vHi-vLo)) — a sequence, not a pure selection
        "q211_interpolated_quantiles")
    ).flatMap { case (why, qs) => qs.map(_ -> why) }.toMap
  }

  private def floatLeaves(dt: org.apache.spark.sql.types.DataType,
      path: String): Seq[String] = dt match {
    case org.apache.spark.sql.types.DoubleType => Seq(s"$path:double")
    case org.apache.spark.sql.types.FloatType => Seq(s"$path:float")
    case a: org.apache.spark.sql.types.ArrayType =>
      floatLeaves(a.elementType, s"$path[]")
    case m: org.apache.spark.sql.types.MapType =>
      floatLeaves(m.keyType, s"$path.key") ++
        floatLeaves(m.valueType, s"$path.value")
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.toSeq.flatMap(f => floatLeaves(f.dataType, s"$path.${f.name}"))
    case _ => Nil
  }

  test("registry lint: no float-valued output column without a same-bits justification") {
    // schema-only: analysis is cheap, no query executes (q48 is the
    // exception — it runs its fixpoint during construction — so it
    // reads the tiny sf0.001 dir like everything here)
    val byQuery = SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      n -> fn(spark, "/root/testdata/sf0.001").schema.fields.toSeq
        .flatMap(f => floatLeaves(f.dataType, f.name))
    }
    spark.catalog.clearCache()
    val offenders = byQuery.collect {
      case (n, fs) if fs.nonEmpty && !FloatOutputJustified.contains(n) =>
        s"$n -> ${fs.mkString(", ")}"
    }
    assert(offenders.isEmpty,
      "float-valued output columns need a same-bits justification in " +
        s"FloatOutputJustified (or an integer-bp restatement):\n  " +
        offenders.mkString("\n  "))
    // the allowlist cannot rot: every entry must still emit a float
    val stale = FloatOutputJustified.keySet.filter(n =>
      byQuery.toMap.get(n).forall(_.isEmpty))
    assert(stale.isEmpty, s"stale FloatOutputJustified entries: $stale")
  }

  private def decimalLeaves(dt: org.apache.spark.sql.types.DataType,
      path: String): Seq[String] = dt match {
    case d: org.apache.spark.sql.types.DecimalType =>
      Seq(s"$path:decimal(${d.precision},${d.scale})")
    case a: org.apache.spark.sql.types.ArrayType =>
      decimalLeaves(a.elementType, s"$path[]")
    case m: org.apache.spark.sql.types.MapType =>
      decimalLeaves(m.keyType, s"$path.key") ++
        decimalLeaves(m.valueType, s"$path.value")
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.toSeq.flatMap(f => decimalLeaves(f.dataType, s"$path.${f.name}"))
    case _ => Nil
  }

  test("registry lint: no DECIMAL-typed output column, ever") {
    // Round-8 driver gate post-mortem: the ONLY 4 hash-red rows in
    // CORRECTNESS_r08 were exactly the registry's 3 DECIMAL-output
    // queries (q139/q228/q237) plus its one un-cast HUGEINT oracle
    // (q241) — the driver renders DECIMAL divergently across its two
    // read paths even on bit-identical values. DECIMAL is welcome as
    // INTERNAL exact-arithmetic state (the money convention casts
    // through DECIMAL(12,2)/DECIMAL(38,0) everywhere); at the OUTPUT
    // boundary it must leave as BIGINT (or a hi/lo BIGINT split for
    // >63-bit magnitudes, value = hi * 10^15 + lo). No allowlist: a
    // justified case would still be driver-red, so there is none.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (n, fn) =>
        val fs = fn(spark, "/root/testdata/sf0.001").schema.fields.toSeq
          .flatMap(f => decimalLeaves(f.dataType, f.name))
        if (fs.isEmpty) Nil else Seq(s"$n -> ${fs.mkString(", ")}")
    }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      "DECIMAL output columns are driver-divergent — emit BIGINT or a " +
        s"hi/lo split instead:\n  ${offenders.mkString("\n  ")}")
  }
}
