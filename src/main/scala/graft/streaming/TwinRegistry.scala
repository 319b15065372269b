package graft.streaming

/** The authoritative twin matrix — every streaming twin the engine
  * ships, with WHERE each of the three operational properties
  * (restart merge law, crash replay, empty batch) and the semantic
  * stream==batch equality are proven. `graft.TwinsDoc` renders it
  * into COVERAGE.md between sentinel markers, and TwinRegistrySpec
  * fails the build when (a) a streaming source file or EventsStream
  * stream builder has no row here, (b) a TwinConformanceSpec
  * instantiation and the matrix disagree, or (c) the rendered table
  * in COVERAGE.md has drifted from this code — the round-16 VERDICT
  * item: the 25-twin coverage claim, mechanically auditable.
  */
object TwinRegistry {

  /** One twin. `conformance` names where the three operational
    * properties are proven; `harnessBlock` is the
    * TwinConformanceSpec instantiation name when the uniform harness
    * covers it (None for the documented out-of-harness families). */
  final case class Twin(
      name: String,
      stream: String,
      harnessBlock: Option[String],
      conformance: String,
      semantics: String)

  private def logTwin(name: String, stream: String, block: String,
      semantics: String): Twin =
    Twin(name, stream, Some(block),
      "TwinConformanceSpec (merge law + crash replay + empty batch)",
      semantics)

  private def eventsTwin(name: String, method: String,
      semantics: String): Twin =
    Twin(name, s"EventsStream.$method", None,
      "watermark family — restart/replay are the state store's " +
        "contract (StreamingSpec query-progress + batch-mode " +
        "equality); an empty batch cannot advance a watermark " +
        "(documented out of harness scope)",
      semantics)

  /** Every twin, in documentation order. */
  val all: Seq[Twin] = Seq(
    // ---- EventsStream watermark family ------------------------------
    eventsTwin("windowed agg + watermark", "windowedAgg",
      "StreamingSpec: stream==batch counts (q19 batch twin)"),
    eventsTwin("windowed OHLC bars", "ohlcStream",
      "StreamingSpec: closed bars bit-identical to batch q137"),
    eventsTwin("interval self-join", "intervalSelfJoin",
      "StreamingSpec: pairs == batch interval join (q43 family)"),
    eventsTwin("stream-stream attribution join", "attributionJoin",
      "StreamingSpec: matched pairs == batch twin; nulls sound past " +
        "the final watermark (q108 batch reduction)"),
    eventsTwin("dimension-enriched stream", "enrichedStream",
      "StreamingSpec: enriched rows == batch broadcast join"),
    eventsTwin("watermark dedup", "dedupedStream",
      "StreamingSpec: deduped rows == batch distinct"),
    eventsTwin("session window (built-in gap)", "sessionWindowStream",
      "StreamingSpec: closed sessions == batch gap sessions"),
    eventsTwin("chained dedup -> sliding distinct", "slidingDistinctStream",
      "StreamingSpec: >= 2 state operators; closed windows == batch " +
        "q207; batch mode == q207 exactly"),
    eventsTwin("online anomaly flags", "anomalyStream",
      "StreamingSpec + oracle q80: stream==batch flags; batch mode " +
        "== q80 exactly"),
    eventsTwin("per-window KLL quantiles", "quantileStream",
      "StreamingSpec: closed rows == batch twin q109"),
    eventsTwin("event-type transition matrix", "transitionStream",
      "StreamingSpec: batch mode == q158 exactly; streamed pairs a " +
        "strict batch subset"),
    eventsTwin("ordered pattern match", "patternStream",
      "StreamingSpec: matches == batch pattern twin"),
    eventsTwin("integer EWMA", "ewmaStream",
      "StreamingSpec: stream rows == batch; batch mode == q149 exactly"),
    eventsTwin("time-weighted average (TWAP)", "twapStream",
      "StreamingSpec: emitted hours subset of batch mode with exact " +
        "values; batch mode aggregates to q228's totals"),
    eventsTwin("per-window drift histogram", "driftStream",
      "StreamingSpec: closed rows == batch twin q113"),
    eventsTwin("gap sessionization (fMGWS)", "sessionize",
      "StreamingSpec + oracle q35: batch == q35 exact; shuffled-" +
        "replay closed-set equivalence"),
    eventsTwin("stateful funnel", "funnelStream",
      "StreamingSpec: batch mode == declarative twin; stream emits " +
        "exactly the watermark-closed funnels"),
    eventsTwin("U-shaped multi-touch attribution", "attributionStream",
      "StreamingSpec x3 + oracle q231: batch aggregates == q231; " +
        "streamed rows a batch subset with per-conversion 10000 sums"),
    // ---- log twins (uniform TwinConformance harness) ----------------
    logTwin("weighted-reservoir sample", "SampleStream",
      "weighted-reservoir",
      "SampleStreamSpec: reservoir == batch q247 twin after every " +
        "prefix + across compaction; replay invariance"),
    logTwin("drift monitor (KS + W1)", "DriftStream", "drift-monitor",
      "DriftStreamSpec: monitor == batch q251/q252 twin after every " +
        "prefix, across compaction"),
    logTwin("CUSUM changepoint monitor", "CusumStream",
      "cusum-changepoint",
      "CusumStreamSpec: changepoints == batch q256 twin after every " +
        "prefix, across compaction"),
    logTwin("histogram-Spearman monitor", "SpearmanStream",
      "spearman-monitor",
      "SpearmanStreamSpec: rho == batch q259 twin after every prefix"),
    logTwin("LSH near-dup candidate index", "DedupIndexStream",
      "lsh-dedup-index",
      "DedupIndexStreamSpec: candidates == batch lshCandidates after " +
        "every prefix; capped read == capped batch twin"),
    logTwin("KMV distinct sketch", "KmvStream", "kmv-sketch",
      "KmvStreamSpec: sketch == batch q69 twin after every prefix"),
    logTwin("incremental bigram LM", "LmStream", "bigram-lm",
      "LmStreamSpec x3: scores == batch arithmetic after every " +
        "prefix; both smoothing branches exercised"),
    logTwin("incremental DSIR model", "DsirStream", "dsir-model",
      "DsirStreamSpec x3: scores == batch arithmetic after every " +
        "prefix; never-seen buckets smoothed"),
    logTwin("trigram backoff LM", "BackoffLmStream", "backoff-lm",
      "BackoffLmStreamSpec x2: scores == batch reference after every " +
        "prefix; all four backoff levels non-vacuous"),
    logTwin("longest-match decon read", "LongestMatchStream",
      "longest-match-decon",
      "LongestMatchStreamSpec: streamed spans == batch q266 over the " +
        "union across a restart; index scored, never rebuilt"),
    logTwin("CCNet bucketing (frozen LM)", "CcnetStream",
      "ccnet-buckets",
      "CcnetStreamSpec: streamed buckets == the batch fold over the " +
        "union across a restart; boundary memo keyed on the listing"),
    logTwin("rule-gate quality audit", "QualityAuditStream",
      "quality-audit",
      "QualityAuditStreamSpec: audit == batch q273+q277+q283 " +
        "arithmetic after every prefix, across compaction"),
    logTwin("incremental SemDeDup", "SemDedupStream",
      "semdedup-incremental",
      "SemDedupStreamSpec: stream == batch semDedup over the union " +
        "with frozen centroids after every prefix, incl. the " +
        "retroactive drop; staleness trigger"),
    logTwin("mixture monitor (frozen DSIR model)", "MixtureStream",
      "mixture-monitor",
      "MixtureStreamSpec: mixture == batch q280 arithmetic under the " +
        "frozen model after every prefix, across compaction; " +
        "admission tracks dropped mass; shared Dsir.mixtureWeights " +
        "fold"),
    logTwin("token-budget monitor (frozen BPE merges)", "TokenBudgetStream",
      "token-budget",
      "TokenBudgetStreamSpec: budget == batch Bpe.tokenStats (q286's " +
        "shared statement) under the frozen table after every prefix, " +
        "across compaction; untrained table fails loud"),
    logTwin("C4 span-dedup index", "SpanDedupStream",
      "c4-span-dedup",
      "SpanDedupStreamSpec: deduped corpus == batch spanDedup over " +
        "the union after every prefix, incl. a retroactive winner " +
        "theft; compaction invariance"),
    Twin("curated ingest sink", "CurateStream", Some("curate-sink"),
      "TwinConformanceSpec (crash replay + empty batch; merge law " +
        "documented OFF — within-batch near-dup is a per-batch " +
        "grain, cross-batch semantics pinned in CurateStreamSpec)",
      "CurateStreamSpec: two-restart stream == batch-composed " +
        "q273/q272 gates; gated content absent from the hash index"),
    Twin("CDC merge sink", "MergeSink", Some("merge-sink"),
      "TwinConformanceSpec (crash replay + empty batch; merge law " +
        "documented OFF — upserts are batch-ordered, resolution " +
        "rules pinned in MergeSinkSpec)",
      "MergeSinkSpec: resolved table == ordered upsert fold (q153 " +
        "family)"),
    // ---- standing-index maintenance (out of harness, stated why) ----
    Twin("IVF ANN index upkeep", "AnnIndexStream", None,
      "out of harness scope — staleness-triggered retrain makes " +
        "one-shot vs multi-epoch ingest legitimately different index " +
        "generations; exactly-once gen-sliced appends + crash " +
        "recovery proven in AnnIndexStreamSpec",
      "AnnIndexStreamSpec: append == assign-to-frozen-cells; probe " +
        "reads unchanged; staleness rows incremental"))

  /** Markdown table, rendered between the COVERAGE.md sentinels. */
  def markdownTable: String = {
    val header =
      "| Twin | Stream | Operational proofs (restart / replay / empty) | Stream == batch semantics |\n" +
        "|---|---|---|---|"
    val rows = all.map { t =>
      val conf = t.harnessBlock match {
        case Some(b) => s"${t.conformance} — block `$b`"
        case None => t.conformance
      }
      s"| ${t.name} | `${t.stream}` | $conf | ${t.semantics} |"
    }
    (header +: rows).mkString("\n")
  }
}
