package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable

/** Persisted suffix-rank index — the build-once side of the
  * suffix-array family (the [[graft.streaming.AnnIndexStream]] /
  * buildIvfIndex pattern applied to [[SuffixArray]]).
  *
  * [[SuffixArray.suffixRanks]] is the dominant cost of all three of
  * its consumers (q245's rank audit, q246's repeated-substring scan,
  * q260's decontamination lookup); at production scale the index is
  * built ONCE per corpus snapshot and amortized across every consumer
  * and every eval-set refresh. This object makes that amortization
  * real: [[ranks]] returns the (idCol, pos, suffix_rank) table from a
  * persisted table keyed by a caller-chosen corpus `tag`, building it
  * only when absent or STALE.
  *
  * WHERE THE TABLE LIVES — the buildIvfIndex/buildSrpIndex managed-
  * table convention: by default the index is a warehouse-MANAGED
  * `saveAsTable` (no explicit path — the warehouse is the cluster's
  * shared durable store, never a driver-local disk). Within one
  * session that amortizes across every consumer and survives
  * `clearCache()` (the bench convention); it survives a session
  * RESTART only when the deployment has a persistent catalog (e.g. a
  * Hive metastore) over a durable warehouse. Deployments without a
  * persistent catalog pass an explicit `root` (any shared
  * filesystem): the index data AND a stamp sidecar live under
  * `root/tag/`, and a later session — whose catalog has never heard
  * of the table — re-REGISTERS the existing files after re-validating
  * the sidecar stamp against the live corpus, paying zero rebuild.
  *
  * Staleness is a content fingerprint stamped into TBLPROPERTIES (and
  * the sidecar, when externally rooted) at build time: (row count,
  * total text chars, XOR of pmd5(id # textlen)) — one cheap columnar
  * aggregation per read (pruned to two columns), never an index
  * rebuild. The hash term couples each id to its document's length,
  * so id swaps between different-length documents and id-set-
  * preserving reassignments move the stamp (a plain id sum missed
  * both), and two distinct corpora colliding on the whole stamp needs
  * a 60-bit-hash coincidence, not a 3-aggregate one. What it still
  * cannot see: a SAME-LENGTH in-place character edit (or an id swap
  * between two same-length documents) — the documented trade (a full
  * content hash would cost a text-width scan per read). Callers whose
  * corpus can move stamp-invisibly MUST fold an ingest epoch into
  * `tag`. A stale stamp triggers a REBUILD (suffix ranks are global —
  * one appended document can shift every rank, so there is no sound
  * row-level increment; the rebuild IS the increment). A matching
  * catalog stamp is trusted only after the table's storage location
  * is verified to EXIST — a persistent metastore can outlive the data
  * files (the q114/q171 rule: paths from a previous session are never
  * trusted blindly).
  *
  * Measured suite-level effect (sf0.1, local[32]): q245 + q246 + q260
  * paid three full prefix-doubling builds per bench run (7.5 + 9.3 +
  * 9.3 s, ~26 s combined, ~10% of the round-11 bench); with the index
  * shared, q245/q246 pay one build between them and q260 builds its
  * own (different corpus slice) — the second consumer drops to its
  * read cost (q246 9.3 -> ~2 s class).
  */
object SuffixIndex {

  private def tableName(tag: String) = s"graft_sufidx_$tag"

  /** Per-tag build guards (lock striping): two sessions building the
    * SAME tag serialize (the second re-checks the stamp under the lock
    * and finds the first one's fresh build), while unrelated tags —
    * unrelated corpus slices — build fully concurrently. The map only
    * ever holds one monitor object per distinct tag string seen this
    * JVM (bounded by the tag universe, not by call volume). */
  /** Cheap corpus fingerprint (see object doc for what it can and
    * cannot catch) via the shared [[StampedCatalog]] scaffold —
    * version-prefixed so a format change can never alias an old
    * stamp. Reads only (id, length(text)), column-pruned. */
  private def stamp(docs: DataFrame, idCol: String, textCol: String): String =
    "v2:" + StampedCatalog.corpusFingerprint(docs, idCol, textCol)

  private def fs(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    StampedCatalog.fs(spark, path)

  private def readSidecar(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Option[String] = {
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  private def writeSidecar(spark: SparkSession,
      p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs(spark, p).create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The persisted (idCol, pos, suffix_rank) table for `docs`,
    * building (or rebuilding, when the stamp says the corpus moved)
    * only when needed. `tag` names the corpus slice — distinct slices
    * (e.g. q245/q246's doc_id%25 audit slice vs q260's training
    * slice) are distinct indexes; callers sharing a tag MUST pass the
    * same docs frame, and callers whose corpus can change without
    * moving the stamp (same-length in-place edits) MUST bump the tag
    * per ingest epoch. `root` = durable external storage (shared
    * filesystem URI); None = warehouse-managed (see object doc for
    * what each survives). */
  def ranks(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String,
      root: Option[String] = None): DataFrame = {
    require(tag.matches("[A-Za-z0-9_]+"), s"tag must be alphanumeric: $tag")
    StampedCatalog.lockFor(tableName(tag)).synchronized {
      ranksLocked(spark, tag, docs, idCol, textCol, root)
    }
  }

  private def snipsTableName(tag: String, cap: Int) =
    s"graft_sufsnip_${tag}_c$cap"

  /** The persisted rank-deduplicated cap-char SNIPPET table over the
    * `tag` suffix index: one `__snip` string per distinct suffix rank
    * (min over rank ties — deterministic), exactly the probe-side
    * frame [[LongestMatch]] scans every search round. Derived purely
    * from ([[ranks]], the corpus text, `cap`), so it shares the ranks
    * table's amortization: built once per corpus generation, read
    * thereafter (r16 — the inline derivation cost q266 a ranks-join +
    * rank groupBy per RUN, ~0.8 s warm at sf0.1, for a table that is
    * a per-generation constant). Stamp discipline is [[ranks]]'s,
    * with `cap` folded into both the table name and the stamp so a
    * cap change can never alias an old snapshot. Warehouse-managed
    * only (the q266 consumer's mode); externally-rooted deployments
    * keep the inline [[LongestMatch.longestMatchFromRanks]] path.
    *
    * Freshness fast path: when the snippet stamp matches, [[ranks]]
    * is not consulted at all — one corpus fingerprint per read, same
    * as every other standing table. A stale snippet table re-ensures
    * the ranks table first (its own stamp check), then rebuilds. */
  def snippets(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String, cap: Int): DataFrame = {
    require(tag.matches("[A-Za-z0-9_]+"), s"tag must be alphanumeric: $tag")
    require(cap >= 1)
    val name = snipsTableName(tag, cap)
    StampedCatalog.lockFor(name).synchronized {
      val want = s"v1:c$cap:" + StampedCatalog.corpusFingerprint(
        docs, idCol, textCol)
      if (!StampedCatalog.fresh(spark, name, want)) {
        val r = ranks(spark, tag, docs, idCol, textCol)
        val base = docs.select(col(idCol).cast(LongType).as("__id"),
          col(textCol).as("__t"))
        StampedCatalog.rebuildManaged(spark, name, want)(n =>
          r.join(base, col(idCol) === col("__id"))
            .select(col("suffix_rank").as("__r"),
              expr(s"substring(__t, CAST(pos AS INT), $cap)").as("__snip"))
            .groupBy(col("__r"))
            .agg(min(col("__snip")).as("__snip"))
            .select(col("__snip"))
            .write.mode("overwrite").saveAsTable(n))
      }
      spark.table(name)
    }
  }

  /** Build-or-reuse body; caller holds the per-tag stripe lock. */
  private def ranksLocked(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String, root: Option[String]): DataFrame = {
    val name = tableName(tag)
    val want = stamp(docs, idCol, textCol)
    // trust the catalog only if the stamp matches AND the data
    // location still exists (a persistent metastore can outlive the
    // files it points at)
    val catalogFresh = StampedCatalog.fresh(spark, name, want)
    if (!catalogFresh) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      root match {
        case Some(r) =>
          val dir = s"${r.stripSuffix("/")}/$tag"
          val dataPath = new org.apache.hadoop.fs.Path(s"$dir/idx")
          val sidecar = new org.apache.hadoop.fs.Path(s"$dir/_graft_stamp")
          val reusable = readSidecar(spark, sidecar).contains(want) &&
            fs(spark, dataPath).exists(dataPath)
          if (!reusable) {
            // rebuild: data first, stamp LAST — a crash between the
            // two leaves a missing/stale sidecar, which the next
            // reader treats as a rebuild, never as valid data
            fs(spark, sidecar).delete(sidecar, false)
            SuffixArray.suffixRanks(docs, idCol, textCol)
              .write.mode("overwrite").parquet(dataPath.toString)
            writeSidecar(spark, sidecar, want)
          }
          // (re-)register the external table over the (possibly
          // pre-existing) files — the restart path pays only this
          spark.sql(s"DROP TABLE IF EXISTS $name")
          spark.catalog.createTable(name, dataPath.toString, "parquet")
          spark.sql(
            s"ALTER TABLE $name SET TBLPROPERTIES('graft.stamp' = '$want')")
        case None =>
          // warehouse-managed (the buildIvfIndex convention): no
          // explicit path — the warehouse is the deployment's shared
          // store, never a driver-local temp dir; orphan cleanup +
          // stamping via the shared scaffold
          StampedCatalog.rebuildManaged(spark, name, want)(n =>
            SuffixArray.suffixRanks(docs, idCol, textCol)
              .write.mode("overwrite").saveAsTable(n))
      }
    }
    spark.table(name)
  }
}
