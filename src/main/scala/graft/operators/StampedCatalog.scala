package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable

/** The stamp-guarded-catalog-table scaffold, stated ONCE — shared by
  * every standing index that trains per corpus generation and reuses
  * until the corpus moves ([[SuffixIndex]], [[DsirIndex]],
  * [[BpeIndex]]): the content fingerprint, the per-table build lock,
  * the trust-the-catalog-only-if-the-files-exist freshness check, and
  * the orphan-cleaned warehouse rebuild. Before this object each
  * index carried its own ~50-line copy; a fix to any one of them (the
  * never-trust-leftovers cleanup, the location-exists check) had to
  * be hand-propagated or the copies drifted.
  *
  * Fingerprint semantics, coverage and the same-length in-place-edit
  * blind spot are documented at [[SuffixIndex]] (the scheme's origin);
  * each index PREFIXES the fingerprint with its own version string
  * and any build parameters that define a model generation (e.g.
  * BpeIndex's merge-round count), so a parameter change can never
  * alias an old stamp. */
private[operators] object StampedCatalog {

  /** Cheap corpus content fingerprint: row count, total text chars,
    * XOR of pmd5(id#textlen) — reads only (id, length(text)),
    * column-pruned, never the text bytes. Callers prefix version +
    * parameters.
    *
    * MEMOIZED per (canonical plan, file signature) — r17, VERDICT r16
    * #7: a dozen standing-table queries each paid one ~0.3 s
    * fingerprint job PER READ; at 100 TB that job is a full
    * (id, len) corpus pass per query. The memo key is the frame's
    * canonicalized logical plan plus the (path, length, mtime) of
    * EVERY file the plan reads, so the staleness contract is:
    *  - any append, delete, compaction or rewrite of the corpus
    *    changes the file signature and forces a fresh scan — the
    *    index is NOT blind to mid-session corpus changes;
    *  - the blind spot is an in-place rewrite preserving path, byte
    *    length AND modification time at the filesystem's timestamp
    *    granularity — strictly narrower than the fingerprint's own
    *    documented blind spot (a same-length edit preserving the
    *    id#len XOR);
    *  - frames with any non-file, non-local leaf (views, RDD scans)
    *    are never memoized — they scan every read, as before;
    *  - [[invalidateFingerprints]] is the explicit hook (drop it
    *    after out-of-band mutation the signature cannot see).
    * StampedCatalogSpec pins all four. */
  def corpusFingerprint(docs: DataFrame, idCol: String,
      textCol: String): String =
    memoKey(docs, idCol, textCol) match {
      case Some(k) =>
        fpMemo.computeIfAbsent(k, _ => scanFingerprint(docs, idCol, textCol))
      case None => scanFingerprint(docs, idCol, textCol)
    }

  private val fpMemo = new ConcurrentHashMap[String, String]()

  /** Drop every memoized fingerprint (the explicit invalidation hook
    * for mutations the file signature cannot observe). */
  def invalidateFingerprints(): Unit = fpMemo.clear()

  // test hook: how many fingerprint SCANS actually ran this JVM
  private val fpScansRun = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def fingerprintScanCount: Long = fpScansRun.get()

  private def scanFingerprint(docs: DataFrame, idCol: String,
      textCol: String): String = {
    fpScansRun.incrementAndGet()
    val row = docs.select(
      length(col(textCol)).cast(LongType).as("__len"),
      Portable.pmd5(concat_ws("#", col(idCol).cast("string"),
        length(col(textCol)).cast("string"))).as("__h"))
      .agg(count(lit(1)),
        coalesce(sum(col("__len")), lit(0L)),
        coalesce(expr("bit_xor(__h)"), lit(0L))).head()
    s"${row.getLong(0)}:${row.getLong(1)}:${row.getLong(2)}"
  }

  /** Memo key, or None when the frame must scan every read: the
    * canonicalized plan (expression-id-normalized; semanticHash
    * folded in so a truncated tree string cannot alias two plans)
    * plus the sorted (path, length, mtime) of every file under every
    * file-sourced leaf. Driver-side metadata only — no job. */
  private def memoKey(docs: DataFrame, idCol: String,
      textCol: String): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = docs.queryExecution.analyzed
    val leafSigs = plan.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case hfs: HadoopFsRelation =>
          val files = hfs.location.listFiles(Nil, Nil).flatMap(_.files)
          Some(files
            .map(f => s"${f.getPath}#${f.getLen}#${f.getModificationTime}")
            .sorted.mkString(";"))
        case _ => None
      }
      // a LocalRelation's rows participate in the canonicalized
      // plan's hash/string below — no file signature to add
      case _: LocalRelation => Some("local")
      case _ => None
    }
    if (leafSigs.exists(_.isEmpty)) None
    else {
      val canon = plan.canonicalized
      Some(s"$idCol|$textCol|${plan.semanticHash()}|${canon.treeString}|" +
        leafSigs.flatten.mkString("|"))
    }
  }

  // one build at a time per table (the SuffixIndex stripe-lock rule);
  // keyed by the full table name, so distinct indexes never contend
  private val locks = new ConcurrentHashMap[String, Object]()
  def lockFor(name: String): Object =
    locks.computeIfAbsent(name, _ => new Object)

  def fs(spark: SparkSession, path: Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The catalog table's storage location, if the table exists. */
  def tableLocation(spark: SparkSession, name: String): Option[String] =
    if (!spark.catalog.tableExists(name)) None
    else spark.sql(s"DESCRIBE TABLE EXTENDED $name").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))

  def catalogStamp(spark: SparkSession, name: String): Option[String] =
    if (!spark.catalog.tableExists(name)) None
    else spark.sql(s"SHOW TBLPROPERTIES $name").collect()
      .find(_.getString(0) == "graft.stamp").map(_.getString(1))

  /** Trust the catalog only if the stamp matches AND the data
    * location still exists (a persistent metastore can outlive the
    * files it points at). */
  def fresh(spark: SparkSession, name: String, want: String): Boolean =
    catalogStamp(spark, name).contains(want) &&
      tableLocation(spark, name).exists(loc =>
        fs(spark, new Path(loc)).exists(new Path(loc)))

  /** Drop + orphan-clean + rebuild a WAREHOUSE-MANAGED table, then
    * stamp it. `build` must write the table under `name` (e.g. a
    * saveAsTable). An ORPHANED managed dir (a previous JVM wrote it;
    * this catalog never heard of it) blocks saveAsTable and is
    * exactly the q114/q171 never-trusted leftover — removed before
    * the fresh build. Caller holds [[lockFor]](name). */
  def rebuildManaged(spark: SparkSession, name: String, want: String)(
      build: String => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(name)))
    val f = fs(spark, loc)
    if (f.exists(loc)) f.delete(loc, true)
    build(name)
    spark.sql(
      s"ALTER TABLE $name SET TBLPROPERTIES('graft.stamp' = '$want')")
  }
}
