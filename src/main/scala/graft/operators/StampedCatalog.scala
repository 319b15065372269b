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
    * parameters. */
  def corpusFingerprint(docs: DataFrame, idCol: String,
      textCol: String): String = {
    val row = docs.select(
      length(col(textCol)).cast(LongType).as("__len"),
      Portable.pmd5(concat_ws("#", col(idCol).cast("string"),
        length(col(textCol)).cast("string"))).as("__h"))
      .agg(count(lit(1)),
        coalesce(sum(col("__len")), lit(0L)),
        coalesce(expr("bit_xor(__h)"), lit(0L))).head()
    s"${row.getLong(0)}:${row.getLong(1)}:${row.getLong(2)}"
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
