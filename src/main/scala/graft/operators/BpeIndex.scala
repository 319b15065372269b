package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable

/** The STANDING BPE merge table — [[Bpe.trainMerges]]' output as a
  * stamp-guarded warehouse catalog table, the [[DsirIndex]] freshness
  * discipline verbatim: a tokenizer is trained once per corpus
  * generation and every consumer after that (q285's merge listing,
  * q286's token pricing, q287's packing manifest, the
  * [[graft.streaming.TokenBudgetStream]] monitor) reads the SAME
  * frozen generation instead of retraining inline — the q280 lesson
  * (a model is a per-generation constant, not per-query work).
  *
  * Freshness: a corpus content fingerprint (row count, total text
  * chars, XOR of pmd5(id#textlen)) PLUS the merge-round count is
  * stamped into TBLPROPERTIES at build time and re-checked per read
  * with one two-column aggregation; a moved corpus or a different
  * rounds setting rebuilds (merge learning is corpus-global — the
  * rebuild IS the increment, the SuffixIndex rule). A matching stamp
  * is trusted only after the table's storage location is verified to
  * exist (the q114/q171 never-trust-leftovers rule). Same-length
  * in-place-edit blind spot inherited and documented at SuffixIndex.
  *
  * SCALE SHAPE: the build cost is [[Bpe.trainMerges]]' (one corpus
  * pass + vocab-bounded rounds), paid once per generation; every read
  * after that is a rounds-row table scan — driver-bounded metadata. */
object BpeIndex {

  private[graft] def tableName(tag: String): String = s"graft_bpemerges_$tag"

  // one build at a time per tag (the SuffixIndex stripe-lock rule)
  private val tagLocks = new ConcurrentHashMap[String, Object]()
  private def lockFor(tag: String): Object =
    tagLocks.computeIfAbsent(tag, _ => new Object)

  private def stamp(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): String = {
    val row = docs.select(
      length(col(textCol)).cast(LongType).as("__len"),
      Portable.pmd5(concat_ws("#", col(idCol).cast("string"),
        length(col(textCol)).cast("string"))).as("__h"))
      .agg(count(lit(1)),
        coalesce(sum(col("__len")), lit(0L)),
        coalesce(expr("bit_xor(__h)"), lit(0L))).head()
    s"v1:$rounds:${row.getLong(0)}:${row.getLong(1)}:${row.getLong(2)}"
  }

  private def fs(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableLocation(spark: SparkSession, name: String): Option[String] =
    if (!spark.catalog.tableExists(name)) None
    else spark.sql(s"DESCRIBE TABLE EXTENDED $name").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))

  private def catalogStamp(spark: SparkSession, name: String): Option[String] =
    if (!spark.catalog.tableExists(name)) None
    else spark.sql(s"SHOW TBLPROPERTIES $name").collect()
      .find(_.getString(0) == "graft.stamp").map(_.getString(1))

  // test hook: how many builds this JVM ran (the reuse spec pins 1)
  private val builds = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def buildCount: Long = builds.get()

  /** The standing (round, a, b, cnt) merge table for `docs`, building
    * (or rebuilding, when the stamp says the corpus or the rounds
    * setting moved) only when needed. Warehouse-managed. */
  def table(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String,
      rounds: Int = Bpe.Rounds): DataFrame = {
    require(tag.matches("[A-Za-z0-9_]+"), s"tag must be alphanumeric: $tag")
    lockFor(tag).synchronized {
      val name = tableName(tag)
      val want = stamp(docs, idCol, textCol, rounds)
      val fresh = catalogStamp(spark, name).contains(want) &&
        tableLocation(spark, name).exists(loc =>
          fs(spark, new org.apache.hadoop.fs.Path(loc))
            .exists(new org.apache.hadoop.fs.Path(loc)))
      if (!fresh) {
        builds.incrementAndGet()
        spark.sql(s"DROP TABLE IF EXISTS $name")
        // an orphaned managed dir (previous JVM's leftover this
        // catalog never heard of) blocks saveAsTable — the q114/q171
        // never-trusted-leftover, removed before the fresh build
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(
            org.apache.spark.sql.catalyst.TableIdentifier(name)))
        val f = fs(spark, loc)
        if (f.exists(loc)) f.delete(loc, true)
        import spark.implicits._
        Bpe.trainMerges(docs, textCol, rounds)
          .map { case (r, a, b, c) => (r.toLong, a, b, c) }
          .toDF("round", "a", "b", "cnt")
          .write.mode("overwrite").saveAsTable(name)
        spark.sql(
          s"ALTER TABLE $name SET TBLPROPERTIES('graft.stamp' = '$want')")
      }
      spark.table(name)
    }
  }

  /** The frozen merge list in learn order — driver-bounded (rounds
    * rows). */
  def mergeList(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String,
      rounds: Int = Bpe.Rounds): Seq[(String, String)] =
    table(spark, tag, docs, idCol, textCol, rounds)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
}
