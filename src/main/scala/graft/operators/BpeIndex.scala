package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  // test hook: how many builds this JVM ran (the reuse spec pins 1)
  private val builds = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def buildCount: Long = builds.get()

  private def stamp(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): String =
    s"v1:$rounds:" +
      StampedCatalog.corpusFingerprint(docs, idCol, textCol)

  /** The standing (round, a, b, cnt) merge table for `docs`, building
    * (or rebuilding, when the stamp says the corpus or the rounds
    * setting moved) only when needed. Warehouse-managed. */
  def table(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String,
      rounds: Int = Bpe.Rounds): DataFrame = {
    require(tag.matches("[A-Za-z0-9_]+"), s"tag must be alphanumeric: $tag")
    val name = tableName(tag)
    StampedCatalog.lockFor(name).synchronized {
      val want = stamp(docs, idCol, textCol, rounds)
      if (!StampedCatalog.fresh(spark, name, want)) {
        builds.incrementAndGet()
        StampedCatalog.rebuildManaged(spark, name, want)(n =>
          Bpe.saveMerges(spark, Bpe.trainMerges(docs, textCol, rounds), n))
      }
      spark.table(name)
    }
  }

  /** The frozen merge list in learn order — driver-bounded (rounds
    * rows). */
  def mergeList(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String,
      rounds: Int = Bpe.Rounds): Seq[(String, String)] = {
    table(spark, tag, docs, idCol, textCol, rounds)
    Bpe.loadMerges(spark, tableName(tag))
  }
}
