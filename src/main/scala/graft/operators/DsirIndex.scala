package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A STANDING DSIR model: the per-bucket (raw, target) feature counts
  * persisted as a warehouse catalog table, so every mixture/scoring
  * query reads a <= `buckets`-row model table instead of re-counting
  * the corpus's hashed n-gram instances per run — the
  * [[SuffixIndex]]/[[Similarity.buildIvfIndex]] standing-artifact
  * convention applied to [[Dsir]] (VERDICT r15 item 7: q276 retrained
  * its model inline at 2 s/run; the model is a training-time constant,
  * not per-query work).
  *
  * Freshness is [[SuffixIndex]]'s stamp discipline verbatim: a content
  * fingerprint (row count, total text chars, XOR of pmd5(id#textlen))
  * stamped into TBLPROPERTIES at build time and re-checked per read
  * with one two-column aggregation — a moved corpus rebuilds (bucket
  * counts are corpus-global; the rebuild IS the increment), a matching
  * stamp is trusted only after the table's storage location is
  * verified to exist (the q114/q171 never-trust-leftovers rule). The
  * same-length in-place-edit blind spot and the tag contract are
  * inherited and documented there.
  *
  * The table holds one row per feature bucket seen in the corpus:
  * (bucket, cr, ct) with ct NULL for buckets never seen in the target
  * slice — exactly the two frames [[Dsir.scoreInstances]] consumes, so
  * scoring from the standing model and [[Dsir.scoreSelf]]'s inline
  * training are the SAME arithmetic on the same counts (q280 oracles
  * that equality against DuckDB's from-scratch restatement).
  *
  * SCALE SHAPE: the build is one feature explode + two bounded
  * aggregations, paid once per corpus generation; every read after
  * that is a <= `buckets`-row scan that broadcasts into the scoring
  * join. At 100 TB the model is trained once per ingest epoch (or
  * maintained by [[graft.streaming.DsirStream]]'s additive count log —
  * same counts, streaming ingest) while mixture queries run daily. */
object DsirIndex {

  private[graft] def tableName(tag: String): String = s"graft_dsirmdl_$tag"

  /** Corpus fingerprint — the [[SuffixIndex]] scheme via the shared
    * [[StampedCatalog]] scaffold, version-prefixed. */
  private def stamp(docs: DataFrame, idCol: String, textCol: String): String =
    "v1:" + StampedCatalog.corpusFingerprint(docs, idCol, textCol)

  // test hook: how many builds this JVM ran (the reuse spec pins 1)
  private val builds = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def buildCount: Long = builds.get()

  /** The standing (bucket, cr, ct) model table for `docs`, building
    * (or rebuilding, when the stamp says the corpus moved) only when
    * needed. `targetCol` marks target-slice membership (the DSIR
    * reference corpus). Warehouse-managed. */
  def model(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String, targetCol: Column,
      buckets: Int = Dsir.DefaultBuckets): DataFrame = {
    require(tag.matches("[A-Za-z0-9_]+"), s"tag must be alphanumeric: $tag")
    val name = tableName(tag)
    StampedCatalog.lockFor(name).synchronized {
      val want = stamp(docs, idCol, textCol)
      if (!StampedCatalog.fresh(spark, name, want)) {
        builds.incrementAndGet()
        StampedCatalog.rebuildManaged(spark, name, want) { n =>
          val feats = Dsir.featureBuckets(
            docs.select(col(idCol), targetCol.as("__tgt"), col(textCol)),
            textCol, buckets, Seq(idCol, "__tgt")).persist()
          try {
            feats.groupBy("bucket").agg(count(lit(1)).as("cr"))
              .join(feats.filter(col("__tgt")).groupBy("bucket")
                .agg(count(lit(1)).as("ct")), Seq("bucket"), "left")
              .write.mode("overwrite").saveAsTable(n)
          } finally { feats.unpersist(); () }
        }
      }
      spark.table(name)
    }
  }

  /** Score `docs` against a standing model frame — [[Dsir.scoreSelf]]'s
    * output shape from the persisted counts: one feature explode, a
    * broadcast weight join, no count aggregation over the corpus. */
  def scoreFromModel(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int = Dsir.DefaultBuckets): DataFrame =
    Dsir.scoreInstances(
      Dsir.featureBuckets(docs.select(col(idCol), col(textCol)),
        textCol, buckets, Seq(idCol)),
      idCol,
      model.select(col("bucket"), col("cr")),
      model.filter(col("ct").isNotNull).select(col("bucket"), col("ct")),
      buckets)
}
