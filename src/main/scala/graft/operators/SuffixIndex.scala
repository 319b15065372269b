package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * persisted external table keyed by a caller-chosen corpus `tag`,
  * building it only when absent or STALE.
  *
  * Staleness is a content fingerprint stamped into TBLPROPERTIES at
  * build time: (row count, total text chars, id sum) — one cheap
  * columnar aggregation per read (pruned to two columns), never an
  * index rebuild. The stamp catches appends, deletions and any edit
  * that changes a document's length or id set; a same-length in-place
  * character edit defeats it, which is the documented trade (a full
  * content hash would cost a text-width scan per read — callers with
  * ingest epochs should fold the epoch into `tag` instead). A stale
  * stamp triggers a REBUILD at a fresh scratch path (suffix ranks are
  * global — one appended document can shift every rank, so there is
  * no sound row-level increment; the rebuild IS the increment, which
  * is also the q114/q171 external-table convention: managed paths
  * from a previous session must never be trusted).
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

  /** Cheap corpus fingerprint (see object doc for what it can and
    * cannot catch). */
  private def stamp(docs: DataFrame, idCol: String, textCol: String): String = {
    val r = docs.agg(
      count(lit(1)),
      coalesce(sum(length(col(textCol)).cast(LongType)), lit(0L)),
      coalesce(sum(col(idCol).cast(LongType)), lit(0L))).head()
    s"${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}"
  }

  /** The persisted (idCol, pos, suffix_rank) table for `docs`,
    * building (or rebuilding, when the stamp says the corpus moved)
    * only when needed. `tag` names the corpus slice — distinct slices
    * (e.g. q245/q246's doc_id%25 audit slice vs q260's training
    * slice) are distinct indexes; callers sharing a tag MUST pass the
    * same docs frame. */
  def ranks(spark: SparkSession, tag: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = synchronized {
    require(tag.matches("[A-Za-z0-9_]+"), s"tag must be alphanumeric: $tag")
    val name = tableName(tag)
    val want = stamp(docs, idCol, textCol)
    val fresh = spark.catalog.tableExists(name) &&
      spark.sql(s"SHOW TBLPROPERTIES $name").collect()
        .exists(r => r.getString(0) == "graft.stamp" && r.getString(1) == want)
    if (!fresh) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-sufidx-$tag").toString
      val rootPath = new org.apache.hadoop.fs.Path(root)
      rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .deleteOnExit(rootPath)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      SuffixArray.suffixRanks(docs, idCol, textCol)
        .write.option("path", s"$root/idx")
        .mode("overwrite").saveAsTable(name)
      spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES('graft.stamp' = '$want')")
    }
    spark.table(name)
  }
}
