package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSON-Lines corpus source/sink — the interchange format large text
  * corpora actually ship in (one JSON object per line, optionally
  * gzip-compressed per file; the C4/Pile layout). The engine's native
  * store is parquet; this is the ingest/egress edge for corpora that
  * arrive as `*.jsonl[.gz]` dumps.
  *
  * Scale design: JSONL is line-splittable, so an UNcompressed dump
  * parallelizes by byte range like any text file; gzip files are
  * whole-file splits — one task per file — which is why the writer
  * here defaults to many files (one per input partition) rather than
  * one big archive: a 100 TB gzip'd corpus with 1 GB files gives
  * 100k parallel tasks, while a single archive would serialize the
  * scan. The EXPLICIT schema is mandatory on read: schema inference
  * would scan the corpus twice and silently widen types on dirty
  * rows; with a declared schema, Spark's PERMISSIVE mode nulls
  * malformed fields instead (count them via the corrupt-record
  * column if auditing).
  */
object JsonlCorpus {

  /** The documents-table schema as it ships in JSONL dumps. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  /** Read a JSONL document dump (plain or .gz — Spark dispatches on
    * extension per file). Column order is normalized to the schema's. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(documentSchema).json(dir)
      .select(documentSchema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)

  /** Write a corpus frame as JSONL, optionally gzip'd per file. One
    * output file per partition of `df` — the parallel-scan-friendly
    * layout (see the class doc). */
  def write(df: DataFrame, dir: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(dir)
  }
}
