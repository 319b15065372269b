package graft.edinet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Model._

/** S1 + P1-P6: company-master scan and filter chain (reference
  * src/extract.py:23-69).
  *
  * The narrow `select` is declared explicitly even though Catalyst would
  * prune columns anyway — with a headered CSV the reader still has to
  * materialize each line, but an explicit projection keeps the plan's
  * ReadSchema minimal and documents intent (SURVEY §4).
  */
object CompanyMaster {

  /** Read the EDINET code-list CSV (cp932, one header row, explicit
    * schema — no inference pass). */
  def read(spark: SparkSession, path: String): DataFrame = {
    // Spark 4 validates CSV charsets against a short allowlist; cp932
    // needs the documented legacy escape (SPARK-43389). Runtime conf,
    // must be set before the physical CSVOptions are built.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", "true")
      .option("encoding", "windows-31j") // cp932 (reference src/extract.py:34)
      .schema(companyMasterSchema)
      .csv(path)
  }

  /** P1-P4 (+ optional P5): keep listed, consolidated companies with an
    * alphabetic name; project to the 6 downstream columns. The industry
    * exclusion is the reference's commented-out filter
    * (src/extract.py:53-60), kept behind a flag. */
  def filterChain(df: DataFrame, excludeIndustries: Seq[String] = Nil): DataFrame = {
    val base = df
      .select(MasterCols.EdinetCode, MasterCols.Listed, MasterCols.Consolidated,
        MasterCols.ClosingDate, MasterCols.NameEn, MasterCols.Industry)
      .filter(col(MasterCols.Listed) === lit("Listed company"))
      .filter(col(MasterCols.Consolidated) === lit("Consolidated"))
      .na.drop(Seq(MasterCols.NameEn))
    if (excludeIndustries.isEmpty) base
    else base.filter(!col(MasterCols.Industry).isin(excludeIndustries: _*))
  }

  /** J1 pre-step (SURVEY §7.4.6): dedupe to one row per EDINET code so
    * the enrichment inner join reproduces pandas' `.iloc[0]` first-match.
    *
    * "First row" order comes from `monotonically_increasing_id`, which
    * equals file order only for a single-split read — true for the real
    * master (one CSV well under a split boundary). For multi-file /
    * multi-split inputs Spark's file packing reorders partitions, so a
    * stable lexicographic tiebreak backs it up: the pick stays
    * deterministic even where "first" is not physically defined. */
  def dedupeByCode(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(MasterCols.EdinetCode))
      .orderBy(monotonically_increasing_id(),
        col(MasterCols.NameEn).asc, col(MasterCols.Industry).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def load(spark: SparkSession, path: String,
      excludeIndustries: Seq[String] = Nil): DataFrame =
    dedupeByCode(filterChain(read(spark, path), excludeIndustries))
}
