package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Registry assembly: every operator of SURVEY.md §2 (plus the
  * training-data north-star ops) is implemented as a named query over the
  * testdata tables, with a bit-equivalent DuckDB oracle wherever the
  * semantics are SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ AdvancedQueries.all ++ CorpusQueries.all ++
      PipelineQueries.all ++ CurationQueries.all ++ MiningQueries.all ++
      ProfilingQueries.all ++ StarQueries.all ++ WarehouseQueries.all ++
      StatsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap

  /** (name, doc, has-oracle) for every registered query — the catalog
    * QUERIES.md is generated from (graft.Catalog). */
  def catalog: Seq[(String, String, Boolean)] =
    registry.map(q => (q.name, q.doc, q.oracle.nonEmpty)).sortBy(_._1)
}
