package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from the per-module `Seq[Q]` registries;
  * every entry that is ANSI-SQL-expressible also publishes its DuckDB
  * oracle. Column names/aliases are identical on both sides (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  private def catalog: Seq[Q] =
    operators.Relational.all ++ operators.Temporal.all ++
    operators.Scalars.all ++ operators.RulesQ.all ++ operators.LakeQ.all ++
    operators.FinTrackQ.all ++
    ext.TextStats.all ++ ext.Dedup.all ++ ext.Similarity.all ++
    ext.Retrieval.all ++ ext.Graph.all ++ ext.DataQuality.all ++
    ext.EntityResolution.all ++
    parse.ParsePipeline.all ++ ext.Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q08BudgetVsActual.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
