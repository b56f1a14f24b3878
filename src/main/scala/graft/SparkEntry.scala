package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  private[graft] def registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] =
    operators.Relational.all ++ operators.AlpacaQueries.all ++
      operators.AlpacaAnalytics.all ++ operators.Microstructure.all ++
      operators.Dedup.all ++ operators.Similarity.all ++
      operators.TextOps.all ++ operators.Multimodal.all ++ operators.Streaming.all ++
      operators.AsofJoin.all ++ operators.Events.all ++ operators.Relational2.all ++
      operators.Relational3.all ++ operators.Relational4.all ++
      operators.Warehouse.all ++
      operators.Pipeline.all ++
      operators.Sinks.all ++ operators.Graph.all ++ operators.News.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, (fn, _)) => n -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, (_, sql)) if sql.nonEmpty => n -> sql }.toMap
}
