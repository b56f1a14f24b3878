package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sink gate (SURVEY §2.1 S8): the reference delegates writes to Spark
 * and so do we — but delegation should still be MEASURED, so the
 * write path is a benchmarked, correctness-gated component rather
 * than only a spec. The gate writes lineitem partitioned by
 * `l_returnflag` (hive-style layout), reads it back through a
 * partition-pruned filter, and aggregates; the oracle runs the same
 * aggregation on the ORIGINAL table, so any write/read corruption,
 * schema drift, or partition misrouting breaks the hash.
 *
 * Scale notes: partitionBy on a low-cardinality column is the
 * standard lake layout — each task writes one file per local key;
 * the read-back filter prunes to one directory (PartitionFilters in
 * the plan, zero data read outside it). DECIMAL money sums keep the
 * aggregate order-independent.
 */
object Sinks {
  import Tables.t

  private def outDir(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_sink_roundtrip_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")

  def sinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = outDir(dir)
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_linestatus"), col("l_returnflag"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    spark.read.parquet(out)
      .filter(col("l_returnflag") === "A")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("l_linestatus"))
  }

  val sinkRoundtripSql: String =
    """SELECT l_linestatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem WHERE l_returnflag = 'A'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "sink_partitioned_roundtrip" -> ((sinkRoundtrip _, sinkRoundtripSql)))
}
