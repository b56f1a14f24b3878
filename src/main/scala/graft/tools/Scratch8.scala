package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (round 7): storage-partitioned join experiments —
  * can the Alpaca scan's KeyGroupedPartitioning(symbol) carry a join
  * with (a) another Alpaca scan and (b) a parquet side shuffled into
  * the scan's key-grouped distribution, with zero exchanges above the
  * Alpaca scan? */
object Scratch8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.AlpacaQueries.{baseOptions => _, _}
    val base = Map(
      "endpoint" -> graft.stub.AlpacaStubServer.endpoint,
      "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
      "symbols" -> "['AAPL','MSFT']",
      "start" -> "2021-01-04T00:00:00Z", "end" -> "2021-01-06T00:00:00Z",
      "cluster_by_symbol" -> "true")
    try {
      val bars = spark.read.format("Alpaca_Stocks_Bars")
        .options(base ++ Map("timeframe" -> "1Hour")).load()
      val trades = spark.read.format("Alpaca_Stocks_Trades")
        .options(base).load()

      // (a) scan ⋈ scan: per-symbol aggregates joined on symbol
      val a = bars.groupBy("symbol").agg(sum("volume").as("bar_volume"))
        .join(trades.groupBy("symbol").agg(sum("size").as("trade_size")), "symbol")
      println("== (a) scan ⋈ scan on symbol")
      println(a.queryExecution.executedPlan.toString)

      // (b) scan ⋈ parquet dimension, broadcast disabled: does the
      // parquet side shuffle into the scan's key-grouped distribution?
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select(col("n_name").as("symbol"), col("n_nationkey"))
      val b = bars.groupBy("symbol").agg(sum("volume").as("bar_volume"))
        .join(dim, "symbol")
      println("== (b) scan ⋈ parquet on symbol (no broadcast)")
      println(b.queryExecution.executedPlan.toString)
    } finally {
      spark.stop()
      graft.stub.AlpacaStubServer.stop()
    }
  }
}
