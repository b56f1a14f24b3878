package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** REFBENCH large-grid workload (round 7): 10 symbols × 5 years of
  * MINUTE bars ≈ 26.3 M records through the volume-aware planner
  * (limit×5 = 50 k-row cap → 53 intervals/symbol = 530 partitions ×
  * ~5 pages of 10 k), then a per-(symbol, year) aggregation — the
  * same workload scripts/ref_bench.py runs against the reference
  * with REFBENCH_LARGE=1, 25× the standard bars workload. Proves the
  * engine ratio holds past the 1 M-row grid.
  *
  * Usage: start the stub in its own JVM (`runMain graft.stub.StubMain`)
  * and pass its endpoint:
  *   sbt -batch "runMain graft.tools.LargeGrid <endpoint> [runs]"
  */
object LargeGrid {
  def main(args: Array[String]): Unit = {
    val endpoint = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val symbols = Seq("AAPL", "MSFT", "GOOG", "AMZN", "TSLA",
        "NVDA", "META", "AMD", "INTC", "CRM")
      def once(): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val rows = spark.read.format("Alpaca_Stocks_Bars")
          .options(Map(
            "endpoint" -> endpoint,
            "APCA-API-KEY-ID" -> "test-key",
            "APCA-API-SECRET-KEY" -> "test-secret",
            "symbols" -> symbols.mkString("['", "','", "']"),
            "start" -> "2021-01-01T00:00:00Z",
            "end" -> "2026-01-01T00:00:00Z",
            "timeframe" -> "1Min"))
          .load()
          .groupBy(col("symbol"), date_format(col("time"), "yyyy").as("year"))
          .agg(count(lit(1)).as("n_bars"), sum(col("volume")).as("sum_volume"))
          .collect()
        val dt = (System.nanoTime() - t0) / 1e9
        (rows.length.toLong, rows.map(_.getAs[Long]("n_bars")).sum, dt)
      }
      val results = (0 until runs).map { i =>
        val (groups, records, dt) = once()
        println(f"bars_large run $i: $dt%.2fs  groups=$groups records=$records")
        dt
      }
      println(s"""{"metric":"graft_bars_large","unit":"sec",""" +
        s""""runs":[${results.map(d => f"$d%.3f").mkString(",")}],""" +
        f""""best":${results.min}%.3f}""")
    } finally {
      spark.stop()
    }
  }
}
