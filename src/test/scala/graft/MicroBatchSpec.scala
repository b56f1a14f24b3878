package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.stub.AlpacaStubServer

/** Micro-batch streaming through the Alpaca connector: the configured
  * range is replayed in `stream_step` slices; the union of all
  * micro-batches must equal the batch read exactly (half-open interval
  * tiling ⇒ no duplicates, no gaps). */
class MicroBatchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark

  override def afterAll(): Unit = AlpacaStubServer.stop()

  private val opts = Map(
    "endpoint" -> AlpacaStubServer.endpoint,
    "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
    "symbols" -> "['AAPL','MSFT']",
    "timeframe" -> "1Hour",
    "start" -> "2021-01-04T00:00:00Z",
    "end" -> "2021-01-06T00:00:00Z")

  test("micro-batch stream replays the range and matches the batch read") {
    val stream = spark.readStream.format("Alpaca_Stocks_Bars")
      .options(opts + ("stream_step" -> "6Hours"))
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("mb_bars").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("mb_bars").orderBy("symbol", "time").collect()
    val batch = spark.read.format("Alpaca_Stocks_Bars").options(opts)
      .load().orderBy("symbol", "time").collect()
    assert(streamed.length == 96) // 48 hourly bars × 2 symbols
    assert(streamed.toSeq == batch.toSeq)
    // 2 days / 6h step = 8 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
  }

  test("micro-batches flow columnar: ColumnarToRow over the streaming scan") {
    val stream = spark.readStream.format("Alpaca_Stocks_Bars")
      .options(opts + ("stream_step" -> "1Day"))
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("mb_columnar").outputMode("append").start()
    try {
      q.processAllAvailable()
      val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      // the vectorized reader is only engaged when the scan exec
      // reports columnar support — then a ColumnarToRow transition
      // must sit above the MicroBatchScan
      assert(exec.contains("ColumnarToRow") && exec.contains("MicroBatchScan"),
        s"expected a columnar micro-batch scan, got:\n$exec")
    } finally q.stop()
    assert(spark.table("mb_columnar").count() == 96)
  }

  test("stateful aggregation over the columnar micro-batch stream is exact") {
    // Spark must insert the row transition below the stateful agg; the
    // update-mode per-symbol count over all 8 micro-batches equals the
    // batch count (proves no batch is lost or double-counted through
    // the columnar hand-off)
    val stream = spark.readStream.format("Alpaca_Stocks_Bars")
      .options(opts + ("stream_step" -> "6Hours"))
      .load()
    val agg = stream.groupBy("symbol").count()
    val q = agg.writeStream.format("memory")
      .queryName("mb_stateful").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("mb_stateful").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("AAPL" -> 48L, "MSFT" -> 48L), s"got $got")
  }

  test("crypto micro-batch: slash symbols and v1beta3 path stream correctly") {
    val copts = Map(
      "endpoint" -> AlpacaStubServer.endpoint,
      "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
      "symbols" -> "['BTC/USD','ETH/USD']",
      "timeframe" -> "1Hour",
      "start" -> "2021-01-04T00:00:00Z",
      "end" -> "2021-01-05T00:00:00Z")
    val stream = spark.readStream.format("Alpaca_Crypto_Bars")
      .options(copts + ("stream_step" -> "8Hours"))
      .load()
    val q = stream.writeStream.format("memory")
      .queryName("mb_crypto").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("mb_crypto").orderBy("symbol", "time").collect()
    val batch = spark.read.format("Alpaca_Crypto_Bars").options(copts)
      .load().orderBy("symbol", "time").collect()
    assert(streamed.length == 48 && streamed.toSeq == batch.toSeq)
  }

  test("restart from checkpoint resumes offsets: no duplicates, no gaps") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mb_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_mb_sink").toString
    def run(endExclusive: String): Unit = {
      val stream = spark.readStream.format("Alpaca_Stocks_Bars")
        .options(opts + ("stream_step" -> "6Hours", "end" -> endExclusive))
        .load()
      val q = stream.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // first run covers day 1; the restarted query extends the range —
    // committed offsets must carry over so day 1 is NOT re-fetched
    run("2021-01-05T00:00:00Z")
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst == 48L, s"day 1: expected 48 bars, got $afterFirst")
    run("2021-01-06T00:00:00Z")
    val rows = spark.read.parquet(sink)
    assert(rows.count() == 96L, s"after restart: expected 96, got ${rows.count()}")
    // exactly-once across the restart: every (symbol, time) key unique
    assert(rows.select("symbol", "time").distinct().count() == 96L)
  }

  // ------------------------------------------------------------ LIVE mode
  private val baseUs =
    java.time.Instant.parse("2021-01-04T00:00:00Z").getEpochSecond * 1000000L

  private def clockAtHours(h: Long): Unit =
    graft.connector.AlpacaWallClock.nowMicros =
      () => baseUs + h * 3600L * 1000000L

  test("live mode (no end): the stream follows the injected wall clock") {
    try {
      clockAtHours(6)
      val stream = spark.readStream.format("Alpaca_Stocks_Bars")
        .options(opts - "end" + ("stream_step" -> "2Hours"))
        .load()
      val q = stream.writeStream.format("memory")
        .queryName("mb_live").outputMode("append").start()
      try {
        q.processAllAvailable()
        // clock at +6h, 2h steps → 3 triggers so far, hourly bars ×2 symbols
        assert(spark.table("mb_live").count() == 12L)
        assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
        // clock advances mid-query: the SAME running stream catches up
        clockAtHours(12)
        q.processAllAvailable()
        assert(spark.table("mb_live").count() == 24L)
        // exactly-once across all triggers
        assert(spark.table("mb_live").select("symbol", "time")
          .distinct().count() == 24L)
        // and the realized window equals the batch read over [start, clock)
        val batch = spark.read.format("Alpaca_Stocks_Bars")
          .options(opts + ("end" -> "2021-01-04T12:00:00Z")).load()
        assert(spark.table("mb_live").orderBy("symbol", "time").collect().toSeq ==
          batch.orderBy("symbol", "time").collect().toSeq)
      } finally q.stop()
    } finally graft.connector.AlpacaWallClock.reset()
  }

  test("live mode restart: checkpoint resumes at the committed clock mark") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_live_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_live_sink").toString
    def run(hours: Long): Unit = {
      clockAtHours(hours)
      val stream = spark.readStream.format("Alpaca_Stocks_Bars")
        .options(opts - "end" + ("stream_step" -> "2Hours"))
        .load()
      val q = stream.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      run(4)
      assert(spark.read.parquet(sink).count() == 8L)
      // restart with the clock further along: resumes at +4h, no refetch
      run(8)
      val rows = spark.read.parquet(sink)
      assert(rows.count() == 16L, s"after restart: ${rows.count()}")
      assert(rows.select("symbol", "time").distinct().count() == 16L)
    } finally graft.connector.AlpacaWallClock.reset()
  }

  test("batch read without 'end' fails with a named error (live is streaming-only)") {
    val ex = intercept[Throwable] {
      spark.read.format("Alpaca_Stocks_Bars").options(opts - "end").load().count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("'end' is required for batch reads")),
      s"unexpected error chain: ${messages(ex)}")
  }

  test("timeless source rejects readStream with a named error, not a silent idle") {
    val ex = intercept[Throwable] {
      spark.readStream.format("Alpaca_Stocks_Snapshots")
        .options(Map(
          "endpoint" -> graft.stub.AlpacaStubServer.endpoint,
          "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
          "symbols" -> "['AAPL']")).load()
        .writeStream.format("memory").queryName("snap_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .awaitTermination(30000)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("point-in-time source with no time axis")),
      s"unexpected error chain: ${messages(ex)}")
  }
}
