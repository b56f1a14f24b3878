package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics beyond the complete-mode gate query:
  * append mode with a watermark — late data beyond the watermark is
  * dropped, closed windows emit exactly once. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("stream_event_bars drains the events file stream") {
    val df = operators.Streaming.streamEventBars(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // total event count across windows equals the table's row count
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == 1000L)
  }

  test("append mode + watermark: late rows beyond the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData((ts(0), 1.0), (ts(5), 2.0))
      q.processAllAvailable() // watermark now 10:05-10m → nothing closed
      input.addData((ts(30), 3.0)) // advances watermark to 10:20
      q.processAllAvailable() // closes the 10:00 window
      val afterClose = spark.table("wm_test").collect()
      assert(afterClose.length == 1 && afterClose.head.getAs[Long]("n") == 2L)
      input.addData((ts(1), 9.9)) // late: before the 10:20 watermark
      input.addData((ts(55), 4.0)) // closes the 10:30 window
      q.processAllAvailable()
      val rows = spark.table("wm_test").collect()
      // the late 10:01 row was dropped: 10:00 window emitted once with n=2
      assert(rows.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }
}
