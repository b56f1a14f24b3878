package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (round 7): AQE-off plan dump for the bucketed as-of
  * family — checks that the single-scan rewrite's two consumers of the
  * shared shuffle canonicalize equal (ReusedExchange present, one scan
  * per input relation). */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "asof_join_bucketed", "asof_join_forward_bucketed",
      "alpaca_effective_spread_bucketed", "alpaca_quote_spread_twa_bucketed")
    try names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val scans = "(BatchScan|FileScan)".r.findAllIn(p).size
      val reused = "ReusedExchange".r.findAllIn(p).size
      println(s"== $n scans=$scans reused=$reused")
      if (reused == 0) println(p)
    } finally {
      spark.stop()
      graft.stub.AlpacaStubServer.stop()
    }
  }
}
