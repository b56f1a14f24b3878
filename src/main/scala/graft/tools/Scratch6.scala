package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway round-6 plan probe (deleted before close-out). */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = graft.SparkEntry.queries("graph_triangles")(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println("REUSED_EXCHANGE=" + "ReusedExchange".r.findAllIn(p).size)
      println("EXCHANGE_HASH=" + "Exchange hashpartitioning".r.findAllIn(p).size)
      println("SCANS=" + "Scan parquet".r.findAllIn(p).size)
    } finally {
      spark.stop()
      graft.stub.AlpacaStubServer.stop()
    }
  }
}
