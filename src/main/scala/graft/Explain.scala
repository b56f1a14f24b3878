package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints formatted physical plans for selected queries
  * (all of them when no names are given) so the plan shape — pushed
  * filters, pruned ReadSchema, broadcast vs shuffle joins, exchange
  * reuse, WholeStageCodegen spans — can be audited.
  * Usage: sbt "runMain graft.Explain [sfDir] [query ...]" */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Exception => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
    graft.stub.AlpacaStubServer.stop()
  }
}
