package graft

/** Print one gate's executed plan — the `.explain`-and-iterate loop as
  * a runMain: `runMain graft.PlanPeek <gate> [sfDir]`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("q1_agg")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.SessionTuning.nanosAsLong(spark)
    val p = SparkEntry.queries(gate)(spark, dir)
      .queryExecution.executedPlan.toString
    println("=====PLAN=====")
    println(p)
  }
}
