package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev profiling harness (r14): runs one gate N times with per-stage
  * wall/task accounting so a slow gate can be localized to a stage
  * instead of re-guessing from the plan. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Prof <gate> [sfDir] [runs]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("dedup_incremental_minhash_prod")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.SessionTuning.nanosAsLong(spark)

    case class St(var name: String = "", var submitted: Long = 0,
      var completed: Long = 0, var tasks: Int = 0, var taskTimeMs: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val st = stages.computeIfAbsent(i.stageId, _ => St())
        st.name = i.name
        st.submitted = i.submissionTime.getOrElse(0L)
        st.completed = i.completionTime.getOrElse(0L)
        st.tasks = i.numTasks
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val st = stages.computeIfAbsent(te.stageId, _ => St())
        if (te.taskInfo != null) st.taskTimeMs += te.taskInfo.duration
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.put(js.jobId, (js.time, 0L,
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) jobs.put(je.jobId, (j._1, je.time, j._3))
      }
    })

    (1 to runs).foreach { r =>
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(gate)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"\n===== run $r: $gate wall=$wall%.2f s =====")
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"jobs=${js.size} jobWallSum=${js.map(j => j._2._2 - j._2._1).sum / 1e3}%.2f s")
      js.foreach { case (id, (s, e, d)) =>
        println(f"  job $id%3d ${(e - s) / 1e3}%7.2f s  $d")
      }
      val ss = stages.asScala.toSeq.sortBy(-_._2.taskTimeMs).take(15)
      println("top stages by task time:")
      ss.foreach { case (id, st) =>
        println(f"  stage $id%4d wall=${(st.completed - st.submitted) / 1e3}%7.2f s taskSum=${st.taskTimeMs / 1e3}%7.2f s tasks=${st.tasks}%4d ${st.name.take(90)}")
      }
    }
    spark.stop()
    graft.stub.AlpacaStubServer.stop()
  }
}
