package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of one streaming drain (r12 isolate support):
  * runs the watermarked-dedup drain exactly as the gate does, but
  * splits wall time into start / processAllAvailable / stop and dumps
  * each micro-batch's own `durationMs` breakdown from the query
  * progress feed (triggerExecution, addBatch, walCommit,
  * commitOffsets, getBatch, queryPlanning, latestOffset) plus the
  * state-store commit time. The point: the family-wide raw slowdown
  * appears in SOME of these buckets and not others, which names the
  * mechanism (scheduler dispatch → addBatch; checkpoint fsync →
  * walCommit/commitOffsets; planning → queryPlanning).
  *
  * Usage: runMain graft.tools.StreamPhase [reps=3] [ckptBase]
  */
object StreamPhase {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val ckptBase = if (args.length > 1) args(1)
      else System.getProperty("java.io.tmpdir")
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.SessionTuning.nanosAsLong(spark)
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", d)

    (1 to reps).foreach { rep =>
      val ckpt = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(ckptBase), "graft_phase_")
        .toString
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val deduped = graft.operators.Streaming
        .dedupWatermarkStream(spark, dir, "events.parquet")
      val t0 = System.nanoTime()
      val q = deduped.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val t2 = System.nanoTime()
      val progress = q.recentProgress.toSeq
      q.stop()
      val t3 = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      println(s"PHASE rep=$rep start=${fmt((t1 - t0) / 1e9)} " +
        s"drain=${fmt((t2 - t1) / 1e9)} stop=${fmt((t3 - t2) / 1e9)} " +
        s"batches=${progress.length}")
      progress.foreach { p =>
        val d = p.durationMs
        val keys = Seq("triggerExecution", "addBatch", "walCommit",
          "commitOffsets", "getBatch", "queryPlanning", "latestOffset")
        val parts = keys.map(k => s"$k=${Option(d.get(k)).getOrElse(0L)}")
        val state = p.stateOperators.headOption
          .map(s => s"commitMs=${s.allUpdatesTimeMs + s.commitTimeMs} " +
            s"rowsUpdated=${s.numRowsUpdated}")
          .getOrElse("")
        println(s"  BATCH ${p.batchId} rows=${p.numInputRows} " +
          parts.mkString(" ") + " " + state)
      }
    }
    spark.stop()
  }
}
