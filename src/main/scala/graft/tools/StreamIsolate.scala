package graft.tools

import org.apache.spark.sql.SparkSession

/** Streaming-gate bench isolate (r12, VERDICT r11 next #1): the r11
  * round recorded a ONE-DIRECTIONAL, family-wide slowdown of all 16
  * nonzero stream gates on the floor-adjusted metric (raw +15–32% on
  * the large ones) with ZERO streaming code changes, in the same
  * session whose batch gates ran 13% faster — so the cause is the
  * harness or the box, not the plans, and the `text_repetition`-style
  * isolate has to name the mechanism. Three candidates from the
  * verdict:
  *
  *   1. FLOOR ESTIMATE — Bench measures the per-job dispatch floor
  *      ONCE at startup (15× `range(1).count()` median) and subtracts
  *      floor×jobs from every stream drain; r10 measured 0.136 s,
  *      r11 0.09 s. If in-suite dispatch is slower than the startup
  *      probe, a LOWER startup floor inflates every adjusted number
  *      with no real change.
  *   2. /tmp CHECKPOINT CHURN — memory-sink drains use Spark-managed
  *      temp checkpoints; a same-day pile of hundreds of dirs could
  *      tax dir creation/listing.
  *   3. STATE-STORE WARM-UP — first stateful gate in a JVM pays
  *      HDFSBackedStateStore init that later gates don't.
  *
  * This main runs ONE gate in a fresh JVM: generic warmup (same as
  * Bench), one untimed warm run, then N timed runs of the identical
  * plan through the noop sink, RE-MEASURING the dispatch floor
  * immediately before every run (15-probe median, same procedure as
  * Bench) and counting jobs, with the streaming checkpoint location
  * PINNED to a fresh empty directory per invocation (so /tmp state
  * can be varied independently). Output: one ISOLATE line per run
  * (raw, floor-at-that-moment, jobs, adjusted) + a SUMMARY line —
  * medians the SCALE.md verdict can quote.
  *
  * Usage: runMain graft.tools.StreamIsolate <gate> [runs=10] [sfDir]
  *        [ckptBase]   — e.g. /dev/shm to A/B tmpfs vs the /tmp disk
  */
object StreamIsolate {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val runs = if (args.length > 1) args(1).toInt else 10
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val ckptBase = if (args.length > 3) args(3)
      else System.getProperty("java.io.tmpdir")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ckpt = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(ckptBase),
        s"graft_isolate_${gate}_").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation", ckpt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.SessionTuning.nanosAsLong(spark)

    // identical generic warmup to Bench (classloading + Janino paths)
    locally {
      import org.apache.spark.sql.functions._
      val warm = spark.range(1000).selectExpr("id", "id % 7 AS k", "CAST(id AS DOUBLE) AS v")
      warm.groupBy(col("k")).agg(sum(col("v"))).write.format("noop").mode("overwrite").save()
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k")).orderBy(col("id"))
      warm.select(col("id"), sum(col("v")).over(w).as("cs"))
        .write.format("noop").mode("overwrite").save()
    }

    val jobCounter = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCounter.incrementAndGet(); ()
        }
      })
    def floorNow(): Double = {
      val ts = (1 to 15).map { _ =>
        val t0 = System.nanoTime()
        spark.range(1).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val fn = graft.SparkEntry.queries(gate)

    // one untimed warm run (state-store/codegen first-use attribution)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", d)
    val rows = (1 to runs).map { i =>
      System.gc()
      val f = floorNow()
      val j0 = jobCounter.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val raw = (System.nanoTime() - t0) / 1e9
      val jobs = jobCounter.get() - j0
      val adj = math.max(0.0, raw - f * jobs)
      println(s"ISOLATE $gate run=$i raw=${fmt(raw)} floor=${fmt(f)} " +
        s"jobs=$jobs adj=${fmt(adj)}")
      (raw, f, jobs, adj)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(s"ISOLATE_SUMMARY gate=$gate runs=$runs sf=$sfDir ckpt=$ckpt " +
      s"raw_min=${fmt(rows.map(_._1).min)} raw_med=${fmt(med(rows.map(_._1)))} " +
      s"raw_max=${fmt(rows.map(_._1).max)} floor_med=${fmt(med(rows.map(_._2)))} " +
      s"jobs=${rows.head._3} adj_med=${fmt(med(rows.map(_._4)))}")
    spark.stop()
    graft.stub.AlpacaStubServer.stop()
  }
}
