package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Plan-shape signatures for every auditable gate, and the golden-file
  * generator.
  *
  * PlanAuditSpec pins a dozen hand-chosen shapes; this pins ALL of
  * them coarsely: per gate, the count of each scale-relevant physical
  * node kind (exchanges by type, join strategies, generates, windows,
  * aggregates). A diff here is exactly the class of regression that is
  * invisible to value-level oracles — an extra shuffle, a join that
  * silently flipped to nested-loop, a window that lost its
  * WindowGroupLimit partial — surfaced as a one-line golden mismatch
  * naming the gate and the node kind.
  *
  * Signatures are computed from the pre-execution plan string
  * (deterministic given the pinned session config; AQE re-planning
  * happens at runtime and is deliberately NOT part of the signature).
  *
  * Regenerate after an intentional plan change:
  *   sbt -batch "runMain graft.tools.PlanGolden"
  * then review the golden diff like any other code change.
  */
object PlanGolden {
  val goldenPath = "src/test/resources/plan_golden.txt"

  /** (label, regex) per node kind. Window needs the bracket to not
    * also count WindowGroupLimit; Exchange variants are split because
    * a range↔hash flip is a real plan change. */
  private val markers: Seq[(String, scala.util.matching.Regex)] = Seq(
    // source scans (DSv2 BatchScan = the Alpaca connector, FileScan =
    // parquet): at 100 TB an extra scan of an input relation is a
    // whole extra pass over the data, so the count is pinned per gate
    "scan" -> "(BatchScan|FileScan)".r,
    "xchgHash" -> "Exchange hashpartitioning".r,
    "xchgRange" -> "Exchange rangepartitioning".r,
    "xchgSingle" -> "Exchange SinglePartition".r,
    "bcast" -> "BroadcastExchange".r,
    "reused" -> "ReusedExchange".r,
    "smj" -> "SortMergeJoin".r,
    "bhj" -> "BroadcastHashJoin".r,
    "bnlj" -> "BroadcastNestedLoopJoin".r,
    "cartesian" -> "CartesianProduct".r,
    "generate" -> "Generate".r,
    "window" -> "Window \\[".r,
    "wgl" -> "WindowGroupLimit".r,
    "hashAgg" -> "HashAggregate".r,
    "objHashAgg" -> "ObjectHashAggregate".r,
    "sortAgg" -> "SortAggregate".r,
    "topK" -> "TakeOrderedAndProject".r)

  def signature(plan: String): String =
    markers.flatMap { case (label, re) =>
      val n = re.findAllIn(plan).size
      if (n == 0) None else Some(s"$label=$n")
    }.mkString(" ")

  /** ALL gates are pinned (r7 closed the 124→gate-count gap).
    * Streaming gates execute their query eagerly and return the
    * drained sink's batch READBACK plan — the signature pins that the
    * gate's return stays a plain readback (scan + projection/agg),
    * so a gate can't silently grow post-drain work; the streaming
    * micro-batch plan itself is audited in StreamingSpec. Sink gates
    * pin the read-back join/agg shape over the written layout (e.g.
    * sink_bucketed_join's exchange-free SMJ over bucketed scans). */
  def auditableGates: Seq[String] =
    graft.SparkEntry.queries.keys.toSeq.sorted

  /** Signatures are computed with AQE disabled: the static
    * ReuseExchange rule then runs at plan time, so the golden pins
    * scan dedup (`reused=`/`scan=`) exactly as AQE's runtime stage
    * reuse will execute it — under AQE the pre-execution plan hides
    * both. The initial plan is otherwise identical. */
  def signatures(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try auditableGates.map { n =>
      n -> signature(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // try/finally: an exception with Spark's non-daemon threads alive
    // would otherwise hang the forked JVM silently instead of failing
    try {
      val lines = signatures(spark, "/root/testdata/sf0.001")
        .map { case (n, s) => s"$n: $s" }
      val p = Paths.get(goldenPath)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.write(p, (lines.mkString("\n") + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"PLAN_GOLDEN_WRITTEN=${lines.size}")
    } finally {
      spark.stop()
      graft.stub.AlpacaStubServer.stop()
    }
  }
}
