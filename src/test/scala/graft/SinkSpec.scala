package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink surface (SURVEY §2.1 S8 — delegated to Spark writers):
  * partitioned parquet round-trip with partition pruning on re-read.
  * At 100 TB, partitionBy on a low-cardinality column is the layout
  * that makes `WHERE event_type = …` skip whole directories. */
class SinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("partitioned parquet write round-trips and prunes on read") {
    val out = Files.createTempDirectory("graft-sink").toString
    val events = operators.Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_type=")).sorted
    assert(dirs.length == 5, s"expected 5 partition dirs, got ${dirs.toSeq}")

    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    // partition filter prunes to one directory's files
    val one = back.filter(col("event_type") === "click")
    one.collect()
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() == events.filter(col("event_type") === "click").count())
    assert(scanned.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning in:\n${scanned.take(600)}")
  }

  test("bucketed join: no shuffle exchange under the sort-merge join") {
    val df = operators.Sinks.sinkBucketedJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.sparkPlan
    val smjs = plan.collect {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
    val shuffles = smjs.flatMap(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    })
    assert(shuffles.isEmpty,
      s"bucketed sides must satisfy the join distribution from storage:\n$plan")
    // both scans report the bucket layout
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.forall(_.bucketedScan), s"non-bucketed scan in:\n$plan")
  }

  test("dynamic partition overwrite rewrites ONLY the partitions present in the write") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_dyn_ovw").toString
    val df = spark.range(100)
      .select(col("id"), (col("id") % 2).as("pkey"))
    df.write.mode("overwrite").partitionBy("pkey").parquet(out)
    def files(p: Long): Map[String, Long] =
      new java.io.File(s"$out/pkey=$p").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val p0Before = files(0)
    assert(p0Before.nonEmpty)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // a delta touching ONLY pkey=1 (negated ids mark the new rows)
      spark.range(100).filter(col("id") % 2 === 1)
        .select((-col("id")).as("id"), lit(1L).as("pkey"))
        .write.mode("overwrite").partitionBy("pkey").parquet(out)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // untouched partition: byte-identical file set, same mtimes
    assert(files(0) == p0Before,
      "dynamic overwrite rewrote files of an untouched partition")
    val back = spark.read.parquet(out)
    assert(back.filter(col("pkey") === 0 && col("id") >= 0).count() == 50)
    assert(back.filter(col("pkey") === 1).agg(max(col("id"))).head().getLong(0) < 0,
      "affected partition still holds pre-overwrite rows")
  }

  test("band-index compaction: one file per bucket, strictly fewer than the fragments") {
    // the content identity is oracle-gated (sink_band_index_compact);
    // this pins the small-files claim itself: the repartition-on-
    // bucket-cols write emits exactly one file per non-empty bucket,
    // and the three-fragment append state it replaces has strictly
    // more
    def parquetFiles(p: String): Int =
      Option(new java.io.File(p).listFiles).map(
        _.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
    val (summary, fragPath, compPath) =
      operators.Dedup.bandIndexCompactCore(spark, "/root/testdata/sf0.001")
    summary.collect() // materialize after-compaction state
    val frag = parquetFiles(fragPath)
    val comp = parquetFiles(compPath)
    assert(comp <= 8, s"compacted table has $comp files (> one per bucket)")
    assert(comp < frag,
      s"compaction did not reduce the file count ($frag -> $comp)")
  }
}
