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
}
