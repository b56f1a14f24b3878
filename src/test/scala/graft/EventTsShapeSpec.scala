package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tables

/** The driver's events.parquet has shipped `ts` in different physical
  * shapes across data drops — TIMESTAMP(NANOS) (readable only as
  * nanos-long), TIMESTAMP(MICROS) NTZ, and plain LTZ micros. Round 6
  * started with 19 events gates broken by exactly such a switch;
  * this spec pins Tables.events to the same normalized output for
  * all three shapes so the next drop is a no-op. */
class EventTsShapeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // three instants incl. a sub-second component that must survive µs-exact
  private val micros = Seq(1609718400000000L, 1609718400123456L, 1609804800999999L)

  private def writeShape(shape: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_evshape_$shape").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")
    val df = shape match {
      case "nanos_long" => base.select(col("event_id"),
        (col("us") * 1000L).as("ts")) // epoch-nanos LONG
      case "ntz_micros" => base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      case "ltz_micros" => base.select(col("event_id"),
        timestamp_micros(col("us")).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.events normalizes nanos-long, NTZ-micros and LTZ-micros identically") {
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.toSet
    for (shape <- Seq("nanos_long", "ntz_micros", "ltz_micros")) {
      val dir = writeShape(shape)
      val out = Tables.events(spark, dir)
      assert(out.schema("ts").dataType == TimestampType,
        s"$shape: normalized ts must be TimestampType, got ${out.schema("ts").dataType}")
      val got = out.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"$shape: $got")
    }
  }
}
