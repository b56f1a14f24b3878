package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface (SURVEY §2.11 names this the natural
 * extension the reference lacks): the events table replayed as a
 * file stream → tumbling-window OHLC-style aggregation → memory sink,
 * drained synchronously so the result doubles as a correctness-gate
 * entry with a plain batch SQL oracle (30-minute epoch-aligned
 * buckets, matching Spark's window() alignment).
 *
 * Scale notes: the same plan on a real cluster runs with
 * outputMode("append") + watermark (bounded state, one window's lag);
 * complete-mode here keeps every window so the batch oracle can match
 * exactly. State is keyed by (window, event_type) — cardinality
 * |windows|×|types|, independent of event volume.
 */
object Streaming {

  def streamEventBars(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file-stream source wants a directory; glob down to events.
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val agg = events
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

    val qname = s"stream_bars_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(qname)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("min_value"), col("max_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  val streamEventBarsSql: String =
    """SELECT
      |  STRFTIME(MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 1800) * 1800 AS BIGINT) * 1000000),
      |           '%Y-%m-%d %H:%M:%S') AS bucket,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY bucket, event_type""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "stream_event_bars" -> ((streamEventBars _, streamEventBarsSql)))
}
