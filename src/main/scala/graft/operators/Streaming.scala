package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Open-session state for one user (streaming sessionization). */
case class SessionState(startMs: Long, lastMs: Long, n: Long)

/** One emission of the transformWithState counter gate: the key's
  * per-batch count and the ValueState-carried running total. */
case class TwsOut(user_id: Long, seq: Long, batch_events: Long, running: Long)

/** `transformWithState` processor: two typed ValueState handles (the
  * running total and the emission ordinal), TTL off — the gate proves
  * cross-batch state continuation under the new API. */
class RunningCounterProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, TwsOut] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.streaming.OutputMode

  @transient private var total: ValueState[Long] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[TwsOut] = {
    var c = 0L
    while (rows.hasNext) { rows.next(); c += 1 }
    val t = (if (total.exists()) total.get() else 0L) + c
    val s = (if (seq.exists()) seq.get() else 0L) + 1L
    total.update(t)
    seq.update(s)
    Iterator.single(TwsOut(key, s, c, t))
  }
}

/** A closed session emitted downstream. */
case class SessionOut(user_id: Long, start_ms: Long, n_events: Long,
    duration_ms: Long)

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

  /** Streaming shuffle/state width derived from LOAD and CLUSTER —
    * never a constant (VERDICT r13 next #2): one state-store instance
    * per ~1 MB of per-stream input at the gate SFs, clamped to
    * [2, defaultParallelism]. Rationale, measured at sf0.1/32 cores:
    * stateful operators open one store per shuffle partition (a
    * stream-stream join opens FOUR) and the per-store open/commit
    * overhead dominates tiny micro-batches — width 8 → 2 cut
    * stream_join_attrib 3.95→2.21 s and stream_join_outer 5.30→4.12 s,
    * while width 1 serialized real per-batch compute and LOST
    * (stream_daily_delta 5.22→9.37 s). Production inputs are GB+ per
    * batch window, so the byte term saturates and the clamp hands the
    * width to the cluster's parallelism. Callers that cannot cheaply
    * size their source (connector streams, whose per-batch volume is
    * page-bounded) pass -1 and get a pure cluster derivation,
    * defaultParallelism/16 under the same clamp — measured flat vs
    * the old 8 on the connector gates (alpaca_stream_ewma 4.05→4.00)
    * and still scaling with the cluster instead of a literal. */
  private[operators] def statePartitionsFor(spark: SparkSession,
      inputBytes: Long): Int = {
    val dp = spark.sparkContext.defaultParallelism
    val byLoad =
      if (inputBytes >= 0) (inputBytes >> 20) + 1 // ceil-ish MB
      else dp.toLong / 16
    math.max(2L, math.min(dp.toLong, byLoad)).toInt
  }

  /** Total byte size of a staged file/dir — the load signal
    * [[statePartitionsFor]] sizes the drain by. */
  private[operators] def stagedBytes(path: String): Long = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    if (!Files.exists(p)) -1L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
  }

  /** Drain a streaming frame synchronously into a memory-sink table
    * and return it (gate scaffolding shared by every streaming gate).
    * Stateful operators open one state-store instance per shuffle
    * partition (a stream-stream join opens FOUR), and at gate scale
    * the per-store open/commit overhead dominates the micro-batch —
    * so the drain width is derived from the staged input size and the
    * cluster ([[statePartitionsFor]]; r13 ran a constant 8). The value
    * bakes into each query's checkpoint at first start; the session's
    * width is restored for the batch read-back. */
  private[operators] def drainToTable(spark: SparkSession, df: DataFrame,
      mode: String, inputBytes: Long = -1L): DataFrame = {
    val qname = s"stream_gate_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val width = statePartitionsFor(spark, inputBytes)
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    val trialProvider = sys.env.get("SPARK_GRAFT_STATE_PROVIDER")
    trialProvider.foreach(spark.conf.set(providerKey, _))
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(qname)
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (trialProvider.isDefined) prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    spark.table(qname)
  }

  def streamEventBars(spark: SparkSession, dir: String): DataFrame = {
    graft.core.SessionTuning.nanosAsLong(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file-stream source wants a directory; glob down to events.
    val events = Tables.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))

    val agg = events
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

    drainToTable(spark, agg, "complete", stagedBytes(s"$dir/events.parquet"))
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

  /**
   * Streaming sessionization with CUSTOM state — the
   * `flatMapGroupsWithState` pattern (SURVEY §2.11): per-user sessions
   * close after a `gapMinutes` event-time silence, enforced by a
   * watermark + EventTimeTimeout. The incremental twin of the batch
   * `Events.sessionize` gate.
   *
   * Scale design: state is ONE (start, last, count) triple per active
   * user — bounded by concurrent-user cardinality, independent of
   * event volume; closed sessions leave state immediately (timeout →
   * remove). Input is shuffled once on user_id, the same key the
   * batch variant windows on.
   *
   * Input columns: user_id LONG, ts TIMESTAMP. Emits closed sessions
   * only (append mode).
   */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: the session is closed
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startMs, s.n, s.lastMs - s.startMs))
          } else {
            val times = rows.map(_._2.getTime).toArray.sorted
            var closed = List.empty[SessionOut]
            var open = state.getOption
            // Out-of-order events within the watermark can precede the
            // carried-over session. Those still within `gapMs` of its
            // start merge backward (start moves earlier); anything
            // older belongs to a separate EARLIER session, sessionized
            // on its own and closed immediately — the open session
            // already occupies the timeline after it. (The batch twin
            // sees the whole timeline at once; immediate-close is the
            // streaming approximation for that earlier-session tail.)
            val (early, rest) = open match {
              case Some(s) => times.partition(_ < s.startMs - gapMs)
              case None => (Array.empty[Long], times)
            }
            var earlyOpen: Option[SessionState] = None
            early.foreach { t =>
              earlyOpen = earlyOpen match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(s.copy(lastMs = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, s.startMs, s.n, s.lastMs - s.startMs)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            earlyOpen.foreach { s =>
              closed ::= SessionOut(user, s.startMs, s.n, s.lastMs - s.startMs)
            }
            rest.foreach { t =>
              open = open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(SessionState(math.min(s.startMs, t),
                    math.max(s.lastMs, t), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, s.startMs, s.n, s.lastMs - s.startMs)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  // ------------------------------------------------- streaming dedup
  /** Streaming exact-dedup: the documents table replayed as a file
    * stream → `dropDuplicates` on a 40-char-prefix fingerprint →
    * per-language distinct-document counts. The gate output counts
    * distinct (lang, prefix_hash) keys, which is independent of WHICH
    * duplicate dropDuplicates keeps (micro-batch arrival order is
    * nondeterministic) — so a plain batch COUNT(DISTINCT) oracle
    * matches exactly.
    *
    * Scale notes: in production this runs append-mode with
    * `withWatermark` + `dropDuplicatesWithinWatermark` so the
    * dedup-key state ages out; state carries one 16-byte digest per
    * live key, never the text. Complete-mode here is gate
    * scaffolding, as in streamEventBars. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val docsStream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val agg = docsStream
      .select(col("lang"), md5(substring(col("text"), 1, 40)).as("prefix_hash"))
      .dropDuplicates("lang", "prefix_hash")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_distinct_docs"))
    drainToTable(spark, agg, "complete",
        stagedBytes(s"$dir/documents.parquet"))
      .select(col("lang"), col("n_distinct_docs"))
      .orderBy(col("lang"))
  }

  val streamDedupSql: String =
    """SELECT lang, COUNT(DISTINCT md5(SUBSTR(text, 1, 40))) AS n_distinct_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------- stream-static join
  /** Streaming incremental dedup via a STREAM-STATIC join — the third
    * Structured Streaming join mode (beside the stream-stream interval
    * join in StreamingSpec and the within-stream dropDuplicates
    * above): the delta batch (doc_id % 5 == 0, replayed as a file
    * stream) left-joins the STATIC corpus digest table and is
    * classified dup_corpus/new in flight. Counts per status are
    * independent of micro-batch arrival order, so the batch oracle
    * matches exactly.
    *
    * Scale notes: the static side is the persisted digest table of
    * `dedup_incremental` — broadcast when it fits, else the join
    * shuffles only 16-byte digests; the stream side holds no join
    * state at all (static joins are stateless on the stream side, no
    * watermark needed). This is the production shape for "dedup
    * today's crawl against everything already ingested" as it lands. */
  def streamStaticDedup(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 =!= 0)
      .select(md5(substring(col("text"), 1, 10)).as("h"))
      .distinct().withColumn("in_corpus", lit(1))
    val delta = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("doc_id") % 5 === 0)
      .select(md5(substring(col("text"), 1, 10)).as("h"))
    val agg = delta.join(corpus, Seq("h"), "left")
      .select(when(col("in_corpus").isNotNull, lit("dup_corpus"))
        .otherwise(lit("new")).as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
    drainToTable(spark, agg, "complete",
        stagedBytes(s"$dir/documents.parquet"))
      .select(col("status"), col("n"))
      .orderBy(col("status"))
  }

  val streamStaticDedupSql: String =
    """WITH d AS (SELECT doc_id, md5(SUBSTR(text, 1, 10)) AS h FROM documents),
      |corpus AS (SELECT DISTINCT h FROM d WHERE doc_id % 5 <> 0)
      |SELECT CASE WHEN c.h IS NOT NULL THEN 'dup_corpus' ELSE 'new' END AS status,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM (SELECT h FROM d WHERE doc_id % 5 = 0) b
      |LEFT JOIN corpus c ON b.h = c.h
      |GROUP BY 1 ORDER BY status""".stripMargin

  // ------------------------------------------- stream-stream join
  private val AttribWindowMin = 30

  /** Stream-stream interval join as a GATE (it previously lived only
    * in StreamingSpec): click events joined to the SAME user's
    * purchase events landing within 30 minutes — the standard
    * attribution join — with BOTH sides watermarked so join state
    * ages out. An inner interval join emits a deterministic pair set
    * regardless of micro-batch boundaries, so a plain batch self-join
    * oracle matches exactly after the per-user post-aggregation
    * (which runs as a batch query over the drained sink — gate
    * scaffolding; production appends the raw attributed pairs
    * downstream).
    *
    * Scale notes: per-side state is bounded by watermark horizon ×
    * per-user event rate; each stream shuffles ONCE on user_id.
    * Purchase money is summed via the DECIMAL(18,2) path (parity
    * rule: never sum raw doubles). */
  /** The watermarked click⋈purchase interval-join stream over any
    * parquet directory (shared by the gate and the checkpoint-restart
    * spec, which stages event halves into a temp dir). `ts` may be an
    * epoch-nanos LONG or a µs timestamp (Tables.normalizeEventTs). */
  private[graft] def attribJoinedStream(spark: SparkSession, streamDir: String,
      glob: String): DataFrame = {
    graft.core.SessionTuning.nanosAsLong(spark)
    val schema = spark.read.option("pathGlobFilter", glob)
      .parquet(streamDir).schema
    def stream = Tables.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(streamDir))
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "60 minutes")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "60 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $AttribWindowMin MINUTES"))
  }

  def streamJoinAttrib(spark: SparkSession, dir: String): DataFrame = {
    val joined = attribJoinedStream(spark, dir, "events.parquet")
    drainToTable(spark, joined, "append", stagedBytes(s"$dir/events.parquet"))
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_purchase"))
      .orderBy(col("user_id"))
  }

  val streamJoinAttribSql: String =
    s"""WITH c AS (
       |  SELECT user_id, EPOCH_US(ts) AS ts_us FROM events
       |  WHERE event_type = 'click'),
       |p AS (
       |  SELECT user_id, EPOCH_US(ts) AS ts_us, value FROM events
       |  WHERE event_type = 'purchase')
       |SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_attributed,
       |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_purchase
       |FROM c JOIN p ON c.user_id = p.user_id
       |  AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + ${AttribWindowMin * 60L * 1000000L}
       |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  // ------------------------------------ stream-stream OUTER join gate
  /** LEFT OUTER watermarked interval join — the attribution join's
    * production form: every click emits, matched or not, so the
    * downstream model sees negatives too. Outer rows are only
    * released when the GLOBAL watermark (the min across both sides)
    * passes click_ts + interval + delay and a LATER batch triggers
    * the eviction — three stream-engine behaviors the inner gate
    * never exercises. Determinism therefore needs the sentinel
    * staging: each sentinel batch carries BOTH event types (a
    * click-only sentinel would advance only the click-side watermark
    * and the global min would stall — nulls would never flush);
    * sentinel 1 pushes both watermarks past every real eviction
    * horizon, sentinel 2 triggers the batch that emits. Sentinel
    * users are negative and excluded from the aggregate.
    *
    * The oracle is a plain batch LEFT JOIN: once all state is
    * flushed, the streamed pair set (matched rows + null-extended
    * unmatched clicks) is exactly the batch result regardless of
    * micro-batch boundaries.
    *
    * Scale notes: same bounded-state story as the inner join — per
    * side, watermark horizon × per-user rate, one shuffle on user_id
    * each; the outer form adds no state, only deferred emission. */
  def streamJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.core.Scratch.dir("stream_louter", dir)
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"), col("value"))
    def sentinel(uid: Long, us: Long): DataFrame = {
      val ts = timestamp_micros(lit(us))
      spark.range(1).select(lit(uid).as("user_id"), ts.as("ts"),
          lit("click").as("event_type"), lit(0.0d).as("value"))
        .unionAll(spark.range(1).select(lit(uid).as("user_id"), ts.as("ts"),
          lit("purchase").as("event_type"), lit(0.0d).as("value")))
    }
    stageWithSentinels(spark, stage, ev, unix_micros(col("ts")),
      maxUs => (sentinel(-1L, maxUs + 10L * 86400000000L),
        sentinel(-2L, maxUs + 20L * 86400000000L)))

    def stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "60 minutes")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "60 minutes")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $AttribWindowMin MINUTES"),
      "left_outer")
    drainToTable(spark, joined, "append", stagedBytes(stage))
      .filter(col("c_user") >= 0)
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("p_ts").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("p_ts").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_purchase"))
      .orderBy(col("user_id"))
  }

  val streamJoinOuterSql: String =
    s"""WITH c AS (
       |  SELECT user_id, EPOCH_US(ts) AS ts_us FROM events
       |  WHERE event_type = 'click'),
       |p AS (
       |  SELECT user_id, EPOCH_US(ts) AS ts_us, value FROM events
       |  WHERE event_type = 'purchase')
       |SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(p.ts_us) AS BIGINT) AS n_matched,
       |  CAST(COUNT(*) - COUNT(p.ts_us) AS BIGINT) AS n_unmatched,
       |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_purchase
       |FROM c LEFT JOIN p ON c.user_id = p.user_id
       |  AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + ${AttribWindowMin * 60L * 1000000L}
       |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  // --------------------------------------- streaming sessionize gate
  private val SessGapMs = 30L * 60L * 1000L

  /** `sessionizeStream` (custom flatMapGroupsWithState state) as a
    * GATE with a batch gaps-and-islands oracle — previously the
    * operator was spec-only; this certifies it against DuckDB on the
    * full events table. Closing EVERY session deterministically needs
    * the watermark to pass every real event, so the events are staged
    * into a temp dir as three files processed as three ordered
    * micro-batches (`maxFilesPerTrigger=1`, ascending mtimes): all
    * real events, then two far-future sentinel users. Sentinel #1
    * advances the watermark past every real session's close; the
    * batch triggered by sentinel #2 fires the EventTimeTimeouts that
    * emit them (timeouts fire on the NEXT batch after the watermark
    * moves — same two-step the StreamingSpec exercises). Event times
    * are floored to millis at staging (state arithmetic is in ms), so
    * the oracle's ms domain is exact, not a rounding approximation.
    *
    * Scale notes: identical runtime shape to production — one shuffle
    * on user_id, state = one (start, last, n) triple per OPEN user,
    * closed sessions leave state via timeout. The sentinel staging is
    * gate scaffolding only; a real deployment just keeps running. */
  /** Stage [data, sentinel1, sentinel2] as three one-file parquet
    * batches (ascending mtimes) so a `maxFilesPerTrigger=1` file
    * stream processes them as three ordered micro-batches: sentinel 1
    * advances the watermark past everything real; the batch triggered
    * by sentinel 2 fires the resulting emissions/timeouts. Shared by
    * every gate that must CLOSE all event-time state deterministically
    * before its drain returns.
    *
    * The sentinel timestamps need the data's max event time: instead
    * of a separate driver pre-pass over the source (an extra job per
    * gate), the data-staging job OBSERVES max(obsCol) via
    * CollectMetrics and the sentinels are built from that — one job,
    * one read. */
  private def stageWithSentinels(spark: SparkSession, stage: String,
      data: DataFrame, obsCol: org.apache.spark.sql.Column,
      sentinels: Long => (DataFrame, DataFrame)): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stagePath = Paths.get(stage)
    if (Files.exists(stagePath)) {
      val w = Files.walk(stagePath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
    Files.createDirectories(stagePath)
    def writeOne(df: DataFrame, tmp: String, destName: String, mtime: Long): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val tmpPath = Paths.get(tmp)
      val part = {
        val s = Files.list(tmpPath)
        try s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).next()
        finally s.close()
      }
      val dest = stagePath.resolve(destName)
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      // micro-batch ORDER rides on these mtimes — fail loudly on a
      // filesystem that rejects the update instead of silently
      // depending on write-time mtimes
      require(dest.toFile.setLastModified(mtime),
        s"setLastModified($mtime) failed for $dest — batch order would be undefined")
      // scratch write dir is spent once the part file is copied
      // (walk stream closed like Files.list above — each leaks a
      // directory handle until GC otherwise)
      val w = Files.walk(tmpPath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
    val obs = new org.apache.spark.sql.Observation()
    val t0 = System.currentTimeMillis()
    writeOne(data.observe(obs, max(obsCol).as("mx")),
      s"${stage}_a", "00_data.parquet", t0 - 120000L)
    val mx = obs.get("mx") match {
      case l: java.lang.Long => l.longValue()
      // max() over zero rows is NULL: an empty source means there is
      // no watermark to advance past — a clear error beats the NPE
      // the cast would throw
      case other => throw new IllegalStateException(
        s"staged stream data is empty (observed max = $other) — no sentinel horizon")
    }
    val (sentinel1, sentinel2) = sentinels(mx)
    writeOne(sentinel1, s"${stage}_b", "01_sentinel.parquet", t0 - 60000L)
    writeOne(sentinel2, s"${stage}_c", "02_sentinel.parquet", t0)
  }

  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.core.Scratch.dir("stream_sess", dir)
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        timestamp_millis(expr("unix_micros(ts) div 1000")).as("ts"))
    def sentinel(uid: Long, ms: Long): DataFrame = spark.range(1)
      .select(lit(uid).as("user_id"), timestamp_millis(lit(ms)).as("ts"))
    // unix_millis(ts) recovers exactly the `ts div 1000000` millis the
    // projection wrote, so the observed max equals the old pre-pass
    stageWithSentinels(spark, stage, ev, unix_millis(col("ts")),
      maxMs => (sentinel(-1L, maxMs + 10L * 86400000L),
        sentinel(-2L, maxMs + 20L * 86400000L)))

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val sessions = sessionizeStream(stream, gapMinutes = 30)
    drainToTable(spark, sessions.toDF(), "append", stagedBytes(stage))
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("start_ms"), col("n_events"), col("duration_ms"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  val streamSessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, EPOCH_US(ts) // 1000 AS ts_ms FROM events),
       |flagged AS (
       |  SELECT user_id, ts_ms,
       |    CASE WHEN LAG(ts_ms) OVER w IS NULL OR ts_ms - LAG(ts_ms) OVER w > $SessGapMs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
       |sessions AS (
       |  SELECT user_id, ts_ms,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms) AS BIGINT) AS sid
       |  FROM flagged)
       |SELECT user_id, MIN(ts_ms) AS start_ms, COUNT(*) AS n_events,
       |  MAX(ts_ms) - MIN(ts_ms) AS duration_ms
       |FROM sessions GROUP BY user_id, sid
       |ORDER BY user_id, start_ms""".stripMargin

  // --------------------------------------- sliding-window aggregation
  /** SLIDING (overlapping) event-time windows — the streaming window
    * mode `stream_event_bars`' tumbling windows don't cover: 1-hour
    * windows sliding every 30 minutes, so each event lands in TWO
    * windows (state per key = |overlapping windows| × |types|, still
    * volume-independent). The oracle enumerates the k ∈ {0,1}
    * window memberships per event explicitly — the same alignment
    * Spark's window(ts, len, slide) computes. DECIMAL money path as
    * everywhere. Complete-mode drain is gate scaffolding; production
    * appends with a watermark exactly as the tumbling twin. */
  def streamSlidingBars(spark: SparkSession, dir: String): DataFrame = {
    graft.core.SessionTuning.nanosAsLong(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = Tables.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    val agg = events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    drainToTable(spark, agg, "complete", stagedBytes(s"$dir/events.parquet"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  val streamSlidingBarsSql: String =
    """WITH e AS (
      |  SELECT EPOCH(ts) AS sec, event_type, value FROM events),
      |m AS (
      |  SELECT (FLOOR(sec / 1800) - k) * 1800 AS wstart, event_type, value
      |  FROM e, UNNEST([0, 1]) AS u(k))
      |SELECT
      |  STRFTIME(MAKE_TIMESTAMP(CAST(wstart AS BIGINT) * 1000000),
      |           '%Y-%m-%d %H:%M:%S') AS bucket,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM m GROUP BY 1, 2
      |ORDER BY bucket, event_type""".stripMargin

  // ---------------------------- append-mode watermarked aggregation
  /** The PRODUCTION windowed-aggregation shape as a gate: append
    * output mode + a 30-minute watermark, so every window's state is
    * dropped once the watermark passes its end and the window emits
    * exactly once — unlike `stream_event_bars`' complete-mode
    * scaffolding, which retains all windows forever. Sentinel staging
    * (shared helper) drives the watermark past every real window so
    * the finite gate emits the COMPLETE window set; the oracle is the
    * identical batch bucketing — equality proves append+watermark
    * loses nothing and duplicates nothing. State at any instant is
    * bounded by |open windows| × |types| (one watermark horizon),
    * which is the 100 TB memory story. */
  def streamEventBarsAppend(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.core.Scratch.dir("stream_append", dir)
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value"))
    def sentinel(us: Long): DataFrame = spark.range(1)
      .select(timestamp_micros(lit(us)).as("ts"),
        lit("__sentinel__").as("event_type"), lit(0.0d).as("value"))
    // unix_micros(ts) == the `ts div 1000` micros the projection wrote
    stageWithSentinels(spark, stage, ev, unix_micros(col("ts")),
      maxUs => (sentinel(maxUs + 10L * 86400000000L),
        sentinel(maxUs + 20L * 86400000000L)))

    val agg = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    drainToTable(spark, agg, "append", stagedBytes(stage))
      .filter(col("event_type") =!= "__sentinel__")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  val streamEventBarsAppendSql: String =
    """SELECT
      |  STRFTIME(MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 1800) * 1800 AS BIGINT) * 1000000),
      |           '%Y-%m-%d %H:%M:%S') AS bucket,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY bucket, event_type""".stripMargin

  // ------------------------------- stream-static NEAR-dup (MinHash)
  /** Streaming near-dup scoring against the corpus LSH index — the
    * in-flight form of `dedup_incremental_minhash`: the delta stream
    * (doc_id % 5 = 0) is scored against the STATIC corpus band index
    * as it lands. The streaming constraint that shapes the operator:
    * only ONE stateful op is allowed, so the MinHash signature cannot
    * be the batch explode+groupBy — it is recomputed as a pure
    * PER-ROW projection (array_min over the shingle array per
    * permutation, two md5s per shingle via the same
    * Kirsch–Mitzenmacher halves), which is bit-identical to
    * `Dedup.sigDf`'s aggregate because min over the same distinct
    * shingle set is min. Bands explode stateless, the stream-static
    * band join holds NO stream state (static joins are stateless on
    * the stream side), and the single aggregation counts band-level
    * matches — a multiset independent of micro-batch arrival order,
    * so the batch oracle matches exactly. The near-dup test is the
    * INTEGER form eq ≥ 8 (≡ est_jaccard ≥ 0.5): no division anywhere.
    *
    * Scale: per-row signatures trade one pass of per-row md5 work for
    * zero stream state — the right trade in flight (state is the
    * scarce resource; the corpus index is the static side, bucketed
    * on the band hash at 100 TB). */
  def streamMinhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpusB = Dedup.bandDf(Dedup.sigDf(spark, dir))
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("band_id").as("c_band_id"), col("bh").as("c_bh"),
        col("sigs").as("c_sigs"))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val h1 = "CAST(conv(substring(md5(s), 1, 14), 16, 10) AS BIGINT)"
    val h2 = "CAST(conv(substring(md5(s), 17, 14), 16, 10) AS BIGINT)"
    val deltaBands = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("doc_id") % 5 === 0)
      // parallelism floor on the STREAM side (opt r14, guide §2.5):
      // the one-file micro-batch scans as a single partition, so the
      // per-row signature pipeline below (2 md5/shingle + 16 array_min
      // folds) ran serially — measured 2.5–3.0 s of the gate's ~3.7 s
      // adjusted time in one task. Stateless shuffle of ~0.6 KB/doc
      // text, same width rule as the batch shingle floor.
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"))
      .withColumn("hs", expr(
        s"transform(shingles, s -> array($h1, $h2))"))
      .withColumn("sigs", expr(
        "transform(sequence(1, 16), k -> array_min(transform(hs, h -> h[0] + CAST(k AS BIGINT) * h[1])))"))
      .withColumn("band", explode(expr(
        """transform(sequence(0, 3), b -> named_struct(
          |  'band_id', b,
          |  'bh', md5(concat_ws('|',
          |    CAST(sigs[b*4] AS STRING), CAST(sigs[b*4+1] AS STRING),
          |    CAST(sigs[b*4+2] AS STRING), CAST(sigs[b*4+3] AS STRING)))))""".stripMargin)))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.bh").as("bh"), col("sigs"))
    val eq = graft.functions.VectorFunctions.matchCountF(col("sigs"), col("c_sigs"))
    val agg = deltaBands
      .join(corpusB,
        col("band_id") === col("c_band_id") && col("bh") === col("c_bh"))
      .select(col("band_id"),
        when(eq >= 8, 1L).otherwise(0L).as("nd"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("nd")).as("n_near_dups"))
    drainToTable(spark, agg, "complete",
        stagedBytes(s"$dir/documents.parquet"))
      .select(col("band_id").cast("bigint").as("band_id"),
        col("n_candidates"), col("n_near_dups"))
      .orderBy(col("band_id"))
  }

  val streamMinhashDedupSql: String = {
    val eqSum = (1 to 16)
      .map(k => s"CASE WHEN sa.s$k = sc.s$k THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${Dedup.shingleCte},
       |${Dedup.sigCte},
       |${Dedup.bandCte},
       |sb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
       |cb AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
       |m AS (
       |  SELECT s.band_id,
       |    CASE WHEN ($eqSum) >= 8 THEN 1 ELSE 0 END AS nd
       |  FROM sb s JOIN cb c ON s.band_id = c.band_id AND s.bh = c.bh
       |  JOIN sigs sa ON s.doc_id = sa.doc_id
       |  JOIN sigs sc ON c.doc_id = sc.doc_id)
       |SELECT CAST(band_id AS BIGINT) AS band_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |  CAST(SUM(nd) AS BIGINT) AS n_near_dups
       |FROM m GROUP BY band_id
       |ORDER BY band_id""".stripMargin
  }

  // --------------------------- the streaming daily delta (r12, VERDICT #6)
  /** Micro-batch mirror of [[Pipeline.dailyDelta]] — the shape a
    * 100 TB ingest actually runs: the delta arrives as a STREAM, and
    * every micro-batch goes through the EXACT batch composition
    * (incremental band probe against the static corpus index → Bloom
    * decontam anti-join → per-source token-budget shard pack) inside
    * `foreachBatch`, appending that batch's shard manifest to the
    * output. foreachBatch is deliberate, not a compromise: the daily
    * pipeline chains two aggregations and a window (disallowed as a
    * single continuous streaming plan), and per-batch batch-mode
    * execution with checkpointed offsets is Spark's intended pattern
    * for exactly this — each day's delta is one batch, shard ids are
    * per-batch (per-day manifests), and a restart neither loses nor
    * reprocesses a day (StreamingSpec proves both halves).
    *
    * On the gate fixture the whole delta lands in ONE micro-batch, so
    * the appended manifest is bit-identical to the batch gate's and
    * the oracle SQL is shared VERBATIM ([[Pipeline.dailyDeltaSql]]).
    *
    * Scale: the stream side is a projection+filter (no state); all
    * heavy lifting happens batch-side per micro-batch with the same
    * plans the batch gate pins — banded merge probe, broadcast bloom,
    * bucketed pack prefix. Since r13 every micro-batch probes the
    * PERSISTED corpus band index ([[Dedup.persistedCorpusIndex]],
    * built once per JVM) instead of re-deriving it — the per-batch
    * plan contains no corpus shingle scan, so per-batch work scales
    * with the DELTA while the O(corpus) index build is paid once.
    * Gate-scoped temp dirs are deleted after the final read (ADVICE
    * r12: Bench's repeat runs were accreting /tmp parquet+checkpoint
    * state — the same /tmp-churn mechanism StreamIsolate names as a
    * bench-noise suspect). */
  def streamDailyDelta(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_sdd_out").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sdd_ckpt").toString
    try {
      // the manifest is tiny (shards, not docs) — pin it to a local
      // frame so the temp dirs can be deleted before returning (a
      // lazily-read frame would dangle over the deleted path)
      val res = streamDailyDeltaCore(spark, dir, dir,
        "documents.parquet", out, ckpt)
      spark.createDataFrame(
        spark.sparkContext.parallelize(res.collect().toSeq, 1), res.schema)
    } finally {
      graft.core.Scratch.deleteNow(out)
      graft.core.Scratch.deleteNow(ckpt)
    }
  }

  private[graft] def streamDailyDeltaCore(spark: SparkSession,
      staticDir: String, srcDir: String, glob: String,
      outDir: String, ckpt: String): DataFrame = {
    graft.core.SessionTuning.nanosAsLong(spark)
    val schema = spark.read.option("pathGlobFilter", glob)
      .parquet(srcDir).schema
    val delta = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(srcDir)
      .filter(col("doc_id") % 5 === 0)
    // build (or reuse) the persisted corpus band index BEFORE the
    // stream starts — each micro-batch then probes the bucketed
    // table; no corpus shingle scan inside any batch plan (r13)
    val corpusIdx = Dedup.persistedCorpusIndex(spark, staticDir)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      statePartitionsFor(spark, stagedBytes(s"$srcDir/$glob")).toString)
    val q = delta.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pipeline.dailyDeltaFrom(spark, staticDir, batch, Some(corpusIdx))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // explicit schema: a no-batch run leaves outDir empty, and a
    // schemaless parquet read of an empty dir throws
    spark.read.schema("source STRING, shard_id BIGINT, n_docs BIGINT, " +
        "sum_tokens BIGINT, min_doc BIGINT, max_doc BIGINT")
      .parquet(outDir)
      .orderBy(col("source"), col("shard_id"))
  }

  // --------------------------- streaming ANN probe (r13)
  /** Similarity search AS A SERVICE: query vectors arrive as a
    * stream, and every micro-batch runs the persisted-index probe —
    * [[Similarity.probePersistedAnnProd]], the exact per-request body
    * the batch gate pins — appending its top-k to the output. The
    * four-table IVF-PQ index is built (or reused) BEFORE the stream
    * starts, so no micro-batch ever pays the O(corpus) assignment/
    * encode: per-batch work is the two bucketed artifact scans plus
    * crosses bounded by that batch's query count — the 100 TB serving
    * shape, where the index is a long-lived artifact and requests are
    * a stream against it.
    *
    * On the gate fixture the whole query set lands in ONE micro-batch,
    * so the appended output is bit-identical to the batch gate's and
    * the oracle is shared VERBATIM ([[Similarity.simAnnIvfPq768Sql]]).
    * foreachBatch is the right tool for the same reason as
    * [[streamDailyDelta]]: the probe chains an aggregation and two
    * windows — not a single continuous streaming plan — and
    * checkpointed offsets make a restart neither lose nor re-serve a
    * request batch (StreamingSpec proves both halves). */
  def streamAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_sann_out").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sann_ckpt").toString
    try {
      val res = streamAnnTopKCore(spark, dir, dir,
        "embeddings.parquet", out, ckpt)
      spark.createDataFrame(
        spark.sparkContext.parallelize(res.collect().toSeq, 1), res.schema)
    } finally {
      graft.core.Scratch.deleteNow(out)
      graft.core.Scratch.deleteNow(ckpt)
    }
  }

  private[graft] def streamAnnTopKCore(spark: SparkSession,
      staticDir: String, srcDir: String, glob: String,
      outDir: String, ckpt: String): DataFrame = {
    val schema = spark.read.option("pathGlobFilter", glob)
      .parquet(srcDir).schema
    val requests = Similarity.annQuerySlice(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(srcDir))
    Similarity.ensurePersistedAnn(spark, staticDir)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      statePartitionsFor(spark, stagedBytes(s"$srcDir/$glob")).toString)
    val q = requests.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.probePersistedAnnProd(spark, staticDir, batch)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.read.schema("query_id BIGINT, vec_id BIGINT, cosine DOUBLE")
      .parquet(outDir)
      .orderBy(col("query_id"), col("vec_id"))
  }

  // --------------------------- watermarked dedup (production shape)
  /** `dropDuplicatesWithinWatermark` — the PRODUCTION streaming-dedup
    * operator (plain `dropDuplicates` on a stream keeps ALL keys in
    * state forever; the watermarked form evicts keys once the
    * watermark passes them, which is the only shape that survives an
    * unbounded stream). Key = (user_id, event_type, 30-min bucket);
    * the event-time column is NORMALIZED to the bucket start before
    * dedup so every duplicate row is bit-identical — which physical
    * copy wins is then irrelevant and the appended output is
    * deterministic.
    *
    * Determinism contract for the zero-tolerance oracle: the
    * watermark delay (365 days) exceeds the fixture's whole event-time
    * span, so NO key is ever evicted mid-run and the operator's output
    * equals global DISTINCT regardless of micro-batch boundaries or a
    * checkpoint restart (StreamingSpec proves the restart case by
    * splitting the file at the time midpoint). In production the delay
    * is the real dedup horizon (hours), state stays bounded by keys
    * within the horizon, and the same plan runs unchanged.
    *
    * Scale: one shuffle on the dedup key; state is per-key bits in the
    * store (RocksDB at scale), evicted by watermark — the unbounded
    * corpus problem `dedup_incremental` solves for batch, solved
    * in-flight. */
  private[graft] def dedupWatermarkStream(spark: SparkSession, dir: String,
      glob: String): DataFrame = {
    graft.core.SessionTuning.nanosAsLong(spark)
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val ev = Tables.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir))
    ev.select(col("user_id"), col("event_type"),
        timestamp_micros(expr(
          "(unix_micros(ts) div 1800000000L) * 1800000000L")).as("bucket_ts"))
      .withWatermark("bucket_ts", "8760 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket_ts")
  }

  def streamDedupWatermark(spark: SparkSession, dir: String): DataFrame = {
    val deduped = dedupWatermarkStream(spark, dir, "events.parquet")
    // append-mode drain, then a BATCH rollup of the deduped key set
    // (keeps the stream single-stateful-operator; the rollup is just
    // gate reporting)
    drainToTable(spark, deduped, "append",
        stagedBytes(s"$dir/events.parquet"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_keys"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val streamDedupWatermarkSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, event_type,
      |    EPOCH_US(ts) // 1800000000 AS b
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_keys,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM d GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --------------------- transformWithState (Spark 4 stateful API)
  /** Per-user running counter under `transformWithState` — Spark 4's
    * new-generation arbitrary-state API (typed ValueState handles,
    * TTL support, timers; the successor to the
    * (flat)mapGroupsWithState the sessionize gates use). The fixture
    * is staged as THREE files split by `event_id % 3` with ordered
    * mtimes and `maxFilesPerTrigger=1`, so each file is one
    * micro-batch: every emitted row carries the key's per-batch count
    * AND the running total carried in ValueState — rows from batch
    * n+1 prove the state survived batch n. The oracle reconstructs
    * the same rows in SQL (batch = event_id % 3, running = windowed
    * cumulative sum), so a lost or double-counted state update breaks
    * the hash. Requires the RocksDB state store provider (the API's
    * contract), set and restored around the drain.
    *
    * Scale: state is one (long, long) pair per key in RocksDB —
    * bounded by key cardinality; at production TTLConfig bounds it by
    * time instead (the API's built-in answer to unbounded key
    * spaces, which mapGroupsWithState left to hand-rolled timers). */
  def streamTwsCounter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stage = graft.core.Scratch.dir("tws", dir)
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"))
    stageSplitFiles(spark, stage, ev, 3)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .select(col("user_id")).as[Long]
      val out = stream.groupByKey(identity)
        .transformWithState(new RunningCounterProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      drainToTable(spark, out.toDF(), "append", stagedBytes(stage))
        .select(col("user_id"), col("seq"), col("batch_events"), col("running"))
        .orderBy(col("user_id"), col("seq"))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  val streamTwsCounterSql: String =
    """WITH b AS (
      |  SELECT user_id, event_id % 3 AS batch, COUNT(*) AS batch_events
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT user_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY batch) AS seq,
      |    batch_events,
      |    SUM(batch_events) OVER (
      |      PARTITION BY user_id ORDER BY batch) AS running
      |  FROM b)
      |SELECT user_id, CAST(seq AS BIGINT) AS seq,
      |  CAST(batch_events AS BIGINT) AS batch_events,
      |  CAST(running AS BIGINT) AS running
      |FROM r ORDER BY user_id, seq""".stripMargin

  /** Stage `data` as `n` single-parquet files split by
    * `event_id % n`, mtime-ordered so `maxFilesPerTrigger=1` replays
    * them as n deterministic micro-batches (the stageWithSentinels
    * file mechanics without the event-time sentinels). */
  private def stageSplitFiles(spark: SparkSession, stage: String,
      data: DataFrame, n: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stagePath = Paths.get(stage)
    if (Files.exists(stagePath)) {
      val w = Files.walk(stagePath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
    Files.createDirectories(stagePath)
    val t0 = System.currentTimeMillis()
    (0 until n).foreach { i =>
      val tmp = s"${stage}_w$i"
      data.filter(pmod(col("event_id"), lit(n.toLong)) === i.toLong)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val tmpPath = Paths.get(tmp)
      val part = {
        val s = Files.list(tmpPath)
        try s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).next()
        finally s.close()
      }
      val dest = stagePath.resolve(f"$i%02d_split.parquet")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      require(dest.toFile.setLastModified(t0 - (n - i).toLong * 60000L),
        s"setLastModified failed for $dest — batch order would be undefined")
      val w = Files.walk(tmpPath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
  }

  // --------------------------- state-store inspection (ops surface)
  /** The checkpoint's state read back as a DATAFRAME — Spark 4's
    * `statestore` reader, the ops tool for answering "what is my
    * streaming job actually holding?" without stopping it. The gate
    * runs the watermarked dedup to a checkpoint, then queries the
    * state itself: one row per live dedup key, key fields surfaced as
    * columns. Because the gate's watermark horizon exceeds the
    * fixture's span, NOTHING has been evicted — the state content
    * must equal the batch DISTINCT of the input, giving the state
    * reader an exact cross-engine oracle (the same one the dedup
    * gate's output has; here it certifies the STORE, not the stream).
    *
    * Scale: the state source reads each shuffle partition's store
    * files directly (no running query involved) — state audits at
    * production scale are a parallel scan of the checkpoint, priced
    * like any other columnar read. */
  def streamStateInspect(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_inspect").toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = dedupWatermarkStream(spark, dir, "events.parquet")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.read.format("statestore").load(ckpt)
      .select(col("key.*"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_state_keys"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val streamStateInspectSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, event_type,
      |    EPOCH_US(ts) // 1800000000 AS b
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_state_keys,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM d GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "stream_event_bars" -> ((streamEventBars _, streamEventBarsSql)),
    "stream_event_bars_append" -> ((streamEventBarsAppend _, streamEventBarsAppendSql)),
    "stream_sliding_bars" -> ((streamSlidingBars _, streamSlidingBarsSql)),
    "stream_dedup" -> ((streamDedup _, streamDedupSql)),
    "stream_dedup_watermark" -> ((streamDedupWatermark _, streamDedupWatermarkSql)),
    "stream_state_inspect" -> ((streamStateInspect _, streamStateInspectSql)),
    "stream_tws_counter" -> ((streamTwsCounter _, streamTwsCounterSql)),
    "stream_static_dedup" -> ((streamStaticDedup _, streamStaticDedupSql)),
    "stream_minhash_dedup" -> ((streamMinhashDedup _, streamMinhashDedupSql)),
    "stream_daily_delta" -> ((streamDailyDelta _, Pipeline.dailyDeltaSql)),
    "stream_ann_topk" -> ((streamAnnTopK _, Similarity.simAnnIvfPq768Sql)),
    "stream_join_attrib" -> ((streamJoinAttrib _, streamJoinAttribSql)),
    "stream_join_outer" -> ((streamJoinOuter _, streamJoinOuterSql)),
    "stream_sessionize" -> ((streamSessionize _, streamSessionizeSql)))
}
