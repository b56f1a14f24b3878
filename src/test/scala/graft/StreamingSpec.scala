package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics beyond the complete-mode gate query:
  * append mode with a watermark — late data beyond the watermark is
  * dropped, closed windows emit exactly once. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("stream_event_bars drains the events file stream") {
    val df = operators.Streaming.streamEventBars(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // total event count across windows equals the table's row count
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == 1000L)
  }

  test("flatMapGroupsWithState sessionization: gap closes sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = operators.Streaming.sessionizeStream(
      input.toDF().toDF("user_id", "ts"), gapMinutes = 30)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_test").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      // user 1: two events 5 min apart; user 2: one event
      input.addData((1L, ts(10, 0)), (1L, ts(10, 5)), (2L, ts(10, 0)))
      q.processAllAvailable()
      assert(spark.table("sess_test").count() == 0) // nothing closed yet
      // watermark jumps past 10:05+30m → both sessions time out
      input.addData((3L, ts(11, 30)))
      q.processAllAvailable()
      input.addData((3L, ts(12, 30))) // extra trigger fires the timeouts
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains((1L, 2L, 5L * 60 * 1000)), s"user1 session wrong: $rows")
      assert(rows.contains((2L, 1L, 0L)), s"user2 session wrong: $rows")
      // user 1's in-gap second event merged (no single-event split session)
      assert(!rows.exists(r => r._1 == 1L && r._2 == 1L))
    } finally q.stop()
  }

  test("sessionization merges cross-batch out-of-order events backward (start = min)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = operators.Streaming.sessionizeStream(
      input.toDF().toDF("user_id", "ts"), gapMinutes = 30)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_ooo_test").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      input.addData((7L, ts(11, 0)))
      q.processAllAvailable() // watermark → 10:30
      // late-but-within-watermark event PRECEDING the open session:
      // must merge backward (start = 10:31), not be silently absorbed
      input.addData((7L, ts(10, 31)))
      q.processAllAvailable()
      input.addData((8L, ts(13, 0))) // watermark jump closes user 7
      q.processAllAvailable()
      input.addData((8L, ts(14, 30))) // extra trigger fires the timeout
      q.processAllAvailable()
      val r7 = spark.table("sess_ooo_test")
        .collect().filter(_.getLong(0) == 7L)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val startMs = ts(10, 31).getTime
      assert(r7.toSeq == Seq((startMs, 2L, 29L * 60 * 1000)),
        s"user7 should be one session [10:31, 11:00] n=2: ${r7.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attribute to impressions within 5m") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(Long, java.sql.Timestamp)]
    val clk = MemoryStream[(Long, java.sql.Timestamp)]
    val impDf = imp.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "10 minutes")
    val clkDf = clk.toDF().toDF("c_ad_id", "click_ts").withWatermark("click_ts", "10 minutes")
    // the canonical ad-attribution shape: equi key + event-time range;
    // watermarks bound both join state buffers
    val joined = impDf.join(clkDf,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + org.apache.spark.sql.functions.expr("interval 5 minutes"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      imp.addData((1L, ts(0)), (2L, ts(0)))
      q.processAllAvailable()
      clk.addData((1L, ts(3)), (2L, ts(30))) // ad 1 within 5m; ad 2 outside
      q.processAllAvailable()
      val rows = spark.table("ssj_test").collect().map(_.getLong(0))
      assert(rows.toSeq == Seq(1L), s"only ad 1 should attribute: ${rows.toSeq}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dup inside the watermark emits once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = input.toDF().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ddww_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData(("a", ts(0)), ("b", ts(1)))
      q.processAllAvailable()
      input.addData(("a", ts(2))) // duplicate of 'a' within the watermark
      q.processAllAvailable()
      val rows = spark.table("ddww_test").collect().map(_.getString(0))
      assert(rows.sorted.toSeq == Seq("a", "b"), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("append mode + watermark: late rows beyond the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData((ts(0), 1.0), (ts(5), 2.0))
      q.processAllAvailable() // watermark now 10:05-10m → nothing closed
      input.addData((ts(30), 3.0)) // advances watermark to 10:20
      q.processAllAvailable() // closes the 10:00 window
      val afterClose = spark.table("wm_test").collect()
      assert(afterClose.length == 1 && afterClose.head.getAs[Long]("n") == 2L)
      input.addData((ts(1), 9.9)) // late: before the 10:20 watermark
      input.addData((ts(55), 4.0)) // closes the 10:30 window
      q.processAllAvailable()
      val rows = spark.table("wm_test").collect()
      // the late 10:01 row was dropped: 10:00 window emitted once with n=2
      assert(rows.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("attribution join runs on the RocksDB state store (production backend)") {
    // at 100 TB of stream state the in-memory HDFS-backed store cannot
    // hold the working set; RocksDB is the production provider. The
    // gate must be provider-agnostic — same result either way.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val got = SparkEntry.queries("stream_join_attrib")(spark, "/root/testdata/sf0.001")
        .collect().toSeq
      spark.conf.unset(key)
      val hdfsStore = SparkEntry.queries("stream_join_attrib")(spark, "/root/testdata/sf0.001")
        .collect().toSeq
      assert(got.nonEmpty && got == hdfsStore)
    } finally { prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    } }
  }

  test("dropDuplicatesWithinWatermark resumes from checkpoint: exact key set across restart") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("graft_wmd_src").toString
    val ckpt = Files.createTempDirectory("graft_wmd_ckpt").toString
    val sink = Files.createTempDirectory("graft_wmd_sink").toString
    val ev = operators.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", unix_micros(col("ts")))
    // split by TIME at the midpoint: run 2's rows all sit at or after
    // run 1's final watermark, so nothing is dropped as late — any
    // cross-half duplicate key must be dropped by STATE carried
    // through the checkpoint, which is what this proves
    val Array(mn, mx) = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = mn + (mx - mn) / 2
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_wmd_stage").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    def run(): Unit = {
      val deduped = operators.Streaming.dedupWatermarkStream(spark, src, "*.parquet")
      val q = deduped.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(ev.filter(col("ts_us") <= mid).drop("ts_us"), "h1")
    run()
    stage(ev.filter(col("ts_us") > mid).drop("ts_us"), "h2")
    run()
    val got = spark.read.parquet(sink)
      .select(col("user_id"), col("event_type"), unix_micros(col("bucket_ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val expected = ev
      .select(col("user_id"), col("event_type"),
        expr("(unix_micros(ts) div 1800000000L) * 1800000000L").as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(expected.nonEmpty)
    assert(got.length == got.toSet.size,
      s"restart re-emitted ${got.length - got.toSet.size} duplicate keys")
    assert(got.toSet == expected,
      s"key set diverged: extra=${got.toSet -- expected}, missing=${expected -- got.toSet}")
  }

  test("transformWithState resumes from checkpoint: ValueState totals continue across restart") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val src = Files.createTempDirectory("graft_tws_src").toString
    val ckpt = Files.createTempDirectory("graft_tws_ckpt").toString
    val sink = Files.createTempDirectory("graft_tws_sink").toString
    val ev = operators.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"))
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_tws_stage").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def run(): Unit = {
      val stream = spark.readStream.schema(ev.schema).parquet(src)
        .select(col("user_id")).as[Long]
      val out = stream.groupByKey(identity)
        .transformWithState(new operators.RunningCounterProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = out.toDF().writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      // run 1 sees only the even-id half (one batch); the RESTART sees
      // only the odd half — its emissions must carry totals that
      // CONTINUE from run 1's checkpointed ValueState
      stage(ev.filter(col("event_id") % 2 === 0), "h1")
      run()
      stage(ev.filter(col("event_id") % 2 === 1), "h2")
      run()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
    val got = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val counts = ev.groupBy(col("user_id"))
      .agg(sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("even"),
        sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("odd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = counts.flatMap { case (u, even, odd) =>
      val first = if (even > 0) Seq((u, 1L, even, even)) else Seq.empty
      val second =
        if (odd > 0) Seq((u, if (even > 0) 2L else 1L, odd, even + odd))
        else Seq.empty
      first ++ second
    }.toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"state did not continue across restart: extra=${got -- expected}, missing=${expected -- got}")
  }

  test("EwmaProcessor resumes from checkpoint: ListState frame continues across restart") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val src = Files.createTempDirectory("graft_ewma_src").toString
    val ckpt = Files.createTempDirectory("graft_ewma_ckpt").toString
    val sink = Files.createTempDirectory("graft_ewma_sink").toString
    // the same (symbol, hour-index, close×4) rows the connector serves
    // (alpaca_bars_scan pins connector == fixtures), split by TIME at
    // the midpoint: the restart's first emissions need the pre-restart
    // frame tail, so a dropped ListState breaks them
    val start = "2021-01-04T00:00:00Z"
    val end = "2021-01-07T00:00:00Z"
    def usOf(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
    val hour = graft.stub.AlpacaFixtures.HourUs
    val rows = Seq("AAPL", "MSFT").flatMap { s =>
      graft.stub.AlpacaFixtures.bars(s, usOf(start), usOf(end), hour)
        .map(b => (b.symbol, b.timeUs / hour, (b.close * 4).toLong))
    }
    val jMid = (usOf(start) / hour + usOf(end) / hour) / 2
    def stage(half: Seq[(String, Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_ewma_stage").toString
      half.toDF("symbol", "j", "c4").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("symbol STRING, j BIGINT, c4 BIGINT").parquet(src)
        .as[(String, Long, Long)]
      val out = stream.groupByKey(_._1)
        .transformWithState(new operators.EwmaProcessor(16),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = out.toDF().writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      stage(rows.filter(_._2 < jMid), "h1")
      run()
      stage(rows.filter(_._2 >= jMid), "h2")
      run()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
    val got = spark.read.parquet(sink)
      .select(col("symbol"),
        date_format(timestamp_micros(col("time_us")), "yyyy-MM-dd HH:mm:ss")
          .as("bar_time"),
        col("n_bars"), col("ewma"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .toSet
    // the batch window gate is the ground truth: identical point set
    // means the frame tail crossed the restart intact
    val expected = SparkEntry.queries("alpaca_ewma")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"frame state did not continue across restart: extra=${(got -- expected).take(4)}, missing=${(expected -- got).take(4)}")
  }

  test("stream-stream join resumes from checkpoint: exact pair set across restart") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("graft_ssj_src").toString
    val ckpt = Files.createTempDirectory("graft_ssj_ckpt").toString
    val sink = Files.createTempDirectory("graft_ssj_sink").toString
    val ev = operators.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", unix_micros(col("ts")))
      .filter(col("event_type").isin("click", "purchase"))
    // split by TIME at the midpoint so the restart's second half never
    // arrives behind the first run's final watermark (a parity split
    // would feed late data and legitimately drop it)
    val Array(mn, mx) = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = mn + (mx - mn) / 2
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_ssj_stage").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    def run(): Unit = {
      val joined = operators.Streaming
        .attribJoinedStream(spark, src, "*.parquet")
      val q = joined.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    // run 1 sees only the first half; committed offsets + JOIN STATE
    // (clicks near the boundary, still inside the watermark horizon)
    // must carry over so cross-boundary pairs form after the restart
    // without re-emitting run 1's pairs
    stage(ev.filter(col("ts_us") <= mid).drop("ts_us"), "h1")
    run()
    stage(ev.filter(col("ts_us") > mid).drop("ts_us"), "h2")
    run()
    val got = spark.read.parquet(sink)
      .select(col("c_user"), unix_micros(col("c_ts")).as("c_us"),
        unix_micros(col("p_ts")).as("p_us"), col("value"))
      .groupBy(col("c_user"), col("c_us"), col("p_us"), col("value"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_us"), col("value"))
    val expected = c.join(p, col("c_user") === col("p_user") &&
        col("p_us") >= col("c_us") && col("p_us") <= col("c_us") + lit(1800000000L))
      .groupBy(col("c_user"), col("c_us"), col("p_us"), col("value"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(expected.nonEmpty, "fixture produced no attributed pairs")
    assert(got == expected,
      s"pair multiset diverged: extra=${got -- expected}, missing=${expected -- got}")
  }

  test("streamAnnTopK resumes from checkpoint: per-batch serving, no loss, no re-serve") {
    import java.nio.file.{Files, Paths}
    val staticDir = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("graft_sann_src").toString
    val ckpt = Files.createTempDirectory("graft_sann_ckpt2").toString
    val out = Files.createTempDirectory("graft_sann_out2").toString
    val emb = operators.Tables.t(spark, staticDir, "embeddings")
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_sann_stage").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    def run(): Seq[Row] =
      operators.Streaming
        .streamAnnTopKCore(spark, staticDir, src, "*.parquet", out, ckpt)
        .collect().toSeq
    // the reference answer: the batch gate over the full query set —
    // per-query results are independent, so its query_id<5 slice is
    // exactly what serving the first request batch must produce
    val full = SparkEntry.queries("sim_ann_ivfpq_persisted")(spark, staticDir)
      .collect().toSeq
    assert(full.nonEmpty)
    // request batch 1: queries 0..4 arrive
    stage(emb.filter(col("vec_id") >= 0 && col("vec_id") < 5), "batch1")
    val after1 = run()
    assert(after1 == full.filter(_.getLong(0) < 5),
      "batch-1 serving diverged from the batch probe")
    // restart with NOTHING new: offsets must prevent re-serving
    val afterIdle = run()
    assert(afterIdle == after1,
      "an idle restart re-served batch 1 (offsets not honored)")
    // request batch 2 arrives; the restart serves ONLY batch 2 and the
    // union equals the batch gate over the full query set
    stage(emb.filter(col("vec_id") >= 5 && col("vec_id") < 10), "batch2")
    val after2 = run()
    assert(after2 == full,
      s"post-restart union diverged from the batch gate")
  }

  test("streamDailyDelta resumes from checkpoint: per-day manifests, no loss, no reprocess") {
    import java.nio.file.{Files, Paths}
    val staticDir = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("graft_sdd_src").toString
    val ckpt = Files.createTempDirectory("graft_sdd_ckpt2").toString
    val out = Files.createTempDirectory("graft_sdd_out2").toString
    val docs = operators.Tables.t(spark, staticDir, "documents")
    val deltaIds = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(deltaIds.length >= 4, "fixture delta too small to split")
    val mid = deltaIds(deltaIds.length / 2)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_sdd_stage").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    def run(): Seq[Row] =
      operators.Streaming
        .streamDailyDeltaCore(spark, staticDir, src, "*.parquet", out, ckpt)
        .collect().toSeq
    // day 1: the first half of the delta arrives
    stage(docs.filter(col("doc_id") % 5 === 0 && col("doc_id") < mid), "day1")
    val afterDay1 = run()
    val expectDay1 = operators.Pipeline.dailyDeltaFrom(spark, staticDir,
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") < mid))
      .collect().toSeq
    assert(expectDay1.nonEmpty)
    assert(afterDay1 == expectDay1,
      s"day-1 manifest diverged from the batch composition")
    // restart with NOTHING new: the checkpoint must prevent reprocessing
    val afterIdle = run()
    assert(afterIdle == afterDay1,
      "an idle restart re-emitted day-1 shards (offsets not honored)")
    // day 2 arrives; restart processes ONLY day 2, appending its manifest
    stage(docs.filter(col("doc_id") % 5 === 0 && col("doc_id") >= mid), "day2")
    val afterDay2 = run()
    val expectDay2 = operators.Pipeline.dailyDeltaFrom(spark, staticDir,
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") >= mid))
      .collect().toSeq
    // manifests are per-day: the union, not a re-pack of the total
    val expected = (expectDay1 ++ expectDay2)
      .sortBy(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    val gotSorted = afterDay2
      .sortBy(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(gotSorted == expected,
      s"post-restart manifests diverged: got=$gotSorted expected=$expected")
  }
}
