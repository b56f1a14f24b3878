package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable evidence for the scale techniques SCALE.md describes:
  * bucketing eliminates the join shuffle; salting splits a hot key
  * without changing results. Run at toy size — the PLAN SHAPE is the
  * assertion, and plan shape is scale-invariant. */
class ScaleTechniquesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse dir (./spark-warehouse, gitignored); tables
    // dropped in finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect() // force final plan under AQE
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"))
      // bucketed scan feeds the join directly: no shuffle under the join
      val shuffles = "Exchange hashpartitioning\\(\\w*[lo]_orderkey".r
        .findAllIn(plan).size
      assert(shuffles == 0, s"join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("AQE splits the skewed join partition (skew=true) with unchanged results") {
    // The OTHER skew tool beside salting: runtime skew-join splitting.
    // One key carries 90% of the left side; with low split thresholds
    // AQE must mark the SMJ skew=true (hot partition split into
    // multiple tasks) and the result must equal the analytic count.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows, 90% on key 0; right: 1k distinct keys
      val left = spark.range(0, 200000)
        .selectExpr("IF(id % 10 = 0, id, 0L) AS k", "id AS v")
      val right = spark.range(0, 1000).selectExpr("id AS rk")
      val joined = left.join(right, col("k") === col("rk"))
      val n = joined.collect().length.toLong // execute THIS plan (count() would plan its own)
      // 180,000 non-multiples of 10 land on k=0 (+ id=0 itself) plus
      // the 99 other multiples of 10 below 1000
      assert(n == 180100L, s"join row count changed under skew split: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dedup_minhash_lsh band join: AQE splits the hot band bucket end-to-end") {
    // The generic skew demo above proves the MECHANISM; this proves it
    // fires on THIS gate's pinned sort-merge band join. Fixture: half
    // the corpus is ONE identical document — identical shingles ⇒
    // identical MinHash signatures ⇒ all 400 land in the same 4 band
    // buckets, so those buckets hold ~100% of the candidate mass (the
    // worst real-world case: a viral boilerplate page). With split
    // thresholds lowered to toy scale, AQE must mark the band join
    // skew=true and the pair set must still be exactly the hot clique.
    import spark.implicits._
    val hotText = (1 to 16).map(i => s"boiler$i").mkString(" ")
    val docs = ((0 until 800).map(i => (i.toLong, hotText)) ++
      (800 until 900).map(i => (i.toLong,
        (1 to 16).map(k => s"u${i}w$k").mkString(" "))))
      .toDF("doc_id", "text")
    val fixDir = java.nio.file.Files.createTempDirectory("graft_skew_lsh").toString
    docs.repartition(8).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds sized for COMPRESSED shuffle bytes: the hot bucket's
      // rows are near-identical and lz4 shrinks them ~10×
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // 32 partitions, not the suite's 4: with only 4, each partition
      // absorbs one of the 4 hot band keys and they ALL look median —
      // the skew must be visible relative to typical partitions, as it
      // would be at production partition counts
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = SparkEntry.queries("dedup_minhash_lsh")(spark, fixDir)
      val rows = q.collect()
      // exactly the hot clique: C(800,2) pairs at est_jaccard 1.0; the
      // 100 unique docs bucket alone and pair with nobody
      assert(rows.length == 800 * 799 / 2,
        s"pair set changed under skew split: ${rows.length}")
      assert(rows.forall(_.getDouble(2) == 1.0))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot band bucket:\n${plan.take(2000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixDir))
    }
  }

  test("incremental dedup: bucketed digest corpus makes the daily join corpus-shuffle-free") {
    // SCALE.md's dedup_incremental scale note as proof: at 100 TB the
    // persisted "seen digests" table is bucketed on the digest so the
    // daily delta join never re-shuffles the corpus side. Persist the
    // corpus digests bucketed by h, run the delta classification
    // against the TABLE, and assert (a) the statuses equal the gate's
    // own in-memory form on the same data, (b) the corpus side of the
    // join has NO exchange — only the (small) delta side shuffles.
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS corpus_digests_b")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", md5(substring($"text", 1, 10)).as("h"))
    d.filter($"doc_id" % 5 =!= 0).select($"h").distinct()
      .write.bucketBy(8, "h").sortBy("h").mode("overwrite")
      .saveAsTable("corpus_digests_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = d.filter($"doc_id" % 5 === 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"h").orderBy($"doc_id")
      val viaTable = batch
        .join(spark.table("corpus_digests_b").withColumn("in_corpus", lit(1)),
          Seq("h"), "left")
        .withColumn("rk", row_number().over(w))
        .select($"doc_id",
          when($"in_corpus".isNotNull, lit("dup_corpus"))
            .when($"rk" > 1, lit("dup_batch"))
            .otherwise(lit("new")).as("status"))
        .orderBy($"doc_id")
      val expected = SparkEntry.queries("dedup_incremental")(spark, dir)
        .collect().map(_.toString).toSeq
      assert(viaTable.collect().map(_.toString).toSeq == expected,
        "bucketed-corpus classification diverged from the gate")
      // AdaptiveSparkPlan.toString prints Final AND Initial plans —
      // audit only the final one
      val plan = viaTable.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the corpus (bucketed) branch must read straight into the join;
      // exactly ONE h-exchange total — the batch/delta side's
      val hShuffles = "Exchange hashpartitioning\\(h".r.findAllIn(plan).size
      assert(hShuffles <= 1, s"corpus side re-shuffled on the digest:\n$plan")
      assert(plan.contains("Bucketed: true"), s"corpus scan not bucket-fed:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a bucket-fed SMJ:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS corpus_digests_b")
    }
  }

  test("dedup_ngram_jaccard (uncapped): AQE splits the hot-shingle bucket end-to-end") {
    // SCALE.md's backstop claim for the UNCAPPED Jaccard variant —
    // "AQE skew splitting remains the backstop" — as proof, mirroring
    // the LSH band-join case. Fixture: 400 docs share ONE hot shingle
    // ("the quick brown" prefix) and continue uniquely, 100 docs are
    // fully unique; the hot shingle's join bucket holds C(400,2)
    // intersections. With toy-scale split thresholds, AQE must mark
    // the merge-pinned self-join skew=true and the pair set must be
    // exactly the hot clique at jaccard 1/(3+3-1) = 0.2 (each hot doc
    // has 3 shingles, hot pairs share exactly the one).
    import spark.implicits._
    val docs = ((0 until 400).map(i =>
      (i.toLong, s"the quick brown u${i}a u${i}b")) ++
      (400 until 500).map(i =>
        (i.toLong, s"v${i}a v${i}b v${i}c v${i}d v${i}e")))
      .toDF("doc_id", "text")
    val fixDir = java.nio.file.Files.createTempDirectory("graft_skew_jac").toString
    docs.repartition(8).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = SparkEntry.queries("dedup_ngram_jaccard")(spark, fixDir)
      val rows = q.collect()
      assert(rows.length == 400 * 399 / 2,
        s"pair set changed under skew split: ${rows.length}")
      assert(rows.forall(_.getDouble(2) == 0.2),
        "hot pairs must score exactly 1/5")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot shingle bucket:\n${plan.take(2000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixDir))
    }
  }

  test("text_substring_dedup: hot boilerplate gram — linear occupancy, AQE split, exact runs") {
    // The operator's documented at-scale risk is the join back of
    // positions to the duplicated-gram set when one boilerplate gram
    // occurs everywhere. This join is NOT AQE-rescuable — the dup
    // side's final HashAggregate between its exchange and the join
    // breaks OptimizeSkewedJoin's pattern, and an explicit dup-side
    // repartition gets collapsed into the aggregate's exchange (both
    // verified by this test's earlier failures) — so the operator
    // SALTS the HOT TIER (r8 two-tier form): grams above HotGramCnt
    // occurrences ride a broadcast hot set, their positions carry
    // pmod(xxhash64(doc_id,pos),16) and the dup side explodes ×16;
    // the long tail joins on (gram, 0) unsalted — the 1M-doc soak
    // measured the blanket salt at 1.8× on skew-free corpora. This
    // fixture's shared gram (cnt=400 > 64) is hot, so the salted path
    // is what runs here. Exactness: each position matches exactly its
    // one salted copy. Fixture: 400 docs share ONE 8-gram prefix and
    // continue uniquely (each doc ⇒ exactly one duplicated position,
    // one run of length 1); 100 docs fully unique; forced SMJ (at
    // scale the dup set — the corpus's repeated vocabulary — is not
    // broadcastable). Results must be exactly the 400 one-position
    // runs and the join must be on the salted key.
    import spark.implicits._
    val docs = ((0 until 400).map(i =>
      (i.toLong, s"a b c d e f g h u${i}x u${i}y")) ++
      (400 until 500).map(i =>
        (i.toLong, (0 until 10).map(j => s"v${i}w$j").mkString(" "))))
      .toDF("doc_id", "text")
    val fixDir = java.nio.file.Files.createTempDirectory("graft_skew_substr").toString
    docs.repartition(8).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = SparkEntry.queries("text_substring_dedup")(spark, fixDir)
      val rows = q.collect()
      assert(rows.length == 400, s"expected the 400 hot docs, got ${rows.length}")
      assert(rows.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L &&
        r.getLong(3) == 1L),
        "every hot doc must report exactly one run of one position")
      val plan = q.queryExecution.executedPlan.toString
      val smjLine = plan.linesIterator
        .find(l => l.contains("SortMergeJoin") && l.contains("gram"))
        .getOrElse(fail(s"no gram SMJ in plan:\n${plan.take(2000)}"))
      assert(smjLine.contains("salt"),
        s"position→dup join must be salted, got: $smjLine")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixDir))
    }
  }

  test("text_chunk_dedup: hot-chunk fixture keeps the probe side shuffle-free") {
    // Boilerplate-skew end-to-end: every doc STARTS with the same
    // 3-word chunk (df = 2000) and continues uniquely. The r4 design
    // joins the probe side LEFT against the FILTERED boilerplate set
    // (df >= threshold — here exactly 1 chunk), which broadcasts at
    // any corpus size, so the Zipf-hot probe never shuffles on the
    // chunk key. (The unfiltered-df alternative would shuffle-join on
    // ck past the broadcast threshold, and that hot partition is NOT
    // AQE-splittable — the df aggregate's final HashAggregate between
    // its exchange and the join breaks OptimizeSkewedJoin's pattern.)
    import spark.implicits._
    val docs = (0 until 2000).map(i =>
      (i.toLong, s"the quick brown u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val fixDir = java.nio.file.Files.createTempDirectory("graft_skew_chunk").toString
    docs.repartition(8).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    try {
      val q = SparkEntry.queries("text_chunk_dedup")(spark, fixDir)
      val rows = q.collect()
      // every doc: 2 chunks, the hot one dropped, the unique one kept
      assert(rows.length == 2000)
      assert(rows.forall(r => r.getLong(1) == 2L && r.getLong(2) == 1L),
        "expected n_chunks=2, n_kept=1 for every doc")
      // AdaptiveSparkPlan.toString prints Final AND Initial plans —
      // audit only the final one
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("BroadcastHashJoin"),
        s"boilerplate set should broadcast:\n${plan.take(1500)}")
      // exactly ONE ck exchange — the df aggregate's own; the probe
      // side reaches the join straight from its explode projection
      val ckExchanges = "Exchange hashpartitioning\\(ck".r.findAllIn(plan).size
      assert(ckExchanges <= 1,
        s"probe side must not shuffle on the chunk key ($ckExchanges ck exchanges):\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixDir))
    }
  }

  test("runtime bloom filter prunes the big join side before the shuffle") {
    // Row-level runtime filtering: a selective filter on the small
    // side injects a bloom filter into the BIG side's scan, so rows
    // that cannot join die before the shuffle — at 100 TB this is
    // the difference between shuffling the corpus and shuffling the
    // matching slice. Thresholds lowered to engage at toy size.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(1200)}")
      // results are unchanged by the filter
      val n = joined.agg(org.apache.spark.sql.functions.sum(col("n"))).head.getLong(0)
      val expected = li.join(
        spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected, s"bloom filter changed the result: $n vs $expected")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join of a skewed key equals the plain join") {
    import spark.implicits._
    val Salt = 8
    // skewed fact: one hot key dominating
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong, i.toDouble))
      .toDF("key", "v")
    val dim = (1L to 5000L).map(k => (k, s"d$k")).toDF("key", "name")

    val plain = fact.join(dim, "key").groupBy("name")
      .agg(sum($"v").cast("decimal(18,1)").cast("double").as("s"))

    // salt: fact gets a random-ish (here deterministic) salt in [0,Salt);
    // dim is exploded Salt× so every salted key finds its match
    val saltedFact = fact.withColumn("salt", pmod($"v".cast("long"), lit(Salt)))
    val saltedDim = dim.withColumn("salt",
      explode(lit((0 until Salt).toArray)))
    val salted = saltedFact.join(saltedDim, Seq("key", "salt"))
      .groupBy("name").agg(sum($"v").cast("decimal(18,1)").cast("double").as("s"))

    val p = plain.orderBy("name").collect().toSeq
    val s = salted.orderBy("name").collect().toSeq
    assert(p == s)
  }

  test("q21_salted_agg: half-the-table hot key stays salt-bounded with exact parity") {
    // The salted aggregation's entire purpose is skew, but until r5 it
    // was only proven on uniform fixtures. Fixture: ONE event_type
    // holds 50% of all rows (the hot key). The two-stage form must
    //  (a) equal the unsalted single-stage aggregate bit-for-bit
    //      (DECIMAL partials are order-independent), and
    //  (b) shuffle raw rows ONLY on (event_type, salt) — the stage-1
    //      exchange — so no reducer receives the whole hot key; the
    //      stage-2 exchange on event_type alone carries ≤ 16 pre-
    //      aggregated rows per type, not data.
    import spark.implicits._
    val n = 4000
    val rows = (0 until n).map { i =>
      val etype = if (i % 2 == 0) "hot" else s"t${i % 7}"
      // user ids spread across salts (user_id % 16) as crawled ids do
      (i.toLong, i.toLong * 1_000_000_000L, i.toLong, etype, (i % 100) / 4.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val fixDir = java.nio.file.Files.createTempDirectory("graft_skew_salt").toString
    rows.repartition(8).write.mode("overwrite").parquet(s"$fixDir/events.parquet")
    try {
      val salted = SparkEntry.queries("q21_salted_agg")(spark, fixDir)
      val got = salted.collect().toSeq
      // unsalted single-stage twin (the oracle's shape) on the same data
      val expected = operators.Tables.events(spark, fixDir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy($"event_type").collect().toSeq
      assert(got == expected, "salted two-stage result diverged from unsalted")
      assert(got.exists(r => r.getString(0) == "hot" && r.getLong(1) == n / 2))
      // plan shape: the deepest (raw-row) exchange is on (event_type,
      // salt); the event_type-only exchange sits ABOVE it and receives
      // only stage-1 partials
      val p = salted.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val saltIdx = p.indexOf("Exchange hashpartitioning(event_type")
      assert(saltIdx >= 0 && p.substring(saltIdx).contains("salt"),
        s"stage-1 exchange must include the salt key:\n${p.take(2000)}")
      // the fixture's semantic bound: no (event_type, salt) group owns
      // more than ~1/16 of the hot key (this is what stage 1 ships to
      // any single reducer)
      val maxGroup = operators.Tables.events(spark, fixDir)
        .groupBy($"event_type", ($"user_id" % 16).as("salt"))
        .agg(count(lit(1)).as("c")).agg(max($"c")).head().getLong(0)
      assert(maxGroup <= (n / 2) / 16 * 2,
        s"salt failed to spread the hot key: max group $maxGroup")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixDir))
    }
  }

  test("stratified sample + source cap: one hot stratum, parity and one-shuffle plans") {
    // r5: the corpus-assembly windows proven on a skewed stratum — one
    // (lang, source) stratum (and one source) holds ~50% of the corpus.
    // text_stratified_sample's fraction keep needs the stratum count,
    // so its window is reducer-side by design; the scale contract is
    // (a) the answer matches an independent recompute, and (b) the
    // stratum shuffle happens ONCE (rank + count share the exchange)
    // and carries digests, not text. text_source_cap must additionally
    // keep its partial WindowGroupLimit below the exchange so the hot
    // source pre-filters map-side (pinned at uniform scale in
    // PlanAuditSpec; re-asserted here under skew).
    import spark.implicits._
    val n = 3000
    val docs = (0 until n).map { i =>
      val (lang, src) = if (i % 2 == 0) ("en", "web") else (s"l${i % 5}", s"s${i % 11}")
      (i.toLong, s"doc $i body w${i}a w${i}b", lang, src, 20L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val fixDir = java.nio.file.Files.createTempDirectory("graft_skew_strata").toString
    docs.repartition(8).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    try {
      val strat = SparkEntry.queries("text_stratified_sample")(spark, fixDir)
      val got = strat.collect().toSeq
      // independent recompute: per stratum keep rk*5 <= n+4 ranked by (md5, id)
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      val all = (0 until n).map { i =>
        val (lang, src) = if (i % 2 == 0) ("en", "web") else (s"l${i % 5}", s"s${i % 11}")
        (lang, src, i.toLong, md5hex(s"doc $i body w${i}a w${i}b"))
      }
      val expected = all.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((lang, src), m) =>
        val ranked = m.sortBy(t => (t._4, t._3)).zipWithIndex
        ranked.collect { case ((_, _, id, _), rk0) if (rk0 + 1) * 5 <= m.size + 4 =>
          (lang, src, id, (rk0 + 1).toLong, m.size.toLong)
        }
      }.sortBy(t => (t._1, t._2, t._4))
      assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))) == expected,
        "stratified sample diverged from recompute on the skewed corpus")
      // hot stratum kept exactly ceil(1500/5) = 300
      assert(got.count(r => r.getString(0) == "en" && r.getString(1) == "web") == 300)
      // ONE stratum exchange serves both windows (rank + count)
      val p = strat.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val stratumExchanges = "Exchange hashpartitioning\\(lang".r.findAllIn(p).size
      assert(stratumExchanges == 1,
        s"rank and count windows must share one stratum shuffle ($stratumExchanges):\n${p.take(2000)}")
      // source cap under the same skew: partial WindowGroupLimit below
      // the source exchange still present (map-side pre-filter of the
      // hot source), and the capped result is exact
      val cap = SparkEntry.queries("text_source_cap")(spark, fixDir)
      val capPlan = cap.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exIdx = capPlan.indexOf("Exchange hashpartitioning(source")
      assert(exIdx >= 0 && capPlan.indexOf("WindowGroupLimit", exIdx) >= 0,
        s"partial WindowGroupLimit must stay below the source exchange under skew:\n${capPlan.take(2000)}")
      cap.collect() // executes green on the skewed corpus
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixDir))
    }
  }

  test("fuzzy-join multi-probe: shifted block keys recover edits inside any one block") {
    // The text_fuzzy_join scale note as proof: a single block key
    // misses every match whose edit lands INSIDE the block segment;
    // OR-ing several shifted block segments (multi-probe) recovers
    // them — an edit localized to one segment leaves the others
    // intact — while staying equi-join-bounded (never all-pairs).
    // Fixture: 200 pseudo-random 45-char docs; each query is one doc
    // with ONE char edited, half inside block A (chars 5..24), half
    // inside block B (25..44). Ground truth = exact thresholded
    // all-pairs. Single probe on A finds only the A-intact half;
    // probing A ∪ B finds 100%.
    import spark.implicits._
    // the 5-digit id repeats through all 45 chars, so any two DISTINCT
    // docs differ in ≥1 char per 6-char repeat (≥7 total ≫ threshold 3)
    // while each query sits at distance exactly 1 from its source
    def text(i: Int): String =
      (("%05d".format(i) + "x") * 8).take(45)
    val corpus = (0 until 200).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    val queries = (0 until 200).map { i =>
      val t = text(i).toCharArray
      val pos = if (i % 2 == 0) 10 else 28 // inside A / inside B
      t(pos) = if (t(pos) == 'z') 'y' else 'z'
      (1000L + i, new String(t), i.toLong)
    }.toDF("q_id", "q_text", "src_id")

    def probe(df: org.apache.spark.sql.DataFrame, from: Int): org.apache.spark.sql.DataFrame =
      df.withColumn("block", substring(col(df.columns(1)), from, 20))
    val cA = probe(corpus, 5); val qA = probe(queries, 5)
    val cB = probe(corpus, 25); val qB = probe(queries, 25)
    def join(q: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      q.join(c, "block")
        .withColumn("dist", levenshtein(col("q_text"), col("text"), 3))
        .filter(col("dist").between(0, 3))
        .select(col("q_id"), col("doc_id"))
    val single = join(qA, cA).distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiDf = join(qA, cA).union(join(qB, cB)).distinct()
    val multi = multiDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth: thresholded all-pairs (fine at 200×200)
    val truth = queries.crossJoin(corpus)
      .withColumn("dist", levenshtein(col("q_text"), col("text"), 3))
      .filter(col("dist").between(0, 3))
      .select(col("q_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 200, s"each query should match exactly its source: ${truth.size}")
    assert(multi == truth, "multi-probe must reach 100% recall on single-segment edits")
    assert(single.size == 100 && single.subsetOf(truth),
      s"single probe should find exactly the A-intact half: ${single.size}")
    // candidate generation stays an equi-join union — never all-pairs
    val plan = multiDf.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"multi-probe must remain equi-join-bounded:\n$plan")
  }

  test("per-partition pre-cap then exact window equals the one-window source cap") {
    // The TextOps.textSourceCap scale note: a hot source with billions
    // of docs makes the single rank-window reducer the bottleneck.
    // Two-phase form — each map partition keeps its N smallest
    // (hash, id) locally (mapPartitions, no shuffle), THEN the exact
    // window runs over ≤ N×partitions survivors. Admissible because
    // the global N smallest are a subset of the union of per-partition
    // N smallest. Survivor sets must be identical.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val n = 7
    val docs = (1 to 4000).map { i =>
      (i.toLong, s"src${i % 3}", f"h${(i * 2654435761L) % 100000}%06d")
    }.toDF("doc_id", "source", "h").repartition(13)

    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    val exact = docs.withColumn("rk", row_number().over(w))
      .filter($"rk" <= n).select("source", "doc_id", "rk")

    val preCapped = docs.repartition(13) // arbitrary placement, NOT by source
      .mapPartitions { it =>
        // local top-N per source within this partition
        val bySrc = scala.collection.mutable.Map[String,
          scala.collection.mutable.PriorityQueue[(String, Long)]]()
        it.foreach { r =>
          val (id, src, h) = (r.getLong(0), r.getString(1), r.getString(2))
          val pq = bySrc.getOrElseUpdate(src,
            scala.collection.mutable.PriorityQueue.empty[(String, Long)])
          pq.enqueue((h, id)) // max-heap on (h, id): root = current worst
          if (pq.size > n) pq.dequeue()
        }
        bySrc.iterator.flatMap { case (src, pq) => pq.iterator.map(t => (t._2, src, t._1)) }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING))
      .toDF("doc_id", "source", "h")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= n).select("source", "doc_id", "rk")

    assert(exact.orderBy("source", "rk").collect().toSeq ==
      preCapped.orderBy("source", "rk").collect().toSeq)
  }

  test("degree-oriented triangles: a hot vertex centers zero wedges") {
    // SCALE.md's graph_triangles orientation note as proof (the
    // hot-shingle discipline applied to the graph family). Fixture: a
    // star with hub id 0 — the WORST case for id-ordered enumeration,
    // where the hub is the canonical minimum of every edge and wedges
    // at the hub number C(spokes, 2) ≈ 719k — plus a chain across the
    // first spokes so real triangles exist (hub, i, i+1). Degree
    // orientation must (a) produce exactly those triangle counts and
    // (b) generate only O(edges) wedge rows, because every spoke
    // orients INTO the high-degree hub, which therefore centers no
    // wedge at all.
    import spark.implicits._
    val spokes = 1200
    val chain = 10 // edges (i, i+1), i = 1..10 → triangles (0, i, i+1)
    val e = ((1 to spokes).map(i => (0L, i.toLong)) ++
      (1 to chain).map(i => (i.toLong, (i + 1).toLong)))
      .toDF("a", "b")
    val directed = graft.operators.Graph.orientByDegree(e)
    // every star edge points spoke → hub (deg 1..3 vs 1200)
    assert(directed.filter($"dst" === 0L).count() == spokes.toLong)
    assert(directed.filter($"src" === 0L).count() == 0L)
    val wedges = graft.operators.Graph.orientedWedges(directed)
    val nWedges = wedges.count()
    val idOrderedHubWedges = spokes.toLong * (spokes - 1) / 2
    assert(nWedges <= 2L * (spokes + chain),
      s"oriented wedge count $nWedges not linear in edges " +
        s"(id-ordered would center $idOrderedHubWedges at the hub)")
    val counts = graft.operators.Graph.trianglesFromEdges(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hub joins all 10 triangles; chain interior nodes join 2; ends 1
    assert(counts(0L) == chain.toLong, s"hub count: $counts")
    assert(counts(1L) == 1L && counts(chain.toLong + 1) == 1L)
    (2 to chain).foreach(i => assert(counts(i.toLong) == 2L, s"node $i"))
    assert(counts.values.sum == 3L * chain)
  }

  test("bucketed as-of: hot symbol parallelizes across time buckets, exact parity") {
    // The plain union-window as-of is serial within a symbol (one
    // task owns the symbol's whole history). effSpreadBucketed runs
    // the window per (symbol, time-bucket) with a tiny seed spine
    // carrying the standing quote across boundaries — the hot-symbol
    // parallelization. Fixture stresses every boundary case: one
    // symbol holds ~90% of events; quote-less buckets (the seed must
    // carry across them); quotes exactly ON bucket boundaries (must
    // override the seed at the same instant); trades before any quote
    // (dropped by both forms); trades at the same instant as a quote
    // (the quote prevails). Equality proof is against the PLAIN form
    // on the identical inputs — the two implementations cross-check.
    import spark.implicits._
    val W = 1000L // 1000 µs buckets → hundreds of buckets
    val rnd = new scala.util.Random(1234)
    def events(sym: String, n: Int): (Seq[(String, Long, Long)], Seq[(String, Long, Long)]) = {
      // quote instants are DISTINCT per symbol (two quotes at the same
      // µs have no defined winner — real feeds disambiguate with a
      // sequence number) but drawn from a W/4 grid so quotes land
      // exactly on bucket boundaries and collide with trade instants;
      // the sparse grid also leaves many buckets quote-less.
      // times straddle zero (offset by -n*3/2 grid steps): pre-epoch
      // timestamps exercise the FLOOR bucketing — truncate-toward-zero
      // division would misplace the seed row for negative buckets
      val off = (n * 3 / 2).toLong
      val qTimes = rnd.shuffle((0 until n * 3).toList).take(n)
        .map(m => (m.toLong - off) * (W / 4))
      val qs = qTimes.map(t => (sym, t, 800L + rnd.nextInt(50).toLong)) // mid8
      val ts = (1 to n / 3).map { _ =>
        val t = (rnd.nextInt(n * 3).toLong - off) * (W / 4)
        (sym, t, 790L + rnd.nextInt(60).toLong) // price8
      }
      (qs, ts)
    }
    val (hq, ht) = events("HOT", 3000)
    val colds = (1 to 5).map(i => events(s"C$i", 60))
    val quotes = (hq ++ colds.flatMap(_._1)).toDF("symbol", "t_us", "mid8")
    val trades = (ht ++ colds.flatMap(_._2)).toDF("symbol", "t_us", "price8")
    val plain = graft.operators.AlpacaQueries
      .effSpreadPlain(trades, quotes).collect().toSeq
    val bucketed = graft.operators.AlpacaQueries
      .effSpreadBucketed(trades, quotes, W).collect().toSeq
    assert(plain.nonEmpty, "fixture produced no attributed trades")
    assert(bucketed == plain,
      s"bucketed as-of diverged from plain:\n  plain=$plain\n  bucketed=$bucketed")
    // the parallelism claim: the hot symbol's events span many buckets,
    // so the per-(symbol, bucket) window has that many independent
    // partitions where the plain form has ONE
    val hotBuckets = quotes.filter($"symbol" === "HOT")
      .select(($"t_us" / W).cast("long")).distinct().count()
    assert(hotBuckets > 100, s"fixture too narrow: $hotBuckets buckets")

    // the TWA duration-stitching variant of the same technique, on the
    // same hostile fixture (hot symbol, epoch-straddling times, sparse
    // buckets): Σ spread·dur is grouping-invariant, so plain and
    // bucketed must agree bit-for-bit
    val spreads = quotes.withColumnRenamed("mid8", "spread4")
    val endUs = spreads.agg(max($"t_us")).head.getLong(0) + W
    val twaP = graft.operators.AlpacaQueries
      .twaPlain(spreads, endUs).collect().toSeq
    val twaB = graft.operators.AlpacaQueries
      .twaBucketed(spreads, endUs, W).collect().toSeq
    assert(twaP.nonEmpty && twaB == twaP,
      s"bucketed TWA diverged:\n  plain=$twaP\n  bucketed=$twaB")
  }
}
