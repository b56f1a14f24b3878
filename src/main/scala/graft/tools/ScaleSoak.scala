package graft.operators // package-scoped: drives the real private[operators] pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-slope soak for the dedup family, driving the REAL gate
  * pipelines (graft.operators.Dedup) over an amplified corpus written
  * to /tmp.
  *
  * Amplification: copy c suffixes every word with _c, so each copy is
  * a distinct sub-corpus whose internal near-dup structure is
  * isomorphic to the original's (disjoint shingle spaces across
  * copies). Near-dup pairs and duplicate-clique sizes grow linearly
  * with n, as in a real corpus — the timing slope isolates the
  * engine, not a quadratically-growing answer.
  *
  * Diagnostic main, not a gate: gates use the driver's testdata
  * verbatim; this synthesizes load from it purely to observe scaling.
  *
  * Usage: sbt -batch "runMain graft.operators.ScaleSoak [N]"  (default 20)
  */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    // targeted mode (r8): "substr N" soaks ONLY the two
    // candidate-set-driven operators SCALE.md flags — the salted
    // substring dedup and the bloom decontam — up to ×N (N=200 ⇒ 1M
    // docs), to measure whether their growth stays linear once the
    // duplicated-gram population is millions, not thousands.
    if (args.headOption.contains("substr")) { substrSoak(args); return }
    // "dedupprod N": production-constant MinHash (128 perms, b=16) —
    // pairs, CC keep-map, incremental probe — slopes on record
    // (VERDICT r8 next #4)
    if (args.headOption.contains("dedupprod")) { dedupProdSoak(args); return }
    // "ann768 N": the production-dim retrieval stack's scaling —
    // encode + route + ADC + re-rank at 768 dims over an amplified
    // corpus (vectors, not docs, are the axis here)
    if (args.headOption.contains("ann768")) { ann768Soak(args); return }
    // "semdedup N": cell-blocked SemDeDup pair generation at 768 dims
    // — compared-pairs slope + wall-clock under two cell sizings
    // (VERDICT r9 next #7)
    if (args.headOption.contains("semdedup")) { semDedupSoak(args); return }
    // "dpp [nSym] [keep]": quantify runtime partition pruning on the
    // connector — an nSym-symbol bars scan joined to a keep-symbol
    // watchlist, HTTP request counts measured with DPP on vs off
    if (args.headOption.contains("dpp")) { dppProbe(args); return }
    // "zorder [N]": the distributed global rank vs the partitionless
    // window at ×N amplified orders — both compute the identical
    // Z-order block envelopes; only the rank machinery differs
    if (args.headOption.contains("zorder")) { zorderProbe(args); return }
    // "pack [N]": the r11 distributed token-prefix vs the per-source
    // sequential window, under TOTAL source skew (one source holds
    // every doc — the 100 TB funnel) at ×N amplified documents
    if (args.headOption.contains("pack")) { packSoak(args); return }
    // "ccadv [N]": star-contraction rounds vs component height on
    // adversarial chain/star/clique-mix graphs at 100k+ nodes
    // (VERDICT r10 next #4)
    if (args.headOption.contains("ccadv")) { ccAdversarialSoak(args); return }
    // "packwidth [N]": the r12 bucket-width helper under a SPARSE,
    // skewed id allocation (ids span ~10⁹) — subtotal-frame size with
    // the derived width vs the legacy fixed 256 (VERDICT r11 next #5)
    if (args.headOption.contains("packwidth")) { packWidthSoak(args); return }
    // "bandindex": persisted-corpus-index probe (VERDICT r12 next #3)
    // — one-time build cost vs per-probe cost at two delta sizes vs
    // the old per-run re-derivation, at sf0.1
    if (args.headOption.contains("bandindex")) { bandIndexSoak(args); return }
    // "shufflebytes [N]": the r13 shingle-floor shuffle-byte claim,
    // verified with BYTES at an amplified SF (VERDICT r13 next #5) —
    // the floor moves raw text (~0.6 KB/doc) through its exchange
    // where the no-floor plan's aggregation exchange moves 128-long
    // signature partials; this measures both, not arithmetic
    if (args.headOption.contains("shufflebytes")) { shuffleBytesSoak(args); return }
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def amplify(n: Int): String = {
      val dir = s"/tmp/graft_soak/x$n"
      base.crossJoin(spark.range(n).toDF("copy"))
        .select(($"doc_id" * n + $"copy").as("doc_id"),
          when($"copy" === 0, $"text").otherwise(
            array_join(transform(split($"text", " "),
              w => concat(w, lit("_"), $"copy")), " ")).as("text"),
          $"lang", $"source", $"n_chars")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    def timeIt(df: => DataFrame): (Double, Long) = {
      // untimed GC: earlier workloads' promoted garbage otherwise gets
      // collected DURING later ones' timing (the Bench lesson — one
      // polluted sweep showed 30× outliers on the big-n points)
      System.gc()
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val baseEmb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    /** Copy c multiplies every element by a copy-seeded ±1 sign
      * vector: cos(s∘a, s∘b) = cos(a, b) exactly (each term carries
      * sᵢ² = 1), so WITHIN-copy near-dup structure is bit-preserved,
      * while cross-copy cosines decorrelate (random sign agreement).
      * Near-dup cliques stay constant-size ⇒ linear answer. */
    def amplifyEmb(n: Int): String = {
      val dir = s"/tmp/graft_soak/emb_x$n"
      baseEmb.crossJoin(spark.range(n).toDF("copy"))
        .select(($"vec_id" * n + $"copy").as("vec_id"),
          when($"copy" === 0, $"embedding").otherwise(
            expr("transform(embedding, (x, i) -> " +
              "CAST(x * IF(pmod(hash(copy, i), 2) = 0, 1.0D, -1.0D) AS FLOAT))"))
            .as("embedding"),
          $"label")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    // warm codegen once
    locally {
      val d1 = amplify(1); timeIt(Dedup.dedupMinhashLsh(spark, d1))
      val e1 = amplifyEmb(1); timeIt(Similarity.simEmbNearDup(spark, e1))
    }

    Seq(1, math.max(2, factor / 2), factor).foreach { n =>
      val dir = amplify(n)
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val (tE, ne) = timeIt(Dedup.dedupExact(spark, dir))
      val (tM, nm) = timeIt(Dedup.dedupMinhashLsh(spark, dir))
      val (tL, nl) = timeIt(TextOps.textLmScore(spark, dir))
      val (tD, nd) = timeIt(TextOps.textNgramDecontam(spark, dir))
      val edir = amplifyEmb(n)
      val vecs = spark.read.parquet(s"$edir/embeddings.parquet").count()
      val (tS, ns) = timeIt(Similarity.simEmbNearDup(spark, edir))
      // r3 late additions: suffixed copies keep prefix buckets and
      // posting lists constant-size and decorrelate cross-copy
      // cosines, so all three answers grow linearly too
      val (tT, nt) = timeIt(Graph.triangles(spark, dir))
      val (tI, ni) = timeIt(TextOps.textInvertedIndex(spark, dir))
      val (tK, nk) = timeIt(Similarity.simKmeans(spark, edir))
      // r4: the two-level hot-chunk aggregation — suffixed copies keep
      // per-copy chunk structure (df counts constant per copy), so the
      // answer and the work both grow linearly
      val (tC, ncd) = timeIt(TextOps.textChunkDedup(spark, dir))
      // r5: the capped DSIR filter — amplified copies Zipf-flatten the
      // bigram distribution but the top-V caps bound BOTH broadcast
      // models by construction, so the scoring pass must stay linear
      val (tF, nf) = timeIt(TextOps.textDsirFilter(spark, dir))
      // r5 continuation: bloom decontam — the FIXED-capacity filter
      // saturates as amplified test grams exceed it, so the timing
      // should degrade TOWARD the plain-join decontam cost and never
      // past it (graceful degradation measured, not asserted);
      // substring spans — disjoint per-copy gram spaces keep the
      // duplicated-run answer linear
      val (tB, nb) = timeIt(TextOps.textBloomDecontam(spark, dir))
      val (tU, nu) = timeIt(TextOps.textSubstringDedup(spark, dir))
      // r5 continuation: incremental minhash (band probe linear in
      // the delta) and PQ (encode + ADC — fixed codebook/LUT sizes,
      // so the only linear term is the corpus scan)
      val (tIM, nim) = timeIt(Dedup.dedupIncrementalMinhash(spark, dir))
      val (tPQ, npq) = timeIt(Similarity.simAnnPq(spark, edir))
      println(f"SOAK_SUMMARY n=$n docs=$docs exact=$tE%.2f s ($ne groups) " +
        f"minhash=$tM%.2f s ($nm pairs) lm=$tL%.2f s ($nl docs) " +
        f"decontam=$tD%.2f s ($nd docs) | vecs=$vecs embNearDup=$tS%.2f s ($ns pairs) " +
        f"| triangles=$tT%.2f s ($nt nodes) invIndex=$tI%.2f s ($ni terms) " +
        f"kmeans=$tK%.2f s ($nk clusters) chunkDedup=$tC%.2f s ($ncd docs) " +
        f"dsir=$tF%.2f s ($nf kept) bloomDecontam=$tB%.2f s ($nb docs) " +
        f"substrSpans=$tU%.2f s ($nu docs) incMinhash=$tIM%.2f s ($nim docs) " +
        f"pq=$tPQ%.2f s ($npq rows)")
    }

    // SemDeDup with the gate's FIXED K=8 centroids is deliberately
    // soaked only to ×4: cells grow linearly with the corpus, so the
    // within-cell pair join is quadratic in n — the measured blow-up
    // below is the evidence for the documented scale rule that K must
    // grow ~√N (cells stay bounded ⇒ pairs stay linear).
    Seq(1, 2, 4).foreach { n =>
      val edir = amplifyEmb(n)
      val vecs = spark.read.parquet(s"$edir/embeddings.parquet").count()
      val (tC, nc) = timeIt(Similarity.simSemanticDedup(spark, edir))
      println(f"SOAK_SEMDEDUP n=$n vecs=$vecs fixedK8=$tC%.2f s ($nc kept)")
    }

    // r6: plain vs bucketed as-of under TOTAL symbol skew — one
    // symbol holds every event, so the plain union-window runs its
    // whole history in ONE task while the bucketed form spreads it
    // across (symbol, time-bucket) partitions. Work is linear in both;
    // the wall-clock gap on local[32] is the parallelism evidence.
    // Materialized to parquet first so neither side pays range()
    // generation inside its timing.
    def asofFixture(n: Int): (DataFrame, DataFrame) = {
      val events = 200000L * n
      val dir = s"/tmp/graft_soak/asof_x$n"
      spark.range(events).select(
        lit("HOT").as("symbol"), (col("id") * 250L).as("t_us"),
        (lit(800L) + pmod(col("id"), lit(50L))).as("mid8"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/quotes.parquet")
      spark.range(events / 4).select(
        lit("HOT").as("symbol"), (col("id") * 1000L + 125L).as("t_us"),
        (lit(790L) + pmod(col("id"), lit(60L))).as("price8"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/trades.parquet")
      (spark.read.parquet(s"$dir/trades.parquet"),
        spark.read.parquet(s"$dir/quotes.parquet"))
    }
    Seq(1, factor / 2, factor).foreach { n =>
      val (tr, qu) = asofFixture(n)
      val w = 200000L // 0.2 s buckets → ~250·n buckets for the hot symbol
      val (tP, rp) = timeIt(AlpacaQueries.effSpreadPlain(tr, qu))
      val (tB2, rb) = timeIt(AlpacaQueries.effSpreadBucketed(tr, qu, w))
      require(rp == rb, s"plain/bucketed row counts diverged: $rp vs $rb")
      // untimed VALUE equality (counts alone can't see a wrong mid)
      val pv = AlpacaQueries.effSpreadPlain(tr, qu).collect().toSeq
      val bv = AlpacaQueries.effSpreadBucketed(tr, qu, w).collect().toSeq
      require(pv == bv, s"plain/bucketed values diverged: $pv vs $bv")
      println(f"SOAK_ASOF n=$n quotes=${200000L * n} plain=$tP%.2f s " +
        f"bucketed=$tB2%.2f s (rows=$rp)")
    }

    // r7: plain vs bucketed Lee-Ready under the same TOTAL symbol
    // skew — the three-carry operator (mid, previous price, standing
    // direction) must spread one symbol's prints across time buckets
    // exactly like the single-carry as-of does. Prices run in
    // constant-price triples ((id div 3) cycles) so zero-tick carries
    // cross bucket boundaries constantly — the hostile path, soaked
    // at volume. Value equality required at every point.
    def lrFixture(n: Int): (DataFrame, DataFrame) = {
      val events = 200000L * n
      val dir = s"/tmp/graft_soak/lr_x$n"
      spark.range(events).select(
        lit("HOT").as("symbol"), (col("id") * 250L).as("t_us"),
        (lit(800L) + pmod(col("id"), lit(50L))).as("mid8"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/quotes.parquet")
      spark.range(events / 4).select(
        lit("HOT").as("symbol"), (col("id") * 1000L + 125L).as("t_us"),
        // integer DIV, not Column./ (which is floating division and
        // would dissolve the constant-price triples into a strict ramp
        // — no zero ticks, no boundary carries, nothing to stress)
        (lit(790L) + pmod(expr("id DIV 3"), lit(60L))).as("price8"),
        (lit(100L) + pmod(col("id"), lit(9L))).as("size"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/trades.parquet")
      (spark.read.parquet(s"$dir/trades.parquet"),
        spark.read.parquet(s"$dir/quotes.parquet"))
    }
    // noop-write timing, NOT count(): count() after groupBy(symbol)
    // lets Catalyst prune every aggregate expression and with them the
    // windows — the first sweep "measured" the plain form at a flat
    // 0.4 s regardless of volume. The noop sink forces the full plan.
    def timeWrite(df: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(1, factor / 2, factor).foreach { n =>
      val (tr, qu) = lrFixture(n)
      val w = 200000L // 0.2 s buckets, as the as-of soak
      val tP = timeWrite(Microstructure.leeReadyCore(tr, qu))
      val tB2 = timeWrite(Microstructure.leeReadyBucketedCore(tr, qu, w))
      val pv = Microstructure.leeReadyCore(tr, qu).collect().toSeq
      val bv = Microstructure.leeReadyBucketedCore(tr, qu, w).collect().toSeq
      require(pv == bv, s"plain/bucketed values diverged: $pv vs $bv")
      println(f"SOAK_LEEREADY n=$n trades=${50000L * n} plain=$tP%.2f s " +
        f"bucketed=$tB2%.2f s (rows=${pv.size})")
    }
    spark.stop()
  }

  /** r8: production-dim ANN scaling — sim_ann_ivfpq_768 and the
    * recall curve over sign-flip-amplified corpora (the flip changes
    * the 768-dim geometry freely; only wall-clock is measured). The
    * structural claim under test: nothing in the stack scales with
    * Dim×N beyond the one encode pass — routing/ADC move integer code
    * rows and the re-rank touches ≤ cand×|Q| vectors. */
  /** Watchlist-join pruning, measured: scan nSym symbols, join a
    * keep-symbol watchlist (read from parquet with a filter so the
    * PartitionPruning rule sees a selective dim side), count HTTP
    * requests at the stub with runtime filtering ON vs OFF. The ON
    * run must issue ~keep/nSym of the OFF run's requests — the
    * 10k-symbol-universe × 50-symbol-watchlist contract stated in
    * AlpacaScan's Scaladoc, observed instead of asserted. */
  /** The q65 rank upgrade, measured: identical Z-order block
    * envelopes computed two ways over ×N amplified orders —
    * `Ranks.globalRowNumber` (monotone z-bucket + broadcast prefix
    * offsets) vs the partitionless `row_number()` window
    * (single-partition sort). Results must be identical; the window
    * path's wall time is the cost of the one-task sort every naive
    * global-rank query pays at scale. */
  private def zorderProbe(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val nBase = src.count()
    val dir = "/tmp/graft_soak/zorder_orders"
    // key-shift replication keeps o_orderkey unique (the rank's
    // total-order requirement) while spreading x/y buckets
    src.crossJoin(spark.range(factor).select(col("id").as("rep")))
      .select((col("o_orderkey") * factor + col("rep")).as("o_orderkey"),
        (col("o_custkey") + col("rep") * 37).as("o_custkey"),
        col("o_orderdate"))
      .write.mode("overwrite").parquet(dir)
    val zExpr = (0 until 8).map { i =>
      s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" + ")
    def dims = spark.read.parquet(dir)
      .select(col("o_orderkey"),
        (col("o_custkey") % 256).cast("int").as("x"),
        (datediff(col("o_orderdate"),
          to_date(lit("1992-01-01"))) % 256).cast("int").as("y"))
      .withColumn("z", expr(zExpr))
    def envelopes(ranked: org.apache.spark.sql.DataFrame) = ranked
      .withColumn("blk", ((col("rn") - 1) / 500000).cast("long"))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .orderBy(col("blk")).collect().toSeq
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths at factor 1 scale, uncounted
    envelopes(graft.operators.Ranks.globalRowNumber(
      dims.limit(1000), expr("z div 256"), "rn", col("z"), col("o_orderkey")))
    val (distRes, tDist) = time(envelopes(graft.operators.Ranks
      .globalRowNumber(dims, expr("z div 256"), "rn",
        col("z"), col("o_orderkey"))))
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("z"), col("o_orderkey"))
    val (winRes, tWin) = time(envelopes(
      dims.withColumn("rn", row_number().over(wAll).cast("long"))))
    require(distRes == winRes,
      s"rank paths disagree: ${distRes.take(2)} vs ${winRes.take(2)}")
    println(f"ZORDER_SUMMARY rows=${nBase * factor} " +
      f"distributed_rank=$tDist%.2f s single_partition_window=$tWin%.2f s " +
      f"(${tWin / math.max(1e-9, tDist)}%.1fx) blocks=${distRes.size}")
    spark.stop()
  }

  private def dppProbe(args: Array[String]): Unit = {
    val nSym = args.lift(1).map(_.toInt).getOrElse(100)
    val keep = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val wlDir = "/tmp/graft_soak/watchlist"
    (0 until nSym).map(i => (f"DPPS$i%04d", i)).toDF("symbol", "rank")
      .write.mode("overwrite").parquet(wlDir)
    def run(enabled: Boolean): (Long, Double, Long) = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
        enabled.toString)
      val scan = spark.read.format("Alpaca_Stocks_Bars").options(Map(
        "endpoint" -> graft.stub.AlpacaStubServer.endpoint,
        "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
        "symbols" -> (0 until nSym).map(i => f"DPPS$i%04d").mkString(","),
        "timeframe" -> "1Hour",
        "start" -> "2021-01-04T00:00:00Z",
        "end" -> "2021-01-06T00:00:00Z")).load()
      val watch = spark.read.parquet(wlDir)
        .filter($"rank" < keep).select($"symbol")
      val before = graft.stub.AlpacaStubServer.requestsServed
      val t0 = System.nanoTime()
      val rows = scan.join(watch, Seq("symbol"))
        .groupBy($"symbol").agg(count(lit(1)).as("n")).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      (graft.stub.AlpacaStubServer.requestsServed - before, secs,
        rows.map(_.getLong(1)).sum)
    }
    run(enabled = true) // warm codegen/stub paths, uncounted
    val (reqOn, tOn, rowsOn) = run(enabled = true)
    val (reqOff, tOff, rowsOff) = run(enabled = false)
    require(rowsOn == rowsOff, s"DPP changed results: $rowsOn vs $rowsOff")
    println(f"DPP_SUMMARY nSym=$nSym keep=$keep " +
      f"requests_on=$reqOn requests_off=$reqOff " +
      f"(${reqOff.toDouble / math.max(1, reqOn)}%.1fx fewer) " +
      f"time_on=$tOn%.2f s time_off=$tOff%.2f s rows=$rowsOn")
    spark.stop()
    // the in-process stub's handler pool is non-daemon — without an
    // explicit stop + exit the probe JVM outlives its last print
    graft.stub.AlpacaStubServer.stop()
    sys.exit(0)
  }

  /** SemDeDup pair-generation scaling (VERDICT r9 next #7): the
    * cell-blocked comparison at 10k/25k/50k vectors under BOTH cell
    * sizings — nlistFor's √N rule (cells grow as √N ⇒ pairs ≈
    * N·√N/2, sub-quadratic) and the SemDeDup-native constant-B rule
    * nlist = N/B (B pinned ⇒ pairs ≈ N·B/2, LINEAR — the sizing a
    * 100 TB dedup ships). Records compared pairs (Σ n_pairs over the
    * per-cell audit) next to wall-clock so the slope is measured, not
    * asserted. */
  private def semDedupSoak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(25)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val baseEmb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def amplifyEmb(n: Int): String = {
      val dir = s"/tmp/graft_soak/emb_x$n"
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
        baseEmb.crossJoin(spark.range(n).toDF("copy"))
          .select(($"vec_id" * n + $"copy").as("vec_id"),
            when($"copy" === 0, $"embedding").otherwise(
              expr("transform(embedding, (x, i) -> " +
                "CAST(x * IF(pmod(hash(copy, i), 2) = 0, 1.0D, -1.0D) AS FLOAT))"))
              .as("embedding"),
            $"label")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      dir
    }
    val TargetB = 64 // constant-B sizing: nlist = max(16, N/B)
    def runOnce(dir: String, nlist: Int): (Double, Long, Long, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val agg = Similarity.semanticDedup768Core(spark, dir, nlist)
        .agg(sum(col("n_pairs")).as("pairs"),
          sum(col("n_neardup")).as("neardup"),
          count(lit(1)).as("cells")).collect()(0)
      ((System.nanoTime() - t0) / 1e9,
        agg.getLong(0), agg.getLong(1), agg.getLong(2))
    }
    locally { val d = amplifyEmb(1); runOnce(d, 16) } // warm, uncounted
    Seq(5, math.max(6, factor / 2), factor).distinct.sorted.foreach { n =>
      val dir = amplifyEmb(n)
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val nlSqrt = Similarity.nlistFor(vecs)
      val nlConstB = math.max(16, (vecs / TargetB).toInt)
      val (tS, pS, dS, cS) = runOnce(dir, nlSqrt)
      val (tB, pB, dB, cB) = runOnce(dir, nlConstB)
      println(f"SOAK_SEMDEDUP n=$n vecs=$vecs | sqrtN nlist=$nlSqrt: " +
        f"t=$tS%.2f s pairs=$pS neardup=$dS cells=$cS | " +
        f"constB nlist=$nlConstB: t=$tB%.2f s pairs=$pB neardup=$dB cells=$cB")
    }
    spark.stop()
  }

  private def ann768Soak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val baseEmb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def amplifyEmb(n: Int): String = {
      val dir = s"/tmp/graft_soak/emb_x$n"
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
        baseEmb.crossJoin(spark.range(n).toDF("copy"))
          .select(($"vec_id" * n + $"copy").as("vec_id"),
            when($"copy" === 0, $"embedding").otherwise(
              expr("transform(embedding, (x, i) -> " +
                "CAST(x * IF(pmod(hash(copy, i), 2) = 0, 1.0D, -1.0D) AS FLOAT))"))
              .as("embedding"),
            $"label")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      dir
    }
    def timeIt(df: => DataFrame): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    locally { val d = amplifyEmb(1); timeIt(Similarity.simAnnIvfPq768(spark, d)) }
    // r9 points: 2k → 10k → 20k → 50k vectors. The r8 finding was
    // above-linear per-query growth 10k→20k at FIXED nlist=16; the √N
    // rule (nlistFor) must flatten the query phase — build and query
    // are timed separately because build is N·nlist and amortized.
    Seq(1, 5, math.max(2, factor / 2), factor).distinct.sorted.foreach { n =>
      val dir = amplifyEmb(n)
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(sum(expr("aggregate(embedding, 0.0D, (a, x) -> a + x)"))).collect()
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val (tI, ni) = timeIt(Similarity.simAnnIvfPq768(spark, dir))
      val (tC, nc) = timeIt(Similarity.simAnnRecallCurve768(spark, dir))
      val nl = Similarity.nlistFor(vecs)
      val t0f = System.nanoTime()
      val idxFixed = Similarity.buildIvf768(spark, dir, 16)
      val buildF = (System.nanoTime() - t0f) / 1e9
      val (qF, nF) = timeIt(Similarity.queryIvf768(idxFixed, 4))
      val t0s = System.nanoTime()
      val idxScaled = Similarity.buildIvf768(spark, dir, nl)
      val buildS = (System.nanoTime() - t0s) / 1e9
      val (qS, nS) = timeIt(Similarity.queryIvf768(idxScaled, 4))
      println(f"SOAK_ANN768 n=$n vecs=$vecs ivfpq768=$tI%.2f s ($ni rows) " +
        f"recall_curve=$tC%.2f s ($nc rows) | prod nlist16: build=$buildF%.2f " +
        f"query=$qF%.2f ($nF rows) | prod nlist=$nl: build=$buildS%.2f " +
        f"query=$qS%.2f ($nS rows)")
    }
    spark.stop()
  }

  /** r8 targeted soak: substring-dedup + bloom-decontam growth to 1M
    * docs (×200 amplification of sf0.1's 5k). Same amplification as
    * the main soak — per-copy word suffixes keep gram spaces disjoint
    * across copies, so the duplicated-run ANSWER grows linearly and
    * any super-linear wall-clock is the engine's, not the fixture's.
    * Also times the UNSALTED join-back variant at each point so the
    * ×$SubstrSalt salt's cost (and its skew protection) is a measured
    * number, not a guess. */
  /** Production-constant MinHash slopes: amplified copies carry
    * per-copy word suffixes (disjoint shingle spaces), so the true
    * near-dup structure — and thus the ANSWER — grows linearly with
    * ×N; any super-linear wall-clock is the engine's. The 128-perm
    * signature aggregation is the dominant linear term (128 LONG
    * mins per shingle row); the band self-join stays pair-bounded. */
  private def dedupProdSoak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def amplify(n: Int): String = {
      val dir = s"/tmp/graft_soak/x$n"
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
        base.crossJoin(spark.range(n).toDF("copy"))
          .select(($"doc_id" * n + $"copy").as("doc_id"),
            when($"copy" === 0, $"text").otherwise(
              array_join(transform(split($"text", " "),
                w => concat(w, lit("_"), $"copy")), " ")).as("text"),
            $"lang", $"source", $"n_chars")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      dir
    }
    def timeIt(df: => DataFrame): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    locally { val d = amplify(1); timeIt(Dedup.dedupMinhashProd(spark, d)) }
    Seq(1, math.max(2, factor / 2), factor).distinct.sorted.foreach { n =>
      val dir = amplify(n)
      spark.read.parquet(s"$dir/documents.parquet")
        .select(sum(length(col("text")))).collect()
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val (tP, np) = timeIt(Dedup.dedupMinhashProd(spark, dir))
      val (tC, nc) = timeIt(Dedup.dedupClustersProd(spark, dir))
      val ccRounds = Dedup.lastCcRounds
      val (tI, ni) = timeIt(Dedup.dedupIncrementalMinhashProd(spark, dir))
      println(f"SOAK_DEDUPPROD n=$n docs=$docs pairs=$tP%.2f s ($np pairs) " +
        f"clusters=$tC%.2f s ($nc docs, $ccRounds star rounds) " +
        f"incremental=$tI%.2f s ($ni docs)")
    }
    spark.stop()
  }

  /** VERDICT r13 next #5: the shingle-floor shuffle-byte accounting,
    * measured instead of asserted. Runs the 128-perm signature stage
    * (shingle → md5 halves → 128 min()s) over an amplified corpus two
    * ways — WITH the r13 parallelism-floor repartition below the scan
    * (one exchange carrying raw text, the aggregation absorbed into
    * its partitioning) and WITHOUT it (partial aggregation, then an
    * exchange carrying per-partition 128-long signature partials) —
    * and reports each run's total shuffle bytes/records written from
    * the task metrics. */
  private def shuffleBytesSoak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def amplify(n: Int): String = {
      val dir = s"/tmp/graft_soak/x$n"
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
        base.crossJoin(spark.range(n).toDF("copy"))
          .select(($"doc_id" * n + $"copy").as("doc_id"),
            when($"copy" === 0, $"text").otherwise(
              array_join(transform(split($"text", " "),
                w => concat(w, lit("_"), $"copy")), " ")).as("text"),
            $"lang", $"source", $"n_chars")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      dir
    }
    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    val shufRecs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            ()
          }
        }
      })
    def noFloorShingles(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
          .as("shingle"))
    def run(label: String, df: => DataFrame, docs: Long, n: Int): Unit = {
      System.gc()
      val b0 = shufBytes.get(); val r0 = shufRecs.get()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // listener drain
      val secs = (System.nanoTime() - t0) / 1e9
      val mb = (shufBytes.get() - b0) / 1048576.0
      val kbPerDoc = (shufBytes.get() - b0) / 1024.0 / docs
      println(f"SOAK_SHUFFLEBYTES n=$n docs=$docs $label: $secs%.2f s " +
        f"shuffleWrite=$mb%.1f MB (${shufRecs.get() - r0} records, " +
        f"$kbPerDoc%.2f KB/doc)")
    }
    // warm codegen/JIT on the small corpus before the measured points
    locally { val d = amplify(1)
      val docs = spark.read.parquet(s"$d/documents.parquet").count()
      run("warmup_floor", Dedup.prodSigDfFrom(
        Dedup.shingleDfFrom(spark.read.parquet(s"$d/documents.parquet"))),
        docs, 1) }
    Seq(1, factor).distinct.foreach { n =>
      val dir = amplify(n)
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      run("floor", Dedup.prodSigDfFrom(Dedup.shingleDfFrom(
        spark.read.parquet(s"$dir/documents.parquet"))), docs, n)
      run("nofloor", Dedup.prodSigDfFrom(noFloorShingles(dir)), docs, n)
    }
    spark.stop()
  }

  /** The r11 packing fix, measured (VERDICT r10 next #1 "Done"
    * clause): one source holds EVERY document — the shape where the
    * per-source window is a single task no matter the cluster — and
    * the corpus grows ×N. Both paths compute identical sequences
    * (value equality required at every point); the record is the
    * wall-clock of the sequential window vs the bucketed prefix as
    * the one source grows. Flatness claim: the prod path's time per
    * input row stays ~constant (32-way parallel local cumsums +
    * a subtotal agg), while the window path's is one core's
    * throughput end to end. */
  private def packSoak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def amplifyHot(n: Int): String = {
      val dir = s"/tmp/graft_soak/pack_x$n"
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
        base.crossJoin(spark.range(n).toDF("copy"))
          .select(($"doc_id" * n + $"copy").as("doc_id"), $"text",
            $"lang", lit("hot").as("source"), $"n_chars")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      dir
    }
    def timeNoop(df: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    locally { // warm codegen, uncounted
      val d = amplifyHot(1)
      timeNoop(TextOps.textSeqPack(spark, d))
      timeNoop(TextOps.textSeqPackProd(spark, d))
    }
    Seq(1, math.max(2, factor / 4), math.max(4, factor / 2), factor)
      .distinct.sorted.foreach { n =>
        val dir = amplifyHot(n)
        // untimed warm read (page cache) before timing either path
        spark.read.parquet(s"$dir/documents.parquet")
          .select(sum(length(col("text")))).collect()
        val docs = spark.read.parquet(s"$dir/documents.parquet").count()
        val tWin = timeNoop(TextOps.textSeqPack(spark, dir))
        val tProd = timeNoop(TextOps.textSeqPackProd(spark, dir))
        // value equality, untimed — counts alone can't see a wrong cum
        val a = TextOps.textSeqPack(spark, dir).collect().toSeq
        val b = TextOps.textSeqPackProd(spark, dir).collect().toSeq
        require(a == b, s"window/prod packings diverged at n=$n")
        println(f"SOAK_PACK n=$n docs=$docs window=$tWin%.2f s " +
          f"prod=$tProd%.2f s (${tWin / math.max(1e-9, tProd)}%.1fx) " +
          f"seqs=${a.size} us_per_doc_window=${tWin * 1e6 / docs}%.1f " +
          f"us_per_doc_prod=${tProd * 1e6 / docs}%.1f")
      }
    spark.stop()
  }

  /** Bucket-width helper soak (VERDICT r11 next #5): rows whose ids
    * are SPARSE over ~10⁹ (a snowflake-style allocator: large strides
    * plus per-row jitter, one hot source). With the legacy fixed 256
    * width the (key, bucket) subtotal frame approaches ONE ROW PER
    * INPUT ROW — the driver collect becomes the funnel
    * partitionedRunningSum exists to remove; with
    * [[Ranks.packBucketWidth]] it stays ≈ 32·parallelism regardless
    * of the spread. The cumsum under the derived width is asserted
    * equal to the sequential window (bit-identical, not just sized
    * right). */
  /** Persisted band index: is the per-batch probe really O(delta)?
    * Measures the one-time index build, then probes with a 20% delta
    * (the gate convention) and a 4% delta against the SAME persisted
    * table, vs the old path that re-derives the corpus index inside
    * every run. Probe time should track the DELTA fraction; the
    * re-derive path is corpus-dominated and flat in delta size. */
  private def bandIndexSoak(args: Array[String]): Unit = {
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuild) = timed(Dedup.persistedCorpusIndex(spark, dir)
      .count())
    def delta(mod: Int) = Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % mod === 0)
    def drain(df: DataFrame): Long = df.count()
    // warm both paths once (codegen/JIT), then measure best-of-3
    def best3(f: => Long): Double =
      (1 to 3).map(_ => timed(f)._2).min
    drain(Dedup.incrementalStatusAgainst(delta(5),
      Dedup.persistedCorpusIndex(spark, dir)))
    val tProbe20 = best3(drain(Dedup.incrementalStatusAgainst(delta(5),
      Dedup.persistedCorpusIndex(spark, dir))))
    val tProbe4 = best3(drain(Dedup.incrementalStatusAgainst(delta(25),
      Dedup.persistedCorpusIndex(spark, dir))))
    val tRederive20 = best3(drain(Dedup.incrementalStatusAgainst(delta(5),
      Dedup.corpusBandIndex(spark, dir))))
    val tRederive4 = best3(drain(Dedup.incrementalStatusAgainst(delta(25),
      Dedup.corpusBandIndex(spark, dir))))
    println(f"SOAK_BANDINDEX dir=$dir build_once=$tBuild%.2f s " +
      f"probe_delta20pct=$tProbe20%.2f probe_delta4pct=$tProbe4%.2f " +
      f"rederive_delta20pct=$tRederive20%.2f rederive_delta4pct=$tRederive4%.2f")
    spark.stop()
  }

  private def packWidthSoak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq(factor / 4, factor).distinct.filter(_ > 0).foreach { n =>
      val rows = n * 100000
      // stride ≫ 1 with deterministic jitter: ids span rows×9973+…,
      // nothing aligns to a power of two, one source holds everything
      val df = spark.range(rows.toLong)
        .select(($"id" * 9973L + ($"id" % 37L)).as("doc_id"),
          lit("hot").as("source"), ($"id" % 211L + 1L).as("tokens"))
        .localCheckpoint()
      val width = Ranks.packBucketWidth(df, col("doc_id"))
      def subtotals(w: Long): Long =
        df.groupBy(col("source"), expr(s"doc_id div $w")).count().count()
      val nDerived = subtotals(width)
      val nLegacy = subtotals(256L)
      val t0 = System.nanoTime()
      val prod = Ranks.partitionedRunningSum(df, Seq("source"),
        expr(s"doc_id div $width"), col("tokens"), "cum", col("doc_id"))
        .orderBy(col("doc_id")).collect()
      val tProd = (System.nanoTime() - t0) / 1e9
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val win = df.withColumn("cum", sum(col("tokens")).over(w))
        .orderBy(col("doc_id")).collect()
      require(prod.toSeq == win.toSeq,
        s"derived-width cumsum diverged from the window at n=$n")
      println(f"SOAK_PACKWIDTH n=$n rows=$rows idrange=${rows.toLong * 9973L} " +
        f"width=$width subtotal_rows_derived=$nDerived " +
        f"subtotal_rows_fixed256=$nLegacy prod=$tProd%.2f s " +
        f"ratio_fixed_over_derived=${nLegacy.toDouble / nDerived}%.0f")
    }
    spark.stop()
  }

  /** Star-contraction adversarial soak (VERDICT r10 next #4):
    * generated chain / star / clique-mix graphs at 100k+ nodes,
    * recording `lastCcRounds` against component height — expect
    * rounds ≈ ⌈log₂ height⌉ + O(1) while per-point wall-clock stays
    * in the per-round band (height × 100 at constant rounds must NOT
    * multiply time). Labels are asserted, not just timed: every
    * component must land on its minimum id. */
  private def ccAdversarialSoak(args: Array[String]): Unit = {
    val maxN = args.lift(1).map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def run(tag: String, height: Long, pairs: DataFrame,
        expect: DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val labels = Dedup.clustersFromPairs(pairs)
      val bad = labels.join(expect, Seq("node"))
        .filter(col("label") =!= col("want")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      require(bad == 0, s"$tag: $bad mislabeled nodes")
      val nodes = labels.count()
      println(f"SOAK_CCADV shape=$tag nodes=$nodes height=$height " +
        f"rounds=${Dedup.lastCcRounds} t=$secs%.2f s")
    }
    // warm, uncounted
    Dedup.clustersFromPairs(
      spark.range(64).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b")))
      .count()
    // one path of length N: height = N, the HashMin killer
    Seq(maxN / 100, maxN / 10, maxN).foreach { n =>
      val pairs = spark.range(n - 1)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val expect = spark.range(n)
        .select(col("id").as("node"), lit(0L).as("want"))
      run(s"chain", n.toLong, pairs, expect)
    }
    // star forest: maxN/100 stars of 100 leaves — height 1, many roots
    locally {
      val leaves = spark.range(maxN)
        .select(col("id"), expr("id div 100").as("c"))
      val pairs = leaves.select((col("c") * 100).as("doc_a"), col("id").as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
      val expect = leaves.select(col("id").as("node"), (col("c") * 100).as("want"))
      run("star100", 1L, pairs, expect)
    }
    // clique-mix: cliques of 32 via consecutive-pair + chord edges
    // (height ~16), plus one long chain threaded through every 1000th
    // id — components mix shapes
    locally {
      val ids = spark.range(maxN)
      val intra = ids.select(col("id").as("doc_a"),
        (col("id") - (col("id") % 32) + pmod(col("id") + 7, lit(32))).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
      val chain = ids.filter(col("id") % 1000 === 0)
        .select(col("id").as("doc_a"), (col("id") + 1000).as("doc_b"))
        .filter(col("doc_b") < maxN)
      val pairs = intra.union(chain)
      // expected: every block of 32 labels to its block base unless the
      // block base is on the chain (base % 1000 == 0 joins all chained
      // blocks to 0 — only blocks whose base is a chain node). Block
      // bases are multiples of 32; chain nodes are multiples of 1000.
      // base on chain ⇔ base % 1000 == 0 (lcm(32,1000)=4000 for the
      // base itself... simpler: compute via the chain reachability) —
      // bases divisible by 1000 need base % 32 == 0 too, i.e. base %
      // 4000 == 0? No: chain nodes are k*1000; a chain node sits in
      // block floor(k*1000/32)*32. Every block containing a chain node
      // merges into the chain component, whose min is 0.
      val chainBlocks = ids.filter(col("id") % 1000 === 0)
        .select((col("id") - (col("id") % 32)).as("blk")).distinct()
      val expect = ids
        .select(col("id").as("node"), (col("id") - (col("id") % 32)).as("blk"))
        .join(chainBlocks.withColumn("onchain", lit(1L)), Seq("blk"), "left")
        .select(col("node"),
          when(col("onchain").isNotNull, lit(0L)).otherwise(col("blk")).as("want"))
      run("cliquemix", 16L, pairs, expect)
    }
    spark.stop()
  }

  private def substrSoak(args: Array[String]): Unit = {
    val factor = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def amplify(n: Int): String = {
      val dir = s"/tmp/graft_soak/x$n"
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
        base.crossJoin(spark.range(n).toDF("copy"))
          .select(($"doc_id" * n + $"copy").as("doc_id"),
            when($"copy" === 0, $"text").otherwise(
              array_join(transform(split($"text", " "),
                w => concat(w, lit("_"), $"copy")), " ")).as("text"),
            $"lang", $"source", $"n_chars")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      dir
    }
    def timeIt(df: => DataFrame): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm codegen
    locally { val d = amplify(1); timeIt(TextOps.textSubstringDedup(spark, d)) }
    Seq(20, math.max(2, factor / 4), factor).distinct.foreach { n =>
      val dir = amplify(n)
      // untimed warm pass (touches every text byte): the first timed
      // variant otherwise pays the amplify write's cold page-cache
      // reads while the second runs warm (the confound behind the r8
      // first sweep's n=50 inversion)
      spark.read.parquet(s"$dir/documents.parquet")
        .select(sum(length(col("text")))).collect()
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val (tU, nu) = timeIt(TextOps.textSubstringDedup(spark, dir))
      val (tUu, nuu) = timeIt(TextOps.textSubstringDedupUnsalted(spark, dir))
      require(nu == nuu, s"salted/unsalted row counts diverged: $nu vs $nuu")
      val (tB, nb) = timeIt(TextOps.textBloomDecontam(spark, dir))
      println(f"SOAK_SUBSTR n=$n docs=$docs salted=$tU%.2f s ($nu docs) " +
        f"unsalted=$tUu%.2f s bloomDecontam=$tB%.2f s ($nb docs)")
    }
    spark.stop()
  }
}
