package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on the physical partitioning — the
  * assumption every oracle hash rests on. Each float-heavy gate runs
  * under two different shuffle-partition settings; any
  * order-dependent double arithmetic (raw double sums, fold order
  * tied to partition layout) would produce different bits. */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val gates = Seq("alpaca_vwap_daily", "alpaca_adjusted_bars",
    "pipeline_curate", "sim_cosine_topk", "text_tfidf",
    "dedup_clusters", "asof_join_forward", "q20_retention",
    // r3 session additions with iterative/collected state (kmeans
    // centroids, triangle join fan-out, funnel window chain,
    // volatility lag windows) — none may notice the partitioning
    "sim_kmeans", "graph_triangles", "q27_funnel", "alpaca_volatility",
    "q28_rolling_range", "graph_reachability", "sim_ann_recall",
    // r5: the binding top-V caps — TakeOrderedAndProject merges
    // per-partition V-heaps, so a non-total tie-break would select
    // different vocabularies at different partitionings; and the
    // chunk dedup's (ck, chunk) two-level aggregation
    "text_lm_score", "text_dsir_filter", "text_chunk_dedup",
    // r5 continuation: the bloom build folds per-partition filters
    // (merge must be order-insensitive — OR is), substring runs and
    // the incremental-minhash best-match rest on total window
    // tie-breaks, PQ argmin/top-k tie-break to lower id, and the v2
    // pipeline composes three of them
    "text_bloom_decontam", "text_substring_dedup",
    "dedup_incremental_minhash", "sim_ann_pq", "pipeline_curate_v2",
    // %D is a fixed lag-chain of %K doubles — must not notice layout
    "alpaca_stochastic",
    // r7: collect_list product (order-proof only because BIGINT
    // multiplication commutes), dual-frame nearest window tie-breaks,
    // ADC integer sums + re-rank ties, fixed-point PageRank sums,
    // and the lead()+explode gap spine
    "alpaca_split_adjusted", "asof_join_nearest", "sim_ann_ivfpq",
    // r8: production-dim stack — integer ADC sums + (cosine, vec_id)
    // total-order re-rank ties, same candidates at any layout
    "sim_ann_ivfpq_768", "sim_ann_recall_curve_768",
    // r8: double→JSON→variant→double round-trip must not notice layout
    "q33_variant",
    "graph_pagerank", "alpaca_bars_gapfill",
    // r7 microstructure: every estimator rests on BIGINT moment sums
    // + a fixed IEEE tail — the three-carry bucketed Lee-Ready, the
    // exploded dual-eval markout fold-back, the exclusive-frame VPIN
    // cumsum, and the filtered ANN's top-k tie-breaks are the
    // layout-sensitive candidates
    "alpaca_lee_ready", "alpaca_lee_ready_bucketed", "alpaca_markout",
    "alpaca_vpin", "alpaca_kyle_lambda", "alpaca_event_study",
    "sim_ann_filtered",
    // r7 continuation 6: FILTERed min_by/max_by rest on unique print
    // instants, the MMR greedy on total (score, vec_id) tie-breaks,
    // the corr matrix and range-vol on BIGINT moment sums + fixed
    // IEEE tails, the imbalance on FILTERed sums of grid doubles
    "alpaca_auction_summary", "sim_mmr_select",
    "alpaca_feature_corr_matrix", "alpaca_range_vol",
    "alpaca_orderbook_imbalance", "alpaca_overnight_gap",
    // r7: the packed train-build rests on the (weight DESC, doc_id)
    // total order inside the packing window
    "pipeline_train_build",
    // r7 final batch: quotient ratios, windows over bounded sets, and
    // the all-broadcast composition joins — none may notice layout
    "alpaca_quote_intensity", "alpaca_orderbook_depth_curve",
    "alpaca_iv_smile", "alpaca_put_call_parity", "alpaca_impl_shortfall",
    "alpaca_market_dashboard",
    // r8 batch 2: ordered string aggregation (listagg's WITHIN GROUP
    // sort must not notice which partition delivered which row), the
    // recursive CTE's iterated frontier joins, map-HOF serialization
    // (entry order pinned only by the explicit array_sort), and the
    // DPP-pruned connector join (runtime filter must prune the same
    // partitions at any layout)
    "q43_listagg", "q50_recursive_cte", "q53_map_hof",
    "alpaca_runtime_prune",
    // r8 warehouse batch: the SCD2 build's version numbering rests on
    // the (o_orderdate, o_orderkey) total window order; the Z-order
    // block cut on the global (z, o_orderkey) rank; the LSH eval's
    // confusion counts on md5-deterministic signatures — none may
    // notice which partition delivered which row
    "q63_scd2", "q65_zorder_layout", "dedup_lsh_eval",
    // r8: EWMA's positional weights ride on the array_sort'ed frame
    // (the whole point of the order-pinning); must not notice layout
    "alpaca_ewma",
    // r8: exact order-statistic (percentile_disc) median/MAD must
    // select the same element at any partitioning
    "q67_mad_outliers",
    // r11 batch: the global-shuffle rank's counts/offsets jobs and
    // bucketed window must agree at any layout; the keep-best and
    // curate-best winners rest on (score DESC, doc_id) total window
    // orders (score a coalesced double); the containment ratio is a
    // single division of exact ints; the salted join's per-type
    // average is a DECIMAL sum + one IEEE division, and its salt must
    // be result-invisible whatever the partitioning
    "text_global_shuffle", "dedup_keep_best", "pipeline_curate_best",
    "dedup_ngram_containment", "q70_skew_join_salted",
    "text_seq_pack_shuffled",
    // r11: banded Hamming join + integer popcount — candidates and
    // distances must not notice which partition decoded which image
    "mm_phash_dedup",
    // r11: sqrt + one IEEE division weight — bit-exact at any layout
    "text_mix_temperature")

  private def runWith(partitions: Int, name: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  gates.foreach { name =>
    test(s"$name: identical rows at 3 vs 13 shuffle partitions") {
      val a = runWith(3, name)
      val b = runWith(13, name)
      assert(a.nonEmpty && a == b,
        s"$name differs across partitionings (${a.length} vs ${b.length} rows)")
    }
  }

  // r8: the one driver-red gate of r7 was an alpaca_vpin hash flake
  // that no isolated re-run reproduced — the suspect classes are (a)
  // layout sensitivity the 3-vs-13 pin doesn't cover and (b) a
  // transient scan fault under a loaded session (now guarded by the
  // reader's ScanIntegrityException invariants). This soak covers
  // both: 60 sequential runs across a pseudo-random sweep of shuffle
  // partitionings, then 40 more from 8 threads hammering the shared
  // session concurrently (GC pressure + stub/prefetch contention —
  // the loaded-session environment where the flake appeared). Every
  // run must be bit-identical to the first.
  test("alpaca_vpin: x100 soak — randomized layouts + concurrent load") {
    val name = "alpaca_vpin"
    val baseline = runWith(7, name)
    assert(baseline.nonEmpty)
    // 59 more sequential runs, partitions from a fixed LCG in [2, 33]
    var seed = 0x5DEECE66DL
    (1 to 59).foreach { i =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val parts = 2 + math.floorMod(seed >>> 33, 32L).toInt
      val got = runWith(parts, name)
      assert(got == baseline,
        s"vpin run $i at $parts shuffle partitions diverged from baseline")
    }
    // 40 concurrent runs: 8 threads x 5, shared session
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 40).map { i =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          override def call(): Seq[String] =
            SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
        })
      }
      futures.zipWithIndex.foreach { case (f, i) =>
        assert(f.get() == baseline, s"concurrent vpin run $i diverged from baseline")
      }
    } finally pool.shutdown()
  }

  // AQE rewrites exchanges/joins at runtime; results must not notice.
  Seq("pipeline_curate", "dedup_minhash_lsh", "q3_join_agg").foreach { name =>
    test(s"$name: identical rows with AQE disabled") {
      val on = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val off =
        try SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(on.nonEmpty && on == off, s"$name differs with AQE off")
    }
  }
}
