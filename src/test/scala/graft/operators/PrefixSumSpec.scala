package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed running-SUM (r11, VERDICT r10 next #1):
  * [[Ranks.partitionedRunningSum]] must be BIT-identical to the
  * per-key sequential window it replaces — the packing family's
  * `_prod` gates certify that on the real corpus via the shared
  * oracle; these pin it on shapes chosen to break the bucket-offset
  * arithmetic (negative ids straddling the trunc-div kink, one
  * all-dominant key, single-row buckets) and pin the helper's
  * fail-fast guards. */
class PrefixSumSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Reference: the naive per-key sequential window. */
  private def windowCum(df: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum", sum(col("v")).over(w))
      .orderBy(col("k"), col("id"))
      .collect().toSeq
  }

  private def prodCum(df: org.apache.spark.sql.DataFrame, width: Long) =
    Ranks.partitionedRunningSum(df, Seq("k"),
      expr(s"id div $width"), col("v"), "cum", col("id"))
      .orderBy(col("k"), col("id"))
      .collect().toSeq

  test("packBucketWidth survives ids straddling the int64 sign boundary (ADVICE r12)") {
    import spark.implicits._
    // hi - lo + 1 overflows signed 64-bit here; the unsigned-division
    // form must yield a HUGE width (bounded subtotal frame), not the
    // silent 256 fallback that re-opens the driver funnel
    val edge = Seq(Long.MinValue + 3, -5L, 0L, 7L, Long.MaxValue - 2)
      .toDF("doc_id")
    val w = Ranks.packBucketWidth(edge, col("doc_id"))
    assert(w > (1L << 50),
      s"sign-straddling spread produced width $w — overflow fallback")
    // dense gate-scale ids still floor at the legacy 256 (bucket
    // layouts — and plan goldens — unchanged for every real gate)
    val dense = (0L until 6000L).toDF("doc_id")
    assert(Ranks.packBucketWidth(dense, col("doc_id")) == 256L)
    // empty input keeps the documented 256 default
    assert(Ranks.packBucketWidth(dense.filter(col("doc_id") < 0),
      col("doc_id")) == 256L)
  }

  test("matches the sequential window on a skewed two-key frame") {
    import spark.implicits._
    // one dominant key (the 100 TB funnel shape) + a tiny one
    val df = ((0L until 5000L).map(i => ("hot", i, i % 37 + 1)) ++
      (0L until 7L).map(i => ("cold", i, i + 1))).toDF("k", "id", "v")
    assert(prodCum(df, 64) == windowCum(df))
  }

  test("negative ids: trunc-div buckets stay monotone across zero") {
    import spark.implicits._
    // ids straddle 0 — Spark's `div` truncates toward zero, which is
    // still monotone non-decreasing in id (buckets around 0 are just
    // unequal width), so the offsets must still line up exactly
    val df = (-300L to 300L).map(i => ("k0", i, (i % 5 + 7))).toDF("k", "id", "v")
    assert(prodCum(df, 64) == windowCum(df))
  }

  test("bucket width 1 (every row its own bucket) still exact") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (s"s${i % 3}", i, i + 1)).toDF("k", "id", "v")
    assert(prodCum(df, 1) == windowCum(df))
  }

  test("null part key fails fast, not silently") {
    import spark.implicits._
    val df = Seq((Option("a"), 1L, 1L), (Option.empty[String], 2L, 1L))
      .toDF("k", "id", "v")
    val e = intercept[IllegalArgumentException](prodCum(df, 16))
    assert(e.getMessage.contains("null part key"))
  }

  test("null bucket fails fast, not silently") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L)).toDF("k", "id", "v")
    val e = intercept[IllegalArgumentException](
      Ranks.partitionedRunningSum(df, Seq("k"),
        when(col("id") === 2L, lit(null)).otherwise(col("id")),
        col("v"), "cum", col("id")).collect())
    assert(e.getMessage.contains("bucket"))
  }

  test("gate twins: prod output equals window output on real testdata") {
    val dir = "/root/testdata/sf0.001"
    val a = TextOps.textSeqPack(spark, dir).collect().toSeq
    val b = TextOps.textSeqPackProd(spark, dir).collect().toSeq
    assert(a == b)
    val c = TextOps.textShardPack(spark, dir).collect().toSeq
    val d = TextOps.textShardPackProd(spark, dir).collect().toSeq
    assert(c == d)
  }

  test("shuffled pack: conserves tokens and genuinely reorders vs doc_id pack") {
    // The shuffled pack must be the SAME partition of the token
    // stream (Σ seq_tokens and per-source sequence counts identical —
    // packing is order-invariant in totals) while the md5 order
    // actually changes which docs share a sequence. A silent
    // fall-through to doc_id order would pass its own oracle, so the
    // cross-gate invariant is pinned here.
    val dir = "/root/testdata/sf0.001"
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("source"))
        .agg(sum(col("seq_tokens")).as("t"), count(lit(1)).as("n"))
        .orderBy(col("source")).collect().toSeq
    val plain = TextOps.textSeqPack(spark, dir)
    val shuffled = TextOps.textSeqPackShuffled(spark, dir)
    assert(totals(plain) == totals(shuffled),
      "shuffled pack must conserve per-source token totals and sequence counts")
    val a = plain.collect().toSeq
    val b = shuffled.collect().toSeq
    assert(a != b, "shuffled pack produced the doc_id-order composition")
  }

  test("weight-descending order via a log-bucket (the trainBuild shape)") {
    import spark.implicits._
    // positive weights over 4 octaves; sort (w desc, id); bucket =
    // floor(-log2(w)*16) must reproduce the sequential window exactly
    val rng = new scala.util.Random(11)
    val df = (0L until 800L).map { i =>
      ("k" + (i % 2), i, rng.nextDouble() * 7.9 + 0.1, i % 13 + 1)
    }.toDF("k", "id", "w", "v")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("w").desc, col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expected = df.withColumn("cum", sum(col("v")).over(win))
      .orderBy(col("k"), col("id")).collect().toSeq
    val actual = Ranks.partitionedRunningSum(df, Seq("k"),
      floor(-log(2.0, col("w")) * 16), col("v"), "cum",
      col("w").desc, col("id"))
      .orderBy(col("k"), col("id")).collect().toSeq
    assert(actual == expected)
  }
}
