package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-recompute bound for the histogram-threshold percentile
  * filter (r11, VERDICT r10 next #2) — the same pattern as the ANN
  * recall gates: the gate oracle certifies the approx path's VALUES;
  * this spec certifies its RELATION to the exact percent_rank gate it
  * approximates, per source:
  *   1. containment — the exact top-half is a subset of the approx
  *      survivors (the threshold bucket floor can only over-keep);
  *   2. granularity — the overshoot is bounded by the threshold
  *      bucket's population (the docs the 1/64-wide bucket cannot
  *      split);
  *   3. budget — approx keeps at least the exact keep size
  *      ⌊(n+1)/2⌋ of each source's scored docs.
  */
class QualityPercentileProdSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def boundCheck(dir: String): Unit = {
    val exact = TextOps.textQualityPercentile(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val approxRows = TextOps.textQualityPercentileProd(spark, dir)
      .collect()
    val approx = approxRows.map(r => (r.getLong(0), r.getString(1)))
    // 1. containment
    val missing = exact.toSet -- approx.toSet
    assert(missing.isEmpty,
      s"exact survivors missing from approx set: ${missing.take(5)}")
    // 2/3. per-source budget + granularity bound
    val exactBySrc = exact.groupBy(_._2).view.mapValues(_.length).toMap
    val approxBySrc = approx.groupBy(_._2).view.mapValues(_.length).toMap
    // population of each source's threshold bucket among scored docs
    val thr = approxRows.map(r => r.getString(1) -> r.getLong(3)).toMap
    approxBySrc.foreach { case (src, nApprox) =>
      val nExact = exactBySrc.getOrElse(src, 0)
      assert(nApprox >= nExact,
        s"$src: approx kept $nApprox < exact keep size $nExact")
      // granularity: every over-kept doc sits exactly IN the threshold
      // bucket (docs in buckets ABOVE it number < the keep size, so
      // they are all in the exact set too) — so the overshoot is
      // bounded by the threshold bucket's survivor population
      val overs = approxRows.filter(r => r.getString(1) == src)
        .count(r => math.floor(r.getDouble(2) * TextOps.PctBuckets).toLong ==
          thr(src))
      assert(nApprox - nExact <= overs,
        s"$src: overshoot ${nApprox - nExact} exceeds threshold-bucket " +
          s"population $overs")
    }
  }

  test("sf0.001: containment + granularity bound hold") {
    boundCheck("/root/testdata/sf0.001")
  }

  test("sf0.01: containment + granularity bound hold") {
    boundCheck("/root/testdata/sf0.01")
  }
}
