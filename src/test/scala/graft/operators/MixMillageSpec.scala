package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The temperature-mix millage threshold (r12, ADVICE r11 #1): when
  * frac(weight) is a general double (weight = T/√n_src), an integer
  * CAST on the (w − ⌊w⌋)·1000 threshold is NOT engine-exact — Spark's
  * CAST(double AS BIGINT) truncates toward zero while DuckDB's
  * ::BIGINT rounds to nearest (773.5026 → 773 vs 774), so any doc
  * whose frac_mill lands between the two flips n_copies by 1. The fix
  * compares raw doubles on both sides; these tests pin the Spark side
  * to the IEEE-double ground truth computed in plain Scala.
  *
  * The shipped sf≤0.01 fixtures give every source exactly 25 docs
  * (w = 10/√25 = 2.0, frac 0), so the hazard is UNREACHABLE there and
  * a fixture-based test would pin nothing — hence a crafted corpus:
  * a 3-doc source (threshold 773.5026…, the advisor's case) and a
  * 7-doc source (779.6444…), 10 docs of varied text so the md5
  * millages scatter across [0,1000). */
class MixMillageSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("mixmill").toString
    import spark.implicits._
    val rows = (0 until 3).map(i => (i.toLong, s"alpha doc $i body ${"x" * i}", "a")) ++
      (0 until 7).map(i => ((100 + i).toLong, s"beta doc $i payload ${"y" * i}", "b"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("n_copies matches the scalar IEEE-double threshold for every doc") {
    val rows = TextOps.textMixTemperature(spark, dir)
      .select("n_src", "weight", "doc_id", "n_copies").collect()
    assert(rows.length == 10)
    val mill = TextOps.docs(spark, dir)
      .select(col("doc_id"),
        (conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("text"))), 1, 15), 16, 10).cast("bigint") % 1000).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = r.getLong(0); val w = r.getDouble(1)
      assert(w == 10.0 / math.sqrt(n.toDouble), s"weight not bit-exact, n_src=$n")
      val frac = (w - math.floor(w)) * 1000.0
      val expect = math.floor(w).toLong +
        (if (mill(r.getLong(2)).toDouble < frac) 1L else 0L)
      assert(r.getLong(3) == expect,
        s"doc ${r.getLong(2)}: n_copies ${r.getLong(3)} != scalar $expect " +
          s"(frac_mill ${mill(r.getLong(2))}, threshold $frac)")
    }
  }

  test("the crafted corpus reaches a truncate-vs-round divergent threshold") {
    // the hazard only exists where trunc(frac·1000) != round(frac·1000);
    // n_src=3 → 773.5026 (trunc 773, round 774) must be present, or the
    // first test pins nothing an integer cast would break
    val fracs = TextOps.textMixTemperature(spark, dir)
      .select("weight").distinct().collect()
      .map(r => { val w = r.getDouble(0); (w - math.floor(w)) * 1000.0 })
    assert(fracs.exists(f => math.floor(f) != math.rint(f)),
      s"no divergent threshold among ${fracs.mkString(",")}")
  }
}
