package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomExpressions

/** Contract of the codegen'd Bloom probe: ZERO false negatives (the
  * property the exact-confirm-join argument in text_bloom_decontam
  * rests on), a bounded false-positive rate, null → null, and
  * codegen / interpreted agreement. */
class BloomExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("no false negatives; FPR near nominal; null passthrough; eval ≡ codegen") {
    import spark.implicits._
    val members = (0L until 1000L).map(_ * 7919L)
    val bloom = BloomFilter.create(1000, 0.01)
    members.foreach(bloom.putLong)

    // every member MUST pass — a single false negative breaks the
    // prefilter-then-confirm correctness argument
    val mdf = members.toDF("k")
    assert(mdf.filter(BloomExpressions.mightContainLong($"k", bloom)).count() == 1000L)

    // non-members (disjoint by construction: 7919 is prime, offsets 1..)
    val nonMembers = (0L until 10000L).map(_ * 7919L + 1L).toDF("k")
    val fp = nonMembers.filter(BloomExpressions.mightContainLong($"k", bloom)).count()
    assert(fp < 500L, s"FPR ${fp / 10000.0} far above nominal 0.01")

    // null input → null (filter drops the row, no NPE)
    val withNull = Seq(Some(7919L), None).toDF("k")
    assert(withNull.filter(BloomExpressions.mightContainLong($"k", bloom)).count() == 1L)

    // interpreted path must agree with codegen on the same inputs
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(mdf.filter(BloomExpressions.mightContainLong($"k", bloom)).count() == 1000L)
      assert(nonMembers.filter(BloomExpressions.mightContainLong($"k", bloom)).count() == fp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("empty filter rejects everything (empty benchmark set → no candidates)") {
    import spark.implicits._
    val empty = BloomFilter.create(100, 0.01)
    val df = (1L to 100L).toDF("k")
    assert(df.filter(BloomExpressions.mightContainLong($"k", empty)).count() == 0L)
  }
}
