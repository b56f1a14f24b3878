package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** The native codegen'd kernels must agree bit-exactly with the
  * interpreted HOF folds they replaced — same left-associated IEEE
  * order — on random data, edge shapes, and nulls, in BOTH codegen
  * and interpreted (eval) execution. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("DotProductF ≡ aggregate(zip_with(...)) bit-exactly; MatchCountF ≡ HOF count") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      val dim = Seq(0, 1, 3, 64, 128)(i % 5)
      (Array.fill(dim)(rng.nextFloat() * 2 - 1),
        Array.fill(dim)(rng.nextFloat() * 2 - 1),
        Array.fill(16)(rng.nextInt(4).toLong),
        Array.fill(16)(rng.nextInt(4).toLong))
    }
    val df = rows.toDF("a", "b", "sa", "sb")
    val hofDot = expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val hofCnt = expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
    val out = df.select(
      dotF($"a", $"b").as("nd"), hofDot.as("hd"),
      matchCountF($"sa", $"sb").as("nc"), hofCnt.as("hc")).collect()
    out.foreach { r =>
      // bit-exact, not approximate: same fold order must give same bits
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getInt(2) == r.getInt(3))
    }

    // null array → null result (both kernels)
    val withNull = Seq((Array(1.0f, 2.0f), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(dotF($"a", $"b").as("d"))
    assert(withNull.collect().head.isNullAt(0))

    // interpreted path (eval, no codegen) must agree too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val out2 = df.select(dotF($"a", $"b").as("nd"), hofDot.as("hd")).collect()
      out2.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("kernels are SQL-callable after registration") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "graft_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m").collect().head
    assert(r.getDouble(0) == 11.0 && r.getInt(1) == 2)
  }

  test("1536-dim cosine top-k: realistic embedding widths, constant codegen") {
    // r1 flagged the unrolled form as fatal at real dims; the native
    // kernel's generated code is dimension-independent. 2000 corpus ×
    // 5 queries at 1536-dim, verified against a driver-side oracle.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dim = 1536
    val rng = new scala.util.Random(11)
    val corpus = Seq.tabulate(2000)(i => (i.toLong, Array.fill(dim)(rng.nextFloat())))
    val queries = Seq.tabulate(5)(i => (i.toLong, Array.fill(dim)(rng.nextFloat())))

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = queries.map { case (qid, qv) =>
      qid -> corpus.map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(3).map(_._1)
    }.toMap

    val cDf = corpus.toDF("vec_id", "emb")
    val qDf = queries.toDF("q_id", "q_emb")
    val scored = cDf.crossJoin(broadcast(qDf))
      .select($"q_id", $"vec_id",
        (dotF($"emb", $"q_emb") /
          (sqrt(dotF($"emb", $"emb")) * sqrt(dotF($"q_emb", $"q_emb")))).as("cosine"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val top = scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .orderBy($"q_id", $"rk")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    expected.foreach { case (q, ids) => assert(top(q) == ids, s"query $q") }
  }

  test("DotProductF over array<double> and MIXED float/double sides (r8: 768-dim gates)") {
    // the 768-dim production gates build array<double> vectors; each
    // side resolves its element type at plan time, so double/double,
    // float/double and double/float all fold identically to the
    // driver-side left-assoc oracle — in codegen AND interpreted mode
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(200) { i =>
      val dim = Seq(0, 1, 768)(i % 3)
      (Array.fill(dim)(rng.nextDouble() * 2 - 1),
        Array.fill(dim)(rng.nextDouble() * 2 - 1),
        Array.fill(dim)(rng.nextFloat() * 2 - 1))
    }
    def fold(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val df = rows.toDF("da", "db", "f")
    def check(): Unit = {
      val out = df.select(dotF($"da", $"db").as("dd"),
        dotF($"f", $"db").as("fd"), dotF($"da", $"f").as("df")).collect()
      out.zip(rows).foreach { case (r, (da, db, f)) =>
        val fd = f.map(_.toDouble).toSeq
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(fold(da.toSeq, db.toSeq)))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(fold(fd, db.toSeq)))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(fold(da.toSeq, fd)))
      }
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
