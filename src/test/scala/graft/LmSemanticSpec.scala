package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Driver-side re-computation oracles for the round-3 operators,
  * independent of the DuckDB gate: the same math in plain Scala over
  * the collected sf0.001 fixture, compared EXACTLY (the operators'
  * arithmetic is integer sums + single IEEE divisions / identical
  * left-associated folds, so no tolerance is needed). */
class LmSemanticSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // Spark split() keeps trailing empties (Java split with limit -1)
  private def bigrams(t: String): Seq[String] = {
    val ws = t.split(" ", -1)
    if (ws.length < 2) Seq.empty
    else ws.sliding(2).map(p => p(0) + " " + p(1)).toSeq
  }

  private lazy val docTexts: Map[Long, String] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("text_lm_score matches a plain-Scala recompute exactly") {
    val cnt = docTexts.toSeq.flatMap { case (_, t) => bigrams(t) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = cnt.values.sum
    val model = cnt.toSeq.sortBy { case (b, c) => (-c, b) }.take(500).toMap
    // the cap must BIND (vocab > V) so the OOV zero path is exercised
    assert(cnt.size > 500, "fixture vocabulary no longer exceeds the lm cap")
    val expected = docTexts.toSeq.collect {
      case (id, t) if bigrams(t).nonEmpty =>
        val bs = bigrams(t)
        val mass = bs.map(b => model.getOrElse(b, 0L)).sum
        id -> ((bs.size.toLong, mass,
          mass.toDouble / (bs.size.toDouble * total.toDouble)))
    }.toMap
    val got = SparkEntry.queries("text_lm_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == expected)
  }

  test("text_dsir_filter weights recompute exactly; only weight>=1 kept") {
    // target set from the quality GATE (tests the composition, not a
    // re-derivation of the quality formula). Models are capped to the
    // top-V bigrams by (count DESC, bigram) and OOV bigrams take the
    // add-one floor: mass contribution = count + 1, totals gain +V.
    val V = 500
    val target = SparkEntry.queries("text_quality")(spark, dir).collect()
      .collect { case r if r.getDouble(6) >= 0.55 => r.getLong(0) }.toSet
    def capped(cnt: Map[String, Long]): Map[String, Long] =
      cnt.toSeq.sortBy { case (b, c) => (-c, b) }.take(V).toMap
    val corpusCnt = capped(docTexts.toSeq.flatMap { case (_, t) => bigrams(t) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong })
    val targetCnt = capped(docTexts.toSeq
      .filter { case (id, _) => target(id) }
      .flatMap { case (_, t) => bigrams(t) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong })
    val (tt, ct) = (targetCnt.values.sum + V, corpusCnt.values.sum + V)
    val expected = docTexts.toSeq.collect {
      case (id, t) if bigrams(t).nonEmpty =>
        val bs = bigrams(t)
        val tm = bs.map(b => targetCnt.getOrElse(b, 0L) + 1L).sum
        val cm = bs.map(b => corpusCnt.getOrElse(b, 0L) + 1L).sum
        val w = (tm.toDouble / tt.toDouble) / (cm.toDouble / ct.toDouble)
        (id, bs.size.toLong, tm, cm, w)
    }.filter(_._5 >= 1.0)
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    val got = SparkEntry.queries("text_dsir_filter")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expected)
    assert(got.values.forall(_._4 >= 1.0))
    // the cap must BIND at fixture scale (vocab > V), so the OOV
    // add-one floor is genuinely exercised by this recompute
    assert(docTexts.toSeq.flatMap { case (_, t) => bigrams(t) }
      .distinct.size > V, "fixture vocabulary no longer exceeds the cap")
  }

  test("sim_semantic_dedup kept set matches a plain-Scala recompute") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    // same left-associated fold from 0.0 as the DotProductF kernel
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = vecs.toSeq.filter(_._1 < 8).sortBy(_._1)
    val cell = vecs.map { case (id, v) =>
      // argmax cosine, ties to the LARGER cent_id (>= replace while
      // iterating cent_id ascending)
      var bestScore = Double.NegativeInfinity; var bestCent = -1L
      cents.foreach { case (cid, cv) =>
        val s = cos(v, cv)
        if (s >= bestScore) { bestScore = s; bestCent = cid }
      }
      id -> bestCent
    }
    val ids = vecs.keys.toSeq.sorted
    val dropped = (for {
      a <- ids; b <- ids
      if a < b && cell(a) == cell(b) && cos(vecs(a), vecs(b)) >= 0.35
    } yield b).toSet
    val expected = ids.filterNot(dropped).map(id => id -> cell(id)).toMap
    val got = SparkEntry.queries("sim_semantic_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("text_chunk_overlap matches a plain-Scala recompute exactly") {
    val W = 20; val S = 10
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = docTexts.toSeq.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      val nc = if (ws.length <= W) 1 else math.ceil((ws.length - W) / S.toDouble).toInt + 1
      (0 until nc).map { i =>
        val cw = ws.slice(i * S, i * S + W)
        (id, i.toLong, cw.length.toLong, md5hex(cw.mkString(" ")))
      }
    }.toSet
    val got = SparkEntry.queries("text_chunk_overlap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected)
  }

  test("text_ngram_decontam matches a plain-Scala recompute exactly") {
    val N = 5
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def splitOf(t: String): String = {
      val h = java.lang.Integer.parseInt(md5hex(t).take(4), 16) % 100
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }
    def grams(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < N) Seq.empty
      else ws.sliding(N).map(g => md5hex(g.mkString(" "))).toSeq
    }
    val testGrams = docTexts.values.filter(splitOf(_) == "test")
      .flatMap(grams).toSet
    val expected = docTexts.toSeq.collect {
      case (id, t) if splitOf(t) == "train" && grams(t).nonEmpty =>
        val gs = grams(t)
        val hits = gs.filter(testGrams)
        (id, gs.size.toLong, hits.size.toLong, hits.distinct.size.toLong,
          hits.size.toDouble / gs.size.toDouble)
    }.filter(_._3 > 0).toSet
    val got = SparkEntry.queries("text_ngram_decontam")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("text_quality_percentile keeps exactly the per-source top half") {
    val quality = SparkEntry.queries("text_quality")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val sources = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = sources.groupBy(_._2).flatMap { case (_, members) =>
      val ordered = members.keys.toSeq
        .sortBy(id => (-quality(id), id))
      val n = ordered.size
      ordered.zipWithIndex.collect {
        case (id, rk) if n == 1 || rk.toDouble / (n - 1) <= 0.5 =>
          id -> (rk.toDouble / math.max(1, n - 1))
      }
    }
    val got = SparkEntry.queries("text_quality_percentile")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == expected)
  }

  test("dedup_hybrid cosine equals the kernel fold over the pair's vectors") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val rows = SparkEntry.queries("dedup_hybrid")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val c = dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
      assert(r.getDouble(3) == c, s"pair ($a,$b) cosine mismatch")
      assert(c >= 0.0 && r.getDouble(2) >= 0.3)
    }
  }

  test("stream_join_attrib equals its batch interval-join twin") {
    val ev = operators.Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_us").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts_us").as("pts"), col("value"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + lit(1800000000L))
      .groupBy(col("cu").as("user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_purchase"))
      .orderBy(col("user_id")).collect().toSeq
    val stream = SparkEntry.queries("stream_join_attrib")(spark, dir)
      .collect().toSeq
    assert(stream == batch)
  }

  test("sim_ann_ivfpq: exact re-rank lifts recall to at least pure-PQ's on the same queries") {
    // ground truth: exact cosine top-3 per query (sim_cosine_topk is
    // top-5 ranked by cosine desc, vec_id — take the first 3)
    val exact = SparkEntry.queries("sim_cosine_topk")(spark, dir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= 3)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(name: String, trimTo3: Boolean): Double = {
      var df = SparkEntry.queries(name)(spark, dir)
      if (trimTo3) df = df.filter(col("rk") <= 3)
      val got = df.select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = exact.map { case (q, truth) =>
        (truth intersect got.getOrElse(q, Set.empty)).size
      }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val pq = recallOf("sim_ann_pq", trimTo3 = true)
    val ivfpq = recallOf("sim_ann_ivfpq", trimTo3 = false)
    assert(ivfpq >= pq,
      s"IVF-PQ recall $ivfpq fell below pure-PQ recall $pq")
  }
}
