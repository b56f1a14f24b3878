package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the round-3 operators (their VALUES are
  * certified by the DuckDB oracle gates; these assert the graph/rank
  * invariants a hash can't explain when it breaks). */
class ClustersTfidfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedup_clusters: labels are a fixpoint closed under the pair graph") {
    val labels = operators.Dedup.dedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    // representative never exceeds the member id (HashMin invariant)
    assert(labels.forall { case (node, rep) => rep <= node })
    // every rep is itself labeled with itself (component minimum)
    assert(labels.values.toSet.forall(rep => labels(rep) == rep))
    // closure: both endpoints of every threshold edge share one label
    val pairs = operators.Dedup.dedupMinhashLsh(spark, dir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) spans two clusters")
    }
  }

  test("text_tfidf: dense ranks 1..k per doc, score = tf*N/df, df sane") {
    val nDocs = operators.Tables.t(spark, dir, "documents").count()
    val rows = operators.TextOps.textTfidf(spark, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 3)
    }
    rows.foreach { r =>
      val (tf, df, score) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(df >= 1 && df <= nDocs)
      assert(score == tf.toDouble * nDocs / df)
    }
  }

  test("text_chunk_dedup: chunk math, drop path exercised, identity when nothing dropped") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val texts = operators.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = operators.TextOps.textChunkDedup(spark, dir).collect()
    assert(rows.length == texts.size)
    var dropped = 0
    rows.foreach { r =>
      val (doc, nChunks, nKept, cleanMd5) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val words = texts(doc).split(" ", -1).length
      assert(nChunks == math.ceil(words / 3.0).toLong)
      assert(nKept <= nChunks)
      if (nKept == nChunks)
        // keeping every chunk must reassemble the original text exactly
        assert(cleanMd5 == md5hex(texts(doc)))
      else { dropped += 1; assert(cleanMd5 != md5hex(texts(doc))) }
    }
    assert(dropped > 0, "corpus should contain boilerplate chunks (df >= 5)")
  }

  test("sim_quantized: codes in [0,255], reconstruction within one quant step") {
    val embs = operators.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val rows = operators.Similarity.simQuantized(spark, dir).collect()
    assert(rows.length == embs.size)
    rows.foreach { r =>
      val (id, mn, mx, sum) = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
      val v = embs(id).map(_.toDouble)
      assert(mn == v.min && mx == v.max)
      // recompute codes exactly as the operator defines them
      val codes = v.map { x =>
        if (mx == mn) 0L
        else math.min(255L, math.floor((x - mn) * 255.0 / (mx - mn)).toLong)
      }
      assert(codes.sum == sum)
      assert(codes.forall(c => c >= 0L && c <= 255L))
      // dequantization lands within one quantization step of the input
      val step = if (mx == mn) 0.0 else (mx - mn) / 255.0
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs((mn + c * step) - x) <= step + 1e-12,
          s"vec $id: |dequant - x| exceeds one step")
      }
    }
  }

  test("minhash est_jaccard tracks exact ngram jaccard on candidate pairs") {
    // statistical contract of the Kirsch–Mitzenmacher signatures:
    // per-pair estimates carry 16-permutation noise (sd ≈ 0.12), but
    // the MEAN estimate over candidate pairs must sit close to the
    // mean exact 3-gram Jaccard of the same pairs (deterministic on
    // the fixed corpus, so no flake)
    val exact = operators.Dedup.dedupNgramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = operators.Dedup.dedupMinhashLsh(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val both = est.collect { case (k, e) if exact.contains(k) => (e, exact(k)) }
    assert(both.length >= 20, s"expected shared candidate pairs, got ${both.length}")
    val meanEst = both.map(_._1).sum / both.length
    val meanExact = both.map(_._2).sum / both.length
    assert(math.abs(meanEst - meanExact) < 0.1,
      f"mean est $meanEst%.3f vs mean exact $meanExact%.3f drifted")
  }

  test("text_seq_pack: token conservation and fixed fill") {
    import org.apache.spark.sql.functions._
    val seqs = operators.TextOps.textSeqPack(spark, dir).collect()
    assert(seqs.nonEmpty)
    // columns: source(0), seq_id(1), n_docs(2), seq_tokens(3),
    // first_doc(4), last_doc(5)
    // conservation: every source token lands in exactly one sequence
    val totalSeqTokens = seqs.map(_.getLong(3)).sum
    val totalTokens = operators.Tables.t(spark, dir, "documents")
      .select(sum(size(split(coalesce(col("text"), lit("")), " "))
        .cast("bigint"))).head.getLong(0)
    assert(totalSeqTokens == totalTokens,
      s"seq tokens $totalSeqTokens != corpus tokens $totalTokens")
    // every sequence but each source's LAST is filled to exactly SeqLen,
    // and sequence ids are contiguous from 0 per source
    seqs.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length))
      sorted.dropRight(1).foreach(r => assert(r.getLong(3) == 512L))
      assert(sorted.last.getLong(3) <= 512L && sorted.last.getLong(3) >= 1L)
      // boundary sanity: n_docs >= 1, first_doc <= last_doc
      sorted.foreach(r => assert(r.getLong(2) >= 1L))
      sorted.foreach(r => assert(r.getLong(4) <= r.getLong(5)))
    }
  }

  test("alpaca_sma_crossover: sma equals close where the window is flat") {
    val rows = operators.AlpacaAnalytics.smaCrossover(spark, dir).collect()
    assert(rows.nonEmpty)
    // every sma lies within the [min, max] of closes for its symbol
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val closes = rs.map(_.getDouble(2))
      val (lo, hi) = (closes.min, closes.max)
      rs.foreach(r => assert(r.getDouble(3) >= lo && r.getDouble(3) <= hi))
    }
  }
}
