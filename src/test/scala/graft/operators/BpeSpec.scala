package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The subword tokenizer + BPE-budget packing (r12, VERDICT r11 next
  * #2): the DuckDB oracle certifies cross-engine parity; these pin
  * the Spark side to (a) a SCALAR Scala reimplementation of the
  * greedy longest-match — so a fold regression fails here without the
  * oracle — and (b) the packing family's conservation and fill
  * invariants in the subword unit. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Mirror of bpeFoldSql's semantics: at pos, try the (possibly
    * end-truncated) 4-, 3-, then 2-char substring against the vocab;
    * advance by the BRANCH length (over-advancing past the end is
    * fine — one token either way), else 1. */
  private def scalarTokens(w: String, vocab: Set[String]): Long = {
    var pos = 0; var cnt = 0L
    while (pos < w.length) {
      val step = (4 to 2 by -1)
        .find(l => vocab.contains(w.substring(pos, math.min(pos + l, w.length))))
        .getOrElse(1)
      pos += step; cnt += 1
    }
    cnt
  }

  test("fold counts equal the scalar greedy for every document") {
    val vocab = TextOps.bpeVocab(spark, dir).collect().map(_.getString(0)).toSet
    assert(vocab.nonEmpty && vocab.forall(p => p.length >= 2 && p.length <= 4))
    val got = TextOps.textTokensBpe(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = TextOps.docs(spark, dir)
      .select(col("doc_id"), coalesce(col("text"), lit(""))).collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      val expect = words.map(scalarTokens(_, vocab)).sum
      assert(got(r.getLong(0)) == ((words.length.toLong, expect)),
        s"doc ${r.getLong(0)}: got ${got(r.getLong(0))}, scalar ($expect)")
    }
  }

  test("subword tokens are conserved through the packing") {
    val total = TextOps.textTokensBpe(spark, dir)
      .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    val packed = TextOps.textSeqPackBpe(spark, dir)
      .agg(sum(col("seq_tokens"))).head().getLong(0)
    assert(total == packed, s"tokens in $total != tokens packed $packed")
  }

  test("every sequence except a source's last is filled to SeqLen") {
    val rows = TextOps.textSeqPackBpe(spark, dir)
      .select("source", "seq_id", "seq_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lastPerSource = rows.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._2).max
    }
    val underfilled = rows.filter { case (s, sq, t) =>
      sq != lastPerSource(s) && t != TextOps.SeqLen
    }
    assert(rows.nonEmpty && underfilled.isEmpty,
      s"non-final sequences not at SeqLen: ${underfilled.take(5).mkString(",")}")
  }

  /** Scalar reference BPE (r13, VERDICT r12 next #6): greedy
    * leftmost-first non-overlapping application of one merge to a
    * token vector — the textbook semantics the doubled-delimiter
    * `replace` trick must reproduce. */
  private def applyMerge(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  test("learned merges + per-doc counts reproduce a scalar reference BPE") {
    import graft.TestSpark.spark.implicits._
    val docsRows = TextOps.docs(spark, dir)
      .select(col("doc_id"), coalesce(col("text"), lit(""))).collect()
    val alpha = "[a-z]+".r
    val wordsPerDoc = docsRows.map(r =>
      r.getLong(0) -> alpha.findAllIn(r.getString(1)).toVector)
    val wc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    wordsPerDoc.foreach(_._2.foreach(w => wc(w) += 1L))
    // scalar learning loop: pair counts over distinct words weighted
    // by occurrence, argmax (count DESC, pair ASC), apply everywhere
    var state: Map[String, Vector[String]] =
      wc.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    val expectMerges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var r = 0
    var done = false
    while (r < TextOps.BpeMergeRounds && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      state.foreach { case (w, toks) =>
        (0 until toks.length - 1).foreach(i =>
          pc((toks(i), toks(i + 1))) += wc(w))
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), _) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        expectMerges += ((a, b))
        state = state.map { case (w, toks) => w -> applyMerge(toks, a, b) }
      }
      r += 1
    }
    val gotMerges = TextOps.bpeLearnMerges(spark, dir)
    assert(gotMerges == expectMerges.toSeq,
      s"learned ${gotMerges.take(5)}... expected ${expectMerges.take(5)}...")
    // and the gate's per-doc counts equal the scalar encode
    val got = TextOps.textTokensBpeMerges(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    wordsPerDoc.foreach { case (id, ws) =>
      val expect = ws.map(w => state(w).length.toLong).sum
      assert(got(id) == ((ws.length.toLong, expect)),
        s"doc $id: got ${got(id)}, scalar (${ws.length}, $expect)")
    }
  }

  test("merge application handles hostile adjacency chains exactly") {
    // a,b,a,b must merge BOTH pairs in one round (the shared doubled
    // boundary), and x,x,x must merge GREEDILY leftmost-first (xx, x)
    import graft.TestSpark.spark
    val chains = Seq("ababab", "xxx", "xxxx", "aaab", "abba")
    chains.foreach { w =>
      val viaReplace = {
        var s = "||" + w.map(c => s"$c||").mkString
        Seq(("a", "b"), ("x", "x")).foreach { case (a, b) =>
          s = s.replace(s"|$a||$b|", s"|$a$b|")
        }
        s.count(_ == '|') / 2 - 1
      }
      var toks = w.map(_.toString).toVector
      Seq(("a", "b"), ("x", "x")).foreach { case (a, b) =>
        toks = applyMerge(toks, a, b)
      }
      assert(viaReplace == toks.length,
        s"'$w': replace-trick $viaReplace tokens vs scalar ${toks.length}")
    }
  }

  test("subword budget diverges from the whitespace budget (the gap the gate exists for)") {
    // if the two counts coincided, BPE packing would pin nothing the
    // whitespace twin doesn't
    val joined = TextOps.textTokensBpe(spark, dir).alias("b")
      .join(TextOps.textTokens(spark, dir).alias("t"), "doc_id")
      .select(col("b.n_bpe_tokens"),
        col("t.n_ws_tokens").cast("bigint").as("n_ws_tokens")).collect()
    assert(joined.exists(r => r.getLong(0) != r.getLong(1)))
    // subword count can never undercut the word count: every word is
    // at least one piece
    assert(joined.forall(r => r.getLong(0) >= r.getLong(1) ||
      r.getLong(1) == 1)) // ws-count of '' text is 1 (split semantics)
  }
}
