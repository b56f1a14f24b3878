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
