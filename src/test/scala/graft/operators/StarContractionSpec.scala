package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-shape checks of the two-phase large-star/small-star CC
  * engine (r10, replacing HashMin): the gate oracles certify VALUES on
  * the real pair graphs; these pin the properties the rewrite exists
  * for — correct labels on shapes chosen to break naive propagation,
  * and a round count that stays logarithmic on the exact topology
  * (a long path) where HashMin's diameter-bound cost exploded. */
class StarContractionSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def labelsOf(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    val out = Dedup.clustersFromPairs(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (out, Dedup.lastCcRounds)
  }

  test("long path (the HashMin worst case): exact labels, O(log n) rounds") {
    val n = 256L
    val (labels, rounds) = labelsOf((0L until n - 1).map(i => (i, i + 1)))
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "every node labels to the path min")
    // height halves per alternation: ~log2(256)=8 plus slack; HashMin
    // needed ~n rounds here and would have hit the iteration ceiling
    assert(rounds <= 12, s"path-256 took $rounds rounds")
  }

  test("descending chain ids (labels must flow against edge orientation)") {
    val n = 64L
    val (labels, _) = labelsOf((0L until n - 1).map(i => (n - 1 - i, n - 2 - i)))
    assert(labels.size == n && labels.values.forall(_ == 0L))
  }

  test("star + separate clique + isolated edge: per-component minima") {
    val star = (1L to 10L).map(i => (100L, 100L + i))
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val edge = Seq((50L, 51L))
    val (labels, rounds) = labelsOf(star ++ clique ++ edge)
    assert((1L to 10L).forall(i => labels(100L + i) == 100L) &&
      labels(100L) == 100L)
    assert((0L to 3L).forall(i => labels(i) == 0L))
    assert(labels(50L) == 50L && labels(51L) == 50L)
    assert(rounds <= 4)
  }

  test("seeded random graph matches a driver-side union-find") {
    val rng = new scala.util.Random(7)
    val n = 200
    val pairs = Seq.fill(180)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val (labels, _) = labelsOf(pairs)
    // reference union-find over the same edges
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> {
        // component min = min over nodes sharing the root
        val root = find(v.toInt)
        pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .filter(u => find(u.toInt) == root).min
      }).toMap
    assert(labels == expected)
  }
}
