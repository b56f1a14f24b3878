package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.connector.AlpacaPartitioning

/** Property-style coverage of the partition planner (SURVEY §2.2
  * P1-P3): partitions tile [start,end] exactly — no gaps, no overlaps,
  * exact end clamp — over a seeded randomized sweep (an upgrade over
  * the reference's example-based tests). */
class PartitionMathSpec extends AnyFunSuite {

  private val Day = AlpacaPartitioning.DayMicros
  private val Hour = 3600L * 1000000L

  test("single interval when range fits in one partition interval") {
    val ps = AlpacaPartitioning.plan(Seq("A", "B"), 0L, Day / 2, Day)
    assert(ps.map(_.symbol) == Seq("A", "B"))
    assert(ps.forall(p => p.startMicros == 0L && p.endMicros == Day / 2))
  }

  test("zero-length range yields one partition per symbol") {
    val ps = AlpacaPartitioning.plan(Seq("A"), 42L, 42L, Day)
    assert(ps.size == 1 && ps.head.startMicros == 42L && ps.head.endMicros == 42L)
  }

  test("partitions tile the range: no gaps, no overlaps, exact clamp (500 random cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val start = rnd.nextLong(1000L * Day)
      val end = start + 1L + rnd.nextLong(400L * Day)
      val interval = Hour + rnd.nextLong(5L * Day)
      val ps = AlpacaPartitioning.plan(Seq("S"), start, end, interval)
      assert(ps.head.startMicros == start)
      assert(ps.last.endMicros == end, s"start=$start end=$end interval=$interval")
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(a.endMicros == b.startMicros)
        case _ =>
      }
      assert(ps.forall(p => p.startMicros <= p.endMicros))
    }
  }

  test("symbol × interval cross product ordering") {
    val ps = AlpacaPartitioning.plan(Seq("A", "B"), 0L, 3 * Day, Day)
    assert(ps.size == 6)
    assert(ps.take(3).forall(_.symbol == "A") && ps.drop(3).forall(_.symbol == "B"))
  }

  test("bars interval caps expected rows at limit×5 (bars.py:189-197)") {
    // 100 days of 1-minute bars = 144000 expected rows; limit 10000 →
    // ceil(144000/50000) = 3 intervals
    val range = 100L * Day
    val minute = 60L * 1000000L
    val interval = AlpacaPartitioning.barsIntervalMicros(0L, range, minute, 10000)
    val n = math.ceil(range.toDouble / interval).toLong
    assert(n == 3)
    // and small ranges collapse to a single interval
    assert(AlpacaPartitioning.barsIntervalMicros(0L, Day, Hour, 10000) == Day)
  }

  test("symbol_batch: batched plan covers exactly the unbatched grid (300 random cases)") {
    val rnd = new scala.util.Random(7)
    val pool = ('A' to 'Z').map(_.toString)
    (1 to 300).foreach { _ =>
      val syms = rnd.shuffle(pool).take(1 + rnd.nextInt(12)).toSeq
      val batch = 1 + rnd.nextInt(5)
      val start = rnd.nextLong(100L * Day)
      val end = start + 1L + rnd.nextLong(40L * Day)
      val interval = Hour + rnd.nextLong(3L * Day)
      val cfg = graft.connector.AlpacaScanConfig(
        endpoint = "", apiKeyId = "", apiKeySecret = "", rateLimitDelaySec = 0,
        params = Map.empty, symbols = syms, startMicros = start, endMicros = end,
        limit = 10000, symbolBatch = batch)
      val batched = AlpacaPartitioning.plan(cfg.groupedSymbols, start, end, interval)
      // split each comma-group back into per-symbol tiles: the union
      // must equal the unbatched plan's tile set exactly (no symbol
      // lost, none duplicated, identical time bounds)
      val flattened = batched.flatMap(p =>
        p.symbol.split(',').map(s => (s, p.startMicros, p.endMicros))).toSet
      val unbatched = AlpacaPartitioning.plan(syms, start, end, interval)
        .map(p => (p.symbol, p.startMicros, p.endMicros)).toSet
      assert(flattened == unbatched,
        s"syms=$syms batch=$batch start=$start end=$end interval=$interval")
      // request-grid shrink: ceil(|syms|/batch) groups per interval
      val expectGroups = (syms.size + batch - 1) / batch
      assert(batched.map(_.symbol).distinct.size == expectGroups)
    }
  }
}
