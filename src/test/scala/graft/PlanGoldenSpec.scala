package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanGolden

/** Global plan-shape regression guard: every auditable gate's physical
  * plan must match its committed node-count signature
  * (src/test/resources/plan_golden.txt). PlanAuditSpec pins a dozen
  * shapes in depth; this pins ALL of them in breadth — an extra
  * exchange, a join-strategy flip, or a lost WindowGroupLimit on ANY
  * gate fails with a one-line diff naming the gate and node kind.
  *
  * After an INTENTIONAL plan change, regenerate with
  *   sbt -batch "runMain graft.tools.PlanGolden"
  * and review the golden diff like code. */
class PlanGoldenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("every auditable gate matches its committed plan signature") {
    val src = Source.fromFile(PlanGolden.goldenPath, "UTF-8")
    val golden: Map[String, String] =
      try src.getLines().filter(_.nonEmpty).map { line =>
        val Array(n, s) = line.split(": ", 2)
        n -> s
      }.toMap
      finally src.close()
    val actual = PlanGolden.signatures(spark, "/root/testdata/sf0.001").toMap

    val missing = actual.keySet.diff(golden.keySet)
    assert(missing.isEmpty,
      s"gates without a golden signature (regenerate PlanGolden): $missing")
    val stale = golden.keySet.diff(actual.keySet)
    assert(stale.isEmpty, s"golden entries for removed gates: $stale")

    val diffs = actual.toSeq.sorted.flatMap { case (n, s) =>
      if (golden(n) == s) None
      else Some(s"$n:\n  golden: ${golden(n)}\n  actual: $s")
    }
    assert(diffs.isEmpty, "plan shapes changed:\n" + diffs.mkString("\n"))
  }
}
