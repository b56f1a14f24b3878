package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate-registry invariants. The registry is assembled by
  * concatenating every module's `all` Seq and calling `.toMap` — a
  * DUPLICATE gate name would silently drop one implementation (last
  * wins) while Verify/parity still pass against whichever survived
  * (found in r8: a second `alpaca_amihud` passed the full gate loop
  * without anyone noticing the first had been shadowed). */
class RegistrySpec extends AnyFunSuite {

  test("no duplicate gate names across modules") {
    val names = SparkEntry.registry.map(_._1)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate gate registrations: ${dups.mkString(", ")}")
  }

  test("every gate has a non-empty oracle and every oracle a gate") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(qs == os,
      s"gate/oracle key mismatch: noOracle=${qs -- os}, orphanOracle=${os -- qs}")
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }

  test("gate names are well-formed (lower snake case)") {
    val bad = SparkEntry.registry.map(_._1).filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"ill-formed gate names: ${bad.mkString(", ")}")
  }
}
