package graft

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical, order-insensitive rendering of a gate's result, used to
  * self-hash every Verify dump (flake forensics, VERDICT r8 next #1a).
  *
  * The driver's correctness compare occasionally records
  * `hash_match:false` on gates whose Spark AND DuckDB sides are
  * provably deterministic (exact-integer outputs, unique ORDER BY
  * keys) — so the flicker lives in the compare pipeline, not the
  * computation. This canonical form is the adjudication instrument:
  * Verify persists `md5(sorted canonical rows)` per gate next to the
  * dump, RepeatVerify byte-diffs N fresh-JVM dumps against each other,
  * and any future driver mismatch can be checked against the hash the
  * builder shipped with that exact dump.
  *
  * Canonical form:
  *  - columns sorted by name (matching the driver's column sort);
  *  - doubles/floats rounded to 9 significant digits, `-0 → 0`,
  *    so last-bit aggregation-order noise can never flip the hash;
  *  - decimals via stripTrailingZeros, timestamps as UTC instants,
  *    binary as hex; arrays/maps/structs rendered recursively
  *    (map entries sorted — Spark map iteration order is not part of
  *    the value);
  *  - rows rendered to strings and SORTED, so file order is
  *    irrelevant.
  */
object Canon {
  def canonDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Inf"
    else if (d.isNegInfinity) "-Inf"
    else if (d == 0.0) "0" // collapses -0.0
    else new JBigDecimal(d)
      .round(new MathContext(9, RoundingMode.HALF_EVEN))
      .stripTrailingZeros.toString

  def renderValue(v: Any): String = v match {
    case null => "␀"
    case d: Double => canonDouble(d)
    case f: Float => canonDouble(f.toDouble)
    case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
    case s: scala.collection.Seq[_] =>
      s.map(renderValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => renderValue(k) + ":" + renderValue(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(renderValue).mkString("(", ",", ")")
    case ts: java.sql.Timestamp => ts.toInstant.toString
    case ts: java.time.Instant => ts.toString
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toString
    case bd: scala.math.BigDecimal => bd.underlying.stripTrailingZeros.toString
    case x => x.toString
  }

  /** Sorted canonical lines: columns by name, one rendered row per
    * line, lines sorted. Collects to the driver — gate outputs at
    * verify scale are small by construction. */
  def canonicalLines(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    val proj = df.selectExpr(cols.map(c => s"`$c`"): _*)
    val lines = proj.collect().map { r =>
      cols.indices.map(i => renderValue(r.get(i))).mkString("\u0001")
    }
    java.util.Arrays.sort(lines.asInstanceOf[Array[AnyRef]])
    lines
  }

  def md5(lines: Array[String]): String = {
    val d = MessageDigest.getInstance("MD5")
    lines.foreach { l => d.update(l.getBytes("UTF-8")); d.update('\n'.toByte) }
    d.digest().map(b => f"$b%02x").mkString
  }
}
