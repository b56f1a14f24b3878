package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Flake-reproduction harness (VERDICT r8 next #1a): runs the full
  * Verify dump N times, EACH IN A FRESH JVM (the driver's conditions —
  * fresh session, fresh codegen cache, fresh task scheduling), then
  * compares the per-gate canonical self-hashes across runs and
  * byte-diffs the canonical row dumps of any gate that moved.
  *
  * Usage (fresh-JVM spawning needs a real classpath, so run via the
  * wrapper which exports it once):
  *   scripts/repeat_verify.sh <sfDir> <n> [gate,gate,...]
  * or directly:
  *   GRAFT_CP=$(cat target/cp.txt) java -cp $GRAFT_CP \
  *     graft.tools.RepeatVerify <sfDir> <outBase> <n> [gates]
  *
  * Exit 0 = every gate produced an identical canonical hash in every
  * run (the dump side is proven stable under repetition); exit 1 =
  * at least one gate flickered, and the first differing canonical
  * lines are printed with run indices — the localization the r8
  * flake hunt lacked.
  */
object RepeatVerify {
  // Keep in sync with build.sbt's jdk17AddOpens (Spark 4 on JDK 17+
  // outside spark-submit).
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val hashLine =
    """"([^"]+)":\s*\{"hash":\s*"([0-9a-f]+)",\s*"rows":\s*(\d+)\}""".r

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outBase = args(1)
    val n = args(2).toInt
    val gates = args.lift(3)
    val cp = sys.env.getOrElse("GRAFT_CP", System.getProperty("java.class.path"))
    val java = s"${System.getProperty("java.home")}/bin/java"
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")

    // GRAFT_REPEAT_ANALYZE_ONLY=1 re-runs only the comparison phase
    // over an existing outBase (e.g. after upgrading the hashers).
    if (!sys.env.get("GRAFT_REPEAT_ANALYZE_ONLY").contains("1")) {
      (1 to n).foreach { i =>
        val out = s"$outBase/run_$i"
        val cmd = (Seq(java) ++ addOpens ++ Seq(
          s"-Xmx$mem", "-Dspark.ui.enabled=false",
          "-Dspark.sql.session.timeZone=UTC",
          "-cp", cp, "graft.Verify", sfDir, out) ++ gates.toSeq)
        println(s"[repeat-verify] run $i/$n -> $out")
        val p = new ProcessBuilder(cmd.asJava).inheritIO().start()
        val rc = p.waitFor()
        require(rc == 0, s"verify run $i exited $rc")
      }
    }

    // gate -> run -> hash (forensics live in the sibling __forensics dir
    // so the driver never enumerates them as gates)
    val perRun: Seq[(Int, Map[String, String])] = (1 to n).map { i =>
      // r10 moved forensics to the sibling run_<i>__forensics dir;
      // fall back to the pre-r10 in-run layout so ANALYZE_ONLY still
      // works on dumps produced by older Verify builds, and name the
      // layout change if neither exists (ADVICE r10)
      val current = Paths.get(s"$outBase/run_${i}__forensics/_self_hash.json")
      val legacy = Paths.get(s"$outBase/run_$i/_self_hash.json")
      val path =
        if (Files.exists(current)) current
        else if (Files.exists(legacy)) legacy
        else throw new IllegalStateException(
          s"no _self_hash.json for run $i: looked in $current (r10+ layout) " +
            s"and $legacy (pre-r10 layout) — re-dump with the current Verify " +
            "or point outBase at a complete dump")
      val txt = Files.readString(path)
      i -> hashLine.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
    // gate -> run -> (data-region hash, full-file hash) (VERDICT r9
    // next #2): hashes the actual file bytes the driver reads, not
    // just canonical rows. Part-file NAMES carry task UUIDs and differ
    // per run by design, so the hash covers content bytes only,
    // concatenated in sorted-name order (coalesce(1) means one part
    // file per gate in practice). The hash is SPLIT at the thrift
    // footer boundary (trailer = 4-byte LE footer length + "PAR1"):
    // the r10 20×-run record proved the ONLY byte variance across
    // fresh JVMs is the footer's per-column `encodings` list order —
    // parquet-mr serializes a HashSet of Encoding enums whose
    // iteration order follows per-JVM identity hash codes — with
    // schema, statistics, page offsets and table values identical
    // (pyarrow-verified). Data pages must be byte-stable; the footer
    // artifact is library-internal and value-invariant, so it is
    // reported but not failed.
    val perRunBytes: Seq[(Int, Map[String, (String, String)])] = (1 to n).map { i =>
      val runDir = Paths.get(s"$outBase/run_$i")
      val m = Files.list(runDir).iterator().asScala
        .filter(p => Files.isDirectory(p))
        .map { gateDir =>
          val mdData = _root_.java.security.MessageDigest.getInstance("MD5")
          val mdFull = _root_.java.security.MessageDigest.getInstance("MD5")
          Files.list(gateDir).iterator().asScala
            .filter(p => p.getFileName.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.getFileName.toString)
            .foreach { p =>
              val bytes = Files.readAllBytes(p)
              mdFull.update(bytes)
              val n = bytes.length
              val dataEnd =
                if (n >= 12 && bytes(n - 4) == 'P' && bytes(n - 3) == 'A' &&
                  bytes(n - 2) == 'R' && bytes(n - 1) == '1') {
                  val fl = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) |
                    ((bytes(n - 6) & 0xff) << 16) | ((bytes(n - 5) & 0xff) << 24)
                  math.max(0, n - 8 - fl)
                } else n
              mdData.update(bytes, 0, dataEnd)
            }
          gateDir.getFileName.toString ->
            (mdData.digest().map("%02x".format(_)).mkString,
              mdFull.digest().map("%02x".format(_)).mkString)
        }.toMap
      i -> m
    }
    val allGates = perRun.flatMap(_._2.keys).distinct.sorted
    var unstable = 0
    var byteUnstable = 0
    var footerOnly = 0
    allGates.foreach { g =>
      val hs = perRun.map { case (i, m) => i -> m.get(g) }
      val distinct = hs.map(_._2).distinct
      if (distinct.size > 1) {
        unstable += 1
        println(s"[repeat-verify] UNSTABLE $g: " +
          hs.map { case (i, h) => s"run$i=${h.map(_.take(8)).getOrElse("MISSING")}" }
            .mkString(" "))
        // byte-diff the first two runs that disagree
        val byHash = hs.collect { case (i, Some(h)) => (i, h) }
        for {
          (i1, h1) <- byHash.headOption
          (i2, _) <- byHash.find(_._2 != h1)
        } {
          val p1 = Paths.get(s"$outBase/run_${i1}__forensics/_canon/$g.txt")
          val p2 = Paths.get(s"$outBase/run_${i2}__forensics/_canon/$g.txt")
          if (Files.exists(p1) && Files.exists(p2)) {
            val l1 = Files.readAllLines(p1).asScala
            val l2 = Files.readAllLines(p2).asScala
            val diffs = l1.zipAll(l2, "<missing>", "<missing>")
              .zipWithIndex.filter { case ((a, b), _) => a != b }.take(5)
            diffs.foreach { case ((a, b), ln) =>
              println(s"  line ${ln + 1}: run$i1=$a")
              println(s"  line ${ln + 1}: run$i2=$b")
            }
          } else {
            // Verify only captures canonical text for gates <= 20000 rows;
            // report and keep going rather than aborting the loop.
            println(s"  canonical text not captured for $g (>20000 rows)")
          }
        }
      }
      // parquet DATA-byte comparison is a hard check: a gate whose
      // canonical rows hold but whose data pages flicker indicates
      // nondeterministic row/row-group order inside the dump — the one
      // mechanism canonical hashing can't see. Footer-only variance is
      // the known parquet-mr encodings-set artifact (value-invariant)
      // and is reported informationally.
      val bs = perRunBytes.map { case (i, m) => i -> m.get(g) }
      if (bs.map(_._2.map(_._1)).distinct.size > 1) {
        byteUnstable += 1
        println(s"[repeat-verify] PARQUET-DATA-UNSTABLE $g" +
          (if (distinct.size == 1) " (canonical rows stable)" else "") + ": " +
          bs.map { case (i, h) =>
            s"run$i=${h.map(_._1.take(8)).getOrElse("MISSING")}" }
            .mkString(" "))
      } else if (bs.map(_._2.map(_._2)).distinct.size > 1) {
        footerOnly += 1
      }
    }
    println(s"[repeat-verify] ${allGates.size} gates x $n runs: " +
      s"${allGates.size - unstable} row-stable, $unstable row-unstable; " +
      s"${allGates.size - byteUnstable} parquet-data-byte-stable, " +
      s"$byteUnstable parquet-data-byte-unstable; $footerOnly footer-only " +
      "variance (known parquet-mr encodings-order artifact, not failed)")
    if (unstable > 0 || byteUnstable > 0) sys.exit(1)
  }
}
