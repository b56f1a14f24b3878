package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional 3rd arg: comma-separated gate names (local iteration only;
    // the driver always invokes with exactly two args = full dump)
    val only: Option[Set[String]] = rest.headOption.map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // constant-from-first-gate so no plan depends on gate order
    graft.core.SessionTuning.nanosAsLong(spark)
    new java.io.File(outDir).mkdirs()
    // Flake forensics (VERDICT r8 next #1a): alongside each dump,
    // persist a canonical self-hash computed FROM THE WRITTEN PARQUET
    // (so it certifies the dump file the driver will read, not just
    // the in-memory result) plus, for small gates, the full sorted
    // canonical text for byte-level diffing by RepeatVerify.
    // Forensics live in a SIBLING directory, never inside outDir: the
    // driver enumerates outDir's children as gates, so anything else
    // in there becomes a spurious correctness entry (r9's `_canon` err).
    val forensicsDir = s"${outDir.stripSuffix("/")}__forensics"
    new java.io.File(s"$forensicsDir/_canon").mkdirs()
    val selfHashes = scala.collection.mutable.LinkedHashMap[String, (String, Long)]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val lines = Canon.canonicalLines(spark.read.parquet(s"$outDir/$name"))
        selfHashes(name) = (Canon.md5(lines), lines.length.toLong)
        if (lines.length <= 20000)
          Files.writeString(Paths.get(s"$forensicsDir/_canon/$name.txt"),
            lines.mkString("", "\n", "\n"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val hashJson = selfHashes
      .map { case (k, (h, n)) => s""""$k": {"hash": "$h", "rows": $n}""" }
      .mkString("{", ",\n ", "}")
    Files.writeString(Paths.get(s"$forensicsDir/_self_hash.json"), hashJson)
    // provenance for mismatch adjudication: WHICH process produced
    // this dump, when, under what session knobs
    Files.writeString(Paths.get(s"$forensicsDir/_env.json"),
      s"""{"pid": ${ProcessHandle.current().pid()},
         | "spark": "${spark.version}",
         | "cpus": "$cpus", "sfDir": "$sfDir",
         | "wallclock_utc": "${java.time.Instant.now()}",
         | "shuffle_partitions": "${spark.conf.get("spark.sql.shuffle.partitions")}",
         | "timezone": "${spark.conf.get("spark.sql.session.timeZone")}",
         | "ansi": "${spark.conf.getOption("spark.sql.ansi.enabled")
          .getOrElse("default")}"}""".stripMargin)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    graft.stub.AlpacaStubServer.stop()
  }
}
