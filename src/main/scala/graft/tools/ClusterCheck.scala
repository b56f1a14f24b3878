package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-readiness probe: runs the connector scan and a shuffled
  * dedup query on `local-cluster[2,2,...]` — TWO real executor JVMs
  * with real task/closure serialization and a real classpath, which
  * `local[32]` never exercises. Catches NotSerializableException,
  * singleton-object assumptions, and driver-only classpath bugs
  * before a real cluster would.
  *
  * The fixture stub stays in the DRIVER JVM; executors reach it over
  * loopback HTTP exactly as cluster executors reach a real API.
  *
  * Usage: sbt -batch "runMain graft.tools.ClusterCheck"
  * Prints CLUSTER_CHECK_OK=<n_bars>/<n_dedup> on success.
  */
object ClusterCheck {
  def main(args: Array[String]): Unit = {
    val classes = Seq("target/scala-2.13/classes")
      .map(p => new java.io.File(p).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1536]")
      .appName("graft-cluster-check")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // 1. Connector scan: DSv2 partitions + reader factory + parser
      //    all serialize to executor JVMs; columnar decode runs there.
      val bars = spark.read.format("Alpaca_Stocks_Bars")
        .options(Map(
          "endpoint" -> graft.stub.AlpacaStubServer.endpoint,
          "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
          "symbols" -> "['AAPL','MSFT']",
          "timeframe" -> "1Hour",
          "start" -> "2021-01-04T00:00:00Z",
          "end" -> "2021-01-06T00:00:00Z")).load()
      val nBars = bars.groupBy(col("symbol"))
        .agg(count(lit(1)).as("n"), sum(col("volume")).as("v"))
        .collect().map(_.getLong(1)).sum

      // 2. Shuffled dedup over parquet: exchange + hash agg across
      //    executors, md5/conv expressions codegen'd in executor JVMs.
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val nDedup = docs
        .withColumn("h", md5(col("text")))
        .groupBy(col("h")).agg(min(col("doc_id")).as("keep"))
        .count()

      // 3. Custom-kernel SQL through SparkSessionExtensions, codegen'd
      //    and executed in the executor JVMs over a distributed range.
      val nDot = spark.range(0, 1000, 1, 4)
        .selectExpr("graft_dot(array(CAST(id AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
        .selectExpr("CAST(sum(d) AS BIGINT) AS s").collect().head.getLong(0)

      // 3b. r7 partition/reader types (timeless object-record scan,
      //     meta dimension single-GET reader) serialize to executor
      //     JVMs and parse there too.
      val nSnap = spark.read.format("Alpaca_Stocks_Snapshots")
        .options(Map(
          "endpoint" -> graft.stub.AlpacaStubServer.endpoint,
          "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s",
          "symbols" -> "['AAPL','MSFT','GOOG']")).load().count()
      val nMeta = spark.read.format("Alpaca_Meta_Exchanges")
        .options(Map(
          "endpoint" -> graft.stub.AlpacaStubServer.endpoint,
          "APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s")).load().count()

      println(s"CLUSTER_CHECK_OK=$nBars/$nDedup/$nDot/$nSnap/$nMeta")

      // 4. Gate equivalence: representative gates (covering connector,
      //    dedup band-join, as-of window, HOF similarity, projection
      //    scoring) run UNMODIFIED on the 2-JVM cluster; their
      //    order-independent fingerprints must match local mode below.
      val gateDir = "/root/testdata/sf0.001"
      val clusterFps = gateNames.map(n => n -> fingerprint(
        graft.SparkEntry.queries(n)(spark, gateDir))).toMap
      spark.stop()

      val local = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        local.sparkContext.setLogLevel("WARN")
        val mismatches = gateNames.filter { n =>
          fingerprint(graft.SparkEntry.queries(n)(local, gateDir)) != clusterFps(n)
        }
        require(mismatches.isEmpty,
          s"cluster/local gate results differ: ${mismatches.mkString(",")}")
        println(s"CLUSTER_GATES_OK=${gateNames.size}")
      } finally local.stop()
    } finally {
      graft.stub.AlpacaStubServer.stop()
    }
  }

  private val gateNames = Seq(
    "q3_join_agg", "dedup_minhash_lsh", "asof_join", "sim_ann_lsh",
    "text_quality",
    // r5: the Bloom probe attaches a BloomFilter object to the plan
    // via addReferenceObj — local[*] never serializes plan
    // references, so THIS is the run that proves the filter survives
    // real executor-JVM shipping; incremental minhash rides along for
    // the in-join MatchCountF + WindowGroupLimit path
    "text_bloom_decontam", "dedup_incremental_minhash")

  /** Order-independent result fingerprint: (row count, sum of crc32
    * over the sorted-column row rendering). Identical values ⇒
    * identical multisets of rows, regardless of partitioning.
    * NULLs render as an explicit NUL (\\u0000) token — concat_ws SKIPS null
    * arguments, so (a, NULL, b) and (a, b, NULL) would otherwise
    * collide and hide a cluster/local divergence. */
  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.toIndexedSeq
      .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
    val r = df.select(concat_ws("|", cols: _*).as("s"))
      .agg(count(lit(1)).as("n"), sum(crc32(col("s"))).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }
}
