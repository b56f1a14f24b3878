package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-bench (r14): isolates the 128-permutation signature
  * aggregation cost under candidate configs/formulations.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AggBench [sfDir]" */
object AggBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.SessionTuning.nanosAsLong(spark)

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def shingles = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
        .as("shingle"))

    val h1 = conv(substring(md5(col("shingle")), 1, 14), 16, 10).cast("bigint")
    val h2 = conv(substring(md5(col("shingle")), 17, 13), 16, 10).cast("bigint")

    def sig128(pre: org.apache.spark.sql.DataFrame) = {
      val sigCols = (1 to 128).map { k =>
        min(col("h1") + lit(k.toLong) * col("h2")).as(s"s$k")
      }
      pre.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    }

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val pre = shingles.select(col("doc_id"), h1.as("h1"), h2.as("h2"))

    println("== shingle+hash projection only ==")
    time("proj")(pre)

    println("== agg default maxFields=100 ==")
    time("agg-default")(sig128(pre))

    println("== agg maxFields=200 ==")
    spark.conf.set("spark.sql.codegen.maxFields", "200")
    time("agg-maxFields200")(sig128(pre))
    spark.conf.unset("spark.sql.codegen.maxFields")

    println("== per-row array formulation (no wide agg) ==")
    // collect shingle hashes per doc, then one projection computes all
    // 128 minima with array_min (mirrors Streaming's per-row shape)
    def arrForm = {
      val hs = shingles
        .select(col("doc_id"), h1.as("h1"), h2.as("h2"))
        .groupBy(col("doc_id"))
        .agg(collect_list(array(col("h1"), col("h2"))).as("hs"))
        .withColumn("sigs", expr(
          "transform(sequence(1, 128), k -> array_min(transform(hs, h -> h[0] + CAST(k AS BIGINT) * h[1])))"))
        .select(col("doc_id"), col("sigs"))
      hs
    }
    time("agg-arrayform")(arrForm)

    spark.stop()
    graft.stub.AlpacaStubServer.stop()
  }
}
