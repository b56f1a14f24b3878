package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable evidence for the scale techniques SCALE.md describes:
  * bucketing eliminates the join shuffle; salting splits a hot key
  * without changing results. Run at toy size — the PLAN SHAPE is the
  * assertion, and plan shape is scale-invariant. */
class ScaleTechniquesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse dir (./spark-warehouse, gitignored); tables
    // dropped in finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect() // force final plan under AQE
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"))
      // bucketed scan feeds the join directly: no shuffle under the join
      val shuffles = "Exchange hashpartitioning\\(\\w*[lo]_orderkey".r
        .findAllIn(plan).size
      assert(shuffles == 0, s"join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("salted join of a skewed key equals the plain join") {
    import spark.implicits._
    val Salt = 8
    // skewed fact: one hot key dominating
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong, i.toDouble))
      .toDF("key", "v")
    val dim = (1L to 5000L).map(k => (k, s"d$k")).toDF("key", "name")

    val plain = fact.join(dim, "key").groupBy("name")
      .agg(sum($"v").cast("decimal(18,1)").cast("double").as("s"))

    // salt: fact gets a random-ish (here deterministic) salt in [0,Salt);
    // dim is exploded Salt× so every salted key finds its match
    val saltedFact = fact.withColumn("salt", pmod($"v".cast("long"), lit(Salt)))
    val saltedDim = dim.withColumn("salt",
      explode(lit((0 until Salt).toArray)))
    val salted = saltedFact.join(saltedDim, Seq("key", "salt"))
      .groupBy("name").agg(sum($"v").cast("decimal(18,1)").cast("double").as("s"))

    val p = plain.orderBy("name").collect().toSeq
    val s = salted.orderBy("name").collect().toSeq
    assert(p == s)
  }

  test("per-partition pre-cap then exact window equals the one-window source cap") {
    // The TextOps.textSourceCap scale note: a hot source with billions
    // of docs makes the single rank-window reducer the bottleneck.
    // Two-phase form — each map partition keeps its N smallest
    // (hash, id) locally (mapPartitions, no shuffle), THEN the exact
    // window runs over ≤ N×partitions survivors. Admissible because
    // the global N smallest are a subset of the union of per-partition
    // N smallest. Survivor sets must be identical.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val n = 7
    val docs = (1 to 4000).map { i =>
      (i.toLong, s"src${i % 3}", f"h${(i * 2654435761L) % 100000}%06d")
    }.toDF("doc_id", "source", "h").repartition(13)

    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    val exact = docs.withColumn("rk", row_number().over(w))
      .filter($"rk" <= n).select("source", "doc_id", "rk")

    val preCapped = docs.repartition(13) // arbitrary placement, NOT by source
      .mapPartitions { it =>
        // local top-N per source within this partition
        val bySrc = scala.collection.mutable.Map[String,
          scala.collection.mutable.PriorityQueue[(String, Long)]]()
        it.foreach { r =>
          val (id, src, h) = (r.getLong(0), r.getString(1), r.getString(2))
          val pq = bySrc.getOrElseUpdate(src,
            scala.collection.mutable.PriorityQueue.empty[(String, Long)])
          pq.enqueue((h, id)) // max-heap on (h, id): root = current worst
          if (pq.size > n) pq.dequeue()
        }
        bySrc.iterator.flatMap { case (src, pq) => pq.iterator.map(t => (t._2, src, t._1)) }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING))
      .toDF("doc_id", "source", "h")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= n).select("source", "doc_id", "rk")

    assert(exact.orderBy("source", "rk").collect().toSeq ==
      preCapped.orderBy("source", "rk").collect().toSeq)
  }
}
