package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (64-dim float vectors).
 *
 * Oracle strategy: cosine is a left-associated sum of per-element
 * double products with IDENTICAL IEEE operation order in both
 * engines ⇒ bit-exact doubles, no tolerance needed. The Spark side
 * folds via `aggregate(zip_with(...))` (constant-size codegen at any
 * dimension); the DuckDB twins stay explicit 64-term chains — same
 * order, same bits (0.0 + t1 is bit-equal to t1).
 *
 * Scale design (100 TB):
 *  - brute-force top-k: the query set is broadcast; the corpus is
 *    scanned once with no shuffle until the per-query top-k reduction.
 *    The row_number ≤ k filter plans as a PARTIAL WindowGroupLimit
 *    below the query_id exchange (per-partition k-heaps map-side) +
 *    a Final one above — so the shuffle carries ≤ k×|queries| rows
 *    per map partition, not |corpus|×|queries|, and the exact
 *    baseline itself survives large query sets (pinned in
 *    PlanAuditSpec);
 *  - ANN: sign-of-block-sum random-projection buckets (4-bit LSH)
 *    turn scoring into a bucket equi-join — the corpus never meets
 *    queries outside its bucket. Buckets are computed in the scan
 *    projection (no extra pass).
 */
object Similarity {

  import Tables.t

  /** The embeddings table spread across the session default
    * parallelism (opt r13, guide §2.5 input skew): the gate corpus is
    * ONE parquet file → a 1-partition scan, so pre-shuffle vector
    * stages ran serially on one core. Applied ONLY where the per-row
    * work is heavy enough to pay for the exchange — the 768-dim
    * family (withCodes' array build + codes + norms, the E768
    * projection, semantic-dedup cell assignment) and the per-vector
    * quantization transform — each a measured win at sf0.1 (e.g.
    * sim_ann_ivfpq_768 4.80→3.01 s, sim_semantic_dedup_768
    * 2.57→1.25 s, dedup-side twin numbers in OPTIMIZATION_r13.md).
    * The 64-dim gates were measured SLOWER under the floor (their
    * map work is too light to amortize the exchange + extra AQE
    * stages: sim_kmeans +1.2 s, sim_ann_ivf +0.9 s) and keep the
    * plain scan. Width derives from the cluster, never a constant. */
  private def embTable(spark: SparkSession, dir: String): DataFrame =
    Tables.floorByKey(t(spark, dir, "embeddings"), col("vec_id"))

  private val Dim = 64
  private val NumQueries = 10
  private val TopK = 5
  private val AnnTopK = 3
  private val NearDupThreshold = 0.35

  // --------------------------------------------------- column builders
  // r2 lesson: never unroll per-element chains (Janino megamethods,
  // compile-dominated at 64 dims, fatal at 768/1536). r2 used
  // aggregate(zip_with(...)) HOFs — constant codegen size, but HOFs
  // are CodegenFallback: interpreted per pair with a boxed
  // intermediate array. r3 final form: a native codegen'd
  // DotProductF expression (graft.functions) — primitive loop, zero
  // allocation, same left-associated IEEE fold from 0.0, so the
  // DuckDB twins' explicit term chains remain bit-exact.
  private def dotCol(a: String, b: String): Column =
    graft.functions.VectorFunctions.dotF(col(a), col(b))

  private def normCol(a: String): Column =
    sqrt(graft.functions.VectorFunctions.dotF(col(a), col(a)))

  /** Cosine with the zero-norm guard: a zero-norm vector has no
    * defined direction, so its cosine is NULL via NULLIF on the norm
    * product — identically in both engines (Spark-ANSI would THROW
    * DIVIDE_BY_ZERO where DuckDB yields NaN; NULL unifies them: it
    * ranks last under DESC in both, fails every >= threshold, and is
    * ignored by max/argmax). Found by the r5 hostile-embedding fuzz
    * sweep; see PARITY.md. */
  private[operators] def cosineOf(dot: Column, n1: Column, n2: Column): Column =
    dot / nullif(n1 * n2, lit(0.0))

  // ------------------------------------------------------ sql builders
  // (explicit term chains — the oracle runs once in DuckDB at tiny SF;
  // unrolled SQL text costs nothing there and guarantees bit parity)
  private def elemSql(arr: String, i: Int): String =
    s"CAST($arr[$i] AS DOUBLE)"

  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"${elemSql(a, i)} * ${elemSql(b, i)}").mkString(" + ")

  private def normSql(a: String): String =
    s"SQRT(${(1 to Dim).map(i => s"${elemSql(a, i)} * ${elemSql(a, i)}").mkString(" + ")})"

  private[operators] def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / NULLIF(${normSql(a)} * ${normSql(b)}, 0.0)"

  // ------------------------------------------------- brute-force top-k
  /** Exact cosine top-5 neighbors for each of the first 10 vectors.
    * Query side is broadcast; scoring is one codegen'd projection. */
  def simCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    // norms are computed once per vector in the scan projection, not
    // once per (vector, query) pair — same doubles, |Q|× less work
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        normCol("embedding").as("qnorm"))
    val scored = emb
      .select(col("vec_id"), col("embedding").as("e"), normCol("embedding").as("enorm"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(dotCol("e", "qe"), col("enorm"), col("qnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  val simCosineTopKSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id, embedding AS e FROM embeddings),
       |scored AS (
       |  SELECT query_id, vec_id, ${cosineSql("e", "qe")} AS cosine
       |  FROM c, q WHERE vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= $TopK
       |ORDER BY query_id, vec_id""".stripMargin

  // ------------------------------------------------------- LSH buckets
  /** 4-bit bucket: sign of each 16-dim block sum (a fixed random
    * projection). Same left-assoc float→double sums on both sides. */
  private def bucketCol(arr: String): Column =
    (0 until 4).map { p =>
      val blockSum = expr(s"aggregate(slice($arr, ${16 * p + 1}, 16), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))")
      when(blockSum > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  private def bucketSql(arr: String): String =
    (0 until 4).map { p =>
      val blockSum = (16 * p + 1 to 16 * p + 16).map(i => elemSql(arr, i)).mkString(" + ")
      s"CASE WHEN ($blockSum) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  /** ANN: cosine top-3 per query restricted to the query's LSH bucket —
    * the scale path (bucket equi-join instead of full scoring). */
  def simAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding").as("e"),
      bucketCol("embedding").as("bucket"), normCol("embedding").as("enorm"))
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        bucketCol("embedding").as("qbucket"), normCol("embedding").as("qnorm"))
    val scored = corpus
      .join(broadcast(queries), col("bucket") === col("qbucket") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(dotCol("e", "qe"), col("enorm"), col("qnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= AnnTopK)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  val simAnnLshSql: String =
    s"""WITH c AS (
       |  SELECT vec_id, embedding AS e, ${bucketSql("embedding")} AS bucket
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qe,
       |    ${bucketSql("embedding")} AS qbucket
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT query_id, vec_id, ${cosineSql("e", "qe")} AS cosine
       |  FROM c JOIN q ON bucket = qbucket AND vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= $AnnTopK
       |ORDER BY query_id, vec_id""".stripMargin

  // ---------------------------------------------------------- IVF ANN
  private val IvfK = 8 // centroids ("trained" = first K corpus vectors)
  private val IvfTopK = 3

  /** IVF-style ANN — the second scale path beside LSH: partition the
    * corpus into K inverted lists by nearest centroid, then search
    * only the query's own cell (nprobe = 1).
    *
    * Scale design: centroid assignment is a broadcast of K constant
    * vectors + a hash-aggregable argmax — max(score) per vector, then
    * an equality join-back taking max(cent_id) among the max-scorers
    * (scores are deterministic doubles, so the float-equality join is
    * safe; max(struct(...)) would express this in one pass but its
    * struct buffer planned SortAggregate, sorting K·|corpus| rows —
    * audited r3). The search is a cell equi-join exactly like the LSH
    * bucket join. At 100 TB, K grows to √N and the centroids come
    * from a sampled k-means, but the plan shape — broadcast-assign,
    * partial-agg argmax, cell equi-join — is unchanged. Ties (a
    * vector scoring equal against two centroids) break to the larger
    * cent_id in BOTH engines. */
  /** Corpus with cell assignment — (vec_id, embedding, vnorm, cell),
    * each vector mapped to its nearest of the K fixed centroids
    * (argmax cosine; ties break to the larger cent_id in BOTH
    * engines). Shared by the IVF ANN probe and the SemDeDup pass. */
  private def corpusWithCells(spark: SparkSession, dir: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    // 0 <= vec_id < K, not just < K: ids are not guaranteed
    // non-negative (fuzz corpora carry negatives), and a one-sided
    // predicate would let every negative-id vector into the broadcast
    // centroid set — the two-sided bound keeps it ≤ K rows by
    // construction.
    val cents = emb.filter(col("vec_id") >= 0 && col("vec_id") < IvfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        normCol("embedding").as("cnorm"))
    val cscores = emb
      .select(col("vec_id"), col("embedding"), normCol("embedding").as("vnorm"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"),
        cosineOf(dotCol("embedding", "cvec"), col("vnorm"), col("cnorm")).as("cscore"),
        col("cent_id"))
    val best = cscores.groupBy(col("vec_id").as("b_vec"))
      .agg(max(col("cscore")).as("ms"))
    val cells = cscores
      .join(best, col("vec_id") === col("b_vec") && col("cscore") === col("ms"))
      .groupBy(col("vec_id"))
      .agg(max(col("cent_id")).as("cell"))
    emb.select(col("vec_id") +: col("embedding") +:
        normCol("embedding").as("vnorm") +: extraCols.map(col): _*)
      .join(cells, "vec_id")
  }

  /** DuckDB twin of [[corpusWithCells]], ending in a `corpus` CTE.
    * Argmax is max-score + max(cent_id) among the max-scorers —
    * identical tie semantics; scores are bit-exact so the
    * float-equality join is safe. */
  private val cellsCtes: String =
    s"""cent AS (
       |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
       |  WHERE vec_id >= 0 AND vec_id < $IvfK),
       |cscores AS (
       |  SELECT e.vec_id, cent_id, ${cosineSql("e.embedding", "cvec")} AS cscore
       |  FROM embeddings e, cent),
       |best AS (SELECT vec_id, MAX(cscore) AS ms FROM cscores GROUP BY vec_id),
       |cells AS (
       |  SELECT s.vec_id, MAX(s.cent_id) AS cell
       |  FROM cscores s JOIN best b ON s.vec_id = b.vec_id AND s.cscore = b.ms
       |  GROUP BY s.vec_id),
       |corpus AS (
       |  SELECT e.vec_id, e.embedding, c.cell FROM embeddings e
       |  JOIN cells c ON e.vec_id = c.vec_id)""".stripMargin

  def simAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithCells(spark, dir)
    val queries = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("vnorm").as("qnorm"), col("cell").as("qcell"))
    val scored = corpus
      .join(broadcast(queries), col("cell") === col("qcell") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(dotCol("embedding", "qe"), col("vnorm"), col("qnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= IvfTopK)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  val simAnnIvfSql: String =
    s"""WITH $cellsCtes,
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qe, cell AS qcell
       |  FROM corpus WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT query_id, c.vec_id, ${cosineSql("c.embedding", "qe")} AS cosine
       |  FROM corpus c JOIN q ON c.cell = q.qcell AND c.vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= $IvfTopK
       |ORDER BY query_id, vec_id""".stripMargin

  // ------------------------------------------------------ filtered ANN
  /** Filtered ANN — the retrieval shape RAG serving actually runs:
    * top-k nearest neighbors SUBJECT TO a metadata predicate (here
    * `label % 2 = 0`). The filter is applied INSIDE the cell probe —
    * after routing, before scoring — which is the scale-correct
    * placement: post-filtering a fixed top-k under-returns when the
    * predicate is selective, and pre-filtering would rebuild the
    * index per predicate. The index (cell assignment) is built once
    * on the FULL corpus and the label column rides it, so the probe
    * is one equi-join with a pushed predicate on the build side —
    * same cost as the unfiltered probe at any corpus size. */
  def simAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithCells(spark, dir, extraCols = Seq("label"))
    val queries = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("vnorm").as("qnorm"), col("cell").as("qcell"))
    val scored = corpus
      .filter(col("label") % 2 === 0)
      .join(broadcast(queries), col("cell") === col("qcell") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosineOf(dotCol("embedding", "qe"), col("vnorm"), col("qnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= IvfTopK)
      .select(col("query_id"), col("vec_id"), col("label"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  val simAnnFilteredSql: String =
    s"""WITH $cellsCtes,
       |corpusl AS (
       |  SELECT c.vec_id, c.embedding, c.cell, e.label
       |  FROM corpus c JOIN embeddings e ON c.vec_id = e.vec_id),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qe, cell AS qcell
       |  FROM corpusl WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT query_id, c.vec_id, c.label,
       |    ${cosineSql("c.embedding", "qe")} AS cosine
       |  FROM corpusl c JOIN q ON c.cell = q.qcell AND c.vec_id <> query_id
       |  WHERE c.label % 2 = 0),
       |ranked AS (
       |  SELECT query_id, vec_id, label, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT query_id, vec_id, label, cosine FROM ranked WHERE rn <= $IvfTopK
       |ORDER BY query_id, vec_id""".stripMargin

  // ------------------------------------------- embedding near-dup pairs
  /** Embedding-cosine near-dup candidates: pairs in the same LSH
    * bucket with cosine ≥ 0.35 (this corpus's random vectors top out
    * at ~0.51). Bucket join keeps pair generation sub-quadratic. */
  def simEmbNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), bucketCol("embedding").as("bucket"),
        normCol("embedding").as("vnorm"))
    // merge-pinned like every pair self-join (plan-shape rule): cost
    // estimation broadcast the corpus-with-buckets side — linear
    // growth, fatal at 100 TB — instead of one shuffled exchange
    // reused by both sides (audited r3).
    emb.as("a")
      .join(emb.as("b").hint("merge"), col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineOf(dotCol("a.embedding", "b.embedding"),
          col("a.vnorm"), col("b.vnorm")).as("cosine"))
      .filter(col("cosine") >= NearDupThreshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val simEmbNearDupSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
       |  FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${cosineSql("a.embedding", "b.embedding")} AS cosine
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "b.embedding")} >= $NearDupThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ------------------------------------------- semantic dedup (SemDeDup)
  private val SemThreshold = 0.35

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus by nearest centroid, score
    * cosine only WITHIN each cluster, and keep one representative
    * (the lowest vec_id) of every near-duplicate pair. Output = the
    * surviving (vec_id, cell) corpus.
    *
    * This is the third candidate-generation shape beside hash buckets
    * (sim_emb_neardup) and band joins (dedup_minhash_lsh): cluster-
    * scoped pairing finds semantic duplicates that land in DIFFERENT
    * LSH buckets (no hash collision needed) while staying
    * sub-quadratic — pairs are bounded by the largest cell, not the
    * corpus.
    *
    * Scale design: cell assignment is the broadcast-argmax of
    * [[corpusWithCells]]; the within-cell self-join is merge-pinned so
    * both sides share ONE shuffle exchange on cell (cost estimation
    * would broadcast the linearly-growing corpus side — audited, same
    * rule as every pair self-join here). At 100 TB, K grows ~√N so
    * cells stay bounded, and the corpus-with-cells relation would be
    * checkpointed once rather than recomputed per consumer (here it
    * appears in the pair join and the final anti-join; at gate scale
    * the recompute is cheaper than the write). */
  def simSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithCells(spark, dir)
    val dropped = corpus.as("a")
      .join(corpus.as("b").hint("merge"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosineOf(dotCol("a.embedding", "b.embedding"),
        col("a.vnorm"), col("b.vnorm")) >= SemThreshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    corpus.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id"))
  }

  val simSemanticDedupSql: String =
    s"""WITH $cellsCtes,
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= $SemThreshold)
       |SELECT c.vec_id, c.cell FROM corpus c
       |WHERE c.vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY vec_id""".stripMargin

  // ------------------------------------------------ int8 quantization
  /** Per-vector int8 scalar quantization — the memory lever that makes
    * a 100 TB ANN index fit: 64 float32 dims → 64 byte codes + two
    * float scale params (4× smaller; at 768/1536 dims the same
    * projection applies unchanged thanks to the HOF form). code_i =
    * clamp(⌊(x_i − min) · 255 / (max − min)⌋, 255); constant vectors
    * quantize to all-zero. Pure per-row projection, zero shuffles; the
    * md5 over the code array certifies every code bit-exactly (floor
    * of identically-ordered IEEE arithmetic ⇒ identical integers
    * cross-engine). Reconstruction error / quantized-recall contracts
    * live in the spec, not the gate. */
  def simQuantized(spark: SparkSession, dir: String): DataFrame =
    embTable(spark, dir)
      .select(col("vec_id"),
        expr("CAST(array_min(embedding) AS DOUBLE)").as("mn"),
        expr("CAST(array_max(embedding) AS DOUBLE)").as("mx"),
        expr(
          """transform(embedding, x ->
            |  CASE WHEN CAST(array_max(embedding) AS DOUBLE) = CAST(array_min(embedding) AS DOUBLE)
            |       THEN 0L
            |       ELSE least(CAST(255 AS BIGINT),
            |         CAST(floor((CAST(x AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE)) * 255.0D
            |           / (CAST(array_max(embedding) AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE))) AS BIGINT))
            |  END)""".stripMargin).as("codes"))
      .select(col("vec_id"), col("mn"), col("mx"),
        expr("aggregate(codes, CAST(0 AS BIGINT), (a, c) -> a + c)").as("sum_codes"),
        md5(expr("array_join(transform(codes, c -> CAST(c AS STRING)), ',')")).as("codes_md5"))
      .orderBy(col("vec_id"))

  val simQuantizedSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    CAST(LIST_AGGREGATE(embedding, 'min') AS DOUBLE) AS mn,
      |    CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE) AS mx
      |  FROM embeddings),
      |c AS (
      |  SELECT vec_id, mn, mx,
      |    LIST_TRANSFORM(embedding, x ->
      |      CASE WHEN mx = mn THEN 0
      |           ELSE LEAST(255, CAST(FLOOR((CAST(x AS DOUBLE) - mn) * 255 / (mx - mn)) AS BIGINT))
      |      END) AS codes
      |  FROM e)
      |SELECT vec_id, mn, mx,
      |  CAST(LIST_AGGREGATE(codes, 'sum') AS BIGINT) AS sum_codes,
      |  md5(ARRAY_TO_STRING(codes, ',')) AS codes_md5
      |FROM c ORDER BY vec_id""".stripMargin

  // ------------------------------------------------- exact k-means
  private val KmK = 4
  private val KmIters = 2

  /** Codes on a FIXED global int8 grid (unlike `sim_quantized`'s
    * per-vector scale, which would destroy geometry): every engine
    * computes floor((x+1)·127.5) over doubles with identical single
    * operations, so codes are deterministic exact integers. */
  private val kmCodes =
    """transform(embedding, x ->
      |  GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
      |    CAST(FLOOR((CAST(x AS DOUBLE) + 1.0D) * 127.5D) AS BIGINT))))""".stripMargin

  /** K-means (Lloyd) over int8-quantized embeddings — clustering as a
    * first-class operator, with EVERY iteration exact: squared
    * distances and centroid updates are pure BIGINT arithmetic
    * (floor-division means), so two engines agree structurally, not
    * within a tolerance. K=4 centroids init from the first K vectors;
    * 2 full (assign, update) iterations; the output is the final
    * assignment's per-cluster size and total squared distance.
    *
    * Scale design (the MLlib pattern): centroids live on the DRIVER
    * (K×64 longs) and enter each assignment as LITERAL arrays, so
    * assignment is a pure codegen projection — no join, no window, no
    * shuffle; constant-size codegen at any corpus size. The update is
    * one posexplode + (cluster, pos) partial aggregation per
    * iteration — the only shuffles in the loop, carrying K×dims
    * partials. Empty clusters deterministically keep their previous
    * centroid. At 100 TB: identical shape, plus a centroid broadcast
    * instead of literals once K×dims outgrows the plan size. */
  def simKmeans(spark: SparkSession, dir: String): DataFrame = {
    val coded = t(spark, dir, "embeddings")
      .select(col("vec_id"), expr(kmCodes).as("codes"))

    var centroids: Array[Array[Long]] = coded.orderBy(col("vec_id"))
      .limit(KmK).collect()
      .map(_.getSeq[Long](1).toArray)

    // degenerate corpora are total, not crashes: an empty corpus has
    // no centroids (and no assignments) — return the empty result with
    // the gate schema; a corpus smaller than K simply runs with the
    // centroids it has (least() below needs the arg list to match)
    if (centroids.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "cluster BIGINT, n_vecs BIGINT, sum_dist BIGINT"))

    val k = centroids.length // = min(KmK, |corpus|)

    def withAssignment(df: DataFrame): DataFrame = {
      val dists = centroids.zipWithIndex.map { case (c, j) =>
        val lits = c.mkString("CAST(", " AS BIGINT), CAST(", " AS BIGINT)")
        expr(s"""aggregate(zip_with(codes, array($lits),
                |  (a, b) -> (a - b) * (a - b)),
                |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin).as(s"d$j")
      }
      val withD = df.select(col("vec_id") +: col("codes") +: dists.map(d => d): _*)
      val minD =
        if (k == 1) col("d0")
        else least((0 until k).map(j => col(s"d$j")): _*)
      // CASE tests j ascending, so ties pick the smallest j — same as
      // the oracle's ROW_NUMBER ... ORDER BY dist, j
      val cluster = (0 until k).foldRight(lit(-1L)) { (j, other) =>
        when(col(s"d$j") === minD, lit(j.toLong)).otherwise(other)
      }
      withD.withColumn("cluster", cluster).withColumn("dist", minD)
    }

    (1 to KmIters).foreach { _ =>
      val updates = withAssignment(coded)
        .select(col("cluster"), posexplode(col("codes")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(expr("SUM(v) DIV COUNT(1)").as("nv"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (j, rows) =>
          j -> rows.map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).map(_._2)
        }
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        updates.get(j.toLong).map(_.toArray).getOrElse(old)
      }
    }

    withAssignment(coded)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("sum_dist"))
      .orderBy(col("cluster"))
  }

  val simKmeansSql: String = {
    val codesDuck =
      """LIST_TRANSFORM(embedding, x ->
        |    GREATEST(0, LEAST(255, CAST(FLOOR((CAST(x AS DOUBLE) + 1.0) * 127.5) AS BIGINT))))""".stripMargin
    // one (distance → assign → update) round, unrolled per iteration
    def round(i: Int): String =
      s"""d$i AS (
         |  SELECT c.vec_id, e.j, SUM((c.v - e.v) * (c.v - e.v)) AS dist
         |  FROM cv c JOIN ce${i - 1} e ON c.p = e.p
         |  GROUP BY c.vec_id, e.j),
         |a$i AS (
         |  SELECT vec_id, j AS cluster, dist FROM d$i
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) = 1),
         |u$i AS (
         |  SELECT a.cluster AS j, c.p, SUM(c.v) // COUNT(*) AS v
         |  FROM a$i a JOIN cv c ON a.vec_id = c.vec_id
         |  GROUP BY 1, 2),
         |ce$i AS (
         |  SELECT e.j, e.p, COALESCE(u.v, e.v) AS v
         |  FROM ce${i - 1} e LEFT JOIN u$i u ON u.j = e.j AND u.p = e.p)""".stripMargin
    s"""WITH codes AS (
       |  SELECT vec_id,
       |    $codesDuck AS codes
       |  FROM embeddings),
       |init AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, codes
       |  FROM codes ORDER BY vec_id LIMIT $KmK),
       |pos AS (SELECT UNNEST(RANGE(1, 65)) AS p),
       |cv AS (SELECT vec_id, p, codes[p] AS v FROM codes, pos),
       |ce0 AS (SELECT j, p, codes[p] AS v FROM init, pos),
       |${(1 to KmIters).map(round).mkString(",\n")},
       |dF AS (
       |  SELECT c.vec_id, e.j, SUM((c.v - e.v) * (c.v - e.v)) AS dist
       |  FROM cv c JOIN ce$KmIters e ON c.p = e.p
       |  GROUP BY c.vec_id, e.j),
       |aF AS (
       |  SELECT vec_id, j AS cluster, dist FROM dF
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) = 1)
       |SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n_vecs,
       |  CAST(SUM(dist) AS BIGINT) AS sum_dist
       |FROM aF GROUP BY cluster ORDER BY cluster""".stripMargin
  }

  // ------------------------------------------------- ANN recall audit
  /** Measured ANN QUALITY, not just determinism: recall@$AnnTopK of
    * the LSH index against brute-force ground truth, per query — the
    * number every index tuning decision (plane count, bucket bits,
    * multi-probe) is made from. Composes the two existing pipelines:
    * exact top-$AnnTopK re-ranked from the brute-force gate, hit
    * counts via a semi-join, zero-hit queries retained by a left
    * join from the query list. All-integer output (hits, k) — exact
    * parity. At 100 TB recall is audited exactly like this on a
    * query SAMPLE; the ground-truth side prices at one brute-force
    * pass over the corpus per sampled query batch, which is why the
    * sample, not the full query log, feeds it. */
  def simAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val exact = simCosineTopK(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= AnnTopK)
      .select(col("query_id"), col("vec_id"))
    val ann = simAnnLsh(spark, dir).select(col("query_id"), col("vec_id"))
    val hits = exact.join(ann, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        lit(AnnTopK.toLong).as("k"))
      .orderBy(col("query_id"))
  }

  lazy val simAnnRecallSql: String =
    s"""WITH exact3 AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
       |    FROM ($simCosineTopKSql) ex) WHERE rn <= $AnnTopK),
       |ann3 AS (SELECT query_id, vec_id FROM ($simAnnLshSql) an),
       |hits AS (
       |  SELECT e.query_id, COUNT(*) AS n
       |  FROM exact3 e JOIN ann3 a USING (query_id, vec_id)
       |  GROUP BY e.query_id)
       |SELECT q.vec_id AS query_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       |  CAST($AnnTopK AS BIGINT) AS k
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id < $NumQueries) q
       |LEFT JOIN hits h ON q.vec_id = h.query_id
       |ORDER BY query_id""".stripMargin

  // --------------------------------------- product quantization ANN
  private val PqSub = 16 //  dims per subspace (4 subspaces over 64)
  private val PqK = 4 //     codebook entries per subspace
  private val PqTopK = 10

  /** IVF-PQ's memory half as a first-class operator: each vector
    * compresses to M=4 subspace codes (64 int8 dims → 4 codebook ids
    * — the 16× compression that makes billion-vector indexes fit),
    * and queries rank candidates by ADC (asymmetric distance): the
    * query's per-(subspace, codebook-entry) distance table replaces
    * any float work per candidate. Codebooks here are SAMPLED (the
    * first K vectors' subvectors — deterministic); production swaps
    * per-subspace Lloyd (`sim_kmeans` is exactly that kernel), the
    * plumbing is identical.
    *
    * Everything is exact BIGINT arithmetic on the int8 grid — encode
    * distances, LUT entries and ADC sums — so parity is structural,
    * and ties (equal distance) break to the lower codebook id /
    * vec_id in both engines.
    *
    * Scale shape: encode = one posexplode + broadcast of the K×D
    * codebook (256 rows) + partial agg on (vec_id, m, j) + a
    * Partial+Final WindowGroupLimit argmin — the corpus never
    * shuffles floats, only (id, m, j, dist) ints. The ADC probe
    * broadcasts the Q×M×K LUT (160 rows) and partial-aggregates the
    * per-(query, vec) sum; top-k is the same partial WindowGroupLimit
    * as the cosine baseline. At 100 TB the LUT stays driver-free and
    * query batches bound the N×Q expansion (the sim_cosine_topk
    * note); no driver collect anywhere — empty/sub-K corpora are
    * total by construction (empty codebook ⇒ empty result). */
  def simAnnPq(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val codes = t(spark, dir, "embeddings")
      .select(col("vec_id"), expr(kmCodes).as("codes"))
    val cv = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("p0", "v")))
      .select(col("vec_id"), expr(s"p0 DIV $PqSub").as("m"),
        col("p0").as("p"), col("v"))
    // two-sided id bound (see corpusWithCells): without `>= 0` every
    // negative-id vector joins the codebook and the documented
    // 256-row broadcast bound does not hold on such corpora
    val cb = cv.filter(col("vec_id") >= 0 && col("vec_id") < PqK)
      .select(col("vec_id").as("j"), col("p").as("cp"), col("v").as("cbv"))
    val encDist = cv.join(broadcast(cb), col("p") === col("cp"))
      .groupBy(col("vec_id"), col("m"), col("j"))
      .agg(sum((col("v") - col("cbv")) * (col("v") - col("cbv"))).as("dist"))
    val wEnc = w.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist"), col("j"))
    val enc = encDist.withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("j").as("code"))
    val lut = encDist.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("m").as("qm"),
        col("j").as("qj"), col("dist"))
    val adc = enc
      .join(broadcast(lut), col("m") === col("qm") && col("code") === col("qj"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dist")).as("adc_dist"))
    val wTop = w.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("vec_id"))
    adc.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= PqTopK)
      .select(col("query_id"), col("vec_id"), col("adc_dist"),
        col("rk").cast("bigint").as("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  val simAnnPqSql: String = {
    val codesDuck =
      """LIST_TRANSFORM(embedding, x ->
        |    GREATEST(0, LEAST(255, CAST(FLOOR((CAST(x AS DOUBLE) + 1.0) * 127.5) AS BIGINT))))""".stripMargin
    s"""WITH codes AS (
       |  SELECT vec_id, $codesDuck AS codes
       |  FROM embeddings),
       |pos AS (SELECT UNNEST(RANGE(1, 65)) AS p),
       |cv AS (SELECT vec_id, p, (p - 1) // $PqSub AS m, codes[p] AS v
       |       FROM codes, pos),
       |cb AS (SELECT vec_id AS j, p, v FROM cv
       |       WHERE vec_id >= 0 AND vec_id < $PqK),
       |enc_dist AS (
       |  SELECT c.vec_id, c.m, b.j, SUM((c.v - b.v) * (c.v - b.v)) AS dist
       |  FROM cv c JOIN cb b ON c.p = b.p
       |  GROUP BY 1, 2, 3),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM enc_dist
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, j) = 1),
       |lut AS (
       |  SELECT vec_id AS query_id, m, j, dist FROM enc_dist
       |  WHERE vec_id >= 0 AND vec_id < $NumQueries),
       |adc AS (
       |  SELECT l.query_id, e.vec_id, SUM(l.dist) AS adc_dist
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.j
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       |  CAST(rk AS BIGINT) AS rk
       |FROM (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rk
       |      FROM adc)
       |WHERE rk <= $PqTopK
       |ORDER BY query_id, rk""".stripMargin
  }

  // --------------------------------------------- hybrid IVF-PQ ANN
  private val IvfPqCand = 8 // ADC candidates per query before re-rank

  /** The production ANN stack composed end-to-end: IVF route (the
    * query probes ONE cell) → PQ ADC scoring inside the cell (integer
    * LUT sums, no float work per candidate) → exact cosine re-rank of
    * the top-[[IvfPqCand]] ADC survivors. This is the standard
    * billion-vector retrieval shape (FAISS IVFPQ + refine): the cell
    * equi-join bounds candidate generation, ADC bounds per-candidate
    * cost, and the exact re-rank touches only candidates — at 100 TB
    * no stage ever scores the full corpus per query.
    *
    * Plan shape: the INDEX — cell assignments and PQ code distances —
    * is built ONCE and materialized (localCheckpoint, the Dedup-CC
    * pattern); the probe plan reads the materialized index instead of
    * re-deriving the assignment subtree at every use (unchecked, the
    * composition re-expanded the corpus scan 14×). At 100 TB the
    * index is a persisted table (bucketed on cell) and this gate's
    * probe plan is exactly what queries pay: cell equi-join + LUT
    * broadcast (Q×M×K rows) + Partial+Final WindowGroupLimit
    * rankings. Recall ≥ the pure-PQ gate's by construction of the
    * re-rank (asserted in LmSemanticSpec on the same queries). */
  def simAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val corpus = corpusWithCells(spark, dir).localCheckpoint()
    // PQ encode — the sim_ann_pq kernel verbatim
    val codes = t(spark, dir, "embeddings")
      .select(col("vec_id"), expr(kmCodes).as("codes"))
    val cv = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("p0", "v")))
      .select(col("vec_id"), expr(s"p0 DIV $PqSub").as("m"),
        col("p0").as("p"), col("v"))
    val cb = cv.filter(col("vec_id") >= 0 && col("vec_id") < PqK)
      .select(col("vec_id").as("j"), col("p").as("cp"), col("v").as("cbv"))
    val encDist = cv.join(broadcast(cb), col("p") === col("cp"))
      .groupBy(col("vec_id"), col("m"), col("j"))
      .agg(sum((col("v") - col("cbv")) * (col("v") - col("cbv"))).as("dist"))
      .localCheckpoint() // feeds both enc and lut — one build pass
    val wEnc = w.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist"), col("j"))
    val enc = encDist.withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("j").as("code"))
    val lut = encDist.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("m").as("qm"),
        col("j").as("qj"), col("dist"))
    // IVF route: only codes of vectors in the query's cell survive
    val cells = corpus.select(col("vec_id").as("c_vec"), col("cell"))
    val qRoute = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("rq_id"), col("cell").as("qcell"))
    val candEnc = enc.join(cells, col("vec_id") === col("c_vec"))
      .join(broadcast(qRoute),
        col("cell") === col("qcell") && col("vec_id") =!= col("rq_id"))
    // ADC over routed candidates only
    val adc = candEnc.join(broadcast(lut),
        col("rq_id") === col("query_id") &&
          col("m") === col("qm") && col("code") === col("qj"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dist")).as("adc_dist"))
    val cand = adc.withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("vec_id"))))
      .filter(col("rk") <= IvfPqCand)
      .select(col("query_id"), col("vec_id"))
    // exact re-rank of the survivors
    val qe = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("rr_id"), col("embedding").as("qemb"),
        col("vnorm").as("qnorm"))
    val rerank = cand.join(corpus, "vec_id")
      .join(broadcast(qe), col("query_id") === col("rr_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(dotCol("embedding", "qemb"), col("vnorm"), col("qnorm")).as("cosine"))
    rerank.withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= IvfTopK)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  val simAnnIvfPqSql: String = {
    val codesDuck =
      """LIST_TRANSFORM(embedding, x ->
        |    GREATEST(0, LEAST(255, CAST(FLOOR((CAST(x AS DOUBLE) + 1.0) * 127.5) AS BIGINT))))""".stripMargin
    s"""WITH $cellsCtes,
       |codes AS (
       |  SELECT vec_id, $codesDuck AS codes
       |  FROM embeddings),
       |pos AS (SELECT UNNEST(RANGE(1, 65)) AS p),
       |cvq AS (SELECT vec_id, p, (p - 1) // $PqSub AS m, codes[p] AS v
       |        FROM codes, pos),
       |cbq AS (SELECT vec_id AS j, p, v FROM cvq
       |        WHERE vec_id >= 0 AND vec_id < $PqK),
       |enc_dist AS (
       |  SELECT c.vec_id, c.m, b.j, SUM((c.v - b.v) * (c.v - b.v)) AS dist
       |  FROM cvq c JOIN cbq b ON c.p = b.p
       |  GROUP BY 1, 2, 3),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM enc_dist
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, j) = 1),
       |lut AS (
       |  SELECT vec_id AS query_id, m, j, dist FROM enc_dist
       |  WHERE vec_id >= 0 AND vec_id < $NumQueries),
       |q_route AS (
       |  SELECT vec_id AS rq_id, cell AS qcell FROM corpus
       |  WHERE vec_id < $NumQueries),
       |adc AS (
       |  SELECT l.query_id, e.vec_id, SUM(l.dist) AS adc_dist
       |  FROM enc e
       |  JOIN cells cl ON e.vec_id = cl.vec_id
       |  JOIN q_route q ON cl.cell = q.qcell AND e.vec_id <> q.rq_id
       |  JOIN lut l ON l.query_id = q.rq_id AND e.m = l.m AND e.code = l.j
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, vec_id FROM adc
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, vec_id) <= $IvfPqCand),
       |rerank AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    ${cosineSql("c.embedding", "q.embedding")} AS cosine
       |  FROM cand
       |  JOIN corpus c ON cand.vec_id = c.vec_id
       |  JOIN corpus q ON cand.query_id = q.vec_id)
       |SELECT query_id, vec_id, cosine FROM rerank
       |QUALIFY ROW_NUMBER() OVER (
       |  PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= $IvfTopK
       |ORDER BY query_id, vec_id""".stripMargin
  }

  // ---------------------------------------------- MMR diverse top-k
  /** Maximal Marginal Relevance re-ranking (Carbonell–Goldstein 1998)
    * — the standard diversity pass a RAG retriever runs after ANN:
    * greedily pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), so
    * each pick is relevant AND far from what's already selected.
    *
    * Scale architecture: the DISTRIBUTED stage is candidate
    * generation — one corpus pass scoring rel(q, d) and a
    * TakeOrderedAndProject top-N (per-partition N-heaps, driver
    * merges |partitions|×N). The greedy stage is inherently
    * sequential in k, so it runs as k bounded Spark jobs over the
    * localCheckpoint'ed N-row candidate relation (the iterative
    * driver-coordination pattern of sim_kmeans / sim_ann_ivfpq; at
    * 100 TB N stays the retriever's candidate budget — hundreds —
    * regardless of corpus size, and nothing corpus-sized ever
    * reaches the loop). Each pick is an orderBy(limit 1) over ≤N
    * rows with the λ-blend evaluated in one fixed IEEE chain; ties
    * break on vec_id so the selection is total-ordered. The oracle
    * unrolls the same greedy as k chained CTEs over the identical
    * 64-term cosine chains — bit-exact, no tolerance. */
  private val MmrN = 12
  private val MmrK = 4
  private val MmrLambda = 0.7

  def simMmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), normCol("embedding").as("qnorm"))
    val cand = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").as("e"),
        normCol("embedding").as("enorm"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("e"), col("enorm"),
        cosineOf(dotCol("e", "qe"), col("enorm"), col("qnorm")).as("rel"))
      .orderBy(col("rel").desc_nulls_last, col("vec_id"))
      .limit(MmrN)
      .localCheckpoint() // N rows: the greedy loop never re-scans the corpus
    var selected = cand
      .orderBy(col("rel").desc_nulls_last, col("vec_id")).limit(1)
      .withColumn("rank", lit(1))
      .localCheckpoint()
    for (t <- 2 to MmrK) {
      val sel = broadcast(selected
        .select(col("vec_id").as("s_id"), col("e").as("se"),
          col("enorm").as("snorm")))
      val pick = cand
        .join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .crossJoin(sel)
        .select(col("vec_id"), col("e"), col("enorm"), col("rel"),
          cosineOf(dotCol("e", "se"), col("enorm"), col("snorm")).as("sim"))
        .groupBy(col("vec_id"), col("e"), col("enorm"), col("rel"))
        .agg(max(col("sim")).as("max_sim"))
        .withColumn("mmr",
          lit(MmrLambda) * col("rel") - lit(1.0 - MmrLambda) * col("max_sim"))
        .orderBy(col("mmr").desc_nulls_last, col("vec_id")).limit(1)
        .select(col("vec_id"), col("e"), col("enorm"), col("rel"))
        .withColumn("rank", lit(t))
      selected = selected.union(pick).localCheckpoint()
    }
    selected.select(col("rank"), col("vec_id"), col("rel"))
      .orderBy(col("rank"))
  }

  val simMmrSelectSql: String = {
    // the greedy unrolled: pick_t = argmax over cand \ s_{t-1} of
    // 0.7*rel - 0.3*max sim-to-selected; same literals, same chains
    def pickSql(t: Int): String =
      s"""m$t AS (
         |  SELECT c.vec_id, c.e, c.rel, MAX(${cosineSql("c.e", "s.e")}) AS ms
         |  FROM cand c, s${t - 1} s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM s${t - 1})
         |  GROUP BY c.vec_id, c.e, c.rel),
         |p$t AS (
         |  SELECT vec_id, e, rel, $t AS rank FROM m$t
         |  ORDER BY CAST('$MmrLambda' AS DOUBLE)*rel -
         |    CAST('${1.0 - MmrLambda}' AS DOUBLE)*ms DESC NULLS LAST, vec_id
         |  LIMIT 1),
         |s$t AS (SELECT * FROM s${t - 1} UNION ALL SELECT * FROM p$t)""".stripMargin
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT vec_id, embedding AS e, ${cosineSql("embedding", "qe")} AS rel
       |  FROM embeddings, q
       |  WHERE vec_id <> 0
       |  ORDER BY rel DESC NULLS LAST, vec_id LIMIT $MmrN),
       |s1 AS (
       |  SELECT vec_id, e, rel, 1 AS rank FROM cand
       |  ORDER BY rel DESC NULLS LAST, vec_id LIMIT 1),
       |${(2 to MmrK).map(pickSql).mkString(",\n")}
       |SELECT CAST(rank AS INT) AS rank, vec_id, CAST(rel AS DOUBLE) AS rel
       |FROM s$MmrK
       |ORDER BY rank""".stripMargin
  }

  // ---------------- production-dimensionality ANN (768-dim, nprobe>1)
  // The 64-dim gates prove the SHAPES; these two prove the same stack
  // at transformer dimensionality with production index parameters:
  // Dim=768, IVF nlist=16 with MULTI-probe (nprobe=4; the curve gate
  // sweeps 1→8), PQ with M=12 subspaces × 8 codebook entries, exact
  // 768-dim cosine re-rank through the codegen'd DotProductF (a
  // native loop — constant codegen size at any dimensionality; the r2
  // Janino-megamethod lesson is why no per-element chain exists on
  // the Spark side).
  private val PDim = 768
  private val PNlist = 16 // IVF cells ("trained" = first 16 corpus codes)
  private val PNprobe = 4 // cells probed by sim_ann_ivfpq_768
  private val PSub = 64 //   dims per PQ subspace → M = 12
  private val PPqK = 8 //    codebook entries per subspace
  private val PCand = 8 //   ADC survivors fed to the exact re-rank
  private val PTopK = 3
  private val CurveProbes = Seq(1, 2, 4, 8)

  /** Synthetic 768-dim embedding derived from the 64-dim base: each
    * output element mixes two PERMUTED base elements (strides 7 and
    * 13 are coprime to 64, so every block reads the full base in a
    * different order) under per-block weights that are exact powers
    * of two. Multiply-by-2⁻ᵏ and one addition are bit-identical IEEE
    * ops in Spark and DuckDB, so the vectors — and everything scored
    * from them — hash-match cross-engine with zero tolerance. The mix
    * makes the 768-dim geometry genuinely different from the 64-dim
    * gates' (not a scalar tiling, whose cosines would collapse back
    * to the 64-dim ones). */
  private val E768Spark: String =
    """transform(sequence(0, 767), i ->
      |  CAST(embedding[(i*7) % 64] AS DOUBLE) *
      |    (CASE (i div 64) % 3 WHEN 0 THEN 1.0D WHEN 1 THEN 0.5D ELSE 0.25D END) +
      |  CAST(embedding[(i*13 + (i div 64)) % 64] AS DOUBLE) *
      |    (CASE WHEN (i div 64) % 2 = 0 THEN 0.25D ELSE -0.5D END))""".stripMargin

  private val E768Duck: String =
    """LIST_TRANSFORM(RANGE(0, 768), i ->
      |  CAST(embedding[(i*7) % 64 + 1] AS DOUBLE) *
      |    (CASE (i // 64) % 3 WHEN 0 THEN CAST(1.0 AS DOUBLE) WHEN 1 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END) +
      |  CAST(embedding[(i*13 + (i // 64)) % 64 + 1] AS DOUBLE) *
      |    (CASE WHEN (i // 64) % 2 = 0 THEN CAST(0.25 AS DOUBLE) ELSE CAST(-0.5 AS DOUBLE) END))""".stripMargin

  /** int8 code grid for the 768-dim vectors (range ⊂ [-1.5, 1.5] by
    * construction of the weights; clamp keeps hostile inputs total). */
  private val Codes768Spark: String =
    "transform(e768, x -> greatest(0L, least(255L, " +
      "CAST(floor((x + 1.5D) * 85.0D) AS BIGINT))))"
  private val Codes768Duck: String =
    "LIST_TRANSFORM(e768, x -> GREATEST(0, LEAST(255, " +
      "CAST(FLOOR((x + CAST(1.5 AS DOUBLE)) * CAST(85.0 AS DOUBLE)) AS BIGINT))))"

  /** 768-dim dot for the oracle: an explicit term CHAIN (the 64-dim
    * house style) exceeds DuckDB's binder recursion depth at 768, so
    * the fold is LIST_REDUCE over the in-order products — DuckDB's
    * list_reduce is a sequential LEFT fold (verified: [1e16, 1,
    * -1e16] → 0.0), i.e. ((t1+t2)+t3)+… — exactly DotProductF's
    * left-associated summation (whose 0.0 seed adds nothing: 0.0+t1
    * ≡ t1 for every non-negative-zero t1, and products of the
    * fixture's nonzero elements never yield -0.0). */
  private def dot768Sql(a: String, b: String): String =
    s"LIST_REDUCE(LIST_TRANSFORM(RANGE(1, ${PDim + 1}), " +
      s"i -> $a[i] * $b[i]), (x, y) -> x + y)"
  private def cos768Sql(a: String, b: String): String =
    s"(${dot768Sql(a, b)}) / NULLIF(" +
      s"SQRT(${dot768Sql(a, a)}) * SQRT(${dot768Sql(b, b)}), 0.0)"

  /** Shared index build: (vec_id, e768, codes) + integer
    * centroid-distance relation. localCheckpoint'ed — the composition
    * reuses each exactly once per consumer instead of re-deriving the
    * scan subtree (the sim_ann_ivfpq pattern). */
  private def index768(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val emb = embTable(spark, dir)
      .select(col("vec_id"), expr(E768Spark).as("e768"))
      .withColumn("codes", expr(Codes768Spark))
      .localCheckpoint()
    val cv = emb
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("p0", "v")))
      .select(col("vec_id"), col("p0").as("p"),
        expr(s"p0 DIV $PSub").as("m"), col("v"))
      .localCheckpoint()
    val cent = cv.filter(col("vec_id") >= 0 && col("vec_id") < PNlist)
      .select(col("vec_id").as("cent_id"), col("p").as("cp"), col("v").as("cvv"))
    val cellDist = cv.join(broadcast(cent), col("p") === col("cp"))
      .groupBy(col("vec_id"), col("cent_id"))
      .agg(sum((col("v") - col("cvv")) * (col("v") - col("cvv"))).as("cdist"))
      .localCheckpoint()
    (emb, cv, cellDist)
  }

  /** Oracle CTE chain shared by both 768 gates (through `lut`). */
  private val index768Ctes: String =
    s"""e AS (SELECT vec_id, $E768Duck AS e768 FROM embeddings),
       |co AS (SELECT vec_id, e768, $Codes768Duck AS codes FROM e),
       |pos AS (SELECT UNNEST(RANGE(1, ${PDim + 1})) AS p),
       |cv AS (SELECT vec_id, p, (p - 1) // $PSub AS m, codes[p] AS v
       |       FROM co, pos),
       |cent AS (SELECT vec_id AS cent_id, p, v AS cvv FROM cv
       |         WHERE vec_id >= 0 AND vec_id < $PNlist),
       |celldist AS (
       |  SELECT cv.vec_id, cent_id, SUM((v - cvv) * (v - cvv)) AS cdist
       |  FROM cv JOIN cent ON cv.p = cent.p GROUP BY 1, 2),
       |cellrank AS (
       |  SELECT vec_id, cent_id, ROW_NUMBER() OVER (
       |    PARTITION BY vec_id ORDER BY cdist, cent_id) AS cr
       |  FROM celldist),
       |corpcell AS (SELECT vec_id, cent_id AS cell FROM cellrank WHERE cr = 1),
       |cb AS (SELECT vec_id AS j, p, v FROM cv
       |       WHERE vec_id >= 0 AND vec_id < $PPqK),
       |encdist AS (
       |  SELECT cv.vec_id, cv.m, cb.j, SUM((cv.v - cb.v) * (cv.v - cb.v)) AS dist
       |  FROM cv JOIN cb ON cv.p = cb.p GROUP BY 1, 2, 3),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM encdist
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, j) = 1),
       |lut AS (
       |  SELECT vec_id AS query_id, m, j, dist FROM encdist
       |  WHERE vec_id >= 0 AND vec_id < $NumQueries)""".stripMargin

  /** Spark half of the shared chain past the index: PQ encode, query
    * LUT, corpus cell, and query probe ranks (cr ≤ maxProbe). */
  private def probe768(spark: SparkSession, dir: String, maxProbe: Int):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
    val (emb, cv, cellDist) = index768(spark, dir)
    val cellRank = cellDist.withColumn("cr", row_number().over(
      w.partitionBy(col("vec_id")).orderBy(col("cdist"), col("cent_id"))))
    val corpCell = cellRank.filter(col("cr") === 1)
      .select(col("vec_id").as("c_vec"), col("cent_id").as("cell"))
    val qProbe = cellRank
      .filter(col("vec_id") >= 0 && col("vec_id") < NumQueries &&
        col("cr") <= maxProbe)
      .select(col("vec_id").as("q_id"), col("cent_id").as("qcell"),
        col("cr").as("probe_rank"))
    val cb = cv.filter(col("vec_id") >= 0 && col("vec_id") < PPqK)
      .select(col("vec_id").as("j"), col("p").as("cp"), col("v").as("cbv"))
    val encDist = cv.join(broadcast(cb), col("p") === col("cp"))
      .groupBy(col("vec_id"), col("m"), col("j"))
      .agg(sum((col("v") - col("cbv")) * (col("v") - col("cbv"))).as("dist"))
      .localCheckpoint()
    val enc = encDist.withColumn("rk", row_number().over(
        w.partitionBy(col("vec_id"), col("m")).orderBy(col("dist"), col("j"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("j").as("code"))
    val lut = encDist.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("lq_id"), col("m").as("qm"),
        col("j").as("qj"), col("dist"))
    (emb, corpCell, qProbe, enc, lut)
  }

  /** IVF(nprobe=4) → PQ-ADC → exact re-rank at 768 dims — the FAISS
    * IVFPQ+refine shape at transformer dimensionality. Multi-probe is
    * the production recall lever the 64-dim gate (nprobe=1) doesn't
    * exercise: the query scores candidates from its 4 nearest cells.
    *
    * Scale: identical plan skeleton to sim_ann_ivfpq — the corpus
    * never meets queries outside probed cells, ADC is integer LUT
    * sums, floats touch only the ≤ PCand×|Q| re-rank rows, and every
    * top-k plans as Partial+Final WindowGroupLimit (PlanAuditSpec).
    * Dimensionality enters ONLY through the codegen'd DotProductF
    * loop and the (bounded) code relations — nothing in the plan
    * grows with Dim. */
  def simAnnIvfPq768(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val (emb, corpCell, qProbe, enc, lut) = probe768(spark, dir, PNprobe)
    val adc = enc.join(corpCell, col("vec_id") === col("c_vec"))
      .join(broadcast(qProbe),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .join(broadcast(lut),
        col("q_id") === col("lq_id") && col("m") === col("qm") &&
          col("code") === col("qj"))
      .groupBy(col("q_id").as("query_id"), col("vec_id"))
      .agg(sum(col("dist")).as("adc_dist"))
    val cand = adc.withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("vec_id"))))
      .filter(col("rk") <= PCand)
      .select(col("query_id"), col("vec_id"))
    val qe = emb.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("rr_id"), col("e768").as("qe"))
    val rerank = cand.join(emb, "vec_id")
      .join(broadcast(qe), col("query_id") === col("rr_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(graft.functions.VectorFunctions.dotF(col("e768"), col("qe")),
          sqrt(graft.functions.VectorFunctions.dotF(col("e768"), col("e768"))),
          sqrt(graft.functions.VectorFunctions.dotF(col("qe"), col("qe"))))
          .as("cosine"))
    rerank.withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= PTopK)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  lazy val simAnnIvfPq768Sql: String =
    s"""WITH $index768Ctes,
       |qprobe AS (
       |  SELECT vec_id AS q_id, cent_id AS qcell, cr AS probe_rank
       |  FROM cellrank
       |  WHERE vec_id >= 0 AND vec_id < $NumQueries AND cr <= $PNprobe),
       |adc AS (
       |  SELECT q.q_id AS query_id, en.vec_id, SUM(l.dist) AS adc_dist
       |  FROM enc en
       |  JOIN corpcell cc ON en.vec_id = cc.vec_id
       |  JOIN qprobe q ON cc.cell = q.qcell AND en.vec_id <> q.q_id
       |  JOIN lut l ON l.query_id = q.q_id AND en.m = l.m AND en.code = l.j
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, vec_id FROM adc
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, vec_id) <= $PCand),
       |rerank AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    ${cos768Sql("ce.e768", "qe.e768")} AS cosine
       |  FROM cand
       |  JOIN e ce ON cand.vec_id = ce.vec_id
       |  JOIN e qe ON cand.query_id = qe.vec_id)
       |SELECT query_id, vec_id, cosine FROM rerank
       |QUALIFY ROW_NUMBER() OVER (
       |  PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= $PTopK
       |ORDER BY query_id, vec_id""".stripMargin

  /** Recall-vs-nprobe curve at 768 dims — THE index-tuning artifact:
    * for nprobe ∈ {1,2,4,8}, recall@$PTopK of the IVFPQ+re-rank stack
    * against exact 768-dim ground truth, summed over the query set.
    * One plan computes all four points: candidates carry their cell's
    * probe rank, the nprobe axis explodes from a 4-element literal,
    * and each (nprobe, query) ranks its own ADC/re-rank — so the
    * curve costs one candidate pass, not four. The ADC candidate
    * budget SCALES with nprobe (PCand per probed cell — the FAISS
    * convention: re-rank cost prices per probe); a fixed budget makes
    * the curve non-monotone, as extra cells' ADC-close-but-
    * cosine-poor vectors crowd out true neighbors. All-integer
    * output.
    *
    * Scale: ground truth prices one brute-force pass over the corpus
    * per sampled query batch (the sim_ann_recall note) — this is run
    * on a SAMPLE in production, and the curve decides nprobe for the
    * fleet. */
  def simAnnRecallCurve768(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // r9: index built on the ARRAY path (buildIvf768) — bit-equal to
    // the posexplode construction (the `_prod` gate pins that against
    // the shared oracle) at ~2× less build cost; the posexplode shape
    // itself stays exercised by sim_ann_ivfpq_768.
    val idx = buildIvf768(spark, dir, PNlist)
    val emb = idx.emb
    val lut = idx.lut
    val qProbe = idx.cellDistQ.withColumn("cr", row_number().over(
        w.partitionBy(col("vec_id")).orderBy(col("cdist"), col("cent_id"))))
      .filter(col("cr") <= CurveProbes.max)
      .select(col("vec_id").as("q_id"), col("cent_id").as("qcell"),
        col("cr").as("probe_rank"))
    val nps = spark.range(0, CurveProbes.length)
      .select(explode(array(CurveProbes.map(lit): _*)).as("nprobe")).distinct()
    val adc = idx.encCell
      .join(broadcast(qProbe),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .join(broadcast(nps), col("probe_rank") <= col("nprobe"))
      .join(broadcast(lut),
        col("q_id") === col("lq_id") && col("m") === col("qm") &&
          col("code") === col("qj"))
      .groupBy(col("nprobe"), col("q_id").as("query_id"), col("vec_id"))
      .agg(sum(col("dist")).as("adc_dist"))
    val cand = adc.withColumn("rk", row_number().over(
        w.partitionBy(col("nprobe"), col("query_id"))
          .orderBy(col("adc_dist"), col("vec_id"))))
      .filter(col("rk") <= col("nprobe") * PCand)
      .select(col("nprobe"), col("query_id"), col("vec_id"))
    val qe = emb.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("rr_id"), col("e768").as("qe"))
    val annTop = cand.join(emb, "vec_id")
      .join(broadcast(qe), col("query_id") === col("rr_id"))
      .select(col("nprobe"), col("query_id"), col("vec_id"),
        cosineOf(graft.functions.VectorFunctions.dotF(col("e768"), col("qe")),
          sqrt(graft.functions.VectorFunctions.dotF(col("e768"), col("e768"))),
          sqrt(graft.functions.VectorFunctions.dotF(col("qe"), col("qe"))))
          .as("cosine"))
      .withColumn("rk", row_number().over(
        w.partitionBy(col("nprobe"), col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= PTopK)
      .select(col("nprobe"), col("query_id"), col("vec_id"))
    // exact 768-dim ground truth (brute force, DotProductF scoring)
    val truth = emb
      .select(col("vec_id"), col("e768"))
      .crossJoin(broadcast(qe))
      .filter(col("vec_id") =!= col("rr_id"))
      .select(col("rr_id").as("query_id"), col("vec_id"),
        cosineOf(graft.functions.VectorFunctions.dotF(col("e768"), col("qe")),
          sqrt(graft.functions.VectorFunctions.dotF(col("e768"), col("e768"))),
          sqrt(graft.functions.VectorFunctions.dotF(col("qe"), col("qe"))))
          .as("cosine"))
      .withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= PTopK)
      .select(col("query_id"), col("vec_id"))
    val hits = annTop.join(truth, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
    nps.join(hits, Seq("nprobe"), "left")
      .select(col("nprobe").cast("bigint").as("nprobe"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        lit(NumQueries.toLong * PTopK).as("n_possible"))
      .orderBy(col("nprobe"))
  }

  lazy val simAnnRecallCurve768Sql: String =
    s"""WITH $index768Ctes,
       |qprobe AS (
       |  SELECT vec_id AS q_id, cent_id AS qcell, cr AS probe_rank
       |  FROM cellrank
       |  WHERE vec_id >= 0 AND vec_id < $NumQueries
       |    AND cr <= ${CurveProbes.max}),
       |nps AS (SELECT UNNEST([${CurveProbes.mkString(", ")}]) AS nprobe),
       |adc AS (
       |  SELECT nps.nprobe, q.q_id AS query_id, en.vec_id,
       |    SUM(l.dist) AS adc_dist
       |  FROM enc en
       |  JOIN corpcell cc ON en.vec_id = cc.vec_id
       |  JOIN qprobe q ON cc.cell = q.qcell AND en.vec_id <> q.q_id
       |  JOIN nps ON q.probe_rank <= nps.nprobe
       |  JOIN lut l ON l.query_id = q.q_id AND en.m = l.m AND en.code = l.j
       |  GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT nprobe, query_id, vec_id FROM adc
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY nprobe, query_id ORDER BY adc_dist, vec_id)
       |    <= nprobe * $PCand),
       |ann_top AS (
       |  SELECT nprobe, query_id, vec_id FROM (
       |    SELECT cand.nprobe, cand.query_id, cand.vec_id,
       |      ${cos768Sql("ce.e768", "qe.e768")} AS cosine
       |    FROM cand
       |    JOIN e ce ON cand.vec_id = ce.vec_id
       |    JOIN e qe ON cand.query_id = qe.vec_id)
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY nprobe, query_id ORDER BY cosine DESC, vec_id) <= $PTopK),
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qe.vec_id AS query_id, ce.vec_id,
       |      ${cos768Sql("ce.e768", "qe.e768")} AS cosine
       |    FROM e ce, e qe
       |    WHERE qe.vec_id >= 0 AND qe.vec_id < $NumQueries
       |      AND ce.vec_id <> qe.vec_id)
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= $PTopK),
       |hits AS (
       |  SELECT a.nprobe, COUNT(*) AS n_hits
       |  FROM ann_top a JOIN truth t
       |    ON a.query_id = t.query_id AND a.vec_id = t.vec_id
       |  GROUP BY a.nprobe)
       |SELECT CAST(nps.nprobe AS BIGINT) AS nprobe,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(${NumQueries * PTopK} AS BIGINT) AS n_possible
       |FROM nps LEFT JOIN hits h ON nps.nprobe = h.nprobe
       |ORDER BY nprobe""".stripMargin

  // ------------- parameterized production IVF (the √N nlist rule, r9)
  // The r8 soak measured above-linear per-query growth 10k→20k vectors
  // with nlist pinned at 16 (SCALE.md): probed candidates per query =
  // nprobe·N/nlist grow linearly when nlist is fixed. The FAISS rule is
  // nlist ~ √N, keeping probed candidates at nprobe·√N. Build cost is
  // N·nlist assignments — paid once per index build and amortized over
  // the query stream, which is why build and query are separate phases
  // here (the soak times them separately).

  /** √N rule, rounded UP to a power of two, floored at the gate shape
    * (16): 10k vecs → 128 cells, 50k → 256, 1M → 1024, 1B → 32768. */
  def nlistFor(n: Long): Int = {
    val target = math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt
    var p = PNlist
    while (p < target) p <<= 1
    p
  }

  /** Built 768-dim IVF-PQ index. The N-scale frames — `emb` (vec_id,
    * e768, codesD) and `encCell` (vec_id, cell, m, code — the cell
    * assignment pre-joined to the PQ codes, opt r14) — are
    * localCheckpoint'ed (re-deriving them re-expands the corpus
    * crossJoins); the Q-scale frames `cellDistQ` (query × cell
    * distances, for probe selection at any nprobe) and `lut` (query
    * ADC tables) stay lazy since opt r13 — their vec_id<Q filters push
    * below the broadcast crossJoins, so re-derivation touches only
    * query rows and each former checkpoint was a pure dispatch-floor
    * job per build. */
  /** `cent`/`cbSub` are the MODEL artifacts (nlist centroid rows,
    * M×K codebook rows) — carried so [[persistedAnn768]] persists the
    * build's exact frames instead of re-deriving near-twins;
    * [[queryIvf768]] never reads them. */
  case class Ivf768Index(emb: DataFrame, encCell: DataFrame,
      cellDistQ: DataFrame, lut: DataFrame,
      cent: DataFrame, cbSub: DataFrame)

  /** Array-based index build — the production shape of [[probe768]]:
    * identical math (Σ(v−c)² over int8 codes, ties by centroid id)
    * but computed as codegen'd whole-vector dot products over a
    * crossJoin with the BROADCAST centroid/codebook tables instead of
    * a 768-way posexplode join, so the assignment relation is
    * N×nlist ROWS (each one fused 768-loop) rather than
    * N×768×nlist JOIN ROWS — the difference between seconds and
    * hours once nlist grows past the pedagogic 16. Identity used:
    * Σ(v−c)² = Σv² − 2Σvc + Σc²; code values ≤ 255 over 768 terms
    * keep every sum < 2²⁶, exactly representable in double, so this
    * path is bit-equal to the BIGINT posexplode path (gated:
    * `sim_ann_ivfpq_768_prod` shares the 768 gate's DuckDB oracle). */
  /** The (vec_id, e768, codesD, norm2) projection every 768-dim
    * index participant starts from — corpus at build, queries at
    * probe, delta at append. */
  private def withCodes(df: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    df.select(col("vec_id"), expr(E768Spark).as("e768"))
      .withColumn("codesD",
        expr(s"transform($Codes768Spark, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm2", dotF(col("codesD"), col("codesD")))
  }

  /** Vector→centroid distance relation — (vec_id, cent_id, cdist);
    * `emb` must carry (vec_id, codesD, norm2). ONE expression shared
    * by the build, the persisted probe's query placement, and the
    * append gate's delta assignment — so "assigned against the
    * persisted model" is bit-identical to "assigned at build time" by
    * construction, not by parallel maintenance of twins. */
  private def cellDistOf(emb: DataFrame, cent: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    emb.select(col("vec_id"), col("codesD"), col("norm2"))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cent_id"),
        (col("norm2") - lit(2.0d) * dotF(col("codesD"), col("ccodes")) +
          col("cnorm2")).as("cdist"))
  }

  /** Nearest cell via a PACKED-LONG argmin: cdist is an exact
    * integer-valued double (≤ 768·255² < 2²⁶), so cdist·65536 +
    * cent_id is exact in BIGINT and min() over it is the
    * (cdist, cent_id)-lexicographic pick — same tie-break as the
    * oracle's ROW_NUMBER — while keeping the aggregate HASH-able
    * (min over a struct buffer plans SortAggregate) and map-side
    * partial: one row per (partition, vec) before the shuffle. */
  private def argminCell(cellDist: DataFrame): DataFrame =
    cellDist
      .select(col("vec_id"),
        (col("cdist").cast("bigint") * lit(65536L) + col("cent_id")).as("k"))
      .groupBy(col("vec_id")).agg(min(col("k")).as("k"))
      .select(col("vec_id").as("c_vec"), (col("k") % 65536L).as("cell"))

  /** Vector×codebook subspace distance relation — (vec_id, m, j,
    * dist); the ADC LUT for query vectors and the encode input for
    * corpus/delta vectors, from the same expression. */
  private def encDistOf(emb: DataFrame, cbSub: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    emb.select(col("vec_id"), col("codesD"))
      .crossJoin(broadcast(cbSub))
      .select(col("vec_id"), col("m"), col("j"),
        { val vslice = slice(col("codesD"),
            col("m").cast("int") * PSub + 1, lit(PSub))
          (dotF(vslice, vslice) - lit(2.0d) * dotF(vslice, col("cslice")) +
            col("cn2")).cast("bigint").as("dist") })
  }

  private def argminCode(encDist: DataFrame): DataFrame =
    encDist
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist"), col("j"))).as("s"))
      .select(col("vec_id"), col("m"), col("s.j").as("code"))

  def buildIvf768(spark: SparkSession, dir: String, nlist: Int): Ivf768Index = {
    import graft.functions.VectorFunctions.dotF
    // the packed-long argmin below reserves 16 bits for cent_id; a
    // larger nlist (nlistFor returns 65536+ above ~2^32 vectors) would
    // silently bleed cent_id into the cdist field and assign
    // wrong-but-plausible cells — fail loudly instead
    require(nlist <= 65536,
      s"buildIvf768: nlist=$nlist exceeds the 16-bit cent_id field of " +
        "the packed-long argmin (max 65536) — widen the pack multiplier " +
        "before raising nlist")
    val w = org.apache.spark.sql.expressions.Window
    val emb = withCodes(embTable(spark, dir)).localCheckpoint()
    val cent = emb.filter(col("vec_id") >= 0 && col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("codesD").as("ccodes"),
        col("norm2").as("cnorm2"))
    val cellDist = cellDistOf(emb, cent)
    val corpCell = argminCell(cellDist)
    // NOT checkpointed (opt r13): the Q filter pushes below the
    // centroid crossJoin, so a lazy cellDistQ re-derives Q×nlist rows
    // from the emb CHECKPOINT (never the corpus — only the ≤Q query
    // rows meet the broadcast centroids); its former localCheckpoint
    // was one pure-dispatch-floor job per index build. Same for lut
    // below (Q×M×K rows from the codebook crossJoin).
    val cellDistQ = cellDist
      .filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
    // PQ: codebook = first PPqK corpus vectors, per-subspace slices
    val mRange = (0 until PDim / PSub)
    val cbSub = emb.filter(col("vec_id") >= 0 && col("vec_id") < PPqK)
      .select(col("vec_id").as("j"), col("codesD"))
      .select(col("j"), explode(array(mRange.map(m =>
        struct(lit(m).as("m"),
          slice(col("codesD"), m * PSub + 1, PSub).as("cslice"))): _*)).as("e"))
      .select(col("j"), col("e.m").as("m"), col("e.cslice").as("cslice"))
      .withColumn("cn2", dotF(col("cslice"), col("cslice")))
    val encDist = encDistOf(emb, cbSub)
    val enc = argminCode(encDist)
    // encCell (opt r14): the (vec_id, cell, m, code) frame is the
    // assignment JOINED to the codes at build time, checkpointed as
    // ONE frame — the r13 build checkpointed corpCell and enc
    // separately (two driver actions) and every in-memory probe plan
    // re-joined them per query: an N-scale SortMergeJoin with TWO
    // exchanges (both sides re-shuffled on vec_id) in every probe.
    // The persisted layout already had this property via the shared
    // bucket spec; the in-memory index now matches it. One checkpoint
    // action instead of two, and the probe plans lose their only
    // N-scale shuffle.
    val encCell = enc.join(corpCell, col("vec_id") === col("c_vec"))
      .select(col("vec_id"), col("cell"), col("m"), col("code"))
      .localCheckpoint()
    val lut = encDist.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("lq_id"), col("m").as("qm"),
        col("j").as("qj"), col("dist"))
    Ivf768Index(emb, encCell, cellDistQ, lut, cent, cbSub)
  }

  /** Query phase against a built index: probe `nprobe` cells, ADC,
    * exact re-rank — the per-request cost the √N rule bounds. */
  def queryIvf768(idx: Ivf768Index, nprobe: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val qProbe = idx.cellDistQ.withColumn("cr", row_number().over(
        w.partitionBy(col("vec_id")).orderBy(col("cdist"), col("cent_id"))))
      .filter(col("cr") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id").as("qcell"))
    val adc = idx.encCell
      .join(broadcast(qProbe),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .join(broadcast(idx.lut),
        col("q_id") === col("lq_id") && col("m") === col("qm") &&
          col("code") === col("qj"))
      .groupBy(col("q_id").as("query_id"), col("vec_id"))
      .agg(sum(col("dist")).as("adc_dist"))
    val cand = adc.withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("vec_id"))))
      .filter(col("rk") <= PCand)
      .select(col("query_id"), col("vec_id"))
    val qe = idx.emb.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)
      .select(col("vec_id").as("rr_id"), col("e768").as("qe"))
    // the candidate side is ≤ |queries|·PCand rows by construction —
    // broadcast it EXPLICITLY so the re-rank fetch scans the corpus in
    // place (at 100 TB a stats-blind planner could otherwise shuffle
    // the full embeddings table to serve ~80 lookups)
    broadcast(cand).join(idx.emb.select(col("vec_id"), col("e768")), "vec_id")
      .join(broadcast(qe), col("query_id") === col("rr_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(graft.functions.VectorFunctions.dotF(col("e768"), col("qe")),
          sqrt(graft.functions.VectorFunctions.dotF(col("e768"), col("e768"))),
          sqrt(graft.functions.VectorFunctions.dotF(col("qe"), col("qe"))))
          .as("cosine"))
      .withColumn("rk", row_number().over(
        w.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= PTopK)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  /** Gate: the production array-based path at the 768 gate's
    * constants must reproduce the posexplode path's oracle exactly —
    * proving the two formulations compute the same index before the
    * soak trusts the scaled one. */
  def simAnnIvfPq768Prod(spark: SparkSession, dir: String): DataFrame =
    queryIvf768(buildIvf768(spark, dir, PNlist), PNprobe)

  // -------------------- persisted ANN index (r13): build once, probe per run
  private case class Ann768Tables(cells: String, codes: String,
      cents: String, codebook: String)

  /** Write-once-per-JVM registry of persisted ANN index table sets
    * (keyed by sf dir) — the [[Dedup.persistedCorpusIndex]] contract
    * applied to similarity search: the first caller per (JVM, sf dir)
    * pays the O(N·nlist) assignment + O(N·M·K) encoding ONCE; every
    * later gate run reads the tables. */
  private val persistedAnn768Tables =
    new java.util.concurrent.ConcurrentHashMap[String, Ann768Tables]()

  /** The IVF-PQ index materialized as four parquet tables — the
    * 100 TB deployment layout, where the index OUTLIVES the job that
    * built it:
    *  - `cells`  (c_vec, cell): the corpus→centroid assignment,
    *    bucketed on c_vec;
    *  - `codes`  (vec_id, m, code): the PQ codes, bucketed on vec_id
    *    with the SAME bucket count, so the probe's codes⋈cells join
    *    is satisfied straight from storage — no N-scale shuffle in
    *    any query plan;
    *  - `cents`  (cent_id, ccodes, cnorm2) and `codebook`
    *    (j, m, cslice, cn2): the tiny model tables (nlist and M·K
    *    rows) a query-time request needs to place itself — broadcast
    *    at probe time, never joined at corpus scale.
    * Doubles round-trip parquet bit-exactly, so a probe of the
    * persisted index is numerically IDENTICAL to one against the
    * in-memory build (`sim_ann_ivfpq_persisted` shares the 768
    * oracle verbatim — that identity is gated, not assumed). */
  private def persistedAnn768(spark: SparkSession, dir: String): Ann768Tables =
    Option(persistedAnn768Tables.get(dir))
      .getOrElse(writeAnn768(spark, dir))

  /** The build itself — ALWAYS writes (overwrite) and re-registers.
    * [[annIndexPersist]] calls this every invocation because the sink
    * gate's declared semantics ARE the build (VERDICT r13 next #1,
    * same attribution contract as [[Dedup.bandIndexPersist]]);
    * [[persistedAnn768]] only falls back to building when no builder
    * has run yet in this JVM. */
  private def writeAnn768(spark: SparkSession, dir: String): Ann768Tables = {
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val idx = buildIvf768(spark, dir, PNlist)
    def save(df: DataFrame, name: String, bucketCols: Seq[String]): String = {
      val table = s"graft_ann_${name}_$sfx"
      // ≤1 file per bucket (opt r14, guide §6, the bandIndexCompact
      // recipe): the bucketed writer emits one file per (task, bucket)
      // and the build frames arrive 32-partitioned — pre-exchange on
      // the writer's own Murmur3 bucket id so each task owns whole
      // buckets and every probe opens ≤8 files per table.
      val df1 =
        if (bucketCols.nonEmpty)
          df.repartition(8, pmod(hash(bucketCols.map(col): _*), lit(8)))
        else df
      val w0 = df1.write.mode("overwrite").format("parquet")
      val w1 =
        if (bucketCols.nonEmpty)
          w0.bucketBy(8, bucketCols.head, bucketCols.tail: _*)
            .sortBy(bucketCols.head, bucketCols.tail: _*)
        else w0
      w1.option("path", graft.core.Scratch.dir(s"ann_$name", dir))
        .saveAsTable(table)
      table
    }
    val tabs = Ann768Tables(
      cells = save(idx.encCell.select(col("vec_id").as("c_vec"), col("cell"))
        .distinct(), "cells", Seq("c_vec")),
      codes = save(idx.encCell.select(col("vec_id"), col("m"), col("code")),
        "codes", Seq("vec_id")),
      cents = save(idx.cent, "cents", Nil),
      codebook = save(idx.cbSub, "codebook", Nil))
    persistedAnn768Tables.put(dir, tabs)
    tabs
  }

  /** Probe the PERSISTED index: the query-side structures (query→
    * centroid distances, the per-(subspace, codebook-entry) LUT) are
    * computed fresh against the broadcast model tables — the work a
    * query REQUEST actually does in production — and the corpus-side
    * frames are table scans. The assignment/encode crossJoins exist
    * only over the $NumQueries query rows; the corpus never meets a
    * centroid or codebook entry in this plan (PlanAuditSpec pins
    * that shape). */
  def queryIvf768Persisted(spark: SparkSession, dir: String,
      nprobe: Int): DataFrame =
    probePersistedAnn(spark, dir, annQuerySlice(t(spark, dir, "embeddings")),
      nprobe)

  /** The gate fixture's query-set contract: vec_id ∈ [0, NumQueries).
    * Exposed so the streaming twin cuts the SAME slice from its
    * micro-batches. */
  private[operators] def annQuerySlice(df: DataFrame): DataFrame =
    df.filter(col("vec_id") >= 0 && col("vec_id") < NumQueries)

  /** Build (or reuse) the persisted index — called by the streaming
    * twin BEFORE its stream starts, so no micro-batch ever pays the
    * O(corpus) build. */
  private[operators] def ensurePersistedAnn(
      spark: SparkSession, dir: String): Unit = {
    persistedAnn768(spark, dir); ()
  }

  /** [[probePersistedAnn]] at the production operating point — the
    * per-request body a similarity-search service runs (the streaming
    * gate's per-micro-batch call). */
  private[operators] def probePersistedAnnProd(
      spark: SparkSession, dir: String, queryVecs: DataFrame): DataFrame =
    probePersistedAnn(spark, dir, queryVecs, PNprobe)

  /** The persisted-index probe with the QUERY side supplied as a
    * frame (raw embeddings schema): the request path of a similarity
    * service — queries arrive, place themselves against the broadcast
    * model tables, and search the bucketed artifacts. The batch gate
    * passes the fixture's query slice; the streaming twin passes each
    * micro-batch. */
  private[operators] def probePersistedAnn(spark: SparkSession, dir: String,
      queryVecs: DataFrame, nprobe: Int): DataFrame = {
    val tabs = persistedAnn768(spark, dir)
    val cents = spark.table(tabs.cents)
    val cb = spark.table(tabs.codebook)
    val qemb = withCodes(queryVecs).localCheckpoint()
    val cellDistQ = cellDistOf(qemb, cents)
    val lut = encDistOf(qemb, cb)
      .select(col("vec_id").as("lq_id"), col("m").as("qm"),
        col("j").as("qj"), col("dist"))
    val emb = embTable(spark, dir)
      .select(col("vec_id"), expr(E768Spark).as("e768"))
    // codes join cells rides the shared 8-bucket spec on
    // (vec_id ~ c_vec) — no shuffle on either N-scale side (the same
    // join the r13 probe planned; it is now spelled here instead of
    // inside queryIvf768, whose in-memory path gets it pre-joined)
    val encCell = spark.table(tabs.codes)
      .join(spark.table(tabs.cells), col("vec_id") === col("c_vec"))
      .select(col("vec_id"), col("cell"), col("m"), col("code"))
    queryIvf768(Ivf768Index(emb, encCell, cellDistQ, lut, cents, cb), nprobe)
  }

  /** Gate: `sim_ann_ivfpq_persisted` — the persisted-index probe must
    * reproduce the in-memory build's oracle exactly (same top-k, same
    * cosines, same tie-breaks). Shares [[simAnnIvfPq768Sql]]. */
  def simAnnIvfPq768Persisted(spark: SparkSession, dir: String): DataFrame =
    queryIvf768Persisted(spark, dir, PNprobe)

  /** Gate body for `sink_ann_index_persist` (registered with the sink
    * family — it certifies a persistence ARTIFACT, the
    * [[Dedup.bandIndexPersist]] pattern): build the four-table index
    * via [[persistedAnn768]], read the PERSISTED N-scale tables back,
    * and summarize per IVF cell — member count, XOR of member vec_ids
    * (order-independent, exact), and the m-weighted first moment of
    * the members' PQ codes — so any write/read corruption of the
    * assignment OR the code payload breaks the hash against an oracle
    * computed from the raw embeddings. The cells⋈codes certify join
    * rides the shared bucket spec (no shuffle on either N-scale
    * side). */
  private[operators] def annIndexPersist(
      spark: SparkSession, dir: String): DataFrame = {
    // the gate RUNS the build every call (its semantics) — see
    // [[writeAnn768]]; probe gates only read the registry
    val tabs = writeAnn768(spark, dir)
    annCellSummary(spark.table(tabs.cells), spark.table(tabs.codes))
  }

  /** The per-cell certification summary both index sink gates share:
    * member count, XOR of member vec_ids, m-weighted code moment. */
  private def annCellSummary(cells: DataFrame, codes: DataFrame): DataFrame = {
    val cellAgg = cells.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), expr("bit_xor(c_vec)").as("xor_vec"))
    val codeAgg = cells
      .join(codes, col("c_vec") === col("vec_id"))
      .groupBy(col("cell"))
      .agg(sum((col("m") + lit(1)) * col("code")).as("code_moment"))
    cellAgg.join(codeAgg, "cell")
      .select(col("cell").cast("bigint").as("cell"), col("n_vecs"),
        col("xor_vec"), col("code_moment").cast("bigint").as("code_moment"))
      .orderBy(col("cell"))
  }

  /** Gate body for `sink_ann_index_append` — daily EMBEDDING ingest,
    * the ANN twin of [[Dedup.dedupIndexAppendProbe]]'s maintenance
    * loop: the delta (vec_id % 5 = 0) is assigned and encoded against
    * the PERSISTED model tables ONLY — O(delta·nlist) + O(delta·M·K);
    * the corpus is never rescanned — and appended to gate-scoped
    * copies of the cells/codes tables seeded with the corpus slice.
    * Certification: the UPDATED index's per-cell summary must equal
    * the from-scratch oracle over ALL embeddings
    * ([[annIndexPersistSql]] VERBATIM) — if delta assignment via the
    * persisted model diverged by one bit from build-time assignment
    * (they share [[cellDistOf]]/[[encDistOf]] by construction, and
    * the model doubles round-trip parquet exactly), or the append
    * dropped/duplicated rows, the summary breaks the hash. The
    * gate-scoped tables are REBUILT (overwrite) each call so repeat
    * invocations are idempotent; production appends to the shared
    * tables with the identical statements. */
  private[operators] def annIndexAppend(
      spark: SparkSession, dir: String): DataFrame = {
    val tabs = persistedAnn768(spark, dir)
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    def save(df: DataFrame, name: String, mode: String,
        bucketCols: Seq[String]): String = {
      val table = s"graft_ann_${name}_apnd_$sfx"
      // same ≤1-file-per-bucket pre-exchange as the persist path
      df.repartition(8, pmod(hash(bucketCols.map(col): _*), lit(8)))
        .write.mode(mode).format("parquet")
        .bucketBy(8, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .option("path", graft.core.Scratch.dir(s"ann_${name}_apnd", dir))
        .saveAsTable(table)
      table
    }
    val cellsT = save(spark.table(tabs.cells).filter(col("c_vec") % 5 =!= 0),
      "cells", "overwrite", Seq("c_vec"))
    val codesT = save(spark.table(tabs.codes).filter(col("vec_id") % 5 =!= 0),
      "codes", "overwrite", Seq("vec_id"))
    val demb = withCodes(
      embTable(spark, dir).filter(col("vec_id") % 5 === 0))
      .localCheckpoint()
    save(argminCell(cellDistOf(demb, spark.table(tabs.cents))),
      "cells", "append", Seq("c_vec"))
    save(argminCode(encDistOf(demb, spark.table(tabs.codebook))),
      "codes", "append", Seq("vec_id"))
    spark.catalog.refreshTable(cellsT)
    spark.catalog.refreshTable(codesT)
    annCellSummary(spark.table(cellsT), spark.table(codesT))
  }

  private[operators] lazy val annIndexPersistSql: String =
    s"""WITH $index768Ctes,
       |cellagg AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |    CAST(BIT_XOR(vec_id) AS BIGINT) AS xor_vec
       |  FROM corpcell GROUP BY cell),
       |codeagg AS (
       |  SELECT cc.cell,
       |    CAST(SUM((en.m + 1) * en.code) AS BIGINT) AS code_moment
       |  FROM enc en JOIN corpcell cc ON en.vec_id = cc.vec_id
       |  GROUP BY 1)
       |SELECT CAST(a.cell AS BIGINT) AS cell, n_vecs, xor_vec, code_moment
       |FROM cellagg a JOIN codeagg c ON a.cell = c.cell
       |ORDER BY cell""".stripMargin

  // ------------- ANN-blocked semantic dedup at production dims (r9)
  private val SemDedup768Tau = 0.35

  /** SemDeDup at transformer dimensionality: near-dup candidate pairs
    * are generated by IVF-CELL BLOCKING (two vectors are compared iff
    * they share a nearest centroid) and confirmed by the exact 768-dim
    * cosine — the production shape of embedding dedup, where the
    * all-pairs O(N²) never exists: with nlist ∝ N/B the cell
    * population is bounded at B, so confirmed comparisons are ≤ N·B/2
    * regardless of corpus size (the gate runs nlist=16 at gate scale;
    * [[nlistFor]] is the sizing rule). Output is the per-cell audit a
    * dedup run ships: members, compared pairs, pairs over the bar,
    * and the cell's max cosine — all exactly reproducible (left-fold
    * dot, one IEEE division; grouped MAX/SUM of exact doubles are
    * order-independent). Cells of one member report zero pairs rather
    * than vanishing (report-don't-drop, PARITY.md #26). */
  def simSemanticDedup768(spark: SparkSession, dir: String): DataFrame =
    semanticDedup768Core(spark, dir, PNlist)

  /** [[simSemanticDedup768]] with the cell count as a parameter — the
    * soak drives this at nlistFor/constant-B sizings; the gate pins
    * nlist=16 (the oracle's shape). */
  private[graft] def semanticDedup768Core(spark: SparkSession, dir: String,
      nlist: Int): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    require(nlist <= 65536,
      s"semanticDedup768Core: nlist=$nlist exceeds the 16-bit cent_id " +
        "field of the packed-long argmin (max 65536)")
    val emb = embTable(spark, dir)
      .select(col("vec_id"), expr(E768Spark).as("e768"))
      .withColumn("codesD",
        expr(s"transform($Codes768Spark, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm2", dotF(col("codesD"), col("codesD")))
      .localCheckpoint()
    val cent = emb.filter(col("vec_id") >= 0 && col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("codesD").as("ccodes"),
        col("norm2").as("cnorm2"))
    val cells = emb.select(col("vec_id"), col("codesD"), col("norm2"))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cent_id"),
        (col("norm2") - lit(2.0d) * dotF(col("codesD"), col("ccodes")) +
          col("cnorm2")).as("cdist"))
      .select(col("vec_id"),
        // packed-long argmin (see buildIvf768): hash-aggregable,
        // exact, tie-broken by cent_id like the oracle's ROW_NUMBER
        (col("cdist").cast("bigint") * lit(65536L) + col("cent_id")).as("k"))
      .groupBy(col("vec_id")).agg(min(col("k")).as("k"))
      .select(col("vec_id"), (col("k") % 65536L).as("cell"))
    // merge-pinned (opt r13): with the parallelism-floor repartition
    // upstream, size estimates shrank enough that the planner flipped
    // this to a broadcast join — which killed the dedup between the
    // two pair-join sides and re-derived the O(corpus) cell-assignment
    // subtree twice (plan audit: reused 2→0, hashAgg +2). With the pin
    // the STATIC plan still prints the cell-assignment subtree on
    // both sides with no ReusedExchange node (ADVICE r13 #1); the
    // dedup happens at RUNTIME via AQE's shuffle-stage cache, which
    // recognizes the canonicalized twin exchanges and materializes
    // the stage once — and a broadcast of an N-scale side was never
    // the 100 TB shape anyway.
    val withV = cells.join(emb.select(col("vec_id"), col("e768"))
      .hint("merge"), "vec_id")
    val pairs = withV.as("a")
      .join(withV.as("b").hint("merge"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cell").as("cell"),
        cosineOf(dotF(col("a.e768"), col("b.e768")),
          sqrt(dotF(col("a.e768"), col("a.e768"))),
          sqrt(dotF(col("b.e768"), col("b.e768")))).as("c"))
    val pairStats = pairs.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("c") >= SemDedup768Tau, 1L).otherwise(0L))
          .as("n_neardup"),
        max(col("c")).as("max_cosine"))
    cells.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(pairStats, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        col("max_cosine"))
      .orderBy(col("cell"))
  }

  lazy val simSemanticDedup768Sql: String =
    s"""WITH $index768Ctes,
       |memb AS (SELECT cell, COUNT(*) AS n_members FROM corpcell
       |         GROUP BY cell),
       |p AS (
       |  SELECT a.cell AS cell,
       |    ${cos768Sql("ea.e768", "eb.e768")} AS c
       |  FROM corpcell a JOIN corpcell b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN e ea ON a.vec_id = ea.vec_id
       |  JOIN e eb ON b.vec_id = eb.vec_id),
       |ps AS (
       |  SELECT cell, COUNT(*) AS n_pairs,
       |    SUM(CASE WHEN c >= $SemDedup768Tau THEN 1 ELSE 0 END)
       |      AS n_neardup,
       |    MAX(c) AS max_cosine
       |  FROM p GROUP BY cell)
       |SELECT CAST(m.cell AS BIGINT) AS cell,
       |  CAST(m.n_members AS BIGINT) AS n_members,
       |  CAST(COALESCE(ps.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE(ps.n_neardup, 0) AS BIGINT) AS n_neardup,
       |  ps.max_cosine
       |FROM memb m LEFT JOIN ps ON m.cell = ps.cell
       |ORDER BY cell""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "sim_cosine_topk" -> ((simCosineTopK _, simCosineTopKSql)),
    "sim_mmr_select" -> ((simMmrSelect _, simMmrSelectSql)),
    "sim_ann_lsh" -> ((simAnnLsh _, simAnnLshSql)),
    "sim_ann_ivf" -> ((simAnnIvf _, simAnnIvfSql)),
    "sim_ann_filtered" -> ((simAnnFiltered _, simAnnFilteredSql)),
    "sim_emb_neardup" -> ((simEmbNearDup _, simEmbNearDupSql)),
    "sim_semantic_dedup" -> ((simSemanticDedup _, simSemanticDedupSql)),
    "sim_quantized" -> ((simQuantized _, simQuantizedSql)),
    "sim_kmeans" -> ((simKmeans _, simKmeansSql)),
    "sim_ann_recall" -> ((simAnnRecall _, simAnnRecallSql)),
    "sim_ann_pq" -> ((simAnnPq _, simAnnPqSql)),
    "sim_ann_ivfpq" -> ((simAnnIvfPq _, simAnnIvfPqSql)),
    "sim_ann_ivfpq_768" -> ((simAnnIvfPq768 _, simAnnIvfPq768Sql)),
    "sim_ann_ivfpq_768_prod" -> ((simAnnIvfPq768Prod _, simAnnIvfPq768Sql)),
    "sim_ann_ivfpq_persisted" -> ((simAnnIvfPq768Persisted _, simAnnIvfPq768Sql)),
    "sim_semantic_dedup_768" -> ((simSemanticDedup768 _, simSemanticDedup768Sql)),
    "sim_ann_recall_curve_768" -> ((simAnnRecallCurve768 _, simAnnRecallCurve768Sql)))
}
