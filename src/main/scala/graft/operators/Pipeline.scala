package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus-curation pipeline — the composed 100 TB use case:
 * score every document (quality), near-dedup with MinHash+LSH (drop
 * the higher doc_id of each candidate pair with est-Jaccard ≥ 0.5),
 * keep documents above the quality bar, and report corpus stats per
 * predicted language.
 *
 * Every stage is one of this engine's gate operators, so the whole
 * pipeline inherits their scale shapes: projection-only scoring,
 * band-join dedup, one anti-join on the (tiny) drop list, and a final
 * partial aggregation. The DuckDB oracle composes the same CTEs —
 * the hash match certifies the full pipeline, not just its pieces.
 * Double stats are min/max (order-independent); sums are integral.
 */
object Pipeline {

  private val QualityBar = 0.55
  private val DedupThreshold = 0.5

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.qualityCore(spark, dir)
    val dropped = Dedup.minhashPairsCore(spark, dir)
      .filter(col("est_jaccard") >= DedupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val predicted = when(col("stop_ratio") >= 0.06, lit("en"))
      .otherwise(lit("unk")).as("predicted_lang")
    quality
      .join(dropped, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= QualityBar)
      .select(col("doc_id"), col("n_chars_actual"), col("quality_score"),
        predicted)
      .groupBy(col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars_actual")).as("sum_chars"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"))
      .orderBy(col("predicted_lang"))
  }

  val curateSql: String =
    s"""WITH ${Dedup.minhashPairsCtes},
       |dropped AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM est_pairs
       |  WHERE est_jaccard >= $DedupThreshold),
       |quality AS (${TextOps.qualitySelectSql}),
       |curated AS (
       |  SELECT doc_id, n_chars_actual, quality_score,
       |    CASE WHEN stop_ratio >= 0.06 THEN 'en' ELSE 'unk' END AS predicted_lang
       |  FROM quality
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |    AND quality_score >= $QualityBar)
       |SELECT predicted_lang, COUNT(*) AS n_docs, CAST(SUM(n_chars_actual) AS BIGINT) AS sum_chars,
       |  MIN(quality_score) AS min_quality, MAX(quality_score) AS max_quality
       |FROM curated
       |GROUP BY predicted_lang
       |ORDER BY predicted_lang""".stripMargin

  /** Curation with EXACT dedup semantics: drop every non-representative
    * member of each connected near-dup component (pairwise
    * drop-doc_b, above, under-merges transitive chains A~B~C — B
    * drops but C survives if (A,C) never became a candidate pair).
    * Same quality/langid stages; the drop list comes from the
    * `dedup_clusters` fixpoint instead of raw pairs. */
  def curateCc(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.qualityCore(spark, dir)
    val dropped = Dedup.clustersCore(spark, dir)
      .filter(col("label") =!= col("node"))
      .select(col("node").as("doc_id"))
    val predicted = when(col("stop_ratio") >= 0.06, lit("en"))
      .otherwise(lit("unk")).as("predicted_lang")
    quality
      .join(dropped, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= QualityBar)
      .select(col("doc_id"), col("n_chars_actual"), col("quality_score"),
        predicted)
      .groupBy(col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars_actual")).as("sum_chars"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"))
      .orderBy(col("predicted_lang"))
  }

  val curateCcSql: String =
    s"""WITH RECURSIVE ${Dedup.clusterCtes},
       |dropped AS (SELECT node AS doc_id FROM labels WHERE label <> node),
       |quality AS (${TextOps.qualitySelectSql}),
       |curated AS (
       |  SELECT doc_id, n_chars_actual, quality_score,
       |    CASE WHEN stop_ratio >= 0.06 THEN 'en' ELSE 'unk' END AS predicted_lang
       |  FROM quality
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |    AND quality_score >= $QualityBar)
       |SELECT predicted_lang, COUNT(*) AS n_docs, CAST(SUM(n_chars_actual) AS BIGINT) AS sum_chars,
       |  MIN(quality_score) AS min_quality, MAX(quality_score) AS max_quality
       |FROM curated
       |GROUP BY predicted_lang
       |ORDER BY predicted_lang""".stripMargin

  /** Train/test CONTAMINATION check — the audit every training
    * pipeline needs after splitting: near-duplicate pairs whose
    * members landed in DIFFERENT splits of the deterministic hash
    * split (a test doc with a train-side near-dup inflates eval).
    * Composes the MinHash candidate pairs with the hash-split
    * assignment: two equi-joins of the (tiny relative to the corpus)
    * pair list against the per-doc split projection — size-adaptive
    * joins, the pair list never grows past the LSH candidate set. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") % 100
    val splits = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        when(h < 80, lit("train")).when(h < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
    Dedup.minhashPairsCore(spark, dir)
      .filter(col("est_jaccard") >= DedupThreshold)
      .join(splits.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "split_a"), col("doc_a") === col("a_id"))
      .join(splits.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "split_b"), col("doc_b") === col("b_id"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val contaminationSql: String =
    s"""WITH ${Dedup.minhashPairsCtes},
       |splits AS (
       |  SELECT doc_id,
       |    CASE WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 80 THEN 'train'
       |         WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT doc_a, doc_b, sa.split AS split_a, sb.split AS split_b, est_jaccard
       |FROM est_pairs
       |JOIN splits sa ON doc_a = sa.doc_id
       |JOIN splits sb ON doc_b = sb.doc_id
       |WHERE est_jaccard >= $DedupThreshold AND sa.split <> sb.split
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------- hybrid two-signal dedup
  private val HybridJaccard = 0.3
  private val HybridCosine = 0.0

  /** Hybrid near-dedup: cheap lexical CANDIDATES (MinHash bands,
    * est-Jaccard ≥ 0.3) CONFIRMED by the embedding signal (cosine ≥ 0
    * between the pair's vectors) — the standard two-stage shape where
    * a hash generates candidates and a dense model adjudicates them.
    * On this synthetic corpus the embeddings are independent of the
    * text, so the confirmation exercises the mechanism (as langid's
    * gate does), not semantic ground truth.
    *
    * Scale design: the expensive signal (the 64-dim kernel cosine)
    * runs ONLY on the candidate pairs — |candidates| rows, never
    * corpus² — and the embedding join shuffles 256-byte vectors keyed
    * by doc id exactly twice. This is the composition that makes
    * embedding-grade dedup affordable at 100 TB: LSH bounds the pair
    * count, the kernel prices each pair at a constant. */
  def dedupHybrid(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    Dedup.minhashPairsCore(spark, dir)
      .filter(col("est_jaccard") >= HybridJaccard)
      .join(emb.select(col("vec_id").as("doc_a"), col("embedding").as("ea")), "doc_a")
      .join(emb.select(col("vec_id").as("doc_b"), col("embedding").as("eb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        // zero-norm guard as in Similarity.cosineOf (PARITY.md)
        (dotF(col("ea"), col("eb")) /
          nullif(sqrt(dotF(col("ea"), col("ea"))) * sqrt(dotF(col("eb"), col("eb"))),
            lit(0.0)))
          .as("cosine"))
      .filter(col("cosine") >= HybridCosine)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val dedupHybridSql: String =
    s"""WITH ${Dedup.minhashPairsCtes},
       |cand AS (
       |  SELECT doc_a, doc_b, est_jaccard FROM est_pairs
       |  WHERE est_jaccard >= $HybridJaccard),
       |scored AS (
       |  SELECT doc_a, doc_b, est_jaccard,
       |    ${Similarity.cosineSql("ea.embedding", "eb.embedding")} AS cosine
       |  FROM cand
       |  JOIN embeddings ea ON doc_a = ea.vec_id
       |  JOIN embeddings eb ON doc_b = eb.vec_id)
       |SELECT doc_a, doc_b, est_jaccard, cosine FROM scored
       |WHERE cosine >= $HybridCosine
       |ORDER BY doc_a, doc_b""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "pipeline_curate" -> ((curate _, curateSql)),
    "pipeline_curate_cc" -> ((curateCc _, curateCcSql)),
    "pipeline_contamination" -> ((contamination _, contaminationSql)),
    "dedup_hybrid" -> ((dedupHybrid _, dedupHybridSql)))
}
