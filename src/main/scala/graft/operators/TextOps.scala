package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Text-analysis operators for a training-data pipeline, over the
 * `documents` table. All pure per-row projections + one aggregation-
 * free pass — at 100 TB these pipeline into the scan with zero
 * shuffles (WholeStageCodegen all the way); only the final ORDER BY
 * (oracle determinism, not part of the operator) sorts.
 *
 * Every operator carries a full DuckDB oracle: arithmetic only on
 * lengths/counts plus double division — deterministic cross-engine.
 */
object TextOps {
  import Tables.t

  private val Stopwords = Seq("the", "a", "of", "and", "in", "is")

  private[operators] def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")

  /** [[docs]] spread across the session default parallelism (opt r13,
    * guide §2.5 input skew): the gate corpus is ONE parquet file → a
    * 1-partition scan, so a pre-shuffle n-gram explode + md5 ran
    * serially on one core. Used ONLY by the gram-digest gates (5/8-
    * gram decontam and substring dedup, chunk digests) whose per-row
    * map work is heavy enough to pay for the exchange — the same
    * measured trade as Dedup.shingleDfFrom (2-4× at sf0.1). A blanket
    * floor on every docs() consumer was measured and REVERTED: gates
    * whose heavy work already sits post-shuffle (the BPE vocab fold,
    * the packing cumsums) only gained exchanges (+0.3-0.7 s each).
    * Width derives from the cluster, never a constant. */
  private[operators] def docsPar(spark: SparkSession, dir: String): DataFrame =
    Tables.floorByKey(docs(spark, dir), col("doc_id"))

  // ----------------------------------------------------------- langid
  /** Language-ID heuristic: ratio of English stopword tokens among all
    * tokens; ≥ 0.06 → 'en', else 'unk'. (On this synthetic corpus the
    * lang label is independent of the text — the mechanism, not label
    * recovery, is what's exercised.) */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    docs(spark, dir).select(
      col("doc_id"),
      col("lang"),
      size(expr(s"filter(split(text, ' '), x -> x IN ($inList))")).as("n_stop"),
      size(w).as("n_words"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn("predicted_lang",
        when(col("stop_ratio") >= 0.06, lit("en")).otherwise(lit("unk")))
      .orderBy(col("doc_id"))
  }

  val textLangidSql: String = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, lang,
       |  LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x IN ($inList))) AS n_stop,
       |  LEN(STRING_SPLIT(text, ' ')) AS n_words,
       |  CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x IN ($inList))) AS DOUBLE)
       |    / LEN(STRING_SPLIT(text, ' ')) AS stop_ratio,
       |  CASE WHEN CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x IN ($inList))) AS DOUBLE)
       |    / LEN(STRING_SPLIT(text, ' ')) >= 0.06 THEN 'en' ELSE 'unk' END AS predicted_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- quality
  /** Quality scoring: length, word count, mean word length, digit and
    * uppercase ratios, stopword ratio → one linear score. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    textQualityUnordered(spark, dir).orderBy(col("doc_id"))

  private def textQualityUnordered(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    val len = length(col("text")).cast("double")
    val nWords = size(w).cast("double")
    val nStop = size(expr(s"filter(split(text, ' '), x -> x IN ($inList))")).cast("double")
    // empty document ⇒ len = 0: digit_ratio is undefined (NULL in both
    // engines — ANSI mode would throw DIVIDE_BY_ZERO, the oracle uses
    // NULLIF). nWords needs no guard: split('', ' ') = [''] has size 1
    // in Spark and DuckDB alike, so word denominators are always >= 1.
    val digitRatio = when(len > 0,
      (len - length(regexp_replace(col("text"), "[0-9]", ""))) / len)
    val meanWordLen = (len - (nWords - 1)) / nWords
    val stopRatio = nStop / nWords
    val score = stopRatio * 2.0 + meanWordLen * 0.1 - digitRatio * 1.0
    docs(spark, dir).select(
      col("doc_id"),
      len.cast("bigint").as("n_chars_actual"),
      nWords.cast("bigint").as("n_words"),
      meanWordLen.as("mean_word_len"),
      stopRatio.as("stop_ratio"),
      digitRatio.as("digit_ratio"),
      score.as("quality_score"))
  }

  /** Unordered quality rows (reused by pipelines). */
  private[operators] def qualityCore(spark: SparkSession, dir: String): DataFrame =
    textQualityUnordered(spark, dir)

  val textQualitySql: String = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    val len = "CAST(LENGTH(text) AS DOUBLE)"
    val nWords = "CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)"
    val nStop = s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x IN ($inList))) AS DOUBLE)"
    val digitRatio =
      s"($len - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g'))) / NULLIF($len, 0)"
    val meanWordLen = s"($len - ($nWords - 1)) / $nWords"
    val stopRatio = s"$nStop / $nWords"
    s"""SELECT doc_id,
       |  CAST($len AS BIGINT) AS n_chars_actual,
       |  CAST($nWords AS BIGINT) AS n_words,
       |  $meanWordLen AS mean_word_len,
       |  $stopRatio AS stop_ratio,
       |  $digitRatio AS digit_ratio,
       |  $stopRatio * 2.0 + $meanWordLen * 0.1 - $digitRatio * 1.0 AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Quality SELECT without the ORDER BY, usable as a CTE body. */
  private[operators] val qualitySelectSql: String =
    textQualitySql.stripSuffix(" ORDER BY doc_id").replace("FROM documents ORDER BY doc_id", "FROM documents")

  // ----------------------------------------------------------- tokens
  /** Token counting: whitespace tokens, alpha tokens via regex, and a
    * BPE-ish greedy ≤4-char chunking (regex quantifier greediness is
    * identical across engines). */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("n_alpha_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")).as("n_bpe_chunks"),
      length(regexp_replace(col("text"), "[^a-z]", "")).as("n_alpha_chars"))
      .orderBy(col("doc_id"))

  val textTokensSql: String =
    """SELECT doc_id,
      |  LEN(STRING_SPLIT(text, ' ')) AS n_ws_tokens,
      |  LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS n_alpha_tokens,
      |  LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}')) AS n_bpe_chunks,
      |  LENGTH(REGEXP_REPLACE(text, '[^a-z]', '', 'g')) AS n_alpha_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------- subword (BPE-style) tokens
  private[operators] val BpeVocabSize = 200

  /** Corpus-derived subword vocabulary: the [[BpeVocabSize]] most
    * frequent character pieces of length 2–4 across all words, ties
    * broken piece-ASC — a WordPiece-style frequency vocab rather than
    * iterative merge learning, chosen because frequency counting is
    * one partial-aggregable groupBy where true BPE merge rounds are a
    * sequential fixpoint (and the gate's point is budget CALIBRATION,
    * not a production tokenizer: VERDICT r11 next #2 — whitespace
    * `SeqLen=512` tokens systematically under-count subword budget).
    *
    * Scale shape: the piece explode is ≤3 rows per character of
    * corpus but flows straight into a map-side-combined count (the
    * per-piece partial collapses each task's explosion before the
    * shuffle); top-K is TakeOrdered over the counted frame — K rows
    * to the driver, never the piece population. Vocab-size scaling:
    * everything downstream holds a K-entry ≤4-char map (~8·K bytes
    * broadcast) and does O(1) lookups per character — K can grow to
    * real 50k–100k vocabs without changing any plan shape. */
  /** One row per word OCCURRENCE — the shared explode both the vocab
    * build and the tokenize ride (kept to (doc_id, source, w): pixel
    * rule's text analogue — the heavy string column never fans out). */
  private def docWords(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(expr(
          "filter(split(coalesce(text, ''), ' '), w -> length(w) > 0)")).as("w"))

  /** (w, wc) — distinct words with occurrence counts. Zipf is the
    * whole optimization: the corpus has ~66× more word OCCURRENCES
    * than distinct words, so counting pieces weighted by `wc` and
    * folding each distinct word ONCE (r12 rework; the first cut
    * exploded pieces and ran the fold per occurrence — 10.4 s at
    * sf0.1, ~7× this form) does the same arithmetic on 1/66th the
    * rows. The groupBy is one word-shuffle, reused by both consumers
    * (same exchange). */
  private def wordCounts(spark: SparkSession, dir: String): DataFrame =
    docWords(spark, dir).groupBy(col("w")).agg(count(lit(1)).as("wc"))

  private[operators] def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    wordCounts(spark, dir)
      .select(col("wc"), explode(expr(
        """flatten(transform(sequence(2, 4),
          |  L -> CASE WHEN length(w) >= L
          |    THEN transform(sequence(1, length(w) - L + 1),
          |                   i -> substring(w, i, L))
          |    ELSE CAST(array() AS array<string>) END))""".stripMargin))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc, col("piece"))
      .limit(BpeVocabSize)
      .select(col("piece"))

  private val bpeVocabCtes: String =
    s"""docwords AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS w
       |    FROM documents)
       |  WHERE LEN(w) > 0),
       |bpe_pieces AS (
       |  SELECT SUBSTR(w, i, L) AS piece
       |  FROM docwords, UNNEST([2, 3, 4]) AS ls(L),
       |       UNNEST(RANGE(1, LEN(w) - L + 2)) AS rs(i)
       |  WHERE LEN(w) >= L),
       |vocab AS (
       |  SELECT piece FROM (
       |    SELECT piece, COUNT(*) AS c FROM bpe_pieces GROUP BY piece
       |    ORDER BY c DESC, piece LIMIT $BpeVocabSize)),
       |uw AS (SELECT DISTINCT w FROM docwords),
       |positions AS (
       |  SELECT w, i FROM uw, UNNEST(RANGE(1, LEN(w) + 1)) AS r(i)),
       |adv AS (
       |  SELECT c.w, c.i,
       |    COALESCE(MAX(CASE WHEN v.piece IS NOT NULL THEN c.L END), 1) AS step
       |  FROM (SELECT p.w, p.i, SUBSTR(p.w, p.i, L) AS k, L
       |        FROM positions p, UNNEST([2, 3, 4]) AS ls(L)) c
       |  LEFT JOIN vocab v ON v.piece = c.k AND LEN(v.piece) = c.L
       |  GROUP BY c.w, c.i),
       |step(w, pos, cnt) AS (
       |  SELECT w, 1, CAST(0 AS BIGINT) FROM uw
       |  UNION ALL
       |  SELECT s.w, s.pos + a.step, s.cnt + 1
       |  FROM step s JOIN adv a ON a.w = s.w AND a.i = s.pos
       |  WHERE s.pos <= LEN(s.w)),
       |wtok AS (SELECT w, MAX(cnt) AS t FROM step GROUP BY w)""".stripMargin

  /** The greedy longest-match fold, SQL-expr form: one pass over the
    * word's character positions carrying (pos, cnt); at each position
    * it owns (i = pos) it advances by the longest vocab piece
    * matching there (4→3→2, else 1). Near the word's end
    * `substring(w, pos, L)` returns the SHORTER suffix, so a longer
    * branch can fire on a shorter piece — it then over-advances past
    * the end, which changes the exit position but NEVER the count
    * (one token either way), so counts are exactly the DuckDB
    * recursive CTE's MAX(LEN(piece)) semantics. Everything is
    * integer/string ops inside whole-stage codegen; `vmap` is the
    * broadcast K-entry vocab map, O(1) per lookup. */
  private val bpeWordFoldSql: String =
    """aggregate(
      |  sequence(1, length(w)),
      |  named_struct('pos', 1, 'cnt', CAST(0 AS BIGINT)),
      |  (st, i) -> IF(i = st.pos,
      |    named_struct(
      |      'pos', st.pos + CASE
      |        WHEN map_contains_key(vmap, substring(w, st.pos, 4)) THEN 4
      |        WHEN map_contains_key(vmap, substring(w, st.pos, 3)) THEN 3
      |        WHEN map_contains_key(vmap, substring(w, st.pos, 2)) THEN 2
      |        ELSE 1 END,
      |      'cnt', st.cnt + CAST(1 AS BIGINT)),
      |    st),
      |  st -> st.cnt)""".stripMargin

  /** (doc_id, source, n_words, tokens) — the shared front of both BPE
    * gates, mirroring the ORACLE's own uw/wtok structure: each
    * DISTINCT word is folded once against the broadcast one-row vocab
    * map (crossJoin(broadcast) — no shuffle of words against vocab;
    * the plan audit exempts exactly this BNLJ), then per-word counts
    * join back to the occurrence frame and aggregate per doc. Docs
    * with no words (empty text) survive via the left join, counts
    * coalesced to 0. */
  private def bpeTokensCore(spark: SparkSession, dir: String): DataFrame = {
    val vocabRow = bpeVocab(spark, dir)
      .agg(collect_list(col("piece")).as("ps"))
      .select(expr("map_from_arrays(ps, transform(ps, p -> true))").as("vmap"))
    val wordTok = wordCounts(spark, dir)
      .crossJoin(broadcast(vocabRow))
      .select(col("w"), expr(bpeWordFoldSql).as("t"))
    val perDoc = docWords(spark, dir)
      .join(wordTok, "w")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("nw"), sum(col("t")).as("tok"))
    docs(spark, dir).select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id", "source"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("nw"), lit(0L)).as("n_words"),
        coalesce(col("tok"), lit(0L)).as("tokens"))
  }

  /** Per-document SUBWORD token counts (VERDICT r11 next #2 — the
    * honest budget unit: `SeqLen` whitespace tokens ≠ `SeqLen` BPE
    * tokens, so every packing/budget gate calibrated in whitespace
    * tokens under-fills real trainer sequences). Deterministic greedy
    * longest-match over the corpus-derived [[bpeVocab]]. */
  def textTokensBpe(spark: SparkSession, dir: String): DataFrame =
    bpeTokensCore(spark, dir)
      .select(col("doc_id"), col("n_words"),
        col("tokens").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  val textTokensBpeSql: String =
    s"""WITH RECURSIVE $bpeVocabCtes
       |SELECT doc.doc_id,
       |  CAST(COUNT(d.w) AS BIGINT) AS n_words,
       |  CAST(COALESCE(SUM(wtok.t), 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents doc
       |LEFT JOIN docwords d ON doc.doc_id = d.doc_id
       |LEFT JOIN wtok ON d.w = wtok.w
       |GROUP BY doc.doc_id ORDER BY doc.doc_id""".stripMargin

  // ------------------------------------- true BPE merge learning (r13)
  private[operators] val BpeMergeRounds = 12

  /** Distinct ALPHA words with occurrence counts — merge learning
    * rides a delimiter-string token representation (`||` between
    * tokens), so the word alphabet is restricted to `[a-z]+` exactly
    * as [[textTokens]]'s `n_alpha_tokens` already does (a word
    * containing the delimiter would corrupt the representation on
    * both engines; alpha extraction is the precedented, deterministic
    * guard — no `lower()`, whose unicode mappings differ across
    * engines). Zipf rework as [[wordCounts]]: every downstream pass
    * touches DISTINCT words weighted by `wc`. */
  private def alphaDocWords(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(expr(
        "regexp_extract_all(coalesce(text, ''), '[a-z]+', 0)")).as("w"))

  private def alphaWordCounts(spark: SparkSession, dir: String): DataFrame =
    alphaDocWords(spark, dir).groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** The tokenization STATE of word `w` under zero merges:
    * `||c1||c2||...||cn||` — every token wrapped in DOUBLED
    * delimiters. The doubling is the whole trick: applying merge
    * (a, b) is then `replace(s, '|a||b|', '|ab|')`, and because
    * adjacent occurrences each draw one `|` from the SHARED doubled
    * boundary, plain left-to-right non-overlapping `replace` — the
    * same builtin with the same semantics on Spark and DuckDB —
    * implements exactly the greedy leftmost-first merge application
    * of reference BPE (a,b,a,b → ab,ab in one round), with no lambda
    * fold and no UDF. */
  private val bpeState0Sql: String =
    "concat('||', regexp_replace(w, '(.)', '$1||'))"

  /** Learn [[BpeMergeRounds]] BPE merges over the corpus: each round
    * counts adjacent token pairs across all distinct words (weighted
    * by occurrence count — true corpus frequency), picks the argmax
    * (ties: count DESC, then pair lexicographic), and applies it
    * everywhere via the doubled-delimiter `replace`. This is the
    * bounded sequential fixpoint the star-contraction family already
    * pins: M rounds, each ONE partial-aggregable pair count over the
    * distinct-word frame (rows shrink as merges land), with the
    * learned pair — two short strings — the only thing ever
    * collected. Rounds × vocab: M merges cost M passes; a real 50k
    * vocab does exactly this with a priority queue amortizing
    * recounts, but the per-round plan shape (explode pairs →
    * map-side-combined sum → argmax) is the 100 TB shape already.
    * A round with no remaining pairs records nothing and leaves the
    * state fixed (empty/degenerate corpora). */
  private[operators] def bpeLearnMerges(
      spark: SparkSession, dir: String): Seq[(String, String)] = {
    // NOTE (opt r13, measured and reverted): replacing the per-round
    // checkpoint with a growing replace() CHAIN over one checkpointed
    // state0 cut 10 jobs but ran 0.8 s SLOWER — every round's chained
    // expression is new codegen source, so the loop paid a fresh
    // Janino compile per round where the constant-shape plan below
    // hits the codegen cache. The checkpoint stays.
    var state = alphaWordCounts(spark, dir)
      .select(col("wc"), expr(bpeState0Sql).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var rounds = 0
    var exhausted = false
    while (rounds < BpeMergeRounds && !exhausted) {
      val best = state
        .select(col("wc"),
          expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')").as("t"))
        .select(col("wc"), explode(expr(
          """CASE WHEN size(t) >= 2
            |  THEN transform(sequence(1, size(t) - 1),
            |    i -> named_struct('a', element_at(t, i),
            |                      'b', element_at(t, i + 1)))
            |  ELSE CAST(array() AS array<struct<a:string,b:string>>)
            |END""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        state = state.withColumn("s",
            expr(s"replace(s, '|$a||$b|', '|$a$b|')"))
          .localCheckpoint()
      }
      rounds += 1
    }
    merges.toSeq
  }

  /** Per-document token counts under TRUE learned BPE merges (VERDICT
    * r12 next #6 — [[bpeVocab]] is a frequency vocab, honest for
    * budget calibration but not merge learning): the
    * [[bpeLearnMerges]] table is applied IN LEARNED ORDER to each
    * distinct word (the standard BPE encode — a chain of M
    * delimiter-replaces, all codegen'd string ops), and the token
    * count falls out of the delimiter arithmetic: a state with n
    * tokens holds exactly 2(n+1) `|` chars. Per-doc sums ride the
    * same distinct-word-join-back shape as [[textTokensBpe]]. */
  def textTokensBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeLearnMerges(spark, dir)
    val encExpr = merges.foldLeft(bpeState0Sql) { case (acc, (a, b)) =>
      s"replace($acc, '|$a||$b|', '|$a$b|')"
    }
    val wordTok = alphaWordCounts(spark, dir)
      .select(col("w"),
        expr(s"(length($encExpr) - length(replace($encExpr, '|', ''))) " +
          "div 2 - 1").cast("bigint").as("t"))
    val perDoc = alphaDocWords(spark, dir)
      .join(wordTok, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), sum(col("t")).as("tok"))
    docs(spark, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nw"), lit(0L)).as("n_alpha_words"),
        coalesce(col("tok"), lit(0L)).as("n_merge_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the SAME learning unrolled as [[BpeMergeRounds]] CTE
    * blocks — per round a pair count over the current state, an
    * argmax, and the doubled-delimiter REPLACE (COALESCE to an
    * impossible CHR(1) pattern when a round finds no pairs, so the
    * state passes through unchanged exactly as the Scala loop). */
  val textTokensBpeMergesSql: String = {
    val roundCtes = (1 to BpeMergeRounds).map { k =>
      val prev = s"st${k - 1}"
      s"""pc$k AS MATERIALIZED (
         |  SELECT t[i] AS a, t[i + 1] AS b, SUM(wc) AS c
         |  FROM (SELECT wc,
         |          LIST_FILTER(STRING_SPLIT(s, '||'), x -> x <> '') AS t
         |        FROM $prev),
         |       UNNEST(RANGE(1, GREATEST(LEN(t), 1))) AS r(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (
         |  SELECT a, b FROM pc$k ORDER BY c DESC, a, b LIMIT 1),
         |st$k AS MATERIALIZED (
         |  SELECT w, wc, REPLACE(s,
         |    COALESCE((SELECT '|' || a || '||' || b || '|' FROM b$k), CHR(1)),
         |    COALESCE((SELECT '|' || a || b || '|' FROM b$k), CHR(1))) AS s
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""WITH aw AS MATERIALIZED (
       |  SELECT doc_id,
       |    UNNEST(REGEXP_EXTRACT_ALL(COALESCE(text, ''), '[a-z]+')) AS w
       |  FROM documents),
       |wcs AS MATERIALIZED (SELECT w, COUNT(*) AS wc FROM aw GROUP BY w),
       |st0 AS MATERIALIZED (
       |  SELECT w, wc,
       |    '||' || REGEXP_REPLACE(w, '(.)', '\\1||', 'g') AS s
       |  FROM wcs),
       |$roundCtes,
       |enc AS (
       |  SELECT w,
       |    (LEN(s) - LEN(REPLACE(s, '|', ''))) // 2 - 1 AS t
       |  FROM st$BpeMergeRounds)
       |SELECT d.doc_id,
       |  CAST(COUNT(a.w) AS BIGINT) AS n_alpha_words,
       |  CAST(COALESCE(SUM(e.t), 0) AS BIGINT) AS n_merge_tokens
       |FROM documents d
       |LEFT JOIN aw a ON d.doc_id = a.doc_id
       |LEFT JOIN enc e ON a.w = e.w
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------------------ fingerprint
  /** Document fingerprinting (winnowing-lite): min and max 60-bit
    * shingle hashes + the shingle count — a compact, order-independent
    * content fingerprint. Numeric (first 15 hex chars of md5, same
    * ordering as the lexicographic hex min/max) so the aggregation
    * buffer is a primitive LONG ⇒ HashAggregate, not SortAggregate —
    * at 100 TB this is the difference between hashing and SORTING
    * every shingle row. Shuffle carries one row per doc. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("bigint")
    Dedup.shingleDf(spark, dir)
      .groupBy(col("doc_id"))
      .agg(min(h).as("fp_min"), max(h).as("fp_max"),
        count(lit(1)).as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  val textFingerprintSql: String =
    s"""WITH ${Dedup.shingleCte}
       |SELECT doc_id,
       |  MIN(('0x' || SUBSTR(md5(shingle), 1, 15))::BIGINT) AS fp_min,
       |  MAX(('0x' || SUBSTR(md5(shingle), 1, 15))::BIGINT) AS fp_max,
       |  COUNT(*) AS n_shingles
       |FROM shingles GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- tf-idf
  private val TfidfTopK = 3

  /** Top-3 characteristic terms per document by tf·(N/df) — the
    * linear-idf variant, chosen over log-idf deliberately: ln() is a
    * libm call whose last-bit rounding differs across engines, while
    * (tf·N)/df is one exact integer product and one IEEE division —
    * bit-identical, same ranking monotonicity in df.
    *
    * Scale shape: ONE token explode (a projection) → partial-agg tf
    * on (doc_id, term) → df as a window count over tf's own term
    * partition (expressing df as a separate groupBy(term) made
    * Catalyst prune the count column from the shared subplan, so the
    * explode ran TWICE with no exchange reuse — audited r3) → the
    * per-doc top-k window gets WindowGroupLimit (map-side top-k
    * before the doc_id shuffle). */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val nDocs = docs(spark, dir).groupBy().agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(wdf))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TfidfTopK)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val textTfidfSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, t.term, COUNT(*) AS tf
       |  FROM documents, UNNEST(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS t(term)
       |  GROUP BY doc_id, t.term),
       |tfdf AS (
       |  SELECT doc_id, term, tf, COUNT(*) OVER (PARTITION BY term) AS df
       |  FROM tf),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    CAST(tf * n_docs AS DOUBLE) / df AS score
       |  FROM tfdf, n),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, tf, df, score FROM ranked
       |WHERE rank <= $TfidfTopK ORDER BY doc_id, rank""".stripMargin

  // ----------------------------------------------------------- redact
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+"
  private val NumPat = "[0-9]{6,}"

  /** PII-style scrubbing — the standard corpus-cleaning projection:
    * redact email-shaped tokens and long digit runs, report match
    * counts plus the digest of the cleaned text (so dedup can run on
    * post-redaction content). Pure per-row projection, zero shuffles;
    * both patterns stay inside RE2 ∩ Java-regex semantics so the
    * engines agree byte-for-byte. */
  def textRedact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$EmailPat', 0)")).as("n_email"),
      size(expr(s"regexp_extract_all(text, '$NumPat', 0)")).as("n_num"),
      md5(regexp_replace(regexp_replace(col("text"), EmailPat, "<EMAIL>"),
        NumPat, "<NUM>")).as("clean_md5"))
      .orderBy(col("doc_id"))

  val textRedactSql: String =
    s"""SELECT doc_id,
       |  LEN(REGEXP_EXTRACT_ALL(text, '$EmailPat')) AS n_email,
       |  LEN(REGEXP_EXTRACT_ALL(text, '$NumPat')) AS n_num,
       |  md5(REGEXP_REPLACE(REGEXP_REPLACE(text, '$EmailPat', '<EMAIL>', 'g'),
       |      '$NumPat', '<NUM>', 'g')) AS clean_md5
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- hash split/sample
  /** Deterministic train/val/test split (80/10/10) by CONTENT hash —
    * the reproducible-sampling mechanism a training pipeline needs:
    * assignment is a pure function of the text (stable across runs,
    * partitionings, engines and re-ingestions; `rand()`-based
    * sampling is none of those). The 16-bit md5 prefix mod 100 has
    * negligible bias (65536 % 100 = 36 of 65536 values); per-row
    * projection + one partial agg. */
  def textHashSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") % 100
    docs(spark, dir)
      .select(col("lang"),
        when(h < 80, lit("train")).when(h < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))
  }

  val textHashSplitSql: String =
    """SELECT lang,
      |  CASE WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 80 THEN 'train'
      |       WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  // ------------------------------------------------ global shuffle/shard
  private val ShuffleShardSize = 256

  /** Deterministic GLOBAL corpus shuffle + training-shard assignment —
    * the step between curation and training: examples must reach the
    * trainer in a pseudo-random order that is REPRODUCIBLE (re-runs,
    * engines, partitionings all agree), and contiguous runs of the
    * shuffled order become shards. The shuffle key is md5 over a
    * seeded doc_id — a pure per-row projection, stable where `rand()`
    * and `repartition` orderings are not.
    *
    * Scale shape: the naive form is `row_number() OVER (ORDER BY k)` —
    * a SINGLE-partition window, the global-sort funnel. Here the
    * position comes from [[Ranks.globalRowNumber]]: the key's first
    * hex byte is a 256-way monotone bucket, one tiny counts job builds
    * per-bucket offsets, and the rank window runs 256-way parallel —
    * at 100 TB each task handles 1/256th of the corpus and the driver
    * holds 256 longs. Shard = contiguous [[ShuffleShardSize]]-position
    * blocks of the shuffled order (`(pos-1) div size`), so shard files
    * can be written by a partitioned sink with no further shuffle. */
  def textGlobalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val keyed = docs(spark, dir)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("k"))
    Ranks.globalRowNumber(keyed,
        conv(substring(col("k"), 1, 2), 16, 10).cast("long"),
        "pos", col("k"), col("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr(s"(pos - 1) DIV $ShuffleShardSize").as("shard_id"))
      .orderBy(col("doc_id"))
  }

  val textGlobalShuffleSql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k
       |  FROM documents WHERE doc_id IS NOT NULL),
       |pos AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS pos
       |  FROM keyed)
       |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |  CAST((pos - 1) // $ShuffleShardSize AS BIGINT) AS shard_id
       |FROM pos ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ repetition metrics
  /** Gopher-style within-document repetition signals: fraction of
    * duplicate bigrams and the share of the single most frequent
    * bigram — the standard "repetitious spam" quality filters a
    * curation pipeline applies before training.
    *
    * Scale shape: ONE bigram explode (projection) → partial agg on
    * (doc_id, bigram) → partial agg on doc_id; both aggregations are
    * map-side combinable and the shuffles carry counts, never text
    * beyond the bigram itself. Fractions are single IEEE divisions of
    * exact integers — bit-identical cross-engine. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // split ONCE into a materialized array column — inlining
    // split(text) inside the transform lambda re-tokenized the whole
    // document per bigram element (O(words²) per doc; measured ~2×
    // on this gate at sf0.1)
    val bigrams = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))""".stripMargin)).as("bigram"))
    bigrams.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        (col("top_c").cast("double") / col("n_bigrams").cast("double")).as("top_frac"),
        ((col("n_bigrams") - col("n_distinct")).cast("double")
          / col("n_bigrams").cast("double")).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val textRepetitionSql: String =
    """WITH d AS (
      |  SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
      |  WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
      |  FROM d, UNNEST(RANGE(1, LEN(ws))) AS r(i)),
      |cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_frac,
      |  CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS dup_frac
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- chunk-level dedup
  private val ChunkWords = 3
  private val ChunkDfMax = 5 // chunks seen >= this many times are boilerplate

  /** Cross-corpus boilerplate removal (C4 / RefinedWeb line-dedup):
    * split every document into fixed CHUNK-word segments, count each
    * distinct segment's corpus frequency, DROP segments that occur in
    * >= ChunkDfMax places, and reassemble the surviving text in
    * original order (md5 digest of the cleaned text is emitted so the
    * downstream dedup stages can run on post-cleaning content). The
    * synthetic corpus has no newlines, so the "line" unit is a 3-word
    * chunk — the plan shape is identical for real newline-split lines.
    *
    * Scale shape (two-level hot-chunk aggregation + boilerplate-only
    * build side): ONE chunk explode per branch (projection —
    * recomputed, see below) → chunk corpus frequency computed as a
    * PARTIAL-AGGREGABLE groupBy on xxhash64(chunk), an 8-byte key: a
    * boilerplate chunk seen 10⁹ times contributes ONE row per map
    * partition to the shuffle, never 10⁹ rows in one reducer (the
    * window-over-chunk-partition form this replaces funneled exactly
    * the hottest chunks — the ones being dropped — into single
    * reducers). The keep/drop decision only needs a per-chunk BOOLEAN,
    * so the aggregate is FILTERED to boilerplate chunks (df ≥
    * threshold) before joining back as a LEFT join (null df ⇒ kept):
    * the build side is bounded by the boilerplate VOCABULARY — the
    * distinct over-threshold chunks, not the corpus — so it broadcasts
    * at any corpus size and the Zipf-hot probe side NEVER shuffles on
    * the chunk key. (A join against the unfiltered df table would
    * shuffle the probe side on ck once the table outgrew broadcast,
    * and that hot partition is NOT AQE-splittable: OptimizeSkewedJoin
    * requires bare shuffle stages under the join, and the df
    * aggregate's final HashAggregate sits between its exchange and
    * the join.) Per-doc reassembly is one doc_id shuffle bounded by
    * document size.
    *
    * Costs accepted: the explode is recomputed for the join's probe
    * branch (projection-only — cheaper at 100 TB than any skewed
    * exchange; text_tfidf keeps the single-explode window form because
    * tf-idf terms are NOT boilerplate-skewed). The build side CARRIES
    * the chunk string alongside ck and the join matches on BOTH, so an
    * xxhash64 collision between a rare chunk and a boilerplate chunk
    * can no longer silently drop the rare chunk — the hash leads the
    * grouping key (partial-agg rows still collapse per map partition;
    * they now carry the ~ChunkWords-word string alongside the 8-byte
    * key, the price of exactness), and the broadcast build side stays
    * bounded by the boilerplate vocabulary. */
  def textChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    // materialized `ws` (split once) — split(text) inlined in the
    // lambda would re-tokenize the document per chunk element
    val chunksExpr = expr(
      s"""transform(sequence(0, cast(ceil(size(ws) / $ChunkWords.0d) as int) - 1),
         |  i -> array_join(slice(ws, i * $ChunkWords + 1, $ChunkWords), ' '))""".stripMargin)
    val chunks = docsPar(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(chunksExpr).as(Seq("pos", "chunk")))
      .withColumn("ck", xxhash64(col("chunk")))
    val boiler = chunks.groupBy(col("ck"), col("chunk")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= ChunkDfMax) // boilerplate vocabulary only
    chunks.join(boiler, Seq("ck", "chunk"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("df").isNull, 1L).otherwise(0L)).as("n_kept"),
        // pos (unique per doc) is the struct's first field, so the
        // sort never compares the nullable df
        array_sort(collect_list(struct(col("pos"), col("chunk"), col("df")))).as("cs"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        md5(array_join(
          expr("transform(filter(cs, x -> x.df IS NULL), x -> x.chunk)"), " "))
          .as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val textChunkDedupSql: String =
    s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS pos,
       |    ARRAY_TO_STRING(ws[(i * $ChunkWords + 1):(i * $ChunkWords + $ChunkWords)], ' ') AS chunk
       |  FROM d, UNNEST(RANGE(CAST(CEIL(LEN(ws) / $ChunkWords.0) AS BIGINT))) AS r(i)),
       |wdf AS (
       |  SELECT doc_id, pos, chunk, COUNT(*) OVER (PARTITION BY chunk) AS df
       |  FROM chunks)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN df < $ChunkDfMax THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(COALESCE(STRING_AGG(CASE WHEN df < $ChunkDfMax THEN chunk END, ' ' ORDER BY pos), ''))
       |    AS clean_md5
       |FROM wdf GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------- stratified sampling
  /** Deterministic stratified sampling for data mixing: keep the top
    * ⌈20%⌉ of every (lang, source) stratum, ranked by content hash
    * (stable across runs/partitionings/engines — `rand()` is none of
    * those; same rationale as text_hash_split). The keep threshold
    * ⌈n/5⌉ is computed as (n+4)/5 in INTEGER arithmetic so both
    * engines agree exactly (no float ceil at any corpus size).
    *
    * Scale shape: one shuffle on the stratum key serves both window
    * functions (rank + stratum size); the md5 rank key is computed
    * map-side. For a FIXED per-stratum k, Spark plans WindowGroupLimit
    * (map-side top-k before the shuffle); fraction-based keep needs
    * the stratum count so the limit is reducer-side — still one
    * shuffle carrying (keys, digest), never text. */
  def textStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val part = Seq(col("lang"), col("source"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(part: _*)
      .orderBy(col("h"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(part: _*)
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), md5(col("text")).as("h"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(wAll))
      .filter(col("rk") * 5 <= col("n_stratum") + 4)
      .select(col("lang"), col("source"), col("doc_id"),
        col("rk").cast("bigint").as("rk"), col("n_stratum"))
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  val textStratifiedSampleSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |                       ORDER BY md5(text), doc_id) AS rk,
      |    CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT) AS n_stratum
      |  FROM documents)
      |SELECT lang, source, doc_id, rk, n_stratum FROM ranked
      |WHERE rk * 5 <= n_stratum + 4
      |ORDER BY lang, source, rk""".stripMargin

  // ---------------------------------------------- shard packing
  private[operators] val ShardTokens = 2000L

  /** Token-budget shard packing: assign documents (per lang, in
    * doc_id order) to training shards of ~2000 tokens by running
    * token count — shard = ⌊tokens-before-this-doc / budget⌋, the
    * standard distributed approximation of greedy packing (a shard
    * can overshoot by at most one document; exact greedy close-when-
    * full is an inherently sequential recurrence). Emits per-shard
    * doc counts and token totals.
    *
    * Scale shape: one window shuffle on the lang partition. A single
    * global sequence would serialize; real pipelines partition the
    * cumsum by (lang, date-bucket) exactly like this, or two-pass it:
    * per-partition token subtotals broadcast as offsets, then each
    * partition labels its rows independently — same results, no
    * single-reducer window. Integer-only arithmetic cross-engine. */
  def textShardPack(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    shardPackFromCum(docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w)))
  }

  /** Shared tail of both shard-pack variants: shard assignment +
    * per-shard aggregation over a (doc_id, lang, tokens, cum) frame. */
  private def shardPackFromCum(cumDf: DataFrame): DataFrame =
    cumDf
      .withColumn("shard_id", expr(s"(cum - tokens) div $ShardTokens"))
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"))
      .orderBy(col("lang"), col("shard_id"))


  /** Production twin of [[textShardPack]] (VERDICT r10 next #1): the
    * running token sum via [[Ranks.partitionedRunningSum]]'s
    * monotone-bucket offsets — per-(lang, doc_id-range-bucket) local
    * windows plus broadcast per-bucket offsets — instead of one
    * sequential window per lang. Lang is a LOW-cardinality key: the
    * naive window funnels each lang's entire corpus through ONE task
    * at 100 TB; here the funnel is a subtotal aggregation (tiny) and
    * every bucket cumsums in parallel. Output is bit-identical to the
    * window path (LONG addition reassociated), so the oracle SQL is
    * shared verbatim. */
  def textShardPackProd(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint before packBucketWidth (ADVICE r12): the width
    // min/max, the subtotal pass, and the final cumsum would otherwise
    // execute the document scan + token projection three times
    val toks = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("tokens"))
      .localCheckpoint()
    val width = Ranks.packBucketWidth(toks, col("doc_id"))
    shardPackFromCum(Ranks.partitionedRunningSum(
      toks, Seq("lang"), expr(s"doc_id div $width"),
      col("tokens"), "cum", col("doc_id")))
  }

  val textShardPackSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS tokens
       |  FROM documents),
       |cums AS (
       |  SELECT lang, tokens,
       |    CAST(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM toks)
       |SELECT lang, (cum - tokens) // $ShardTokens AS shard_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tokens) AS BIGINT) AS sum_tokens
       |FROM cums GROUP BY 1, 2 ORDER BY lang, shard_id""".stripMargin

  // ------------------------------------- fixed-context sequence packing
  private[operators] val SeqLen = 512L

  /** Fixed-context SEQUENCE packing — the step between shard packing
    * and the trainer: documents are concatenated per source (in
    * doc_id order) and cut into fixed $SeqLen-token training
    * sequences (concat-and-chunk, the GPT-style recipe), emitting per
    * sequence the document-boundary stats a masking/attention config
    * needs: how many documents the sequence spans (n_docs − 1
    * cross-document boundaries to mask or not), its first/last
    * doc_id, and its token fill (= $SeqLen for every sequence but a
    * source's last). A document spanning sequences contributes its
    * exact per-sequence token overlap, so Σ seq_tokens = Σ tokens —
    * the conservation the gate's oracle enforces.
    *
    * Scale shape: one window shuffle on the source partition (the
    * same partitioned-cumsum story as [[textShardPack]] — a global
    * sequence would serialize; production partitions the stream or
    * two-passes per-partition offsets). The span explode emits
    * ⌈tokens/$SeqLen⌉ + 1 rows per doc — linear in corpus tokens
    * divided by the context length — then one partial-aggregable
    * groupBy. Integer-only arithmetic cross-engine; COALESCE makes
    * null text one empty token, so every doc has tokens ≥ 1 and the
    * span range is never empty. */
  def textSeqPack(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    seqPackFromCum(seqPackTokens(spark, dir)
      .withColumn("cum", sum(col("tokens")).over(w)))
  }

  private def seqPackTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " "))
          .cast("bigint").as("tokens"))

  /** Shared tail of both seq-pack variants: the span explode +
    * per-sequence aggregation over a (doc_id, source, tokens, cum)
    * frame. */
  private def seqPackFromCum(cumDf: DataFrame): DataFrame =
    cumDf
      .withColumn("strt", col("cum") - col("tokens"))
      .withColumn("sq",
        explode(expr(s"sequence(strt div $SeqLen, (cum - 1) div $SeqLen)")))
      .groupBy(col("source"), col("sq").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("cum"), (col("sq") + 1) * SeqLen) -
          greatest(col("strt"), col("sq") * SeqLen)).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("seq_id"))

  /** Production twin of [[textSeqPack]] (VERDICT r10 next #1): the
    * per-source running token sum via
    * [[Ranks.partitionedRunningSum]] — (source, doc_id-range-bucket)
    * local windows + broadcast offsets — so no task ever holds more
    * than one bucket of one source, where the naive window holds the
    * WHOLE source (the engine's last single-task-per-key shape at
    * 100 TB). Downstream span explode and aggregation are shared;
    * output and oracle are bit-identical to the window path. */
  def textSeqPackProd(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: three executions otherwise (width agg,
    // subtotal pass, cumsum) — mirrors textSeqPackBpe (ADVICE r12)
    val toks = seqPackTokens(spark, dir).localCheckpoint()
    val width = Ranks.packBucketWidth(toks, col("doc_id"))
    seqPackFromCum(Ranks.partitionedRunningSum(
      toks, Seq("source"), expr(s"doc_id div $width"),
      col("tokens"), "cum", col("doc_id")))
  }

  /** Sequence packing by REAL SUBWORD budget (VERDICT r11 next #2's
    * second half): [[textSeqPackProd]]'s concat-and-chunk with the
    * per-doc token count swapped from whitespace `split` to
    * [[textTokensBpe]]'s greedy longest-match subword count — the
    * unit a trainer's `SeqLen` is actually denominated in. Zero-token
    * docs (empty text) are excluded BEFORE the cumsum: they occupy no
    * sequence span, and the span explode's `sequence(strt div L,
    * (cum-1) div L)` is only monotone for tokens ≥ 1 (Spark's
    * `sequence` runs DESCENDING when start > stop — a silent
    * wrong-span hazard, not an error). Σ seq_tokens = Σ tokens over
    * the surviving docs — the same conservation oracle as the
    * whitespace twin.
    *
    * Scale shape: tokenize is a broadcast-map fold (no extra
    * shuffle); the token frame is localCheckpoint'd so the
    * vocab+fold runs ONCE, not once per [[Ranks.partitionedRunningSum]]
    * pass (the checkpoint also discharges its nondeterminism guard
    * the way pipeline_daily_delta does); the cumsum itself is the
    * bucket-offset prefix under [[Ranks.packBucketWidth]]. */
  def textSeqPackBpe(spark: SparkSession, dir: String): DataFrame = {
    val toks = bpeTokensCore(spark, dir)
      .select(col("doc_id"), col("source"), col("tokens"))
      .filter(col("tokens") > 0)
      .localCheckpoint()
    val width = Ranks.packBucketWidth(toks, col("doc_id"))
    seqPackFromCum(Ranks.partitionedRunningSum(
      toks, Seq("source"), expr(s"doc_id div $width"),
      col("tokens"), "cum", col("doc_id")))
  }

  val textSeqPackBpeSql: String =
    s"""WITH RECURSIVE $bpeVocabCtes,
       |toks AS (
       |  SELECT doc.doc_id, doc.source,
       |    CAST(SUM(wtok.t) AS BIGINT) AS tokens
       |  FROM documents doc
       |  JOIN docwords d ON doc.doc_id = d.doc_id
       |  JOIN wtok ON d.w = wtok.w
       |  GROUP BY doc.doc_id, doc.source),
       |cums AS (
       |  SELECT doc_id, source, tokens,
       |    CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, source, tokens, cum, cum - tokens AS strt, sq
       |  FROM cums, UNNEST(RANGE((cum - tokens) // $SeqLen,
       |    (cum - 1) // $SeqLen + 1)) AS r(sq))
       |SELECT source, sq AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(LEAST(cum, (sq + 1) * $SeqLen)
       |    - GREATEST(strt, sq * $SeqLen)) AS BIGINT) AS seq_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM spans GROUP BY source, sq
       |ORDER BY source, seq_id""".stripMargin

  /** Shuffled-order sequence packing — the composed daily shape a
    * trainer actually consumes: documents are concatenated per source
    * in the REPRODUCIBLE pseudo-random order (the same seeded-md5 key
    * as `text_global_shuffle`), not doc_id/arrival order, then cut
    * into fixed sequences. Packing in ingestion order correlates
    * neighbors (same crawl batch, same site); packing in shuffled
    * order is what curriculum-free training assumes.
    *
    * Scale shape: proves [[Ranks.partitionedRunningSum]] generalizes
    * beyond doc_id ranges — the monotone bucket here is the shuffle
    * key's first hex byte under the (k, doc_id) sort, so the cumsum
    * parallelizes 256-way per source exactly like the _prod twin, and
    * no re-sort precedes the pack (the shuffle IS the pack order).
    * Downstream span explode/aggregation shared; token conservation
    * identical. */
  def textSeqPackShuffled(spark: SparkSession, dir: String): DataFrame =
    seqPackFromCum(Ranks.partitionedRunningSum(
      seqPackTokens(spark, dir)
        .withColumn("k", md5(concat(lit("shuf:"), col("doc_id").cast("string")))),
      Seq("source"), conv(substring(col("k"), 1, 2), 16, 10).cast("long"),
      col("tokens"), "cum", col("k"), col("doc_id")))

  val textSeqPackShuffledSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(LEN(STRING_SPLIT(COALESCE(text, ''), ' ')) AS BIGINT) AS tokens,
       |    md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k
       |  FROM documents),
       |cums AS (
       |  SELECT doc_id, source, tokens,
       |    CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, source, tokens, cum, cum - tokens AS strt, sq
       |  FROM cums, UNNEST(RANGE((cum - tokens) // $SeqLen,
       |    (cum - 1) // $SeqLen + 1)) AS r(sq))
       |SELECT source, sq AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(LEAST(cum, (sq + 1) * $SeqLen)
       |    - GREATEST(strt, sq * $SeqLen)) AS BIGINT) AS seq_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM spans GROUP BY source, sq
       |ORDER BY source, seq_id""".stripMargin

  val textSeqPackSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(LEN(STRING_SPLIT(COALESCE(text, ''), ' ')) AS BIGINT) AS tokens
       |  FROM documents),
       |cums AS (
       |  SELECT doc_id, source, tokens,
       |    CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, source, tokens, cum, cum - tokens AS strt, sq
       |  FROM cums, UNNEST(RANGE((cum - tokens) // $SeqLen,
       |    (cum - 1) // $SeqLen + 1)) AS r(sq))
       |SELECT source, sq AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(LEAST(cum, (sq + 1) * $SeqLen)
       |    - GREATEST(strt, sq * $SeqLen)) AS BIGINT) AS seq_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM spans GROUP BY source, sq
       |ORDER BY source, seq_id""".stripMargin

  // ---------------------------------------------- per-source capping
  private val SourceCap = 15

  /** C4/RefinedWeb-style source-frequency cap: keep at most N docs per
    * source, survivors chosen by stable content-hash rank (not arrival
    * order — reruns and repartitions pick identical survivors). Bounds
    * over-represented domains before mixing.
    *
    * Scale shape: this row_number+filter(rk <= N) form IS already
    * two-phase — Spark plans a PARTIAL WindowGroupLimit below the
    * source exchange (each map partition keeps its N smallest
    * (hash, id) per source — admissible because the global top-N is a
    * subset of the union of per-partition top-Ns), so a billion-doc
    * domain sends at most N × |map partitions| rows to its reducer,
    * never a billion. PlanAuditSpec pins the partial-below-exchange
    * shape; the equivalent hand-rolled mapPartitions pre-cap (what
    * you'd write if the optimizer lacked WindowGroupLimit, or for a
    * FRACTION-based cap like text_stratified_sample where the limit
    * needs the stratum count) is specced in ScaleTechniquesSpec. */
  def textSourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SourceCap)
      .select(col("source"), col("doc_id"), col("rk").cast("bigint").as("rk"))
      .orderBy(col("source"), col("rk"))
  }

  val textSourceCapSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY md5(text), doc_id) AS rk
       |  FROM documents)
       |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM ranked
       |WHERE rk <= $SourceCap
       |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------- weighted corpus mixing
  /** Epoch-style corpus mixing: each source gets a sampling weight in
    * {0.5, 1.0, 1.5, 2.0, 2.5} (derived here from a source hash; in
    * production a tiny broadcast dim) and every document is emitted
    * ⌊w⌋ times plus one more with probability frac(w), decided by a
    * deterministic per-document hash — so a 2.5-weight source is seen
    * ~2.5 "epochs" and a 0.5-weight source is half-sampled,
    * reproducibly across reruns.
    *
    * Scale shape: zero shuffles — the weight is a pure projection (or
    * a broadcast join against the weights dim), the repeat is a
    * row-local explode, and fractional inclusion is an integer hash
    * compare. The millage arithmetic is integer-exact cross-engine
    * (frac(w) ∈ {0, .5} ⇒ w·1000 exact in binary doubles). */
  def textMixWeights(spark: SparkSession, dir: String): DataFrame = {
    val srcH = conv(substring(md5(col("source")), 1, 15), 16, 10).cast("bigint")
    val docH = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
      col("text"))), 1, 15), 16, 10).cast("bigint")
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        ((srcH % 5 + 1).cast("double") * 0.5).as("weight"),
        (docH % 1000).as("frac_mill"))
      .withColumn("n_copies",
        (floor(col("weight")) +
          when(col("frac_mill") <
            ((col("weight") - floor(col("weight"))) * 1000).cast("bigint"), 1L)
            .otherwise(0L)).cast("int"))
      .withColumn("copy",
        explode(when(col("n_copies") >= 1,
          sequence(lit(1), col("n_copies"))).otherwise(array().cast("array<int>"))))
      .select(col("source"), col("doc_id"), col("weight"),
        col("copy").cast("bigint").as("copy"),
        col("n_copies").cast("bigint").as("n_copies"))
      .orderBy(col("source"), col("doc_id"), col("copy"))
  }

  private val MixTempTarget = 10.0

  /** COUNT-ADAPTIVE source mix at temperature α = 0.5 — the
    * Gopher/LLaMA-family recipe ([[textMixWeights]] applies STATIC
    * per-source weights; this derives them from the live corpus):
    * expected copies per doc = T/√n_source, so a source's total
    * contribution grows as √n — over-represented domains are damped,
    * small ones boosted, with no hand-set table to go stale as the
    * corpus shifts. α is fixed at ½ deliberately: `sqrt` is an IEEE
    * correctly-rounded operation in BOTH engines where `pow(x, α)` is
    * libm-implementation-defined in its last ulp — the one
    * temperature whose weights are bit-exact cross-engine. The
    * fractional part becomes a copy via the same deterministic
    * content-hash millage as textMixWeights — but UNLIKE
    * textMixWeights (frac(w) ∈ {0, .5}, so the ×1000 product is an
    * exact integer and cast semantics are moot), here frac(w) is a
    * general double, and Spark's CAST(double AS BIGINT) truncates
    * toward zero while DuckDB's ::BIGINT rounds to nearest — an
    * integer cast on the threshold would make n_copies differ by 1
    * for any doc whose frac_mill lands between the two. So the
    * threshold is compared as a raw DOUBLE on both sides: frac_mill
    * (an exact integer < 1000) against (w − ⌊w⌋)·1000, which is the
    * same chain of correctly-rounded IEEE ops in both engines —
    * bit-identical, no rounding-direction dependence.
    *
    * Scale shape: one partial-aggregable count per source (tiny —
    * sources ≪ docs), broadcast back, then a pure per-row projection;
    * no explode, so output rows = input rows at any corpus size. */
  def textMixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
    val docH = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
      col("text"))), 1, 15), 16, 10).cast("bigint")
    docs(spark, dir)
      .join(broadcast(counts), "source")
      .select(col("doc_id"), col("source"), col("n_src"),
        (lit(MixTempTarget) / sqrt(col("n_src").cast("double"))).as("weight"),
        (docH % 1000).as("frac_mill"))
      .select(col("source"), col("doc_id"), col("n_src"), col("weight"),
        (floor(col("weight")).cast("bigint") +
          when(col("frac_mill").cast("double") <
            (col("weight") - floor(col("weight"))) * 1000, 1L)
            .otherwise(0L)).as("n_copies"))
      .orderBy(col("source"), col("doc_id"))
  }

  val textMixTemperatureSql: String =
    s"""WITH counts AS (
       |  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
       |weighted AS (
       |  SELECT d.doc_id, d.source, c.n_src,
       |    CAST($MixTempTarget AS DOUBLE) / SQRT(CAST(c.n_src AS DOUBLE)) AS weight,
       |    ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || d.text), 1, 15))::BIGINT
       |      % 1000 AS frac_mill
       |  FROM documents d JOIN counts c USING (source))
       |SELECT source, doc_id, CAST(n_src AS BIGINT) AS n_src,
       |  CAST(weight AS DOUBLE) AS weight,
       |  CAST(FLOOR(weight)::BIGINT +
       |    CASE WHEN frac_mill::DOUBLE < (weight - FLOOR(weight)) * 1000
       |         THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |FROM weighted ORDER BY source, doc_id""".stripMargin

  val textMixWeightsSql: String =
    """WITH weighted AS (
      |  SELECT doc_id, source,
      |    (('0x' || substr(md5(source), 1, 15))::BIGINT % 5 + 1) * 0.5 AS weight,
      |    ('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT % 1000 AS frac_mill
      |  FROM documents),
      |copies AS (
      |  SELECT *, (FLOOR(weight)::BIGINT +
      |      CASE WHEN frac_mill < ((weight - FLOOR(weight)) * 1000)::BIGINT
      |           THEN 1 ELSE 0 END) AS n_copies
      |  FROM weighted),
      |exploded AS (
      |  SELECT source, doc_id, weight, n_copies,
      |    unnest(range(1, n_copies + 1)) AS copy
      |  FROM copies)
      |SELECT source, doc_id, CAST(weight AS DOUBLE) AS weight,
      |  CAST(copy AS BIGINT) AS copy, CAST(n_copies AS BIGINT) AS n_copies
      |FROM exploded
      |ORDER BY source, doc_id, copy""".stripMargin

  // ------------------------------------- n-gram LM corpus likelihood
  // r5: 500 (was 10000) — the synthetic corpus has only ~916 distinct
  // bigrams, so the old cap never bound and the out-of-vocabulary
  // left-join path (coalesce to 0) was dead code in every gate. At
  // 500 the cap bites at gate scale, so the three-way hash gate
  // certifies the capped scoring path — the one that runs at 100 TB —
  // not just the everything-in-vocabulary one.
  private val LmVocabTop = 500

  /** One row per (doc, word-bigram occurrence) — the shared front of
    * both LM gates. `ws` is materialized once (split per bigram was
    * measured O(words²) — see textRepetition). */
  private[operators] def docBigrams(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))""".stripMargin)).as("bigram"))

  private[operators] val bigramCtes: String =
    """d AS (
      |  SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
      |  WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
      |  FROM d, UNNEST(RANGE(1, LEN(ws))) AS r(i))""".stripMargin

  /** Per-document bigram-LM likelihood (the CCNet-style "how typical
    * is this text of the corpus" quality filter, rational form): build
    * a word-bigram frequency model over the corpus, cap it to the
    * top-V vocabulary, and score each document by its MEAN MODEL
    * PROBABILITY — sum of the model counts of the doc's bigrams,
    * divided by (n_bigrams × total corpus bigram mass).
    *
    * The textbook formulation sums log-probabilities, but ln() is not
    * IEEE-754-exactness-mandated — its low bit may differ across
    * engines, which a hash gate cannot tolerate. The mean-probability
    * form carries the same corpus-typicality ranking signal using
    * ONLY exact integer sums plus one final IEEE division —
    * bit-identical cross-engine by construction (parity rule: never
    * sum raw doubles; divide exact integers once).
    *
    * Scale shape: one bigram explode → one partial-aggregable
    * groupBy(bigram) builds the model; the top-V cap bounds the model
    * so scoring is a BROADCAST join (out-of-vocabulary bigrams score
    * 0 via the left join) + one partial agg on doc_id — the corpus is
    * never shuffled on the hot bigram key, so the head of the Zipf
    * distribution cannot skew the scoring pass. The top-V cap is a
    * PER-PARTITION PARTIAL top-V (orderBy + limit ⇒
    * TakeOrderedAndProject: each partition keeps a V-element heap,
    * the driver merges |partitions| × V rows) — not the global
    * single-partition row_number sort this replaces, which pushed the
    * whole post-agg vocabulary (still billions of distinct bigrams at
    * 100 TB) through one reducer. Ties break on (count DESC, bigram),
    * a total order, so the selected set is identical to the
    * row_number form. */
  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    val bg = docBigrams(spark, dir)
    val cnt = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c"))
    val model = cnt.orderBy(col("c").desc, col("bigram")).limit(LmVocabTop)
      .select(col("bigram"), col("c"))
    val total = cnt.agg(sum(col("c")).as("t"))
    bg.join(broadcast(model), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("c"), lit(0L))).as("matched_mass"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_bigrams"), col("matched_mass"),
        (col("matched_mass").cast("double") /
          (col("n_bigrams").cast("double") * col("t").cast("double"))).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  val textLmScoreSql: String =
    s"""WITH $bigramCtes,
       |cnt AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY 1),
       |model AS (
       |  SELECT bigram, c FROM (
       |    SELECT bigram, c, ROW_NUMBER() OVER (ORDER BY c DESC, bigram) AS rn
       |    FROM cnt) r
       |  WHERE rn <= $LmVocabTop),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(COALESCE(m.c, 0)) AS BIGINT) AS matched_mass,
       |  CAST(SUM(COALESCE(m.c, 0)) AS DOUBLE)
       |    / (CAST(COUNT(*) AS DOUBLE) * CAST((SELECT t FROM tot) AS DOUBLE)) AS lm_score
       |FROM bg LEFT JOIN model m USING (bigram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------- DSIR-style importance filtering
  private[operators] val DsirQualityBar = 0.55
  private[operators] val DsirKeep = 1.0
  // Top-V cap for BOTH bigram models. Deliberately smaller than
  // LmVocabTop: the synthetic corpus has only ~916 distinct bigrams,
  // so a 10k cap would never bind at gate scale and the OOV smoothing
  // floor would be dead code in the correctness gate. At 500 the cap
  // bites, so the three-way hash gate certifies the SMOOTHED scoring
  // path cross-engine, not just the in-vocabulary one.
  private[operators] val DsirVocabTop = 500

  /** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    * arXiv:2302.03169 — here in its deterministic filter form): build
    * TWO bigram models — the target model from documents above the
    * quality bar, the corpus model from everything — and keep the
    * documents whose importance weight
    * (target mean-probability / corpus mean-probability) is ≥ 1, i.e.
    * the documents whose n-gram profile is over-represented in the
    * high-quality subcorpus. This composes the quality scorer and the
    * LM machinery into the standard "select pretraining data that
    * looks like the target domain" pipeline step.
    *
    * BOTH models are capped to their top-V bigrams (V = DsirVocabTop)
    * via orderBy + limit ⇒ TakeOrderedAndProject — per-partition
    * V-element heaps, driver merges |partitions| × V rows — so each
    * broadcast is bounded by construction at ANY corpus size (at
    * 100 TB the uncapped distinct-bigram aggregate is billions of
    * rows; broadcasting it fails at build). Out-of-vocabulary bigrams
    * take an additive-smoothing (add-one) floor: each bigram
    * contributes model_count + 1 to its doc's mass and each total
    * gains +V, i.e. P(b) = (c_b + 1) / (T + V) — no denominator can
    * be zero and no OOV bigram scores zero. Ties at the cap boundary
    * break on (count DESC, bigram), a total order, so the selected
    * vocabulary is identical cross-engine.
    *
    * Same rational-arithmetic parity argument as textLmScore: masses
    * (Σ(count+1)) and smoothed totals (T+V) are exact integers; the
    * weight is a quotient of two single IEEE divisions, identical
    * operation order in both engines. Scale shape: the models are
    * capped aggregation outputs (≤ V rows each), broadcast into one
    * scoring pass over the exploded corpus — two partial aggs + one
    * doc_id agg, never a corpus shuffle on the Zipf-headed bigram
    * key. */
  def textDsirFilter(spark: SparkSession, dir: String): DataFrame = {
    val bg = docBigrams(spark, dir)
    val target = qualityCore(spark, dir)
      .filter(col("quality_score") >= DsirQualityBar).select(col("doc_id"))
    val targetCnt = bg.join(target, Seq("doc_id"), "left_semi")
      .groupBy(col("bigram")).agg(count(lit(1)).as("tc"))
      .orderBy(col("tc").desc, col("bigram")).limit(DsirVocabTop)
    val corpusCnt = bg.groupBy(col("bigram")).agg(count(lit(1)).as("cc"))
      .orderBy(col("cc").desc, col("bigram")).limit(DsirVocabTop)
    // smoothed totals: capped model mass + V (exact integer adds; the
    // empty-target coalesce keeps tt defined if no doc clears the bar)
    val totals = targetCnt.agg(
        (coalesce(sum(col("tc")), lit(0L)) + lit(DsirVocabTop.toLong)).as("tt"))
      .crossJoin(corpusCnt.agg(
        (coalesce(sum(col("cc")), lit(0L)) + lit(DsirVocabTop.toLong)).as("ct")))
    bg.join(broadcast(targetCnt), Seq("bigram"), "left")
      .join(broadcast(corpusCnt), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("tc"), lit(0L)) + lit(1L)).as("target_mass"),
        sum(coalesce(col("cc"), lit(0L)) + lit(1L)).as("corpus_mass"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_bigrams"), col("target_mass"),
        col("corpus_mass"),
        ((col("target_mass").cast("double") / col("tt").cast("double")) /
          (col("corpus_mass").cast("double") / col("ct").cast("double")))
          .as("dsir_weight"))
      .filter(col("dsir_weight") >= DsirKeep)
      .orderBy(col("doc_id"))
  }

  val textDsirFilterSql: String =
    s"""WITH $bigramCtes,
       |quality AS ($qualitySelectSql),
       |target AS (SELECT doc_id FROM quality WHERE quality_score >= $DsirQualityBar),
       |tcnt AS (
       |  SELECT bigram, tc FROM (
       |    SELECT bigram, COUNT(*) AS tc,
       |      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rn
       |    FROM bg WHERE doc_id IN (SELECT doc_id FROM target) GROUP BY bigram) r
       |  WHERE rn <= $DsirVocabTop),
       |ccnt AS (
       |  SELECT bigram, cc FROM (
       |    SELECT bigram, COUNT(*) AS cc,
       |      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rn
       |    FROM bg GROUP BY bigram) r
       |  WHERE rn <= $DsirVocabTop),
       |tot AS (SELECT
       |  (SELECT CAST(COALESCE(SUM(tc), 0) + $DsirVocabTop AS BIGINT) FROM tcnt) AS tt,
       |  (SELECT CAST(COALESCE(SUM(cc), 0) + $DsirVocabTop AS BIGINT) FROM ccnt) AS ct)
       |SELECT doc_id, n_bigrams, target_mass, corpus_mass, dsir_weight FROM (
       |  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(COALESCE(t.tc, 0) + 1) AS BIGINT) AS target_mass,
       |    CAST(SUM(COALESCE(c.cc, 0) + 1) AS BIGINT) AS corpus_mass,
       |    (CAST(SUM(COALESCE(t.tc, 0) + 1) AS DOUBLE) / CAST((SELECT tt FROM tot) AS DOUBLE))
       |      / (CAST(SUM(COALESCE(c.cc, 0) + 1) AS DOUBLE) / CAST((SELECT ct FROM tot) AS DOUBLE)) AS dsir_weight
       |  FROM bg b LEFT JOIN ccnt c ON b.bigram = c.bigram
       |  LEFT JOIN tcnt t ON b.bigram = t.bigram
       |  GROUP BY b.doc_id) s
       |WHERE dsir_weight >= $DsirKeep
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------- sliding-window chunking
  private val OvWindow = 20 // words per chunk
  private val OvStride = 10 // overlap = OvWindow - OvStride

  /** Sliding-window chunking with overlap — the RAG / long-context
    * training prep step (fixed window, 50% stride) as opposed to the
    * disjoint segments of text_chunk_dedup and the greedy bin-packing
    * of text_shard_pack. Chunk count is the standard
    * ceil((n − W)/S) + 1 (one chunk when n ≤ W), so the final chunk
    * may be short rather than text being dropped.
    *
    * Scale shape: pure per-row projection + one explode — pipelines
    * into the scan with zero shuffles; only the oracle's ORDER BY
    * sorts. The md5 digest certifies every chunk's exact content. */
  def textChunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    val nChunks = expr(
      s"""CASE WHEN size(ws) <= $OvWindow THEN 1
         |     ELSE CAST(ceil((size(ws) - $OvWindow) / $OvStride.0d) AS INT) + 1
         |END""".stripMargin)
    docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), nChunks.as("nc"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, nc - 1),
           |  i -> slice(ws, i * $OvStride + 1, $OvWindow))""".stripMargin))
        .as(Seq("chunk_id", "cw")))
      .select(col("doc_id"), col("chunk_id").cast("bigint").as("chunk_id"),
        size(col("cw")).cast("bigint").as("n_words"),
        md5(array_join(col("cw"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val textChunkOverlapSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
       |n AS (
       |  SELECT doc_id, ws,
       |    CASE WHEN LEN(ws) <= $OvWindow THEN 1
       |         ELSE CAST(CEIL((LEN(ws) - $OvWindow) / $OvStride.0) AS INT) + 1
       |    END AS nc
       |  FROM d),
       |ch AS (
       |  SELECT doc_id, i AS chunk_id,
       |    ws[i * $OvStride + 1 : i * $OvStride + $OvWindow] AS cw
       |  FROM n, UNNEST(RANGE(0, nc)) AS r(i))
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(LEN(cw) AS BIGINT) AS n_words,
       |  md5(ARRAY_TO_STRING(cw, ' ')) AS chunk_md5
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  // --------------------------- per-source quality percentile filter
  private val PctKeep = 0.5

  /** Per-source quality normalization: rank every document's quality
    * score WITHIN its source and keep the top half of each source —
    * the curation step that stops one high-scoring domain from
    * crowding out every other (absolute thresholds over-select the
    * cleanest domain; percentile thresholds select uniformly).
    * percent_rank = (rank−1)/(n−1) over a unique (score desc, doc_id)
    * order — exact-integer division, identical in both engines.
    *
    * Scale shape: ONE shuffle on source with a per-source sort.
    * Sources are few and large at 100 TB, so the production variant
    * [[textQualityPercentileProd]] (r11, its own gate) computes each
    * source's score threshold approximately via a histogram quantile,
    * broadcasts it, and filters — no full sort; the exact window here
    * is the gate-scale reference semantics the spec bounds it
    * against. */
  def textQualityPercentile(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    qualityCore(spark, dir)
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= PctKeep)
      .select(col("doc_id"), col("source"), col("quality_score"), col("pr"))
      .orderBy(col("doc_id"))
  }

  val textQualityPercentileSql: String =
    s"""WITH quality AS ($qualitySelectSql),
       |ranked AS (
       |  SELECT q.doc_id, d.source, q.quality_score,
       |    PERCENT_RANK() OVER (PARTITION BY d.source
       |      ORDER BY q.quality_score DESC, q.doc_id) AS pr
       |  FROM quality q JOIN documents d ON q.doc_id = d.doc_id)
       |SELECT doc_id, source, quality_score, pr
       |FROM ranked WHERE pr <= $PctKeep
       |ORDER BY doc_id""".stripMargin

  // --------------- production quality-percentile (histogram threshold)
  private[operators] val PctBuckets = 64.0

  /** Production twin of [[textQualityPercentile]] (VERDICT r10 next
    * #2 — the shape that gate's own Scaladoc promised): per-source
    * score threshold computed APPROXIMATELY, broadcast, filtered —
    * no full per-source sort of the document stream anywhere.
    *
    * The approximation is a fixed-width histogram quantile rather
    * than `approx_percentile`: Spark's sketch is merge-order-
    * dependent and NOT reproducible in the oracle engine, while a
    * histogram threshold is exact integer arithmetic over exact IEEE
    * bucket ids in both engines (score arithmetic is already
    * parity-proven by text_quality). Bucket = ⌊score·64⌋; per source
    * the threshold T is the highest bucket whose from-the-top
    * cumulative count reaches the exact gate's keep size
    * ⌊(n+1)/2⌋; survivors = every doc in buckets ≥ T. Guarantees
    * (specced in QualityPercentileProdSpec): the exact top-half is a
    * SUBSET of the survivors, and the overshoot is < the threshold
    * bucket's population — the granularity bound, shrinking as 1/64
    * of the score range.
    *
    * Scale shape: one partial-aggregable groupBy(source, bucket) —
    * the ONLY pass over the corpus until the final filter; the
    * cumulative window runs over the HISTOGRAM (|sources|·|buckets|
    * rows, hundreds); thresholds return to the stream via a
    * broadcast-hash join; the filter is map-side. Compare the exact
    * gate: one shuffle + full per-source SORT of every document.
    * Null scores (empty docs — digit_ratio undefined) are excluded
    * from histogram, keep budget, and survivors identically in both
    * engines. */
  def textQualityPercentileProd(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityCore(spark, dir)
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .withColumn("b", floor(col("quality_score") * PctBuckets))
      .filter(col("b").isNotNull)
    val hist = q.groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("b").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val thr = hist.withColumn("cum_ge", sum(col("c")).over(wTop))
      .join(tot, "source")
      .filter(col("cum_ge") >= expr("(n + 1) div 2"))
      .groupBy(col("source")).agg(max(col("b")).as("thr_bucket"))
    q.join(broadcast(thr), "source")
      .filter(col("b") >= col("thr_bucket"))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("thr_bucket"))
      .orderBy(col("doc_id"))
  }

  val textQualityPercentileProdSql: String =
    s"""WITH quality AS ($qualitySelectSql),
       |q AS (
       |  SELECT q.doc_id, d.source, q.quality_score,
       |    CAST(FLOOR(q.quality_score * $PctBuckets) AS BIGINT) AS b
       |  FROM quality q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE q.quality_score IS NOT NULL),
       |hist AS (SELECT source, b, COUNT(*) AS c FROM q GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY source),
       |cum AS (
       |  SELECT source, b,
       |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY b DESC) AS BIGINT)
       |      AS cum_ge
       |  FROM hist),
       |thr AS (
       |  SELECT c.source, MAX(c.b) AS thr_bucket
       |  FROM cum c JOIN tot t ON c.source = t.source
       |  WHERE c.cum_ge >= (t.n + 1) // 2
       |  GROUP BY c.source)
       |SELECT q.doc_id, q.source, q.quality_score, t.thr_bucket
       |FROM q JOIN thr t ON q.source = t.source AND q.b >= t.thr_bucket
       |ORDER BY doc_id""".stripMargin

  // -------------------------------- exact n-gram decontamination
  private[operators] val DecontamN = 5

  /** GPT-3-style exact n-gram decontamination, complementing
    * `pipeline_contamination` (which flags cross-split NEAR-dups via
    * MinHash): a train document is contaminated if any of its word
    * 5-grams appears VERBATIM in any test-split document. Splits are
    * the same deterministic md5 80/10/10 as text_hash_split. Emits
    * every contaminated train doc with its overlap counts and
    * contaminated-gram fraction.
    *
    * Scale shape: one shingle explode per side; the join carries
    * 16-byte gram digests, never text; the test side is DISTINCT
    * (bounded by the test split) and both sides equi-join on the
    * digest, then one partial agg on doc_id. Boilerplate grams skew
    * the join key at 100 TB — the same document-frequency cap as
    * dedup_ngram_jaccard_capped applies unchanged. */
  def textNgramDecontam(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") % 100
    val grams = docsPar(spark, dir)
      .select(col("doc_id"),
        when(h < 80, lit("train")).when(h < 90, lit("val"))
          .otherwise(lit("test")).as("split"),
        split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= DecontamN)
      .select(col("doc_id"), col("split"), explode(expr(
        s"""transform(sequence(1, size(ws) - ${DecontamN - 1}),
           |  i -> md5(array_join(slice(ws, i, $DecontamN), ' ')))""".stripMargin))
        .as("gram"))
    val testGrams = grams.filter(col("split") === "test")
      .select(col("gram")).distinct().withColumn("hit", lit(1))
    grams.filter(col("split") === "train")
      .join(testGrams, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_shared_occ"),
        countDistinct(when(col("hit").isNotNull, col("gram"))).as("n_shared_distinct"))
      .filter(col("n_shared_occ") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_shared_occ"),
        col("n_shared_distinct"),
        (col("n_shared_occ").cast("double") / col("n_grams").cast("double"))
          .as("contam_frac"))
      .orderBy(col("doc_id"))
  }

  val textNgramDecontamSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 80 THEN 'train'
       |         WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    STRING_SPLIT(text, ' ') AS ws
       |  FROM documents
       |  WHERE LEN(STRING_SPLIT(text, ' ')) >= $DecontamN),
       |grams AS (
       |  SELECT doc_id, split,
       |    md5(ARRAY_TO_STRING(ws[i : i + ${DecontamN - 1}], ' ')) AS gram
       |  FROM d, UNNEST(RANGE(1, LEN(ws) - ${DecontamN - 2})) AS r(i)),
       |test_grams AS (
       |  SELECT DISTINCT gram, 1 AS hit FROM grams WHERE split = 'test')
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN g.hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_occ,
       |  CAST(COUNT(DISTINCT CASE WHEN g.hit IS NOT NULL THEN t.gram END) AS BIGINT) AS n_shared_distinct,
       |  CAST(SUM(CASE WHEN g.hit IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS contam_frac
       |FROM grams t LEFT JOIN test_grams g ON t.gram = g.gram
       |WHERE t.split = 'train'
       |GROUP BY t.doc_id
       |HAVING SUM(CASE WHEN g.hit IS NOT NULL THEN 1 ELSE 0 END) > 0
       |ORDER BY doc_id""".stripMargin

  // ------------------------- Bloom-prefiltered decontamination
  /** Provisioned capacity for the benchmark-gram Bloom filter. A cap,
    * not a limit: overflow past it degrades the false-positive rate
    * (more candidates reach the exact confirm join) but NEVER the
    * result — the opposite failure mode of an unbounded broadcast
    * model (which OOMs). At 100 TB a full eval-suite gram set is
    * ~1e8 entries → ~115 MB of bits at this fpp, still a routine
    * broadcast; the constant here is sized for gate scale. */
  private val BloomCapacity = 1L << 17
  private val BloomFpp = 0.01

  /** Decontamination against a FIXED benchmark set, restructured for
    * the 100 TB shape: `text_ngram_decontam` joins every train gram
    * against the test grams, so the (huge) train side pays a join for
    * ~100% clean data. Here the distinct test grams are folded into a
    * Bloom filter (distributed build via `stat.bloomFilter` — the
    * sketch merges per-partition, only ~`BloomCapacity·ln(1/fpp)` BITS
    * ever reach the driver), the train side is prefiltered map-side by
    * a codegen'd `graft_bloom_might_contain` probe on `xxhash64(gram)`
    * — no shuffle, no exchange, inside the scan's WholeStageCodegen
    * span — and only the surviving ~fpp fraction meets the exact
    * confirm join (broadcast: the benchmark set is bounded by
    * construction). False positives die in the confirm join, so the
    * output is EXACTLY the contaminated-doc set; the oracle needs no
    * Bloom at all.
    *
    * Emits (doc_id, n_shared_distinct) per contaminated train doc —
    * the same distinct-overlap count as the sibling gate, cross-
    * checkable row for row. */
  def textBloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") % 100
    val grams = docsPar(spark, dir)
      .select(col("doc_id"),
        when(h < 80, lit("train")).when(h < 90, lit("val"))
          .otherwise(lit("test")).as("split"),
        split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= DecontamN)
      .select(col("doc_id"), col("split"), explode(expr(
        s"""transform(sequence(1, size(ws) - ${DecontamN - 1}),
           |  i -> md5(array_join(slice(ws, i, $DecontamN), ' ')))""".stripMargin))
        .as("gram"))
    val testGrams = grams.filter(col("split") === "test")
      .select(col("gram")).distinct()
    // NOT df.stat.bloomFilter: its treeAggregate seeds with null and
    // NPEs on an empty input (an empty benchmark set must mean "no
    // candidates", not a crash). Same distributed build, non-null
    // zero: each partition folds its grams into a local filter and
    // the ~BloomCapacity·ln(1/fpp)-bit sketches OR-merge up the tree
    // — raw grams never reach the driver.
    import spark.implicits._
    val bloom = testGrams.select(xxhash64(col("gram"))).as[Long].rdd
      .treeAggregate(BloomFilter.create(BloomCapacity, BloomFpp))(
        (bf, v) => { bf.putLong(v); bf },
        (a, b) => { a.mergeInPlace(b); a })
    grams.filter(col("split") === "train")
      .filter(graft.functions.BloomExpressions.mightContainLong(
        xxhash64(col("gram")), bloom))
      .join(broadcast(testGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared_distinct"))
      .orderBy(col("doc_id"))
  }

  /** Oracle is the exact semantics — the Bloom stage is invisible to
    * the result by the no-false-negative + exact-confirm argument. */
  val textBloomDecontamSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 80 THEN 'train'
       |         WHEN ('0x' || SUBSTR(md5(text), 1, 4))::INT % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    STRING_SPLIT(text, ' ') AS ws
       |  FROM documents
       |  WHERE LEN(STRING_SPLIT(text, ' ')) >= $DecontamN),
       |grams AS (
       |  SELECT doc_id, split,
       |    md5(ARRAY_TO_STRING(ws[i : i + ${DecontamN - 1}], ' ')) AS gram
       |  FROM d, UNNEST(RANGE(1, LEN(ws) - ${DecontamN - 2})) AS r(i)),
       |test_grams AS (
       |  SELECT DISTINCT gram FROM grams WHERE split = 'test')
       |SELECT t.doc_id,
       |  CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_shared_distinct
       |FROM grams t JOIN test_grams g ON t.gram = g.gram
       |WHERE t.split = 'train'
       |GROUP BY t.doc_id
       |ORDER BY doc_id""".stripMargin

  // ------------------------- exact repeated-substring spans
  private[operators] val SubstrK = 8
  private val SubstrSalt = 16
  private val HotGramCnt = 64 //    occurrences above which a gram salts
  private val HotGramCap = 65536 // max hot grams broadcast (df-cap bound)

  /** Exact substring-duplication spans — the signal behind
    * suffix-array training-data dedup (find every ≥K-token substring
    * that occurs more than once in the corpus), re-expressed for a
    * distributed engine: a position is "duplicated" iff its K-gram
    * occurs ≥2 times corpus-wide (any doc, any position — intra-doc
    * repeats count), and maximal CONSECUTIVE runs of duplicated
    * positions are merged per doc with the pos − row_number() trick
    * (consecutive integers share the difference), so no recursion and
    * the oracle is plain SQL. Emits per affected doc the run count,
    * total duplicated positions, and longest run.
    *
    * Scale shape: one explode; the corpus-wide gram count is a
    * partial-aggregable two-phase hash aggregate on the 16-byte
    * digest (hot boilerplate grams collapse map-side — never a
    * window over the gram partition); the join back to positions is
    * the one honest big-big shuffle of the operator, carrying only
    * (digest, doc_id, pos) — AQE skew-split backstops hot digests,
    * and the df-cap pattern of dedup_ngram_jaccard_capped applies if
    * boilerplate needs bounding by construction. The run merge is a
    * per-doc window (doc_id exchange) over ints. ~3 digest/id-only
    * exchanges total; text never shuffles. */
  def textSubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val grams = docsPar(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= SubstrK)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(ws) - ${SubstrK - 1}),
           |  i -> md5(array_join(slice(ws, i, $SubstrK), ' ')))""".stripMargin)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
    // The join back is skew-protected but NOT blanket-salted (r8).
    // AQE cannot rescue it: the dup side's final HashAggregate sits
    // between its exchange and the join, so OptimizeSkewedJoin's
    // two-clean-shuffle-stages pattern never matches (verified — an
    // explicit repartition on the dup side is collapsed into the
    // aggregate's exchange; the same not-AQE-rescuable verdict as
    // chunk dedup's unfiltered form). r7 salted EVERY dup gram ×16;
    // the r8 1M-doc soak measured that blanket salt at 1.8× the
    // unsalted join on a skew-FREE corpus (SCALE.md) — a tax on
    // exactly the corpora that need no protection. TWO-TIER form:
    // only grams with > $HotGramCnt occurrences (the boilerplate that
    // creates reducer hot spots) are salted ×$SubstrSalt; the long
    // tail joins on (gram, 0). Hot membership rides a BROADCAST of
    // the top-$HotGramCap hottest dup grams — bounded by construction
    // (the dedup_ngram_jaccard_capped df-cap pattern); a pathological
    // corpus with MORE than $HotGramCap hot grams spreads the excess
    // by its own cardinality. Salting stays exact: each position
    // matches exactly one (gram, salt) row.
    // materialized ONCE (localCheckpoint): the dup-gram relation
    // (16-byte digest + count) feeds both the hot set and the join
    // side — unmaterialized, each consumer re-expands the corpus
    // explode+aggregate subtree (a third full scan, verified in the
    // plan golden). At 100 TB this is the persisted gram-count index
    // beside the corpus, the sim_ann_ivfpq materialization pattern.
    val gramCounts = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .localCheckpoint()
    val hot = gramCounts.filter(col("cnt") > HotGramCnt)
      .orderBy(col("cnt").desc, col("gram")).limit(HotGramCap)
      .select(col("gram").as("hg"))
    val dupGrams = gramCounts
      .join(broadcast(hot), col("gram") === col("hg"), "left")
      .select(col("gram"),
        when(col("hg").isNotNull, lit(SubstrSalt)).otherwise(lit(1)).as("nsalt"))
      .withColumn("salt", explode(expr("sequence(0, nsalt - 1)")))
      .select(col("gram"), col("salt"))
    val saltedGrams = grams
      .join(broadcast(hot), col("gram") === col("hg"), "left")
      .withColumn("salt",
        when(col("hg").isNotNull,
          pmod(xxhash64(col("doc_id"), col("pos")), lit(SubstrSalt.toLong))
            .cast("int"))
          .otherwise(lit(0)))
      .drop("hg")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    saltedGrams.join(dupGrams, Seq("gram", "salt"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_pos"), max(col("pos")).as("end_pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"),
        sum(col("n_pos")).as("n_dup_positions"),
        max(col("n_pos")).as("max_run"))
      .orderBy(col("doc_id"))
  }

  /** Diagnostic twin of [[textSubstringDedup]] with the UNSALTED
    * join-back — NOT a gate: ScaleSoak times both so the ×$SubstrSalt
    * salt's overhead on benign corpora and its protection under
    * boilerplate skew are measured numbers (SCALE.md r8). Identical
    * results by construction. */
  private[operators] def textSubstringDedupUnsalted(spark: SparkSession,
      dir: String): DataFrame = {
    val grams = docsPar(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= SubstrK)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(ws) - ${SubstrK - 1}),
           |  i -> md5(array_join(slice(ws, i, $SubstrK), ' ')))""".stripMargin)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("gram"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    grams.join(dupGrams, Seq("gram"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_pos"), max(col("pos")).as("end_pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"),
        sum(col("n_pos")).as("n_dup_positions"),
        max(col("n_pos")).as("max_run"))
      .orderBy(col("doc_id"))
  }

  val textSubstringDedupSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
       |  WHERE LEN(STRING_SPLIT(text, ' ')) >= $SubstrK),
       |grams AS (
       |  SELECT doc_id, i AS pos,
       |    md5(ARRAY_TO_STRING(ws[i : i + ${SubstrK - 1}], ' ')) AS gram
       |  FROM d, UNNEST(RANGE(1, LEN(ws) - ${SubstrK - 2})) AS r(i)),
       |dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
       |pos_runs AS (
       |  SELECT g.doc_id, g.pos,
       |    g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS grp
       |  FROM grams g JOIN dup USING (gram)),
       |runs AS (
       |  SELECT doc_id, grp, COUNT(*) AS n_pos
       |  FROM pos_runs GROUP BY doc_id, grp)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
       |  CAST(SUM(n_pos) AS BIGINT) AS n_dup_positions,
       |  CAST(MAX(n_pos) AS BIGINT) AS max_run
       |FROM runs GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- inverted index
  private val PostingsHead = 10

  /** Inverted-index build (the search/retrieval artifact a corpus
    * pipeline materializes beside the training shards): per term, the
    * document frequency, total term frequency, and the head of the
    * sorted posting list. Two hash aggregations — (term, doc) tf then
    * term-level fold — so the explode shuffles once on (term, doc)
    * and once on term; the posting-list head is bounded at
    * $PostingsHead ids so no term ever materializes an unbounded
    * list. At 100 TB: postings shard by term range (the term-level
    * shuffle IS that sharding), full posting lists stream to
    * per-term-range files rather than a collect_list, and df/tf stay
    * partial-aggregable as here. */
  def textInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = docs(spark, dir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(
          transform(
            slice(sort_array(collect_list(col("doc_id"))), 1, PostingsHead),
            _.cast("string")),
          ",").as("postings_head"))
      .orderBy(col("term"))
  }

  val textInvertedIndexSql: String =
    s"""WITH per_doc AS (
       |  SELECT t.term, doc_id, COUNT(*) AS tf
       |  FROM documents, UNNEST(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS t(term)
       |  GROUP BY t.term, doc_id)
       |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       |  ARRAY_TO_STRING(LIST_SLICE(LIST(doc_id ORDER BY doc_id), 1, $PostingsHead), ',')
       |    AS postings_head
       |FROM per_doc
       |GROUP BY term
       |ORDER BY term""".stripMargin

  // --------------------------------------------------- fuzzy join
  /** Blocked fuzzy join (entity resolution / record linkage): a query
    * set with a 1-char corruption links back to the corpus by edit
    * distance ≤ 3 on 30-char prefixes. Candidates come from an
    * EQUI-join on an unperturbed 16-char block segment — the classic
    * blocking discipline, so Levenshtein (quadratic per pair) only
    * runs on block-collision pairs and the plan never goes all-pairs.
    * Distances are exact integers — structural parity.
    *
    * Scale notes: block-key equi-join is the same candidate-bounding
    * shape as the dedup band joins; block sizes are bounded by
    * near-dup clique sizes. At 100 TB use several SHIFTED block
    * segments OR'd together (multi-probe) so recall survives edits
    * inside any single block, and cap block sizes like
    * `dedup_ngram_jaccard_capped`. */
  def textFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val corpus = docs(spark, dir)
      .select(col("doc_id").as("c_doc_id"),
        substring(col("text"), 1, 30).as("c_prefix"),
        substring(col("text"), 5, 20).as("block"))
    val queries = docs(spark, dir)
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_doc_id"),
        concat(lit("z"), substring(col("text"), 2, 29)).as("q_prefix"),
        substring(col("text"), 5, 20).as("block"))
    queries.join(corpus, Seq("block"))
      // thresholded form: early-exits at distance > 3 (returns -1),
      // O(threshold·len) per pair instead of O(len²) — the variant
      // that matters when prefixes are long at scale
      .withColumn("dist", levenshtein(col("q_prefix"), col("c_prefix"), 3))
      .filter(col("dist").between(0, 3))
      .select(col("q_doc_id"), col("c_doc_id"),
        col("dist").cast("bigint").as("dist"))
      .orderBy(col("q_doc_id"), col("c_doc_id"))
  }

  val textFuzzyJoinSql: String =
    """WITH c AS (
      |  SELECT doc_id AS c_doc_id, SUBSTR(text, 1, 30) AS c_prefix,
      |    SUBSTR(text, 5, 20) AS block
      |  FROM documents),
      |q AS (
      |  SELECT doc_id AS q_doc_id, 'z' || SUBSTR(text, 2, 29) AS q_prefix,
      |    SUBSTR(text, 5, 20) AS block
      |  FROM documents WHERE doc_id % 97 = 0)
      |SELECT q_doc_id, c_doc_id,
      |  CAST(LEVENSHTEIN(q_prefix, c_prefix) AS BIGINT) AS dist
      |FROM q JOIN c USING (block)
      |WHERE LEVENSHTEIN(q_prefix, c_prefix) <= 3
      |ORDER BY q_doc_id, c_doc_id""".stripMargin

  /** URL canonicalization — the web-corpus curation step that
    * precedes URL-level dedup (CommonCrawl pipelines dedup fetches by
    * canonical URL before any content hashing). Deterministic URLs
    * are derived from document metadata, then Spark's `parse_url`
    * (HOST / PATH / QUERY / QUERY-with-key forms) extracts the
    * components; the canonical form strips the query (tracking
    * params) and the per-host frequency a dedup pass would key on is
    * computed per row. The oracle re-parses the identically-derived
    * strings with regexes — two independent parser implementations
    * over the same input.
    *
    * Scale shape: parsing is per-row codegen (parse_url is a
    * codegen'd expression, not a UDF); the host-frequency count is
    * the one exchange, on the low-cardinality host key — at 100 TB
    * that is a map-side-combined agg of ~#hosts rows broadcast back,
    * never a shuffle of the documents. */
  def textUrlParse(spark: SparkSession, dir: String): DataFrame = {
    val withUrl = docs(spark, dir)
      .select(col("doc_id"), concat(lit("https://"), col("source"),
        lit(".example.com/"), col("lang"), lit("/doc-"), col("doc_id"),
        lit("?utm_source=feed&ref="), col("source")).as("url"))
    val parsed = withUrl.select(col("doc_id"),
      parse_url(col("url"), lit("HOST")).as("host"),
      parse_url(col("url"), lit("PATH")).as("path"),
      parse_url(col("url"), lit("QUERY")).as("query"),
      parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
      .withColumn("canonical", concat(col("host"), col("path")))
    val hostCounts = parsed.groupBy(col("host"))
      .agg(count(lit(1)).as("host_docs"))
    parsed.join(broadcast(hostCounts), Seq("host"))
      .select(col("doc_id"), col("host"), col("path"), col("query"),
        col("ref"), col("canonical"), col("host_docs"))
      .orderBy(col("doc_id"))
  }

  val textUrlParseSql: String =
    """WITH u AS (
      |  SELECT doc_id, 'https://' || source || '.example.com/' || lang ||
      |    '/doc-' || CAST(doc_id AS STRING) || '?utm_source=feed&ref=' ||
      |    source AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id,
      |    regexp_extract(url, 'https?://([^/]+)', 1) AS host,
      |    regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path,
      |    regexp_extract(url, '[?]([^#]*)', 1) AS query,
      |    regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
      |  FROM u)
      |SELECT doc_id, host, path, query, ref,
      |  host || path AS canonical,
      |  COUNT(*) OVER (PARTITION BY host) AS host_docs
      |FROM p ORDER BY doc_id""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "text_url_parse" -> ((textUrlParse _, textUrlParseSql)),
    "text_langid" -> ((textLangid _, textLangidSql)),
    "text_quality" -> ((textQuality _, textQualitySql)),
    "text_tokens" -> ((textTokens _, textTokensSql)),
    "text_tokens_bpe" -> ((textTokensBpe _, textTokensBpeSql)),
    "text_tokens_bpe_merges" ->
      ((textTokensBpeMerges _, textTokensBpeMergesSql)),
    "text_seq_pack_bpe" -> ((textSeqPackBpe _, textSeqPackBpeSql)),
    "text_fingerprint" -> ((textFingerprint _, textFingerprintSql)),
    "text_tfidf" -> ((textTfidf _, textTfidfSql)),
    "text_redact" -> ((textRedact _, textRedactSql)),
    "text_hash_split" -> ((textHashSplit _, textHashSplitSql)),
    "text_global_shuffle" -> ((textGlobalShuffle _, textGlobalShuffleSql)),
    "text_chunk_dedup" -> ((textChunkDedup _, textChunkDedupSql)),
    "text_repetition" -> ((textRepetition _, textRepetitionSql)),
    "text_stratified_sample" -> ((textStratifiedSample _, textStratifiedSampleSql)),
    "text_shard_pack" -> ((textShardPack _, textShardPackSql)),
    "text_shard_pack_prod" -> ((textShardPackProd _, textShardPackSql)),
    "text_seq_pack" -> ((textSeqPack _, textSeqPackSql)),
    "text_seq_pack_prod" -> ((textSeqPackProd _, textSeqPackSql)),
    "text_seq_pack_shuffled" -> ((textSeqPackShuffled _, textSeqPackShuffledSql)),
    "text_source_cap" -> ((textSourceCap _, textSourceCapSql)),
    "text_mix_weights" -> ((textMixWeights _, textMixWeightsSql)),
    "text_mix_temperature" -> ((textMixTemperature _, textMixTemperatureSql)),
    "text_lm_score" -> ((textLmScore _, textLmScoreSql)),
    "text_dsir_filter" -> ((textDsirFilter _, textDsirFilterSql)),
    "text_chunk_overlap" -> ((textChunkOverlap _, textChunkOverlapSql)),
    "text_quality_percentile" -> ((textQualityPercentile _, textQualityPercentileSql)),
    "text_quality_percentile_prod" -> ((textQualityPercentileProd _, textQualityPercentileProdSql)),
    "text_ngram_decontam" -> ((textNgramDecontam _, textNgramDecontamSql)),
    "text_bloom_decontam" -> ((textBloomDecontam _, textBloomDecontamSql)),
    "text_substring_dedup" -> ((textSubstringDedup _, textSubstringDedupSql)),
    "text_inverted_index" -> ((textInvertedIndex _, textInvertedIndexSql)),
    "text_fuzzy_join" -> ((textFuzzyJoin _, textFuzzyJoinSql)))
}
