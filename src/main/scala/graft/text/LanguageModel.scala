package graft.text

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language model + perplexity scoring — the classic
  * LM-based quality filter for training-data curation (CCNet-style: train a
  * small LM on a trusted corpus, score candidate documents, gate on
  * perplexity; the reference has no LM surface — this is a north-star
  * addition like the dedup family, designed for the 100 TB pipeline).
  *
  * Model: add-one-smoothed bigram LM over the frozen tokenizer
  * ([[Text.tokens]] — the same tokenization BM25 and the dedup shingles
  * use, so one staged token array serves every text operator):
  *
  *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)
  *
  * where `c(w1,w2)` counts the bigram in the training corpus, `c(w1)`
  * counts w1 as a bigram PREFIX (positions 1..n−1 — the event space the
  * conditional is normalized over), and `V` is the training vocabulary
  * size. A document's score is the mean negative log-probability of its
  * bigrams (`lm_nlp`, natural log) and its exponential (`ppl`, the
  * perplexity): higher = less like the training corpus. Unseen bigrams and
  * unseen prefixes are well-defined through the smoothing (c = 0), so a
  * model trained on corpus A scores ANY corpus B.
  *
  * Scale shape: training is two map-side-combinable groupBy counts over
  * exploded bigrams plus one distinct-count (shuffles keyed by bigram/term
  * hash — no skew beyond natural token skew, which AQE splits). Scoring is
  * doc-bigrams ⟕ bigram-counts ⟕ prefix-counts — two equi-joins against
  * count tables that at 100 TB are Parquet side tables bucketed by their
  * join key (the [[graft.index.IndexStore]] postings layout applies
  * verbatim), then one map-side-combinable per-doc aggregation. No windows,
  * no driver collect (the vocab size is a single scalar), no UDFs.
  *
  * Determinism: counts are exact integers; the only floats are ln and the
  * final mean, rounded to [[ScoreDecimals]] on both engines (the BM25
  * precedent — SURVEY §7.4 risk 4).
  */
object LanguageModel {
  val ScoreDecimals = 6

  /** @param bigramCounts (w1, w2, c)      — training bigram counts
    * @param prefixCounts (w1, cc)         — training bigram-prefix counts
    * @param vocabSize    V                — distinct training tokens */
  final case class BigramLm(bigramCounts: DataFrame, prefixCounts: DataFrame, vocabSize: Long)

  /** Per-document bigram pairs: (id, w1, w2) — one row per ADJACENT token
    * pair, built narrowly from the staged token array (zip_with of the two
    * shifted slices; no self-join, no window). `private[graft]`: the
    * persisted LM family ([[graft.index.IndexStore.saveLm]]) builds its
    * per-wave count deltas from the same relation, so the two can never
    * disagree about what a bigram is. */
  private[graft] def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1"), col("bg.w2"))

  /** Train on a corpus (the offline job — run once on the trusted corpus,
    * persist the two count tables like any index). */
  def train(docs: DataFrame, idCol: String, textCol: String): BigramLm = {
    val p = pairs(docs, idCol, textCol)
    val bigramCounts = p.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val prefixCounts = p.groupBy("w1").agg(count(lit(1)).as("cc"))
    val vocabSize = docs
      .select(explode(Text.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    BigramLm(bigramCounts, prefixCounts, vocabSize)
  }

  /** Score documents under a trained model: (id, lm_nlp, ppl, n_bigrams) —
    * docs with fewer than two tokens have no bigrams and no row (a
    * zero-evidence doc has no perplexity; gate it on length instead). */
  def score(lm: BigramLm, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nlp = pairs(docs, idCol, textCol)
      .join(lm.bigramCounts, Seq("w1", "w2"), "left")
      .join(lm.prefixCounts, Seq("w1"), "left")
      .withColumn("x", -log(
        (coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cc"), lit(0L)) + lit(lm.vocabSize.toDouble))))
    nlp.groupBy(col("id"))
      .agg(
        round(avg(col("x")), ScoreDecimals).as("lm_nlp"),
        round(exp(avg(col("x"))), ScoreDecimals).as("ppl"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Self-scoring convenience (corpus self-perplexity — the declared-query
    * shape: outlier documents stand out against the corpus's own LM). */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    score(train(docs, idCol, textCol), docs, idCol, textCol)

  /** DuckDB rendition with SEPARATE train and score corpora, ending in a
    * `lmscore(id, lm_nlp, ppl, n_bigrams)` relation — the oracle for the
    * persisted-family queries (fold scoring, as-of scoring), where the
    * scored corpus can contain bigrams/prefixes the training horizon
    * never saw: LEFT joins + coalesce(0) reproduce [[score]]'s smoothing
    * exactly (identical arithmetic to the inner-join self-score when
    * train = score). Paste after `WITH `. */
  def sqlScoreCtes(trainTable: String, scoreTable: String, idExpr: String,
      textExpr: String): String =
    s"""lmtoks AS (
       |  SELECT $idExpr AS id, ${Text.sqlTokens(textExpr)} AS toks FROM $trainTable
       |), lmbg AS (
       |  SELECT id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z FROM lmtoks
       |), lmpairs AS (
       |  SELECT id, z[1] AS w1, z[2] AS w2 FROM lmbg
       |), lmbgc AS (
       |  SELECT w1, w2, count(*) AS c FROM lmpairs GROUP BY 1, 2
       |), lmctx AS (
       |  SELECT w1, count(*) AS cc FROM lmpairs GROUP BY 1
       |), lmvocab AS (
       |  SELECT count(DISTINCT t)::DOUBLE AS v FROM (SELECT unnest(toks) AS t FROM lmtoks)
       |), lmstoks AS (
       |  SELECT $idExpr AS id, ${Text.sqlTokens(textExpr)} AS toks FROM $scoreTable
       |), lmsbg AS (
       |  SELECT id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z FROM lmstoks
       |), lmspairs AS (
       |  SELECT id, z[1] AS w1, z[2] AS w2 FROM lmsbg
       |), lmnlp AS (
       |  SELECT p.id, -ln((coalesce(b.c, 0) + 1.0) / (coalesce(x.cc, 0) + lmvocab.v)) AS nlp
       |  FROM lmspairs p
       |  LEFT JOIN lmbgc b USING (w1, w2)
       |  LEFT JOIN lmctx x USING (w1)
       |  CROSS JOIN lmvocab
       |), lmscore AS (
       |  SELECT id, round(avg(nlp), $ScoreDecimals) AS lm_nlp,
       |         round(exp(avg(nlp)), $ScoreDecimals) AS ppl,
       |         count(*) AS n_bigrams
       |  FROM lmnlp GROUP BY 1
       |)""".stripMargin

  /** DuckDB rendition, ending in a `lmscore(id, lm_nlp, ppl, n_bigrams)`
    * relation (train = score corpus, matching [[selfScore]]). Paste after
    * `WITH `. */
  def sqlSelfScoreCtes(docsTable: String, idExpr: String, textExpr: String): String =
    s"""lmtoks AS (
       |  SELECT $idExpr AS id, ${Text.sqlTokens(textExpr)} AS toks FROM $docsTable
       |), lmbg AS (
       |  SELECT id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z FROM lmtoks
       |), lmpairs AS (
       |  SELECT id, z[1] AS w1, z[2] AS w2 FROM lmbg
       |), lmbgc AS (
       |  SELECT w1, w2, count(*) AS c FROM lmpairs GROUP BY 1, 2
       |), lmctx AS (
       |  SELECT w1, count(*) AS cc FROM lmpairs GROUP BY 1
       |), lmvocab AS (
       |  SELECT count(DISTINCT t)::DOUBLE AS v FROM (SELECT unnest(toks) AS t FROM lmtoks)
       |), lmnlp AS (
       |  SELECT p.id, -ln((b.c + 1.0) / (x.cc + lmvocab.v)) AS nlp
       |  FROM lmpairs p
       |  JOIN lmbgc b USING (w1, w2)
       |  JOIN lmctx x USING (w1)
       |  CROSS JOIN lmvocab
       |), lmscore AS (
       |  SELECT id, round(avg(nlp), $ScoreDecimals) AS lm_nlp,
       |         round(exp(avg(nlp)), $ScoreDecimals) AS ppl,
       |         count(*) AS n_bigrams
       |  FROM lmnlp GROUP BY 1
       |)""".stripMargin
}
