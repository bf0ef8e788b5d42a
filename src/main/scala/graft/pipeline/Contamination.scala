package graft.pipeline

import graft.dedup.Dedup
import graft.functions.Text
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (north-star addition): flag training
  * documents whose n-gram shingles overlap an evaluation set — the standard
  * decontamination pass every LLM training pipeline runs before training
  * (n-gram collision against held-out benchmarks).
  *
  * Scale shape: the eval set is always tiny relative to the training corpus
  * (benchmarks are KBs–MBs vs 100 TB), so its DISTINCT shingle-hash set is
  * collected into a broadcast hash join — the training side pays exactly ONE
  * shuffle: the `distinct()` over its exploded (id, shingle-hash) postings
  * (needed for the distinct-shingle ratio semantics). The join itself is
  * broadcast (no shuffle of training data for it), and the per-doc count is
  * map-side combinable on the id the postings were exploded from.
  *
  * Shingles are [[TextAnalysis.ShingleSize]]-token n-grams hashed with the
  * shared [[Text.hash60]], so the DuckDB oracle reproduces every bit.
  */
object Contamination {

  /** Max eval rows [[semanticOverlap]] will inline as a plan literal. */
  val MaxLiteralEval = 4096

  /** Per-training-doc contamination stats against `eval`:
    * (id, n_shingles, n_contaminated, contamination_ratio, contaminated).
    * Docs shorter than one shingle carry a single whole-text shingle (the
    * [[TextAnalysis.shinglesFromTokens]] contract); docs with NO shingles
    * (null/empty text) still get a row: n_shingles = 0, ratio 0.0,
    * contaminated = false.
    *
    * A shingle counts as contaminated if it appears anywhere in the eval
    * set; ratio = contaminated distinct shingles / distinct shingles. */
  def ngramOverlap(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      splitRe: String = Text.SplitRe): DataFrame = {
    val trainP = Dedup.shinglePostings(train, idCol, textCol,
      splitRe = splitRe).distinct()
    val evalShingles = Dedup.shinglePostings(eval, idCol, textCol,
        splitRe = splitRe)
      .select("h").distinct()
    val perDoc = trainP
      .join(broadcast(evalShingles.withColumn("hit", lit(1))), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
    // docs too short to shingle still get a (clean) row
    train.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        when(col("n_shingles") > 0,
          round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** [[ngramOverlap]] with a BLOOM-FILTER prefilter on the eval shingle
    * set — identical output (the oracle is the same SQL), different scale
    * envelope.
    *
    * The exact path broadcasts the eval set's distinct shingle hashes as a
    * hash-join relation (~16 B/key + table overhead); fine while the eval
    * set is benchmark-sized. When the "eval" side grows to e.g. an entire
    * held-out split — hundreds of millions of shingles — the hash relation
    * outgrows broadcast, and the left join degrades to shuffling the FULL
    * exploded training postings. This variant keeps the training side
    * shuffle-free at any eval size that still fits a bloom:
    *
    *   1. n_shingles: a map-side-combinable groupBy of the postings — the
    *      only full-corpus pass that shuffles anything, and it ships one
    *      (id, count) partial per map task;
    *   2. candidates: postings filtered by a driver-built bloom over the
    *      eval hashes (~1.2 bytes/item at the default 1% fpp — 100× denser
    *      than a hash relation; [[BloomFilterMightContain]] is the
    *      codegen'd probe Spark's own runtime row-level filtering uses);
    *   3. exact verify: only the bloom SURVIVORS (true hits + ~fpp of the
    *      postings) join against the eval hashes — small enough to shuffle
    *      both sides, no broadcast requirement — removing every false
    *      positive, which is what keeps the result hash-identical to
    *      [[ngramOverlap]].
    *
    * The postings are computed twice (once per branch) — deliberate: at
    * corpus scale, re-scanning source parquet is cheaper than caching a
    * corpus-sized exploded relation, and branch 2's scan carries the bloom
    * filter straight into the scan's codegen stage. */
  def ngramOverlapBloom(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.01,
      splitRe: String = Text.SplitRe): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.GraftShim
    import org.apache.spark.sql.types.BinaryType
    val trainP = Dedup.shinglePostings(train, idCol, textCol,
      splitRe = splitRe).distinct()
    val evalShingles = Dedup.shinglePostings(eval, idCol, textCol,
        splitRe = splitRe)
      .select("h").distinct()
    val nEval = evalShingles.count()
    val bloomBytes = {
      val bf = evalShingles.stat.bloomFilter("h", math.max(nEval, 1L), fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = GraftShim.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      GraftShim.expression(col("h"))))
    val counts = trainP.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val hits = trainP.where(mightContain)
      .join(evalShingles, Seq("h")) // exact verify: false positives drop here
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    train.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        when(col("n_shingles") > 0,
          round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Oracle rendition; `trainTable`/`evalTable` may be table names or
    * parenthesized subqueries producing ($idExpr, $textExpr). */
  def sqlNgramOverlap(trainTable: String, evalTable: String,
      idExpr: String, textExpr: String,
      splitRe: String = Text.SplitRe): String =
    s"""WITH train_p AS (
       |  SELECT DISTINCT id, ${Text.sqlHash60("sh")} AS h FROM (
       |    SELECT $idExpr AS id, unnest(${TextAnalysis.sqlShingles(textExpr,
             TextAnalysis.ShingleSize, splitRe)}) AS sh
       |    FROM $trainTable)
       |), eval_s AS (
       |  SELECT DISTINCT ${Text.sqlHash60("sh")} AS h FROM (
       |    SELECT unnest(${TextAnalysis.sqlShingles(textExpr,
             TextAnalysis.ShingleSize, splitRe)}) AS sh
       |    FROM $evalTable)
       |), per_doc AS (
       |  SELECT t.id, count(*) AS n_shingles,
       |         -- ::BIGINT: DuckDB sum(INTEGER) widens to HUGEINT; Spark emits long
       |         sum(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated
       |  FROM train_p t LEFT JOIN eval_s e USING (h)
       |  GROUP BY 1
       |)
       |SELECT b.id,
       |       coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
       |       coalesce(p.n_contaminated, 0)::BIGINT AS n_contaminated,
       |       CASE WHEN coalesce(p.n_shingles, 0) > 0
       |            THEN round(coalesce(p.n_contaminated, 0)::DOUBLE / p.n_shingles, 6)
       |            ELSE 0.0 END AS contamination_ratio,
       |       coalesce(p.n_contaminated, 0) > 0 AS contaminated
       |FROM (SELECT $idExpr AS id FROM $trainTable) b
       |LEFT JOIN per_doc p USING (id)""".stripMargin

  /** SEMANTIC eval-set decontamination (north-star addition): flag
    * training documents whose EMBEDDING sits within cosine `threshold` of
    * any evaluation document — the paraphrase-robust complement of
    * [[ngramOverlap]] (n-gram collision misses reworded benchmark
    * leakage entirely; that blind spot is the documented motivation for
    * embedding-space checks — SemDeDup, Abbas et al. 2023). Output per
    * training row: (id, best_eval_id, best_cos, contaminated), where
    * best is the max RAW cosine over the eval set (ties broken toward
    * the larger eval id) rounded to
    * [[graft.search.VectorSearch.ScoreDecimals]].
    *
    * Scale shape — ZERO shuffle, zero join: the eval set is
    * benchmark-sized (KBs–MBs vs 100 TB), so it rides into the plan as a
    * LITERAL array of (id, vector) structs ([[VectorSearch.MaxQueryBatch]]
    * guard; the same bounded-batch discipline as the kNN joins, one step
    * stronger than a broadcast — no hash relation, no join operator at
    * all). The training side is then ONE narrow (id, vec) scan with a
    * per-row `transform` + `array_max` over the literal: max over a
    * lexicographic (cos, eval_id) struct, entirely inside whole-stage
    * codegen. A corpus row with a NULL or zero-norm vector reports
    * best_cos NULL, contaminated false (it has no position/direction in
    * embedding space to collide from); a zero-norm EVAL vector is
    * refused loudly (screening against it is undefined).
    *
    * When the "eval" side outgrows a literal (corpus-vs-corpus
    * semantics), this is the wrong tool by construction — use
    * [[graft.index.Ivf.rangeJoinExact]] (cluster-pruned, exact) or the
    * LSH pair screens in [[graft.dedup.Dedup]]. */
  def semanticOverlap(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.Vectors
    import graft.search.VectorSearch
    VectorSearch.requireBoundedBatch(eval, "Contamination.semanticOverlap")
    val evalRows = eval
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    require(evalRows.nonEmpty,
      "Contamination.semanticOverlap: empty eval set — nothing to screen against")
    // the LITERAL path's own, tighter bound: the eval set rides in the
    // expression tree (constant-folded to one array Literal), and a
    // 65k-row batch that a broadcast join would tolerate is far past what
    // a plan literal should carry
    require(evalRows.length <= MaxLiteralEval,
      s"Contamination.semanticOverlap: eval set has ${evalRows.length} " +
        s"rows > $MaxLiteralEval — too large to ride as a plan literal. " +
        "Use Ivf.rangeJoinExact (exact, cluster-pruned) for eval sets " +
        "beyond benchmark size")
    require(evalRows.forall(!_.isNullAt(1)),
      "Contamination.semanticOverlap: eval rows must all carry a vector")
    // eval norms are CONSTANTS — compute them once on the driver (same
    // left-to-right accumulation as the codegen'd DotProduct, so the
    // quotient is bit-identical to Vectors.cosine) and hoist the
    // training row's own norm into one staged column: the hot scan then
    // pays exactly ONE dot product per (row, eval) pair instead of
    // three (the VectorSearch.scoreCandidates __qn/__cn discipline)
    val evalLit = array(evalRows.map { r =>
      val v = r.getSeq[Double](1).toArray
      var s2 = 0.0
      v.foreach(x => s2 += x * x)
      val en = math.sqrt(s2)
      require(en > 0,
        s"Contamination.semanticOverlap: eval row ${r.getLong(0)} has a " +
          "zero-norm vector — cosine against it is undefined")
      struct(lit(r.getLong(0)).as("eid"),
        Vectors.vecLit(v).as("v"), lit(en).as("en"))
    }.toIndexedSeq: _*)
    def best(n: org.apache.spark.sql.Column) =
      array_max(transform(evalLit, e =>
      struct(
        round(Vectors.dot(col(vecCol), e.getField("v")) /
          (n * e.getField("en")), VectorSearch.ScoreDecimals).as("c"),
        e.getField("eid").as("eid"))))
    // __n > 0 gate: a zero-norm training vector has no direction, so
    // its cosine is 0/0 — without the gate the NaN would compare
    // GREATER than every threshold (Spark NaN ordering) and silently
    // flag the row; it reports like the null-vector case instead
    train
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("__n", Vectors.l2norm(col(vecCol)))
      .withColumn("__b",
        when(col(vecCol).isNotNull && col("__n") > 0, best(col("__n"))))
      .select(col("id"),
        col("__b.eid").as("best_eval_id"),
        col("__b.c").as("best_cos"),
        coalesce(col("__b.c") >= threshold, lit(false)).as("contaminated"))
  }

  /** The PAIR-shaped rendition of [[semanticOverlap]] — every
    * (eval, train) pair with cosine ≥ `threshold`, as
    * (query_id, nbr_id, sim): the same relation
    * [[graft.index.Ivf.rangeJoinExact]] emits, so the two are
    * interchangeable physical paths for one radius workload and
    * [[graft.search.AnnPlanner.planRange]] can dispatch between them on
    * cost. Same plan shape as [[semanticOverlap]] (eval set as ONE
    * constant-folded literal, training side a single narrow scan, zero
    * joins/shuffles — the per-row transform keeps only pairs clearing
    * the cut before exploding, so sub-threshold pairs never become
    * rows), same guards (bounded + ≤ [[MaxLiteralEval]] eval batch,
    * zero-norm eval refused, zero-norm/null train rows report clean),
    * and the same rounding/accumulation as the routed twin — IEEE
    * multiplication is commutative, so `dot / (trainNorm · evalNorm)`
    * is bit-identical to the routed plan's `dot / (qn · cn)` and the
    * outputs hash-match. Self-pairs are excluded, matching the routed
    * twin. */
  def semanticOverlapPairs(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.Vectors
    import graft.search.VectorSearch
    VectorSearch.requireBoundedBatch(eval, "Contamination.semanticOverlapPairs")
    val evalRows = eval
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    require(evalRows.nonEmpty,
      "Contamination.semanticOverlapPairs: empty eval set — nothing to screen against")
    require(evalRows.length <= MaxLiteralEval,
      s"Contamination.semanticOverlapPairs: eval set has ${evalRows.length} " +
        s"rows > $MaxLiteralEval — too large to ride as a plan literal. " +
        "Use Ivf.rangeJoinExact (exact, cluster-pruned) for eval sets " +
        "beyond benchmark size")
    require(evalRows.forall(!_.isNullAt(1)),
      "Contamination.semanticOverlapPairs: eval rows must all carry a vector")
    val evalLit = array(evalRows.map { r =>
      val v = r.getSeq[Double](1).toArray
      var s2 = 0.0
      v.foreach(x => s2 += x * x)
      val en = math.sqrt(s2)
      require(en > 0,
        s"Contamination.semanticOverlapPairs: eval row ${r.getLong(0)} has " +
          "a zero-norm vector — cosine against it is undefined")
      struct(lit(r.getLong(0)).as("eid"),
        Vectors.vecLit(v).as("v"), lit(en).as("en"))
    }.toIndexedSeq: _*)
    def hits(n: Column) = filter(
      transform(evalLit, e => struct(
        e.getField("eid").as("query_id"),
        round(Vectors.dot(col(vecCol), e.getField("v")) /
          (n * e.getField("en")), VectorSearch.ScoreDecimals).as("sim"))),
      p => p.getField("sim") >= threshold)
    train
      .select(col(idCol).cast("long").as("nbr_id"),
        col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("__n", Vectors.l2norm(col(vecCol)))
      .where(col(vecCol).isNotNull && col("__n") > 0)
      .select(col("nbr_id"), explode(hits(col("__n"))).as("p"))
      .where(col("p.query_id") =!= col("nbr_id"))
      .select(col("p.query_id").as("query_id"), col("nbr_id"),
        col("p.sim").as("sim"))
  }

  /** Oracle rendition of [[semanticOverlap]]; `trainTable`/`evalTable`
    * produce ($idExpr, $vecExpr) rows. Quadratic cross join — it is the
    * oracle, not the plan. */
  def sqlSemanticOverlap(trainTable: String, evalTable: String,
      idExpr: String, vecExpr: String, threshold: Double): String =
    s"""WITH pairs AS (
       |  SELECT t.$idExpr AS id, v.$idExpr AS eval_id,
       |         round(list_cosine_similarity(t.$vecExpr::DOUBLE[], v.$vecExpr::DOUBLE[]), 6) AS c
       |  FROM $trainTable t CROSS JOIN $evalTable v
       |), ranked AS (
       |  SELECT id, eval_id, c,
       |         row_number() OVER (PARTITION BY id ORDER BY c DESC, eval_id DESC) AS rn
       |  FROM pairs
       |)
       |SELECT id, eval_id AS best_eval_id, c AS best_cos,
       |       c >= $threshold AS contaminated
       |FROM ranked WHERE rn = 1""".stripMargin
}
