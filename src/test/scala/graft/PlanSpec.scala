package graft

import graft.embed.Embedder
import graft.search.VectorSearch
import graft.util.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the 100 TB design contract
  * (SURVEY §4.3): top-k must not global-sort, filters and projections must
  * reach the parquet scan, small side of the payload re-attach must
  * broadcast. These are what keep the operators viable at 1000 executors,
  * so they are pinned as tests, not left to chance. */
class PlanSpec extends AnyFunSuite with SparkTest {

  private val query = Embedder.default.embed("nuggets para desayuno")

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("vector top-k plans as TakeOrderedAndProject (per-partition heap, no global sort)") {
    val e = Tables.embeddings(spark, Sf0001)
    val plan = planString(
      VectorSearch.knn(e, "vec_id", "embedding", query, k = 5))
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), "top-k must not range-shuffle the data")
  }

  test("pre-filter is pushed down to the parquet scan") {
    val d = Tables.documents(spark, Sf0001)
    val plan = planString(d.where(col("lang") === "en").select("doc_id"))
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"expected lang pushdown in:\n$plan")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val d = Tables.documents(spark, Sf0001)
    val plan = planString(d.select("doc_id", "lang"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("lang"))
    assert(!readSchema.contains("text"), s"text must be pruned from scan: $readSchema")
  }

  test("corpus rollup is one pass: Expand feeds a partial aggregate, a single shuffle") {
    val d = Tables.documents(spark, Sf0001)
    val plan = planString(
      d.rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs")))
    // Expand replicates each row per grouping set BEFORE the partial
    // HashAggregate — three granularities from one corpus scan
    assert(plan.contains("Expand"), s"expected Expand in:\n$plan")
    assert(plan.contains("partial_count"),
      s"rollup must combine map-side (partial aggregation) in:\n$plan")
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"rollup must shuffle once, saw $shuffles:\n$plan")
  }

  test("hybrid search re-attaches payload via broadcast join (no shuffle of the base table)") {
    val plan = planString(SparkEntry.entry(spark))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join in the hybrid plan:\n$plan")
  }

  test("fulltext/hybrid rank exactly once: a single Sort in the plan") {
    val d = Tables.documents(spark, Sf0001)
    // embCol is unused by fulltext mode
    val tbl = graft.api.FoodFinder.SearchTable(d, "doc_id", "text", "text")
    val plan = planString(graft.api.FoodFinder.fulltext(
      tbl, "fast table scan merge", k = 10))
    val sorts = plan.linesIterator.count(l => l.contains("Sort ") && !l.contains("SortAggregate"))
    assert(sorts <= 1, s"expected at most one Sort (the final ranking), got $sorts in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject") || sorts == 1,
      s"final ranking missing in:\n$plan")
  }

  test("star join broadcasts every dimension; facts shuffle at most twice") {
    val plan = planString(SparkEntry.queries("q_region_revenue")(spark, Sf0001))
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3,
      s"region/nation/supplier must broadcast (got $broadcasts):\n$plan")
    val shuffleJoins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(shuffleJoins <= 2,
      s"only the two fact-fact joins may shuffle (got $shuffleJoins):\n$plan")
  }

  test("topTerms never force-broadcasts the vocabulary (term->df) table") {
    // at corpus scale the vocabulary is GB-sized and heavy-tailed: the df
    // side must be a shuffle join on `term` (or whatever AQE locally
    // decides), never a planner-forced broadcast of the full term table —
    // so the logical plan must carry no ResolvedHint from our code
    val docs = Tables.documents(spark, Sf0001)
    val q = graft.pipeline.Curation.topTerms(docs, "doc_id", "text", 3)
    val logical = q.queryExecution.analyzed.toString
    assert(!logical.contains("UnresolvedHint") && !logical.contains("ResolvedHint"),
      s"no broadcast hint may be planted on the df table:\n$logical")
  }

  test("persisted BM25 query partition-prunes postings to the touched term buckets") {
    // the on-disk text-index story end-to-end: a query's plan must show
    // PartitionFilters on `bucket` (term-hash buckets, TextSearch.termBucket)
    // — at 100 TB this is a ≤ terms/64ths scan of the postings table, never
    // a full pass
    val plan = planString(SparkEntry.queries("q_bm25_idx")(spark, Sf0001))
    val postingsScan = plan.linesIterator
      .find(l => l.contains("postings") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(postingsScan.matches(".*PartitionFilters: \\[[^\\]]*bucket[^\\]]* IN .*"),
      s"expected bucket IN (...) partition pruning on the postings scan:\n$plan")
  }

  test("positional phrase probe partition-prunes postings to the phrase's gram buckets") {
    // the no-corpus-scan phrase story end-to-end: the lookup's plan must
    // show PartitionFilters on `bucket` for the positional postings
    // parquet — at 100 TB a phrase lookup reads its grams' bucket
    // directories plus the candidate docs, never the postings table
    val plan = planString(SparkEntry.queries("q_phrase_find_pos")(spark, Sf0001))
    val postingsScan = plan.linesIterator
      .find(l => l.contains("postings") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(postingsScan.matches(
        ".*PartitionFilters: \\[[^\\]]*bucket[^\\]]*[=≡][^\\]]*.*") ||
      postingsScan.contains("bucket"),
      s"expected bucket partition pruning on the postings scan:\n$plan")
    assert(postingsScan.nonEmpty,
      s"expected a PartitionFilters line on the postings scan:\n$plan")
  }

  test("persisted IVF probe partition-prunes assignments to the probed clusters") {
    // the on-disk inverted-file story end-to-end: a sub-exhaustive probe's
    // plan must show PartitionFilters on `cluster` for the assignments
    // parquet — at 100 TB a probe reads the probed clusters' directories,
    // never the whole assignments table
    val plan = planString(SparkEntry.queries("q_ann_ivf_idx")(spark, Sf0001))
    val assignScan = plan.linesIterator
      .find(l => l.contains("assignments") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(assignScan.matches(".*PartitionFilters: \\[[^\\]]*cluster[^\\]]* IN(SET)? .*"),
      s"expected cluster IN (...) partition pruning on the assignments scan:\n$plan")
  }

  test("ball-cover batch kNN join partition-prunes the assignments scan") {
    // knnJoinExact's pass-1 probe (and any extension pass) routes through
    // the SAME routedScored plan as knnJoin(forceRoute) — pass-1 runs
    // eagerly inside the call, so pin its scan shape on the shared path
    // directly: the assignments parquet must be read through a cluster
    // PartitionFilter (the probed-union IN-list), never as a full
    // inverted-file scan. (knnJoinExact's own pruning receipts — strict
    // probe subset, extension-free final pass — are pinned in IvfSpec.)
    val e = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("planivf").toString
    graft.index.IndexStore.saveIvf(
      graft.index.Ivf.build(e, "vec_id", "embedding"), dir)
    val idx = graft.index.IndexStore.loadIvf(spark, dir)
    val batch = e.where(col("vec_id") < 20)
    val plan = planString(graft.index.Ivf.knnJoin(idx, batch, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 3,
      numCandidates = (idx.sizes.values.sum / 2).toInt, forceRoute = true))
    val assignScan = plan.linesIterator
      .find(l => l.contains("assignments") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(assignScan.matches(".*PartitionFilters: \\[[^\\]]*cluster[^\\]]* IN(SET)? .*"),
      s"expected cluster IN (...) partition pruning on the assignments scan:\n$plan")
  }

  test("incremental containment screen reads the index through bucket PartitionFilters") {
    // the daily-batch screen must reach the persisted postings/prefix
    // parquet through a `bucket IN (batch's shingle buckets)` partition
    // filter — at 100 TB a small batch reads its buckets' directories,
    // never the whole inverted shingle file
    val docs = graft.util.Tables.documents(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("contplan").toString
    graft.index.IndexStore.saveContainment(docs, "doc_id", "text", 0.9, dir)
    val idx = graft.index.IndexStore.loadContainment(spark, dir)
    val batch = docs.orderBy(org.apache.spark.sql.functions.length(col("text")))
      .limit(1)
    val plan = planString(graft.dedup.Dedup.containmentPairsAgainst(
      batch, "doc_id", "text", idx, 0.9))
    val scans = plan.linesIterator
      .filter(l => l.contains("PartitionFilters") &&
        (l.contains("/postings") || l.contains("/prefixes"))).toSeq
    assert(scans.nonEmpty, s"expected index parquet scans in:\n$plan")
    assert(scans.forall(
      _.matches(".*PartitionFilters: \\[[^\\]]*bucket[^\\]]* IN(SET)? .*")),
      s"expected bucket IN (...) partition pruning on every index scan:\n$plan")
  }

  test("codegen'd similarity stays inside WholeStageCodegen") {
    val e = Tables.embeddings(spark, Sf0001)
    val scored = e.select(graft.functions.Vectors.score("cosine",
      col("embedding"), graft.functions.Vectors.vecLit(query)).as("s"))
    val plan = planString(scored)
    // the `*(n)` operator prefix marks WholeStageCodegen participation;
    // the scoring Project must carry it (and the query-vector norm is
    // already constant-folded to a literal by Catalyst)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")),
      s"expected the graft_dot Project inside a codegen stage:\n$plan")
  }

  test("mixSources: rates broadcast to the corpus; per-source stats combine map-side") {
    val d = Tables.documents(spark, Sf0001)
    val plan = planString(graft.pipeline.Curation.mixSources(
      d, "doc_id", "source", "text", 300))
    // the acceptance filter joins each doc against the ≤|sources|-row
    // rates table — this must be a broadcast, never a corpus shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"expected rates BroadcastHashJoin in:\n$plan")
    // per-source token mass is a partial (map-side) aggregation, so the
    // only corpus-sized work feeding an Exchange is ≤|sources| partials
    assert(plan.contains("partial_sum"),
      s"expected map-side combined per-source stats in:\n$plan")
  }

  test("intervalJoin keys on user_id — the range rides the equi-join, never a nested loop") {
    val ev = Tables.events(spark, Sf0001)
    val plan = planString(graft.streaming.EventStreams.intervalJoin(
      ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts"),
      ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value"), 60))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"interval join must hash/sort-merge on user_id:\n$plan")
    assert(plan.contains("l_user_id") && plan.contains("r_user_id"))
  }

  test("passage report aggregates on the content hash, never the passage string") {
    // the corpus-scale contract of topDuplicatedPassages: the only
    // passage-sized shuffle is (hash, counts) — the rendered string may
    // appear ONLY above the top-N cut (rendering the ≤ topN winners)
    val d = Tables.documents(spark, Sf0001)
    val plan = planString(graft.dedup.SubstringDedup
      .topDuplicatedPassages(d, "doc_id", "text"))
    // the pre-limit aggregation keys on the 60-bit hash
    assert(plan.contains("__ph"),
      s"expected the hash group key __ph in:\n$plan")
    // winner selection is a bounded-state top-N, not a global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N winners must TakeOrderedAndProject:\n$plan")
    // every aggregate groups by the hash — none by the rendered passage
    val aggLines = plan.linesIterator
      .filter(l => l.contains("HashAggregate") && l.contains("keys="))
    assert(aggLines.forall(l => !l.contains("passage#")),
      s"no aggregate may key on the passage string:\n$plan")
    // the winners' render-back join broadcasts the ≤ topN side
    assert(plan.contains("BroadcastHashJoin"),
      s"winner render-back must broadcast:\n$plan")
  }

  test("windows rerank prunes the index scan to candidate buckets") {
    val d = Tables.documents(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("plan_widx").toString
    graft.index.IndexStore.saveWindows(d, "doc_id", "text",
      graft.search.LateInteraction.DefaultWindowTokens, dir)
    val idx = graft.index.IndexStore.loadWindows(spark, dir)
    val queries = d.where(col("doc_id") === 0L)
    val cand = spark.createDataFrame(Seq((0L, 7L), (0L, 21L)))
      .toDF("query_id", "nbr_id")
    val plan = planString(graft.search.LateInteraction.maxSimRerank(
      queries, "doc_id", "text", idx, cand, k = 3))
    val pf = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("bucket"))
    assert(pf.isDefined && pf.get.contains("bucket#"),
      s"windows scan must carry a bucket PartitionFilter:\n$plan")
  }

  test("rerank/MMR candidate attach broadcasts the small side against the corpus") {
    val d = Tables.documents(spark, Sf0001)
    val queries = d.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", org.apache.spark.sql.functions.slice(
          graft.functions.Text.tokens(col("text")), 1, 8)).as("qtext"))
    val idx = graft.search.TextSearch.buildIndex(d, "doc_id", "text")
    val cands = graft.search.TextSearch.bm25Join(idx, queries,
      "query_id", "qtext", k = 10)
    val pairs = d.select(col("doc_id").as("id"), col("text"))
      .join(broadcast(cands.select("query_id", "id")), "id")
      .join(broadcast(queries), "query_id")
    val plan = planString(pairs)
    assert(plan.split("BroadcastHashJoin").length >= 3,
      s"expected two broadcast joins (candidates, queries) in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against the candidate table:\n$plan")
  }
}
