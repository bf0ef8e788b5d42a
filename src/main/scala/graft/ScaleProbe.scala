package graft

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replication scaling probe (the SCALE.md measurement harness): runs the
  * round's heavy operators over the sf0.1 tables replicated ×1/×4/×16 with
  * shifted ids and prints one `PROBE <op>_x<n> <sec>` line per point.
  *
  * The probe answers ONE question per operator: does runtime track input
  * size (linear / flat), or does it bend quadratic somewhere replication
  * makes adversarial (every doc/vector gains 4–16 exact clones, every
  * shingle becomes corpus-duplicated)? Index builds are DDL — they happen
  * outside the timed window, like [[Bench]]'s warmIndexes.
  *
  * Usage: `sbt "runMain graft.ScaleProbe"` (env `SPARK_GRAFT_SF_DIR` to
  * change the base table, default sf0.1; `SPARK_GRAFT_PROBE_REPS` to change
  * the replication ladder, default `1,4,16`). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1,4,16")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = graft.util.Tables.documents(spark, sfDir)
    val embs0 = graft.util.Tables.embeddings(spark, sfDir)
    // id shift per replica keeps ids unique while every text/vector gains
    // n−1 exact clones — maximally adversarial for dedup/postings shapes
    def repD(n: Int): DataFrame = (0 until n)
      .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _).cache()
    def repE(n: Int): DataFrame = (0 until n)
      .map(i => embs0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _).cache()
    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JVM/codegen warmup so the ×1 point isn't charged Spark boot time
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.pipeline.Curation.mixSources(docs0.limit(100), "doc_id", "source",
      "text", 300).queryExecution.toRdd.count()

    val qv = graft.embed.Embedder.default.embed("nuggets para desayuno")
    for (n <- reps) {
      val d = repD(n); val e = repE(n); d.count(); e.count()
      t(s"mix_x$n")(graft.pipeline.Curation.mixSources(
        d, "doc_id", "source", "text", 300))
      val pq = {
        val i = graft.index.Pq.build(e, "vec_id", "embedding")
        val c = i.copy(codes = i.codes.cache()); c.codes.count(); c
      }
      t(s"pq_adc_x$n")(graft.index.Pq.ann(
        pq, e, "vec_id", "embedding", qv, k = 10, overfetch = 50))
      // batch retrieval: the query batch stays FIXED (~52 queries from the
      // base table) while the corpus grows — the production shape
      val queries = docs0.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(Text.tokens(col("text")), 1, 8)).as("qtext"))
        .cache()
      queries.count()
      val bm = graft.search.TextSearch.buildIndex(d, "doc_id", "text")
      t(s"bm25join_x$n")(graft.search.TextSearch.bm25Join(
        bm, queries, "query_id", "qtext", k = 10))
      val cands = graft.search.TextSearch.bm25Join(
        bm, queries, "query_id", "qtext", k = 10).cache()
      cands.count()
      val pairs = d.select(col("doc_id").as("id"), col("text"))
        .join(broadcast(cands.select("query_id", "id")), "id")
        .join(broadcast(queries), "query_id")
      t(s"rerank_x$n")(graft.search.Rerank.rerankJoin(
        pairs, "query_id", "id", "qtext", "text", k = 3))
      // MMR over the same fixed candidate batch — must stay flat like rerank
      val candsScored = cands.select("query_id", "id", "score")
        .localCheckpoint(true)
      val sims = graft.search.Mmr.candidatePairSims(candsScored,
        graft.embed.EmbedJob.embedRelational(d, "doc_id", "text"))
      t(s"mmr_x$n")(graft.search.Mmr.mmrSelectAgg(
        candsScored, sims, k = 3, lambda = 0.7))
      // quality tiers: one scan + sharded windows — linear
      t(s"tiers_x$n")(graft.pipeline.Curation.qualityTiers(
        d, "doc_id", "text", "lang", tiers = 4, shards = 64))
      // incremental dedup: FIXED batch (base-table ids) against the
      // replicated index — replication is adversarial (every batch vector
      // gains n−1 exact clones in the index, so true candidates grow ∝ n)
      val idxSk = graft.dedup.Dedup.signLshSketches(
        e, "vec_id", "embedding", 64).localCheckpoint(true)
      val batchSk = graft.dedup.Dedup.signLshSketches(
        embs0.where(col("vec_id") % 5 === 0), "vec_id", "embedding", 64)
      t(s"inc_dedup_x$n")(graft.dedup.Dedup.cosineVerify(
        graft.dedup.Dedup.signLshCandidatesAgainst(batchSk, idxSk),
        e, "vec_id", "embedding", 0.45))
      // substring-span dedup: replication is maximally adversarial (every
      // gram becomes corpus-duplicated, so every document surfaces as one
      // full-width span) — all stages must still track corpus tokens
      t(s"substring_spans_x$n")(
        graft.dedup.SubstringDedup.duplicatedSpans(d, "doc_id", "text"))
      t(s"substring_passages_x$n")(
        graft.dedup.SubstringDedup.topDuplicatedPassages(d, "doc_id", "text"))
      // late-interaction rerank against the PERSISTED window index: FIXED
      // query batch and FIXED candidate pairs while the indexed corpus
      // grows — candidate-bucket pruning must keep the scan (and the
      // candidate-bounded join above it) from tracking corpus size
      val wdir = s"${sys.props("java.io.tmpdir")}/graft_probe_windows_x$n"
      graft.index.IndexStore.saveWindows(d, "doc_id", "text",
        graft.search.LateInteraction.DefaultWindowTokens, wdir)
      val widx = graft.index.IndexStore.loadWindows(spark, wdir)
      val liQueries = docs0.where(col("doc_id") % 97 === 0)
        .select("doc_id", "text").cache()
      val qids = liQueries.select("doc_id").collect().map(_.getLong(0))
      val nbrIds = docs0.where(col("doc_id") % 211 === 0)
        .select("doc_id").collect().map(_.getLong(0))
      val liCands = spark.createDataFrame(
        for (q <- qids.toSeq; c <- nbrIds.toSeq) yield (q, c))
        .toDF("query_id", "nbr_id")
      t(s"maxsim_rerank_x$n")(graft.search.LateInteraction.maxSimRerank(
        liQueries, "doc_id", "text", widx, liCands, k = 5))
      // exact phrase locate: a FIXED phrase while the corpus grows.
      // Replication is adversarial for the TRUE-match side (every replica
      // of the source doc matches, so candidates grow ∝ n), yet the
      // positional path still reads only its grams' bucket partitions
      // (1/64th of a table growing ∝ n) plus those candidates — the scan
      // path streams EVERY position of the n×-corpus through the gram map
      val pdir = s"${sys.props("java.io.tmpdir")}/graft_probe_phrase_x$n"
      graft.index.IndexStore.savePhrase(d, "doc_id", "text",
        graft.dedup.SubstringDedup.DefaultGramTokens, pdir)
      val pidx = graft.index.IndexStore.loadPhrase(spark, pdir)
      val probeToks = docs0.orderBy("doc_id").limit(1)
        .select(slice(Text.tokens(col("text")), 1, 8).as("p"))
        .head.getSeq[String](0)
      t(s"phrase_pos_x$n")(graft.search.TextSearch.phraseOccurrencesIndexed(
        pidx, d, "doc_id", "text", probeToks))
      t(s"phrase_scan_x$n") {
        import spark.implicits._
        graft.search.TextSearch.phraseOccurrences(
          d, "doc_id", "text", Seq(Tuple1(probeToks)).toDF("p"))
      }
      // lm3 scoring join regimes (r14 verdict item 4): the count tables
      // grow with the replicated corpus (shifted ids keep texts identical
      // so vocabulary is constant but COUNTS tables still carry the same
      // rows; what scales is the corpus-side triples relation), and the
      // two regimes must stay result-identical while their plans differ —
      // broadcast hashes the count tables per executor, bucketed
      // shuffle-hashes them on the join keys (the shape whose count-side
      // shuffle a 100 TB deployment pre-pays with bucketed layout). The
      // measured crossover backs LanguageModel.Lm3BroadcastMaxCountRows.
      val lm3 = graft.text.LanguageModel.train3(d, "doc_id", "text")
      t(s"lm3_bcast_x$n")(graft.text.LanguageModel.score3Join(
        lm3, d, "doc_id", "text", Text.SplitRe, "broadcast"))
      t(s"lm3_bucketed_x$n")(graft.text.LanguageModel.score3Join(
        lm3, d, "doc_id", "text", Text.SplitRe, "bucketed"))
      liQueries.unpersist()
      d.unpersist(); e.unpersist(); pq.codes.unpersist()
      queries.unpersist(); cands.unpersist()
    }
    // event-stream attribution: events replicated with shifted users so the
    // per-user pair cardinality stays constant — runtime must track rows
    val ev0 = graft.util.Tables.events(spark, sfDir)
    for (n <- reps) {
      val ev = (0 until n).map(i => ev0
          .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000000L)))
        .reduce(_ unionByName _).cache()
      ev.count()
      t(s"attribution_x$n")(graft.streaming.EventStreams.intervalJoin(
        ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        gapMinutes = 60))
      ev.unpersist()
    }
    spark.stop()
  }
}
