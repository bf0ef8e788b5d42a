package graft.text

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary learning (north-star addition): learn
  * byte-pair-encoding merges from a corpus and tokenize with them — the
  * subword-vocabulary step every LLM training pipeline runs before
  * anything else (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"). The reference has no
  * tokenizer surface (its text side is Atlas `$search`); this module is
  * mandated by the north star, next to [[TextAnalysis.bpeTokenCount]]'s
  * fixed-heuristic counter.
  *
  * Scale shape — the classic BPE trick, kept intact on Spark: merges are
  * learned from the WORD-FREQUENCY table, never from the corpus. One
  * corpus scan builds (word, count) with a map-side-combinable groupBy
  * (distinct words are vocabulary-bounded — a few 100M rows at 100 TB vs
  * the corpus' trillions of tokens); every learn iteration after that is
  * one aggregation over that bounded relation, and the result is
  * localCheckpoint'd per step so iteration k never replays steps 1..k−1
  * (the corpus is NEVER rescanned). Applying learned merges to the corpus
  * ([[tokenizeBpe]]) is ONE narrow scan, zero joins, zero shuffles —
  * a chain of literal `replace`s inside whole-stage codegen at gate
  * sizes, and ONE compiled codegen node carrying the whole merge table
  * at production sizes (the [[LiteralChainMaxMerges]] dispatch).
  *
  * == Symbol-sequence encoding ==
  *
  * A word's current symbol sequence is ONE string: each symbol wrapped
  * as [[Open]]sym[[Close]] (`¬a·¬b·¬c·` for [a,b,c]). Neither wrapper
  * can occur inside a symbol — `¬` (U+00AC, category Sm) and `·`
  * (U+00B7, category Po) are outside the frozen `[a-z0-9]+` alphabet
  * AND outside [[Text.UnicodeSplitRe]]'s `\p{L}\p{N}` classes, so the
  * encoding carries Unicode vocabularies unchanged — and applying
  * merge (l, r) is exactly
  * `replace(enc, "¬l·¬r·", "¬lr·")`: both Spark's `replace` and
  * DuckDB's scan left-to-right non-overlapping, which IS greedy BPE
  * application. BOTH operand ends are anchored — `¬` pins each
  * symbol's start (a match can never begin inside a multi-character
  * symbol) and `·` pins each symbol's END (merge (e, f) can never fire
  * on the sequence [e, fg], where an end-unanchored pattern would eat
  * `f` out of `fg`) — and adjacent matches share NO characters, so
  * consecutive occurrences chain correctly
  * (`¬a·¬a·¬a·¬a·` --(a,a)--> `¬aa·¬aa·`). The same encoding runs
  * verbatim in the DuckDB oracle ([[sqlLearnBpe]]), so the learned merge
  * table is hash-checked end to end — deliberate representation
  * mirroring, not an implementation leak.
  */
object Vocab {

  /** Symbol-start wrapper — outside the token alphabet `[a-z0-9]+`. */
  val Open = "¬"

  /** Symbol-end wrapper — also outside the token alphabet; anchoring
    * BOTH ends is what makes the non-overlapping replace exact (see the
    * object doc's [e, fg] case). */
  val Close = "\u00b7" // '·'

  /** (word, cnt) from one corpus scan: tokenize ([[Text.tokens]] —
    * lowercased `[a-z0-9]+` runs), explode, count. Map-side combinable;
    * output is vocabulary-bounded. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol, Text.SplitRe)

  /** [[wordCounts]] under an explicit token alphabet
    * ([[Text.UnicodeSplitRe]] for a multilingual corpus — the frozen
    * default counts non-Latin documents as zero words). */
  def wordCounts(docs: DataFrame, textCol: String, splitRe: String)
      : DataFrame =
    docs
      .select(explode(Text.tokens(col(textCol), splitRe)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Initial encoding of a word: every character its own symbol —
    * each char wrapped `¬c·`. */
  def encodeChars(word: Column): Column =
    regexp_replace(word, "(.)", s"$Open$$1$Close")

  /** Decode an encoded symbol string back to its symbol array. */
  def symbols(enc: Column): Column =
    filter(split(enc, s"[$Open$Close]"), s => s =!= lit(""))

  /** Apply ONE merge to an encoded symbol string (greedy left-to-right —
    * see the object doc for why plain non-overlapping `replace` is
    * exact). */
  def applyMerge(enc: Column, l: String, r: String): Column =
    replace(enc, lit(s"$Open$l$Close$Open$r$Close"),
      lit(s"$Open$l$r$Close"))

  /** Adjacent-symbol pair counts over an encoded word table
    * ((enc, cnt) rows): (l, r, cnt) where cnt sums word counts over
    * every occurrence (a pair appearing twice in one word counts its
    * word twice — the standard BPE statistic). One shuffle, map-side
    * combined, over the vocabulary-bounded relation. */
  def pairCounts(encWords: DataFrame): DataFrame = {
    val syms = symbols(col("enc"))
    encWords
      .select(explode(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"),
        col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** One learned merge: step (1-based), the pair, and its count at the
    * moment it was chosen. */
  final case class Merge(step: Int, l: String, r: String, cnt: Long)

  /** Learn `nMerges` BPE merges from a corpus. Deterministic: ties break
    * on (l ASC, r ASC) after count DESC — no RNG, reproducible under any
    * partitioning. Stops early if no adjacent pair remains (every word
    * fused to one symbol). Each iteration is one pair-count aggregation
    * + a 1-row argmax collect over the word table; the encoded table is
    * localCheckpoint'd per step, so plans stay flat and the corpus scan
    * happens exactly once (inside [[wordCounts]]). */
  def learnBpe(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    learnBpeFromCounts(wordCounts(docs, textCol), nMerges)

  /** [[learnBpe]] over an ALREADY-BUILT (word, cnt) relation — the
    * wave-cadence path: feed it
    * [[graft.index.IndexStore.loadWordCounts]]'s fold of the persisted
    * vocab family and the learn loop runs with ZERO corpus scans (the
    * waves already paid the tokenize at append time). Same merges as the
    * from-scratch path by construction (the fold equals a fresh
    * wordCounts over the committed corpus). */
  def learnBpeFromCounts(wc: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var enc = wc
      .select(encodeChars(col("word")).as("enc"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = pairCounts(enc)
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, c)
        val prev = enc
        enc = enc
          .select(applyMerge(col("enc"), l, r).as("enc"), col("cnt"))
          .localCheckpoint()
        // the superseded checkpoint would otherwise pin every
        // iteration's copy of the word table in executor storage for
        // the loop's lifetime (real BPE runs are 10k+ merges) — release
        // it as soon as its successor is materialized
        releaseCheckpoint(prev)
        step += 1
      }
    }
    releaseCheckpoint(enc)
    merges.result()
  }

  /** [[learnBpeFromCounts]] with INCREMENTAL pair-count maintenance —
    * the classic fast-BPE loop (Sennrich et al.'s reference
    * implementation maintains pair statistics the same way), closing
    * the naive loop's per-merge full re-count: after applying merge
    * (l, r), only pairs inside words CONTAINING that pair change, so
    * the maintained pair-count relation is updated by
    * `pc − pairCounts(affected_before) + pairCounts(affected_after)`
    * where `affected` is the encoded-word rows matching the merge
    * pattern — on zipfian corpora the affected mass collapses after the
    * early merges, so each step's pair explosion + shuffle runs over a
    * shrinking sliver of the vocabulary instead of all of it (the
    * argmax then reads the maintained, pair-vocabulary-bounded
    * relation). The per-step word-table re-encode stays (one narrow
    * codegen'd map + checkpoint — no shuffle; it was never the naive
    * loop's cost center).
    *
    * OUTPUT-IDENTICAL to [[learnBpeFromCounts]] by construction: the
    * maintained counts equal a fresh [[pairCounts]] at every step
    * (exact add/subtract of the only rows that changed) and the argmax
    * ordering (cnt DESC, l ASC, r ASC) is shared — property-pinned in
    * VocabSpec across random corpora, and gate-checked end-to-end
    * (`q_bpe_merges_inc` runs THIS loop against the same unrolled
    * DuckDB oracle as the naive one). Same checkpoint-release
    * discipline: superseded enc AND pc checkpoints unpersist as soon
    * as their successors materialize. */
  def learnBpeFastFromCounts(wc: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var enc = wc
      .select(encodeChars(col("word")).as("enc"), col("cnt"))
      .localCheckpoint()
    var pc = pairCounts(enc).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = pc.orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, c)
        val pat = s"$Open$l$Close$Open$r$Close"
        // only words CONTAINING the merged pair change any pair count —
        // explode/shuffle just those (contains() rides the same narrow
        // scan the re-encode pays anyway)
        val affected = enc.where(col("enc").contains(pat))
        val before = pairCounts(affected)
          .select(col("l"), col("r"), (-col("cnt")).as("cnt"))
        val after = pairCounts(
          affected.select(applyMerge(col("enc"), l, r).as("enc"), col("cnt")))
        val prevPc = pc
        pc = pc.unionByName(before).unionByName(after)
          .groupBy("l", "r").agg(sum(col("cnt")).as("cnt"))
          .where(col("cnt") > 0)
          .localCheckpoint()
        releaseCheckpoint(prevPc)
        val prevEnc = enc
        enc = enc
          .select(applyMerge(col("enc"), l, r).as("enc"), col("cnt"))
          .localCheckpoint()
        releaseCheckpoint(prevEnc)
        step += 1
      }
    }
    releaseCheckpoint(enc)
    releaseCheckpoint(pc)
    merges.result()
  }

  /** Driver-memory budget — total SYMBOLS (characters) across the word
    * table — under which [[planLearn]] dispatches the learn loop to the
    * DRIVER-LOCAL regime ([[learnBpeLocalFromCounts]]). The word table
    * is vocabulary-bounded by construction (distinct words, not corpus
    * tokens), so it usually fits: 32M symbols is ~4M words at web-crawl
    * average length, comfortably a driver heap. Why a local regime at
    * all: the distributed loop is SEQUENTIAL by nature — 3 driver-
    * blocking Spark jobs per merge, so a 10k-merge production vocabulary
    * costs ~30k jobs of pure scheduling latency (hours) over data that
    * fits in memory. The local loop runs the same incremental algorithm
    * in-process: identical merges, 2 Spark jobs total (the pricing
    * aggregation + one collect), ~1000× the wall-clock at production
    * merge counts. */
  val DefaultLocalLearnSymbolBudget: Long = 32L * 1024 * 1024

  /** [[learnBpeFromCounts]] in DRIVER-LOCAL execution: collect the
    * (vocabulary-bounded) word table once and run the incremental
    * pair-count algorithm in-process. OUTPUT-IDENTICAL to the
    * distributed loops by construction — same pair statistic (every
    * adjacent occurrence counts its word's cnt), same greedy
    * left-to-right non-overlapping merge application, same argmax order
    * (cnt DESC, then l, r ascending in UTF-8 BYTE order, which is
    * exactly Spark's string ordering — Java's compareTo would diverge
    * on supplementary characters) — property-pinned in VocabSpec and
    * gate-checked against the same unrolled DuckDB oracle
    * (q_bpe_merges_local). Cost: one collect, zero jobs per merge;
    * per-step work ∝ words containing the merged pair (the maintained
    * occurrence index), argmax O(log |pairs|) from a TreeSet. */
  def learnBpeLocalFromCounts(wc: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    import scala.collection.mutable
    val rows = wc.select(col("word").cast("string"), col("cnt").cast("long"))
      .collect()
    // one symbol per CODE POINT — the encodeChars("(.)") contract
    val words = new Array[mutable.ArrayBuffer[String]](rows.length)
    val wcnts = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) {
      val w = rows(i).getString(0)
      val buf = new mutable.ArrayBuffer[String](w.length)
      var j = 0
      while (j < w.length) {
        val n = Character.charCount(w.codePointAt(j))
        buf += w.substring(j, j + n)
        j += n
      }
      words(i) = buf
      wcnts(i) = rows(i).getLong(1)
      i += 1
    }
    // Spark string order = memcmp over UTF-8 bytes
    def utf8Cmp(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var k = 0
      while (k < n) {
        val d = (x(k) & 0xff) - (y(k) & 0xff)
        if (d != 0) return d
        k += 1
      }
      x.length - y.length
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    val sorted = new java.util.TreeSet[(Long, String, String)](
      new java.util.Comparator[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
          else {
            val d = utf8Cmp(a._2, b._2)
            if (d != 0) d else utf8Cmp(a._3, b._3)
          }
        }
      })
    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) sorted.remove((old, p._1, p._2))
      val nv = old + delta
      if (nv != 0L) {
        counts(p) = nv
        sorted.add((nv, p._1, p._2))
      } else counts.remove(p)
    }
    // sign=+1 registers a word's pairs (and occurrence-index rows);
    // sign=-1 withdraws them — always reading the word's CURRENT symbols
    def account(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      val c = wcnts(wi) * sign
      var k = 0
      while (k < s.length - 1) {
        val p = (s(k), s(k + 1))
        bump(p, c)
        if (sign > 0) index.getOrElseUpdate(p, mutable.Set.empty) += wi
        else index.get(p).foreach(_ -= wi)
        k += 1
      }
    }
    i = 0
    while (i < words.length) { account(i, 1L); i += 1 }
    def applyMergeLocal(s: mutable.ArrayBuffer[String], l: String,
        r: String): mutable.ArrayBuffer[String] = {
      val out = new mutable.ArrayBuffer[String](s.length)
      var k = 0
      while (k < s.length) {
        if (k < s.length - 1 && s(k) == l && s(k + 1) == r) {
          out += l + r
          k += 2
        } else {
          out += s(k)
          k += 1
        }
      }
      out
    }
    val merges = Seq.newBuilder[Merge]
    var step = 1
    while (step <= nMerges && !sorted.isEmpty) {
      val (c, l, r) = sorted.first()
      merges += Merge(step, l, r, c)
      // snapshot: account() mutates the index sets mid-loop
      val affected = index.getOrElse((l, r), mutable.Set.empty).toArray
      java.util.Arrays.sort(affected) // determinism is free; keep it
      for (wi <- affected) {
        account(wi, -1L)
        words(wi) = applyMergeLocal(words(wi), l, r)
        account(wi, 1L)
      }
      step += 1
    }
    merges.result()
  }

  /** The PLAN-DISPATCHED learn loop: price with [[planLearn]], then run
    * the regime it chose — driver-local when the word table's symbol
    * mass fits `localSymbolBudget` (it virtually always does: the table
    * is vocabulary-bounded), the distributed incremental loop
    * ([[learnBpeFastFromCounts]]) otherwise. Identical merges either
    * way. */
  def learnBpeAutoFromCounts(wc: DataFrame, nMerges: Int,
      localSymbolBudget: Long = DefaultLocalLearnSymbolBudget)
      : Seq[Merge] = {
    val plan = planLearn(wc, nMerges, localSymbolBudget)
    if (plan.regime == "driver-local") learnBpeLocalFromCounts(wc, nMerges)
    else learnBpeFastFromCounts(wc, nMerges)
  }

  /** Release a localCheckpoint'd dataset's persisted blocks NOW.
    * `Dataset.unpersist` only reaches `cache()`-registered plans (it
    * goes through the CacheManager) — a localCheckpoint persists at the
    * RDD level, invisible to the cache manager — so freeing a
    * superseded checkpoint means unpersisting the underlying
    * checkpointed RDD itself (the LogicalRDD the checkpoint's plan
    * wraps). A non-checkpoint plan is left untouched. */
  private def releaseCheckpoint(ds: DataFrame): Unit =
    ds.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Merge-count threshold where [[tokenizeBpe]] switches from the
    * literal `replace` chain to the compiled single-node expression:
    * the chain costs one Catalyst node per merge (analysis + codegen
    * are super-linear in tree depth and collapse long before production
    * vocabularies), while the compiled path is one node at any count.
    * 64 keeps every oracle-twinned gate rendition on the chain (3
    * merges) with wide margin, and stays far below where deep trees
    * start to hurt. */
  val LiteralChainMaxMerges = 64

  /** BPE-tokenize a text column with learned merges — per word, apply
    * every merge in learned order (greedy non-overlapping left-to-right
    * per merge), then flatten the per-word symbol arrays. One corpus
    * scan, zero joins, whole-stage codegen either way; the PHYSICAL
    * rendition dispatches on vocabulary size:
    *
    *  - ≤ [[LiteralChainMaxMerges]] merges: the literal `replace` chain
    *    ([[tokenizeBpeLiteral]]) — merges baked in as plan literals, the
    *    DuckDB-twinnable form the gate hash-checks;
    *  - above it: ONE custom codegen node
    *    ([[org.apache.spark.sql.graftshim.BpeExpressions.BpeTokenize]])
    *    carrying the whole merge table as a reference object and
    *    applying it in a per-row rank-skipping loop
    *    ([[tokenizeBpeCompiled]]) — the production path: a 10k–50k-merge
    *    real tokenizer is the same plan shape as the gate's 3 merges,
    *    where the chain's 10k-deep expression tree would collapse
    *    Catalyst analysis/codegen long before execution.
    *
    * The two renditions are output-identical by construction (the
    * compiled loop IS the fold, skipping identity passes — see
    * [[org.apache.spark.sql.graftshim.BpeApply.applyWord]]) and
    * property-pinned against each other and the reference greedy fold at
    * ≥ 1000 merges in VocabSpec. */
  def tokenizeBpe(textCol: Column, merges: Seq[Merge]): Column =
    if (merges.size <= LiteralChainMaxMerges) tokenizeBpeLiteral(textCol, merges)
    else tokenizeBpeCompiled(textCol, merges)

  /** The literal-chain rendition (see [[tokenizeBpe]]). */
  def tokenizeBpeLiteral(textCol: Column, merges: Seq[Merge]): Column =
    flatten(transform(Text.tokens(textCol), w =>
      symbols(merges.foldLeft(encodeChars(w)) { (e, m) =>
        applyMerge(e, m.l, m.r)
      })))

  /** The compiled single-node rendition (see [[tokenizeBpe]]). */
  def tokenizeBpeCompiled(textCol: Column, merges: Seq[Merge]): Column = {
    import org.apache.spark.sql.graftshim.{BpeExpressions, GraftShim}
    GraftShim.column(BpeExpressions.BpeTokenize(
      GraftShim.expression(Text.tokens(textCol)),
      merges.map(m => (m.l, m.r))))
  }

  /** DECLARED COST of a [[learnBpeFromCounts]] run BEFORE launching it —
    * the [[planRefresh]]/[[graft.index.IndexStore.planRetrain]] posture
    * for the learn loop itself: each merge step is one pair-count
    * aggregation over the (vocabulary-bounded) word table plus a 1-row
    * argmax collect plus a checkpointed re-encode, all sequential and
    * driver-blocking — at production merge counts (10k+) that is tens of
    * thousands of Spark jobs, a cost that deserves to be a printed
    * number, not a surprise. The corpus is scanned exactly ONCE
    * (inside [[wordCounts]], or zero times on the persisted-family
    * path); everything else reads the word table, whose symbol mass
    * only SHRINKS as merges fuse — so `scanMassUpperBound` =
    * nMerges × initial symbol count is a true upper bound on loop scan
    * work. One aggregation over the word table to price; rationale
    * names the incremental-pair-count alternative for when the bound
    * reads too high. */
  final case class LearnPlan(nMerges: Int, vocabWords: Long,
      vocabSymbols: Long, corpusScans: Int, sparkJobs: Long,
      scanMassUpperBound: Double, regime: String, rationale: Seq[String])

  def planLearn(wc: DataFrame, nMerges: Int,
      localSymbolBudget: Long = DefaultLocalLearnSymbolBudget): LearnPlan = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val r = wc.agg(count(lit(1)), sum(length(col("word")))).head()
    val words = r.getLong(0)
    val syms = if (r.isNullAt(1)) 0L else r.getLong(1)
    val local = syms <= localSymbolBudget
    val regime = if (local) "driver-local" else "distributed"
    // local: this pricing aggregation + ONE collect; distributed: 3
    // sequential driver-blocking jobs per merge after the table build
    val jobs = if (local) 2L else 1L + 3L * nMerges
    val mass = nMerges.toDouble * syms
    LearnPlan(nMerges, words, syms, 1, jobs, mass, regime, Seq(
      f"ONE corpus scan total (wordCounts builds the $words%d-word table " +
        f"carrying $syms%d initial symbols); the loop never rescans the corpus",
      (if (local)
        f"symbol mass $syms%d fits the driver budget $localSymbolBudget%d " +
          f"→ DRIVER-LOCAL regime: collect the word table and learn " +
          f"in-process ($jobs%d Spark jobs TOTAL — the sequential " +
          "per-merge job latency disappears; identical merges by " +
          "construction)"
      else
        f"symbol mass $syms%d exceeds the driver budget " +
          f"$localSymbolBudget%d → DISTRIBUTED regime: $nMerges%d " +
          f"sequential merges × (pair-count aggregation + 1-row argmax " +
          f"collect + checkpointed re-encode) ≈ $jobs%d driver-blocking " +
          "Spark jobs — wall-clock is job-latency-bound, not data-bound"),
      f"loop scan-mass upper bound ${mass}%.3g symbol-units " +
        "(per-step mass only shrinks as merges fuse symbols)",
      "the distributed fast loop ([[learnBpeFastFromCounts]]) maintains " +
        "pair counts incrementally (only pairs in words containing the " +
        "merged pair change), so its per-step explosion is ∝ affected " +
        "words; the local regime runs the same incremental algorithm " +
        "in-process"))
  }

  /** Word-level drift between two vocab states (e.g. two
    * [[graft.index.IndexStore.loadWordCountsAsOf]] horizons): one row per
    * word present in either, with both counts and the signed delta.
    * FULL OUTER on the word key over two vocabulary-bounded relations —
    * never a corpus scan; the corpus-drift monitor for tokenizer
    * refresh, the BPE analog of the quantization-drift ledger. */
  def countsDiff(thenCounts: DataFrame, nowCounts: DataFrame): DataFrame =
    thenCounts.select(col("word"), col("cnt").as("cnt_then"))
      .join(nowCounts.select(col("word"), col("cnt").as("cnt_now")),
        Seq("word"), "full_outer")
      .select(col("word"),
        coalesce(col("cnt_then"), lit(0L)).as("cnt_then"),
        coalesce(col("cnt_now"), lit(0L)).as("cnt_now"))
      .withColumn("delta", col("cnt_now") - col("cnt_then"))

  /** One refresh-or-not recommendation with its receipts — the
    * [[graft.index.IndexStore.planRetrain]] posture for the tokenizer:
    * a BPE vocab learned at wave W silently mis-segments text whose
    * word distribution has moved (no error, no wrong hash — just worse
    * tokens), so WHEN to relearn should be measured arithmetic, not
    * folklore. `changedMass` is Σ|delta| (mass added + removed +
    * shifted); the ratio against the current mass is compared to the
    * caller-declared tolerance (threshold = policy, inputs =
    * measurements). One aggregation over the vocabulary-bounded diff. */
  final case class RefreshPlan(massThen: Long, massNow: Long,
      changedMass: Long, ratio: Double, tolerance: Double,
      recommend: Boolean, rationale: String)

  def planRefresh(diff: DataFrame, tolerance: Double): RefreshPlan = {
    require(tolerance > 0, s"tolerance must be > 0, got $tolerance")
    val r = diff.agg(
      sum(col("cnt_then")), sum(col("cnt_now")), sum(abs(col("delta"))))
      .head()
    val (mt, mn, cm) = (
      if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
    require(mn > 0,
      "planRefresh: current vocab mass is zero — nothing to tokenize, " +
        "nothing to price")
    val ratio = cm.toDouble / mn
    RefreshPlan(mt, mn, cm, ratio, tolerance,
      recommend = ratio > tolerance,
      rationale = f"changed token mass $cm (|delta| sum) is $ratio%.4f " +
        f"of current mass $mn vs tolerance $tolerance%.4f — " +
        (if (ratio > tolerance) "relearn merges" else "vocab still current"))
  }

  // ------------------------------------------------------------- oracle SQL

  /** DuckDB CTE chain producing the word-count relation `wc(word, cnt)`
    * from `$table.$textExpr`. */
  private def sqlWordCounts(table: String, textExpr: String,
      splitRe: String = Text.SplitRe): String =
    s"""w AS (SELECT unnest(${Text.sqlTokens(textExpr, splitRe)}) AS word FROM $table),
       |wc AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY 1)""".stripMargin

  /** DuckDB twin of [[countsDiff]] over two corpus renditions (fresh
    * word counts each side — it is the oracle, not the plan). */
  def sqlCountsDiff(thenTable: String, nowTable: String,
      textExpr: String): String =
    s"""WITH tw AS (SELECT unnest(${Text.sqlTokens(textExpr)}) AS word FROM $thenTable),
       |tc AS (SELECT word, count(*)::BIGINT AS cnt FROM tw GROUP BY 1),
       |nw AS (SELECT unnest(${Text.sqlTokens(textExpr)}) AS word FROM $nowTable),
       |nc AS (SELECT word, count(*)::BIGINT AS cnt FROM nw GROUP BY 1)
       |SELECT coalesce(t.word, n.word) AS word,
       |       coalesce(t.cnt, 0)::BIGINT AS cnt_then,
       |       coalesce(n.cnt, 0)::BIGINT AS cnt_now,
       |       (coalesce(n.cnt, 0) - coalesce(t.cnt, 0))::BIGINT AS delta
       |FROM tc t FULL OUTER JOIN nc n ON t.word = n.word""".stripMargin

  /** DuckDB twin of iteration-1 [[pairCounts]] over `$table.$textExpr`
    * (symbols = characters): the relation the first merge is argmax'd
    * from. */
  def sqlPairCounts(table: String, textExpr: String): String =
    s"""WITH ${sqlWordCounts(table, textExpr)},
       |px AS (SELECT unnest(generate_series(1, length(word) - 1)) AS i, word, cnt FROM wc)
       |SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
       |       sum(cnt)::BIGINT AS cnt
       |FROM px GROUP BY 1, 2""".stripMargin

  /** The CTE chain learning `nMerges` merges: defines `e1..e{n}` (encoded
    * word tables) and `t1..t{n}` (1-row argmax picks). Callers compose a
    * final SELECT over the `t` CTEs ([[sqlLearnBpe]]) or over the last
    * `e` ([[sqlTokenizeBpe]] recomputes encodings per doc instead). */
  private def sqlLearnCtes(table: String, textExpr: String,
      nMerges: Int, splitRe: String = Text.SplitRe): String = {
    val steps = (1 to nMerges).map { k =>
      val src = if (k == 1) s"""e1 AS (
         |  SELECT regexp_replace(word, '(.)', '$Open\\1$Close', 'g') AS enc, cnt FROM wc)"""
        else s"""e$k AS (
         |  SELECT replace(enc, (SELECT '$Open' || l || '$Close$Open' || r || '$Close' FROM t${k - 1}),
         |                      (SELECT '$Open' || l || r || '$Close' FROM t${k - 1})) AS enc, cnt
         |  FROM e${k - 1})"""
      s"""$src,
         |s$k AS (SELECT list_filter(string_split_regex(enc, '[$Open$Close]'), s -> s <> '') AS s, cnt FROM e$k),
         |x$k AS (SELECT unnest(generate_series(1, len(s) - 1)) AS i, s, cnt FROM s$k),
         |p$k AS (SELECT s[i] AS l, s[i + 1] AS r, sum(cnt)::BIGINT AS cnt FROM x$k GROUP BY 1, 2),
         |t$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1)"""
    }
    (sqlWordCounts(table, textExpr, splitRe) +: steps).mkString(",\n")
  }

  /** DuckDB twin of [[learnBpe]]: (step, l, r, cnt) for `nMerges`
    * unrolled iterations. */
  def sqlLearnBpe(table: String, textExpr: String, nMerges: Int,
      splitRe: String = Text.SplitRe): String = {
    val union = (1 to nMerges)
      .map(k => s"SELECT $k AS step, l, r, cnt FROM t$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${sqlLearnCtes(table, textExpr, nMerges, splitRe)}
       |$union""".stripMargin
  }

  /** DuckDB twin of per-doc [[tokenizeBpe]] COUNTS: (id, n_bpe) where
    * n_bpe is the number of subword symbols after applying the `nMerges`
    * merges this same query learns from `$table` — the end-to-end
    * learn-then-apply pipeline in one statement. Docs with no tokens
    * report 0. */
  def sqlTokenizeCounts(table: String, idExpr: String, textExpr: String,
      nMerges: Int): String = {
    val applied = (1 to nMerges).foldLeft("enc0") { (e, k) =>
      s"replace($e, (SELECT '$Open' || l || '$Close$Open' || r || '$Close' FROM t$k), " +
        s"(SELECT '$Open' || l || r || '$Close' FROM t$k))"
    }
    s"""WITH ${sqlLearnCtes(table, textExpr, nMerges)},
       |dw AS (
       |  SELECT $idExpr AS id, unnest(${Text.sqlTokens(textExpr)}) AS word
       |  FROM $table),
       |de AS (
       |  SELECT id, regexp_replace(word, '(.)', '$Open\\1$Close', 'g') AS enc0 FROM dw),
       |dn AS (
       |  SELECT id, sum(len(list_filter(string_split_regex($applied, '[$Open$Close]'), s -> s <> '')))::BIGINT AS n_bpe
       |  FROM de GROUP BY 1)
       |SELECT b.id, coalesce(dn.n_bpe, 0)::BIGINT AS n_bpe
       |FROM (SELECT $idExpr AS id FROM $table) b
       |LEFT JOIN dn USING (id)""".stripMargin
  }
}
