package graft.operators

import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoders}

/** Deterministic distributed sketches (SURVEY §2.4 north-star; VERDICT r1
  * next-step 2): a KMV (k-minimum-values) distinct estimator and exact
  * discrete quantiles. Unlike HLL++/t-digest (whose merge internals are
  * engine-specific and can never hash-match an external oracle), both of
  * these compute a deterministic, engine-independent number: KMV's estimate
  * is a closed-form function of the k smallest 60-bit hashes, and the
  * discrete quantile is a value copied verbatim from the data. Each has a
  * DuckDB SQL rendition for the correctness gate.
  *
  * Scale notes (100 TB):
  *   - [[KmvAgg]] is a bounded-state `Aggregator`: every map task contributes
  *     at most k longs to the shuffle regardless of input size, and merges
  *     are O(k) — the same partial-aggregation shape as HLL++, unlike exact
  *     `countDistinct` whose shuffle carries every distinct key.
  *   - exact quantiles inherently need a per-group sort; the window below is
  *     partitioned by the group key (no global sort). For cases where an
  *     approximation suffices at scale, `percentile_approx` remains the
  *     cheaper path (kept unit-tested in SketchSpec).
  */
object Sketches {

  val DefaultK = 64

  /** 2^60 — hash60 values are uniform in [0, 2^60); exactly representable
    * as a double (and written as the same literal in the SQL rendition so
    * the IEEE division matches bit-for-bit). */
  val TwoPow60: Double = 1152921504606846976.0

  /** Estimate from the sorted k-minimum hash set: fewer than k distinct
    * hashes means we saw the whole set (exact count); otherwise the classic
    * KMV estimator (k−1)·2^60 / h_k. Public so the persisted summary
    * family ([[graft.index.IndexStore.loadSummary]]) can estimate from
    * batch-merged mins with the identical arithmetic. */
  def estimate(mins: Array[Long], k: Int): Long =
    if (mins.length < k) mins.length.toLong
    else math.floor((k - 1).toDouble * TwoPow60 / mins(k - 1).toDouble).toLong

  /** Bounded-state KMV aggregator over 60-bit hashes. State: the sorted
    * array of the ≤ k smallest DISTINCT hashes seen so far. */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // already tracked
      else {
        val ins = -pos - 1
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins < k) { // displaces the current max
          val out = new Array[Long](k)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out
        } else b
      }
    }

    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      // sorted-merge distinct, keep the k smallest
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < b1.length || j < b2.length)) {
        val take =
          if (i >= b1.length) { val v = b2(j); j += 1; v }
          else if (j >= b2.length) { val v = b1(i); i += 1; v }
          else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
          else if (b1(i) > b2(j)) { val v = b2(j); j += 1; v }
          else { val v = b1(i); i += 1; j += 1; v }
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(r: Array[Long]): Long = estimate(r, k)

    def bufferEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder = Encoders.scalaLong
  }

  /** KMV distinct estimate per group over a 60-bit hash column. Null hashes
    * are excluded (countDistinct semantics). */
  def kmvDistinct(df: DataFrame, groupCol: String, hashCol: Column, k: Int = DefaultK,
                  out: String = "kmv_distinct"): DataFrame = {
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select(col(groupCol), hashCol.as("h"))
      .filter(col("h").isNotNull)
      .groupBy(groupCol)
      .agg(kmv(col("h")).as(out))
  }

  /** Reference formulation of [[kmvDistinct]] via window rank over distinct
    * hashes — provably the same number (spec-asserted), but its shuffle
    * carries every distinct hash; test/oracle shape only. */
  def kmvDistinctWindowed(df: DataFrame, groupCol: String, hashCol: Column, k: Int = DefaultK,
                          out: String = "kmv_distinct"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy("h")
    df.select(col(groupCol), hashCol.as("h"))
      .filter(col("h").isNotNull).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("m"), max("h").as("hk"))
      .select(col(groupCol),
        when(col("m") < k, col("m"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(TwoPow60) / col("hk").cast("double")).cast("long"))
          .as(out))
  }

  /** KMV set-INTERSECTION estimate from two k-min sketches (Beyer et al.
    * 2007, "On synopses for distinct value estimation under multiset
    * operations") — the join-cardinality pricing primitive: how many
    * distinct keys two relations share, from 2·k longs, before any join
    * runs. Membership is testable from the sketches alone: an x among
    * the k smallest of A∪B that belongs to A is necessarily among A's k
    * smallest (fewer than k union hashes precede it, so fewer than k of
    * A's do). Branches, in the engine-frozen arithmetic order the oracle
    * twin replicates:
    *  - both sketches complete (< k distinct each): EXACT intersection —
    *    the sketches ARE the full hash sets;
    *  - otherwise K = k smallest of the union, and
    *    |A∩B| ≈ ⌊ matches · ((k−1)·2^60 / max(K)) / k ⌋ where matches =
    *    |{x ∈ K : x ∈ minsA ∧ x ∈ minsB}| — the Jaccard fraction over K
    *    scaled by the union estimate.
    * Inputs must be sorted-ascending distinct min-sets (what [[KmvAgg]]
    * and a `distinct().orderBy().limit(k)` both produce). */
  def kmvIntersection(minsA: Array[Long], minsB: Array[Long], k: Int): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minsA.length <= k && minsB.length <= k,
      s"min-sets exceed k=$k: ${minsA.length}, ${minsB.length}")
    def in(mins: Array[Long], h: Long): Boolean =
      java.util.Arrays.binarySearch(mins, h) >= 0
    if (minsA.length < k && minsB.length < k)
      minsA.count(in(minsB, _)).toLong
    else {
      val union = (minsA ++ minsB).distinct.sorted.take(k)
      val matches = union.count(h => in(minsA, h) && in(minsB, h))
      val d = (k - 1).toDouble * TwoPow60 / union.last.toDouble
      math.floor(matches.toDouble * d / k.toDouble).toLong
    }
  }

  /** DuckDB rendition of [[kmvDistinct]]: a scalar subquery-free CTE body.
    * `hashExpr` must be the SQL rendition of the same hash fed to the Spark
    * side (see [[graft.functions.Text.sqlHash60]]). Returns (cteSql, colName)
    * pieces for composition; simplest use is [[sqlKmvDistinctSelect]]. */
  def sqlKmvDistinctSelect(table: String, groupCol: String, hashExpr: String,
                           k: Int = DefaultK, out: String = "kmv_distinct"): String =
    s"""SELECT $groupCol,
       |       CASE WHEN count(*) < $k THEN count(*)
       |            ELSE floor(${k - 1}::DOUBLE * 1152921504606846976.0 / max(h)::DOUBLE)::BIGINT
       |       END AS $out
       |FROM (
       |  SELECT $groupCol, h, row_number() OVER (PARTITION BY $groupCol ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT $groupCol, $hashExpr AS h FROM $table WHERE $hashExpr IS NOT NULL)
       |) WHERE rn <= $k GROUP BY $groupCol""".stripMargin

  /** Exact discrete quantiles per group: for each p (in percent), the value
    * at 1-based rank ceil(p·n/100) of the group's values sorted ascending —
    * a value copied verbatim from the data (no interpolation arithmetic →
    * nothing for two engines to disagree about). Nulls excluded. The rank
    * is computed in exact integer arithmetic: (p·n + 99) div 100. */
  def quantilesDisc(df: DataFrame, groupCol: String, valueCol: String,
                    percents: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val cw = Window.partitionBy(groupCol)
    val ranked = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
    // ceil(p*cnt/100) as exact integers: (p*cnt + 99) / 100 floored; the
    // double division is exact (operands < 2^53)
    def idx(p: Int): Column =
      floor((lit(p.toLong) * col("cnt") + lit(99L)).cast("double") / lit(100.0)).cast("long")
    val aggs = percents.map(p => max(when(col("rn") === idx(p), col(valueCol))).as(s"p$p"))
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB rendition of [[quantilesDisc]]. */
  def sqlQuantilesDiscSelect(table: String, groupCol: String, valueExpr: String,
                             percents: Seq[Int]): String = {
    val aggs = percents.map(p =>
      s"max(CASE WHEN rn = ($p * cnt + 99) // 100 THEN v END) AS p$p").mkString(",\n       ")
    s"""SELECT $groupCol,
       |       $aggs
       |FROM (
       |  SELECT $groupCol, $valueExpr AS v,
       |         row_number() OVER (PARTITION BY $groupCol ORDER BY $valueExpr) AS rn,
       |         count(*) OVER (PARTITION BY $groupCol) AS cnt
       |  FROM $table WHERE $valueExpr IS NOT NULL
       |) GROUP BY $groupCol""".stripMargin
  }

  // ---------------------------------------------- Misra–Gries heavy hitters

  /** Bounded-state Misra–Gries frequency summary (Misra & Gries 1982,
    * "Finding repeated elements"; merge rule from Agarwal et al.,
    * "Mergeable summaries", PODS 2012): state is ≤ k (item → counter)
    * entries. Reduce: increment a tracked item, insert while below
    * capacity, otherwise decrement every counter by one (paying one unit
    * from each tracked item in lieu of tracking the new one — amortized
    * O(1) per input). Merge: sum counterparts, then subtract the
    * (k+1)-th largest counter from all and keep the strictly positive —
    * at most k survive. The mergeable-summaries theorem: after ANY merge
    * tree over any partitioning of an n-item stream, each counter
    * underestimates its item's true count by at most n/(k+1), so every
    * item with true frequency > n/(k+1) is retained (recall 1 for the
    * "frequency > n/k" heavy-hitter question; precision restored by an
    * exact recount of the ≤ k candidates). Property-swept across random
    * streams / splits / merge orders in SketchSpec. */
  /** The Agarwal et al. MG merge, standalone: sum counterparts, subtract
    * the (k+1)-th largest counter from all, keep the strictly positive —
    * at most k survive, and the n/(k+1) underestimate bound is preserved
    * across ANY merge tree. Public so the persisted summary family can
    * fold batch deltas with the identical rule the in-flight aggregator
    * uses. */
  def mgMerge(b1: Map[String, Long], b2: Map[String, Long],
      k: Int): Map[String, Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      val sum = (b1.keySet ++ b2.keySet).iterator
        .map(s => s -> (b1.getOrElse(s, 0L) + b2.getOrElse(s, 0L))).toMap
      if (sum.size <= k) sum
      else {
        val vs = sum.valuesIterator.toArray
        java.util.Arrays.sort(vs)
        val vk1 = vs(vs.length - (k + 1)) // (k+1)-th largest counter
        sum.flatMap { case (s, c) => if (c > vk1) Some(s -> (c - vk1)) else None }
      }
    }

  class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MG summary capacity must be >= 1, got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c)            => b.updated(item, c + 1L)
        case None if b.size < k => b.updated(item, 1L)
        case None =>
          b.flatMap { case (s, c) => if (c > 1L) Some(s -> (c - 1L)) else None }
      }

    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      mgMerge(b1, b2, k)

    def finish(r: Map[String, Long]): Map[String, Long] = r

    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** EXACT heavy hitters — every item whose frequency strictly exceeds
    * n/k of the non-null item stream, with its exact count — via the
    * sketch→verify discipline the dedup family uses: a bounded-state
    * [[MgAgg]] screen (map-side partial state ≤ k entries per task, one
    * final merge over numPartitions × k entries — never a shuffle of the
    * full item vocabulary), then an exact recount restricted to the ≤ k
    * surviving candidates (broadcast semi-join; map-side combine over ≤ k
    * keys). Two scans of the input by design — the same candidate/verify
    * shape as the LSH dedup passes. Recall 1 is the mergeable-MG theorem
    * (retention floor n/(k+1) < threshold n/k), precision 1 is the exact
    * recount; the output is definitionally identical to the brute
    * groupBy-HAVING, which is therefore a full oracle. The 100 TB
    * contrast is with that brute plan: a corpus-wide token groupBy
    * shuffles every distinct term (billions for web-scale text); the
    * screen shuffles ≤ k rows per map task regardless of vocabulary. */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int = DefaultK,
                   out: String = "cnt"): DataFrame = {
    val mg = udaf(new MgAgg(k), Encoders.STRING)
    val items = df.select(col(itemCol).as("__it")).filter(col("__it").isNotNull)
    val screen = items.agg(count(lit(1)).as("__n"), mg(col("__it")).as("__mg"))
      .select(col("__n"), explode(map_keys(col("__mg"))).as("__it"))
    items.join(broadcast(screen), Seq("__it"))
      .groupBy("__it", "__n")
      .agg(count(lit(1)).as(out))
      .where(col(out) * lit(k.toLong) > col("__n"))
      .select(col("__it").as(itemCol), col(out))
  }

  /** DuckDB rendition of [[heavyHitters]]: brute groupBy-HAVING over an
    * items subquery whose column is `itemCol` — a full oracle because the
    * screen+verify output is definitionally the same relation. */
  def sqlHeavyHittersSelect(itemsSql: String, itemCol: String, k: Int,
                            out: String = "cnt"): String =
    s"""SELECT $itemCol, count(*) AS $out
       |FROM ($itemsSql) i, (SELECT count($itemCol) AS n FROM ($itemsSql)) tot
       |WHERE $itemCol IS NOT NULL
       |GROUP BY $itemCol, n
       |HAVING count(*) * $k > n""".stripMargin
}
