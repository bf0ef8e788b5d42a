package graft

import graft.operators.Sketches
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch contracts: approximate (HLL++/t-digest) accuracy vs exact values,
  * and the deterministic KMV / discrete-quantile operators that back the
  * q_sketches oracle row. */
class SketchSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact; quantiles within the value spread") {
    val ev = Tables.events(spark, Sf0001)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    approx.foreach { case (t, a, p50) =>
      val e = exact(t)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$t: approx $a vs exact $e")
      // p50 must sit between the column min and max for the group
      val Array(mn, mx) = ev.where(col("event_type") === t)
        .agg(min(col("value")), max(col("value"))).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      assert(p50 >= mn && p50 <= mx)
    }
  }

  test("KMV aggregator equals the windowed reference formulation on events") {
    val ev = Tables.events(spark, Sf0001)
    val h = graft.functions.Text.hash60(col("user_id").cast("string"))
    val agg = Sketches.kmvDistinct(ev, "event_type", h, Sketches.DefaultK, "kmv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val win = Sketches.kmvDistinctWindowed(ev, "event_type", h, Sketches.DefaultK, "kmv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg === win)
    assert(agg.nonEmpty)
  }

  test("KMV is exact below k, within 2/sqrt(k) above, and ignores duplicates") {
    // 40 distinct users (< k=64): estimate must be the exact count, even
    // with every row duplicated (hash-set semantics)
    val small = (1 to 40).flatMap(i => Seq(("g", s"u$i"), ("g", s"u$i"))).toDF("grp", "uid")
    val hs = graft.functions.Text.hash60(col("uid"))
    val est = Sketches.kmvDistinct(small, "grp", hs).head().getLong(1)
    assert(est === 40L)
    // 5000 distinct (>> k): classic KMV error bound ~1/sqrt(k-1); allow 3x
    val big = (1 to 5000).map(i => ("g", s"user$i")).toDF("grp", "uid")
    val estBig = Sketches.kmvDistinct(big, "grp", hs).head().getLong(1)
    assert(math.abs(estBig - 5000.0) / 5000.0 <= 3.0 / math.sqrt(Sketches.DefaultK - 1),
      s"estimate $estBig too far from 5000")
  }

  test("quantilesDisc returns the exact rank-ceil(p*n/100) value per group") {
    val ev = Tables.events(spark, Sf0001)
    val got = Sketches.quantilesDisc(ev, "event_type", "value", Seq(50, 95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val types = got.keySet
    assert(types.nonEmpty)
    types.foreach { t =>
      val vals = ev.where(col("event_type") === t && col("value").isNotNull)
        .select("value").as[Double].collect().sorted
      def at(p: Int) = vals((p * vals.length + 99) / 100 - 1)
      assert(got(t) === (at(50), at(95)), s"group $t")
    }
  }

  test("MG heavy hitters equal the brute groupBy-HAVING relation on skewed data") {
    // Zipf-ish: item i appears floor(2000/i) times; vocabulary 200 >> k=16
    val rows = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"it$i")).toDF("item")
      .repartition(7) // exercise the partial/merge paths
    val hh = Sketches.heavyHitters(rows, "item", k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.count()
    val brute = rows.groupBy("item").count()
      .where(col("count") * 16 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh === brute)
    assert(hh.nonEmpty)
  }

  test("MG retention theorem holds under random splits and merge orders") {
    // every item with true frequency > n/(k+1) survives, counters are
    // lower bounds within n/(k+1), and the summary never exceeds k —
    // across random streams, random chunkings, random merge orders
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val k = 1 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(2000)
      val vocab = 1 + rnd.nextInt(60)
      val xs = Array.fill(n)(s"v${rnd.nextInt(vocab)}")
      val exact = xs.groupBy(identity).map { case (s, a) => s -> a.length.toLong }
      val agg = new Sketches.MgAgg(k)
      val chunks = xs.grouped(1 + rnd.nextInt(math.max(1, n / 4))).toSeq
      val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      assert(merged.size <= k)
      exact.foreach { case (s, c) =>
        val est = merged.getOrElse(s, 0L)
        assert(est <= c, s"counter $est overestimates true $c for $s")
        if (c > n.toDouble / (k + 1))
          assert(merged.contains(s),
            s"item $s freq $c > n/(k+1)=${n.toDouble / (k + 1)} dropped (k=$k, n=$n)")
        if (merged.contains(s))
          assert(c - est <= n.toDouble / (k + 1) + 1e-9,
            s"error ${c - est} beyond n/(k+1) for $s")
      }
      // nothing invented: every summary key exists in the stream
      merged.keys.foreach(s => assert(exact.contains(s)))
    }
  }

  test("MG screen stays bounded when vocab >> k; nulls excluded from n") {
    // 500 singletons + one hot item: the k=8 screen must keep ≤ 8
    // candidates and the exact verify must emit exactly the hot item
    val rows = ((1 to 500).map(i => s"u$i") ++ Seq.fill(300)("hot"))
      .toDF("item").repartition(5)
    val hh = Sketches.heavyHitters(rows, "item", k = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hh.toSeq === Seq("hot" -> 300L)) // n=800, threshold 100
    // nulls: excluded from both the stream and the total
    val withNulls = Seq(Some("a"), Some("a"), None, Some("b")).toDF("item")
    val hh2 = Sketches.heavyHitters(withNulls, "item", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh2 === Map("a" -> 2L)) // n=3 non-null, threshold cnt*2 > 3
  }

  test("KMV intersection: exact when sketches are complete, bounded error when not") {
    val k = 64
    def minsOf(hashes: Seq[Long]): Array[Long] =
      hashes.distinct.sorted.take(k).toArray
    // complete sketches (< k distinct each): the answer is EXACT
    val a = Seq(1L, 5L, 9L, 13L, 40L)
    val b = Seq(5L, 9L, 77L)
    assert(Sketches.kmvIntersection(minsOf(a), minsOf(b), k) === 2L)
    assert(Sketches.kmvIntersection(minsOf(a), minsOf(Seq(100L)), k) === 0L)
    // estimator branch: random 60-bit universes with a planted overlap —
    // the estimate tracks the truth within KMV's ~1/sqrt(k) regime
    val rnd = new scala.util.Random(7)
    def h60() = rnd.nextLong() & ((1L << 60) - 1)
    for (trial <- 1 to 5) {
      val shared = Seq.fill(2000)(h60())
      val onlyA = Seq.fill(3000)(h60())
      val onlyB = Seq.fill(2500)(h60())
      val est = Sketches.kmvIntersection(
        minsOf(shared ++ onlyA), minsOf(shared ++ onlyB), k)
      assert(est > 1000 && est < 3200,
        s"trial $trial: overlap estimate $est too far from 2000")
    }
    // refusals: oversized min-sets, bad k
    intercept[IllegalArgumentException](
      Sketches.kmvIntersection(new Array[Long](65), new Array[Long](3), k))
    intercept[IllegalArgumentException](
      Sketches.kmvIntersection(Array(1L), Array(2L), 0))
  }
}
