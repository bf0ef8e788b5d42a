package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session-cycling cache hygiene: a LONG-LIVED service cycling
  * SparkSessions over the same corpus must be able to drop a finished
  * session's per-(session, sfDir) cache entries ([[SparkEntry.clearCaches]])
  * without breaking the next session — the TrieMaps key on the session, so
  * a leak here pins stopped sessions (and their cached DataFrames)
  * forever, and a stale survivor could hand the next session plans bound
  * to dead state. Sessions are cycled with `newSession()` (same
  * SparkContext, distinct SparkSession — exactly the identity the caches
  * key on) so the suite's shared context stays alive. */
class CacheLifecycleSpec extends AnyFunSuite with SparkTest {

  test("clearCaches evicts only the cycled session; the next session re-answers identically") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()

    // session 1 warms the full index surface (session-cached + disk) and
    // answers a query that rides the caches
    SparkEntry.warmIndexes(s1, Sf0001)
    assert(SparkEntry.cachedEntryCount(s1) > 0,
      "warmIndexes must populate the per-session caches")
    val r1 = SparkEntry.queries("q_hybrid")(s1, Sf0001).collect().toSeq
    val idx1 = SparkEntry.queries("q_bm25_idx")(s1, Sf0001).collect().toSeq

    // session 2 builds its own entries BEFORE session 1 is torn down —
    // eviction must be per-session, not a global clear
    val r2warm = SparkEntry.queries("q_hybrid")(s2, Sf0001).collect().toSeq
    val before2 = SparkEntry.cachedEntryCount(s2)
    assert(before2 > 0)

    SparkEntry.clearCaches(s1)
    assert(SparkEntry.cachedEntryCount(s1) === 0,
      "every TrieMap must drop the cycled session's entries")
    assert(SparkEntry.cachedEntryCount(s2) === before2,
      "clearCaches(s1) must not touch another live session's entries")

    // the surviving session still answers, identically — including the
    // DISK-index query, whose tmp-path artifacts the cycle must not break
    assert(SparkEntry.queries("q_hybrid")(s2, Sf0001).collect().toSeq === r1)
    assert(SparkEntry.queries("q_bm25_idx")(s2, Sf0001).collect().toSeq === idx1)
    assert(r2warm === r1)

    // and a FRESH post-cycle session rebuilds from zero to the same answers
    val s3 = spark.newSession()
    assert(SparkEntry.cachedEntryCount(s3) === 0)
    assert(SparkEntry.queries("q_hybrid")(s3, Sf0001).collect().toSeq === r1)
    assert(SparkEntry.cachedEntryCount(s3) > 0)

    SparkEntry.clearCaches(s2)
    SparkEntry.clearCaches(s3)
    assert(SparkEntry.cachedEntryCount(s2) === 0)
    assert(SparkEntry.cachedEntryCount(s3) === 0)
  }
}
