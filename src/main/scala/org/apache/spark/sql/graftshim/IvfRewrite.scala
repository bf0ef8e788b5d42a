package org.apache.spark.sql.graftshim

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, Literal, SortOrder, Descending}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LocalLimit, GlobalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftshim.VectorExpressions.DotProduct

/** Logical-plan rewrite: exact vector top-k → IVF probe (SURVEY §4.2's
  * "optional perf-only custom piece (b)").
  *
  * A user registers an IVF index for a parquet table ([[IvfRewrite.register]])
  * and keeps writing the EXACT query — `orderBy(score.desc).limit(k)` with
  * the score built on [[VectorExpressions.DotProduct]] (what
  * `graft.search.VectorSearch.knn` emits). When the optimizer sees
  *
  *   GlobalLimit k → LocalLimit k → Sort(score containing
  *     graft_dot(embCol, queryVecLiteral) DESC) → … → scan(registered path)
  *
  * it narrows the scan with a LEFT-SEMI join against the index's
  * assignments, restricted to the clusters nearest the (plan-extracted)
  * query vector — candidate pool ≥ the registered numCandidates. The sort
  * and limit stay in place, so results re-rank exactly over the probed
  * candidates: this trades recall (governed by numCandidates) for scan
  * volume, exactly like the reference's `$vectorSearch` ANN probe
  * (`backend/api.py:168-180`).
  *
  * Install per-session with [[IvfRewrite.install]] (experimental
  * optimizations) or cluster-wide via
  * `spark.sql.extensions=org.apache.spark.sql.graftshim.GraftSparkExtensions`.
  */
object IvfRewrite {

  /** Marker alias for the injected member-id column; also the idempotency
    * guard (a plan that already contains it is not rewritten again). */
  val MemberCol = "__ivf_member_id"

  /** `filterSelectivity`: the MEASURED selectivity of predicates over this
    * table (a wave-time statistic, like the covering-depth sidecars) —
    * when present, a FILTERED top-k consults [[graft.search.AnnPlanner]]
    * before rewriting and leaves the exact scan in place when the
    * filtered scan wins (the break-even `q_ann_plan_filtered` proves,
    * reachable from the plain SQL/DataFrame surface only through this
    * rule). Absent, filtered queries rewrite as before (unknown
    * selectivity — the registered depth is the user's explicit recall
    * choice). */
  final case class Registered(
      assignments: DataFrame,
      centroids: Map[Int, Array[Double]],
      sizes: Map[Int, Long],
      idCol: String,
      numCandidates: Int,
      filterSelectivity: Option[Double] = None,
      stats: Option[graft.index.IndexStore.CollectedFieldStats] = None)

  /** parquet-path → registered index (session-global, driver-side). */
  private val registry = TrieMap.empty[String, Registered]

  /** `stats`: the table's COLLECTED field-statistics catalog
    * ([[graft.index.IndexStore.collectStats]] over a wave-fresh
    * [[graft.index.IndexStore.loadStats]]) — when present, the rule
    * estimates a filtered top-k's selectivity from the predicate itself
    * (equality conjuncts from value counts, range conjuncts from the
    * declared fixed-boundary histograms) instead of needing one scalar
    * `filterSelectivity` measured for one specific predicate. Collected
    * at registration time, so the optimizer rule never runs a Spark job
    * to plan. An explicit `filterSelectivity` overrides the estimate. */
  def register(path: String, assignments: DataFrame,
      centroids: Map[Int, Array[Double]], sizes: Map[Int, Long],
      idCol: String, numCandidates: Int,
      filterSelectivity: Option[Double] = None,
      stats: Option[graft.index.IndexStore.CollectedFieldStats] = None)
      : Unit =
    registry.put(normalize(path),
      Registered(assignments, centroids, sizes, idCol, numCandidates,
        filterSelectivity, stats))

  def unregister(path: String): Unit = registry.remove(normalize(path))
  def clear(): Unit = registry.clear()

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Add the rule to this session's experimental optimizations (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[IvfRewriteRule]))
      spark.experimental.extraOptimizations = existing :+ new IvfRewriteRule
  }

  /** Nearest-centroid probe (same ranking as [[graft.index.Ivf.probeSet]]). */
  private[graftshim] def probeSet(r: Registered, queryVec: Array[Double]): Seq[Int] = {
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - queryVec(i); s += d * d; i += 1 }
      s
    }
    val ranked = r.centroids.toSeq.map { case (cid, c) => (dist2(c), cid) }
      .sortBy { case (d, cid) => (d, cid) }
    var pool = 0L
    val picked = Seq.newBuilder[Int]
    val it = ranked.iterator
    while (pool < r.numCandidates && it.hasNext) {
      val (_, cid) = it.next()
      picked += cid
      pool += r.sizes.getOrElse(cid, 0L)
    }
    picked.result()
  }

  private[graftshim] def lookup(plan: LogicalPlan): Option[(LogicalRelation, Registered)] =
    plan.collectFirst {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if fs.location.rootPaths.nonEmpty &&
            registry.contains(normalize(fs.location.rootPaths.head.toString)) =>
        (lr, registry(normalize(fs.location.rootPaths.head.toString)))
    }
}

/** The optimizer rule (see [[IvfRewrite]]). Runs post-main-optimizer, so
  * the query vector literal is already constant-folded. */
class IvfRewriteRule extends Rule[LogicalPlan] {
  import IvfRewrite._

  /** Sort keys reference Project aliases (`…orderBy(col("score").desc)`),
    * so expand attributes through the subtree's Alias definitions until
    * the underlying expression tree is visible. */
  private def expand(e: Expression, aliases: Map[Long, Expression], depth: Int = 0): Expression =
    if (depth > 8) e
    else e.transformUp {
      case ar: AttributeReference if aliases.contains(ar.exprId.id) =>
        expand(aliases(ar.exprId.id), aliases, depth + 1)
    }

  private def aliasMap(plan: LogicalPlan): Map[Long, Expression] =
    plan.collect { case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
      p.projectList.collect { case a: Alias => a.exprId.id -> a.child }
    }.flatten.toMap

  private def queryVecOf(order: Seq[SortOrder],
      aliases: Map[Long, Expression]): Option[(Expression, Array[Double])] =
    order.headOption.filter(_.direction == Descending)
      .flatMap(o => expand(o.child, aliases).collectFirst {
        // dot(embCol, queryLiteral) — dot(emb, emb) has no Literal side
        case DotProduct(a, Literal(v: ArrayData, _)) if a.references.nonEmpty =>
          (a, v.toDoubleArray)
        case DotProduct(Literal(v: ArrayData, _), a) if a.references.nonEmpty =>
          (a, v.toDoubleArray)
      })

  private def alreadyRewritten(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case j: Join if j.right.output.exists(_.name == MemberCol) => j
    }.nonEmpty

  /** The Sort feeding a limit may be separated from it by pushed-down
    * Projects (e.g. a trailing `.select(...)` collapses into the plan) —
    * peel them and rebuild around the rewritten Sort. */
  private def peelToSort(p: LogicalPlan): Option[(Sort, LogicalPlan => LogicalPlan)] = p match {
    case s @ Sort(_, true, _, _) => Some((s, identity))
    case proj: org.apache.spark.sql.catalyst.plans.logical.Project =>
      peelToSort(proj.child).map { case (s, rebuild) =>
        (s, (inner: LogicalPlan) => proj.withNewChildren(Seq(rebuild(inner))))
      }
    case _ => None
  }

  /** The FILTERED-ANN break-even, consulted at plan time (round-9 verdict
    * item 6): a top-k whose subtree filters the registered relation is
    * rewritten only when [[graft.search.AnnPlanner.planKnn]] — priced
    * with the registration's own depth (numCandidates/n) and the
    * registered MEASURED filter selectivity — still picks the probe. A
    * selective-enough filter flips the winner to the filtered exact scan
    * (which pushes the predicate into ONE scan, where the probe pays full
    * coarse depth and filters after the member join), so the rule leaves
    * the plan alone. Unfiltered queries, and filtered queries with no
    * measured selectivity registered, rewrite unconditionally as before —
    * the registered depth is the user's explicit recall/cost choice. */
  /** Estimate a pushed filter's selectivity from the registered
    * COLLECTED stats catalog — pure map lookups, no Spark job (the rule
    * runs inside the optimizer). Equality conjuncts on cataloged fields
    * multiply their exact value-count selectivities; range conjuncts
    * (>=, >, <, <= against integer literals) on histogram fields
    * multiply the fixed-boundary estimate; conjuncts the catalog cannot
    * price contribute factor 1 (an OVER-estimate of selectivity, which
    * biases toward the probe — the rule's prior default for unknown
    * filters). None when no conjunct was priceable at all. */
  private def estimateSelectivity(cond: Expression,
      st: graft.index.IndexStore.CollectedFieldStats): Option[Double] = {
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThan,
      GreaterThanOrEqual, LessThan, LessThanOrEqual}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    def litString(l: Literal): String = String.valueOf(l.value)
    def litLong(l: Literal): Option[Long] = l.value match {
      case i: Int   => Some(i.toLong)
      case j: Long  => Some(j)
      case s: Short => Some(s.toLong)
      case _        => None
    }
    var factor = 1.0
    var priced = false
    // accumulated [lo, hi) bounds per histogram field
    val bounds = scala.collection.mutable.Map
      .empty[String, (Option[Long], Option[Long])]
    def tightenLo(f: String, v: Long): Unit = {
      val (lo, hi) = bounds.getOrElse(f, (None, None))
      bounds(f) = (Some(lo.fold(v)(math.max(_, v))), hi)
    }
    def tightenHi(f: String, v: Long): Unit = {
      val (lo, hi) = bounds.getOrElse(f, (None, None))
      bounds(f) = (lo, Some(hi.fold(v)(math.min(_, v))))
    }
    conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal)
          if st.counts.contains(a.name) =>
        factor *= st.eqSelectivity(a.name, litString(l)); priced = true
      case EqualTo(l: Literal, a: AttributeReference)
          if st.counts.contains(a.name) =>
        factor *= st.eqSelectivity(a.name, litString(l)); priced = true
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(tightenLo(a.name, _))
      case GreaterThan(a: AttributeReference, l: Literal)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(v => tightenLo(a.name, v + 1))
      case LessThan(a: AttributeReference, l: Literal)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(tightenHi(a.name, _))
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(v => tightenHi(a.name, v + 1))
      // literal-first comparisons flip: lit < a  ⇔  a > lit, etc.
      case LessThan(l: Literal, a: AttributeReference)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(v => tightenLo(a.name, v + 1))
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(tightenLo(a.name, _))
      case GreaterThan(l: Literal, a: AttributeReference)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(tightenHi(a.name, _))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if st.hists.contains(a.name) =>
        litLong(l).foreach(v => tightenHi(a.name, v + 1))
      case _ => () // unpriceable conjunct: factor 1
    }
    for ((f, (lo, hi)) <- bounds) {
      val h = st.hists(f)
      st.rangeSelectivity(f, lo.getOrElse(h.lo), hi.getOrElse(h.hi))
        .foreach { s => factor *= s; priced = true }
    }
    if (priced) Some(factor) else None
  }

  private def rewriteBeatsFilteredScan(child: LogicalPlan,
      relation: LogicalRelation, reg: Registered,
      limitExpr: Expression): Boolean = {
    val filterNode = child.collectFirst {
      case f: Filter if f.collectFirst {
        case lr: LogicalRelation if lr eq relation => lr }.nonEmpty => f
    }
    if (filterNode.isEmpty) true
    else reg.filterSelectivity.orElse(reg.stats.flatMap(st =>
        estimateSelectivity(filterNode.get.condition, st))) match {
      case None => true
      case Some(sel) =>
        val n = reg.sizes.values.sum
        val dim = reg.centroids.headOption.map(_._2.length).getOrElse(0)
        if (n <= 0 || dim <= 0) true
        else {
          val k = limitExpr match {
            case Literal(v: Int, _) => math.max(1, v)
            case _ => 10
          }
          val frac = math.min(1.0,
            math.max(reg.numCandidates.toDouble / n, 1.0 / n))
          // an estimated selectivity of exactly 0 (unseen value) still
          // prices at least one row — planKnn's domain is (0, 1]
          val clamped = math.min(1.0, math.max(sel, 1.0 / n))
          graft.search.AnnPlanner.planKnn(n, dim, k,
            assets = graft.search.AnnPlanner.AnnAssets(
              ivfClusters = reg.centroids.size),
            depths = graft.search.AnnPlanner.AnnDepths(
              ivfMassFraction = frac),
            filterSelectivity = Some(clamped)).path == "ivfProbe"
        }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(_, ll: LocalLimit) if peelToSort(ll.child).nonEmpty =>
      val (sort, rebuild) = peelToSort(ll.child).get
      val (order, child) = (sort.order, sort.child)
      val aliases = aliasMap(child)
      val rewritten = for {
        (embExpr, qvec) <- queryVecOf(order, aliases)
        if !alreadyRewritten(child)
        (relation, reg) <- lookup(child)
        if rewriteBeatsFilteredScan(child, relation, reg, gl.limitExpr)
        // the scored column must trace back to the registered relation
        if expand(embExpr, aliases).references.exists(relation.outputSet.contains)
        idAttr <- relation.output.find(_.name == reg.idCol)
      } yield {
        val probe = probeSet(reg, qvec)
        val memberPlan = {
          import org.apache.spark.sql.functions.col
          reg.assignments
            .where(col("cluster").isin(probe: _*))
            .select(col("id").as(MemberCol))
            .queryExecution.analyzed
        }
        val memberAttr = memberPlan.output.head
        val narrowedChild = child.transformUp {
          case lr: LogicalRelation if lr eq relation =>
            // the member subtree may share relation exprIds with the left
            // side (in-memory index built from the same scan) — re-alias
            // the conflict like the analyzer does for self-joins, or the
            // semi join silently stops restricting
            org.apache.spark.sql.catalyst.analysis.DeduplicateRelations(
              Join(lr, memberPlan, LeftSemi,
                Some(EqualTo(idAttr, memberAttr)), JoinHint.NONE))
        }
        gl.withNewChildren(Seq(
          ll.withNewChildren(Seq(
            rebuild(sort.copy(child = narrowedChild))))))
      }
      rewritten.getOrElse(gl)
  }
}

/** `spark.sql.extensions` entry point: the IVF rewrite rule plus the
  * graft SQL functions. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => new IvfRewriteRule)
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          VectorExpressions.getClass.getCanonicalName, name),
        builder))
    }
  }
}
