package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, DenseRank, Expression, Literal, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst extension surface (SURVEY §7.4 decision record): every
  * operator in this engine is expressible with built-in plans, so the
  * one custom `Rule[LogicalPlan]` we ship is the kind a 100 TB
  * platform team actually deploys — a SAFETY LINT, not a rewrite.
  *
  * [[ScanGuardRule]] fails a query at optimization time when it
  * contains a join with NO equi component (cross product or pure
  * theta join — the shapes that execute as CartesianProduct /
  * BroadcastNestedLoopJoin) whose BOTH sides exceed a size budget.
  * On a cluster, that plan shape is the difference between a job and
  * an outage: O(|L|·|R|) row visits that no amount of parallelism
  * absorbs. Catching it at plan time costs nothing; catching it at
  * runtime costs the cluster. Deliberately-small cross joins (the
  * audit-scalar `crossJoin(broadcast(agg))` pattern used across this
  * repo, TPC-H-style dim×dim products) pass untouched because at
  * least one side sits far under the budget.
  *
  * The rule only ever THROWS — it returns the plan unchanged, so it
  * cannot alter results (the property that makes a lint safe to
  * inject globally). Budget: `graft.scanGuard.maxNonEquiBytes` SQL
  * conf (default 1 GiB per side at the default; sizes come from
  * Catalyst stats — file sizes at the leaves, propagated estimates
  * above).
  *
  * Wiring: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)` on the builder). Tested
  * rule-level in ExtensionSpec — one JVM has one SparkContext, and
  * extensions bind at session construction, so the spec drives the
  * rule against real optimized plans directly.
  */
object ScanGuardRule extends Rule[LogicalPlan] {

  val ConfKey = "graft.scanGuard.maxNonEquiBytes"
  val DefaultMaxBytes: Long = 1L << 30 // 1 GiB per side

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maxBytes = conf.getConfString(ConfKey, DefaultMaxBytes.toString).toLong
    plan.foreach {
      case j @ Join(left, right, _, _, _) =>
        val equi = ExtractEquiJoinKeys.unapply(j).exists(_._2.nonEmpty)
        if (!equi) {
          val l = left.stats.sizeInBytes
          val r = right.stats.sizeInBytes
          if (l > maxBytes && r > maxBytes) {
            throw new IllegalStateException(
              s"ScanGuard: non-equi join (${j.joinType}) with both sides over " +
                s"$maxBytes bytes (left=$l, right=$r) would execute as a " +
                "nested-loop/cartesian product — add an equi component, " +
                s"broadcastable side, or raise $ConfKey")
          }
        }
      case _ => ()
    }
    plan
  }
}

/** The second plan lint: a window function with an EMPTY partitionBy
  * funnels the ENTIRE input through one task — Spark plans it as a
  * single-partition sort (`Exchange SinglePartition` under the
  * `Window`), so at 100 TB one executor sorts 100 TB while 999 idle.
  * The repo's own operators were designed around this shape
  * (`llm_packing` / `llm_shuffle` use a distributed prefix-sum instead
  * of `row_number() OVER ()`); the lint makes the discipline
  * mechanical.
  *
  * Fails at plan time when a [[Window]] node has no partition
  * expressions and its child's estimated size exceeds
  * `graft.scanGuard.maxGlobalWindowBytes` (default 1 GiB). Small
  * inputs pass — a global window over a bounded aggregate or a
  * test-scale fixture build is legitimate (ntile over 60k rows), and
  * exactly that size test keeps the whole 180-key inventory
  * lint-clean. Like [[ScanGuardRule]], it only ever throws — never
  * rewrites. */
object GlobalWindowGuardRule extends Rule[LogicalPlan] {

  val ConfKey = "graft.scanGuard.maxGlobalWindowBytes"
  val DefaultMaxBytes: Long = 1L << 30 // 1 GiB

  /** Attributes of `w`'s rank-family window expressions (row_number /
    * rank / dense_rank) — the functions Spark's InferWindowGroupLimit
    * can push a limit through. */
  private def rankAttrs(w: Window): Seq[Attribute] = w.windowExpressions.collect {
    case a @ Alias(WindowExpression(_: RowNumber | _: Rank | _: DenseRank, _), _) =>
      a.toAttribute
  }

  /** The tightest LITERAL bound `cond` places on one of `ranks`
    * (`rk <= k`, `rk < k`, `k >= rk`…) anywhere in its conjunction —
    * the shape Spark's InferWindowGroupLimit rewrites. Returns the
    * EFFECTIVE limit (so `rk < k` yields k−1), because the exemption
    * below must compare it against Spark's rewrite threshold: the
    * rewrite only fires for `0 < limit <= spark.sql.window.group.
    * limit.threshold`, so a filter like `rk <= 100000` (or any rank
    * filter in a session with the threshold lowered or set to −1)
    * still executes the full single-task global sort and must NOT be
    * exempted on shape alone (r10, per advisor). */
  private def rankBound(cond: Expression, ranks: Seq[Attribute]): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
    def isRank(e: Expression) = e match {
      case a: Attribute => ranks.exists(_.exprId == a.exprId)
      case _ => false
    }
    def lit(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case i: java.lang.Long    => Some(i.longValue)
      case i: java.lang.Short   => Some(i.longValue)
      case i: java.lang.Byte    => Some(i.longValue)
      case _ => None
    }
    cond match {
      case And(l, r) =>
        (rankBound(l, ranks), rankBound(r, ranks)) match {
          case (Some(a), Some(b)) => Some(math.min(a, b))
          case (a, b) => a.orElse(b)
        }
      case LessThan(a, l: Literal) if isRank(a) => lit(l).map(_ - 1)
      case LessThanOrEqual(a, l: Literal) if isRank(a) => lit(l)
      case EqualTo(a, l: Literal) if isRank(a) => lit(l)
      // literal-first mirror of `rk = k` (r11, per advisor). The other
      // literal-first spellings the advisor flagged — `k < rk`,
      // `k <= rk` — are LOWER bounds on the rank and must keep
      // yielding None: only upper bounds make the window a bounded
      // top-k.
      case EqualTo(l: Literal, a) if isRank(a) => lit(l)
      case GreaterThan(l: Literal, a) if isRank(a) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l: Literal, a) if isRank(a) => lit(l)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maxBytes = conf.getConfString(ConfKey, DefaultMaxBytes.toString).toLong
    // RANK-LIMITED global windows are exempt (r9, found wiring the
    // guard into the shipped sessions): `Filter(rank <= k, Window)` is
    // exactly the shape Spark's InferWindowGroupLimit executes as a
    // per-partition top-k BEFORE the single-partition merge — the one
    // task sees #partitions·k rows, not the input (llm_span_dedup's
    // global top-40 is this shape at every SF). Recognized both
    // before the rewrite (Filter over Window, Project-tolerated) and
    // after (a WindowGroupLimit node under the Window).
    // The shape exemption alone is NOT enough: Spark only rewrites to
    // WindowGroupLimit when the literal limit is within
    // spark.sql.window.group.limit.threshold (default 1000; -1
    // disables the rewrite entirely). A rank filter with a huge bound
    // — or ANY bound when the threshold is -1 — still runs the full
    // single-task global sort, so it must trip the guard.
    val rewriteThreshold: Long =
      conf.getConfString("spark.sql.window.group.limit.threshold", "1000").toLong
    def withinThreshold(bound: Option[Long]): Boolean =
      rewriteThreshold != -1L && bound.exists(b => b > 0L && b <= rewriteThreshold)
    val exempt = plan.collect {
      case Filter(cond, w: Window)
          if w.partitionSpec.isEmpty && withinThreshold(rankBound(cond, rankAttrs(w))) => w
      case Filter(cond, Project(_, w: Window))
          if w.partitionSpec.isEmpty && withinThreshold(rankBound(cond, rankAttrs(w))) => w
      case w @ Window(_, _, _, _: WindowGroupLimit, _)
          if w.partitionSpec.isEmpty => w
    }.toSet
    plan.foreach {
      case w @ Window(_, partitionSpec, _, child, _)
          if partitionSpec.isEmpty && !exempt.contains(w) =>
        val sz = child.stats.sizeInBytes
        if (sz > maxBytes) {
          throw new IllegalStateException(
            s"ScanGuard: window with empty partitionBy over ~$sz bytes " +
              "would sort the whole input in ONE task (Exchange " +
              "SinglePartition) — partition the window, pre-aggregate, " +
              "or use a distributed prefix-sum (see llm_packing); " +
              s"raise $ConfKey only for genuinely bounded inputs")
        }
      case _ => ()
    }
    plan
  }
}

/** `spark.sql.extensions` entry point registering [[ScanGuardRule]]
  * and [[GlobalWindowGuardRule]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ScanGuardRule)
    ext.injectOptimizerRule(_ => GlobalWindowGuardRule)
  }
}
