package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite whole-partition COUNT windows into the
  * aggregate + null-safe equi-join the engine's df rule prescribes.
  *
  *   count(...) OVER (PARTITION BY k)        -- no ORDER BY, whole frame
  *     ==>
  *   child JOIN (SELECT k, count(...) GROUP BY k) ON child.k <=> agg.k
  *
  * WHY: a partition-only count window has no map-side combine — every
  * row of a hot key ships to, and sits in, ONE window partition (the
  * tfidf/ngram-df hazard documented in CLAUDE.md and SCALING.md, fixed
  * by hand in those operators). The aggregate form partial-aggregates
  * each key to one row per map partition before the exchange, and the
  * join back is an equi-join AQE can skew-split or convert to
  * broadcast — strictly better at every scale. This rule is that fix
  * as a PLAN REWRITE, so pure-SQL clients (who can't restructure their
  * query by hand) get it from configuration alone.
  *
  * Semantics are exact, not approximate:
  *   - the join is null-safe (`<=>`): a NULL partition key forms one
  *     window partition AND one GROUP BY group, and `<=>` matches them
  *     where `=` would drop the rows;
  *   - every input row joins exactly its own group (inner join is
  *     total: each row's key IS a group key), so cardinality is
  *     unchanged;
  *   - count(expr)'s non-null semantics carry over verbatim — the
  *     aggregate evaluates the same Count over the same rows;
  *   - the rewritten attribute keeps the ORIGINAL exprId, so every
  *     downstream reference stays resolved.
  *
  * Conservative guards: fires only when the window has a non-empty
  * partition spec (grand-total windows over already-aggregated rows
  * are deliberately kept — see Quiet.windowWarn), no ORDER BY, a
  * whole-partition frame, and every window expression in the node is a
  * plain COUNT/SUM/MIN/MAX/AVG (no DISTINCT, no FILTER) over that same
  * spec — the deterministic decomposable aggregates, where
  * f(window partition) == f(GROUP BY group) because both see exactly
  * the same row set. Order-sensitive or nondeterministic functions
  * (collect_list, first) and rank machinery stay windows.
  *
  * Deployment is OPT-IN: injected by graft.functions.GraftExtensions
  * (config-only) or session-locally via
  * `spark.experimental.extraOptimizations` — Verify/Bench sessions do
  * NOT enable it, so the operator suite's hand-shaped plans are
  * untouched. PlanRewriteSpec pins: the Window node disappears, the
  * aggregate partial-combines, and results equal the window form
  * bit for bit (including NULL keys).
  */
object CountWindowToJoin extends Rule[LogicalPlan] {

  private def wholePartition(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  private def safeAgg(f: AggregateFunction): Boolean = f match {
    case _: Count | _: Sum | _: Min | _: Max | _: Average => true
    case _ => false
  }

  private def rewritable(parts: Seq[Expression])(ne: NamedExpression): Boolean =
    ne match {
      case Alias(WindowExpression(
        AggregateExpression(af, _, false, None, _),
        WindowSpecDefinition(p2, Nil, f)), _) =>
        safeAgg(af) && p2 == parts && wholePartition(f)
      case _ => false
    }

  /** The rewrite evaluates `child` on BOTH join sides; a
    * nondeterministic subtree (rand-bucketed keys, uuid columns) would
    * re-roll independently per side — wrong counts and inner-join row
    * loss. Spark's own plan-duplicating rules carry the same guard. */
  private def fullyDeterministic(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case p if p.expressions.exists(e => !e.deterministic) => p
    }.isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w @ Window(wes, parts, Nil, child, _)
        if parts.nonEmpty && wes.nonEmpty && wes.forall(rewritable(parts)) &&
          parts.forall(_.deterministic) && fullyDeterministic(child) =>
      val keyAliases = parts.zipWithIndex.map { case (p, i) =>
        Alias(p, s"__cwj_k$i")()
      }
      val cntAliases = wes.map { case Alias(WindowExpression(agg, _), name) =>
        Alias(agg, s"__cwj_$name")()
      }
      val agg = Aggregate(parts, keyAliases ++ cntAliases, child)
      val cond = parts.zip(keyAliases).map { case (p, k) =>
        EqualNullSafe(p, k.toAttribute)
      }.reduce[Expression](And)
      // The Aggregate subtree is the SAME `child` instance as the left
      // join side — an optimizer-created self-join the analyzer's
      // DeduplicateRelations never saw. Run that rule here so the right
      // subtree's relations (and any conflicting aliases) get fresh
      // exprIds: downstream rules may assume exprId disjointness below
      // a join, and the shared-instance form only survives by the
      // accident of the Aggregate's all-alias output.
      val joined = org.apache.spark.sql.catalyst.analysis.DeduplicateRelations(
        Join(child, agg, Inner, Some(cond), JoinHint.NONE)).asInstanceOf[Join]
      if (joined.left.output != child.output) w // renewal must hit the
      // RIGHT side only (first occurrence wins; left feeds the parent's
      // references) — if an engine change ever flips that, keep the
      // window form rather than emit a plan with rewired output
      else {
        // dedup may renew the right side's alias exprIds — take the
        // count attributes positionally from the renewed output (keys
        // first, counts after, the order the Aggregate was built in)
        val cntAttrs = joined.right.output.drop(keyAliases.length)
        val restored = wes.zip(cntAttrs).map {
          case (orig: Alias, cnt) =>
            Alias(cnt, orig.name)(exprId = orig.exprId,
              qualifier = orig.qualifier)
          case (other, _) => other // unreachable under the guard
        }
        Project(joined.left.output ++ restored, joined)
      }
  }
}
