package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (injected by [[GraftExtensions]]): prefix every
  * `levenshtein(a, b) <= k` filter with the free length bound
  * `abs(length(a) - length(b)) <= k` — edit distance can never be less
  * than the length difference, so the guard rejects no true match, and
  * `And`'s short-circuit means the O(|a|·|b|) dynamic program only runs
  * on rows whose lengths are even compatible. On blocked/windowed fuzzy
  * matching (the [[graft.llmops.FuzzyMatch]] shapes) most candidate
  * pairs differ wildly in length — they now fail two codegen'd `length`
  * calls instead of filling an edit matrix.
  *
  * Result-identical by construction: the guard is implied by the
  * predicate it guards (lev ≥ |len(a) − len(b)| always), and its
  * null-semantics match (`null` operands make both sides null, `And`
  * stays null). Scope: `<=` / `<` comparisons with the levenshtein call
  * on the left (possibly under a numeric cast — the Column API's
  * `.cast("long")` survives pushdown) and a foldable bound; the
  * three-argument thresholded form already carries its own early-exit
  * and is left alone. Idempotent: a filter already carrying the guard
  * for the same operands is not rewritten again (the optimizer runs
  * rules to fixpoint).
  */
object RewriteLevenshteinBound extends Rule[LogicalPlan] {

  /** levenshtein(a, b), possibly under a numeric cast. */
  private object LevCall {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case Cast(Levenshtein(a, b, None), _, _, _) => Some((a, b))
      case _ => None
    }
  }

  private def lengthGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(
      Cast(Abs(Subtract(Length(a), Length(b))), k.dataType), k)

  /** Detect an existing guard whether or not later rules (SimplifyCasts)
    * have stripped the numeric cast — without this the rule re-adds a
    * guard every optimizer iteration and the batch never converges.
    */
  private def hasGuard(cond: Expression, a: Expression, b: Expression): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => strip(c)
      case x => x
    }
    cond.exists {
      case LessThanOrEqual(g, _) => strip(g) match {
        case Abs(Subtract(Length(x), Length(y), _), _) =>
          x.semanticEquals(a) && y.semanticEquals(b)
        case _ => false
      }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val newCond = cond.transformUp {
        case le @ LessThanOrEqual(LevCall(a, b), k)
            if k.foldable && !hasGuard(cond, a, b) =>
          And(lengthGuard(a, b, k), le)
        case lt @ LessThan(LevCall(a, b), k)
            if k.foldable && !hasGuard(cond, a, b) =>
          // lev < k ⇒ lev <= k certainly ⇒ the <= guard is still implied.
          And(lengthGuard(a, b, k), lt)
      }
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
  }
}
