package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Generator, HigherOrderFunction, LambdaFunction, Literal, NamedExpression, NamedLambdaVariable, RegExpExtract, RegExpReplace, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Hoist loop-invariant heavy subexpressions out of generator expressions
  * into projections below the Generate node.
  *
  * Why (measured, PLANS.md round 8): an
  * `explode(positionalNgrams(asciiTokens(text)))` written as one expression
  * benched at 12.0 s at sf0.1, vs 0.75 s with the token array materialized
  * first — 16×. The cost is NOT the Generate itself (the generator input
  * is evaluated once per input row): higher-order-function LAMBDAS
  * re-evaluate every subtree they reference once per array ELEMENT, so a
  * tokenizer chain referenced inside `transform(sequence(…), i =>
  * slice(toks, i, n))` re-runs per n-gram instead of per document.
  *
  * The rewrite hoists BOTTOM-UP: every deterministic subtree that is
  * "heavy" (contains a higher-order function, a regexp, or a split — the
  * string-pipeline markers measured above) and has no free lambda
  * variables is replaced by an attribute, innermost first, each tier
  * becoming one projection layer below the Generate (stacked, since a
  * hoisted tier may reference the previous tier's column). After the
  * rewrite a lambda body references plain attributes, so per-element
  * evaluation is a column lookup. Identical subtrees collapse to one
  * column (semantic dedup); the new columns are registered in
  * `unrequiredChildIndex`, so the Generate's output schema is unchanged
  * and downstream pruning is unaffected.
  *
  * Install via `GraftSqlExtensions` (session build time) or
  * `GraftSqlExtensions.installOptimizations(spark)` (live session). BOTH
  * paths place the rule AFTER the operator-optimization fixed-point batch
  * — extensions use the pre-CBO seam, `extraOptimizations` run in the
  * "User Provided Optimizers" batch — because inside that batch
  * `CollapseProject` inlines single-use aliases back into lambda bodies
  * and would silently undo the hoist (`injectOptimizerRule` lands there;
  * do not use it for this rule). Idempotent: hoisted tiers are
  * attributes, which never match again.
  */
object MaterializeGeneratorInput extends Rule[LogicalPlan] {

  private def heavy(e: Expression): Boolean = e.exists {
    case _: HigherOrderFunction | _: RegExpReplace | _: RegExpExtract |
        _: StringSplit => true
    case _ => false
  }

  /** Lambda variables referenced by `e` but bound outside it. */
  private def freeLambdaVars(e: Expression): Set[Long] = e match {
    case l: LambdaFunction =>
      freeLambdaVars(l.function) --
        l.arguments.collect { case v: NamedLambdaVariable => v.exprId.id }
    case v: NamedLambdaVariable => Set(v.exprId.id)
    case _ => e.children.flatMap(freeLambdaVars).toSet
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case g @ Generate(gen, unreq, outer, qual, gOut, child) =>
      val tiers = mutable.ArrayBuffer.empty[Alias]
      def hoistable(e: Expression): Boolean = e match {
        case _: Attribute | _: Literal => false
        case _ =>
          // an outer tier may reference the attributes of tiers already
          // hoisted in THIS pass (bottom-up rewrite replaces inner tiers
          // first) — without this the chain hoists one tier per fixed-point
          // iteration, re-counting names and stacking redundant layers
          val avail = org.apache.spark.sql.catalyst.expressions.AttributeSet(
            child.output ++ tiers.map(_.toAttribute))
          e.deterministic && heavy(e) &&
          e.references.subsetOf(avail) &&
          freeLambdaVars(e).isEmpty
      }
      def rewrite(e: Expression): Expression = {
        val r = e.mapChildren(rewrite)
        if (hoistable(r)) {
          val alias = tiers.find(_.child.semanticEquals(r)).getOrElse {
            val a = Alias(r, s"__graft_gen_hoist_${tiers.length}")()
            tiers += a
            a
          }
          alias.toAttribute
        } else r
      }
      val newGen = gen.mapChildren(rewrite).asInstanceOf[Generator]
      if (tiers.isEmpty) g
      else {
        // one projection layer per tier: tier i may reference tier j < i,
        // and a Project cannot reference its own aliases
        val stacked = tiers.foldLeft(child: LogicalPlan) { (p, a) =>
          Project(p.output :+ a, p)
        }
        val newUnreq = unreq ++ (child.output.length until stacked.output.length)
        Generate(newGen, newUnreq, outer, qual, gOut, stacked)
      }
  }
}
