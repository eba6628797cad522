package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Abs, And, Cast, Divide, Expression,
  ExpressionInfo, GreaterThanOrEqual, Greatest, Length, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.blocking.MinhashBandKeysExpr
import graft.sim.{JaroWinklerSimExpr, LevSimExpr, TokenJaccardExpr}

/** Library packaging for `spark.sql.extensions=graft.plans.GraftExtensions`:
  * registers the native expressions as SQL functions and injects the
  * Levenshtein length-bound prefilter rule — the one place the engine
  * needs a custom `Rule[LogicalPlan]` (everything else composes from
  * built-ins; SURVEY §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")
    ext.injectFunction((FunctionIdentifier("lev_sim"),
      info("lev_sim", "Levenshtein similarity in [0,1]"),
      (es: Seq[Expression]) => LevSimExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "Jaro-Winkler similarity (reference algorithm)"),
      (es: Seq[Expression]) => JaroWinklerSimExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("token_jaccard"),
      info("token_jaccard", "token-set Jaccard similarity"),
      (es: Seq[Expression]) => TokenJaccardExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("minhash_band_keys"),
      info("minhash_band_keys", "MinHash LSH band keys (native kernel)"),
      (es: Seq[Expression]) => MinhashBandKeysExpr(es(0))))
    ext.injectOptimizerRule(_ => LevSimLengthPrefilter)
  }
}

/** Rewrites `lev_sim(a, b) >= t` filters to short-circuit on the provable
  * length bound before running the O(|a|·|b|) kernel:
  *
  *   levDist(a, b) >= |len(a) - len(b)|
  *   ⇒ levSim = 1 - dist/max(len) <= 1 - |la - lb| / max(la, lb)
  *   ⇒ if that bound < t, the kernel cannot reach t — skip it.
  *
  * The added conjunct is O(1) (two lengths) and codegen keeps `&&`
  * short-circuit order, so length-mismatched pairs never enter the DP.
  * Semantics are unchanged: the bound is implied by the predicate. On a
  * threshold-0.9 self-join over names of mixed length this removes the
  * kernel for every pair whose lengths differ by >10% — the common case
  * in near-dup sweeps.
  */
object LevSimLengthPrefilter extends Rule[LogicalPlan] {

  private def bound(a: Expression, b: Expression): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    // 1 - |la-lb| / greatest(la, lb); greatest >= 1 because lev_sim(a,b)
    // with an empty side is 0 and can only pass t <= 0 (bound still valid:
    // the guard is >= comparison on a NaN-free expression when both empty
    // -> 0/0 avoided by greatest(..., 1.0))
    Subtract(Literal(1.0),
      Divide(Abs(Subtract(la, lb)), Greatest(Seq(la, lb, Literal(1.0)))))
  }

  private def rewrite(cond: Expression): Expression = cond transformUp {
    case cmp @ GreaterThanOrEqual(ls: LevSimExpr, t: Literal)
        if t.dataType == DoubleType =>
      And(GreaterThanOrEqual(bound(ls.left, ls.right), t), cmp)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child)
        if cond.exists {
          case GreaterThanOrEqual(_: LevSimExpr, _: Literal) => true
          case _ => false
        } && !cond.exists { // idempotence: don't re-add the bound
          case GreaterThanOrEqual(s: Subtract, _) => s.left == Literal(1.0)
          case _ => false
        } =>
      Filter(rewrite(cond), child)
  }
}
