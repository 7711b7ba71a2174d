package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: an anchored regex filter (the shape every compiled glob
  * takes, glob_utils.py:165-211 → graft.glob.Glob.toRegex) implies a
  * literal-prefix predicate. `RLIKE(name, '^sys\.cpu\.[^.]*$')` becomes
  * `StartsWith(name, 'sys.cpu.') AND RLIKE(...)`: the regex stays
  * authoritative, while the derived StartsWith is a pushable data-source
  * filter — so a raw rlike over a 100 TB catalog/points scan skips row
  * groups by min/max stats instead of evaluating the regex on every row.
  *
  * Semantics-preserving by construction: the prefix is literally implied
  * by the anchored pattern. Installed by
  * [[graft.functions.GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`. */
object RegexPrefixPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // conjunct-level analysis (not transformUp) so the rule is a no-op
      // on its own output — the optimizer's fixed point terminates
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.collect {
        case RLike(attr, Literal(pattern: UTF8String, _)) =>
          literalPrefix(pattern.toString).filter(_.nonEmpty).map { p =>
            StartsWith(attr, Literal(UTF8String.fromString(p),
              org.apache.spark.sql.types.StringType))
          }
      }.flatten.filterNot(sw => conjuncts.exists(_ semanticEquals sw))
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduceLeft(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Longest literal prefix implied by an anchored regex: consume after
    * '^' while characters are plain literals or escaped metacharacters;
    * stop at the first construct that can match variably. Returns None
    * for non-anchored patterns. */
  private[plans] def literalPrefix(regex: String): Option[String] = {
    if (!regex.startsWith("^")) return None
    // A '|' at parenthesis depth 0 makes the whole pattern an alternation
    // ('^ab|cd' ≡ (^ab)|(cd)) — the '^'-anchored branch no longer covers
    // every match, so no prefix can be derived. Bare commas outside braces
    // in a glob compile to exactly this shape (glob_utils.py:203-207).
    if (hasTopLevelAlternation(regex)) return None
    val sb = new StringBuilder
    var i = 1
    val n = regex.length
    while (i < n) {
      val c = regex(i)
      c match {
        case '\\' if i + 1 < n =>
          val e = regex(i + 1)
          // escaped metachar → literal char; escape classes (\d, \w...)
          // are variable, stop there
          if ("\\.[]{}()<>*+-=!?^$|".contains(e)) { sb += e; i += 2 }
          else return Some(sb.toString)
        case '$' if i == n - 1 => return Some(sb.toString)
        case '.' | '[' | '(' | '{' | '*' | '+' | '?' | '|' | '^' | '$' =>
          // a quantifier makes the PREVIOUS char optional — drop it
          if ((c == '*' || c == '+' || c == '?' || c == '{') && sb.nonEmpty)
            sb.setLength(sb.length - 1)
          return Some(sb.toString)
        case ch => sb += ch; i += 1
      }
    }
    Some(sb.toString)
  }

  /** True if the pattern contains an unescaped '|' at parenthesis depth 0
    * (outside character classes) — i.e. the regex as a whole is an
    * alternation and the leading '^' anchors only its first branch. */
  private[plans] def hasTopLevelAlternation(regex: String): Boolean = {
    var i = 0
    var depth = 0
    var inClass = false
    val n = regex.length
    while (i < n) {
      regex(i) match {
        case '\\' => i += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass => depth += 1
        case ')' if !inClass && depth > 0 => depth -= 1
        case '|' if !inClass && depth == 0 => return true
        case _ =>
      }
      i += 1
    }
    false
  }
}
