package graft.glob

/** Graphite metric-name glob language: validation, tokenizer, regex
  * translation, and a per-component AST.
  *
  * Reference: biggraphite/glob_utils.py:39-211 (validate/tokenize/regex) and
  * glob_utils.py:373-657 (component AST parser). Semantics:
  *   `?` any one char; `*` any sequence not crossing a dot; `**` any path
  *   (globstar); `[ab]` / `[!ab]` / `[a-z]` char selectors; `{a,b}` sequence
  *   alternation. Dots inside `{}` groups and unbalanced braces are invalid.
  */
object Glob {

  /** glob_utils.py:39-66 — no dots inside groups, balanced braces. */
  def isValid(glob: String): Boolean = {
    var depth = 0
    var ok = true
    glob.foreach {
      case '{' => depth += 1
      case '}' => depth -= 1; if (depth < 0) ok = false
      case '.' => if (depth > 0) ok = false
      case _ => ()
    }
    ok && depth == 0
  }

  /** Does the component contain any glob syntax?
    * (glob_utils.py:29-36 `_is_graphite_glob`). */
  def isGlobComponent(c: String): Boolean =
    c.exists("*?{}[]".contains(_))

  private val RegexSpecial = "\\.[]{}()<>*+-=!?^$|".toSet

  private def escape(s: String): String =
    s.flatMap(c => if (RegexSpecial(c)) s"\\$c" else c.toString)

  /** Translate a glob to an anchored regex (glob_utils.py:165-211):
    * `*`→`[^.]*`, `**`→`.*`, `?`→`.`, `{a,b}`→`(a|b)`, `[...]` kept.
    * Works identically under Java regex (Spark rlike) and RE2 (DuckDB). */
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    var inCharSel = false
    val n = glob.length
    val lit = new StringBuilder
    def flushLit(): Unit = { sb ++= escape(lit.toString); lit.clear() }
    while (i < n) {
      val c = glob(i)
      c match {
        case '\\' if i + 1 < n => lit += glob(i + 1); i += 1
        case '.' => flushLit(); sb ++= "\\."
        case '?' => flushLit(); sb += '.'
        case '*' =>
          flushLit()
          if (i + 1 < n && glob(i + 1) == '*') { sb ++= ".*"; i += 1 }
          else sb ++= "[^.]*"
        case '[' =>
          flushLit(); inCharSel = true
          if (i + 1 < n && glob(i + 1) == '!') { sb ++= "[^"; i += 1 }
          else sb += '['
        case ']' => flushLit(); inCharSel = false; sb += ']'
        case '-' if inCharSel => flushLit(); sb += '-'
        case '{' => flushLit(); sb += '('
        // a bare comma (outside {}) becomes a TOP-LEVEL '|', same as the
        // reference tokenizer (glob_utils.py:154-155): the pattern turns
        // into a whole-string alternation with per-branch anchoring quirks
        // ('^a|b$'). Predicate generators must treat such globs as
        // regex-only (hasTopLevelAlternation).
        case ',' if !inCharSel => flushLit(); sb += '|'
        case '}' => flushLit(); sb += ')'
        case other => lit += other
      }
      i += 1
    }
    flushLit()
    sb += '$'
    sb.toString
  }

  // ---- Component AST (glob_utils.py:373-657) ----

  sealed trait Part
  final case class Literal(value: String) extends Part
  case object AnyChar extends Part
  case object AnySequence extends Part
  final case class CharIn(values: List[String]) extends Part
  final case class CharNotIn(values: List[String]) extends Part
  final case class SequenceIn(values: List[String]) extends Part

  sealed trait Component
  final case class Parts(parts: List[Part]) extends Component
  case object Globstar extends Component

  /** Parse into per-component part lists. Mirrors GraphiteGlobParser
    * (glob_utils.py:438-657): char selectors keep their value set; `{}`
    * groups expand nested alternation cross-products ("oh{c{d,e,}{a,b}}ah"
    * → SequenceIn of all combinations); groups with a single value collapse
    * into the surrounding literal; groups containing char selectors degrade
    * to AnySequence; `**` splits its component ("a.b**c" → [a][b]⁂[c]);
    * empty components are dropped. */
  def parse(glob: String): List[Component] = {
    if (glob.isEmpty) return Nil
    glob.split("\\.", -1).toList.filter(_.nonEmpty).flatMap(parseComponent)
  }

  private def parseComponent(comp: String): List[Component] = {
    val components = List.newBuilder[Component]
    val parts = List.newBuilder[Part]
    var partsEmpty = true
    val lit = new StringBuilder
    def flush(): Unit =
      if (lit.nonEmpty) { parts += Literal(lit.toString); partsEmpty = false; lit.clear() }
    def add(p: Part): Unit = { flush(); parts += p; partsEmpty = false }
    def commitComponent(): Unit = {
      flush()
      val ps = parts.result()
      if (ps.nonEmpty) components += Parts(ps)
      parts.clear(); partsEmpty = true
    }
    var i = 0
    val n = comp.length
    while (i < n) {
      comp(i) match {
        case '?' => add(AnyChar); i += 1
        case '*' =>
          if (i + 1 < n && comp(i + 1) == '*') {
            // globstar splits the component (glob_utils.py:465-476)
            commitComponent()
            components += Globstar
            i += 2
          } else { add(AnySequence); i += 1 }
        case '[' =>
          val end = findCharSelEnd(comp, i + 1)
          if (end < 0) { lit += '['; i += 1 }
          else {
            var body = comp.substring(i + 1, end)
            val negated = body.startsWith("!")
            if (negated) body = body.drop(1)
            val groups = groupCharSelector(body)
            add(if (negated) CharNotIn(groups) else CharIn(groups))
            i = end + 1
          }
        case '{' =>
          parseGroup(comp, i + 1) match {
            case None => lit += '{'; i += 1
            case Some((values, end, hasCharSel)) =>
              if (hasCharSel) add(AnySequence)
              else if (values.size == 1) lit ++= values.head
              else add(SequenceIn(values.toList.distinct.sorted))
              i = end
          }
        case c => lit += c; i += 1
      }
    }
    commitComponent()
    components.result()
  }

  /** Parse a `{}` group starting just past the '{'. Returns
    * (expanded values, index past '}', sawCharSelector), or None when
    * unterminated (glob_utils.py:536-657). Nested groups multiply out as
    * cross products; commas separate alternatives. */
  private def parseGroup(s: String, from: Int): Option[(Seq[String], Int, Boolean)] = {
    var i = from
    val n = s.length
    var hasCharSel = false
    val values = Seq.newBuilder[String]
    var current = Seq("") // cross-product accumulator for the alternative
    val lit = new StringBuilder
    def flushLit(): Unit =
      if (lit.nonEmpty) { val l = lit.toString; current = current.map(_ + l); lit.clear() }
    while (i < n) {
      s(i) match {
        case '}' =>
          flushLit(); values ++= current
          return Some((values.result(), i + 1, hasCharSel))
        case ',' =>
          flushLit(); values ++= current; current = Seq(""); i += 1
        case '{' =>
          parseGroup(s, i + 1) match {
            case None => lit += '{'; i += 1
            case Some((vs, end, cs)) =>
              flushLit()
              hasCharSel ||= cs
              current = current.flatMap(a => vs.map(a + _))
              i = end
          }
        case '[' | '*' | '?' =>
          // char selectors / wildcards inside groups degrade the whole
          // group to AnySequence (glob_utils.py:527-541)
          hasCharSel = true; lit += s(i); i += 1
        case c => lit += c; i += 1
      }
    }
    None // unterminated
  }

  private def findCharSelEnd(s: String, from: Int): Int = {
    var j = from
    if (j < s.length && s(j) == '!') j += 1
    if (j < s.length && s(j) == ']') j += 1
    s.indexOf(']', j)
  }

  /** Separate single chars from "a-z" ranges (glob_utils.py:487-503). */
  private def groupCharSelector(chars: String): List[String] = {
    val out = scala.collection.mutable.LinkedHashSet[String]()
    var i = 0
    val n = chars.length
    while (i < n) {
      if (i < n - 2 && chars(i + 1) == '-') { out += chars.substring(i, i + 3); i += 3 }
      else if (chars(i) != '-') { out += chars(i).toString; i += 1 }
      else i += 1
    }
    out.toList.sorted
  }

  /** A bare comma outside `{}` groups / `[]` selectors — the reference
    * tokenizer emits EXPR_SELECT_SEPARATOR for it (glob_utils.py:154-155),
    * so the compiled regex becomes a WHOLE-PATTERN alternation (`^a|b$`).
    * Component-wise predicates (and the fully-defined shortcut) cannot
    * represent that: callers must fall back to the regex-only path. */
  def hasTopLevelAlternation(glob: String): Boolean = {
    var depth = 0
    var inSel = false
    var escaped = false
    glob.exists { c =>
      if (escaped) { escaped = false; false }
      else c match {
        case '\\' => escaped = true; false
        case '{' if !inSel => depth += 1; false
        case '}' if !inSel => depth -= 1; false
        case '[' => inSel = true; false
        case ']' => inSel = false; false
        case ',' => !inSel && depth == 0
        case _ => false
      }
    }
  }

  /** Cheap prefilter on a name (glob_utils.py:214-255): dot-count check +
    * fixed literal components; may still require the full regex. */
  def prefilterMatches(glob: String, name: String): Boolean = {
    val globComponents = glob.split("\\.", -1)
    val nameComponents = name.split("\\.", -1)
    val globstarIdx = globComponents.indexOf("**")
    if (globstarIdx >= 0) {
      if (nameComponents.length < globComponents.length - 1) return false
    } else if (nameComponents.length != globComponents.length) return false
    globComponents.zipWithIndex.forall { case (gc, idx) =>
      if (gc == "**" || isGlobComponent(gc)) true
      else if (globstarIdx >= 0 && idx > globstarIdx) {
        // indexed from the end once past the globstar
        val fromEnd = globComponents.length - idx
        nameComponents(nameComponents.length - fromEnd) == gc
      } else nameComponents(idx) == gc
    }
  }
}
