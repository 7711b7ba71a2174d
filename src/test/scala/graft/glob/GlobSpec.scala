package graft.glob

import org.scalatest.funsuite.AnyFunSuite
import graft.glob.Glob._

/** Ports of the reference glob test tables (tests/test_glob_utils.py:28-199). */
class GlobSpec extends AnyFunSuite {

  test("glob validity (test_glob_utils.py:37-53)") {
    Seq("a", "a.b", "{a}.b", "{a,{b,c}}.d", "{a,b}.{c,d}.e").foreach { g =>
      assert(isValid(g), g)
    }
    Seq("{", "{{}", "{}}", "}{", "}{}", "{a.}.b", "{a,{.b,c}}.d",
        "{a,b.}.{.c,d}.e").foreach { g =>
      assert(!isValid(g), g)
    }
  }

  test("bare top-level comma is a whole-pattern alternation") {
    assert(hasTopLevelAlternation("a.b,c.d"))
    assert(hasTopLevelAlternation("sys.cpu.0.load,sys.mem.0.used"))
    assert(!hasTopLevelAlternation("a.{b,c}.d")) // braces keep it local
    assert(!hasTopLevelAlternation("a.[,x].d"))  // selector-local comma
    assert(!hasTopLevelAlternation("a\\,b"))     // escaped comma
    assert(!hasTopLevelAlternation("sys.cpu.*"))
    // the compiled regex gets the top-level '|' (reference tokenizer
    // parity, glob_utils.py:154-155)
    assert(toRegex("a,b") === "^a|b$")
  }

  test("glob component detection (test_glob_utils.py:28-35)") {
    Seq("a*", "a.b*", "a.b?", "a.b[a-z]?", "a{b,c,d}.a", "a.*.a", "{a}")
      .foreach(g => assert(g.split("\\.").exists(isGlobComponent), g))
    assert(!isGlobComponent("a-z"))
  }

  test("glob→regex filter table (test_glob_utils.py:55-105)") {
    val scenarii: Seq[(Seq[String], String, Seq[String])] = Seq(
      (Seq("a", "a.b", "a.cc"), "a.*", Seq("a.b", "a.cc")),
      (Seq("a.b", "a.cc"), "a.?", Seq("a.b")),
      (Seq("a.b", "a.cc", "y.z"), "?.*", Seq("a.b", "a.cc", "y.z")),
      (Seq("a.bd", "a.cd", "y.z"), "?.{b,c}?", Seq("a.bd", "a.cd")),
      (Seq("a.b_", "a.0_", "a.1_"), "?.[0-9]?", Seq("a.0_", "a.1_")),
      (Seq("a.b", "a.b.c", "a.x.y"), "a.*.*", Seq("a.b.c", "a.x.y")),
      (Seq("a.b", "a.b.c", "a.x.y"), "a.{b,x}.*", Seq("a.b.c", "a.x.y")),
      (Seq("a.b", "a.b.c", "a.x.y"), "a.{b,x}.{c,y}", Seq("a.b.c", "a.x.y")),
      (Seq("a.b", "a.b.c", "a.x.y", "a.x.z"), "a.{b,x}.{c,{y,z}}",
        Seq("a.b.c", "a.x.y", "a.x.z")),
      (Seq("fib.bar", "fib.bart", "foo.baaa", "foo.bar", "foo.bart",
          "foo.bli", "foo.blo"), "foo.{bar*,bli}",
        Seq("foo.bar", "foo.bart", "foo.bli")),
      (Seq("fib.bar.la", "fib.bart.la", "foo.baaa.la", "foo.bar.la",
          "foo.bart.la", "foo.blit.la", "foo.blo.la"), "foo.{bar*,bli*}.la",
        Seq("foo.bar.la", "foo.bart.la", "foo.blit.la")))
    scenarii.foreach { case (names, glob, expected) =>
      val re = toRegex(glob).r
      assert(names.filter(n => re.findFirstIn(n).isDefined) === expected, glob)
    }
  }

  test("parser AST table (test_glob_utils.py:107-173)") {
    def lit(s: String): Part = Literal(s)
    val scenarii: Seq[(String, List[Component])] = Seq(
      ("a.b", List(Parts(List(lit("a"))), Parts(List(lit("b"))))),
      ("a.{b}", List(Parts(List(lit("a"))), Parts(List(lit("b"))))),
      ("a?b.c", List(Parts(List(lit("a"), AnyChar, lit("b"))), Parts(List(lit("c"))))),
      ("a.b*c", List(Parts(List(lit("a"))), Parts(List(lit("b"), AnySequence, lit("c"))))),
      ("a.b**c", List(Parts(List(lit("a"))), Parts(List(lit("b"))), Globstar,
        Parts(List(lit("c"))))),
      ("a.**.c", List(Parts(List(lit("a"))), Globstar, Parts(List(lit("c"))))),
      ("a.**", List(Parts(List(lit("a"))), Globstar)),
      ("a[xyz].b", List(Parts(List(lit("a"), CharIn(List("x", "y", "z")))),
        Parts(List(lit("b"))))),
      ("a[!rat].b", List(Parts(List(lit("a"), CharNotIn(List("a", "r", "t")))),
        Parts(List(lit("b"))))),
      ("pl[a-ox]p", List(Parts(List(lit("pl"), CharIn(List("a-o", "x")), lit("p"))))),
      ("a[b-dopx-z]b.c", List(
        Parts(List(lit("a"), CharIn(List("b-d", "o", "p", "x-z")), lit("b"))),
        Parts(List(lit("c"))))),
      ("a[x-xy]b", List(Parts(List(lit("a"), CharIn(List("x-x", "y")), lit("b"))))),
      ("a[y-xz]b", List(Parts(List(lit("a"), CharIn(List("y-x", "z")), lit("b"))))),
      ("a.b.{c,d}", List(Parts(List(lit("a"))), Parts(List(lit("b"))),
        Parts(List(SequenceIn(List("c", "d")))))),
      ("a.b.{c,d}-{e,f}", List(Parts(List(lit("a"))), Parts(List(lit("b"))),
        Parts(List(SequenceIn(List("c", "d")), lit("-"), SequenceIn(List("e", "f")))))),
      ("a.b.oh{c{d,e,}{a,b},f{g,h}i}ah", List(Parts(List(lit("a"))), Parts(List(lit("b"))),
        Parts(List(lit("oh"),
          SequenceIn(List("ca", "cb", "cda", "cdb", "cea", "ceb", "fgi", "fhi")),
          lit("ah"))))),
      // negative examples: unbalanced separators behave as literals
      ("a[.b", List(Parts(List(lit("a["))), Parts(List(lit("b"))))),
      ("a{.b", List(Parts(List(lit("a{"))), Parts(List(lit("b"))))),
      ("a{.b.c}", List(Parts(List(lit("a{"))), Parts(List(lit("b"))),
        Parts(List(lit("c}"))))),
      ("a.", List(Parts(List(lit("a"))))),
      ("a..b", List(Parts(List(lit("a"))), Parts(List(lit("b"))))))
    scenarii.foreach { case (glob, expected) =>
      assert(parse(glob) === expected, glob)
    }
  }

  test("group degrades to AnySequence when it contains selectors") {
    assert(parse("a.b{some,x{chars[!xyz],plop}}c") ===
      List(Parts(List(Literal("a"))),
        Parts(List(Literal("b"), AnySequence, Literal("c")))))
  }

  test("prefilter keeps possible matches only (glob_utils.py:214-255)") {
    assert(prefilterMatches("foo.bar.baz", "foo.bar.baz"))
    assert(prefilterMatches("foo.bar.*", "foo.bar.baz"))
    assert(!prefilterMatches("foo.bar.*", "bar.foo.qux"))
    assert(!prefilterMatches("foo.*", "foo.bar.baz")) // depth mismatch
  }

  test("fully-defined expansion (drivers/cassandra.py:2100-2113)") {
    assert(GlobPredicates.fullyDefined("a.b").contains(Seq("a.b")))
    assert(GlobPredicates.fullyDefined("a.{b}").contains(Seq("a.b")))
    assert(GlobPredicates.fullyDefined("a.{b,c}").map(_.toSet)
      .contains(Set("a.b", "a.c")))
    assert(GlobPredicates.fullyDefined("a.*").isEmpty)
    assert(GlobPredicates.fullyDefined("a.b?").isEmpty)
  }
}
