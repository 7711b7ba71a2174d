package graft.cli

import org.scalacheck.{Gen, Prop, Properties}

import graft.cli.RenderTarget.{CallNode, Node, PathNode}

/** Property checks for the render target-expression parser — the face
  * every dashboard request crosses. Two guarantees matter at the API
  * boundary: arbitrary request text NEVER escapes as anything but the
  * deliberate IllegalArgumentException diagnostics (a raw
  * StringIndexOutOfBounds from a fuzzer-shaped target would 500 the web
  * face), and well-formed targets round-trip exactly (print → parse is
  * the identity on the AST, so the parser can't silently mis-bracket a
  * nested expression the way the comma-alternation CLI bug did). */
object RenderParserPropertySpec extends Properties("renderparse") {

  // ---- fuzz: arbitrary printable input ---------------------------------

  private val fuzzChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    // weight the parser's own structural alphabet so fuzz cases nest
    4 -> Gen.oneOf('(', ')', ',', '\'', '"', '{', '}', '[', ']',
      '.', '*', '?', '-', '_', '%', ' '),
    1 -> Gen.choose(33.toChar, 126.toChar))

  private val fuzzString: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, fuzzChar).map(_.mkString))

  property("parse never throws anything but IllegalArgumentException") =
    Prop.forAll(fuzzString) { s =>
      try { RenderTarget.parse(s); true }
      catch {
        case _: IllegalArgumentException => true
        case other: Throwable =>
          println(s"parse('$s') threw ${other.getClass.getName}")
          false
      }
    }

  property("parseTime/parseInterval fail only with the deliberate error") =
    Prop.forAll(fuzzString) { s =>
      def ok(f: String => Long): Boolean =
        try { f(s); true }
        catch { case _: IllegalArgumentException => true }
      ok(RenderTarget.parseTime(_, 1000L)) &&
        ok(RenderTarget.parseInterval)
    }

  // ---- round-trip: print(ast) parses back to the same ast -------------

  private val fnName: Gen[String] = Gen.oneOf("sumSeries", "movingAverage",
    "aliasSub", "scale", "summarize", "group", "aggregate", "f_1")

  private val pathGen: Gen[String] = Gen.chooseNum(1, 3).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("sys", "cpu*", "lo-ad", "x?z", "{a,bb}", "q[0-9]"))
      .map(_.mkString(".")))

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-99, 99).map(_.toString),
    Gen.oneOf("0.5", "10", "max", "1hour"))

  private def nodeGen(depth: Int,
      paths: Gen[String] = pathGen): Gen[Node] =
    if (depth <= 0) paths.map(PathNode.apply)
    else Gen.frequency(
      2 -> paths.map(PathNode.apply),
      3 -> (for {
        fn <- fnName
        series <- nodeGen(depth - 1, paths)
        nArgs <- Gen.chooseNum(0, 2)
        args <- Gen.listOfN(nArgs, scalarGen)
      } yield CallNode(fn, series, args, raw = "")))

  /** Print an AST in the surface syntax; scalar args that aren't plain
    * path text get quoted (the parser treats bare words as paths). */
  private def show(n: Node): String = n match {
    case PathNode(g) => g
    case CallNode(fn, series, args, _) =>
      val shown = args.map { a =>
        if (a.nonEmpty && a.forall(c =>
          c.isLetterOrDigit || c == '.' || c == '-')) a
        else s"'$a'"
      }
      (show(series) :: shown).mkString(s"$fn(", ",", ")")
  }

  /** Structural equality ignoring the `raw` source-text field. */
  private def same(a: Node, b: Node): Boolean = (a, b) match {
    case (PathNode(x), PathNode(y)) => x == y
    case (CallNode(f1, s1, a1, _), CallNode(f2, s2, a2, _)) =>
      f1 == f2 && a1 == a2 && same(s1, s2)
    case _ => false
  }

  property("print → parse is the identity on the AST") =
    Prop.forAll(Gen.chooseNum(0, 4).flatMap(nodeGen(_))) { ast =>
      same(RenderTarget.parse(show(ast)), ast)
    }

  property("whitespace around commas and parens does not change the AST") = {
    // brace-free paths only: the blanket comma-spacing below would
    // rewrite {a,bb} (whose inner comma is path text, not a separator)
    val plainPath = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("sys", "cpu*", "lo-ad", "x?z", "q[0-9]"))
        .map(_.mkString(".")))
    Prop.forAll(Gen.chooseNum(1, 3).flatMap(nodeGen(_, plainPath))) { ast =>
      val spaced = show(ast)
        .replace(",", " , ").replace("(", "( ").replace(")", " )")
      same(RenderTarget.parse(spaced), ast)
    }
  }
}
