package graft.glob

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based consistency checks across the three glob evaluation
  * paths: anchored regex (authoritative), cheap prefilter, and the
  * component-AST fully-defined expansion. */
object GlobPropertySpec extends Properties("glob") {

  private val componentGen: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(4)),
    Gen.const("*"), Gen.const("?x"), Gen.const("[ab]c"),
    Gen.const("{aa,bb}"), Gen.const("x*"))

  private val globGen: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, componentGen).map(_.mkString(".")))

  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(
        Gen.oneOf(Gen.alphaLowerChar, Gen.const('a'), Gen.const('b'),
          Gen.const('x'))).map(_.mkString.take(3)))
        .map(_.mkString(".")))

  property("prefilter never rejects a regex match") =
    Prop.forAll(globGen, nameGen) { (glob, name) =>
      val matches = Glob.toRegex(glob).r.findFirstIn(name).isDefined
      !matches || Glob.prefilterMatches(glob, name)
    }

  property("fully-defined expansion names all match their own glob") =
    Prop.forAll(globGen) { glob =>
      GlobPredicates.fullyDefined(glob) match {
        case Some(names) =>
          val re = Glob.toRegex(glob).r
          names.forall(n => re.findFirstIn(n).isDefined)
        case None => true
      }
    }

  property("literal-only globs expand to themselves") = {
    val literalGlob = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
        .map(_.mkString(".")))
    Prop.forAll(literalGlob) { glob =>
      GlobPredicates.fullyDefined(glob).contains(Seq(glob))
    }
  }
}
