package graft

import graft.mdx._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: rendered member paths round-trip through the MDX
  * parser for arbitrary names/keys (ScalaCheck generators, fixed seeds
  * for reproducibility). */
class MdxPropertySpec extends AnyFunSuite {

  private val nameGen: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(6, Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const(' '))))
  } yield (head :: tail).mkString.trim

  private val keyGen: Gen[String] = Gen.listOfN(5, Gen.frequency(
    (6, Gen.alphaNumChar), (1, Gen.const('#')), (1, Gen.const(' ')),
    (1, Gen.const('.')), (1, Gen.const('&')))).map(_.mkString.trim)
    .suchThat(k => k.nonEmpty && !k.contains("]"))

  private val pathGen: Gen[MemberPath] = for {
    nNames <- Gen.choose(2, 4)
    names <- Gen.listOfN(nNames, nameGen)
    nKeys <- Gen.choose(0, 3)
    keys <- Gen.listOfN(nKeys, keyGen)
  } yield MemberPath(names, keys)

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n * 3).flatMap(i => g(params, org.scalacheck.rng.Seed(i.toLong)))
      .take(n)
  }

  test("member paths round-trip: render -> parse == identity") {
    val paths = samples(pathGen, 60)
    assert(paths.size >= 40)
    paths.foreach { p =>
      val mdx = s"SELECT {[Measures].[m]} ON COLUMNS, {${p.render}} ON ROWS FROM [C]"
      val parsed = MdxParser.parse(mdx)
      parsed.rows.get match {
        case SetLiteral(Seq(got)) => assert(got == p, s"round-trip failed for ${p.render}")
        case other => fail(s"unexpected $other for ${p.render}")
      }
    }
  }

  test("slicer tuples round-trip with AND and comma separators") {
    val pairs = samples(pathGen.suchThat(_.keys.nonEmpty), 20)
      .grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    pairs.foreach { case (a, b) =>
      Seq(" AND ", ", ").foreach { sep =>
        val mdx = s"SELECT {[Measures].[m]} ON COLUMNS FROM [C] WHERE (${a.render}$sep${b.render})"
        val parsed = MdxParser.parse(mdx)
        assert(parsed.slicer == Seq(a, b), s"sep='$sep' for ${a.render} / ${b.render}")
      }
    }
  }

  test("crossjoin nesting right-folds to the flat axis list") {
    val ps = samples(pathGen.suchThat(_.keys.isEmpty), 9).distinct.take(3)
    val sets = ps.map(p => s"${p.render}.MEMBERS")
    val folded = sets.reduceRight((x, y) => s"CROSSJOIN($x, $y)")
    val parsed = MdxParser.parse(
      s"SELECT {[Measures].[m]} ON COLUMNS, NON EMPTY $folded ON ROWS FROM [C]")
    def flatten(s: MdxSet): Seq[MdxSet] = s match {
      case CrossJoinSet(l, r) => flatten(l) ++ flatten(r)
      case other => Seq(other)
    }
    assert(flatten(parsed.rows.get) == ps.map(p => PathMembers(p)))
  }
}
