package graft

import graft.meta.{Dmv, UniqueNames}
import graft.mdx.{MdxParser, MemberPath, SetLiteral}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial property tests for the unique-name algebra (X1 surface):
  * the reference's real data is Spanish captions with '.', '&', accents
  * and embedded brackets, so the generators here draw from exactly that
  * alphabet — including keys that EMBED the reserved `.&[` separator and
  * empty segments.
  *
  * Pinned contract (matches SSAS's own flat-string encoding):
  *  - ']' cannot appear in a name or key (SSAS escapes it; the TESTDATA
  *    and reference corpora never produce it) — everything below assumes
  *    its absence.
  *  - `parentByPrefix` and `lastKey` are exact for EVERY ']'-free key,
  *    even keys containing `.&[` (their regexes anchor on the final
  *    bracket, not on separator counting).
  *  - `depth` (and therefore X1 level inference) counts `.&[` separators,
  *    so a key embedding the separator overcounts by exactly its number
  *    of embedded occurrences — the flat encoding is ambiguous there by
  *    construction; the MDX PARSER, which scans bracket-wise, still
  *    round-trips such keys exactly. */
class UniqueNamesPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val hostileChar: Gen[Char] = Gen.frequency(
    (8, Gen.alphaNumChar), (1, Gen.oneOf('á', 'é', 'ñ', 'ü')),
    (1, Gen.oneOf('&', '.', '#', '[')), (1, Gen.const(' ')))

  private val nameGen: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(7, hostileChar)
  } yield (head +: tail).mkString.trim

  private val keyGen: Gen[String] = Gen.choose(0, 8)
    .flatMap(n => Gen.listOfN(n, hostileChar).map(_.mkString))

  /** Keys guaranteed to embed the reserved separator. */
  private val embeddedSepKeyGen: Gen[String] = for {
    a <- Gen.listOfN(2, Gen.alphaNumChar).map(_.mkString)
    b <- Gen.listOfN(2, Gen.alphaNumChar).map(_.mkString)
    n <- Gen.choose(1, 2)
  } yield a + ".&[" * n + b

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n * 4).flatMap(i => g(params, org.scalacheck.rng.Seed(i.toLong)))
      .take(n)
  }

  private def render(dim: String, hier: String, keys: Seq[String]): String =
    s"[$dim].[$hier]" + keys.map(k => s".&[$k]").mkString

  private case class Case(dim: String, hier: String, keys: Seq[String])

  // Names in the algebra cases exclude the reserved separator so depth
  // expectations stay key-driven; the parser round-trip test below keeps
  // fully hostile names (the parser is bracket-wise, it doesn't care).
  private val sepFreeName: Gen[String] = nameGen.suchThat(!_.contains(".&["))

  private val safeCaseGen: Gen[Case] = for {
    dim <- sepFreeName
    hier <- sepFreeName
    n <- Gen.choose(1, 4)
    keys <- Gen.listOfN(n, keyGen.suchThat(!_.contains(".&[")))
  } yield Case(dim, hier, keys)

  private val hostileCaseGen: Gen[Case] = for {
    dim <- sepFreeName
    hier <- sepFreeName
    n <- Gen.choose(1, 3)
    keys <- Gen.listOfN(n, Gen.frequency((1, keyGen.suchThat(!_.contains(".&["))),
      (2, embeddedSepKeyGen)))
  } yield Case(dim, hier, keys)

  /** Evaluate builder + algebra columns for all cases in ONE single-row
    * plan (one job, not one per sample). */
  private def evalAlgebra(cases: Seq[Case]): Seq[(String, Int, String, String)] = {
    val cols = cases.zipWithIndex.flatMap { case (c, i) =>
      val u = UniqueNames.oldCube(c.dim, c.hier, c.keys.map(lit): _*)
      Seq(u.as(s"u$i"), UniqueNames.depth(u).as(s"d$i"),
        UniqueNames.parentByPrefix(u).as(s"p$i"), UniqueNames.lastKey(u).as(s"k$i"))
    }
    val row = spark.range(1).select(cols.toSeq: _*).head()
    cases.indices.map(i => (row.getAs[String](s"u$i"), row.getAs[Int](s"d$i"),
      row.getAs[String](s"p$i"), row.getAs[String](s"k$i")))
  }

  test("separator-free keys: builder render, depth, parent, lastKey all exact") {
    val cases = samples(safeCaseGen, 40)
    assert(cases.size == 40)
    evalAlgebra(cases).zip(cases).foreach { case ((u, d, p, k), c) =>
      val want = render(c.dim, c.hier, c.keys)
      assert(u == want, s"builder render: $u != $want")
      assert(d == c.keys.size, s"depth of $want")
      val wantParent =
        if (c.keys.size > 1) render(c.dim, c.hier, c.keys.init) else null
      assert(p == wantParent, s"parent of $want")
      assert(k == c.keys.last, s"lastKey of $want")
    }
  }

  test("keys embedding .&[ overcount depth exactly; parent/lastKey stay exact") {
    val cases = samples(hostileCaseGen, 30)
      .filter(_.keys.exists(_.contains(".&[")))
    assert(cases.nonEmpty)
    evalAlgebra(cases).zip(cases).foreach { case ((u, d, p, k), c) =>
      val want = render(c.dim, c.hier, c.keys)
      val embedded = c.keys.map(_.sliding(3).count(_ == ".&[")).sum
      assert(u == want)
      assert(d == c.keys.size + embedded,
        s"depth of $want: got $d, keys ${c.keys.size} + embedded $embedded")
      val wantParent =
        if (d > 1) render(c.dim, c.hier, c.keys.init) else null
      assert(p == wantParent, s"parent of $want")
      assert(k == c.keys.last, s"lastKey of $want")
    }
  }

  test("X1 extractLevels: explicit segments win, synthesized Nivel N otherwise") {
    import spark.implicits._
    val lvlNames = Seq("Año fiscal", "Región & zona", "Detalle.fino")
    val keys = samples(keyGen.suchThat(k => !k.contains(".&[") && k.nonEmpty), 9)
    // New-cube names carry an explicit level segment per depth; old-cube
    // names don't. Same hierarchy name, two generations.
    val newNames = (1 to 3).flatMap { d =>
      keys.take(3).map(k0 =>
        s"[Ventas].[Geo].[${lvlNames(d - 1)}]" +
          (keys.take(d - 1) :+ k0).map(k => s".&[$k]").mkString)
    }
    val oldNames = (1 to 3).flatMap { d =>
      keys.take(2).map(k0 =>
        "[Ventas].[GeoOld]" + (keys.take(d - 1) :+ k0).map(k => s".&[$k]").mkString)
    }
    val members = (newNames.map(("[Ventas].[Geo]", _)) ++
      oldNames.map(("[Ventas].[GeoOld]", _)))
      .toDF("JERARQUIA", "MIEMBRO_UNIQUE_NAME")
    val got = Dmv.extractLevels(members, "[Ventas].[Geo]")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> lvlNames(0), 2 -> lvlNames(1), 3 -> lvlNames(2)))
    val gotOld = Dmv.extractLevels(members, "[Ventas].[GeoOld]")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(gotOld == Map(1 -> "Nivel 1", 2 -> "Nivel 2", 3 -> "Nivel 3"))
  }

  test("MDX parser round-trips every ']'-free path, including embedded .&[ and empty keys") {
    val paths = samples(hostileCaseGen, 30).map(c =>
      MemberPath(Seq(c.dim, c.hier), c.keys)) ++
      Seq(MemberPath(Seq("D", "H"), Seq("")),            // empty key
        MemberPath(Seq("D", "H"), Seq("", "a.&[b", "")), // empties around hostile
        MemberPath(Seq("Ca&rø. [x", "H"), Seq("k")))     // bracket/& in caption
    paths.foreach { p =>
      val mdx = s"SELECT {[Measures].[m]} ON COLUMNS, {${p.render}} ON ROWS FROM [C]"
      val parsed =
        try MdxParser.parse(mdx)
        catch { case e: Throwable => fail(s"parser threw for ${p.render}: $e") }
      parsed.rows.get match {
        case SetLiteral(Seq(got)) => assert(got == p, s"round-trip of ${p.render}")
        case other => fail(s"unexpected $other for ${p.render}")
      }
    }
  }
}
