package graft.mdx

/** AST + hand-rolled recursive-descent parser for the MDX subset the
  * reference emits (SURVEY.md §2.9; ref `scanner/DGIS_SCAN_2_stable.py:1417-1420`,
  * `backend/olap_service.py:424-427`, `frontend/src/utils/mdxBuilder.ts:36-39`).
  *
  * Grammar:
  * {{{
  * select  := SELECT set ON COLUMNS
  *            [, [NON EMPTY] set [DIMENSION PROPERTIES path (, path)*] ON ROWS]
  *            FROM [Cube] [WHERE ( member ((AND|,) member)* )]
  * set     := '{' [member (',' member)*] '}'
  *          | CROSSJOIN '(' set ',' set ')'
  *          | path '.' MEMBERS
  *          | path '.' Levels '(' int ')' '.' MEMBERS
  *          | path '.' ALLMEMBERS
  * path    := '[' name ']' ('.' '[' name ']')* ('.&[' key ']')*
  * }}}
  */
sealed trait MdxSet
/** Explicit member/measure list `{m1, m2}` (ref `:1378-1390`). */
final case class SetLiteral(members: Seq[MemberPath]) extends MdxSet
/** `Hier.MEMBERS` / `Hier.Level.MEMBERS` (ref `:1262,1280,1302`). */
final case class PathMembers(path: MemberPath) extends MdxSet
/** `Hier.Levels(n).MEMBERS` positional (1-based; ref `:1273-1276`). */
final case class LevelsMembers(path: MemberPath, n: Int) extends MdxSet
/** `CROSSJOIN(a, b)` (ref `:1392-1397`). */
final case class CrossJoinSet(left: MdxSet, right: MdxSet) extends MdxSet
/** `[Measures].AllMembers` (ref `backend/actions_runner.py:229`). */
case object AllMeasuresSet extends MdxSet

/** Bracketed name path + `.&[key]` parts, e.g.
  * `[Customer].[Geo].[Nation].&[2].&[9]` -> names=[Customer,Geo,Nation],
  * keys=[2,9]. */
final case class MemberPath(names: Seq[String], keys: Seq[String]) {
  def render: String =
    names.map(n => s"[$n]").mkString(".") + keys.map(k => s".&[$k]").mkString
}

final case class MdxSelect(
    columns: MdxSet,
    rows: Option[MdxSet],
    nonEmpty: Boolean,
    properties: Seq[MemberPath],
    cube: String,
    slicer: Seq[MemberPath])

final case class MdxParseException(msg: String) extends Exception(msg)

object MdxParser {

  private sealed trait Tok
  private case class TIdent(name: String) extends Tok // [name]
  private case class TKey(key: String) extends Tok    // &[key]
  private case class TWord(word: String) extends Tok  // keyword, upper-cased
  private case class TNum(n: Int) extends Tok
  private case class TPunct(c: Char) extends Tok      // { } ( ) , .

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def bracket(from: Int): (String, Int) = {
      val close = s.indexOf(']', from)
      if (close < 0) throw MdxParseException(s"unterminated '[' at $from")
      (s.substring(from, close), close + 1)
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '[') { val (n, j) = bracket(i + 1); out += TIdent(n); i = j }
      else if (c == '&' && i + 1 < s.length && s.charAt(i + 1) == '[') {
        val (k, j) = bracket(i + 2); out += TKey(k); i = j
      } else if ("{}(),.".indexOf(c) >= 0) { out += TPunct(c); i += 1 }
      else if (c.isDigit) {
        val j = s.indexWhere(!_.isDigit, i)
        val end = if (j < 0) s.length else j
        out += TNum(s.substring(i, end).toInt); i = end
      } else if (c.isLetter) {
        val j = s.indexWhere(ch => !ch.isLetterAndDigit && ch != '_', i)
        val end = if (j < 0) s.length else j
        out += TWord(s.substring(i, end).toUpperCase); i = end
      } else throw MdxParseException(s"unexpected char '$c' at $i")
    }
    out.result()
  }

  private implicit class CharOps(val c: Char) extends AnyVal {
    def isLetterAndDigit: Boolean = c.isLetterOrDigit
  }

  private final class Cursor(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = {
      val t = peek.getOrElse(throw MdxParseException("unexpected end of input"))
      pos += 1; t
    }
    def expectWord(w: String): Unit = next() match {
      case TWord(`w`) => ()
      case t => throw MdxParseException(s"expected $w, got $t")
    }
    def expectPunct(c: Char): Unit = next() match {
      case TPunct(`c`) => ()
      case t => throw MdxParseException(s"expected '$c', got $t")
    }
    def atWord(w: String): Boolean = peek.contains(TWord(w))
    def atPunct(c: Char): Boolean = peek.contains(TPunct(c))
    def eatWord(w: String): Boolean = { val r = atWord(w); if (r) pos += 1; r }
    def eatPunct(c: Char): Boolean = { val r = atPunct(c); if (r) pos += 1; r }
  }

  def parse(mdx: String): MdxSelect = {
    val c = new Cursor(tokenize(mdx))
    c.expectWord("SELECT")
    val cols = parseSet(c)
    c.expectWord("ON")
    c.expectWord("COLUMNS")
    var rows: Option[MdxSet] = None
    var nonEmpty = false
    var props: Seq[MemberPath] = Nil
    if (c.eatPunct(',')) {
      if (c.eatWord("NON")) { c.expectWord("EMPTY"); nonEmpty = true }
      rows = Some(parseSet(c))
      if (c.eatWord("DIMENSION")) {
        c.expectWord("PROPERTIES")
        val ps = Seq.newBuilder[MemberPath]
        ps += parsePath(c)
        while (c.eatPunct(',')) ps += parsePath(c)
        props = ps.result()
      }
      c.expectWord("ON")
      c.expectWord("ROWS")
    }
    c.expectWord("FROM")
    val cube = c.next() match {
      case TIdent(n) => n
      case t => throw MdxParseException(s"expected [cube], got $t")
    }
    var slicer: Seq[MemberPath] = Nil
    if (c.eatWord("WHERE")) {
      c.expectPunct('(')
      val ms = Seq.newBuilder[MemberPath]
      ms += parsePath(c)
      while (c.eatWord("AND") || c.eatPunct(',')) ms += parsePath(c)
      c.expectPunct(')')
      slicer = ms.result()
    }
    if (c.peek.nonEmpty) throw MdxParseException(s"trailing tokens at ${c.pos}")
    MdxSelect(cols, rows, nonEmpty, props, cube, slicer)
  }

  private def parseSet(c: Cursor): MdxSet = {
    if (c.eatPunct('{')) {
      if (c.eatPunct('}')) SetLiteral(Nil)
      else {
        val ms = Seq.newBuilder[MemberPath]
        ms += parsePath(c)
        while (c.eatPunct(',')) ms += parsePath(c)
        c.expectPunct('}')
        SetLiteral(ms.result())
      }
    } else if (c.eatWord("CROSSJOIN")) {
      c.expectPunct('(')
      val l = parseSet(c)
      c.expectPunct(',')
      val r = parseSet(c)
      c.expectPunct(')')
      CrossJoinSet(l, r)
    } else {
      // path-based set: path(.MEMBERS | .Levels(n).MEMBERS | .ALLMEMBERS)
      val names = Seq.newBuilder[String]
      c.next() match {
        case TIdent(n) => names += n
        case t => throw MdxParseException(s"expected set, got $t")
      }
      var done: Option[MdxSet] = None
      while (done.isEmpty && c.atPunct('.')) {
        c.expectPunct('.')
        c.next() match {
          case TIdent(n) => names += n
          case TWord("MEMBERS") => done = Some(PathMembers(MemberPath(names.result(), Nil)))
          case TWord("ALLMEMBERS") =>
            val ns = names.result()
            if (ns.map(_.toUpperCase) == Seq("MEASURES")) done = Some(AllMeasuresSet)
            else throw MdxParseException(s"ALLMEMBERS only supported on [Measures], got $ns")
          case TWord("LEVELS") =>
            c.expectPunct('(')
            val n = c.next() match {
              case TNum(v) => v
              case t => throw MdxParseException(s"expected level ordinal, got $t")
            }
            c.expectPunct(')')
            c.expectPunct('.')
            c.expectWord("MEMBERS")
            done = Some(LevelsMembers(MemberPath(names.result(), Nil), n))
          case t => throw MdxParseException(s"unexpected $t in path")
        }
      }
      done.getOrElse(throw MdxParseException(
        s"bare member path outside a set: ${MemberPath(names.result(), Nil).render}"))
    }
  }

  /** Full member path: names + optional `.&[key]` parts. */
  private def parsePath(c: Cursor): MemberPath = {
    val names = Seq.newBuilder[String]
    val keys = Seq.newBuilder[String]
    c.next() match {
      case TIdent(n) => names += n
      case t => throw MdxParseException(s"expected member path, got $t")
    }
    var inKeys = false
    var cont = true
    while (cont && c.atPunct('.')) {
      val save = c.pos
      c.expectPunct('.')
      c.peek match {
        case Some(TIdent(n)) if !inKeys => c.next(); names += n
        case Some(TKey(k)) => c.next(); keys += k; inKeys = true
        case _ => c.pos = save; cont = false
      }
    }
    MemberPath(names.result(), keys.result())
  }
}
