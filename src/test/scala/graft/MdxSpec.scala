package graft

import graft.mdx._
import org.scalatest.funsuite.AnyFunSuite

class MdxParserSpec extends AnyFunSuite {

  test("parses the reference's flagship query shape") {
    val q = MdxParser.parse(
      """SELECT {[Measures].[sum_qty], [Measures].[count_order]} ON COLUMNS,
        | NON EMPTY CROSSJOIN([Customer].[Geo].[Nation].MEMBERS,
        |   {[Part].[ByBrand].[Brand].&[Brand#1]}) ON ROWS
        |FROM [Sales]
        |WHERE ([Time].[OrderDate].[Year].&[1996])""".stripMargin)
    assert(q.nonEmpty)
    assert(q.cube == "Sales")
    assert(q.slicer == Seq(MemberPath(Seq("Time", "OrderDate", "Year"), Seq("1996"))))
    q.columns match {
      case SetLiteral(ms) => assert(ms.map(_.names.last) == Seq("sum_qty", "count_order"))
      case other => fail(s"bad columns: $other")
    }
    q.rows.get match {
      case CrossJoinSet(PathMembers(p), SetLiteral(Seq(b))) =>
        assert(p.names == Seq("Customer", "Geo", "Nation"))
        assert(b.keys == Seq("Brand#1"))
      case other => fail(s"bad rows: $other")
    }
  }

  test("parses Levels(n), AllMembers, DIMENSION PROPERTIES, AND-slicer") {
    val q = MdxParser.parse(
      """SELECT [Measures].AllMembers ON COLUMNS,
        | [Customer].[Geo].Levels(2).MEMBERS
        |   DIMENSION PROPERTIES [Customer].[Geo].[Region] ON ROWS
        |FROM [Sales]
        |WHERE ([Customer].[Geo].[Region].&[2] AND [Time].[OrderDate].[Year].&[1997])""".stripMargin)
    assert(!q.nonEmpty)
    assert(q.columns == AllMeasuresSet)
    assert(q.rows.contains(LevelsMembers(MemberPath(Seq("Customer", "Geo"), Nil), 2)))
    assert(q.properties == Seq(MemberPath(Seq("Customer", "Geo", "Region"), Nil)))
    assert(q.slicer.size == 2)
  }

  test("parses the empty-set connectivity probe") {
    val q = MdxParser.parse("SELECT {} ON COLUMNS FROM [Sales]")
    assert(q.columns == SetLiteral(Nil) && q.rows.isEmpty)
  }

  test("keys may contain spaces, dots and brackets-free specials") {
    val q = MdxParser.parse(
      "SELECT {[Measures].[sum_qty]} ON COLUMNS, {[Customer].[Geo].[Nation].&[1].&[9]} ON ROWS FROM [Sales]")
    q.rows.get match {
      case SetLiteral(Seq(m)) => assert(m.keys == Seq("1", "9"))
      case other => fail(s"$other")
    }
  }

  test("rejects malformed input") {
    assertThrows[MdxParseException](MdxParser.parse("SELECT ON COLUMNS FROM [X]"))
    assertThrows[MdxParseException](MdxParser.parse("SELECT {[Measures].[m]} ON COLUMNS FROM"))
    assertThrows[MdxParseException](MdxParser.parse("SELECT {[Measures].[m] ON COLUMNS FROM [X]"))
  }
}

class MdxLowererSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("duplicate hierarchy on ROWS is rejected (ref :1231-1243)") {
    val ex = intercept[MdxAnalysisException](MdxLowerer.run(spark, sf,
      """SELECT {[Measures].[sum_qty]} ON COLUMNS,
        | CROSSJOIN([Customer].[Geo].[Region].MEMBERS,
        |           [Customer].[Geo].[Nation].MEMBERS) ON ROWS
        |FROM [Sales]""".stripMargin))
    assert(ex.msg.contains("twice"))
  }

  test("unknown cube / measure / level errors") {
    assertThrows[MdxAnalysisException](MdxLowerer.run(spark, sf,
      "SELECT {[Measures].[sum_qty]} ON COLUMNS FROM [Nope]"))
    assertThrows[MdxAnalysisException](MdxLowerer.run(spark, sf,
      "SELECT {[Measures].[nope]} ON COLUMNS FROM [Sales]"))
    assertThrows[MdxAnalysisException](MdxLowerer.run(spark, sf,
      "SELECT {[Measures].[sum_qty]} ON COLUMNS, [Customer].[Geo].[Nope].MEMBERS ON ROWS FROM [Sales]"))
    assertThrows[MdxAnalysisException](MdxLowerer.run(spark, sf,
      "SELECT {[Measures].[sum_qty]} ON COLUMNS, [Customer].[Geo].Levels(0).MEMBERS ON ROWS FROM [Sales]"))
  }

  test("empty-set probe returns schema-only scan") {
    val df = MdxLowerer.run(spark, sf, "SELECT {} ON COLUMNS FROM [Sales]")
    assert(df.count() == 0 && df.columns.contains("l_orderkey"))
  }

  test("measures-only query yields one totals row") {
    val rows = MdxLowerer.run(spark, sf,
      "SELECT {[Measures].[count_order], [Measures].[sum_qty]} ON COLUMNS FROM [Sales]").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("count_order") > 0)
  }

  test("dimension alias map rewrites names (ref mdxBuilder.ts:20-31)") {
    val df = MdxLowerer.run(spark, sf,
      """SELECT {[Measures].[count_order]} ON COLUMNS,
        | NON EMPTY [Cliente].[Geo].[Nation].MEMBERS ON ROWS FROM [Sales]""".stripMargin,
      aliasMap = Map("Cliente" -> "Customer"))
    assert(df.columns.toSeq == Seq("nation", "count_order"))
    assert(df.count() > 0)
  }

  test("slicer on a hierarchy also on ROWS folds into its filter (J6)") {
    val df = MdxLowerer.run(spark, sf,
      """SELECT {[Measures].[count_order]} ON COLUMNS,
        | NON EMPTY [Customer].[Geo].[Region].MEMBERS ON ROWS
        |FROM [Sales] WHERE ([Customer].[Geo].[Region].&[2])""".stripMargin).collect()
    assert(df.length == 1 && df(0).getAs[String]("region") == "ASIA")
  }

  test("NON EMPTY off keeps empty member combos as nulls") {
    val rows = SparkEntry.queries("q33_mdx_nonempty_off")(spark, sf).collect()
    // 25 nations x the selected brands that exist at this sf (Brand#29 is
    // absent at sf0.001) — every surviving member combo appears even when
    // the fact has no matching rows.
    assert(rows.length == 50)
    assert(rows.exists(_.isNullAt(2)), "expected at least one empty cell at sf0.001")
  }
  test("pre-aggregate merge == recompute, bit-identical") {
    import org.apache.spark.sql.functions.col
    val cube = SalesCube.cube
    val pa = cube.preAggs.head
    val fact = cube.fact(spark, sf)
    val full = MdxLowerer.preAggregateSlice(spark, sf, cube, pa, fact)
    val merged = MdxLowerer.mergePreAggs(cube, pa, Seq(
      MdxLowerer.preAggregateSlice(spark, sf, cube, pa,
        fact.where(col("l_orderkey") % 3 === 0)),
      MdxLowerer.preAggregateSlice(spark, sf, cube, pa,
        fact.where(col("l_orderkey") % 3 === 1)),
      MdxLowerer.preAggregateSlice(spark, sf, cube, pa,
        fact.where(col("l_orderkey") % 3 === 2))))
    val key = pa.grainCols
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(key.map(col): _*).collect().map(_.toSeq).toSeq
    // SUM partials are decimal, COUNT partials are long: summation is
    // exact, so the three-way merge must be BIT-identical to the
    // from-scratch build — not approximately equal.
    assert(rows(merged) == rows(full))
  }

  test("one-pass sliced pre-aggregation equals per-slice builds") {
    import org.apache.spark.sql.functions.{col, pmod}
    val cube = SalesCube.cube
    val pa = cube.preAggs.head
    val fact = cube.fact(spark, sf)
    val attached = MdxLowerer.attachForPreAgg(spark, sf, cube, pa, fact)
    val sliced = MdxLowerer.preAggregateSliced(cube, pa, attached,
      pmod(col("l_orderkey"), org.apache.spark.sql.functions.lit(3)))
    val key = pa.grainCols
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(key.map(col): _*).collect().map(_.toSeq).toSeq
    (0 until 3).foreach { v =>
      val fromSliced = sliced.where(col("__slice") === v).drop("__slice")
      val independent = MdxLowerer.preAggregateSlice(spark, sf, cube, pa,
        fact.where(pmod(col("l_orderkey"), org.apache.spark.sql.functions.lit(3)) === v))
      assert(rows(fromSliced) == rows(independent), s"slice $v diverges")
    }
  }
}
