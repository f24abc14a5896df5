package graft

import graft.model.MemberCatalog
import graft.ops.Validators
import graft.service.{ApartadosService, QueryService}
import graft.sink.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests ported from the reference's own fixtures (FIXTURES.md §3/§4:
  * `backend/mock_data.py`, `docs/apartados_sis2025.json`). */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  /** mock_data.py:57-66 member fixture, loaded through the catalog schema. */
  private def mockMembers = Seq(
    ("sis2011", "[D Clues]", "[D Clues].[Unidad médica]", "Entidad", 1,
      "Aguascalientes", "[D Clues].[Unidad médica].[Entidad].&[1]", null, 0, 1),
    ("sis2011", "[D Clues]", "[D Clues].[Unidad médica]", "Entidad", 1,
      "Baja California", "[D Clues].[Unidad médica].[Entidad].&[2]", null, 0, 2)
  ).toDF("CATALOGO", "DIMENSION", "JERARQUIA", "NIVEL_NOMBRE", "NIVEL_NUMERO",
    "MIEMBRO_CAPTION", "MIEMBRO_UNIQUE_NAME", "PARENT_UNIQUE_NAME",
    "CHILDREN_CARDINALITY", "MIEMBRO_ORDINAL")

  test("member cache CSV round-trips through sink and S5 source") {
    val dir = java.nio.file.Files.createTempDirectory("member_csv").toString
    Sinks.csvExport(MemberCatalog.members(spark, sf), s"$dir/members")
    val back = MemberCatalog.fromCsv(spark, s"$dir/members")
    assert(back.count() == MemberCatalog.members(spark, sf).count())
    assert(back.schema("NIVEL_NUMERO").dataType.typeName == "integer")
  }

  test("S5 source tolerates old-cube fixtures missing optional columns") {
    val dir = java.nio.file.Files.createTempDirectory("old_csv").toString
    mockMembers
      .select("CATALOGO", "DIMENSION", "JERARQUIA", "NIVEL_NUMERO",
        "MIEMBRO_CAPTION", "MIEMBRO_UNIQUE_NAME") // no level name / parent / ordinal
      .coalesce(1).write.option("header", "true").csv(s"$dir/m")
    val loaded = MemberCatalog.fromCsv(spark, s"$dir/m")
    assert(loaded.count() == 2)
    assert(loaded.columns.contains("PARENT_UNIQUE_NAME"))
    assert(loaded.where(col("NIVEL_NOMBRE").isNull).count() == 2)
  }

  test("golden query result shape: AG-Grid columns + rowCount 2 (mock_data.py:68-78)") {
    // Fact with the two golden entidades; measure = row count per entidad.
    val res = QueryService.executeForGrid(spark, sf, QueryService.QueryRequest(
      "Sales", Seq("count_order"),
      Seq(QueryService.RowSpec("[Customer]", "[Customer].[Geo]", "Region"))))
    assert(res.columns.forall(c => c.sortable && c.filter))
    assert(res.columns.map(_.field) == Seq("region", "count_order"))
    assert(res.rowCount == res.rows.size)
  }

  test("get_apartados envelope matches the golden sample structure") {
    val env = ApartadosService.envelope(
      MemberCatalog.members(spark, sf), "req-1", "[DIM VARIABLES]")
    assert(env.startsWith("""{"request_id": "req-1", "action": "get_apartados", "status": "success""""))
    assert(env.contains(""""dimension": "[DIM VARIABLES]""""))
    assert(env.contains("MEMBER_UNIQUE_NAME") && env.contains("MEMBER_CAPTION"))
    assert(env.contains("[DIM VARIABLES].[Apartado y Variable].[Apartado].&["))
  }

  test("validators reject injection markers and keep Spanish letters (P13)") {
    assert(Validators.validateQueryText("SALES_2025").isRight)
    assert(Validators.validateQueryText("x; DROP TABLE y").isLeft)
    assert(Validators.validateQueryText("a -- comment").isLeft)
    assert(Validators.validateQueryText("EXEC xp_cmdshell").isLeft)
    assert(Validators.validateQueryText("UPDATES are fine as substrings").isRight)
    assert(Validators.sanitizeIdentifier("Año-2025; DROP") == "Año2025 DROP")
  }

  test("X2 Levels(n) fallback renders positional member sets") {
    val mdx = QueryService.buildMdx(QueryService.QueryRequest(
      "Sales", Seq("sum_qty"),
      Seq(QueryService.RowSpec("[Customer]", "[Customer].[Geo]", levelNumber = Some(2)))))
    assert(mdx.contains("[Customer].[Geo].Levels(2).MEMBERS"))
    val df = QueryService.execute(spark, sf, QueryService.QueryRequest(
      "Sales", Seq("sum_qty"),
      Seq(QueryService.RowSpec("[Customer]", "[Customer].[Geo]", levelNumber = Some(2)))))
    assert(df.columns.toSeq == Seq("nation", "sum_qty"))
  }
}

class DmvExtrasSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("MDSCHEMA_PROPERTIES lists one property per ancestor level") {
    val p = graft.meta.Dmv.mdschemaProperties(spark).collect()
    assert(p.nonEmpty)
    // Sales [Customer].[Geo].[Nation] has exactly one ancestor: Region
    val nation = p.filter(r =>
      r.getAs[String]("LEVEL_UNIQUE_NAME") == "[Customer].[Geo].[Nation]" &&
        r.getAs[String]("CUBE_NAME") == "Sales")
    assert(nation.map(_.getAs[String]("PROPERTY_NAME")).toSeq == Seq("Region"))
  }

  test("main-cube rule takes the FIRST non-$ cube in rowset order (P12)") {
    assert(graft.meta.Dmv.mainCube(Seq("$system", "Ventas", "Alpha")) == Some("Ventas"))
    assert(graft.meta.Dmv.mainCube(Seq("$a", "$b")).isEmpty)
  }

  test("rolling-hash fingerprint is shift-sensitive but content-deterministic") {
    import spark.implicits._
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefgh"), (3L, "habcdefg")).toDF("doc_id", "text")
    val rows = graft.ext.TextAnalysis.rollingHashFingerprint(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == rows(2L))            // same content, same fingerprint
    assert(rows(1L)._1 == 4)                // 8 chars -> 4 5-grams
    assert(rows(1L) != rows(3L))            // rotation changes the gram set
  }
}
