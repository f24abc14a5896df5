package graft.service

import graft.mdx.{MdxLowerer, SalesCube}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synchronous query front door mirroring the reference's REST IR
  * (`backend/api_server.py:83-91`: catalog + measures + row specs +
  * member filters) and its client-side MDX assembly
  * (`frontend/src/utils/mdxBuilder.ts:4-40`,
  * `backend/olap_service.py:346-430`): the request is rendered to MDX
  * text, then parsed/lowered by the engine — one code path for both the
  * MDX and JSON entry points.
  */
object QueryService {

  /** Row-axis spec: explicit level name ("new cube") or positional
    * `levelNumber` fallback when level names are unknown ("old cube" —
    * the X2 `Levels(n)` branch, ref `olap_service.py:432-453`). */
  final case class RowSpec(dimension: String, hierarchy: String,
      level: String = "", levelNumber: Option[Int] = None)
  final case class FilterSpec(memberUniqueNames: Seq[String])
  final case class QueryRequest(
      cube: String,
      measures: Seq[String],
      rows: Seq[RowSpec],
      filters: Seq[FilterSpec] = Nil,
      nonEmpty: Boolean = true)

  /** AG-Grid-shaped result (`backend/olap_service.py:337-344`). */
  final case class ColumnDef(field: String, headerName: String,
      sortable: Boolean = true, filter: Boolean = true)
  final case class QueryResult(rows: Seq[Map[String, Any]],
      columns: Seq[ColumnDef], rowCount: Long)

  /** Render the request to MDX text (the reference's builder emits the
    * same right-fold CROSSJOIN shape, `mdxBuilder.ts:33-39`). */
  def buildMdx(req: QueryRequest): String = {
    val cols = req.measures.map(m => s"[Measures].[$m]").mkString("{", ", ", "}")
    val rowSets = req.rows.map { r =>
      if (r.level.nonEmpty) s"${r.hierarchy}.[${r.level}].MEMBERS"
      else r.levelNumber match {
        case Some(n) => s"${r.hierarchy}.Levels($n).MEMBERS"
        case None => s"${r.hierarchy}.MEMBERS"
      }
    }
    val rowsClause = rowSets match {
      case Nil => ""
      case sets =>
        val folded = sets.reduceRight((a, b) => s"CROSSJOIN($a, $b)")
        val ne = if (req.nonEmpty) "NON EMPTY " else ""
        s", $ne$folded ON ROWS"
    }
    val slicer = req.filters.flatMap(_.memberUniqueNames) match {
      case Nil => ""
      case ms => ms.mkString(" WHERE (", " AND ", ")")
    }
    s"SELECT $cols ON COLUMNS$rowsClause FROM [${req.cube}]$slicer"
  }

  def execute(spark: SparkSession, sfDir: String, req: QueryRequest): DataFrame = {
    // P13 guard on every identifier that reaches the MDX text.
    (req.cube +: (req.measures ++
        req.rows.flatMap(r => Seq(r.dimension, r.hierarchy, r.level)) ++
        req.filters.flatMap(_.memberUniqueNames))).foreach { ident =>
      graft.ops.Validators.validateQueryText(ident) match {
        case Left(err) => throw new IllegalArgumentException(s"invalid input: $err")
        case Right(_) => ()
      }
    }
    MdxLowerer.run(spark, sfDir, buildMdx(req), SalesCube.registry)
  }

  /** Execute and encode as the AG-Grid result shape. Driver-side collect
    * is intentional: this is the interactive API (bounded pages), not the
    * engine path. */
  def executeForGrid(spark: SparkSession, sfDir: String, req: QueryRequest,
                     maxRows: Int = 1000): QueryResult = {
    val df = execute(spark, sfDir, req)
    val cols = df.columns.toSeq.map(c => ColumnDef(c, c))
    val rows = df.limit(maxRows).collect().toSeq.map { r =>
      cols.map(c => c.field -> r.getAs[Any](c.field)).toMap
    }
    QueryResult(rows, cols, rows.size.toLong)
  }
}
