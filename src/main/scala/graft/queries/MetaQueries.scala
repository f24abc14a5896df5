package graft.queries

import graft.meta.Dmv
import graft.mdx.SalesCube
import graft.model.MemberCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-surface queries: the DMV rowset protocol (S2/S3) and the X1
  * level-inference routine, oracle-checked. */
object MetaQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Restricted DMV scan over registered metadata views — projection,
    // predicate, join and ORDER BY in plain SQL, like the reference's
    // `SELECT [cols] FROM $system.MDSCHEMA_LEVELS WHERE ... ORDER BY ...`.
    "q50_dmv_levels" -> ((s, d) => {
      Dmv.registerAll(s, d)
      s.sql(
        """SELECT l.CUBE_NAME         AS cube_name,
          |       l.LEVEL_UNIQUE_NAME AS level_unique_name,
          |       l.LEVEL_CAPTION     AS level_caption,
          |       l.LEVEL_NUMBER      AS level_number,
          |       h.HIERARCHY_NAME    AS hierarchy_name
          |FROM MDSCHEMA_LEVELS l
          |JOIN MDSCHEMA_HIERARCHIES h
          |  ON l.HIERARCHY_UNIQUE_NAME = h.HIERARCHY_UNIQUE_NAME
          | AND l.CUBE_NAME = h.CUBE_NAME
          |WHERE h.HIERARCHY_IS_VISIBLE AND l.LEVEL_NUMBER > 0
          |ORDER BY cube_name, level_unique_name""".stripMargin)
    }),

    // X1: infer the level taxonomy of a new-generation hierarchy
    // (explicit level segments) and an old one (synthesized "Nivel N").
    "q51_level_inference" -> ((s, d) => {
      val m = MemberCatalog.members(s, d)
      Seq("[Customer].[Geo]", "[Customer].[GeoOld]")
        .map(h => Dmv.extractLevels(m, h).withColumn("jerarquia", lit(h)))
        .reduce(_.unionByName(_))
        .select(col("jerarquia"), col("level_depth"), col("level_name"))
        .orderBy(col("jerarquia"), col("level_depth"))
    }),

    // get_apartados rows: depth-1 Variables members with display index
    // (W1) and child counts — the golden-response projection
    // (ref `backend/olap_service.py:153-194`).
    "q52_apartados" -> ((s, d) =>
      graft.service.ApartadosService.apartadoRows(MemberCatalog.members(s, d))
        .orderBy(col("id")))
  )

  /** The static-rowset oracle is a VALUES literal generated from the same
    * cube registry the Spark side reads — no drift possible. */
  private def dmvLevelsOracle: String = {
    val rows = SalesCube.registry.values.toSeq.flatMap(c =>
      c.hierarchies.flatMap(h => h.levels.map { l =>
        val hname = h.hier.split("\\.").last.stripPrefix("[").stripSuffix("]")
        s"('${c.name}', '${h.hier}.[${l.name}]', '${l.name}', ${l.number}, '$hname')"
      }))
    s"""SELECT * FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |t(cube_name, level_unique_name, level_caption, level_number, hierarchy_name)
       |ORDER BY cube_name, level_unique_name""".stripMargin
  }

  private def levelSegRe = """^\[[^\]]*\]\.\[[^\]]*\]\.\[([^\]]*)\]\.&\["""

  private def inferOracle(h: String, alias: String): String =
    s"""samp$alias AS (
       |  SELECT MIEMBRO_UNIQUE_NAME u FROM members WHERE JERARQUIA = '$h'
       |  ORDER BY len(MIEMBRO_UNIQUE_NAME) DESC, MIEMBRO_UNIQUE_NAME LIMIT 50),
       |d$alias AS (
       |  SELECT CAST(len(string_split(u, '.&[')) - 1 AS INT) level_depth,
       |    nullif(regexp_extract(u, '$levelSegRe', 1), '') seg
       |  FROM samp$alias),
       |g$alias AS (
       |  SELECT '$h' jerarquia, level_depth,
       |    coalesce(min(seg), 'Nivel ' || level_depth) level_name
       |  FROM d$alias GROUP BY level_depth)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q50_dmv_levels" -> dmvLevelsOracle,
    "q51_level_inference" -> (MemberCatalog.oracleCte.stripSuffix("\n") + ",\n" +
      inferOracle("[Customer].[Geo]", "1") + ",\n" +
      inferOracle("[Customer].[GeoOld]", "2") + "\n" +
      """SELECT * FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
        |ORDER BY jerarquia, level_depth""".stripMargin),

    "q52_apartados" -> (MemberCatalog.oracleCte +
      """SELECT CAST(row_number() OVER (ORDER BY MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME) AS INT) AS id,
        |  MIEMBRO_CAPTION AS caption,
        |  MIEMBRO_UNIQUE_NAME AS unique_name,
        |  CHILDREN_CARDINALITY AS variables_count
        |FROM members
        |WHERE (upper(JERARQUIA) LIKE '%APARTADO%' OR upper(DIMENSION) LIKE '%VARIABLES%')
        |  AND len(string_split(MIEMBRO_UNIQUE_NAME, '.&[')) - 1 = 1
        |  AND MIEMBRO_CAPTION <> 'All'
        |ORDER BY id""".stripMargin)
  )
}
