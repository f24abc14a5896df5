package graft.meta

import graft.mdx.{CubeDef, SalesCube}
import graft.model.MemberCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DMV metadata rowsets: the `$system.MDSCHEMA_*` / `DBSCHEMA_CATALOGS`
  * surface (SURVEY.md §1.1, §2.1 S2/S3) as DataFrames + temp views, so
  * the whole discovery scanner protocol runs as plain `spark.sql`
  * (ref rowset list `scanner/DGIS_SCAN_2_stable.py:257-268`, restricted
  * scans `backend/actions_runner.py:124,143,288,337,342`).
  *
  * Static rowsets derive from the cube registry (driver-sized); MEMBERS
  * derives from the member catalog tables. Predicates/projections/ORDER
  * BY on the views are pushed/pruned by Catalyst exactly like the
  * reference pushes them into the DMV engine.
  */
object Dmv {

  private def cubesOf(reg: Map[String, CubeDef]) = reg.values.toSeq

  def dbschemaCatalogs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("SALES", "TPC-H-ish star schema catalog"),
      ("SALES_OLD", "Legacy cube generation (no level names)"))
      .toDF("CATALOG_NAME", "DESCRIPTION")
  }

  def mdschemaCubes(spark: SparkSession,
                    reg: Map[String, CubeDef] = SalesCube.registry): DataFrame = {
    import spark.implicits._
    cubesOf(reg).map(c => c.name).toDF("CUBE_NAME")
  }

  def mdschemaDimensions(spark: SparkSession,
                         reg: Map[String, CubeDef] = SalesCube.registry): DataFrame = {
    import spark.implicits._
    cubesOf(reg).flatMap(c => c.hierarchies.map(h =>
      (h.dim, h.dim.stripPrefix("[").stripSuffix("]"), c.name)))
      .distinct
      .toDF("DIMENSION_UNIQUE_NAME", "DIMENSION_CAPTION", "CUBE_NAME")
  }

  def mdschemaHierarchies(spark: SparkSession,
                          reg: Map[String, CubeDef] = SalesCube.registry): DataFrame = {
    import spark.implicits._
    cubesOf(reg).flatMap(c => c.hierarchies.map(h =>
      (h.hier.split("\\.").last.stripPrefix("[").stripSuffix("]"),
        h.hier, h.dim, true, c.name)))
      .toDF("HIERARCHY_NAME", "HIERARCHY_UNIQUE_NAME", "DIMENSION_UNIQUE_NAME",
        "HIERARCHY_IS_VISIBLE", "CUBE_NAME")
  }

  def mdschemaLevels(spark: SparkSession,
                     reg: Map[String, CubeDef] = SalesCube.registry): DataFrame = {
    import spark.implicits._
    cubesOf(reg).flatMap(c => c.hierarchies.flatMap(h => h.levels.map(l =>
      (s"${h.hier}.[${l.name}]", l.name, l.number, h.hier, c.name))))
      .toDF("LEVEL_UNIQUE_NAME", "LEVEL_CAPTION", "LEVEL_NUMBER",
        "HIERARCHY_UNIQUE_NAME", "CUBE_NAME")
  }

  def mdschemaMeasures(spark: SparkSession,
                       reg: Map[String, CubeDef] = SalesCube.registry): DataFrame = {
    import spark.implicits._
    cubesOf(reg).flatMap(c => c.measures.map(m =>
      (m.name, s"[Measures].[${m.name}]", m.name, m.aggregator, true, c.name)))
      .toDF("MEASURE_NAME", "MEASURE_UNIQUE_NAME", "MEASURE_CAPTION",
        "MEASURE_AGGREGATOR", "MEASURE_IS_VISIBLE", "CUBE_NAME")
  }

  /** MDSCHEMA_PROPERTIES: one member property per ancestor level of each
    * non-root level (the DIMENSION PROPERTIES targets; FIXTURES.md §2). */
  def mdschemaProperties(spark: SparkSession,
                         reg: Map[String, CubeDef] = SalesCube.registry): DataFrame = {
    import spark.implicits._
    cubesOf(reg).flatMap(c => c.hierarchies.flatMap(h =>
      h.levels.flatMap(l => h.levels.filter(_.number < l.number).map(anc =>
        (c.name, h.dim, s"${h.hier}.[${l.name}]", anc.name, anc.name)))))
      .toDF("CUBE_NAME", "DIMENSION_UNIQUE_NAME", "LEVEL_UNIQUE_NAME",
        "PROPERTY_NAME", "PROPERTY_CAPTION")
  }

  /** P12 + main-cube rule: FIRST cube (in rowset order, like the
    * reference's `candidates[0]`) whose name has no `$` prefix
    * (ref `scanner/DGIS_SCAN_2_stable.py:1371-1374`,
    * `backend/actions_runner.py:321-329`). */
  def mainCube(cubeNames: Seq[String]): Option[String] =
    cubeNames.find(!_.startsWith("$"))

  /** MDSCHEMA_MEMBERS over the member catalog (English column names; the
    * cache-CSV Spanish names live in MemberCatalog, P2 rename). */
  def mdschemaMembers(spark: SparkSession, sfDir: String): DataFrame =
    MemberCatalog.members(spark, sfDir).select(
      col("CATALOGO").as("CATALOG_NAME"),
      col("DIMENSION").as("DIMENSION_UNIQUE_NAME"),
      col("JERARQUIA").as("HIERARCHY_UNIQUE_NAME"),
      col("NIVEL_NOMBRE").as("LEVEL_NAME"),
      col("NIVEL_NUMERO").as("LEVEL_NUMBER"),
      col("MIEMBRO_CAPTION").as("MEMBER_CAPTION"),
      col("MIEMBRO_UNIQUE_NAME").as("MEMBER_UNIQUE_NAME"),
      col("PARENT_UNIQUE_NAME"),
      col("CHILDREN_CARDINALITY"),
      col("MIEMBRO_ORDINAL").as("MEMBER_ORDINAL"))

  /** Register every rowset as a temp view (S2: `spark.table("MDSCHEMA_X")`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    dbschemaCatalogs(spark).createOrReplaceTempView("DBSCHEMA_CATALOGS")
    mdschemaCubes(spark).createOrReplaceTempView("MDSCHEMA_CUBES")
    mdschemaDimensions(spark).createOrReplaceTempView("MDSCHEMA_DIMENSIONS")
    mdschemaHierarchies(spark).createOrReplaceTempView("MDSCHEMA_HIERARCHIES")
    mdschemaLevels(spark).createOrReplaceTempView("MDSCHEMA_LEVELS")
    mdschemaMeasures(spark).createOrReplaceTempView("MDSCHEMA_MEASURES")
    mdschemaProperties(spark).createOrReplaceTempView("MDSCHEMA_PROPERTIES")
    mdschemaMembers(spark, sfDir).createOrReplaceTempView("MDSCHEMA_MEMBERS")
  }

  /** X1 level inference (`extract_levels_from_unique_names`,
    * ref `scanner/DGIS_SCAN_2_stable.py:754-816`): sample the 50 longest
    * unique names of a hierarchy, depth = `.&[` count, level name = the
    * explicit level segment when present ("new cube") else synthesized
    * `"Nivel N"` ("old cube"). Pure column algebra, no UDF. */
  def extractLevels(members: DataFrame, hier: String): DataFrame = {
    val sample = members
      .where(col("JERARQUIA") === hier)
      .orderBy(length(col("MIEMBRO_UNIQUE_NAME")).desc, col("MIEMBRO_UNIQUE_NAME"))
      .limit(50)
    sample
      .select(UniqueNames.depth(col("MIEMBRO_UNIQUE_NAME")).as("level_depth"),
        UniqueNames.levelNameSegment(col("MIEMBRO_UNIQUE_NAME")).as("seg"))
      .groupBy(col("level_depth"))
      .agg(min(col("seg")).as("explicit_name"))
      .select(col("level_depth"),
        coalesce(col("explicit_name"),
          concat(lit("Nivel "), col("level_depth"))).as("level_name"))
  }
}
