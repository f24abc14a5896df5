package graft.queries

import graft.Tables
import graft.meta.UniqueNames
import graft.model.MemberCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.2–§2.8), one named
  * query per operator family, each with a DuckDB oracle.
  *
  * Conventions shared with the oracles:
  *  - every output column lower_snake_case and explicitly aliased on both
  *    sides (driver compare sorts columns by name);
  *  - money/measure sums go through `decimal` casts so Spark and DuckDB
  *    produce bit-identical exact arithmetic regardless of ordering;
  *  - every query ends in a total deterministic ORDER BY.
  *
  * Scale notes are per-query; the common ones: dimension tables (region,
  * nation, member catalog) are broadcast-sized by construction, fact-side
  * scans rely on Catalyst pushdown (verified via explain in BenchSpec).
  */
object Relational {

  private[queries] def members(s: SparkSession, d: String): DataFrame =
    MemberCatalog.members(s, d)

  private[queries] val mcte = MemberCatalog.oracleCte

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 + P-filters: measure aggregation with SUM/COUNT aggregators
    // (ref MEASURE_AGGREGATOR `backend/olap_service.py:110`).
    // Scale: partial hash agg map-side; 6-group output. Filter pushed to scan.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J3 star join + A1: fact ⋈ 4 dims. Dims broadcast (region/nation tiny,
    // customer small relative to fact); only the fact side shuffles for the
    // final agg — at 100 TB the agg keys are 25 nations, so partial agg
    // collapses the shuffle to bytes.
    "q02_revenue_by_nation" -> ((s, d) => {
      // Materialized-aggregate rewrite: region/nation × sum_disc_price is
      // covered by the cube's base grain, so the flagship pivot rolls up
      // the ~52 k-row session-materialized pre-aggregate instead of
      // re-scanning + shuffling the fact — decimal partial sums
      // re-aggregate exactly (bit-identical to the flat star join, which
      // the preAgg build itself still performs once per session). The
      // cold cost is the aggregate build, measured by Bench's cold pass.
      val agg = graft.mdx.MdxLowerer.coveringAggregate(s, d,
        graft.mdx.SalesCube.cube, Seq("r_name", "n_name")).get
      agg
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(col("sum_disc_price")).as("revenue"))
        .select(col("n_name").as("nation"), col("revenue"))
        .orderBy(desc("revenue"), col("nation"))
    }),

    // P3/P4/P6/P9/P10/P11: equality, inequality, case-insensitive contains,
    // depth-derived predicate, numeric compare, null handling.
    "q03_filter_members" -> ((s, d) => {
      members(s, d)
        .where(col("CATALOGO") === "SALES")
        .where(col("MIEMBRO_CAPTION") =!= "All")
        .where(upper(col("MIEMBRO_CAPTION")).contains("AR"))
        .where(UniqueNames.depth(col("MIEMBRO_UNIQUE_NAME")) === 2)
        .where(col("NIVEL_NUMERO") > 0)
        .where(col("NIVEL_NOMBRE").isNotNull)
        .select(col("MIEMBRO_CAPTION").as("caption"),
          col("MIEMBRO_UNIQUE_NAME").as("unique_name"))
        .orderBy(col("unique_name"))
    }),

    // J1 parent–child equi-join (ref `backend/olap_service.py:250-257`).
    // Parent side = handful of members → broadcast hash join.
    "q04_parent_child_join" -> ((s, d) => {
      val m = members(s, d).where(col("CATALOGO") === "SALES")
      val parents = m.where(col("NIVEL_NOMBRE") === "Apartado")
        .where(col("MIEMBRO_CAPTION").isin("Brand#1", "Brand#7", "Brand#13"))
        .select(col("MIEMBRO_UNIQUE_NAME").as("parent_unique"),
          col("MIEMBRO_CAPTION").as("apartado"))
      val children = m.where(col("NIVEL_NOMBRE") === "Variable")
      children.join(broadcast(parents),
          children("PARENT_UNIQUE_NAME") === parents("parent_unique"))
        .select(col("apartado"), col("MIEMBRO_CAPTION").as("variable"),
          col("MIEMBRO_UNIQUE_NAME").as("unique_name"))
        .orderBy(col("apartado"), col("unique_name"))
    }),

    // J2 prefix join for "old cubes" without PARENT_UNIQUE_NAME
    // (ref `scanner/DGIS_SCAN_2_stable.py:1044-1049`). Parent side tiny →
    // BroadcastNestedLoopJoin; scale path is the derived-parent-key
    // equi-join (UniqueNames.parentByPrefix) used in q05b semantics.
    "q05_prefix_join" -> ((s, d) => {
      val m = members(s, d).where(col("CATALOGO") === "SALES_OLD")
      val parents = m.where(col("NIVEL_NUMERO") === 1)
        .select(col("MIEMBRO_UNIQUE_NAME").as("parent_unique"),
          col("MIEMBRO_CAPTION").as("parent_caption"))
      val children = m.select(col("MIEMBRO_UNIQUE_NAME").as("child_unique"),
        col("MIEMBRO_CAPTION").as("child_caption"))
      children.join(broadcast(parents),
          children("child_unique").startsWith(parents("parent_unique")) &&
          children("child_unique") =!= parents("parent_unique"))
        .select(col("parent_caption"), col("child_caption"), col("child_unique"))
        .orderBy(col("parent_caption"), col("child_unique"))
    }),

    // J4 CROSSJOIN of two member sets (axis product).
    "q06_crossjoin" -> ((s, d) => {
      val r = Tables.region(s, d).select(col("r_name").as("region"))
      val b = Tables.part(s, d).select(col("p_brand").as("brand")).distinct()
      r.crossJoin(b).orderBy(col("region"), col("brand"))
    }),

    // A6/A7 distinct / unique values.
    "q07_distinct_pairs" -> ((s, d) => {
      members(s, d)
        .select(col("DIMENSION").as("dimension"), col("JERARQUIA").as("jerarquia"))
        .distinct()
        .orderBy(col("dimension"), col("jerarquia"))
    }),

    // T2 top-k by string length (ref `nlargest(50,'len')`
    // `scanner/DGIS_SCAN_2_stable.py:774-776`). TakeOrdered — no full sort.
    "q08_topk_longest" -> ((s, d) => {
      members(s, d)
        .select(col("MIEMBRO_UNIQUE_NAME").as("unique_name"),
          length(col("MIEMBRO_UNIQUE_NAME")).as("len"))
        .orderBy(desc("len"), col("unique_name"))
        .limit(50)
    }),

    // T1/T4 multi-key sort + offset pagination
    // (ref `workers/api/src/routes/members.ts:17-39`).
    "q09_pagination" -> ((s, d) => {
      members(s, d)
        .where(col("JERARQUIA") === "[Customer].[Geo]")
        .select(col("NIVEL_NUMERO").as("nivel_numero"),
          col("MIEMBRO_CAPTION").as("caption"),
          col("MIEMBRO_UNIQUE_NAME").as("unique_name"))
        .orderBy(col("nivel_numero"), col("caption"), col("unique_name"))
        .offset(5).limit(10)
    }),

    // W1/W3 row_number display index over ordinal order
    // (ref `backend/olap_service.py:186-194`).
    "q10_window_rownum" -> ((s, d) => {
      val w = Window.partitionBy(col("nivel_numero"))
        .orderBy(col("ordinal"), col("caption"))
      members(s, d)
        .where(col("JERARQUIA") === "[Customer].[Geo]")
        .select(col("NIVEL_NUMERO").as("nivel_numero"),
          col("MIEMBRO_ORDINAL").as("ordinal"),
          col("MIEMBRO_CAPTION").as("caption"))
        .withColumn("rn", row_number().over(w))
        .orderBy(col("nivel_numero"), col("rn"))
    }),

    // U1 union accumulation (ref `pd.concat` apartado/variable merge
    // `scanner/DGIS_SCAN_2_stable.py:1037-1051`).
    "q11_union" -> ((s, d) => {
      val m = members(s, d).where(col("DIMENSION") === "[DIM VARIABLES]")
      val apart = m.where(col("NIVEL_NOMBRE") === "Apartado")
        .select(col("MIEMBRO_CAPTION").as("caption"),
          col("MIEMBRO_UNIQUE_NAME").as("unique_name"))
      val vars = m.where(col("NIVEL_NOMBRE") === "Variable")
        .where(col("PARENT_UNIQUE_NAME").contains("&[Brand#1]"))
        .select(col("MIEMBRO_CAPTION").as("caption"),
          col("MIEMBRO_UNIQUE_NAME").as("unique_name"))
      apart.unionByName(vars).orderBy(col("unique_name"))
    }),

    // A9 children_cardinality self-aggregation.
    "q12_children_cardinality" -> ((s, d) => {
      members(s, d)
        .where(col("PARENT_UNIQUE_NAME").isNotNull)
        .groupBy(col("PARENT_UNIQUE_NAME").as("parent_unique_name"))
        .agg(count(lit(1)).as("n_children"))
        .orderBy(col("parent_unique_name"))
    }),

    // A8 cardinality estimation inputs: member counts per level
    // (ref `scanner/DGIS_SCAN_2_stable.py:866-901`; the product/warning is
    // driver-side — see ops.MemberOps.estimateResultSize).
    "q13_cardinality_estimate" -> ((s, d) => {
      members(s, d)
        .where(col("CATALOGO") === "SALES")
        .groupBy(col("JERARQUIA").as("jerarquia"),
          col("NIVEL_NUMERO").as("nivel_numero"))
        .agg(countDistinct(col("MIEMBRO_UNIQUE_NAME")).as("n_members"))
        .orderBy(col("jerarquia"), col("nivel_numero"))
    }),

    // F3/F4/F5/F6 string algebra over unique names (X1 building blocks).
    "q14_string_funcs" -> ((s, d) => {
      members(s, d)
        .where(col("JERARQUIA").isin("[Customer].[Geo]", "[Customer].[GeoOld]"))
        .select(
          col("MIEMBRO_UNIQUE_NAME").as("unique_name"),
          UniqueNames.depth(col("MIEMBRO_UNIQUE_NAME")).as("depth"),
          UniqueNames.lastKey(col("MIEMBRO_UNIQUE_NAME")).as("last_key"),
          UniqueNames.levelNameSegment(col("MIEMBRO_UNIQUE_NAME")).as("level_segment"),
          length(col("MIEMBRO_UNIQUE_NAME")).as("len"))
        .orderBy(col("unique_name"))
    }),

    // Rollup subtotals = SSAS `All` members (SURVEY §2.4 note).
    "q15_rollup" -> ((s, d) => {
      // Covering-aggregate rewrite (q02's pattern): the rollup's leaf
      // grain (region, nation) sits in the cube's base grain, and ROLLUP
      // grouping sets are themselves sums of SUM partials — so the
      // grouping-set expansion triples the ~52 k-row session
      // pre-aggregate, never the raw fact. Decimal partial sums keep the
      // result bit-identical to the flat star-join form.
      val agg = graft.mdx.MdxLowerer.coveringAggregate(s, d,
        graft.mdx.SalesCube.cube, Seq("r_name", "n_name")).get
      agg
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("sum_qty")).as("sum_qty"))
        .select(
          col("r_name").as("region"), col("n_name").as("nation"),
          col("sum_qty"),
          when(col("r_name").isNull, 2).when(col("n_name").isNull, 1)
            .otherwise(0).as("lvl"))
        .orderBy(col("lvl"), col("region"), col("nation"))
    }),

    // F13 date parts + A1 over orders.
    "q16_orders_by_year" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("total_price"))
        .orderBy(col("order_year"))
    }),

    // F14/X4 checksum hash (md5 — deterministic across engines).
    "q17_hash_md5" -> ((s, d) => {
      members(s, d)
        .where(col("JERARQUIA") === "[Customer].[Geo]")
        .select(col("MIEMBRO_UNIQUE_NAME").as("unique_name"),
          md5(col("MIEMBRO_UNIQUE_NAME").cast("binary")).as("checksum"))
        .orderBy(col("unique_name"))
    }),

    // F17 full-text-ish search (case-insensitive contains; the reference's
    // Spanish FTS divergence is documented in SURVEY §7.4).
    "q18_search_docs" -> ((s, d) => {
      Tables.documents(s, d)
        .where(lower(col("text")).contains("spark merge"))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Streaming batch-equivalent: tumbling 1 h window over events
    // (Q5; the streaming form lives in graft.streaming.EventsStream).
    "q19_events_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // F12 NaN/inf → null sanitize (ref `backend/olap_service.py:326-334`).
    "q20_sanitize" -> ((s, d) => {
      val raw = Tables.lineitem(s, d)
        .withColumn("ratio",
          when(col("l_tax") === 0, lit(Double.NaN))
            .otherwise(col("l_discount") / col("l_tax")))
      val clean = raw.withColumn("ratio_clean",
        when(isnan(col("ratio")) || col("ratio") === Double.PositiveInfinity
          || col("ratio") === Double.NegativeInfinity, lit(null))
          .otherwise(col("ratio")))
      clean.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("ratio_clean")).as("n_clean"),
          sum(when(isnan(col("ratio")), 1).otherwise(0)).as("n_nan"))
        .orderBy(col("l_returnflag"))
    }),

    // S2/S3 DMV-style restricted scan over a metadata view with projection,
    // predicates and ORDER BY pushed down (ref `backend/actions_runner.py:143`).
    "q21_dmv_members" -> ((s, d) => {
      members(s, d).createOrReplaceTempView("mdschema_members_v")
      s.sql(
        """SELECT MIEMBRO_UNIQUE_NAME AS member_unique_name,
          |       MIEMBRO_CAPTION     AS member_caption,
          |       NIVEL_NUMERO        AS level_number
          |FROM mdschema_members_v
          |WHERE JERARQUIA = '[Customer].[Geo]' AND NIVEL_NUMERO > 0
          |ORDER BY level_number ASC, member_unique_name ASC
          |""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, nation""".stripMargin,

    "q03_filter_members" -> (mcte +
      """SELECT MIEMBRO_CAPTION AS caption, MIEMBRO_UNIQUE_NAME AS unique_name
        |FROM members
        |WHERE CATALOGO = 'SALES' AND MIEMBRO_CAPTION <> 'All'
        |  AND contains(upper(MIEMBRO_CAPTION), 'AR')
        |  AND len(string_split(MIEMBRO_UNIQUE_NAME, '.&[')) - 1 = 2
        |  AND NIVEL_NUMERO > 0 AND NIVEL_NOMBRE IS NOT NULL
        |ORDER BY unique_name""".stripMargin),

    "q04_parent_child_join" -> (mcte +
      """SELECT p.MIEMBRO_CAPTION AS apartado, c.MIEMBRO_CAPTION AS variable,
        |       c.MIEMBRO_UNIQUE_NAME AS unique_name
        |FROM members c
        |JOIN members p ON c.PARENT_UNIQUE_NAME = p.MIEMBRO_UNIQUE_NAME
        |WHERE c.CATALOGO = 'SALES' AND c.NIVEL_NOMBRE = 'Variable'
        |  AND p.NIVEL_NOMBRE = 'Apartado'
        |  AND p.MIEMBRO_CAPTION IN ('Brand#1', 'Brand#7', 'Brand#13')
        |ORDER BY apartado, unique_name""".stripMargin),

    "q05_prefix_join" -> (mcte +
      """SELECT p.MIEMBRO_CAPTION AS parent_caption,
        |       c.MIEMBRO_CAPTION AS child_caption,
        |       c.MIEMBRO_UNIQUE_NAME AS child_unique
        |FROM members c
        |JOIN members p
        |  ON starts_with(c.MIEMBRO_UNIQUE_NAME, p.MIEMBRO_UNIQUE_NAME)
        | AND c.MIEMBRO_UNIQUE_NAME <> p.MIEMBRO_UNIQUE_NAME
        |WHERE c.CATALOGO = 'SALES_OLD' AND p.CATALOGO = 'SALES_OLD'
        |  AND p.NIVEL_NUMERO = 1
        |ORDER BY parent_caption, child_unique""".stripMargin),

    "q06_crossjoin" ->
      """SELECT r_name AS region, brand
        |FROM region, (SELECT DISTINCT p_brand AS brand FROM part) b
        |ORDER BY region, brand""".stripMargin,

    "q07_distinct_pairs" -> (mcte +
      """SELECT DISTINCT DIMENSION AS dimension, JERARQUIA AS jerarquia
        |FROM members ORDER BY dimension, jerarquia""".stripMargin),

    "q08_topk_longest" -> (mcte +
      """SELECT MIEMBRO_UNIQUE_NAME AS unique_name,
        |       len(MIEMBRO_UNIQUE_NAME) AS len
        |FROM members
        |ORDER BY len DESC, unique_name LIMIT 50""".stripMargin),

    "q09_pagination" -> (mcte +
      """SELECT NIVEL_NUMERO AS nivel_numero, MIEMBRO_CAPTION AS caption,
        |       MIEMBRO_UNIQUE_NAME AS unique_name
        |FROM members WHERE JERARQUIA = '[Customer].[Geo]'
        |ORDER BY nivel_numero, caption, unique_name
        |LIMIT 10 OFFSET 5""".stripMargin),

    "q10_window_rownum" -> (mcte +
      """SELECT NIVEL_NUMERO AS nivel_numero, MIEMBRO_ORDINAL AS ordinal,
        |       MIEMBRO_CAPTION AS caption,
        |       row_number() OVER (PARTITION BY NIVEL_NUMERO
        |                          ORDER BY MIEMBRO_ORDINAL, MIEMBRO_CAPTION) AS rn
        |FROM members WHERE JERARQUIA = '[Customer].[Geo]'
        |ORDER BY nivel_numero, rn""".stripMargin),

    "q11_union" -> (mcte +
      """SELECT MIEMBRO_CAPTION AS caption, MIEMBRO_UNIQUE_NAME AS unique_name
        |FROM members
        |WHERE DIMENSION = '[DIM VARIABLES]' AND NIVEL_NOMBRE = 'Apartado'
        |UNION ALL
        |SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
        |FROM members
        |WHERE DIMENSION = '[DIM VARIABLES]' AND NIVEL_NOMBRE = 'Variable'
        |  AND contains(PARENT_UNIQUE_NAME, '&[Brand#1]')
        |ORDER BY unique_name""".stripMargin),

    "q12_children_cardinality" -> (mcte +
      """SELECT PARENT_UNIQUE_NAME AS parent_unique_name, count(*) AS n_children
        |FROM members WHERE PARENT_UNIQUE_NAME IS NOT NULL
        |GROUP BY PARENT_UNIQUE_NAME
        |ORDER BY parent_unique_name""".stripMargin),

    "q13_cardinality_estimate" -> (mcte +
      """SELECT JERARQUIA AS jerarquia, NIVEL_NUMERO AS nivel_numero,
        |       count(DISTINCT MIEMBRO_UNIQUE_NAME) AS n_members
        |FROM members WHERE CATALOGO = 'SALES'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q14_string_funcs" -> (mcte +
      """SELECT MIEMBRO_UNIQUE_NAME AS unique_name,
        |  CAST(len(string_split(MIEMBRO_UNIQUE_NAME, '.&[')) - 1 AS INT) AS depth,
        |  regexp_extract(MIEMBRO_UNIQUE_NAME, '\.&\[([^\]]*)\]$', 1) AS last_key,
        |  CASE WHEN regexp_extract(MIEMBRO_UNIQUE_NAME,
        |    '^\[[^\]]*\]\.\[[^\]]*\]\.\[([^\]]*)\]\.&\[', 1) = '' THEN NULL
        |    ELSE regexp_extract(MIEMBRO_UNIQUE_NAME,
        |    '^\[[^\]]*\]\.\[[^\]]*\]\.\[([^\]]*)\]\.&\[', 1) END AS level_segment,
        |  len(MIEMBRO_UNIQUE_NAME) AS len
        |FROM members
        |WHERE JERARQUIA IN ('[Customer].[Geo]', '[Customer].[GeoOld]')
        |ORDER BY unique_name""".stripMargin),

    "q15_rollup" ->
      """SELECT r_name AS region, n_name AS nation,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CASE WHEN r_name IS NULL THEN 2 WHEN n_name IS NULL THEN 1 ELSE 0 END AS lvl
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY lvl, region, nation""".stripMargin,

    "q16_orders_by_year" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_hash_md5" -> (mcte +
      """SELECT MIEMBRO_UNIQUE_NAME AS unique_name,
        |       md5(MIEMBRO_UNIQUE_NAME) AS checksum
        |FROM members WHERE JERARQUIA = '[Customer].[Geo]'
        |ORDER BY unique_name""".stripMargin),

    "q18_search_docs" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE contains(lower(text), 'spark merge')
        |ORDER BY doc_id""".stripMargin,

    "q19_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q20_sanitize" ->
      """WITH raw AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_tax = 0 THEN 'nan'::DOUBLE
        |         ELSE l_discount / l_tax END AS ratio
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  count(CASE WHEN isnan(ratio) OR ratio = 'inf'::DOUBLE
        |             OR ratio = '-inf'::DOUBLE THEN NULL ELSE ratio END) AS n_clean,
        |  CAST(sum(CASE WHEN isnan(ratio) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan
        |FROM raw GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q21_dmv_members" -> (mcte +
      """SELECT MIEMBRO_UNIQUE_NAME AS member_unique_name,
        |       MIEMBRO_CAPTION AS member_caption,
        |       NIVEL_NUMERO AS level_number
        |FROM members
        |WHERE JERARQUIA = '[Customer].[Geo]' AND NIVEL_NUMERO > 0
        |ORDER BY level_number ASC, member_unique_name ASC""".stripMargin)
  )
}
