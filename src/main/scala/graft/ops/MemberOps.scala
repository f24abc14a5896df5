package graft.ops

import graft.meta.UniqueNames
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Member-catalog dataflow operators (SURVEY.md §2.2–2.7) as reusable
  * DataFrame transformers — the library face of what the per-operator
  * queries exercise. */
object MemberOps {

  /** Case/accent-insensitive caption search (F17 port surface; the
    * Spanish-FTS stemming divergence is documented in SURVEY §7.4). */
  def search(members: DataFrame, text: String): DataFrame = {
    val norm = translate(upper(col("MIEMBRO_CAPTION")),
      "ÁÉÍÓÚÜÑ", "AEIOUUN")
    val needle = translate(upper(lit(text)), "ÁÉÍÓÚÜÑ", "AEIOUUN")
    members.where(norm.contains(needle))
  }

  /** Keyset pagination — the 100 TB replacement for OFFSET (SURVEY §7.4):
    * strictly-after (caption, unique_name) cursor, no skip-scan. */
  def keysetPage(members: DataFrame, afterCaption: Option[String],
                 afterUnique: Option[String], pageSize: Int): DataFrame = {
    val ordered = members.orderBy(col("MIEMBRO_CAPTION"), col("MIEMBRO_UNIQUE_NAME"))
    val paged = (afterCaption, afterUnique) match {
      case (Some(c), Some(u)) => ordered.where(
        col("MIEMBRO_CAPTION") > c ||
          (col("MIEMBRO_CAPTION") === c && col("MIEMBRO_UNIQUE_NAME") > u))
      case _ => ordered
    }
    paged.limit(pageSize)
  }

  /** Children of a member: equi-join on PARENT_UNIQUE_NAME when populated
    * ("new cube", J1), prefix-derived parent key otherwise ("old cube",
    * J2 rewritten to an equi-join on a derived column — the scale path:
    * hash join instead of BroadcastNestedLoop). */
  def childrenOf(members: DataFrame, parentUnique: String): DataFrame = {
    val withParent = members.withColumn("_parent",
      coalesce(col("PARENT_UNIQUE_NAME"),
        UniqueNames.parentByPrefix(col("MIEMBRO_UNIQUE_NAME"))))
    withParent.where(col("_parent") === parentUnique).drop("_parent")
  }

  /** A8 cardinality estimate: product of member counts per chosen
    * (hierarchy, level), with the reference's >100 000 warning flag
    * (ref `scanner/DGIS_SCAN_2_stable.py:866-901`). */
  final case class Estimate(estimatedRows: Long, warn: Boolean)
  def estimateResultSize(members: DataFrame,
                         levels: Seq[(String, Int)]): Estimate = {
    val counts = members
      .groupBy(col("JERARQUIA"), col("NIVEL_NUMERO"))
      .agg(countDistinct(col("MIEMBRO_UNIQUE_NAME")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val est = levels.map(l => counts.getOrElse(l, 0L)).product
    Estimate(est, est > 100000L)
  }

  /** Apartado/Variable taxonomy split (ref `scanner/DGIS_SCAN_2_stable
    * .py:952-984`): depth-1 members of the Variables hierarchy are
    * apartados, depth-2 are variables. Works for old cubes (no
    * NIVEL_NOMBRE) via unique-name depth. */
  def apartados(members: DataFrame): DataFrame =
    members.where(upper(col("JERARQUIA")).contains("APARTADO") ||
        upper(col("DIMENSION")).contains("VARIABLES"))
      .where(UniqueNames.depth(col("MIEMBRO_UNIQUE_NAME")) === 1)
      .where(col("MIEMBRO_CAPTION") =!= "All")

  def variables(members: DataFrame): DataFrame =
    members.where(upper(col("JERARQUIA")).contains("APARTADO") ||
        upper(col("DIMENSION")).contains("VARIABLES"))
      .where(UniqueNames.depth(col("MIEMBRO_UNIQUE_NAME")) === 2)
}
