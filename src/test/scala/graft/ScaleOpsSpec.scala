package graft

import graft.model.MemberCatalog
import graft.ops.ScaleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain-join rows") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"),
      col("o_orderdate"))
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = ScaleOps.saltedJoin(li, o, "l_orderkey", salt = 4).count()
    assert(salted == plain)
  }

  test("bucketed tables equi-join without a shuffle exchange") {
    val members = MemberCatalog.members(spark, sf)
    val children = members.where(col("PARENT_UNIQUE_NAME").isNotNull)
      .select(col("PARENT_UNIQUE_NAME").as("jkey"), col("MIEMBRO_CAPTION").as("child"))
    val parents = members
      .select(col("MIEMBRO_UNIQUE_NAME").as("jkey"), col("MIEMBRO_CAPTION").as("parent"))
    ScaleOps.saveBucketed(children, "b_children", "jkey")
    ScaleOps.saveBucketed(parents, "b_parents", "jkey")
    val joined = spark.table("b_children").join(spark.table("b_parents"), "jkey")
    // disable broadcast so the co-location (not a broadcast) avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        children.join(parents, "jkey").count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("approx_count_distinct tracks exact cardinality within 5% (A8 scale path)") {
    val m = MemberCatalog.members(spark, sf)
    val exact = m.select(countDistinct(col("MIEMBRO_UNIQUE_NAME"))).head().getLong(0)
    val approx = m.select(approx_count_distinct(col("MIEMBRO_UNIQUE_NAME")))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
