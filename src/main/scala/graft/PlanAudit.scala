package graft

object PlanAudit {

  /** Per-query physical-plan census over the EXECUTED plan (AQE final).
    * wscg = distinct WholeStageCodegen spans; noncg = physical-operator
    * lines running outside every span — the row-based residue. Pure
    * wrapper nodes (InputAdapter, ReusedExchange, AQEShuffleRead, …) are
    * excluded from noncg (r8 advice item 4): they are plumbing that
    * appears/disappears with plan shape, not operators leaving codegen,
    * and counting them blurred the round-over-round drift signal. */
  final case class Census(exch: Int, cart: Int, bnlj: Int, smj: Int,
                          bhj: Int, scans: Int, wscg: Int, noncg: Int)

  /** Nodes that never execute row-processing work of their own: pipe
    * fittings between spans, AQE rewrites, and reuse markers. */
  private val wrapperNodes = Set(
    "InputAdapter", "ReusedExchange", "ReusedSubquery", "AQEShuffleRead",
    "ShuffleQueryStage", "BroadcastQueryStage", "TableCacheQueryStage",
    "ResultQueryStage", "AdaptiveSparkPlan", "Subquery", "SubqueryBroadcast",
    "ColumnarToRow", "RowToColumnar", "WholeStageCodegen")

  def census(qe: org.apache.spark.sql.execution.QueryExecution): Census = {
    // Materialize first: with AQE the pre-execution plan still shows
    // estimate-based joins (e.g. SMJ) that the runtime re-plans to
    // broadcast — the census must reflect the plan that actually ran.
    qe.toRdd.count()
    // AdaptiveSparkPlan.toString prints the final plan followed by the
    // initial (estimate-based) one — census only what actually ran.
    val p = qe.executedPlan.toString.split("== Initial Plan ==").head
    def c(s: String) = p.sliding(s.length).count(_ == s)
    val wscg = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
    val opLine = "^[\\s:+*-]*([A-Z][A-Za-z]+)".r
    val nonCg = p.linesIterator.count { l =>
      opLine.findFirstMatchIn(l) match {
        case Some(m) =>
          !l.contains("*(") && !l.contains("== ") &&
            !wrapperNodes.contains(m.group(1))
        case None => false
      }
    }
    Census(c("Exchange hashpartitioning"), c("CartesianProduct"),
      c("BroadcastNestedLoopJoin"), c("SortMergeJoin"),
      c("BroadcastHashJoin"), c("FileScan"), wscg, nonCg)
  }

  /** Flatten a physical plan including the subtrees the default
    * `children` walk hides: AQE wrappers, materialized query stages,
    * cached-relation plans, and subqueries. Window-census traversals
    * must see through all of them — a single-partition window inside a
    * persisted intermediate is exactly as serial as one at top level. */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case _ => p.children
    }
    p +: (kids ++ p.subqueries).flatMap(flatten)
  }

  /** Plan facts of session artifacts whose lineage a localCheckpoint
    * truncated (SessionCache builds, r13), keyed by the checkpointed
    * RDD id: (bounded-below-ness, window shapes) of the BUILD plan.
    * The census used to read both straight off the cached artifact's
    * lineage (`InMemoryTableScanExec → relation.cachedPlan`); with the
    * checkpoint that subtree is a bare RDD scan, so the facts are
    * recorded once at build time instead — exactly what a table
    * catalog persists about a stored table's grain. Both census
    * traversals below consult the registry at RDD-scan leaves, so a
    * serial window INSIDE an artifact build still fails the census of
    * every consumer, and an aggregate-grain artifact still counts as
    * a bounded input. */
  private val pendingArtifacts =
    scala.collection.concurrent.TrieMap.empty[Int, org.apache.spark.sql.execution.SparkPlan]
  private val artifactFacts =
    scala.collection.concurrent.TrieMap.empty[Int, (Boolean, Seq[WindowShape], String)]

  /** LAZY registration: the facts (bounded-ness, window shapes, plan
    * text) are computed on first census ACCESS, not at build time —
    * computing them eagerly walked + stringified the multi-thousand-node
    * build plan inside the first consumer query's timed wall (measured
    * as part of a ~27 s pass-1 inflation on the full bench). Only the
    * structural specs ever ask; bench/verify runs never pay. */
  def registerArtifact(rddId: Int,
                       buildPlan: org.apache.spark.sql.execution.SparkPlan): Unit =
    pendingArtifacts.put(rddId, buildPlan)

  private def factsFor(rddId: Int): Option[(Boolean, Seq[WindowShape], String)] =
    artifactFacts.get(rddId).orElse(pendingArtifacts.remove(rddId).map { plan =>
      val f = (boundedBelow(plan), windowShapes(plan), planText(plan))
      artifactFacts.putIfAbsent(rddId, f).getOrElse(f)
    })

  /** Drop a dead artifact's registration (SessionCache.clear calls this
    * per evicted entry) — a cold bench pass rebuilds every artifact per
    * query, and the pending plan objects would otherwise accumulate for
    * the session. */
  def unregisterArtifact(rddId: Int): Unit = {
    pendingArtifacts.remove(rddId)
    artifactFacts.remove(rddId)
  }

  /** `plan.toString` plus the registered BUILD plans of every truncated
    * artifact the plan reads (distinct RDD ids; nested artifacts are
    * pre-spliced at registration). The text the plan-shape specs assert
    * against: a structural pin on something that lives inside an
    * artifact build (the BM25 TakeOrdered, a dimension broadcast, the
    * absence of a cartesian) keeps seeing it after the checkpoint
    * truncates the consumer's lineage to a bare RDD scan. */
  def planText(plan: org.apache.spark.sql.execution.SparkPlan): String = {
    val ids = flatten(plan).flatMap(rddScanId).distinct
    val arts = ids.flatMap(id => factsFor(id).map(f =>
      s"\n== artifact build plan (rdd $id) ==\n" + f._3))
    plan.toString + arts.mkString
  }

  /** The RDD id under an `RDDScanExec` (private[sql] — reflective), or
    * None for any other node. */
  private def rddScanId(p: org.apache.spark.sql.execution.SparkPlan): Option[Int] =
    if (p.getClass.getSimpleName != "RDDScanExec") None
    else
      try Some(p.getClass.getMethod("rdd").invoke(p)
        .asInstanceOf[org.apache.spark.rdd.RDD[_]].id)
      catch { case _: Throwable => None }

  /** One WindowExec's census coordinates: partition-spec arity, whether
    * its input is BOUNDED below — by an aggregate (bucket-grain offset
    * tables), a WindowGroupLimit (rank-limit pushdown keeps ≤ k rows per
    * group per upstream partition), or a limit — and the partition
    * column names. The coordinates decide whether a window can serialize
    * a corpus: arity 0 over an unbounded input is the literal "Moving
    * all data to a single partition" warning; a low-cardinality
    * partition over an unbounded input is the q155 shape (parallelism
    * capped at the partition column's cardinality). */
  final case class WindowShape(arity: Int, bounded: Boolean,
                               parts: Seq[String])

  def windowShapes(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[WindowShape] = {
    val nodes = flatten(plan)
    val direct = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        val parts = w.partitionSpec.map {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
          case e => e.sql
        }
        WindowShape(w.partitionSpec.size, boundedBelow(w.child), parts)
    }
    // Windows INSIDE truncated artifact builds, one contribution per
    // artifact read — the same multiplicity the cached-lineage descent
    // used to produce.
    val fromArtifacts = nodes.flatMap(rddScanId)
      .flatMap(id => factsFor(id).map(_._2).getOrElse(Nil))
    direct ++ fromArtifacts
  }

  /** Does an aggregate / limit / group-limit bound the row volume on the
    * path below `p`? Broadcast-exchange subtrees are NOT descended: the
    * window's input cardinality follows the PROBE side of a broadcast
    * join, and the build side is small by definition — an agg there says
    * nothing about row volume (the q249 false positive). */
  private def boundedBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    p match {
      case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => false
      case r if rddScanId(r).isDefined =>
        factsFor(rddScanId(r).get).exists(_._1)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case a: AdaptiveSparkPlanExec => boundedBelow(a.executedPlan)
      case q: QueryStageExec => boundedBelow(q.plan)
      case s: InMemoryTableScanExec => boundedBelow(s.relation.cachedPlan)
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        // A join's output volume is driven by EVERY non-broadcast side:
        // an aggregate on one leg of a shuffle join says nothing about
        // the corpus-sized rows the other leg streams through (the old
        // children.exists let exactly that shape read as "bounded").
        // Broadcast build sides are skipped — small by definition, but
        // no bound on output volume.
        val probe = j.children.filterNot(isBroadcastSide)
        probe.nonEmpty && probe.forall(boundedBelow)
      case _ => p.children.exists(boundedBelow)
    }
  }

  private def isBroadcastSide(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    p match {
      case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => true
      case q: QueryStageExec => isBroadcastSide(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        isBroadcastSide(r.child)
      case _ => false
    }
  }

  /** Count of UNPARTITIONED WindowExec nodes — each one moves its whole
    * input to a single task. The registry census pins these against the
    * universal bounded-input rule (WindowCensusSpec). */
  def globalWindowCount(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    windowShapes(plan).count(_.arity == 0)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "audit")
    val d = "/root/testdata/sf0.001"
    println(f"AUDIT ${"query"}%-28s exch cart bnlj smj bhj scans wscg noncg")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val cs = census(fn(spark, d).queryExecution)
        println(f"AUDIT $name%-28s ${cs.exch}%4d ${cs.cart}%4d ${cs.bnlj}%4d ${cs.smj}%4d ${cs.bhj}%4d ${cs.scans}%5d ${cs.wscg}%4d ${cs.noncg}%5d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
      finally graft.ops.TransientCache.releaseAll()
    }
    spark.stop()
  }
}
