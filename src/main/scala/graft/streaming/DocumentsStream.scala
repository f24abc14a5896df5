package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** First-seen canonical id per content hash (streaming-dedup state; one
  * long per distinct content). Top-level + public for Spark's state
  * encoder codegen, like [[SessionState]]. */
final case class SeenContent(canonicalId: Long)

/** One HLL register (max rank seen for a (group, bucket) key) — the
  * streaming-sketch state, and the update record it emits. */
final case class RegState(r: Int)
final case class RegUpdate(g: String, bucket: Int, r: Int)
final case class CmsState(n: Long)
final case class CmsUpdate(j: Int, bucket: Int, n: Long)
final case class PsiBinState(n: Long)
final case class PsiBinUpdate(bin: Long, n: Long)

/** First claimer of an LSH band bucket (streaming near-dup state; one
  * long per distinct bucket) and the match event a later collision
  * emits. Top-level + public for Spark's state encoder codegen. */
final case class BandClaim(firstDoc: Long)
final case class BandMatch(band: Int, key: String, doc_id: Long,
                           first_doc: Long)

/** Per-(label, dim) centroid register (running component sum + vector
  * count) and the update record it emits — the streaming-drift state
  * behind the q188 centroid monitor. Top-level + public for Spark's
  * state encoder codegen. */
final case class CentroidState(sx: Long, n: Long)
final case class CentroidUpdate(label: Int, pos: Int, sx: Long, n: Long)

/** First claimer of a SimHash pigeonhole band bucket — doc id PLUS the
  * full 64-bit signature, so a later collision verifies its exact
  * Hamming distance against the claimant IN the state function (the
  * signature is one long; LSH minhash state cannot afford its full
  * signature, SimHash state gets verification for free). Top-level +
  * public for Spark's state encoder codegen. */
final case class SimhashClaim(firstDoc: Long, sig: Long)
final case class SimhashMatch(band: Int, bkey: Long, doc_id: Long,
                              first_doc: Long, hamming: Int)

/** First claimer of a trigram (streaming first-occurrence state; one
  * long per distinct gram) and the claim event emitted the moment a
  * gram enters the corpus. Top-level + public for Spark's state encoder
  * codegen. */
final case class GramClaim(firstDoc: Long)
final case class GramClaimEvent(s: String, doc_id: Long)

/** Per-gram (first, second) occurrence registers — the q207
  * vocabulary-growth curve's base relation, maintained at ingest.
  * `c2 = Long.MaxValue` encodes "no second occurrence yet" so BOTH
  * registers are min-monotone (c1 only decreases; c2 decreases from
  * the sentinel) — the property the spec's final-value fold and any
  * downstream merge rely on. Top-level + public for Spark's state
  * encoder codegen. */
final case class GramC12(c1: Long, c2: Long)
final case class GramC12Update(s: String, c1: Long, c2: Long)

/** Claim-maintenance event under arrivals AND tombstones (`kind` ∈
  * claim|retired) — the streaming face of q201's deletion propagation.
  * Top-level + public for Spark's state encoder codegen. */
final case class ClaimMaintEvent(s: String, doc_id: Long, kind: String)

/** Per-(source, replicate) Poisson-bootstrap register (shifted weighted
  * quality sum + weight sum) and the update record it emits — the
  * streaming face of the q204 bootstrap CI. Top-level + public for
  * Spark's state encoder codegen. */
final case class BootState(swq50: Long, sw: Long)
final case class BootUpdate(source: String, b: Int, swq50: Long, sw: Long)

/** First claimer of an audio landmark key (streaming fingerprint state;
  * one long per distinct landmark) and the match event a later
  * collision emits. Top-level + public for Spark's state encoder
  * codegen. */
final case class LandmarkClaim(firstMedia: Long)
final case class LandmarkMatch(key: String, media_id: Long,
                               first_media: Long)

/** Structured Streaming surface over the `documents` corpus — the
  * incremental ingest shape of the training-data pipeline (documents
  * arrive continuously; dedup must decide per arrival, not per corpus
  * scan).
  */
object DocumentsStream {

  final case class CanonicalDoc(content_hash: String, canonical_id: Long)

  /** File-based document stream of the driver parquet fixture (same
    * single-file symlink shim as [[EventsStream.readEvents]]).
    * `maxFilesPerTrigger` splits a multi-file directory into that many
    * micro-batches (oldest file first) — the cross-batch test hook. */
  def readDocuments(spark: SparkSession, sfDir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val src = new java.io.File(s"$sfDir/documents.parquet")
    val streamDir =
      if (!src.exists() || src.isDirectory)
        // a directory of parquet files IS the stream dir (src missing
        // means sfDir itself holds the files, e.g. a test fixture dir)
        if (src.isDirectory) src.getPath else sfDir
      else {
        val d = java.nio.file.Files.createTempDirectory("documents_stream")
        java.nio.file.Files.createSymbolicLink(
          d.resolve("documents.parquet"), src.toPath.toAbsolutePath)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(streamDir)
  }

  /** File-based embeddings stream of the driver parquet fixture (same
    * single-file symlink shim as [[readDocuments]]). */
  def readEmbeddings(spark: SparkSession, sfDir: String,
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val src = new java.io.File(s"$sfDir/embeddings.parquet")
    val streamDir =
      if (!src.exists() || src.isDirectory)
        if (src.isDirectory) src.getPath else sfDir
      else {
        val d = java.nio.file.Files.createTempDirectory("embeddings_stream")
        java.nio.file.Files.createSymbolicLink(
          d.resolve("embeddings.parquet"), src.toPath.toAbsolutePath)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(streamDir)
  }

  /** Streaming centroid registers — the incremental twin of the q188
    * centroid-drift monitor: per-(label, dim) running (Σ quantized
    * component, vector count) maintained as keyed state; the centroid
    * and any pairwise drift distance stay query-time register math over
    * the maintained sums — exactly the PSI/HLL/CMS register contract.
    * Quantization is q188's floor(x·1000) so the registers are the
    * batch aggregate's operands verbatim; integer sums commute, so the
    * registers after ANY batch split equal the batch per-(label, dim)
    * aggregate over the same rows (StreamingSpec-pinned). State is
    * labels × dims longs — hard-capped like the HLL registers, no TTL
    * needed. */
  def centroidRegisterUpdates(spark: SparkSession, vecs: DataFrame,
                              labelCol: String = "label",
                              embCol: String = "embedding"): Dataset[CentroidUpdate] = {
    import spark.implicits._
    vecs.select(col(labelCol).cast("int").as("label"),
        posexplode(expr(
          s"transform($embCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
          .as(Seq("pos", "x")))
      .as[(Int, Int, Long)]
      .groupByKey(t => (t._1, t._2))
      .mapGroupsWithState[CentroidState, CentroidUpdate](GroupStateTimeout.NoTimeout()) {
        case ((label, pos), it, state: GroupState[CentroidState]) =>
          var sx = state.getOption.map(_.sx).getOrElse(0L)
          var n = state.getOption.map(_.n).getOrElse(0L)
          it.foreach { t => sx += t._3; n += 1L }
          state.update(CentroidState(sx, n))
          CentroidUpdate(label, pos, sx, n)
      }
  }

  /** Streaming HyperLogLog — the incremental twin of
    * [[graft.ext.Sketches.hllDistinct]] (q81), and the operator that
    * makes the sketch worth having on a stream: registers fold with
    * `max`, which is commutative/idempotent, so the streaming registers
    * after ANY batch split equal the batch registers over the same rows
    * (StreamingSpec-pinned) — and therefore yield the identical estimate.
    *
    * State is one int per non-empty `(group, bucket)` key — hard-capped
    * at groups × 2^b regardless of stream length (the reason this needs
    * no TTL, unlike [[dedupDocuments]]). Emits the updated register per
    * key per micro-batch (Update output mode); the estimate is computed
    * from the final registers by the batch-side formula. */
  def hllRegisterUpdates(spark: SparkSession, docs: DataFrame,
                         keyCol: String = "text",
                         groupCol: String = "source",
                         b: Int = 8): Dataset[RegUpdate] = {
    import spark.implicits._
    graft.ext.Sketches.registerRows(docs, keyCol, groupCol, b)
      .as[(String, Int, Int)]
      .groupByKey(t => (t._1, t._2))
      .mapGroupsWithState[RegState, RegUpdate](GroupStateTimeout.NoTimeout()) {
        case ((g, bucket), it, state: GroupState[RegState]) =>
          var r = state.getOption.map(_.r).getOrElse(0)
          it.foreach(t => if (t._3 > r) r = t._3)
          state.update(RegState(r))
          RegUpdate(g, bucket, r)
      }
  }

  /** Streaming count-min-sketch registers — the incremental twin of the
    * batch CMS (q104 / [[graft.ext.Sketches.cmsRegisters]]): keyed state
    * per `(j, bucket)` accumulates occurrence counts with `+`, the same
    * associative fold the batch register table uses, so the registers
    * after ANY batch split equal the batch sketch over the same rows
    * (StreamingSpec-pinned). State is hard-capped at d×w longs
    * regardless of stream length — like [[hllRegisterUpdates]], no TTL
    * needed. */
  def cmsRegisterUpdates(spark: SparkSession, docs: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         d: Int = 4, w: Int = 512): Dataset[CmsUpdate] = {
    import spark.implicits._
    graft.ext.Sketches.cmsBucketRows(docs, textCol, idCol, d, w)
      .as[(Int, Int)]
      .groupByKey(identity)
      .mapGroupsWithState[CmsState, CmsUpdate](GroupStateTimeout.NoTimeout()) {
        case ((j, bucket), it, state: GroupState[CmsState]) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + it.size
          state.update(CmsState(n))
          CmsUpdate(j, bucket, n)
      }
  }

  /** Streaming drift-monitor registers — the incremental half of the
    * q119 PSI audit: the CURRENT population's histogram is maintained
    * per arriving document against FROZEN reference bin edges (`gmin`,
    * `binWidth` are deployment constants — in production the reference
    * histogram is a calibrated artifact; q119's in-query min/max IS
    * that calibration run). Out-of-range values clamp into the edge
    * bins (a frozen range must absorb drifted tails, never drop them).
    * State is one long per occupied bin (≤ `nBins`); the PSI itself
    * stays query-time register math over (maintained cur counts, frozen
    * ref counts) — exactly the HLL/CMS register-maintenance contract. */
  def psiBinUpdates(spark: SparkSession, docs: DataFrame, valueCol: String,
                    gmin: Long, binWidth: Long,
                    nBins: Int = 64): Dataset[PsiBinUpdate] = {
    import spark.implicits._
    require(binWidth >= 1 && nBins >= 2)
    docs.select(
        expr(s"least(greatest((CAST($valueCol AS BIGINT) - $gmin) div $binWidth," +
          s" CAST(0 AS BIGINT)), CAST(${nBins - 1} AS BIGINT))").as("bin"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[PsiBinState, PsiBinUpdate](GroupStateTimeout.NoTimeout()) {
        case (bin, it, state: GroupState[PsiBinState]) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + it.size
          state.update(PsiBinState(n))
          PsiBinUpdate(bin, n)
      }
  }

  /** Streaming exact dedup — the incremental twin of
    * [[graft.ext.Dedup.exactGroups]] (q22): the first arrival of a
    * content hash emits that document as the canonical; every later
    * arrival of the same content is suppressed. Within one micro-batch
    * the canonical is the min doc id, so a single-batch run reproduces
    * the batch operator exactly (StreamingSpec-pinned); across batches
    * the contract is first-arrival-wins — a stream cannot retract an
    * already-emitted canonical (same lateness caveat as
    * [[EventsStream.attributeClicks]]).
    *
    * Documented divergence from the batch twin: NULL-text/-id rows are
    * dropped here (no content to dedup under, and keyed state cannot
    * group on a null key), while the batch operator emits a null-hash
    * group for them.
    *
    * State is ONE long per distinct content hash — O(distinct docs),
    * the keyed-state analogue of the batch hash-groupBy's shuffle key
    * set. At 100 TB/day ingest the state store is RocksDB-backed and the
    * hash key is already uniform (md5), so state partitions stay
    * balanced — but O(distinct docs) still grows without bound over the
    * stream's lifetime. `stateTtl` bounds it: a hash idle for longer than
    * the TTL is evicted (processing-time timeout, refreshed on every
    * re-arrival), turning exact lifetime dedup into sliding-window dedup —
    * a re-arrival AFTER eviction is treated as new content and re-emitted.
    * That is the standard state-compaction contract for an unbounded
    * ingest; leave it None for exact dedup over a bounded backfill.
    *
    * Trigger caveat (applies to every stateTtl operator in this
    * package): a processing-time timeout means the query ALWAYS has
    * potential future work (FlatMapGroupsWithStateExec
    * .shouldRunAnotherBatch is unconditionally true under
    * ProcessingTimeTimeout), so a Trigger.AvailableNow run never
    * self-terminates — it idles in no-data batches waiting for the TTL
    * clock. TTL'd queries belong on a continuous trigger; a bounded
    * drain must use processAllAvailable() + stop() (StreamingSpec's
    * drainAndStop). */
  def dedupDocuments(spark: SparkSession, docs: DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id",
                     stateTtl: Option[java.time.Duration] = None): Dataset[CanonicalDoc] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(
        md5(TextAnalysis.normalize(col(textCol)).cast("binary")).as("content_hash"),
        col(idCol).cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeenContent, CanonicalDoc](
        OutputMode.Append(), timeoutConf) {
        case (hash, it, state: GroupState[SeenContent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // re-arrival of known content: suppress, refresh the TTL clock
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.empty
          } else {
            var minId = Long.MaxValue
            it.foreach(p => if (p._2 < minId) minId = p._2)
            state.update(SeenContent(minId))
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator(CanonicalDoc(hash, minId))
          }
      }
  }

  /** Streaming inverted-index maintenance — the incremental twin of the
    * session-materialized FTS index (q49's `ExtQueries.ftsInverted`
    * artifact). Postings are DOC-LOCAL (a document's terms depend on no
    * other document), so maintaining the index under ingest is a
    * STATELESS per-batch projection appended to the stored postings —
    * no keyed state, no watermark, Append output mode, the cheapest
    * possible streaming operator. The union of emitted rows over ANY
    * batch split equals the batch postings (StreamingSpec-pinned) —
    * the reason a 100 TB/day ingest maintains its GIN-index analogue at
    * the cost of the delta, never a rebuild. (The tf/doc-length halves
    * of the BM25 index are per-doc aggregates of the same stream, so
    * they append incrementally too; corpus stats re-aggregate from the
    * doc-length table at read time.) */
  def postingsUpdates(docs: DataFrame): DataFrame =
    graft.ext.TextAnalysis.invertedPostings(docs, "text", "doc_id")

  /** Append-only maintenance of the ExactSubstr window-posting index
    * (the artifact behind q132/q134's span table): window hashes are a
    * pure per-document function, so each micro-batch appends its own
    * docs' `(doc, pos, h)` postings with zero state — the same
    * stateless-index discipline as [[postingsUpdates]]. The frequency
    * gate and diagonal chaining stay query-time: they are corpus-global
    * and read the maintained index, they don't constrain its build. */
  def windowPostingsUpdates(docs: DataFrame, window: Int = 10): DataFrame =
    graft.ext.Dedup.windowHashRows(docs, "text", "doc_id", window)

  /** Append-only maintenance of the MinHash signature table (the
    * artifact behind q23's LSH banding join): a document's signature is
    * a pure per-document function of its own shingles, so each
    * micro-batch appends its docs' `(doc_id, h0..h{n-1})` rows with zero
    * state. The quadratic half of the pipeline — banding, bucket join,
    * candidate verification — stays query-time over the maintained
    * table, exactly like the batch session artifact: ingest pays
    * signature cost once per NEW doc, near-dup queries pay only the
    * band join over signatures that already exist. Uses the typed
    * one-pass signature builder (no aggregation) so the stream stays a
    * stateless Append projection — the groupBy form would demand a
    * watermark it has no event time for. */
  def minhashSignatureUpdates(docs: DataFrame, nHashes: Int = 8): DataFrame =
    graft.ext.Dedup.minhashSignaturesTyped(docs, "text", "doc_id", nHashes)

  /** Append-only maintenance of the winnowing fingerprint table (q224's
    * session artifact): selection is a pure per-document function of the
    * doc's own gram hashes, so each micro-batch appends its docs'
    * `(doc, pos, fph)` rows with zero state — the fingerprint-sharing
    * pair join stays query-time over the maintained table, exactly like
    * the MinHash signature twin above. Uses the doc-local typed winnow
    * (no window function) so the stream stays a stateless Append
    * projection; row-equivalence to the batch operator is
    * StreamingSpec-pinned. */
  def winnowFingerprintUpdates(docs: DataFrame, gram: Int = 4,
                               window: Int = 8): DataFrame =
    graft.ext.Dedup.winnowingFingerprintsLocal(docs, "text", "doc_id",
      gram, window)

  /** Run-collapse normalization at ingest (q152's transform applied
    * where a pipeline actually wants it — before anything downstream
    * sees the raw text): the keep rule is position-local within one
    * document, so the rewrite is a stateless per-batch map and a
    * single-pass stream output is row-identical to the batch operator
    * (StreamingSpec-pinned). */
  def runCollapseUpdates(docs: DataFrame, maxRun: Int = 2): DataFrame =
    graft.ext.TextAnalysis.collapseTokenRuns(docs, "text", "doc_id", maxRun)

  /** Append-only maintenance of the DSIR hashed-bigram profile (q133's
    * session artifact): `(doc, bucket, c)` counts are a pure per-document
    * function, so each micro-batch appends its docs' rows statelessly.
    * The model refit (512-row λ table) stays query-time — it is a cheap
    * corpus-global aggregate over the maintained profile, re-runnable
    * against any target slice without touching the corpus again. */
  def dsirProfileUpdates(docs: DataFrame, buckets: Int = 512): DataFrame =
    graft.ext.Sampling.dsirBucketCountsLocal(docs, "text", "doc_id", buckets)

  /** Streaming Poisson-bootstrap registers — the incremental face of the
    * q204 confidence intervals, and the construction's whole point
    * (Chamandy et al. 2012 built the Poisson(1) bootstrap FOR streams:
    * each row's replicate weight is a pure per-row md5 draw, so every
    * replicate's (Σ w·(q+50), Σ w) register folds with `+` under any
    * batch split — no global n, no coordination). Quality comes from the
    * same doc-local [[TextAnalysis.withTokenProfile]] pass the batch
    * query reads (quality ≥ −50 by construction, so the shifted sum is
    * monotone like every other register here). Keyed state is two longs
    * per (source, replicate) — n_sources × nReps registers, fixed-size,
    * no TTL. The replicate means and order-statistic CI stay query-time
    * register math, exactly the HLL/CMS maintenance contract. */
  def bootstrapRegisterUpdates(spark: SparkSession, docs: DataFrame,
                               nReps: Int = 64): Dataset[BootUpdate] = {
    import spark.implicits._
    TextAnalysis.withTokenProfile(docs, "text")
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("quality"))
      .withColumn("b", explode(sequence(lit(0), lit(nReps - 1))))
      .withColumn("w", graft.ext.Sampling.poissonWeight(
        concat(col("doc_id").cast("string"), lit("|"), col("b").cast("string"))))
      .select(col("source"), col("b").cast("int").as("b"),
        (col("w") * (col("quality") + lit(50L))).as("wq50"), col("w"))
      .as[(String, Int, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .mapGroupsWithState[BootState, BootUpdate](GroupStateTimeout.NoTimeout()) {
        case ((src, b), it, state: GroupState[BootState]) =>
          var swq50 = state.getOption.map(_.swq50).getOrElse(0L)
          var sw = state.getOption.map(_.sw).getOrElse(0L)
          it.foreach { t => swq50 += t._3; sw += t._4 }
          state.update(BootState(swq50, sw))
          BootUpdate(src, b, swq50, sw)
      }
  }

  /** Streaming near-dup DETECTION at ingest — the stateful half that
    * [[minhashSignatureUpdates]] deliberately leaves query-time, for
    * pipelines that must flag a near-duplicate the moment it arrives
    * (spam floods, re-crawls) instead of at the next corpus-wide band
    * join: keyed state per LSH band bucket holds the FIRST document that
    * claimed the bucket; every later arrival colliding in that bucket
    * emits a `(band, key, doc_id, first_doc)` match event. A document is
    * a near-dup candidate at ingest iff it emits ≥1 match — the same
    * candidate predicate as the batch q23 banding join, restricted to
    * earlier-ingested partners (a stream cannot see the future; within
    * one micro-batch "earlier" = lower doc id, so a single-batch run
    * emits exactly the batch pairs with the bucket-min as partner —
    * StreamingSpec-pinned). Like the batch operator, matches are LSH
    * CANDIDATES: verification against full signatures (n_agree) stays
    * downstream, joining the match events to the maintained signature
    * table.
    *
    * State is ONE long per distinct non-empty (band, bucket) —
    * O(distinct buckets) ≤ nBands·distinct-signatures, the keyed-state
    * analogue of the batch band join's build side, uniform under the
    * md5-derived keys. `stateTtl` turns lifetime detection into
    * sliding-window detection, same eviction contract (and caveat) as
    * [[dedupDocuments]]. */
  def lshNearDupAtIngest(spark: SparkSession, docs: DataFrame,
                         nHashes: Int = 8, bandSize: Int = 2,
                         stateTtl: Option[java.time.Duration] = None)
      : Dataset[BandMatch] = {
    import spark.implicits._
    require(nHashes % bandSize == 0, "bands must tile the signature")
    val nBands = nHashes / bandSize
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val sigs = graft.ext.Dedup
      .minhashSignaturesTyped(docs, "text", "doc_id", nHashes)
    val bandStructs = (0 until nBands).map { b =>
      val key = concat(
        (0 until bandSize).map(r => col(s"h${b * bandSize + r}")): _*)
      struct(lit(b).as("band"), key.as("key"))
    }
    sigs.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc"))
      .as[(Int, String, Long)]
      .groupByKey(t => t._1 + "|" + t._2)
      .flatMapGroupsWithState[BandClaim, BandMatch](
        OutputMode.Append(), timeoutConf) {
        case (_, it, state: GroupState[BandClaim]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toArray.sortBy(_._3)
            val (band, key) = (rows.head._1, rows.head._2)
            val out =
              if (state.exists)
                rows.iterator.map(r =>
                  BandMatch(band, key, r._3, state.get.firstDoc))
              else {
                state.update(BandClaim(rows.head._3))
                rows.iterator.drop(1).map(r =>
                  BandMatch(band, key, r._3, rows.head._3))
              }
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out
          }
      }
  }

  /** Streaming SimHash near-dup detection at ingest — the streaming twin
    * of the 64-bit batch family (`Dedup.simhashHammingPairsFromSigs`,
    * q48's operator): each arriving document's 64-bit signature is
    * computed STATELESSLY (map-side column expressions — no stream
    * aggregation before the stateful op), pigeonholed into the same
    * maxDist+1 bands as the batch join, and keyed state per (band,
    * bucket) holds the FIRST claimant's doc id and full signature. Every
    * later arrival colliding in a bucket emits a match event carrying
    * its EXACT VERIFIED Hamming distance to the claimant — unlike the
    * minhash ingest twin ([[lshNearDupAtIngest]], whose events are
    * unverified candidates), the whole 64-bit signature fits in one
    * state long, so xor+bit_count verification runs inside the state
    * function and a `hamming <= maxDist` filter downstream is exact.
    *
    * Contract (the flood-detector shape, same as the LSH twin): matches
    * are against the bucket's FIRST claimant only — a dup flood of n
    * copies emits n−1 events against the one stored claimant with
    * state bounded at one (long, long) per distinct non-empty (band,
    * bucket), NEVER n² pairs or per-doc signature lists. The full
    * near-dup PAIR set (all partners, leftmost-band dedup) stays the
    * batch operator's job over the persisted signature table; at ingest
    * the question is "has content like this been seen?", and the
    * claimant answers it. Within one micro-batch "earlier" = lower doc
    * id (the stream cannot see the future; intra-batch events all
    * target the bucket-min doc). Events fire per colliding band — a
    * near-identical pair collides in several bands and emits one event
    * per band, each carrying the same verified distance (consumers
    * keying on doc_id dedup trivially; the per-band grain is what makes
    * intra-batch semantics deterministic without a cross-band shuffle).
    * NULL text/id rows are dropped (no content to band; keyed state
    * cannot group a null key), matching [[dedupDocuments]].
    *
    * `stateTtl` gives the same sliding-window eviction contract (and
    * AvailableNow caveat) as [[dedupDocuments]]. */
  def simhashNearDupAtIngest(spark: SparkSession, docs: DataFrame,
                             textCol: String = "text",
                             idCol: String = "doc_id",
                             maxDist: Int = 4,
                             stateTtl: Option[java.time.Duration] = None)
      : Dataset[SimhashMatch] = {
    import spark.implicits._
    val sigBits = 64
    val nBands = maxDist + 1
    val bounds = graft.ext.Dedup.bandBounds(sigBits, nBands)
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val sigi = graft.ext.Dedup.sigInt(
      graft.ext.Dedup.simhash(col(textCol)), sigBits)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        graft.ext.Dedup.bandKeyOf(col("sigi"), bounds, sigBits, b).as("bkey"))
    }
    docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc"), sigi.as("sigi"))
      .select(col("doc"), col("sigi"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"),
        col("doc"), col("sigi"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[SimhashClaim, SimhashMatch](
        OutputMode.Append(), timeoutConf) {
        case (_, it, state: GroupState[SimhashClaim]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toArray.sortBy(_._3)
            val (band, bkey) = (rows.head._1, rows.head._2)
            val out =
              if (state.exists) {
                val c = state.get
                rows.iterator.map(r => SimhashMatch(band, bkey, r._3,
                  c.firstDoc, java.lang.Long.bitCount(r._4 ^ c.sig)))
              } else {
                val c0 = rows.head
                state.update(SimhashClaim(c0._3, c0._4))
                rows.iterator.drop(1).map(r => SimhashMatch(band, bkey, r._3,
                  c0._3, java.lang.Long.bitCount(r._4 ^ c0._4)))
              }
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out
          }
      }
  }

  /** Streaming first-occurrence gram claims at ingest — the incremental
    * form of the batch q184 novelty signal: keyed state per distinct
    * trigram holds the first document that introduced it, and a claim
    * event fires the moment a never-seen gram enters the corpus. An
    * arriving document's novel-gram count is the number of claim events
    * carrying its id; its total distinct grams are stateless
    * ([[graft.ext.Dedup.shingleRows]]) — the ratio is q184's
    * novelty_ppm computed per arrival instead of per corpus scan.
    * Within one micro-batch "earlier" = lower doc id (min-doc-wins), so
    * a single-batch run claims exactly batch q184's first_doc per gram
    * — StreamingSpec-pinned. State is one long per distinct gram:
    * precisely the first-occurrence index the batch family's SCALE note
    * describes (a new shard's grams anti-join it); here that index is
    * the keyed state itself, maintained per arrival. `stateTtl` gives
    * the same sliding-window eviction contract as streaming exact
    * dedup. */
  def gramClaimsAtIngest(spark: SparkSession, docs: DataFrame,
                         stateTtl: Option[java.time.Duration] = None)
      : Dataset[GramClaimEvent] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.ext.Dedup.shingleRows(docs, "text", "doc_id", 3)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[GramClaim, GramClaimEvent](
        OutputMode.Append(), timeoutConf) {
        case (gram, it, state: GroupState[GramClaim]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val minDoc = it.map(_._1).min
            val out =
              if (state.exists) Iterator.empty
              else {
                state.update(GramClaim(minDoc))
                Iterator.single(GramClaimEvent(gram, minDoc))
              }
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out
          }
      }
  }

  /** Streaming (first, second)-occurrence registers per gram — the
    * incremental form of the q207 vocabulary-growth reduction: the
    * whole Heaps/Good-Turing curve is a function of each gram's two
    * smallest doc ids (in prefix c iff c1 ≤ c, singleton iff
    * c1 ≤ c < c2), so maintaining (c1, c2) at ingest keeps the curve
    * recomputable from registers alone — no corpus re-scan when the
    * planner asks "did the last shard still buy vocabulary?". State is
    * two longs per distinct gram (the q184 claim index plus one long);
    * within a micro-batch "earlier" = lower doc id, matching the batch
    * window's (s, doc) order, so registers after ANY batch split equal
    * the batch c12 relation (StreamingSpec-pinned). Updates emit the
    * current (c1, c2) per touched gram; both fields are min-monotone
    * (c2 via the MaxValue sentinel), so the latest value is the min. */
  def gramC12AtIngest(spark: SparkSession, docs: DataFrame)
      : Dataset[GramC12Update] = {
    import spark.implicits._
    graft.ext.Dedup.shingleRows(docs, "text", "doc_id", 3)
      .as[(Long, String)]
      .groupByKey(_._2)
      .mapGroupsWithState[GramC12, GramC12Update](GroupStateTimeout.NoTimeout()) {
        case (gram, it, state: GroupState[GramC12]) =>
          var c1 = state.getOption.map(_.c1).getOrElse(Long.MaxValue)
          var c2 = state.getOption.map(_.c2).getOrElse(Long.MaxValue)
          it.foreach { case (d, _) =>
            if (d < c1) { c2 = c1; c1 = d }
            else if (d > c1 && d < c2) c2 = d
            // d == c1 (re-shingled duplicate posting) changes nothing
          }
          state.update(GramC12(c1, c2))
          GramC12Update(gram, c1, c2)
      }
  }

  /** Streaming claim maintenance WITH DELETIONS — the q201 deletion
    * propagation at ingest grain. The input stream carries both
    * arrivals and tombstones (`doc_id`, `text`, `op` ∈ add|del; a
    * right-to-be-forgotten delete knows the doc it deletes, so the
    * tombstone carries the text and routes to exactly the grams the
    * doc ever claimed). Per gram, keyed state holds the current claim
    * holder; each micro-batch applies deterministically:
    *
    *   1. tombstones against PRIOR state — a del whose doc holds the
    *      claim retires it instantly (`kind = retired`, the compliance
    *      SLA event: no later query sees the purged claim) and clears
    *      the state; a del of a non-holder is a no-op (the min-over-
    *      superset argument of the batch repair: it never held
    *      anything);
    *   2. arrivals — if the gram is now unclaimed (fresh, or retired
    *      in step 1), the batch's min arriving doc claims
    *      (`kind = claim`).
    *
    * Division of labor with the batch job (the lambda shape q201's
    * SCALE note prescribes): streaming retires claims immediately but
    * does NOT re-elect from history — keyed state holds one long per
    * gram, not the posting list, so re-election over previously-seen
    * docs is exactly the batch repair's semi-join + min re-election
    * over the posting artifact. The `retired` events ARE that job's
    * work queue (they name precisely q201's affected grams). A doc
    * added and tombstoned in the same micro-batch resolves at the
    * batch repair (dels target already-applied state; StreamingSpec
    * pins the cross-batch contract). */
  def claimMaintAtIngest(spark: SparkSession, events: DataFrame)
      : Dataset[ClaimMaintEvent] = {
    import spark.implicits._
    events
      .select(col("doc_id").cast("long"), col("text"), col("op"))
      .as[(Long, String, String)]
      .flatMap { case (doc, text, op) =>
        if (text == null) Iterator.empty
        else {
          val toks = TextAnalysis.tokenizeJvm(TextAnalysis.normalizeJvm(text))
          if (toks.length < 3) Iterator.empty
          else toks.sliding(3).map(_.mkString(" ")).toSet.iterator
            .map((s: String) => (s, doc, op == "del"))
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[GramClaim, ClaimMaintEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (gram, it, state: GroupState[GramClaim]) =>
          val rows = it.toSeq
          val out = Seq.newBuilder[ClaimMaintEvent]
          // 1. tombstones retire the PRIOR holder only
          if (state.exists &&
              rows.exists { case (_, doc, del) => del && doc == state.get.firstDoc }) {
            out += ClaimMaintEvent(gram, state.get.firstDoc, "retired")
            state.remove()
          }
          // 2. arrivals claim if unclaimed
          val adds = rows.collect { case (_, doc, false) => doc }
          if (!state.exists && adds.nonEmpty) {
            val minDoc = adds.min
            state.update(GramClaim(minDoc))
            out += ClaimMaintEvent(gram, minDoc, "claim")
          }
          out.result().iterator
      }
  }

  /** Streaming audio-fingerprint matching at ingest — the q157 landmark
    * protocol per arrival. Landmarks never cross documents, so each
    * arriving payload fingerprints STATELESSLY with the doc-local pure
    * twin of the batch window pipeline
    * ([[graft.ext.Multimodal.landmarkKeys]]; equivalence is pinned by
    * StreamingSpec against [[graft.ext.Multimodal.landmarkTable]]);
    * keyed state per landmark key then holds the first claiming media
    * id, and a later arrival sharing the key emits a match event the
    * moment it lands. Candidate-grade, like [[lshNearDupAtIngest]]: the
    * >= 8-shared threshold and the 50-owner boilerplate cap are batch
    * contracts applied downstream over the maintained landmark table;
    * this stage is the earliest-possible signal. State is one long per
    * distinct landmark key; `stateTtl` gives the same sliding-window
    * eviction contract as streaming exact dedup. */
  def audioLandmarkMatchesAtIngest(spark: SparkSession, docs: DataFrame,
                                   stateTtl: Option[java.time.Duration] = None)
      : Dataset[LandmarkMatch] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.ext.Multimodal.audioFromDocuments(docs)
      .as[graft.ext.Multimodal.MediaRecord]
      .flatMap(r => graft.ext.Multimodal.landmarkKeys(r.payload).iterator
        .map(k => (k, r.media_id)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[LandmarkClaim, LandmarkMatch](
        OutputMode.Append(), timeoutConf) {
        case (key, it, state: GroupState[LandmarkClaim]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toArray.sortBy(_._2)
            val out =
              if (state.exists)
                rows.iterator.map(r => LandmarkMatch(key, r._2, state.get.firstMedia))
              else {
                state.update(LandmarkClaim(rows.head._2))
                rows.iterator.drop(1).map(r => LandmarkMatch(key, r._2, rows.head._2))
              }
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out
          }
      }
  }
}
