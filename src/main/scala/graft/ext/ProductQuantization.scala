package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the codebook half that
  * [[Similarity.ivfTopK]]'s scaladoc leaves out: vectors are split into
  * `m` subspaces, each subspace gets a small k-means codebook, and a
  * vector is stored as `m` one-byte codes. Queries score candidates with
  * the asymmetric distance computation (ADC): a per-query lookup table of
  * exact query-to-codeword distances, summed over the code columns.
  * [[ivfpqTopK]] adds the paper's coarse quantizer on top (IVFADC): only
  * vectors in the query's `nprobe` nearest cells are scored. Codebooks
  * are trained on raw vectors, not cell residuals — the documented
  * `by_residual=false` simplification (as in FAISS IndexIVFPQ's flag),
  * which keeps one global codebook instead of per-cell LUT rebuilds.
  *
  * Determinism contract (same as [[Clustering.kmeansTwoPass]]): offset
  * quantization to non-negative integers, exact BIGINT dot products via
  * the native `graft_dot` expression, codebooks = one Lloyd update from
  * lowest-id seeds with ×10 integer-mean rounding — every engine
  * reproduces codes and ADC distances bit-for-bit.
  *
  * 100 TB shape: this is the memory-side win PQ exists for — the corpus
  * is represented by `m` small ints per vector (codes), not the raw
  * floats. Training collects only model-sized state (m×k×subDim longs);
  * encoding is a map-side argmin over broadcast codebooks; the ADC join
  * broadcasts a (queries × m × k)-row LUT and aggregates per
  * (query, candidate) — the only shuffle, and it carries code-width rows,
  * never embeddings. */
object ProductQuantization {

  /** Argmin/tie-break convention shared with the k-means learner. */
  private def nearest(dists: Seq[(Column, Long)]): Column =
    Clustering.nearest(dists)

  /** Per-sub-space branch dispatch: `exprs(s)` applies when `s` matches. */
  private def bySub(exprs: Seq[(Int, Column)]): Column =
    exprs.tail.foldLeft(when(col("s") === lit(exprs.head._1), exprs.head._2)) {
      case (acc, (s, e)) => acc.when(col("s") === lit(s), e)
    }

  /** Trained PQ working state: offset-quantized vectors (`qe`), per-
    * (vector, subspace) codes (`encoded`), and the per-query ADC lookup
    * table (`lut`). `qe`/`encoded` are persisted model members; `lut`
    * is a lazy plan over them; `codebook` is the driver-side model. */
  private case class PqModel(qe: DataFrame, encoded: DataFrame, lut: DataFrame)

  /** Session-lifetime model share ([[graft.ops.SessionCache.memo]]):
    * both ADC consumers (PQ top-k and IVFADC) train on identical
    * (input, isQuery, m, codes) — rebuilding the codebook per query
    * repeats two driver collects and the persisted passes. The caller's
    * `shareKey` must uniquely identify that tuple (the query registry
    * keys by sf dir). Persist lifecycle in shared mode: only the model
    * members (`qe`, `encoded`) live for the session; the build scratch
    * (`subs`, pass-1 assignment) stays transient and is released by the
    * first consumer's runner — `encoded` is materialized by then, and a
    * later `lut` evaluation re-derives the query subvectors map-side
    * from the cached `qe`. */
  private def buildModel(emb: DataFrame, idCol: String, embCol: String,
                         isQuery: Column, m: Int, codes: Int,
                         shareKey: Option[String]): Option[PqModel] =
    shareKey match {
      case None =>
        doBuild(emb, idCol, embCol, isQuery, m, codes,
          model = graft.ops.TransientCache.persist,
          scratch = graft.ops.TransientCache.persist)
      case Some(key) =>
        graft.ops.SessionCache.memo(emb.sparkSession, s"pq_model:$key")(
          doBuild(emb, idCol, embCol, isQuery, m, codes,
            model = df => { df.persist(); df },
            scratch = graft.ops.TransientCache.persist))
    }

  /** Build codebooks (one Lloyd update from the `codes` lowest-id seeds,
    * per subspace), encode every vector, and derive the query-side ADC
    * LUT. None when the input is empty. `model` persists the returned
    * members (session-lifetime when shared); `scratch` the build-only
    * intermediates (always transient). */
  private def doBuild(emb: DataFrame, idCol: String, embCol: String,
                      isQuery: Column, m: Int, codes: Int,
                      model: DataFrame => DataFrame,
                      scratch: DataFrame => DataFrame): Option[PqModel] = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val qe = model(
      emb.select(col(idCol).cast("long").as("vec_id"),
        Clustering.quantizeOffset(col(embCol)).as("q"),
        isQuery.as("is_q")))
    // Model-sized collect: the `codes` seed vectors (codes × dims longs).
    val seeds = qe.orderBy(col("vec_id")).limit(codes)
      .select(col("vec_id"), col("q")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    if (seeds.isEmpty) return None
    val dims = seeds.head._2.length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m

    // One row per (vector, subspace): the PQ working set. Persisted — it
    // feeds pass-1 assignment, the codebook update, encoding and the LUT.
    val subs = scratch(
      qe.select(col("vec_id"), col("is_q"),
          explode(array((0 until m).map(s =>
            struct(lit(s).as("s"),
              slice(col("q"), s * subDim + 1, subDim).as("sq"))): _*)).as("e"))
        .select(col("vec_id"), col("is_q"), col("e.s").as("s"), col("e.sq").as("sq"))
        .withColumn("nsq", Similarity.normQ(col("sq"))))

    // Pass 1: argmin against the seed codebook, per subspace (map-side:
    // codebooks are literals, no join). d = |x|² − 2<x,c> + |c|².
    val c1Expr = bySub((0 until m).map { s =>
      val ds = seeds.toSeq.map { case (cid, qv) =>
        val cv = qv.slice(s * subDim, (s + 1) * subDim)
        (col("nsq") - lit(2L) * Similarity.dotQ(col("sq"), typedlit(cv.toSeq)) +
          lit(cv.map(v => v * v).sum), cid)
      }
      (s, nearest(ds).getField("cid"))
    })
    val asg1 = scratch(subs.withColumn("c1", c1Expr))

    // Lloyd update: (subspace, code, dim)-keyed integer means ×10. Only
    // the m×codes×subDim model crosses the driver.
    val sums = asg1.select(col("s"), col("c1"),
        posexplode(col("sq")).as(Seq("i", "x")))
      .groupBy(col("s"), col("c1"), col("i")).agg(sum(col("x")).as("sm"))
    val cnts = asg1.groupBy(col("s"), col("c1")).agg(count(lit(1)).as("c"))
    val cb1 = sums.join(cnts, Seq("s", "c1"))
      .withColumn("mc", expr("(10 * sm) div c"))
      .groupBy(col("s"), col("c1"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("mc")))),
        x => x.getField("mc")).as("mv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.map(t => (t._2, t._3)).toSeq.sortBy(_._1)
      }

    // Encode: final code per (vector, subspace) against the updated
    // codebook; ×10 scale ⇒ d = 100|x|² − 20<x,mv> + |mv|².
    def codewordDist(mv: Array[Long]): Column =
      lit(100L) * col("nsq") -
        lit(20L) * Similarity.dotQ(col("sq"), typedlit(mv.toSeq)) +
        lit(mv.map(v => v * v).sum)
    val c2Expr = bySub((0 until m).map { s =>
      (s, nearest(cb1(s).map { case (cid, mv) => (codewordDist(mv), cid) })
        .getField("cid"))
    })
    val encoded = model(
      asg1.withColumn("code", c2Expr)
        .select(col("vec_id"), col("is_q"), col("s"), col("code")))

    // ADC lookup table: exact distance from each query subvector to each
    // codeword — queries × m × codes rows, broadcast-sized by design.
    val lutExpr = bySub((0 until m).map { s =>
      (s, array(cb1(s).map { case (cid, mv) =>
        struct(lit(cid).as("cid"), codewordDist(mv).as("d"))
      }: _*))
    })
    val lut = subs.where(col("is_q"))
      .select(col("vec_id").as("query_id"), col("s"), explode(lutExpr).as("cd"))
      .select(col("query_id"), col("s"), col("cd.cid").as("code"),
        col("cd.d").as("d"))
    Some(PqModel(qe, encoded, lut))
  }

  /** Rank `(query, candidate)` ADC sums and keep the top k per query. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("nbr_id"),
        col("approx_d"))
  }

  private def emptyResult(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    Seq.empty[(Long, Int, Long, Long)]
      .toDF("query_id", "rank", "nbr_id", "approx_d")
  }

  /** PQ-ADC top-k: every non-query vector ranked per query by the summed
    * codeword-distance approximation. Output
    * `query_id, rank, nbr_id, approx_d` with `approx_d` the exact BIGINT
    * ADC distance in the ×10 coordinate scale.
    *
    * `m` subspaces (dims must divide evenly), `codes` codewords per
    * subspace (seeded from the `codes` lowest-id vectors, one Lloyd
    * update). */
  def pqTopK(emb: DataFrame, idCol: String, embCol: String, isQuery: Column,
             k: Int = 3, m: Int = 4, codes: Int = 8,
             shareKey: Option[String] = None): DataFrame = {
    require(m > 0 && codes > 0 && k > 0, "m, codes, k must be positive")
    buildModel(emb, idCol, embCol, isQuery, m, codes, shareKey) match {
      case None => emptyResult(emb)
      case Some(mod) =>
        // ADC: candidates carry only codes; the LUT join is a broadcast
        // equi-join on (subspace, code); the per-(query, candidate) sum is
        // the one shuffle.
        rankTopK(mod.encoded.join(broadcast(mod.lut), Seq("s", "code"))
          .where(col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(sum(col("d")).as("approx_d")), k)
    }
  }

  /** IVFADC: [[pqTopK]] behind the coarse quantizer — each query scores
    * only vectors in its `nprobe` nearest of `nlist` cells (cells from
    * the `nlist` lowest-id vectors, the q29 convention). The candidate
    * cut is the paper's point: expected candidates per query drop from N
    * to N·nprobe/nlist, and at scale the cell id is the partition key so
    * probing is partition pruning ([[Similarity.ivfTopK]]'s design),
    * while ADC keeps the scoring payload at code width. The candidate
    * join shuffles on `vec_id` (corpus-keyed, never pairwise); the probe
    * table is queries × nprobe rows and broadcasts. */
  def ivfpqTopK(emb: DataFrame, idCol: String, embCol: String,
                isQuery: Column, k: Int = 3, m: Int = 4, codes: Int = 8,
                nlist: Int = 16, nprobe: Int = 2,
                shareKey: Option[String] = None): DataFrame = {
    require(nlist > 0 && nprobe > 0 && nprobe <= nlist,
      "need 0 < nprobe <= nlist")
    buildModel(emb, idCol, embCol, isQuery, m, codes, shareKey) match {
      case None => emptyResult(emb)
      case Some(mod) =>
        // Coarse centroids: the nlist lowest-id vectors (model-sized
        // collect). Distances in the offset scale — assignment is
        // translation-invariant, so the offset cancels.
        val cents = mod.qe.orderBy(col("vec_id")).limit(nlist)
          .select(col("vec_id"), col("q")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        val qeN = mod.qe.withColumn("nx", Similarity.normQ(col("q")))
        val cellDs = cents.toSeq.map { case (cid, cv) =>
          (col("nx") - lit(2L) * Similarity.dotQ(col("q"), typedlit(cv.toSeq)) +
            lit(cv.map(v => v * v).sum), cid)
        }
        val cellAsg = qeN.withColumn("cell", nearest(cellDs).getField("cid"))
          .select(col("vec_id"), col("cell"))
        // Probe list: each query's nprobe nearest cells — sort the
        // (distance, cid) structs, take the head (ties toward lower cid,
        // the shared argmin convention).
        val probes = qeN.where(col("is_q"))
          .select(col("vec_id").as("query_id"),
            explode(slice(sort_array(array(cellDs.map { case (d, cid) =>
              struct(d.as("d"), lit(cid).as("cid"))
            }: _*)), 1, nprobe)).as("cd"))
          .select(col("query_id"), col("cd.cid").as("cell"))
        val candidates = cellAsg.join(broadcast(probes), Seq("cell"))
          .select(col("query_id"), col("vec_id"))
        rankTopK(mod.encoded.join(candidates, Seq("vec_id"))
          .join(broadcast(mod.lut), Seq("query_id", "s", "code"))
          .where(col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(sum(col("d")).as("approx_d")), k)
    }
  }
}
