package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over embedding columns (Lloyd's algorithm,
  * MacQueen 1967 / Lloyd 1982), built integer-exact so every engine
  * reproduces the same assignments bit-for-bit: embeddings quantize to
  * exact integer coordinates (the [[Similarity.quantize]] contract, plus
  * a positive offset so floor-division and truncating division agree),
  * distances are exact BIGINT arithmetic via the native `graft_dot`
  * codegen expression, and updated centroids are deterministically
  * rounded integer means (scaled ×10 for one extra digit of precision).
  *
  * 100 TB shape: the model (k×dim centroid table) is the ONLY thing that
  * ever leaves the executors — seeds and updated centroids are collected
  * (bounded by k·dim, independent of corpus size) and re-broadcast as
  * literal arrays, so each assignment pass is one map-side scan with k
  * codegen'd dot products per row, and each update pass is one
  * map-side-combined groupBy on (cluster, dimension). No crossJoin of
  * data against data, no shuffle wider than k·dim rows.
  */
object Clustering {

  /** Positive-offset quantization: `floor(x·1000) + 1000`. TESTDATA
    * embeddings live in (-1, 1), so coordinates land in (0, 2000); the
    * offset keeps every derived sum non-negative, making truncating
    * division (Spark `div`, DuckDB `//`) identical to floor division in
    * the centroid rounding below. Distances are translation-invariant,
    * so assignments are unaffected. */
  def quantizeOffset(emb: Column, scale: Int = 1000): Column =
    transform(emb, x => floor(x.cast("double") * scale).cast("long") + scale)

  /** Argmin over centroid literals: array_min on (distance, cid) structs
    * — lexicographic struct order breaks distance ties toward the lowest
    * centroid id, same as the oracle's `ORDER BY d, cid` row_number.
    * Shared with [[ProductQuantization]] so the tie-break convention
    * can't drift between the two codebook learners. */
  private[ext] def nearest(dists: Seq[(Column, Long)]): Column =
    array_min(array(dists.map { case (d, cid) =>
      struct(d.as("d"), lit(cid).as("cid"))
    }: _*))

  /** Two-pass k-means: seed with the k lowest-id vectors, assign, update
    * centroids once, re-assign. Output: one row per vector with
    * `vec_id, c1` (seed-pass cluster), `c2` (updated-pass cluster) and
    * `d2` (exact squared distance to the winning updated centroid, in
    * the ×10 coordinate scale). Clusters left empty by pass 1 simply
    * have no centroid in pass 2 (standard Lloyd's degeneracy; both
    * engines drop them identically).
    *
    * Two fixed passes rather than convergence looping keeps the operator
    * oracle-checkable; production would iterate the same update step
    * (each pass is one scan + one k·dim-wide aggregate, so cost is
    * passes × scan — the Spark-idiomatic kmeans loop). */
  def kmeansTwoPass(emb: DataFrame, idCol: String, embCol: String,
                    k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // Persisted: the quantized table feeds the seeds collect, both
    // update aggregates, and the final output — without it the scan +
    // quantize (and the pass-1 argmin below) re-execute per job.
    val qe = graft.ops.TransientCache.persist(
      emb.select(col(idCol).cast("long").as("vec_id"),
          quantizeOffset(col(embCol)).as("q"))
        .withColumn("nx", Similarity.normQ(col("q"))))

    // Seeds: deterministic k lowest ids (the IVF centroid convention).
    // k×dim longs to the driver — model-sized, corpus-independent.
    val seeds = qe.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("q")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    if (seeds.isEmpty) {
      // Empty input: no seeds, no assignments — return a typed empty
      // frame rather than building an argmin over zero centroids.
      import emb.sparkSession.implicits._
      return Seq.empty[(Long, Long, Long, Long)].toDF("vec_id", "c1", "c2", "d2")
    }

    // Pass 1: d(x, c) = |x|^2 - 2<x,c> + |c|^2, all exact BIGINT.
    val d1 = seeds.toSeq.map { case (cid, cv) =>
      val ncv = cv.map(v => v * v).sum
      (col("nx") - lit(2L) * Similarity.dotQ(col("q"), typedlit(cv.toSeq)) +
        lit(ncv), cid)
    }
    // Also persisted: consumed by the two update aggregates AND the
    // final projection — caching after the k-dot-product argmin keeps
    // pass 1 at one evaluation.
    val asg1 = graft.ops.TransientCache.persist(
      qe.withColumn("c1", nearest(d1).getField("cid")))

    // Update: per-(cluster, dim) sums (map-side combined), rounded to
    // integer means in the ×10 scale; truncating div == floor because
    // every coordinate is non-negative by construction.
    val sums = asg1.select(col("c1"), posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("c1"), col("i")).agg(sum(col("x")).as("s"))
    val cnts = asg1.groupBy(col("c1")).agg(count(lit(1)).as("c"))
    val cents2 = sums.join(cnts, "c1")
      .withColumn("m", expr("(10 * s) div c"))
      .groupBy(col("c1"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("mv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

    // Pass 2 against the ×10-scale centroids:
    // d = |10x|^2 - 2<10x, m> + |m|^2 = 100|x|^2 - 20<x,m> + |m|^2.
    val d2 = cents2.toSeq.map { case (cid, mv) =>
      val nm = mv.map(v => v * v).sum
      (lit(100L) * col("nx") -
        lit(20L) * Similarity.dotQ(col("q"), typedlit(mv.toSeq)) + lit(nm), cid)
    }
    val best = nearest(d2)
    asg1.withColumn("c2", best.getField("cid"))
      .withColumn("d2", best.getField("d"))
      .select(col("vec_id"), col("c1"), col("c2"), col("d2"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster embeddings with
    * k-means, then inside each cluster drop every vector that has an
    * EARLIER-id near-duplicate at cosine ≥ numT/denT. The parallel
    * relaxation of the paper's sequential keep-one policy: a vector is
    * dropped iff ANY earlier in-cluster vector dominates it (well-defined,
    * order-free, embarrassingly parallel — documented divergence from the
    * greedy chain rule, which cannot be evaluated independently per pair).
    *
    * Output: one row per vector — `vec_id, cluster, kept,
    * dominated_by` (the lowest dominating id, −1 when kept; −1 not NULL
    * so the column stays integer-typed end-to-end).
    *
    * Cosine uses the UN-offset quantization (the [[Similarity.quantize]]
    * contract, applied inside [[Similarity.nearDupPairs]]) — cosine is not
    * translation-invariant, so the k-means offset trick must not leak into
    * the similarity test. The threshold compare is the q26 integer
    * cross-multiplication in DECIMAL(38,0) (dot² would overflow BIGINT).
    *
    * 100 TB shape: the paper's own scaling argument — the O(n²) cosine
    * test runs within clusters only, and k is chosen so n/k bounds the
    * block size; the join is an equi-join on the cluster id. The pair
    * expansion IS [[Similarity.nearDupPairs]] with the cluster id as the
    * blocking key, so its skew guard applies verbatim: a cluster larger
    * than `skewBlockLimit` (Lloyd's degeneracy — a collapsed centroid set
    * concentrating the corpus in one cluster — makes this a real failure
    * mode, not a corner case) is auto-dispatched through the salted path,
    * splitting its pair work across `nSalts` independent tasks instead of
    * serializing one O(cluster²) task. Output is identical on both paths
    * (ClusteringSpec forces the salted path on a collapsed fixture). */
  def semDedup(emb: DataFrame, idCol: String, embCol: String, k: Int,
               numT: Int = 3, denT: Int = 10,
               skewBlockLimit: Long = 1L << 14, nSalts: Int = 32): DataFrame = {
    // Persisted: feeds both the pair expansion's input and the final
    // output join below.
    val asg = graft.ops.TransientCache.persist(
      kmeansTwoPass(emb, idCol, embCol, k).select(col("vec_id"), col("c2")))
    // The embedding rides along into nearDupPairs with the cluster id as
    // the blocking key; floats pass through unchanged (parquet embeddings
    // are float32 — the cast is a no-op on real data and pins the
    // quantization contract for ad-hoc double fixtures).
    val withCluster = emb.select(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<float>").as("__emb"))
      .join(asg, "vec_id")
    val dominated = Similarity
      .nearDupPairs(withCluster, "vec_id", "__emb", "c2",
        numT, denT, skewBlockLimit, nSalts)
      .groupBy(col("vec_b").as("vec_id")).agg(min(col("vec_a")).as("dom"))
    asg.join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("c2").as("cluster"),
        col("dom").isNull.as("kept"),
        coalesce(col("dom"), lit(-1L)).as("dominated_by"))
  }
}
