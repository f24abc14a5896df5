package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-duplicate pair graph —
  * the step that turns pairwise dedup candidates (MinHash-LSH, SimHash
  * Hamming pairs) into document CLUSTERS, so a pipeline can keep one
  * canonical document per component (the structure of every large-scale
  * corpus dedup: pairs → components → keep-min).
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the minimum component id over itself and its neighbours; the
  * fixpoint labels every node with the minimum doc id reachable from it,
  * i.e. its connected component. Rounds needed = the maximum component
  * DIAMETER. Near-dup components are band-collision cliques or short
  * chains (diameter ≤ ~3), so this converges in 2–4 rounds; for
  * high-diameter graphs the O(log n)-round alternating large-star /
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) is the drop-in upgrade — same
  * join/groupBy plan per round, different propagation rule.
  *
  * Scale design (100 TB): per round, one broadcast-or-shuffle join of the
  * label table against the edge list plus one groupBy(min) — both keyed
  * on node id, both AQE-protected. The edge list is persisted once
  * ([[graft.ops.TransientCache]]; the caller's runner releases it) and
  * each round's label table is `localCheckpoint`ed to truncate lineage —
  * an iterative algorithm that keeps its full lineage re-executes every
  * prior round at each action and dies at scale. Convergence is detected
  * with a changed-label count (a driver-side scalar per round, like any
  * iterative MLlib/GraphX driver loop).
  */
object Components {

  /** (node, component) for every node appearing in `edges`; component =
    * min node id reachable. Deterministic for any edge order. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val undirected = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val e = graft.ops.TransientCache.persist(undirected)
    var labels = graft.ops.TransientCache.track(
      e.select(col("src").as("node")).distinct()
        .withColumn("comp", col("node"))
        .localCheckpoint(true))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // Neighbour labels flow along each edge; min with the node's own.
      val neighbour = e.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("comp"))
      val next = graft.ops.TransientCache.track(
        labels.union(neighbour)
          .groupBy(col("node")).agg(min(col("comp")).as("comp"))
          .localCheckpoint(true))
      changed = next.as("n").join(labels.as("o"), "node")
        .where(col("n.comp") =!= col("o.comp")).count()
      labels = next
      it += 1
    }
    labels
  }

  /** Component summary: size and canonical (min) member per component of
    * the pair graph. */
  def componentSizes(membership: DataFrame): DataFrame =
    membership.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_docs"), min(col("node")).as("canonical"))
}
