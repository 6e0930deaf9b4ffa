package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * step that turns near-duplicate PAIRS into duplicate CLUSTERS: LSH
  * emits (a, b) matches, but production dedup must keep exactly one
  * representative per transitive cluster (a~b, b~c => drop two of
  * {a,b,c}), which is a connected-components problem.
  *
  * Algorithm: iterated min-label propagation (each node takes the min of
  * its own and its neighbours' labels) COMPOSED with pointer halving
  * (each node then jumps to its label's label — the classic shortcut
  * from the published MapReduce-CC literature, cf. Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), to a fixpoint. Per
  * iteration: one join of the (pinned, eagerly checkpointed) symmetric
  * edge list against the label table + one map-side-combined min
  * aggregation + one label-table self-join — all shuffles keyed on node
  * ids, payload two longs. The halving step turns O(diameter)
  * convergence into O(log diameter) — the difference between 10^6 and
  * ~20 shuffle rounds on a web-scale chain; `maxIters` fails loudly
  * rather than returning a half-converged labelling.
  */
object ConnectedComponents {

  /** (node, component) for every node appearing in `edges`; component =
    * the minimum node id reachable from the node. Self-loops and
    * duplicate/reversed edges are fine.
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .localCheckpoint(true) // reused every iteration — pin it once
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    // Superseded label tables (and sym) are unpersisted as soon as their
    // successor is materialized — a localCheckpoint(true) block is
    // lineage-truncated and NOT evictable, so leaving up to maxIters
    // copies pinned would starve the block manager on a long session.
    while (changed > 0 && it < maxIters) {
      val neighbourMin = sym
        .join(labels.select(col("node").as("v"), col("label").as("vl")), "v")
        .groupBy(col("u").as("node"))
        .agg(min(col("vl")).as("nl"))
      val hopped = labels.join(neighbourMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // Pointer halving: jump each node's label to its label's label.
      // A plain neighbour-min pass moves a label one edge per iteration
      // (O(diameter) rounds — a 10^6-hop web-graph chain would need
      // 10^6 shuffles); composing it with this label-of-label shortcut
      // gives the standard O(log diameter) convergence.
      val next = hopped
        .join(hopped.select(col("node").as("label"), col("label").as("__ll__")),
          Seq("label"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("__ll__"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("node"), col("label").as("old")), "node")
        .filter(col("label") =!= col("old")).count() // materializes `next`
      graft.core.Pinned.free(labels) // superseded — free its pinned blocks
      labels = next
      it += 1
    }
    graft.core.Pinned.free(sym)
    require(changed == 0,
      s"connected components did not converge in $maxIters iterations")
    // `labels` (the fixpoint) stays pinned: it is lineage-truncated, so it
    // must survive until the caller consumes the returned frame.
    labels.select(col("node"), col("label").as("component"))
  }

  /** Duplicate-cluster composition: near-dup pairs -> components; the
    * component label (min member id) IS the kept representative, every
    * other member is a drop. Returns (node, component, keep boolean).
    */
  def clusterRepresentatives(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    components(pairs, aCol, bCol)
      .withColumn("keep", col("node") === col("component"))
}
