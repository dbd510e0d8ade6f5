package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the stage every
  * production dedup pipeline needs AFTER pair finding: pairs only say "A ~ B";
  * keep-one-per-group needs the transitive closure (A ~ B, B ~ C ⇒ one
  * cluster {A,B,C}) and a canonical representative per cluster.
  *
  * Algorithm: iterative min-label propagation (the Pregel formulation) —
  * every node starts labeled with its own id; each round, a node adopts the
  * smallest label among itself and its neighbors; converges in
  * O(component diameter) rounds to cluster_id = min node id in the component.
  * Each round is one equi-join of the EDGE list (∝ near-dup pairs, far
  * smaller than the corpus) against the label table (two longs per doc) plus
  * a min-aggregate — all hash-shuffled on id, nothing driver-side except the
  * convergence counter. Labels are localCheckpoint'ed per round so lineage
  * stays flat. Dedup graphs are overwhelmingly tiny near-cliques (diameter
  * 1-2), so this settles in 2-3 rounds; for a pathological long-chain graph
  * at extreme scale the alternating small-star/large-star variant (Kiveris
  * et al., "Connected Components in MapReduce and Beyond") halves round
  * count — same join shape, not needed for near-dup workloads.
  */
object DedupClusters {

  /** (id, cluster_id) for every node; cluster_id = min id in its component.
    * `nodes` carries exactly one id column `idCol`; `pairs` carries (id1,
    * id2) edges (undirected, any order, duplicates fine).
    */
  def connectedComponents(
      nodes: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {

    // snapshot the pair list FIRST: `pairs` is typically the tail of an
    // expensive pipeline (shingle/hash/verify), and the two union branches
    // below would otherwise each recompute it end-to-end
    val p = pairs
      .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"))
      .localCheckpoint()
    // symmetrized edge list, materialized once — reused every round
    val edges = p.select(col("id1").as("src"), col("id2").as("dst"))
      .union(p.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .localCheckpoint()

    // fused round 0: with every node initially labeled by its own id, the
    // first propagation's "min neighbor label" is just "min neighbor id" —
    // a bare aggregate over the edge list, no join, no prior label
    // checkpoint. For the near-clique components of a dedup graph this IS
    // the fixed point, so the loop below typically runs once (verify) —
    // one fewer join+checkpoint round both here and at 100 TB.
    var labels = nodes
      .select(col(idCol).cast("long").as("id"))
      .join(
        edges.groupBy(col("dst")).agg(min(col("src")).as("nbr_min"))
          .select(col("dst").as("id"), col("nbr_min")),
        Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("nbr_min"), col("id"))).as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("label").as("src_label")), "src")
        .groupBy(col("dst"))
        .agg(min(col("src_label")).as("nbr_min"))
        .select(col("dst").as("id"), col("nbr_min"))
      val step = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          coalesce(col("nbr_min") < col("label"), lit(false)).as("__chg"))
        .localCheckpoint()
      changed = step.filter(col("__chg")).count()
      labels = step.drop("__chg")
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
