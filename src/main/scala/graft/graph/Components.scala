package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared connected-components module: the alternating large-star /
  * small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi,
  * Vassilvitskii — "Connected Components in MapReduce and Beyond",
  * SoCC'14). Replaces the two duplicated min-label propagation loops
  * that previously lived in dedup.Dedup (dedup_groups) and
  * sim.Similarity (dedup_embedding).
  *
  * Why this and not min-label propagation: propagation converges in
  * O(component diameter) rounds — fine for 2–3-deep near-dup clusters,
  * a scale risk for chained-duplicate paths at corpus scale (a length-d
  * chain costs d shuffles). The alternating star algorithm contracts
  * whole trees per round and converges in O(log n) rounds regardless of
  * diameter, with the same per-round join shape (equi-joins keyed on
  * node id). One driver scalar per round (the convergence count).
  *
  * Round semantics over an edge set E kept oriented large→small
  * (src > dst after the first large-star):
  *  - large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u),
  *    v > u — every node's strictly-larger neighbors re-attach to its
  *    minimum, halving tree heights;
  *  - small-star(v) over the large→small orientation: m = min(Γ(v));
  *    emit (u, m) for u ∈ Γ(v) and (v, m) — smaller neighbors and the
  *    node itself collapse onto the local minimum.
  * Both preserve connectivity (paper, Lemmas 1–2); the unique fixpoint
  * per component is the star rooted at its minimum id, so stop when a
  * round leaves the edge set unchanged (the paper's own criterion; the
  * symmetric-difference count is the one driver action per round).
  */
object Components {

  /** For every row of `nodes` (single id column), the minimum node id
    * reachable through the undirected `pairs` graph (columns taken
    * positionally; self-pairs ignored; ids absent from `pairs` label
    * themselves). Output columns: (id, label), id column named after
    * `nodes`' first column.
    */
  def labels(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val idCol = nodes.columns.head
    var e = graft.Caches.register(
      pairs.toDF("x", "y")
        .where(col("x") =!= col("y"))
        // large→small orientation from the start: the round invariant
        .select(greatest(col("x"), col("y")).as("src"),
          least(col("x"), col("y")).as("dst"))
        .distinct().persist())
    val spark = nodes.sparkSession
    var changed = 1L
    while (changed > 0) {
      val next = smallStar(largeStar(e))
      // PLAN truncation, not just caching: each round references the
      // previous round's frame ~6× (union + join in large-star, twice in
      // small-star, 4× in the convergence diff), so carrying analyzed
      // plans forward grows them 6^rounds — the analyzer, not the data,
      // becomes the bottleneck by round ~7. Re-wrapping the RDD resets
      // the logical plan to a LogicalRDD of bounded size while keeping
      // recompute-on-eviction lineage (the repo's persist-not-checkpoint
      // rule) — the RDD chain grows linearly in rounds, which is fine.
      val e2 = graft.Caches.register(
        spark.createDataFrame(next.rdd, next.schema).persist())
      // one scalar action per round; materializes e2's cache as a side
      // effect. Set equality (both sides are distinct) certifies the
      // fixpoint — the star forest — per the paper's stopping rule.
      changed = e2.exceptAll(e).union(e.exceptAll(e2)).count()
      // the superseded round's cache is dead weight once e2 is
      // materialized; drop it eagerly so O(log n) rounds hold O(1)
      // cached edge sets, not a growing chain
      e.unpersist()
      e = e2
    }
    val lab = e.groupBy(col("src").as(idCol)).agg(min(col("dst")).as("label"))
    nodes.select(col(idCol)).join(lab, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("label"))
  }

  /** Emitted edges keep dst < src (m ≤ u < v), so the orientation
    * invariant holds without re-normalizing.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mn = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("u"), least(col("src"), col("mn")).as("m"))
    sym.join(mn, col("src") === col("u"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One full large-star + small-star round over an oriented edge frame —
    * exposed for the physical-plan audit (PlanAuditSpec asserts the round
    * is equi-join/aggregate-shaped, never a cross product).
    */
  private[graft] def auditRound(e: DataFrame): DataFrame = smallStar(largeStar(e))

  /** Input already oriented large→small, so Γ(v) here is exactly the
    * smaller-neighbor set; m ≤ u for every emitted (u, m) and the u = m
    * self-loop is dropped.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mn = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
    e.join(mn, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(mn.select(col("src"), col("m")))
      .where(col("src") =!= col("dst"))
      .distinct()
  }
}
