package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Host-graph centrality for crawl curation. Real pipelines rank hosts (Common
  * Crawl publishes exactly this as its host-level ranks; RefinedWeb/C4-style
  * curation filters on them) and use the rank as a per-document quality prior.
  *
  * No reference counterpart (auto-featurs has no graph operators); the semantics
  * are the textbook damped PageRank over a weighted edge list:
  *
  *   rank_0(v)     = 1/N
  *   rank_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} rank_t(u)·w(u,v)/outdeg(u)
  *                                   + danglingMass_t / N )
  *
  * where multi-edges weight by multiplicity, `outdeg(u)` is the weighted
  * out-degree, and the rank mass of dangling nodes (no out-edges) is
  * redistributed uniformly — total rank stays 1 every iteration.
  *
  * Scale shape (host graphs: ~10⁸ nodes, ~10¹⁰ edges at crawl scale):
  *   - the transition matrix (src, dst, p) is built ONCE — two groupBys on
  *     (src,dst) / (src) with map-side partial aggregation — persisted, and
  *     hash-partitioned on `src` so every iteration's contribution join reuses
  *     the same partitioning; ranks are repartitioned to match, so the
  *     per-iteration shuffle moves only the N-row rank frame, never the edges.
  *   - per iteration: one join + one groupBy(dst) aggregation, plus ONE driver
  *     scalar (the dangling mass — a single double; bounded at any scale).
  *   - iterative lineage is cut by persisting each rank frame and unpersisting
  *     its predecessor; `checkpointEvery` additionally localCheckpoints to keep
  *     the plan itself from growing on long runs.
  *   - hot hosts (every crawl has a few) skew the groupBy(dst); AQE's skew
  *     handling applies, and contributions are pre-aggregated map-side.
  *
  * `roundEachIter` floors each iteration's ranks to 6 decimals (the repo-wide
  * floor-based r6 formula) so a second engine iterating in a different
  * summation order stays bit-identical — the cross-engine-oracle switch; leave
  * it off for production runs.
  */
object HostGraph {

  /** @param edges   edge list; null src/dst rows are dropped
    * @param iters   fixed iteration count (power iteration; callers wanting a
    *                convergence test can compare successive outputs)
    * @return (host, rank) — one row per distinct node, Σ rank = 1
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      damping: Double = 0.85, roundEachIter: Boolean = false,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping >= 0.0 && damping <= 1.0, s"damping must be in [0,1], got $damping")
    val spark = edges.sparkSession
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    def rnd(c: org.apache.spark.sql.Column) = if (roundEachIter) r6(c) else c

    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)

    // transition probabilities, built once; partitioned on src for join reuse
    val w = e.groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
    val outDeg = w.groupBy("src").agg(sum("w").as("od"))
    val trans = w.join(outDeg, "src")
      .select(col("src"), col("dst"), (col("w") / col("od")).as("p"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    if (n == 0) {
      trans.unpersist(); nodes.unpersist()
      return nodes.withColumn("rank", lit(null).cast("double"))
    }
    // nodes WITH out-edges; a rank row absent from this set is dangling
    val srcNodes = outDeg.select(col("src").as("host"))

    var ranks = nodes.select(col("host"), rnd(lit(1.0 / n)).as("rank"))
      .repartition(col("host")).persist(StorageLevel.MEMORY_AND_DISK)
    var prev: DataFrame = null
    for (i <- 1 to iters) {
      val danglingMass = ranks.join(srcNodes, Seq("host"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contrib = trans.join(ranks, trans("src") === ranks("host"))
        .groupBy(col("dst").as("host"))
        .agg(sum(col("p") * col("rank")).as("c"))
      val base = (1.0 - damping) / n + damping * danglingMass / n
      var next = nodes.join(contrib, Seq("host"), "left")
        .select(col("host"),
          rnd(lit(base) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .repartition(col("host"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0) next = next.localCheckpoint(false)
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      if (prev != null) prev.unpersist()
      prev = ranks
      ranks = next
    }
    // materialize the result, then release every intermediate persist — the
    // returned frame stays cached (callers running it repeatedly get the hit;
    // unpersist() it when done)
    ranks.count()
    trans.unpersist(); nodes.unpersist()
    if (prev != null) prev.unpersist()
    ranks
  }
}
