package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the corpus-quality-weighting leg of web-scale
  * curation (Common Crawl ranks hosts by centrality; quality-weighted
  * sampling feeds those scores back into mixture weights). PageRank is the
  * canonical iterative-relational workload: each round is one equi-join of
  * the edge relation against the current rank vector plus a keyed
  * aggregation, so the 100 TB shape is "E edges shuffled per round, R
  * rounds", never an adjacency matrix.
  *
  * Scale notes:
  *   - the edge relation and out-degree relation are computed ONCE and
  *     persisted; each Lloyd-style round re-reads the materialization.
  *   - ranks are localCheckpoint'ed per round — the iterative-lineage rule
  *     (see llm/Dedup.connectedComponents): un-truncated lineage doubles
  *     per round and eventually OOMs the driver on the plan string alone.
  *   - the rank vector is |V| rows (node, rank) — hash-partitioned for the
  *     edge join; at web scale |V| ~ 10^9 rows of 16 bytes, comfortably a
  *     shuffle join; at fixture scale AQE broadcasts it.
  *   - dangling mass and |V| ride as one-row broadcast aggregates; no
  *     driver-side collect in the loop beyond the checkpoint action.
  *
  * Cross-engine determinism (the q72/ln conventions adapted to iteration):
  * every per-edge contribution is round(rank/outdeg, 9) and summed through
  * decimal(38,12) (exact, order-free); the rank update is a fixed IEEE
  * expression tree over those exact sums, re-rounded to 9 places before it
  * feeds the next round — so Spark and DuckDB replay bit-identical ranks
  * for any iteration count. 9 places, not 12: both engines round doubles
  * through a scaled multiply, whose half-way-boundary error margin shrinks
  * as the scale grows — at 9 digits the margin is ~1e3x the product error,
  * safe across the ~1e6 roundings a fixture run performs.
  */
object LinkGraph {

  /** PageRank with uniform teleport and dangling-mass redistribution, a
    * fixed number of rounds. `edges` is a directed simple graph (src, dst)
    * — callers dedup multi-edges first if their semantics require it.
    * Returns (node, rank) over all nodes appearing as src or dst;
    * sum(rank) == 1 up to the per-node 1e-12 rounding.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val outdeg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nAgg = nodes.agg(count(lit(1)).cast("double").as("n"))

    var ranks = nodes.crossJoin(broadcast(nAgg))
      .select(col("node"), round(lit(1.0) / col("n"), 9).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(round(col("rank") / col("outdeg"), 9).cast("decimal(38,12)"))
          .cast("double").as("s"))
      // dangling mass: rank parked on nodes with no out-edges is
      // redistributed uniformly — without it the total rank leaks and the
      // scores of sink-heavy corpora collapse toward the teleport floor
      val dang = ranks.join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank").cast("decimal(38,12)")),
          lit(0).cast("decimal(38,12)")).cast("double").as("dm"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang)).crossJoin(broadcast(nAgg))
        .select(col("node"),
          round((lit(1.0) - lit(damping)) / col("n") +
            lit(damping) * (coalesce(col("s"), lit(0.0)) + col("dm") / col("n")),
            9).as("rank"))
        .localCheckpoint()
    }
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    ranks
  }
}
