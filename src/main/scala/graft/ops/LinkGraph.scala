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
  * Arithmetic is FIXED-POINT: ranks live in integer units of 1e-12 (BIGINT),
  * per-edge contributions are integer `div`, and the damping update is
  * rational ((15·(R div n) + 85·(s + dm div n)) div 100). A float
  * formulation needs a round() at every iteration boundary, and rank/outdeg
  * with power-of-two degrees lands EXACTLY on round-half boundaries, where
  * engines legitimately disagree (Spark rounds through exact decimals,
  * DuckDB through a scaled double multiply — observed 1e-9 splits on ~0.6%
  * of nodes). Integer ops have no boundary: every engine computes identical
  * units, forever. The floor-truncation mass drift is bounded by
  * (|V| + |E|)·1e-12 per round — the standard fixed-point PageRank trade.
  *
  * Scale notes:
  *   - the edge relation (with out-degree folded in ONCE) is persisted;
  *     every round re-reads the materialization.
  *   - ranks are localCheckpoint'ed per round — the iterative-lineage rule
  *     (see llm/Dedup.connectedComponents): un-truncated lineage doubles
  *     per round and eventually OOMs the driver on the plan string alone.
  *     Round N-1's checkpoint blocks are RELEASED as soon as round N is
  *     materialized (Checkpoints.release) — the loop's steady-state
  *     footprint is one rank vector, not `iters` of them.
  *   - the rank vector is |V| rows (node, units) — hash-partitioned for the
  *     edge join; at web scale |V| ~ 10^9 rows of 16 bytes, comfortably a
  *     shuffle join; at fixture scale AQE broadcasts it.
  *   - |V| is a driver literal (one count up front). The per-round dangling
  *     mass is NOT: it rides as a broadcast 1-row aggregate inside the
  *     round's own plan, so each round is exactly ONE action (the eager
  *     checkpoint) with no driver round-trip serializing the loop — the
  *     earlier per-round `head()` was a sync point that cost a full
  *     scheduler wait per iteration (VERDICT r06 #3).
  */
object LinkGraph {

  /** Total rank mass in units: 1.0 == 1e12 units. */
  val UnitsTotal: Long = 1000000000000L

  /** PageRank with uniform teleport and dangling-mass redistribution, a
    * fixed number of rounds. `edges` is a directed simple graph (src, dst)
    * — callers dedup multi-edges first if their semantics require it.
    * Returns (node, rank_units, rank) over all nodes appearing as src or
    * dst; rank = rank_units/1e12 (exact: units < 2^53), sum(rank_units) ==
    * UnitsTotal minus the bounded floor drift.
    */
  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).persist(lvl)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().persist(lvl)
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("outdeg")).persist(lvl)
    // out-degree is static — fold it into the edge relation ONCE so each
    // round joins only the rank vector, not rank AND degree
    val e = e0.join(outdeg, Seq("src")).persist(lvl)
    // dangling node SET is static — compute once, not per round
    val dangling = nodes
      .join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
      .persist(lvl)
    val n = nodes.count()
    require(n > 0, "edge set is empty")
    val teleport = (100L - dampingPct) * (UnitsTotal / n) // exact driver ints

    var ranks = nodes.select(col("node"),
      lit(UnitsTotal / n).as("ru")).localCheckpoint()
    for (_ <- 1 to iters) {
      // dangling mass: rank parked on nodes with no out-edges is
      // redistributed uniformly — without it the total rank leaks and the
      // scores of sink-heavy corpora collapse toward the teleport floor.
      // It enters the plan as a broadcast 1-row aggregate (always exactly
      // one row: a global agg over the dangling semi-join, null-coalesced),
      // so the dangling sum, the contribs aggregation, and the damping
      // update all execute under the round's single checkpoint action.
      val dm = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum(col("ru")), lit(0L)).as("dm"))
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("ru div outdeg")).as("s"))
      val prev = ranks
      // `dm div n`: both non-negative, so SQL integer div == the driver's
      // floor division — per-round units are bit-identical to the old
      // driver-literal form and the q100 oracle replays unchanged
      ranks = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dm))
        .select(col("node"),
          expr(s"($teleport + $dampingPct * (coalesce(s, 0L) + (dm div ${n}L))) div 100")
            .as("ru"))
        .localCheckpoint()
      org.apache.spark.sql.graft.Checkpoints.release(prev)
    }
    e0.unpersist(); e.unpersist(); nodes.unpersist(); outdeg.unpersist(); dangling.unpersist()
    ranks.select(col("node"), col("ru").as("rank_units"),
      (col("ru").cast("double") / lit(1.0e12)).as("rank"))
  }

  /** Per-node triangle counts over an UNDIRECTED simple graph given as
    * `(a, b)` with `a < b`, one row per edge. Returns `(node, deg, tri)`
    * for every node (tri = 0 when none) — local clustering coefficient is
    * then `2·tri / (deg·(deg−1))`.
    *
    * This is the degree-ordered edge-iterator algorithm (the MapReduce
    * triangle-counting standard, Suri & Vassilvitskii WWW'11): orient each
    * edge from the endpoint with lower `(deg, id)` to the higher, build
    * wedges by self-joining oriented edges on their source with the two
    * targets rank-ordered, and close each wedge with ONE equi-join back to
    * the oriented edge set. Orientation bounds every out-neighborhood by
    * O(√m), so total wedge volume is O(m^{3/2}) regardless of skew — a
    * celebrity node with 10^6 neighbors produces no 10^12-wedge explosion,
    * because its edges all point INTO it. Three hash joins, no windows, no
    * driver state: the 100 TB shape.
    */
  def triangleStats(edges: DataFrame, aCol: String = "a",
                    bCol: String = "b"): DataFrame = {
    // MULTI-CONSUMER lineage is materialized once: `e` feeds deg + the
    // orientation join, `ed` is consumed THREE times (both wedge legs and
    // the closing join) — unmaterialized, the caller's edge construction
    // (often a distinct-ed self-join) would re-run three times. The
    // node-sized result is materialized so the edge-sized intermediates
    // can be released before returning.
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b")).localCheckpoint()
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg")).localCheckpoint()
    val lower = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val ed = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(lower, col("a")).otherwise(col("b")).as("u"),
        when(lower, col("b")).otherwise(col("a")).as("w"),
        when(lower, col("db")).otherwise(col("da")).as("dw"))
      .localCheckpoint()
    // shuffled-hash, not sort-merge (optimization r21, guide §3.1): the
    // wedge self-join and the closing join dominate the operator; SMJ pays
    // a full sort of BOTH sides per join, where a per-partition hash build
    // of one side skips every sort. Build sides: `y`/`ed` — bounded by the
    // oriented edge relation, whose per-key width the degree orientation
    // already caps at O(√m). Join strategy only; output rows identical.
    val x = ed.select(col("u"), col("w").as("p"), col("dw").as("dp"))
    val y = ed.select(col("u"), col("w").as("q"), col("dw").as("dq"))
    val wedges = x.join(y.hint("shuffle_hash"), Seq("u"))
      .filter(col("dp") < col("dq") || (col("dp") === col("dq") && col("p") < col("q")))
    val tris = wedges.join(
        ed.select(col("u").as("p"), col("w").as("q")).hint("shuffle_hash"),
        Seq("p", "q"))
      .select(col("u"), col("p"), col("q"))
    val tn = tris.select(explode(array(col("u"), col("p"), col("q"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    val out = deg.join(tn, Seq("v"), "left")
      .select(col("v").as("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .localCheckpoint()
    Seq(e, deg, ed).foreach(org.apache.spark.sql.graft.Checkpoints.release)
    out
  }
}
