package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational frequency sketches. Count-Min (Cormode/Muthukrishnan, J.
  * Algorithms 2005): a d×w counter matrix; each item increments one bucket
  * per row (d independent hashes), an item's estimate is the MIN of its d
  * buckets — always an overestimate, within εN with probability 1-δ for
  * w = e/ε, d = ln(1/δ).
  *
  * Why it earns a place next to the exact `groupBy(term).count()` paths
  * (vocab, boilerplate, BM25 stats): the sketch is d·w counters REGARDLESS
  * of corpus size — the bounded-memory frequency store for a 100 TB stream
  * where the distinct-term relation itself is too large to keep hot — and
  * it merges by plain ADDITION (counter matrices sum cell-wise), so
  * per-shard/per-day sketches roll up without rescanning history. Both
  * construction (keyed count) and lookup (min over d cells) are exact
  * integer arithmetic over md5-derived buckets — the DuckDB oracle replays
  * the whole matrix bit-for-bit; no tolerance band needed.
  */
object Sketches {

  /** Bucket of `term` in sketch row `r` (0-based): eight hex chars of the
    * term's md5, sliced per row (32 hex chars = 4 disjoint 32-bit hashes —
    * the portable-hash convention, so DuckDB replays identical buckets).
    */
  def cmsBucket(term: Column, r: Int, w: Int): Column =
    pmod(conv(substring(md5(term), 1 + 8 * r, 8), 16, 10).cast("long"),
      lit(w.toLong))

  /** The d×w counter matrix over token occurrences of `termCol`:
    * (r, bucket, c). Fixed d·w rows at any corpus size; shard matrices
    * merge by summing c per (r, bucket).
    */
  def cmsMatrix(rows: DataFrame, termCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 4, s"d must be 1..4 (md5 yields 4 disjoint 32-bit slices), got $d")
    val cells = array((0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(termCol), r, w).as("bucket"))): _*)
    rows.select(explode(cells).as("cell"))
      .select(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point-estimate the frequency of each candidate term from the matrix:
    * (term, c_est) with c_est = min over the term's d cells. Candidates
    * explode to d slim rows and equi-join the (broadcastable, d·w-row)
    * matrix — no corpus access at lookup time.
    */
  def cmsEstimate(candidates: DataFrame, matrix: DataFrame, termCol: String,
                  d: Int, w: Int): DataFrame = {
    val cells = array((0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(termCol), r, w).as("bucket"))): _*)
    candidates.select(col(termCol), explode(cells).as("cell"))
      .select(col(termCol), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .join(matrix, Seq("r", "bucket"))
      .groupBy(termCol).agg(min(col("c")).as("c_est"))
  }
}
