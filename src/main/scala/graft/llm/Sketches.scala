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

  /** Deterministic mergeable approximate quantiles by bottom-k hash
    * sampling: each group keeps the k rows whose md5 content hash is
    * SMALLEST — a uniform sample that is a pure function of the row
    * MULTISET (order-independent, hence mergeable: union → keep bottom-k
    * again, the same property [[org.apache.spark.sql.graft.KmvSketch]]
    * uses for distinct counts) — and estimates the p-quantile as the
    * nearest-rank element of the value-sorted sample. Unlike GK/KLL
    * sketches, whose merge result depends on arrival order, the bottom-k
    * sample is bit-reproducible on any cluster size and replayable in SQL.
    *
    * `rowKey` identifies content, NOT rows — duplicates are fine: copies
    * of a (key, value) pair are disambiguated by a deterministic
    * per-copy index `md5(key#i)`, minted from ONE pre-aggregation, so the
    * sample never depends on which physical copy "won". Values ride the
    * heap as `floor(v·scale + 0.5)` fixed-point longs (resolution
    * 1/valueScale — exact for currency at scale 100; sketches are
    * approximate by design), eliminating any value join-back.
    *
    * Determinism details: hashes are 13 md5 hex chars — 52 bits, EXACT as
    * the bounded heap's double score, so heap order == BIGINT hash order;
    * equal-hash ties (the same key carrying DIFFERENT values shares
    * `md5(key#i)`) rank by the smaller quantized value — the heap's id
    * tie-pin, which the oracle mirrors as `ORDER BY hv, vq`; the
    * nearest-rank index `floor(p·(|sample|-1) + 0.5)` is a fixed double
    * op sequence.
    *
    * Scale: one (group, key, value) pre-aggregate (map-side combinable),
    * the copy explode (output size == input rows), one bounded-heap
    * aggregate (k entries per group on every mapper), a per-group array of
    * k — no global sort, no window, no join against the corpus.
    */
  def bottomKQuantiles(df: DataFrame, groupCol: String, rowKey: Column,
                       value: Column, k: Int, probes: Seq[Double],
                       valueScale: Long = 1000000L): DataFrame = {
    require(k > 0, s"k=$k")
    require(valueScale > 0, s"valueScale=$valueScale")
    require(probes.nonEmpty && probes.forall(p => p >= 0.0 && p <= 1.0),
      s"probes must be in [0,1]: $probes")
    val vq = floor(value.cast("double") * lit(valueScale.toDouble) + lit(0.5))
      .cast("long")
    val dedup = df
      .select(col(groupCol).as("g"), rowKey.cast("string").as("key"), vq.as("vq"))
      .groupBy("g", "key", "vq").agg(count(lit(1)).as("c"))
    val rows = dedup.select(col("g"), col("vq"),
        explode(sequence(lit(0L), col("c") - 1)).as("i"),
        col("key"))
      .select(col("g"), col("vq"),
        conv(substring(md5(concat(col("key"), lit("#"), col("i").cast("string"))),
          1, 13), 16, 10).cast("long").as("hv"))
    val sv = rows.groupBy("g").agg(
        org.apache.spark.sql.graft.TopKColumns
          .topKByScore(negate(col("hv").cast("double")), col("vq"), k).as("top"),
        count(lit(1)).as("n"))
      .select(col("g"), col("n"),
        array_sort(transform(col("top"), e => e.getField("id"))).as("sv"))
    sv.select(col("g").as(groupCol), col("n"), col("sv"),
        explode(array(probes.map(lit(_)): _*)).as("p"))
      .select(col(groupCol), col("n"), col("p"),
        (element_at(col("sv"),
          floor(col("p") * (size(col("sv")) - 1) + lit(0.5)).cast("int") + 1)
          .cast("double") / lit(valueScale.toDouble)).as("est"))
  }
}
