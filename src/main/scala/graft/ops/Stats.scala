package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column statistics beyond q83's per-column profile: exact Pearson
  * correlation matrices and equi-width histograms — the "understand this
  * table" pass a lake-side engine serves before anyone trains on the data.
  *
  * Scale design: each operator is ONE full-pass hash aggregate (map-side
  * combinable) producing a fixed-size model row, plus arithmetic on that
  * row — no second data pass, no window, no per-group sort. All double
  * reductions route through `decimal(18,6)` so the result is independent of
  * partitioning/accumulation order (the engine-exactness discipline of the
  * q01 `dsum` pattern).
  */
object Stats {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
  private def round6(x: Column): Column = floor(x * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Pairwise Pearson correlation of `cols` in ONE pass: the aggregate
    * collects n, Σx, Σx², and Σxy for every pair, and the matrix falls out
    * of the single model row —
    * `corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))`.
    * Exact-order-independent sums + a fixed IEEE op sequence ⇒ the same
    * bits on every run, partitioning, and engine (built-in `corr()` is
    * neither). One row per unordered pair `(col_x, col_y, corr)`, rounded
    * to 6 decimals half-up.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("n")) ++
      cols.flatMap(c => Seq(
        dsum(col(c)).as(s"s_$c"),
        dsum(col(c) * col(c)).as(s"ss_$c"))) ++
      pairs.map { case (a, b) => dsum(col(a) * col(b)).as(s"sp_${a}_$b") }
    // the decimal-routed partial sums are the whole cost — fan them out of
    // a row-group-bounded scan, carrying only the metric columns through
    // the (fixture-scale no-op at production row-group counts) shuffle
    val slim = graft.Tables.fanOut(
      df.select(cols.map(col): _*), cols.map(col): _*)
    val model = slim.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val num = col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      val den = sqrt(col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
        sqrt(col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round6(num / den).as("corr"))
    }
    model.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Equi-width histogram of `c` in `k` buckets over the observed [min,
    * max]: one stats aggregate broadcast into the scan, then a bounded
    * k-row count aggregate. The top edge closes into the last bucket
    * (`least(k-1, …)`), a constant column degenerates to bucket 0, and the
    * `(lo, hi]`-style bounds are derived arithmetically from the SAME
    * broadcast stats row, so they replay bit-identically.
    */
  def histogram(df: DataFrame, c: String, k: Int): DataFrame = {
    require(k >= 1, s"histogram needs k >= 1, got $k")
    val x = col(c).cast("double")
    val stats = df.agg(min(x).as("m"), max(x).as("mx"))
    val bucket = when(col("mx") === col("m"), lit(0))
      .otherwise(least(lit(k - 1),
        floor((x - col("m")) / (col("mx") - col("m")) * lit(k)).cast("int")))
    df.crossJoin(broadcast(stats))
      .select(bucket.as("bucket"), col("m"), col("mx"))
      .groupBy("bucket", "m", "mx").agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("m") + col("bucket") * (col("mx") - col("m")) / lit(k)).as("lo"),
        (col("m") + (col("bucket") + 1) * (col("mx") - col("m")) / lit(k)).as("hi"),
        col("n"))
  }

  /** Exact per-group median of `valueCol` — textbook even/odd: the mean of
    * the values at 1-based positions `(n+1) div 2` and `(n+2) div 2` of the
    * group's sorted order. Rows with equal values are interchangeable at
    * those positions, so the result is deterministic without a tie column;
    * `(min+max)/2` over the one or two selected rows is a fixed IEEE op
    * sequence both engines replay. One per-group window sort — groups sort
    * independently, no global sort.
    */
  private def groupMedian(df: DataFrame, g: String, vCol: Column,
                          as: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(g)).orderBy(col("__mv"))
    df.select(col(g), vCol.as("__mv"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(g))))
      .filter(col("__rn") === expr("(__n + 1) div 2")
        || col("__rn") === expr("(__n + 2) div 2"))
      .groupBy(g)
      .agg(((min(col("__mv")) + max(col("__mv"))) / 2).as(as))
  }

  /** Robust per-group outlier profile (median/MAD): value x is an outlier
    * when `|x − median| > k · 1.4826 · MAD` — the robust z-score gate that
    * survives the outliers it hunts, where a mean/stddev gate is dragged by
    * them. Returns `(group, n, med, mad, n_outliers)`.
    *
    * Two median passes (values, then absolute deviations), each a per-group
    * window sort; every derived number is a fixed IEEE op sequence over
    * identical inputs, so the flags — not just the summaries — replay
    * exactly cross-engine. MAD = 0 (over half the group identical) flags
    * every deviating row, the documented robust-z caveat.
    *
    * Scale note: exact medians sort each group — fine for many
    * medium-sized groups, adversarial for a handful of corpus-sized ones.
    * When groups are that hot, swap the median passes for the bounded
    * [[graft.llm.Sketches.bottomKQuantiles]] sketch and keep the same gate.
    */
  def robustOutliers(df: DataFrame, g: String, c: String,
                     k: Double = 3.0): DataFrame = {
    // NULL values carry no outlier information and would shift the median
    // positions (Spark sorts them first, DuckDB last) — dropped up front
    val base = df.filter(col(c).isNotNull)
      .select(col(g), col(c).cast("double").as("__v"))
    val med = groupMedian(base, g, col("__v"), "med")
    val withMed = base.join(med, g)
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = groupMedian(withMed, g, col("__dev"), "mad")
    withMed.join(mad, g)
      .groupBy(g)
      .agg(count(lit(1)).as("n"), min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
