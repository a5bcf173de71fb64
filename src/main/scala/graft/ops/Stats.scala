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
    val model = df.agg(aggs.head, aggs.tail: _*)
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
}
