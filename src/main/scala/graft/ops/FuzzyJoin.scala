package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J4/A1: fuzzy best-match top-1 join (reference:
  * src/ingest_places_data.py:49-67 — for each place name, score every
  * candidate with fuzz.ratio on lowercase strings and keep the argmax).
  *
  * Scale design: the generic form is a theta-join (no equi key), so the left
  * side fans out over every candidate. That is only sane when ONE side is
  * bounded — the reference's candidate set is a country-filtered dimension.
  * `top1` therefore broadcasts the smaller `right` side explicitly; for
  * unbounded rights use `top1Blocked`, which equi-joins on a cheap blocking
  * key first (first token, length band, ...) so the fan-out is per-block, not
  * global — the standard blocking trick from entity-resolution literature.
  */
object FuzzyJoin {

  /** Shared post-join leg: score, pin the winner per left key, surface the
    * score as a `score` column (inputs must not already carry one).
    */
  private def keepBest(joined: DataFrame, leftKey: String,
                       score: Column, tieCols: Seq[Column]): DataFrame = {
    require(!joined.columns.contains("score"),
      "fuzzy join inputs must not already have a 'score' column")
    val scored = joined.withColumn("__score", score)
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col("__score").desc +: tieCols: _*)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed("__score", "score")
  }

  /** Best right-row per left key by `score` (desc), ties broken by `tieCols`
    * so the winner is deterministic (SURVEY.md §2.10.4: the reference's
    * first-wins/short-circuit order is scan-dependent; we pin it).
    */
  def top1(left: DataFrame, right: DataFrame, leftKey: String,
           score: Column, tieCols: Seq[Column]): DataFrame =
    keepBest(left.crossJoin(broadcast(right)), leftKey, score, tieCols)

  /** Blocked variant: candidates restricted to equal `blockKey` values —
    * turns the crossJoin into an equi-join shuffle, the shape that survives
    * an unbounded candidate side at 100 TB. Rows whose block has no candidate
    * are dropped (inner semantics), mirroring the reference's "no match →
    * failed_places" leg.
    */
  def top1Blocked(left: DataFrame, right: DataFrame, leftKey: String,
                  blockKey: String, score: Column, tieCols: Seq[Column]): DataFrame =
    keepBest(left.join(right, Seq(blockKey)), leftKey, score, tieCols)
}
