package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at 100 TB.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most cases at runtime; these are the explicit forms for
  * the two places AQE can't help: (a) a shuffle aggregation whose hot key
  * overwhelms one reducer, and (b) a join against a small-but-not-broadcast
  * side where the planner picked sort-merge and one fact key dominates.
  */
object Skew {

  /** Salted equi-join: the dimension side is replicated `saltFactor` times,
    * the fact side is assigned a deterministic-per-row salt, and the join key
    * becomes (key, salt) — a hot fact key now lands on `saltFactor` reducers
    * instead of one. Costs `saltFactor`x the dim side's shuffle volume: use
    * for bounded dims that exceed the broadcast threshold.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit every unmatched dim row saltFactor times
    // (the dim side is replicated); only fact-preserving types are sound.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched dim rows " +
        "(dim side is salt-replicated); use inner/left/left_semi/left_anti")
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(struct(facts.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates (sum/count/min/
    * max): pre-aggregate on (key, salt), then combine per key. The hot key's
    * rows are reduced by `saltFactor` workers in phase one, and phase two
    * only sees `saltFactor` partial rows per key. Spark's hash aggregate
    * already does map-side partials; this helps when the REDUCE side itself
    * is the bottleneck (billions of rows under one key).
    *
    * `partials` maps each output column name to a (phase1, phase2)
    * aggregation pair, e.g. `"n" -> (count(lit(1)), sum(col("n")))`.
    */
  def twoPhaseAgg(df: DataFrame, key: String, saltFactor: Int,
                  partials: Map[String, (Column, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p1, _)) => p1.as(n) }.toSeq: _*)
    phase1.groupBy(col(key))
      .agg(partials.head._2._2.as(partials.head._1),
        partials.tail.map { case (n, (_, p2)) => p2.as(n) }.toSeq: _*)
  }
}
