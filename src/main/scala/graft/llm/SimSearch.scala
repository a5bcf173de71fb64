package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an embedding column (SURVEY.md §7:
  * llm/SimSearch): brute-force cosine top-k as the exact baseline, a
  * sign-bucketed (LSH) variant as the 100 TB path.
  *
  * Scale design: brute force is |Q| x |C| — correct and fine when |Q| is a
  * broadcastable query batch (the common "embed a prompt batch, search the
  * corpus" shape: one pass over the corpus, queries replicated to every
  * executor, NO corpus shuffle). The bucketed variant turns the fan-out into
  * an equi-join on the LSH bucket: each corpus row is compared only against
  * queries landing in its bucket — sublinear candidate sets at the cost of
  * recall, the standard IVF/LSH trade.
  */
object SimSearch {

  /** Exact top-k: every query vs every corpus row, fused-cosine scored,
    * row_number-pruned. `queries` is broadcast — the corpus never shuffles;
    * the only exchange is the final per-query top-k, which AQE collapses at
    * |Q|·k rows.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val q = queries.select(col(queryId), col("embedding").as("q_emb"))
    val c = corpus.select(col(vecId), col("embedding").as("c_emb"))
    // zero-norm vectors score NaN, which Spark sorts ABOVE every real
    // cosine in a desc ordering — drop them: they are unrankable, not best
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine",
        round(VectorFunctions.cosineSim(col("q_emb"), col("c_emb")), 6))
      .filter(!isnan(col("cosine")))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(vecId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(queryId, vecId, "cosine", "rank")
  }

  /** IVF (inverted-file) top-k: the classic two-level ANN index, expressed as
    * pure DataFrame ops.
    *
    *   1. centroid set = a deterministic corpus sample (every `centroidStride`-th
    *      id) — bounded, broadcast. A production build would k-means these;
    *      the partition/probe mechanics are identical.
    *   2. each corpus vector is assigned to its nearest centroid (broadcast
    *      crossJoin + top-1 window: |corpus| x |centroids| fused-cosine scores,
    *      corpus never shuffles until the single cell-partitioned exchange).
    *   3. each query probes its `nprobe` nearest cells; candidates are the
    *      equi-join on cell id — the scored set is |corpus|/nlist * nprobe
    *      per query instead of |corpus|.
    *
    * Recall < 1 by construction (the IVF trade); determinism is pinned by
    * rounding scores to 6 places and tie-breaking on ids, so the exact same
    * algorithm is replayable in the DuckDB oracle.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroidStride: Int = 64, nprobe: Int = 2,
              queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val cents = corpus.filter(col(vecId) % centroidStride === 0)
      .select(col(vecId).as("cent_id"), col("embedding").as("cent_emb"))
    def assign(df: DataFrame, id: String, emb: String, keep: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("cscore", round(VectorFunctions.cosineSim(col(emb), col("cent_emb")), 6))
      val w = Window.partitionBy(col(id)).orderBy(col("cscore").desc, col("cent_id"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cent_emb", "cscore", "crank")
    }
    val corpusCells = assign(corpus.select(col(vecId), col("embedding").as("c_emb")),
      vecId, "c_emb", 1).withColumnRenamed("cent_id", "cell")
    val queryCells = assign(queries.select(col(queryId), col("embedding").as("q_emb")),
      queryId, "q_emb", nprobe).withColumnRenamed("cent_id", "cell")
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .withColumn("cosine", round(VectorFunctions.cosineSim(col("q_emb"), col("c_emb")), 6))
      .filter(!isnan(col("cosine"))) // zero-norm vectors are unrankable
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(vecId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(queryId, vecId, "cosine", "rank")
  }

  /** Exact top-k via the custom bounded-heap aggregate
    * (org.apache.spark.sql.graft.TopKByScore) instead of a window: the
    * window form shuffles EVERY scored row and sorts whole groups; the
    * aggregate partial-aggregates map-side, so each mapper ships at most k
    * rows per query — |queries|*k shuffle volume instead of |corpus|.
    * Identical results to [[bruteForceTopK]] (same rounding and tie rules).
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int,
                        queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val q = queries.select(col(queryId), col("embedding").as("q_emb"))
    val c = corpus.select(col(vecId), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", round(VectorFunctions.cosineSim(col("q_emb"), col("c_emb")), 6))
      .filter(!isnan(col("cosine"))) // zero-norm vectors are unrankable
    scored.groupBy(col(queryId))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(col("cosine"), col(vecId), k).as("top"))
      .select(col(queryId), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(queryId), col("entry.id").as(vecId),
        col("entry.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** One Lloyd iteration for IVF centroid training: assign every corpus
    * vector to its nearest centroid (same mechanics as [[ivfTopK]]'s
    * assignment) and emit the per-cell mean vector. Run a handful of
    * iterations offline to turn the deterministic-sample centroids into
    * proper k-means cells; the per-cell mean is a single hash aggregation
    * over `posexplode`d components — one shuffle keyed on (cell, dim),
    * no vector ever collected to the driver.
    */
  def kmeansIter(corpus: DataFrame, centroids: DataFrame,
                 vecId: String = "vec_id"): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("cent_emb"))
    val scored = corpus.select(col(vecId), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(cents))
      .withColumn("cscore", VectorFunctions.cosineSim(col("v"), col("cent_emb")))
    val w = Window.partitionBy(col(vecId)).orderBy(col("cscore").desc, col("cent_id"))
    val assigned = scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("cent_id"), col("v"))
    assigned
      .select(col("cent_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cent_id", "dim").agg(avg(col("x")).as("m"))
      .groupBy("cent_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cent_id"), transform(col("dm"), _.getField("m")).as("cent_emb"))
  }

  /** LSH-bucketed top-k: queries and corpus equi-join on the sign bucket of
    * the leading dimensions. Recall < 1 by construction (a production sweep
    * probes neighboring buckets / multiple hash tables); the payoff is that
    * the per-bucket candidate set — not the whole corpus — is scored.
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   signBits: Int = 8,
                   queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val q = queries.select(col(queryId), col("embedding").as("q_emb"))
      .withColumn("bucket", Dedup.signBucket(col("q_emb").cast("array<double>"), signBits))
    val c = corpus.select(col(vecId), col("embedding").as("c_emb"))
      .withColumn("bucket", Dedup.signBucket(col("c_emb").cast("array<double>"), signBits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cosine",
        round(VectorFunctions.cosineSim(col("q_emb"), col("c_emb")), 6))
      .filter(!isnan(col("cosine"))) // zero-norm vectors are unrankable
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(vecId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(queryId, vecId, "cosine", "rank")
  }
}
