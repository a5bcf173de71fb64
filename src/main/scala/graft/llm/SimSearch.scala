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

  /** Exact squared-L2 top-k — the METRIC-MATCHED ground truth for the
    * PQ/SQ8 quantized indexes ([[ProductQuant]], [[ScalarQuant]]), which
    * rank by squared L2, not cosine: recall measured against cosine truth
    * would conflate quantization loss with metric disagreement on
    * unnormalized vectors. Same fan-out shape as [[bruteForceTopK]]
    * (broadcast query batch, one corpus pass, bounded-heap top-k) and the
    * same determinism conventions as the indexes it grades (fixed-order
    * fold, round-6 before ranking, ties pinned on vec id).
    */
  def bruteForceTopKL2(queries: DataFrame, corpus: DataFrame, k: Int,
                       queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val q = queries.select(col(queryId).as("__qid"),
      col("embedding").cast("array<double>").as("__qv"))
    val scored = corpus
      .select(col(vecId), col("embedding").cast("array<double>").as("__cv"))
      .crossJoin(broadcast(q))
      .select(col("__qid"), col(vecId),
        round(ProductQuant.sqDist(col("__qv"), col("__cv")), 6).as("d"))
    l2RankTail(scored, k, queryId, vecId)
  }

  /** Bounded-heap top-k over (__qid, vecId, d): the shared exact-L2 ranking
    * tail — |Q|·k rows out, ties pinned on the vector id.
    */
  private def l2RankTail(scored: DataFrame, k: Int,
                         queryId: String, vecId: String): DataFrame =
    scored.groupBy(col("__qid"))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(negate(col("d")), col(vecId), k).as("top"))
      .select(col("__qid").as(queryId), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(queryId), col("entry.id").as(vecId),
        negate(col("entry.score")).as("dist"),
        (col("pos") + 1).cast("int").as("rank"))

  /** FAISS Refine stage (`IVF…,RFlat`): re-rank an approximate index's
    * candidate set with EXACT squared-L2 against the raw vectors and keep
    * the final top-k — quantization error is confined to WHICH k' candidates
    * surface, never to their final order. `candidates` is any (queryId,
    * vecId) relation from the quantized indexes ([[ProductQuant]],
    * [[ScalarQuant]]), typically searched at k' = 3–5× k.
    *
    * Scale: the corpus is scanned once and never shuffled — the bounded
    * |Q|·k' candidate set is broadcast into the corpus scan to prune the
    * raw-vector fetch, then the broadcast query batch supplies the query
    * vector; exact distances are computed for candidate rows only. Same
    * determinism conventions as the ground truth it approximates
    * (sequential fold, round-6, vec-id tie pins).
    */
  def refineTopK(queries: DataFrame, corpus: DataFrame, candidates: DataFrame,
                 k: Int, queryId: String = "query_id",
                 vecId: String = "vec_id"): DataFrame = {
    val q = queries.select(col(queryId).as("__qid"),
      col("embedding").cast("array<double>").as("__qv"))
    val cand = candidates.select(col(queryId).as("__qid"), col(vecId))
    val scored = corpus
      .select(col(vecId), col("embedding").cast("array<double>").as("__cv"))
      .join(broadcast(cand), Seq(vecId))
      .join(broadcast(q), Seq("__qid"))
      .select(col("__qid"), col(vecId),
        round(ProductQuant.sqDist(col("__qv"), col("__cv")), 6).as("d"))
    l2RankTail(scored, k, queryId, vecId)
  }

  /** Matryoshka (MRL, Kusupati et al. 2022) two-stage retrieval: candidate
    * generation on the embedding PREFIX — the nested-representation
    * property makes the first `prefixDims` of an MRL-trained embedding a
    * valid embedding of its own — then EXACT re-rank at full dimension via
    * [[refineTopK]], so truncation error is confined to which `kPrime`
    * candidates surface. At 100 TB the prefix stage reads a prefixDims/d
    * fraction of the vector bytes (store the prefix as its own parquet
    * column and the scan prunes to it) and feeds the [[ProductQuant]]
    * quantizer stack unchanged; the exact prefix scan here is the oracled
    * baseline of that family.
    */
  def matryoshkaTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     kPrime: Int, prefixDims: Int,
                     queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    require(kPrime >= k, s"kPrime=$kPrime must be >= k=$k")
    require(prefixDims >= 1, s"prefixDims=$prefixDims")
    def prefixed(df: DataFrame, idCol: String) = df.select(col(idCol),
      slice(col("embedding").cast("array<double>"), 1, prefixDims).as("embedding"))
    val cand = bruteForceTopKL2(prefixed(queries, queryId),
      prefixed(corpus, vecId), kPrime, queryId, vecId)
      .select(col(queryId), col(vecId))
    refineTopK(queries, corpus, cand, k, queryId, vecId)
  }

  /** Recall@k harness: each labeled ANN result set graded against the
    * exact [[bruteForceTopKL2]] ground truth — the number every ANN index
    * ships with, as one oracled relation instead of a README claim.
    * Output: (method, queryId, n_hits, recall) for EVERY (method, query)
    * cell — queries an index misses entirely surface as recall 0 rather
    * than a dropped row. recall = n_hits / k is one integer-by-constant
    * IEEE division, identical on both engines.
    *
    * Scale: `results` are the indexes' own (already bounded) top-k
    * relations — |methods|·|Q|·k rows; the only unbounded input is the one
    * ground-truth corpus pass, which is the price of measuring true recall
    * (run it on the same sampled query batch the indexes serve).
    */
  def annRecall(queries: DataFrame, corpus: DataFrame, k: Int,
                results: Seq[(String, DataFrame)],
                queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val truth = bruteForceTopKL2(queries, corpus, k, queryId, vecId)
      .select(col(queryId), col(vecId))
    val labeled = results.map { case (m, df) =>
      df.select(lit(m).as("method"), col(queryId), col(vecId))
    }.reduce(_ unionByName _)
    val hits = labeled.join(truth, Seq(queryId, vecId))
      .groupBy(col("method"), col(queryId))
      .agg(count(lit(1)).as("n_hits"))
    val methods = queries.sparkSession
      .createDataFrame(results.map(r => Tuple1(r._1))).toDF("method")
    methods.crossJoin(queries.select(col(queryId)))
      .join(hits, Seq("method", queryId), "left")
      .select(col("method"), col(queryId),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
  }

  /** Seed centroids: a deterministic corpus sample (every
    * `centroidStride`-th id) — bounded, broadcastable, replayable in SQL.
    */
  def seedCentroids(corpus: DataFrame, centroidStride: Int,
                    vecId: String = "vec_id"): DataFrame =
    corpus.filter(col(vecId) % centroidStride === 0)
      .select(col(vecId).as("cent_id"),
        col("embedding").cast("array<double>").as("cent_emb"))

  /** Nearest-centroid assignment — the IVF building block shared by index
    * build, query probe, and Lloyd training. `keep` = 1 assigns; `keep` > 1
    * is the query-side multi-cell probe. Centroids are broadcast (bounded by
    * construction); scores are rounded to 6 places and tie-broken on cent_id
    * so the DuckDB oracle replays the exact assignment.
    */
  private def assignTo(cents: DataFrame, df: DataFrame, id: String,
                       emb: String, keep: Int): DataFrame = {
    if (keep == 1) {
      // Map-only top-1 assignment (optimization r21, guide §2.4): the
      // centroid set collapses to ONE broadcast array row and each input
      // row folds over it inside the codegen'd NearestCosineEntry
      // expression — the same round-6 score and cent_id tie pin as the
      // old per-id window, with no |cents|-fold row blowup, no Exchange,
      // no sort. NaN scores are skipped inside the fold; a row where
      // EVERY centroid scores NaN (zero-norm vector) yields null and the
      // filter drops it — the old "unassignable rows get no cell"
      // convention.
      val centsArr = cents.groupBy()
        .agg(collect_list(struct(col("cent_id"), col("cent_emb"))).as("__cents"))
      df.crossJoin(broadcast(centsArr))
        .withColumn("__best", org.apache.spark.sql.graft.GraftColumns
          .nearestCosineEntry(col(emb), col("__cents")))
        .filter(col("__best").isNotNull)
        .withColumn("cent_id", col("__best").getField("cent_id"))
        .drop("__cents", "__best")
    } else {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("cscore", round(VectorFunctions.cosineSim(col(emb), col("cent_emb")), 6))
        // zero-norm vectors score NaN against EVERY centroid — without this
        // filter they land in a cell purely by NaN-ordering tie-break, an
        // engine-dependent accident. Same convention as every ranking path:
        // unrankable vectors are excluded (here: unassignable), so a zero-norm
        // row simply has no cell rather than an arbitrary one.
        .filter(!isnan(col("cscore")))
      val w = Window.partitionBy(col(id)).orderBy(col("cscore").desc, col("cent_id"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cent_emb", "cscore", "crank")
    }
  }

  /** The (vecId, cell) index assignment for a trained/seeded centroid set —
    * exposed separately so the assignment step is oracle-checkable on its
    * own (q86).
    */
  def assignCells(corpus: DataFrame, cents: DataFrame,
                  vecId: String = "vec_id"): DataFrame =
    assignTo(cents, corpus.select(col(vecId), col("embedding").as("c_emb")),
      vecId, "c_emb", 1)
      .select(col(vecId), col("cent_id").as("cell"))

  /** IVF (inverted-file) top-k over an explicit centroid set: the classic
    * two-level ANN index, expressed as pure DataFrame ops.
    *
    *   1. each corpus vector is assigned to its nearest centroid (broadcast
    *      crossJoin + top-1 window: |corpus| x |centroids| fused-cosine scores,
    *      corpus never shuffles until the single cell-partitioned exchange).
    *   2. each query probes its `nprobe` nearest cells; candidates are the
    *      equi-join on cell id — the scored set is |corpus|/nlist * nprobe
    *      per query instead of |corpus|.
    *
    * Recall < 1 by construction (the IVF trade); determinism is pinned by
    * rounding scores to 6 places and tie-breaking on ids, so the exact same
    * algorithm is replayable in the DuckDB oracle.
    */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                  cents: DataFrame, nprobe: Int = 2,
                  queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val corpusCells = assignTo(cents, corpus.select(col(vecId), col("embedding").as("c_emb")),
      vecId, "c_emb", 1).withColumnRenamed("cent_id", "cell")
    val queryCells = assignTo(cents, queries.select(col(queryId), col("embedding").as("q_emb")),
      queryId, "q_emb", nprobe).withColumnRenamed("cent_id", "cell")
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .withColumn("cosine", round(VectorFunctions.cosineSim(col("q_emb"), col("c_emb")), 6))
      .filter(!isnan(col("cosine"))) // zero-norm vectors are unrankable
    cosineRankTail(scored, k, queryId, vecId)
  }

  /** Bounded-heap per-query top-k over (queryId, vecId, cosine) — the
    * [[bruteForceTopKAgg]] tail shared by the IVF/bucketed search paths
    * (optimization r21): the window form shuffled every candidate row and
    * sorted whole query groups; the TopKByScore aggregate partial-aggregates
    * map-side (≤ k rows per query per mapper). Same (cosine desc, vecId asc)
    * order and tie pins — row-identical output.
    */
  private def cosineRankTail(scored: DataFrame, k: Int,
                             queryId: String, vecId: String): DataFrame =
    scored.groupBy(col(queryId))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(col("cosine"), col(vecId), k).as("top"))
      .select(col(queryId), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(queryId), col("entry.id").as(vecId),
        col("entry.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))

  /** Query-side nprobe cell probe against a frozen centroid set —
    * (queryId, cell, q_emb). The driver collects the DISTINCT cells for a
    * file-pruned disk read ([[graft.sources.ManifestTable.readAuto]] over
    * a cell-clustered index table), then [[ivfTopKStored]] joins this
    * probe against the pruned slice. Bounded by |queries| × nprobe.
    */
  def probeCells(queries: DataFrame, cents: DataFrame, nprobe: Int,
                 queryId: String = "query_id"): DataFrame =
    assignTo(cents, queries.select(col(queryId), col("embedding").as("q_emb")),
      queryId, "q_emb", nprobe)
      .select(col(queryId), col("cent_id").as("cell"), col("q_emb"))

  /** IVF top-k over a STORED, pre-assigned index relation
    * `(vecId, cell, embedding)` — the disk-resident IVF-flat search path:
    * the index is built once ([[assignCells]] + a manifest-table commit
    * clustered on `cell`), a query batch probes its cells
    * ([[probeCells]]), reads only those cells' files, and exact-scores
    * the slice. Same rounding and tie rules as [[ivfTopKWith]], which
    * computes the same assignment inline instead of reading it back.
    * Index maintenance under deletes: anti-join `stored` against
    * [[graft.sources.ManifestTable.deletedKeysSince]] before calling
    * (q194 — a pure row filter, so it composes identically with the PQ
    * index variants).
    */
  def ivfTopKStored(queries: DataFrame, stored: DataFrame, cents: DataFrame,
                    k: Int, nprobe: Int = 2,
                    queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val probes = probeCells(queries, cents, nprobe, queryId)
    val scored = stored.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine", round(VectorFunctions.cosineSim(col("q_emb"), col("embedding")), 6))
      .filter(!isnan(col("cosine")))
    cosineRankTail(scored, k, queryId, vecId)
  }

  /** IVF top-k on stride-seeded (untrained) centroids. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroidStride: Int = 64, nprobe: Int = 2,
              queryId: String = "query_id", vecId: String = "vec_id"): DataFrame =
    ivfTopKWith(queries, corpus, k, seedCentroids(corpus, centroidStride, vecId),
      nprobe, queryId, vecId)

  /** IVF top-k on k-means-trained centroids: `trainIters` Lloyd rounds from
    * the stride seed (fixed iteration count so the whole train+probe pipeline
    * is replayable in the DuckDB oracle — see q42), then the standard probe.
    */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame, k: Int,
                     centroidStride: Int = 64, trainIters: Int = 2, nprobe: Int = 2,
                     queryId: String = "query_id", vecId: String = "vec_id"): DataFrame =
    ivfTopKWith(queries, corpus, k,
      trainCentroids(corpus, centroidStride, trainIters, vecId),
      nprobe, queryId, vecId)

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
    * vector to its nearest centroid (same rounding/tie rules as the probe
    * path, so an oracle can replay it) and emit the per-cell mean vector.
    * The per-cell mean is a single hash aggregation over `posexplode`d
    * components — one shuffle keyed on (cell, dim), no vector ever collected
    * to the driver. The mean routes through decimal(18,6) (the Queries
    * scaladoc determinism rule applied to ITERATIVE state): a plain double
    * avg is summation-order-dependent, and a 1-ulp wobble in round 1's
    * centroids can flip a rounded-cosine assignment in round 2 — decimal
    * sums are exact, so both engines (and every shuffle order) produce
    * bit-identical centroids each round.
    */
  def kmeansIter(corpus: DataFrame, centroids: DataFrame,
                 vecId: String = "vec_id"): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("cent_emb"))
    val assigned = assignTo(cents,
      corpus.select(col(vecId), col("embedding").cast("array<double>").as("v")),
      vecId, "v", 1)
      .select(col("cent_id"), col("v"))
    assigned
      .select(col("cent_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cent_id", "dim")
      // portable round6, NOT round(): decimal-exact sums over 6-decimal
      // fixture data divided by small counts land exactly on 1e-6 half
      // boundaries, where engine round() conventions diverge (q124 lesson)
      .agg(Sampling.round6(sum(col("x").cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as("m"))
      .groupBy("cent_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cent_id"), transform(col("dm"), _.getField("m")).as("cent_emb"))
  }

  /** Fixed-iteration Lloyd training from the stride seed. A FIXED round
    * count (not an early stop) keeps the pipeline a pure function of the
    * data, so the DuckDB oracle replays training by unrolling the same
    * rounds (q42/q86). Cells that win no vectors drop out (both engines
    * agree). Each round is localCheckpoint-pinned — same lineage-growth
    * rationale as Dedup.connectedComponents.
    */
  def trainCentroids(corpus: DataFrame, centroidStride: Int, iters: Int,
                     vecId: String = "vec_id"): DataFrame = {
    var cents = seedCentroids(corpus, centroidStride, vecId).localCheckpoint()
    for (_ <- 1 to iters) {
      val next = kmeansIter(corpus, cents, vecId).localCheckpoint()
      // round N is materialized (localCheckpoint is eager) — free round N-1's
      // blocks so the loop holds ONE centroid set (VERDICT r06 #2)
      org.apache.spark.sql.graft.Checkpoints.release(cents)
      cents = next
    }
    cents
  }

  /** Lloyd training TO CONVERGENCE: iterate until no centroid component
    * moves more than `tol` (and no cell vanishes), failing loudly when the
    * budget is exhausted — partial centroids would silently degrade q42-path
    * recall. The convergence measure is computed on the centroid set itself
    * (|cells| rows, broadcast-scale), so the per-round driver check is
    * O(nlist), never O(corpus).
    */
  def trainCentroidsConverged(corpus: DataFrame, centroidStride: Int,
                              maxIter: Int = 20, tol: Double = 1e-4,
                              vecId: String = "vec_id"): DataFrame = {
    var cents = seedCentroids(corpus, centroidStride, vecId).localCheckpoint()
    var nCells = cents.count()
    var iter = 0
    var shift = Double.MaxValue
    while (shift > tol && iter < maxIter) {
      val next = kmeansIter(corpus, cents, vecId).localCheckpoint()
      // a vanished cell is PERMANENT under Lloyd (an absent centroid can
      // never win a vector back), so convergence is impossible from here —
      // fail now with the real cause instead of burning the remaining
      // rounds and reporting a meaningless sentinel shift
      val nNext = next.count()
      if (nNext != nCells)
        throw new IllegalStateException(
          s"k-means cell vanished in round ${iter + 1} ($nCells -> $nNext " +
            "centroids): an empty cell cannot recover under Lloyd, so " +
            "convergence is impossible — re-seed with a different " +
            "centroidStride (fewer, better-spread cells)")
      val joined = next.join(
        cents.select(col("cent_id"), col("cent_emb").as("old_emb")), Seq("cent_id"))
      val moved = joined.select(
        aggregate(zip_with(col("cent_emb"), col("old_emb"), (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x)).as("shift"))
        .agg(max(col("shift"))).head()
      shift = if (moved.isNullAt(0)) 0.0 else moved.getDouble(0)
      // the shift aggregate above was this round's last read of the old
      // centroids — release their blocks before rebinding (VERDICT r06 #2)
      org.apache.spark.sql.graft.Checkpoints.release(cents)
      cents = next
      nCells = nNext
      iter += 1
    }
    if (shift > tol)
      throw new IllegalStateException(
        s"k-means did not converge in $maxIter rounds (max centroid shift " +
          s"$shift > tol $tol): raise maxIter or loosen tol — returning " +
          "half-trained centroids would silently degrade IVF recall")
    cents
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
    cosineRankTail(scored, k, queryId, vecId)
  }
}
