package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the memory-side scale path the
  * IVF/LSH family (SimSearch, Dedup.embeddingLsh) doesn't cover: IVF
  * prunes WHICH vectors are scored; PQ shrinks WHAT is scored. Each
  * vector is cut into `m` subvectors, each subvector is assigned to its
  * nearest centroid in a per-subspace codebook (k-means-trained), and the
  * vector is stored as `m` small codes — 64 floats become 8 codes, a
  * 32× compression that is the difference between "the corpus fits in
  * executor memory" and "it doesn't" at 100 TB. Queries never touch raw
  * corpus vectors again: a per-query distance TABLE (query subvector vs
  * every codebook centroid — |m|·|ks| entries, tiny) is broadcast, and the
  * approximate (asymmetric, ADC) distance of a corpus vector is the sum of
  * m table lookups on its codes. Jégou/Douze/Schmid, "Product quantization
  * for nearest neighbor search" (TPAMI 2011) is the published method.
  *
  * 100 TB shape: training and encoding are the Lloyd pattern of
  * [[SimSearch.trainCentroids]] applied per (sub, cell) — broadcast
  * codebook, per-(id, sub) bounded windows, decimal-routed means; the
  * search is one broadcast equi-join of the code relation against the
  * distance table plus a map-side-combined per-(query, vec) sum. No
  * all-pairs scoring, no raw-vector shuffle anywhere past encode.
  *
  * Determinism (the standing oracle rules): subspace distances are squared
  * L2 (additively decomposable, unlike cosine) computed by a fixed-order
  * left fold, rounded to 6 before ranking; assignment ties pin on cent id;
  * ADC sums route through decimal(18,6) so accumulation order can't wobble
  * the ranking doubles; centroid means are the q42 decimal-mean.
  */
object ProductQuant {

  /** Sequential-fold squared L2 — `(((0 + d1²) + d2²) + …)`, the exact
    * order DuckDB's `list_reduce` replays (0 + d1² == d1², so the engines'
    * differing fold seeds agree bit-for-bit).
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** (id, sub, sv): the corpus exploded to `m` `dims`-wide subvectors.
    * Precondition: embedding length == m * dims.
    */
  private def subvectors(df: DataFrame, id: String, m: Int, dims: Int): DataFrame = {
    val v = col("embedding").cast("array<double>")
    df.select(col(id), posexplode(transform(sequence(lit(0), lit(m - 1)),
      s => slice(v, s * dims + 1, lit(dims)))).as(Seq("sub", "sv")))
  }

  /** Nearest-codebook-entry assignment per (row, subspace). `keep` > 1 is
    * the IVF-style multi-cell query probe (query-batch-sized input only).
    *
    * `keep == 1` — the corpus-sized path (encode + every Lloyd round) — is
    * MAP-ONLY (optimization r21, guide §2.4 "remove shuffles outright"):
    * the codebook collapses to one array row per sub (≤ks entries, a
    * bounded model), broadcast, and each (id, sub) row folds over it
    * inside the codegen'd NearestSqEntry expression — the same round-6
    * distance and cid-ascending tie pin the old per-(id, sub) window
    * applied, with no ks-fold row blowup, no Exchange and no sort. The
    * window form kept `keep·N` rows per group AFTER shuffling every scored
    * row to its group's reducer (WindowGroupLimit pruned the volume but
    * still paid two sorts + one exchange); this evaluates the identical
    * fold per row inside the scan projection, so encode is zero-shuffle at
    * any scale.
    *
    * `keep > 1` keeps the broadcast-join + bounded-window shape: its only
    * caller is the per-QUERY probe (|Q|·ks rows), where the window costs
    * nothing and the multi-row output shape is exactly what a window gives.
    */
  private def assign(sv: DataFrame, codebook: DataFrame, id: String,
                     keep: Int = 1): DataFrame = {
    if (keep == 1) {
      val cbArr = codebook.groupBy("sub")
        .agg(collect_list(struct(col("cid"), col("cv"))).as("__cents"))
      sv.join(broadcast(cbArr), Seq("sub"))
        .withColumn("__best", org.apache.spark.sql.graft.GraftColumns
          .nearestSqEntry(col("sv"), col("__cents")))
        .select(col("sub"), col(id), col("sv"),
          col("__best").getField("cid").as("cid"),
          col("__best").getField("d").as("d"))
    } else {
      val scored = sv.join(broadcast(codebook), Seq("sub"))
        .withColumn("d", round(sqDist(col("sv"), col("cv")), 6))
      val w = Window.partitionBy(col(id), col("sub"))
        .orderBy(col("d").asc, col("cid"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= keep)
        .drop("cv", "rn")
    }
  }

  /** Per-subspace codebooks after `iters` Lloyd rounds from the stride
    * seed (sub, cid, cv). Fixed round count + stride seed = replayable in
    * SQL (the q42 convention); per-round localCheckpoint + release keeps
    * ONE codebook's lineage alive.
    *
    * The seed is CAPPED at `ks` entries per subspace (`vecId < stride·ks`),
    * unlike the q42 IVF stride seed whose cell count grows with the
    * corpus: a PQ codebook is a fixed-size model (Jégou et al. use 256),
    * so training stays O(N·m·ks) — linear in the corpus — at any scale,
    * and the code domain stays small enough to be a table lookup.
    *
    * `trainFrac < 1` bounds the Lloyd rounds to a deterministic
    * md5-threshold sample (the [[Sampling.hash01]] machinery; FAISS trains
    * its quantizers on a bounded sample for the same reason — fitting a
    * fixed ks-entry model does not need the corpus, and at 100 TB `iters`
    * full passes are pure wasted I/O). The sample is materialized ONCE
    * (localCheckpoint), so every round scans the sample instead of
    * re-reading the source — training cost becomes corpus-size-independent;
    * only the single encode pass stays O(N). Callers derive the fraction as
    * `min(1, targetVectors / count)` from ONE cheap count of the raw corpus
    * ([[trainFracFor]]) — the identical double division the oracle replays.
    * At `trainFrac >= 1` the sampling plumbing is SKIPPED entirely (no
    * extra materialization pass, no extra jobs): fixture-scale plans are
    * bit-identical to the unsampled form, which is also what keeps the
    * sample filter a no-op in the SQL replay. The seed always comes from
    * the full corpus.
    *
    * `trainRel`, when given, is an ALREADY-MATERIALIZED sampled corpus (the
    * exact `hash01(vecId) < trainFrac` row set, caller-owned — see
    * [[sampleFor]]): two-quantizer pipelines (IVF coarse + PQ fine) pass
    * the SAME materialization to both trainings instead of each filtering
    * and checkpointing its own copy of the corpus (VERDICT r11 #3 — at
    * 100 TB that halves training I/O; sampling inside here would scan the
    * source once per quantizer). The row set — hence the oracle replay —
    * is identical whether the filter runs before or after the subvector
    * explode (both key on vecId alone).
    */
  def trainCodebooks(corpus: DataFrame, m: Int, dims: Int,
                     centroidStride: Int, iters: Int, ks: Int = 16,
                     vecId: String = "vec_id", trainFrac: Double = 1.0,
                     trainRel: Option[DataFrame] = None): DataFrame = {
    val sv = subvectors(corpus, vecId, m, dims)
    var cb = sv.filter(col(vecId) % centroidStride === 0
        && col(vecId) < centroidStride.toLong * ks)
      .select(col("sub"), col(vecId).as("cid"), col("sv").as("cv"))
      .localCheckpoint()
    val ownSample = trainFrac < 1.0 && trainRel.isEmpty
    val tsv = trainRel match {
      case Some(r) => subvectors(r, vecId, m, dims)
      case None if trainFrac < 1.0 =>
        sv.filter(Sampling.hash01(col(vecId)) < lit(trainFrac)).localCheckpoint()
      case None => sv
    }
    for (_ <- 1 to iters) {
      val next = assign(tsv, cb, vecId)
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("sub", "cid", "dim")
        // portable round6, NOT round(): decimal-exact sums over 6-decimal
        // fixture data divided by small counts land exactly on 1e-6 half
        // boundaries routinely, where engine round() conventions diverge
        .agg(Sampling.round6(sum(col("x").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("mn"))
        .groupBy("sub", "cid")
        .agg(array_sort(collect_list(struct(col("dim"), col("mn")))).as("dm"))
        .select(col("sub"), col("cid"), transform(col("dm"), _.getField("mn")).as("cv"))
        .localCheckpoint()
      org.apache.spark.sql.graft.Checkpoints.release(cb)
      cb = next
    }
    if (ownSample) org.apache.spark.sql.graft.Checkpoints.release(tsv)
    cb
  }

  /** The shared sampled-training materialization for multi-quantizer
    * pipelines: `Some(hash01(vecId) < frac rows, localCheckpointed)` when
    * sampling is on, `None` (and no extra jobs — the fixture plan-identity
    * guarantee) at `frac >= 1`. Caller releases via [[releaseSample]].
    */
  def sampleFor(corpus: DataFrame, frac: Double,
                vecId: String = "vec_id"): Option[DataFrame] =
    if (frac >= 1.0) None
    else Some(corpus.filter(Sampling.hash01(col(vecId)) < lit(frac)).localCheckpoint())

  def releaseSample(rel: Option[DataFrame]): Unit =
    rel.foreach(org.apache.spark.sql.graft.Checkpoints.release)

  /** One cheap count of the raw corpus → the training-sample fraction
    * `min(1, targetVectors / n)` shared by every quantizer in a pipeline
    * (the q122 residual PQ samples on the SAME raw-corpus count — inner
    * joins preserve every vecId — which is exactly what the oracle's
    * `count(*) FROM corp` replays). `target <= 0` disables sampling.
    */
  def trainFracFor(corpus: DataFrame, target: Int): Double =
    if (target <= 0) 1.0
    else math.min(1.0, target.toDouble / corpus.count())

  /** The code relation (vecId, sub, code) — the 100 TB-resident form of
    * the corpus: m small ints per vector instead of m·dims floats.
    */
  def encode(corpus: DataFrame, codebook: DataFrame, m: Int, dims: Int,
             vecId: String = "vec_id"): DataFrame =
    assign(subvectors(corpus, vecId, m, dims), codebook, vecId)
      .select(col(vecId), col("sub"), col("cid").as("code"))

  /** Shared ranking tail: per-(query, vec) ADC sum routed through
    * decimal(18,6) (accumulation order can't wobble the ranking doubles) +
    * bounded-heap top-k (each mapper ships at most k rows per query —
    * the TopKByScore scale rationale; score negated because ADC ranks
    * ascending) + the rank projection. `scored` carries (__qid, vecId, d).
    */
  private def adcRank(scored: DataFrame, k: Int,
                      queryId: String, vecId: String): DataFrame = {
    val adc = scored.groupBy(col("__qid"), col(vecId))
      .agg(sum(col("d").cast("decimal(18,6)")).cast("double").as("adc"))
    adc.groupBy(col("__qid"))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(negate(col("adc")), col(vecId), k).as("top"))
      .select(col("__qid").as(queryId), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(queryId), col("entry.id").as(vecId),
        negate(col("entry.score")).as("adc"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** ADC top-k: per-query distance tables over the codebook (broadcast),
    * joined against the code relation and ranked by [[adcRank]].
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
              k: Int, m: Int, dims: Int,
              queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val qsv = subvectors(queries.withColumnRenamed(queryId, "__qid"), "__qid", m, dims)
    val dt = qsv.join(codebook, Seq("sub"))
      .select(col("__qid"), col("sub"), col("cid").as("code"),
        round(sqDist(col("sv"), col("cv")), 6).as("d"))
    adcRank(codes.join(broadcast(dt), Seq("sub", "code")), k, queryId, vecId)
  }

  /** IVF + PQ composition — the FAISS "IVFPQ" index shape (Jégou et al.
    * §V; the `by_residual=false` variant FAISS also ships: PQ codes are
    * trained on the RAW vectors, not per-cell residuals, which keeps the
    * distance tables cell-independent — one table per query instead of one
    * per (query, probed cell) — at a small accuracy cost): a coarse
    * quantizer (k-means over WHOLE vectors — [[trainCodebooks]] with m=1)
    * prunes WHICH vectors are scored (each query probes its `nprobe`
    * nearest cells), and the PQ codes shrink WHAT is scored. This is the
    * billion-scale ANN layout: the resident index is (cell, m codes) per
    * vector; a query touches |corpus|·nprobe/|cells| candidates' codes and
    * zero raw vectors.
    *
    * The (vec → cell) relation joins the code relation once at build time —
    * a co-partitioned equi-join on the id, the index-build shuffle that
    * amortizes over every query batch.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                m: Int = 8, dims: Int = 8, centroidStride: Int = 32,
                trainIters: Int = 2, ks: Int = 16, coarseKs: Int = 8,
                nprobe: Int = 2,
                queryId: String = "query_id", vecId: String = "vec_id",
                trainSample: Int = 0): DataFrame = {
    val d = m * dims
    val frac = trainFracFor(corpus, trainSample)
    // ONE sampled materialization feeds both quantizer trainings (coarse
    // whole-vector + fine subvector) — not one checkpoint pass each
    val sample = sampleFor(corpus, frac, vecId)
    val coarse = trainCodebooks(corpus, 1, d, centroidStride, trainIters, coarseKs, vecId,
      frac, sample)
    val cells = encode(corpus, coarse, 1, d, vecId)
      .select(col(vecId), col("code").as("cell"))
    val cb = trainCodebooks(corpus, m, dims, centroidStride, trainIters, ks, vecId,
      frac, sample)
    releaseSample(sample) // codebooks are materialized; the sample is done
    val codes = encode(corpus, cb, m, dims, vecId).join(cells, Seq(vecId))
    ivfPqSearch(queries, codes, coarse, cb, k, m, dims, nprobe, queryId, vecId)
  }

  /** Per-query nprobe-nearest coarse cells: (id, cell). The probe leg every
    * IVF-composed index shares (PQ, residual-PQ, [[ScalarQuant]] SQ8) —
    * whole-vector assignment against the broadcast coarse book, top-nprobe
    * per query.
    */
  def coarseProbes(queries: DataFrame, coarse: DataFrame, d: Int, nprobe: Int,
                   id: String): DataFrame =
    assign(subvectors(queries, id, 1, d), coarse, id, nprobe)
      .select(col(id), col("cid").as("cell"))

  /** Query leg over a PREBUILT IVFPQ index — `codes` is the
    * (vecId, sub, code, cell) relation, `coarse`/`codebook` the frozen
    * quantizers. Split out of [[ivfPqTopK]] so an incrementally-maintained
    * index ([[encodeBatch]]) is searched by exactly the code path the
    * batch-built index uses.
    */
  def ivfPqSearch(queries: DataFrame, codes: DataFrame, coarse: DataFrame,
                  codebook: DataFrame, k: Int, m: Int, dims: Int, nprobe: Int,
                  queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val d = m * dims
    val q = queries.withColumnRenamed(queryId, "__qid")
    val probes = coarseProbes(q, coarse, d, nprobe, "__qid")
    val dt = subvectors(q, "__qid", m, dims).join(codebook, Seq("sub"))
      .select(col("__qid"), col("sub"), col("cid").as("code"),
        round(sqDist(col("sv"), col("cv")), 6).as("d"))
    val candidates = codes.join(broadcast(probes), Seq("cell"))
    adcRank(candidates.join(broadcast(dt), Seq("__qid", "sub", "code")),
      k, queryId, vecId)
  }

  /** Incremental index maintenance — the CDC leg the batch pipelines lack:
    * encode a NEW micro-batch of vectors against FROZEN quantizers and
    * return the (vecId, sub, code, cell) rows to append to the resident
    * index. The mirror of [[graft.llm.Dedup.exactIncremental]] (q92) for
    * ANN: the model (coarse + PQ codebooks, both fixed-size broadcasts)
    * does not move per batch — only the code relation grows — so a
    * streaming `foreachBatch` appends `|batch|·(m+1)` slim rows and never
    * touches the existing index or a raw corpus vector. Periodic retrain is
    * a separate offline decision (FAISS posture), at which point the index
    * rebuilds wholesale.
    */
  def encodeBatch(batch: DataFrame, coarse: DataFrame, codebook: DataFrame,
                  m: Int, dims: Int, vecId: String = "vec_id"): DataFrame = {
    val cells = encode(batch, coarse, 1, m * dims, vecId)
      .select(col(vecId), col("code").as("cell"))
    encode(batch, codebook, m, dims, vecId).join(cells, Seq(vecId))
  }

  /** [[encodeBatch]] for the RESIDUAL-encoded index (the FAISS-default
    * [[ivfPqResidualTopK]] layout): the batch's cells come off the frozen
    * coarse quantizer, the PQ codes off the residual (vector − its coarse
    * centroid) against the frozen residual-trained codebook. Same append
    * contract — (vecId, sub, code, cell), row-identical to a wholesale
    * re-encode under the same model; the residual subtraction is one
    * broadcast join against the ≤coarseKs-row centroid relation.
    */
  def encodeBatchResidual(batch: DataFrame, coarse: DataFrame, codebook: DataFrame,
                          m: Int, dims: Int, vecId: String = "vec_id"): DataFrame = {
    val d = m * dims
    val cells = encode(batch, coarse, 1, d, vecId)
      .select(col(vecId), col("code").as("cell"))
    val cvRel = coarse.select(col("cid").as("cell"), col("cv").as("cellv"))
    val resid = batch.select(col(vecId), col("embedding").cast("array<double>").as("v"))
      .join(cells, Seq(vecId)).join(broadcast(cvRel), Seq("cell"))
      .select(col(vecId), zip_with(col("v"), col("cellv"), (a, b) => a - b).as("embedding"))
    encode(resid, codebook, m, dims, vecId).join(cells, Seq(vecId))
  }

  /** Train on `base`, append `batch` via [[encodeBatch]], search the union —
    * the full incremental round-trip, equal by construction to encoding
    * base ∪ batch against the same frozen codebooks.
    */
  def ivfPqIncrementalTopK(queries: DataFrame, base: DataFrame, batch: DataFrame,
                           k: Int, m: Int = 8, dims: Int = 8,
                           centroidStride: Int = 32, trainIters: Int = 2,
                           ks: Int = 16, coarseKs: Int = 8, nprobe: Int = 2,
                           queryId: String = "query_id", vecId: String = "vec_id",
                           trainSample: Int = 0): DataFrame = {
    val d = m * dims
    val frac = trainFracFor(base, trainSample)
    val sample = sampleFor(base, frac, vecId)
    val coarse = trainCodebooks(base, 1, d, centroidStride, trainIters, coarseKs, vecId,
      frac, sample)
    val cb = trainCodebooks(base, m, dims, centroidStride, trainIters, ks, vecId,
      frac, sample)
    releaseSample(sample)
    val baseCodes = encodeBatch(base, coarse, cb, m, dims, vecId)
    val index = baseCodes.unionByName(encodeBatch(batch, coarse, cb, m, dims, vecId))
    ivfPqSearch(queries, index, coarse, cb, k, m, dims, nprobe, queryId, vecId)
  }

  /** Residual-encoded IVF+PQ — FAISS's DEFAULT IVFPQ (`by_residual=true`,
    * Jégou et al. §V.A): PQ codebooks are trained on RESIDUALS
    * (vector minus its coarse centroid) instead of raw vectors. Residuals
    * concentrate near zero, so the same ks codebook entries quantize much
    * finer — the accuracy the two-level index is built for. The cost vs
    * [[ivfPqTopK]]: distance tables become PER-(query, probed cell) — the
    * query's residual differs per cell — multiplying table size by nprobe
    * (still query-batch-sized, broadcast). Corpus-side the residual
    * subtraction is one broadcast join against the coarse centroids at
    * encode time; nothing else changes shape.
    */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                        m: Int = 8, dims: Int = 8, centroidStride: Int = 32,
                        trainIters: Int = 2, ks: Int = 16, coarseKs: Int = 8,
                        nprobe: Int = 2,
                        queryId: String = "query_id", vecId: String = "vec_id",
                        trainSample: Int = 0): DataFrame = {
    val d = m * dims
    val frac = trainFracFor(corpus, trainSample)
    // one sampled corpus materialization; the residual training relation
    // derives from it (residual-of-sample == sample-of-residual: the cell
    // assignment and subtraction are per-row under the frozen coarse model,
    // and both sample filters key on vecId alone)
    val sample = sampleFor(corpus, frac, vecId)
    val coarse = trainCodebooks(corpus, 1, d, centroidStride, trainIters, coarseKs, vecId,
      frac, sample)
    val out = ivfPqResidualTopKWith(queries, corpus, coarse, k, m, dims,
      centroidStride, trainIters, ks, nprobe, queryId, vecId, frac, sample)
    releaseSample(sample)
    out
  }

  /** [[ivfPqResidualTopK]] over a PREBUILT coarse quantizer — the
    * shared-model-store seam: one coarse book can serve the raw-PQ, SQ8 and
    * residual indexes of the same corpus (the q131 scoreboard shape), so a
    * multi-index pipeline trains it once. `trainFrac`/`trainRel` follow the
    * [[trainCodebooks]] contract; `trainRel` (caller-owned, NOT released
    * here) is the raw sampled corpus — the residual training relation
    * derives from it.
    */
  def ivfPqResidualTopKWith(queries: DataFrame, corpus: DataFrame,
                            coarse: DataFrame, k: Int,
                            m: Int = 8, dims: Int = 8, centroidStride: Int = 32,
                            trainIters: Int = 2, ks: Int = 16, nprobe: Int = 2,
                            queryId: String = "query_id", vecId: String = "vec_id",
                            trainFrac: Double = 1.0,
                            trainRel: Option[DataFrame] = None): DataFrame = {
    val d = m * dims
    val frac = trainFrac
    val sample = trainRel
    // cell assignments feed the residual relation AND the final code join —
    // materialize ONCE (2 longs per row, tiny at any scale) instead of
    // re-running the coarse encode window per consumer (VERDICT r12 #3:
    // the fixture-scale lineage re-evaluation was q122's whole overhead)
    val cells = encode(corpus, coarse, 1, d, vecId)
      .select(col(vecId), col("code").as("cell")).localCheckpoint()
    val cvRel = coarse.select(col("cid").as("cell"), col("cv").as("cellv"))

    def residOf(src: DataFrame, cellRel: DataFrame): DataFrame =
      src.select(col(vecId), col("embedding").cast("array<double>").as("v"))
        .join(cellRel, Seq(vecId)).join(broadcast(cvRel), Seq("cell"))
        .select(col(vecId), col("cell"),
          zip_with(col("v"), col("cellv"), (a, b) => a - b).as("embedding"))
    // UNSAMPLED training (small corpora / fixtures) scans the residuals
    // once per Lloyd round — materialize them; the sampled scale path
    // trains off residSample and scans resid exactly once (encode), so a
    // corpus-wide residual copy would be pure waste there
    val resid =
      if (sample.isEmpty && frac >= 1.0) residOf(corpus, cells).localCheckpoint()
      else residOf(corpus, cells)
    // the sample's residuals re-materialize (they are what the Lloyd rounds
    // scan), but off the checkpointed sample — never a second corpus pass
    val residSample = sample.map { tr =>
      residOf(tr, encode(tr, coarse, 1, d, vecId)
        .select(col(vecId), col("code").as("cell"))).localCheckpoint()
    }
    val cb = trainCodebooks(resid, m, dims, centroidStride, trainIters, ks, vecId,
      frac, residSample)
    releaseSample(residSample) // derived here; the raw trainRel stays caller-owned
    val codes = encode(resid, cb, m, dims, vecId).join(cells, Seq(vecId))

    val q = queries.withColumnRenamed(queryId, "__qid")
    val probes = coarseProbes(q, coarse, d, nprobe, "__qid")
    val qv = q.select(col("__qid"), col("embedding").cast("array<double>").as("v"))
    val qresid = qv.join(probes, Seq("__qid")).join(broadcast(cvRel), Seq("cell"))
      .select(col("__qid"), col("cell"),
        zip_with(col("v"), col("cellv"), (a, b) => a - b).as("rv"))
    val qsv = qresid.select(col("__qid"), col("cell"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("rv"), s * dims + 1, lit(dims)))).as(Seq("sub", "sv")))
    val dt = qsv.join(broadcast(cb), Seq("sub"))
      .select(col("__qid"), col("cell"), col("sub"), col("cid").as("code"),
        round(sqDist(col("sv"), col("cv")), 6).as("d"))

    adcRank(codes.join(broadcast(dt), Seq("cell", "sub", "code")),
      k, queryId, vecId)
  }

  /** Train → encode → search, the full PQ pipeline for one query batch. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, dims: Int = 8, centroidStride: Int = 32,
             trainIters: Int = 2, ks: Int = 16,
             queryId: String = "query_id", vecId: String = "vec_id",
             trainSample: Int = 0): DataFrame = {
    val cb = trainCodebooks(corpus, m, dims, centroidStride, trainIters, ks, vecId,
      trainFracFor(corpus, trainSample))
    val codes = encode(corpus, cb, m, dims, vecId)
    adcTopK(queries, codes, cb, k, m, dims, queryId, vecId)
  }
}
