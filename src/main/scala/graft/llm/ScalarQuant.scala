package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (FAISS SQ8) — the OTHER standard vector-compression
  * path next to PQ ([[ProductQuant]]): each dimension is independently
  * affine-mapped to a uint8 code against per-dim [min, max] trained on the
  * corpus. 4× memory vs float32 with near-exact recall (PQ is 32× with
  * coarser distances) — the right tool when memory is tight but PQ's
  * accuracy loss isn't acceptable. FAISS ships it as `SQ8`/IndexScalarQuantizer.
  *
  * 100 TB shape: training is ONE aggregation to a 1-row per-dim stats
  * relation (fixed size — d entries — at any corpus scale) that rides every
  * later plan as a broadcast; encode is a pure per-row projection (zero
  * shuffle, fused into the scan); search reconstructs each code inside a
  * fixed-order fold against the broadcast query batch and keeps top-k via
  * the bounded-heap aggregate — the q23 flat-scan category with 4× less
  * resident data, and the same IVF-composition option when pruning is
  * needed.
  *
  * Determinism: min/max of doubles are exact; the code is
  * `floor((x−mn)/(mx−mn)·255)` clamped — floor is portable; reconstruction
  * `mn + (code+0.5)·(mx−mn)/256` and the squared-distance fold are
  * fixed-order IEEE ops both engines replay; distances round to 6 before
  * ranking and ties pin on vec id (the PQ conventions).
  */
object ScalarQuant {

  /** Per-dim stats packed to ONE row: (mn: array, mx: array), dim-ordered.
    * Fixed d-entry model at any corpus size — the broadcast side of every
    * downstream plan.
    */
  def trainStats(corpus: DataFrame): DataFrame =
    corpus
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx")))).as("s"))
      .select(transform(col("s"), _.getField("mn")).as("mn"),
        transform(col("s"), _.getField("mx")).as("mx"))

  /** uint8 code for one dim: clamp(floor((x−mn)/(mx−mn)·255), 0, 255);
    * degenerate dims (mx == mn) code to 0. */
  private def codeOf(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0)).otherwise(
      greatest(lit(0), least(lit(255),
        floor((x - mn) / (mx - mn) * lit(255.0)).cast("int"))))

  /** (vecId, codes: array<int>) — the 4×-compressed resident corpus. Pure
    * per-row projection against the broadcast stats; no shuffle.
    */
  def encode(corpus: DataFrame, stats: DataFrame,
             vecId: String = "vec_id"): DataFrame =
    corpus.crossJoin(broadcast(stats))
      .select(col(vecId),
        zip_with(col("embedding").cast("array<double>"),
          zip_with(col("mn"), col("mx"), (a, b) => struct(a.as("mn"), b.as("mx"))),
          (x, s) => codeOf(x, s.getField("mn"), s.getField("mx"))).as("codes"))

  /** Per-dim affine reconstruction of a coded vector. */
  private def reconOf(codes: Column, mn: Column, mx: Column): Column =
    zip_with(codes,
      zip_with(mn, mx, (a, b) => struct(a.as("mn"), b.as("mx"))),
      (c, s) => when(s.getField("mx") === s.getField("mn"), s.getField("mn"))
        .otherwise(s.getField("mn") + (c.cast("double") + lit(0.5))
          * (s.getField("mx") - s.getField("mn")) / lit(256.0)))

  /** The asymmetric distance of one (query, reconstructed vec) pair:
    * the fixed-order [[ProductQuant.sqDist]] fold, rounded to 6 before
    * ranking (the standing ANN convention).
    */
  private def distOf(qv: Column, recon: Column): Column =
    round(aggregate(zip_with(qv, recon, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x), 6)

  /** Shared ranking tail over (__qid, vecId, d): bounded-heap top-k per
    * query (≤ k rows per query per mapper), ties pinned on vec id. */
  private def rankTail(scored: DataFrame, k: Int,
                       queryId: String, vecId: String): DataFrame =
    scored.groupBy(col("__qid"))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(negate(col("d")), col(vecId), k).as("top"))
      .select(col("__qid").as(queryId), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(queryId), col("entry.id").as(vecId),
        negate(col("entry.score")).as("dist"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Flat top-k over the coded corpus for a broadcast query batch:
    * reconstruction is MATERIALIZED once per vector in its own projection
    * BEFORE the query cross join (array-lambda subexpressions re-evaluate
    * per element — inside the scored projection the reconstruction would
    * re-run per query), then each
    * (query, vec) pair pays only the [[ProductQuant.sqDist]]-order
    * difference fold; bounded-heap top-k per query (≤ k rows per query per
    * mapper), ties pinned on vec id.
    */
  def topK(queries: DataFrame, codes: DataFrame, stats: DataFrame, k: Int,
           queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val q = queries.select(col(queryId).as("__qid"),
      col("embedding").cast("array<double>").as("__qv"))
    val scored = codes.crossJoin(broadcast(stats))
      .select(col(vecId), reconOf(col("codes"), col("mn"), col("mx")).as("__recon"))
      .crossJoin(broadcast(q))
      .select(col("__qid"), col(vecId), distOf(col("__qv"), col("__recon")).as("d"))
    rankTail(scored, k, queryId, vecId)
  }

  /** Train → encode → search, the full SQ8 pipeline for one query batch. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
              queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val stats = trainStats(corpus)
    topK(queries, encode(corpus, stats, vecId), stats, k, queryId, vecId)
  }

  /** Query leg over a PREBUILT IVF+SQ8 index — `codes` is the
    * (vecId, codes, cell) relation, `coarse`/`stats` the frozen models.
    * The scan order is the 100 TB point of the composition: the compressed
    * code relation is pruned to the DISTINCT probed cells first (broadcast
    * semi-shape), each surviving vector reconstructs ONCE in its own
    * projection, and only then does the per-query fan-out (broadcast probe
    * and query-batch joins) pay the distance fold per candidate pair —
    * |corpus|·nprobe/|cells| candidates, zero raw vectors, no flat scan.
    */
  def ivfSq8Search(queries: DataFrame, codes: DataFrame, coarse: DataFrame,
                   stats: DataFrame, k: Int, d: Int, nprobe: Int,
                   queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    val q = queries.withColumnRenamed(queryId, "__qid")
    val probes = ProductQuant.coarseProbes(q, coarse, d, nprobe, "__qid")
    val probedCells = probes.select("cell").distinct()
    val qv = q.select(col("__qid"), col("embedding").cast("array<double>").as("__qv"))
    val cand = codes.join(broadcast(probedCells), Seq("cell"))
      .crossJoin(broadcast(stats))
      .select(col("cell"), col(vecId),
        reconOf(col("codes"), col("mn"), col("mx")).as("__recon"))
    val scored = cand.join(broadcast(probes), Seq("cell"))
      .join(broadcast(qv), Seq("__qid"))
      .select(col("__qid"), col(vecId), distOf(col("__qv"), col("__recon")).as("d"))
    rankTail(scored, k, queryId, vecId)
  }

  /** Frozen-model micro-batch encode for the IVF+SQ8 index — the
    * [[ProductQuant.encodeBatch]] mirror on the scalar-quantized side: the
    * global stats row and the coarse book are fixed-size broadcasts that
    * never move per batch (stats are corpus min/max — cell-independent by
    * design, so appends reuse them unchanged), and each append ships
    * |batch| slim (vecId, codes, cell) rows. Row-identical to a wholesale
    * re-encode under the same models; searched by [[ivfSq8Search]]
    * unchanged.
    */
  def encodeBatch(batch: DataFrame, coarse: DataFrame, stats: DataFrame,
                  d: Int, vecId: String = "vec_id"): DataFrame =
    encode(batch, stats, vecId).join(
      ProductQuant.encode(batch, coarse, 1, d, vecId)
        .select(col(vecId), col("code").as("cell")), Seq(vecId))

  /** IVF + SQ8 composite (FAISS `IVF,SQ8`) — train → encode → search: the
    * [[ProductQuant]] coarse quantizer prunes WHICH vectors are scored
    * (each query probes its `nprobe` nearest cells), the scalar quantizer
    * shrinks WHAT is resident (4× vs float32, near-exact recall). This
    * retires the flat [[topK]] scan as the only SQ8 search path: a query
    * batch touches |corpus|·nprobe/|cells| candidates instead of every
    * vector. The scalar stats stay GLOBAL (per-dim [min,max] over the whole
    * corpus, FAISS's IndexIVFScalarQuantizer default) so the code of a
    * vector is independent of its cell and incremental appends reuse the
    * frozen stats unchanged.
    */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, k: Int, d: Int = 64,
                 centroidStride: Int = 32, trainIters: Int = 2, coarseKs: Int = 8,
                 nprobe: Int = 2, queryId: String = "query_id",
                 vecId: String = "vec_id", trainSample: Int = 0): DataFrame = {
    val frac = ProductQuant.trainFracFor(corpus, trainSample)
    val sample = ProductQuant.sampleFor(corpus, frac, vecId)
    val coarse = ProductQuant.trainCodebooks(corpus, 1, d, centroidStride,
      trainIters, coarseKs, vecId, frac, sample)
    ProductQuant.releaseSample(sample)
    val cells = ProductQuant.encode(corpus, coarse, 1, d, vecId)
      .select(col(vecId), col("code").as("cell"))
    val stats = trainStats(corpus)
    val codes = encode(corpus, stats, vecId).join(cells, Seq(vecId))
    ivfSq8Search(queries, codes, coarse, stats, k, d, nprobe, queryId, vecId)
  }
}
