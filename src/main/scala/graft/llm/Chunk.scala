package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG/embedding-pipeline primitive
  * (split every document into fixed-size token windows with overlap, one
  * chunk per embedding-model call). The dual of [[Packing]]: packing joins
  * short docs up to a budget, chunking splits long docs down to one.
  *
  * Pure per-row explode — zero shuffles, stays inside whole-stage codegen
  * (tokens materialized once in their own projection — array-lambda
  * subexpressions re-evaluate per element), so a 100 TB corpus chunks at
  * full scan speed.
  */
object Chunk {

  /** One row per chunk: (idCol, chunk_idx, start_tok, n_tok, chunk_text).
    * Chunk i covers tokens [1 + i*stride, 1 + i*stride + chunkSize - 1]
    * (1-based, clamped to the doc); starts walk `stride` tokens apart, so
    * consecutive chunks overlap by chunkSize - stride tokens. Every token
    * position is covered (stride <= chunkSize enforced); the final chunk may
    * be short — standard trailing-remainder semantics, deterministic, no
    * dropped text — and a start whose window would only re-cover the tail
    * the previous chunk already reached is not emitted. Docs with no tokens
    * produce no chunks.
    *
    * Token space (not characters) so chunk boundaries never split a token,
    * and `chunk_text` re-joins with single spaces — chunking is defined on
    * the normalized token stream, like every text operator here.
    */
  def slidingWindow(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs.select(col(idCol), TextStats.tokens(Dedup.normalize(col(textCol))).as("w"))
      .select(col(idCol), col("w"), size(col("w")).as("n"))
      .filter(col("n") > 0)
      .select(col(idCol), col("w"), col("n"),
        explode(sequence(lit(1), col("n"), lit(stride))).as("start_tok"))
      // keep a start iff it is the first, or the previous chunk stopped
      // short of the end of the doc (otherwise this chunk is a strict
      // suffix of the previous one)
      .filter(col("start_tok") === 1 ||
        col("start_tok") - stride + (chunkSize - 1) < col("n"))
      .select(col(idCol),
        ((col("start_tok") - 1) / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(chunkSize), col("n") - col("start_tok") + 1).cast("long").as("n_tok"),
        concat_ws(" ", slice(col("w"), col("start_tok"), lit(chunkSize))).as("chunk_text"))
  }
}
