package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle training transform (Bavarian et al. 2022): rewrite a
  * `rate` fraction of documents as <PRE>prefix<SUF>suffix<MID>middle (PSM
  * order) so an autoregressive model learns infilling. Purely per-row string
  * work fused into the scan — zero shuffle, the right shape for a 100 TB
  * rewrite pass.
  *
  * Everything is deterministic and engine-portable: the apply decision and
  * both cut points derive from disjoint 32-bit windows of md5(doc id) (the
  * q61 uniform-hash convention), so reruns, resumed shards, and the DuckDB
  * oracle all pick the same documents and the same spans. Cuts land on
  * TOKEN boundaries of the whitespace-normalized text: cut c = floor(u ·
  * (n+1)) ∈ [0, n], the two cuts ordered into (lo, hi).
  */
object Fim {

  /** (idCol, applied, n_prefix, n_middle, n_suffix, text_fim). Unapplied
    * docs pass through with their canonical (normalized, token-joined) text
    * so the output column is uniformly canonical.
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   rate: Double = 0.5): DataFrame = {
    def u(off: Int) =
      conv(substring(md5(col("id").cast("string")), off, 8), 16, 10)
        .cast("long") / lit(4294967296.0)
    val np1 = (size(col("w")) + 1).cast("double")
    docs
      .select(col(idCol).as("id"),
        TextStats.tokens(Dedup.normalize(col(textCol))).as("w"))
      .select(col("id"), col("w"), size(col("w")).cast("long").as("n"),
        (u(1) < lit(rate)).as("applied"),
        floor(u(9) * np1).as("c1"), floor(u(17) * np1).as("c2"))
      .select(col("id"), col("w"), col("n"), col("applied"),
        least(col("c1"), col("c2")).as("lo"),
        greatest(col("c1"), col("c2")).as("hi"))
      .select(col("id").as(idCol), col("applied"),
        when(col("applied"), col("lo")).otherwise(col("n")).as("n_prefix"),
        when(col("applied"), col("hi") - col("lo")).otherwise(lit(0L)).as("n_middle"),
        when(col("applied"), col("n") - col("hi")).otherwise(lit(0L)).as("n_suffix"),
        when(col("applied"), concat(
          lit("<PRE>"), concat_ws(" ", slice(col("w"), lit(1), col("lo").cast("int"))),
          lit("<SUF>"), concat_ws(" ", slice(col("w"), (col("hi") + 1).cast("int"),
            (col("n") - col("hi")).cast("int"))),
          lit("<MID>"), concat_ws(" ", slice(col("w"), (col("lo") + 1).cast("int"),
            (col("hi") - col("lo")).cast("int")))))
          .otherwise(concat_ws(" ", col("w"))).as("text_fim"))
  }
}
