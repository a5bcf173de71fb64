package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic text embeddings by the hashing trick (feature hashing,
  * Weinberger et al., ICML 2009; random projection à la Achlioptas 2003):
  * each distinct term gets a pseudo-random `dims`-vector carved from md5
  * digests, and a document embeds as the tf·idf-weighted sum of its terms'
  * vectors — a dense `Array[Double]` column generated from raw text with NO
  * model artifact to ship, which is what makes the ANN stack
  * ([[SimSearch]], [[ProductQuant]], [[ScalarQuant]]) usable on corpora
  * that arrive without precomputed embeddings.
  *
  * Determinism: term components are 16-bit signed ints parsed from md5 hex
  * (4 hex chars each; one digest per 8 dims), weights are the exact
  * BIGINT-micro tf·[[Sampling.lnMicro]] idf, so every accumulated
  * component is an exact integer sum on both engines; the only float step
  * is the final fixed `/1e12` rescale — one IEEE division.
  *
  * Scale: the component relation is per-DISTINCT-term (vocab-sized, not
  * corpus-sized); embedding assembly is one (doc, dim)-keyed aggregate over
  * the postings ⋈ components join — map-side combinable, no window, no
  * driver collect.
  */
object HashEmbed {

  /** (term, dim, c): the term's pseudo-random components, c ∈
    * [-32768, 32767]. `dims` must be a positive multiple of 8 (8
    * components per md5 digest).
    */
  def termComponents(terms: DataFrame, dims: Int): DataFrame = {
    require(dims > 0 && dims % 8 == 0, s"dims must be a multiple of 8: $dims")
    terms.select(col("term"))
      .crossJoin(spark_range(terms.sparkSession, dims / 8).toDF("blk"))
      .select(col("term"), col("blk"),
        md5(concat(col("term"), lit("#"), col("blk").cast("string"))).as("h"))
      .select(col("term"),
        posexplode(transform(sequence(lit(0), lit(7)), j =>
          conv(substring(col("h"), j * 4 + 1, lit(4)), 16, 10).cast("long") - 32768L))
          .as(Seq("j", "c")),
        col("blk"))
      .select(col("term"), (col("blk") * 8 + col("j")).as("dim"), col("c"))
  }

  private def spark_range(s: org.apache.spark.sql.SparkSession, n: Long) =
    s.range(n)

  /** (doc_id, embedding): tf·idf-weighted hashed embeddings for every doc
    * with at least one token surviving the df gate (tokenless docs have no
    * vector, like any embedder). Components are exact integer sums
    * rescaled by 1e12.
    *
    * `minDf` drops terms seen in fewer than that many docs BEFORE the
    * component join — the vocabulary cap: on corpora whose distinct-term
    * count grows with size (boilerplate ids, hashes, salts), the per-term
    * component relation (vocab × dims rows) is the dominant stress-curve
    * constant, and hapax-dropping bounds it with negligible signal loss
    * (a df-1 term contributes to exactly one doc's vector).
    */
  def docEmbeddings(docs: DataFrame, idCol: String, textCol: String,
                    dims: Int, minDf: Long = 1L): DataFrame = {
    val post = Retrieval.postings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nDocs = docs.select(col(idCol)).agg(count(lit(1)).as("n"))
    val idf = post.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .select(col("term"), Sampling.lnMicro(col("n"), col("df")).as("im"))
    val wv = post.join(idf, Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("im")).as("wm"))
    // components only for terms that SURVIVED the df gate — the cap's point.
    // Packed to ONE dim-ordered array<long> row per term (optimization r21,
    // guide §2.3 "shuffle fewer bytes"): the old per-(term, dim) component
    // relation multiplied every posting ×dims through the join, shuffling
    // |postings|·dims rows into the (doc, dim) aggregate. Packed, the join
    // stays |postings|-sized and the per-doc aggregate is `dims` flat
    // codegen'd long-sum columns (the minhash k-min-columns pattern) — a
    // map-side-combined hash aggregate shipping one row per doc. Integer
    // sums are exact and order-independent, so the result is bit-identical.
    val compPacked = termComponents(idf.select("term"), dims)
      .groupBy("term")
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("dc"))
      .select(col("term"), transform(col("dc"), _.getField("c")).as("cs"))
    val sums = (0 until dims).map(i =>
      sum(element_at(col("cs"), i + 1) * col("wm")).as(s"__v$i"))
    wv.join(compPacked, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        transform(array((0 until dims).map(i => col(s"__v$i")): _*),
          v => v.cast("double") / lit(1e12)).as("embedding"))
  }
}
