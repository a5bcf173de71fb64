package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Packing, Sampling, TextStats}

/** The whole training-data pipeline composed end to end on real fixture
  * data: curation gates -> near-dup pairs -> connected-components dedup ->
  * deterministic sampling -> sequence packing. Each stage is oracled or
  * spec-tested on its own; this asserts the STAGES COMPOSE — schemas line
  * up, invariants hold through the chain, and the result is reproducible.
  */
class PipelineSpec extends SparkSuite {

  test("curate -> near-dup CC -> sample -> pack composes and is reproducible") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    def run(): (Set[Long], Seq[org.apache.spark.sql.Row]) = {
      val docs = Tables(spark, sfDir, "documents").select("doc_id", "source", "text")
      // plant near-dups so the CC stage has real work
      val corpus = docs.unionByName(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("source"),
          concat(col("text"), lit(" extra token")).as("text")))
      // 1. curation gate: keep docs with at least 5 tokens
      val gated = corpus
        .withColumn("n_tokens", size(TextStats.tokens(col("text"))))
        .filter(col("n_tokens") >= 5)
      // 2. near-dup pairs (prefix-filtered exact jaccard) -> components ->
      //    keep canonical docs
      val pairs = Dedup.jaccardPairsPrefix(gated, "text", "doc_id", 3, 0.5)
      val surviving = Dedup.nearDupApply(gated, pairs, "doc_id")
      // 3. deterministic 80% sample
      val sampled = Sampling.deterministicSample(surviving, col("doc_id"), lit(0.8))
      // 4. pack into 512-token contexts
      val packs = Packing.packGreedy(sampled, "doc_id", "n_tokens", 512, 4)
      (sampled.select("doc_id").as[Long].collect().toSet, packs.collect().toSeq)
    }
    val (ids1, packs1) = run()
    val (ids2, packs2) = run()
    assert(ids1 == ids2) // the whole chain is deterministic
    assert(packs1.map(_.toString).sorted == packs2.map(_.toString).sorted)
    assert(ids1.nonEmpty)
    // every planted near-dup was collapsed: of each (d, d+10000) pair that
    // survived gating, only the canonical (lower) id remains
    assert(!ids1.exists(id => id >= 10000L && ids1.contains(id - 10000L)))
    // packing covers exactly the sampled docs, within budget
    val packedIds = packs1.flatMap(_.getSeq[Long](1))
    assert(packedIds.toSet == ids1 && packedIds.size == ids1.size)
    assert(packs1.forall(_.getLong(3) <= 512))
  }
}
