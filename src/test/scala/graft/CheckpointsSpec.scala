package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Checkpoints

import graft.llm.{Dedup, SimSearch}

/** Regression gate for the iterative-loop checkpoint leak (VERDICT r06 #2):
  * every loop that pins rounds with `localCheckpoint` must release round
  * N-1's blocks once round N materializes, so an operator's steady-state
  * footprint is ONE round's block set — not one per iteration. Each test
  * counts `sparkContext.getPersistentRDDs` before/after: the returned frame
  * keeps exactly its own final checkpoint alive (by design — callers scan
  * it), and `Checkpoints.release(result)` returns the count to baseline.
  */
class CheckpointsSpec extends SparkSuite {

  /** Each test starts from a swept context so a prior suite's (or a prior
    * failed test's) leftovers can't shift the baseline.
    */
  private def baseline(): Int = {
    Checkpoints.sweep(spark)
    persisted
  }

  private def persisted: Int = spark.sparkContext.getPersistentRDDs.size

  test("pageRank releases every intermediate round's checkpoint blocks") {
    import spark.implicits._
    val before = baseline()
    val e = (1L to 8L).map(i => (i, i % 8 + 1)).toDF("src", "dst")
    val r = graft.ops.LinkGraph.pageRank(e, iters = 6)
    assert(r.count() == 8)
    // 6 rounds + seed ran; only the FINAL round's blocks may survive
    assert(persisted == before + 1, s"leaked: $persisted vs baseline $before")
    Checkpoints.release(r)
    assert(persisted == before)
  }

  test("connectedComponents (min-label) releases per-round label vectors") {
    import spark.implicits._
    val before = baseline()
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 12L).toDF("doc_id")
    val comp = Dedup.connectedComponents(pairs, nodes, "doc_id")
    assert(comp.count() == 12)
    assert(persisted == before + 1, s"leaked: $persisted vs baseline $before")
    Checkpoints.release(comp)
    assert(persisted == before)
  }

  test("connectedComponentsStar releases per-round edge sets") {
    import spark.implicits._
    val before = baseline()
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 12L).toDF("doc_id")
    val comp = Dedup.connectedComponentsStar(pairs, nodes, "doc_id")
    assert(comp.count() == 12)
    assert(persisted == before + 1, s"leaked: $persisted vs baseline $before")
    Checkpoints.release(comp)
    assert(persisted == before)
  }

  test("k-means training (fixed and converged) releases per-round centroids") {
    import spark.implicits._
    // three orthogonal clusters in id-blocks so stride-20 seeds land one in
    // each (the LlmSpec convergence fixture's layout) — no cell can vanish
    val corpus = (0L until 60L).map { i =>
      (i % 3) match {
        case 0 => (i, Array(1.0, 0.0, 0.0))
        case 1 => (i, Array(0.0, 1.0, 0.0))
        case _ => (i, Array(0.0, 0.0, 1.0))
      }
    }.toDF("vec_id", "embedding")
    val before = baseline()
    val fixedRounds = SimSearch.trainCentroids(corpus, centroidStride = 20, iters = 4)
    assert(fixedRounds.count() > 0)
    assert(persisted == before + 1, s"leaked: $persisted vs baseline $before")
    Checkpoints.release(fixedRounds)

    val converged = SimSearch.trainCentroidsConverged(corpus, centroidStride = 20)
    assert(converged.count() > 0)
    assert(persisted == before + 1, s"leaked: $persisted vs baseline $before")
    Checkpoints.release(converged)
    assert(persisted == before)
  }

  test("BPE training releases per-round word relations") {
    import spark.implicits._
    val docs = Seq("aa ab aa ab aab", "ab aa aab aab").toDF("text")
    val before = baseline()
    val (merges, words) = graft.llm.BpeTrain.train(docs, "text", rounds = 3)
    assert(merges.nonEmpty && words.count() > 0)
    assert(persisted == before + 1, s"leaked: $persisted vs baseline $before")
    Checkpoints.release(words)
    assert(persisted == before)
  }

  test("sweep preserves deliberate persist caches; drops only checkpoint blocks") {
    import spark.implicits._
    baseline()
    val cache = (1L to 9L).toDF("x").persist()
    assert(cache.count() == 9)
    val ck = (1L to 5L).toDF("y").localCheckpoint()
    assert(ck.count() == 5)
    Checkpoints.sweep(spark)
    // the checkpoint debris is gone, the shared cache is not (ADVICE r07)
    assert(spark.sparkContext.getPersistentRDDs.valuesIterator
      .forall(!org.apache.spark.rdd.GraftRddAccess.isLocallyCheckpointed(_)))
    assert(cache.storageLevel.useMemory, "deliberate cache must survive sweep")
    cache.unpersist()
  }

  test("sweep drops whatever a consumed query left persisted") {
    import spark.implicits._
    // baseline-RELATIVE, not absolute zero: a prior suite in the shared JVM
    // may hold deliberate persist() caches that sweep preserves by design
    val before = baseline()
    val ck = (1L to 5L).toDF("x").localCheckpoint()
    assert(ck.count() == 5 && persisted == before + 1)
    Checkpoints.sweep(spark)
    assert(persisted == before)
    assert(spark.sparkContext.getPersistentRDDs.valuesIterator
      .forall(!org.apache.spark.rdd.GraftRddAccess.isLocallyCheckpointed(_)))
  }
}
