package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, SimSearch, TextStats}

/** LLM-pipeline operators on planted fixtures: dedup variants find planted
  * near-duplicates and nothing else; similarity search ranks correctly;
  * text stats match hand-computed values.
  */
class LlmSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups byte-identical normalized text, min id wins") {
    import spark.implicits._
    val df = docs((1L, "Hello  World"), (2L, "  hello world "), (3L, "other text"))
    val got = Dedup.exact(df, "text", "doc_id")
      .select("doc_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("wordShingles produces distinct n-grams; short docs fall back to whole text") {
    import spark.implicits._
    val df = docs((1L, "a b c d"), (2L, "a b"))
    val got = df.select(Dedup.wordShingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0).toSet == Set("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("minhash LSH finds the planted near-duplicate pair and no false positives") {
    import spark.implicits._
    val base = (1 to 50).map(i => s"word$i").mkString(" ")
    val near = base + " tail"
    val other = (100 to 150).map(i => s"tok$i").mkString(" ")
    val df = docs((1L, base), (2L, near), (3L, other))
    val got = Dedup.minhashPairs(df, "text", "doc_id", shingleN = 3, k = 16,
      bands = 4, threshold = 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("minhash agrees with brute-force jaccard on a small corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 20L).map { i =>
      val words = (1 to 30).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      (i, words)
    } ++ Seq((21L, "plant plant plant dup dup dup x y z a b c"),
             (22L, "plant plant plant dup dup dup x y z a b d"))
    val df = docs(rows: _*)
    val brute = Dedup.bruteForceJaccardPairs(df, "text", "doc_id", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(df, "text", "doc_id", 3, 16, 8, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification filters exact jaccard, so LSH ⊆ brute; with b=8,r=2 the
    // planted j≈0.9 pair is found w.p. ~1-1e-7
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((21L, 22L)))
  }

  test("greedy packing: every doc packed once, no pack over budget, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val docs = (1L to 500L).map(i => (i, 50L + rnd.nextInt(900))).toDF("doc_id", "n_tokens")
    def run() = graft.llm.Packing.packGreedy(docs, "doc_id", "n_tokens",
      maxTokens = 2048, partitions = 8)
    val packs = run().collect()
    val allIds = packs.flatMap(_.getSeq[Long](1))
    assert(allIds.sorted.toSeq == (1L to 500L)) // exactly once each
    assert(packs.forall(p => p.getLong(3) <= 2048))
    assert(packs.forall(p => p.getSeq[Long](1).size == p.getInt(2)))
    // oversized doc gets its own pack
    val over = Seq((1L, 5000L), (2L, 100L)).toDF("doc_id", "n_tokens")
    val op = graft.llm.Packing.packGreedy(over, "doc_id", "n_tokens", 2048, 2).collect()
    assert(op.exists(p => p.getSeq[Long](1) == Seq(1L) && p.getLong(3) == 5000L))
    // deterministic across runs
    assert(run().collect().map(_.toString).sorted.toSeq ==
      packs.map(_.toString).sorted.toSeq)
    // padding waste is bounded: FFD on this distribution packs tightly
    val waste = packs.map(p => 2048L - p.getLong(3)).sum.toDouble /
      (packs.length * 2048L)
    assert(waste < 0.25, s"padding waste $waste")
  }

  test("deterministic sample is stable and hits its rate within tolerance") {
    import spark.implicits._
    val df = (1L to 20000L).toDF("id")
    val a = graft.llm.Sampling.deterministicSample(df, col("id"), lit(0.3))
      .as[Long].collect().toSet
    val b = graft.llm.Sampling.deterministicSample(df, col("id"), lit(0.3))
      .as[Long].collect().toSet
    assert(a == b) // same rows every run — no RNG state
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02)
    // nested rates: a 0.1 sample is a subset of the 0.3 sample
    val c = graft.llm.Sampling.deterministicSample(df, col("id"), lit(0.1))
      .as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("epochMixture replicates by weight: exact at integers, ±1 at fractions") {
    import spark.implicits._
    val df = (1L to 6000L).toDF("id")
    // integer weight: every row exactly twice, copy_idx 0 and 1
    val twice = graft.llm.Sampling.epochMixture(df, col("id"), lit(2.0))
    assert(twice.count() == 12000L)
    assert(twice.groupBy("id").count().filter(col("count") =!= 2).count() == 0)
    assert(twice.select("copy_idx").distinct().as[Int].collect().toSet == Set(0, 1))
    // fractional weight 2.4: each row 2 or 3 copies, mean multiplicity ≈ 2.4
    val frac = graft.llm.Sampling.epochMixture(df, col("id"), lit(2.4))
    val per = frac.groupBy("id").count().select("count").as[Long].collect()
    assert(per.forall(n => n == 2L || n == 3L))
    assert(math.abs(per.sum / 6000.0 - 2.4) < 0.05)
    // deterministic: the same multiset every run
    val again = graft.llm.Sampling.epochMixture(df, col("id"), lit(2.4))
    assert(again.count() == frac.count())
    // w < 1 degrades to a keep-or-drop sample at the right rate
    val down = graft.llm.Sampling.epochMixture(df, col("id"), lit(0.3))
    assert(math.abs(down.count() / 6000.0 - 0.3) < 0.03)
  }

  test("connected components collapse chains; nearDupApply keeps canonical rows") {
    import spark.implicits._
    // chain 1-2, 2-3 (no 1-3 edge); separate pair 5-6; singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val comp = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "d"), (6L, "e"), (9L, "f"))
      .toDF("doc_id", "text")
    val kept = Dedup.nearDupApply(df, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L, 9L))
  }

  test("connected components handle a long path within the iteration budget") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 12L).toDF("doc_id")
    val comp = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
  }

  test("connected components fail loudly instead of returning unconverged labels") {
    import spark.implicits._
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 20L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, nodes, "doc_id", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("multi-probe embedding LSH finds the boundary pair single-bucket misses") {
    import spark.implicits._
    // near-identical vectors straddling the first sign plane: component 1 is
    // +eps vs -eps, so base buckets differ and the single-bucket join misses
    val a = Array(0.001, 0.9, 0.8, 0.7)
    val b = Array(-0.001, 0.9, 0.8, 0.7)
    val far = Array(-0.9, -0.8, -0.7, -0.6)
    val df = Seq((1L, a.toSeq), (2L, b.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding")
    val single = Dedup.embeddingPairs(df, "embedding", "vec_id",
      signBits = 4, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!single.contains((1L, 2L)))
    val multi = Dedup.embeddingPairsMultiProbe(df, "embedding", "vec_id",
      signBits = 4, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(multi == Set((1L, 2L)))
  }

  test("multi-probe embedding LSH is a superset of the single-bucket pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1L to 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))
    }
    val df = rows.toDF("vec_id", "embedding")
    val single = Dedup.embeddingPairs(df, "embedding", "vec_id", 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val multi = Dedup.embeddingPairsMultiProbe(df, "embedding", "vec_id", 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi))
  }

  test("prefix-filtered jaccard join equals brute force (exact recall + precision)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1L to 40L).map { i =>
      (i, (1 to 25).map(_ => s"w${rnd.nextInt(60)}").mkString(" "))
    } ++ Seq(
      (41L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (42L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (43L, "solo")) // shorter-than-n doc exercises the whole-text fallback
    val df = docs(rows: _*)
    val brute = Dedup.bruteForceJaccardPairs(df, "text", "doc_id", 3, 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.jaccardPairsPrefix(df, "text", "doc_id", 3, 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(pref == brute)
    assert(pref.exists { case (a, b, _) => a == 41L && b == 42L })
  }

  test("swept simhash finds prefix-bit near-dups the single-prefix path misses") {
    import spark.implicits._
    // plant a pair differing ONLY inside the top-16 prefix window (bit 62):
    // hamming 1, but the single-prefix buckets differ -> invisible there
    val h = 0x0123456789ABCDEFL
    val hashes = Seq((1L, h), (2L, h ^ (1L << 62)), (3L, ~h))
      .toDF("id", "sh")
    val single = Dedup.simhashPairsFromHashes(hashes, prefixBits = 16, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(single.isEmpty)
    val swept = Dedup.sweptPairsFromHashes(hashes, blocks = 7, maxHamming = 6)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(swept == Set((1L, 2L, 1)))
  }

  test("swept simhash hot-bucket cap bounds quadratic clusters, keeps sparse pairs") {
    import spark.implicits._
    val h = 0x7777000012345678L
    // a 5-doc identical cluster (hot bucket in every block) + one sparse near pair
    val cluster = (1L to 5L).map(i => (i, h))
    val sparse = Seq((10L, 0x0F0F0F0F0F0F0F0FL), (11L, 0x0F0F0F0F0F0F0F0EL))
    val hashes = (cluster ++ sparse).toDF("id", "sh")
    val uncapped = Dedup.sweptPairsFromHashes(hashes, 7, 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 10 + 1) // C(5,2) cluster pairs + the sparse pair
    val capped = Dedup.sweptPairsFromHashes(hashes, 7, 6, maxBucket = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((10L, 11L))) // cluster suppressed, sparse pair kept
  }

  test("swept simhash recall is EXACT: matches brute-force all-pairs hamming") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random base hashes plus planted low-hamming perturbations at varied
    // bit positions (high, low, straddling block boundaries)
    val bases = (1L to 30L).map(i => (i, rnd.nextLong()))
    val planted = bases.take(10).zipWithIndex.map { case ((i, h), k) =>
      val flips = (0 until (k % 6 + 1)).map(j => 1L << ((k * 11 + j * 7) % 64))
      (i + 100L, flips.foldLeft(h)(_ ^ _))
    }
    val hashes = (bases ++ planted).toDF("id", "sh")
    val brute = hashes.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(hashes.select(col("id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val swept = Dedup.sweptPairsFromHashes(hashes, blocks = 7, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(swept == brute)
  }

  test("simhash pairs find planted near-dups via prefix buckets") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base + " tail"
    val df = docs((1L, base), (2L, near))
    val got = Dedup.simhashPairs(df, "text", "doc_id", prefixBits = 4, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("embedding pairs: sign-bucketed candidates verified by cosine") {
    import spark.implicits._
    val a = Array(1.0f, 1.0f, 1.0f, 1.0f, 0.1f)
    val b = Array(0.9f, 1.1f, 1.0f, 0.95f, 0.12f) // near-dup of a, same signs
    val c = Array(-1.0f, 1.0f, -1.0f, 1.0f, -0.5f) // different bucket
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    val got = Dedup.embeddingPairs(df, "embedding", "vec_id", signBits = 4, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("brute-force top-k ranks by cosine with pinned ties") {
    import spark.implicits._
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("query_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos 1.0
      (2L, Array(1.0f, 1.0f)),   // cos ~0.707
      (3L, Array(0.0f, 1.0f)),   // cos 0
      (4L, Array(-1.0f, 0.0f))). // cos -1
      toDF("vec_id", "embedding")
    val got = SimSearch.bruteForceTopK(q, corpus, 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("bounded-heap aggregate top-k equals the window top-k exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val corpus = (1L to 300L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") <= 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val viaWindow = SimSearch.bruteForceTopK(q, corpus, 7)
      .as[(Long, Long, Double, Int)].collect().toSet
    val viaAgg = SimSearch.bruteForceTopKAgg(q, corpus, 7)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 3 * 7)
  }

  test("bucketed top-k returns same top hit when buckets align") {
    import spark.implicits._
    val q = Seq((100L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("query_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.1f)),
      (2L, Array(1.0f, 2.1f, 2.9f, 4.0f))).toDF("vec_id", "embedding")
    val got = SimSearch.bucketedTopK(q, corpus, 1, signBits = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("ivf top-k: probing the right cells recovers the true neighbor") {
    import spark.implicits._
    // two well-separated directions; centroid stride picks vec_id 0 and 64
    def v(x: Float, y: Float) = Array(x, y)
    val corpus = Seq(
      (0L, v(1f, 0f)), (1L, v(0.9f, 0.1f)), (2L, v(0.95f, 0.05f)),
      (64L, v(0f, 1f)), (65L, v(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val q = Seq((1000L, v(1f, 0.05f))).toDF("query_id", "embedding")
    val got = SimSearch.ivfTopK(q, corpus, 2, centroidStride = 64, nprobe = 1)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // query lands in the x-direction cell; (0.95,0.05) is near-parallel to
    // (1,0.05) so vec 2 outranks vec 0, and the y-cell members never score
    assert(got == Seq(2L, 0L))
  }

  test("kmeansIter moves centroids to cluster means") {
    import spark.implicits._
    // two tight clusters around (1,0) and (0,1); seed centroids off-center
    val corpus = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(1.0f, -0.1f)), (3L, Array(0.9f, 0.0f)),
      (4L, Array(0.1f, 1.0f)), (5L, Array(-0.1f, 1.0f)), (6L, Array(0.0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val seeds = Seq((0L, Array(0.8, 0.3)), (1L, Array(0.3, 0.8)))
      .toDF("cent_id", "cent_emb")
    val moved = SimSearch.kmeansIter(corpus, seeds)
      .as[(Long, Seq[Double])].collect().toMap
    // cell 0 mean ~ (0.9667, 0.0), cell 1 mean ~ (0.0, 0.9667)
    assert(math.abs(moved(0L).head - 29.0 / 30.0) < 1e-6 && math.abs(moved(0L)(1)) < 1e-6)
    assert(math.abs(moved(1L)(1) - 29.0 / 30.0) < 1e-6 && math.abs(moved(1L).head) < 1e-6)
  }

  test("Lloyd training converges on separable clusters; tight budget fails loudly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // three orthogonal clusters; stride-20 seeds land one in each (0, 20, 40)
    val corpus = (0L until 60L).map { i =>
      val base = (i % 3) match {
        case 0 => Array(1.0, 0.0, 0.0, 0.0)
        case 1 => Array(0.0, 1.0, 0.0, 0.0)
        case _ => Array(0.0, 0.0, 1.0, 0.0)
      }
      (i, base.map(x => (x + (rnd.nextDouble() - 0.5) * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val trained = SimSearch.trainCentroidsConverged(corpus, centroidStride = 20,
        maxIter = 15, tol = 1e-5)
      .as[(Long, Seq[Double])].collect()
    assert(trained.length == 3)
    // each trained centroid is dominated by a distinct cluster axis
    val axes = trained.map(_._2.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes == Set(0, 1, 2))
    // the seed-to-mean move exceeds tol after a single round: loud failure
    val e = intercept[IllegalStateException] {
      SimSearch.trainCentroidsConverged(corpus, centroidStride = 20,
        maxIter = 1, tol = 1e-5)
    }
    assert(e.getMessage.contains("did not converge"))
    // trained IVF still ranks the honest nearest neighbors at the top:
    // differential vs brute force on the same corpus
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ivf = SimSearch.ivfTopKTrained(queries, corpus, 3, centroidStride = 20,
      trainIters = 2, nprobe = 1).as[(Long, Long, Double, Int)].collect().toSet
    val brute = SimSearch.bruteForceTopK(queries, corpus, 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    // orthogonal clusters: each query's true top-3 lives in its own cell,
    // so IVF@nprobe=1 equals brute force exactly here
    assert(ivf == brute)
  }

  test("Lloyd training fails fast (round 1, not budget exhaustion) when a cell vanishes") {
    import spark.implicits._
    // vec 20 duplicates vec 0, so the two stride-20 seeds are IDENTICAL:
    // every assignment ties and breaks to cent_id 0 — cell 20 wins nothing
    // and vanishes in the very first Lloyd round, which is unrecoverable
    val corpus = (0L until 40L).map { i =>
      val src = if (i == 20L) 0L else i
      (i, Array.tabulate(4)(d => (1.0 + src * 0.01 * d).toFloat))
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      SimSearch.trainCentroidsConverged(corpus, centroidStride = 20,
        maxIter = 15, tol = 1e-5)
    }
    assert(e.getMessage.contains("cell vanished in round 1"), e.getMessage)
  }

  test("winnowing: shared substrings yield shared fingerprints, disjoint texts don't") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, s"PREFIX-A $shared SUFFIX-A"),
      (2L, s"completely different lead-in $shared trailing text"),
      (3L, "no overlap here at all, entirely unrelated content body")).toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"), TextStats.gramHashes(col("text"), 8).as("gh"))
      .select(col("doc_id"), TextStats.winnowMins(col("gh"), 16).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val s12 = fps(1L).toSet.intersect(fps(2L).toSet)
    val s13 = fps(1L).toSet.intersect(fps(3L).toSet)
    assert(s12.nonEmpty, "docs sharing a long substring must share fingerprints")
    assert(s13.isEmpty, "unrelated docs should not collide")
    // the relational (windowed) form computes the identical fingerprint set
    val relational = TextStats.winnowFingerprints(df, "doc_id", "text", 8, 16)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(relational == fps.map { case (k, v) => k -> v.toSet })
    // the rolling-hash variant keeps the winnowing GUARANTEE (different hash
    // values, same shared-substring property)
    val rolling = TextStats.winnowFingerprintsRolling(df, "doc_id", "text", 8, 16)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(rolling(1L).intersect(rolling(2L)).nonEmpty)
    assert(rolling(1L).intersect(rolling(3L)).isEmpty)
  }

  test("binaryFile dir -> media shape -> partitioned decode composes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media")
    java.nio.file.Files.write(dir.resolve("x.img"), Array.fill[Byte](100)(1))
    java.nio.file.Files.write(dir.resolve("y.img"), Array.fill[Byte](250)(2))
    val media = graft.llm.Multimodal.fromBinaryDir(spark, dir.toString, "*.img")
    assert(media.columns.toSeq == Seq("doc_id", "payload", "mime"))
    assert(media.select("mime").as[String].collect().forall(_ == "application/img"))
    val decoded = graft.llm.Multimodal.decodePartitioned(
      media.as[graft.llm.Multimodal.MediaRow]).collect()
    assert(decoded.map(_.n_bytes).sorted.toSeq == Seq(100L, 250L))
    assert(decoded.forall(d => d.width == (d.n_bytes % 640 + 1).toInt))
  }

  test("real image decode: generated PNG/JPEG headers read true dimensions; non-images fall back") {
    import spark.implicits._
    def imgBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = imgBytes(37, 23, "png")
    val jpg = imgBytes(64, 48, "jpg")
    val media = Seq(
      graft.llm.Multimodal.MediaRow(1L, png, "image/png"),
      graft.llm.Multimodal.MediaRow(2L, jpg, "image/jpeg"),
      graft.llm.Multimodal.MediaRow(3L, "not an image".getBytes("UTF-8"),
        "application/octet-stream")).toDS()
    val decoded = graft.llm.Multimodal.decodePartitionedReal(media)
      .collect().map(d => d.doc_id -> d).toMap
    // REAL header dimensions, not the fake's byte-length formulas
    assert(decoded(1L).width == 37 && decoded(1L).height == 23)
    assert(decoded(1L).channels == 3)
    assert(decoded(2L).width == 64 && decoded(2L).height == 48)
    assert(decoded(1L).n_bytes == png.length.toLong)
    // non-image payloads fall back to the deterministic fake, keeping totals
    val n3 = "not an image".getBytes("UTF-8").length.toLong
    assert(decoded(3L).width == (n3 % 640 + 1).toInt)
    // driver-side single-payload probe agrees
    assert(graft.llm.Multimodal.imageDecode(png).contains((37, 23, 3)))
    assert(graft.llm.Multimodal.imageDecode(Array[Byte](1, 2, 3)).isEmpty)
    // the resize plan composes with REAL dimensions: 64x48 -> target 32
    val resized = graft.llm.Multimodal.resizePlan(
      Seq((64, 48)).toDF("width", "height"), 32)
      .select("out_w", "out_h", "pad_x", "pad_y")
      .as[(Long, Long, Long, Long)].head()
    assert(resized == ((32L, 24L, 0L, 4L)))
  }

  test("production-ks PQ recall: ks=256 recovers what the toy ks=16 codebook loses") {
    import spark.implicits._
    import graft.llm.{ProductQuant, SimSearch}
    // 2000 deterministic vectors in 20 hash-placed clusters + 5% noise,
    // dim 64 — the clustered geometry real embeddings have; a
    // 16-entry-per-subspace codebook visibly collapses within-cluster
    // neighborhoods while the FAISS-default 256 entries separate them
    // (VERDICT r12 #7: measure the production-codebook recovery, don't
    // argue it)
    val e = spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        // 23 clusters: coprime with the stride-4 codebook seed, so seed
        // points cycle through EVERY cluster (20 would alias to 5 of them)
        ((pmod(xxhash64(pmod(col("id"), lit(23)), i), lit(1000)) / lit(1000.0))
          + (pmod(xxhash64(col("id"), i), lit(1000)) / lit(1000.0)) * lit(0.25))
          .cast("float"))
        .as("embedding")).localCheckpoint()
    val qs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rec = SimSearch.annRecall(qs, e, 5, Seq(
      "pq16" -> ProductQuant.pqTopK(qs, e, 5, centroidStride = 4),
      "pq256" -> ProductQuant.pqTopK(qs, e, 5, ks = 256, centroidStride = 4)))
      .groupBy("method").agg(avg(col("recall")).as("recall"))
      .as[(String, Double)].collect().toMap
    org.apache.spark.sql.graft.Checkpoints.release(e)
    info(s"recall pq16=${rec("pq16")} pq256=${rec("pq256")}")
    // measured on this deterministic fixture: pq16 = 0.200, pq256 = 0.475 —
    // the production codebook at least DOUBLES the toy-ks recall; the
    // real-embeddings 16x point (StressBench ann_recall256, SCALING.md)
    // measures 0.775 vs the toy-ks 0.30-0.43 band
    assert(rec("pq256") >= 2.0 * rec("pq16"),
      s"ks=256 (${rec("pq256")}) must at least double ks=16 (${rec("pq16")})")
    assert(rec("pq256") >= 0.4, s"pq256 recall ${rec("pq256")}")
  }

  test("real audio decode: generated WAV headers read true rate/channels/frames") {
    import spark.implicits._
    def wavBytes(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = Array.fill[Byte](frames * channels * 2)(3)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val wav = wavBytes(16000f, 1, 1600)
    val stereo = wavBytes(44100f, 2, 441)
    val media = Seq(
      graft.llm.Multimodal.MediaRow(1L, wav, "audio/wav"),
      graft.llm.Multimodal.MediaRow(2L, stereo, "audio/wav"),
      graft.llm.Multimodal.MediaRow(3L, "not audio".getBytes("UTF-8"),
        "application/octet-stream")).toDS()
    val got = graft.llm.Multimodal.audioDecodePartitioned(media)
      .collect().map(a => a.doc_id -> a).toMap
    assert(got(1L).sample_rate == 16000.0 && got(1L).channels == 1
      && got(1L).frames == 1600L)
    assert(got(2L).sample_rate == 44100.0 && got(2L).channels == 2
      && got(2L).frames == 441L)
    assert(got(3L).frames == 0L && got(3L).channels == 0)
    assert(graft.llm.Multimodal.audioDecode(wav).contains((16000.0, 1, 1600L)))
  }

  test("tokenBudgetSelect: equals the global take-while cumsum, tie-heavy scores included") {
    import spark.implicits._
    import graft.llm.Sampling
    // dup-heavy scores (the sampling-op test rule): only 5 distinct scores
    // over 200 rows, so boundary buckets ALWAYS take partially
    val rows = (0L until 200L).map(i => (i, (i % 5).toDouble, 7L + i % 3))
    val df = rows.toDF("id", "q", "c")
    def naive(budget: Long): Set[(Long, Double, Long)] = {
      var cum = 0L
      rows.sortBy { case (id, q, _) => (-q, id) }.flatMap { case (id, q, c) =>
        cum += c; if (cum <= budget) Some((id, q, c)) else None
      }.toSet
    }
    for (budget <- Seq(0L, 1L, 100L, 555L, 10000L)) {
      val got = Sampling.tokenBudgetSelect(df, "id", col("q"), col("c"), budget)
        .as[(Long, Double, Long)].collect().toSet
      assert(got == naive(budget), s"budget=$budget")
    }
    // budget >= total selects everything
    assert(Sampling.tokenBudgetSelect(df, "id", col("q"), col("c"), 100000L)
      .count() == 200L)
  }

  test("tokenBudgetSelect: a continuous (unquantized) score fails loudly with remediation") {
    import spark.implicits._
    import graft.llm.Sampling
    // every score distinct -> the bucket relation would degenerate to the
    // corpus row count, the single-partition-sort shape the guard forbids
    val df = (0L until 500L).map(i => (i, i * 0.7919, 5L)).toDF("id", "q", "c")
    val e = intercept[IllegalArgumentException](
      Sampling.tokenBudgetSelect(df, "id", col("q"), col("c"), 1000L,
        maxBuckets = 100L))
    assert(e.getMessage.contains("quantize"), e.getMessage)
    // the same data quantized to its safe regime passes the guard
    assert(Sampling.tokenBudgetSelect(df, "id", round(col("q") / 100, 1),
      col("c"), 1000L, maxBuckets = 100L).count() > 0)
  }

  test("Decontam: n-gram collisions flag partial overlap that exact fingerprints miss") {
    import spark.implicits._
    import graft.llm.Decontam
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "completely unrelated words about spark and tables"),
      // quotes a 5-word benchmark span inside a larger doc — NOT an exact dup
      (2L, "intro text then the quick brown fox jumps and more content here"),
      (3L, "short doc"), // fewer than n tokens: no windows, passes
      (4L, "THE  Quick   brown FOX jumps")) // normalization: case + whitespace
      .toDF("doc_id", "text")
    val hits = Decontam.gramHits(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!hits.contains(1L) && !hits.contains(3L))
    // doc 2: windows "the quick brown fox" + "quick brown fox jumps" collide
    assert(hits(2L)._2 == 2L)
    // doc 4: 5 normalized tokens -> 2 windows, both benchmark spans
    assert(hits(4L) == ((2L, 2L)))
    val clean = Decontam.filterClean(train, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(1L, 3L))
    // maxHits tolerance keeps low-overlap docs
    assert(Decontam.filterClean(train, bench, "doc_id", "text", 4, maxHits = 2L)
      .count() == 4L)
  }

  test("Decontam.gramTrace attributes a planted quote to the right benchmark doc") {
    import spark.implicits._
    import graft.llm.Decontam
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (200L, "pack my box with five dozen liquor jugs today"),
      (300L, "sphinx of black quartz judge my vow now please"))
      .toDF("doc_id", "text")
    val train = Seq(
      // quotes doc 200 heavily (5 windows) and doc 100 lightly (1 window)
      (1L, "opening words pack my box with five dozen liquor jugs then " +
        "the quick brown fox appears briefly"),
      (2L, "no benchmark content at all in this training document"),
      // quotes a doc-300 span (two colliding windows)
      (3L, "prefix sphinx of black quartz judge suffix"))
      .toDF("doc_id", "text")
    val trace = Decontam.gramTrace(train, bench, "doc_id", "text", n = 4, k = 3)
      .as[(Long, Long, Long, Int)].collect()
    val byDoc = trace.groupBy(_._1)
    assert(!byDoc.contains(2L), "clean doc must not appear in the trace")
    // doc 1: rank 1 = the heavier source (200), rank 2 = the light one (100)
    val d1 = byDoc(1L).sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq
    assert(d1 == Seq((200L, 5L, 1), (100L, 1L, 2)),
      s"planted quote must trace to benchmark 200 first, got $d1")
    // doc 3: one matched benchmark (two colliding windows), rank 1
    assert(byDoc(3L).toSeq == Seq((3L, 300L, 2L, 1)),
      s"got ${byDoc(3L).toSeq}")
  }

  test("gram_hashes is callable from SQL text") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    val got = spark.sql("SELECT gram_hashes('abcdefghij', 8) AS g")
      .head().getSeq[Long](0)
    assert(got.length == 3) // 10 bytes, k=8 -> 3 positions
    assert(got.head == "abcdefgh".getBytes("UTF-8")
      .foldLeft(0L)((h, c) => h * 31 + (c & 0xff)))
  }

  test("rolling gram hashes match a direct Horner computation, incl. short/empty") {
    import spark.implicits._
    def direct(s: String, k: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      val ng = math.max(b.length - k + 1, 1)
      (0 until ng).map { i =>
        b.slice(i, math.min(i + k, b.length))
          .foldLeft(0L)((h, c) => h * 31 + (c & 0xff))
      }
    }
    val texts = Seq("", "ab", "exactly8", "a longer text with many grams to roll over",
      "unicode: héllo wörld ✓")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        org.apache.spark.sql.graft.GraftColumns.gramHashes(col("text"), 8).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == direct(t, 8), s"text '$t'")
    }
  }

  test("text stats: token counts, punct, quality bounds") {
    import spark.implicits._
    val df = docs((1L, "Hello, world! 42 times."), (2L, ""))
    val got = df.select(
      TextStats.tokenCount(col("text")).as("t"),
      TextStats.bpeIshTokenCount(col("text")).as("b"),
      TextStats.punctCount(col("text")).as("p"),
      TextStats.qualityScore(col("text")).as("q")).collect()
    assert(got(0).getAs[Int]("t") == 4)
    // Hello , world ! 42 times . -> 7 bpe-ish segments
    assert(got(0).getAs[Int]("b") == 7)
    assert(got(0).getAs[Int]("p") == 3)
    val q1 = got(0).getAs[Double]("q")
    assert(q1 >= 0.0 && q1 <= 1.0)
    assert(got(1).getAs[Int]("t") == 0)
  }

  test("langId picks the stopword-argmax language, und on no hits") {
    import spark.implicits._
    val df = docs(
      (1L, "the cat and the dog in a house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "zzz qqq xxx"))
    val got = df.select(TextStats.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    import spark.implicits._
    val df = docs((1L, "A  B\tC"), (2L, "a b c"), (3L, "a b d"))
    val fps = df.select(TextStats.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("multimodal: payload plumbing and partition-wise decode") {
    import spark.implicits._
    val df = docs((1L, "hello"), (2L, "a longer document body"))
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(df, "text", "doc_id"))
    val m = meta.orderBy("doc_id").select("n_bytes", "width", "height", "channels")
      .as[(Long, Int, Int, Int)].collect()
    assert(m(0) == ((5L, 6, 36, 3)))
    // typed mapPartitions path agrees with the columnar fake
    val ds = Multimodal.withPayload(df, "text", "doc_id")
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decodePartitioned(ds).collect().map(d => d.doc_id -> d).toMap
    assert(decoded(1L).width == 6 && decoded(1L).n_bytes == 5L)
    assert(decoded(2L).channels == 3)
  }

  test("sampleFrames explodes every nth frame index; zero-frame media emits none") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 0L)).toDF("doc_id", "n_frames")
    val got = Multimodal.sampleFrames(df, 3, "n_frames")
      .select("doc_id", "frame_idx").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (1L, 3L), (1L, 6L), (1L, 9L)))
  }

  test("zero-norm embeddings are unrankable in both top-k implementations") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val q = Seq((9L, Array(1.0f, 0.1f))).toDF("query_id", "embedding")
    val viaWindow = SimSearch.bruteForceTopK(q, corpus, 3)
      .select("vec_id").as[Long].collect().toSet
    val viaAgg = SimSearch.bruteForceTopKAgg(q, corpus, 3)
      .select("vec_id").as[Long].collect().toSet
    assert(viaWindow == Set(1L, 3L)) // the zero vector never ranks (or wins)
    assert(viaAgg == viaWindow)
  }

  test("BM25 postings lowercase and carry per-document term frequencies") {
    import spark.implicits._
    val df = docs((1L, "apple banana  Apple"), (2L, "apple"))
    val got = graft.llm.Retrieval.postings(df, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "apple", 2L), (1L, "banana", 1L), (2L, "apple", 1L)))
  }

  test("BM25 ranks higher-tf docs first and only scores candidate docs") {
    import spark.implicits._
    val corpus = docs(
      (1L, "apple banana apple"), // apple tf=2, dl=3
      (2L, "apple cherry date"), // apple tf=1, dl=3
      (3L, "banana banana banana"),
      (4L, "kiwi lime mango"))
    val qs = Seq((0L, "apple"), (1L, "kiwi")).toDF("query_id", "qtext")
    val got = graft.llm.Retrieval.bm25TopK(corpus, "doc_id", "text",
      qs, "query_id", "qtext", k = 10)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val q0 = got.filter(_._1 == 0L).sortBy(_._4)
    // only docs containing "apple" are candidates; tf=2 beats tf=1 at equal dl
    assert(q0.map(_._2).toSeq == Seq(1L, 2L))
    assert(q0.head._3 > q0.last._3)
    val q1 = got.filter(_._1 == 1L)
    assert(q1.map(_._2).toSeq == Seq(4L)) // inverted index: no other doc scored
    // rarer term (df=1) carries more idf than apple (df=2)
    assert(q1.head._3 > q0.head._3)
  }

  test("BM25 empty and out-of-vocabulary queries return no rows, not errors") {
    import spark.implicits._
    val corpus = docs((1L, "alpha beta"), (2L, "gamma delta"))
    val qs = Seq((0L, "   "), (1L, "zzz qqq")).toDF("query_id", "qtext")
    val got = graft.llm.Retrieval.bm25TopK(corpus, "doc_id", "text",
      qs, "query_id", "qtext", k = 5)
    assert(got.count() == 0)
  }

  test("BM25 multi-term query sums contributions; ties pin by doc id") {
    import spark.implicits._
    val corpus = docs(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha gamma"))
    val qs = Seq((0L, "alpha beta")).toDF("query_id", "qtext")
    val got = graft.llm.Retrieval.bm25TopK(corpus, "doc_id", "text",
      qs, "query_id", "qtext", k = 2)
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
      .sortBy(_._3)
    // docs 1 and 2 are identical -> identical scores; doc_id breaks the tie
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 == got(1)._2)
  }

  test("boilerplate: cross-doc repeated grams flagged, unique text not, short docs 0") {
    import spark.implicits._
    // "legal header text here" appears in docs 1-3 (df=3 for its trigrams);
    // each doc's remaining text is unique; doc 4 is all-unique; doc 5 is
    // shorter than the gram width
    val tmpl = "legal header text here"
    val df = docs(
      (1L, s"$tmpl alpha beta gamma"),
      (2L, s"$tmpl delta epsilon zeta"),
      (3L, s"$tmpl eta theta iota"),
      (4L, "kappa lambda mu nu xi omicron"),
      (5L, "pi rho"))
    val got = graft.llm.Boilerplate.boilerplateFraction(df, "text", "doc_id", 3, 3L)
      .select("doc_id", "n_grams", "n_boiler", "boiler_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // 7 tokens -> 5 trigrams; the 2 trigrams inside the template window
    // ("legal header text", "header text here") repeat in 3 docs
    for (id <- 1L to 3L) assert(got(id) == (id, 5L, 2L, 0.4))
    assert(got(4L) == (4L, 4L, 0L, 0.0))
    assert(got(5L) == (5L, 0L, 0L, 0.0))
  }

  test("boilerplate: within-doc repetition alone never reaches minDf") {
    import spark.implicits._
    // doc 1 repeats its own trigram 5 times, but df counts DISTINCT docs
    val df = docs(
      (1L, "spam spam spam spam spam spam spam"),
      (2L, "unrelated words entirely different tokens"))
    val got = graft.llm.Boilerplate.boilerplateFraction(df, "text", "doc_id", 3, 2L)
      .select("doc_id", "n_boiler").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  test("semantic pairs: within-cell only, cosine-verified, subset of brute force") {
    import spark.implicits._
    // two tight clusters on opposite axes + one outlier; stride-2 seeding
    // puts centroids near both clusters
    val rows = Seq(
      (0L, Array(1.0, 0.05, 0.0, 0.0)), (1L, Array(1.0, 0.0, 0.05, 0.0)),
      (2L, Array(0.0, 0.05, 0.0, 1.0)), (3L, Array(0.0, 0.0, 0.05, 1.0)),
      (4L, Array(0.5, -0.9, 0.0, 0.1)))
    val emb = rows.toDF("vec_id", "embedding")
    val cents = SimSearch.seedCentroids(emb, 2)
    val pairs = Dedup.semanticPairs(emb, cents, "embedding", "vec_id", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
    val comp = Dedup.semanticComponents(emb, cents, "embedding", "vec_id", 0.9)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("semantic dedup: zero-norm vectors get no cell and stay singletons") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.99, 0.01)),
      (7L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    val cents = SimSearch.seedCentroids(emb.filter(col("vec_id") === 0L), 1)
    val comp = Dedup.semanticComponents(emb, cents, "embedding", "vec_id", 0.5)
      .as[(Long, Long)].collect().toMap
    // the zero vector can never appear in a pair, but still gets a label
    assert(comp == Map(0L -> 0L, 1L -> 0L, 7L -> 7L))
  }

  test("incremental exact dedup: corpus dups die, within-batch dups keep min id") {
    import spark.implicits._
    val corpus = docs((1L, "seen before"), (2L, "also seen"))
    val fps = Dedup.exact(corpus, "text", "doc_id").select("fp")
    val batch = docs(
      (10L, "Seen  Before"),        // normalizes to a corpus fp -> dies
      (11L, "brand new text"),      // fresh -> survives
      (12L, "brand NEW   text"),    // within-batch dup of 11 -> dies (min id wins)
      (13L, "another fresh one"))
    val got = Dedup.exactIncremental(fps, batch, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L))
  }

  test("cross-corpus minhash equals the union self-join restricted to cross pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val a = (1L to 15L).map(i => (i, (1 to 25).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")))
    // batch: 5 near-copies of corpus docs (tail token appended) + 5 fresh
    val b = (1L to 5L).map(i => (100L + i, a(i.toInt - 1)._2 + " tail")) ++
      (6L to 10L).map(i => (100L + i, (1 to 25).map(_ => s"x${rnd.nextInt(30)}").mkString(" ")))
    val (dfA, dfB) = (docs(a: _*), docs(b: _*))
    val cross = Dedup.minhashPairsCross(dfA, dfB, "text", "doc_id", 3, 16, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val viaUnion = Dedup.minhashPairs(dfA.unionByName(dfB), "text", "doc_id", 3, 16, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 <= 15L && p._2 > 100L)
    assert(cross == viaUnion)
    assert(cross.nonEmpty, "planted near-copies should collide")
  }

  test("quality model: rational sigmoid bounds, monotone in length, empty doc defined") {
    import spark.implicits._
    val df = docs(
      (1L, ""),
      (2L, "short"),
      (3L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (4L, (1 to 120).map(i => s"w$i").mkString(" ")),
      (5L, "!!! ??? ;;; ::: !!!"))
    val toks = df.select(col("doc_id"), col("text"),
      TextStats.tokens(lower(col("text"))).as("toks"))
    val got = toks.select(col("doc_id"),
        graft.llm.QualityModel.scoreFromTokens(col("text"), col("toks")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(4L) > got(3L) && got(3L) > got(2L), s"length should up-weight: $got")
    assert(got(5L) < got(3L), s"punctuation should down-weight: $got")
  }

  test("shard assignment: full coverage, contiguous per-shard seq, deterministic") {
    import spark.implicits._
    val df = (1L to 500L).toDF("doc_id").withColumn("n_tokens", col("doc_id") % 37 + 1)
    val a = graft.llm.Shard.assignShards(df, "doc_id", 8)
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)].collect()
    assert(a.length == 500 && a.map(_._1).toSet.size == 500)
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    // seq is exactly 1..count within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val b = graft.llm.Shard.assignShards(df, "doc_id", 8)
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // manifest totals reconcile with the doc-level input
    val m = graft.llm.Shard.shardManifest(df, "doc_id", 8, "n_tokens")
      .as[(Long, Long, Long)].collect()
    assert(m.map(_._2).sum == 500L)
    assert(m.map(_._3).sum == (1L to 500L).map(_ % 37 + 1).sum)
  }

  test("DSIR importance: target-like docs outweigh off-target, grams counted per occurrence") {
    import spark.implicits._
    // target slice speaks "alpha beta"; the raw remainder speaks "gamma
    // delta". A held-out doc in target language must outscore one in raw
    // language — the DSIR resampling contract.
    val docs = (
      (1L to 10L).map(i => (i, "alpha beta alpha beta alpha", true)) ++
        (11L to 30L).map(i => (i, "gamma delta gamma delta gamma", false)) ++
        Seq((31L, "alpha beta alpha", false), (32L, "gamma delta gamma", false))
      ).toDF("doc_id", "text", "is_t")
    val w = graft.llm.Importance
      .importanceWeights(docs, "doc_id", "text", isTarget = col("is_t"),
        nBuckets = 64, shingleN = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w.size == 32)
    assert(w(31L)._1 == 2L && w(32L)._1 == 2L) // 3 tokens -> 2 bigram occurrences
    assert(w(31L)._2 > w(32L)._2,
      s"target-language ${w(31L)._2} should beat raw-language ${w(32L)._2}")
    assert(w(1L)._1 == 4L) // occurrences, not distinct grams (2 distinct, 4 slots)
    // short doc (< shingleN words) still scored, as its whole text
    val short = graft.llm.Importance.importanceWeights(
      Seq((1L, "solo", true), (2L, "", false)).toDF("doc_id", "text", "is_t"),
      "doc_id", "text", isTarget = col("is_t"), nBuckets = 16, shingleN = 2)
      .as[(Long, Long, Double)].collect()
    assert(short.length == 2 && short.forall(_._2 == 1L))
  }

  test("BPE train: textbook merge order, early stop, words fully fused") {
    import spark.implicits._
    // pair mass: (a,a)=6 beats (a,b)=5, then (a,b), then (aa,ab) fuses the
    // whole word — and round 4 finds nothing left to merge
    val docs = Seq("aaab aaab aaab ab ab").toDF("text")
    val (merges, words) = graft.llm.BpeTrain.train(docs, "text", rounds = 5)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val sym = words.select(col("word"), col("sym"))
      .as[(String, Seq[String])].collect().toMap
    assert(sym("aaab") == Seq("aaab") && sym("ab") == Seq("ab"))
  }

  test("BPE encode reproduces train's final segmentation on the same corpus") {
    import spark.implicits._
    val docs = Seq("low low low lower lower newest newest newest widest widest")
      .toDF("text")
    val (merges, trained) = graft.llm.BpeTrain.train(docs, "text", rounds = 6)
    val enc = graft.llm.BpeTrain.encodeWords(
      graft.llm.BpeTrain.wordFreqs(docs, "text"), merges)
    val a = trained.select("word", "sym").as[(String, Seq[String])].collect().toMap
    val b = enc.select("word", "sym").as[(String, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("BPE encode segments UNSEEN words with trained merges") {
    import spark.implicits._
    // (e,s)=5 ties (s,t)=5, 'e s' < 's t' pins merge1=(e,s); then (es,t)=5
    // wins round 2 -> 'est' is a learned subword
    val docs = Seq("newest newest newest widest widest").toDF("text")
    val (merges, _) = graft.llm.BpeTrain.train(docs, "text", rounds = 2)
    assert(merges == Seq(("e", "s"), ("es", "t")))
    val unseen = Seq(("fastest", 1L)).toDF("word", "f")
    val sym = graft.llm.BpeTrain.encodeWords(unseen, merges)
      .select("sym").as[Seq[String]].head()
    assert(sym == Seq("f", "a", "s", "t", "est"))
  }

  test("BPE encodeCorpus: per-doc token counts over the broadcast vocab") {
    import spark.implicits._
    val docs = Seq((1L, "aaab ab"), (2L, "ab ab ab")).toDF("doc_id", "text")
    val (merges, _) = graft.llm.BpeTrain.train(docs, "text", rounds = 2)
    // merges: (a,b)=5 beats (a,a)=2... then (a,ab) vs others — whatever the
    // order, encode must agree with train; assert counts via the fused forms
    val got = graft.llm.BpeTrain.encodeCorpus(docs, "text", "doc_id", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val trained = graft.llm.BpeTrain.train(docs, "text", rounds = 2)._2
      .select(col("word"), size(col("sym")).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got(1L) == ((2L, trained("aaab") + trained("ab"))))
    assert(got(2L) == ((3L, 3 * trained("ab"))))
  }

  test("BPE applyMerge is greedy left-to-right non-overlapping") {
    import spark.implicits._
    val df = Seq((Seq("a", "a", "a"), 0)).toDF("sym", "x")
    assert(df.select(graft.llm.BpeTrain.applyMerge(col("sym"), "a", "a"))
      .as[Seq[String]].head() == Seq("aa", "a"))
    val df2 = Seq((Seq("a", "b", "a", "b"), 0)).toDF("sym", "x")
    assert(df2.select(graft.llm.BpeTrain.applyMerge(col("sym"), "a", "b"))
      .as[Seq[String]].head() == Seq("ab", "ab"))
    // merged symbol does not cascade within the same round
    val df3 = Seq((Seq("a", "a", "b"), 0)).toDF("sym", "x")
    assert(df3.select(graft.llm.BpeTrain.applyMerge(col("sym"), "a", "b"))
      .as[Seq[String]].head() == Seq("a", "ab"))
  }

  test("char entropy: zero for constant, ln k for uniform, empty dropped") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "   ")).toDF("doc_id", "text")
    val r = graft.llm.TextStats.charEntropyProfile(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(r.size == 2, "whitespace-only doc must be dropped")
    assert(r(1L) == ((1L, 4L, 1L, 0.0)))
    assert(r(2L)._2 == 4L && r(2L)._3 == 4L)
    assert(math.abs(r(2L)._4 - math.log(4)) < 1e-5, s"uniform: ${r(2L)._4}")
  }

  test("char entropy: native expression == relational reference, bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefg 0123.!?éüñ語漢字🙂" // multi-byte + non-BMP included
    val cps = alphabet.codePoints().toArray
    val docs = (1L to 120L).map { i =>
      val n = rnd.nextInt(400)
      val sb = new java.lang.StringBuilder()
      (1 to n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      (i, sb.toString)
    }.toDF("doc_id", "text")
    val native = graft.llm.TextStats.charEntropyProfile(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val rel = graft.llm.TextStats.charEntropyProfileRelational(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // exact equality on the doubles: same round()-chain, same values
    assert(native == rel,
      s"first diff: ${native.zip(rel).find { case (a, b) => a != b }}")
  }

  test("FIM transform: spans partition the doc, PSM sentinels, deterministic") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, (1 to (i % 7).toInt + 1).map(k => s"w$k").mkString(" "))).toDF("doc_id", "text")
    val out = graft.llm.Fim.fimTransform(docs, "doc_id", "text", rate = 0.5)
    val rows = out.as[(Long, Boolean, Long, Long, Long, String)].collect()
    assert(rows.length == 200)
    val applied = rows.filter(_._2)
    assert(applied.nonEmpty && applied.length < 200, "rate 0.5 must split the corpus")
    rows.foreach { case (id, app, np, nm, ns, txt) =>
      val n = (id % 7) + 1
      assert(np + nm + ns == n, s"spans must partition doc $id")
      if (app) {
        // PSM order, and the three spans reassemble the original tokens
        val m = "<PRE>(.*)<SUF>(.*)<MID>(.*)".r
        val m(p, sfx, mid) = txt
        val rebuilt = Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == (1 to n.toInt).map(k => s"w$k").mkString(" "), s"doc $id: $txt")
      } else assert(!txt.contains("<PRE>"))
    }
    // same cuts on every run
    val again = graft.llm.Fim.fimTransform(docs, "doc_id", "text", rate = 0.5)
      .as[(Long, Boolean, Long, Long, Long, String)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("phrase search: consecutive tokens only, overlaps counted, 1-based positions") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "a b a"), (3L, "b b")).toDF("doc_id", "text")
    val ph = Seq(("q1", "a a"), ("q2", "a b a"), ("q3", "nope never")).toDF("pid", "pt")
    val r = graft.llm.Retrieval.phraseMatches(docs, "doc_id", "text", ph, "pid", "pt")
      .as[(String, Long, Long, Long)].collect().toSet
    // q1 hits doc 1 at positions 1 and 2 (overlap counts); doc 2's "a b a"
    // has no CONSECUTIVE "a a"; q2 is a full-doc 3-gram; q3 matches nothing
    assert(r == Set(("q1", 1L, 2L, 1L), ("q2", 2L, 1L, 1L)), s"$r")
    spark.catalog.clearCache()
  }

  test("contiguous block layout: per-shard streams, EOD slots, straddles marked") {
    import spark.implicits._
    val shd = Seq((1L, 0L, 1L, 10L), (2L, 0L, 2L, 250L), (3L, 0L, 3L, 5L),
      (4L, 1L, 1L, 300L)).toDF("doc_id", "shard", "seq", "n_tok")
    val r = graft.llm.Packing
      .contiguousBlocks(shd, "doc_id", "n_tok", blockSize = 256, eodTokens = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 0L, 1L, 0L, 10L, 0L, 0L)))
    assert(r(2L) == ((2L, 0L, 2L, 11L, 261L, 0L, 1L)))  // straddles the cut
    assert(r(3L) == ((3L, 0L, 3L, 262L, 267L, 1L, 1L)))
    assert(r(4L) == ((4L, 1L, 1L, 0L, 300L, 0L, 1L)))   // shard 1 restarts at 0
    // streams are gapless: tok_start == previous tok_end + 1 within a shard
    val s0 = Seq(r(1L), r(2L), r(3L))
    s0.sliding(2).foreach { case Seq(a, b) => assert(b._4 == a._5 + 1) }
  }

  test("A-ES weighted sample: without replacement, weight-monotone, zero-weight excluded") {
    import spark.implicits._
    val docs = ((1L to 100L).map(i => (i, "s", 1L)) ++
      Seq((999L, "s", 1000000000L), (1000L, "s", 0L))).toDF("doc_id", "source", "w")
    val r = graft.llm.Sampling.weightedSampleK(docs, "source", col("doc_id"), col("w"), k = 10)
      .select("doc_id", "draw").as[(Long, Long)].collect()
    assert(r.length == 10 && r.map(_._1).distinct.length == 10)
    assert(r.map(_._2).sorted.toSeq == (1L to 10L), "draw must be 1..k")
    // ln(u)/1e9 ~ 0 dominates every weight-1 key (ln(u) <= ~ -1e-6 wins only
    // if u > 1 - 1e-15 for ALL 100 others — not at these hash values)
    assert(r.exists(_._1 == 999L), s"heavy doc missing from ${r.toSeq}")
    assert(!r.exists(_._1 == 1000L), "zero-weight doc must be unsampleable")
    // deterministic replay
    val again = graft.llm.Sampling.weightedSampleK(docs, "source", col("doc_id"), col("w"), k = 10)
      .select("doc_id", "draw").as[(Long, Long)].collect()
    assert(r.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("resize plan: aspect preserved round-half-up, 1px floor, centered pads") {
    import spark.implicits._
    val dims = Seq((1L, 640, 480), (2L, 480, 640), (3L, 224, 224),
      (4L, 10000, 1), (5L, 3, 2)).toDF("doc_id", "width", "height")
    val r = graft.llm.Multimodal.resizePlan(dims, target = 224)
      .select("doc_id", "out_w", "out_h", "pad_x", "pad_y")
      .as[(Long, Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 224L, 168L, 0L, 28L)))   // 480/640*224 = 168 exact
    assert(r(2L) == ((2L, 168L, 224L, 28L, 0L)))   // transposed
    assert(r(3L) == ((3L, 224L, 224L, 0L, 0L)))    // square fills the canvas
    assert(r(4L)._3 == 1L, "short side floors at 1px")  // 1/10000*224 -> 0 -> 1
    // 2/3*224 = 149.33 -> 149 (round half up of .33 is down)
    assert(r(5L) == ((5L, 224L, 149L, 0L, 37L)), s"${r(5L)}")
  }

  test("quantile normalization maps shifted sources onto one scale") {
    import spark.implicits._
    // A scores {1,2,3,4}, B scores {10,20,30,40}: equal within-source ranks
    // must calibrate to the SAME global value — that's the whole point
    val docs = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (11L, "B", 10L), (12L, "B", 20L), (13L, "B", 30L), (14L, "B", 40L))
      .toDF("doc_id", "source", "score")
    val r = graft.llm.Sampling
      .quantileNormalize(docs, "source", col("score"), col("doc_id"))
      .select("doc_id", "pr", "calib")
      .as[(Long, Double, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r.size == 8)
    (1L to 4L).foreach { i =>
      assert(r(i) == r(i + 10), s"rank-equal rows must calibrate equal: $i")
    }
    assert(r(1L) == ((0.0, 1L)))            // pr 0 -> global min
    assert(r(2L)._2 == 3L, s"${r(2L)}")     // pr 1/3 -> first cdf >= 1/3 is 3/8
    assert(r(4L) == ((1.0, 40L)))           // pr 1 -> global max
  }

  test("mean quantile normalization: shifted sources land on the mean scale") {
    import spark.implicits._
    // A = {1,2,3,4}, B = A + 100: textbook target is the per-rank MEAN of
    // the two inverse CDFs — rank-equal rows calibrate identically, onto
    // (A_q + B_q) / 2, not onto the pooled global distribution
    val docs = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (11L, "B", 101L), (12L, "B", 102L), (13L, "B", 103L), (14L, "B", 104L))
      .toDF("doc_id", "source", "score")
    val r = graft.llm.Sampling
      .quantileNormalizeMean(docs, "source", col("score"), col("doc_id"))
      .select("doc_id", "pr", "calib")
      .as[(Long, Double, Double)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r.size == 8)
    (1L to 4L).foreach { i =>
      assert(r(i) == r(i + 10), s"rank-equal rows must calibrate equal: $i")
      assert(r(i)._2 == (i + (100 + i)) / 2.0, s"mean of the rank-i quantiles: ${r(i)}")
    }
    // internal ordering preserved within each source
    assert((1L to 3L).forall(i => r(i)._2 < r(i + 1)._2))
  }

  test("mean quantile normalization tolerates an empty input frame") {
    import spark.implicits._
    // max-over-zero-rows used to NPE in the per-source guard (ADVICE r08);
    // the driver-side guard must treat an empty bucket relation as 0
    val docs = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "score")
    val r = graft.llm.Sampling
      .quantileNormalizeMean(docs, "source", col("score"), col("doc_id"))
    assert(r.count() == 0)
  }

  test("mean quantile normalization guards the TOTAL bucket union, not just the worst source") {
    import spark.implicits._
    // 5 sources x 10 distinct scores: every per-source relation is under
    // maxBuckets, but the union exceeds maxTotalBuckets — the broadcast-side
    // bound (ADVICE r08) must reject it loudly
    val docs = (1L to 50L).map(i => (i, s"s${i % 5}", (i / 5) * 7L))
      .toDF("doc_id", "source", "score")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Sampling.quantileNormalizeMean(docs, "source", col("score"),
        col("doc_id"), maxBuckets = 100L, maxTotalBuckets = 20L)
    }
    assert(e.getMessage.contains("maxTotalBuckets"))
  }

  test("mean quantile normalization fails fast on an unbounded score") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, "A", i * 7L)).toDF("doc_id", "source", "score")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Sampling.quantileNormalizeMean(docs, "source", col("score"),
        col("doc_id"), maxBuckets = 10L)
    }
    assert(e.getMessage.contains("quantize"))
  }

  test("quantile normalization fails fast on an unbounded continuous score") {
    import spark.implicits._
    // every score distinct: the inverse-CDF bucket relation is corpus-sized,
    // which would silently sort the whole dataset on ONE partition — the
    // maxBuckets guard must reject it loudly (VERDICT r06 #4)
    val docs = (1L to 50L).map(i => (i, "A", i * 7L)).toDF("doc_id", "source", "score")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Sampling.quantileNormalize(docs, "source", col("score"),
        col("doc_id"), maxBuckets = 10L)
    }
    assert(e.getMessage.contains("quantize"))
    // the quantize-first rule the error message prescribes: rounding the
    // score under the cap makes the same call go through
    val ok = graft.llm.Sampling.quantileNormalize(
      docs.withColumn("score", (col("score") / 100).cast("long")),
      "source", col("score"), col("doc_id"), maxBuckets = 10L)
    assert(ok.count() == 50)
  }

  test("temperature mixture: sqrt-flattened rates upweight tail sources") {
    import spark.implicits._
    val docs = ((1L to 100L).map(i => (i, "head")) ++
      (101L to 104L).map(i => (i, "tail"))).toDF("doc_id", "source")
    val r = graft.llm.Sampling.temperatureRatesSqrt(docs, "source", targetRows = 10L)
      .as[(String, Long, Double)].collect().map(x => x._1 -> x).toMap
    // sq = {10, 2}, denom = 12: head keeps 10*(10/12)/100, tail 10*(2/12)/4
    assert(math.abs(r("head")._3 - 10.0 * (10.0 / 12.0) / 100.0) < 1e-12)
    assert(math.abs(r("tail")._3 - 10.0 * (2.0 / 12.0) / 4.0) < 1e-12)
    // flattening: tail's keep-rate exceeds head's (proportional would tie)
    assert(r("tail")._3 > r("head")._3)
    // a stratum bigger than target^2 still caps at rate 1 (least clamp)
    val tiny = Seq((1L, "x")).toDF("doc_id", "source")
    val rt = graft.llm.Sampling.temperatureRatesSqrt(tiny, "source", 10L)
      .as[(String, Long, Double)].head()
    assert(rt._3 == 1.0)
  }

  test("BPE topMerges pins ties by pair text") {
    import spark.implicits._
    val words = Seq(("ba", 2L), ("ab", 2L)).toDF("word", "f")
    val top = graft.llm.BpeTrain.topMerges(
      graft.llm.BpeTrain.pairCounts(graft.llm.BpeTrain.charSymbols(words)), 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(top == Seq(("a b", 2L, 1L), ("b a", 2L, 2L)))
  }

  test("paragraph dedup keeps first corpus occurrence, rewrites docs in order") {
    import spark.implicits._
    val df = docs(
      (1L, "alpha one\n\nshared footer\n\nalpha two"),
      (2L, "beta one\n\nshared footer\n\nbeta two"),
      (3L, "shared footer"),                    // loses everything
      (4L, "gamma\n\ngamma\n\n  \n\ngamma"))    // intra-doc dups + blank para
    val got = graft.llm.ParagraphDedup.dedup(df, "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map { case (k, v2, v3, v4, v5) => k -> ((v2, v3, v4, v5)) }.toMap
    assert(got(1L) == (("alpha one\n\nshared footer\n\nalpha two", 3L, 3L, 0L)))
    assert(got(2L) == (("beta one\n\nbeta two", 3L, 2L, 1L)))
    assert(got(3L) == (("", 1L, 0L, 1L)))
    // blank paragraph not counted; duplicates within one doc collapse too
    assert(got(4L) == (("gamma", 3L, 1L, 2L)))
  }

  test("pq: codes are m-per-vector; ADC retrieves the planted cluster first") {
    import spark.implicits._
    // two well-separated clusters in 8-d (m=2 subspaces x 4 dims): ids 0-9
    // near the origin, ids 10-19 near 10.0 — PQ distances are approximate
    // but cluster-level separation must survive quantization
    val corpus = (0L until 20L).map { i =>
      val base = if (i < 10) 0.0f else 10.0f
      (i, Array.tabulate(8)(j => base + 0.01f * i + 0.001f * j))
    }.toDF("vec_id", "embedding")
    val cb = graft.llm.ProductQuant.trainCodebooks(
      corpus, m = 2, dims = 4, centroidStride = 7, iters = 2)
    val codes = graft.llm.ProductQuant.encode(corpus, cb, m = 2, dims = 4)
    val perVec = codes.groupBy("vec_id").count().as[(Long, Long)].collect().toMap
    assert(perVec.size == 20 && perVec.values.forall(_ == 2L))
    val queries = corpus.filter(col("vec_id") === 0L || col("vec_id") === 15L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = graft.llm.ProductQuant.adcTopK(
      queries, codes, cb, k = 8, m = 2, dims = 4)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = top.groupBy(_._1)
    // every retrieved neighbor of a query is from the query's own cluster
    assert(byQ(0L).forall(_._2 < 10L))
    assert(byQ(15L).forall(_._2 >= 10L))
    // adc is non-decreasing in rank
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.sliding(2).forall(p => p.head._3 <= p.last._3))
    }
  }

  test("ivfpq: coarse probe keeps recall on separated clusters; adc order matches pq") {
    import spark.implicits._
    val corpus = (0L until 40L).map { i =>
      val base = if (i < 20) 0.0f else 10.0f
      (i, Array.tabulate(8)(j => base + 0.01f * i + 0.001f * j))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L || col("vec_id") === 30L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = graft.llm.ProductQuant.ivfPqTopK(
      queries, corpus, k = 5, m = 2, dims = 4, centroidStride = 10,
      trainIters = 2, ks = 4, coarseKs = 4, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = got.groupBy(_._1)
    // with nprobe=1 each query sees only its own cluster's cell(s)
    assert(byQ(1L).nonEmpty && byQ(1L).forall(_._2 < 20L))
    assert(byQ(30L).nonEmpty && byQ(30L).forall(_._2 >= 20L))
    // the pruned search never reorders: its ranking is the full-PQ ranking
    // restricted to the surviving candidate set
    val full = graft.llm.ProductQuant.pqTopK(
      queries, corpus, k = 40, m = 2, dims = 4, centroidStride = 10,
      trainIters = 2, ks = 4)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (q, v, adc, _) => assert(full((q, v)) == adc) }
  }

  test("unigram lm: em promotes whole-word pieces; encode segments with the model") {
    import spark.implicits._
    val corpus = docs((1L, "abab abab abab cd"))
    val model = graft.llm.UnigramLm.train(corpus, "text",
      vocabSize = 6, maxPieceLen = 4, iters = 2)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    // seed keeps all multi-char pieces {ab, abab, aba, bab, ba, cd} + chars;
    // round 1 segments "abab" as the single piece (one log beats any split's
    // two) and "cd" likewise, so EM collapses the vocab to the two whole
    // words — every other piece wins no occurrence and drops
    assert(model.map(_._1).toSeq == Seq("abab", "cd"))
    val byPiece = model.map(m => m._1 -> m).toMap
    assert(byPiece("abab")._2 == 3L && byPiece("cd")._2 == 1L)
    assert(byPiece("abab")._3 == BigDecimal(math.log(3.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // corpus encode under the trained model: 4 words, 4 pieces
    val enc = graft.llm.UnigramLm.encodeCorpus(
      corpus, "doc_id", "text",
      graft.llm.UnigramLm.train(corpus, "text", 6, 4, 2))
      .as[(Long, Long, Long)].collect()
    assert(enc.toSeq == Seq((1L, 4L, 4L)))
  }

  test("incremental ann: batch append equals full encode; appended vectors retrievable") {
    import spark.implicits._
    def mk(r: Range, base: Double) = r.map { i =>
      (i.toLong, Array.tabulate(8)(j => base.toFloat + 0.01f * i + 0.001f * j))
    }
    // base: two clusters; the new batch adds vectors to BOTH clusters
    val base = (mk(0 until 18, 0.0) ++ mk(20 until 38, 10.0)).toDF("vec_id", "embedding")
    val batch = (mk(18 until 20, 0.0) ++ mk(38 until 40, 10.0)).toDF("vec_id", "embedding")
    val coarse = graft.llm.ProductQuant.trainCodebooks(
      base, m = 1, dims = 8, centroidStride = 10, iters = 2, ks = 4)
    val cb = graft.llm.ProductQuant.trainCodebooks(
      base, m = 2, dims = 4, centroidStride = 10, iters = 2, ks = 4)
    // the appended index is row-identical to encoding base ∪ batch wholesale
    // against the same frozen codebooks — append is exact, not approximate
    val inc = graft.llm.ProductQuant.encodeBatch(base, coarse, cb, m = 2, dims = 4)
      .unionByName(graft.llm.ProductQuant.encodeBatch(batch, coarse, cb, m = 2, dims = 4))
    val whole = graft.llm.ProductQuant.encodeBatch(
      base.unionByName(batch), coarse, cb, m = 2, dims = 4)
    assert(inc.exceptAll(whole).isEmpty && whole.exceptAll(inc).isEmpty)
    // batch vectors are retrievable through the appended index (nprobe=2
    // covers both cluster-0 cells from the 4-entry coarse book)
    val queries = base.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = graft.llm.ProductQuant.ivfPqSearch(queries, inc, coarse, cb,
      k = 25, m = 2, dims = 4, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect()
    val ids = got.map(_._2).toSet
    assert(ids.contains(18L) && ids.contains(19L))
    assert(got.forall(_._2 < 20L))
  }

  test("ann delete-maintenance: masked neighbor vanishes from top-k, survivors keep exact ranks") {
    import spark.implicits._
    import graft.sources.ManifestTable
    import graft.llm.ProductQuant
    import org.apache.spark.sql.types._
    // two clusters; vec 1 is the PLANTED nearest neighbor of query vec 0
    def mk(r: Range, base: Double) = r.map { i =>
      (i.toLong, Array.tabulate(8)(j => base.toFloat + 0.01f * i + 0.001f * j))
    }
    val corpus = (mk(0 until 20, 0.0) ++ mk(20 until 40, 10.0)).toDF("vec_id", "embedding")
    val embSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val root = java.nio.file.Files.createTempDirectory("adm").toString + "/corpus"
    ManifestTable.commit(corpus, root, None)
    val coarse = ProductQuant.trainCodebooks(corpus, m = 1, dims = 8,
      centroidStride = 10, iters = 2, ks = 4)
    val cb = ProductQuant.trainCodebooks(corpus, m = 2, dims = 4,
      centroidStride = 10, iters = 2, ks = 4)
    val index = ProductQuant.encodeBatch(corpus, coarse, cb, m = 2, dims = 4)
      .localCheckpoint()
    val builtAt = ManifestTable.currentVersion(spark, root).get
    val queries = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def search(idx: org.apache.spark.sql.DataFrame) =
      ProductQuant.ivfPqSearch(queries, idx, coarse, cb,
        k = 5, m = 2, dims = 4, nprobe = 2)
        .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    val before = search(index)
    assert(before.map(_._2).contains(1L), s"planted neighbor must rank pre-delete: ${before.toSeq}")
    // DELETE the planted neighbor (plus a far-cluster row) -> the index
    // must stop serving both via the deletedKeysSince anti-join
    ManifestTable.deleteWhere(spark, root, embSchema,
      col("vec_id") === 1L || col("vec_id") === 25L)
    val dead = ManifestTable.deletedKeysSince(spark, root, embSchema,
      Seq("vec_id"), builtAt)
    assert(dead.as[Long].collect().toSet == Set(1L, 25L))
    val after = search(index.join(broadcast(dead), Seq("vec_id"), "left_anti"))
    assert(!after.map(_._2).contains(1L) && !after.map(_._2).contains(25L))
    // survivors keep their exact relative order and ADC scores: the
    // maintained result equals the unmaintained one with dead rows dropped
    // and ranks recomputed
    val expect = before.filter(r => r._2 != 1L && r._2 != 25L).map(r => (r._2, r._3))
    assert(after.map(r => (r._2, r._3)).startsWith(expect),
      s"survivor ranking drifted: before=${before.toSeq} after=${after.toSeq}")
    // a no-op window (index head == corpus head) yields an empty feed
    assert(ManifestTable.deletedKeysSince(spark, root, embSchema, Seq("vec_id"),
      ManifestTable.currentVersion(spark, root).get).isEmpty)
  }

  test("sq8: codes bounded, degenerate dims safe, cluster ranking survives quantization") {
    import spark.implicits._
    // dim 7 is CONSTANT (degenerate: mx == mn) — codes to 0, reconstructs mn
    val corpus = (0L until 20L).map { i =>
      val base = if (i < 10) 0.0f else 10.0f
      (i, Array.tabulate(8)(j => if (j == 7) 1.5f else base + 0.01f * i + 0.001f * j))
    }.toDF("vec_id", "embedding")
    val stats = graft.llm.ScalarQuant.trainStats(corpus)
    val codes = graft.llm.ScalarQuant.encode(corpus, stats)
    val flat = codes.select(explode(col("codes")).as("c")).as[Int].collect()
    assert(flat.forall(c => c >= 0 && c <= 255))
    val got = graft.llm.ScalarQuant.topK(
      corpus.filter(col("vec_id") === 0L || col("vec_id") === 15L)
        .select(col("vec_id").as("query_id"), col("embedding")),
      codes, stats, k = 8)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = got.groupBy(_._1)
    // near-exact recall: every neighbor comes from the query's own cluster
    // and distances are non-decreasing in rank
    assert(byQ(0L).forall(_._2 < 10L) && byQ(15L).forall(_._2 >= 10L))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.sliding(2).forall(p => p.head._3 <= p.last._3))
    }
  }

  test("ivf+sq8: cluster recall through probes; probing all cells equals the flat scan") {
    import spark.implicits._
    def mk(r: Range, base: Double) = r.map { i =>
      (i.toLong, Array.tabulate(8)(j => base.toFloat + 0.01f * i + 0.001f * j))
    }
    val corpus = (mk(0 until 20, 0.0) ++ mk(20 until 40, 10.0)).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L || col("vec_id") === 35L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = graft.llm.ScalarQuant.ivfSq8TopK(queries, corpus, k = 10, d = 8,
      centroidStride = 10, trainIters = 2, coarseKs = 4, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = got.groupBy(_._1)
    // every neighbor comes from the query's own cluster (the probed cells
    // cover it), k is satisfied, and distances are non-decreasing in rank
    assert(byQ(0L).length == 10 && byQ(0L).forall(_._2 < 20L))
    assert(byQ(35L).length == 10 && byQ(35L).forall(_._2 >= 20L))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.sliding(2).forall(p => p.head._3 <= p.last._3))
    }
    // probing EVERY cell removes the IVF pruning: results must equal the
    // flat SQ8 scan row-for-row (same codes, same recon, same tie pins)
    val all = graft.llm.ScalarQuant.ivfSq8TopK(queries, corpus, k = 10, d = 8,
      centroidStride = 10, trainIters = 2, coarseKs = 4, nprobe = 4)
    val flat = graft.llm.ScalarQuant.sq8TopK(queries, corpus, k = 10)
    assert(all.exceptAll(flat).isEmpty && flat.exceptAll(all).isEmpty)
  }

  test("hash embeddings: dims exact, copies coincide at distance 0, disjoint texts do not") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark join hash shuffle"),
      (1L, "spark join hash shuffle"),      // verbatim copy → identical vector
      (2L, "totally different words here"),
      (3L, "   ")                           // tokenless → no vector at all
    ).toDF("doc_id", "text")
    val emb = graft.llm.HashEmbed.docEmbeddings(docs, "doc_id", "text", 64)
      .as[(Long, Array[Double])].collect().toMap
    assert(emb.keySet == Set(0L, 1L, 2L))
    assert(emb.values.forall(_.length == 64))
    assert(emb(0L).sameElements(emb(1L)), "copies must embed identically")
    assert(!emb(0L).sameElements(emb(2L)))
    // nonzero: md5 components make an all-zero 64-dim sum essentially impossible
    assert(emb(0L).exists(_ != 0.0))
    // dims must be a multiple of the per-digest component count
    val ex = intercept[IllegalArgumentException] {
      graft.llm.HashEmbed.docEmbeddings(docs, "doc_id", "text", 12)
    }
    assert(ex.getMessage.contains("multiple of 8"))
  }

  test("tfidf similar: verbatim copy ranks first at cosine 1, disjoint docs never pair") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark join hash shuffle"),
      (1L, "spark join hash shuffle"),      // verbatim copy of the query doc
      (2L, "spark join sort merge window"), // partial overlap
      (3L, "totally different words here"), // no shared term
      (4L, "hash spark")                    // overlap, different norm
    ).toDF("doc_id", "text")
    val got = graft.llm.Retrieval.tfIdfSimilar(docs, "doc_id", "text",
      Seq(Tuple1(0L)).toDF("doc_id"), k = 4)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // the copy is rank 1 at cosine 1.0 (same exact weight vector)
    assert(got.head._2 == 1L && math.abs(got.head._3 - 1.0) < 1e-9)
    // doc 3 shares no term → no postings join row → absent entirely
    assert(!got.exists(_._2 == 3L) && !got.exists(_._2 == 0L))
    // cosines non-increasing in rank, all in [0, 1]
    assert(got.sliding(2).forall(p => p.head._3 >= p.last._3))
    assert(got.forall(r => r._3 >= 0.0 && r._3 <= 1.0 + 1e-9))
  }

  test("logreg classifier separates disjoint vocabularies in 3 GD rounds") {
    import spark.implicits._
    // positives and negatives use DISJOINT token sets — linearly separable,
    // so the fixed-point GD must learn it within the oracled 3 rounds
    val docs = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      val ws = if (pos) Seq("alpha", "beta", "gamma") else Seq("delta", "eps", "zeta")
      (i, Seq.tabulate(6)(j => ws((i + j).toInt % 3)).mkString(" "), if (pos) 1 else 0)
    }.toDF("doc_id", "text", "is_pos")
    val out = graft.llm.Classifier.qualityClassifier(docs, "doc_id", "text",
      "is_pos", buckets = 64, rounds = 3, lrDenom = 4096L)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.length == 40)
    val acc = out.count(r => (r._2 == 1L) == r._4).toDouble / 40
    assert(acc >= 0.95, s"separable task should be learned, acc=$acc")
    // scores are calibrated probabilities: in [0,1], positives above
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("naive bayes separates disjoint vocabularies and keeps featureless docs at the prior") {
    import spark.implicits._
    val docs = ((0L until 40L).map { i =>
      val pos = i % 2 == 0
      val ws = if (pos) Seq("alpha", "beta", "gamma") else Seq("delta", "eps", "zeta")
      (i, Seq.tabulate(6)(j => ws((i + j).toInt % 3)).mkString(" "), if (pos) 1 else 0)
    } :+ ((99L, "   ", 0))).toDF("doc_id", "text", "is_pos")
    val out = graft.llm.Classifier.naiveBayes(docs, "doc_id", "text", "is_pos",
      buckets = 64).as[(Long, Long, Double, Boolean)].collect()
    assert(out.length == 41)
    val byId = out.map(r => r._1 -> r).toMap
    val acc = out.filter(_._1 != 99L).count(r => (r._2 == 1L) == r._4).toDouble / 40
    assert(acc == 1.0, s"disjoint vocab must separate perfectly, acc=$acc")
    // the whitespace-only doc has no features: score = prior LLR alone,
    // ln(20/41) - ln(21/41) < 0 → predicted negative, and it's present
    assert(byId(99L)._3 < 0.0 && !byId(99L)._4)
    // one empty class must fail loudly, not divide by zero
    val ex = intercept[IllegalArgumentException] {
      graft.llm.Classifier.naiveBayes(
        docs.withColumn("is_pos", lit(1)), "doc_id", "text", "is_pos")
    }
    assert(ex.getMessage.contains("non-empty"))
  }

  test("naive bayes frozen model: complete bucket spine scores docs with unseen tokens") {
    import spark.implicits._
    val train = (0L until 30L).map { i =>
      val pos = i % 2 == 0
      (i, if (pos) "alpha beta alpha" else "delta eps zeta", if (pos) 1 else 0)
    }.toDF("doc_id", "text", "is_pos")
    val (model, prior) = graft.llm.Classifier.nbTrain(train, "doc_id", "text",
      "is_pos", buckets = 64)
    // the model is COMPLETE: one llr per bucket, even training-empty ones
    assert(model.count() == 64)
    // new docs under the frozen model: known-positive vocab scores positive,
    // a FULLY UNSEEN vocab still gets a finite score (Laplace default llr
    // buckets), never a dropped row or null
    val fresh = Seq((100L, "alpha beta"), (101L, "qqq zzz www never seen"),
      (102L, "   ")).toDF("doc_id", "text")
    val got = graft.llm.Classifier.nbScore(fresh, "doc_id", "text", model,
      prior, buckets = 64).as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 3)
    assert(got(100L)._3, "in-domain vocab must score positive")
    assert(!got(101L)._2.isNaN && !got(101L)._2.isInfinite)
    assert(got(102L)._2 == prior.toDouble / 1e6) // tokenless → exactly the prior
  }

  test("refine: full candidate set equals brute force; exact order overrides candidate order") {
    import spark.implicits._
    val corpus = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => 0.01f * i + 0.001f * j))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 5L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // candidates = the whole corpus → refine IS brute force, row-for-row
    val allCand = corpus.select(lit(5L).as("query_id"), col("vec_id"))
    val refined = graft.llm.SimSearch.refineTopK(queries, corpus, allCand, k = 4)
    val brute = graft.llm.SimSearch.bruteForceTopKL2(queries, corpus, k = 4)
    assert(refined.exceptAll(brute).isEmpty && brute.exceptAll(refined).isEmpty)
    // a candidate list in DELIBERATELY wrong order (farthest first) and
    // missing the 2nd-nearest: refine ranks by exact distance regardless of
    // candidate order, and never resurrects an unlisted vector
    val cand = Seq(29L, 20L, 7L, 5L, 3L).map((5L, _)).toDF("query_id", "vec_id")
    val got = graft.llm.SimSearch.refineTopK(queries, corpus, cand, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(got.map(_._2).toSeq == Seq(5L, 3L, 7L)) // self, then by true L2; 4/6 absent
    assert(got.sliding(2).forall(p => p.head._3 <= p.last._3))
  }

  test("ivf+sq8 incremental: batch append equals wholesale encode; appended rows searchable") {
    import spark.implicits._
    def mk(r: Range, base: Double) = r.map { i =>
      (i.toLong, Array.tabulate(8)(j => base.toFloat + 0.01f * i + 0.001f * j))
    }
    val base = (mk(0 until 18, 0.0) ++ mk(20 until 38, 10.0)).toDF("vec_id", "embedding")
    val batch = (mk(18 until 20, 0.0) ++ mk(38 until 40, 10.0)).toDF("vec_id", "embedding")
    val coarse = graft.llm.ProductQuant.trainCodebooks(
      base, m = 1, dims = 8, centroidStride = 10, iters = 2, ks = 4)
    val stats = graft.llm.ScalarQuant.trainStats(base)
    // frozen stats + coarse: appending batches is row-identical to one
    // wholesale encode (stats are global min/max, cell-independent)
    val inc = graft.llm.ScalarQuant.encodeBatch(base, coarse, stats, d = 8)
      .unionByName(graft.llm.ScalarQuant.encodeBatch(batch, coarse, stats, d = 8))
    val whole = graft.llm.ScalarQuant.encodeBatch(
      base.unionByName(batch), coarse, stats, d = 8)
    assert(inc.count() == 40)
    assert(inc.exceptAll(whole).isEmpty && whole.exceptAll(inc).isEmpty)
    // appended vectors are retrievable through the shared search leg
    val queries = base.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = graft.llm.ScalarQuant.ivfSq8Search(queries, inc, coarse, stats,
      k = 25, d = 8, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect()
    val ids = got.map(_._2).toSet
    assert(ids.contains(18L) && ids.contains(19L))
    assert(got.forall(_._2 < 20L)) // cluster isolation survives the append
  }

  test("residual incremental ann: batch append equals wholesale residual encode") {
    import spark.implicits._
    def mk(r: Range, base: Double) = r.map { i =>
      (i.toLong, Array.tabulate(8)(j => base.toFloat + 0.01f * i + 0.001f * j))
    }
    val base = (mk(0 until 18, 0.0) ++ mk(20 until 38, 10.0)).toDF("vec_id", "embedding")
    val batch = (mk(18 until 20, 0.0) ++ mk(38 until 40, 10.0)).toDF("vec_id", "embedding")
    val coarse = graft.llm.ProductQuant.trainCodebooks(
      base, m = 1, dims = 8, centroidStride = 10, iters = 2, ks = 4)
    val cb = graft.llm.ProductQuant.trainCodebooks(
      base, m = 2, dims = 4, centroidStride = 10, iters = 2, ks = 4)
    // the exactness contract is model-independent: appending batches under
    // ANY frozen (coarse, cb) pair is row-identical to one wholesale encode
    val inc = graft.llm.ProductQuant.encodeBatchResidual(base, coarse, cb, m = 2, dims = 4)
      .unionByName(graft.llm.ProductQuant.encodeBatchResidual(batch, coarse, cb, m = 2, dims = 4))
    val whole = graft.llm.ProductQuant.encodeBatchResidual(
      base.unionByName(batch), coarse, cb, m = 2, dims = 4)
    assert(inc.count() == 40 * 2)
    assert(inc.exceptAll(whole).isEmpty && whole.exceptAll(inc).isEmpty)
  }

  test("hard negatives: gold and its exact duplicates excluded before the cut") {
    import spark.implicits._
    val corpus = docs(
      (1L, "apple banana cherry"),
      (2L, "apple  banana cherry "),   // normalized duplicate of the gold
      (3L, "apple banana"),
      (4L, "apple"),
      (5L, "unrelated words entirely"))
    val qs = Seq((0L, "apple banana cherry")).toDF("query_id", "qtext")
    val got = graft.llm.Retrieval.hardNegativesTop1(
      corpus, "doc_id", "text", qs, "query_id", "qtext", k = 8)
      .as[(Long, Long, Long, Double, Int)].collect().sortBy(_._5)
    // gold = doc 1 (tie with dup 2 pinned by id); negatives exclude 1 AND 2
    assert(got.forall(r => r._2 == 1L))
    assert(!got.exists(r => r._3 == 1L || r._3 == 2L))
    assert(got.head._3 == 3L) // the best TRUE negative
  }

  test("bigram LM: hand-computed interpolated probs; unseen-pair and unseen-word fallbacks") {
    import spark.implicits._
    val corpus = docs((1L, "a b a b"), (2L, "a b"))
    val (uni, bi) = graft.llm.LangModel.bigramLm(corpus, "doc_id", "text")
    // p_uni(a)=p_uni(b)=(3+1)/(6+2)=0.5; p(b|a)=0.75*(3/3)+0.25*0.5=0.875
    val score = graft.llm.LangModel.scoreDocsBigram(
      docs((2L, "a b")), "doc_id", "text", uni, bi, floorLogp = -9.0)
      .as[(Long, Long, Double)].head()
    // -ln(0.5)=0.693147, -ln(0.875)=0.133531 -> avg 0.413339 -> 0.4133
    assert(score == ((2L, 2L, 0.4133)))
    // unseen PAIR (b,b) backs off to ln(0.25*p_uni(b)) = ln(0.125)
    val bb = graft.llm.LangModel.scoreDocsBigram(
      docs((3L, "b b")), "doc_id", "text", uni, bi, floorLogp = -9.0)
      .as[(Long, Long, Double)].head()
    assert(bb == ((3L, 2L, ((0.693147 + 2.079442) / 2 * 10000).round / 10000.0)))
    // unseen WORD hits the floor
    val cc = graft.llm.LangModel.scoreDocsBigram(
      docs((4L, "zzz")), "doc_id", "text", uni, bi, floorLogp = -9.0)
      .as[(Long, Long, Double)].head()
    assert(cc == ((4L, 1L, 9.0)))
  }

  test("uniform frame plan: zero/short/long clips; endpoints and spacing") {
    import spark.implicits._
    val m = Seq((1L, 0L), (2L, 5L), (3L, 100L)).toDF("doc_id", "total_frames")
    val got = graft.llm.Multimodal.uniformFramePlan(m, n = 16, "total_frames")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(!got.contains(1L))                       // zero-frame: no rows
    assert(got(2L).sortBy(_._2).map(_._3).toSeq == (0L until 5L)) // all frames
    val long = got(3L).sortBy(_._2).map(_._3).toSeq
    assert(long.size == 16 && long.head == 0L && long.last == 99L)
    assert(long.sliding(2).forall(p => p.head < p.last)) // strictly increasing
  }

  test("count-min: estimates always >= exact; shard matrices merge by addition") {
    import spark.implicits._
    val terms = (Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++
      (0 until 60).map(i => s"t$i")).toDF("term")
    val mat = graft.llm.Sketches.cmsMatrix(terms, "term", d = 4, w = 32)
    val exact = terms.groupBy("term").count()
    val est = graft.llm.Sketches.cmsEstimate(
      exact.select("term"), mat, "term", d = 4, w = 32)
    val both = exact.join(est, Seq("term"))
      .as[(String, Long, Long)].collect()
    assert(both.length == 62 && both.forall { case (_, c, e) => e >= c })
    // heavy hitters stay identifiable through a 32-bucket squeeze
    val byTerm = both.map(r => r._1 -> r._3).toMap
    assert(byTerm("alpha") >= 40L && byTerm("beta") >= 7L)
    // mergeability: sum of two shard matrices == matrix of the union
    val (sa, sb) = (terms.limit(50), terms.exceptAll(terms.limit(50)))
    val merged = graft.llm.Sketches.cmsMatrix(sa, "term", 4, 32)
      .unionByName(graft.llm.Sketches.cmsMatrix(sb, "term", 4, 32))
      .groupBy("r", "bucket").agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = mat.as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("bottom-k quantiles: exact below k, duplicate-safe, partition-invariant") {
    import spark.implicits._
    // group "a": 21 rows, UNDER the k=64 cap → the sample is the whole
    // group and nearest-rank quantiles are exact
    val a = (0 until 21).map(i => ("a", i.toLong, i.toDouble))
    // group "b": 300 rows, over the cap → estimates are sampled members
    val b = (0 until 300).map(i => ("b", 1000L + i, i.toDouble * 2))
    // group "c": group a DUPLICATED row-for-row (same keys twice) — the
    // per-copy disambiguation must count both copies, not collapse them
    val c = (0 until 21).flatMap(i =>
      Seq(("c", i.toLong, i.toDouble), ("c", i.toLong, i.toDouble)))
    val df = (a ++ b ++ c).toDF("g", "rk", "v")
    val probes = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val got = graft.llm.Sketches.bottomKQuantiles(df, "g", col("rk"), col("v"),
      k = 64, probes).as[(String, Long, Double, Double)].collect()
    val ga = got.filter(_._1 == "a").map(r => r._3 -> r._4).toMap
    assert(got.filter(_._1 == "a").forall(_._2 == 21L))
    assert(ga(0.0) == 0.0 && ga(0.5) == 10.0 && ga(1.0) == 20.0)
    assert(ga(0.1) == 2.0 && ga(0.9) == 18.0) // floor(p·20 + 0.5)
    // group b: every estimate is a real member, non-decreasing in p
    val gb = got.filter(_._1 == "b").sortBy(_._3)
    assert(gb.forall(_._2 == 300L))
    assert(gb.forall(r => r._4 % 2 == 0 && r._4 >= 0 && r._4 <= 598))
    assert(gb.map(_._4).sliding(2).forall(p => p.head <= p.last))
    // group c: 42 rows survive (copies disambiguated), quantiles exact over
    // the doubled multiset: sorted [0,0,1,1,…,20,20], median idx 21 → 10
    val gc = got.filter(_._1 == "c").map(r => r._3 -> r._4).toMap
    assert(got.filter(_._1 == "c").forall(_._2 == 42L))
    assert(gc(0.0) == 0.0 && gc(0.5) == 10.0 && gc(1.0) == 20.0)
    // the sample is a pure function of the row MULTISET: any partitioning
    // of the input produces the identical sketch (the mergeability claim)
    val re = graft.llm.Sketches.bottomKQuantiles(df.repartition(7), "g",
      col("rk"), col("v"), k = 64, probes)
      .as[(String, Long, Double, Double)].collect()
    assert(re.toSet == got.toSet)
  }

  test("residual ivfpq: cluster isolation at nprobe=1; residual adc is near-zero in-cell") {
    import spark.implicits._
    val corpus = (0L until 40L).map { i =>
      val base = if (i < 20) 0.0f else 10.0f
      (i, Array.tabulate(8)(j => base + 0.01f * i + 0.001f * j))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L || col("vec_id") === 30L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = graft.llm.ProductQuant.ivfPqResidualTopK(
      queries, corpus, k = 5, m = 2, dims = 4, centroidStride = 10,
      trainIters = 2, ks = 4, coarseKs = 4, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ(1L).nonEmpty && byQ(1L).forall(_._2 < 20L))
    assert(byQ(30L).nonEmpty && byQ(30L).forall(_._2 >= 20L))
    // residuals within a tight cluster are tiny -> quantized distances are
    // far below the raw coordinate scale (cluster spread ~0.2, base 10.0)
    assert(got.forall(_._3 < 1.0), got.mkString(","))
  }

  test("preferencePairs: margins on distinct scores; all-tied set still pairs min/max ids") {
    import spark.implicits._
    // q1: 'alpha' docs where doc 3 also repeats the term -> strictly higher tf score
    // q2: three IDENTICAL docs -> all scores tie; pair must be (min id, max id)
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha alpha alpha delta"),
      (10L, "omega same text"), (11L, "omega same text"), (12L, "omega same text"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "alpha"), (2L, "omega")).toDF("query_id", "qtext")
    val got = graft.llm.Retrieval.preferencePairs(docs, "doc_id", "text",
        qs, "query_id", "qtext")
      .select("query_id", "chosen_doc", "rejected_doc")
      .as[(Long, Long, Long)].collect().toMap2
    assert(got(1L)._1 == 3L)                 // highest tf wins chosen
    assert(got(2L) == (10L, 12L))            // all-tied: (min, max), not dropped
  }

  private implicit class MapTuple[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
