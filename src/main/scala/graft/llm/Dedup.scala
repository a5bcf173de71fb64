package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB): every near-dup variant is
  * CANDIDATE-GENERATION (a cheap equi-join key: LSH band, sign bucket,
  * simhash prefix) followed by WITHIN-BUCKET verification. Nothing here does
  * an unblocked all-pairs crossJoin except the explicitly-named `bruteForce*`
  * oracles, which exist to differential-test the bucketed paths at small SF.
  */
object Dedup {

  /** Whitespace-normalized lowercase text — the canonical form for exact
    * dedup (byte-identical across engines).
    */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact dedup: one surviving doc per normalized text (min id wins —
    * deterministic), with the group size for audit.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(normalize(col(textCol))).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** n-word shingles (distinct), the unit set for Jaccard/MinHash. Documents
    * shorter than n words get their whole text as the single shingle so they
    * still participate.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val w = TextStats.tokens(normalize(text))
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array(concat_ws(" ", w)))
  }

  /** Exact Jaccard between two shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash signature of a shingle set: k independent hash functions, each
    * `h_i(s) = md5(i || ':' || s)` minimized over the set. md5-as-random-
    * oracle keeps the signature engine-portable (DuckDB computes the same
    * bytes), at ~2x the cost of a murmur family — the right trade while the
    * correctness harness is differential.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingles,
        s => md5(concat(seed.cast("string"), lit(":"), s)))))

  /** LSH band keys: the signature split into `bands` bands of `rows` hashes,
    * each band collapsed to one key. Two docs sharing ANY band key become a
    * candidate pair — the classic (b,r) S-curve trade-off.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit("|"),
        md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows))))))

  /** MinHash+LSH near-dup pairs: shingle → sign → band → equi-join on band
    * key → exact-Jaccard verify. The only shuffle keys are band hashes, so
    * the plan is a pair of hash-partitioned exchanges — no crossJoin at any
    * scale. Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                   threshold: Double = 0.7): DataFrame = {
    val withSig = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("band", explode(bandKeys(col("sig"), bands, k / bands)))
    val a = withSig.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSig.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Brute-force n-gram Jaccard pairs — the differential oracle for
    * [[minhashPairs]] at small SF. All-pairs by construction: never run
    * above a bounded sample.
    */
  def bruteForceJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                             shingleN: Int, threshold: Double): DataFrame = {
    val s = df.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("sh"))
    val a = s.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = s.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash (64-bit) of the token multiset — near-dup docs land within a
    * small Hamming distance; `bit_count(a ^ b)` verifies. Native codegen'd
    * expression (FNV-1a per token, bitwise majority vote).
    */
  def simhash(text: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.simHash64(
      TextStats.tokens(normalize(text)))

  /** SimHash near-dup pairs, bucketed by the top `prefixBits` bits so
    * candidate generation is an equi-join (docs differing only in low bits
    * collide; a production sweep re-runs with rotated prefixes to cover all
    * bit positions — documented, not needed at harness SF).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   prefixBits: Int = 16, maxHamming: Int = 6): DataFrame = {
    val s = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .withColumn("bucket", shiftrightunsigned(col("sh"), 64 - prefixBits))
    val a = s.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = s.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-dup pairs, sign-bucketed: bucket = sign pattern of
    * the first `signBits` dimensions (random-hyperplane LSH with axis-aligned
    * planes — embeddings are already rotation-mixed). Equi-join on bucket,
    * verify with the fused cosine expression.
    */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
                     signBits: Int = 8, threshold: Double = 0.9): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", signBucket(col("v"), signBits))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.cosineSim(col("v_a"), col("v_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Sign-pattern bucket of the first `bits` vector components. */
  def signBucket(vec: Column, bits: Int): Column =
    aggregate(slice(vec, 1, bits), lit(0L),
      (acc, x) => acc * 2 + when(x > 0.0, 1L).otherwise(0L))
}
