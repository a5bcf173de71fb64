package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: BM25 scoring on an INVERTED-INDEX
  * join — the lexical twin of SimSearch's embedding top-k, and the shape
  * every training-data pipeline uses for targeted corpus slicing ("find the
  * docs about X to up/down-sample").
  *
  * Scale design: the index is relational — (term, doc, tf) rows — so
  * query-document candidate generation is an equi-join ON TERM: only
  * documents containing a query term are ever scored (|postings of query
  * terms|, not |corpus|). Corpus statistics (N, avgdl) are one-row
  * aggregates broadcast into the scorer; document frequencies ride the
  * term join. Everything is keyed joins + aggregations; scores are rounded
  * and tie-pinned so ranking is deterministic and oracle-replayable.
  */
object Retrieval {

  /** The demo query set shared by q72_bm25 and StressBench (mirrored in the
    * q72 oracle's VALUES list — change all three together).
    */
  val sampleQueries: Seq[(Long, String)] = Seq(
    (0L, "spark join hash"), (1L, "vector stream merge"),
    (2L, "customer order window"), (3L, "slow scan filter table"))

  /** (doc, term, tf) postings plus per-document length. Tokenization is
    * fanned out of a row-group-bounded scan (Tables.fanOut scaladoc) — the
    * explode+aggregate shuffles identically either way.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.Tables.fanOut(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(TextStats.tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** BM25 top-k: standard Robertson/Sparck-Jones idf `ln(1 + (N-df+0.5)/
    * (df+0.5))`, tf saturation k1, length normalization b.
    *
    * Cross-engine determinism: `ln` is the engine's one non-correctly-
    * rounded-by-spec kernel, so the idf is rounded to 6 places at the source;
    * everything downstream of it is rational IEEE arithmetic (+,-,*,/ are
    * correctly rounded, so both engines produce bit-identical doubles).
    * avgdl is an exact long-sum over count (not `avg`, whose double
    * accumulation is order-dependent), the per-document score sum routes
    * through decimal(18,6) per the engine-wide dsum rule, and ranking is
    * tie-pinned by doc id.
    */
  /** The scored (query_id, doc_id, score) relation before ranking — the
    * base [[bm25TopK]] ranks and [[hardNegativesTop1]] filters; exposed so
    * exclusion predicates can run BEFORE the top-k cut (filtering after the
    * cut would return fewer than k rows whenever an excluded doc ranked).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, queryIdCol: String, queryTextCol: String,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // The postings base feeds three consumers (dl, df, scoring) — persisted
    // so the tokenize+explode+agg runs once. Like Dedup's shingle base, the
    // cache lives until the session ends: long-lived drivers scoring many
    // corpora should spark.catalog.clearCache() between them.
    val post = postings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val docLen = post.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    // one-row corpus stats, broadcast everywhere they're needed
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val termDf = post.groupBy("term").agg(count(lit(1)).as("df"))
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        explode(TextStats.tokens(lower(col(queryTextCol)))).as("term"))
      .distinct()
    val scored = post
      .join(qTerms, Seq("term")) // the inverted-index probe
      .join(termDf, Seq("term"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("contrib",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy("query_id", "doc_id")
      .agg(round(sum(col("contrib").cast("decimal(18,6)")).cast("double"), 4).as("score"))
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val perDoc = bm25Scores(docs, idCol, textCol, queries, queryIdCol,
      queryTextCol, k1, b)
    // bounded-heap top-k instead of a window (optimization r21): map-side
    // partial top-k ships ≤ k rows per query per mapper; same
    // (score desc, doc_id asc) order and tie pins — row-identical output
    perDoc.groupBy(col("query_id"))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("doc_id"),
        col("entry.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Preference-pair construction (the DPO/RLHF-reward training-data
    * shape): per query, CHOSEN = the highest-BM25 retrieved doc, REJECTED =
    * the lowest-scoring retrieved doc, with the margin alongside — the
    * weak-supervision recipe for ranking-derived preference data. Queries
    * whose retrieval set is a single doc emit no pair (chosen == rejected
    * is filtered). Ties pin by doc id — ASCENDING for chosen, DESCENDING
    * for rejected, so an all-tied retrieval set of 2+ docs still emits a
    * (lowest-id, highest-id) pair instead of silently dropping.
    *
    * Scale: one scored relation (the shared postings probe), two
    * row_number windows over the SAME query partition, and a per-query
    * 1×1 join — bounded by |queries| rows out.
    */
  def preferencePairs(docs: DataFrame, idCol: String, textCol: String,
                      queries: DataFrame, queryIdCol: String,
                      queryTextCol: String): DataFrame = {
    // the two-window ranked relation feeds BOTH sides of the chosen ⋈
    // rejected join — materialized once (optimization r21) instead of
    // re-running the whole postings-probe + scoring chain per side
    val scored = bm25Scores(docs, idCol, textCol, queries, queryIdCol, queryTextCol)
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val wBot = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("doc_id").desc)
    val ranked = scored
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__rb", row_number().over(wBot))
      .localCheckpoint()
    val chosen = ranked.filter(col("__rt") === 1)
      .select(col("query_id"), col("doc_id").as("chosen_doc"),
        col("score").as("chosen_score"))
    val rejected = ranked.filter(col("__rb") === 1)
      .select(col("query_id"), col("doc_id").as("rejected_doc"),
        col("score").as("rejected_score"))
    chosen.join(rejected, "query_id")
      .filter(col("chosen_doc") =!= col("rejected_doc"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
  }

  /** DPR-style hard-negative mining (Karpukhin et al., EMNLP 2020 §4.2 use
    * the top BM25 passage as the weakly-supervised POSITIVE and other
    * high-ranked passages as hard negatives): per query, gold = the BM25
    * top-1 doc; negatives = the next k docs after excluding the gold AND
    * every exact duplicate of the gold's normalized text. The duplicate
    * exclusion is the false-negative filter — a verbatim copy of the
    * positive ranked high is a mislabeled training signal, the classic
    * negative-mining trap. Exclusion runs BEFORE the top-k cut, so the
    * output is k true negatives whenever the corpus has them.
    *
    * Scale: one scored relation (the BM25 probe — postings equi-join), one
    * slim fingerprint relation joined on doc id, a broadcast |queries|-row
    * gold table, and per-query bounded windows.
    */
  def hardNegativesTop1(docs: DataFrame, idCol: String, textCol: String,
                        queries: DataFrame, queryIdCol: String,
                        queryTextCol: String, k: Int): DataFrame = {
    // the scored relation feeds the gold window AND the final ranked join —
    // materialized once (optimization r21): it is |queries|-bounded (only
    // docs sharing a query term), and unmaterialized the postings probe +
    // scoring chain re-ran per consumer (measured as 4 near-identical
    // 0.5-0.7 s jobs of q123's 3.7 s)
    val scores = bm25Scores(docs, idCol, textCol, queries, queryIdCol, queryTextCol)
      .localCheckpoint()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val gold = scores.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("doc_id").as("gold_id"))
    // slim (doc_id, md5) relation, consumed by goldFp AND the final join —
    // one normalize+digest pass instead of two
    val fp = docs.select(col(idCol).as("doc_id"),
      md5(Dedup.normalize(col(textCol))).as("fp"))
      .localCheckpoint()
    val goldFp = gold.join(fp.withColumnRenamed("doc_id", "gold_id"), Seq("gold_id"))
      .select(col("query_id"), col("gold_id"), col("fp").as("gold_fp"))
    scores.join(broadcast(goldFp), Seq("query_id"))
      .join(fp, Seq("doc_id"))
      .filter(col("doc_id") =!= col("gold_id") && col("fp") =!= col("gold_fp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "gold_id", "doc_id", "score", "rank")
  }

  /** The demo phrase set shared by q105_phrase_search and its oracle's
    * VALUES list — change both together.
    */
  val samplePhrases: Seq[(String, String)] = Seq(
    ("p0", "table table"), ("p1", "scan slow"),
    ("p2", "fast sort key"), ("p3", "window stream sort query"))

  /** Positional phrase search: (phrase_id, doc_id, n_matches, first_pos) for
    * every document containing each phrase as CONSECUTIVE tokens — the
    * exact-match slicing step ("pull every doc containing this license
    * sentence / this eval prompt") that BM25's bag-of-words scoring can't
    * express.
    *
    * Relational shape: instead of an m-way positional self-join per phrase,
    * documents are sliced into positioned m-grams for each DISTINCT phrase
    * length m (a driver-side handful), and phrase matching is one equi-join
    * on gram text against the broadcast phrase table. Token texts carry no
    * spaces, so gram text equality already implies equal token count — the
    * join needs no length key. Cost: one gram explode per distinct length
    * over the token materialization (persisted, scanned |lengths| times); a
    * production variant hashes grams (GramHashes) to shrink shuffle rows.
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrases: DataFrame, phraseIdCol: String,
                    phraseTextCol: String): DataFrame = {
    val ph = phrases.select(col(phraseIdCol).as("phrase_id"),
        TextStats.tokens(Dedup.normalize(col(phraseTextCol))).as("pw"))
      .select(col("phrase_id"), concat_ws(" ", col("pw")).as("gram"),
        size(col("pw")).as("m"))
      .filter(col("m") >= 1)
    val lengths = ph.select("m").distinct().collect().map(_.getInt(0)).sorted
    require(lengths.nonEmpty, "phrase set is empty (or all phrases tokenize to nothing)")
    val base = docs.select(col(idCol).as("doc_id"),
        TextStats.tokens(Dedup.normalize(col(textCol))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val hits = lengths.map { m =>
      base.filter(size(col("w")) >= m)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("w")) - (m - 1)),
            i => struct(i.cast("long").as("pos"),
              concat_ws(" ", slice(col("w"), i, lit(m))).as("gram")))).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
        .join(broadcast(ph.filter(col("m") === m).select("phrase_id", "gram")),
          Seq("gram"))
        .select("phrase_id", "doc_id", "pos")
    }.reduce(_ union _)
    hits.groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }

  /** TF-IDF "more-like-this": cosine top-k similar documents for a bounded
    * query-doc batch, computed ENTIRELY on the inverted index — dot products
    * come from the postings equi-join on term (the BM25 probe shape), so no
    * dense vectors and no |Q|×|C| fan-out exist anywhere; corpus rows
    * without a shared term are never touched.
    *
    * Determinism: weights are exact BIGINT micro units — w = tf ·
    * lnMicro(N/df) — so dot products and squared norms are exact integer
    * sums on both engines; the final cosine is one fixed double op sequence
    * (÷, √, ·) over those integers, rounded at 6 before the tie-pinned
    * rank. Long-doc caveat: raw-tf weights square inside BIGINT only while
    * tf·idf_micro < ~3e9 (tf ~200 at this corpus's idf range); corpora of
    * book-length docs should pre-cap tf (the standard sublinear-tf gate)
    * before this join.
    *
    * Scale: one postings aggregation (map-side combinable) feeds weights,
    * norms and the probe; the query batch's weighted postings are broadcast
    * into the term join; norms join on doc id; top-k is a bounded heap.
    */
  def tfIdfSimilar(docs: DataFrame, idCol: String, textCol: String,
                   queryIds: DataFrame, k: Int): DataFrame = {
    val post = postings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nDocs = docs.select(col(idCol)).agg(count(lit(1)).as("n"))
    val idf = post.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"), Sampling.lnMicro(col("n"), col("df")).as("im"))
    // the weighted postings feed THREE consumers (norms, query side, dot) —
    // localCheckpoint pins the tokenize+idf join to one pass instead of
    // three corpus-postings recomputes (the plan-shape PlanSpec pins)
    val wv = post.join(idf, Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("im")).as("wm"))
      .localCheckpoint()
    val norms = wv.groupBy("doc_id")
      .agg(sum(col("wm") * col("wm")).as("n2"))
    val qv = wv.join(broadcast(queryIds.select(col("doc_id"))), Seq("doc_id"))
      .select(col("doc_id").as("query_id"), col("term"), col("wm").as("qwm"))
    val dot = wv.join(broadcast(qv), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("qwm") * col("wm")).as("dp"))
    val scored = dot
      .join(broadcast(norms.withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("n2", "qn2").join(
          broadcast(queryIds.select(col("doc_id").as("query_id"))), Seq("query_id"))),
        Seq("query_id"))
      .join(norms, Seq("doc_id"))
      .select(col("query_id").as("__qid"), col("doc_id"),
        round(col("dp").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))), 6)
          .as("d"))
    scored.groupBy(col("__qid"))
      .agg(org.apache.spark.sql.graft.TopKColumns
        .topKByScore(col("d"), col("doc_id"), k).as("top"))
      .select(col("__qid").as("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("doc_id"),
        col("entry.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
