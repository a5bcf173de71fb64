package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018, the
  * EM-trained counterpart of [[BpeTrain]] and the other half of modern
  * tokenizer practice (reference has no text ops; this is LLM-pipeline
  * surface). Pieces are scored by a unigram language model and words are
  * segmented by the max-probability piece sequence; training alternates
  * segmentation (E) and count-renormalization (M).
  *
  * Spark-first shape, all Zipf-bounded: every per-word computation runs on
  * the DISTINCT word relation (one tokenize+count pass over the corpus,
  * map-side combined), so a 100 TB corpus is touched once and each EM round
  * costs O(|vocab| + |words|·len·maxPieceLen) — corpus-size-independent,
  * the [[BpeTrain]] posture. The vocabulary rides the plan as a 1-row
  * map_from_entries aggregate crossJoin'd (broadcast) onto the word
  * relation — no driver collect anywhere.
  *
  * Deviations from full SentencePiece, chosen to keep the model a pure
  * deterministic function of the corpus (the standing oracle rules):
  *  - Viterbi-EM (hard counts from the BEST segmentation) instead of
  *    forward-backward expected counts: counts stay exact integers, so the
  *    M-step is replayable without float-accumulation drift.
  *  - The vocabulary is pruned ONCE from the seed (top `vocabSize`
  *    multi-char substrings by count·len, tie piece-asc, plus every single
  *    char for coverage) instead of iterative loss-ranked pruning; EM
  *    rounds then drop pieces that win no occurrence (c=0). Segmentability
  *    is preserved: a word's own best-seg pieces always survive its round.
  *  - Piece log-probs round to 6 decimals at the source (transcendental
  *    outputs never land on exact half boundaries), and the DP adds
  *    them in one fixed left-to-right order with ties pinned to the
  *    EARLIEST split start, so both engines walk bit-identical doubles.
  */
object UnigramLm {

  /** All substrings of length 1..maxPieceLen of each distinct word,
    * occurrence-weighted by word frequency: (piece, c). The seed counts.
    */
  def seedPieces(wordFreqs: DataFrame, maxPieceLen: Int): DataFrame =
    wordFreqs.select(col("f"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), length(col("word")) - i + 1)),
            l => col("word").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("f")).as("c"))

  /** Seed vocabulary: every single char (coverage guarantee) plus the top
    * `vocabSize` multi-char pieces by count·len (the SentencePiece seed
    * score), tie-pinned piece-asc. orderBy+limit is TakeOrdered — no
    * full sort.
    */
  def seedVocab(pieces: DataFrame, vocabSize: Int): DataFrame = {
    val chars = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy((col("c") * length(col("piece"))).desc, col("piece"))
      .limit(vocabSize)
    chars.unionByName(multi).select(col("piece"), col("c"))
  }

  /** logp per piece off exact integer counts: round(ln(c / Σc), 6). */
  private def withLogp(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("c")).as("__tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("c"),
        round(log(col("c").cast("double") / col("__tot").cast("double")), 6)
          .as("lp"))
  }

  /** Max-probability segmentation of `word` under the piece→logp map `vm`:
    * left-to-right DP, position i keeps the best (dp, seg) over candidate
    * last-pieces word[j+1..i] for j in [i-maxPieceLen, i). Ties pin to the
    * SMALLEST j (earliest split start — the longest candidate last piece):
    * the ascending-j fold replaces only on strictly-greater dp. Unreachable
    * positions carry the -1e18 sentinel and lose to any reachable path.
    * Pieces missing from `vm` null out and are filtered — with all single
    * chars in the vocab every position is reachable.
    */
  def viterbiSeg(word: Column, vm: Column, maxPieceLen: Int): Column = {
    val zero = array(struct(lit(0.0).as("dp"),
      array().cast("array<string>").as("seg")))
    val sentinel = struct(lit(-1e18).as("dp"),
      array().cast("array<string>").as("seg"))
    val table = aggregate(sequence(lit(1), length(word)), zero, (acc, i) => {
      val cands = filter(
        transform(sequence(greatest(lit(0), i - maxPieceLen), i - 1), j => {
          val piece = word.substr(j + 1, i - j)
          val prev = element_at(acc, (j + 1).cast("int"))
          struct((prev.getField("dp") + element_at(vm, piece)).as("dp"),
            concat(prev.getField("seg"), array(piece)).as("seg"))
        }),
        c => c.getField("dp").isNotNull)
      val best = aggregate(cands, sentinel,
        (b, c) => when(c.getField("dp") > b.getField("dp"), c).otherwise(b))
      concat(acc, array(best))
    })
    element_at(table, -1).getField("seg")
  }

  /** One Viterbi-EM round: segment every distinct word under `vocab`'s
    * log-probs, then re-count pieces from the best segmentations
    * (occurrence × word frequency). Pieces winning no occurrence drop.
    * Returns the re-counted (piece, c) vocabulary.
    */
  def emRound(wordFreqs: DataFrame, vocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val vm = withLogp(vocab)
      .agg(map_from_entries(collect_list(struct(col("piece"), col("lp")))).as("vm"))
    wordFreqs.crossJoin(broadcast(vm))
      .select(col("f"),
        explode(viterbiSeg(col("word"), col("vm"), maxPieceLen)).as("piece"))
      .groupBy("piece").agg(sum(col("f")).as("c"))
  }

  /** Full training: seed → prune → `iters` Viterbi-EM rounds. Returns the
    * final (piece, cnt, logp) model. Each round localCheckpoints (released
    * next round) so iterative lineage stays flat — the Lloyd/BPE loop
    * discipline.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 4, iters: Int = 2): DataFrame = {
    val wf = BpeTrain.wordFreqs(docs, textCol).localCheckpoint()
    var vocab = seedVocab(seedPieces(wf, maxPieceLen), vocabSize).localCheckpoint()
    for (_ <- 1 to iters) {
      val next = emRound(wf, vocab, maxPieceLen).localCheckpoint()
      org.apache.spark.sql.graft.Checkpoints.release(vocab)
      vocab = next
    }
    val out = withLogp(vocab)
      .select(col("piece"), col("c").as("cnt"), col("lp").as("logp"))
    org.apache.spark.sql.graft.Checkpoints.release(wf)
    out
  }

  /** Corpus encode under a trained (piece, cnt, logp) model: per-doc word
    * and piece counts. Same two-touch shape as [[BpeTrain.encodeCorpus]] —
    * the DP runs once per DISTINCT word, the result equi-joins back to the
    * exploded tokens (no broadcast hint; AQE decides — VERDICT r08 #2).
    *
    * The DP's piece-length bound is DERIVED from the model
    * (`max(length(piece))` — one tiny agg over the bounded vocab, the
    * guarded-fetch precedent) rather than passed separately: the bound is a
    * property of the model, and a caller-supplied value that disagreed with
    * training would silently mis-segment (never consider the longer vocab
    * pieces) with no error raised.
    *
    * OOV convention (SentencePiece byte-fallback analog): a word containing
    * ANY character absent from the model's vocabulary is UNSEGMENTABLE — the
    * DP's final position stays at the unreachable sentinel and the best seg
    * comes back empty. Such words count `length(word)` pieces (one unknown
    * piece per character), the same budget a char-complete vocab would
    * charge. Encoding the training corpus never hits this leg (every char of
    * every word is in the seed by construction); it exists for the frozen-
    * model-on-new-docs path, where unseen characters are routine and a
    * silent 0 would undercount n_tokens (ADVICE r11).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   model: DataFrame): DataFrame = {
    val maxRow = model.agg(max(length(col("piece")))).head
    val maxPieceLen = if (maxRow.isNullAt(0)) 1 else maxRow.getInt(0)
    val vm = model
      .agg(map_from_entries(collect_list(struct(col("piece"), col("logp")))).as("vm"))
    val toks = docs.select(col(idCol),
      explode(TextStats.tokens(Dedup.normalize(col(textCol)))).as("word"))
    // the DP lands in its own projection so the OOV branch below reads the
    // materialized size instead of re-running the fold per branch
    // (when(expensive > x, expensive.f) re-evaluates the whole tree per
    // branch; __n is non-cheap, so CollapseProject keeps the two
    // projections separate)
    val enc = toks.select("word").distinct()
      .crossJoin(broadcast(vm))
      .select(col("word"),
        size(viterbiSeg(col("word"), col("vm"), maxPieceLen)).as("__n"))
      .select(col("word"),
        when(col("__n") === 0, length(col("word")).cast("long"))
          .otherwise(col("__n").cast("long")).as("n_pieces"))
    toks.join(enc, Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_tokens"))
  }
}
