package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: group documents into training-context-sized packs so a
  * fixed token budget is filled with minimal padding — the step between
  * curation and tokenized-batch writing in an LLM data pipeline.
  *
  * Scale design: global bin-packing is NP-hard and inherently sequential, so
  * the distributed form packs PER PARTITION: documents are hash-distributed,
  * sorted descending within each partition, and packed first-fit-decreasing
  * (FFD) by a single in-memory pass — no shuffle beyond the initial
  * repartition, no driver involvement, and each partition's packs are
  * independent. FFD wastes at most ~22% vs optimal in the worst case and
  * far less on heavy-tailed doc-length distributions; padding waste shrinks
  * as partitions grow, so bigger data packs BETTER, not worse.
  */
object Packing {

  private val packSchema = StructType(Seq(
    StructField("pack_id", LongType, nullable = false),
    StructField("doc_ids", ArrayType(LongType, containsNull = false)),
    StructField("n_docs", IntegerType, nullable = false),
    StructField("total_tokens", LongType, nullable = false)))

  /** Pack (id, tokenCount) rows into packs of at most `maxTokens` tokens.
    * A single document exceeding `maxTokens` gets its own pack (the caller
    * truncates/splits downstream).
    *
    * Determinism is ENGINE-PORTABLE: docs are grouped by an md5-derived
    * group id `pid = md5(id)[0:8] mod partitions` (not Spark's internal
    * Murmur3 partitioner), FFD order within a group is pinned by
    * (tokens desc, id), and pack_id = pid * 2^40 + index-within-group — so
    * the exact same packs come out regardless of cluster size, shuffle
    * partition count, or engine, and the DuckDB oracle (q85) replays the
    * whole pass. Physically each Spark partition receives whole pid groups
    * (repartition on pid) and the per-partition sort is (pid, tokens desc,
    * id), so the FFD pass streams group runs without materializing the
    * partition.
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
                 maxTokens: Long, partitions: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(partitions > 0 && partitions < (1 << 20),
      s"partitions must be in [1, 2^20), got $partitions")
    val slim = df.select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n"))
      .withColumn("pid", pmod(
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10).cast("long"),
        lit(partitions.toLong)))
      .repartition(partitions, col("pid"))
      .sortWithinPartitions(col("pid"), col("n").desc, col("id"))
    val packed = slim.rdd.mapPartitions { rows =>
      // first-fit-decreasing per pid run: scan bins in creation order, open
      // a new bin when none fits. The open-bin list for ONE group lives in
      // the task's heap (its ids end up in the output anyway); groups are
      // md5-uniform, so a group is ~1/partitions of the input.
      val buf = rows.buffered
      new scala.collection.AbstractIterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        def hasNext: Boolean = pending.hasNext || buf.hasNext
        def next(): Row = {
          if (!pending.hasNext) {
            val pid = buf.head.getLong(2)
            val bins = scala.collection.mutable.ArrayBuffer
              .empty[(scala.collection.mutable.ArrayBuffer[Long], Long)]
            while (buf.hasNext && buf.head.getLong(2) == pid) {
              val r = buf.next()
              val id = r.getLong(0); val n = r.getLong(1)
              val fit = bins.indexWhere { case (_, tot) => tot + n <= maxTokens }
              if (fit >= 0) {
                val (ids, tot) = bins(fit)
                ids += id
                bins(fit) = (ids, tot + n)
              } else bins += ((scala.collection.mutable.ArrayBuffer(id), n))
            }
            pending = bins.iterator.zipWithIndex.map { case ((ids, tot), i) =>
              Row((pid << 40) | i.toLong, ids.toSeq, ids.size, tot)
            }
          }
          pending.next()
        }
      }
    }
    df.sparkSession.createDataFrame(packed, packSchema)
  }

  /** GPT-style chunk-and-pack layout — the OTHER standard packing scheme
    * (concatenate everything, slice fixed windows, zero padding), vs
    * [[packGreedy]]'s no-split FFD bins: each shard's documents are
    * concatenated in their deterministic `seq` order (a doc occupies
    * n_tokens + eodTokens slots), and the stream is cut into
    * `blockSize`-token training blocks. Returns the per-doc placement
    * (shard, seq, tok_start, tok_end inclusive, blk_start, blk_end) —
    * 0-based within the shard stream; a doc straddles a block boundary iff
    * blk_start < blk_end.
    *
    * `sharded` is [[Shard.assignShards]] output (or anything with shard +
    * seq). One cumulative-sum window PER SHARD — sort bounded by shard
    * size, nShards is the scale knob, same as the export itself. Block
    * indices use integral `div`, exact at any offset (no double rounding).
    */
  def contiguousBlocks(sharded: DataFrame, idCol: String, tokenCol: String,
                       blockSize: Long, eodTokens: Int = 1): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("seq"))
    sharded.select(col(idCol).as("id"), col("shard"), col("seq"),
        (col(tokenCol).cast("long") + eodTokens).as("slots"))
      .withColumn("cum", sum(col("slots")).over(w))
      .select(col("id").as(idCol), col("shard"), col("seq"),
        (col("cum") - col("slots")).as("tok_start"),
        (col("cum") - 1).as("tok_end"))
      .withColumn("blk_start", expr(s"tok_start div $blockSize"))
      .withColumn("blk_end", expr(s"tok_end div $blockSize"))
  }
}
