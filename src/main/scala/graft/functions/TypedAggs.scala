package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class LongSummaryState(n: Long, sum: Long, mn: Long, mx: Long)
case class LongSummaryOut(n: Long, sum: Long, mn: Long, mx: Long)

/** Typed `Aggregator` surface (the Dataset-API custom aggregation path,
  * complementing the Catalyst `TypedImperativeAggregate` used by
  * TopKByScore). Usable three ways: on a `KeyValueGroupedDataset` via
  * `.agg(LongSummary.toColumn)`, as an untyped column via
  * `functions.udaf(...)`, or SQL-registered via
  * `spark.udf.register("long_summary", udaf(LongSummary))`.
  *
  * The state is (count, sum, min, max) over LONGS — exact integer
  * arithmetic, order- and partitioning-independent, so results are
  * bit-identical across engines and the DuckDB oracle is plain
  * count/sum/min/max (q84).
  */
object LongSummary extends Aggregator[Long, LongSummaryState, LongSummaryOut] {

  override def zero: LongSummaryState =
    LongSummaryState(0L, 0L, Long.MaxValue, Long.MinValue)

  override def reduce(b: LongSummaryState, a: Long): LongSummaryState =
    LongSummaryState(b.n + 1, b.sum + a, math.min(b.mn, a), math.max(b.mx, a))

  override def merge(x: LongSummaryState, y: LongSummaryState): LongSummaryState =
    LongSummaryState(x.n + y.n, x.sum + y.sum,
      math.min(x.mn, y.mn), math.max(x.mx, y.mx))

  override def finish(s: LongSummaryState): LongSummaryOut =
    if (s.n == 0) LongSummaryOut(0L, 0L, 0L, 0L)
    else LongSummaryOut(s.n, s.sum, s.mn, s.mx)

  override def bufferEncoder: Encoder[LongSummaryState] =
    Encoders.product[LongSummaryState]
  override def outputEncoder: Encoder[LongSummaryOut] =
    Encoders.product[LongSummaryOut]
}
