package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** P12: deterministic dense row enumeration. A global
  * `row_number().over(Window.orderBy(...))` funnels every row through ONE
  * reducer — fine for the reference's bounded dead-letter batches, fatal at
  * 100 TB. This is the scalable form: a range-partitioned total sort, then
  * RDD `zipWithIndex` (one extra job to count per-partition sizes, no
  * single-reducer stage). One of the rare justified RDD drops.
  */
object Enumerate {

  def withIndex(df: DataFrame, sortCols: Seq[Column],
                indexCol: String = "idx"): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(StructField(indexCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
