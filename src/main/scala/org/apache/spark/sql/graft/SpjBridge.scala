package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Key-grouped file partition for the storage-partitioned-join scan: it IS
  * Spark's own [[FilePartition]] (so the stock parquet reader factory
  * consumes it unchanged — `FilePartitionReaderFactory.createReader`
  * pattern-matches on FilePartition) and additionally carries the bucket
  * id as its partition key, the [[HasPartitionKey]] contract
  * `KeyGroupedPartitioning` groups on.
  */
private[graft] class KeyedFilePartition(idx: Int, fs0: Array[PartitionedFile],
                                        key: Array[Any])
    extends FilePartition(idx, fs0) with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(key)
}

/** Shim-package seam for the graft storage-partitioned scan
  * ([[graft.sources]] side: `GraftSpjScan`): [[PartitionedFile]],
  * [[FilePartition]], and [[ParquetPartitionReaderFactory]] are
  * `private[sql]` in source, so their construction lives here. The reader
  * factory is Spark's OWN V2 parquet factory — vectorized reads, field-id
  * resolution, type widening, row-group filter pushdown all ride the same
  * machinery the delegated DataFrame read uses, so per-file semantics
  * cannot diverge between the two scan paths.
  */
object SpjBridge {

  /** One whole-file-per-entry partition for the partition tuple `key`
    * (Int bucket ids, Long time-transform values) — files are
    * deliberately unsplit: the tuple is the co-location quantum a
    * storage-partitioned join keys on.
    */
  def keyedPartition(index: Int, key: Seq[Any],
                     files: Seq[(String, Long)]): InputPartition =
    new KeyedFilePartition(index, files.map { case (p, len) =>
      new PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p),
        0L, len, Array.empty, 0L, len, Map.empty)
    }.toArray, key.toArray)

  def parquetReaderFactory(spark: SparkSession, dataSchema: StructType,
                           readSchema: StructType,
                           filters: Array[Filter]): PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    // the SESSION SQLConf snapshot: session timezone, vectorization flags,
    // and the field-id read flag ([[graft.sources.FieldIds]] enables it on
    // the session the moment an id-carrying table loads) all carry over
    val sqlConf = spark.sessionState.conf.clone()
    // the task-side hadoop configuration Spark's own ParquetScan ships to
    // its reader factory — the read-support class and requested schema are
    // read with NO default inside the task (absent keys NPE there)
    val hadoopConf = spark.sessionState.newHadoopConf()
    hadoopConf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, readSchema.json)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, readSchema.json)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    hadoopConf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key, sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readSchema, hadoopConf)
    hadoopConf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hadoopConf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hadoopConf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    hadoopConf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlConf.parquetFieldIdReadEnabled)
    hadoopConf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    val bc = spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    ParquetPartitionReaderFactory(sqlConf, bc, dataSchema, readSchema,
      new StructType(), filters, None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }
}
