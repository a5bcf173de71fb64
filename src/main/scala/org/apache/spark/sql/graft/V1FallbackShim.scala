package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Public re-export of the `private[sql]` V1-fallback streaming seam
  * (`V2TableWithV1Fallback`, public in bytecode): the analyzer's
  * `readStream.table(...)` path and `DataStreamWriter.toTable` both
  * route a table implementing it through its `v1Table`'s PROVIDER —
  * the stable V1 Stream{Source,Sink}Provider surface — whenever the V2
  * table lacks MICRO_BATCH_READ / STREAMING_WRITE. Same shim-package
  * pattern as [[GraftChangeFeedSource]]/[[GraftStreamSink]], which sit
  * on the matching source/sink seam.
  */
trait V1FallbackTable extends V2TableWithV1Fallback
