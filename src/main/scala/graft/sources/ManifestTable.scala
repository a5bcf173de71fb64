package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal manifest-committed table — the transactional-MERGE seam the CDC
  * sinks need without a lakehouse dependency (SURVEY.md §7.4.2 calls a
  * transactional format's MERGE "the production endgame"; this is its
  * smallest honest core, the same commit protocol Iceberg/Delta build on:
  * immutable data versions + an atomically-published pointer).
  *
  * Layout under `root/`:
  * {{{
  *   v00000001/ v00000002/ ...   immutable data version dirs (never mutated
  *                               after their manifest is published)
  *   _manifest.00000002          the COMMIT: one small text file per version,
  *                               lines of "partitionDir<TAB>dataVersion"
  *                               ("" for a non-partitioned snapshot)
  * }}}
  * Readers resolve the HIGHEST-numbered manifest and assemble the table
  * from the partition→version entries; a partition untouched since v1 still
  * points at v1's files, so a partition-pruned merge commit costs O(touched
  * partitions) I/O — the [[graft.cdc.Dispatch.runPartitioned]] scale shape —
  * while the whole table flips versions atomically.
  *
  * Crash consistency (the property the old `.pbak` per-partition swap only
  * approximated): a manifest file APPEARS atomically — it is staged to a
  * dot-temp name and `rename`d into place, and rename within a directory is
  * atomic on every local FS and HDFS — and data versions are only ever
  * written under a version number no manifest references yet. So a crash at
  * ANY instant leaves either the old manifest (orphan data dir, reclaimed
  * by the next commit/vacuum) or the new one (commit complete); no reader
  * ever observes a partial swap, and no recovery pass is needed at startup.
  * Single-writer per table, like every manifest-pointer design without a
  * lock service; object stores without atomic rename would need a
  * conditional-put pointer instead (documented tradeoff).
  */
object ManifestTable {

  private val ManifestPrefix = "_manifest."
  private def fmt(v: Long) = f"$v%08d"
  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Highest committed version, or None for a table that has never
    * committed (orphan data dirs from a crashed first commit don't count —
    * only a manifest makes a version real).
    */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) None
    else {
      val vs = fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith(ManifestPrefix))
        .map(_.stripPrefix(ManifestPrefix).toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def exists(spark: SparkSession, root: String): Boolean =
    currentVersion(spark, root).isDefined

  /** partitionDirName → data version of the given manifest. */
  private def entriesOf(fs: FileSystem, root: Path, v: Long): Map[String, Long] = {
    val in = fs.open(new Path(root, ManifestPrefix + fmt(v)))
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(name, ver) = line.split("\t", 2)
      name -> ver.toLong
    }.toMap
  }

  /** The committed table as of the current manifest. `schema` pins column
    * types across versions (include the partition column — Spark resolves
    * it from the hive-style dir names). Partition dirs group by their data
    * version so each version contributes ONE scan relation listing only its
    * live partitions — the partition-pruned read.
    */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"manifest table $root has no committed version"))
    val (fs, rootP) = fsOf(spark, root)
    val entries = entriesOf(fs, rootP, v)
    if (entries.isEmpty) {
      // a committed version whose snapshot held zero partitions (e.g. an
      // all-invalid first batch) — an empty table, not an error
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else if (entries.keySet == Set("")) {
      spark.read.schema(schema).parquet(s"$root/v${fmt(entries(""))}")
    } else {
      entries.groupBy(_._2).map { case (dv, parts) =>
        val base = s"$root/v${fmt(dv)}"
        spark.read.option("basePath", base).schema(schema)
          .parquet(parts.keys.toSeq.sorted.map(p => s"$base/$p"): _*)
      }.reduce(_ unionByName _)
    }
  }

  /** Commit `df` as the next version. `partCol = Some(c)`: `df` must hold
    * the FULL content of every partition it touches (the
    * [[graft.ops.Upsert.mergePartitionPruned]] output contract) — untouched
    * partitions carry forward from the previous manifest untouched on disk.
    * `None`: `df` is a whole-table snapshot. Returns the committed version.
    *
    * Leftovers of a crashed previous attempt at the SAME version number
    * (data dir without a manifest) are deleted and rewritten — the replay
    * converges because the version only becomes visible at the final
    * rename.
    *
    * `carryForward = false` publishes a manifest referencing ONLY this
    * version's partitions (a full-snapshot rewrite — the [[compact]]
    * contract) instead of merging untouched entries from the previous
    * manifest.
    */
  def commit(df: DataFrame, root: String, partCol: Option[String],
             carryForward: Boolean = true): Long = {
    val spark = df.sparkSession
    val (fs, rootP) = fsOf(spark, root)
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(1L)
    val vdir = new Path(rootP, "v" + fmt(next))
    fs.delete(vdir, true)
    partCol match {
      case Some(pc) => df.write.partitionBy(pc).mode("overwrite").parquet(vdir.toString)
      case None => df.write.mode("overwrite").parquet(vdir.toString)
    }
    val touched: Map[String, Long] = partCol match {
      case Some(_) => fs.listStatus(vdir)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .map(_.getPath.getName -> next).toMap
      case None => Map("" -> next)
    }
    val prev =
      if (partCol.isDefined && carryForward)
        currentVersion(spark, root) // re-listed: still < next by single-writer
          .map(v => entriesOf(fs, rootP, v)).getOrElse(Map.empty[String, Long])
      else Map.empty[String, Long]
    val merged = prev ++ touched
    val body = merged.toSeq.sortBy(_._1)
      .map { case (n, dv) => s"$n\t$dv" }.mkString("", "\n", "\n")
    val tmp = new Path(rootP, s".manifest-$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(rootP, ManifestPrefix + fmt(next))
    require(fs.rename(tmp, dst),
      s"manifest commit rename $tmp -> $dst failed — table stays at the previous version")
    next
  }

  /** OPTIMIZE — small-file compaction: rewrite the CURRENT snapshot into a
    * fresh version with bounded file counts (`filesPerPartition` files per
    * partition dir; for a non-partitioned table, that many files total) and
    * commit it atomically. Rows are identical before and after; readers
    * flip at the manifest rename, the fragmented versions stay readable
    * until [[vacuum]]. The compacted manifest references ONLY the new
    * version (`carryForward = false`), so compact-then-vacuum reclaims
    * every old dir — the bounded-retention pair for a long-lived CDC
    * target whose per-batch merge commits accrete small files.
    *
    * Scale: one scan of live data, one shuffle keyed on the partition
    * column (plus a row-hash salt when `filesPerPartition > 1` — hot
    * partitions spread over that many writers), one write. Run out-of-band
    * at a cadence set by the small-file rate, like any OPTIMIZE; the
    * single-writer contract covers it like every other commit.
    */
  def compact(spark: SparkSession, root: String, schema: StructType,
              partCol: Option[String], filesPerPartition: Int = 1): Long = {
    require(filesPerPartition >= 1, s"filesPerPartition=$filesPerPartition")
    import org.apache.spark.sql.functions._
    val df = read(spark, root, schema)
    val out = partCol match {
      case Some(pc) if filesPerPartition == 1 => df.repartition(col(pc))
      case Some(pc) => df.repartition(col(pc),
        pmod(xxhash64(schema.fieldNames.filterNot(_ == pc).map(col).toSeq: _*),
          lit(filesPerPartition.toLong)))
      case None => df.repartition(filesPerPartition)
    }
    commit(out, root, partCol, carryForward = false)
  }

  /** Reclaim data versions no entry of the CURRENT manifest references and
    * manifests older than the current one (plus stray commit temp files) —
    * bounded retention for a long-lived table. Safe under the single-writer
    * contract: a concurrent READER that resolved the current manifest only
    * reads versions it references, all retained here.
    */
  def vacuum(spark: SparkSession, root: String): Unit = {
    currentVersion(spark, root).foreach { cur =>
      val (fs, rootP) = fsOf(spark, root)
      val live = entriesOf(fs, rootP, cur).values.toSet
      fs.listStatus(rootP).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit)
            && !live.contains(n.drop(1).toLong))
          fs.delete(st.getPath, true)
        else if (n.startsWith(ManifestPrefix) && n.stripPrefix(ManifestPrefix).toLong < cur)
          fs.delete(st.getPath, false)
        else if (n.startsWith(".manifest-") && n.endsWith(".tmp"))
          fs.delete(st.getPath, false)
      }
    }
  }
}
