package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the decode / feature-extract / frame-sample plumbing
  * a training pipeline hangs off them.
  *
  * IMAGE decode is REAL: [[imageDecode]] reads PNG/JPEG/GIF/BMP through the
  * JVM's own `javax.imageio` readers (offline-safe, no container codecs).
  * Audio/video and exotic image codecs still route through the
  * clearly-marked DETERMINISTIC FAKE ([[fakeDecode]]) — ffmpeg-class
  * libraries are not in this container — and everything Spark-side (schema,
  * batch iteration, partitioning, explode shape) is real and tested either
  * way; swapping the fake for a JNI/FFI codec changes one function.
  */
object Multimodal {

  /** Media row: opaque payload + source metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Decoded metadata a real image decoder would return. */
  case class DecodedMeta(doc_id: Long, width: Int, height: Int,
                         channels: Int, n_bytes: Long)

  /** Attach a binary payload column (here derived from text — the harness
    * has no real media; a production reader maps parquet `binary` directly).
    */
  def withPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** Media rows straight from a directory of files: the `binaryFile` source
    * (one row per file, whole-payload) mapped into the pipeline's media
    * shape. doc_id is a stable hash of the path — files carry no natural
    * long key; mime from the extension (a production reader sniffs magic
    * bytes in the decoder).
    */
  def fromBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                    glob: String = "*"): DataFrame = {
    // extension of the BASENAME only — splitting the whole path on '.'
    // would make /data/v1.2/photo yield mime "application/2/photo"; an
    // extensionless basename falls back to octet-stream (the default
    // mediaFromText uses)
    val base = element_at(split(col("path"), "/"), -1)
    val ext = regexp_extract(base, "\\.([A-Za-z0-9]+)$", 1)
    graft.sources.Sources.binaryDir(spark, dir, glob).select(
      xxhash64(col("path")).as("doc_id"),
      col("content").as("payload"),
      when(ext =!= "", concat(lit("application/"), lower(ext)))
        .otherwise(lit("application/octet-stream")).as("mime"))
  }

  /** Columnar "decode": deterministic metadata from the payload bytes, kept
    * as pure expressions so the scan+decode stays whole-stage-codegen'd.
    * width/height formulas are the FAKE — a real decoder reads the header.
    */
  def decodeMeta(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("width", (pmod(col("n_bytes"), lit(640)) + 1).cast("int"))
      .withColumn("height", (pmod(col("n_bytes") * 7, lit(480)) + 1).cast("int"))
      .withColumn("channels", lit(3))

  /** FAKE image decode for one payload — stands in for the real codec call
    * (libjpeg/ffmpeg are not in this container). Deterministic in the bytes.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length.toLong
    ((n % 640 + 1).toInt, (n * 7 % 480 + 1).toInt, 3)
  }

  /** REAL image decode via `javax.imageio` (VERDICT r12 #5): PNG / JPEG /
    * GIF / BMP readers ship WITH the JVM, so this is offline-safe native
    * decoding, no container codecs needed — width/height/channels come
    * from the actual image header and raster. `None` when ImageIO has no
    * reader for the bytes (not an image, or a codec outside the JVM's
    * built-ins — route those to [[fakeDecode]] or a dead letter).
    */
  def imageDecode(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      .map(img => (img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents))
    // NonFatal, not just IOException: ImageIO plugin readers throw runtime
    // exceptions (ArrayIndexOutOfBounds, IllegalArgument, CMYK-JPEG CMM
    // errors) on malformed/truncated payloads — one bad byte stream in a
    // corpus must fall through to the fake/dead-letter path, not fail the
    // whole Spark task
    catch { case scala.util.control.NonFatal(_) => None }

  /** Decoded audio metadata a real audio decoder returns. */
  case class AudioMeta(doc_id: Long, sample_rate: Double, channels: Int,
                       frames: Long, n_bytes: Long)

  /** REAL audio header decode via `javax.sound.sampled` (WAV / AIFF / AU
    * readers ship with the JVM — offline-safe): (sampleRate, channels,
    * frameLength) from the actual container header. `None` for formats
    * outside the JVM's built-ins (mp3/ogg/flac — ffmpeg-class, still the
    * documented fake).
    */
  def audioDecode(payload: Array[Byte]): Option[(Double, Int, Long)] =
    try {
      val f = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      Some((f.getFormat.getSampleRate.toDouble, f.getFormat.getChannels,
        f.getFrameLength.toLong))
    } catch {
      // NonFatal for the same reason as [[imageDecode]]: header parsers
      // throw runtime exceptions on truncated/hostile containers
      case scala.util.control.NonFatal(_) => None
    }

  /** Batch audio-metadata decode, same once-per-partition shape as
    * [[decodePartitionedReal]]; unreadable payloads report zeroed metadata
    * (rows keep flowing — filter `frames > 0` for the decoded subset).
    */
  def audioDecodePartitioned(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (sr, ch, fr) = audioDecode(m.payload).getOrElse((0.0, 0, 0L))
        AudioMeta(m.doc_id, sr, ch, fr, m.payload.length.toLong)
      }
    }
  }

  /** [[decodePartitioned]] with the REAL codec: ImageIO-readable payloads
    * decode for real; anything else falls back to the deterministic fake,
    * so mixed corpora keep the pipeline total. Same mapPartitions shape —
    * ImageIO's reader registry initializes per executor, rows stream
    * through with no per-row setup.
    */
  def decodePartitionedReal(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, c) = imageDecode(m.payload).getOrElse(fakeDecode(m.payload))
        DecodedMeta(m.doc_id, w, h, c, m.payload.length.toLong)
      }
    }
  }

  /** The batch-decode plumbing a real codec needs: `mapPartitions` so the
    * (expensive, native) decoder initializes ONCE per partition and streams
    * the partition's rows through — the Scala analogue of a pandas-batched
    * UDF. This is the hot-path shape at 100 TB: no per-row codec setup, no
    * driver involvement, partition-parallel.
    */
  def decodePartitioned(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, close at iterator end
      rows.map { m =>
        val (w, h, c) = fakeDecode(m.payload)
        DecodedMeta(m.doc_id, w, h, c, m.payload.length.toLong)
      }
    }
  }

  /** Frame sampling: one row per sampled frame index — `explode(sequence)`
    * keeps it a generator (no shuffle), and downstream per-frame decode
    * parallelizes over the exploded rows.
    */
  def sampleFrames(df: DataFrame, everyNth: Int, totalFramesCol: String): DataFrame =
    df.withColumn("frame_idx", explode(
      when(col(totalFramesCol) > 0,
        sequence(lit(0), col(totalFramesCol) - 1, lit(everyNth)))
        .otherwise(array()))) // zero-frame media contributes no rows

  /** Uniform-N frame-sampling plan — the fixed-budget variant of
    * [[sampleFrames]] (video-LM preprocessing samples a FIXED clip budget,
    * e.g. 16 frames, regardless of clip length; every-Nth sampling yields
    * unbounded frames on long videos): slot i of n maps to frame
    * `(i·(total-1)) div (n-1)` — first and last frame always included,
    * spacing uniform, pure integer math so the plan is exact and
    * engine-replayable. Clips with fewer than n frames emit every frame
    * (slots stay dense); zero-frame media emits nothing. One row per
    * (doc, slot): a generator off the metadata projection, no shuffle —
    * the downstream per-frame decode parallelizes over the exploded rows.
    */
  def uniformFramePlan(df: DataFrame, n: Int, totalFramesCol: String,
                       idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, s"frame budget must be >= 2, got $n")
    val total = col(totalFramesCol).cast("long")
    df.filter(total > 0)
      .withColumn("__total", total)
      .withColumn("slot",
        explode(sequence(lit(0L), least(col("__total"), lit(n.toLong)) - 1)))
      .withColumn("frame_idx",
        when(col("__total") <= n, col("slot"))
          .otherwise(expr(s"(slot * (__total - 1)) div ${n - 1}")))
      .select(col(idCol), col("slot"), col("frame_idx"))
  }

  /** Aspect-preserving resize + centered letterbox plan onto a `target` x
    * `target` canvas — the REAL preprocessing arithmetic (the only fake in
    * this module is the codec): the long side maps to `target`, the short
    * side scales round-half-up in pure integer math
    * ((2·short·target + long) div (2·long) — no doubles, so the plan is
    * exact, engine-replayable, and identical on every shard), floored at 1
    * px; pad_x/pad_y center the result. Zero shuffle — fuses into the
    * decode projection; the pixel resample itself belongs to the decoder.
    */
  def resizePlan(df: DataFrame, target: Int): DataFrame = {
    require(target >= 1, s"target must be >= 1, got $target")
    def scaled(short: String, long: String) = greatest(lit(1L), expr(
      s"(2 * CAST($short AS BIGINT) * $target + CAST($long AS BIGINT))" +
        s" div (2 * CAST($long AS BIGINT))"))
    df
      .withColumn("out_w", when(col("width") >= col("height"), lit(target.toLong))
        .otherwise(scaled("width", "height")))
      .withColumn("out_h", when(col("width") >= col("height"), scaled("height", "width"))
        .otherwise(lit(target.toLong)))
      .withColumn("pad_x", expr(s"($target - out_w) div 2"))
      .withColumn("pad_y", expr(s"($target - out_h) div 2"))
  }
}
