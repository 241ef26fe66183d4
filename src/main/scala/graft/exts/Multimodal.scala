package graft.exts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (north star extension): image/audio/video
  * payloads are opaque `binary` columns with typed metadata structs.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): [[DecodeStub.decode]] produces deterministic fake features
  * from the raw bytes. Everything around it — schema, batch-shaped
  * per-partition processing, partitioned layout, frame sampling — is real
  * Spark plumbing and tested.
  *
  * Scale shape: payload work runs in `mapPartitions` (one decoder
  * instantiation per partition, batch iteration — the same shape a Pandas
  * UDF / `mapInPandas` has in PySpark); metadata-only operators
  * (dimensions, byte lengths) are codegen'd column expressions that never
  * touch the payload bytes beyond `length`.
  */
object Multimodal {

  /** A media asset row: opaque payload + typed metadata. */
  final case class MediaAsset(
      doc_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      byte_len: Long)

  /** Extracted feature row (the decode-stub output). */
  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_frames: Int,
      mean_byte: Double,
      head_checksum: Long)

  /** Deterministic fake decoder — the stub behind which a real codec
    * (JPEG decode / audio resample / video frame extraction) would sit. */
  object DecodeStub {
    /** STUB: a real implementation would decode `media` with an image or
      * AV codec; this derives deterministic features from raw bytes so the
      * plumbing is testable offline. */
    def decode(media: Array[Byte]): (Int, Double, Long) = {
      val nFrames = 1 + (media.length % 16)
      val mean =
        if (media.isEmpty) 0.0
        else media.map(b => (b & 0xff).toLong).sum.toDouble / media.length
      var checksum = 0L
      var i = 0
      val n = math.min(media.length, 64)
      while (i < n) { checksum = checksum * 131 + (media(i) & 0xff); i += 1 }
      (nFrames, mean, checksum)
    }
  }

  /** Build media assets from documents: payload = UTF-8 bytes of the text
    * (stands in for an image blob), metadata derived arithmetically. */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") * 7 % 480 + 16).cast("int").as("height"),
      octet_length(col("text")).cast("long").as("byte_len"))
      .as[MediaAsset]
  }

  /** Metadata-only projection (never deserializes the payload). */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).toDF()
      .select("doc_id", "format", "width", "height", "byte_len")

  /** Feature extraction: batch-shaped decode over partitions — the Spark
    * analog of a Pandas UDF batch loop. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // one decoder per partition (stub has no state; a real codec would)
      batch.map { a =>
        val (nFrames, mean, checksum) = DecodeStub.decode(a.media)
        MediaFeatures(a.doc_id, a.format, nFrames, mean, checksum)
      }
    }
  }

  /** Frame sampling: pick k evenly-spaced "frames" (byte offsets) from the
    * payload — deterministic, O(k) per asset. */
  def sampleFrames(assets: Dataset[MediaAsset], k: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val n = a.media.length
      if (n == 0) Seq.empty
      else (0 until k).map { i =>
        val off = (i.toLong * n / k).toInt
        (a.doc_id, i, off, a.media(off) & 0xff)
      }
    }.toDF("doc_id", "frame_idx", "byte_offset", "frame_byte")
  }

  /** Audio-style windowing: fixed-size sample windows over the payload
    * with per-window energy (mean centered-byte magnitude) — the
    * frame/hop batch shape an audio featurizer (MFCC, VAD) runs in.
    * STUB math over raw bytes (no audio codec in this environment); the
    * tiling, per-window iteration, and output schema are the real
    * plumbing. O(payload bytes) per asset, no shuffle. */
  def audioWindows(assets: Dataset[MediaAsset],
      windowBytes: Int = 256): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.media.grouped(windowBytes).zipWithIndex.map { case (w, i) =>
        val energy =
          if (w.isEmpty) 0L
          else w.map(b => math.abs((b & 0xff) - 128).toLong).sum / w.length
        (a.doc_id, i, w.length, energy)
      }
    }.toDF("doc_id", "window_idx", "n_bytes", "energy")
  }

  /** Resize stub: metadata-level resize (a real one transforms pixels).
    * Integer arithmetic only (`w·maxDim div max(w,h)`, floor), so the
    * DuckDB oracle reproduces every pixel dimension exactly — no float
    * scale whose rounding could differ at a boundary. */
  def resizeMeta(assets: Dataset[MediaAsset], maxDim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val m = math.max(a.width, a.height)
      if (m <= maxDim) (a.doc_id, a.width, a.height, a.width, a.height)
      else (a.doc_id, a.width, a.height,
        math.max(1, a.width * maxDim / m),
        math.max(1, a.height * maxDim / m))
    }.toDF("doc_id", "width", "height", "resized_w", "resized_h")
  }
}
