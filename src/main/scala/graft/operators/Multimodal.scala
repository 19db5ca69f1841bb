package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Section C (part 4) of SURVEY §2: multimodal column plumbing.
  *
  * Media (image/audio/video) are opaque `binary` columns + typed metadata.
  * The Spark-side plumbing is real — schema, partition-parallel decode via
  * typed Dataset transforms (the Scala analog of `mapInPandas` batch UDFs),
  * deterministic frame sampling — while the codec itself is a clearly-marked
  * STUB (no image/audio libraries in this environment): `decodeStub` derives
  * metadata deterministically from the bytes, standing in for a JPEG/WAV
  * header parse. Swapping in a real codec changes only the function body;
  * every schema and shuffle stays as-is.
  *
  * Scale: decode is embarrassingly parallel (mapPartitions, no shuffle);
  * frame sampling explodes bounded per-asset rows (stride-capped), so output
  * volume is a controlled multiple of input.
  */
object Multimodal {

  /** Raw media asset: id + opaque payload (here: utf8 bytes of `text`,
    * standing in for an encoded image/video). */
  case class Asset(doc_id: Long, payload: Array[Byte])

  /** Typed decode result — what a real header parse would return. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, n_frames: Int)

  /** STUB codec: deterministic pseudo-metadata from payload bytes.
    * A real implementation would parse the container header here. */
  def decodeStub(a: Asset): MediaMeta = {
    val n = a.payload.length
    val b0 = if (n > 0) a.payload(0) & 0xff else 0
    MediaMeta(
      doc_id = a.doc_id,
      n_bytes = n,
      width = 16 + (n % 624),
      height = 16 + ((n * 7 + b0) % 464),
      channels = 3,
      n_frames = 1 + (n % 24))
  }

  private def assets(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Asset]
  }

  /** Binary → typed metadata via partition-parallel typed map. */
  def decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).mapPartitions(_.map(decodeStub)).toDF()
  }

  /** Deterministic frame sampling: every 8th frame, max 4 per asset; each
    * sampled frame's payload slice is fingerprinted. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).flatMap { a =>
      val meta = decodeStub(a)
      val idxs = (0 until meta.n_frames by 8).take(4)
      idxs.map { i =>
        val start = (i * 41) % math.max(meta.n_bytes, 1)
        val len = math.min(64, meta.n_bytes - start)
        val slice = a.payload.slice(start, start + math.max(len, 0))
        val fp = java.security.MessageDigest.getInstance("MD5").digest(slice)
          .map("%02x".format(_)).mkString
        (a.doc_id, i, fp)
      }
    }.toDF("doc_id", "frame_idx", "frame_md5")
  }

  /** Audio-shaped path: payload as PCM-ish samples, hopping-window energy
    * features (256-byte windows, 128-byte hop) — integer math, one row per
    * window, bounded at 8 windows/asset. The feature-extraction shape a real
    * audio pipeline runs (decode → frame → per-frame features). */
  def audioWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).flatMap { a =>
      val bytes = a.payload
      val win = 256; val hop = 128
      val starts = (0 until math.max(bytes.length - win + 1, 1) by hop).take(8)
      starts.map { st =>
        val end = math.min(st + win, bytes.length)
        var energy = 0L
        var i = st
        while (i < end) { val c = (bytes(i) & 0xff) - 128; energy += c.toLong * c; i += 1 }
        (a.doc_id, st / hop, end - st, energy)
      }
    }.toDF("doc_id", "window_idx", "n_samples", "energy")
  }

  // Rows-only checks: the decode stub stands in for a native codec, which an
  // ANSI-SQL oracle could not replay once real.
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> (decode _),
    "mm_frame_sample" -> (frameSample _),
    "mm_audio_windows" -> (audioWindows _))

  def oracles: Map[String, String] = Map.empty
}
