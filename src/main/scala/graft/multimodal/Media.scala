package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages run as
  * partition-batched functions over those binaries.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch shape (mapPartitions processes a whole partition per call, the
  * Scala analog of a pandas-batched UDF). The actual codec work is STUBBED
  * behind [[MediaCodec]]: this container has no image/audio libraries, so
  * decode parses a deterministic fake header instead of calling a real
  * decoder. Swap [[MediaCodec.decode]]'s body for JavaCV/ImageIO in
  * production; every signature and plan stays the same.
  */
object Media {

  /** Typed metadata extracted from a media binary. */
  case class MediaMeta(kind: String, width: Int, height: Int, frames: Int)

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte])

  case class DecodedRow(media_id: Long, kind: String, width: Int,
                        height: Int, frames: Int, payload_bytes: Int)

  case class FeatureRow(media_id: Long, features: Array[Float])

  /** ==== the stub boundary ==== */
  object MediaCodec extends Serializable {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

    /** Render a fake media binary: 4-byte magic, kind byte, w/h/frames as
      * big-endian ints, then payload. Stands in for a real container
      * format so the pipeline has realistic opaque bytes to move.
      */
    def encodeFake(kind: String, width: Int, height: Int, frames: Int,
                   payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 1 + 12 + payload.length)
      bb.put(Magic).put(kindByte(kind))
        .putInt(width).putInt(height).putInt(frames)
        .put(payload)
      bb.array()
    }

    /** STUB: parses the fake header. A real implementation would call an
      * image/audio/video library here (e.g. ImageIO.read / JavaCV grab) —
      * unavailable in this container by design.
      */
    def decode(media: Array[Byte]): MediaMeta = {
      val bb = java.nio.ByteBuffer.wrap(media)
      val magic = new Array[Byte](4)
      bb.get(magic)
      require(java.util.Arrays.equals(magic, Magic), "not a GRFT container")
      val kind = kindName(bb.get())
      MediaMeta(kind, bb.getInt, bb.getInt, bb.getInt)
    }

    /** STUB feature extractor: a 16-bin byte histogram of the payload,
      * L1-normalized — deterministic stand-in for a real embedding model.
      */
    def features(media: Array[Byte], bins: Int = 16): Array[Float] = {
      val hist = new Array[Float](bins)
      var i = 17 // skip header
      while (i < media.length) {
        hist(((media(i) & 0xFF) * bins) / 256) += 1f
        i += 1
      }
      val total = math.max(media.length - 17, 1).toFloat
      hist.map(_ / total)
    }

    /** STUB frame sampler: returns n evenly-spaced payload slices (a real
      * impl would seek/decode frames).
      */
    def sampleFrames(media: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val payload = java.util.Arrays.copyOfRange(media, 17, media.length)
      if (payload.isEmpty || n <= 0) Seq.empty
      else {
        val step = math.max(payload.length / n, 1)
        (0 until math.min(n, payload.length)).map { i =>
          java.util.Arrays.copyOfRange(payload, i * step,
            math.min(i * step + step, payload.length))
        }
      }
    }

    private def kindByte(k: String): Byte = k match {
      case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
    }
    private def kindName(b: Byte): String = b match {
      case 1 => "image"; case 2 => "audio"; case 3 => "video"; case _ => "blob"
    }
  }

  /** Deterministic fake media table derived from any long-id source —
    * executor-side generation, arbitrary scale.
    */
  def fakeMediaTable(spark: SparkSession, n: Long,
                     partitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions)
               else spark.range(n)
    base.map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 64 + (graft.corpus.Corpus.mix(i) & 0x3F).toInt
      val h = 64 + (graft.corpus.Corpus.mix(i * 7) & 0x3F).toInt
      val frames = 1 + (graft.corpus.Corpus.mix(i * 13) & 0x0F).toInt
      val payload = Array.tabulate(256)(j =>
        (graft.corpus.Corpus.mix(i * 1009 + j) & 0xFF).toByte)
      MediaRow(i, kind, MediaCodec.encodeFake(kind, w, h, frames, payload))
    }
  }

  /** decode stage: partition-batched (one call per partition = the batch
    * shape a pandas UDF would get), binary in → typed metadata out.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val m = MediaCodec.decode(r.media)
        DecodedRow(r.media_id, m.kind, m.width, m.height, m.frames,
          r.media.length - 17)
      }
    }
  }

  /** feature-extract stage: binary → fixed-width Array[Float] embedding
    * column, ready for the ANN operators (q_embed_cosine_topk shape).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      FeatureRow(r.media_id, MediaCodec.features(r.media))))
  }

  /** frame-sample stage: one row per sampled frame (exploded), each frame
    * an opaque binary — the shape a video-pretraining pipeline feeds to
    * per-frame encoders.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      MediaCodec.sampleFrames(r.media, n).zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, frame)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
