package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * binary columns with typed metadata; decode / feature-extract runs
  * batch-wise in executor partitions (the Scala analog of `mapInPandas`).
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[FakeDecoder.decode]] derives deterministic pseudo-metadata
  * from the bytes. The Spark-side plumbing — binary column handling,
  * partition-batched processing, typed output schema — is real and tested;
  * swapping the stub for a JNI/javacv decoder changes nothing structural.
  */
object MultimodalOps {

  /** Typed metadata extracted per media blob. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      header: Int, // first byte — a real decoder reads the container magic
      fake_width: Int,
      fake_height: Int,
      fake_frames: Int
  )

  /** STUB decoder: deterministic pseudo-decode of an opaque media blob.
    * A real implementation would parse the container and hand pixel/PCM
    * buffers to a feature extractor.
    */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val header = if (n > 0) bytes(0) & 0xff else 0
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        header = header,
        fake_width = 64 + (n % 576),
        fake_height = 64 + (header % 416),
        fake_frames = 1 + (n % 16)
      )
    }
  }

  /** Batch media-metadata extraction over (doc_id, payload binary) —
    * partition-parallel, no shuffle, no driver involvement.
    */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeDecoder.decode(id, bytes) })
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int, frame_bytes: Array[Byte])

  /** Frame sampling: decode (stubbed) the payload's frame count, keep
    * every `everyNth` frame, emit one row per kept frame. The fan-out is
    * partition-local (flatMap, no shuffle); a real decoder would hand
    * pixel buffers where the stub slices the payload deterministically.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val meta = FakeDecoder.decode(id, bytes)
        val n = meta.fake_frames
        val sliceLen = math.max(1, bytes.length / math.max(1, n))
        (0 until n by everyNth).iterator.map { f =>
          val start = math.min(bytes.length, f * sliceLen)
          val end = math.min(bytes.length, start + sliceLen)
          Frame(id, f, meta.fake_width, meta.fake_height,
            java.util.Arrays.copyOfRange(bytes, start, end))
        }
      })
  }

  /** STUB resize: a real implementation rescales pixel buffers; the stub
    * re-tags dimensions and truncates the blob proportionally, keeping
    * the (batch-shaped, partition-local) plumbing identical.
    */
  def resizeFrames(spark: SparkSession, frames: Dataset[Frame], w: Int, h: Int): Dataset[Frame] = {
    import spark.implicits._
    frames.mapPartitions(_.map { fr =>
      val scale = math.min(1.0, (w.toLong * h).toDouble / math.max(1L, fr.width.toLong * fr.height))
      val keep = math.max(1, (fr.frame_bytes.length * scale).toInt)
      fr.copy(width = w, height = h,
        frame_bytes = java.util.Arrays.copyOf(fr.frame_bytes, math.min(keep, fr.frame_bytes.length)))
    })
  }

  /** Per-frame feature vector. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, features: Array[Float])

  /** STUB feature extraction: deterministic pseudo-embedding (hash-seeded)
    * per frame — the real version runs a vision model batch per partition.
    * Output shape (fixed dim, one row per frame) is what downstream
    * similarity search consumes.
    */
  def extractFeatures(spark: SparkSession, frames: Dataset[Frame], dim: Int = 16): Dataset[FrameFeatures] = {
    import spark.implicits._
    frames.mapPartitions(_.map { fr =>
      val seed = java.util.Arrays.hashCode(fr.frame_bytes).toLong ^ (fr.doc_id << 20) ^ fr.frame_idx
      val rnd = new scala.util.Random(seed)
      FrameFeatures(fr.doc_id, fr.frame_idx, Array.fill(dim)(rnd.nextFloat()))
    })
  }
}
