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
}
