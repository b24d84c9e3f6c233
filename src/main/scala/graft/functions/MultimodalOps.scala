package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * binary columns with typed metadata; decode / feature-extract runs
  * batch-wise in executor partitions (the Scala analog of `mapInPandas`).
  *
  * IMAGE HEADER decode is REAL: [[ImageHeader.decode]] parses PNG/JPEG/
  * GIF/BMP container headers (pure byte parsing, no libraries) for true
  * dimensions. Pixel decode and audio/video remain STUBBED (this container
  * has no media libraries): [[FakeDecoder.decode]] derives deterministic
  * pseudo-metadata from the bytes. The Spark-side plumbing — binary column
  * handling, partition-batched processing, typed output schema — is real
  * and tested; swapping the stub for a JNI/javacv decoder changes nothing
  * structural.
  */
object MultimodalOps {

  /** Real container-header parsing for the common image formats — enough
    * to type and dimension an image column without any pixel decode.
    */
  object ImageHeader {
    private def beU32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    private def beU16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    private def leU16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    private def leI32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (format, width, height) from the container header, or None when the
      * bytes are not a recognized image.
      */
    def decode(b: Array[Byte]): Option[(String, Int, Int)] = {
      if (b == null || b.length < 10) return None
      // PNG: 8-byte signature, then the IHDR chunk (len+type+payload):
      // width/height are the first two big-endian u32s of the payload
      if (b.length >= 24 && java.util.Arrays.equals(java.util.Arrays.copyOf(b, 8), PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        return Some(("png", beU32(b, 16).toInt, beU32(b, 20).toInt))
      // GIF87a/GIF89a: logical screen descriptor, little-endian u16s
      if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        return Some(("gif", leU16(b, 6), leU16(b, 8)))
      // BMP: "BM" + BITMAPINFOHEADER (width/height at 18/22, LE i32;
      // height may be negative for top-down rows)
      if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
        return Some(("bmp", leI32(b, 18), math.abs(leI32(b, 22))))
      // JPEG: FF D8, then marker segments; dimensions live in the first
      // SOFn marker (C0-CF except DHT C4, JPG C8, DAC CC):
      // [len u16][precision u8][height u16][width u16]
      if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 9 < b.length) {
          if ((b(i) & 0xff) != 0xff) return None // desynced — not a marker
          val marker = b(i + 1) & 0xff
          if (marker == 0xff) { i += 1 } // fill bytes before a marker
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
            i += 2 // standalone markers have no length field
          } else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            return Some(("jpeg", beU16(b, i + 7), beU16(b, i + 5)))
          } else if (marker == 0xd9 || marker == 0xda) {
            return None // EOI / entropy-coded data reached before any SOF
          } else {
            i += 2 + beU16(b, i + 2) // skip the segment (len includes itself)
          }
        }
        return None
      }
      None
    }
  }

  /** Typed metadata extracted per media blob. `format`/`width`/`height`
    * are REAL for recognized image containers ("opaque"/0/0 otherwise);
    * the fake_* fields are the deterministic stub for un-decodable media.
    */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      header: Int, // first byte — a real decoder reads the container magic
      fake_width: Int,
      fake_height: Int,
      fake_frames: Int,
      format: String = "opaque",
      width: Int = 0,
      height: Int = 0
  )

  /** STUB decoder: deterministic pseudo-decode of an opaque media blob.
    * A real implementation would parse the container and hand pixel/PCM
    * buffers to a feature extractor.
    */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val header = if (n > 0) bytes(0) & 0xff else 0
      val img = ImageHeader.decode(bytes)
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        header = header,
        fake_width = 64 + (n % 576),
        fake_height = 64 + (header % 416),
        fake_frames = 1 + (n % 16),
        format = img.map(_._1).getOrElse("opaque"),
        width = img.map(_._2).getOrElse(0),
        height = img.map(_._3).getOrElse(0)
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
