package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * binary columns with typed metadata; decode / feature-extract runs
  * batch-wise in executor partitions (the Scala analog of `mapInPandas`).
  *
  * IMAGE decode is REAL end to end: [[ImageHeader.decode]] parses
  * PNG/JPEG/GIF/BMP container headers byte-wise for dimensions without
  * touching pixels, and [[PixelOps]] decodes, rescales (bilinear) and
  * featurizes actual pixel buffers with pure-JDK `javax.imageio` — frame
  * sampling reads an animated GIF's true frame count. AUDIO decode is
  * real for PCM WAV payloads: [[PcmOps]] decodes 8/16/24/32-bit and
  * float32 samples and featurizes them (duration/RMS/peak/zero-crossing
  * rate). Only compressed-audio (MP3/FLAC) payload decode and video
  * frame decode remain STUBBED (no codec libraries in this container):
  * [[FakeDecoder.decode]] derives deterministic pseudo-metadata for
  * opaque payloads. The Spark-side plumbing — binary column handling,
  * partition-batched processing, typed output schema — is identical on
  * both paths.
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

  /** Real container-header parsing for WAV/FLAC/MP3 audio and MP4
    * video — enough to type a media column and pull
    * rate/channel/dimension metadata without any sample decode.
    */
  object MediaHeader {
    private def leU16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    private def leU32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def beU32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** WAV: RIFF....WAVE, then chunks; the `fmt ` chunk carries
      * channels (u16 LE at +2) and sample rate (u32 LE at +4).
      * Returns (sampleRate, channels).
      */
    def decodeWav(b: Array[Byte]): Option[(Int, Int)] = {
      if (b == null || b.length < 36) return None
      if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val len = leU32(b, i + 4).toInt
        if (len < 0) return None // corrupt length would loop/walk backwards
        if (id == "fmt " && i + 8 + 8 <= b.length)
          return Some((leU32(b, i + 8 + 4).toInt, leU16(b, i + 8 + 2)))
        // Long advance: a huge (valid-sign) length must end the walk, not
        // wrap Int and index negative
        val next = i.toLong + 8L + len + (len & 1) // chunks are word-aligned
        if (next > b.length) return None
        i = next.toInt
      }
      None
    }

    /** MP4/ISO-BMFF: box walk for moov/trak/tkhd; the track header
      * carries presentation width/height as 16.16 fixed point at the
      * tail. Returns (width, height) of the first sized track.
      */
    def decodeMp4(b: Array[Byte]): Option[(Int, Int)] = {
      if (b == null || b.length < 16 || tag(b, 4) != "ftyp") return None

      def walk(start: Int, end: Int): Option[(Int, Int)] = {
        var i = start
        while (i + 8 <= end) {
          val size = beU32(b, i).toInt
          if (size < 8) return None // malformed/64-bit sizes: stop cleanly
          val boxEnd = math.min(end.toLong, i.toLong + size).toInt
          tag(b, i + 4) match {
            case "moov" | "trak" =>
              val r = walk(i + 8, boxEnd)
              if (r.isDefined) return r
            case "tkhd" if boxEnd - i >= 12 =>
              // fullbox: version(1)+flags(3); v0 → width/height are the
              // last two 32-bit fixed-point fields of the 84-byte body
              val version = b(i + 8) & 0xff
              val bodyLen = if (version == 1) 96 else 84
              if (i + 8 + bodyLen <= boxEnd) {
                val w = (beU32(b, i + 8 + bodyLen - 8) >> 16).toInt
                val h = (beU32(b, i + 8 + bodyLen - 4) >> 16).toInt
                if (w > 0 && h > 0) return Some((w, h))
              }
            case _ => ()
          }
          val next = i.toLong + size // huge sizes end the walk, no Int wrap
          if (next > end) return None
          i = next.toInt
        }
        None
      }
      walk(0, b.length)
    }

    /** FLAC: "fLaC" magic, then metadata blocks; STREAMINFO (type 0,
      * 34-byte body) packs the sample rate (20 bits) and channels-1
      * (3 bits) starting at body offset 10. Returns (sampleRate,
      * channels).
      */
    def decodeFlac(b: Array[Byte]): Option[(Int, Int)] = {
      if (b == null || b.length < 4 + 4 + 34) return None
      if (tag(b, 0) != "fLaC") return None
      var i = 4
      while (i + 4 <= b.length) {
        val isLast = (b(i) & 0x80) != 0
        val blockType = b(i) & 0x7f
        val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (blockType == 0) { // STREAMINFO
          val o = i + 4
          if (len < 34 || o + 34 > b.length) return None
          val rate = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) | ((b(o + 12) & 0xff) >> 4)
          val channels = ((b(o + 12) >> 1) & 0x7) + 1
          return if (rate > 0) Some((rate, channels)) else None
        }
        if (isLast) return None
        i += 4 + len
      }
      None
    }

    // MPEG audio sample rates by version bits (00=MPEG2.5, 01=reserved,
    // 10=MPEG2, 11=MPEG1) × rate-index bits
    private val Mp3Rates: Array[Array[Int]] = Array(
      Array(11025, 12000, 8000), null,
      Array(22050, 24000, 16000), Array(44100, 48000, 32000))

    /** MP3: optional ID3v2 tag (synchsafe size), then an MPEG audio frame
      * header — 11-bit sync, version/layer/rate-index bits, channel mode.
      * Returns (sampleRate, channels). Every reserved bit pattern is
      * rejected so arbitrary 0xFF-prefixed bytes don't sniff as audio.
      */
    def decodeMp3(b: Array[Byte]): Option[(Int, Int)] = {
      if (b == null || b.length < 4) return None
      var i = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        i = 10 + sz
      }
      if (i + 4 > b.length) return None
      if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return None
      val versionBits = (b(i + 1) >> 3) & 0x3
      val layerBits = (b(i + 1) >> 1) & 0x3
      if (versionBits == 1 || layerBits == 0) return None // reserved
      val rateIdx = (b(i + 2) >> 2) & 0x3
      if (rateIdx == 3) return None // reserved
      val bitrateIdx = (b(i + 2) >> 4) & 0xf
      if (bitrateIdx == 15) return None // reserved
      val channels = if (((b(i + 3) >> 6) & 0x3) == 3) 1 else 2
      Some((Mp3Rates(versionBits)(rateIdx), channels))
    }
  }

  /** REAL pixel operations for image payloads — pure-JDK `javax.imageio`
    * (PNG/JPEG/GIF/BMP/WBMP), no external libraries. Executors decode,
    * rescale and featurize actual pixel buffers; only compressed-audio
    * and video frame decode stay stubbed (no codec libraries here).
    */
  object PixelOps {
    javax.imageio.ImageIO.setUseCache(false) // no executor-local tmp files

    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.length == 0) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }

    /** Frame count of an animated payload (GIF), 1 for stills. */
    def frameCount(bytes: Array[Byte]): Option[Int] = {
      if (bytes == null || bytes.length == 0) return None
      val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(in)
          Some(math.max(1, r.getNumImages(true)))
        } finally r.dispose()
      } catch { case _: Exception => None } finally in.close()
    }

    /** Decode frame `idx` of an animated payload. */
    def decodeFrame(bytes: Array[Byte], idx: Int): Option[java.awt.image.BufferedImage] = {
      val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(in)
          Option(r.read(idx))
        } finally r.dispose()
      } catch { case _: Exception => None } finally in.close()
    }

    /** Bilinear rescale of real pixels to exactly w×h. */
    def resize(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    def toPng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Grayscale image over a raw luma plane (for re-encoding decoded
      * video frames through the image pipeline).
      */
    def grayImage(luma: Array[Byte], w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, luma)
      img
    }

    /** Rounded BT.601 luma plane of a decoded image, row-major. */
    def lumaBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          out(y * w + x) = math.min(255, math.round(lum)).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    /** `dim` mean-luminance block features over a grid covering the image
      * (the classic tiny-thumbnail feature) — real pixel statistics,
      * normalized to [0, 1].
      */
    def grayGridFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val grid = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Double](grid * grid)
      val counts = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        val gy = math.min(grid - 1, y * grid / h)
        var x = 0
        while (x < w) {
          val gx = math.min(grid - 1, x * grid / w)
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          val c = gy * grid + gx
          sums(c) += lum
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim) { i =>
        if (i < sums.length && counts(i) > 0) (sums(i) / counts(i) / 255.0).toFloat else 0f
      }
    }
  }

  /** REAL audio sample decode for PCM WAV payloads — pure JVM, no codec
    * libraries needed because RIFF/WAVE `data` chunks carry raw PCM:
    * 8-bit unsigned, 16/24/32-bit signed little-endian, and IEEE float32
    * (fmt audioFormat 3) all decode to normalized [-1, 1] samples, mixed
    * to mono for featurization (duration, RMS level, peak, zero-crossing
    * rate — the standard cheap audio-quality signals a training pipeline
    * filters on). Compressed audio payloads (MP3/FLAC frames) still have
    * no decoder in this container; they stay header-metadata-only.
    */
  object PcmOps {
    final case class AudioFeatures(
        sampleRate: Int,
        channels: Int,
        bitsPerSample: Int,
        nFrames: Long,
        durationMs: Double,
        rms: Double,
        peak: Double,
        zeroCrossRate: Double)

    private def leU16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    private def leU32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Decode a PCM WAV payload to (sampleRate, channels, bitsPerSample,
      * mono-mixed normalized samples). None when the payload is not a
      * RIFF/WAVE container or uses a non-PCM encoding.
      */
    def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Array[Double])] = {
      if (b == null || b.length < 44) return None
      if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var fmt = -1 // audioFormat: 1 = integer PCM, 3 = IEEE float
      var channels = 0
      var rate = 0
      var bits = 0
      var dataOff = -1
      var dataLen = 0
      var i = 12
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val len = leU32(b, i + 4).toInt
        // corrupt/adversarial lengths (negative after the 32-bit cast)
        // would loop forever or walk backwards — treat as not-a-WAV
        if (len < 0) return None
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          fmt = leU16(b, i + 8)
          channels = leU16(b, i + 8 + 2)
          rate = leU32(b, i + 8 + 4).toInt
          bits = leU16(b, i + 8 + 14)
        } else if (id == "data") {
          dataOff = i + 8
          dataLen = math.max(0, math.min(len, b.length - dataOff))
        }
        // Long advance (see MediaHeader.decodeWav): huge lengths end the
        // walk instead of wrapping Int
        val next = i.toLong + 8L + len + (len & 1) // chunks are word-aligned
        if (next > b.length) i = b.length
        else i = next.toInt
      }
      if (rate <= 0 || channels <= 0 || dataOff < 0) return None
      if (fmt != 1 && fmt != 3) return None
      val bytesPer = bits / 8
      if (bytesPer <= 0) return None
      val nFrames = dataLen / (bytesPer * channels)
      val mono = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var sum = 0.0
        var c = 0
        while (c < channels) {
          val o = dataOff + (f * channels + c) * bytesPer
          val v = (fmt, bits) match {
            case (1, 8) => ((b(o) & 0xff) - 128) / 128.0 // 8-bit PCM is unsigned
            case (1, 16) => (leU16(b, o).toShort).toDouble / 32768.0
            case (1, 24) =>
              val raw = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) << 16)
              raw / 8388608.0
            case (1, 32) => leU32(b, o).toInt.toDouble / 2147483648.0
            case (3, 32) => java.lang.Float.intBitsToFloat(leU32(b, o).toInt).toDouble
            case _ => return None
          }
          sum += v
          c += 1
        }
        mono(f) = sum / channels
        f += 1
      }
      Some((rate, channels, bits, mono))
    }

    /** Featurize a decoded mono sample buffer. */
    def features(rate: Int, channels: Int, bits: Int, mono: Array[Double]): AudioFeatures = {
      val n = mono.length
      var sumSq = 0.0
      var peak = 0.0
      var crossings = 0L
      var i = 0
      while (i < n) {
        val v = mono(i)
        sumSq += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (i > 0 && (v > 0) != (mono(i - 1) > 0)) crossings += 1
        i += 1
      }
      AudioFeatures(
        sampleRate = rate,
        channels = channels,
        bitsPerSample = bits,
        nFrames = n,
        durationMs = if (rate > 0) n * 1000.0 / rate else 0.0,
        rms = if (n > 0) math.sqrt(sumSq / n) else 0.0,
        peak = peak,
        zeroCrossRate = if (n > 1) crossings.toDouble / (n - 1) else 0.0)
    }

    def featuresOf(b: Array[Byte]): Option[AudioFeatures] =
      decodeWav(b).map { case (rate, ch, bits, mono) => features(rate, ch, bits, mono) }

    /** Minimal RIFF/WAVE header for an integer-PCM payload of `dataLen`
      * bytes — the writer half of [[decodeWav]], used to synthesize
      * deterministic audio payloads (oracle queries, tests).
      */
    def wavHeader(rate: Int, channels: Int, bits: Int, dataLen: Int): Array[Byte] = {
      val w = new graft.format.BufWriter(44)
      def le16(v: Int): Unit = { w.putByte(v & 0xff); w.putByte((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      w.putBytes("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      le32(36 + dataLen)
      w.putBytes("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      w.putBytes("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      le32(16)
      le16(1) // integer PCM
      le16(channels)
      le32(rate)
      le32(rate * channels * (bits / 8)) // byte rate
      le16(channels * (bits / 8)) // block align
      le16(bits)
      w.putBytes("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      le32(dataLen)
      w.result()
    }
  }

  /** Per-payload audio row: real decoded features for PCM WAV, header
    * metadata only for compressed audio, zeros for non-audio payloads.
    */
  final case class AudioMeta(
      doc_id: Long,
      format: String,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_ms: Double,
      rms: Double,
      peak: Double,
      zero_cross_rate: Double)

  /** Batch audio feature extraction over (doc_id, payload) — partition-
    * parallel mapPartitions (justified: opaque binary decode), no
    * shuffle. WAV rows carry REAL sample-level features; MP3/FLAC rows
    * carry the real header rate/channels with zeroed sample features.
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        PcmOps.featuresOf(bytes) match {
          case Some(f) =>
            AudioMeta(id, "wav", f.sampleRate, f.channels, f.bitsPerSample, f.nFrames,
              f.durationMs, f.rms, f.peak, f.zeroCrossRate)
          case None =>
            val flac = MediaHeader.decodeFlac(bytes)
            val mp3 = if (flac.isEmpty) MediaHeader.decodeMp3(bytes) else None
            val fmt = if (flac.isDefined) "flac" else if (mp3.isDefined) "mp3" else "opaque"
            val (rate, ch) = flac.orElse(mp3).getOrElse((0, 0))
            AudioMeta(id, fmt, rate, ch, 0, 0L, 0.0, 0.0, 0.0, 0.0)
        }
      })
  }

  /** REAL video-container demux + frame decode for the two public
    * containers a pure JVM can decode without codec libraries (the video
    * counterpart of the PCM WAV work on the audio side):
    *
    *  - Y4M (YUV4MPEG2): ASCII stream header + uncompressed planar
    *    frames behind `FRAME` markers — the luma plane is read directly.
    *  - MJPEG: concatenated baseline JPEGs — frames are split by walking
    *    the JPEG segment structure (entropy data byte-stuffs 0xFF, so the
    *    EOI marker found this way is exact) and decoded through ImageIO.
    *
    * Compressed video in MP4/WebM still routes to the clearly-labeled
    * [[FakeDecoder]] stub: no H.264/VP9 codecs exist in this JVM.
    */
  object VideoOps {
    private val Y4mMagic = "YUV4MPEG2"

    def y4mHeader(w: Int, h: Int, fps: Int): String =
      s"$Y4mMagic W$w H$h F$fps:1 Ip A1:1 Cmono\n"

    /** (width, height, colorspace) from a YUV4MPEG2 stream header. */
    def decodeY4mHeader(bytes: Array[Byte]): Option[(Int, Int, String)] = {
      if (bytes == null || bytes.length < Y4mMagic.length + 1) return None
      var i = 0
      while (i < Y4mMagic.length) {
        if (bytes(i) != Y4mMagic.charAt(i).toByte) return None
        i += 1
      }
      var end = -1
      i = 0
      while (end < 0 && i < math.min(bytes.length, 512)) {
        if (bytes(i) == '\n'.toByte) end = i
        i += 1
      }
      if (end < 0) return None
      val header = new String(bytes, 0, end, java.nio.charset.StandardCharsets.ISO_8859_1)
      var w = 0
      var h = 0
      var cs = "420jpeg" // the Y4M default when no C tag is present
      header.split(' ').drop(1).foreach { p =>
        try {
          if (p.startsWith("W")) w = p.substring(1).toInt
          else if (p.startsWith("H")) h = p.substring(1).toInt
          else if (p.startsWith("C")) cs = p.substring(1)
        } catch { case _: NumberFormatException => return None }
      }
      if (w > 0 && h > 0 && w.toLong * h <= (1 << 26)) Some((w, h, cs)) else None
    }

    private def frameLen(w: Int, h: Int, cs: String): Int = cs match {
      case "mono" => w * h
      case s if s.startsWith("444") => w * h * 3
      case s if s.startsWith("422") => w * h + 2 * (((w + 1) / 2) * h)
      case _ => w * h + 2 * (((w + 1) / 2) * ((h + 1) / 2)) // 420 family
    }

    /** Real Y4M demux: (frameIdx, lumaPlane, w, h) per FRAME section. */
    def y4mLumaFrames(bytes: Array[Byte]): Option[Seq[(Int, Array[Byte], Int, Int)]] =
      decodeY4mHeader(bytes).map { case (w, h, cs) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte], Int, Int)]
        val fl = frameLen(w, h, cs)
        var pos = 0
        while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
        pos += 1
        var idx = 0
        var ok = true
        while (ok && pos + 6 <= bytes.length &&
            bytes(pos) == 'F' && bytes(pos + 1) == 'R' && bytes(pos + 2) == 'A' &&
            bytes(pos + 3) == 'M' && bytes(pos + 4) == 'E') {
          // the FRAME line may carry parameters up to its newline
          var nl = pos + 5
          while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
          val dataStart = nl + 1
          if (dataStart + fl <= bytes.length) {
            out += ((idx, java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + w * h), w, h))
            idx += 1
            pos = dataStart + fl
          } else ok = false // truncated trailing frame: stop cleanly
        }
        out.toSeq
      }

    /** Split concatenated JPEGs by walking segment structure: length-coded
      * segments skip by length; after SOS the entropy stream is scanned
      * for a marker that is not a stuffed 0x00 / restart — exact, because
      * baseline JPEG byte-stuffs every 0xFF in entropy data. Returns the
      * end offset (exclusive) of the JPEG starting at `start`, or -1.
      */
    private def jpegEnd(bytes: Array[Byte], start: Int): Int = {
      var p = start
      if (p + 2 > bytes.length ||
        bytes(p) != 0xFF.toByte || bytes(p + 1) != 0xD8.toByte) return -1
      p += 2
      while (p + 2 <= bytes.length) {
        if (bytes(p) != 0xFF.toByte) return -1 // corrupt segment stream
        val marker = bytes(p + 1) & 0xff
        if (marker == 0xFF) p += 1 // fill byte (ISO 10918-1 B.1.1.2): any number of 0xFF may pad a marker
        else if (marker == 0xD9) return p + 2 // EOI
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) p += 2 // standalone
        else if (marker == 0xDA) {
          // SOS: skip its header, then scan entropy-coded data
          if (p + 4 > bytes.length) return -1
          val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          p += 2 + len
          while (p + 2 <= bytes.length) {
            if (bytes(p) == 0xFF.toByte) {
              val m = bytes(p + 1) & 0xff
              if (m == 0xFF) p += 1 // fill byte before a marker
              else if (m == 0xD9) return p + 2 // EOI
              else if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) p += 2 // stuffed / RST
              else p += 2 // next segment marker (rare mid-scan DNL etc.)
            } else p += 1
          }
          return -1
        } else {
          if (p + 4 > bytes.length) return -1
          val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          if (len < 2) return -1
          p += 2 + len
        }
      }
      -1
    }

    /** Real MJPEG demux + ImageIO decode: Some(frames) when the payload
      * is at least two back-to-back JPEGs (a single JPEG is an image and
      * belongs to the image path).
      */
    def mjpegFrames(bytes: Array[Byte]): Option[Seq[(Int, java.awt.image.BufferedImage)]] = {
      if (bytes == null || bytes.length < 4) return None
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var p = 0
      while (p + 4 <= bytes.length &&
          bytes(p) == 0xFF.toByte && bytes(p + 1) == 0xD8.toByte) {
        val end = jpegEnd(bytes, p)
        if (end < 0) return None
        bounds += ((p, end))
        p = end
      }
      if (bounds.length < 2 || p != bytes.length) return None
      val frames = bounds.zipWithIndex.flatMap { case ((s, e), i) =>
        PixelOps.decodeImage(java.util.Arrays.copyOfRange(bytes, s, e)).map(img => (i, img))
      }
      if (frames.length == bounds.length) Some(frames.toSeq) else None
    }
  }

  /** One decoded video frame's luma statistics. */
  final case class VideoFrame(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_luma: Double,
      min_luma: Int,
      max_luma: Int
  )

  /** Real video frame decode → per-frame luma stats, partition-parallel
    * (no shuffle): Y4M reads the luma plane directly; MJPEG decodes each
    * JPEG and converts to luma (ITU-R BT.601). Payloads in neither
    * container yield no rows — this operator never fakes a frame.
    */
  def extractVideoFrames(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        def lumaStats(idx: Int, luma: Array[Byte], w: Int, h: Int): VideoFrame = {
          var s = 0L
          var mn = 255
          var mx = 0
          var i = 0
          while (i < luma.length) {
            val v = luma(i) & 0xff
            s += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val n = math.max(1, luma.length)
          VideoFrame(id, idx, w, h, s.toDouble / n, if (luma.isEmpty) 0 else mn,
            if (luma.isEmpty) 0 else mx)
        }
        VideoOps.y4mLumaFrames(bytes) match {
          case Some(frames) =>
            frames.iterator.map { case (idx, luma, w, h) => lumaStats(idx, luma, w, h) }
          case None =>
            VideoOps.mjpegFrames(bytes) match {
              case Some(frames) =>
                frames.iterator.map { case (idx, img) =>
                  val luma = PixelOps.lumaBytes(img)
                  lumaStats(idx, luma, img.getWidth, img.getHeight)
                }
              case None => Iterator.empty
            }
        }
      })
  }

  /** Typed metadata extracted per media blob. `format`/`width`/`height`
    * are REAL for recognized image containers and MP4 video; WAV/FLAC/MP3
    * audio fills `sample_rate`/`channels` ("opaque"/0 otherwise); the
    * fake_* fields remain the deterministic stub for unrecognized
    * payloads.
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
      height: Int = 0,
      sample_rate: Int = 0,
      channels: Int = 0
  )

  /** STUB decoder: deterministic pseudo-decode of an opaque media blob.
    * A real implementation would parse the container and hand pixel/PCM
    * buffers to a feature extractor.
    */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      if (bytes == null) return MediaMeta(docId, 0, 0, 64, 64, 1)
      val n = bytes.length
      val header = if (n > 0) bytes(0) & 0xff else 0
      val img = ImageHeader.decode(bytes)
      val wav = if (img.isEmpty) MediaHeader.decodeWav(bytes) else None
      val flac = if (img.isEmpty && wav.isEmpty) MediaHeader.decodeFlac(bytes) else None
      val mp3 = if (img.isEmpty && wav.isEmpty && flac.isEmpty) MediaHeader.decodeMp3(bytes) else None
      val mp4 =
        if (img.isEmpty && wav.isEmpty && flac.isEmpty && mp3.isEmpty) MediaHeader.decodeMp4(bytes)
        else None
      val y4m =
        if (img.isEmpty && wav.isEmpty && flac.isEmpty && mp3.isEmpty && mp4.isEmpty)
          VideoOps.decodeY4mHeader(bytes)
        else None
      val audio = wav.orElse(flac).orElse(mp3)
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        header = header,
        fake_width = 64 + (n % 576),
        fake_height = 64 + (header % 416),
        fake_frames = 1 + (n % 16),
        format = img.map(_._1)
          .orElse(wav.map(_ => "wav"))
          .orElse(flac.map(_ => "flac"))
          .orElse(mp3.map(_ => "mp3"))
          .orElse(mp4.map(_ => "mp4"))
          .orElse(y4m.map(_ => "y4m"))
          .getOrElse("opaque"),
        width = img.map(_._2).orElse(mp4.map(_._1)).orElse(y4m.map(_._1)).getOrElse(0),
        height = img.map(_._3).orElse(mp4.map(_._2)).orElse(y4m.map(_._2)).getOrElse(0),
        sample_rate = audio.map(_._1).getOrElse(0),
        channels = audio.map(_._2).getOrElse(0)
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

  /** Frame sampling: keep every `everyNth` frame, one row per kept
    * frame, fan-out partition-local (flatMap, no shuffle). REAL for
    * image payloads: `ImageIO` reads the actual frame count (animated
    * GIF) and decodes each kept frame's pixels (re-encoded PNG). Opaque
    * payloads (no codec here) keep the deterministic stub slicing.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        PixelOps.frameCount(bytes) match {
          case Some(n) =>
            (0 until n by everyNth).iterator.flatMap { f =>
              PixelOps.decodeFrame(bytes, f).map { img =>
                Frame(id, f, img.getWidth, img.getHeight, PixelOps.toPng(img))
              }
            }
          case None =>
            // real video containers next: Y4M frames re-encode their luma
            // plane as gray PNG; MJPEG frames are real JPEG decodes
            VideoOps.y4mLumaFrames(bytes).filter(_.nonEmpty).map { frames =>
              frames.iterator.filter(_._1 % everyNth == 0).map { case (idx, luma, w, h) =>
                Frame(id, idx, w, h, PixelOps.toPng(PixelOps.grayImage(luma, w, h)))
              }
            }.orElse {
              VideoOps.mjpegFrames(bytes).map { frames =>
                frames.iterator.filter(_._1 % everyNth == 0).map { case (idx, img) =>
                  Frame(id, idx, img.getWidth, img.getHeight, PixelOps.toPng(img))
                }
              }
            }.getOrElse {
              val meta = FakeDecoder.decode(id, bytes)
              val n = meta.fake_frames
              val sliceLen = math.max(1, bytes.length / math.max(1, n))
              (0 until n by everyNth).iterator.map { f =>
                val start = math.min(bytes.length, f * sliceLen)
                val end = math.min(bytes.length, start + sliceLen)
                Frame(id, f, meta.fake_width, meta.fake_height,
                  java.util.Arrays.copyOfRange(bytes, start, end))
              }
            }
        }
      })
  }

  /** Resize: REAL bilinear pixel rescale (PNG re-encode) when the frame
    * bytes decode as an image; deterministic stub truncation otherwise.
    * Either way the plumbing is batch-shaped and partition-local.
    */
  def resizeFrames(spark: SparkSession, frames: Dataset[Frame], w: Int, h: Int): Dataset[Frame] = {
    import spark.implicits._
    frames.mapPartitions(_.map { fr =>
      PixelOps.decodeImage(fr.frame_bytes) match {
        case Some(img) =>
          fr.copy(width = w, height = h, frame_bytes = PixelOps.toPng(PixelOps.resize(img, w, h)))
        case None =>
          val scale = math.min(1.0, (w.toLong * h).toDouble / math.max(1L, fr.width.toLong * fr.height))
          val keep = math.max(1, (fr.frame_bytes.length * scale).toInt)
          fr.copy(width = w, height = h,
            frame_bytes = java.util.Arrays.copyOf(fr.frame_bytes, math.min(keep, fr.frame_bytes.length)))
      }
    })
  }

  /** Per-frame feature vector. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, features: Array[Float])

  /** Feature extraction: REAL mean-luminance grid features over decoded
    * pixels for image frames ([[PixelOps.grayGridFeatures]]); the
    * hash-seeded stub only for opaque payloads. A vision-model embedding
    * would slot in the same partition-batched shape.
    */
  def extractFeatures(spark: SparkSession, frames: Dataset[Frame], dim: Int = 16): Dataset[FrameFeatures] = {
    import spark.implicits._
    frames.mapPartitions(_.map { fr =>
      PixelOps.decodeImage(fr.frame_bytes) match {
        case Some(img) =>
          FrameFeatures(fr.doc_id, fr.frame_idx, PixelOps.grayGridFeatures(img, dim))
        case None =>
          val seed = java.util.Arrays.hashCode(fr.frame_bytes).toLong ^ (fr.doc_id << 20) ^ fr.frame_idx
          val rnd = new scala.util.Random(seed)
          FrameFeatures(fr.doc_id, fr.frame_idx, Array.fill(dim)(rnd.nextFloat()))
      }
    })
  }
}
