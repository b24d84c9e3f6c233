package graft.format

/** Fixed-width bit-packing over 64-bit words.
  *
  * Functional equivalent of the reference's FastBP/FastPFor codecs
  * (/root/reference/btrblocks/extern/FastPFOR.hpp:11-33); our own wire
  * layout: values are packed LSB-first into little-endian u64 words.
  * Tight primitive-array loops so the JIT can vectorize.
  */
object Bitpack {

  def mask(width: Int): Long = if (width >= 64) -1L else (1L << width) - 1L

  /** Bits needed to represent an unsigned value (0 for value 0). */
  def bitsFor(value: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(value)

  /** Bits for the unsigned range max-min (treating wraparound as u64). */
  def bitsForRange(min: Long, max: Long): Int = bitsFor(max - min)

  def numWords(count: Int, width: Int): Int =
    (((count.toLong * width) + 63) >>> 6).toInt

  def packedBytes(count: Int, width: Int): Int = numWords(count, width) * 8

  /** Pack `count` values (masked to `width` bits) and append to `out`. */
  def pack(values: Array[Long], count: Int, width: Int, out: BufWriter): Unit = {
    if (width == 0 || count == 0) return
    val m = mask(width)
    val words = new Array[Long](numWords(count, width))
    var i = 0
    while (i < count) {
      val bitpos = i.toLong * width
      val w = (bitpos >>> 6).toInt
      val off = (bitpos & 63).toInt
      val v = values(i) & m
      words(w) |= v << off
      if (off + width > 64) words(w + 1) |= v >>> (64 - off)
      i += 1
    }
    out.putLongs(words, words.length)
  }

  /** Unpack `count` width-bit values into `out` (no sign extension). */
  def unpack(in: BufReader, count: Int, width: Int, out: Array[Long]): Unit = {
    if (width == 0) { java.util.Arrays.fill(out, 0, count, 0L); return }
    if (count == 0) return
    val words = in.getLongs(numWords(count, width))
    val m = mask(width)
    if (64 % width == 0) {
      // aligned widths (1/2/4/8/16/32/64): no value straddles a word —
      // one word load feeds 64/width values with shift-only extraction,
      // no multiply, no straddle branch (the scalar shape of the
      // reference's unrolled per-width kernels)
      val per = 64 / width
      var i = 0
      var w = 0
      while (i + per <= count) {
        var word = words(w)
        w += 1
        var j = 0
        while (j < per) { out(i + j) = word & m; word = word >>> width; j += 1 }
        i += per
      }
      if (i < count) {
        var word = words(w)
        while (i < count) { out(i) = word & m; word = word >>> width; i += 1 }
      }
    } else {
      // general widths: running word/offset cursors instead of per-value
      // 64-bit multiply + div/mod
      var i = 0
      var w = 0
      var off = 0
      while (i < count) {
        var v = words(w) >>> off
        if (off + width > 64) v |= words(w + 1) << (64 - off)
        out(i) = v & m
        off += width
        if (off >= 64) { off -= 64; w += 1 }
        i += 1
      }
    }
  }

  def unpackAlloc(in: BufReader, count: Int, width: Int): Array[Long] = {
    val out = new Array[Long](count)
    unpack(in, count, width, out)
    out
  }
}
