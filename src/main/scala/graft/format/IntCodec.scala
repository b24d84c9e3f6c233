package graft.format

import scala.collection.mutable

/** Per-chunk statistics for the integer family, mirroring
  * NumberStats (/root/reference/btrblocks/stats/NumberStats.hpp:78-130):
  * min, max, distinct/unique counts, run count, sortedness, top value.
  */
final case class IntStats(
    count: Int,
    min: Long,
    max: Long,
    distinct: Int,
    runCount: Int,
    isSorted: Boolean,
    topValue: Long,
    topCount: Int,
    widthHist: Array[Int]
) {
  def avgRunLength: Double = if (runCount == 0) 0.0 else count.toDouble / runCount
}

object IntStats {
  def compute(values: Array[Long], count: Int): IntStats = {
    if (count == 0)
      return IntStats(0, 0L, 0L, 0, 0, isSorted = true, 0L, 0, new Array[Int](65))
    var min = values(0)
    var max = values(0)
    var runs = 1
    var sorted = true
    val freq = new mutable.LongMap[Int](math.min(count, 1 << 12))
    freq(values(0)) = 1
    var i = 1
    while (i < count) {
      val v = values(i)
      if (v < min) min = v
      if (v > max) max = v
      if (v != values(i - 1)) runs += 1
      if (v < values(i - 1)) sorted = false
      freq(v) = freq.getOrElse(v, 0) + 1
      i += 1
    }
    var topV = values(0)
    var topC = 0
    val hist = new Array[Int](65)
    freq.foreachEntry { (k, c) =>
      if (c > topC) { topC = c; topV = k }
      hist(Bitpack.bitsForRange(0L, k - min)) += c
    }
    IntStats(count, min, max, freq.size, runs, sorted, topV, topC, hist)
  }
}

/** Integer-family codec: all schemes over dense Array[Long] values
  * (covers Spark int/long/date/timestamp/bool columns; the narrower
  * physical width only affects the UNCOMPRESSED payload).
  *
  * Scheme set mirrors the reference's integer schemes
  * (/root/reference/btrblocks/scheme/SchemeType.hpp:12-33): Uncompressed,
  * OneValue, Dict, RLE, FOR+bitpack (subsumes BP/FOR/Truncation), sorted
  * Delta+bitpack (PFOR_DELTA analog), Frequency. Selection is
  * stats-driven greedy with a cascade budget and an anti-regression
  * guard (/root/reference/btrblocks/compression/SchemePicker.hpp:34-68,
  * 118-129, 181-190).
  */
object IntCodec {
  // scheme ids (wire format)
  val Uncompressed = 0
  val OneValue = 1
  val Dict = 2
  val Rle = 3
  val ForBp = 4
  val DeltaBp = 5
  val Frequency = 6
  val Pfor = 7

  /** Patched-FOR plan: the (width, nExceptions, estBytes) minimizing total
    * size over the chunk's bit-width histogram — outliers beyond `width`
    * bits become patches (the functional analog of FastPFor's per-block
    * exception patching, /root/reference/btrblocks/scheme/integer/PBP.cpp:18-56).
    */
  private def pforPlan(s: IntStats): (Int, Int, Long) = {
    val full = Bitpack.bitsForRange(s.min, s.max)
    val posBits = Bitpack.bitsFor(math.max(0L, (s.count - 1).toLong))
    var bestW = full
    var bestExc = 0
    var best = Long.MaxValue
    var cum = 0
    var w = 0
    while (w < full) {
      cum += s.widthHist(w)
      val exc = s.count - cum
      val size = 2L + 9 + Bitpack.packedBytes(s.count, w) + 4 +
        exc.toLong * (posBits + full) / 8 + 24
      if (size < best) { best = size; bestW = w; bestExc = exc }
      w += 1
    }
    (bestW, bestExc, best)
  }

  /** Closed-form size estimates (bytes) per candidate, from full-chunk
    * stats — deterministic replacement for the reference's sampling
    * estimator (/root/reference/btrblocks/scheme/CompressionScheme.cpp:8-46).
    */
  private def estimate(scheme: Int, s: IntStats, physWidth: Int, depth: Int): Long = {
    val n = s.count.toLong
    scheme match {
      case Uncompressed => 2 + n * physWidth
      case OneValue => if (s.distinct <= 1) 10L else Long.MaxValue
      case ForBp => 2 + 9 + Bitpack.packedBytes(s.count, Bitpack.bitsForRange(s.min, s.max)) + 2
      case DeltaBp =>
        if (!s.isSorted || s.count < 2 || depth < 1) Long.MaxValue
        // delta width unknown without a pass; assume range/distinct spread
        else 2 + 17 + n * math.max(1, Bitpack.bitsForRange(s.min, s.max) - Bitpack.bitsFor(n)) / 8
      case Dict =>
        if (depth < 1 || s.distinct >= s.count) Long.MaxValue
        else {
          val codeBits = math.max(1, Bitpack.bitsFor((s.distinct - 1).toLong))
          val dictBytes = s.distinct.toLong * math.min(8, physWidth) // dict re-encoded; upper bound
          2 + 8 + dictBytes + Bitpack.packedBytes(s.count, codeBits)
        }
      case Rle =>
        if (depth < 1 || s.avgRunLength < 2.0) Long.MaxValue
        else {
          val r = s.runCount.toLong
          val valBits = Bitpack.bitsForRange(s.min, s.max)
          val lenBits = Bitpack.bitsFor(s.count.toLong)
          2 + 8 + r * valBits / 8 + r * lenBits / 8 + 24
        }
      case Frequency =>
        // gates per SchemeConfig.hpp:17 + Frequency.hpp:42-46
        if (depth < 1 || s.distinct * 2 > s.count || s.topCount * 10 < s.count * 9) Long.MaxValue
        else {
          val exc = (s.count - s.topCount).toLong
          val posBits = Bitpack.bitsFor((s.count - 1).toLong)
          2 + 16 + exc * (posBits + Bitpack.bitsForRange(s.min, s.max)) / 8 + 24
        }
      case Pfor =>
        // needs the cascade budget for its patch lists; pointless on tiny
        // chunks where the fixed overhead dominates
        if (depth < 1 || s.count < 64) Long.MaxValue
        else {
          val (w, exc, size) = pforPlan(s)
          if (exc == 0 || w == 0) Long.MaxValue else size
        }
      case _ => Long.MaxValue
    }
  }

  private val AllSchemes =
    Array(OneValue, ForBp, DeltaBp, Dict, Rle, Frequency, Pfor, Uncompressed)

  def choose(s: IntStats, physWidth: Int, depth: Int): Int = {
    if (s.count == 0) return Uncompressed
    if (s.distinct <= 1) return OneValue
    var best = Uncompressed
    var bestSize = estimate(Uncompressed, s, physWidth, depth)
    var i = 0
    while (i < AllSchemes.length) {
      val sch = AllSchemes(i)
      val e = estimate(sch, s, physWidth, depth)
      if (e < bestSize) { best = sch; bestSize = e }
      i += 1
    }
    best
  }

  /** Encode `count` values with the greedy-selected scheme; writes
    * [u8 scheme][payload]. Anti-regression: if the encoded payload ends
    * up larger than raw, rewrites as Uncompressed.
    */
  def encode(out: BufWriter, values: Array[Long], count: Int, physWidth: Int, depth: Int): Unit = {
    val start = out.pos
    val s = IntStats.compute(values, count)
    val scheme = choose(s, physWidth, depth)
    encodeAs(scheme, out, values, count, physWidth, depth, s)
    // anti-regression guard (SchemePicker.hpp:181-190)
    val rawSize = 1 + count.toLong * physWidth
    if (scheme != Uncompressed && (out.pos - start).toLong > rawSize) {
      out.truncate(start)
      encodeAs(Uncompressed, out, values, count, physWidth, depth, s)
    }
  }

  def encodeAs(
      scheme: Int,
      out: BufWriter,
      values: Array[Long],
      count: Int,
      physWidth: Int,
      depth: Int,
      s: IntStats
  ): Unit = {
    out.putByte(scheme)
    scheme match {
      case Uncompressed => writeRaw(out, values, count, physWidth)
      case OneValue => out.putLong(if (count > 0) values(0) else 0L)
      case ForBp =>
        val width = Bitpack.bitsForRange(s.min, s.max)
        out.putLong(s.min)
        out.putByte(width)
        if (width > 0) {
          val rebased = new Array[Long](count)
          var i = 0
          while (i < count) { rebased(i) = values(i) - s.min; i += 1 }
          Bitpack.pack(rebased, count, width, out)
        }
      case DeltaBp =>
        // sorted: store v0, then FOR-bitpacked deltas
        val deltas = new Array[Long](count - 1)
        var minD = Long.MaxValue
        var maxD = Long.MinValue
        var i = 1
        while (i < count) {
          val d = values(i) - values(i - 1)
          deltas(i - 1) = d
          if (d < minD) minD = d
          if (d > maxD) maxD = d
          i += 1
        }
        val width = Bitpack.bitsForRange(minD, maxD)
        out.putLong(values(0))
        out.putLong(minD)
        out.putByte(width)
        if (width > 0) {
          i = 0
          while (i < count - 1) { deltas(i) -= minD; i += 1 }
          Bitpack.pack(deltas, count - 1, width, out)
        }
      case Dict =>
        // sorted distinct values; codes cascade-compressed
        val dict = distinctSorted(values, count)
        out.putInt(dict.length)
        encode(out, dict, dict.length, 8, depth - 1)
        val codes = new Array[Long](count)
        var i = 0
        while (i < count) {
          codes(i) = binarySearch(dict, values(i)).toLong
          i += 1
        }
        encode(out, codes, count, 8, depth - 1)
      case Rle =>
        val (runVals, runLens, nRuns) = runs(values, count)
        out.putInt(nRuns)
        encode(out, runVals, nRuns, 8, depth - 1)
        encode(out, runLens, nRuns, 8, depth - 1)
      case Frequency =>
        val top = s.topValue
        val nExc = count - s.topCount
        out.putLong(top)
        out.putInt(nExc)
        val pos = new Array[Long](nExc)
        val exc = new Array[Long](nExc)
        var p = 0
        var i = 0
        while (i < count) {
          if (values(i) != top) { pos(p) = i.toLong; exc(p) = values(i); p += 1 }
          i += 1
        }
        encode(out, pos, nExc, 8, depth - 1) // sorted → DeltaBp
        encode(out, exc, nExc, 8, depth - 1)
      case Pfor =>
        val (w, nExc, _) = pforPlan(s)
        out.putLong(s.min)
        out.putByte(w)
        val rebased = new Array[Long](count)
        val pos = new Array[Long](nExc)
        val exc = new Array[Long](nExc)
        val limit = Bitpack.mask(w)
        var p = 0
        var i = 0
        while (i < count) {
          val r = values(i) - s.min
          // unsigned comparison: wraparound rebase can go negative as i64
          if (java.lang.Long.compareUnsigned(r, limit) > 0) {
            pos(p) = i.toLong
            exc(p) = values(i)
            p += 1
          } else rebased(i) = r
          i += 1
        }
        Bitpack.pack(rebased, count, w, out)
        out.putInt(nExc)
        encode(out, pos, nExc, 8, depth - 1) // sorted → DeltaBp
        encode(out, exc, nExc, 8, depth - 1)
    }
  }

  def decode(in: BufReader, count: Int): Array[Long] = {
    val out = new Array[Long](count)
    decodeInto(in, count, out)
    out
  }

  def decodeInto(in: BufReader, count: Int, out: Array[Long]): Unit = {
    val scheme = in.getByte()
    scheme match {
      case Uncompressed => readRaw(in, out, count)
      case OneValue =>
        val v = in.getLong()
        java.util.Arrays.fill(out, 0, count, v)
      case ForBp =>
        val base = in.getLong()
        val width = in.getByte()
        Bitpack.unpack(in, count, width, out)
        if (base != 0L) {
          var i = 0
          while (i < count) { out(i) += base; i += 1 }
        }
      case DeltaBp =>
        val v0 = in.getLong()
        val minD = in.getLong()
        val width = in.getByte()
        Bitpack.unpack(in, count - 1, width, out)
        var acc = v0
        var i = count - 1
        // shift right by one while prefix-summing (out currently holds deltas at 0..count-2)
        val deltas = java.util.Arrays.copyOf(out, math.max(count - 1, 0))
        out(0) = v0
        i = 1
        while (i < count) { acc += deltas(i - 1) + minD; out(i) = acc; i += 1 }
      case Dict =>
        val dictSize = in.getInt()
        val dict = decode(in, dictSize)
        val codes = new Array[Long](count)
        decodeInto(in, count, codes)
        var i = 0
        while (i < count) { out(i) = dict(codes(i).toInt); i += 1 }
      case Rle =>
        val nRuns = in.getInt()
        val runVals = decode(in, nRuns)
        val runLens = decode(in, nRuns)
        var p = 0
        var r = 0
        while (r < nRuns) {
          val v = runVals(r)
          val len = runLens(r).toInt
          java.util.Arrays.fill(out, p, p + len, v)
          p += len
          r += 1
        }
      case Frequency =>
        val top = in.getLong()
        val nExc = in.getInt()
        val pos = decode(in, nExc)
        val exc = decode(in, nExc)
        java.util.Arrays.fill(out, 0, count, top)
        var i = 0
        while (i < nExc) { out(pos(i).toInt) = exc(i); i += 1 }
      case Pfor =>
        val base = in.getLong()
        val width = in.getByte()
        Bitpack.unpack(in, count, width, out)
        if (base != 0L) {
          var i = 0
          while (i < count) { out(i) += base; i += 1 }
        }
        val nExc = in.getInt()
        val pos = decode(in, nExc)
        val exc = decode(in, nExc)
        var i = 0
        while (i < nExc) { out(pos(i).toInt) = exc(i); i += 1 }
      case other => throw new IllegalStateException(s"bad int scheme $other")
    }
  }

  private def writeRaw(out: BufWriter, values: Array[Long], count: Int, physWidth: Int): Unit = {
    out.putByte(physWidth)
    physWidth match {
      case 1 =>
        var i = 0
        while (i < count) { out.putByte(values(i).toInt & 0xff); i += 1 }
      case 2 =>
        var i = 0
        while (i < count) {
          val v = values(i).toInt
          out.putByte(v & 0xff); out.putByte((v >>> 8) & 0xff)
          i += 1
        }
      case 4 =>
        var i = 0
        while (i < count) { out.putInt(values(i).toInt); i += 1 }
      case _ => out.putLongs(values, count)
    }
  }

  private def readRaw(in: BufReader, out: Array[Long], count: Int): Unit = {
    val physWidth = in.getByte()
    physWidth match {
      case 1 =>
        var i = 0
        while (i < count) { out(i) = in.getByte().toLong; i += 1 }
      case 2 =>
        var i = 0
        while (i < count) { out(i) = (in.getByte() | (in.getByte() << 8)).toLong; i += 1 }
      case 4 =>
        var i = 0
        while (i < count) { out(i) = in.getInt().toLong; i += 1 }
      case _ =>
        var i = 0
        while (i < count) { out(i) = in.getLong(); i += 1 }
    }
  }

  private[format] def distinctSorted(values: Array[Long], count: Int): Array[Long] = {
    val copy = java.util.Arrays.copyOf(values, count)
    java.util.Arrays.sort(copy)
    var n = 0
    var i = 0
    while (i < count) {
      if (i == 0 || copy(i) != copy(i - 1)) { copy(n) = copy(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(copy, n)
  }

  private[format] def binarySearch(sorted: Array[Long], v: Long): Int = {
    var lo = 0
    var hi = sorted.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mv = sorted(mid)
      if (mv == v) return mid
      else if (mv < v) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  private[format] def runs(values: Array[Long], count: Int): (Array[Long], Array[Long], Int) = {
    if (count == 0) return (Array.emptyLongArray, Array.emptyLongArray, 0)
    var n = 1
    var i = 1
    while (i < count) { if (values(i) != values(i - 1)) n += 1; i += 1 }
    val vals = new Array[Long](n)
    val lens = new Array[Long](n)
    var r = 0
    var runStart = 0
    i = 1
    while (i <= count) {
      if (i == count || values(i) != values(i - 1)) {
        vals(r) = values(i - 1)
        lens(r) = (i - runStart).toLong
        r += 1
        runStart = i
      }
      i += 1
    }
    (vals, lens, n)
  }
}
