package graft.format

import scala.collection.mutable

/** String-family codec over dense Array[Array[Byte]] (UTF-8 bytes; null
  * rows carry empty placeholders, mirroring the reference's dense
  * values-at-null convention).
  *
  * Schemes mirror /root/reference/btrblocks/scheme/SchemeType.hpp:55-69:
  * Uncompressed (lengths cascade + bytes), OneValue, Dict (sorted distinct,
  * codes int-cascaded, dict bytes optionally FSST), FSST whole-column.
  */
object StringCodec {
  val Uncompressed = 0
  val OneValue = 1
  val Dict = 2
  val Fsst = 3

  // FSST gates per /root/reference/btrblocks/scheme/string/Fsst.cpp:119-127
  private val FsstMinBytes = 16 * 1024

  /** Exact: count, totalLen, runCount (OneValue safety gate). Sampled:
    * distinct proportion (dict-vs-fsst steering), like Int/DoubleStats.
    */
  final case class StringStats(
      count: Int,
      totalLen: Long,
      runCount: Int,
      sampleN: Int,
      sDistinct: Int
  )

  def computeStats(
      values: Array[Array[Byte]],
      count: Int,
      seed: Long = 42L,
      sampleRuns: Int = 10,
      runLen: Int = 64
  ): StringStats = {
    if (count == 0) return StringStats(0, 0L, 0, 0, 0)
    var total = 0L
    var runs = 1
    var i = 0
    while (i < count) {
      total += values(i).length
      if (i > 0 && !java.util.Arrays.equals(values(i), values(i - 1))) runs += 1
      i += 1
    }
    val exhaustive = sampleRuns <= 0 || count <= sampleRuns * runLen * 2
    val seen = new mutable.HashSet[ByteKey]()
    var sampleN = 0
    if (exhaustive) {
      i = 0
      while (i < count) { seen.add(new ByteKey(values(i))); sampleN += 1; i += 1 }
    } else {
      // one run per disjoint stratum (see IntStats.compute): overlapping
      // runs double-count rows and fabricate repeat signal
      val rnd = new java.util.Random(seed)
      val stratum = count / sampleRuns
      var r = 0
      while (r < sampleRuns) {
        val base = r * stratum
        val span = (if (r == sampleRuns - 1) count - base else stratum) - runLen
        val start = base + (if (span > 0) rnd.nextInt(span + 1) else 0)
        var j = start
        val end = start + runLen
        while (j < end) { seen.add(new ByteKey(values(j))); sampleN += 1; j += 1 }
        r += 1
      }
    }
    StringStats(count, total, runs, sampleN, seen.size)
  }

  def encode(
      out: BufWriter,
      values: Array[Array[Byte]],
      count: Int,
      depth: Int,
      cfg: BtrConfig = BtrConfig.Default,
      seed: Long = 42L
  ): Unit = {
    val s = computeStats(values, count, seed, cfg.sampleRuns, cfg.sampleRunLen)
    if (cfg.tryAll) {
      tryAllEncode(out, values, count, depth, cfg, s, seed)
      return
    }
    val start = out.pos
    val scheme = choose(s, depth, cfg)
    encodeAs(scheme, out, values, count, depth, s, cfg, seed)
    val rawApprox = 1L + 4 + count.toLong * 4 + s.totalLen
    if (scheme != Uncompressed && (out.pos - start).toLong > rawApprox) {
      out.truncate(start)
      encodeAs(Uncompressed, out, values, count, depth, s, cfg, seed)
    }
  }

  /** Forced top-level scheme; validates data-loss safety first. */
  def encodeForced(
      scheme: Int,
      out: BufWriter,
      values: Array[Array[Byte]],
      count: Int,
      depth: Int,
      cfg: BtrConfig = BtrConfig.Default,
      seed: Long = 42L
  ): Unit = {
    val s = computeStats(values, count, seed, cfg.sampleRuns, cfg.sampleRunLen)
    require(structurallyValid(scheme, s, depth),
      s"btr.forceScheme: ${BtrConfig.stringNames(scheme)} cannot encode this chunk " +
        s"(count=$count, runs=${s.runCount}, depth=$depth)")
    encodeAs(scheme, out, values, count, depth, s, cfg, seed)
  }

  private def structurallyValid(scheme: Int, s: StringStats, depth: Int): Boolean = scheme match {
    case OneValue => s.runCount <= 1
    case Uncompressed => true
    case Dict => depth >= 1 && s.count >= 1
    case Fsst => depth >= 1 && s.count >= 1 && FsstCodec.enabled
    case _ => false
  }

  private def tryAllEncode(
      out: BufWriter,
      values: Array[Array[Byte]],
      count: Int,
      depth: Int,
      cfg: BtrConfig,
      s: StringStats,
      seed: Long
  ): Unit = {
    val candidates = Array(OneValue, Dict, Fsst, Uncompressed)
    var bestBytes: Array[Byte] = null
    var i = 0
    while (i < candidates.length) {
      val sch = candidates(i)
      val allowed = sch == Uncompressed || sch == OneValue || cfg.stringEnabled(sch)
      if (allowed && structurallyValid(sch, s, depth)) {
        val scratch = new BufWriter(1 << 12)
        encodeAs(sch, scratch, values, count, depth, s, cfg, seed)
        if (bestBytes == null || scratch.pos < bestBytes.length) bestBytes = scratch.result()
      }
      i += 1
    }
    out.putBytes(bestBytes)
  }

  private def choose(s: StringStats, depth: Int, cfg: BtrConfig = BtrConfig.Default): Int = {
    if (s.count == 0) return Uncompressed
    if (s.runCount <= 1) return OneValue // exact: single run == constant
    if (depth >= 1 && cfg.stringEnabled(Dict) && s.sDistinct * 2 <= s.sampleN) return Dict
    // whole-column FSST when high uniqueness and enough bytes
    if (depth >= 1 && cfg.stringEnabled(Fsst) && s.totalLen > FsstMinBytes &&
      s.sDistinct * 2 > s.sampleN && graft.format.FsstCodec.enabled) return Fsst
    Uncompressed
  }

  private def encodeAs(
      scheme: Int,
      out: BufWriter,
      values: Array[Array[Byte]],
      count: Int,
      depth: Int,
      s: StringStats,
      cfg: BtrConfig = BtrConfig.Default,
      seed: Long = 42L
  ): Unit = {
    val sub = seed * 6364136223846793005L + 1442695040888963407L
    out.putByte(scheme)
    scheme match {
      case Uncompressed =>
        writeLengths(out, values, count, depth, cfg, sub)
        var i = 0
        while (i < count) { out.putBytes(values(i)); i += 1 }
      case OneValue =>
        val v = if (count > 0) values(0) else Array.emptyByteArray
        out.putInt(v.length)
        out.putBytes(v)
      case Dict =>
        val dict = distinctSortedBytes(values, count)
        out.putInt(dict.length)
        // dict blob: lengths cascade + bytes, optionally FSST-compressed
        var dictBytes = 0L
        var j = 0
        while (j < dict.length) { dictBytes += dict(j).length; j += 1 }
        val useFsst = FsstCodec.enabled && dictBytes >= FsstMinBytes &&
          cfg.stringEnabled(Fsst)
        out.putByte(if (useFsst) 1 else 0)
        if (useFsst) FsstCodec.encodeStrings(out, dict, dict.length, depth - 1, cfg, seed)
        else {
          writeLengths(out, dict, dict.length, depth - 1, cfg, sub)
          j = 0
          while (j < dict.length) { out.putBytes(dict(j)); j += 1 }
        }
        // codes via int cascade (forced RLE-friendly per the reference's
        // string dict, string/DynamicDictionary.cpp:167-189 — our selector
        // picks RLE itself when runs are long)
        val index = new mutable.HashMap[ByteKey, Int]()
        j = 0
        while (j < dict.length) { index(new ByteKey(dict(j))) = j; j += 1 }
        val codes = new Array[Long](count)
        var i = 0
        while (i < count) { codes(i) = index(new ByteKey(values(i))).toLong; i += 1 }
        IntCodec.encode(out, codes, count, 8, depth - 1, cfg, sub + 1)
      case Fsst =>
        FsstCodec.encodeStrings(out, values, count, depth - 1, cfg, seed)
    }
  }

  /** Decode into (lengths, concatenated bytes). */
  // Int-wrap guard for materialized chunk sizes: a clear error beats the
  // ArrayIndexOutOfBounds a silently-wrapped allocation would throw
  private def sizeGuard(total: Long): Int = {
    require(total >= 0 && total <= Int.MaxValue - 16,
      s"btr string chunk materializes to $total bytes (> 2 GiB) — lower btr.blockSize")
    total.toInt
  }

  /** Dictionary view of a DICT/ONE_VALUE chunk: distinct entries plus
    * per-row codes (`codes == null` means constant — every row is
    * `entries(0)`). Null for schemes with no dictionary structure.
    */
  final class DictView(val entries: Array[Array[Byte]], val codes: Array[Long])

  /** Dictionary-preserving decode for the vectorized scan (the Spark
    * analog of the reference's zero-copy string view read,
    * /root/reference/btrblocks/storage/StringPointerArrayViewer.hpp:11-26):
    * DICT chunks yield their distinct entries + codes so the reader can
    * hand Spark a dictionary-encoded ColumnVector instead of
    * materializing every row; ONE_VALUE yields a 1-entry dictionary.
    * Returns null (with `in` unadvanced) for UNCOMPRESSED/FSST — the
    * caller falls back to the materializing [[decode]].
    */
  def decodeDictView(in: BufReader, count: Int): DictView = {
    val probe = in.duplicate()
    probe.getByte() match {
      case OneValue =>
        val len = probe.getInt()
        val v = probe.getBytes(len)
        new DictView(Array(v), null)
      case Dict =>
        val dictSize = probe.getInt()
        val fsstFlag = probe.getByte()
        val (dictLens, dictBytes) =
          if (fsstFlag == 1) FsstCodec.decodeStrings(probe, dictSize)
          else {
            val dl = readLengths(probe, dictSize)
            var t = 0
            var j = 0
            while (j < dictSize) { t += dl(j); j += 1 }
            (dl, probe.getBytes(t))
          }
        val entries = new Array[Array[Byte]](dictSize)
        var off = 0
        var j = 0
        while (j < dictSize) {
          entries(j) = java.util.Arrays.copyOfRange(dictBytes, off, off + dictLens(j))
          off += dictLens(j)
          j += 1
        }
        val codes = IntCodec.decode(probe, count)
        new DictView(entries, codes)
      case _ => null
    }
  }

  def decode(in: BufReader, count: Int): (Array[Int], Array[Byte]) = {
    in.getByte() match {
      case Uncompressed =>
        val lens = readLengths(in, count)
        var total = 0L
        var i = 0
        while (i < count) { total += lens(i); i += 1 }
        val bytes = in.getBytes(sizeGuard(total))
        (lens, bytes)
      case OneValue =>
        val len = in.getInt()
        val v = in.getBytes(len)
        val lens = new Array[Int](count)
        java.util.Arrays.fill(lens, len)
        val bytes = new Array[Byte](sizeGuard(len.toLong * count))
        var i = 0
        while (i < count) { System.arraycopy(v, 0, bytes, i * len, len); i += 1 }
        (lens, bytes)
      case Dict =>
        val dictSize = in.getInt()
        val fsstFlag = in.getByte()
        val (dictLens, dictBytes) =
          if (fsstFlag == 1) FsstCodec.decodeStrings(in, dictSize)
          else {
            val dl = readLengths(in, dictSize)
            var t = 0
            var j = 0
            while (j < dictSize) { t += dl(j); j += 1 }
            (dl, in.getBytes(t))
          }
        val dictOffsets = new Array[Int](dictSize + 1)
        var j = 0
        while (j < dictSize) { dictOffsets(j + 1) = dictOffsets(j) + dictLens(j); j += 1 }
        val codes = IntCodec.decode(in, count)
        val lens = new Array[Int](count)
        var total = 0L
        var i = 0
        while (i < count) {
          lens(i) = dictLens(codes(i).toInt)
          total += lens(i)
          i += 1
        }
        val bytes = new Array[Byte](sizeGuard(total))
        var p = 0
        i = 0
        while (i < count) {
          val c = codes(i).toInt
          System.arraycopy(dictBytes, dictOffsets(c), bytes, p, lens(i))
          p += lens(i)
          i += 1
        }
        (lens, bytes)
      case Fsst =>
        FsstCodec.decodeStrings(in, count)
      case other => throw new IllegalStateException(s"bad string scheme $other")
    }
  }

  private def writeLengths(
      out: BufWriter,
      values: Array[Array[Byte]],
      count: Int,
      depth: Int,
      cfg: BtrConfig = BtrConfig.Default,
      seed: Long = 42L
  ): Unit = {
    val lens = new Array[Long](count)
    var i = 0
    while (i < count) { lens(i) = values(i).length.toLong; i += 1 }
    IntCodec.encode(out, lens, count, 4, math.max(depth, 1), cfg, seed)
  }

  private def readLengths(in: BufReader, count: Int): Array[Int] = {
    val l = IntCodec.decode(in, count)
    val out = new Array[Int](count)
    var i = 0
    while (i < count) { out(i) = l(i).toInt; i += 1 }
    out
  }

  private[format] def distinctSortedBytes(values: Array[Array[Byte]], count: Int): Array[Array[Byte]] = {
    val set = new mutable.HashSet[ByteKey]()
    val list = new mutable.ArrayBuffer[Array[Byte]]()
    var i = 0
    while (i < count) {
      val k = new ByteKey(values(i))
      if (set.add(k)) list += values(i)
      i += 1
    }
    val arr = list.toArray
    java.util.Arrays.sort(arr, ByteKey.lexicographic)
    arr
  }
}

/** Hashable wrapper for byte arrays (map/set keys). */
final class ByteKey(val bytes: Array[Byte]) {
  override val hashCode: Int = java.util.Arrays.hashCode(bytes)
  override def equals(o: Any): Boolean = o match {
    case other: ByteKey => java.util.Arrays.equals(bytes, other.bytes)
    case _ => false
  }
}

object ByteKey {
  val lexicographic: java.util.Comparator[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)
}
