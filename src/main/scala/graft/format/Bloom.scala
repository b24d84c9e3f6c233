package graft.format

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Split-block Bloom filter for per-chunk equality pruning — the design
  * from Putze/Sanders/Singler 2007 ("Cache-, Hash- and Space-Efficient
  * Bloom Filters") that the public Apache Parquet format adopted for its
  * column-index bloom filters: each key touches ONE cache-line-sized
  * 256-bit block, setting one bit in each of its eight 32-bit words.
  *
  * The reference format has no bloom filters (min/max only,
  * /root/reference/btrblocks/stats/NumberStats.hpp); this is the
  * scale-path addition for equality probes on columns whose min/max
  * ranges overlap every chunk — point lookups on unsorted string/int
  * keys skip chunks at PLANNING time instead of decoding them.
  *
  * Hashing is xxhash64 (Spark's own [[XXH64]], seed 0) over the raw
  * long (int family / unscaled decimal) or the raw bytes (string /
  * binary), so writer and scan-side prober agree by construction.
  */
object Bloom {
  // one block = 8 x 32-bit words = 256 bits; per-word salts from the
  // public Parquet bloom-filter spec (any fixed odd constants work —
  // these are the published, interoperable choice)
  private val Salts = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  val WordsPerBlock = 8
  val BytesPerBlock: Int = WordsPerBlock * 4

  /** Power-of-two block count targeting ~8 bits/distinct value (fpp ≈ 1%
    * for the 8-salt split block), or 0 when the needed filter would
    * exceed `maxBytes` (high-cardinality chunks store no bloom — min/max
    * plus clustering already serve sorted keys, and a saturated filter
    * would prune nothing while bloating every footer).
    */
  def blocksFor(ndv: Int, maxBytes: Int): Int = {
    if (ndv <= 0) return 0
    val needBits = math.max(256L, ndv.toLong * 8L)
    var blocks = 1L
    while (blocks * 256L < needBits) blocks <<= 1
    if (blocks * BytesPerBlock > maxBytes) 0 else blocks.toInt
  }

  def hashLong(v: Long): Long = XXH64.hashLong(v, 0L)

  def hashBytes(b: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0L)

  // high hash bits pick the block (block count is a power of two)
  private def blockBase(bits: Array[Int], h: Long): Int =
    (((h >>> 32) & (bits.length / WordsPerBlock - 1)).toInt) * WordsPerBlock

  def insert(bits: Array[Int], h: Long): Unit = {
    val base = blockBase(bits, h)
    val key = h.toInt
    var i = 0
    while (i < WordsPerBlock) {
      bits(base + i) |= 1 << ((Salts(i) * key) >>> 27)
      i += 1
    }
  }

  def mightContain(bits: Array[Int], h: Long): Boolean = {
    val base = blockBase(bits, h)
    val key = h.toInt
    var i = 0
    while (i < WordsPerBlock) {
      if ((bits(base + i) & (1 << ((Salts(i) * key) >>> 27))) == 0) return false
      i += 1
    }
    true
  }

  /** Open-addressing set of long hashes (no boxing) for write-time
    * distinct counting; the zero key rides on a flag. Sized for one
    * column chunk (≤ 65,536 values), grows by doubling.
    */
  final class LongSet(initialCapacity: Int = 1024) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity - 1)) << 1
    private var keys = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    private var hasZero = false

    def size: Int = n + (if (hasZero) 1 else 0)

    def add(k: Long): Unit = {
      if (k == 0L) { hasZero = true; return }
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L) & (cap - 1))
      while (used(i)) {
        if (keys(i) == k) return
        i = (i + 1) & (cap - 1)
      }
      keys(i) = k
      used(i) = true
      n += 1
      if (n * 4 > cap * 3) grow()
    }

    private def grow(): Unit = {
      val oldKeys = keys
      val oldUsed = used
      cap <<= 1
      keys = new Array[Long](cap)
      used = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < oldKeys.length) {
        if (oldUsed(i)) add(oldKeys(i))
        i += 1
      }
    }

    def foreach(f: Long => Unit): Unit = {
      if (hasZero) f(0L)
      var i = 0
      while (i < keys.length) {
        if (used(i)) f(keys(i))
        i += 1
      }
    }
  }

  /** Build the chunk's bloom bits from its distinct-hash set, or null
    * when disabled/too large for the byte budget.
    */
  def build(set: LongSet, maxBytes: Int): Array[Int] = {
    val blocks = blocksFor(set.size, maxBytes)
    if (blocks == 0) return null
    val bits = new Array[Int](blocks * WordsPerBlock)
    set.foreach(h => insert(bits, h))
    bits
  }
}
