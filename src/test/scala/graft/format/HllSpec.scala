package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog NDV sketch: accuracy across the cardinality range (the
  * linear-counting and raw-HLL regimes), merge-as-union, and footer v6
  * serialization round-trip.
  */
class HllSpec extends AnyFunSuite {

  private def sketchOf(p: Int, ids: Range): Array[Byte] = {
    val reg = Hll.create(p)
    ids.foreach(i => Hll.add(reg, p, Bloom.hashLong(i.toLong)))
    reg
  }

  test("estimate within 5% across cardinality regimes at p=12") {
    val p = 12
    for (n <- Seq(1, 5, 100, 1000, 5000, 15000, 100000, 1000000)) {
      val est = Hll.estimate(sketchOf(p, 0 until n), p)
      val err = math.abs(est - n).toDouble / n
      assert(err <= 0.05, s"n=$n est=$est err=$err")
    }
  }

  test("empty sketch estimates zero") {
    assert(Hll.estimate(Hll.create(12), 12) == 0L)
  }

  test("duplicates never inflate the estimate") {
    val p = 12
    val reg = Hll.create(p)
    for (_ <- 0 until 50; i <- 0 until 1000) Hll.add(reg, p, Bloom.hashLong(i.toLong))
    val est = Hll.estimate(reg, p)
    assert(math.abs(est - 1000).toDouble / 1000 <= 0.05, s"est=$est")
  }

  test("merge of disjoint streams estimates the union") {
    val p = 12
    val a = sketchOf(p, 0 until 50000)
    val b = sketchOf(p, 50000 until 100000)
    Hll.merge(a, b)
    val est = Hll.estimate(a, p)
    assert(math.abs(est - 100000).toDouble / 100000 <= 0.05, s"est=$est")
  }

  test("merge of identical streams is idempotent") {
    val p = 12
    val a = sketchOf(p, 0 until 20000)
    val solo = Hll.estimate(a, p)
    Hll.merge(a, sketchOf(p, 0 until 20000))
    assert(Hll.estimate(a, p) == solo)
  }

  test("low precisions stay within their own error bounds") {
    // sigma = 1.04/sqrt(m); allow 3 sigma
    for (p <- Seq(8, 10, 14)) {
      val m = 1 << p
      val tol = 3.0 * 1.04 / math.sqrt(m.toDouble)
      val n = 30000
      val est = Hll.estimate(sketchOf(p, 0 until n), p)
      assert(math.abs(est - n).toDouble / n <= tol, s"p=$p est=$est")
    }
  }

  test("footer v6 round-trips per-column sketches; absent entries survive") {
    val p = 10
    val regA = sketchOf(p, 0 until 500)
    val regC = sketchOf(p, 0 until 3)
    val meta = BtrFile.ColumnChunkMeta(8L, 16, 0, 1, 0L, 9L, 0, 0, sumLong = 45L)
    val footer = BtrFile.Footer(
      Array(BtrFile.RowGroupMeta(10, Array(meta, meta.copy(offset = 24L), meta.copy(offset = 40L)))),
      colTags = Array(PhysType.Int64, PhysType.Str, PhysType.Int64),
      ndvP = p,
      colNdv = Array(regA, null, regC))
    val parsed = BtrFile.footerFromBody(BtrFile.footerBodyBytes(footer))
    assert(parsed.ndvP == p)
    assert(java.util.Arrays.equals(parsed.ndvOf(0), regA))
    assert(parsed.ndvOf(1) == null)
    assert(java.util.Arrays.equals(parsed.ndvOf(2), regC))
    assert(Hll.estimate(parsed.ndvOf(0), p) == Hll.estimate(regA, p))
  }

  test("footer without sketches serializes and parses as absent") {
    val meta = BtrFile.ColumnChunkMeta(8L, 16, 0, 0, 0L, 0L, 0, 0)
    val footer = BtrFile.Footer(
      Array(BtrFile.RowGroupMeta(4, Array(meta))), colTags = Array(PhysType.Int32))
    val parsed = BtrFile.footerFromBody(BtrFile.footerBodyBytes(footer))
    assert(parsed.ndvP == 0 && parsed.colNdv == null)
  }
}
