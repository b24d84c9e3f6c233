package graft.format

import org.scalatest.funsuite.AnyFunSuite

class DeletionVectorSpec extends AnyFunSuite {

  test("blob rel round-trips the target rel, including escapes") {
    val rels = Seq("part-0001.btr", "k=3/part-x.btr", "a%b/c=d%2F/file.btr")
    rels.foreach { rel =>
      val blob = DeletionVector.blobRel(rel, "w123-0-7")
      assert(blob.startsWith("_btr_dv/"))
      assert(DeletionVector.targetOf(blob).contains(rel))
      assert(DeletionVector.isDvRel(blob))
    }
    assert(DeletionVector.targetOf("part-0001.btr").isEmpty)
    assert(DeletionVector.targetOf("_btr_dv/garbage").isEmpty)
  }

  test("serialize/deserialize round-trips ranges and counts") {
    val pos = Array(0L, 1L, 2L, 10L, 65535L, 65536L, 65537L, 1000000L)
    val bytes = DeletionVector.serialize(4242L, pos)
    val blob = DeletionVector.deserialize(bytes)
    assert(blob.expectedTargetLen == 4242L)
    assert(blob.posCount == pos.length)
    val back = blob.starts.zip(blob.lens).flatMap { case (s, l) => s until (s + l) }
    assert(back.toSeq == pos.toSeq)
    // contiguous runs compress: 8 positions -> 4 ranges
    assert(blob.starts.length == 4)
  }

  test("fuzz: random position sets round-trip and mask groups correctly") {
    val rnd = new java.util.Random(42)
    (0 until 50).foreach { trial =>
      val count = rnd.nextInt(400)
      val pos = Array.fill(count)(math.abs(rnd.nextLong()) % 200000L).distinct.sorted
      val blob = DeletionVector.deserialize(DeletionVector.serialize(1L, pos))
      assert(blob.posCount == pos.length, s"trial $trial")
      val mask = new DeletionVector.FileMask(Array(blob))
      val want = pos.toSet
      // walk ascending 64k groups like the scan does
      var base = 0L
      while (base < 262144L) {
        val bs = mask.deletedIn(base, 65536)
        var i = 0
        while (i < 65536) {
          val expect = want.contains(base + i)
          val got = bs != null && bs.get(i)
          assert(expect == got, s"trial $trial pos ${base + i}")
          i += 1
        }
        base += 65536L
      }
    }
  }

  test("FileMask unions overlapping blobs from concurrent deletes") {
    val a = DeletionVector.deserialize(DeletionVector.serialize(1L, Array(1L, 2L, 3L, 100L)))
    val b = DeletionVector.deserialize(DeletionVector.serialize(1L, Array(2L, 3L, 4L, 200L)))
    val mask = new DeletionVector.FileMask(Array(a, b))
    val bs = mask.deletedIn(0L, 300)
    assert((0 until 300).filter(bs.get) == Seq(1, 2, 3, 4, 100, 200))
  }

  test("runs crossing a group boundary mask both groups") {
    // one run [65530, 65550) spans the 65536 boundary
    val pos = (65530L until 65550L).toArray
    val mask = new DeletionVector.FileMask(
      Array(DeletionVector.deserialize(DeletionVector.serialize(1L, pos))))
    val g0 = mask.deletedIn(0L, 65536)
    assert((0 until 65536).filter(g0.get).map(_.toLong) == (65530L until 65536L))
    val g1 = mask.deletedIn(65536L, 65536)
    assert((0 until 65536).filter(g1.get).map(i => 65536L + i) == (65536L until 65550L))
  }
}
