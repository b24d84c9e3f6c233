package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Planning-time footer fetches must overlap: a 100k-file table whose
  * footers are tail-read one at a time on the driver turns planning into
  * the bottleneck (the reference parallelizes the same metadata pass
  * with TBB, tools/conversion/decompression-speed.cpp:46-59).
  */
class BtrFootersSpec extends AnyFunSuite {

  private def entries(n: Int): Array[BtrTableMeta.DataFileEntry] =
    Array.tabulate(n)(i => BtrTableMeta.DataFileEntry(new Path(s"/t/f$i.btr"), 100L, Map.empty))

  test("footer reads overlap up to the concurrency bound") {
    val n = BtrFooters.MaxConcurrency * 2
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    // gate: no read finishes until MaxConcurrency reads have started —
    // a serial implementation would deadlock here instead of passing
    val gate = new CountDownLatch(BtrFooters.MaxConcurrency)
    val out = BtrFooters.readAll(entries(n)) { e =>
      val cur = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, cur))
      gate.countDown()
      assert(gate.await(30, TimeUnit.SECONDS), "reads never overlapped — serial footer fetch")
      inFlight.decrementAndGet()
      e.path.getName
    }
    assert(maxSeen.get() >= 2, s"no overlap observed (max in-flight ${maxSeen.get()})")
    // order and pairing preserved
    assert(out.map(_._2).toSeq == (0 until n).map(i => s"f$i.btr"))
    assert(out.forall { case (e, name) => e.path.getName == name })
  }

  test("single entry short-circuits without a pool") {
    val out = BtrFooters.readAll(entries(1))(e => e.len)
    assert(out.toSeq == Seq((entries(1).head, 100L)))
  }

  test("a failing read surfaces the original exception") {
    val boom = intercept[IllegalStateException] {
      BtrFooters.readAll(entries(4)) { e =>
        if (e.path.getName == "f2.btr") throw new IllegalStateException("corrupt footer")
        e.len
      }
    }
    assert(boom.getMessage == "corrupt footer")
  }
}
