package graft.format

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class FsstSpec extends AnyFunSuite {

  private def s(str: String): Array[Byte] = str.getBytes("UTF-8")

  private def roundTrip(values: Array[Array[Byte]]): Int = {
    val out = new BufWriter()
    FsstCodec.encodeStrings(out, values, values.length, 2)
    val blob = out.result()
    val (lens, bytes) = FsstCodec.decodeStrings(new BufReader(blob), values.length)
    var off = 0
    var i = 0
    while (i < values.length) {
      val got = java.util.Arrays.copyOfRange(bytes, off, off + lens(i))
      assert(java.util.Arrays.equals(got, values(i)), s"mismatch at $i")
      off += lens(i)
      i += 1
    }
    blob.length
  }

  test("fsst round-trips low-entropy text and compresses it") {
    val rnd = new Random(42)
    val words = Array("compression", "columnar", "spark", "vector", "batch", "scan", "data", "query")
    val values = Array.fill(2000)(s(Seq.fill(8 + rnd.nextInt(10))(words(rnd.nextInt(words.length))).mkString(" ")))
    val raw = values.map(_.length).sum
    val size = roundTrip(values)
    assert(size < raw * 6 / 10, s"fsst $size vs raw $raw — expected < 60%")
  }

  test("fsst round-trips adversarial inputs") {
    roundTrip(Array(s(""), s("a"), s(""), s("ab")))
    roundTrip(Array.empty[Array[Byte]])
    // all 256 byte values incl. the escape byte 255
    val all = Array.tabulate(256)(i => Array(i.toByte))
    roundTrip(all)
    val rnd = new Random(7)
    roundTrip(Array.fill(500)({ val b = new Array[Byte](rnd.nextInt(50)); rnd.nextBytes(b); b }))
    // unicode
    roundTrip(Array(s("日本語テキストのサンプル"), s("más allá"), s("𝄞 music")))
  }

  test("string codec picks fsst for high-uniqueness large text and round-trips") {
    val rnd = new Random(9)
    val words = Array("the", "data", "lake", "engine", "runs", "fast", "scan", "filter")
    val values = Array.tabulate(2000)(i =>
      s(s"doc$i " + Seq.fill(12)(words(rnd.nextInt(words.length))).mkString(" ")))
    val out = new BufWriter()
    StringCodec.encode(out, values, values.length, 3)
    val blob = out.result()
    assert(blob(0).toInt == StringCodec.Fsst, s"expected FSST, got scheme ${blob(0)}")
    val (lens, bytes) = StringCodec.decode(new BufReader(blob), values.length)
    var off = 0
    for (i <- values.indices) {
      assert(java.util.Arrays.equals(java.util.Arrays.copyOfRange(bytes, off, off + lens(i)), values(i)))
      off += lens(i)
    }
    val raw = values.map(_.length + 4).sum
    assert(blob.length < raw / 2, s"fsst-in-codec $blob.length vs $raw")
  }
}
