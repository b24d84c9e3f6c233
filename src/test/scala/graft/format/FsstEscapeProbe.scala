package graft.format

/** Diagnostic: escape density + block pass-rate of the KernelBench FSST
  * corpus — decides whether a 16-byte escape-free burst can ever fire.
  */
object FsstEscapeProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val vals = Array.fill(65536)(bytes(
      s"https://www.example-${rnd.nextInt(50)}.com/products/category/item-${rnd.nextInt(100000)}?ref=search&page=${rnd.nextInt(40)}"))
    val table = SymbolTable.train(vals, vals.length)
    println(s"symbols=${table.symbols.length} lens=${table.symbols.map(_.length).groupBy(identity).view.mapValues(_.length).toMap.toSeq.sorted}")
    var esc = 0L; var sym = 0L
    val comp = vals.map(table.compress)
    comp.foreach { c =>
      var i = 0
      while (i < c.length) {
        if ((c(i) & 0xff) == 255) { esc += 1; i += 2 } else { sym += 1; i += 1 }
      }
    }
    val flat = comp.flatten
    var blocks = 0L; var clean = 0L
    var i = 0
    while (i + 16 <= flat.length) {
      blocks += 1
      var hasEsc = false
      var k = 0
      while (k < 16 && !hasEsc) { if ((flat(i + k) & 0xff) == 255) hasEsc = true; k += 1 }
      if (!hasEsc) clean += 1
      i += 16
    }
    println(f"escapes=$esc symbols=$sym escEventRate=${esc.toDouble / (esc + sym)}%.3f " +
      f"cleanBlocks=${clean.toDouble / blocks}%.3f compBytes=${flat.length}")

    // stage timing of the full decode call
    val out = new BufWriter(1 << 20)
    StringCodec.encodeForced(StringCodec.Fsst, out, vals, vals.length, 3)
    val enc = out.result()
    def time(n: Int)(f: => Unit): Double = {
      var best = Double.MaxValue
      var i = 0
      while (i < n) { val t0 = System.nanoTime(); f; best = math.min(best, (System.nanoTime() - t0) / 1e9); i += 1 }
      best
    }
    val whole = time(40) { StringCodec.decode(new BufReader(enc), vals.length) }
    // stages: table read, lens, getBytes — replicate decodeStrings' prologue
    val stage = time(40) {
      val in = new BufReader(enc)
      in.getByte() // scheme tag consumed by StringCodec.decode normally
      val table = SymbolTable.read(in)
      val lensL = IntCodec.decode(in, vals.length)
      var total = 0
      var i2 = 0
      while (i2 < vals.length) { total += lensL(i2).toInt; i2 += 1 }
      val c = in.getBytes(total)
      if (c.length == 0 || table.symLen(0) < 0) println("?")
    }
    println(f"whole=${whole * 1000}%.3f ms prologue=${stage * 1000}%.3f ms")
  }
}
