package graft.format

/** Structural walkers: parse an encoded block and render its cascade tree
  * (scheme names + nesting) without materializing values — the analog of
  * BtrReader::getSchemeDescription
  * (/root/reference/btrblocks/compression/BtrReader.cpp:76-97).
  *
  * Each walker must consume exactly the bytes its codec's decode would
  * (verified by spec against decode positions).
  */
object BlockDescribe {

  def describeChunk(in: BufReader, tag: Int, count: Int): (String, String) = {
    val nullKind = walkNullMap(in)
    val tree =
      if (PhysType.isIntFamily(tag) || tag == PhysType.Float) describeInt(in, count)
      else if (tag == PhysType.Double) describeDouble(in, count)
      else if (tag == PhysType.ArrStruct) describeArrStruct(in, count)
      else if (tag == PhysType.ArrArr) describeArrArr(in, count)
      else if (PhysType.isArrayFamily(tag)) describeArray(in, tag, count)
      else if (tag == PhysType.Struct) describeStruct(in, count)
      else if (tag == PhysType.KvMap) describeMap(in, count)
      else describeString(in, count)
    (nullKind, tree)
  }

  private def describeStruct(in: BufReader, count: Int): String = {
    val leafCount = in.getByte()
    val parts = (0 until leafCount).map { _ =>
      val lt = in.getByte()
      val len = in.getInt()
      val end = in.pos + len
      // a leaf body is a full column body — recurse (nested structs and
      // array leaves describe like any column); length-skip guards the
      // walker's byte position either way
      val (nulls, desc) = describeChunk(in, lt, count)
      in.skip(end - in.pos)
      s"$nulls:$desc"
    }
    s"struct(${parts.mkString(", ")})"
  }

  private def describeMap(in: BufReader, count: Int): String = {
    val (lensDesc, _) = describeLengths(in, count)
    val ec = in.getInt()
    val parts = (0 until 2).map { _ =>
      val st = in.getByte()
      // each side is a full column body over the entries (array-valued
      // sides recurse into the array layout)
      val (nulls, desc) = describeChunk(in, st, ec)
      s"$nulls:$desc"
    }
    s"map(n_entries=$ec, lengths=$lensDesc, keys=${parts(0)}, values=${parts(1)})"
  }

  private def describeArrArr(in: BufReader, count: Int): String = {
    val (lensDesc, _) = describeLengths(in, count)
    val ec = in.getInt()
    val it = in.getByte()
    // the element stream is an array column body over the outer elements
    val (elemNulls, body) = describeChunk(in, it, ec)
    s"array(n_elems=$ec, lengths=$lensDesc, elem_nulls=$elemNulls, elems=$body)"
  }

  private def describeArrStruct(in: BufReader, count: Int): String = {
    val (lensDesc, _) = describeLengths(in, count)
    val ec = in.getInt()
    val (elemNulls, body) = describeChunk(in, PhysType.Struct, ec)
    s"array(n_elems=$ec, lengths=$lensDesc, elem_nulls=$elemNulls, elems=$body)"
  }

  private def walkNullMap(in: BufReader): String = in.getByte() match {
    case NullMap.NoNulls => "all_valid"
    case NullMap.AllNulls => "all_null"
    case kind =>
      val n = in.getInt()
      val width = in.getByte()
      in.skip(Bitpack.packedBytes(n, width))
      if (kind == NullMap.NullPositions) "sparse_nulls" else "sparse_valids"
  }

  private def describeArray(in: BufReader, tag: Int, count: Int): String = {
    val (lensDesc, _) = describeLengths(in, count)
    val ec = in.getInt()
    val elemNulls = walkNullMap(in)
    val et = PhysType.elemTag(tag)
    val elemDesc =
      if (et == PhysType.Double) describeDouble(in, ec)
      else if (et == PhysType.Str) describeString(in, ec)
      else describeInt(in, ec)
    s"array(n_elems=$ec, lengths=$lensDesc, elem_nulls=$elemNulls, elems=$elemDesc)"
  }

  def describeInt(in: BufReader, count: Int): String = {
    in.getByte() match {
      case IntCodec.Uncompressed =>
        val w = in.getByte()
        in.skip(count * w)
        "raw"
      case IntCodec.OneValue =>
        in.skip(8)
        "one_value"
      case IntCodec.ForBp =>
        in.skip(8)
        val w = in.getByte()
        in.skip(Bitpack.packedBytes(count, w))
        s"for_bp(w=$w)"
      case IntCodec.DeltaBp =>
        in.skip(16)
        val w = in.getByte()
        if (count > 1) in.skip(Bitpack.packedBytes(count - 1, w))
        s"delta_bp(w=$w)"
      case IntCodec.Dict =>
        val dictSize = in.getInt()
        val d = describeInt(in, dictSize)
        val c = describeInt(in, count)
        s"dict(n=$dictSize, values=$d, codes=$c)"
      case IntCodec.Rle =>
        val nRuns = in.getInt()
        val v = describeInt(in, nRuns)
        val l = describeInt(in, nRuns)
        s"rle(n=$nRuns, values=$v, lengths=$l)"
      case IntCodec.Frequency =>
        in.skip(8)
        val nExc = in.getInt()
        val p = describeInt(in, nExc)
        val e = describeInt(in, nExc)
        s"freq(exc=$nExc, pos=$p, values=$e)"
      case IntCodec.Pfor =>
        in.skip(8)
        val w = in.getByte()
        in.skip(Bitpack.packedBytes(count, w))
        val nExc = in.getInt()
        val p = describeInt(in, nExc)
        val e = describeInt(in, nExc)
        s"pfor(w=$w, exc=$nExc, pos=$p, values=$e)"
      case other => s"int:?$other"
    }
  }

  def describeDouble(in: BufReader, count: Int): String = {
    in.getByte() match {
      case DoubleCodec.Uncompressed =>
        in.skip(count * 8)
        "raw"
      case DoubleCodec.OneValue =>
        in.skip(8)
        "one_value"
      case DoubleCodec.Dict =>
        val dictSize = in.getInt()
        in.skip(dictSize * 8)
        val c = describeInt(in, count)
        s"dict(n=$dictSize, codes=$c)"
      case DoubleCodec.Rle =>
        val nRuns = in.getInt()
        in.skip(nRuns * 8)
        val l = describeInt(in, nRuns)
        s"rle(n=$nRuns, lengths=$l)"
      case DoubleCodec.Frequency =>
        in.skip(8)
        val nExc = in.getInt()
        val p = describeInt(in, nExc)
        val e = describeInt(in, nExc)
        s"freq(exc=$nExc, pos=$p, values=$e)"
      case DoubleCodec.Pseudodecimal =>
        val d = describeInt(in, count)
        val e = describeInt(in, count)
        val nPatch = in.getInt()
        in.skip(nPatch * 8)
        s"pseudodec(digits=$d, exps=$e, patches=$nPatch)"
      case DoubleCodec.Alp =>
        // per-1024-value-block scale bytes, digit cascade, patch stream
        val nBlocks = (count + 1023) / 1024
        var minG = Int.MaxValue
        var maxG = Int.MinValue
        var b = 0
        while (b < nBlocks) {
          val g = in.getByte() - 18
          if (g < minG) minG = g
          if (g > maxG) maxG = g
          b += 1
        }
        val d = describeInt(in, count)
        val nPatch = in.getInt()
        val p = describeInt(in, nPatch) // present even when empty
        in.skip(nPatch * 8)
        s"alp(g=$minG..$maxG, digits=$d, patches=$nPatch, pos=$p)"
      case DoubleCodec.DoubleBp =>
        // two u32 planes in 256-value blocks: width byte + packed words
        var widths = List.empty[Int]
        var plane = 0
        while (plane < 2) {
          var base = 0
          while (base < count) {
            val n = math.min(256, count - base)
            val w = in.getByte()
            widths = w :: widths
            in.skip(Bitpack.packedBytes(n, w))
            base += n
          }
          plane += 1
        }
        s"double_bp(max_width=${if (widths.isEmpty) 0 else widths.max})"
      case other => s"dbl:?$other"
    }
  }

  def describeString(in: BufReader, count: Int): String = {
    in.getByte() match {
      case StringCodec.Uncompressed =>
        val (lensDesc, total) = describeLengths(in, count)
        in.skip(total)
        s"raw(lengths=$lensDesc)"
      case StringCodec.OneValue =>
        val len = in.getInt()
        in.skip(len)
        "one_value"
      case StringCodec.Dict =>
        val dictSize = in.getInt()
        val fsst = in.getByte() == 1
        val dictDesc =
          if (fsst) describeFsst(in, dictSize)
          else {
            val (ld, total) = describeLengths(in, dictSize)
            in.skip(total)
            s"raw(lengths=$ld)"
          }
        val codes = describeInt(in, count)
        s"dict(n=$dictSize, dict=$dictDesc, codes=$codes)"
      case StringCodec.Fsst =>
        describeFsst(in, count)
      case other => s"str:?$other"
    }
  }

  private def describeFsst(in: BufReader, count: Int): String = {
    val nSyms = in.getByte()
    var c = 0
    while (c < nSyms) {
      val len = in.getByte()
      in.skip(len)
      c += 1
    }
    val (lensDesc, total) = describeLengths(in, count)
    in.skip(total)
    s"fsst(symbols=$nSyms, lengths=$lensDesc)"
  }

  /** Describe a lengths sub-block and return (description, totalBytes) —
    * the byte total requires decoding the lengths, the tree comes from a
    * duplicate reader walking the same region.
    */
  private def describeLengths(in: BufReader, count: Int): (String, Int) = {
    val desc = describeInt(in.duplicate(), count)
    val lens = IntCodec.decode(in, count)
    var total = 0L
    var i = 0
    while (i < count) { total += lens(i); i += 1 }
    (desc, total.toInt)
  }
}
