package graft.tools

import graft.format._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** CLI surface of the codec library — the analog of the reference's
  * conversion/inspection tools (/root/reference/tools/conversion/
  * decompression-speed.cpp, csvtobtr.cpp): reads a parquet table, encodes
  * every column in 65,536-row chunks, decodes it back, verifies equality
  * on non-null positions, and prints per-column scheme, compression ratio
  * and decode bandwidth.
  *
  * Usage: runMain graft.tools.BtrCli <sfDir> <table> [reps]
  */
object BtrCli {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val table = if (args.length > 1) args(1) else "lineitem"
    val reps = if (args.length > 2) args(2).toInt else 3

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("btr-cli")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read it as raw nanos-since-epoch longs instead.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    val rows = df.collect() // CLI inspection tool: single-node by design
    val schema = df.schema
    println(s"table=$table rows=${rows.length}")
    println(f"${"column"}%-20s ${"type"}%-10s ${"scheme"}%-14s ${"raw"}%10s ${"comp"}%10s ${"ratio"}%7s ${"MB/s"}%9s")

    var totalRaw = 0L
    var totalComp = 0L
    schema.fields.zipWithIndex.foreach { case (field, ci) =>
      if (PhysType.supported(field.dataType)) {
        val tag = PhysType.of(field.dataType)
        val n = rows.length
        var rawBytes = 0L
        var compBytes = 0L
        var decodeNanos = 0L
        var schemeName = ""
        var off = 0
        while (off < n) {
          val count = math.min(BtrFile.DefaultBlockSize, n - off)
          val chunk = new ColumnChunk(tag, count)
          if (PhysType.isIntFamily(tag)) {
            chunk.longs = new Array[Long](count)
            var i = 0
            while (i < count) {
              val r = rows(off + i)
              if (r.isNullAt(ci)) chunk.isNull(i) = true
              else chunk.longs(i) = field.dataType match {
                case IntegerType => r.getInt(ci).toLong
                case LongType => r.getLong(ci)
                case ShortType => r.getShort(ci).toLong
                case ByteType => r.getByte(ci).toLong
                case BooleanType => if (r.getBoolean(ci)) 1L else 0L
                case DateType => r.getDate(ci).toLocalDate.toEpochDay
                case d: DecimalType => r.getDecimal(ci).setScale(d.scale).unscaledValue().longValueExact()
                case _ => // timestamp / timestamp_ntz → micros
                  r.get(ci) match {
                    case ts: java.sql.Timestamp =>
                      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
                    case ldt: java.time.LocalDateTime =>
                      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
                      inst.getEpochSecond * 1000000L + inst.getNano / 1000
                    case inst: java.time.Instant =>
                      inst.getEpochSecond * 1000000L + inst.getNano / 1000
                  }
              }
              i += 1
            }
            rawBytes += count.toLong * PhysType.physWidth(tag)
          } else if (tag == PhysType.Double) {
            chunk.doubles = new Array[Double](count)
            var i = 0
            while (i < count) {
              val r = rows(off + i)
              if (r.isNullAt(ci)) chunk.isNull(i) = true
              else chunk.doubles(i) = r.getDouble(ci)
              i += 1
            }
            rawBytes += count.toLong * 8
          } else if (tag == PhysType.Float) {
            // floats travel as raw bits through the int path (the same
            // lossless convention as the writer, BtrWrite.scala)
            chunk.longs = new Array[Long](count)
            var i = 0
            while (i < count) {
              val r = rows(off + i)
              if (r.isNullAt(ci)) chunk.isNull(i) = true
              else chunk.longs(i) = java.lang.Float.floatToRawIntBits(r.getFloat(ci)).toLong
              i += 1
            }
            rawBytes += count.toLong * 4
          } else {
            chunk.strings = new Array[Array[Byte]](count)
            var i = 0
            while (i < count) {
              val r = rows(off + i)
              if (r.isNullAt(ci)) { chunk.isNull(i) = true; chunk.strings(i) = Array.emptyByteArray }
              else chunk.strings(i) = r.get(ci) match {
                case b: Array[Byte] => b
                case other => String.valueOf(other).getBytes("UTF-8")
              }
              rawBytes += chunk.strings(i).length + 4
              i += 1
            }
          }
          val out = new BufWriter()
          ChunkCodec.encode(out, chunk, BtrFile.DefaultCascadeDepth)
          val blob = out.result()
          compBytes += blob.length
          // scheme name from the data block (skip nullmap)
          val peek = new BufReader(blob)
          NullMap.decode(peek, count)
          schemeName = schemeLabel(tag, peek.getByte())
          // decode + verify
          var rep = 0
          var dec: ChunkCodec.Decoded = null
          while (rep < reps) {
            val t0 = System.nanoTime()
            dec = ChunkCodec.decode(new BufReader(blob), tag, count)
            decodeNanos += System.nanoTime() - t0
            rep += 1
          }
          var i = 0
          var strOff = 0 // running byte offset into the decoded string stream
          while (i < count) {
            assert(dec.isNull(i) == chunk.isNull(i), s"null mismatch $table.${field.name} row ${off + i}")
            if (!dec.isNull(i)) {
              val ok =
                if (PhysType.isIntFamily(tag) || tag == PhysType.Float) dec.longs(i) == chunk.longs(i)
                else if (tag == PhysType.Double)
                  java.lang.Double.doubleToRawLongBits(dec.doubles(i)) ==
                    java.lang.Double.doubleToRawLongBits(chunk.doubles(i))
                else {
                  // strings/binary: byte-exact against the decoded stream
                  // (a verify tool that skips values verifies nothing)
                  dec.strLens(i) == chunk.strings(i).length &&
                    java.util.Arrays.equals(
                      java.util.Arrays.copyOfRange(dec.strBytes, strOff, strOff + dec.strLens(i)),
                      chunk.strings(i))
                }
              assert(ok, s"value mismatch $table.${field.name} row ${off + i}")
            }
            if (dec.strLens != null) strOff += dec.strLens(i)
            i += 1
          }
          off += count
        }
        totalRaw += rawBytes
        totalComp += compBytes
        val mbps = rawBytes.toDouble * reps / 1e6 / (decodeNanos / 1e9)
        println(f"${field.name}%-20s ${field.dataType.simpleString}%-10s $schemeName%-14s $rawBytes%10d $compBytes%10d ${rawBytes.toDouble / compBytes}%7.2f $mbps%9.0f")
      } else {
        println(f"${field.name}%-20s ${field.dataType.simpleString}%-10s ${"(skipped)"}%-14s")
      }
    }
    println(f"TOTAL raw=$totalRaw comp=$totalComp ratio=${totalRaw.toDouble / totalComp}%.2f")
    spark.stop()
  }

  def schemeLabel(tag: Int, id: Int): String =
    if (PhysType.isIntFamily(tag) || tag == PhysType.Float) id match {
      case IntCodec.Uncompressed => "raw"
      case IntCodec.OneValue => "one_value"
      case IntCodec.Dict => "dict"
      case IntCodec.Rle => "rle"
      case IntCodec.ForBp => "for_bp"
      case IntCodec.DeltaBp => "delta_bp"
      case IntCodec.Frequency => "frequency"
      case _ => s"int:$id"
    }
    else if (tag == PhysType.Double) id match {
      case DoubleCodec.Uncompressed => "raw"
      case DoubleCodec.OneValue => "one_value"
      case DoubleCodec.Dict => "dict"
      case DoubleCodec.Rle => "rle"
      case DoubleCodec.Frequency => "frequency"
      case DoubleCodec.Pseudodecimal => "pseudodec"
      case DoubleCodec.DoubleBp => "double_bp"
      case DoubleCodec.Alp => "alp"
      case _ => s"dbl:$id"
    }
    else id match {
      case StringCodec.Uncompressed => "raw"
      case StringCodec.OneValue => "one_value"
      case StringCodec.Dict => "dict"
      case StringCodec.Fsst => "fsst"
      case _ => s"str:$id"
    }
}
