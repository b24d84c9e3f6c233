package graft.sources

import graft.format._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

/** Scan planning for the btr format: column pruning via
  * SupportsPushDownRequiredColumns (only the projected columns' blocks are
  * ever read — structural projection, like the reference's per-column part
  * files), filter pushdown via SupportsPushDownFilters (chunk skipping on
  * footer min/max, the implemented version of the reference's stubbed
  * predicate scan hook, scheme/CompressionScheme.hpp:45-47). All filters
  * are also re-evaluated by Catalyst above the scan, so skipping is purely
  * an I/O optimization and can never change results.
  */
class BtrScanBuilder(path: String, tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var requiredSchema: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = required
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep every filter that references only columns with usable stats for
    // chunk skipping; ALL filters remain post-scan residuals (correctness
    // never depends on skipping)
    pushed = filters.filter(ChunkSkip.supports(tableSchema, _))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new BtrScan(path, tableSchema, requiredSchema, pushed, BtrOptions.splitBytes(options))
}

class BtrScan(
    path: String,
    tableSchema: StructType,
    requiredSchema: StructType,
    filters: Array[Filter],
    splitBytes: Long
) extends Scan
    with Batch {

  override def readSchema(): StructType = requiredSchema

  override def description(): String =
    s"btr $path, pushed chunk-skip filters: [${filters.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
    val files = BtrTableMeta.listDataFiles(fs, dir)
    val colIndices = requiredSchema.fields.map(f => tableSchema.fieldIndex(f.name))

    val partitions = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    files.foreach { file =>
      // footer-only read: planning I/O is O(footer bytes), not O(data)
      val len = fs.getFileStatus(file).getLen
      val footer = BtrFile.readFooter(fs, file, len)

      // chunk-skip + group surviving row groups into ~splitBytes splits
      var current = scala.collection.mutable.ArrayBuffer.empty[BtrChunkRange]
      var currentBytes = 0L
      def flush(): Unit = {
        if (current.nonEmpty) {
          partitions += BtrInputPartition(file.toString, current.toArray)
          current = scala.collection.mutable.ArrayBuffer.empty[BtrChunkRange]
          currentBytes = 0L
        }
      }
      footer.rowGroups.foreach { rg =>
        val keep = filters.isEmpty || !filters.exists(f => ChunkSkip.canSkip(tableSchema, rg, f))
        if (keep) {
          val offsets = colIndices.map(ci => rg.columns(ci).offset)
          val lengths = colIndices.map(ci => rg.columns(ci).length)
          current += BtrChunkRange(rg.numRows, offsets, lengths)
          currentBytes += lengths.map(_.toLong).sum
          if (currentBytes >= splitBytes) flush()
        }
      }
      flush()
    }
    partitions.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BtrReaderFactory(requiredSchema)
}

/** One read split: a set of surviving row groups of one file, with the
  * projected columns' block offsets resolved at planning time.
  */
final case class BtrChunkRange(numRows: Int, offsets: Array[Long], lengths: Array[Int])
final case class BtrInputPartition(file: String, groups: Array[BtrChunkRange]) extends InputPartition

class BtrReaderFactory(requiredSchema: StructType) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("btr scan is columnar; row reads go through columnarBatch")

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    new BtrColumnarReader(partition.asInstanceOf[BtrInputPartition], requiredSchema)
}

/** Vectorized reader: one ColumnarBatch per row group, decoded straight
  * into OnHeapColumnVectors — the analog of BtrReader::readColumn
  * (/root/reference/btrblocks/compression/BtrReader.cpp:31-74), with
  * Catalyst/WSCG consuming batches above.
  */
class BtrColumnarReader(partition: BtrInputPartition, requiredSchema: StructType)
    extends PartitionReader[ColumnarBatch] {

  private val fs = new Path(partition.file).getFileSystem(BtrTableMeta.hadoopConf())
  private val stream = fs.open(new Path(partition.file))
  private val tags = requiredSchema.fields.map(f => PhysType.of(f.dataType))
  private var groupIdx = -1
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    groupIdx += 1
    if (groupIdx >= partition.groups.length) return false
    val g = partition.groups(groupIdx)
    val vectors = new Array[ColumnVector](tags.length)
    var c = 0
    while (c < tags.length) {
      val blob = new Array[Byte](g.lengths(c))
      stream.readFully(g.offsets(c), blob)
      val dec = ChunkCodec.decode(new BufReader(blob), tags(c), g.numRows)
      vectors(c) = fillVector(requiredSchema.fields(c).dataType, tags(c), dec, g.numRows)
      c += 1
    }
    if (batch != null) batch.close()
    batch = new ColumnarBatch(vectors, g.numRows)
    true
  }

  private def fillVector(dt: DataType, tag: Int, dec: ChunkCodec.Decoded, n: Int): ColumnVector = {
    val v = new OnHeapColumnVector(n, dt)
    var i = 0
    tag match {
      case PhysType.Int32 | PhysType.Date =>
        while (i < n) {
          if (dec.isNull(i)) v.putNull(i) else v.putInt(i, dec.longs(i).toInt)
          i += 1
        }
      case PhysType.Int64 | PhysType.Timestamp | PhysType.TimestampNtz =>
        while (i < n) {
          if (dec.isNull(i)) v.putNull(i) else v.putLong(i, dec.longs(i))
          i += 1
        }
      case PhysType.Bool =>
        while (i < n) {
          if (dec.isNull(i)) v.putNull(i) else v.putBoolean(i, dec.longs(i) != 0L)
          i += 1
        }
      case PhysType.Double =>
        while (i < n) {
          if (dec.isNull(i)) v.putNull(i) else v.putDouble(i, dec.doubles(i))
          i += 1
        }
      case PhysType.Float =>
        while (i < n) {
          if (dec.isNull(i)) v.putNull(i)
          else v.putFloat(i, java.lang.Float.intBitsToFloat(dec.longs(i).toInt))
          i += 1
        }
      case _ => // string / binary
        var off = 0
        while (i < n) {
          val len = dec.strLens(i)
          if (dec.isNull(i)) v.putNull(i)
          else v.putByteArray(i, dec.strBytes, off, len)
          off += len
          i += 1
        }
    }
    v
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (batch != null) batch.close()
    stream.close()
  }
}

/** Chunk-skipping predicate evaluation against footer min/max stats. */
object ChunkSkip {
  def supports(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v) => statable(schema, a) && litOk(v)
    case GreaterThan(a, v) => statable(schema, a) && litOk(v)
    case GreaterThanOrEqual(a, v) => statable(schema, a) && litOk(v)
    case LessThan(a, v) => statable(schema, a) && litOk(v)
    case LessThanOrEqual(a, v) => statable(schema, a) && litOk(v)
    case In(a, vs) => statable(schema, a) && vs.nonEmpty && vs.forall(litOk)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case And(l, r) => supports(schema, l) || supports(schema, r)
    case Or(l, r) => supports(schema, l) && supports(schema, r)
    case _ => false
  }

  private def statable(schema: StructType, attr: String): Boolean =
    schema.fields.find(_.name == attr).exists { f =>
      f.dataType match {
        case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
            BooleanType | DoubleType | FloatType | ShortType | ByteType => true
        case StringType | BinaryType => true
        case _ => false
      }
    }

  private def litOk(v: Any): Boolean = v match {
    case null => false
    case _: Int | _: Long | _: Short | _: Byte | _: Boolean | _: Double | _: Float => true
    case _: java.sql.Date | _: java.time.LocalDate => true
    case _: java.sql.Timestamp | _: java.time.Instant | _: java.time.LocalDateTime => true
    case _: String | _: Array[Byte] => true
    case _ => false
  }

  private def toBytesLit(v: Any): Array[Byte] = v match {
    case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case b: Array[Byte] => b
    case u: org.apache.spark.unsafe.types.UTF8String => u.getBytes
    case other => throw new IllegalArgumentException(s"$other")
  }

  // unsigned lexicographic — the ordering UTF8String comparison uses
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  private def toLongLit(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
    case t: java.time.LocalDateTime =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case other => throw new IllegalArgumentException(s"$other")
  }

  private def toDoubleLit(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case other => throw new IllegalArgumentException(s"$other")
  }

  /** True iff stats PROVE no row in the group can match the filter. */
  def canSkip(schema: StructType, rg: BtrFile.RowGroupMeta, f: Filter): Boolean = {
    def col(attr: String): Option[(BtrFile.ColumnChunkMeta, DataType)] = {
      val idx = schema.fieldNames.indexOf(attr)
      if (idx < 0) None else Some((rg.columns(idx), schema.fields(idx).dataType))
    }
    try f match {
      case IsNull(a) => col(a).exists { case (m, _) => m.nullCount == 0 }
      case IsNotNull(a) => col(a).exists { case (m, _) => m.nullCount == rg.numRows }
      case EqualTo(a, v) =>
        col(a).exists { case (m, dt) => outside(m, dt, v, eqLow = true, eqHigh = true) }
      case GreaterThan(a, v) =>
        col(a).exists { case (m, dt) => maxBelowOrEq(m, dt, v, strict = true) }
      case GreaterThanOrEqual(a, v) =>
        col(a).exists { case (m, dt) => maxBelowOrEq(m, dt, v, strict = false) }
      case LessThan(a, v) =>
        col(a).exists { case (m, dt) => minAboveOrEq(m, dt, v, strict = true) }
      case LessThanOrEqual(a, v) =>
        col(a).exists { case (m, dt) => minAboveOrEq(m, dt, v, strict = false) }
      case In(a, vs) =>
        col(a).exists { case (m, dt) => vs.forall(v => outside(m, dt, v, eqLow = true, eqHigh = true)) }
      case And(l, r) => canSkip(schema, rg, l) || canSkip(schema, rg, r)
      case Or(l, r) => canSkip(schema, rg, l) && canSkip(schema, rg, r)
      case _ => false
    } catch { case _: IllegalArgumentException => false }
  }

  // value strictly outside [min,max]
  private def outside(m: BtrFile.ColumnChunkMeta, dt: DataType, v: Any, eqLow: Boolean, eqHigh: Boolean): Boolean =
    m.statsKind match {
      case 1 =>
        val x = toLongLit(v)
        x < m.minLong || x > m.maxLong
      case 2 =>
        val x = toDoubleLit(v)
        x < m.minDouble || x > m.maxDouble
      case 3 =>
        val x = toBytesLit(v)
        // stored min <= true min and stored max >= true max (truncation is
        // conservative), so strictly-outside is still a proof
        (m.minBytes != null && cmpBytes(x, m.minBytes) < 0) ||
          (m.maxBytes != null && cmpBytes(x, m.maxBytes) > 0)
      case _ => false
    }

  // skip "col > v": true when max <= v (strict) or max < v (non-strict)
  private def maxBelowOrEq(m: BtrFile.ColumnChunkMeta, dt: DataType, v: Any, strict: Boolean): Boolean =
    m.statsKind match {
      case 1 =>
        val x = toLongLit(v)
        if (strict) m.maxLong <= x else m.maxLong < x
      case 2 =>
        val x = toDoubleLit(v)
        if (strict) m.maxDouble <= x else m.maxDouble < x
      case 3 if m.maxBytes != null =>
        val x = toBytesLit(v)
        if (strict) cmpBytes(m.maxBytes, x) <= 0 else cmpBytes(m.maxBytes, x) < 0
      case _ => false
    }

  // skip "col < v": true when min >= v (strict) or min > v (non-strict)
  private def minAboveOrEq(m: BtrFile.ColumnChunkMeta, dt: DataType, v: Any, strict: Boolean): Boolean =
    m.statsKind match {
      case 1 =>
        val x = toLongLit(v)
        if (strict) m.minLong >= x else m.minLong > x
      case 2 =>
        val x = toDoubleLit(v)
        if (strict) m.minDouble >= x else m.minDouble > x
      case 3 if m.minBytes != null =>
        val x = toBytesLit(v)
        if (strict) cmpBytes(m.minBytes, x) >= 0 else cmpBytes(m.minBytes, x) > 0
      case _ => false
    }
}
