package graft.sources

import org.apache.spark.sql.types.{DataType, Decimal, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** Row-index indirection shared by every wrapped vector of one batch:
  * `map(i)` is the PHYSICAL row of logical row `i` after deleted rows
  * are filtered out. One holder per reader, refilled per row group —
  * wrappers hold the reference, so refills need no re-wrapping.
  */
final class BtrRowMap {
  var map: Array[Int] = new Array[Int](0)

  /** Fill from a deletion BitSet over [0, n): survivors in order.
    * Returns the survivor count.
    */
  def fillSurvivors(deleted: java.util.BitSet, n: Int): Int = {
    if (map.length < n) map = new Array[Int](n)
    var out = 0
    var i = 0
    while (i < n) {
      if (!deleted.get(i)) { map(out) = i; out += 1 }
      i += 1
    }
    out
  }

  /** Fill with exactly the DELETED rows (CDC delete batches emit the
    * rows a deletion-vector commit removed). Returns the count.
    */
  def fillDeleted(deleted: java.util.BitSet, n: Int): Int = {
    if (map.length < n) map = new Array[Int](n)
    var out = 0
    var i = deleted.nextSetBit(0)
    while (i >= 0 && i < n) {
      map(out) = i
      out += 1
      i = deleted.nextSetBit(i + 1)
    }
    out
  }
}

/** A ColumnVector view that redirects every row access through a
  * [[BtrRowMap]] — how deletion-vector masking stays COLUMNAR: the
  * decoded vectors are untouched, the batch just exposes surviving rows
  * under compacted indices. The same indirection Iceberg's vectorized
  * reader applies for position deletes. `getStruct`/`getVariant`/
  * `getInterval` are final in ColumnVector and resolve through
  * `getChild` with the LOGICAL row id, so children are wrapped with the
  * same holder; `getArray`/`getMap` delegate directly (their returned
  * views index the child by physical offset, which needs no mapping).
  */
final class BtrMaskedColumnVector(inner: ColumnVector, rm: BtrRowMap)
    extends ColumnVector(inner.dataType()) {

  private val children: Array[ColumnVector] = inner.dataType() match {
    case st: StructType =>
      Array.tabulate(st.fields.length)(j => new BtrMaskedColumnVector(inner.getChild(j), rm))
    case _ => null
  }

  override def close(): Unit = () // the reader owns the inner vectors
  override def hasNull: Boolean = inner.hasNull // conservative over-approx
  override def numNulls(): Int = inner.numNulls()
  override def isNullAt(i: Int): Boolean = inner.isNullAt(rm.map(i))
  override def getBoolean(i: Int): Boolean = inner.getBoolean(rm.map(i))
  override def getByte(i: Int): Byte = inner.getByte(rm.map(i))
  override def getShort(i: Int): Short = inner.getShort(rm.map(i))
  override def getInt(i: Int): Int = inner.getInt(rm.map(i))
  override def getLong(i: Int): Long = inner.getLong(rm.map(i))
  override def getFloat(i: Int): Float = inner.getFloat(rm.map(i))
  override def getDouble(i: Int): Double = inner.getDouble(rm.map(i))
  override def getArray(i: Int): ColumnarArray = inner.getArray(rm.map(i))
  override def getMap(i: Int): ColumnarMap = inner.getMap(rm.map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(rm.map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = inner.getUTF8String(rm.map(i))
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(rm.map(i))
  override def getChild(j: Int): ColumnVector =
    if (children != null) children(j) else inner.getChild(j)
}
