package graft.sources

import graft.format.PartitionTransform
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** `bucket(n, col)` as a catalog V2 function. Storage-partitioned joins
  * over bucket-transform tables need the catalog to RESOLVE the
  * scan-reported `bucket` transform to a bound function
  * (`V2ExpressionUtils` resolves through the relation's FunctionCatalog);
  * two scans whose bound functions share a canonical name and bucket
  * count then prove co-partitioning, and the join plans with zero
  * shuffle. The bound result agrees bit-for-bit with the writer's
  * directory derivation ([[PartitionTransform.bucketOf]]) — the whole
  * point is that the function IS the layout.
  */
object BtrBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): graft partition bucket (splitmix64 / murmur3)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"btr bucket: expected (numBuckets, col), got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    dt match {
      case IntegerType | LongType | StringType | DateType |
           TimestampType | TimestampNTZType => new BtrBoundBucket(dt)
      case other => throw new UnsupportedOperationException(
        s"btr bucket: unsupported source type $other")
    }
  }
}

final class BtrBoundBucket(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // canonical identity drives SPJ compatibility: equal names + equal
  // numBuckets literals → co-partitioned
  override def canonicalName(): String = s"graft.bucket(${dt.typeName})"
  // a null key has no bucket: the writer routes nulls to the dedicated
  // null partition dir, never to bucket(0) — the bound function must
  // agree or a shuffle planned through it would co-locate null keys
  // with bucket-0 rows (benign for equi-joins, which drop null keys,
  // but a silent layout divergence otherwise)
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val v: Any = dt match {
      case IntegerType | DateType => Int.box(input.getInt(1))
      case LongType | TimestampType | TimestampNTZType => Long.box(input.getLong(1))
      case StringType => input.getUTF8String(1).toString
      case other => throw new UnsupportedOperationException(s"btr bucket over $other")
    }
    Int.box(PartitionTransform.bucketOf(n, dt, v))
  }
}
