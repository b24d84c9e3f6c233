package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for struct columns: random leaf-type compositions and
  * adversarial values (nulls at both levels, NaN/±0.0, empty/unicode
  * strings, extreme longs) must round-trip row-exact, and random LEAF
  * predicates must return exactly the model's rows — a wrong per-leaf
  * footer stat or a bad skip probe silently LOSES rows, which this
  * catches across many (schema, data, predicate) draws.
  */
class StructFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("struct-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val leafTypes: Vector[DataType] =
    Vector(IntegerType, LongType, DoubleType, FloatType, StringType, BooleanType)

  private def randomValue(rnd: scala.util.Random, dt: DataType): Any = dt match {
    case IntegerType => rnd.nextInt(5) match {
      case 0 => Int.MinValue
      case 1 => Int.MaxValue
      case _ => rnd.nextInt(200) - 100
    }
    case LongType => rnd.nextInt(5) match {
      case 0 => Long.MinValue
      case 1 => Long.MaxValue
      case _ => rnd.nextLong() % 1000L
    }
    case DoubleType => rnd.nextInt(8) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => -0.0d
      case 4 => 0.0d
      case _ => rnd.nextDouble() * 100 - 50
    }
    case FloatType => rnd.nextInt(6) match {
      case 0 => Float.NaN
      case 1 => -0.0f
      case _ => rnd.nextFloat() * 100 - 50
    }
    case StringType => rnd.nextInt(6) match {
      case 0 => ""
      case 1 => "héllo-wörld-é中文"
      case 2 => "x" * (1 + rnd.nextInt(40))
      case _ => s"v${rnd.nextInt(50)}"
    }
    case BooleanType => rnd.nextBoolean()
    case st: StructType =>
      if (rnd.nextInt(6) == 0) null
      else Row.fromSeq(st.fields.toSeq.map(f =>
        if (rnd.nextInt(5) == 0) null else randomValue(rnd, f.dataType)))
    case at: ArrayType =>
      (0 until rnd.nextInt(4)).map(_ =>
        if (rnd.nextInt(6) == 0) null else randomValue(rnd, at.elementType))
    case mt: MapType =>
      (0 until rnd.nextInt(4)).map(k =>
        s"k$k" -> (if (rnd.nextInt(6) == 0) null else randomValue(rnd, mt.valueType))).toMap
    case other => throw new IllegalStateException(other.toString)
  }

  /** Random leaf type: scalar, array-of-scalar, map (scalar- or
    * struct-valued), or (down to `depth`) a nested struct of more random
    * leaves. */
  private def randomLeafType(rnd: scala.util.Random, depth: Int): DataType =
    if (depth < 2 && rnd.nextInt(3) == 0)
      StructType((0 to rnd.nextInt(3)).map(j =>
        StructField(s"g${depth}_$j", randomLeafType(rnd, depth + 1), nullable = true)))
    else if (rnd.nextInt(5) == 0)
      ArrayType(leafTypes(rnd.nextInt(leafTypes.length)), containsNull = true)
    else if (rnd.nextInt(5) == 0) {
      // map leaves inside structs — scalar-valued, or struct-valued
      // (per-field provenance shape) whose sub-leaves may themselves be
      // scalars, arrays-of-scalar or nested scalar structs
      val vt =
        if (depth < 2 && rnd.nextInt(3) == 0)
          StructType((0 to rnd.nextInt(2)).map { j =>
            val ft = rnd.nextInt(5) match {
              case 0 => ArrayType(leafTypes(rnd.nextInt(leafTypes.length)),
                containsNull = true)
              case 1 => StructType(Seq(StructField(s"n$j",
                leafTypes(rnd.nextInt(leafTypes.length)), nullable = true)))
              case _ => leafTypes(rnd.nextInt(leafTypes.length))
            }
            StructField(s"m${depth}_$j", ft, nullable = true)
          })
        else leafTypes(rnd.nextInt(leafTypes.length))
      MapType(StringType, vt, valueContainsNull = true)
    } else leafTypes(rnd.nextInt(leafTypes.length))

  /** All dotted paths to SCALAR leaves under `prefix`. */
  private def scalarPaths(prefix: String, dt: DataType): Seq[(String, DataType)] = dt match {
    case st: StructType =>
      st.fields.toSeq.flatMap(f => scalarPaths(s"$prefix.${f.name}", f.dataType))
    case _: ArrayType => Nil
    case _: MapType => Nil
    case scalar => Seq(prefix -> scalar)
  }

  test("random struct schemas, values and leaf predicates are exact") {
    val rnd = new scala.util.Random(7_2026_08_14L)
    for (round <- 0 until 6) {
      val dir = s"/tmp/btr-struct-fuzz/r$round"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val nLeaves = 1 + rnd.nextInt(5)
      // depth-0 leaves may be scalars, arrays, or NESTED structs (to
      // depth 2) — the recursive composite layout must stay exact for
      // every composition
      val leaves = (0 until nLeaves).map(j =>
        StructField(s"f$j", randomLeafType(rnd, 0), nullable = true))
      val st = StructType(leaves)
      val schema = StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("rec", st, nullable = true)))
      val n = 200 + rnd.nextInt(800)
      val rows = (0 until n).map { i =>
        val rec =
          if (rnd.nextInt(6) == 0) null
          else Row.fromSeq(leaves.map(lf =>
            if (rnd.nextInt(5) == 0) null else randomValue(rnd, lf.dataType)))
        Row(i, rec)
      }
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      // small blocks so many chunks exist → many stat entries probed
      df.write.format("btr").option("btr.blockSize", "64").mode("overwrite").save(dir)
      val back = spark.read.format("btr").load(dir)

      // 1) row-exact round-trip (nested compare via JSON-stable select)
      val key: Row => Int = _.getInt(0)
      val a = df.select(col("id"), to_json(col("rec")).as("j")).collect().sortBy(key)
      val b = back.select(col("id"), to_json(col("rec")).as("j")).collect().sortBy(key)
      assert(a.length == b.length, s"round $round: row count")
      a.zip(b).foreach { case (x, y) => assert(x == y, s"round $round: $x vs $y") }

      // 2) leaf-predicate soundness at ANY depth: results must equal the
      // in-memory model under Spark's own comparison semantics — evaluate
      // the SAME Column filter against the original df (no btr) as oracle
      val paths = scalarPaths("rec", st)
      for (_ <- 0 until 8 if paths.nonEmpty) {
        val (path, pdt) = paths(rnd.nextInt(paths.length))
        val c = col(path)
        val leaf = rnd.nextInt(5) match {
          case 0 => c.isNull
          case 1 => c.isNotNull
          case 2 => c === lit(randomValue(rnd, pdt))
          case 3 if pdt != BooleanType => c >= lit(randomValue(rnd, pdt))
          case _ if pdt != BooleanType => c < lit(randomValue(rnd, pdt))
          case _ => c === lit(rnd.nextBoolean())
        }
        // polarity combinators over the LATE-MATERIALIZATION tier (the
        // round-15 OR-soundness class with struct-leaf references):
        // mixed OR with an untranslatable disjunct, NOT, plain leaf
        val pred = rnd.nextInt(4) match {
          case 0 => leaf || (col("id") % 7 === 0)
          case 1 => !leaf
          case 2 => leaf && (col("id") % 3 =!= 1)
          case _ => leaf
        }
        val want = df.filter(pred).select("id").collect().map(_.getInt(0)).sorted
        val got = back.filter(pred).select("id").collect().map(_.getInt(0)).sorted
        assert(got.toSeq == want.toSeq,
          s"round $round: predicate $pred lost/invented rows — got ${got.length}, want ${want.length}")
      }
    }
  }
}
