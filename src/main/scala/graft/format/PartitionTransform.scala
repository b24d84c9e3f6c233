package graft.format

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** One field of a partition spec. Specs serialize into the table meta's
  * `partitionCols` list as strings — a plain column name is an identity
  * field (full back-compat with pre-transform tables), everything else
  * is `fn(source)` / `fn(arg,source)`:
  *
  *   `region`            identity   dir `region=<value>`
  *   `days(ts)`          time       dir `ts_days=2026-08-15`
  *   `hours(ts)`         time       dir `ts_hours=2026-08-15-03`
  *   `months(ts)`        time       dir `ts_months=2026-08`
  *   `years(ts)`         time       dir `ts_years=2026`
  *   `bucket(16,id)`     hash       dir `id_bucket_16=7`
  *   `truncate(4,code)`  prefix     dir `code_trunc_4=ab`
  *
  * Identity fields keep their historical semantics everywhere (value
  * substitution on scan, SPJ partition keys, partition stats). Transform
  * fields are DERIVED: the source column STAYS in the data files and the
  * directory carries only the derived value, used for directory pruning
  * of source-column predicates — the Iceberg partition-transform model
  * (public spec), re-expressed over a hive-style layout. TimestampType
  * splits on UTC instants (micros since epoch), session-tz independent.
  */
final case class PartField(fn: String, arg: Int, source: String) {
  def isIdentity: Boolean = fn == "identity"

  /** Directory field name (`<dir>=<value>` hive segments). */
  def dirName: String = fn match {
    case "identity" => source
    case "bucket" => s"${source}_bucket_$arg"
    case "truncate" => s"${source}_trunc_$arg"
    case other => s"${source}_$other"
  }

  /** Canonical serialized form (what `partitionCols` stores). */
  def serialized: String = fn match {
    case "identity" => source
    case "bucket" | "truncate" => s"$fn($arg,$source)"
    case other => s"$other($source)"
  }
}

object PartitionTransform {
  private val TimeFns = Set("years", "months", "days", "hours")
  private val Spec = """([A-Za-z]+)\(\s*(?:(\d+)\s*,\s*)?([^)\s]+)\s*\)""".r

  /** Parse one serialized entry; a plain name is identity. */
  def parse(s: String): PartField = s.trim match {
    case Spec(fn0, arg, src) =>
      val fn = fn0.toLowerCase match {
        case "day" => "days"
        case "hour" => "hours"
        case "month" => "months"
        case "year" => "years"
        case "trunc" => "truncate"
        case other => other
      }
      require(TimeFns.contains(fn) || fn == "bucket" || fn == "truncate" || fn == "identity",
        s"btr: unknown partition transform '$fn0' in '$s' — supported: " +
          "identity, years, months, days, hours, bucket(n, col), truncate(w, col)")
      if (fn == "identity") PartField("identity", 0, src)
      else if (TimeFns.contains(fn)) {
        require(arg == null, s"btr: $fn takes no width argument in '$s'")
        PartField(fn, 0, src)
      } else {
        require(arg != null, s"btr: $fn requires a width argument: $fn(n, col)")
        val n = arg.toInt
        require(n > 0, s"btr: $fn width must be positive in '$s'")
        PartField(fn, n, src)
      }
    case plain =>
      require(plain.nonEmpty && !plain.contains("("), s"btr: bad partition field '$s'")
      PartField("identity", 0, plain)
  }

  def identityNames(specs: Seq[String]): Seq[String] =
    specs.map(parse).filter(_.isIdentity).map(_.source)

  def transformFields(specs: Seq[String]): Seq[PartField] =
    specs.map(parse).filterNot(_.isIdentity)

  def hasTransforms(specs: Seq[String]): Boolean = specs.exists(_.contains("("))

  /** Source-column type admission, checked before any meta is written. */
  def validate(f: PartField, schema: StructType): Unit = {
    val idx = schema.fieldNames.indexOf(f.source)
    require(idx >= 0, s"btr: partition transform '${f.serialized}' references " +
      s"unknown column '${f.source}' (columns: ${schema.fieldNames.mkString(", ")})")
    val dt = schema.fields(idx).dataType
    def bad(expected: String): Nothing = throw new IllegalArgumentException(
      s"btr: partition transform '${f.serialized}' needs a $expected source, " +
        s"'${f.source}' is $dt")
    f.fn match {
      case "identity" => ()
      case "hours" => dt match {
        case TimestampType | TimestampNTZType => ()
        case _ => bad("timestamp")
      }
      case "years" | "months" | "days" => dt match {
        case TimestampType | TimestampNTZType | DateType => ()
        case _ => bad("timestamp or date")
      }
      case "bucket" => dt match {
        case IntegerType | LongType | StringType | DateType |
             TimestampType | TimestampNTZType => ()
        case _ => bad("int/long/string/date/timestamp")
      }
      case "truncate" => dt match {
        case StringType | IntegerType | LongType => ()
        case _ => bad("string/int/long")
      }
    }
  }

  // ---- V2 Transform bridge (catalog CREATE TABLE / partitioning()) ----

  import org.apache.spark.sql.connector.expressions.{Expressions, Transform}

  def toV2(spec: String): Transform = {
    val f = parse(spec)
    f.fn match {
      case "identity" => Expressions.identity(f.source)
      case "years" => Expressions.years(f.source)
      case "months" => Expressions.months(f.source)
      case "days" => Expressions.days(f.source)
      case "hours" => Expressions.hours(f.source)
      case "bucket" => Expressions.bucket(f.arg, f.source)
      case "truncate" => Expressions.apply("truncate",
        Expressions.literal(Int.box(f.arg)), Expressions.column(f.source))
    }
  }

  def fromV2(t: Transform): PartField = {
    def oneRef: String = {
      val refs = t.references()
      require(refs.length == 1 && refs(0).fieldNames().length == 1,
        s"btr: partition transform must reference exactly one top-level column, " +
          s"got ${t.describe()}")
      refs(0).fieldNames()(0)
    }
    def intArg: Int = t.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
        if l.dataType() == IntegerType => l.value().asInstanceOf[Int]
    }.getOrElse(throw new IllegalArgumentException(
      s"btr: ${t.name()} requires an integer width argument, got ${t.describe()}"))
    t.name().toLowerCase match {
      case "identity" =>
        // `.partitionBy("days(ts)")` arrives as identity of a pseudo-column
        // whose name IS a spec string; parse() resolves it (plain column
        // names can't contain parentheses)
        parse(oneRef)
      case "years" | "year" => PartField("years", 0, oneRef)
      case "months" | "month" => PartField("months", 0, oneRef)
      case "days" | "day" => PartField("days", 0, oneRef)
      case "hours" | "hour" => PartField("hours", 0, oneRef)
      case "bucket" => PartField("bucket", intArg, oneRef)
      case "truncate" | "trunc" => PartField("truncate", intArg, oneRef)
      case other => throw new IllegalArgumentException(
        s"btr: unsupported partition transform '$other' (${t.describe()})")
    }
  }

  // ---- writer side: derive the directory value ------------------------

  private val MicrosPerHour = 3_600_000_000L
  private val MicrosPerDay = 86_400_000_000L

  /** 64-bit avalanche (splitmix64 finalizer, public-domain constant mix)
    * — the deterministic bucket hash for integral sources.
    */
  def mix64(v0: Long): Long = {
    var v = v0 + 0x9E3779B97F4A7C15L
    v = (v ^ (v >>> 30)) * 0xBF58476D1CE4E5B9L
    v = (v ^ (v >>> 27)) * 0x94D049BB133111EBL
    v ^ (v >>> 31)
  }

  def bucketOf(n: Int, dt: DataType, value: Any): Int = {
    val h = dt match {
      case IntegerType | DateType => mix64(value.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType => mix64(value.asInstanceOf[Long])
      case StringType =>
        val bytes = value.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        mix64(scala.util.hashing.MurmurHash3.bytesHash(bytes, 0).toLong)
      case other => throw new IllegalArgumentException(s"btr: bucket over $other")
    }
    java.lang.Math.floorMod(h, n.toLong).toInt
  }

  private def epochDayOf(dt: DataType, value: Any): Long = dt match {
    case DateType => value.asInstanceOf[Int].toLong
    case TimestampType | TimestampNTZType =>
      java.lang.Math.floorDiv(value.asInstanceOf[Long], MicrosPerDay)
    case other => throw new IllegalArgumentException(s"btr: time transform over $other")
  }

  /** Directory value string for one row's source value (null handled by
    * the caller via the shared null marker). `value` is the source
    * column's JVM value in its catalyst representation (Int days for
    * DateType, Long micros for timestamps, String for strings).
    */
  def dirValue(f: PartField, dt: DataType, value: Any): String = f.fn match {
    case "years" =>
      f"${java.time.LocalDate.ofEpochDay(epochDayOf(dt, value)).getYear}%04d"
    case "months" =>
      val d = java.time.LocalDate.ofEpochDay(epochDayOf(dt, value))
      f"${d.getYear}%04d-${d.getMonthValue}%02d"
    case "days" =>
      java.time.LocalDate.ofEpochDay(epochDayOf(dt, value)).toString
    case "hours" =>
      val micros = value.asInstanceOf[Long]
      val day = java.time.LocalDate.ofEpochDay(java.lang.Math.floorDiv(micros, MicrosPerDay))
      val hour = java.lang.Math.floorDiv(
        java.lang.Math.floorMod(micros, MicrosPerDay), MicrosPerHour)
      f"$day-$hour%02d"
    case "bucket" => bucketOf(f.arg, dt, value).toString
    case "truncate" => dt match {
      case StringType =>
        val s = value.toString
        if (s.length <= f.arg) s else s.substring(0, f.arg)
      case IntegerType =>
        val v = value.asInstanceOf[Int]
        (v - java.lang.Math.floorMod(v.toLong, f.arg.toLong)).toString
      case LongType =>
        val v = value.asInstanceOf[Long]
        (v - java.lang.Math.floorMod(v, f.arg.toLong)).toString
      case other => throw new IllegalArgumentException(s"btr: truncate over $other")
    }
    case other => throw new IllegalArgumentException(s"btr: dirValue($other)")
  }

  // ---- scan side: directory pruning of source-column predicates -------

  /** Inclusive [lo, hi] bounds of the SOURCE values a time-transform dir
    * covers, in the source column's comparison domain (micros for
    * timestamps, epoch days for dates). None = unparseable.
    */
  def sourceBounds(f: PartField, dt: DataType, dirVal: String): Option[(Long, Long)] = {
    def dayRange(lo: java.time.LocalDate, hiExcl: java.time.LocalDate): (Long, Long) =
      dt match {
        case DateType => (lo.toEpochDay, hiExcl.toEpochDay - 1)
        case _ => (lo.toEpochDay * MicrosPerDay, hiExcl.toEpochDay * MicrosPerDay - 1)
      }
    try f.fn match {
      case "years" =>
        val y = dirVal.toInt
        Some(dayRange(java.time.LocalDate.of(y, 1, 1), java.time.LocalDate.of(y + 1, 1, 1)))
      case "months" =>
        val Array(y, m) = dirVal.split("-", 2).map(_.toInt)
        val lo = java.time.LocalDate.of(y, m, 1)
        Some(dayRange(lo, lo.plusMonths(1)))
      case "days" =>
        val d = java.time.LocalDate.parse(dirVal)
        Some(dayRange(d, d.plusDays(1)))
      case "hours" =>
        // yyyy-MM-dd-HH
        val day = java.time.LocalDate.parse(dirVal.substring(0, 10))
        val h = dirVal.substring(11).toInt
        val lo = day.toEpochDay * MicrosPerDay + h * MicrosPerHour
        Some((lo, lo + MicrosPerHour - 1))
      case "truncate" if dt == IntegerType || dt == LongType =>
        val lo = dirVal.toLong
        Some((lo, lo + f.arg - 1))
      case _ => None
    } catch { case _: RuntimeException | _: java.time.DateTimeException => None }
  }

  /** Literal → the source column's comparison domain. */
  private def literalLong(dt: DataType, lit: Any): Option[Long] = dt match {
    case DateType => lit match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case _ => None
    }
    case TimestampType | TimestampNTZType => graft.sources.BtrPartTime.literalMicros(lit)
    case IntegerType => lit match { case i: Int => Some(i.toLong); case _ => None }
    case LongType => lit match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    case _ => None
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** True when the filter PROVES no row of a file under these directory
    * values can match — the transform complement of
    * [[graft.sources.PartitionPrune.canSkip]]. Sound, never complete:
    * `false` just means "cannot prune from directories alone" (chunk
    * skipping still applies inside the file).
    */
  def canSkip(schema: StructType, fields: Seq[PartField],
      values: Map[String, String], filter: Filter): Boolean = {
    val nullPart = BtrTableMeta.NullPartition
    val bySource = fields.filterNot(_.isIdentity)
      .flatMap(f => values.get(f.dirName).map(v => (f, v))).groupBy(_._1.source)

    def dtOf(a: String): Option[DataType] =
      schema.fields.find(_.name == a).map(_.dataType)

    // one transform field's verdict on (source, op, literal); several
    // fields over one source (days + bucket) prune independently
    def skipOne(f: PartField, dirVal: String, check: (Long, Long) => Boolean,
        dt: DataType): Boolean =
      dirVal != nullPart && sourceBounds(f, dt, dirVal).exists {
        case (lo, hi) => check(lo, hi)
      }

    def forSource(a: String)(perField: (PartField, String, DataType) => Boolean): Boolean =
      bySource.get(a).exists { fs =>
        dtOf(a).exists(dt => fs.exists { case (f, dirVal) => perField(f, dirVal, dt) })
      }

    filter match {
      case EqualTo(a, v) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) true // all-null dir: equality never matches
        else f.fn match {
          case "bucket" =>
            bucketLit(f, dt, v).exists(_.toString != dirVal)
          case "truncate" if dt == StringType => v match {
            case s: String => dirValue(f, dt, s) != dirVal
            case _ => false
          }
          case _ => literalLong(dt, v).exists(l =>
            skipOne(f, dirVal, (lo, hi) => l < lo || l > hi, dt))
        }
      }
      case In(a, vs) => vs.nonEmpty && forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) true
        else vs.forall(v => f.fn match {
          case "bucket" => bucketLit(f, dt, v).exists(_.toString != dirVal)
          case "truncate" if dt == StringType => v match {
            case s: String => dirValue(f, dt, s) != dirVal
            case _ => false
          }
          case _ => literalLong(dt, v).exists(l =>
            skipOne(f, dirVal, (lo, hi) => l < lo || l > hi, dt))
        })
      }
      case GreaterThan(a, v) => forSource(a) { (f, dirVal, dt) =>
        dirVal == nullPart || (f.fn match {
          case "truncate" if dt == StringType => v match {
            // exists value > lit with this prefix iff prefix > lit or
            // lit startsWith prefix (a longer string extends past it)
            case s: String =>
              val c = java.util.Arrays.compareUnsigned(utf8(dirVal), utf8(s))
              !(c > 0 || s.startsWith(dirVal))
            case _ => false
          }
          case _ => literalLong(dt, v).exists(l =>
            skipOne(f, dirVal, (_, hi) => hi <= l, dt))
        })
      }
      case GreaterThanOrEqual(a, v) => forSource(a) { (f, dirVal, dt) =>
        dirVal == nullPart || (f.fn match {
          case "truncate" if dt == StringType => v match {
            case s: String =>
              val c = java.util.Arrays.compareUnsigned(utf8(dirVal), utf8(s))
              !(c >= 0 || s.startsWith(dirVal))
            case _ => false
          }
          case _ => literalLong(dt, v).exists(l =>
            skipOne(f, dirVal, (_, hi) => hi < l, dt))
        })
      }
      case LessThan(a, v) => forSource(a) { (f, dirVal, dt) =>
        dirVal == nullPart || (f.fn match {
          case "truncate" if dt == StringType => v match {
            // every value with this prefix is >= the prefix itself
            case s: String =>
              java.util.Arrays.compareUnsigned(utf8(dirVal), utf8(s)) >= 0
            case _ => false
          }
          case _ => literalLong(dt, v).exists(l =>
            skipOne(f, dirVal, (lo, _) => lo >= l, dt))
        })
      }
      case LessThanOrEqual(a, v) => forSource(a) { (f, dirVal, dt) =>
        dirVal == nullPart || (f.fn match {
          case "truncate" if dt == StringType => v match {
            case s: String =>
              java.util.Arrays.compareUnsigned(utf8(dirVal), utf8(s)) > 0
            case _ => false
          }
          case _ => literalLong(dt, v).exists(l =>
            skipOne(f, dirVal, (lo, _) => lo > l, dt))
        })
      }
      case IsNull(a) => forSource(a)((_, dirVal, _) => dirVal != nullPart)
      case IsNotNull(a) => forSource(a)((_, dirVal, _) => dirVal == nullPart)
      case StringStartsWith(a, p) => forSource(a) { (f, dirVal, dt) =>
        dirVal == nullPart || (f.fn match {
          case "truncate" if dt == StringType =>
            !(dirVal.startsWith(p) || p.startsWith(dirVal))
          case _ => false
        })
      }
      case And(l, r) =>
        canSkip(schema, fields, values, l) || canSkip(schema, fields, values, r)
      case Or(l, r) =>
        canSkip(schema, fields, values, l) && canSkip(schema, fields, values, r)
      case _ => false
    }
  }

  /** TWO-SIDED verdict of a leaf filter against one file's transform
    * directory values: Some(true) = every row provably matches,
    * Some(false) = no row can match, None = undecided (footer stats
    * decide). The exactness rests on the writer's invariant that a dir
    * holds EXACTLY the rows whose derived value is the dir value — a
    * null dir holds only null-source rows, a time dir holds exactly the
    * rows inside its bounds. With this, a retention
    * `DELETE WHERE ts < X` on a days(ts) table classifies every file
    * from the LISTING alone — zero footer I/O at any table size.
    */
  def holds(schema: StructType, fields: Seq[PartField],
      values: Map[String, String], filter: Filter): Option[Boolean] = {
    val nullPart = BtrTableMeta.NullPartition
    val bySource = fields.filterNot(_.isIdentity)
      .flatMap(f => values.get(f.dirName).map(v => (f, v))).groupBy(_._1.source)

    def dtOf(a: String): Option[DataType] =
      schema.fields.find(_.name == a).map(_.dataType)

    // strongest verdict any one transform field over the source gives
    def forSource(a: String)(perField: (PartField, String, DataType) => Option[Boolean])
        : Option[Boolean] =
      bySource.get(a).flatMap { fs =>
        dtOf(a).flatMap { dt =>
          fs.iterator.map { case (f, dirVal) => perField(f, dirVal, dt) }
            .collectFirst { case Some(v) => v }
        }
      }

    // interval position of [lo,hi] vs literal l under an order operator
    def range(f: PartField, dirVal: String, dt: DataType, l: Long,
        allIf: (Long, Long) => Boolean, noneIf: (Long, Long) => Boolean): Option[Boolean] =
      sourceBounds(f, dt, dirVal).flatMap { case (lo, hi) =>
        if (allIf(lo, hi)) Some(true)
        else if (noneIf(lo, hi)) Some(false)
        else None
      }

    filter match {
      case IsNull(a) => forSource(a)((_, dirVal, _) => Some(dirVal == nullPart))
      case IsNotNull(a) => forSource(a)((_, dirVal, _) => Some(dirVal != nullPart))
      case EqualTo(a, v) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else f.fn match {
          case "bucket" =>
            bucketLit(f, dt, v).flatMap(b => if (b.toString != dirVal) Some(false) else None)
          case "truncate" if dt == StringType => v match {
            case s: String => if (dirValue(f, dt, s) != dirVal) Some(false) else None
            case _ => None
          }
          case _ => literalLongPub(dt, v)
            .flatMap(l => range(f, dirVal, dt, l,
              allIf = (lo, hi) => lo == l && hi == l,
              noneIf = (lo, hi) => l < lo || l > hi))
        }
      }
      case GreaterThan(a, v) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else literalLongPub(dt, v).flatMap(l => range(f, dirVal, dt, l,
          allIf = (lo, _) => lo > l, noneIf = (_, hi) => hi <= l))
      }
      case GreaterThanOrEqual(a, v) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else literalLongPub(dt, v).flatMap(l => range(f, dirVal, dt, l,
          allIf = (lo, _) => lo >= l, noneIf = (_, hi) => hi < l))
      }
      case LessThan(a, v) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else literalLongPub(dt, v).flatMap(l => range(f, dirVal, dt, l,
          allIf = (_, hi) => hi < l, noneIf = (lo, _) => lo >= l))
      }
      case LessThanOrEqual(a, v) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else literalLongPub(dt, v).flatMap(l => range(f, dirVal, dt, l,
          allIf = (_, hi) => hi <= l, noneIf = (lo, _) => lo > l))
      }
      case In(a, vs) if vs.nonEmpty => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else {
          // all-false when EVERY candidate is provably excluded
          val verdicts = vs.toSeq.map(v =>
            holds(schema, Seq(f), values, EqualTo(a, v)))
          if (verdicts.forall(_.contains(false))) Some(false)
          else if (verdicts.exists(_.contains(true))) Some(true)
          else None
        }
      }
      case StringStartsWith(a, p) => forSource(a) { (f, dirVal, dt) =>
        if (dirVal == nullPart) Some(false)
        else f.fn match {
          case "truncate" if dt == StringType =>
            // every value in the dir starts with dirVal; dirVal itself
            // starts with p ⟹ all match. Disjoint prefixes ⟹ none.
            if (dirVal.startsWith(p)) Some(true)
            else if (!p.startsWith(dirVal)) Some(false)
            else None
          case _ => None
        }
      }
      // And/Or composition is the CALLER's job (BtrDelete.classifyOne
      // recurses before consulting leaf verdicts)
      case _ => None
    }
  }

  /** Literal → comparison domain, shared with [[canSkip]]. */
  private def literalLongPub(dt: DataType, lit: Any): Option[Long] = literalLong(dt, lit)

  private def bucketLit(f: PartField, dt: DataType, lit: Any): Option[Int] =
    (dt match {
      case IntegerType => lit match { case i: Int => Some(i); case _ => None }
      case DateType => lit match {
        case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
        case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
        case _ => None
      }
      case _ => None
    }).map(i => bucketOf(f.arg, dt, Int.box(i)))
      .orElse(dt match {
        case LongType => lit match {
          case l: Long => Some(bucketOf(f.arg, dt, Long.box(l)))
          case i: Int => Some(bucketOf(f.arg, dt, Long.box(i.toLong)))
          case _ => None
        }
        case TimestampType | TimestampNTZType =>
          graft.sources.BtrPartTime.literalMicros(lit).map(m => bucketOf(f.arg, dt, Long.box(m)))
        case StringType => lit match {
          case s: String => Some(bucketOf(f.arg, dt, s))
          case _ => None
        }
        case _ => None
      })
}
