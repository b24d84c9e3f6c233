package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz round-trips: random schemas-worth of value shapes (runs,
  * outliers, constants, sorted ramps, dense nulls, empty/unicode strings,
  * ragged arrays, decimals) through write → read, compared row-for-row.
  * A broad safety net for codec/scan edge regressions.
  */
class BtrFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-fuzz-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("dec", DecimalType(14, 3)),
    StructField("arr", ArrayType(FloatType))
  ))

  private def randomRows(seed: Long, n: Int): Seq[Row] = {
    val rnd = new scala.util.Random(seed)
    def maybeNull[T](v: => T): Any = if (rnd.nextInt(7) == 0) null else v
    (0 until n).map { i =>
      val shape = rnd.nextInt(5)
      val longV = shape match {
        case 0 => (i / 50).toLong * 3 // runs
        case 1 => if (rnd.nextInt(100) == 0) rnd.nextLong() else rnd.nextInt(100).toLong // outliers
        case 2 => 42L // constant-ish
        case 3 => i.toLong // sorted
        case _ => rnd.nextLong()
      }
      Row(
        maybeNull(longV),
        maybeNull(rnd.nextInt()),
        maybeNull(rnd.nextInt(4) match {
          case 0 => rnd.nextInt(1000) / 100.0 // pseudodecimal-able
          case 1 => rnd.nextDouble()
          case 2 => if (rnd.nextBoolean()) Double.NaN else -0.0
          case _ => rnd.nextInt(5).toDouble // dict-able
        }),
        maybeNull(if (rnd.nextInt(20) == 0) Float.NaN else rnd.nextFloat()),
        maybeNull(rnd.nextBoolean()),
        maybeNull(rnd.nextInt(4) match {
          case 0 => ""
          case 1 => s"tag_${rnd.nextInt(5)}" // dict-able
          case 2 => "日本語テキスト" + rnd.nextInt(3)
          case _ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
        }),
        maybeNull(Array.fill(rnd.nextInt(8))(rnd.nextInt(256).toByte)),
        maybeNull(BigDecimal(rnd.nextInt(1000000), 3).bigDecimal),
        maybeNull(Array.fill(rnd.nextInt(6))(
          if (rnd.nextInt(9) == 0) null else java.lang.Float.valueOf(rnd.nextFloat())).toSeq)
      )
    }
  }

  // byte arrays stringify by identity; render them as hex instead
  private def fmt(r: Row): String = r.toSeq.map {
    case bytes: Array[Byte] => bytes.map("%02x".format(_)).mkString
    case other => String.valueOf(other)
  }.mkString("|")

  for (seed <- Seq(1L, 2L, 3L)) {
    test(s"random shapes round-trip losslessly (seed $seed)") {
      val n = 3000 + seed.toInt * 500
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(randomRows(seed, n), 2), schema)
      val dir = s"/tmp/btr-fuzz/$seed"
      df.write.format("btr").option("btr.blockSize", "512").mode("overwrite").save(dir)
      val back = spark.read.format("btr").load(dir)
      val a = df.collect().map(fmt).sorted
      val b = back.collect().map(fmt).sorted
      assert(a.length == b.length, s"${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) {
        assert(a(i) == b(i), s"row $i: ${a(i)} vs ${b(i)}")
        i += 1
      }
    }
  }

  test("random pushed filters return identical results over btr and in-memory data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(7L, 4000), 2), schema)
    val dir = "/tmp/btr-fuzz/filters"
    df.write.format("btr").option("btr.blockSize", "256").mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)

    // SPARK_GRAFT_FUZZ_SEEDS extends the predicate schedule for hunts
    // without a source edit (same contract as the race fuzzes)
    val extraSeeds = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
      .flatMap(_.split(',')).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    for (seed <- Seq(99L) ++ extraSeeds) {
    val rnd = new scala.util.Random(seed)
    val doubleLits = Seq(0.0, -0.0, Double.NaN, 0.5, 3.0, -1.0, 1e9)
    val longLits = Seq(0L, 42L, -1L, 150L, Long.MinValue, Long.MaxValue)
    val strLits = Seq("", "tag_1", "日本語テキスト1", "zzz", "a")
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))

    val preds = scala.collection.mutable.ArrayBuffer.empty[Column]
    (1 to 90).foreach { _ =>
      val p = rnd.nextInt(13) match {
        case 0 => col("id") > pick(longLits)
        case 1 => col("id") <= pick(longLits)
        case 2 => col("i") === pick(longLits).toInt
        case 3 => col("d") > pick(doubleLits)
        case 4 => col("d") <= pick(doubleLits)
        case 5 => col("d") === pick(doubleLits)
        case 6 => col("s") > pick(strLits)
        case 7 => col("s").startsWith(pick(Seq("tag", "日本", "x")))
        case 8 => col("dec") > BigDecimal(pick(longLits).toInt.abs % 1000)
        // equality / IN probes ride the bloom-pruning path (footer v3):
        // present values must never be skipped, absent ones may be
        case 9 => col("s") === pick(strLits ++ Seq("tag_99", "absent-value"))
        case 10 => col("s").isin(pick(strLits), "tag_2", "no-such-string")
        case 11 => col("id").isin(pick(longLits), 42L, 987654321L)
        case _ => rnd.nextInt(5) match {
          case 0 => col("f").isNull
          case 1 => col("b") === rnd.nextBoolean()
          // float chunk stats ride the statsKind-2 path incl. the hasNaN
          // guard — NaN rows must survive GreaterThan skipping
          case 2 => col("f") > pick(Seq(0.5f, 0.99f, 2.0f, Float.NaN))
          case 3 => col("dec") === BigDecimal(pick(longLits).toInt.abs % 1000) / 8
          case _ => col("f") <= pick(Seq(0.25f, 0.75f))
        }
      }
      // combinators cover every polarity the V1 translation must stay
      // sound under (the round-15 find: a partially-translated OR used
      // as a skip filter): mixed OR with an untranslatable side, exact
      // OR, NOT, NOT over a partially-translatable AND
      preds += (rnd.nextInt(8) match {
        case 0 => p && (col("id") < pick(longLits))
        case 1 => p || (col("id") % 7 === 0) // untranslatable disjunct
        case 2 => p || (col("i") === pick(longLits).toInt) // exact OR
        case 3 => !p
        case 4 => !(p && (col("id") % 3 === 0)) // NOT over partial AND
        case 5 => (col("id") % 5 === 1) || p // untranslatable, flipped
        case _ => p
      })
    }
    preds.foreach { p =>
      val exp = df.filter(p).count()
      val got = back.filter(p).count()
      assert(got == exp, s"seed=$seed filter $p: btr=$got in-memory=$exp")
    }
    } // seed loop
  }

  test("random filters over a PARTITIONED table mix directory pruning with row-level preds") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // partition on a derived low-cardinality column so every query mixes
    // the three pruning tiers (directory, chunk, late-materialization row)
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(21L, 3000), 2), schema)
    val df = base.withColumn("p", concat(lit("g"), (abs(coalesce(col("id"), lit(0L))) % 3)))
    val dir = "/tmp/btr-fuzz/part-filters"
    df.write.format("btr").option("btr.blockSize", "256")
      .partitionBy("p").mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)

    val rnd = new scala.util.Random(77)
    val longLits = Seq(0L, 42L, -1L, 150L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val parts = Seq("g0", "g1", "g2", "g9")
    (1 to 60).foreach { _ =>
      val pp: Column = rnd.nextInt(3) match {
        case 0 => col("p") === pick(parts)
        case 1 => col("p").isin(pick(parts), pick(parts))
        case _ => col("p") =!= pick(parts)
      }
      val dp: Column = rnd.nextInt(4) match {
        case 0 => col("id") > pick(longLits)
        case 1 => col("s").startsWith("tag")
        case 2 => col("d") <= 0.5
        case _ => col("i").isNotNull
      }
      val pred = rnd.nextInt(6) match {
        case 0 => pp && dp
        case 1 => pp || dp
        case 2 => dp && pp && col("id") <= pick(longLits)
        // polarity mixes over the DIRECTORY-pruning tier (the round-15
        // OR-soundness class, now with partition columns in the tree)
        case 3 => pp || (col("id") % 7 === 0) // untranslatable disjunct
        case 4 => !(pp && dp)
        case _ => !pp || dp
      }
      val exp = df.filter(pred).count()
      val got = back.filter(pred).count()
      assert(got == exp, s"partitioned filter $pred: btr=$got in-memory=$exp")
    }
    // row CONTENT survives the mix too, not just counts
    val full = back.filter(col("p") === "g1" && col("id") >= 0).select("id", "s", "p")
    val want = df.filter(col("p") === "g1" && col("id") >= 0).select("id", "s", "p")
    assert(full.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
  }

  test("fuzzed aggregate/filter mixes stay exact over btr (agg-pushdown seam)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // the seam: SupportsPushDownAggregates offers footer-only answers, and
    // pushAggregation must refuse whenever a filter could make the footer
    // answer wrong (the scan builder requires pushed.isEmpty AND Spark
    // itself blocks agg pushdown under residual filters — both layers are
    // pinned here by comparing against in-memory results under every
    // polarity the r15 OR-bug class taught us to distrust)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(31L, 4000), 2), schema)
    val dir = "/tmp/btr-fuzz/agg-filters"
    df.write.format("btr").option("btr.blockSize", "256").mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    val rnd = new scala.util.Random(131)
    val longLits = Seq(0L, 42L, -1L, 150L, Long.MaxValue)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val aggs = Seq(count(lit(1)).as("n"), count(col("i")).as("ni"),
      min(col("id")).as("mn"), max(col("id")).as("mx"),
      min(col("s")).as("mns"), max(col("s")).as("mxs"),
      sum(col("i")).as("si"), min(col("d")).as("mnd"), max(col("d")).as("mxd"))
    (1 to 40).foreach { _ =>
      val p0: Column = rnd.nextInt(6) match {
        case 0 => col("id") > pick(longLits)
        case 1 => col("s") === "tag_1"
        case 2 => col("i").isNotNull
        case 3 => col("d") <= 0.5
        case 4 => col("id").isin(pick(longLits), 42L)
        case _ => col("f").isNull
      }
      val p = rnd.nextInt(5) match {
        case 0 => p0
        case 1 => p0 || (col("id") % 7 === 0) // untranslatable disjunct
        case 2 => !p0
        case 3 => !(p0 && (col("id") % 3 === 0)) // NOT over partial AND
        case _ => p0 && col("i") > -500000
      }
      val got = back.filter(p).agg(aggs.head, aggs.tail: _*).head.toString
      val exp = df.filter(p).agg(aggs.head, aggs.tail: _*).head.toString
      assert(got == exp, s"agg/filter mix $p: btr=$got in-memory=$exp")
    }
    // the unfiltered shapes — the path that actually pushes to footers —
    // agree too, nulls and NaN included
    val gotAll = back.agg(aggs.head, aggs.tail: _*).head.toString
    val expAll = df.agg(aggs.head, aggs.tail: _*).head.toString
    assert(gotAll == expAll, s"pushed aggs: $gotAll vs $expAll")
  }

  test("fuzzed DELETE polarity predicates stay exact over transform partitions (holds seam)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // the seam: BtrDelete.classifyOne composes PartitionPrune.holds /
    // PartitionTransform.holds two-sided verdicts under And/Or (Not falls
    // to footer stats) — MatchAll drops whole files, so an unsound
    // verdict is silent data loss. Sequential DELETEs with every polarity
    // (NOT over ranges on a days(ts) dir with NULL-ts rows is the trap:
    // NULL makes the negation NULL, the rows must SURVIVE) diff against
    // an in-memory survivors oracle after each statement.
    spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)
    val p = "/tmp/btr-fuzz/delete-transform"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP, v INT, s STRING) " +
      "USING btr PARTITIONED BY (days(ts), bucket(4, id))")
    val rnd = new scala.util.Random(41)
    val base = java.time.Instant.parse("2026-03-01T00:00:00Z")
    val rows = (0 until 3000).map { i =>
      val ts = if (rnd.nextInt(11) == 0) null
        else java.sql.Timestamp.from(base.plusSeconds(i * 400L))
      (if (rnd.nextInt(13) == 0) null else java.lang.Long.valueOf(i.toLong),
        ts, Int.box(rnd.nextInt(20)), s"s${rnd.nextInt(5)}")
    }
    val df0 = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 3),
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType),
        StructField("v", IntegerType), StructField("s", StringType))))
    df0.writeTo(s"graft.`$p`").append()
    def ts(sv: String) = lit(sv).cast("timestamp")
    val preds: Seq[(String, Column)] = Seq(
      ("ts < TIMESTAMP'2026-03-03 00:00:00'", col("ts") < ts("2026-03-03 00:00:00")),
      ("NOT (ts >= TIMESTAMP'2026-03-12 00:00:00')", // NULL ts must survive
        !(col("ts") >= ts("2026-03-12 00:00:00"))),
      ("NOT (v = 7)", !(col("v") === 7)),
      ("ts IS NULL OR v < 3", col("ts").isNull || col("v") < 3),
      ("NOT (ts < TIMESTAMP'2026-03-06 00:00:00' OR id % 7 = 0)", // untranslatable disjunct under NOT
        !(col("ts") < ts("2026-03-06 00:00:00") || col("id") % 7 === 0)),
      ("id IS NULL", col("id").isNull),
      ("s = 's1' OR ts > TIMESTAMP'2026-03-13 00:00:00'",
        col("s") === "s1" || col("ts") > ts("2026-03-13 00:00:00")),
      ("NOT (s = 's3' AND ts IS NOT NULL)", !(col("s") === "s3" && col("ts").isNotNull)))
    var expected = df0
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.select(col("id"), col("ts").cast("string"), col("v"), col("s"))
        .collect().map(_.toString).sorted.toSeq
    for ((sqlPred, colPred) <- preds) {
      spark.sql(s"DELETE FROM graft.`$p` WHERE $sqlPred")
      // SQL DELETE removes rows where the predicate IS TRUE; null-result
      // rows survive
      expected = expected.filter(!coalesce(colPred, lit(false)))
      val got = canon(spark.table(s"graft.`$p`"))
      val want = canon(expected)
      assert(got == want,
        s"DELETE WHERE $sqlPred: ${got.length} rows vs expected ${want.length}")
    }

    // seeded extension: random polarity schedules over fresh tables (the
    // hunt hook — SPARK_GRAFT_FUZZ_SEEDS adds schedules without a source
    // edit, same contract as the other fuzzes)
    val extraSeeds = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
      .flatMap(_.split(',')).flatMap(x => scala.util.Try(x.trim.toLong).toOption)
    for (seed <- extraSeeds) {
      val sp = s"/tmp/btr-fuzz/delete-transform-$seed"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sp))
      spark.sql(s"CREATE TABLE graft.`$sp` (id BIGINT, ts TIMESTAMP, v INT, s STRING) " +
        "USING btr PARTITIONED BY (days(ts), bucket(4, id))")
      df0.writeTo(s"graft.`$sp`").append()
      val srnd = new scala.util.Random(seed)
      def day(): String = f"2026-03-${1 + srnd.nextInt(15)}%02d 00:00:00"
      def leaf(): (String, Column) = srnd.nextInt(6) match {
        case 0 => val d0 = day(); (s"ts < TIMESTAMP'$d0'", col("ts") < ts(d0))
        case 1 => val d0 = day(); (s"ts >= TIMESTAMP'$d0'", col("ts") >= ts(d0))
        case 2 => val x = srnd.nextInt(20); (s"v = $x", col("v") === x)
        case 3 => val x = srnd.nextInt(5); (s"s = 's$x'", col("s") === s"s$x")
        case 4 => ("ts IS NULL", col("ts").isNull)
        case _ => val x = srnd.nextInt(3000); (s"id = $x", col("id") === x)
      }
      var exp = df0
      (1 to 6).foreach { _ =>
        val (s1, c1) = leaf()
        val (s2, c2) = leaf()
        val (sqlPred, colPred) = srnd.nextInt(5) match {
          case 0 => (s"NOT ($s1)", !c1)
          case 1 => (s"$s1 OR $s2", c1 || c2)
          case 2 => (s"NOT ($s1 OR id % 7 = 0)", !(c1 || col("id") % 7 === 0))
          case 3 => (s"$s1 AND $s2", c1 && c2)
          case _ => (s"NOT ($s1 AND $s2)", !(c1 && c2))
        }
        spark.sql(s"DELETE FROM graft.`$sp` WHERE $sqlPred")
        exp = exp.filter(!coalesce(colPred, lit(false)))
        val got = canon(spark.table(s"graft.`$sp`"))
        val want = canon(exp)
        assert(got == want,
          s"seed=$seed DELETE WHERE $sqlPred: ${got.length} vs ${want.length}")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sp))
    }
  }

  test("runtime filter arrays are conjunctions: adversarial shapes never over-prune") {
    import org.apache.spark.sql.functions._
    // the seam: SupportsRuntimeFiltering.filter(Array[Filter]) — the scan
    // treats each element as an independently-implied conjunct for chunk
    // skipping and drops unsupported elements. Pin the assumption by
    // injecting arrays directly (the way Spark's DPP would) with every
    // polarity shape and asserting the scan still SURFACES every row the
    // conjunction matches (skipping may only remove non-matching chunks).
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(53L, 4000), 2), schema)
    val dir = "/tmp/btr-fuzz/runtime-filters"
    df.sort("id").coalesce(1).write.format("btr")
      .option("btr.blockSize", "256").mode("overwrite").save(dir)
    val idVals: Seq[java.lang.Long] =
      df.select("id").collect().map(r => if (r.isNullAt(0)) null else Long.box(r.getLong(0))).toSeq
    import org.apache.spark.sql.sources._
    // in-memory V1 evaluation over the id column (null never satisfies)
    def eval(f: Filter, v: java.lang.Long): Boolean = f match {
      case EqualTo("id", x: Long) => v != null && v.longValue() == x
      case GreaterThan("id", x: Long) => v != null && v.longValue() > x
      case LessThanOrEqual("id", x: Long) => v != null && v.longValue() <= x
      case In("id", vs) => v != null && vs.exists { case x: Long => x == v.longValue(); case _ => false }
      case IsNull("id") => v == null
      case IsNotNull("id") => v != null
      case And(l, r) => eval(l, v) && eval(r, v)
      case Or(l, r) => eval(l, v) || eval(r, v)
      case Not(inner) => v != null && !eval(inner, v) // 3VL: null matches neither side
      case StringContains("s", _) => true // unsupported by ChunkSkip: dropped, constrains nothing
      case _ => fail(s"unhandled eval shape $f")
    }
    val rnd = new scala.util.Random(177)
    val present = idVals.filter(_ != null).map(_.longValue())
    def pickId(): Long = if (present.isEmpty || rnd.nextBoolean()) rnd.nextInt(300).toLong
      else present(rnd.nextInt(present.length))
    (1 to 25).foreach { _ =>
      val n = 1 + rnd.nextInt(3)
      val arr: Array[Filter] = Array.fill(n)(rnd.nextInt(7) match {
        case 0 => In("id", Array.fill(1 + rnd.nextInt(4))(Long.box(pickId())).map(_.asInstanceOf[Any]))
        case 1 => EqualTo("id", pickId())
        case 2 => GreaterThan("id", pickId())
        case 3 => Or(EqualTo("id", pickId()), EqualTo("id", pickId()))
        case 4 => Not(GreaterThan("id", pickId()))
        case 5 => StringContains("s", "tag") // unsupported shape rides along
        case _ => And(GreaterThan("id", pickId() - 200), LessThanOrEqual("id", pickId() + 200))
      })
      // fresh scan per trial (runtime filters accumulate per instance)
      val fresh = spark.read.format("btr").load(dir).select("id")
      val scan = fresh.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.head.asInstanceOf[BtrScan]
      scan.filter(arr)
      val got = scala.collection.mutable.HashSet.empty[Long]
      var scanned = 0L
      val factory = scan.toBatch.createReaderFactory()
      scan.planInputPartitions().foreach { ip =>
        val r = factory.createColumnarReader(ip)
        try while (r.next()) {
          val it = r.get().rowIterator()
          while (it.hasNext) {
            val row = it.next(); scanned += 1
            if (!row.isNullAt(0)) got += row.getLong(0)
          }
        } finally r.close()
      }
      val matching = idVals.filter(v => arr.forall(eval(_, v)))
      val missing = matching.filter(v => v != null && !got.contains(v.longValue()))
      assert(missing.isEmpty,
        s"runtime conjunction ${arr.mkString(" AND ")} lost ids ${missing.take(5)}")
      assert(scanned <= idVals.length.toLong, "scan invented rows")
    }
  }

  test("compaction of fuzzed multi-file appends preserves every row shape") {
    val dir = "/tmp/btr-fuzz/compact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // 5 appends with different seeds/sizes → many small files of the
    // full type surface (nulls, NaN/-0.0, unicode, binary, arrays)
    (10L to 14L).foreach { seed =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(randomRows(seed, 800 + seed.toInt * 37), 2), schema)
      df.write.format("btr").option("btr.blockSize", "256").mode("append").save(dir)
    }
    val before = spark.read.format("btr").load(dir).collect().map(fmt).sorted
    val (nb, na) = BtrCompact.compact(spark, dir, targetBytes = 1L << 30)
    assert(na < nb, s"$nb -> $na")
    val after = spark.read.format("btr").load(dir).collect().map(fmt).sorted
    assert(before.length == after.length, s"${before.length} vs ${after.length}")
    var i = 0
    while (i < before.length) {
      assert(before(i) == after(i), s"row $i: ${before(i)} vs ${after(i)}")
      i += 1
    }
  }

  test("fuzzed filters stay exact across a schema widening + compaction") {
    import org.apache.spark.sql.functions._
    val dir = "/tmp/btr-fuzz/evolved"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // generation 1: the base schema; generation 2: adds a nullable tail
    // column — the widened table mixes footer column counts
    val gen1 = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(21L, 1500), 2), schema)
    gen1.write.format("btr").option("btr.blockSize", "256").mode("overwrite").save(dir)
    val gen2base = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(22L, 1500), 2), schema)
    val gen2 = gen2base.withColumn("added", when(col("i") % 3 === 0, pmod(col("i"), lit(100000)) * 2))
    gen2.write.format("btr").option("btr.blockSize", "256").mode("append").save(dir)
    val expected = gen1.withColumn("added", lit(null).cast("int")).union(gen2)
    val back = spark.read.format("btr").load(dir)

    val rnd = new scala.util.Random(23)
    val preds = Seq[org.apache.spark.sql.Column](
      col("added").isNull, col("added").isNotNull,
      col("added") === 42, col("added") > 0, col("added") <= 100,
      col("added").isin(6, 12, 999983),
      col("added").isNotNull && col("id") > 50,
      col("s") === "tag_1", col("i") > 0) ++
      (1 to 20).map(_ => col("added") === (rnd.nextInt(2000) - 1000))
    preds.foreach { p =>
      val exp = expected.filter(p).count()
      val got = back.filter(p).count()
      assert(got == exp, s"evolved filter $p: btr=$got expected=$exp")
    }
    // compaction keeps generations apart and every answer identical
    BtrCompact.compact(spark, dir, targetBytes = 1L << 30)
    val compacted = spark.read.format("btr").load(dir)
    preds.foreach { p =>
      val exp = expected.filter(p).count()
      val got = compacted.filter(p).count()
      assert(got == exp, s"post-compact evolved filter $p: btr=$got expected=$exp")
    }
    // and the pushed aggregates agree over the mixed generations
    val a = compacted.agg(count(col("added")), sum(col("added")),
      min(col("added")), max(col("added")), count(lit(1))).head
    val e = expected.agg(count(col("added")), sum(col("added")),
      min(col("added")), max(col("added")), count(lit(1))).head
    assert(a.toString == e.toString, s"$a vs $e")
  }

  test("fuzzed sampling reads: deterministic exact subsets across filters, projections and DV deletes (sampling seam)") {
    // btr.sampleChunks samples PLANNED row groups — i.e. it composes with
    // chunk skipping, late materialization, nested-leaf projection and
    // deletion-vector masks, exactly the r15 OR-bug seam class, one tier
    // up. Per seeded schedule: (a) the degenerate full-size sample must
    // equal the unsampled answer EXACTLY through the regroup/pack path,
    // (b) a real sample must be a deterministic subset of the filtered
    // truth and replay identically, (c) projection must not change which
    // chunks a fixed (n, seed) draws, and (d) after a DV DELETE no
    // sampled read may resurrect a deleted row.
    import org.apache.spark.sql.functions._
    val dir = "/tmp/btr-fuzz/sampling"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(randomRows(31L, 5000), 2), schema)
    df.write.format("btr").option("btr.blockSize", "256").mode("overwrite").save(dir)
    spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES ('btr.deletionVectors'='true')")
    def sampled(n: Int, seed: Long) = spark.read.format("btr")
      .option("btr.sampleChunks", n.toString)
      .option("btr.sampleSeed", seed.toString).load(dir)
    def full() = spark.read.format("btr").load(dir)

    val extraSeeds = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
      .flatMap(_.split(',')).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    val doubleLits = Seq(0.0, -0.0, Double.NaN, 0.5, 3.0)
    val longLits = Seq(0L, 42L, -1L, 150L, Long.MaxValue)
    for (seed <- Seq(171L, 172L) ++ extraSeeds) {
      val rnd = new scala.util.Random(seed)
      def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
      def pred(): org.apache.spark.sql.Column = {
        val p = rnd.nextInt(6) match {
          case 0 => col("id") > pick(longLits)
          case 1 => col("d") <= pick(doubleLits)
          case 2 => col("s").startsWith(pick(Seq("tag", "日本", "x")))
          case 3 => col("id").isin(pick(longLits), 42L, 987654321L)
          case 4 => col("f").isNull
          case _ => col("dec") > BigDecimal(pick(longLits).toInt.abs % 1000)
        }
        // the polarity combinators the r15 bug class lives in
        rnd.nextInt(5) match {
          case 0 => p || (col("id") % 7 === 0) // untranslatable disjunct
          case 1 => !p
          case 2 => p && (col("i") > pick(longLits).toInt)
          case 3 => !(p && (col("id") % 3 === 0))
          case _ => p
        }
      }
      var round = 0
      while (round < 6) {
        val p = pred()
        val truth = full().filter(p).collect().map(fmt).sorted.toSeq
        // (a) degenerate sample == full answer, exactly
        val all = sampled(10000, seed + round).filter(p).collect().map(fmt).sorted.toSeq
        assert(all == truth, s"seed=$seed round=$round: full-size sample diverged under $p")
        // (b) deterministic strict subset
        val n = 1 + rnd.nextInt(8)
        val s1 = sampled(n, seed + round).filter(p).collect().map(fmt).sorted.toSeq
        val s2 = sampled(n, seed + round).filter(p).collect().map(fmt).sorted.toSeq
        assert(s1 == s2, s"seed=$seed round=$round: sample must replay identically")
        val truthBag = scala.collection.mutable.Map.empty[String, Int]
        truth.foreach(r => truthBag(r) = truthBag.getOrElse(r, 0) + 1)
        s1.groupBy(identity).foreach { case (r, xs) =>
          assert(truthBag.getOrElse(r, 0) >= xs.length,
            s"seed=$seed round=$round: sampled row not in (or over-multiplied vs) the truth: $r")
        }
        // (c) projection must not re-draw the sample: project-at-scan ==
        // project-after-read for the same (n, seed), incl. a nested leaf
        val cols = Seq("id", "s", "arr")
        val proj = sampled(n, seed + round).select(cols.map(col): _*)
          .collect().map(fmt).sorted.toSeq
        val post = sampled(n, seed + round).collect()
          .map(r => fmt(Row.fromSeq(cols.map(c => r.getAs[Any](c)))))
          .sorted.toSeq
        assert(proj == post,
          s"seed=$seed round=$round: projection changed the drawn sample")
        // (d) every few rounds, a DV DELETE with a fuzzed predicate — no
        // sampled read afterwards may resurrect a deleted row
        if (round % 2 == 1) {
          val sqlPred = rnd.nextInt(3) match {
            case 0 => s"id % ${2 + rnd.nextInt(9)} = 0"
            case 1 => s"i > ${rnd.nextInt(1 << 30)}"
            case _ => s"s LIKE 'tag_${rnd.nextInt(5)}%'"
          }
          spark.sql(s"DELETE FROM graft.`$dir` WHERE $sqlPred")
          val alive = full().collect().map(fmt).toSet
          val resampled = sampled(1 + rnd.nextInt(8), seed + round)
            .collect().map(fmt).toSeq
          resampled.foreach(r => assert(alive.contains(r),
            s"seed=$seed round=$round: sampled read resurrected a DV-deleted row: $r"))
        }
        round += 1
      }
    }
  }

  test("fuzzed sampled reads racing DV commits in the resolve/listing gap see ONE snapshot") {
    // a merge-on-read commit landing BETWEEN a sampled read's mask
    // resolve and its data listing is the worst interleaving for the
    // sampling tier. The read contract is snapshot consistency, not
    // freshness: a pure DV DELETE adds no data files, so the raced read
    // may legitimately serve the (consistent) pre-commit state; an
    // UPDATE adds files, so the rowdelta recheck retries onto the
    // post-commit log. The oracle is therefore: the raced sampled read
    // equals EXACTLY ONE of the two consistent samples for that
    // (n, seed) — pre-commit or post-commit — never a mix (post-commit
    // listing with pre-commit masks would emit rows that existed in
    // neither snapshot), across fuzzed predicates, sample sizes and
    // DELETE/UPDATE ops.
    import org.apache.spark.sql.functions._
    val dir = "/tmp/btr-fuzz/sampling-dv-race"
    val extraSeeds = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
      .flatMap(_.split(',')).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)
    for (seed <- Seq(181L, 182L) ++ extraSeeds) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(randomRows(seed, 4000), 2), schema)
      df.write.format("btr").option("btr.blockSize", "256")
        .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
      val rnd = new scala.util.Random(seed)
      def sampled(n: Int, s: Long) = spark.read.format("btr")
        .option("btr.sampleChunks", n.toString)
        .option("btr.sampleSeed", s.toString).load(dir)
      var round = 0
      while (round < 4) {
        val n = 1 + rnd.nextInt(8)
        val sqlPred = rnd.nextInt(3) match {
          case 0 => s"id % ${2 + rnd.nextInt(9)} = 0"
          case 1 => s"i < ${rnd.nextInt(1 << 30) - (1 << 29)}"
          case _ => s"s LIKE 'tag_${rnd.nextInt(5)}%'"
        }
        val dml =
          if (rnd.nextBoolean()) s"DELETE FROM graft.`$dir` WHERE $sqlPred"
          else s"UPDATE graft.`$dir` SET i = 0 WHERE $sqlPred"
        val sseed = seed * 31 + round
        val pre = sampled(n, sseed).collect().map(fmt).sorted.toSeq
        BtrScan.betweenDvResolveAndListing = () => spark.sql(dml)
        val raced =
          try sampled(n, sseed).collect().map(fmt).sorted.toSeq
          finally { BtrScan.betweenDvResolveAndListing = () => () }
        val post = sampled(n, sseed).collect().map(fmt).sorted.toSeq
        assert(raced == pre || raced == post,
          s"seed=$seed round=$round dml=[$dml]: raced sample matches NEITHER " +
            s"consistent snapshot (pre=${pre.length} raced=${raced.length} " +
            s"post=${post.length} rows) — a mixed mask/listing state")
        round += 1
      }
    }
  }
}
