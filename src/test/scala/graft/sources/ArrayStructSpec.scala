package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** array<struct<...>> columns — the per-span annotation shape
  * (array<struct<start,end,label>>): per-row lengths cascade + a struct
  * column body over the flattened elements, each leaf independently
  * scheme-selected. Null rows, null elements, and null leaf values are
  * all distinct and must round-trip exactly.
  */
class ArrayStructSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("arrstruct-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-arrstruct-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def spansDf = {
    import spark.implicits._
    spark.range(0, 3000).select(
      col("id").cast("int").as("k"),
      when(col("id") % 11 === 0, lit(null)).otherwise(
        filter(array(
          struct(col("id").cast("int").as("start"), (col("id") + 5).cast("int").as("end"),
            concat(lit("lbl"), col("id") % 7).as("label"), (col("id") * 0.25).as("score")),
          when(col("id") % 5 === 0, lit(null)).otherwise(
            struct((col("id") + 10).cast("int").as("start"), (col("id") + 20).cast("int").as("end"),
              when(col("id") % 3 === 0, lit(null).cast("string")).otherwise(lit("x")).as("label"),
              lit(1.5).as("score"))),
          struct(lit(0).as("start"), lit(1).as("end"),
            lit("tail").as("label"), (col("id") % 2 * 1.0).as("score"))
        ), x => col("id") % 4 =!= 3 || x.isNull)).as("spans"))
  }

  test("array<struct> round-trips exactly (null rows, null elements, null leaves)") {
    val dir = tmp("roundtrip")
    val df = spansDf
    df.coalesce(2).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.schema("spans").dataType.simpleString ==
      df.schema("spans").dataType.simpleString)
    val a = df.select(col("k"), to_json(col("spans")).as("j")).collect()
      .map(_.toString).sorted.toSeq
    val b = back.select(col("k"), to_json(col("spans")).as("j")).collect()
      .map(_.toString).sorted.toSeq
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("exploded element queries match the in-memory model") {
    val dir = tmp("explode")
    val df = spansDf
    df.coalesce(2).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), explode_outer(col("spans")).as("s"))
        .groupBy(col("s.label").as("label"))
        .agg(count(lit(1)).as("n"), round(sum(col("s.score")), 3).as("sum_score"),
          min(col("s.start")).as("min_start"))
        .orderBy("label")
        .collect().map(_.toString).toSeq
    assert(agg(back) == agg(df))
  }

  test("element-field projection prunes and fills by name (Catalyst nested pruning)") {
    val dir = tmp("prune")
    val df = spansDf
    df.coalesce(1).write.format("btr").mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    // project ONLY spans.label — Spark prunes the element struct; the
    // fill must map the surviving field onto the right file leaf
    def labels(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("spans.label").as("labels"))
        .collect().map(_.toString).sorted.toSeq
    assert(labels(back) == labels(df))
    // and a non-leading field alone
    def scores(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("spans.score").as("scores"))
        .collect().map(_.toString).sorted.toSeq
    assert(scores(back) == scores(df))
  }

  test("appends and compaction preserve array<struct> columns") {
    import spark.implicits._
    val dir = tmp("compact")
    val df = spansDf
    df.limit(1000).coalesce(1).write.format("btr").mode("overwrite").save(dir)
    df.filter(col("k") >= 1000).coalesce(1).write.format("btr").mode("append").save(dir)
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 3000)
    val a = df.select(col("k"), to_json(col("spans"))).collect().map(_.toString).sorted.toSeq
    val b = back.select(col("k"), to_json(col("spans"))).collect().map(_.toString).sorted.toSeq
    assert(a == b, "post-compaction mismatch")
  }

  test("fuzz: random element-struct shapes and adversarial values round-trip exactly") {
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(11_2026_08_14L)
    val scalars = Vector(IntegerType, LongType, DoubleType, StringType, BooleanType)
    def rv(dt: DataType): Any = dt match {
      case IntegerType => rnd.nextInt(3) match {
        case 0 => Int.MinValue; case 1 => Int.MaxValue; case _ => rnd.nextInt(100)
      }
      case LongType => rnd.nextLong() % 10000L
      case DoubleType => rnd.nextInt(6) match {
        case 0 => Double.NaN; case 1 => -0.0d; case 2 => Double.PositiveInfinity
        case _ => rnd.nextDouble() * 10
      }
      case StringType => rnd.nextInt(4) match {
        case 0 => ""; case 1 => "ü中\n"; case _ => s"v${rnd.nextInt(20)}"
      }
      case BooleanType => rnd.nextBoolean()
      case other => throw new IllegalStateException(other.toString)
    }
    for (round <- 0 until 4) {
      val dir = tmp(s"fuzz$round")
      val nLeaves = 1 + rnd.nextInt(4)
      val est = StructType((0 until nLeaves).map(j =>
        StructField(s"f$j", scalars(rnd.nextInt(scalars.length)), nullable = true)))
      val schema = StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("spans", org.apache.spark.sql.types.ArrayType(est, containsNull = true),
          nullable = true)))
      val n = 100 + rnd.nextInt(400)
      val rows = (0 until n).map { i =>
        val arr =
          if (rnd.nextInt(7) == 0) null
          else (0 until rnd.nextInt(5)).map { _ =>
            if (rnd.nextInt(6) == 0) null
            else org.apache.spark.sql.Row.fromSeq(est.fields.toSeq.map(f =>
              if (rnd.nextInt(5) == 0) null else rv(f.dataType)))
          }
        org.apache.spark.sql.Row(i, arr)
      }
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      df.write.format("btr").option("btr.blockSize", "64").mode("overwrite").save(dir)
      val back = spark.read.format("btr").load(dir)
      val a = df.select(col("id"), to_json(col("spans"))).collect().map(_.toString).sorted.toSeq
      val b = back.select(col("id"), to_json(col("spans"))).collect().map(_.toString).sorted.toSeq
      assert(a.length == b.length, s"round $round count")
      a.zip(b).foreach { case (x, y) => assert(x == y, s"round $round: $x vs $y") }
    }
  }

  test("NESTED element fields round-trip: struct and array leaves inside array<struct>") {
    // the annotated-span shape with nested score structs the r11 verdict
    // named: array<struct<start,end,meta:struct<model,score>,tags:array<string>>>
    val dir = tmp("nested-elems")
    val df = spark.range(0, 1200).select(
      col("id").cast("int").as("k"),
      when(col("id") % 11 === 0, lit(null)).otherwise(array(
        struct(
          lit(0).as("start"), (col("id") % 50).cast("int").as("end"),
          when(col("id") % 7 === 0,
              lit(null).cast("struct<model:string,score:double>"))
            .otherwise(struct(concat(lit("m"), col("id") % 3).as("model"),
              (col("id") * 0.25).as("score"))).as("meta"),
          when(col("id") % 5 === 0, lit(null).cast("array<string>"))
            .otherwise(array(lit("a"), concat(lit("t"), col("id") % 4))).as("tags")),
        struct(
          lit(1).as("start"), lit(9).as("end"),
          struct(lit("m9").as("model"), lit(0.5).as("score")).as("meta"),
          array().cast("array<string>").as("tags")))).as("spans"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "256")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("spans").dataType.simpleString ==
      df.schema("spans").dataType.simpleString)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), to_json(col("spans")).as("j"))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df), "nested element round-trip mismatch")
    // exploded access into the nested struct + array element fields
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(col("spans")).as("s"))
        .groupBy(col("s.meta.model").as("model"))
        .agg(count(lit(1)).as("n"), round(sum(col("s.meta.score")), 2).as("sum_score"),
          sum(size(col("s.tags"))).as("sum_tags"))
        .orderBy("model")
        .collect().map(_.toString).toSeq
    assert(agg(back) == agg(df))
  }

  test("describe walks the array<struct> cascade tree") {
    val dir = tmp("describe")
    spansDf.coalesce(1).write.format("btr").mode("overwrite").save(dir)
    import spark.implicits._
    val desc = graft.functions.BtrInspect.describe(spark, dir)
      .filter(col("column") === "spans")
      .select("scheme_tree").as[String].collect()
    assert(desc.nonEmpty && desc.forall(_.startsWith("array(")), desc.mkString("; "))
  }
}
