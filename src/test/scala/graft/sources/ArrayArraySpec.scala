package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** array<array<scalar>> columns — the tokenized-sentences /
  * per-span-embedding shape: outer per-row lengths cascade + an element
  * stream that is itself an array column (per-outer-element lengths +
  * flattened scalars), each level compressing under its own scheme
  * selection. Null rows, null outer elements, null inner elements,
  * empties at both levels round-trip; inner-of-inner stays rejected.
  */
class ArrayArraySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("arrarr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-arrarr-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("array<array<bigint>> and array<array<string>> round-trip with nulls/empties") {
    val dir = tmp("roundtrip")
    val df = spark.range(0, 2000).select(
      col("id").cast("int").as("k"),
      when(col("id") % 13 === 0, lit(null)).otherwise(array(
        sequence(lit(0L), col("id") % 5),                        // 1-6 longs
        when(col("id") % 7 === 0, lit(null).cast("array<bigint>"))
          .otherwise(array(col("id"), lit(null).cast("bigint"))),
        array().cast("array<bigint>"))).as("nums"),
      when(col("id") % 11 === 0, array().cast("array<array<string>>"))
        .otherwise(array(
          split(concat(lit("a b c"), lit(" w"), col("id") % 6), " "),
          array(concat(lit("s"), col("id"))))).as("sentences"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "256")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("nums").dataType.simpleString == "array<array<bigint>>")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), to_json(struct(col("nums"), col("sentences"))).as("j"))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df), "array<array> round-trip mismatch")
    // nested access over the read
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(col("sentences")).as("s"))
        .select(sum(size(col("s"))).as("n_toks"), min(element_at(col("s"), 1)).as("first"))
        .collect().map(_.toString).toSeq
    assert(agg(back) == agg(df))
  }

  test("array<array<double>> (per-span embeddings) + append + compaction") {
    val dir = tmp("embed")
    import spark.implicits._
    Seq(
      (1, Seq(Seq(0.5, -0.0), Seq(Double.NaN))),
      (2, Seq(Seq.empty[Double]))).toDF("k", "e")
      .write.format("btr").mode("overwrite").save(dir)
    Seq((3, Seq(Seq(1.25, 2.5, 3.75)))).toDF("k", "e")
      .write.format("btr").mode("append").save(dir)

    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    val back = spark.read.format("btr").load(dir).orderBy("k")
      .as[(Int, Seq[Seq[Double]])].collect().toSeq
    assert(back.length == 3)
    assert(back(0)._2.head == Seq(0.5, -0.0) &&
      java.lang.Double.doubleToLongBits(back(0)._2.head(1)) ==
        java.lang.Double.doubleToLongBits(-0.0))
    assert(back(0)._2(1).head.isNaN)
    assert(back(1)._2 == Seq(Seq.empty) && back(2)._2 == Seq(Seq(1.25, 2.5, 3.75)))
  }

  test("describe walks the array<array> cascade tree") {
    val dir = tmp("describe")
    spark.range(0, 500).select(array(sequence(lit(0L), col("id") % 4)).as("a"))
      .coalesce(1).write.format("btr").mode("overwrite").save(dir)
    import spark.implicits._
    val desc = graft.functions.BtrInspect.describe(spark, dir)
      .filter(col("column") === "a")
      .select("scheme_tree").as[String].collect()
    assert(desc.nonEmpty && desc.forall(d =>
      d.startsWith("array(") && d.contains("elems=array(")), desc.mkString("; "))
  }

  test("depth-3+ nesting round-trips: array<array<array<double>>> (span embeddings)") {
    // the token-span-embedding shape: per doc, per span, per token, a
    // vector — every nesting level gets its own lengths cascade and the
    // flat scalar stream compresses at the bottom
    val dir = tmp("depth3")
    val df = spark.range(0, 1500).select(
      col("id").cast("int").as("k"),
      when(col("id") % 17 === 0, lit(null)).otherwise(array(
        when(col("id") % 7 === 0, lit(null).cast("array<array<double>>"))
          .otherwise(array(
            transform(sequence(lit(0L), col("id") % 3),
              x => x.cast("double") * 0.5 + col("id")),
            array().cast("array<double>"))),
        array(array(lit(1.25), lit(null).cast("double")))))
        .as("spans"),
      // depth 4, string leaves: outer null, mid empties, inner nulls
      when(col("id") % 13 === 0, array().cast("array<array<array<string>>>"))
        .otherwise(array(array(
          split(concat(lit("x y"), col("id") % 5), " "),
          array(lit(null).cast("string"), concat(lit("t"), col("id"))))))
        .as("deep"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "256")
      .mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.schema("spans").dataType.simpleString == "array<array<array<double>>>")
    assert(back.schema("deep").dataType.simpleString == "array<array<array<string>>>")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), to_json(struct(col("spans"), col("deep"))).as("j"))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df), "depth-3 round-trip mismatch")
    // nested access still computes over the btr read
    val total = back.select(explode(col("spans")).as("span"))
      .select(explode(col("span")).as("v"))
      .select(explode(col("v")).as("x")).agg(sum("x")).collect()(0)
    val expect = df.select(explode(col("spans")).as("span"))
      .select(explode(col("span")).as("v"))
      .select(explode(col("v")).as("x")).agg(sum("x")).collect()(0)
    assert(total == expect)
    // the describe tree walks all levels
    import spark.implicits._
    val desc = graft.functions.BtrInspect.describe(spark, dir)
      .filter(col("column") === "spans")
      .select("scheme_tree").as[String].collect()
    assert(desc.nonEmpty && desc.forall(d => d.contains("elems=array(")), desc.mkString("; "))
  }

  test("struct leaves still reject nested arrays loudly at planning") {
    val badStruct = spark.range(1)
      .select(struct(array(array(lit(1))).as("aa")).as("rec"))
    val e2 = intercept[Exception] {
      badStruct.write.format("btr").mode("overwrite").save(tmp("reject2"))
    }
    assert(e2.getMessage.contains("struct"), e2.getMessage)
    // array<array<struct>> stays out at any depth too
    val badAAS = spark.range(1)
      .select(array(array(struct(lit(1).as("f")))).as("a"))
    val e3 = intercept[Exception] {
      badAAS.write.format("btr").mode("overwrite").save(tmp("reject3"))
    }
    assert(e3.getMessage != null)
  }
}
