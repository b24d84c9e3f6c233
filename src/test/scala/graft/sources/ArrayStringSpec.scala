package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** array<string> columns: lengths cascade + flattened string-element
  * stream through the string codec (token lists dictionary-encode
  * heavily). Null arrays, null elements, empty strings and unicode all
  * round-trip; explode/lambda functions work over the read.
  */
class ArrayStringSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("arr-str-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-arrstr-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("token lists round-trip with null arrays, null elements and unicode") {
    val dir = tmp("roundtrip")
    import spark.implicits._
    val df = spark.range(0, 2000).select(
      col("id").cast("int").as("k"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(array(
          concat(lit("tok"), col("id") % 50),
          when(col("id") % 5 === 0, lit(null)).otherwise(lit("héllo-中文")),
          lit(""),
          concat(lit("x"), col("id"))))
        .as("toks"))
    df.write.format("btr").option("btr.blockSize", "256").mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    val a = df.select(col("k"), to_json(struct(col("toks"))).as("j"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    val b = back.select(col("k"), to_json(struct(col("toks"))).as("j"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }

    // higher-order + explode over the btr read
    assert(back.filter(array_contains(col("toks"), "tok7")).count() ==
      df.filter(array_contains(col("toks"), "tok7")).count())
    assert(back.select(explode(col("toks"))).count() ==
      df.select(explode(col("toks"))).count())
    assert(back.select(sum(size(col("toks")))).head().getLong(0) ==
      df.select(sum(size(col("toks")))).head().getLong(0))
  }

  test("append + compaction preserve string arrays") {
    val dir = tmp("append")
    import spark.implicits._
    Seq((1, Seq("a", "b")), (2, Seq("c"))).toDF("k", "toks")
      .write.format("btr").mode("overwrite").save(dir)
    Seq((3, Seq.empty[String]), (4, Seq("d", "e", "f"))).toDF("k", "toks")
      .write.format("btr").mode("append").save(dir)

    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    val back = spark.read.format("btr").load(dir).orderBy("k")
      .as[(Int, Seq[String])].collect().toSeq
    assert(back == Seq((1, Seq("a", "b")), (2, Seq("c")),
      (3, Seq.empty[String]), (4, Seq("d", "e", "f"))))
  }
}
