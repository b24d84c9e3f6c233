package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** map<K,V> columns: the array layout with two self-described element
  * streams (keys/values each run their scalar codec). Null maps, null
  * values, empty maps, string and numeric keys/values round-trip;
  * map functions work over the read; compaction splices them.
  */
class MapColumnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("map-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-map-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("string->long and string->string maps round-trip with nulls and empties") {
    val dir = tmp("roundtrip")
    import spark.implicits._
    val df = spark.range(0, 2000).select(
      col("id").cast("int").as("k"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(map(
          lit("count"), col("id"),
          lit("square"), col("id") * col("id"),
          concat(lit("k"), col("id") % 5), col("id") % 100)).as("m"),
      when(col("id") % 11 === 0, map())
        .otherwise(map(lit("lang"), concat(lit("l"), col("id") % 3),
          lit("src"), when(col("id") % 4 === 0, lit(null).cast("string")).otherwise(lit("web"))))
        .as("attrs"))
    df.write.format("btr").option("btr.blockSize", "256").mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), to_json(struct(col("m"), col("attrs"))).as("j"))
        .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(canon(back) == canon(df))

    // map functions over the read
    assert(back.filter(col("m")("square") === 144).select("k").as[Int].collect().toSeq == Seq(12))
    assert(back.select(sum(element_at(col("m"), "count"))).head().getLong(0) ==
      df.select(sum(element_at(col("m"), "count"))).head().getLong(0))
    assert(back.filter(col("attrs")("src").isNull && col("attrs").isNotNull &&
      size(col("attrs")) > 0).count() ==
      df.filter(col("attrs")("src").isNull && col("attrs").isNotNull &&
        size(col("attrs")) > 0).count())
    assert(back.select(explode(map_keys(col("m")))).count() ==
      df.select(explode(map_keys(col("m")))).count())
  }

  test("int-keyed maps with double values; append + compaction") {
    val dir = tmp("intkey")
    import spark.implicits._
    Seq((1, Map(1 -> 1.5, 2 -> 2.5)), (2, Map(3 -> -0.0)))
      .toDF("k", "m").write.format("btr").mode("overwrite").save(dir)
    Seq((3, Map.empty[Int, Double]), (4, Map(9 -> Double.NaN)))
      .toDF("k", "m").write.format("btr").mode("append").save(dir)

    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    val back = spark.read.format("btr").load(dir).orderBy("k")
      .as[(Int, Map[Int, Double])].collect().toSeq
    assert(back.map(_._1) == Seq(1, 2, 3, 4))
    assert(back(0)._2 == Map(1 -> 1.5, 2 -> 2.5))
    assert(java.lang.Double.doubleToRawLongBits(back(1)._2(3)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(back(2)._2.isEmpty)
    assert(back(3)._2(9).isNaN)
  }

  test("ARRAY-valued maps round-trip (map<string,array<double>> per-field scores)") {
    val dir = tmp("arrval")
    import spark.implicits._
    val df = spark.range(0, 1500).select(
      col("id").cast("int").as("k"),
      when(col("id") % 11 === 0, lit(null)).otherwise(
        map(
          lit("quality"), array(col("id") * 0.1, col("id") * 0.2),
          lit("toxicity"),
          when(col("id") % 7 === 0, lit(null).cast("array<double>"))
            .otherwise(array(col("id") * 0.3)))).as("scores"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.schema("scores").dataType.simpleString == "map<string,array<double>>")
    // maps don't support exceptAll — compare via exploded sorted rows
    def flat(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), explode_outer(col("scores")).as(Seq("key", "vals")))
        .select(col("k"), col("key"), col("vals"))
        .collect().map(_.toString).sorted.toSeq
    assert(flat(back) == flat(df), "array-valued map round-trip mismatch")
  }

  test("STRUCT-valued maps round-trip (map<string,struct> per-field provenance)") {
    val dir = tmp("structval")
    import spark.implicits._
    // the training-data metadata shape: field name -> {source, version,
    // confidence}, with null structs, null leaves, empty and null maps
    val df = spark.range(0, 2000).select(
      col("id").cast("int").as("k"),
      when(col("id") % 13 === 0, lit(null)).otherwise(
        map(
          lit("title"), struct(
            concat(lit("src"), col("id") % 3).as("source"),
            col("id").cast("long").as("version"),
            (col("id") * 0.01).as("confidence")),
          lit("body"), when(col("id") % 7 === 0,
              lit(null).cast("struct<source:string,version:bigint,confidence:double>"))
            .otherwise(struct(
              lit("web").as("source"),
              when(col("id") % 5 === 0, lit(null).cast("long")).otherwise(lit(2L))
                .as("version"),
              lit(0.5).as("confidence"))))).as("prov"),
      when(col("id") % 17 === 0, map().cast("map<string,struct<n:int>>"))
        .otherwise(map(lit("a"), struct((col("id") % 9).cast("int").as("n")))).as("tiny"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("prov").dataType.simpleString ==
      "map<string,struct<source:string,version:bigint,confidence:double>>")
    def flat(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), explode_outer(col("prov")).as(Seq("f", "p")), col("tiny"))
        .select(col("k"), col("f"), col("p.source"), col("p.version"),
          col("p.confidence"), to_json(col("tiny")).as("t"))
        .collect().map(_.toString).sorted.toSeq
    assert(flat(back) == flat(df), "struct-valued map round-trip mismatch")
    // value-struct field access works over the read
    assert(back.select(sum(col("prov")("title").getField("version"))).head().getLong(0) ==
      df.select(sum(col("prov")("title").getField("version"))).head().getLong(0))
  }

  test("map value-structs may NEST (struct + array sub-leaves) and prune by name") {
    val dir = tmp("structval-nested")
    import spark.implicits._
    // per-field provenance with a nested score struct and a tag list
    val df = spark.range(0, 1200).select(
      col("id").cast("int").as("k"),
      map(
        lit("text"), struct(
          concat(lit("s"), col("id") % 3).as("source"),
          when(col("id") % 7 === 0, lit(null).cast("struct<model:string,value:double>"))
            .otherwise(struct(lit("m1").as("model"), (col("id") * 0.25).as("value")))
            .as("score"),
          when(col("id") % 5 === 0, lit(null).cast("array<string>"))
            .otherwise(array(lit("a"), concat(lit("t"), col("id") % 4))).as("tags"))
      ).as("prov"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "256")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), to_json(col("prov")).as("j"))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df), "nested map-value round-trip mismatch")
    // pruned value projection (only score.value survives): unrequested
    // value leaves skip by recorded length, and the fill maps the
    // surviving leaf by name onto the file's full value struct
    def sums(d: org.apache.spark.sql.DataFrame) =
      d.select(round(sum(element_at(col("prov"), "text")
        .getField("score").getField("value")), 2)).head().getDouble(0)
    assert(sums(back) == sums(df))
    def tagCounts(d: org.apache.spark.sql.DataFrame) =
      d.select(sum(size(element_at(col("prov"), "text").getField("tags"))))
        .head().getLong(0)
    assert(tagCounts(back) == tagCounts(df))
  }

  test("maps INSIDE structs round-trip (struct<...,attrs:map<string,string>>)") {
    val dir = tmp("map-in-struct")
    import spark.implicits._
    val df = spark.range(0, 1500).select(
      col("id").cast("int").as("k"),
      when(col("id") % 19 === 0, lit(null)).otherwise(struct(
        concat(lit("doc"), col("id")).as("name"),
        when(col("id") % 6 === 0, lit(null).cast("map<string,string>"))
          .otherwise(map(lit("lang"), concat(lit("l"), col("id") % 4),
            lit("lic"), lit("cc"))).as("attrs"),
        map(lit("n"), col("id")).as("counts"))).as("meta"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "256")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("meta").dataType.simpleString ==
      "struct<name:string,attrs:map<string,string>,counts:map<string,bigint>>")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), to_json(col("meta")).as("j"))
        .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(canon(back) == canon(df), "map-inside-struct round-trip mismatch")
    // sibling-leaf pruning still works next to the map leaf, and the map
    // leaf itself resolves through element_at
    assert(back.select(col("meta.name")).where(col("meta.name") === "doc7").count() == 1)
    assert(back.select(sum(element_at(col("meta.counts"), "n"))).head().getLong(0) ==
      df.select(sum(element_at(col("meta.counts"), "n"))).head().getLong(0))
  }

  test("nested maps and non-scalar KEYS stay rejected loudly") {
    import spark.implicits._
    val bad = spark.range(1).select(map(array(lit(1)), lit("v")).as("m"))
    val e = intercept[Exception] {
      bad.write.format("btr").mode("overwrite").save(tmp("reject"))
    }
    assert(e.getMessage.toLowerCase.contains("scalar"), e.getMessage)
  }
}
