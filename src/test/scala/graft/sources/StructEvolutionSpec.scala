package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Struct-LEAF schema evolution: appends may add leaves at the END of a
  * struct column (like top-level columns) — the meta widens, old chunks
  * read the added leaves as null (each chunk blob self-describes its
  * leaf count), and NO data file is rewritten. Covers flat and nested
  * additions, narrow appends into a widened table, leaf predicates over
  * mixed generations (including the all-null chunk-skip proof), and
  * compaction across generations.
  */
class StructEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("struct-evolution-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-structevo-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("appends may ADD struct leaves; old files read them as null, no rewrite") {
    val dir = tmp("add-leaf")
    import spark.implicits._
    // generation 1: rec{a, b}
    spark.range(0, 500).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a"), concat(lit("s"), col("id")).as("b")).as("rec"))
      .coalesce(1).write.format("btr").mode("overwrite").save(dir)
    val gen1Files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".btr"))
      .map(f => f.getName -> f.lastModified()).toMap
    // generation 2 APPENDS rec{a, b, c}
    spark.range(500, 1000).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a"), concat(lit("s"), col("id")).as("b"),
          (col("id") * 2.5).as("c")).as("rec"))
      .coalesce(1).write.format("btr").mode("append").save(dir)
    // no gen-1 file was rewritten
    val after = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".btr"))
      .map(f => f.getName -> f.lastModified()).toMap
    gen1Files.foreach { case (n, ts) => assert(after(n) == ts, s"$n was rewritten") }

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("rec").dataType.simpleString ==
      "struct<a:int,b:string,c:double>")
    assert(back.count() == 1000)
    // old rows: c null; new rows: exact values
    assert(back.filter(col("rec.c").isNull).count() == 500)
    assert(back.filter(col("k") < 500 && col("rec.c").isNull).count() == 500)
    val sum = back.agg(round(sum2(col("rec.c")), 1)).head().getDouble(0)
    assert(sum == (500 until 1000).map(_ * 2.5).sum, sum.toString)
    // the surviving leaves read across generations
    assert(back.filter(col("rec.a") === 750).select("rec.b").as[String].head() == "s750")
  }

  private def sum2(c: org.apache.spark.sql.Column) = sum(c)

  test("added leaves may be MAPS; added COLUMNS may be maps and array<array>") {
    val dir = tmp("add-map-leaf")
    import spark.implicits._
    // generation 1: rec{a}
    spark.range(0, 400).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a")).as("rec"))
      .coalesce(1).write.format("btr").mode("overwrite").save(dir)
    // generation 2 appends rec{a, attrs: map<string,string>} plus two
    // whole NEW columns of the round-12 shapes
    spark.range(400, 800).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a"),
          map(lit("lang"), concat(lit("l"), col("id") % 3)).as("attrs")).as("rec"),
        map(lit("text"), struct(lit("web").as("source"))).as("prov"),
        array(sequence(lit(0L), col("id") % 3)).as("vecs"))
      .coalesce(1).write.format("btr").mode("append").save(dir)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("rec").dataType.simpleString ==
      "struct<a:int,attrs:map<string,string>>")
    assert(back.count() == 800)
    // pre-widening rows read the added map leaf and map/array<array>
    // columns as null
    assert(back.filter(col("k") < 400 && col("rec.attrs").isNull &&
      col("prov").isNull && col("vecs").isNull).count() == 400)
    // post-widening rows resolve through every new shape
    assert(back.filter(element_at(col("rec.attrs"), "lang") === "l1").count() ==
      (400 until 800).count(_ % 3 == 1))
    assert(back.filter(element_at(col("prov"), "text").getField("source") === "web")
      .count() == 400)
    assert(back.select(sum2(size(element_at(col("vecs"), 1)))).head().getLong(0) ==
      (400 until 800).map(id => id % 3 + 1).sum)
  }

  test("NARROW appends into a widened table still work (write the old shape)") {
    val dir = tmp("narrow")
    import spark.implicits._
    spark.range(0, 100).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a")).as("rec"))
      .write.format("btr").mode("overwrite").save(dir)
    spark.range(100, 200).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a"), lit("fresh").as("note")).as("rec"))
      .write.format("btr").mode("append").save(dir)                 // widens
    spark.range(200, 300).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a")).as("rec"))
      .write.format("btr").mode("append").save(dir)                 // narrow again
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 300)
    assert(back.filter(col("rec.note").isNotNull).count() == 100)
    assert(back.filter(col("rec.note") === "fresh").count() == 100)
  }

  test("NESTED leaf addition (rec.prov gains a field) and mixed-generation predicates") {
    val dir = tmp("nested")
    import spark.implicits._
    spark.range(0, 400).select(col("id").cast("int").as("k"),
        struct(struct(concat(lit("u"), col("id")).as("url")).as("prov")).as("rec"))
      .coalesce(1).write.format("btr").option("btr.blockSize", "128")
      .mode("overwrite").save(dir)
    spark.range(400, 800).select(col("id").cast("int").as("k"),
        struct(struct(concat(lit("u"), col("id")).as("url"),
          concat(lit("d"), col("id") % 5).as("domain")).as("prov")).as("rec"))
      .coalesce(1).write.format("btr").option("btr.blockSize", "128")
      .mode("append").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.schema("rec").dataType.simpleString ==
      "struct<prov:struct<url:string,domain:string>>")
    // depth-2 predicate over mixed generations: old chunks skip via the
    // all-null proof (their leafStats lack the domain entry), new chunks
    // answer exactly
    assert(back.filter(col("rec.prov.domain") === "d3").count() ==
      (400 until 800).count(_ % 5 == 3))
    assert(back.filter(col("rec.prov.domain").isNull).count() == 400)
    assert(back.filter(col("rec.prov.url") === "u100").count() == 1)
  }

  test("compaction merges across struct generations; reads stay exact") {
    val dir = tmp("compact")
    import spark.implicits._
    spark.range(0, 300).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a")).as("rec"))
      .coalesce(1).write.format("btr").mode("overwrite").save(dir)
    spark.range(300, 600).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a"), (col("id") % 7).cast("int").as("w")).as("rec"))
      .coalesce(1).write.format("btr").mode("append").save(dir)
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 600)
    assert(back.filter(col("rec.w").isNull).count() == 300)
    assert(back.filter(col("rec.w") === 3).count() == (300 until 600).count(_ % 7 == 3))
    assert(back.agg(sum(col("rec.a"))).head().getLong(0) == (0L until 600L).sum)
  }

  test("struct-leaf evolution composes with column mapping (tombstoned table)") {
    val dir = tmp("colmap")
    import spark.implicits._
    // slot layout: [k][junk][rec{a}]; junk becomes a tombstone
    spark.range(0, 200).select(col("id").cast("int").as("k"),
        (col("id") * 3).cast("int").as("junk"),
        struct(col("id").cast("int").as("a")).as("rec"))
      .write.format("btr").mode("overwrite").save(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN junk")
    // append under the evolved struct shape INTO the tombstoned layout
    spark.range(200, 400).select(col("id").cast("int").as("k"),
        struct(col("id").cast("int").as("a"), lit("tag").as("t")).as("rec"))
      .write.format("btr").mode("append").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("k", "rec"))
    assert(back.schema("rec").dataType.simpleString == "struct<a:int,t:string>")
    assert(back.count() == 400)
    assert(back.filter(col("rec.t").isNull).count() == 200)
    assert(back.filter(col("rec.t") === "tag").count() == 200)
    assert(back.agg(sum(col("rec.a"))).head().getLong(0) == (0L until 400L).sum)
  }

  test("INCOMPATIBLE struct changes stay rejected (renamed/retyped leaf)") {
    val dir = tmp("reject")
    import spark.implicits._
    spark.range(0, 10).select(struct(col("id").cast("int").as("a")).as("rec"))
      .write.format("btr").mode("overwrite").save(dir)
    val renamed = spark.range(0, 10).select(struct(col("id").cast("int").as("zzz")).as("rec"))
    intercept[Exception] {
      renamed.write.format("btr").mode("append").save(dir)
    }
    val retyped = spark.range(0, 10).select(struct(concat(lit("x"), col("id")).as("a")).as("rec"))
    intercept[Exception] {
      retyped.write.format("btr").mode("append").save(dir)
    }
  }
}
