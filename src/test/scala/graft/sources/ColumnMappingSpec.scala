package graft.sources

import graft.format.{BtrColumnMapping, BtrTableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only ALTER TABLE RENAME/DROP COLUMN over the positional
  * footer layout: RENAME is a pure meta-field rename (positions don't
  * move), DROP leaves a reserved-named tombstone slot holding the
  * position (scans never read it, appends null-fill it), and re-adding a
  * dropped name creates a fresh slot so old values can never resurrect.
  * No data file is read or written by any of these statements.
  */
class ColumnMappingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("column-mapping-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-colmap-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def metaSchema(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    BtrTableMeta.readSchema(fs, p)
  }

  private def sql(s: String) = spark.sql(s)

  test("RENAME COLUMN is metadata-only; old and new reads, filters, appends work") {
    val dir = tmp("rename")
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "tag")
      .write.format("btr").mode("overwrite").save(dir)
    val before = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".btr"))
      .map(f => f.getName -> f.lastModified()).toMap

    sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN tag TO label")

    // no data file touched
    val after = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".btr"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == before)

    val t = spark.read.format("btr").load(dir)
    assert(t.columns.toSeq == Seq("id", "label"))
    // values decode from the SAME chunks under the new name; filters push
    assert(t.filter(col("label") === "b").select("id").as[Int].collect().toSeq == Seq(2))
    // appends use the new name; the old name is gone
    Seq((4, "d")).toDF("id", "label").write.format("btr").mode("append").save(dir)
    assert(spark.read.format("btr").load(dir).orderBy("id")
      .as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    val e = intercept[Exception] {
      Seq((5, "e")).toDF("id", "tag").write.format("btr").mode("append").save(dir)
    }
    assert(e.getMessage.contains("does not extend"), e.getMessage)
  }

  test("DROP COLUMN hides the data, keeps positions, and appends null-fill the slot") {
    val dir = tmp("drop")
    import spark.implicits._
    // drop the MIDDLE column: every later position would shift without a
    // tombstone, mis-decoding c from b's chunks
    Seq((1, "x", 10.5), (2, "y", 20.5)).toDF("a", "b", "c")
      .write.format("btr").mode("overwrite").save(dir)

    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN b")

    val t = spark.read.format("btr").load(dir)
    assert(t.columns.toSeq == Seq("a", "c"))
    // c still decodes from position 2, not position 1
    assert(t.orderBy("a").as[(Int, Double)].collect().toSeq ==
      Seq((1, 10.5), (2, 20.5)))
    assert(t.filter(col("c") > 15.0).select("a").as[Int].collect().toSeq == Seq(2))

    // meta holds the tombstone at the dropped slot
    val m = metaSchema(dir)
    assert(m.fields.length == 3)
    assert(BtrColumnMapping.isDropped(m.fields(1)), m.simpleString)

    // appends write the slot layout: new files carry a null column at
    // slot 1, so every file in the table still tiles positionally
    Seq((3, 30.5)).toDF("a", "c").write.format("btr").mode("append").save(dir)
    assert(spark.read.format("btr").load(dir).orderBy("a")
      .as[(Int, Double)].collect().toSeq ==
      Seq((1, 10.5), (2, 20.5), (3, 30.5)))
    // aggregate over both old and new files
    assert(spark.read.format("btr").load(dir).agg(sum("c")).as[Double].head() == 61.5)
  }

  test("re-adding a dropped column's name never resurrects old values") {
    val dir = tmp("resurrect")
    import spark.implicits._
    Seq((1, "secret1"), (2, "secret2")).toDF("id", "note")
      .write.format("btr").mode("overwrite").save(dir)

    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN note")
    sql(s"ALTER TABLE graft.`$dir` ADD COLUMN note STRING")

    val t = spark.read.format("btr").load(dir).orderBy("id")
    assert(t.columns.toSeq == Seq("id", "note"))
    // the revived column reads all-null over the old files — the dropped
    // values are NOT visible under the reused name
    assert(t.as[(Int, Option[String])].collect().toSeq ==
      Seq((1, None), (2, None)))
    // and new appends fill only the new slot
    Seq((3, "fresh")).toDF("id", "note").write.format("btr").mode("append").save(dir)
    assert(spark.read.format("btr").load(dir).orderBy("id")
      .as[(Int, Option[String])].collect().toSeq ==
      Seq((1, None), (2, None), (3, Some("fresh"))))
  }

  test("row-level UPDATE and metadata DELETE work on a column-mapped table") {
    val dir = tmp("dml")
    import spark.implicits._
    Seq((1, "drop-me", 10), (2, "drop-me", 20), (3, "drop-me", 30)).toDF("id", "junk", "v")
      .write.format("btr").mode("overwrite").save(dir)
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN junk")

    sql(s"UPDATE graft.`$dir` SET v = v + 1 WHERE id = 2")
    assert(spark.read.format("btr").load(dir).orderBy("id")
      .as[(Int, Int)].collect().toSeq == Seq((1, 10), (2, 21), (3, 30)))

    sql(s"DELETE FROM graft.`$dir` WHERE id = 3")
    assert(spark.read.format("btr").load(dir).orderBy("id")
      .as[(Int, Int)].collect().toSeq == Seq((1, 10), (2, 21)))
  }

  test("guards: partition columns, collisions, reserved names, last data column") {
    val dir = tmp("guards")
    import spark.implicits._
    Seq((1, "p1", "x")).toDF("id", "p", "s")
      .write.format("btr").partitionBy("p").mode("overwrite").save(dir)

    def failing(stmt: String, needle: String): Unit = {
      val e = intercept[Exception] { sql(stmt) }
      assert(e.getMessage.contains(needle), s"$stmt => ${e.getMessage}")
    }
    failing(s"ALTER TABLE graft.`$dir` DROP COLUMN p", "partition column")
    failing(s"ALTER TABLE graft.`$dir` RENAME COLUMN p TO q", "partition column")
    failing(s"ALTER TABLE graft.`$dir` RENAME COLUMN s TO id", "already exists")
    // dropping id then s would leave zero data columns
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN s")
    failing(s"ALTER TABLE graft.`$dir` DROP COLUMN id", "at least one data column")
    // the dropped name is addressable again, but reserved names are not
    failing(s"ALTER TABLE graft.`$dir` ADD COLUMN `__btr_dropped_x` INT", "reserved")
  }

  test("composite-typed columns (struct/map/array) tombstone and null-fill like scalars") {
    val dir = tmp("composite")
    import spark.implicits._
    spark.range(0, 100).select(
        col("id").cast("int").as("k"),
        struct(col("id").as("a")).as("rec"),
        map(lit("x"), col("id")).as("m"),
        array(concat(lit("t"), col("id"))).as("toks"),
        (col("id") * 2).as("v"))
      .write.format("btr").mode("overwrite").save(dir)
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN rec")
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN m")

    // appends null-fill the struct and map tombstone slots
    Seq((100, Seq("t100"), 200L)).toDF("k", "toks", "v")
      .write.format("btr").mode("append").save(dir)

    val t = spark.read.format("btr").load(dir)
    assert(t.columns.toSeq == Seq("k", "toks", "v"))
    assert(t.count() == 101)
    assert(t.agg(sum("v")).as[Long].head() == (0 until 100).map(_ * 2L).sum + 200L)
    assert(t.filter(array_contains(col("toks"), "t100")).select("k").as[Int].collect().toSeq ==
      Seq(100))
  }

  test("overwrite resets the mapping: tombstones do not outlive the table they describe") {
    val dir = tmp("reset")
    import spark.implicits._
    Seq((1, "a", 2.0)).toDF("x", "y", "z").write.format("btr").mode("overwrite").save(dir)
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN y")
    assert(BtrColumnMapping.hasTombstones(metaSchema(dir)))

    Seq((9, 9.0)).toDF("x", "z").write.format("btr").mode("overwrite").save(dir)
    assert(!BtrColumnMapping.hasTombstones(metaSchema(dir)))
    assert(spark.read.format("btr").load(dir).as[(Int, Double)].collect().toSeq ==
      Seq((9, 9.0)))
  }

  test("streaming sink epochs null-fill tombstone slots like batch appends") {
    val dir = tmp("stream")
    val src = tmp("stream-src")
    val ckpt = tmp("stream-ckpt")
    import spark.implicits._
    Seq((1, "x", 10L), (2, "y", 20L)).toDF("id", "junk", "v")
      .write.format("btr").mode("overwrite").save(dir)
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN junk")

    Seq((3, 30L), (4, 40L)).toDF("id", "v").write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = stream.writeStream.format("btr")
      .option("checkpointLocation", ckpt).start(dir)
    try q.processAllAvailable()
    finally q.stop()

    assert(spark.read.format("btr").load(dir).orderBy("id")
      .as[(Int, Long)].collect().toSeq ==
      Seq((1, 10L), (2, 20L), (3, 30L), (4, 40L)))
  }

  test("OPTIMIZE (footer compact + clustered rewrite) preserves a mapped table") {
    val dir = tmp("optimize")
    import spark.implicits._
    (1 to 500).map(i => (i, s"j$i", i * 2L)).toDF("id", "junk", "v")
      .repartition(4).write.format("btr").mode("overwrite").save(dir)
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN junk")
    (501 to 600).map(i => (i, i * 2L)).toDF("id", "v")
      .repartition(2).write.format("btr").mode("append").save(dir)

    // footer-level compact: splices byte-identical slot layouts per bin
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    assert(spark.read.format("btr").load(dir).agg(sum("v")).as[Long].head() ==
      (1 to 600).map(_ * 2L).sum)

    // clustered rewrite reads logical rows and writes the slot layout
    BtrCompact.rewriteClustered(spark, dir, Seq("id"))
    val t = spark.read.format("btr").load(dir)
    assert(t.columns.toSeq == Seq("id", "v"))
    assert(t.agg(sum("v")).as[Long].head() == (1 to 600).map(_ * 2L).sum)
    assert(t.filter(col("id") === 77).select("v").as[Long].head() == 154L)
  }

  test("metadata-only aggregates and describe stay correct over tombstone slots") {
    val dir = tmp("agg")
    import spark.implicits._
    (1 to 100).map(i => (i, s"junk$i", i.toLong)).toDF("id", "junk", "v")
      .write.format("btr").mode("overwrite").save(dir)
    sql(s"ALTER TABLE graft.`$dir` DROP COLUMN junk")
    Seq((101, 101L)).toDF("id", "v").write.format("btr").mode("append").save(dir)

    val t = spark.read.format("btr").load(dir)
    // COUNT/MIN/MAX resolve (pushed or not) with correct values
    val r = t.agg(count(lit(1)), min("v"), max("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (101L, 1L, 101L))
  }
}
