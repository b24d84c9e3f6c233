package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-level DELETE + overwrite modes: SQL `DELETE FROM` over a path
  * table, partition-predicate and chunk-stat-aligned data predicates,
  * refusal when a file would split, dynamic partition overwrite, and
  * overwrite-by-filter commit semantics.
  */
class BtrDeleteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-delete-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // path-addressed catalog: DELETE / INSERT OVERWRITE resolve through it
  // (direct-on-file SQL only covers V1 file formats)
  spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)

  private def tmp(name: String) = s"/tmp/btr-delete/$name"

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("fuzz: every DELETE outcome equals the row-level semantics or refuses cleanly") {
    // soundness of the allMatch/canSkip duality — a wrong MatchAll verdict
    // is silent data loss, so hammer it with random layouts + predicates:
    // accepted deletes must equal filter(NOT coalesce(pred, false));
    // refused deletes must leave the table byte-identical
    val rnd = new scala.util.Random(0xD31E7E)
    for (iter <- 0 until 8) {
      val p = tmp(s"fuzz_$iter")
      // 2-4 single-file appends with random (possibly overlapping) ranges,
      // some null vs, a low-cardinality string col
      val nApp = 2 + rnd.nextInt(3)
      val parts = (0 until nApp).map { a =>
        val lo = rnd.nextInt(200)
        val n = 30 + rnd.nextInt(80)
        (lo until lo + n).map { i =>
          (if (rnd.nextInt(10) == 0) None else Some(i.toLong),
            s"g${i % (1 + rnd.nextInt(4))}")
        }
      }
      parts.zipWithIndex.foreach { case (rows, a) =>
        rows.toDF("v", "s").coalesce(1).write.format("btr")
          .mode(if (a == 0) "overwrite" else "append").save(p)
      }
      val all = parts.flatten
      val preds = Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
        ("v < 100", c => c < 100),
        ("v >= 150", c => c >= 150),
        ("v = 42", c => c === 42),
        ("v IS NULL", c => c.isNull),
        ("v IS NOT NULL", c => c.isNotNull),
        ("v < 60 OR v >= 180", c => c < 60 || c >= 180),
        ("v >= 0 AND v < 500", c => c >= 0 && c < 500),
        ("v <> 42", c => c =!= 42),
        ("v NOT IN (40, 41, 42)", c => !c.isin(40, 41, 42)),
        ("NOT (v < 120)", c => !(c < 120)))
      val (predSql, predCol) = preds(rnd.nextInt(preds.length))
      val before = spark.read.format("btr").load(p)
        .collect().map(_.toString).sorted.toSeq
      val accepted =
        try { spark.sql(s"DELETE FROM graft.`$p` WHERE $predSql"); true }
        catch { case _: Exception => false }
      val after = spark.read.format("btr").load(p)
        .collect().map(_.toString).sorted.toSeq
      if (accepted) {
        val expected = all.toDF("v", "s")
          .filter(!coalesce(predCol(col("v")), lit(false)))
          .collect().map(_.toString).sorted.toSeq
        assert(after == expected, s"iter=$iter pred=$predSql accepted but wrong rows")
      } else {
        assert(after == before, s"iter=$iter pred=$predSql refused but table changed")
      }
    }
  }

  test("fuzz: partitioned DELETE with mixed partition+data predicates") {
    // the holds(partition) × allMatch(data) interplay inside one
    // conjunction — the layer mix where a wrong verdict is data loss
    val rnd = new scala.util.Random(0xCAFE17)
    for (iter <- 0 until 6) {
      val p = tmp(s"pfuzz_$iter")
      val nKeys = 2 + rnd.nextInt(3)
      val rows = (0 until 200 + rnd.nextInt(200)).map { i =>
        (s"g${i % nKeys}", i.toLong, if (rnd.nextInt(12) == 0) None else Some(i % 50))
      }
      rows.toDF("k", "v", "w")
        .repartition(col("k")).write.format("btr").partitionBy("k")
        .mode("overwrite").save(p)
      val preds = Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column)](
        ("k = 'g0'", d => d("k") === "g0"),
        ("k <> 'g1'", d => d("k") =!= "g1"),
        ("k IN ('g0', 'g2')", d => d("k").isin("g0", "g2")),
        ("k = 'g0' AND v >= 0", d => d("k") === "g0" && d("v") >= 0),
        ("k = 'g1' AND w < 100", d => d("k") === "g1" && d("w") < 100),
        ("k = 'g0' OR k = 'g1'", d => d("k") === "g0" || d("k") === "g1"),
        ("k = 'g0' AND v = 7", d => d("k") === "g0" && d("v") === 7))
      val (predSql, predCol) = preds(rnd.nextInt(preds.length))
      val before = spark.read.format("btr").load(p)
        .select("k", "v", "w").collect().map(_.toString).sorted.toSeq
      val accepted =
        try { spark.sql(s"DELETE FROM graft.`$p` WHERE $predSql"); true }
        catch { case _: Exception => false }
      val after = spark.read.format("btr").load(p)
        .select("k", "v", "w").collect().map(_.toString).sorted.toSeq
      val df = rows.toDF("k", "v", "w")
      if (accepted) {
        val expected = df.filter(!coalesce(predCol(df), lit(false)))
          .select("k", "v", "w").collect().map(_.toString).sorted.toSeq
        assert(after == expected, s"iter=$iter pred=$predSql accepted but wrong rows")
      } else {
        assert(after == before, s"iter=$iter pred=$predSql refused but table changed")
      }
    }
  }

  test("SQL DELETE on a partition predicate drops whole directories") {
    val p = tmp("part_delete")
    (0 until 300).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE k = 'k1'")
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 200)
    assert(back.select("k").distinct().as[String].collect().sorted.toSeq == Seq("k0", "k2"))
    // the emptied directory is gone, not just empty
    assert(!new java.io.File(p, "k=k1").exists())
  }

  test("SQL DELETE with NOT / <> on a partition column stays metadata-only") {
    val p = tmp("part_not_delete")
    (0 until 300).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE k <> 'k1'")
    val back = spark.read.format("btr").load(p)
    assert(back.select("k").distinct().as[String].collect().toSeq == Seq("k1"))
    assert(back.count() == 100)
    spark.sql(s"DELETE FROM graft.`$p` WHERE k NOT IN ('nope')")
    assert(spark.read.format("btr").load(p).count() == 0)
  }

  test("SQL DELETE on a data predicate aligned with file stats") {
    val p = tmp("data_delete")
    // two appends → two files with disjoint v ranges, so `v < 100`
    // all-matches one file and none-matches the other
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(p)
    (100 until 200).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 100")
    val left = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(left.toSeq == (100L until 200L))
  }

  test("retention DELETE on a date-partitioned table") {
    val p = tmp("date_retention")
    val days = (0 until 10).flatMap { d =>
      (0 until 20).map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(d)), d * 100L + i))
    }
    days.toDF("dt", "v")
      .write.format("btr").partitionBy("dt").mode("overwrite").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE dt < DATE '2026-01-05'")
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 120) // 6 of 10 days survive
    assert(back.agg(min($"dt")).collect()(0).getDate(0).toString == "2026-01-05")
    assert(!new java.io.File(p, "dt=2026-01-01").exists())
  }

  test("DELETE that splits a file rewrites it row-level (copy-on-write)") {
    val p = tmp("split_rewrite")
    (0 until 200).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 100")
    val left = spark.read.format("btr").load(p).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(left.toSeq == (100 until 200).map(i => (i.toLong, s"r$i")))
    // no staging leftovers, no journal left pending
    val names = new java.io.File(p).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_rl_")), names.mkString(","))
    assert(!names.exists(_.startsWith("_btr_swap_")), names.mkString(","))
  }

  test("row-level DELETE rewrites ONLY the files the predicate touches") {
    val p = tmp("split_partial")
    // two single-file appends with disjoint ranges; the predicate splits
    // only the first file — the second must survive byte-identical
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(p)
    (100 until 200).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p)
    def dataFiles() = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".btr") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    val before = dataFiles().map(f => f.getName -> f.length()).toMap
    assert(before.size == 2)
    // v in [100,200) file: MatchNone -> untouched; v in [0,100) file: split
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 50")
    val after = dataFiles().map(f => f.getName -> f.length()).toMap
    val kept = before.keySet.intersect(after.keySet)
    assert(kept.size == 1, s"expected exactly one untouched file, got $kept")
    assert(before(kept.head) == after(kept.head), "untouched file changed size")
    val left = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(left.toSeq == (50L until 200L))
  }

  test("DELETE TRUE empties the table but keeps it readable") {
    val p = tmp("delete_all")
    (0 until 50).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .write.format("btr").mode("overwrite").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v >= 0")
    assert(spark.read.format("btr").load(p).count() == 0)
  }

  test("dynamic partition overwrite replaces only the partitions written") {
    val p = tmp("dyn_overwrite")
    (0 until 300).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    Seq(("k1", 9999L)).toDF("k", "v").writeTo(s"graft.`$p`").overwritePartitions()
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 201) // k0 + k2 intact (100 each), k1 replaced by 1 row
    assert(back.filter($"k" === "k1").select("v").as[Long].collect().toSeq == Seq(9999L))
    assert(back.filter($"k" === "k0").count() == 100)
  }

  test("INSERT OVERWRITE with a static PARTITION spec replaces exactly that partition") {
    val p = tmp("insert_static")
    (0 until 300).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    spark.sql(s"INSERT OVERWRITE graft.`$p` PARTITION (k = 'k0') VALUES (7777)")
    val back = spark.table(s"graft.`$p`")
    assert(back.count() == 201)
    assert(back.filter($"k" === "k0").select("v").as[Long].collect().toSeq == Seq(7777L))
    assert(back.filter($"k" === "k2").count() == 100)
  }

  test("CTAS + INSERT INTO + DROP through the catalog") {
    val p = tmp("ctas")
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    spark.sql(s"CREATE TABLE graft.`$p` AS SELECT id AS v FROM range(10)")
    spark.sql(s"INSERT INTO graft.`$p` VALUES (100)")
    assert(spark.table(s"graft.`$p`").count() == 11)
    spark.sql(s"DROP TABLE graft.`$p`")
    assert(!new java.io.File(p).exists())
  }

  test("TRUNCATE TABLE empties through the catalog") {
    val p = tmp("truncate_sql")
    (0 until 40).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .write.format("btr").mode("overwrite").save(p)
    spark.sql(s"TRUNCATE TABLE graft.`$p`")
    assert(spark.table(s"graft.`$p`").count() == 0)
  }

  test("ALTER TABLE RENAME moves the table directory") {
    val src = tmp("ren_src")
    val dst = tmp("ren_dst")
    new scala.reflect.io.Directory(new java.io.File(dst)).deleteRecursively()
    (0 until 20).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .write.format("btr").mode("overwrite").save(src)
    spark.sql(s"ALTER TABLE graft.`$src` RENAME TO graft.`$dst`")
    assert(!new java.io.File(src).exists())
    assert(spark.table(s"graft.`$dst`").count() == 20)
  }

  test("static overwrite still truncates the whole table") {
    val p = tmp("static_overwrite")
    (0 until 300).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    Seq(("k1", 1L)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    assert(spark.read.format("btr").load(p).count() == 1)
  }

  test("overwrite-by-filter commit deletes exactly the matching partitions") {
    val p = tmp("by_filter")
    (0 until 300).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    // drive the builder contract directly (the SQL surface needs a
    // catalog): overwrite(k = 'k2') with an empty insert == delete k2
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val b = new BtrWriteBuilder(p,
      spark.read.format("btr").load(p).schema,
      CaseInsensitiveStringMap.empty(), Seq("k"))
    val batch = b.overwrite(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("k", "k2")))
      .asInstanceOf[BtrWriteBuilder].build().toBatch
    batch.commit(Array.empty)
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 200)
    assert(!back.select("k").as[String].collect().contains("k2"))
  }

  test("overwrite-by-filter refuses a condition that splits files") {
    val p = tmp("by_filter_refused")
    (0 until 200).map(i => (s"k${i % 2}", i.toLong)).toDF("k", "v")
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val b = new BtrWriteBuilder(p,
      spark.read.format("btr").load(p).schema,
      CaseInsensitiveStringMap.empty(), Seq("k"))
    val e = intercept[IllegalArgumentException] {
      // v % 2 has full-range stats in every file — never file-aligned
      b.overwrite(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("v", 7L)))
        .asInstanceOf[BtrWriteBuilder].build().toBatch
    }
    assert(e.getMessage.contains("file boundaries"))
    assert(spark.read.format("btr").load(p).count() == 200)
  }
}
