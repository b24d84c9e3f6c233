package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL partition management over the hive-style layout: SHOW PARTITIONS
  * (full and partial spec), ALTER TABLE ... DROP PARTITION as a
  * metadata-level delete, TRUNCATE ... PARTITION, and the typed partition
  * identifiers (string/int/timestamp) round-tripping through directory
  * names.
  */
class BtrPartitionMgmtSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-partition-mgmt-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)

  private def tmp(name: String) = s"/tmp/btr-partmgmt/$name"

  private def freshTable(name: String, keys: Seq[String]): String = {
    val p = tmp(name)
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    keys.zipWithIndex.flatMap { case (k, i) => (0 until 20).map(j => (k, (i * 100 + j).toLong)) }
      .toDF("k", "v")
      .repartition(2)
      .write.format("btr").partitionBy("k").mode("overwrite").save(p)
    p
  }

  test("SHOW PARTITIONS lists every hive directory") {
    val p = freshTable("show", Seq("a", "b", "c"))
    val rows = spark.sql(s"SHOW PARTITIONS graft.`$p`").as[String].collect().sorted
    assert(rows.toSeq == Seq("k=a", "k=b", "k=c"))
  }

  test("SHOW PARTITIONS with a partial spec filters on the given column") {
    val p = tmp("show_partial")
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    Seq(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 3L), ("b", 3, 4L))
      .toDF("k", "d", "v")
      .write.format("btr").partitionBy("k", "d").mode("overwrite").save(p)
    val all = spark.sql(s"SHOW PARTITIONS graft.`$p`").as[String].collect().sorted
    assert(all.toSeq == Seq("k=a/d=1", "k=a/d=2", "k=b/d=1", "k=b/d=3"))
    val justA = spark.sql(s"SHOW PARTITIONS graft.`$p` PARTITION (k = 'a')")
      .as[String].collect().sorted
    assert(justA.toSeq == Seq("k=a/d=1", "k=a/d=2"))
    val justD1 = spark.sql(s"SHOW PARTITIONS graft.`$p` PARTITION (d = 1)")
      .as[String].collect().sorted
    assert(justD1.toSeq == Seq("k=a/d=1", "k=b/d=1"))
  }

  test("ALTER TABLE DROP PARTITION removes exactly that directory's rows and files") {
    val p = freshTable("drop", Seq("a", "b", "c"))
    spark.sql(s"ALTER TABLE graft.`$p` DROP PARTITION (k = 'b')")
    val back = spark.table(s"graft.`$p`")
    assert(back.count() == 40)
    assert(back.filter($"k" === "b").count() == 0)
    assert(spark.sql(s"SHOW PARTITIONS graft.`$p`").as[String].collect().sorted.toSeq
      == Seq("k=a", "k=c"))
    // the directory holds no visible data files anymore
    val dirFiles = Option(new java.io.File(s"$p/k=b").listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".btr"))
    assert(dirFiles.isEmpty, dirFiles.mkString(","))
  }

  test("DROP PARTITION IF EXISTS on a missing partition is a no-op; without it, it errors") {
    val p = freshTable("drop_missing", Seq("a"))
    spark.sql(s"ALTER TABLE graft.`$p` DROP IF EXISTS PARTITION (k = 'zzz')")
    assert(spark.table(s"graft.`$p`").count() == 20)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` DROP PARTITION (k = 'zzz')")
    }
    assert(e.getMessage.toLowerCase.contains("partition"), e.getMessage)
  }

  test("TRUNCATE TABLE ... PARTITION empties one partition, keeps the rest") {
    val p = freshTable("trunc", Seq("a", "b"))
    spark.sql(s"TRUNCATE TABLE graft.`$p` PARTITION (k = 'a')")
    val back = spark.table(s"graft.`$p`")
    assert(back.count() == 20)
    assert(back.filter($"k" === "a").count() == 0)
  }

  test("integer and timestamp partition identifiers round-trip through SHOW/DROP") {
    val p = tmp("typed")
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    Seq((1, "2024-05-01 10:00:00", 1L), (2, "2024-05-01 11:00:00", 2L),
      (1, "2024-05-01 10:00:00", 3L))
      .toDF("bucket", "ts_s", "v")
      .withColumn("ts_hour", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.format("btr").partitionBy("bucket", "ts_hour").mode("overwrite").save(p)
    assert(spark.sql(s"SHOW PARTITIONS graft.`$p`").count() == 2)
    spark.sql(
      s"ALTER TABLE graft.`$p` DROP PARTITION (bucket = 1, ts_hour = '2024-05-01 10:00:00')")
    val back = spark.table(s"graft.`$p`")
    assert(back.select("v").as[Long].collect().toSeq == Seq(2L))
    assert(spark.sql(s"SHOW PARTITIONS graft.`$p`").count() == 1)
  }

  test("ADD PARTITION refuses loudly (partitions materialize on write)") {
    val p = freshTable("add", Seq("a"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ADD PARTITION (k = 'new')")
    }
    assert(e.getMessage.contains("materialize on first write"), e.getMessage)
  }

  test("RENAME PARTITION moves the directory; rows re-read under the new value") {
    val p = freshTable("rename", Seq("a", "b"))
    val filesBefore = Option(new java.io.File(s"$p/k=a").listFiles())
      .getOrElse(Array.empty[java.io.File]).map(f => f.getName -> f.length).sortBy(_._1).toSeq
    spark.sql(s"ALTER TABLE graft.`$p` PARTITION (k = 'a') RENAME TO PARTITION (k = 'z')")
    val back = spark.table(s"graft.`$p`")
    assert(back.count() == 40)
    assert(back.filter($"k" === "a").count() == 0)
    assert(back.filter($"k" === "z").count() == 20)
    // pure directory move: same file names and bytes under the new dir
    val filesAfter = Option(new java.io.File(s"$p/k=z").listFiles())
      .getOrElse(Array.empty[java.io.File]).map(f => f.getName -> f.length).sortBy(_._1).toSeq
    assert(filesAfter == filesBefore, s"$filesAfter vs $filesBefore")
    // renaming onto an existing non-empty partition refuses
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` PARTITION (k = 'z') RENAME TO PARTITION (k = 'b')")
    }
    assert(e.getMessage.toLowerCase.contains("already exist"), e.getMessage)
  }

  test("fuzz: random drop/rename/truncate sequences match an in-memory model") {
    val rnd = new scala.util.Random(4711)
    for (round <- 0 until 3) {
      val p = tmp(s"fuzz_$round")
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
      val nKeys = 3 + rnd.nextInt(3)
      var model: Map[String, Seq[Long]] =
        (0 until nKeys).map(i => s"p$i" -> (0 until 5 + rnd.nextInt(10))
          .map(j => (i * 1000 + j).toLong)).toMap
      model.toSeq.flatMap { case (k, vs) => vs.map((k, _)) }
        .toDF("k", "v")
        .write.format("btr").partitionBy("k").mode("overwrite").save(p)
      for (_ <- 0 until 8 if model.nonEmpty) {
        val keys = model.keys.toSeq.sorted
        val k = keys(rnd.nextInt(keys.size))
        rnd.nextInt(3) match {
          case 0 =>
            spark.sql(s"ALTER TABLE graft.`$p` DROP PARTITION (k = '$k')")
            model -= k
          case 1 =>
            val nk = s"r${rnd.nextInt(1000)}"
            if (!model.contains(nk)) {
              spark.sql(
                s"ALTER TABLE graft.`$p` PARTITION (k = '$k') RENAME TO PARTITION (k = '$nk')")
              model = model - k + (nk -> model(k))
            }
          case 2 =>
            spark.sql(s"TRUNCATE TABLE graft.`$p` PARTITION (k = '$k')")
            model -= k
        }
        val got = spark.table(s"graft.`$p`").select("k", "v").as[(String, Long)]
          .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
        assert(got == model.view.mapValues(_.sorted).toMap, s"table $p diverged from model")
        val shown = spark.sql(s"SHOW PARTITIONS graft.`$p`").as[String].collect().sorted.toSeq
        assert(shown == model.keys.toSeq.sorted.map(k => s"k=$k"), s"SHOW PARTITIONS diverged")
      }
    }
  }
}
