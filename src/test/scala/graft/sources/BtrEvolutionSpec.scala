package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution: appends may add new columns at the END; the table
  * meta widens and files written before the widening read the added
  * columns as all-null. Pruning, aggregate pushdown, inspection and
  * compaction all stay correct across the mixed file generations.
  */
class BtrEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-evolution-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(name: String) = s"/tmp/btr-evolution-spec/$name"

  private def survivingGroups(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions.collect { case p: BtrInputPartition => p }.map(_.groups.length).sum

  private def writeEvolved(dir: String): Unit = {
    (1 to 100).map(i => (i.toLong, s"old-$i")).toDF("id", "s")
      .coalesce(1).write.format("btr").option("btr.blockSize", "32")
      .mode("overwrite").save(dir)
    (101 to 160).map(i => (i.toLong, s"new-$i", i * 10)).toDF("id", "s", "extra")
      .coalesce(1).write.format("btr").option("btr.blockSize", "32")
      .mode("append").save(dir)
  }

  test("appending new trailing columns widens the table; old files read them as null") {
    writeEvolved(tmp("widen"))
    val back = spark.read.format("btr").load(tmp("widen"))
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "extra"))
    assert(back.count() == 160)
    assert(back.filter($"extra".isNull).count() == 100)
    val news = back.filter($"extra".isNotNull)
      .select($"id", $"extra").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(news.size == 60 && news(101L) == 1010 && news(160L) == 1600)
  }

  test("filters on the added column prune pre-widening row groups at planning") {
    writeEvolved(tmp("prune"))
    val back = spark.read.format("btr").load(tmp("prune"))
    val allGroups = survivingGroups(back.filter($"id".isNotNull))
    // IsNotNull(extra): every old group is provably all-null → skipped
    val notNull = back.filter($"extra".isNotNull)
    assert(notNull.count() == 60)
    assert(survivingGroups(notNull) < allGroups, "old groups must be pruned")
    // equality on the added column also proves old groups can't match
    val eq = back.filter($"extra" === 1010)
    assert(eq.count() == 1)
    assert(survivingGroups(eq) <= 2, s"expected near-total pruning, got ${survivingGroups(eq)}")
    // IsNull matches every old row — nothing lost
    assert(back.filter($"extra".isNull).count() == 100)
  }

  test("metadata-only aggregates stay exact across mixed file generations") {
    writeEvolved(tmp("aggs"))
    val back = spark.read.format("btr").load(tmp("aggs"))
    val row = back.agg(
      count(lit(1)).as("n"), count($"extra").as("n_extra"),
      min($"extra").as("mn"), max($"extra").as("mx"),
      count($"s").as("n_s")).head
    assert(row.getLong(0) == 160 && row.getLong(1) == 60)
    assert(row.getInt(2) == 1010 && row.getInt(3) == 1600)
    assert(row.getLong(4) == 160)
  }

  test("describe reports only what each file stores; compaction keeps generations apart") {
    writeEvolved(tmp("compact"))
    val desc = graft.functions.BtrInspect.describe(spark, tmp("compact"))
    val byFile = desc.groupBy("file").agg(countDistinct("column").as("cols"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile.values.toSet == Set(2L, 3L), byFile.toString)

    val (b, a) = BtrCompact.compact(spark, tmp("compact"), targetBytes = 1L << 30)
    assert(b == 2 && a == 2, s"different column counts must not merge: $b -> $a")
    // add more files per generation so compaction has something to merge
    (161 to 170).map(i => (i.toLong, s"new-$i", i * 10)).toDF("id", "s", "extra")
      .coalesce(1).write.format("btr").option("btr.blockSize", "32")
      .mode("append").save(tmp("compact"))
    val (b2, a2) = BtrCompact.compact(spark, tmp("compact"), targetBytes = 1L << 30)
    assert(b2 == 3 && a2 == 2, s"same-generation files merge: $b2 -> $a2")
    val back = spark.read.format("btr").load(tmp("compact"))
    assert(back.count() == 170)
    assert(back.filter($"extra".isNull).count() == 100)
    assert(back.filter($"extra".isNotNull).count() == 70)
  }

  test("a running stream keeps its start-time schema across a widening append") {
    val dir = tmp("stream")
    val ckpt = tmp("stream-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    (1 to 10).map(i => (i.toLong, s"old-$i")).toDF("id", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(dir)
    val q = spark.readStream.format("btr").load(dir)
      .writeStream.format("memory").queryName("evo_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("evo_stream").count() == 10)
      // widening append mid-stream: the stream's 2-column projection maps
      // onto the new 3-column files' PREFIX positionally — safe by the
      // append-prefix invariant; the new column simply isn't projected
      (11 to 15).map(i => (i.toLong, s"new-$i", i * 10)).toDF("id", "s", "extra")
        .coalesce(1).write.format("btr").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table("evo_stream").select("id", "s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size == 15 && got(15L) == "new-15" && got(3L) == "old-3")
    } finally q.stop()
    // a NEW stream sees the widened schema, old rows null-filled
    val q2 = spark.readStream.format("btr").load(dir)
      .writeStream.format("memory").queryName("evo_stream2").start()
    try {
      q2.processAllAvailable()
      val t2 = spark.table("evo_stream2")
      assert(t2.schema.fieldNames.toSeq == Seq("id", "s", "extra"))
      assert(t2.filter(col("extra").isNull).count() == 10)
      assert(t2.filter(col("extra").isNotNull).count() == 5)
    } finally q2.stop()
  }

  test("widened() never narrows a meta that grew past the writer's schema") {
    import org.apache.spark.sql.types._
    writeEvolved(tmp("narrow")) // meta is [id, s, extra]
    val fs = new org.apache.hadoop.fs.Path(tmp("narrow"))
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    // a writer validated against the pre-widening [id, s] table commits
    // AFTER a concurrent widening: the recorded schema must keep `extra`
    val narrow = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val recorded = BtrWriteSchemas.widened(fs, new org.apache.hadoop.fs.Path(tmp("narrow")), narrow)
    assert(recorded.fieldNames.toSeq == Seq("id", "s", "extra"), recorded.treeString)
    assert(recorded("extra").nullable, "retained trailing columns stay nullable")
  }

  test("incompatible appends still fail loudly") {
    writeEvolved(tmp("reject"))
    // reordered columns
    val e1 = intercept[Exception] {
      Seq((1L, 5, "x")).toDF("id", "extra", "s")
        .write.format("btr").mode("append").save(tmp("reject"))
    }
    assert(e1.getMessage.contains("append schema"), e1.getMessage)
    // dropping an existing column
    val e2 = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "s")
        .write.format("btr").mode("append").save(tmp("reject"))
    }
    assert(e2.getMessage.contains("append schema"), e2.getMessage)
    // retyping an existing column
    val e3 = intercept[Exception] {
      Seq((1, "x", 5)).toDF("id", "s", "extra")
        .write.format("btr").mode("append").save(tmp("reject"))
    }
    assert(e3.getMessage.contains("append schema"), e3.getMessage)
  }
}
