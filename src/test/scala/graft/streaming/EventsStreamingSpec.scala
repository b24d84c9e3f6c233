package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must equal the batch equivalents over the same data
  * (memory sink + processAllAvailable drives the file stream to the end).
  */
class EventsStreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // file streams read directories; stage the single events.parquet as a
  // 4-file directory so processAllAvailable sees multiple micro-batches.
  // Re-staged every JVM run: the driver regenerates testdata between
  // rounds, so a presence check would serve stale rows (and schemas)
  private lazy val dir: String = {
    val out = "/tmp/events-stream-src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(out)
    out
  }

  test("btr works as a streaming sink (append per epoch, readable after)") {
    val out = "/tmp/btr-stream-sink"
    val ckpt = "/tmp/btr-stream-ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val q = stream.writeStream
      .format("btr")
      .option("checkpointLocation", ckpt)
      .start(out)
    try q.processAllAvailable()
    finally q.stop()
    val back = spark.read.format("btr").load(out)
    val batch = spark.read.parquet(dir)
    assert(back.count() == batch.count())
    assert(back.agg(round(sum("value"), 2)).head.getDouble(0) ==
      batch.agg(round(sum("value"), 2)).head.getDouble(0))
    // multiple epochs → multiple files appended
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".btr"))
    assert(files >= 2, s"expected multiple epoch files, got $files")
  }

  test("btr works as a streaming source (micro-batches pick up appended files)") {
    import spark.implicits._
    val src = "/tmp/btr-stream-source"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .coalesce(1).write.format("btr").mode("overwrite").save(src)
    val stream = spark.readStream.format("btr").load(src)
    val q = stream.writeStream.format("memory").queryName("btr_src_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("btr_src_out").count() == 2)
      // appended files are picked up by later micro-batches
      Seq((3L, "c")).toDF("id", "tag")
        .coalesce(1).write.format("btr").mode("append").save(src)
      q.processAllAvailable()
      assert(spark.table("btr_src_out").count() == 3)
      assert(spark.table("btr_src_out").select("id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming source: file sorting BEFORE existing ones is read exactly once") {
    import spark.implicits._
    val src = "/tmp/btr-stream-source-order"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .coalesce(1).write.format("btr").mode("overwrite").save(src)
    // force the initial data file to sort LAST, so the appended batch file
    // (part-00000-…) inserts BEFORE it in the listing — the case where a
    // positional (file-count) offset re-emits old rows and drops new ones
    val d = new java.io.File(src)
    val initial = d.listFiles().filter(_.getName.endsWith(".btr")).head
    assert(initial.renameTo(new java.io.File(d, "zz-initial.btr")))
    val stream = spark.readStream.format("btr").load(src)
    val q = stream.writeStream.format("memory").queryName("btr_src_order").start()
    try {
      q.processAllAvailable()
      assert(spark.table("btr_src_order").count() == 2)
      Seq((3L, "c")).toDF("id", "tag")
        .coalesce(1).write.format("btr").mode("append").save(src)
      val appended = d.listFiles().map(_.getName).filter(_.endsWith(".btr")).sorted
      assert(appended.last == "zz-initial.btr", s"precondition: new file must sort first, got ${appended.mkString(",")}")
      q.processAllAvailable()
      // exactly the new row — no duplicates of 1/2, no loss of 3
      assert(spark.table("btr_src_order").select("id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("windowed streaming agg equals batch agg") {
    val stream = EventsStreaming.readEventStream(spark, dir)
    val q = EventsStreaming.hourlyCounts(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      // Append mode only emits finalized windows; re-run in Complete mode
      // for the full comparison
    } finally q.stop()

    val q2 = EventsStreaming.hourlyCounts(EventsStreaming.readEventStream(spark, dir))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hourly_full").start()
    try q2.processAllAvailable()
    finally q2.stop()

    val streamed = spark.table("hourly_full")
      .orderBy("hour_s", "event_type").collect().map(_.toString)
    val batch = spark.read.parquet(dir)
      .withColumn("ts_t", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_s"),
        col("event_type"), col("n"), col("sum_v"))
      .orderBy("hour_s", "event_type").collect().map(_.toString)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streamed=${streamed.length} batch=${batch.length}")
  }

  // time-ordered staging: four files covering ascending ts quartiles,
  // written sequentially so the file stream admits them in event-time
  // order (a random file order would put most rows behind the watermark —
  // realistic for replays, but the sessionization tests want the
  // steady-state ingest shape where the watermark trails arrivals)
  private lazy val dirOrdered: String = {
    val out = "/tmp/events-stream-src-ordered"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("__us", unix_micros(col("ts").cast("timestamp")))
    val qs = df.stat.approxQuantile("__us", Array(0.25, 0.5, 0.75), 0.001)
    val bounds = (Seq(Long.MinValue) ++ qs.map(_.toLong) :+ Long.MaxValue).sliding(2).toSeq
    new java.io.File(out).mkdirs()
    bounds.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      df.filter(col("__us") >= lo && col("__us") < hi).drop("__us").coalesce(1)
        .write.mode("append").parquet(out)
      Thread.sleep(1100) // distinct mtimes pin the admission order
    }
    out
  }

  test("streaming session_window equals batch sessionization") {
    val gap = "30 minutes"
    val q = EventsStreaming.userSessions(EventsStreaming.readEventStream(spark, dirOrdered), gap)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("sessions_out").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("sessions_out")
      .orderBy("user_id", "session_start").collect().map(_.toString)
    val batch = spark.read.parquet(dirOrdered)
      .withColumn("ts_t", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts_t"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_v"))
      .orderBy("user_id", "session_start").collect().map(_.toString)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streamed=${streamed.length} batch=${batch.length}")
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState emits every closed session exactly once") {
    val gapUs = 30L * 60 * 1000000
    val q = EventsStreaming.closedSessions(
        spark, EventsStreaming.readEventStream(spark, dirOrdered), gapUs)
      .toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("closed_sessions_out").start()
    try q.processAllAvailable()
    finally q.stop()

    // batch truth: every session whose close the final watermark passed.
    // The stream's last watermark = max event time - 1 hour, so compare
    // only sessions closed strictly before it (later ones may be open).
    val batch = spark.read.parquet(dirOrdered)
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .groupBy(col("user_id"),
        session_window(timestamp_micros(col("ts_us")), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
    val maxTs = spark.read.parquet(dirOrdered)
      .agg(max(unix_micros(col("ts").cast("timestamp")))).head.getLong(0)
    val horizonUs = maxTs - 3600L * 1000000
    // 2 ms guard band: the operator seals sessions on millisecond-floored
    // watermark comparisons, the oracle filter works in microseconds
    val expected = batch
      .filter(col("end_us") + gapUs < horizonUs - 2000)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
        round(col("sum_v"), 2).as("sum_v"))
      .collect().map(_.toString).sorted
    val got = spark.table("closed_sessions_out")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
        round(col("sum_v"), 2).as("sum_v"))
      .filter(col("end_us") + gapUs < horizonUs - 2000)
      .collect().map(_.toString).sorted
    assert(got.length == got.distinct.length, "no session may emit twice")
    assert(expected.sameElements(got),
      s"closed sessions: expected ${expected.length}, got ${got.length}")
  }

  test("streaming sink appends into a partitioned table (epoch files per partition dir)") {
    import spark.implicits._
    val out = "/tmp/btr-stream-part-sink"
    val srcDir = "/tmp/btr-stream-part-src"
    val ckpt = "/tmp/btr-stream-part-ckpt"
    Seq(out, srcDir, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    // existing partitioned table (batch-created layout)
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .write.format("btr").partitionBy("k").mode("overwrite").save(out)
    // stream with the same schema appends into the same layout
    Seq((3L, "a"), (4L, "b"), (5L, "a")).toDF("id", "k")
      .repartition(2).write.parquet(srcDir)
    val q = spark.readStream.schema("id LONG, k STRING").parquet(srcDir)
      .writeStream.format("btr").option("checkpointLocation", ckpt).start(out)
    try q.processAllAvailable()
    finally q.stop()
    val back = spark.read.format("btr").load(out)
    assert(back.count() == 5)
    assert(back.filter(col("k") === "a").select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 5L))
    // epoch files landed inside the hive dirs
    val aFiles = new java.io.File(s"$out/k=a").listFiles().map(_.getName).filter(_.endsWith(".btr"))
    assert(aFiles.exists(_.startsWith("part-e")), aFiles.mkString(","))
  }

  test("streaming epochs get the write layout: one epoch file per partition") {
    import spark.implicits._
    val out = "/tmp/btr-stream-layout-sink"
    val srcDir = "/tmp/btr-stream-layout-src"
    val ckpt = "/tmp/btr-stream-layout-ckpt"
    Seq(out, srcDir, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Seq((0L, "p0"), (1L, "p1"), (2L, "p2")).toDF("id", "k")
      .write.format("btr").partitionBy("k").mode("overwrite").save(out)
    // 3 partition values interleaved across 4 source tasks: without the
    // required clustered distribution the epoch would write up to 4
    // files per partition value (one per task)
    (10 until 3010).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "k")
      .repartition(4).write.parquet(srcDir)
    val q = spark.readStream.schema("id LONG, k STRING").parquet(srcDir)
      .writeStream.format("btr").option("checkpointLocation", ckpt).start(out)
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.read.format("btr").load(out).count() == 3003)
    (0 until 3).foreach { p =>
      val epochFiles = new java.io.File(s"$out/k=p$p").listFiles()
        .map(_.getName).filter(n => n.endsWith(".btr") && n.startsWith("part-e"))
      assert(epochFiles.length == 1,
        s"k=p$p: expected one epoch file, got ${epochFiles.mkString(",")}")
    }
  }

  test("streaming sink auto-compaction bounds small-file growth, rows stay exact") {
    import spark.implicits._
    val src = "/tmp/btr-stream-autocompact-src"
    val out = "/tmp/btr-stream-autocompact"
    val ckpt = "/tmp/btr-stream-autocompact-ckpt"
    Seq(src, out, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    (1 to 12).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "tag").coalesce(1).write.mode("append").parquet(src)
    }
    val q = spark.readStream.schema("id LONG, tag STRING")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.format("btr")
      .option("checkpointLocation", ckpt)
      .option("btr.autoCompact.minFiles", "4")
      .option("btr.autoCompact.targetBytes", String.valueOf(8L * 1024 * 1024))
      .start(out)
    try q.processAllAvailable()
    finally q.stop()
    val back = spark.read.format("btr").load(out)
    assert(back.count() == 12)
    assert(back.agg(sum("id")).head.getLong(0) == 78L)
    val names = new java.io.File(out).listFiles().map(_.getName).filter(_.endsWith(".btr"))
    assert(names.length < 12, s"expected auto-compacted file count < 12, got ${names.toSeq}")
    assert(names.exists(_.startsWith("part-compact-")), names.mkString(","))
    // the retry-hazard window (last two epochs) was never merged
    assert(names.exists(_.startsWith("part-e")), names.mkString(","))
  }

  test("streaming source admission control: maxFilesPerTrigger bounds each batch") {
    import spark.implicits._
    val src = "/tmp/btr-stream-admission"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "tag")
        .coalesce(1).write.format("btr").mode(if (i == 1) "overwrite" else "append").save(src)
    }
    val stream = spark.readStream.format("btr")
      .option("btr.maxFilesPerTrigger", "1").load(src)
    val q = stream.writeStream.format("memory").queryName("btr_admission").start()
    try {
      q.processAllAvailable()
      assert(spark.table("btr_admission").count() == 4)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected >=4 bounded batches, got $batches")
      // offsets are tiny batch ids (the file sets live in the side log),
      // not the whole seen-set serialized per batch
      val endOffsets = q.recentProgress.flatMap(p => p.sources.map(_.endOffset)).filter(_ != null)
      assert(endOffsets.nonEmpty && endOffsets.forall(_.length < 16),
        s"expected small batch-id offsets, got ${endOffsets.maxBy(_.length)}")
    } finally q.stop()
  }

  test("streaming source recovers from its checkpoint without duplicates or loss") {
    import spark.implicits._
    val src = "/tmp/btr-stream-recover-src"
    val out = "/tmp/btr-stream-recover-out"
    val ckpt = "/tmp/btr-stream-recover-ckpt"
    Seq(src, out, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .repartition(2).write.format("btr").mode("overwrite").save(src)
    def run(): Unit = {
      val q = spark.readStream.format("btr").load(src)
        .writeStream.format("btr").option("checkpointLocation", ckpt).start(out)
      try q.processAllAvailable()
      finally q.stop()
    }
    run()
    assert(spark.read.format("btr").load(out).count() == 2)
    // second run from the SAME checkpoint sees only the appended file
    Seq((3L, "c")).toDF("id", "tag").coalesce(1)
      .write.format("btr").mode("append").save(src)
    run()
    assert(spark.read.format("btr").load(out)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // third run with nothing new appends nothing
    run()
    assert(spark.read.format("btr").load(out).count() == 3)
  }

  test("stream stays exactly-once across a compaction between polls") {
    import spark.implicits._
    val src = "/tmp/btr-stream-compact-src"
    val out = "/tmp/btr-stream-compact-out"
    val ckpt = "/tmp/btr-stream-compact-ckpt"
    Seq(src, out, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    (1 to 3).foreach { i =>
      Seq((i * 2 - 1L, s"a$i"), (i * 2L, s"b$i")).toDF("id", "tag")
        .coalesce(1).write.format("btr").mode(if (i == 1) "overwrite" else "append").save(src)
    }
    def run(): Unit = {
      val q = spark.readStream.format("btr").load(src)
        .writeStream.format("btr").option("checkpointLocation", ckpt).start(out)
      try q.processAllAvailable()
      finally q.stop()
    }
    run()
    assert(spark.read.format("btr").load(out).count() == 6)
    // compact between polls: 3 files merge into 1; the done-marker maps
    // the emitted sources to the merged file
    val (b, a) = graft.sources.BtrCompact.compact(spark, src, 1L << 30)
    assert(b == 3 && a == 1, s"compacted $b -> $a")
    // next run derives the merged file as already-seen: nothing re-emits
    run()
    assert(spark.read.format("btr").load(out).count() == 6, "compacted rows re-emitted")
    // appended data still flows, exactly once
    Seq((7L, "c"), (8L, "d")).toDF("id", "tag")
      .coalesce(1).write.format("btr").mode("append").save(src)
    run()
    val ids = spark.read.format("btr").load(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 8L), s"got $ids")
    // the derivation was persisted as a seen-only .x entry (recovery must
    // not depend on the vacuumable done-marker)
    val logFiles = new java.io.File(s"$ckpt/sources/0/btr-file-log")
      .listFiles().map(_.getName).filterNot(_.startsWith("."))
    assert(logFiles.exists(n => n.endsWith(".x") || n.endsWith(".snap")),
      s"no seen-only entry persisted: ${logFiles.toSeq.sorted}")
    // even after the marker is vacuumed, a fresh run stays exactly-once
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    graft.format.BtrTableMeta.vacuumSwapMarkers(fs, new org.apache.hadoop.fs.Path(src), 0L)
    run()
    assert(spark.read.format("btr").load(out).count() == 8)
  }

  test("seen-marker written at a snapshot's own id survives a seen-set rebuild") {
    // the collision the full-stream path produces only under specific
    // commit timing, constructed directly: the log holds a snapshot at id
    // K AND a seen-only K.x (a compaction derivation recorded AFTER the
    // fold, at startId == K). The rebuild must union K.x — a strict
    // id > snapshot filter would drop it and re-admit the file it marks.
    import spark.implicits._
    val src = "/tmp/btr-stream-snapx-src"
    val ckpt = "/tmp/btr-stream-snapx-ckpt"
    Seq(src, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .coalesce(1).write.format("btr").mode("overwrite").save(src)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val dataFile = graft.format.BtrTableMeta
      .listDataFilesWithPartitions(fs, new org.apache.hadoop.fs.Path(src))
      .head.path.getName

    val logDir = new java.io.File(s"$ckpt/btr-file-log")
    logDir.mkdirs()
    // snapshot at id 9 (empty fold base) and the colliding seen-only 9.x
    // marking the table's one data file as already seen
    java.nio.file.Files.writeString(logDir.toPath.resolve("9.snap"), "[]")
    java.nio.file.Files.writeString(logDir.toPath.resolve("9.x"), s"""["$dataFile"]""")

    val table = spark.read.format("btr").load(src)
    assert(table.count() == 2)
    val stream = new graft.sources.BtrMicroBatchStream(
      src, table.schema, table.schema, Nil, None, ckpt)
    val next = stream.latestOffset(stream.deserializeOffset("9"),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(next == stream.deserializeOffset("9"),
      s"rebuild dropped the snapshot-id .x entry: file re-admitted ($next)")
  }

  test("compaction of partially-streamed files fails loudly, not silently") {
    import spark.implicits._
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val src = "/tmp/btr-stream-partial-src"
    val ckpt = "/tmp/btr-stream-partial-ckpt"
    Seq(src, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    (1 to 2).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "tag")
        .coalesce(1).write.format("btr").mode(if (i == 1) "overwrite" else "append").save(src)
    }
    val schema = spark.read.format("btr").load(src).schema
    // drive the source directly: admit ONE of the two files, then compact
    val s1 = new graft.sources.BtrMicroBatchStream(src, schema, schema, Nil, Some(1), ckpt)
    val o1 = s1.latestOffset(s1.initialOffset(), ReadLimit.maxFiles(1))
    assert(o1.json() == "0")
    val (b, a) = graft.sources.BtrCompact.compact(spark, src, 1L << 30)
    assert(b == 2 && a == 1)
    // the unemitted file's rows now live only inside the merged file that
    // also holds already-emitted rows — exactly-once is unrecoverable
    val boom = intercept[IllegalStateException] {
      s1.latestOffset(o1, ReadLimit.allAvailable())
    }
    assert(boom.getMessage.contains("partially emitted"), boom.getMessage)
  }

  test("file log folds committed batches into a snapshot; recovery reads it") {
    import spark.implicits._
    val src = "/tmp/btr-stream-snap-src"
    val out = "/tmp/btr-stream-snap-out"
    val ckpt = "/tmp/btr-stream-snap-ckpt"
    Seq(src, out, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    // > LogCompactInterval single-file appends, drained one per trigger
    val n = graft.sources.BtrMicroBatchStream.LogCompactInterval + 3
    (1 to n).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "tag")
        .coalesce(1).write.format("btr").mode(if (i == 1) "overwrite" else "append").save(src)
    }
    def run(): Unit = {
      val q = spark.readStream.format("btr").option("btr.maxFilesPerTrigger", "1").load(src)
        .writeStream.format("btr").option("checkpointLocation", ckpt).start(out)
      try q.processAllAvailable()
      finally q.stop()
    }
    run()
    assert(spark.read.format("btr").load(out).count() == n)
    // the log compacted: few loose entries + one snapshot, not O(batches)
    val logDir = new java.io.File(s"$ckpt/sources/0/btr-file-log")
    val logFiles = logDir.listFiles().map(_.getName).filterNot(_.startsWith("."))
    val snaps = logFiles.filter(_.endsWith(".snap"))
    val loose = logFiles.filterNot(_.endsWith(".snap"))
    assert(snaps.length == 1, s"expected one snapshot, got ${logFiles.toSeq.sorted}")
    assert(loose.length < graft.sources.BtrMicroBatchStream.LogCompactInterval,
      s"loose entries not folded: ${logFiles.toSeq.sorted}")
    // recovery rebuilds the seen-set FROM the snapshot: only the new file
    // is admitted, nothing re-emitted
    Seq((100L, "new")).toDF("id", "tag").coalesce(1)
      .write.format("btr").mode("append").save(src)
    run()
    val ids = spark.read.format("btr").load(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ((1 to n).map(_.toLong) :+ 100L), s"got $ids")
  }

  test("streaming dedup drops within-watermark duplicates") {
    // duplicate every event across two files: the deduped stream must
    // equal the distinct batch set
    val dupDir = "/tmp/events-stream-dup"
    if (!new java.io.File(s"$dupDir/_SUCCESS").exists()) {
      val base = spark.read.parquet(dir).limit(500)
      base.union(base).repartition(4).write.mode("overwrite").parquet(dupDir)
    }
    // horizon wider than the table's whole time span: files arrive in
    // arbitrary time order, so a short horizon would mark older events in
    // later files LATE and drop them before dedup (watermark semantics,
    // exercised here only for the dedup contract)
    val stream = EventsStreaming.dedupEvents(
      EventsStreaming.readEventStream(spark, dupDir), horizon = "36500 days")
    val q = stream.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("dedup_out").select("event_id").distinct().count()
    val gotTotal = spark.table("dedup_out").count()
    val expected = spark.read.parquet(dupDir).select("event_id").distinct().count()
    assert(gotTotal == expected, s"deduped stream rows $gotTotal vs distinct ids $expected")
    assert(got == expected)
  }

  test("stateful user totals accumulate across the stream") {
    val stream = EventsStreaming.readEventStream(spark, dir)
    val q = EventsStreaming.userTotals(spark, stream)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("user_totals").start()
    try q.processAllAvailable()
    finally q.stop()
    // last state per user must equal the batch totals
    val streamed = spark.sql(
      """SELECT user_id, max(n_events) n, round(max(total_value), 2) tot
        |FROM user_totals GROUP BY user_id""".stripMargin)
      .orderBy("user_id").collect().map(_.toString)
    val batch = spark.read.parquet(dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("tot"))
      .orderBy("user_id").collect().map(_.toString)
    assert(streamed.sameElements(batch))
  }
}
