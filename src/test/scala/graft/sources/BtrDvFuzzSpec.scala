package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized sequences of append / DV DELETE / metadata DELETE /
  * OPTIMIZE-rewrite / compact / RESTORE on a deletion-vector table,
  * checked against an in-memory multiset model after EVERY step: the
  * current read must equal the model exactly, versioned reads must equal
  * the recorded per-version model, and the change feed over the whole
  * history must be multiset-consistent with the endpoints.
  */
class BtrDvFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-dv-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def current(dir: String): Seq[Int] =
    spark.read.format("btr").load(dir).select("x").as[Int].collect().sorted.toSeq

  private def readAsOf(dir: String, v: Long): Seq[Int] =
    spark.read.format("btr").option("btr.versionAsOf", v.toString).load(dir)
      .select("x").as[Int].collect().sorted.toSeq

  test("current, versioned and change-feed reads stay exact across random DV histories") {
    // SPARK_GRAFT_FUZZ_SEED overrides the base seed for extended hunts
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L))
    for (round <- 0 until 4) {
      // round 3 partitions by x%2: blob rels carry escaped partition
      // dirs, masks live beside hive directories, restores cross them
      val partitioned = round == 3
      val dir = s"/tmp/btr-dv-fuzz/r$round"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val root = new Path(dir)
      val fs = root.getFileSystem(BtrTableMeta.hadoopConf())
      val qroot = fs.makeQualified(root)
      def latest: Long = BtrLog.latestVersion(fs, qroot).getOrElse(0L)

      var nextVal = 0
      var live = Seq.empty[Int]
      val model = scala.collection.mutable.Map.empty[Long, Seq[Int]]

      // seed: retained + deletion vectors, so every history replays
      locally {
        val seed = (0 until 64).toDF("x")
          .withColumn("k", org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("x"), org.apache.spark.sql.functions.lit(2)))
        val w = seed.repartition(2).write.format("btr")
          .option("btr.deletionVectors", "true")
          .option("btr.retainRemoved", "true")
          .mode("overwrite")
        if (partitioned) w.partitionBy("k").save(dir) else w.save(dir)
      }
      nextVal = 64
      live = (0 until 64).toSeq
      model(latest) = live
      val v0 = latest

      val trace = scala.collection.mutable.ArrayBuffer.empty[String]
      for (step <- 0 until 14) {
        rnd.nextInt(6) match {
          case 0 => // append
            val n = 8 + rnd.nextInt(24)
            val vals = (nextVal until nextVal + n).toSeq
            nextVal += n
            val aw = vals.toDF("x")
              .withColumn("k", org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.col("x"),
                org.apache.spark.sql.functions.lit(2)))
              .repartition(1 + rnd.nextInt(2))
              .write.format("btr").mode("append")
            if (partitioned) aw.partitionBy("k").save(dir) else aw.save(dir)
            trace += s"v$latest append $n"
            live = (live ++ vals).sorted
          case 1 | 2 => // DV delete (modulo predicate: never stat-aligned)
            val m = 3 + rnd.nextInt(7)
            val r = rnd.nextInt(m)
            val before = latest
            spark.sql(s"DELETE FROM graft.`$dir` WHERE x % $m = $r")
            trace += s"v$latest dv-delete x%$m==$r"
            live = live.filterNot(_ % m == r)
            if (latest == before) {
              // matched nothing: no version recorded, model unchanged
              assert(live == model(before), s"round $round step $step noop drift")
            }
          case 3 => // range delete — may take the metadata path
            val lo = rnd.nextInt(nextVal)
            val hi = lo + rnd.nextInt(40)
            val before = latest
            spark.sql(s"DELETE FROM graft.`$dir` WHERE x >= $lo AND x < $hi")
            trace += s"v$latest range-delete [$lo,$hi)"
            live = live.filterNot(x => x >= lo && x < hi)
            if (latest == before) assert(live == model(before))
          case 4 => // physical reorganization (applies + drops masks);
            // partitioned tables rewrite within their directories
            if (rnd.nextBoolean()) {
              BtrCompact.rewriteClustered(spark, dir, Seq("x")); trace += s"v$latest rewrite"
            } else { BtrCompact.compact(spark, dir, 1L << 20); trace += s"v$latest compact" }
          case 5 => // restore to a random recorded version
            val vs = model.keys.toSeq.sorted
            val target = vs(rnd.nextInt(vs.length))
            BtrLog.restore(fs, qroot, target)
            trace += s"v$latest restore->$target"
            live = model(target)
        }
        model(latest) = live
        assert(current(dir) == live, s"round $round step $step: current read drifted")
      }

      // every recorded version replays exactly
      model.toSeq.sortBy(_._1).foreach { case (v, want) =>
        assert(readAsOf(dir, v) == want, s"round $round: version $v replay drifted")
      }

      // the change feed over the whole history is multiset-consistent:
      // model(v0) + inserts - deletes == current content. A history that
      // removes-restores-removes the same rel refuses the single range
      // loudly — the advertised remedy (split at intermediate versions,
      // union) must then hold exactly.
      def feedOf(a: Long, b: Long): Array[(Int, String)] =
        BtrChanges.between(spark, dir, a, b)
          .select(org.apache.spark.sql.functions.col("x"),
            org.apache.spark.sql.functions.col("_change_type"))
          .as[(Int, String)].collect()
      val feed =
        try feedOf(v0, latest)
        catch {
          case e: IllegalStateException if e.getMessage.contains("removed AGAIN") =>
            (v0 until latest).toArray.flatMap(v => feedOf(v, v + 1))
        }
      val counts = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
      model(v0).foreach(x => counts(x) += 1)
      feed.foreach { case (x, ct) => counts(x) += (if (ct == "insert") 1 else -1) }
      val folded = counts.toSeq.filter(_._2 != 0)
        .flatMap { case (x, k) => Seq.fill(k)(x) }.sorted
      assert(folded == live, s"round $round: change feed not multiset-consistent\ntrace:\n${trace.mkString("\n")}")
    }
  }
}
