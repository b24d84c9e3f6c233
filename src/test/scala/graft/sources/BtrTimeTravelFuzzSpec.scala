package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized sequences of append / overwrite / compact / restore against
  * an in-memory model. The property under test: a versioned read is
  * EITHER exactly the model's content at that version OR a loud
  * missing-file / unknown-version error — never a silently wrong
  * survivor set. Restores must land the live table exactly on the
  * model's snapshot or refuse.
  */
class BtrTimeTravelFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("time-travel-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def current(dir: String): Seq[Int] =
    spark.read.format("btr").load(dir).collect().map(_.getInt(0)).sorted.toSeq

  private def readAsOf(dir: String, v: Long): Seq[Int] =
    spark.read.format("btr").option("btr.versionAsOf", v.toString).load(dir)
      .collect().map(_.getInt(0)).sorted.toSeq

  test("versioned reads are exact-or-loud across random mutation sequences") {
    import spark.implicits._
    // SPARK_GRAFT_FUZZ_SEED overrides the base seed for extended hunts
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L))
    for (round <- 0 until 3) {
      val dir = s"/tmp/btr-tt-fuzz/r$round"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val root = new Path(dir)
      val fs = root.getFileSystem(BtrTableMeta.hadoopConf())
      def latest: Long = BtrLog.latestVersion(fs, fs.makeQualified(root)).getOrElse(0L)

      // model: content (sorted) recorded at every log version
      val model = scala.collection.mutable.Map.empty[Long, Seq[Int]]
      var live = Seq.empty[Int]
      var nextVal = 0
      def batch(n: Int): Seq[Int] = { val b = (nextVal until nextVal + n); nextVal += n; b }

      def write(vals: Seq[Int], mode: String): Unit = {
        vals.toDF("x").repartition(1 + rnd.nextInt(3))
          .write.format("btr").mode(mode).save(dir)
        live = if (mode == "append") (live ++ vals).sorted else vals.sorted
        model(latest) = live
      }

      write(batch(3 + rnd.nextInt(5)), "overwrite")
      for (_ <- 0 until 12) {
        rnd.nextInt(10) match {
          case i if i < 5 => // append
            write(batch(1 + rnd.nextInt(6)), "append")
          case 5 | 6 => // overwrite (prunes all prior physical history)
            write(batch(2 + rnd.nextInt(4)), "overwrite")
          case 7 => // footer-level compaction (row-preserving, prunes sources)
            BtrCompact.compact(spark, dir, targetBytes = 1L << 30)
            live = live // unchanged rows
            model(latest) = live
          case _ => // restore to a random known version: exact or loud refusal
            val vs = model.keys.toSeq.sorted
            val target = vs(rnd.nextInt(vs.length))
            try {
              BtrLog.restore(fs, root, target)
              live = model(target)
              model(latest) = live
            } catch {
              case e: IllegalArgumentException =>
                assert(e.getMessage.contains("no longer exist") ||
                  e.getMessage.contains("no snapshot"), e.getMessage)
            }
        }
        assert(current(dir) == live, s"live content diverged from model in $dir")

        // every recorded version: exact content or a loud error
        model.foreach { case (v, want) =>
          try {
            val got = readAsOf(dir, v)
            assert(got == want, s"v$v of $dir returned wrong content")
          } catch {
            case e: IllegalStateException =>
              assert(e.getMessage.contains("no longer exist"), e.getMessage)
            case e: IllegalArgumentException =>
              assert(e.getMessage.contains("no snapshot"), e.getMessage)
          }
        }
      }
    }
  }
}
