package graft.tools

import org.apache.spark.sql.SparkSession

/** Time-vs-scale probe for the heaviest pipeline operators: runs a
  * comma-listed subset of `SparkEntry.queries` against one scale dir and
  * prints a single JSON line with per-query seconds PLUS the operators'
  * bounded-work telemetry (oversized LSH buckets, SemDeDup pair caps) —
  * the point is proving the curves stay ≈linear at 10×/100× sf0.1
  * WITHOUT a silent cap absorbing the work. Unlike `graft.Bench` it
  * prepares only the tables the probed queries touch, so a 100× probe
  * pays for the three queries, not the whole battery's prep.
  *
  *   runMain graft.tools.ScaleProbe <sfDir> <q1,q2,...> [out.json]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm only the probed queries' source caches (first run builds the
    // btr round-trip cache; the timed run measures the operator)
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[probe] warm $n: ${e.getMessage}") }
    }
    // a failing or misnamed query records a -1 sentinel instead of
    // aborting the probe — the other queries' measurements still emit
    val times = names.map { n =>
      n -> (try secs {
        graft.SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      } catch {
        case e: Throwable =>
          System.err.println(s"[probe] timed $n FAILED: ${e.getMessage}")
          -1.0
      })
    }
    val tele = {
      val ob = graft.functions.TextOps.lastOversizedBuckets.get(spark)
      val sd = graft.functions.SimilarityOps.lastOversizedClusters.get(spark)
      val obS = if (ob == null) "null" else s"""{"buckets":${ob._1},"members":${ob._2}}"""
      val sdS =
        if (sd == null) "null"
        else s"""{"clusters":${sd._1},"members":${sd._2}}"""
      s""""oversized_buckets":$obS,"oversized_clusters":$sdS"""
    }
    val qs = times.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val line = s"""{"sf":"$sfDir","queries":$qs,$tele}"""
    println(line)
    if (args.length > 2) {
      val w = new java.io.PrintWriter(new java.io.File(args(2)))
      try w.println(line) finally w.close()
    }
    spark.stop()
  }
}
