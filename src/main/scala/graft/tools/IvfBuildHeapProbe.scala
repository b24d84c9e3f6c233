package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memory-envelope probe for consecutive IVF fixture builds (VERDICT r19
  * #2): the sf10 bench JVM OOM'd at the default 8 GB heap building the
  * three serve-fixture indexes (f64/f32/i8) back-to-back, while each
  * build alone passes — this tool reproduces exactly that sequence over
  * a replicated corpus and MEASURES the attribution instead of guessing:
  *
  *   - a daemon thread samples heap every 100 ms, records the per-build
  *     PEAK, and captures one `jcmd GC.class_histogram` (top 30 classes)
  *     the first time usage crosses 70% of max — the live-set evidence
  *     at the pressure point;
  *   - after each build it runs System.gc() and reports the RETAINED
  *     heap — a build-over-build climb here is cross-build retention, a
  *     flat line is honest per-build working set.
  *
  *   runMain graft.tools.IvfBuildHeapProbe <sfDir> [copies=500] [out.json]
  *
  * Run it once at SPARK_DRIVER_MEM=8g on the fixed tree (passes) and once
  * on the pre-fix tree (OOMs / near-ceiling peak) for the A/B.
  */
object IvfBuildHeapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.SimilarityOps

    val rt = Runtime.getRuntime
    val pid = ProcessHandle.current().pid()
    @volatile var peak = 0L
    @volatile var histo: String = ""
    val sampler = new Thread(() => {
      while (true) {
        val used = rt.totalMemory() - rt.freeMemory()
        if (used > peak) peak = used
        if (histo.isEmpty && used > (rt.maxMemory() * 0.70).toLong) {
          histo = try {
            val p = new ProcessBuilder("jcmd", pid.toString, "GC.class_histogram")
              .redirectErrorStream(true).start()
            val out = new String(p.getInputStream.readAllBytes())
            p.waitFor()
            out.linesIterator.take(34).mkString("\n")
          } catch { case e: Throwable => s"histogram failed: ${e.getMessage}" }
        }
        Thread.sleep(100)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val corpus = base.crossJoin(spark.range(copies).select(col("id").as("r")))
      .select(
        (col("cid") + col("r") * 1000000000L).as("cid"),
        transform(col("cvec"),
          (x, i) => (x + (pmod(hash(col("cid"), col("r"), i), lit(1000)).cast("float")
            - 500f) / 50000f).cast("float")).as("cvec"))
    val n = base.count() * copies

    def gb(x: Long): Double = x / 1e9
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += f"""{"max_heap_gb":${gb(rt.maxMemory())}%.2f,"corpus":$n}"""
    println(lines.last)
    for (st <- Seq("f64", "f32", "i8")) {
      val dir = s"/tmp/btr-ivf-heap-probe/$st"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      peak = 0L
      val t0 = System.nanoTime()
      SimilarityOps.ivfIndexBuild(corpus, dir, nlist = 16, fitSampleRows = 10000,
        vectorStorage = st)
      val sec = (System.nanoTime() - t0) / 1e9
      System.gc(); Thread.sleep(500); System.gc()
      val retained = rt.totalMemory() - rt.freeMemory()
      // one file per cell = the co-located write layout (0 = pre-fix tree)
      val cellDirs = Option(new java.io.File(
        SimilarityOps.ivfIndexAssignPath(dir)).listFiles())
        .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("cluster="))
      val maxFilesPerCell =
        if (cellDirs.isEmpty) 0
        else cellDirs.map(d => Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".btr"))).max
      lines += f"""{"storage":"$st","build_sec":$sec%.1f,"peak_heap_gb":${gb(peak)}%.2f,"retained_after_gc_gb":${gb(retained)}%.2f,"max_files_per_cell":$maxFilesPerCell}"""
      println(lines.last)
    }
    if (histo.nonEmpty) {
      println("=== class histogram at first >70%-of-max crossing ===")
      println(histo)
    }
    if (args.length > 2) {
      val w = new java.io.PrintWriter(new java.io.File(args(2)))
      try {
        lines.foreach(w.println)
        if (histo.nonEmpty) { w.println("histogram:"); w.println(histo) }
      } finally w.close()
    }
    spark.stop()
  }
}
