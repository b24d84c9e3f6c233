package graft.format

import org.apache.spark.sql.SparkSession

/** Diagnostic main: for each BI-corpus column chunk, print the true
  * encoded size under every scheme (TRY_ALL ground truth) next to what
  * SAMPLE-mode selection picked, to attribute selector giveaways.
  *
  * Run: sbt "Test/runMain graft.format.SelectorProbe [column ...]"
  */
object SelectorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("selector-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val nRows = sys.env.getOrElse("PROBE_ROWS", "262144").toInt
      val df = graft.tools.BiCorpus.generate(spark, rows = nRows.toLong).coalesce(4)
      val want = if (args.nonEmpty) args.toSet else Set("sales_amount", "demand_qty", "week", "product_id", "sensor_temp")
      val rows = df.collect()
      val chunk = 65536
      for (f <- df.schema.fields if want.contains(f.name)) {
        println(s"=== ${f.name} (${f.dataType.simpleString}) ===")
        var off = 0
        while (off < rows.length) {
          val hi = math.min(rows.length, off + chunk)
          println(s"  -- chunk [$off, $hi)")
          f.dataType match {
            case org.apache.spark.sql.types.DoubleType =>
              val all = rows.slice(off, hi).map(r => if (r.isNullAt(r.fieldIndex(f.name))) Double.NaN else r.getDouble(r.fieldIndex(f.name)))
              probeDouble(f.name, all)
            case org.apache.spark.sql.types.LongType =>
              val all = rows.slice(off, hi).map(r => if (r.isNullAt(r.fieldIndex(f.name))) 0L else r.getLong(r.fieldIndex(f.name)))
              probeInt(f.name, all)
            case org.apache.spark.sql.types.IntegerType =>
              val all = rows.slice(off, hi).map(r => if (r.isNullAt(r.fieldIndex(f.name))) 0L else r.getInt(r.fieldIndex(f.name)).toLong)
              probeInt(f.name, all)
            case _ => println("  (skipped type)")
          }
          off += chunk
        }
      }
    } finally spark.stop()
  }

  private def probeInt(name: String, vals: Array[Long]): Unit = {
    val cfg = BtrConfig.Default
    val n = vals.length
    val s = IntStats.compute(vals, n, 42L, cfg.sampleRuns, cfg.sampleRunLen)
    println(s"  n=$n runs=${s.runCount} sDistinct=${s.sDistinct} distinctEst=${s.distinctEst} top=${s.sTopCount}/${s.sampleN}")
    val names = BtrConfig.intNames
    for (sch <- Seq(IntCodec.Dict, IntCodec.Rle, IntCodec.ForBp, IntCodec.Frequency, IntCodec.Pfor, IntCodec.DeltaBp)) {
      val w = new BufWriter(1 << 16)
      val trueSize =
        try { IntCodec.encodeForced(sch, w, vals, n, 8, 3, cfg); w.pos.toString }
        catch { case e: Exception => s"n/a" }
      println(f"    ${names(sch)}%-14s true=$trueSize")
    }
    val sel = new BufWriter(1 << 16)
    IntCodec.encode(sel, vals, n, 8, 3, cfg)
    println(s"    SAMPLE pick -> scheme=${names(sel.result()(0).toInt)} bytes=${sel.pos}")
  }

  private def probeDouble(name: String, vals: Array[Double]): Unit = {
    val cfg = BtrConfig.Default
    val n = vals.length
    val s = DoubleStats.compute(vals, n, 42L, cfg.sampleRuns, cfg.sampleRunLen)
    println(s"  n=$n runs=${s.runCount} sDistinct=${s.sDistinct} distinctEst=${s.distinctEst} top=${s.sTopCount}/${s.sampleN}")
    val names = BtrConfig.doubleNames
    for (sch <- Seq(DoubleCodec.Dict, DoubleCodec.Rle, DoubleCodec.Frequency, DoubleCodec.Pseudodecimal)) {
      val w = new BufWriter(1 << 16)
      val trueSize =
        try { DoubleCodec.encodeForced(sch, w, vals, n, 3, cfg); w.pos.toString }
        catch { case e: Exception => s"n/a" }
      println(f"    ${names(sch)}%-14s true=$trueSize")
    }
    val sel = new BufWriter(1 << 16)
    DoubleCodec.encode(sel, vals, n, 3, cfg)
    println(s"    SAMPLE pick -> scheme=${names(sel.result()(0).toInt)} bytes=${sel.pos}")
  }
}
