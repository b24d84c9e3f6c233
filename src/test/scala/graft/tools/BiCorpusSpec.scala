package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Public-BI-shaped ratio corpus (VERDICT r16 #5): pins that the scheme
  * selector picks FREQUENCY and RLE on the skewed real-world shapes the
  * reference's regression benchmark measures — NOT dict/pseudodecimal —
  * and that those wins are on merit (forced alternates pay measured byte
  * penalties). TPC-H's clean uniform columns never exercise these paths.
  */
class BiCorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bi-corpus-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = "/tmp/btr-bi-corpus-spec"
  private lazy val corpus = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    BiCorpus.generate(spark, rows = 262144).coalesce(4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private def writeAndWins(mode: String): Map[String, (Map[String, Int], Long)] = {
    val dir = s"$base/$mode"
    corpus.write.format("btr").mode("overwrite").option("btr.selection", mode).save(dir)
    BiCorpus.schemeWins(spark, dir)
  }
  private lazy val sample = writeAndWins("sample")
  private lazy val tryall = writeAndWins("tryall")

  private def only(h: Map[String, Int], scheme: String): Boolean =
    h.keySet == Set(scheme)

  private def forcedBytes(c: String, opt: String, scheme: String): Long = {
    val dir = s"$base/forced-$c-$scheme"
    corpus.select(c).write.format("btr").mode("overwrite").option(opt, scheme).save(dir)
    BiCorpus.schemeWins(spark, dir)(c)._2
  }

  test("RLE must-win: ordered run columns pick rle every chunk, bitpack pays >10x") {
    // run-dominated chunks escalate to exhaustive selection, so the
    // sample pick equals TRY_ALL exactly — including the occasional
    // near-constant chunk where frequency beats rle by a few bytes
    assert(sample("week")._1.keySet.subsetOf(Set("rle", "freq")),
      s"week sample: ${sample("week")._1}")
    assert(sample("week")._2 <= tryall("week")._2,
      s"week sample bytes must match tryall: ${sample("week")._2} vs ${tryall("week")._2}")
    assert(only(sample("agency_id")._1, "rle"), s"agency sample: ${sample("agency_id")._1}")
    val rleBytes = sample("week")._2
    val bpBytes = forcedBytes("week", "btr.forceScheme.int", "forbp")
    val dictBytes = forcedBytes("week", "btr.forceScheme.int", "dict")
    assert(bpBytes > rleBytes * 10, s"bitpack must pay >10x on runs: $bpBytes vs $rleBytes")
    assert(dictBytes > rleBytes, s"dict must pay on runs: $dictBytes vs $rleBytes")
  }

  test("sampled selection matches TRY_ALL within 1.15x on the r17 giveaway shapes") {
    // VERDICT r17 #1: scattered id spaces (dict was losing 1.86x to a
    // Chao1 explosion) and plateau doubles (rle was keeping a 2.9x
    // pseudodecimal win invisible) — both now within the budget
    for (c <- Seq("product_id", "sensor_temp", "client_id", "demand_qty")) {
      val sb = sample(c)._2.toDouble
      val tb = tryall(c)._2.toDouble
      assert(sb <= tb * 1.15, s"$c: sample $sb vs tryall $tb = ${sb / tb}")
    }
    assert(only(sample("product_id")._1, "dict"), s"product_id: ${sample("product_id")._1}")
    assert(sample("sensor_temp")._1.keySet.subsetOf(Set("pseudodec", "rle", "freq")),
      s"sensor_temp: ${sample("sensor_temp")._1}")
  }

  test("FREQUENCY must-win: 93%-zero messy-decimal column beats dict AND pseudodecimal") {
    // both selection modes agree — not a sampling artifact
    assert(only(sample("sales_amount")._1, "freq"),
      s"sales_amount sample: ${sample("sales_amount")._1}")
    assert(only(tryall("sales_amount")._1, "freq"),
      s"sales_amount tryall: ${tryall("sales_amount")._1}")
    val freqBytes = tryall("sales_amount")._2
    val dictBytes = forcedBytes("sales_amount", "btr.forceScheme.double", "dict")
    val pdBytes = forcedBytes("sales_amount", "btr.forceScheme.double", "pseudodecimal")
    assert(dictBytes > freqBytes,
      s"dict must lose on the high-distinct tail: $dictBytes vs $freqBytes")
    assert(pdBytes > freqBytes,
      s"pseudodecimal must lose on the non-terminating tail: $pdBytes vs $freqBytes")
  }

  test("selector matches the designed winner on the remaining BI shapes") {
    // integer: skewed tail → frequency under exhaustive selection
    assert(only(tryall("returns_qty")._1, "freq"),
      s"returns_qty tryall: ${tryall("returns_qty")._1}")
    // outlier spikes → pfor patches (dict ties within 1%, so the pick may
    // split — the byte-parity pin above is the binding one); high-card
    // band → plain bitpack, never dict
    assert(sample("demand_qty")._1.keySet.subsetOf(Set("pfor", "dict")),
      s"demand_qty: ${sample("demand_qty")._1}")
    assert(only(sample("client_id")._1, "for_bp"), s"client_id: ${sample("client_id")._1}")
    // messy 2-decimals → pseudodecimal; dirty low-card strings → dict
    assert(only(sample("price")._1, "pseudodec"), s"price: ${sample("price")._1}")
    assert(only(sample("status")._1, "dict"), s"status: ${sample("status")._1}")
    // sparse-null columns still compress their non-null stream; on
    // discount the dict/freq race is within 0.4% bytes, so the pick may
    // split — pin byte parity with exhaustive selection instead
    assert(only(sample("promo_code")._1, "dict"), s"promo_code: ${sample("promo_code")._1}")
    assert(sample("discount")._1.keySet.subsetOf(Set("freq", "dict")),
      s"discount: ${sample("discount")._1}")
    assert(sample("discount")._2 <= tryall("discount")._2 * 1.03,
      s"discount bytes: ${sample("discount")._2} vs ${tryall("discount")._2}")
  }

  test("r19 family coverage: sorted timestamps pick DELTA+BP, bitpack pays the FOR range") {
    // VERDICT r18 #7: a sorted-with-jitter epoch column is the DeltaBp
    // must-win TPC-H and the r17 corpus never exercised — under BOTH
    // selection modes (sortedness is exact in the sample's run draws)
    assert(only(sample("event_ts")._1, "delta_bp"), s"event_ts: ${sample("event_ts")._1}")
    assert(only(tryall("event_ts")._1, "delta_bp"),
      s"event_ts tryall: ${tryall("event_ts")._1}")
    assert(sample("event_ts")._2 <= tryall("event_ts")._2 * 1.01,
      s"event_ts bytes: ${sample("event_ts")._2} vs ${tryall("event_ts")._2}")
    val deltaBytes = sample("event_ts")._2
    val bpBytes = forcedBytes("event_ts", "btr.forceScheme.int", "forbp")
    assert(bpBytes > deltaBytes * 1.5,
      s"plain bitpack must pay the chunk's FOR range on sorted gaps: $bpBytes vs $deltaBytes")
  }

  test("r19 family coverage: run-heavy low-card strings pick DICT with RLE'd codes") {
    assert(only(sample("shift")._1, "dict"), s"shift: ${sample("shift")._1}")
    assert(only(tryall("shift")._1, "dict"), s"shift tryall: ${tryall("shift")._1}")
    // the codes stream must CASCADE to rle (8,192-row runs of 4 codes) —
    // this is the dict-RLE-codes shape, visible in the scheme tree
    val trees = graft.functions.BtrInspect.describe(spark, s"$base/sample")
      .filter(col("column") === "shift").select("scheme_tree")
      .collect().map(_.getString(0))
    assert(trees.nonEmpty && trees.forall(_.contains("codes=rle")),
      s"shift codes must be rle-cascaded: ${trees.take(2).mkString("; ")}")
    val dictBytes = sample("shift")._2
    val fsstBytes = forcedBytes("shift", "btr.forceScheme.string", "fsst")
    val rawBytes = forcedBytes("shift", "btr.forceScheme.string", "uncompressed")
    assert(fsstBytes > dictBytes * 5,
      s"fsst must pay per-row where code runs collapse: $fsstBytes vs $dictBytes")
    assert(rawBytes > dictBytes * 20, s"raw must pay: $rawBytes vs $dictBytes")
  }

  test("r19 family coverage: templated near-unique URLs pick FSST, dict degenerates") {
    assert(only(sample("url")._1, "fsst"), s"url: ${sample("url")._1}")
    assert(only(tryall("url")._1, "fsst"), s"url tryall: ${tryall("url")._1}")
    assert(sample("url")._2 <= tryall("url")._2 * 1.01,
      s"url bytes: ${sample("url")._2} vs ${tryall("url")._2}")
    val fsstBytes = sample("url")._2
    val dictBytes = forcedBytes("url", "btr.forceScheme.string", "dict")
    val rawBytes = forcedBytes("url", "btr.forceScheme.string", "uncompressed")
    // forced dict is only ~1.1x here because dict FSST-compresses its own
    // table on high-unique columns (the reference's fused S_DICT design):
    // the penalty is exactly the useless codes stream + sort overhead
    assert(dictBytes > fsstBytes * 1.05,
      s"dict must pay its codes stream on ~unique values: $dictBytes vs $fsstBytes")
    assert(rawBytes > fsstBytes * 1.5,
      s"raw must pay vs symbol compression: $rawBytes vs $fsstBytes")
  }

  test("ALP must-win: high-magnitude cents beat pseudodecimal, doublebp AND dict on merit") {
    // VERDICT r19 #4: ledger_amount's ~1e13 digits overflow the
    // pseudodecimal 31-bit cap on every row (the published abort shape).
    // Under the FULL registered pool (alp + doublebp opted in) natural
    // selection must pick alp on every chunk, and the forced alternates
    // must pay measured byte penalties.
    val allPool = (graft.format.BtrConfig.intByName.keySet ++
      graft.format.BtrConfig.doubleByName.keySet ++
      graft.format.BtrConfig.stringByName.keySet).toSeq.sorted.mkString(",")
    val dir = s"$base/alp-natural"
    corpus.select("ledger_amount").write.format("btr").mode("overwrite")
      .option("btr.schemes", allPool).save(dir)
    val (hist, alpBytes) = BiCorpus.schemeWins(spark, dir)("ledger_amount")
    assert(only(hist, "alp"), s"ledger_amount full-pool natural selection: $hist")
    val pdBytes = forcedBytes("ledger_amount", "btr.forceScheme.double", "pseudodecimal")
    val bpBytes = forcedBytes("ledger_amount", "btr.forceScheme.double", "doublebp")
    val dictBytes = forcedBytes("ledger_amount", "btr.forceScheme.double", "dict")
    assert(pdBytes > alpBytes,
      s"pseudodecimal must pay its all-patch penalty: $pdBytes vs $alpBytes")
    assert(bpBytes > alpBytes,
      s"doublebp must pay both 32-bit planes: $bpBytes vs $alpBytes")
    assert(dictBytes > alpBytes,
      s"dict must pay the ~unique table: $dictBytes vs $alpBytes")
    // and the DEFAULT pool is untouched: alp never appears un-opted-in
    assert(!sample("ledger_amount")._1.contains("alp") &&
      !tryall("ledger_amount")._1.contains("alp"),
      s"default pool must exclude alp: ${sample("ledger_amount")._1} / ${tryall("ledger_amount")._1}")
    // full-pool parity: with alp opted in, SAMPLE and TRY_ALL agree on
    // the winner and land within 1% bytes — the residual default-pool
    // gap on this shape (raw vs the freq raw-bits side channel, ~1.12x)
    // closes from above by adopting alp, not by loosening the freq gate
    val tryDir = s"$base/alp-natural-tryall"
    corpus.select("ledger_amount").write.format("btr").mode("overwrite")
      .option("btr.schemes", allPool).option("btr.selection", "tryall").save(tryDir)
    val (tHist, tBytes) = BiCorpus.schemeWins(spark, tryDir)("ledger_amount")
    assert(only(tHist, "alp"), s"full-pool tryall: $tHist")
    assert(alpBytes <= math.ceil(tBytes * 1.01).toLong,
      s"full-pool sample/tryall parity: $alpBytes vs $tBytes")
  }

  test("the BI corpus round-trips bit-exactly through every selected scheme") {
    import org.apache.spark.sql.types._
    val back = spark.read.format("btr").load(s"$base/sample")
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      corpus.schema.fields.map(f => f.name -> f.dataType).toSeq)
    def fp(df: org.apache.spark.sql.DataFrame): Row0 = {
      val r = df.agg(
        count(lit(1)),
        sum(hash(df.columns.map(col): _*).cast("long"))).collect()(0)
      Row0(r.getLong(0), r.getLong(1))
    }
    assert(fp(back) == fp(corpus), "content fingerprint must survive the round-trip")
  }
  private case class Row0(n: Long, h: Long)
}
