package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded race fuzz over the versioned IVF index lifecycle (VERDICT r16
  * #8): interleaves rebuilds, crash-injected rebuilds (both windows),
  * nested concurrent rebuilds firing inside the pre-publish window,
  * vacuums (keepLast 1 and 2) — including vacuums fired INSIDE a
  * rebuild's pre-publish window, the exact ADVICE hazard — and
  * pointer-republish gaps (deleted `_current`). Invariants after every
  * op: the pointer never moves backwards, state always resolves a
  * COMPLETE build (centroids readable, assign covers the corpus), and
  * full-probe serving through the index equals brute force.
  */
class IvfRaceFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ivf-race-fuzz-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Dim = 6

  private def randVecs(ids: Seq[Long], seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    ids.map(i => i -> Seq.fill(Dim)(rnd.nextGaussian().toFloat))
  }
  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame = rows.toDF("cid", "cvec")

  test("rebuild x vacuum x crash x republish-gap schedules keep the index serving exactly") {
    val extra = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
      .flatMap(_.split(',')).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    // run-wide coverage counters: every arm must fire across the run
    var crashes = 0; var nested = 0; var vacuums = 0; var midVacuums = 0; var gaps = 0
    var inversions = 0; var serveRaces = 0
    for (seed <- Seq(4242L, 1337L) ++ extra) {
      val dir = s"/tmp/btr-ivf-race-fuzz/$seed"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val rnd = new scala.util.Random(seed)
      val corpus = randVecs(0L until 120L, seed)
      SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
      val qs = df(corpus.take(2)).select(col("cid").as("qid"), col("cvec").as("qvec"))
      val exact = SimilarityOps.bruteForceTopK(qs, df(corpus), 3)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      var lastVersion = SimilarityOps.ivfIndexState(dir).buildVersion

      def check(op: String): Unit = {
        val st = SimilarityOps.ivfIndexState(dir)
        assert(st.buildVersion >= lastVersion,
          s"seed=$seed after $op: pointer moved BACKWARDS " +
            s"(v$lastVersion -> v${st.buildVersion})")
        lastVersion = st.buildVersion
        assert(SimilarityOps.centroidsOf(spark, dir).nonEmpty,
          s"seed=$seed after $op: current build has no readable centroids")
        val got = SimilarityOps.ivfTopKIndexed(qs, df(corpus), dir, k = 3, nprobe = 4)
          .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
        assert(got == exact, s"seed=$seed after $op: serving diverged from brute force")
      }

      for (round <- 0 until 10) {
        val op = rnd.nextInt(8)
        op match {
          case 0 => // plain rebuild
            SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
            check(s"rebuild(r$round)")
          case 1 => // crash-injected rebuild (either window)
            val hook: (() => Unit) => Unit =
              if (rnd.nextBoolean()) f => SimilarityOps.ivfBuildInjectMid = f
              else f => SimilarityOps.ivfBuildInjectPrePublish = f
            hook(() => throw new RuntimeException("boom"))
            try intercept[RuntimeException] {
              SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
            } finally hook(() => ())
            crashes += 1
            check(s"crashed-rebuild(r$round)")
          case 2 => // nested rebuild publishes first; loser must abandon
            SimilarityOps.ivfBuildInjectPrePublish = () => {
              SimilarityOps.ivfBuildInjectPrePublish = () => ()
              SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
              // half the time the ADVICE hazard: vacuum(1) right after the
              // nested publish, sweeping the loser's still-staged build
              if (rnd.nextBoolean()) { SimilarityOps.ivfIndexVacuum(dir, 1); midVacuums += 1 }
            }
            val won =
              try SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
              finally SimilarityOps.ivfBuildInjectPrePublish = () => ()
            assert(!won, s"seed=$seed r$round: the raced-out build claimed it published")
            nested += 1
            check(s"nested-rebuild(r$round)")
          case 3 => // vacuum, both retention settings
            SimilarityOps.ivfIndexVacuum(dir, keepLast = 1 + rnd.nextInt(2))
            vacuums += 1
            check(s"vacuum(r$round)")
          case 4 => // republish gap: pointer briefly absent
            val ptr = new java.io.File(dir, "_current")
            if (ptr.exists()) {
              val body = java.nio.file.Files.readAllBytes(ptr.toPath)
              assert(ptr.delete())
              gaps += 1
              check(s"pointer-gap(r$round)") // resolves highest published build
              java.nio.file.Files.write(ptr.toPath, body)
              check(s"pointer-restored(r$round)")
            }
          case 5 => // r18: stale-pointer inversion — a lost-race build's
            // late blind put rewrites _current backwards; the published
            // marker must out-rank it at resolution
            val ptrF = new java.io.File(dir, "_current")
            if (ptrF.exists() && lastVersion >= 2) {
              val body = java.nio.file.Files.readAllBytes(ptrF.toPath)
              // raw write bypasses the local-FS checksum sidecar: drop it
              new java.io.File(dir, "._current.crc").delete()
              java.nio.file.Files.write(ptrF.toPath,
                "{\"v\":1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
              inversions += 1
              check(s"stale-pointer(r$round)") // must resolve forward
              java.nio.file.Files.write(ptrF.toPath, body)
              check(s"stale-pointer-restored(r$round)")
            }
          case 6 => // r18: serve resolves, THEN a rebuild publishes and a
            // keepLast=2 vacuum runs before the collect — the retained
            // prior build must keep the in-flight query exact
            val pending = SimilarityOps.ivfTopKServe(qs, dir, k = 3, nprobe = 4)
            SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
            SimilarityOps.ivfIndexVacuum(dir, keepLast = 2)
            serveRaces += 1
            val got = pending.collect()
              .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
            assert(got == exact,
              s"seed=$seed r$round: in-flight serve diverged across rebuild+vacuum")
            check(s"serve-race(r$round)")
          case _ => // plain read round
            check(s"read(r$round)")
        }
      }
      // deterministic tail arms: the two rare hazards fire at least once
      // per seed regardless of the random draw
      SimilarityOps.ivfBuildInjectPrePublish = () => {
        SimilarityOps.ivfBuildInjectPrePublish = () => ()
        SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
        SimilarityOps.ivfIndexVacuum(dir, 1)
        midVacuums += 1
      }
      val tailWon =
        try SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
        finally SimilarityOps.ivfBuildInjectPrePublish = () => ()
      assert(!tailWon, s"seed=$seed tail: the raced-out build claimed it published")
      nested += 1
      check("tail-nested-vacuum")
      SimilarityOps.ivfIndexVacuum(dir, keepLast = 2)
      vacuums += 1
      check("tail-vacuum")
      val ptr = new java.io.File(dir, "_current")
      val body = java.nio.file.Files.readAllBytes(ptr.toPath)
      assert(ptr.delete())
      gaps += 1
      check("tail-pointer-gap")
      java.nio.file.Files.write(ptr.toPath, body)
      check("tail-pointer-restored")
      // deterministic r18 tails: the inversion and the in-flight serve race
      new java.io.File(dir, "._current.crc").delete()
      java.nio.file.Files.write(ptr.toPath,
        "{\"v\":1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      inversions += 1
      check("tail-stale-pointer")
      java.nio.file.Files.write(ptr.toPath, body)
      val pending = SimilarityOps.ivfTopKServe(qs, dir, k = 3, nprobe = 4)
      SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100)
      SimilarityOps.ivfIndexVacuum(dir, keepLast = 2)
      serveRaces += 1
      assert(pending.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet == exact,
        s"seed=$seed tail: in-flight serve diverged across rebuild+vacuum")
      check("tail-serve-race")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    assert(crashes >= 1 && nested >= 1 && vacuums >= 1 && midVacuums >= 1 && gaps >= 1 &&
      inversions >= 1 && serveRaces >= 1,
      s"run-wide schedule too tame: crashes=$crashes nested=$nested " +
        s"vacuums=$vacuums midVacuums=$midVacuums gaps=$gaps " +
        s"inversions=$inversions serveRaces=$serveRaces")
  }

  // ADVICE r19 (medium): the i8 two-stage rank executes as MULTIPLE
  // Spark actions (shortlist materialize + id collect, then the re-rank
  // join at the caller's collect) — a refresh committing between them
  // must not tear the query. The serve is version-pinned at entry
  // (assignAt) and the shortlist persisted, so the in-flight query
  // answers exactly the pre-commit snapshot — never a torn mix, never
  // fewer than k rows — and a FRESH serve sees the post state.
  test("i8 two-stage serve stays snapshot-pinned across a mid-query refresh") {
    for (seed <- Seq(91L, 92L, 93L)) {
      val dir = s"/tmp/btr-ivf-i8-race/$seed"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val corpus = randVecs(0L until 100L, seed)
      SimilarityOps.ivfIndexBuild(df(corpus), dir, nlist = 4, fitSampleRows = 100,
        vectorStorage = "i8")
      val qs = df(corpus.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
      def exactOver(rows: Seq[(Long, Seq[Float])]): Set[(Long, Long)] =
        SimilarityOps.bruteForceTopK(qs, df(rows), 3).collect()
          .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      val pre = exactOver(corpus)

      // serve resolves (and runs its internal shortlist actions) NOW...
      val pending = SimilarityOps.ivfTopKServe(qs, dir, k = 3, nprobe = 4)
      // ...then a refresh lands BEFORE the caller's collect
      val inc = randVecs(1000L until 1030L, seed + 1)
      val feed = inc.map { case (id, v) => (id, v, "insert", 1L) }
        .toDF("cid", "cvec", "_change_type", "_commit_version")
      SimilarityOps.ivfIndexRefresh(feed, dir,
        txnAppId = Some(s"i8race$seed"), txnVersion = Some(1L))

      val gotRows = pending.collect()
      val perQid = gotRows.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length)
      assert(perQid.values.forall(_ == 3),
        s"seed=$seed: mid-refresh i8 serve dropped neighbors (${perQid.toMap})")
      val got = gotRows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      assert(got == pre,
        s"seed=$seed: in-flight i8 serve diverged from its pinned snapshot")

      // a fresh serve observes the refreshed index in full
      val post = exactOver(corpus ++ inc)
      val fresh = SimilarityOps.ivfTopKServe(qs, dir, k = 3, nprobe = 4).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      assert(fresh == post,
        s"seed=$seed: post-refresh i8 serve missed the refreshed rows")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  // VERDICT r18 #5: ivfTopKIndexed(trustIndex=true) serves whatever the
  // index contains; the contract is caller-asserted freshness via
  // ivfIndexFresh. Race arm: a corpus commit lands BETWEEN the freshness
  // proof and the serve — the trusted result must still be exactly the
  // proven snapshot's answer (the index's own content — never a torn mix,
  // never silently-partial new rows), and the freshness proof must flip
  // false for the next caller. Commit shapes: append, DV delete, and an
  // append + mid-race refresh (where the serve may reflect pre XOR post —
  // the btr snapshot-consistency contract — but never a mix).
  test("trusted-path staleness: commit between freshness proof and serve stays snapshot-exact") {
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
    for (seed <- Seq(71L, 72L, 73L, 74L, 75L, 76L)) {
      val root = s"/tmp/btr-ivf-trust-fuzz/$seed"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val corpusDir = s"$root/corpus"
      val idxDir = s"$root/index"
      val rnd = new scala.util.Random(seed)
      val n = 80 + rnd.nextInt(80)
      val corpus = randVecs(0L until n.toLong, seed)
      df(corpus).write.format("btr").mode("overwrite").save(corpusDir)
      val p = new org.apache.hadoop.fs.Path(corpusDir)
      val fs = p.getFileSystem(graft.format.BtrTableMeta.hadoopConf())
      val v0 = graft.sources.BtrLog.latestVersion(fs, fs.makeQualified(p)).get
      SimilarityOps.ivfIndexBuild(
        spark.read.format("btr").load(corpusDir), idxDir, nlist = 4,
        fitSampleRows = 100, corpusVersion = Some(v0))

      // 1. the freshness PROOF
      assert(SimilarityOps.ivfIndexFresh(idxDir, corpusDir), s"seed=$seed: built fresh")
      val qs = df(corpus.take(3)).select(col("cid").as("qid"), col("cvec").as("qvec"))
      val cands = spark.read.format("btr").load(corpusDir)
      val trusted = SimilarityOps.ivfTopKIndexed(
        qs, cands, idxDir, k = 5, nprobe = 4, trustIndex = true)

      // 2. the RACING corpus commit, landing before the serve executes
      val commit = rnd.nextInt(3)
      val inc = randVecs(1000L until 1020L, seed + 1)
      commit match {
        case 0 => df(inc).write.format("btr").mode("append").save(corpusDir)
        case 1 => spark.sql(s"DELETE FROM graft.`$corpusDir` WHERE cid % 5 = 4")
        case 2 =>
          df(inc).write.format("btr").mode("append").save(corpusDir)
          val v1 = graft.sources.BtrLog.latestVersion(fs, fs.makeQualified(p)).get
          val feed = inc.map { case (id, v) => (id, v, "insert", v1) }
            .toDF("cid", "cvec", "_change_type", "_commit_version")
          SimilarityOps.ivfIndexRefresh(feed, idxDir,
            txnAppId = Some(s"race$seed"), txnVersion = Some(v1))
      }

      // 3. the SERVE: exactly the proven snapshot's answer — or, when a
      // refresh raced in too (case 2), exactly the post-refresh answer;
      // never a torn mix of the two
      val got = trusted.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rank"))).toSet
      def exactOver(rows: Seq[(Long, Seq[Float])]): Set[(Long, Long, Int)] =
        SimilarityOps.bruteForceTopK(qs, df(rows), 5).collect()
          .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rank"))).toSet
      val pre = exactOver(corpus)
      val ok = commit match {
        case 2 =>
          val post = exactOver(corpus ++ inc)
          got == pre || got == post
        case _ => got == pre
      }
      assert(ok, s"seed=$seed commit=$commit: trusted serve diverged from the " +
        "proven snapshot (and, for the refresh race, from the post state too)")

      // 4. freshness flips false for the NEXT caller — except when the
      // racing refresh itself re-proved it (case 2, the honest outcome)
      val freshAfter = SimilarityOps.ivfIndexFresh(idxDir, corpusDir)
      if (commit == 2) assert(freshAfter,
        s"seed=$seed: refresh reached the commit's version — fresh again")
      else assert(!freshAfter,
        s"seed=$seed commit=$commit: unrefreshed corpus commit must flip ivf_index_fresh false")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
