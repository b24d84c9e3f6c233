package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two btr tables hive-partitioned on the same
  * key report KeyGroupedPartitioning (+ per-split partition keys), so with
  * `spark.sql.sources.v2.bucketing.enabled` Spark plans the join
  * co-located — ZERO shuffle on either side. At 100 TB this is the
  * difference between a fact-fact join moving nothing and moving both
  * tables across the cluster.
  */
class StoragePartitionJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("spj-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(name: String) = s"/tmp/btr-spj/$name"

  // the shared test JVM reuses one SparkSession across suites, so SPJ
  // mode is scoped per test body instead of set on the builder (where it
  // would leak into every later suite's plan assertions)
  private def withSpj[T](extra: (String, String)*)(body: => T): T =
    withConf((Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // rows inside a key-grouped partition are trivially sorted by the
      // (constant) partition key; with this on Spark uses that ordering
      // and SMJ over SPJ drops its sorts too
      "spark.sql.sources.v2.bucketing.sorting.enabled" -> "true") ++ extra): _*)(body)

  test("co-partitioned btr tables join with zero shuffle") {
    val facts = (0 until 2000).map(i => (s"k${i % 5}", i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val dims = (0 until 50).map(i => (s"k${i % 5}", s"name-$i"))
      .toDF("k", "name")
    // repartition by the partition column → one file per partition dir
    // (the layout compaction converges to): Spark only trusts reported
    // ordering when each key group is a single split
    facts.repartition($"k").write.format("btr").partitionBy("k").mode("overwrite")
      .save(tmp("facts"))
    dims.repartition($"k").write.format("btr").partitionBy("k").mode("overwrite")
      .save(tmp("dims"))

    val fb = spark.read.format("btr").load(tmp("facts"))
    val db = spark.read.format("btr").load(tmp("dims"))

    withSpj("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fb.join(db, Seq("k"))
      val got = joined.groupBy("k").agg(count(lit(1)).as("n"), sum($"id").as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = facts.join(dims, Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"), sum($"id").as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, "co-located join returns identical results")

      val plan = {
        val q = fb.join(db, Seq("k")).select("k", "id", "name")
        q.collect()
        q.queryExecution.executedPlan
      }
      val shuffles = collect(plan) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected a storage-partitioned join with zero shuffles, got ${shuffles.length}:\n$plan")
      // the scan reports ordering by the (constant-per-split) partition
      // key, so a sort-merge join here must also skip both SortExecs —
      // SPJ is zero-shuffle AND zero-sort
      val sorts = collect(plan) { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.isEmpty,
        s"expected the reported partition-key ordering to elide join sorts:\n$plan")
    }
  }

  test("OPTIMIZE converges many-file partitions to the zero-sort SPJ layout") {
    // unclustered writes: 4 round-robin tasks × 5 keys → 4 files per
    // partition dir; each key group then spans several splits, so Spark
    // cannot trust the reported ordering and SMJ keeps its sorts
    val facts = (0 until 2000).map(i => (s"k${i % 5}", i.toLong)).toDF("k", "id")
    val dims = (0 until 50).map(i => (s"k${i % 5}", s"name-$i")).toDF("k", "name")
    // distribution=none: the default write layout would converge each
    // partition to one file up front — this fixture NEEDS the scatter
    facts.repartition(4).write.format("btr").partitionBy("k").mode("overwrite")
      .option("btr.write.distribution", "none").save(tmp("opt_facts"))
    dims.repartition(2).write.format("btr").partitionBy("k").mode("overwrite")
      .option("btr.write.distribution", "none").save(tmp("opt_dims"))
    def filesPerDir(p: String): Map[String, Int] =
      new java.io.File(p).listFiles()
        .filter(d => d.isDirectory && !d.getName.startsWith("_")).map { d =>
          d.getName -> d.listFiles().count(f => f.getName.endsWith(".btr"))
        }.toMap
    assert(filesPerDir(tmp("opt_facts")).values.forall(_ > 1), "precondition: many files/dir")

    withSpj("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def planOf() = {
        val q = spark.read.format("btr").load(tmp("opt_facts"))
          .join(spark.read.format("btr").load(tmp("opt_dims")), Seq("k"))
          .select("k", "id", "name")
        q.collect()
        q.queryExecution.executedPlan
      }
      val before = planOf()
      assert(collect(before) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"grouped SPJ should already avoid shuffles:\n$before")
      assert(collect(before) { case s: org.apache.spark.sql.execution.SortExec => s }.nonEmpty,
        s"multi-split key groups should still require join sorts:\n$before")

      val (fb0, fb1) = BtrCompact.optimizePartitioned(spark, tmp("opt_facts"))
      val (db0, db1) = BtrCompact.optimizePartitioned(spark, tmp("opt_dims"))
      assert(fb1 == 5 && db1 == 5, s"one file per partition dir: $fb0->$fb1, $db0->$db1")
      assert(filesPerDir(tmp("opt_facts")).values.forall(_ == 1))

      val after = planOf()
      assert(collect(after) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"OPTIMIZE must keep SPJ zero-shuffle:\n$after")
      assert(collect(after) { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"one-file-per-partition layout must elide join sorts:\n$after")
      // rows unchanged by the optimize
      val got = spark.read.format("btr").load(tmp("opt_facts"))
        .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == facts.groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
  }

  test("GROUP BY the partition key aggregates without an exchange") {
    val df = (0 until 1000).map(i => (s"k${i % 4}", i.toLong)).toDF("k", "v")
    df.write.format("btr").partitionBy("k").mode("overwrite").save(tmp("aggtab"))
    val back = spark.read.format("btr").load(tmp("aggtab"))
    withSpj() {
      // data-column aggregate so the metadata-only agg pushdown path does
      // not replace the scan — this tests the exchange elision itself
      val q = back.groupBy("k").agg(sum(expr("v * 2")).as("s"))
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = df.groupBy("k").agg(sum(expr("v * 2")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
      val plan = { q.collect(); q.queryExecution.executedPlan }
      val shuffles = collect(plan) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"group-by on the partition key must reuse the key-grouped layout:\n$plan")
    }
  }

  test("bucket(8,id)-partitioned tables join with ZERO shuffle (transform SPJ)") {
    // catalog-loaded relations carry the FunctionCatalog that resolves
    // the reported bucket transform (BtrBucketFunction); both sides bind
    // the same canonical function + bucket count → co-partitioned
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    val pa = tmp("bucket_facts"); val pb = tmp("bucket_dims")
    Seq(pa, pb).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    spark.sql(s"CREATE TABLE graft.`$pa` (id BIGINT, v DOUBLE) " +
      "USING btr PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE graft.`$pb` (id BIGINT, name STRING) " +
      "USING btr PARTITIONED BY (bucket(8, id))")
    (0 until 4000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .repartition(4).writeTo(s"graft.`$pa`").append()
    (0 until 500).map(i => (i.toLong, s"n-$i")).toDF("id", "name")
      .repartition(2).writeTo(s"graft.`$pb`").append()
    withSpj("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = spark.table(s"graft.`$pa`")
        .join(spark.table(s"graft.`$pb`"), Seq("id"))
        .select("id", "v", "name")
      val rows = q.collect()
      assert(rows.length == 500)
      assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 500L))
      val plan = q.queryExecution.executedPlan
      val shuffles = collect(plan) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected a bucket-transform SPJ with zero shuffles, got ${shuffles.length}:\n$plan")
    }
  }

  test("joining an unpartitioned side shuffles ONLY that side to the key-grouped layout") {
    val facts = (0 until 3000).map(i => (s"k${i % 4}", i.toLong)).toDF("k", "id")
    facts.repartition($"k").write.format("btr").partitionBy("k").mode("overwrite")
      .save(tmp("facts_one_sided"))
    val small = (0 until 40).map(i => (s"k${i % 4}", s"n$i")).toDF("k", "name")
    small.write.format("btr").mode("overwrite").save(tmp("small_flat"))
    val fb = spark.read.format("btr").load(tmp("facts_one_sided"))
    val sb = spark.read.format("btr").load(tmp("small_flat"))
    withSpj(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // shuffle the OTHER side into our reported key-grouped layout
      // instead of shuffling both sides to a hash partitioning — at scale
      // this is "the 100 TB fact table never moves"
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val q = fb.join(sb, Seq("k"))
      val got = q.groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = facts.join(small, Seq("k")).groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
      val plan = { q.collect(); q.queryExecution.executedPlan }
      val shuffles = collect(plan) { case e: ShuffleExchangeExec => e }
      assert(shuffles.length == 1,
        s"expected exactly one shuffle (the unpartitioned side), got ${shuffles.length}:\n$plan")
      // and it must not be the fact side: no shuffle sits above the
      // partitioned table's scan
      shuffles.foreach { e =>
        val factScans = collect(e.child) {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.toString.contains("facts_one_sided") => b
        }
        assert(factScans.isEmpty, s"the partitioned fact side must not shuffle:\n$plan")
      }
    }
  }

  test("IVF assign table bucketed like the corpus: the membership join is zero-shuffle") {
    // the persisted-IVF 100 TB shape: the corpus table and the index's
    // assign table share bucket(8, id) layout, so the per-query
    // membership join (candidates ⋈ assign ON id) plans as a
    // storage-partitioned join — the corpus never moves
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    val corpus = tmp("ivf_corpus"); val idx = tmp("ivf_index")
    Seq(corpus, idx).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    spark.sql(s"CREATE TABLE graft.`$corpus` (cid BIGINT, cvec ARRAY<FLOAT>) " +
      "USING btr PARTITIONED BY (bucket(8, cid))")
    val rnd = new scala.util.Random(31)
    (0 until 2000).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("cid", "cvec").repartition(4).writeTo(s"graft.`$corpus`").append()
    graft.functions.SimilarityOps.ivfIndexBuild(
      spark.table(s"graft.`$corpus`"), idx, nlist = 8, fitSampleRows = 200,
      assignPartitionSpec = Seq("bucket(8,cid)"))
    withSpj("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = spark.table(s"graft.`$corpus`")
        .join(spark.table(
          s"graft.`${graft.functions.SimilarityOps.ivfIndexAssignPath(idx)}`"), Seq("cid"))
        .select("cid", "cluster")
      val rows = q.collect()
      assert(rows.length == 2000, s"every corpus row has exactly one cell: ${rows.length}")
      val plan = q.queryExecution.executedPlan
      val shuffles = collect(plan) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"corpus ⋈ assign must be a bucket SPJ with zero shuffles:\n$plan")
    }
  }

  test("results stay exact when one side is missing a partition") {
    val left = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "lv")
    val right = Seq(("a", 10L), ("b", 20L)).toDF("k", "rv") // no "c"
    left.write.format("btr").partitionBy("k").mode("overwrite").save(tmp("left"))
    right.write.format("btr").partitionBy("k").mode("overwrite").save(tmp("right"))
    val lb = spark.read.format("btr").load(tmp("left"))
    val rb = spark.read.format("btr").load(tmp("right"))
    withSpj("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val inner = lb.join(rb, Seq("k")).select("k", "lv", "rv")
        .collect().map(_.toString).sorted
      assert(inner.toSeq == Seq("[a,1,10]", "[b,2,20]"))
      val outer = lb.join(rb, Seq("k"), "left").select("k", "lv", "rv")
        .collect().map(_.toString).sorted
      assert(outer.toSeq == Seq("[a,1,10]", "[b,2,20]", "[c,3,null]"))
    }
  }

  test("unpartitioned tables and pruned partition columns fall back cleanly") {
    val df = (0 until 100).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "id")
    df.write.format("btr").mode("overwrite").save(tmp("flat"))
    val back = spark.read.format("btr").load(tmp("flat"))
    withSpj() {
      // unpartitioned: plain join still correct
      assert(back.join(back.select($"k".as("k2"), $"id".as("id2")),
        $"k" === $"k2").count() == df.join(
        df.select($"k".as("k2"), $"id".as("id2")), $"k" === $"k2").count())
      // partitioned but partition column pruned from output: reads stay exact
      val part = tmp("flat_part")
      df.write.format("btr").partitionBy("k").mode("overwrite").save(part)
      val ids = spark.read.format("btr").load(part).select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until 100L))
    }
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
