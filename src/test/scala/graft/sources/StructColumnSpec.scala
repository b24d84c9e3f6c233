package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Struct columns: one footer column whose chunk is self-describing —
  * per-leaf tag + length + independently scheme-selected payload. Covers
  * lossless round-trip across every scalar leaf type, struct-null vs
  * leaf-null distinction, pruned leaf projections (unrequested leaves
  * skip decoding), filters on leaves, and schema evolution adding a
  * struct column.
  */
class StructColumnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("struct-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-struct-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("structs of every scalar leaf type round-trip losslessly") {
    val dir = tmp("roundtrip")
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      col("id").cast("int").as("k"),
      struct(
        col("id").cast("int").as("i"),
        col("id").cast("long").as("l"),
        (col("id") * 1.5).as("d"),
        col("id").cast("float").as("f"),
        concat(lit("s"), col("id")).as("s"),
        (col("id") % 2 === 0).as("b"),
        date_add(lit(java.sql.Date.valueOf("2026-01-01")), col("id").cast("int")).as("dt")
      ).as("rec"))
    df.write.format("btr").mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema("rec").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    // compare field-by-field against the source
    val a = df.select(col("k"), col("rec.i"), col("rec.l"), col("rec.d"), col("rec.f"),
      col("rec.s"), col("rec.b"), col("rec.dt").cast("string")).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Int])
    val b = back.select(col("k"), col("rec.i"), col("rec.l"), col("rec.d"), col("rec.f"),
      col("rec.s"), col("rec.b"), col("rec.dt").cast("string")).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Int])
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("struct-null and leaf-null are distinct after round-trip") {
    val dir = tmp("nulls")
    import spark.implicits._
    val df = spark.range(0, 100).select(
      col("id").cast("int").as("k"),
      when(col("id") % 3 === 0, lit(null))
        .otherwise(struct(
          when(col("id") % 5 === 0, lit(null).cast("long")).otherwise(col("id")).as("v"),
          concat(lit("x"), col("id")).as("s")))
        .as("rec"))
    df.write.format("btr").mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)

    assert(back.filter(col("rec").isNull).count() == df.filter(col("rec").isNull).count())
    assert(back.filter(col("rec").isNotNull && col("rec.v").isNull).count() ==
      df.filter(col("rec").isNotNull && col("rec.v").isNull).count())
    assert(back.filter(col("rec.v") === 7L).select("k").as[Int].collect().toSeq == Seq(7))
    // aggregates over leaves
    val s1 = df.agg(sum("rec.v")).head().getLong(0)
    val s2 = back.agg(sum("rec.v")).head().getLong(0)
    assert(s1 == s2)
  }

  test("pruned leaf projections decode only the requested leaves") {
    val dir = tmp("prune")
    import spark.implicits._
    spark.range(0, 10000).select(
      struct(col("id").as("a"),
        (col("id") * 2).as("b"),
        concat(lit("wide-payload-"), col("id")).as("c")).as("rec"))
      .write.format("btr").mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    // nested schema pruning: only rec.a requested
    val pruned = back.select(col("rec.a"))
    assert(pruned.as[Long].collect().sorted.toSeq == (0L until 10000L).toSeq)
    // the optimized plan's scan schema should not carry leaf c when
    // nested pruning applies (Spark config default on). This is a
    // plan-shape observation, not a hard contract: fall back to value
    // correctness if the pruned schema isn't visible.
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves().map(_.schema).headOption
    scanSchema.foreach { s =>
      val rec = s.fields.find(_.name == "rec")
      rec.foreach { f =>
        val st = f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        assert(!st.fieldNames.contains("c"), s"leaf c not pruned: ${st.simpleString}")
      }
    }
    // two-leaf projection in reversed order still maps onto file slots
    val two = back.select(col("rec.b"), col("rec.a")).as[(Long, Long)].collect()
    assert(two.forall { case (b, a) => b == a * 2 })
  }

  test("appends may add a struct column; old files read it as null") {
    val dir = tmp("evolve")
    import spark.implicits._
    Seq((1, "x")).toDF("k", "s").write.format("btr").mode("overwrite").save(dir)
    Seq((2, "y", (10L, "m")))
      .toDF("k", "s", "rec")
      .write.format("btr").mode("append").save(dir)

    val back = spark.read.format("btr").load(dir).orderBy("k")
    assert(back.filter(col("rec").isNull).select("k").as[Int].collect().toSeq == Seq(1))
    assert(back.filter(col("rec._1") === 10L).select("k").as[Int].collect().toSeq == Seq(2))
  }

  test("NESTED structs and array leaves round-trip losslessly (depth 2)") {
    val dir = tmp("nested")
    import spark.implicits._
    // two-level provenance shape: rec.score scalar, rec.prov.{url,domain}
    // nested struct, rec.tokens array leaf — nulls at both levels
    val df = spark.range(0, 2000).select(
      col("id").cast("int").as("k"),
      when(col("id") % 13 === 0, lit(null)).otherwise(
        struct(
          (col("id") * 0.5).as("score"),
          when(col("id") % 7 === 0, lit(null)).otherwise(
            struct(concat(lit("http://u"), col("id")).as("url"),
              concat(lit("d"), col("id") % 10).as("domain"))).as("prov"),
          when(col("id") % 5 === 0, lit(null)).otherwise(
            array(col("id"), col("id") * 2)).as("tokens"))).as("rec"))
    df.coalesce(2).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "nested round-trip mismatch")
    // leaf-only projection at depth 2
    val urls = back.select(col("rec.prov.url")).filter(col("rec.prov.url").isNotNull)
    assert(urls.count() == df.filter(col("rec.prov.url").isNotNull).count())
    // leaf predicate at depth 2 returns exact rows
    val got = back.filter(col("rec.prov.domain") === "d3").select("k")
      .as[Int].collect().sorted.toSeq
    val want = df.filter(col("rec.prov.domain") === "d3").select("k")
      .as[Int].collect().sorted.toSeq
    assert(got == want && got.nonEmpty, s"${got.length} vs ${want.length}")
  }

  test("depth-2 leaf predicates SKIP chunks via recursive footer leaf stats") {
    val dir = tmp("nested-skip")
    import spark.implicits._
    // k clusters by chunk (blockSize 512), so rec.inner.k bounds separate
    spark.range(0, 8192).select(
        struct(struct(col("id").as("k")).as("inner")).as("rec"), col("id"))
      .coalesce(1).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.filter(col("rec.inner.k") === 7000).count() == 1)
    assert(back.filter(col("rec.inner.k") < 0).count() == 0)
    // the depth-2 predicate PUSHES (V2 → dotted V1 filter on the scan)
    val plan = back.filter(col("rec.inner.k") === 7000)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(plan.contains("rec.inner.k"), s"depth-2 predicate not pushed: $plan")
  }

  test("struct-leaf predicates push (V2) and late-materialize: empty groups skip siblings") {
    val dir = tmp("latemat")
    import spark.implicits._
    // every chunk's leaf g straddles 0..100, so planning can't skip; a
    // row-level look at g proves interior-range groups empty
    spark.range(0, 8192).select(
        struct((when(col("id") % 2 === 0, 0).otherwise(100)).as("g"),
          concat(lit("payload-"), col("id"), lit("x" * 20)).as("s")).as("rec"),
        col("id"))
      .coalesce(1).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    val plan = back.filter(col("rec.g") > 40 && col("rec.g") < 60)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(plan.contains("rec.g"), s"nested predicate not pushed: $plan")

    val skipped0 = BtrLateMat.groupsSkipped.get()
    assert(back.filter(col("rec.g") > 40 && col("rec.g") < 60).count() == 0)
    val skipped = BtrLateMat.groupsSkipped.get() - skipped0
    assert(skipped >= 8, s"expected row groups skipped via the leaf predicate, got $skipped")

    // null-semantics sanity on the same path: struct-null rows fail
    // rec.g comparisons, match IS NULL
    val nd = tmp("latemat-nulls")
    spark.range(0, 100).select(col("id"),
        when(col("id") % 4 === 0, lit(null))
          .otherwise(struct(col("id").as("g"))).as("rec"))
      .write.format("btr").mode("overwrite").save(nd)
    val t = spark.read.format("btr").load(nd)
    assert(t.filter(col("rec.g") >= 0).count() == 75)
    assert(t.filter(col("rec.g").isNull).count() == 25)
  }

  test("leaf stats skip chunks at planning: a clustered leaf range decodes one group") {
    val dir = tmp("leafskip")
    import spark.implicits._
    // leaf g is sorted, so each 512-row chunk covers a disjoint g range;
    // v7 footers carry per-leaf min/max — an interior point predicate
    // must plan (and decode) only the one covering group
    spark.range(0, 8192).select(
        struct(col("id").as("g"),
          concat(lit("p"), lpad(col("id").cast("string"), 5, "0")).as("s")).as("rec"))
      .coalesce(1).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    // the decode counter is global and suites run in parallel — measure
    // in a retry loop and accept the quietest observation (a true
    // skip-failure decodes all 16 groups on EVERY attempt)
    def minDecodes(q: => Long): Long =
      (0 until 5).map { _ =>
        val d0 = BtrLateMat.chunkDecodes.get()
        assert(q == 1L)
        BtrLateMat.chunkDecodes.get() - d0
      }.min
    val intDecodes = minDecodes(back.filter(col("rec.g") === 4000).count())
    assert(intDecodes <= 2, s"expected planning-time leaf skip, got $intDecodes chunk decodes")
    // string leaf bounds skip too
    val strDecodes = minDecodes(back.filter(col("rec.s") === "p04000").count())
    assert(strDecodes <= 2, s"string leaf bounds did not skip: $strDecodes")
  }

  test("OPTIMIZE CLUSTER BY a struct leaf makes leaf stats disjoint again") {
    val dir = tmp("cluster-leaf")
    import spark.implicits._
    // unordered leaf: every chunk straddles the full range → no skip
    spark.range(0, 8192).select(
        struct(((col("id") * 2654435761L) % 8192).as("g"),
          concat(lit("p"), col("id")).as("s")).as("rec"))
      .coalesce(1).write.format("btr").option("btr.blockSize", "512")
      .mode("overwrite").save(dir)

    BtrCompact.rewriteClustered(spark, dir, Seq("rec.g"))

    val back = spark.read.format("btr").load(dir)
    val want = back.filter(col("rec.g") === 4000).count()
    def minDecodes(q: => Long): Long =
      (0 until 5).map { _ =>
        val d0 = BtrLateMat.chunkDecodes.get()
        assert(q == want)
        BtrLateMat.chunkDecodes.get() - d0
      }.min
    val decodes = minDecodes(back.filter(col("rec.g") === 4000).count())
    assert(decodes <= 3, s"clustered leaf should skip to ~1 group, got $decodes")
  }

  test("OPTIMIZE compact and clustered rewrite preserve struct columns") {
    val dir = tmp("optimize")
    import spark.implicits._
    spark.range(0, 2000).select(col("id"),
        struct((col("id") % 10).as("g"), concat(lit("v"), col("id")).as("s")).as("rec"))
      .repartition(4).write.format("btr").mode("overwrite").save(dir)

    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    val afterCompact = spark.read.format("btr").load(dir)
    assert(afterCompact.count() == 2000)
    assert(afterCompact.filter(col("rec.g") === 3).count() == 200)

    BtrCompact.rewriteClustered(spark, dir, Seq("id"))
    val t = spark.read.format("btr").load(dir)
    assert(t.filter(col("rec.g") === 3).count() == 200)
    assert(t.filter(col("id") === 55).select(col("rec.s")).as[String].head() == "v55")
  }

  test("multimodal-style metadata struct: filter + group over leaves") {
    val dir = tmp("meta")
    import spark.implicits._
    spark.range(0, 5000).select(
      col("id").as("doc_id"),
      struct(
        (col("id") % 4).cast("int").as("width"),
        (col("id") % 7).cast("int").as("height"),
        concat(lit("codec"), col("id") % 3).as("codec")).as("media"))
      .write.format("btr").mode("overwrite").save(dir)

    val back = spark.read.format("btr").load(dir)
    val agg = back.filter(col("media.width") === 2)
      .groupBy(col("media.codec")).agg(count(lit(1)).as("n"), sum("media.height").as("h"))
      .orderBy("codec")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = spark.range(0, 5000).select((col("id") % 4).cast("int").as("w"),
        (col("id") % 7).cast("int").as("h"), concat(lit("codec"), col("id") % 3).as("c"))
      .filter(col("w") === 2).groupBy("c").agg(count(lit(1)), sum("h")).orderBy("c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(agg == expect)
  }
}
