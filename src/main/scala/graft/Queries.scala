package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-trip cache: every core query runs over data that has been written
  * through the btr format and read back — so a DuckDB-vs-Spark match
  * proves the format losslessly round-trips AND Catalyst composes over
  * our scan (SURVEY.md §2.7). Cached per (sfDir, table) under /tmp.
  */
object Btr {
  /** Bump when the writer's footer layout/stats change, so a stale cache
    * from an older build is never scanned.
    */
  private val CacheVersion = "v9" // footer v6: per-column NDV sketches

  /** Max mtime over the source dir's parquet files — part of the cache
    * key so a driver-regenerated testdata set (same paths, new contents)
    * can never be served from a stale btr cache.
    */
  private def dirStamp(sfDir: String): String = {
    val fs = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty[java.io.File])
    val m = fs.filter(_.getName.endsWith(".parquet")).map(_.lastModified()).foldLeft(0L)(math.max)
    java.lang.Long.toHexString(m)
  }

  private def cacheDir(sfDir: String, table: String): String = {
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    s"/tmp/graft-btr-cache/$CacheVersion/${key}_${dirStamp(sfDir)}/$table"
  }

  /** Public path of a cached btr table (for inspection queries). */
  def cachePath(sfDir: String, table: String): String = cacheDir(sfDir, table)

  /** Table round-tripped through the btr format (write once, then read). */
  def t(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val dir = cacheDir(sfDir, table)
    val meta = new java.io.File(dir, "_btr_meta.json")
    if (!meta.exists()) {
      spark.read.parquet(s"$sfDir/$table.parquet")
        .write.format("btr").mode("overwrite").save(dir)
    }
    spark.read.format("btr").load(dir)
  }

  /** Direct parquet read (for types the format doesn't store, e.g. the
    * embeddings array column).
    */
  def pq(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark.read.parquet(s"$sfDir/$table.parquet")
  }
}

/** The core query surface (SURVEY.md §2.7): every query here runs in Spark
  * over btr-round-tripped tables and has an equivalent DuckDB oracle over
  * the original parquet. Column aliases match the oracle SQL exactly.
  */
object CoreQueries {
  import Btr.t

  // ---- scale note ----------------------------------------------------
  // Every query is declarative DataFrame API: filters/projections reach
  // the btr scan (pushdown + pruning), aggregations are partial (map-side
  // combine), small dimensions are broadcast. Global-order window queries
  // (q_runs) exist to mirror the reference's full-column statistics and
  // are bounded to stat-sized outputs.

  /** Timestamp columns are compared as formatted strings — parquet ms/ns
    * physical types reach Spark and DuckDB differently (ntz vs ts), so the
    * string form is the type-stable comparison surface.
    */
  private def tsFmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Cached hive-partitioned lineitem (partitionBy l_returnflag), shared
    * by the partition-pruning queries; built once per (sf, cache version).
    * Single atomic-commit write, so meta existence == complete.
    */
  private def lineitemByFlag(s: SparkSession, d: String): DataFrame = {
    val dir = Btr.cachePath(d, "lineitem_by_flag")
    if (!new java.io.File(dir, "_btr_meta.json").exists()) {
      Btr.pq(s, d, "lineitem").write.format("btr")
        .partitionBy("l_returnflag").mode("overwrite").save(dir)
    }
    s.read.format("btr").load(dir)
  }

  /** Two-commit lineitem for the time-travel oracle: version 1 holds
    * only the low-quantity rows, version 2 appends the rest. Built once
    * per (sf, cache version); both commits run in one guarded block so a
    * half-built table can't publish (meta exists only after commit 1, and
    * the version count is re-checked to heal a crash between commits).
    */
  private def lineitemTwoCommits(s: SparkSession, d: String): String = {
    val dir = Btr.cachePath(d, "lineitem_tt")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    def versionCount =
      graft.sources.BtrLog.latestVersion(fs, root).getOrElse(0L)
    if (!new java.io.File(dir, "_btr_meta.json").exists() || versionCount < 2) {
      val li = Btr.pq(s, d, "lineitem")
      li.filter(col("l_quantity") <= 25)
        .write.format("btr").mode("overwrite").save(dir)
      li.filter(col("l_quantity") > 25)
        .write.format("btr").mode("append").save(dir)
    }
    dir
  }

  /** URL-shaped high-uniqueness strings (one distinct URL per lineitem
    * row, long shared substrings): the corpus where the FSST gate
    * (unique ≥ non-null/2 AND >16 KiB — scheme/string/Fsst.cpp:119-127)
    * must fire under NATURAL selection and beat dict. The derivation uses
    * only integer/string columns so DuckDB reproduces the bytes exactly.
    */
  private def fsstUrlsDir(s: SparkSession, d: String): String = {
    val dir = Btr.cachePath(d, "fsst_urls")
    if (!new java.io.File(dir, "_btr_meta.json").exists()) {
      Btr.pq(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat(lit("https://cdn.example.com/assets/"), col("l_returnflag"),
          lit("/item-"), col("l_partkey").cast("string"),
          lit("-"), col("l_suppkey").cast("string"),
          lit("/v"), col("l_linenumber").cast("string"),
          lit("?session="), col("l_orderkey").cast("string")).as("url"))
        .write.format("btr").mode("overwrite").save(dir)
    }
    dir
  }

  /** Pseudodecimal-abort-shaped ledger doubles — exact cents on ~1e9
    * currency units, so every digit (~1e11) overflows the reference
    * port's 31-bit pseudodecimal cap (ref
    * scheme/double/Pseudodecimal.cpp:113-119): the shape the opt-in ALP
    * scheme exists for (BASELINE.md round-20 must-win). Written with the
    * full registered pool and double selection FORCED to alp so the
    * driver gate hash-checks the codec's lossless round-trip end-to-end
    * (natural selection on this shape is CodecSpec/BiCorpusSpec-pinned).
    * Integer-only derivation, all intermediates < 2^53, so DuckDB
    * reproduces the exact IEEE doubles.
    */
  private def alpLedgerDir(s: SparkSession, d: String): String = {
    val dir = Btr.cachePath(d, "alp_ledger")
    if (!new java.io.File(dir, "_btr_meta.json").exists()) {
      Btr.pq(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        ((lit(100000000000L) + col("l_orderkey") * lit(100000L) +
          col("l_partkey") * lit(10L) + col("l_linenumber"))
          .cast("double") / lit(100.0)).as("ledger_amount"))
        .write.format("btr").mode("overwrite")
        .option("btr.schemes",
          (graft.format.BtrConfig.intByName.keySet ++
            graft.format.BtrConfig.doubleByName.keySet ++
            graft.format.BtrConfig.stringByName.keySet).toSeq.sorted.mkString(","))
        .option("btr.forceScheme.double", "alp")
        .save(dir)
    }
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-fsst: byte-exact round-trip of a high-uniqueness URL column the
    // writer must compress with FSST (dict degenerates at ~100%
    // uniqueness). The oracle re-derives the same strings from the
    // parquet lineitem, so any symbol-table corruption hash-mismatches.
    // FsstSpec pins that this shape actually SELECTS fsst and beats dict.
    "q_fsst_strings" -> ((s, d) => {
      s.read.format("btr").load(fsstUrlsDir(s, d))
        .select(col("l_orderkey"), col("l_linenumber"), col("url"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // Q-alp: bit-exact round-trip of a pseudodecimal-abort-shaped ledger
    // double column through the opt-in ALP scheme (forced; see
    // alpLedgerDir). The oracle recomputes the same IEEE doubles from
    // the parquet lineitem, so any scale-election or digit-cascade
    // corruption hash-mismatches.
    "q_rt_alp_ledger" -> ((s, d) => {
      s.read.format("btr").load(alpLedgerDir(s, d))
        .select(col("l_orderkey"), col("l_linenumber"), col("ledger_amount"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // Q-time-travel: VERSION AS OF 1 sees exactly the first commit's rows
    // (the low-quantity half); the oracle recomputes that slice with a
    // plain filter. A missing or mis-resolved snapshot shows up as extra
    // or missing groups, hash-checked per returnflag.
    "q_time_travel" -> ((s, d) => {
      val dir = lineitemTwoCommits(s, d)
      s.read.format("btr").option("btr.versionAsOf", "1").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Q-changes-feed: the incremental-read primitive (BtrChanges /
    // btr_changes TVF) — rows added in snapshot range (1, 2] of the
    // two-commit table are exactly the second commit's high-quantity
    // half, each attributed to commit 2. The scan plans ONLY the added
    // files; the oracle recomputes the slice with a plain filter.
    "q_changes_feed" -> ((s, d) => {
      val dir = lineitemTwoCommits(s, d)
      graft.sources.BtrChanges.between(s, dir, 1L, 2L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"),
          max(col("_commit_version")).as("commit_v"),
          max(col("_change_type")).as("change_type"))
        .orderBy("l_returnflag")
    }),

    // Q-identity: lossless round-trip of every lineitem column
    "q_rt_identity" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          tsFmt(col("l_shipdate")).as("l_shipdate_s"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q-projection: column pruning (only 2 of 11 column blocks read)
    "q_rt_projection" -> ((s, d) => {
      t(s, d, "lineitem").select("l_orderkey", "l_extendedprice")
        .orderBy("l_orderkey", "l_extendedprice")
    }),

    // Q-filter: predicate pushdown + chunk skipping
    "q_rt_filter" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") >= 10 && col("l_quantity") <= 20 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q-filter with a MIXED disjunction: one side pushable (equality —
    // bloom/min-max skippable), the other not (modulo). Guards the
    // round-15 wrong-results class: a partial V1 translation of an OR
    // used as a skip filter silently drops the untranslatable side's
    // rows. The whole predicate must stay residual; every row returns.
    "q_or_filter" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" || col("l_orderkey") % 7 === 0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).cast("long").as("sum_okey"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Q-agg-filter-mix: footer-pushable aggregate SHAPES (min/max/count/
    // sum) composed over a mixed-polarity filter (NOT over equality OR an
    // untranslatable modulo). The aggregate must answer from the FILTERED
    // rows — a pushed metadata-only aggregate ignoring the residual filter
    // (the agg-pushdown cousin of the r15 OR-translation bug) would return
    // whole-table numbers. Pinned here and by the BtrFuzzSpec agg-seam arm.
    "q_agg_filter_mix" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(!(col("l_returnflag") === "R") || col("l_orderkey") % 7 === 0)
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"),
          sum(col("l_linenumber")).cast("long").as("sum_line"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // Q-stats over an integer column (NumberStats surface)
    "q_stats_int" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_vals"),
        min(col("l_orderkey")).as("min_v"),
        max(col("l_orderkey")).as("max_v"),
        countDistinct(col("l_orderkey")).as("n_distinct"),
        sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_nulls"))
    }),

    // Q-stats over a double column
    "q_stats_double" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(col("l_extendedprice")).as("n_vals"),
        round(min(col("l_extendedprice")), 2).as("min_v"),
        round(max(col("l_extendedprice")), 2).as("max_v"),
        round(sum(col("l_extendedprice")), 0).as("sum_v"),
        countDistinct(col("l_extendedprice")).as("n_distinct"))
    }),

    // Q-stats over a string column (StringStats surface)
    "q_stats_string" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(col("l_returnflag")).as("n_vals"),
        countDistinct(col("l_returnflag")).as("n_distinct"),
        min(col("l_returnflag")).as("min_v"),
        max(col("l_returnflag")).as("max_v"),
        sum(length(col("l_returnflag"))).as("total_len"))
    }),

    // Q-partition: hive-style partitioned layout — lineitem partitioned
    // by l_returnflag on write; the partition filter prunes whole
    // directories at planning, partition values synthesize on read
    "q_part_filter" -> ((s, d) => {
      lineitemByFlag(s, d)
        .filter(col("l_returnflag") === "A")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_linestatus")
    }),

    // Q-part-mixed: partition filter AND data filter together — the
    // combination exercises directory pruning + pushed data predicates +
    // late materialization on the same scan (the layer mix where a
    // partition pred evaluated against an unfilled vector once lost rows)
    "q_part_mixed_filter" -> ((s, d) => {
      lineitemByFlag(s, d)
        .filter(col("l_returnflag") === "A" && col("l_quantity") >= 25 &&
          col("l_linenumber") <= 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q-dml: metadata-level DELETE through the SQL surface — a private
    // copy of lineitem is partitioned by returnflag, `DELETE ... WHERE
    // l_returnflag = 'R'` drops those directories via the path catalog,
    // and the surviving table must agree with DuckDB over the complement
    // predicate. Sentinel-marked build (write + delete is two steps)
    "q_dml_delete" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_dml")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .write.format("btr").partitionBy("l_returnflag").mode("overwrite").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"DELETE FROM graft.`$dir` WHERE l_returnflag = 'R'")
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Q-retention: removed-file retention under the oracle gate — the
    // build enables btr.retainRemoved, DELETEs a partition, and the
    // VERSIONED read must still produce the FULL pre-delete table
    // (removed files resolve through the _btr_removed store), matching
    // DuckDB recomputing over all rows. The current read is checked too
    // (complement predicate) via the same grouped shape.
    "q_retained_history" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_ret")
      val done = new java.io.File(dir, "_ret_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
          .write.format("btr").option("btr.retainRemoved", "true")
          .partitionBy("l_returnflag").mode("overwrite").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"DELETE FROM graft.`$dir` WHERE l_returnflag = 'R'")
        java.nio.file.Files.createFile(done.toPath)
      }
      val historical = s.read.format("btr").option("btr.versionAsOf", "1").load(dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      val current = s.read.format("btr").load(dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      historical.withColumn("view", lit("v1"))
        .unionByName(current.withColumn("view", lit("now")))
        .orderBy("view", "l_returnflag")
    }),

    // Q-struct: struct columns through the format — leaves compress
    // under their own scheme selection inside one self-describing chunk,
    // a pruned projection (only rec.qty/rec.flag) skips the unrequested
    // ship leaf's bytes, and the leaf aggregate must agree with DuckDB
    // recomputing from the flat parquet columns.
    "q_struct_meta" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_struct")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"),
            struct(col("l_quantity").as("qty"), col("l_returnflag").as("flag"),
              col("l_shipdate").as("ship")).as("rec"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .filter(col("rec.qty") >= 10)
        .groupBy(col("rec.flag").as("flag"))
        .agg(count(lit(1)).as("n"), round(sum(col("rec.qty")), 2).as("sum_qty"))
        .orderBy("flag")
    }),

    // Q-struct-nested: TWO-LEVEL structs through the format — the
    // recursive composite layout (leaf blobs nested inside leaf blobs),
    // a depth-2 leaf predicate (rec.prov.mode) that must chunk-skip via
    // the recursive kind-4 footer stats, and a leaf-only projection.
    // DuckDB recomputes from the flat parquet columns.
    "q_struct_nested" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_struct2")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"),
            struct(col("l_quantity").as("qty"),
              struct(col("l_returnflag").as("flag"),
                col("l_linestatus").as("status")).as("prov")).as("rec"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .filter(col("rec.prov.status") === "F" && col("rec.qty") >= 5)
        .groupBy(col("rec.prov.flag").as("flag"))
        .agg(count(lit(1)).as("n"), round(sum(col("rec.qty")), 2).as("sum_qty"))
        .orderBy("flag")
    }),

    // Q-struct-evolution: struct-LEAF schema evolution under the oracle
    // gate — commit 1 writes rec{qty}, commit 2 appends rec{qty, flag}
    // (the meta widens; NO file is rewritten), and the aggregate over
    // BOTH generations must agree with DuckDB recomputing from parquet
    // (old rows read flag as null).
    "q_struct_leaf_evolution" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_structevo")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "lineitem").filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"),
            struct(col("l_quantity").as("qty")).as("rec"))
          .write.format("btr").mode("overwrite").save(dir)
        Btr.pq(s, d, "lineitem").filter(col("l_linenumber") === 2)
          .select(col("l_orderkey"),
            struct(col("l_quantity").as("qty"), col("l_returnflag").as("flag")).as("rec"))
          .write.format("btr").mode("append").save(dir)
      }
      s.read.format("btr").load(dir)
        .groupBy(coalesce(col("rec.flag"), lit("<none>")).as("flag"))
        .agg(count(lit(1)).as("n"), round(sum(col("rec.qty")), 2).as("sum_qty"))
        .orderBy("flag")
    }),

    // Q-colmap: metadata-only RENAME/DROP COLUMN (column mapping) under
    // the oracle gate — the build writes three columns, renames one,
    // drops another (a MIDDLE slot: every later column would shift onto
    // the wrong chunks without the tombstone), appends under the evolved
    // schema, and the final table must agree with DuckDB recomputing the
    // same slices from parquet. No data file is touched by either ALTER.
    "q_colmap_evolution" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_colmap")
      val done = new java.io.File(dir, "_ddl_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"), col("l_tax").as("junk"), col("l_quantity").as("qty_old"))
          .write.format("btr").mode("overwrite").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN qty_old TO qty")
        s.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN junk")
        Btr.pq(s, d, "lineitem")
          .filter(col("l_linenumber") === 2)
          .select(col("l_orderkey"), col("l_quantity").as("qty"))
          .write.format("btr").mode("append").save(dir)
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy((col("l_orderkey") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("qty")), 2).as("sum_qty"))
        .orderBy("bucket")
    }),

    // Q-dml-rowlevel: DELETE whose predicate SPLITS files — the group-based
    // copy-on-write path (BtrRowLevelOperation): files with no matching row
    // stay untouched, the rest are rewritten without the deleted rows, and
    // the survivors must agree with DuckDB over the complement predicate
    "q_dml_delete_rowlevel" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_dml_rl")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .repartition(4)
          .write.format("btr").mode("overwrite").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"DELETE FROM graft.`$dir` WHERE l_quantity < 10")
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qc"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag")
    }),

    // Q-dml-delete-dv: the same misaligned DELETE on a deletion-vector
    // table — merge-on-read: no data file is rewritten, the delete writes
    // `_btr_dv/` position blobs and the scan masks them out. The oracle
    // is identical to the copy-on-write variant, proving the two paths
    // produce the same rows; the masked count + sum + distinct exercise
    // the masked columnar read end-to-end.
    "q_dml_delete_dv" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_dml_dv")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .repartition(4)
          .write.format("btr").mode("overwrite")
          .option("btr.deletionVectors", "true").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"DELETE FROM graft.`$dir` WHERE l_quantity < 10")
        require(new java.io.File(dir, "_btr_dv").listFiles()
          .exists(_.getName.endsWith(".dv")),
          "q_dml_delete_dv: expected deletion-vector blobs, not a rewrite")
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qc"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag")
    }),

    // Q-dml-update: SQL UPDATE with a predicate that splits files — the
    // same copy-on-write rewrite, verified end-to-end against a CASE
    // expression in DuckDB (quantities quantize to cent-longs for exact
    // cross-engine sums)
    "q_dml_update" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_dml_upd")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .repartition(4)
          .write.format("btr").mode("overwrite").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"UPDATE graft.`$dir` SET l_quantity = l_quantity + 100 " +
          "WHERE l_returnflag = 'R' AND l_linenumber <= 2")
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qc"))
        .orderBy("l_returnflag")
    }),

    // Q-dml-update-dv: the same UPDATE on a deletion-vector table —
    // merge-on-read: old images mask out via position blobs, new images
    // land in appended files, no original file is rewritten. Same oracle
    // as the copy-on-write variant: the two paths must be row-equal.
    "q_dml_update_dv" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_dml_upd_dv")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .repartition(4)
          .write.format("btr").mode("overwrite")
          .option("btr.deletionVectors", "true").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        s.sql(s"UPDATE graft.`$dir` SET l_quantity = l_quantity + 100 " +
          "WHERE l_returnflag = 'R' AND l_linenumber <= 2")
        require(new java.io.File(dir, "_btr_dv").listFiles()
          .exists(_.getName.endsWith(".dv")),
          "q_dml_update_dv: expected deletion-vector blobs, not a rewrite")
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qc"))
        .orderBy("l_returnflag")
    }),

    // Q-dml-merge: MERGE INTO with matched-UPDATE and not-matched-INSERT —
    // source rows with positive ids update existing orders, negated ids
    // insert new rows; the merged table must agree with DuckDB's
    // LEFT JOIN + UNION formulation of the same merge
    "q_dml_merge" -> ((s, d) => {
      val dir = Btr.cachePath(d, "orders_dml_merge")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("price_qc"),
            col("o_orderstatus"))
          .repartition(4)
          .write.format("btr").mode("overwrite").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        // orderkey 0 would collide with its own negation as an insert id
        val src0 = Btr.pq(s, d, "lineitem")
          .filter(col("l_orderkey") % 4 === 0 && col("l_orderkey") =!= 0)
          .groupBy(col("l_orderkey").as("id"))
          .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qc"))
        src0.select(col("id"), col("qc"))
          .unionAll(src0.select((-col("id")).as("id"), col("qc")))
          .createOrReplaceTempView("dml_merge_src")
        s.sql(
          s"""MERGE INTO graft.`$dir` t USING dml_merge_src s ON t.o_orderkey = s.id
             |WHEN MATCHED THEN UPDATE SET price_qc = s.qc
             |WHEN NOT MATCHED THEN INSERT (o_orderkey, price_qc, o_orderstatus)
             |  VALUES (s.id, s.qc, 'X')""".stripMargin)
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price_qc")).as("sum_qc"),
          countDistinct(col("o_orderkey")).as("n_keys"))
        .orderBy("o_orderstatus")
    }),

    // Q-dml-merge-dv: the same MERGE on a deletion-vector table —
    // merge-on-read: matched updates mask the old rows and append new
    // images, not-matched inserts append, published through the pending
    // marker. Same oracle as the copy-on-write variant: row-equal paths.
    "q_dml_merge_dv" -> ((s, d) => {
      val dir = Btr.cachePath(d, "orders_dml_merge_dv")
      val done = new java.io.File(dir, "_dml_complete")
      if (!done.exists()) {
        Btr.pq(s, d, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("price_qc"),
            col("o_orderstatus"))
          .repartition(4)
          .write.format("btr").mode("overwrite")
          .option("btr.deletionVectors", "true").save(dir)
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
        // orderkey 0 would collide with its own negation as an insert id
        val src0 = Btr.pq(s, d, "lineitem")
          .filter(col("l_orderkey") % 4 === 0 && col("l_orderkey") =!= 0)
          .groupBy(col("l_orderkey").as("id"))
          .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qc"))
        src0.select(col("id"), col("qc"))
          .unionAll(src0.select((-col("id")).as("id"), col("qc")))
          .createOrReplaceTempView("dml_merge_dv_src")
        s.sql(
          s"""MERGE INTO graft.`$dir` t USING dml_merge_dv_src s ON t.o_orderkey = s.id
             |WHEN MATCHED THEN UPDATE SET price_qc = s.qc
             |WHEN NOT MATCHED THEN INSERT (o_orderkey, price_qc, o_orderstatus)
             |  VALUES (s.id, s.qc, 'X')""".stripMargin)
        require(new java.io.File(dir, "_btr_dv").listFiles()
          .exists(_.getName.endsWith(".dv")),
          "q_dml_merge_dv: expected deletion-vector blobs, not a rewrite")
        java.nio.file.Files.createFile(done.toPath)
      }
      s.read.format("btr").load(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price_qc")).as("sum_qc"),
          countDistinct(col("o_orderkey")).as("n_keys"))
        .orderBy("o_orderstatus")
    }),

    // Q-spj: join two btr tables ON their shared partition key — with
    // v2.bucketing enabled (the Verify session does), both sides report
    // KeyGroupedPartitioning and the join plans over key-grouped splits,
    // so this gates the grouped planning path end-to-end against the
    // oracle, not just in plan specs. Quantities quantize to cent-longs
    // so the per-flag share is an exact-ratio double on both engines
    "q_spj_share" -> ((s, d) => {
      val qc = round(col("l_quantity") * 100).cast("long")
      val totDir = Btr.cachePath(d, "lineitem_flag_totals")
      if (!new java.io.File(totDir, "_btr_meta.json").exists()) {
        lineitemByFlag(s, d).groupBy(col("l_returnflag")).agg(sum(qc).as("tot_qc"))
          .write.format("btr").partitionBy("l_returnflag").mode("overwrite").save(totDir)
      }
      val tot = s.read.format("btr").load(totDir)
      lineitemByFlag(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus")).agg(sum(qc).as("qc"))
        .join(tot, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("qc") * lit(1.0) / col("tot_qc"), 6).as("share"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Q-widen: type-widening schema evolution — even orderkeys written
    // with l_linenumber as its native INT, odd ones appended with it cast
    // to LONG; the table meta widens to long, the old int32 files decode
    // under their own footer tag and upcast at read, and the aggregate
    // over both generations matches the oracle exactly
    "q_widen_evolution" -> ((s, d) => {
      val dir = Btr.cachePath(d, "lineitem_widened")
      // two-step build (overwrite + append) is not atomic like the other
      // cached tables, so completion is marked by a sentinel written LAST:
      // a crash between the writes leaves no sentinel and rebuilds cleanly
      // (the overwrite wipes any half-built state)
      val done = new java.io.File(dir, "_gen_complete")
      if (!done.exists()) {
        val li = Btr.pq(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        li.filter(col("l_orderkey") % 2 === 0)
          .write.format("btr").mode("overwrite").save(dir)
        li.filter(col("l_orderkey") % 2 === 1)
          .withColumn("l_linenumber", col("l_linenumber").cast("long"))
          .write.format("btr").mode("append").save(dir)
        done.createNewFile()
      }
      s.read.format("btr").load(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_linenumber")).as("sum_ln"),
          min(col("l_linenumber")).as("min_ln"),
          max(col("l_linenumber")).as("max_ln"))
        .orderBy("l_returnflag")
    }),

    // Q-string-agg-meta: string MIN/MAX through aggregate pushdown —
    // short strings (lang, ≤16 bytes) store exact untruncated footer
    // bounds and resolve metadata-only; long ones (text) carry truncated
    // bounds and the agg reader decodes just those chunks, so the answer
    // is exact either way
    "q_string_agg_meta" -> ((s, d) => {
      t(s, d, "documents").agg(
        count(lit(1)).as("n_rows"),
        min(col("lang")).as("min_lang"),
        max(col("lang")).as("max_lang"),
        min(col("text")).as("min_text"),
        max(col("text")).as("max_text"))
    }),

    // Q-agg-meta: ungrouped count/min/max answered metadata-only from
    // row-group footers (aggregate pushdown — zero data bytes read)
    "q_agg_meta" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_ok"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"),
        tsFmt(min(col("l_shipdate"))).as("min_ship"),
        tsFmt(max(col("l_shipdate"))).as("max_ship"))
    }),

    // Q-sum-meta: ungrouped SUM over integral columns answered from the
    // format-v4 per-chunk footer sums (aggregate pushdown — zero data
    // bytes read; wrapped-long partials are exactly Spark's semantics)
    // AVG pushes too: Spark decomposes it to SUM+COUNT for partial DSv2
    // pushdown, both answered from footers (integral sum ⇒ the division
    // is over exact integers, so the double result is engine-identical)
    "q_sum_meta" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        sum(col("l_orderkey")).as("sum_ok"),
        sum(col("l_linenumber")).as("sum_ln"),
        avg(col("l_orderkey")).as("avg_ok"),
        count(lit(1)).as("n_rows"))
    }),

    // Q-part-agg-meta: GROUP BY partition column + count/min/max pushed
    // to the metadata-only grouped scan (footers + directory values —
    // zero data bytes read)
    "q_part_agg_meta" -> ((s, d) => {
      lineitemByFlag(s, d)
        .groupBy("l_returnflag")
        // count/min/max/sum all resolve from footers + directory values
        .agg(count(lit(1)).as("n"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          sum(col("l_orderkey")).as("sum_ok"))
        .orderBy("l_returnflag")
    }),

    // Q-topfreq: the Frequency-scheme gate statistic
    "q_topfreq" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag").as("v"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc("v"))
        .limit(1)
    }),

    // Q-runs: average run length (RLE gate statistic) over the
    // pk-ordered column — partition-local transition counts + boundary
    // fix-up (no global single-task window; see RunStats)
    "q_runs" -> ((s, d) => {
      graft.functions.RunStats.avgRunLength(
        t(s, d, "lineitem"),
        col("l_returnflag"),
        Seq(col("l_orderkey"), col("l_linenumber")))
    }),

    // Q-agg/join: revenue per nation — hash joins + hash agg + sort over
    // four btr scans; nation is broadcast (tiny dim)
    "q_agg_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), asc("n_name"))
    }),

    // TPC-H Q1 (pricing summary): the canonical scan+filter+partial-agg
    // shape — one btr scan, shipdate pushed down, 8 aggregates over 2
    // grouping keys resolve map-side before a 6-row shuffle
    "q_tpch_q1" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 0).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0).as("sum_disc"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 0)
            .as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q6 (forecast revenue): highly selective conjunctive filter,
    // every predicate pushed to the scan (chunk skipping on shipdate).
    // Revenue is quantized to cents per row so the long sum is exact and
    // engine-order-independent
    "q_tpch_q6" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          round(sum(round(col("l_extendedprice") * col("l_discount") * 100).cast("long")) / 100.0, 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q3 (shipping priority, o_orderpriority standing in for the
    // schema's missing o_shippriority): filtered dims join into the fact,
    // top-k resolves as TakeOrderedAndProject — never a global sort.
    // Revenue quantizes to cents per row (like Q6/Q14) so the top-10
    // ranking keys are exact longs, never a cross-engine fp .5 boundary
    "q_tpch_q3" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-03-15 00:00:00"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-03-15 00:00:00"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), tsFmt(col("o_orderdate")).as("o_date_s"),
          col("o_orderpriority"))
        .agg(round(sum(cents) / 100.0, 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_date_s"), col("o_orderpriority"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q14 (promotion effect): conditional aggregation over a
    // fact-dim join, one month of shipdates pushed to the scan. Terms are
    // quantized to cents per row so both sums are exact longs and the
    // final ratio is engine-identical
    "q_tpch_q14" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00") &&
          col("l_shipdate") < lit("1997-10-01 00:00:00"))
      li.join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), cents).otherwise(0L)) /
            sum(cents), 4).as("promo_revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q18 (large-volume customers): self-semi-join via a broadcast
    // of the tiny qualifying-orders set (sum(qty) > 300), then two hash
    // joins and a regroup — lineitem never shuffles twice
    "q_tpch_q18" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("tq"))
        .filter(col("tq") > 300)
        .select(col("l_orderkey").as("bk"))
      t(s, d, "orders").join(broadcast(big), col("o_orderkey") === col("bk"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          tsFmt(col("o_orderdate")).as("o_date_s"), col("o_totalprice"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_date_s"),
          round(col("o_totalprice"), 2).as("price"), col("sum_qty"))
        .orderBy(desc("price"), asc("o_orderkey"))
    }),

    // TPC-H Q5 (local supplier volume): the 6-table star join — region
    // and nation broadcast, the c_nationkey = s_nationkey "local" clause
    // rides the supplier join, one shuffle per fact-side key. Cents
    // quantization keeps the revenue ranking exact across engines
    "q_tpch_q5" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00"))
      val asia = t(s, d, "nation")
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(asia, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(cents) / 100.0, 2).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    }),

    // TPC-H Q10 (returned items): fact filtered on returnflag + a
    // quarter of orderdates, customer regroup, top-20 as
    // TakeOrderedAndProject over exact cent-ranked revenue
    "q_tpch_q10" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00") &&
          col("o_orderdate") < lit("1996-10-01 00:00:00"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
        .agg(round(sum(cents) / 100.0, 2).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("acctbal"), col("n_name"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q19 (discounted revenue, adapted to the schema's columns):
    // three disjunctive brand/quantity/size branches — the OR of
    // conjunctions pushes to the scan as a single Or filter tree, and
    // chunk skipping prunes only where every branch misses
    "q_tpch_q19" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val branch =
        (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 20)) ||
        (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 25))
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(branch)
        .agg(round(sum(cents) / 100.0, 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 (order priority checking), adapted to the synthetic schema
    // (no l_commitdate; "late" = any line shipped after the order date):
    // the correlated EXISTS plans as a LEFT SEMI join — the shape the
    // battery lacked. Through SQL so Spark's subquery decorrelation is
    // what's exercised, not a hand-rewritten join
    "q_tpch_q4" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v4_orders")
      t(s, d, "lineitem").createOrReplaceTempView("v4_lineitem")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM v4_orders o
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM v4_lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // TPC-H Q12 (shipping priority split), adapted (no l_shipmode;
    // l_returnflag groups): fact-dim join with conditional CASE sums
    "q_tpch_q12" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v12_orders")
      t(s, d, "lineitem").createOrReplaceTempView("v12_lineitem")
      s.sql(
        """SELECT l.l_returnflag,
          |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
          |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM v12_orders o JOIN v12_lineitem l ON o.o_orderkey = l.l_orderkey
          |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin)
    }),

    // TPC-H Q17 (small-quantity-order revenue): correlated scalar
    // subqueries against the outer part key — Spark decorrelates them
    // into aggregated joins (and merges the pair). The avg comparison is
    // exact integer arithmetic on both engines: qty < 0.2*avg(qty)
    // ⟺ 5*qty*cnt < sum(qty), with quantities rounded to exact longs
    "q_tpch_q17" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v17_lineitem")
      t(s, d, "part").createOrReplaceTempView("v17_part")
      s.sql(
        """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
          |  count(*) AS n
          |FROM v17_lineitem, v17_part
          |WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
          |  AND 5 * CAST(round(l_quantity) AS BIGINT) *
          |      (SELECT count(*) FROM v17_lineitem l2 WHERE l2.l_partkey = v17_part.p_partkey)
          |    < (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
          |       FROM v17_lineitem l3 WHERE l3.l_partkey = v17_part.p_partkey)""".stripMargin)
    }),

    // TPC-H Q2 (minimum-cost supplier), adapted: the schema has no
    // partsupp, so "supply cost" of a (part, supplier) pair = the
    // minimum extended price (in exact cents) that pair ever shipped at.
    // The correlated min subquery is the query's point — Spark
    // decorrelates it into an aggregate + join, DuckDB runs it natively,
    // and both must agree on the region-wide minimum per part
    "q_tpch_q2" -> ((s, d) => {
      t(s, d, "part").createOrReplaceTempView("v2_part")
      t(s, d, "supplier").createOrReplaceTempView("v2_supplier")
      t(s, d, "nation").createOrReplaceTempView("v2_nation")
      t(s, d, "region").createOrReplaceTempView("v2_region")
      t(s, d, "lineitem").createOrReplaceTempView("v2_lineitem")
      s.sql(
        """WITH cost AS (
          |  SELECT l_partkey, l_suppkey,
          |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
          |  FROM v2_lineitem GROUP BY l_partkey, l_suppkey)
          |SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, cost_c
          |FROM v2_part p
          |JOIN cost ON cost.l_partkey = p.p_partkey
          |JOIN v2_supplier ON s_suppkey = cost.l_suppkey
          |JOIN v2_nation ON s_nationkey = n_nationkey
          |JOIN v2_region ON n_regionkey = r_regionkey
          |WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
          |  AND cost_c = (
          |    SELECT min(c2.cost_c) FROM cost c2
          |    JOIN v2_supplier s2 ON s2.s_suppkey = c2.l_suppkey
          |    JOIN v2_nation n2 ON n2.n_nationkey = s2.s_nationkey
          |    JOIN v2_region r2 ON r2.r_regionkey = n2.n_regionkey
          |    WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
          |ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)
    }),

    // TPC-H Q7 (volume shipping): the bidirectional nation-pair join.
    // The two tiny nation legs broadcast pre-filtered to the pair, the
    // supplier leg broadcasts whole, and only the orders⋈customer key
    // shuffles big data; the disjunctive pair filter runs after both
    // nation names are bound
    "q_tpch_q7" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val nk = t(s, d, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = t(s, d, "supplier")
        .join(broadcast(nk.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
      val cust = t(s, d, "customer")
        .join(broadcast(nk.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(round(sum(cents) / 100.0, 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share): the 8-table join. Every dim leg
    // broadcasts (filtered part, AMERICA nation keys, supplier, supplier
    // nation names); lineitem shuffles once on orderkey and once on
    // custkey — the minimum for fact⋈orders⋈customer. The share ratio
    // divides exact cent longs so both engines agree to the digit
    "q_tpch_q8" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val amer = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val supN = t(s, d, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
            col("o_orderdate") < lit("1998-01-01 00:00:00")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(amer), col("c_nationkey") === col("cnk"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("snk"))
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(round(lit(100.0) *
          sum(when(col("supp_nation") === "NATION_3", cents).otherwise(0L)) / sum(cents), 4)
          .as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 (product-type profit), adapted: no partsupp, so unit
    // supply cost = 10% of the part's retail price — profit stays an
    // exact long (cents minus cost-cents×quantity). part pre-filters on
    // the name pattern and broadcasts with only the two columns the
    // profit term needs; supplier/nation broadcast; orders shuffles once
    "q_tpch_q9" -> ((s, d) => {
      val profit = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") -
        round(col("p_retailprice") * 10).cast("long") * round(col("l_quantity")).cast("long")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_name").like("%red%"))
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(round(sum(profit) / 100.0, 2).as("sum_profit"))
        .orderBy("nation", "o_year")
    }),

    // TPC-H Q11 (important stock), adapted via lineitem as the
    // part-supplier relationship: per-part shipped value for one
    // nation's suppliers, kept where the part exceeds 0.2% of the
    // nation's total. The HAVING-vs-scalar-subquery comparison is exact
    // integer arithmetic (value×500 > total) so no fp threshold can
    // disagree between engines
    "q_tpch_q11" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v11_lineitem")
      t(s, d, "supplier").createOrReplaceTempView("v11_supplier")
      t(s, d, "nation").createOrReplaceTempView("v11_nation")
      s.sql(
        """WITH val AS (
          |  SELECT l_partkey,
          |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_c
          |  FROM v11_lineitem
          |  JOIN v11_supplier ON l_suppkey = s_suppkey
          |  JOIN v11_nation ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_7'
          |  GROUP BY l_partkey)
          |SELECT l_partkey, value_c
          |FROM val
          |WHERE value_c * 500 > (SELECT CAST(sum(value_c) AS BIGINT) FROM val)
          |ORDER BY value_c DESC, l_partkey""".stripMargin)
    }),

    // TPC-H Q13 (customer order-count distribution), adapted: the
    // priority exclusion stands in for the comment LIKE filter. The
    // LEFT OUTER join keeps zero-order customers (count(o_orderkey)
    // counts only matches), then the distribution regroups the 1500-row
    // aggregate — the second shuffle moves per-customer counts, not rows
    "q_tpch_q13" -> ((s, d) => {
      val counts = t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q15 (top supplier): quarter revenue per supplier, then the
    // scalar max subquery picks the leader(s). Spark plans the CTE once
    // per consumer; the revenue aggregate shuffles 100 rows, and the max
    // compares exact cent longs so ties and the winner are engine-stable
    "q_tpch_q15" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v15_lineitem")
      t(s, d, "supplier").createOrReplaceTempView("v15_supplier")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
          |      AS total_c
          |  FROM v15_lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_c
          |FROM v15_supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_c = (SELECT max(total_c) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    // TPC-H Q16 (parts/supplier relationship), via lineitem as the
    // part-supplier pairs: the NOT IN subquery on negative-balance
    // suppliers plans as a null-aware anti join, then a distinct
    // supplier count per part attribute triple
    "q_tpch_q16" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v16_lineitem")
      t(s, d, "part").createOrReplaceTempView("v16_part")
      t(s, d, "supplier").createOrReplaceTempView("v16_supplier")
      s.sql(
        """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM v16_lineitem JOIN v16_part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
          |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM v16_supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    }),

    // TPC-H Q20 (potential part promotion), adapted: suppliers of one
    // nation who shipped more than a quarter of some filtered part's
    // 1997 volume. partsupp's availqty threshold becomes a share-of-part
    // threshold over the same shipped CTE, compared in exact integers
    "q_tpch_q20" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v20_lineitem")
      t(s, d, "part").createOrReplaceTempView("v20_part")
      t(s, d, "supplier").createOrReplaceTempView("v20_supplier")
      t(s, d, "nation").createOrReplaceTempView("v20_nation")
      s.sql(
        """WITH shipped AS (
          |  SELECT l_partkey, l_suppkey,
          |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
          |  FROM v20_lineitem
          |  JOIN v20_part ON p_partkey = l_partkey
          |  WHERE p_name LIKE 'small%'
          |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |  GROUP BY l_partkey, l_suppkey),
          |tot AS (
          |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS part_qty
          |  FROM shipped GROUP BY l_partkey)
          |SELECT s_suppkey, s_name
          |FROM v20_supplier
          |JOIN v20_nation ON s_nationkey = n_nationkey
          |WHERE n_name = 'NATION_4'
          |  AND s_suppkey IN (
          |    SELECT shipped.l_suppkey FROM shipped
          |    JOIN tot ON shipped.l_partkey = tot.l_partkey
          |    WHERE 4 * qty > part_qty)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    // shipped more than 90 days after the order date (the schema has no
    // commit/receipt dates). The EXISTS (another supplier on the order)
    // plans as a left semi join and the NOT EXISTS (no OTHER supplier
    // late) as a left anti join — the two correlated-subquery shapes the
    // battery still lacked, with a non-equality correlated predicate
    // (l2.l_suppkey <> l1.l_suppkey) exercising Spark's decorrelation
    "q_tpch_q21" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v21_lineitem")
      t(s, d, "orders").createOrReplaceTempView("v21_orders")
      t(s, d, "supplier").createOrReplaceTempView("v21_supplier")
      t(s, d, "nation").createOrReplaceTempView("v21_nation")
      s.sql(
        """SELECT s_name, count(*) AS numwait
          |FROM v21_supplier
          |JOIN v21_lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN v21_orders ON o_orderkey = l1.l_orderkey
          |JOIN v21_nation ON s_nationkey = n_nationkey
          |WHERE o_orderstatus = 'F' AND n_name = 'NATION_6'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          |  AND EXISTS (
          |    SELECT 1 FROM v21_lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM v21_lineitem l3
          |    JOIN v21_orders o3 ON o3.o_orderkey = l3.l_orderkey
          |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 100""".stripMargin)
    }),

    // TPC-H Q22 (global sales opportunity), adapted: country code =
    // nationkey mod 7 (no phone column), "inactive" = no order since
    // 2000 (every synthetic customer has orders, none for seven years).
    // The above-average-balance threshold multiplies through by the
    // count so the comparison is exact cents×count vs sum — the fp avg
    // can never flip a boundary row between engines. NOT EXISTS on the
    // dated orders probe plans as a left anti join
    "q_tpch_q22" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("v22_customer")
      t(s, d, "orders").createOrReplaceTempView("v22_orders")
      s.sql(
        """SELECT cntrycode, count(*) AS numcust,
          |  round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
          |    / CAST(100 AS DOUBLE), 2) AS totacctbal
          |FROM (
          |  SELECT CAST(c_nationkey % 7 AS INT) AS cntrycode, c_acctbal, c_custkey
          |  FROM v22_customer
          |  WHERE c_nationkey % 7 IN (1, 2, 3, 4, 5)
          |    AND CAST(round(c_acctbal * 100) AS BIGINT) *
          |        (SELECT count(*) FROM v22_customer
          |         WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (1, 2, 3, 4, 5))
          |      > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
          |         FROM v22_customer
          |         WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (1, 2, 3, 4, 5))
          |    AND NOT EXISTS (
          |      SELECT 1 FROM v22_orders WHERE o_custkey = c_custkey
          |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) custsale
          |GROUP BY cntrycode
          |ORDER BY cntrycode""".stripMargin)
    }),

    // Q-point-lookup: equality probe on an unsorted join key — the
    // chunk-skipping stress case where every chunk's min/max overlaps the
    // value and only the per-chunk bloom filter (footer v3) can prune.
    // Benchmarked per round alongside the range-predicate q_rt_filter.
    "q_point_lookup" -> ((s, d) => {
      t(s, d, "lineitem").filter(col("l_partkey") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q-rollup: grouping-set aggregation (subtotals + grand total);
    // null ordering pinned explicitly (Spark and DuckDB defaults differ)
    "q_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // Q-sort/limit: top-k with deterministic tiebreak
    "q_sort_limit" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(desc("price"), asc("o_orderkey"))
        .limit(10)
    }),

    // Q-window: first 3 orders per customer by date
    "q_window" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), tsFmt(col("o_orderdate")).as("o_date_s"), col("rn"))
        .orderBy("o_custkey", "rn", "o_orderkey")
    }),

    // Q-setop: nation keys seen in customers EXCEPT a filtered nation set
    // (guaranteed non-empty, unlike customers-without-orders)
    "q_setop" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("k")).distinct()
      val n = t(s, d, "nation").filter(col("n_nationkey") >= 13).select(col("n_nationkey").as("k"))
      c.except(n).orderBy("k")
    }),

    // Q-scalar: string/math function surface over part
    "q_scalar_fns" -> ((s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_type")).as("type_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
          round(abs(col("p_retailprice") - 1000.0), 2).as("price_dev"),
          (col("p_size") % 7).as("size_mod"))
        .orderBy("p_partkey")
    }),

    // Q-events: tumbling hourly window agg over the event stream table
    // (ts is a microsecond timestamp; hour bucket compared as string)
    "q_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .select(
          date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour_s"),
          col("event_type"), col("value"))
        .groupBy("hour_s", "event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .orderBy("hour_s", "event_type")
    }),

    // Q-ts-partition: hour-grain TIMESTAMP partition column end-to-end —
    // events land in ts_hour=<UTC instant> directories (the layout an
    // event-retention pipeline uses), partition values synthesize back on
    // read, and the per-hour aggregate must match DuckDB over the raw
    // table (values quantize to cent-longs)
    "q_ts_partition" -> ((s, d) => {
      val dir = Btr.cachePath(d, "events_by_hour")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "events")
          .select(
            date_trunc("hour", col("ts")).as("ts_hour"),
            col("event_type"), col("value"))
          // contiguous hour ranges per task keep each writer under the
          // open-partition cap regardless of the session's shuffle
          // partition count (hash repartition at 4 partitions would put
          // ~180 distinct hours in one task)
          .repartitionByRange(32, col("ts_hour"))
          .write.format("btr").partitionBy("ts_hour").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .filter(col("event_type") =!= "view")
        .groupBy(col("ts_hour"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sum_vc"))
        .select(date_format(col("ts_hour"), "yyyy-MM-dd HH:00").as("hour_s"),
          col("n"), col("sum_vc"))
        .orderBy("hour_s")
    }),

    // Q-days-partition: TRANSFORM partitioning — `days(ts)` derives the
    // directory from a timestamp that stays IN the files (the fleet-scale
    // event-table shape); the 10-day filter prunes whole day directories
    // before any footer is read
    "q_days_partition" -> ((s, d) => {
      val dir = Btr.cachePath(d, "events_by_day")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "events")
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .write.format("btr").mode("overwrite")
          .option("btr.partitionSpec", "days(ts)")
          .save(dir)
      }
      s.read.format("btr").load(dir)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sum_vc"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          col("n"), col("sum_vc"), col("min_id"), col("max_id"))
        .orderBy("day_s")
    }),

    // Q-bucket-join: two bucket(8, custkey)-partitioned tables joined on
    // the bucket source through the catalog (the layout two co-located
    // 100 TB fact tables would carry; SPJ zero-shuffle is plan-pinned in
    // StoragePartitionJoinSpec — here the oracle checks the answers)
    "q_bucket_join" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
      val cdir = Btr.cachePath(d, "customer_bucketed")
      val odir = Btr.cachePath(d, "orders_bucketed")
      if (!new java.io.File(cdir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "customer").select("c_custkey", "c_mktsegment")
          .write.format("btr").mode("overwrite")
          .option("btr.partitionSpec", "bucket(8, c_custkey)").save(cdir)
      }
      if (!new java.io.File(odir, "_btr_meta.json").exists()) {
        Btr.pq(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .write.format("btr").mode("overwrite")
          .option("btr.partitionSpec", "bucket(8, o_custkey)").save(odir)
      }
      s.table(s"graft.`$cdir`")
        .join(s.table(s"graft.`$odir`"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_tp"))
        .orderBy("c_mktsegment")
    }),

    // Q-asof: for each click, the latest prior view by the same user —
    // DuckDB's ASOF LEFT JOIN, realized as one key-shuffle union+window
    // (ts is raw nanos on both sides, so the comparison is exact)
    "q_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"), col("value"))
      graft.functions.RelationalOps
        .asOfJoin(clicks, views, "user_id", "ts", "ts", rightTieCols = Seq("view_id"))
        .select(col("event_id"), col("user_id"), col("asof_view_id"),
          round(col("asof_value"), 2).as("asof_value"))
        .orderBy("event_id")
    }),

    // Q-sessionize: 30-minute-gap sessions per user, then per-session
    // event count and duration. The gap test runs on exact epoch-micros
    // longs (sessionize subtracts the time column, so the timestamp
    // converts once up front — NTZ→LTZ is exact under the UTC session)
    "q_sessionize" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      graft.functions.RelationalOps
        .sessionize(ev, "user_id", "ts_us", maxGap = 1800000000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          round((max(col("ts_us")) - min(col("ts_us"))) / 1e6, 2).as("duration_s"))
        .orderBy("user_id", "session_seq")
    }),

    // Q-quantiles: exact per-group percentiles. Values quantize to cents
    // first so Spark's percentile and DuckDB's quantile_cont interpolate
    // over identical integers (bit-identical doubles out, no fp drift)
    "q_quantiles" -> ((s, d) => {
      val cents = round(col("value") * 100).cast("long")
      val qs = percentile(cents, array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)))
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(qs.as("qs"))
        .select(col("event_type"),
          round(element_at(col("qs"), 1) / 100, 4).as("p25"),
          round(element_at(col("qs"), 2) / 100, 4).as("p50"),
          round(element_at(col("qs"), 3) / 100, 4).as("p75"),
          round(element_at(col("qs"), 4) / 100, 4).as("p95"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_time_travel" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_quantity <= 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_changes_feed" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(2 AS BIGINT) AS commit_v, 'insert' AS change_type
        |FROM lineitem WHERE l_quantity > 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rt_identity" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        | l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        | strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate_s
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_rt_projection" ->
      "SELECT l_orderkey, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_extendedprice",
    "q_rt_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_or_filter" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_returnflag = 'R' OR l_orderkey % 7 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_fsst_strings" ->
      """SELECT l_orderkey, l_linenumber,
        | 'https://cdn.example.com/assets/' || l_returnflag || '/item-' ||
        |   CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR) ||
        |   '/v' || CAST(l_linenumber AS VARCHAR) || '?session=' ||
        |   CAST(l_orderkey AS VARCHAR) AS url
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_rt_alp_ledger" ->
      """SELECT l_orderkey, l_linenumber,
        | (100000000000 + CAST(l_orderkey AS BIGINT) * 100000
        |    + CAST(l_partkey AS BIGINT) * 10 + l_linenumber)
        |   / 100.0 AS ledger_amount
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_filter_mix" ->
      """SELECT count(*) AS n_rows,
        | min(l_orderkey) AS min_okey,
        | max(l_orderkey) AS max_okey,
        | CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE NOT (l_returnflag = 'R') OR l_orderkey % 7 = 0""".stripMargin,
    "q_stats_int" ->
      """SELECT count(*) AS n_rows, count(l_orderkey) AS n_vals,
        | min(l_orderkey) AS min_v, max(l_orderkey) AS max_v,
        | count(DISTINCT l_orderkey) AS n_distinct,
        | CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
        |FROM lineitem""".stripMargin,
    "q_stats_double" ->
      """SELECT count(l_extendedprice) AS n_vals,
        | round(min(l_extendedprice), 2) AS min_v,
        | round(max(l_extendedprice), 2) AS max_v,
        | round(sum(l_extendedprice), 0) AS sum_v,
        | count(DISTINCT l_extendedprice) AS n_distinct
        |FROM lineitem""".stripMargin,
    "q_stats_string" ->
      """SELECT count(l_returnflag) AS n_vals,
        | count(DISTINCT l_returnflag) AS n_distinct,
        | min(l_returnflag) AS min_v, max(l_returnflag) AS max_v,
        | CAST(sum(length(l_returnflag)) AS BIGINT) AS total_len
        |FROM lineitem""".stripMargin,
    "q_part_filter" ->
      """SELECT l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_part_mixed_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_returnflag = 'A' AND l_quantity >= 25 AND l_linenumber <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_dml_delete" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_returnflag <> 'R'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_retained_history" ->
      """WITH v1 AS (SELECT 'v1' AS view, l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty FROM lineitem GROUP BY 2),
        | now AS (SELECT 'now' AS view, l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty FROM lineitem
        |  WHERE l_returnflag <> 'R' GROUP BY 2)
        |SELECT l_returnflag, n, sum_qty, view FROM v1
        |UNION ALL SELECT l_returnflag, n, sum_qty, view FROM now
        |ORDER BY view, l_returnflag""".stripMargin,
    "q_struct_meta" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY 1 ORDER BY flag""".stripMargin,
    "q_struct_nested" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_linestatus = 'F' AND l_quantity >= 5
        |GROUP BY 1 ORDER BY flag""".stripMargin,
    "q_struct_leaf_evolution" ->
      """SELECT CASE WHEN l_linenumber = 2 THEN l_returnflag ELSE '<none>' END AS flag,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_linenumber <= 2
        |GROUP BY 1 ORDER BY flag""".stripMargin,
    "q_colmap_evolution" ->
      """SELECT CAST(l_orderkey % 7 AS BIGINT) AS bucket, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_linenumber <= 2
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_dml_delete_rowlevel" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qc,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_dml_delete_dv" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qc,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_dml_update" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(round((CASE WHEN l_returnflag = 'R' AND l_linenumber <= 2
        |   THEN l_quantity + 100 ELSE l_quantity END) * 100) AS BIGINT)) AS BIGINT) AS sum_qc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_dml_update_dv" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(round((CASE WHEN l_returnflag = 'R' AND l_linenumber <= 2
        |   THEN l_quantity + 100 ELSE l_quantity END) * 100) AS BIGINT)) AS BIGINT) AS sum_qc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_dml_merge" ->
      """WITH src0 AS (
        |  SELECT l_orderkey AS id,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
        |  FROM lineitem WHERE l_orderkey % 4 = 0 AND l_orderkey <> 0 GROUP BY 1),
        |src AS (SELECT id, qc FROM src0 UNION ALL SELECT -id, qc FROM src0),
        |merged AS (
        |  SELECT o.o_orderkey AS k, o.o_orderstatus AS st,
        |    COALESCE(s.qc, CAST(round(o.o_totalprice * 100) AS BIGINT)) AS qc
        |  FROM orders o LEFT JOIN src s ON o.o_orderkey = s.id
        |  UNION ALL
        |  SELECT s.id AS k, 'X' AS st, s.qc
        |  FROM src s WHERE s.id NOT IN (SELECT o_orderkey FROM orders))
        |SELECT st AS o_orderstatus, count(*) AS n, CAST(sum(qc) AS BIGINT) AS sum_qc,
        |  count(DISTINCT k) AS n_keys
        |FROM merged GROUP BY st ORDER BY st""".stripMargin,
    "q_dml_merge_dv" ->
      """WITH src0 AS (
        |  SELECT l_orderkey AS id,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
        |  FROM lineitem WHERE l_orderkey % 4 = 0 AND l_orderkey <> 0 GROUP BY 1),
        |src AS (SELECT id, qc FROM src0 UNION ALL SELECT -id, qc FROM src0),
        |merged AS (
        |  SELECT o.o_orderkey AS k, o.o_orderstatus AS st,
        |    COALESCE(s.qc, CAST(round(o.o_totalprice * 100) AS BIGINT)) AS qc
        |  FROM orders o LEFT JOIN src s ON o.o_orderkey = s.id
        |  UNION ALL
        |  SELECT s.id AS k, 'X' AS st, s.qc
        |  FROM src s WHERE s.id NOT IN (SELECT o_orderkey FROM orders))
        |SELECT st AS o_orderstatus, count(*) AS n, CAST(sum(qc) AS BIGINT) AS sum_qc,
        |  count(DISTINCT k) AS n_keys
        |FROM merged GROUP BY st ORDER BY st""".stripMargin,
    "q_spj_share" ->
      """WITH q AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |tot AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS tot_qc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT q.l_returnflag, q.l_linestatus,
        |  round(q.qc * 1.0 / tot.tot_qc, 6) AS share
        |FROM q JOIN tot ON q.l_returnflag = tot.l_returnflag
        |ORDER BY q.l_returnflag, q.l_linestatus""".stripMargin,
    "q_widen_evolution" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
        | CAST(min(l_linenumber) AS BIGINT) AS min_ln,
        | CAST(max(l_linenumber) AS BIGINT) AS max_ln
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_string_agg_meta" ->
      """SELECT count(*) AS n_rows, min(lang) AS min_lang, max(lang) AS max_lang,
        | min(text) AS min_text, max(text) AS max_text
        |FROM documents""".stripMargin,
    "q_agg_meta" ->
      """SELECT count(*) AS n_rows, count(l_orderkey) AS n_ok,
        | min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        | strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
        | strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
        |FROM lineitem""".stripMargin,
    "q_sum_meta" ->
      """SELECT CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
        | CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
        | avg(l_orderkey) AS avg_ok, count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q_part_agg_meta" ->
      """SELECT l_returnflag, count(*) AS n, min(l_orderkey) AS min_ok,
        | max(l_orderkey) AS max_ok, CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_topfreq" ->
      """SELECT l_returnflag AS v, count(*) AS freq FROM lineitem
        |GROUP BY l_returnflag ORDER BY freq DESC, v ASC LIMIT 1""".stripMargin,
    "q_runs" ->
      """SELECT round(CAST(count(*) AS DOUBLE) /
        | (1 + sum(CASE WHEN l_returnflag <> prev THEN 1 ELSE 0 END)), 4) AS avg_run
        |FROM (SELECT l_returnflag,
        |  lag(l_returnflag) OVER (ORDER BY l_orderkey, l_linenumber) AS prev
        |  FROM lineitem)""".stripMargin,
    "q_agg_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 0) AS sum_base,
        | round(sum(l_extendedprice * (1 - l_discount)), 0) AS sum_disc,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q6" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0, 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        | round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0, 2) AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_s,
        | o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q_tpch_q14" ->
      """WITH f AS (
        |  SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00')
        |SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN cents ELSE 0 END) AS BIGINT)
        |    / CAST(sum(cents) AS BIGINT), 4) AS promo_revenue,
        | count(*) AS n_items
        |FROM f""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_s,
        | round(o_totalprice, 2) AS price, round(sum(l_quantity), 2) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY price DESC, o_orderkey ASC""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        | round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        | round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0, 2) AS revenue,
        | round(c_acctbal, 2) AS acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q_tpch_q19" ->
      """SELECT
        | round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |   / 100.0, 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 25)""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l.l_returnflag,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "q_tpch_q17" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
        |  count(*) AS n
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
        |  AND 5 * CAST(round(l_quantity) AS BIGINT) *
        |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        |    < (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |       FROM lineitem l3 WHERE l3.l_partkey = part.p_partkey)""".stripMargin,
    "q_tpch_q2" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, cost_c
        |FROM part p
        |JOIN cost ON cost.l_partkey = p.p_partkey
        |JOIN supplier ON s_suppkey = cost.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND cost_c = (
        |    SELECT min(c2.cost_c) FROM cost c2
        |    JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    strftime(l_shipdate, '%Y') AS l_year,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year,
        |  round(100.0 * CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT)
        |    / CAST(sum(cents) AS BIGINT), 4) AS mkt_share
        |FROM (
        |  SELECT strftime(o_orderdate, '%Y') AS o_year,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
        |    n2.n_name AS supp_nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q_tpch_q9" ->
      """SELECT nation, o_year, round(CAST(sum(profit_c) AS BIGINT) / 100.0, 2) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |      - CAST(round(p_retailprice * 10) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)
        |      AS profit_c
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin,
    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value_c
        |FROM val
        |WHERE value_c * 500 > (SELECT CAST(sum(value_c) AS BIGINT) FROM val)
        |ORDER BY value_c DESC, l_partkey""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |      AS total_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_c
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_c = (SELECT max(total_c) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (
        |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS part_qty
        |  FROM shipped GROUP BY l_partkey)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_4'
        |  AND s_suppkey IN (
        |    SELECT shipped.l_suppkey FROM shipped
        |    JOIN tot ON shipped.l_partkey = tot.l_partkey
        |    WHERE 4 * qty > part_qty)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_6'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q_tpch_q22" ->
      """SELECT cntrycode, count(*) AS numcust,
        |  round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
        |    AS totacctbal
        |FROM (
        |  SELECT CAST(c_nationkey % 7 AS INTEGER) AS cntrycode, c_acctbal, c_custkey
        |  FROM customer
        |  WHERE c_nationkey % 7 IN (1, 2, 3, 4, 5)
        |    AND CAST(round(c_acctbal * 100) AS BIGINT) *
        |        (SELECT count(*) FROM customer
        |         WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (1, 2, 3, 4, 5))
        |      > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         FROM customer
        |         WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (1, 2, 3, 4, 5))
        |    AND NOT EXISTS (
        |      SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,
    "q_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_partkey = 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY price DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_s, rn
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn, o_orderkey""".stripMargin,
    "q_setop" ->
      """SELECT DISTINCT c_nationkey AS k FROM customer
        |EXCEPT SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 13
        |ORDER BY k""".stripMargin,
    "q_scalar_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 5) AS name5,
        | length(p_type) AS type_len, concat_ws('|', p_brand, p_type) AS bt,
        | round(abs(p_retailprice - 1000.0), 2) AS price_dev,
        | p_size % 7 AS size_mod
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour_s, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin,
    "q_ts_partition" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_s,
        | count(*) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc
        |FROM events WHERE event_type <> 'view'
        |GROUP BY 1 ORDER BY hour_s""".stripMargin,
    "q_bucket_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_tp
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q_days_partition" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_s,
        | count(*) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
        | min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY 1 ORDER BY day_s""".stripMargin,
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.view_id AS asof_view_id,
        | round(r.value, 2) AS asof_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT event_id AS view_id, user_id, ts, value
        |                FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tn FROM events),
        | m AS (SELECT user_id, tn,
        |   CASE WHEN lag(tn) OVER (PARTITION BY user_id ORDER BY tn) IS NULL
        |     OR tn - lag(tn) OVER (PARTITION BY user_id ORDER BY tn) > 1800000000000
        |   THEN 1 ELSE 0 END AS ns FROM e),
        | s AS (SELECT user_id, tn,
        |   CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tn ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events,
        | round((max(tn) - min(tn)) / 1e9, 2) AS duration_s
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "q_quantiles" ->
      """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        | q AS (SELECT event_type, quantile_cont(cents, [0.25, 0.5, 0.75, 0.95]) AS qs
        |       FROM c GROUP BY event_type)
        |SELECT event_type, round(qs[1] / 100, 4) AS p25, round(qs[2] / 100, 4) AS p50,
        | round(qs[3] / 100, 4) AS p75, round(qs[4] / 100, 4) AS p95
        |FROM q ORDER BY event_type""".stripMargin
  )
}
