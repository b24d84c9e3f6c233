package graft

import graft.functions.{MultimodalOps, SimilarityOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the documents/embeddings tables:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine), similarity search (brute-force + LSH ANN), text analysis
  * (language ID, quality, token counts, fingerprints) and multimodal
  * binary-column plumbing. SQL-expressible ones carry DuckDB oracles;
  * hash-parameterized ones (MinHash bands, SimHash, LSH) output
  * exact-verified results where possible or rely on rows-only checks +
  * their own specs.
  */
object PipelineQueries {
  import Btr.{pq, t}

  /** Two-commit documents table for the incremental-pipeline oracle:
    * version 1 holds the corpus (doc_id % 3 != 0), version 2 appends the
    * increment (doc_id % 3 == 0). Guarded build like Queries'
    * lineitemTwoCommits: both commits run in one block keyed on the
    * version count, so a crash between them heals on the next run.
    */
  private def documentsTwoCommits(s: SparkSession, d: String): String = {
    val dir = Btr.cachePath(d, "documents_inc")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    def versionCount =
      graft.sources.BtrLog.latestVersion(fs, root).getOrElse(0L)
    if (!new java.io.File(dir, "_btr_meta.json").exists() || versionCount < 2) {
      // a partial cache (crash after the v1 overwrite) must be wiped, not
      // re-overwritten: re-running the overwrite on top would record it as
      // v2 — a truncate removing v1's files — and the hard-coded (1, 2]
      // feed range below would hit removed history forever
      if (fs.exists(root)) fs.delete(root, true)
      val docs = pq(s, d, "documents").select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 3 =!= 0)
        .write.format("btr").mode("overwrite").save(dir)
      docs.filter(col("doc_id") % 3 === 0)
        .write.format("btr").mode("append").save(dir)
    }
    dir
  }

  /** Persisted IVF ANN index for the gate (VERDICT r13 #4): centroids +
    * per-row cell assignments live as btr tables under the query cache,
    * built ONCE from the full embeddings corpus and then extended with an
    * incremental [[SimilarityOps.ivfIndexAppend]] batch (disjoint ids —
    * the change-feed shape; its assignments are a strict superset the
    * probe join ignores). Cached across runs behind a completion marker;
    * a partial build (crash) wipes and rebuilds.
    */
  private def ivfIndexDir(s: SparkSession, d: String): String = {
    val dir = Btr.cachePath(d, "ivf_index")
    val done = new java.io.File(dir, "_built_v1")
    if (!done.exists()) {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
      val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
      if (fs.exists(root)) fs.delete(root, true)
      val emb = t(s, d, "embeddings")
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      graft.functions.SimilarityOps.ivfIndexBuild(cands, dir, nlist = 16)
      // incremental batch: same vectors under shifted ids — assigns ONLY
      // the increment against the persisted centroids (drift ≈ 1)
      val inc = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("cid"), col("embedding").as("cvec"))
      graft.functions.SimilarityOps.ivfIndexAppend(inc, dir,
        txnAppId = Some("ivf_gate"), txnVersion = Some(1L))
      new java.io.FileOutputStream(done).close()
    }
    dir
  }

  /** IVF-flat index whose content is EXACTLY the embeddings corpus (no
    * shifted increment, unlike [[ivfIndexDir]]): the pure-index serving
    * gate (`q_ann_ivf_serve`) ranks against the index's own stored
    * vectors, so its content must equal the oracle's corpus row-for-row.
    */
  private def ivfServeIndexDir(s: SparkSession, d: String, storage: String = "f64"): String = {
    val dir = Btr.cachePath(d,
      if (storage == "f64") "ivf_serve_index" else s"ivf_serve_index_$storage")
    val done = new java.io.File(dir, "_built_v1")
    if (!done.exists()) {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
      val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
      if (fs.exists(root)) fs.delete(root, true)
      val cands = t(s, d, "embeddings")
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      graft.functions.SimilarityOps.ivfIndexBuild(cands, dir, nlist = 16,
        vectorStorage = storage)
      new java.io.FileOutputStream(done).close()
    }
    dir
  }

  /** Shared body of the quantized-layout serving gates (`q_ann_ivf_f32`,
    * `q_ann_ivf_i8`): serve from a quantized index over the exact
    * embeddings corpus, recall-gate against DuckDB's exact ranking, and
    * pin serve ≡ indexed row-identity on the same index (both paths rank
    * the same stored vectors through the same two-stage plan, so the
    * approximate answers must agree exactly).
    */
  private def annQuantGate(
      s: SparkSession, d: String, storage: String, agreeCol: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val dir = ivfServeIndexDir(s, d, storage)
    val served = SimilarityOps.ivfTopKServe(queries, dir, 3, nprobe = 6)
      .select(col("qid"), col("cid"), col("rank"))
    val idx = SimilarityOps.ivfTopKIndexed(queries, cands, dir, 3, nprobe = 6)
      .select(col("qid"), col("cid"), col("rank"))
    val fo = served.withColumn("ia", lit(1))
      .join(idx.withColumn("ib", lit(1)), Seq("qid", "cid", "rank"), "full_outer")
      .agg((count(lit(1)) === count(col("ia")) &&
        count(lit(1)) === count(col("ib"))).as(agreeCol))
    val exact = SimilarityOps.bruteForceTopK(queries, cands, 3)
      .select(col("qid"), col("cid"))
    exact.join(served.select(col("qid"), col("cid"), lit(1).as("hit")),
        Seq("qid", "cid"), "left")
      .agg(count(lit(1)).as("n_exact"),
        (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
      .crossJoin(fo) // 1×1
  }

  /** Fixture for the trusted-serving gate (`q_ann_ivf_trusted`): the
    * embeddings corpus as a btr TABLE (so it has a commit log) plus an
    * IVF-flat index built recording that table's latest commit version —
    * [[graft.functions.SimilarityOps.ivfIndexFresh]] then PROVES zero
    * index debt and the query may take the trustIndex fast path (zero
    * corpus file access, plan-pinned in IvfServeSpec).
    */
  private def ivfTrustedDirs(s: SparkSession, d: String): (String, String) = {
    val root = Btr.cachePath(d, "ivf_trusted")
    val table = s"$root/corpus"
    val idx = s"$root/index"
    val done = new java.io.File(root, "_built_v1")
    if (!done.exists()) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
      val qroot = fs.makeQualified(new org.apache.hadoop.fs.Path(root))
      if (fs.exists(qroot)) fs.delete(qroot, true) // partial build: wipe
      t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        .write.format("btr").mode("overwrite").save(table)
      val p = new org.apache.hadoop.fs.Path(table)
      val tfs = p.getFileSystem(graft.format.BtrTableMeta.hadoopConf())
      val v = graft.sources.BtrLog.latestVersion(tfs, tfs.makeQualified(p))
      val cands = s.read.format("btr").load(table)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      graft.functions.SimilarityOps.ivfIndexBuild(cands, idx, nlist = 16,
        corpusVersion = v)
      new java.io.FileOutputStream(done).close()
    }
    (table, idx)
  }

  /** Cached fixture for the CDC-driven index refresh gate
    * (`q_ann_ivf_refresh`): corpus table (retained) at v1 → index built
    * from v1 → DELETE `vec_id % 7 = 3` (v2) → append the +2,000,000
    * shifted increment (v3) → ONE `ivfIndexRefresh` over the (1,3] feed
    * with txn identity (replayed immediately to prove the no-op under
    * the gate) → a final +3,000,000-shifted append the index does NOT
    * see, so the query path's staleness fallback is exercised too.
    * Returns (corpusTableDir, indexDir).
    */
  private def ivfRefreshDirs(s: SparkSession, d: String): (String, String) = {
    val root = Btr.cachePath(d, "ivf_refresh")
    val table = s"$root/corpus"
    val idx = s"$root/index"
    val done = new java.io.File(root, "_built_v1")
    if (!done.exists()) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
      val qroot = fs.makeQualified(new org.apache.hadoop.fs.Path(root))
      if (fs.exists(qroot)) fs.delete(qroot, true) // partial build: wipe
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      emb.write.format("btr").option("btr.retainRemoved", "true")
        .mode("overwrite").save(table)
      val v1 = s.read.format("btr").option("btr.versionAsOf", "1").load(table)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      SimilarityOps.ivfIndexBuild(v1, idx, nlist = 16)
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.BtrCatalog].getName)
      s.sql(s"DELETE FROM graft.`$table` WHERE vec_id % 7 = 3")
      emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
        .write.format("btr").mode("append").save(table)
      val feed = graft.sources.BtrChanges.between(s, table, 1L, 3L)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("_change_type"), col("_commit_version"))
      val st = SimilarityOps.ivfIndexRefresh(feed, idx,
        txnAppId = Some("gate"), txnVersion = Some(3L))
      require(!st.replayed && st.rowsAssigned > 0 && st.rowsDeleted > 0,
        s"ivf_refresh gate fixture: unexpected refresh stats $st")
      val replay = SimilarityOps.ivfIndexRefresh(feed, idx,
        txnAppId = Some("gate"), txnVersion = Some(3L))
      require(replay.replayed && replay.rowsAssigned == 0,
        s"ivf_refresh gate fixture: replay must no-op, got $replay")
      emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
        .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
        .write.format("btr").mode("append").save(table)
      new java.io.FileOutputStream(done).close()
    }
    (table, idx)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: canonical doc per distinct text. Shuffles 8-byte
    // fingerprints, not document bodies: group by xxhash64(text) first,
    // then re-verify only the (rare) multi-member groups against the full
    // text, so hash collisions can never merge distinct documents.
    "q_dedup_exact" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val withFp = docs.withColumn("fp", xxhash64(col("text")))
      val counts = withFp.groupBy("fp")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep1"))
      val singles = counts.filter(col("n") === 1)
        .select(col("keep1").as("keep_id"), col("n").as("n_copies"))
      val multiFps = counts.filter(col("n") > 1).select("fp")
      val verified = withFp.join(multiFps, "fp")
        .groupBy("fp", "text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
      singles.union(verified).orderBy("keep_id")
    }),

    // paragraph-level exact dedup (VERDICT r19 #5): the Gopher/FineWeb
    // step between doc-level dedup and boilerplate n-gram pruning. The
    // synthetic docs are single-paragraph with no exact duplicates at
    // gate scale, so a deterministic page corpus creates the repeated-
    // paragraph structure the op exists for: page k = a header paragraph
    // (the text of doc k % 10 — each header recurs on ~n/30 pages, and
    // doubles as a body paragraph on its home page, exercising the
    // within-page copy drop) + a body of 3 consecutive docs, joined by
    // blank lines in doc_id order. The oracle rebuilds identical pages
    // in SQL. Detection shuffles 8-byte fingerprints; see
    // TextOps.dedupParagraphs for the full scale contract.
    "q_dedup_paragraphs" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val body = docs.groupBy(expr("doc_id DIV 3").as("page_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          "\n\n").as("body"))
      val headers = docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("hid"), col("text").as("header"))
      val pages = body.join(broadcast(headers), pmod(col("page_id"), lit(10)) === col("hid"))
        .select(col("page_id"), concat_ws("\n\n", col("header"), col("body")).as("text"))
      TextOps.dedupParagraphs(pages, "page_id", "text")
        .select(col("id").as("page_id"), col("clean_text"),
          col("n_kept"), col("n_dropped"))
        .orderBy("page_id")
    }),

    // incremental dedup: the change feed powering the pipeline — only
    // the NEW docs (snapshot range (1, 2]) are fingerprinted and checked
    // against the corpus (version 1), so per-increment cost scales with
    // the increment, never the corpus. Admission = not a duplicate of
    // any corpus doc, and first (min doc_id) among its copies within the
    // increment. Hash tiers mirror q_dedup_exact: 8-byte fingerprints
    // shuffle, full text re-verifies only colliding groups.
    "q_incremental_dedup" -> ((s, d) => {
      val dir = documentsTwoCommits(s, d)
      val feed = graft.sources.BtrChanges.between(s, dir, 1L, 2L)
        .select(col("doc_id"), col("text"))
      val corpus = s.read.format("btr").option("btr.versionAsOf", "1").load(dir)
      val newFp = feed.withColumn("fp", xxhash64(col("text")))
      val corpusFp = corpus
        .select(xxhash64(col("text")).as("fp"), col("text").as("c_text"))
      // fp-equal corpus matches, re-verified on full text (collisions
      // must not evict a genuinely new doc); then anti-join the verified
      // duplicate fps away
      val dupFps = newFp.join(corpusFp, "fp")
        .filter(col("text") === col("c_text")).select("fp").distinct()
      val stillNew = newFp.join(dupFps, Seq("fp"), "left_anti")
      val counts = stillNew.groupBy("fp")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep1"))
      val singles = counts.filter(col("n") === 1)
        .select(col("keep1").as("keep_id"), col("n").as("n_new"))
      val multiFps = counts.filter(col("n") > 1).select("fp")
      val verified = stillNew.join(multiFps, "fp")
        .groupBy("fp", "text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_new"))
        .select(col("keep_id"), col("n_new"))
      singles.union(verified).orderBy("keep_id")
    }),

    // MinHash+LSH near-dup: candidates from band-bucket join, pairs
    // verified with exact trigram Jaccard. RECALL ASSUMPTION (the gate
    // threshold is 0.9, not the pipeline's usual 0.5): the brute-force
    // DuckDB oracle has recall 1, LSH does not — with 8 bands × 4 rows a
    // jaccard-j pair is found with prob 1-(1-j^4)^8 (≈0.40 at j=0.5,
    // ≈0.9998 at j=0.9). Gating the emitted set at ≥0.9 on BOTH sides
    // keeps the comparison in the high-recall band, so threshold-adjacent
    // pairs in future data exclude themselves instead of flaking the gate.
    "q_dedup_minhash" -> ((s, d) => {
      TextOps.minhashDedup(t(s, d, "documents"), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.9)
        .orderBy("id_a", "id_b")
    }),

    // incremental near-dup: only the increment (version-(1,2] change
    // feed) is shingled and signed; its band rows probe the corpus's
    // banded-signature index (recomputed here from v1; persisted at
    // scale) — per-batch cost scales with the increment, never
    // corpus × corpus. Candidates verify with exact trigram Jaccard.
    // Same RECALL ASSUMPTION as q_dedup_minhash: the gate compares at
    // jaccard ≥ 0.9 (LSH detection ≈0.9998 there), not the pipeline's
    // 0.5, so the brute-force oracle and the banded probe agree for any
    // data without relying on planted dups staying near-identical.
    "q_incremental_minhash" -> ((s, d) => {
      val dir = documentsTwoCommits(s, d)
      val corpus = s.read.format("btr").option("btr.versionAsOf", "1").load(dir)
      val increment = graft.sources.BtrChanges.between(s, dir, 1L, 2L)
        .select(col("doc_id"), col("text"))
      TextOps.minhashIncrement(corpus, increment, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.9)
        .orderBy("id_new", "id_corpus")
    }),

    // SimHash near-dup pairs (hamming ≤ 3), built on the engine-portable
    // md5-derived 60-bit token hash so DuckDB recomputes the identical
    // simhashes and the brute-force xor/bit_count oracle matches EXACTLY —
    // block bucketing + skew guard + hamming verify all oracle-checked
    "q_dedup_simhash" -> ((s, d) => {
      TextOps.simhashDedup(t(s, d, "documents"), "doc_id", "text",
          maxDist = 3, bits = 60, useMd5 = true)
        .orderBy("id_a", "id_b")
    }),

    // character-5-gram exact Jaccard pairs over a bounded id range
    // (correctness baseline for the shingle pipelines). Inverted-index
    // shape — explode shingles, equi-join on the shingle, count shared
    // shingles per pair — NOT an all-pairs array_intersect nested-loop
    // join: Catalyst pushes the jaccard threshold into a BNLJ's join
    // condition AHEAD of the cheap id_a < id_b conjunct and recomputes the
    // intersection again in the projection above, evaluating the O(|sh|)
    // intersect twice for every ordered pair (the r2-r4 q_dedup_ngram
    // slowdown). The equi-join shuffles on the shingle instead — partial
    // aggregation, no per-pair re-scan, and the shape that survives scale.
    "q_dedup_ngram" -> ((s, d) =>
      TextOps.ngramJaccardPairs(
        t(s, d, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        n = 5, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // near-dup CLUSTER assignment: connected components over the verified
    // MinHash pair graph — every doc labeled with the min id it can reach
    // (its canonical "keep" doc; singletons keep themselves). Oracle is a
    // DuckDB recursive CTE over the same brute-force pair graph.
    "q_dedup_clusters" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // edges gated at jaccard ≥ 0.9: same oracle RECALL ASSUMPTION as
      // q_dedup_minhash (the DuckDB oracle is brute-force, LSH is not)
      val pairs = TextOps.minhashDedup(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.9)
        .select(col("id_a"), col("id_b"))
      TextOps.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
        .select(col("id").as("doc_id"), col("cid").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // embedding cosine near-dup pairs over a bounded id range
    // embedding k-means clusters — the SemDeDup-style curation primitive
    // (cluster the corpus, then sample/cap/diversify PER cluster).
    // Deterministic quantized Lloyd's (integer distances, smallest-id
    // init, HALF_UP centroid rounding) so DuckDB replays the identical
    // two iterations; assignment is a broadcast map-only pass at scale
    "q_embed_clusters" -> ((s, d) => {
      SimilarityOps.kmeansClusters(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 4, iters = 2)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // cluster-balanced sample: the 3 lowest portable-hash members per
    // cluster — the downsampling shape that keeps corpus diversity
    "q_cluster_sample" -> ((s, d) => {
      val assigned = SimilarityOps.kmeansClusters(t(s, d, "embeddings"),
        "vec_id", "embedding", k = 4, iters = 2)
      assigned.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster"))
            .orderBy(md5(col("id").cast("string")), col("id"))))
        .filter(col("rn") <= 3)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("cluster", "vec_id")
    }),

    // SemDeDup end to end: k-means clusters → within-cluster cosine
    // near-dup pairs (pairwise compare bounded per cluster) → connected
    // components → keep each component's lowest id. One exact oracle
    // checks the whole composition
    "q_semantic_dedup" -> ((s, d) => {
      SimilarityOps.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 16, iters = 2, threshold = 0.35)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    "q_embed_neardup" -> ((s, d) => {
      SimilarityOps.cosineNearDupPairs(
          t(s, d, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding", 0.35)
        .orderBy("id_a", "id_b")
    }),

    // brute-force cosine top-3 for the first 10 query vectors (exact ANN
    // baseline; queries broadcast, one pass over candidates)
    "q_ann_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      SimilarityOps.bruteForceTopK(queries, cands, 3)
        .select(col("qid"), col("cid"), col("cos"), col("rank"))
        .orderBy("qid", "rank")
    }),

    // LSH-bucketed ANN (the scale path), scored against the in-Spark
    // brute-force ground truth: the corpus is near-random (top-3 cos
    // ≈ 0.35), the worst case for LSH, so the checked contract is
    // recall@3 above a floor rather than exact top-k equality. n_exact
    // comes from the data via the DuckDB oracle; recall is deterministic
    // (seeded hyperplanes).
    "q_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val lsh = SimilarityOps.lshTopK(queries, cands, 3, numBits = 5, dim = 64, numTables = 8)
        .select(col("qid"), col("cid"), lit(1).as("hit"))
      val exact = SimilarityOps.bruteForceTopK(queries, cands, 3)
        .select(col("qid"), col("cid"))
      // ONE pass over the (expensive) brute-force truth: a left join
      // counts the total and the hits together — the previous
      // semi-join + crossJoin shape evaluated the O(n·q) brute force
      // twice per run (both pairs sets are unique on (qid, cid), so the
      // left join is 1:≤1 and the counts are exact)
      exact.join(lsh, Seq("qid", "cid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
    }),

    // IVF ANN (k-means coarse quantizer, probe nprobe cells), scored as
    // recall@3 against in-Spark brute force like q_ann_lsh
    "q_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val ivf = SimilarityOps.ivfTopK(queries, cands, 3, nlist = 16, nprobe = 6)
        .select(col("qid"), col("cid"), lit(1).as("hit"))
      val exact = SimilarityOps.bruteForceTopK(queries, cands, 3)
        .select(col("qid"), col("cid"))
      // single pass over the brute-force truth (see q_ann_lsh)
      exact.join(ivf, Seq("qid", "cid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
    }),

    // IVF ANN through the PERSISTED index (built + incrementally appended
    // by ivfIndexDir): recall-gated against DuckDB's exact ranking like
    // q_ann_ivf, PLUS row-identity against the per-call path — the index
    // was built from the same corpus with the same seeded fit, so
    // persisted centroids/assignments must reproduce ivfTopK exactly
    "q_ann_ivf_indexed" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val dir = ivfIndexDir(s, d)
      val idx = SimilarityOps.ivfTopKIndexed(queries, cands, dir, 3, nprobe = 6)
        .select(col("qid"), col("cid"), col("rank"))
      val call = SimilarityOps.ivfTopK(queries, cands, 3, nlist = 16, nprobe = 6)
        .select(col("qid"), col("cid"), col("rank"))
      val fo = idx.withColumn("ia", lit(1))
        .join(call.withColumn("ib", lit(1)), Seq("qid", "cid", "rank"), "full_outer")
        .agg((count(lit(1)) === count(col("ia")) &&
          count(lit(1)) === count(col("ib"))).as("indexed_matches_percall"))
      val exact = SimilarityOps.bruteForceTopK(queries, cands, 3)
        .select(col("qid"), col("cid"))
      exact.join(idx.select(col("qid"), col("cid"), lit(1).as("hit")),
          Seq("qid", "cid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
        .crossJoin(fo) // 1×1
    }),

    // PURE-INDEX IVF serving (the flat-cost ANN path at 100 TB): the
    // IVF-flat index IS the corpus — one query batch reads the centroids
    // plus ONLY the probed cells' partition directories, zero corpus
    // access (per-batch I/O ∝ nprobe/nlist; partition pruning is plan-
    // pinned in IvfServeSpec). Recall-gated against DuckDB's exact
    // ranking, plus row-identity against ivfTopKIndexed over the same
    // corpus — serve and indexed share persisted centers and membership,
    // so their approximate answers must agree exactly.
    "q_ann_ivf_serve" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val dir = ivfServeIndexDir(s, d)
      val served = SimilarityOps.ivfTopKServe(queries, dir, 3, nprobe = 6)
        .select(col("qid"), col("cid"), col("rank"))
      val idx = SimilarityOps.ivfTopKIndexed(queries, cands, dir, 3, nprobe = 6)
        .select(col("qid"), col("cid"), col("rank"))
      val fo = served.withColumn("ia", lit(1))
        .join(idx.withColumn("ib", lit(1)), Seq("qid", "cid", "rank"), "full_outer")
        .agg((count(lit(1)) === count(col("ia")) &&
          count(lit(1)) === count(col("ib"))).as("serve_matches_indexed"))
      val exact = SimilarityOps.bruteForceTopK(queries, cands, 3)
        .select(col("qid"), col("cid"))
      exact.join(served.select(col("qid"), col("cid"), lit(1).as("hit")),
          Seq("qid", "cid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
        .crossJoin(fo) // 1×1
    }),

    // Quantized IVF-flat serving, f32 layout (VERDICT r18 #1): half the
    // stored vector bytes, ranking path unchanged. Recall-gated against
    // DuckDB's exact ranking plus serve ≡ indexed row-identity over the
    // same f32 index (shared persisted centers + membership + stored
    // floats, so the two approximate answers must agree exactly).
    "q_ann_ivf_f32" -> ((s, d) => annQuantGate(s, d, "f32", "serve_matches_indexed")),

    // Quantized IVF-flat serving, i8 layout (VERDICT r18 #1): the
    // shortlist scan reads 1 byte/dim (per-vector affine codes; the
    // float32 copy column-prunes out) and the exact re-rank fetches only
    // the shortlist's ids — ~8× less ranking I/O per probed cell at any
    // corpus size. Same recall + serve ≡ indexed identity gates.
    "q_ann_ivf_i8" -> ((s, d) => annQuantGate(s, d, "i8", "serve_matches_indexed")),

    // Trusted IVF serving under the gate (VERDICT r17 #3): the corpus is
    // a btr table, the index records its commit version at build, and
    // ivfIndexFresh PROVES zero debt — so ivfTopKIndexed(trustIndex=true)
    // skips the per-batch corpus membership pass entirely (zero corpus
    // file access, plan-pinned in IvfServeSpec). The gate checks the
    // freshness proof held, the trusted result equals the untrusted one
    // row-for-row, and recall against DuckDB's exact ranking.
    "q_ann_ivf_trusted" -> ((s, d) => {
      val (table, idx) = ivfTrustedDirs(s, d)
      val fresh = SimilarityOps.ivfIndexFresh(idx, table)
      val cands = s.read.format("btr").load(table)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = cands.filter(col("cid") < 10)
        .select(col("cid").as("qid"), col("cvec").as("qvec"))
      val trusted = SimilarityOps.ivfTopKIndexed(
        queries, cands, idx, 3, nprobe = 6, trustIndex = fresh)
        .select(col("qid"), col("cid"), col("rank"))
      val untrusted = SimilarityOps.ivfTopKIndexed(queries, cands, idx, 3, nprobe = 6)
        .select(col("qid"), col("cid"), col("rank"))
      val fo = trusted.withColumn("ia", lit(1))
        .join(untrusted.withColumn("ib", lit(1)), Seq("qid", "cid", "rank"), "full_outer")
        .agg((count(lit(1)) === count(col("ia")) &&
          count(lit(1)) === count(col("ib"))).as("trusted_matches_untrusted"))
      val exact = SimilarityOps.bruteForceTopK(queries, cands, 3)
        .select(col("qid"), col("cid"))
      exact.join(trusted.select(col("qid"), col("cid"), lit(1).as("hit")),
          Seq("qid", "cid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
        .withColumn("fresh_ok", lit(fresh))
        .crossJoin(fo) // 1×1
    }),

    // CDC-driven IVF index refresh (VERDICT r14 #1/#2 under the gate):
    // the fixture deletes a seventh of the corpus and appends an
    // increment through ONE txn-identified ivfIndexRefresh batch
    // (replayed to prove exactly-once), then appends rows the index
    // does NOT cover. The indexed top-k must reach the recall gate
    // against DuckDB's exact ranking over the SAME current corpus
    // (reconstructed by predicate on the parquet table), the assign
    // table must hold exactly the refreshed ids once each, and the
    // staleness fallback must be live (unindexed rows still searched).
    "q_ann_ivf_refresh" -> ((s, d) => {
      val (table, idx) = ivfRefreshDirs(s, d)
      val current = s.read.format("btr").load(table)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = current.filter(col("cid") < 10)
        .select(col("cid").as("qid"), col("cvec").as("qvec"))
      val topk = SimilarityOps.ivfTopKIndexed(queries, current, idx, 3, nprobe = 6)
        .select(col("qid"), col("cid"))
      val assign = s.read.format("btr")
        .load(SimilarityOps.ivfIndexAssignPath(idx)).select(col("cid"))
      // one aggregate job computes total AND distinct assign rows (cids
      // are non-null, so count_distinct ≡ distinct().count() here) — the
      // pre-r21 shape ran two separate counts over the same table
      val aStats = assign
        .agg(count(lit(1)).as("n"), count_distinct(col("cid")).as("nd")).collect()(0)
      val nAssign = aStats.getLong(0)
      val refreshed = current.filter(col("cid") < 3000000L)
      val exactlyOnce = nAssign == aStats.getLong(1) &&
        nAssign == refreshed.count()
      val stale = SimilarityOps.ivfIndexStaleness(current, idx)
      val exact = SimilarityOps.bruteForceTopK(queries, current, 3)
        .select(col("qid"), col("cid"))
      exact.join(topk.withColumn("hit", lit(1)), Seq("qid", "cid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hit")).cast("double") / count(lit(1)) >= 0.3).as("recall_ok"))
        .withColumn("refresh_exactly_once", lit(exactlyOnce))
        .withColumn("fallback_covered", lit(stale == 10L))
    }),

    // BPE-style token counting (lookahead-free GPT-2 pre-tokenizer regex,
    // identical split in Java regex and RE2 → exact DuckDB oracle)
    "q_token_bpe" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    }),

    // language ID via stopword-overlap heuristic + agreement with label
    "q_lang_id" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.langId(TextOps.tokens(col("text"))).as("pred"))
        .withColumn("agree", when(col("pred") === col("lang"), 1).otherwise(0))
        .orderBy("doc_id")
    }),

    // document fingerprinting: normalized rolling-hash identity counts
    "q_fingerprint" -> ((s, d) => {
      t(s, d, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(TextOps.fingerprint(col("text"))).as("n_unique_fp"))
    }),

    // token count: whitespace tokenization per doc
    // document attributes STORED as map<string,string> in the format:
    // the free-form metadata shape (source, license, lang tags) a real
    // corpus carries per document. Round-trips the two element streams;
    // DuckDB recomputes the same aggregation from the flat columns.
    "q_map_attrs" -> ((s, d) => {
      val dir = Btr.cachePath(d, "documents_attrs")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        t(s, d, "documents")
          .select(col("doc_id"),
            map(lit("lang"), col("lang"),
              lit("head"), substring(col("text"), 1, 8)).as("attrs"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .select(col("doc_id"), element_at(col("attrs"), "lang").as("lang"),
          element_at(col("attrs"), "head").as("head"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), min(col("head")).as("min_head"))
        .orderBy("lang")
    }),

    // per-field score LISTS stored as map<string,array<double>> in the
    // format (the per-span quality/toxicity shape a scored corpus
    // carries): the value side rides the recursive array-column layout
    // inside the map chunk. DuckDB recomputes from raw text.
    "q_map_array_scores" -> ((s, d) => {
      val dir = Btr.cachePath(d, "documents_scores")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        t(s, d, "documents")
          .select(col("doc_id"),
            map(lit("len"), array(length(col("text")).cast("double")),
              lit("half"), array((length(col("text")) * 0.5),
                length(col("text")).cast("double") * 2.0)).as("scores"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .select(element_at(col("scores"), "len").getItem(0).as("len"),
          element_at(col("scores"), "half").getItem(1).as("dbl"))
        .agg(count(lit(1)).as("n_docs"), round(sum(col("len")), 2).as("sum_len"),
          round(sum(col("dbl")), 2).as("sum_dbl"))
    }),

    // per-FIELD PROVENANCE stored as map<string,struct<source,version,
    // confidence>> in the format — the training-data metadata shape where
    // each document field carries where it came from. The struct VALUE
    // stream rides the recursive struct-column layout inside the map
    // chunk (each leaf under its own scheme selection); confidences use
    // exactly-representable quarters so both engines' sums are
    // bit-identical. DuckDB recomputes from the flat columns.
    "q_map_struct_values" -> ((s, d) => {
      val dir = Btr.cachePath(d, "documents_prov")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        t(s, d, "documents")
          .select(col("doc_id"),
            map(
              lit("text"), struct(
                col("lang").as("source"),
                (col("doc_id") % 5).cast("long").as("version"),
                (length(col("text")).cast("double") * 0.25).as("confidence")),
              lit("title"), struct(
                lit("web").as("source"), lit(1L).as("version"),
                lit(0.5).as("confidence"))).as("prov"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .select(
          element_at(col("prov"), "text").getField("source").as("source"),
          element_at(col("prov"), "text").getField("version").as("version"),
          element_at(col("prov"), "text").getField("confidence").as("conf"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("version")).cast("long").as("sum_ver"),
          round(sum(col("conf")), 2).as("sum_conf"))
        .orderBy("source")
    }),

    // NESTED double vectors stored as array<array<double>> in the format
    // (the per-span-embedding / tokenized-sentence shape): the outer
    // lengths cascade rides over an element stream that is itself an
    // array column. Values are exact binary fractions (quarters/halves)
    // so both engines' sums are bit-identical in any order. DuckDB
    // recomputes from the flat columns.
    "q_nested_arrays" -> ((s, d) => {
      // DEPTH-3 nested arrays (array<array<array<double>>> — the
      // token-span-embedding shape): every level carries its own lengths
      // cascade, scalars compress at the bottom. Values are exact
      // quarters so both engines' double sums are order-independent.
      val dir = Btr.cachePath(d, "documents_nested3")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        t(s, d, "documents")
          .select(col("doc_id"),
            array(
              array(
                array(length(col("text")).cast("double") * 0.25),
                array(col("doc_id") * 0.5,
                  length(col("text")).cast("double"))),
              array(
                array(col("doc_id") + lit(0.25)))).as("vecs"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .select(explode(col("vecs")).as("mid"))
        .select(explode(col("mid")).as("leaf"))
        .agg(count(lit(1)).cast("long").as("n_leaf"),
          sum(size(col("leaf"))).cast("long").as("n_vals"),
          round(sum(aggregate(col("leaf"), lit(0.0), (a, x) => a + x)), 2).as("sum_all"))
    }),

    // per-span annotations STORED as array<struct<start,end,label,score>>
    // — THE labeled-span shape of an annotated training corpus (NER
    // spans, quality spans, redaction spans). Rides the recursive
    // array<struct> chunk layout; DuckDB recomputes from raw text.
    // Scores use exactly-representable quarters so both engines' double
    // sums are bit-identical under any addition order.
    "q_span_annotations" -> ((s, d) => {
      val dir = Btr.cachePath(d, "documents_spans")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        t(s, d, "documents")
          .select(col("doc_id"),
            array(
              struct(lit(0).as("start"), length(col("text")).as("end"),
                col("lang").as("label"),
                (length(col("text")).cast("double") * 0.25).as("score")),
              struct(lit(1).as("start"), (length(col("text")) + 7).as("end"),
                lit("half").as("label"), lit(2.5).as("score"))).as("spans"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .select(explode(col("spans")).as("s"))
        .groupBy(col("s.label").as("label"))
        .agg(count(lit(1)).as("n"), sum(col("s.end")).cast("long").as("sum_end"),
          round(sum(col("s.score")), 2).as("sum_score"))
        .orderBy("label")
    }),

    // token arrays STORED as array<string> in the format: tokenize once
    // at write, then query the materialized lists — the layout a
    // tokenized training corpus actually uses (re-tokenizing per query
    // burns the regex on every pass). Round-trips through the btr
    // array<string> element stream; DuckDB recomputes from raw text.
    "q_token_arrays" -> ((s, d) => {
      val dir = Btr.cachePath(d, "documents_tokens")
      if (!new java.io.File(dir, "_btr_meta.json").exists()) {
        t(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
          .write.format("btr").mode("overwrite").save(dir)
      }
      s.read.format("btr").load(dir)
        .select(col("doc_id"), size(col("toks")).as("n_toks"),
          element_at(col("toks"), 1).as("first_tok"))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"),
          min(col("first_tok")).as("min_first"))
        .orderBy("bucket")
    }),

    "q_token_count" -> ((s, d) => {
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"),
          length(col("text")).as("n_chars_m"))
        .orderBy("doc_id")
    }),

    // top-3 TF-IDF keywords per document (integer-deterministic ranking,
    // smoothed idf score along for display)
    "q_text_keywords" -> ((s, d) => {
      TextOps.topKeywords(t(s, d, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rank")
    }),

    // quality scoring: length/punctuation/digit/whitespace ratios
    "q_text_quality" -> ((s, d) => {
      val text = col("text")
      val len = length(text).cast("double")
      t(s, d, "documents")
        .select(
          col("doc_id"),
          length(text).as("n_chars_m"),
          round(length(regexp_replace(text, "[^.!?,;:]", "")) / len, 4).as("punct_ratio"),
          round(length(regexp_replace(text, "[^0-9]", "")) / len, 4).as("digit_ratio"),
          round(length(regexp_replace(text, "[^ ]", "")) / len, 4).as("space_ratio"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals: vocabulary diversity, duplicate
    // bi/trigram fractions, top word/bigram concentration per document —
    // the repetition-based quality filters a training pipeline applies
    // before dedup. Exact DuckDB oracle over the same list algebra.
    "q_repetition" -> ((s, d) =>
      TextOps.repetitionSignals(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // corpus-level boilerplate heavy-hitters: top-20 repeated word
    // 5-grams with occurrence count + document frequency (C4's frequent-
    // line removal, generalized to n-grams). One gram-keyed shuffle.
    "q_boilerplate" -> ((s, d) =>
      TextOps.boilerplateNgrams(t(s, d, "documents"), "doc_id", "text", n = 5, topK = 20)
        .orderBy("gram")),

    // PII redaction: deterministic synthetic PII woven into each doc (both
    // engines build the identical string), then the RE2-portable
    // email/IPv4/phone redaction chain — byte-exact oracle
    "q_pii_redact" -> ((s, d) => {
      val msg = concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id"), lit("@example.com or call +1 555-000-"),
        col("doc_id"), lit(" at 10.0.0."), pmod(col("doc_id"), lit(255)))
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.redactPii(msg).as("redacted"))
        .orderBy("doc_id")
    }),

    // benchmark decontamination: corpus docs sharing any word 8-gram with
    // the benchmark subset (doc_id % 50 = 0) are contaminated
    "q_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      TextOps.contaminationFlags(corpus, bench, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // stratified deterministic downsampling: md5-keyed sample, 10% of
    // English docs, 50% of everything else — engine-portable hash, so the
    // exact sampled id set is the oracle
    "q_stratified_sample" -> ((s, d) => {
      val rate = when(col("lang") === "en", 10L).otherwise(50L)
      t(s, d, "documents")
        .filter(TextOps.sampleKey(col("doc_id"), "graft-sample-1") < rate)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // corpus mixing: fill per-source token budgets deterministically —
    // docs ordered by a salted portable hash within their source, taken
    // while the budget has room (a doc whose PRIOR cumulative tokens are
    // under the budget is admitted, so every budget is met or exceeded
    // by at most one doc, and reruns are byte-identical). One window
    // shuffle partitioned by source; at 100 TB each source's docs sort
    // within their partitions — no global sort, no driver state
    "q_corpus_mix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = when(col("lang") === "en", 5000L).otherwise(3000L)
      val tk = t(s, d, "documents").select(
        col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        TextOps.md5Hash60(concat(lit("graft-mix-1"), col("doc_id").cast("string")))
          .as("hk"))
      val w = Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tk.withColumn("prior", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .filter(col("prior") < budget)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // sequence packing: every doc's position in fixed-512-token training
    // sequences (concat-and-chunk over 8 independent md5-routed shards —
    // one window shuffle, no global sequential dependency)
    "q_seq_pack" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      TextOps.packSequences(docs, "doc_id",
          size(split(trim(col("text")), "\\s+")).cast("long"),
          budget = 512L, shards = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // document chunking for embedding/RAG pipelines: overlapping 32-token
    // windows every 24 tokens — one codegen'd projection + posexplode,
    // no shuffle, no UDF
    "q_doc_chunks" -> ((s, d) => {
      TextOps.chunkDocuments(
          t(s, d, "documents").filter(col("text").isNotNull),
          "doc_id", "text", window = 32, stride = 24)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_id")
    }),

    // the whole training-data cleaning pipeline composed end to end:
    // exact dedup (keep min id per portable text hash) → drop benchmark
    // docs → decontaminate (no shared 8-gram with the benchmark) →
    // quality floor → deterministic stratified downsample. One DuckDB
    // oracle checks the entire composition.
    "q_pipeline_clean" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val w = Window.partitionBy(TextOps.md5Hash60(col("text"))).orderBy("doc_id")
      val deduped = docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val corpus = deduped.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val flagged = TextOps.contaminationFlags(corpus, bench, "doc_id", "text", n = 8)
      val clean = corpus.join(flagged.filter(!col("contaminated")), Seq("doc_id"), "left_semi")
      val rate = when(col("lang") === "en", 30L).otherwise(60L)
      clean
        .filter(length(col("text")) >= 100)
        .filter(TextOps.sampleKey(col("doc_id"), "graft-clean-1") < rate)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // Q-meta (SURVEY §2.7#8): describe_btr folded to per-column sums the
    // data itself proves — chunk n_rows/n_nulls must sum to the table's
    // true counts — plus structural consistency (chunk blobs tile the file
    // exactly; every scheme tree parses). Real DuckDB oracle.
    "q_describe_btr" -> ((s, d) => {
      t(s, d, "lineitem").count() // ensure the cache table exists
      val dir = Btr.cachePath(d, "lineitem")
      val desc = graft.functions.BtrInspect.describe(s, dir)
      val filesOk = graft.functions.BtrInspect.fileConsistency(s, dir)
        .agg(min(when(col("ok"), 1).otherwise(0)).as("files_ok"))
      desc.groupBy(col("column").as("col_name"))
        .agg(
          sum(col("n_rows")).as("n_rows_sum"),
          sum(col("n_nulls")).as("n_nulls_sum"),
          max(when(col("scheme_tree").contains("?"), 1).otherwise(0)).as("bad_tree"))
        .crossJoin(filesOk)
        .select(col("col_name"), col("n_rows_sum"), col("n_nulls_sum"),
          (col("bad_tree") === 0 && col("files_ok") === 1).as("consistent"))
        .orderBy("col_name")
    }),

    // Metadata-only NDV: the per-column footer HyperLogLog sketches
    // (format v6) merged across files must land within 5% of the exact
    // distinct count — the estimate Catalyst's CBO receives from
    // estimateStatistics. The boolean is the engine-portable gate (like
    // q_ann_lsh's recall check); n_exact itself is compared value-exact
    // against DuckDB. At p=12 the sketch's standard error is 1.6%, so 5%
    // is 3 sigma — and the data is fixed, so the check is deterministic.
    "q_ndv_meta" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.count() // ensure the cache table exists
      val dir = Btr.cachePath(d, "lineitem")
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      val est = graft.functions.BtrInspect.ndvEstimates(s, dir)
        .select(col("column").as("col_name"), col("ndv_est"))
      // one single-column scan + partial-agg per column, unioned — beats
      // the multi-countDistinct Expand (which multiplies every row by the
      // column count before aggregating)
      val exact = cols.map(c =>
        li.select(col(c)).agg(countDistinct(col(c)).as("n_exact"))
          .select(lit(c).as("col_name"), col("n_exact")))
        .reduce(_ unionAll _)
      exact.join(est, "col_name")
        .select(col("col_name"), col("n_exact"),
          (col("ndv_est").isNotNull &&
            abs(col("ndv_est") - col("n_exact")) <= col("n_exact") * 0.05).as("ndv_ok"))
        .orderBy("col_name")
    }),

    // REAL audio decode under the oracle gate: each doc's text becomes a
    // deterministic 8-bit PCM WAV (fixed 200-byte body, so the RIFF
    // header is one constant literal); PcmOps decodes actual samples per
    // row and DuckDB recomputes the identical normalization arithmetic
    // straight from the character codes
    "q_audio_features" -> ((s, d) => {
      val n = 200
      val header = MultimodalOps.PcmOps.wavHeader(rate = 8000, channels = 1, bits = 8, dataLen = n)
      val media = t(s, d, "documents").select(col("doc_id"),
        concat(lit(header), encode(rpad(substring(col("text"), 1, n), n, " "), "UTF-8"))
          .as("payload"))
      MultimodalOps.extractAudioFeatures(s, media).toDF()
        .select(col("doc_id"), col("n_frames"), col("duration_ms"),
          round(col("rms"), 4).as("rms"), round(col("peak"), 4).as("peak"),
          round(col("zero_cross_rate"), 4).as("zcr"))
        .orderBy("doc_id")
    }),

    // REAL video decode under the oracle gate (the Y4M counterpart of
    // q_audio_features): each doc's text becomes a 3-frame 8×8 Cmono
    // YUV4MPEG2 stream; VideoOps demuxes the actual container — magic,
    // header fields, FRAME markers — and reads each luma plane, while
    // DuckDB recomputes the identical per-frame statistics straight from
    // the character codes
    "q_video_frames" -> ((s, d) => {
      val w = 8
      val h = 8
      val fb = w * h // 64 luma bytes per frame
      val header = MultimodalOps.VideoOps.y4mHeader(w, h, fps = 10)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      def frame(i: Int) =
        concat(lit(marker), encode(rpad(substring(col("text"), i * fb + 1, fb), fb, " "), "UTF-8"))
      val media = t(s, d, "documents").select(col("doc_id"),
        concat(lit(header), frame(0), frame(1), frame(2)).as("payload"))
      MultimodalOps.extractVideoFrames(s, media).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          round(col("mean_luma"), 4).as("mean_luma"), col("min_luma"), col("max_luma"))
        .orderBy("doc_id", "frame_idx")
    }),

    // multimodal plumbing: opaque binary payload → partition-batched
    // (stubbed) decode → typed metadata
    "q_multimodal_meta" -> ((s, d) => {
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      MultimodalOps.extractMeta(s, media).toDF()
        .select("doc_id", "n_bytes", "header", "fake_width", "fake_height", "fake_frames")
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_audio_features" ->
      """WITH b AS (SELECT doc_id,
        |   list_transform(split(rpad(substr(text, 1, 200), 200, ' '), ''),
        |     c -> (ord(c) - 128) / 128.0) AS v
        |  FROM documents)
        |SELECT doc_id, CAST(200 AS BIGINT) AS n_frames, 25.0 AS duration_ms,
        |  round(sqrt(list_sum(list_transform(v, x -> x*x)) / 200), 4) AS rms,
        |  round(list_max(list_transform(v, x -> abs(x))), 4) AS peak,
        |  round(len(list_filter(generate_series(2, 200),
        |    i -> (v[i] > 0) <> (v[i-1] > 0))) / 199.0, 4) AS zcr
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_video_frames" ->
      """WITH f AS (
        |  SELECT doc_id, fi,
        |    list_transform(split(rpad(substr(text, fi * 64 + 1, 64), 64, ' '), ''),
        |      c -> ord(c)) AS v
        |  FROM documents, (SELECT unnest([0, 1, 2]) AS fi))
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  round(list_sum(v) / 64.0, 4) AS mean_luma,
        |  CAST(list_min(v) AS INT) AS min_luma,
        |  CAST(list_max(v) AS INT) AS max_luma
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_repetition" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        | grams AS (SELECT doc_id, toks,
        |   CASE WHEN len(toks) >= 2 THEN list_transform(generate_series(1, len(toks)-1),
        |     i -> toks[i]||' '||toks[i+1]) ELSE [] END AS bg,
        |   CASE WHEN len(toks) >= 3 THEN list_transform(generate_series(1, len(toks)-2),
        |     i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) ELSE [] END AS tg
        |   FROM tok),
        | tw AS (SELECT doc_id, max(c) AS topw FROM (
        |   SELECT doc_id, w, count(*) AS c FROM (SELECT doc_id, unnest(toks) AS w FROM tok)
        |   GROUP BY doc_id, w) GROUP BY doc_id),
        | tb AS (SELECT doc_id, max(c) AS topb FROM (
        |   SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(bg) AS g FROM grams)
        |   GROUP BY doc_id, g) GROUP BY doc_id)
        |SELECT g.doc_id,
        |  len(g.toks) AS n_words,
        |  CASE WHEN len(g.toks) > 0 THEN round(len(list_distinct(g.toks)) * 1.0 / len(g.toks), 4)
        |       ELSE 0.0 END AS distinct_word_ratio,
        |  CASE WHEN len(g.bg) > 0 THEN round(1.0 - len(list_distinct(g.bg)) * 1.0 / len(g.bg), 4)
        |       ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN len(g.tg) > 0 THEN round(1.0 - len(list_distinct(g.tg)) * 1.0 / len(g.tg), 4)
        |       ELSE 0.0 END AS dup_trigram_frac,
        |  round(coalesce(tw.topw * 1.0 / nullif(len(g.toks), 0), 0.0), 4) AS top_word_frac,
        |  round(coalesce(tb.topb * 1.0 / nullif(len(g.bg), 0), 0.0), 4) AS top_bigram_frac
        |FROM grams g LEFT JOIN tw USING (doc_id) LEFT JOIN tb USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        | g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
        |     list_transform(generate_series(1, len(toks)-4),
        |       i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4])
        |   ELSE [] END) AS gram FROM tok),
        | top AS (SELECT gram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS doc_freq
        |   FROM g GROUP BY gram ORDER BY n_occurrences DESC, doc_freq DESC, gram LIMIT 20)
        |SELECT gram, n_occurrences, doc_freq FROM top ORDER BY gram""".stripMargin,
    "q_pii_redact" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  substr(text, 1, 40) || ' contact user' || doc_id || '@example.com or call +1 555-000-'
        |    || doc_id || ' at 10.0.0.' || (doc_id % 255),
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |  '\+?\d[\d .-]{7,}\d', '<PHONE>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_decontam" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents),
        | sh AS (SELECT doc_id, CASE WHEN len(toks) >= 8 THEN
        |     list_distinct(list_transform(generate_series(1, len(toks)-7),
        |       i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]
        |         ||' '||toks[i+5]||' '||toks[i+6]||' '||toks[i+7]))
        |   ELSE [] END s FROM tok),
        | bset AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
        | cg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0),
        | hits AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bset USING (g))
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5('graft-sample-1' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
        |  < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q_dedup_paragraphs" ->
      """WITH pages AS (
        |  SELECT b.page_id, h.text || chr(10)||chr(10) || b.body AS text
        |  FROM (SELECT doc_id // 3 AS page_id,
        |          string_agg(text, chr(10)||chr(10) ORDER BY doc_id) AS body
        |        FROM documents GROUP BY 1) b
        |  JOIN (SELECT doc_id, text FROM documents WHERE doc_id < 10) h
        |    ON b.page_id % 10 = h.doc_id),
        | sp AS (SELECT page_id, string_split(text, chr(10)||chr(10)) AS parts FROM pages),
        | paras AS (
        |  SELECT page_id, u['pos'] AS pos, u['para'] AS para FROM (
        |    SELECT page_id, unnest(list_transform(generate_series(1, len(parts)),
        |      i -> {'pos': i, 'para': trim(parts[i])})) AS u FROM sp)
        |  WHERE len(u['para']) > 0),
        | dup AS (SELECT para FROM (
        |    SELECT para, count(DISTINCT page_id) AS nd FROM paras GROUP BY para)
        |  WHERE nd >= 2)
        |SELECT p.page_id,
        |  coalesce(string_agg(p.para, chr(10)||chr(10) ORDER BY p.pos)
        |    FILTER (WHERE d.para IS NULL), '') AS clean_text,
        |  CAST(count(*) FILTER (WHERE d.para IS NULL) AS BIGINT) AS n_kept,
        |  CAST(count(d.para) AS BIGINT) AS n_dropped
        |FROM paras p LEFT JOIN dup d USING (para)
        |GROUP BY p.page_id ORDER BY p.page_id""".stripMargin,
    "q_incremental_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_new
        |FROM documents
        |WHERE doc_id % 3 = 0
        | AND text NOT IN (SELECT text FROM documents WHERE doc_id % 3 <> 0)
        |GROUP BY text ORDER BY keep_id""".stripMargin,
    "q_pipeline_clean" ->
      """WITH dd AS (SELECT doc_id, text, lang, row_number() OVER (
        |    PARTITION BY CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
        |    ORDER BY doc_id) AS rn FROM documents),
        | kept AS (SELECT doc_id, text, lang FROM dd WHERE rn = 1 AND doc_id % 50 <> 0),
        | tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents),
        | sh AS (SELECT doc_id, CASE WHEN len(toks) >= 8 THEN
        |     list_distinct(list_transform(generate_series(1, len(toks)-7),
        |       i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]
        |         ||' '||toks[i+5]||' '||toks[i+6]||' '||toks[i+7]))
        |   ELSE [] END s FROM tok),
        | bset AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
        | cg AS (SELECT sh.doc_id, unnest(sh.s) AS g FROM sh JOIN kept USING (doc_id)),
        | hits AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bset USING (g))
        |SELECT k.doc_id, k.lang FROM kept k
        |LEFT JOIN hits h USING (doc_id)
        |WHERE h.doc_id IS NULL AND length(k.text) >= 100
        |  AND CAST('0x' || substr(md5('graft-clean-1' || CAST(k.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
        |      < CASE WHEN k.lang = 'en' THEN 30 ELSE 60 END
        |ORDER BY k.doc_id""".stripMargin,
    "q_incremental_minhash" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents),
        | sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) s FROM tok)
        |SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
        | round(CAST(len(list_intersect(n.s, c.s)) AS DOUBLE) /
        |   (len(n.s) + len(c.s) - len(list_intersect(n.s, c.s))), 4) AS jaccard
        |FROM sh n JOIN sh c ON n.doc_id % 3 = 0 AND c.doc_id % 3 <> 0
        |WHERE CAST(len(list_intersect(n.s, c.s)) AS DOUBLE) /
        |   (len(n.s) + len(c.s) - len(list_intersect(n.s, c.s))) >= 0.9
        |ORDER BY id_new, id_corpus""".stripMargin,
    "q_corpus_mix" ->
      """WITH tk AS (SELECT doc_id, lang,
        |   CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |   CAST('0x' || substr(md5('graft-mix-1' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM documents),
        | cum AS (SELECT doc_id, lang, n_tokens,
        |   sum(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prior
        |  FROM tk)
        |SELECT doc_id, lang, n_tokens FROM cum
        |WHERE prior < CASE WHEN lang = 'en' THEN 5000 ELSE 3000 END
        |ORDER BY doc_id""".stripMargin,
    "q_doc_chunks" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents WHERE text IS NOT NULL),
        | st AS (SELECT doc_id, words,
        |   unnest(generate_series(0,
        |     CAST((length(words) - 1) - ((length(words) - 1) % 24) AS BIGINT), 24))
        |     AS chunk_start
        |  FROM w)
        |SELECT doc_id,
        | chunk_start // 24 AS chunk_id,
        | chunk_start AS chunk_start,
        | least(32, CAST(length(words) AS BIGINT) - chunk_start) AS chunk_tokens,
        | array_to_string(words[chunk_start + 1 : chunk_start + 32], ' ') AS chunk_text
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    "q_seq_pack" ->
      """WITH tk AS (SELECT doc_id,
        |   CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |   CAST('0x' || substr(md5('graft-pack-1-shard' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 8 AS shard,
        |   CAST('0x' || substr(md5('graft-pack-1' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM documents WHERE text IS NOT NULL),
        | cum AS (SELECT doc_id, shard, n_tokens,
        |   CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY hk, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS prior
        |  FROM tk)
        |SELECT doc_id, shard, n_tokens,
        | prior // 512 AS first_seq,
        | CASE WHEN n_tokens > 0 THEN (prior + n_tokens - 1) // 512 ELSE prior // 512 END AS last_seq,
        | prior % 512 AS "offset"
        |FROM cum ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
        | th AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM tok),
        | bits AS (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |          FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) GROUP BY doc_id, j),
        | sh AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS simhash
        |        FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_ann_lsh" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ndv_meta" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map(c =>
        s"SELECT '$c' AS col_name, count(DISTINCT $c) AS n_exact, true AS ndv_ok FROM lineitem")
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_describe_btr" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map(c =>
        s"SELECT '$c' AS col_name, count(*) AS n_rows_sum, count(*) - count($c) AS n_nulls_sum, true AS consistent FROM lineitem")
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_dedup_minhash" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents),
        | sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) s FROM tok)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_ngram" ->
      """WITH sh AS (SELECT doc_id,
        |   list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1)),
        |     i -> substr(text, i, 5))) s
        |  FROM documents WHERE doc_id < 150)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents),
        | sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) s FROM tok),
        | pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        | edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        | reach(id, r) AS (
        |   SELECT doc_id, doc_id FROM documents
        |   UNION
        |   SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
        | )
        |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_embed_clusters" ->
      """WITH q AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) qv
        | FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, qv AS cv
        |       FROM q ORDER BY vec_id LIMIT 4),
        |d0 AS (SELECT q.vec_id, q.qv, c0.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c0.cv[i]) * (q.qv[i] - c0.cv[i]))) AS dist
        | FROM q, c0),
        |a0 AS (SELECT vec_id, qv, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d0)
        |  WHERE rn = 1),
        |u0 AS (SELECT cl, i, CAST(round(CAST(sum(qv[i]) AS DOUBLE) / count(*)) AS BIGINT) c
        |       FROM a0, generate_series(1, 64) AS g(i) GROUP BY cl, i),
        |c1 AS (SELECT c0.cl, COALESCE(u.cv, c0.cv) cv FROM c0 LEFT JOIN
        |       (SELECT cl, list(c ORDER BY i) cv FROM u0 GROUP BY cl) u USING (cl)),
        |d1 AS (SELECT q.vec_id, q.qv, c1.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c1.cv[i]) * (q.qv[i] - c1.cv[i]))) AS dist
        | FROM q, c1),
        |a1 AS (SELECT vec_id, qv, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d1)
        |  WHERE rn = 1),
        |u1 AS (SELECT cl, i, CAST(round(CAST(sum(qv[i]) AS DOUBLE) / count(*)) AS BIGINT) c
        |       FROM a1, generate_series(1, 64) AS g(i) GROUP BY cl, i),
        |c2 AS (SELECT c1.cl, COALESCE(u.cv, c1.cv) cv FROM c1 LEFT JOIN
        |       (SELECT cl, list(c ORDER BY i) cv FROM u1 GROUP BY cl) u USING (cl)),
        |d2 AS (SELECT q.vec_id, c2.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c2.cv[i]) * (q.qv[i] - c2.cv[i]))) AS dist
        | FROM q, c2)
        |SELECT vec_id, CAST(cl AS INT) AS cluster FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d2)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_cluster_sample" ->
      """WITH q AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) qv
        | FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, qv AS cv
        |       FROM q ORDER BY vec_id LIMIT 4),
        |d0 AS (SELECT q.vec_id, q.qv, c0.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c0.cv[i]) * (q.qv[i] - c0.cv[i]))) AS dist
        | FROM q, c0),
        |a0 AS (SELECT vec_id, qv, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d0)
        |  WHERE rn = 1),
        |u0 AS (SELECT cl, i, CAST(round(CAST(sum(qv[i]) AS DOUBLE) / count(*)) AS BIGINT) c
        |       FROM a0, generate_series(1, 64) AS g(i) GROUP BY cl, i),
        |c1 AS (SELECT c0.cl, COALESCE(u.cv, c0.cv) cv FROM c0 LEFT JOIN
        |       (SELECT cl, list(c ORDER BY i) cv FROM u0 GROUP BY cl) u USING (cl)),
        |d1 AS (SELECT q.vec_id, q.qv, c1.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c1.cv[i]) * (q.qv[i] - c1.cv[i]))) AS dist
        | FROM q, c1),
        |a1 AS (SELECT vec_id, qv, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d1)
        |  WHERE rn = 1),
        |u1 AS (SELECT cl, i, CAST(round(CAST(sum(qv[i]) AS DOUBLE) / count(*)) AS BIGINT) c
        |       FROM a1, generate_series(1, 64) AS g(i) GROUP BY cl, i),
        |c2 AS (SELECT c1.cl, COALESCE(u.cv, c1.cv) cv FROM c1 LEFT JOIN
        |       (SELECT cl, list(c ORDER BY i) cv FROM u1 GROUP BY cl) u USING (cl)),
        |d2 AS (SELECT q.vec_id, c2.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c2.cv[i]) * (q.qv[i] - c2.cv[i]))) AS dist
        | FROM q, c2),
        |fin AS (SELECT vec_id, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d2)
        |  WHERE rn = 1)
        |SELECT vec_id, CAST(cl AS INT) AS cluster FROM
        |  (SELECT vec_id, cl, row_number() OVER (PARTITION BY cl
        |     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) rn FROM fin)
        |WHERE rn <= 3 ORDER BY cluster, vec_id""".stripMargin,
    "q_semantic_dedup" ->
      """WITH RECURSIVE q AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) qv
        | FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, qv AS cv
        |       FROM q ORDER BY vec_id LIMIT 16),
        |d0 AS (SELECT q.vec_id, q.qv, c0.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c0.cv[i]) * (q.qv[i] - c0.cv[i]))) AS dist
        | FROM q, c0),
        |a0 AS (SELECT vec_id, qv, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d0)
        |  WHERE rn = 1),
        |u0 AS (SELECT cl, i, CAST(round(CAST(sum(qv[i]) AS DOUBLE) / count(*)) AS BIGINT) c
        |       FROM a0, generate_series(1, 64) AS g(i) GROUP BY cl, i),
        |c1 AS (SELECT c0.cl, COALESCE(u.cv, c0.cv) cv FROM c0 LEFT JOIN
        |       (SELECT cl, list(c ORDER BY i) cv FROM u0 GROUP BY cl) u USING (cl)),
        |d1 AS (SELECT q.vec_id, q.qv, c1.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c1.cv[i]) * (q.qv[i] - c1.cv[i]))) AS dist
        | FROM q, c1),
        |a1 AS (SELECT vec_id, qv, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d1)
        |  WHERE rn = 1),
        |u1 AS (SELECT cl, i, CAST(round(CAST(sum(qv[i]) AS DOUBLE) / count(*)) AS BIGINT) c
        |       FROM a1, generate_series(1, 64) AS g(i) GROUP BY cl, i),
        |c2 AS (SELECT c1.cl, COALESCE(u.cv, c1.cv) cv FROM c1 LEFT JOIN
        |       (SELECT cl, list(c ORDER BY i) cv FROM u1 GROUP BY cl) u USING (cl)),
        |d2 AS (SELECT q.vec_id, c2.cl,
        |   list_sum(list_transform(generate_series(1, 64),
        |     i -> (q.qv[i] - c2.cv[i]) * (q.qv[i] - c2.cv[i]))) AS dist
        | FROM q, c2),
        |fin AS (SELECT vec_id, cl FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) rn FROM d2)
        |  WHERE rn = 1),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM fin a JOIN fin b ON a.cl = b.cl AND a.vec_id < b.vec_id
        |  JOIN embeddings ea ON ea.vec_id = a.vec_id
        |  JOIN embeddings eb ON eb.vec_id = b.vec_id
        |  WHERE round(list_cosine_similarity(ea.embedding, eb.embedding), 4) >= 0.35),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
        |comp AS (SELECT id, min(r) AS cid FROM reach GROUP BY id)
        |SELECT f.vec_id, CAST(f.cl AS INT) AS cluster
        |FROM fin f JOIN comp ON comp.id = f.vec_id AND comp.cid = f.vec_id
        |ORDER BY vec_id""".stripMargin,
    "q_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 200 AND b.vec_id < 200
        | AND round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    "q_ann_topk" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  round(list_cosine_similarity(q.embedding, c.embedding), 4) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT qid, cid, cos, rank FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
    "q_lang_id" -> {
      val scoreSql = TextOps.stopwords.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_intersect(toks, $list)) AS s_$lang"
      }.mkString(", ")
      val langs = TextOps.stopwords.map(_._1)
      val bestExpr = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val pickExpr = langs.reverse.foldLeft("'und'") { (other, l) =>
        s"CASE WHEN s_$l = best AND best > 0 THEN '$l' ELSE $other END"
      }
      s"""WITH tok AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') toks FROM documents),
         | scored AS (SELECT doc_id, lang, $scoreSql FROM tok),
         | best_t AS (SELECT *, $bestExpr AS best FROM scored),
         | pred_t AS (SELECT doc_id, lang, $pickExpr AS pred FROM best_t)
         |SELECT doc_id, lang, pred, CASE WHEN pred = lang THEN 1 ELSE 0 END AS agree
         |FROM pred_t ORDER BY doc_id""".stripMargin
    },
    "q_ann_ivf" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ann_ivf_indexed" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok,
        | true AS indexed_matches_percall
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ann_ivf_serve" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok,
        | true AS serve_matches_indexed
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ann_ivf_f32" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok,
        | true AS serve_matches_indexed
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ann_ivf_i8" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok,
        | true AS serve_matches_indexed
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ann_ivf_trusted" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok,
        | true AS fresh_ok, true AS trusted_matches_untrusted
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_ann_ivf_refresh" ->
      """WITH cur AS (
        | SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 3
        | UNION ALL
        | SELECT vec_id + 2000000, embedding FROM embeddings WHERE vec_id < 20
        | UNION ALL
        | SELECT vec_id + 3000000, embedding FROM embeddings
        |  WHERE vec_id >= 20 AND vec_id < 30),
        | sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_cosine_similarity(q.embedding, c.embedding) AS cos
        | FROM cur q JOIN cur c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10),
        | ranked AS (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
        | FROM sims)
        |SELECT count(*) AS n_exact, true AS recall_ok,
        | true AS refresh_exactly_once, true AS fallback_covered
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_token_bpe" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text,
        |   '''(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT count(*) AS n_docs,
        | count(DISTINCT lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS n_unique_fp
        |FROM documents""".stripMargin,
    "q_map_attrs" ->
      """SELECT lang, count(*) AS n_docs,
        | min(substring(text, 1, 8)) AS min_head
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_nested_arrays" ->
      """SELECT CAST(3 * count(*) AS BIGINT) AS n_leaf,
        | CAST(4 * count(*) AS BIGINT) AS n_vals,
        | round(sum(CAST(length(text) AS DOUBLE) * 0.25 + doc_id * 0.5 +
        |   CAST(length(text) AS DOUBLE) + doc_id + 0.25), 2) AS sum_all
        |FROM documents""".stripMargin,
    "q_map_struct_values" ->
      """SELECT lang AS source, count(*) AS n,
        | CAST(sum(doc_id % 5) AS BIGINT) AS sum_ver,
        | round(sum(CAST(length(text) AS DOUBLE) * 0.25), 2) AS sum_conf
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,
    "q_span_annotations" ->
      """WITH sp AS (
        |  SELECT lang AS label, length(text) AS e,
        |    CAST(length(text) AS DOUBLE) * 0.25 AS sc FROM documents
        |  UNION ALL
        |  SELECT 'half' AS label, length(text) + 7 AS e, 2.5 AS sc FROM documents)
        |SELECT label, count(*) AS n, CAST(sum(e) AS BIGINT) AS sum_end,
        | round(sum(sc), 2) AS sum_score
        |FROM sp GROUP BY 1 ORDER BY label""".stripMargin,
    "q_map_array_scores" ->
      """SELECT count(*) AS n_docs,
        | round(sum(CAST(length(text) AS DOUBLE)), 2) AS sum_len,
        | round(sum(CAST(length(text) AS DOUBLE) * 2.0), 2) AS sum_dbl
        |FROM documents""".stripMargin,
    "q_token_arrays" ->
      """WITH tk AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
        |SELECT CAST(doc_id % 10 AS BIGINT) AS bucket, count(*) AS n_docs,
        | CAST(sum(length(toks)) AS BIGINT) AS sum_toks,
        | min(toks[1]) AS min_first
        |FROM tk GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        | length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | length(text) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
        | tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
        | dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        | scored AS (SELECT t.doc_id, t.tok, t.tf,
        |   round(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)), 4) AS score,
        |   row_number() OVER (PARTITION BY t.doc_id ORDER BY t.tf DESC, d.df ASC, t.tok ASC) AS rank
        |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n)
        |SELECT doc_id, tok, tf, score, rank FROM scored
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        | round(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
        | round(length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
        | round(length(regexp_replace(text, '[^ ]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS space_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | ascii(substr(text, 1, 1)) AS header,
        | 64 + octet_length(encode(text)) % 576 AS fake_width,
        | 64 + ascii(substr(text, 1, 1)) % 416 AS fake_height,
        | 1 + octet_length(encode(text)) % 16 AS fake_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
