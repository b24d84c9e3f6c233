package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>): exact
  * cosine, brute-force top-k (the correctness baseline) and an LSH
  * (random-hyperplane) bucketed variant (the scale path). All math uses
  * codegen'd higher-order functions — no UDFs.
  */
object SimilarityOps {

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine similarity of two float/double array columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Brute-force cosine top-k: for every query row, the k most similar
    * non-identical candidate rows. Queries are broadcast (they are the
    * small side by construction); candidates stream — one pass over the
    * big table, then a per-query top-k window.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = candidates
      .join(broadcast(queries), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(cosine(col("qvec"), col("cvec")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (numBits × dim), seeded. */
  def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (hp, i) =>
      val hpCol = array(hp.map(lit): _*)
      when(dot(toDouble(vec), hpCol) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Per-table LSH bucket ids of a vector: one sign-bit bucket per table. */
  def lshBuckets(vec: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    array(tables.map(planes => lshBucket(vec, planes)): _*)

  /** Multi-table LSH ANN: `numTables` independent hyperplane tables; a
    * candidate is considered for a query when they share a bucket in ANY
    * table (union of bucket joins, deduped), then ranked by exact cosine.
    * Recall grows quickly with tables — at ~(1-(1-p^bits)^tables) — while
    * the work stays one shuffle on (table, bucket) instead of a cross
    * join. Candidate bucket ids are computed in a single projection pass.
    */
  def lshTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int,
      numBits: Int = 8,
      dim: Int = 64,
      numTables: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tables = (0 until numTables).map(t => hyperplanes(numBits, dim, seed = 42L + 1000L * t))
    val qb = queries.select(col("qid"), col("qvec"),
      posexplode(lshBuckets(col("qvec"), tables)).as(Seq("tbl", "bucket")))
    val cb = candidates.select(col("cid"), col("cvec"),
      posexplode(lshBuckets(col("cvec"), tables)).as(Seq("tbl", "bucket")))
    val joined = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .select(col("qid"), col("cid"), round(cosine(col("qvec"), col("cvec")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * candidates into nlist cells; each query probes its nprobe nearest
    * centroids and ranks only those cells' members by exact cosine. The
    * standard scale shape for embedding search: one shuffle on the cell
    * id replaces the cross join, and the quantizer would be fit on a
    * sample at production scale. Deterministic via the fixed seed.
    */
  def ivfTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      fitSampleRows: Int = 10000
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.functions.array_to_vector
    val assembled = candidates.withColumn("fvec", array_to_vector(col("cvec")))
    // coarse quantizer: random init + few iterations is the standard IVF
    // trade-off (cells need to be balanced, not converged). Fit on a
    // seeded sample hard-capped at fitSampleRows — the quantizer only
    // needs the density shape, and an O(corpus)-per-iteration fit would
    // dominate the job at 100 TB. ASSIGNMENT still covers every candidate.
    val n = candidates.count()
    val fitInput =
      if (n <= fitSampleRows) assembled
      else assembled
        .sample(withReplacement = false, fraction = math.min(1.0, fitSampleRows * 1.1 / n), seed = 42L)
        .limit(fitSampleRows)
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(42L).setFeaturesCol("fvec").setPredictionCol("cluster")
      .setInitMode("random").setMaxIter(5)
      .fit(fitInput)
    val cb = model.transform(assembled).drop("fvec")
    val centers = model.clusterCenters.map(_.toArray)
    // per-query probed cells: nprobe nearest centroids (squared euclid)
    val distPairs = centers.zipWithIndex.map { case (cArr, i) =>
      val cCol = array(cArr.map(lit): _*)
      struct(lit(i).as("cluster"),
        aggregate(zip_with(toDouble(col("qvec")), cCol, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("d2"))
    }
    val qc = queries.select(col("qid"), col("qvec"), explode(array(distPairs: _*)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cluster").as("cluster"), col("p.d2").as("d2"))
    val wp = Window.partitionBy("qid").orderBy(asc("d2"), asc("cluster"))
    val probes = qc.withColumn("pr", row_number().over(wp)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("cluster"))
    val joined = cb.join(broadcast(probes), Seq("cluster"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(cosine(col("qvec"), col("cvec")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: all (a,b) with cosine ≥ threshold.
    * Exact variant for bounded id ranges; [[lshNearDupPairs]] is the
    * scale path.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("v_a"), col("v_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed embedding near-dup pairs (the scale path): candidates
    * share a hyperplane-signature bucket in any table, verified with
    * exact cosine — one (table, bucket) shuffle instead of a cross join.
    * High-cosine pairs collide in some table with high probability, so
    * recall concentrates exactly where dedup needs it.
    */
  def lshNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numBits: Int = 8,
      dim: Int = 64,
      numTables: Int = 6
  ): DataFrame = {
    val tables = (0 until numTables).map(t => hyperplanes(numBits, dim, seed = 42L + 1000L * t))
    val withBuckets = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(lshBuckets(col(vecCol), tables)).as(Seq("tbl", "bucket")))
    val exploded = withBuckets.select(col("id"), col("tbl"), col("bucket"))
    val cand = TextOps.lshCandidates(exploded, Seq("tbl", "bucket"), 1024)
    val vA = vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val vB = vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    cand.join(vA, "id_a").join(vB, "id_b")
      .select(col("id_a"), col("id_b"), round(cosine(col("v_a"), col("v_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
