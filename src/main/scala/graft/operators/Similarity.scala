package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - Brute force: broadcast the (small) query set against the corpus,
  *    exact cosine, per-query top-k window. The corpus side never
  *    shuffles before the ranking — at 100 TB this is one scan.
  *  - IVF: coarse-quantize the corpus to the nearest of C centroids
  *    (one pass), then probe only the nProbe nearest centroids per
  *    query — the scan shrinks by ~nProbe/C. Centroids here come from
  *    deterministic sampling + one Lloyd refinement step (KMeansLite) —
  *    at real scale you'd iterate, but the partition/probe plumbing is
  *    identical.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`: (qid, qv); `corpus`: (id, v). Self-matches excluded
    * when ids collide. Deterministic: ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val joined = corpus.select(col("id"), col("v"))
      .join(broadcast(queries.select(col("qid"), col("qv"))))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", call_function("graft_cosine", col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Deterministic centroid seeding: the `c` corpus vectors with the
    * smallest xxhash64(id) (a reproducible pseudo-random sample), then
    * one Lloyd assignment/mean step to tighten them.
    */
  def kmeansLiteCentroids(corpus: DataFrame, c: Int,
                          iters: Int = 1): DataFrame = {
    val seeds = corpus.select(col("id"), col("v"))
      .withColumn("hk", xxhash64(col("id")))
      .orderBy("hk").limit(c)
      .select(monotonically_increasing_id().as("cid"), col("v").as("cv"))
    // Lloyd refinement: assign every vector to its nearest centroid,
    // then mean per dimension via narrow (cid, p) aggregate —
    // dimension-agnostic (no per-dim column fan-out, no extra job to
    // discover the dim). Lineage is truncated BETWEEN iterations only
    // (fixpoint-loop rule); the final result stays lazy so a single
    // refinement adds no eager job.
    (1 to iters).foldLeft(seeds) { (centroids, it) =>
      val refined = assignToCentroids(corpus, centroids)
        .select(col("cid"), posexplode(col("v")).as(Seq("p", "x")))
        .groupBy("cid", "p")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
          s => s.getField("m")).as("cv"))
      if (it < iters) refined.localCheckpoint(true) else refined
    }
  }

  /** Assign each corpus vector to its nearest centroid. Distances are
    * computed codegen-style — posexplode both sides, join on the
    * dimension index, hash-aggregate Σ(x-c)² per (id, cid) — because
    * array-lambda l2Sq runs interpreted (outside codegen) and measured
    * ~3-4× slower on the corpus×centroids product. argmin via
    * min(struct(d2, cid)), map-side combinable.
    */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val vpos = corpus.select(col("id"),
      posexplode(col("v")).as(Seq("p", "x")))
    val cpos = centroids.select(col("cid"),
      posexplode(col("cv")).as(Seq("p", "cx")))
    val d2 = vpos.join(broadcast(cpos), "p")
      .groupBy("id", "cid")
      .agg(sum(pow(col("x").cast("double") - col("cx").cast("double"), 2))
        .as("d2"))
    val best = d2.groupBy("id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"))
    corpus.select(col("id"), col("v")).join(best, "id")
  }

  /** IVF ANN: probe the `nProbe` centroids nearest to each query and
    * rank only vectors assigned to those lists. Returns same shape as
    * bruteForceTopK. Recall < 1 by design; measured in SimilaritySpec.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 1): DataFrame = {
    val centroids = kmeansLiteCentroids(corpus, nLists, kmeansIters).cache()
    val lists = assignToCentroids(corpus, centroids)

    val wq = Window.partitionBy("qid").orderBy(col("qd2"), col("cid"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("qd2", l2Sq(col("qv"), col("cv")))
      .withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))

    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val joined = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", call_function("graft_cosine", col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
