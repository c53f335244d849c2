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
    val joined = corpus.select(col("id"), col("v"))
      .join(broadcast(queries.select(col("qid"), col("qv"))))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", cosine(col("v"), col("qv")))
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
  def kmeansLiteCentroids(corpus: DataFrame, c: Int): DataFrame = {
    val seeds = corpus.select(col("id"), col("v"))
      .withColumn("hk", xxhash64(col("id")))
      .orderBy("hk").limit(c)
      .select(monotonically_increasing_id().as("cid"), col("v").as("cv"))
    // one refinement: assign every vector to nearest seed, average
    val assigned = assignToCentroids(corpus, seeds)
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    assigned.groupBy("cid")
      .agg(array((0 until dim).map(i =>
        avg(element_at(col("v"), i + 1))): _*).as("cv"))
  }

  /** Assign each corpus vector to its nearest centroid (broadcast). */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("d2"), col("cid"))
    corpus.select(col("id"), col("v"))
      .join(broadcast(centroids))
      .withColumn("d2", l2Sq(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cid"))
  }

  /** IVF ANN: probe the `nProbe` centroids nearest to each query and
    * rank only vectors assigned to those lists. Returns same shape as
    * bruteForceTopK. Recall < 1 by design; measured in SimilaritySpec.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = kmeansLiteCentroids(corpus, nLists).cache()
    val lists = assignToCentroids(corpus, centroids)

    val wq = Window.partitionBy("qid").orderBy(col("qd2"), col("cid"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("qd2", l2Sq(col("qv"), col("cv")))
      .withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))

    val joined = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
