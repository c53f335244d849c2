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
  *  - IVF: coarse-quantize the corpus to the nearest of C centroids,
  *    then probe only the nProbe nearest centroids per query — the
  *    scan shrinks by ~nProbe/C. Centroids come from deterministic
  *    sampling + Lloyd refinement (default 3 iterations — measured
  *    recall@5 0.76 → 0.84 vs 1 iteration, SimilarityTextSpec).
  *  - IVF-SQ8 (`ivfPqTopK`): the composed scale path — residuals
  *    vs the assigned centroid are stored as 1-byte codes (4×
  *    bandwidth/storage reduction), candidates are scored on the
  *    QUANTIZED reconstruction, and only a small shortlist is
  *    re-ranked with exact float cosine.
  */
object Similarity {

  /** Session-scoped memo of the IVF index parts (centroids, ids-only
    * assignments, SQ8 stats, SQ8 codes) keyed by input identity +
    * build parameters — an ANN index is built ONCE and queried many
    * times, and the cached forms below make repeated searches in one
    * session pay the build exactly once (the real-world index shape).
    * Everything memoized is either tiny (centroids, stats) or the
    * compact index itself (ids-only assignments; 1-byte codes — 4×
    * smaller than the float corpus); the float vectors are never
    * duplicated into the memo. See [[graft.core.SessionMemo]] for the
    * key-identifies-content contract.
    */
  private val indexMemo = new graft.core.SessionMemo

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`: (qid, qv); `corpus`: (id, v). Self-matches excluded
    * when ids collide.
    *
    * Deterministic ranking contract: rank on the 4-dp-ROUNDED cosine
    * with corpus-id tie-break. Ranking on the raw double let rank-k
    * vs rank-(k+1) neighbors separated by < 1 ulp order differently
    * per engine (r5: q118 hash-fail); rounding first turns those
    * near-ties into exact ties the id tie-break resolves identically
    * everywhere. Oracles replay the same ORDER BY round(cos,4), id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val joined = corpus.select(col("id"), col("v"))
      .join(broadcast(queries.select(col("qid"), col("qv"))))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine",
        round(call_function("graft_cosine", col("v"), col("qv")), 4))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** EXACT all-pairs cosine join at `threshold`, pruned by cluster
    * angular bounds — the sub-quadratic exact side for recall gates
    * (q89) at any corpus size, replacing the capped crossJoin.
    *
    * Vectors are clustered (deterministic k-means-lite); per cluster
    * the max member-to-centroid angle r is recorded. For clusters
    * (i, j), the spherical triangle inequality gives
    * `angle(a, b) ≥ angle(cᵢ, cⱼ) − rᵢ − rⱼ` for any a∈i, b∈j — so
    * when `angle(cᵢ, cⱼ) > rᵢ + rⱼ + arccos(threshold)` NO pair
    * between the clusters can reach the threshold and the whole
    * cluster pair is skipped. Pruning is conservative (an epsilon
    * margin absorbs acos noise): every surviving candidate is scored
    * with exact cosine, so the result set is IDENTICAL to the
    * quadratic definition — the oracle keeps replaying brute force.
    *
    * Scale: candidates are (id, cluster) pairs joined through the
    * tiny broadcast allowlist; vectors re-join by id afterward. On a
    * corpus with angular structure the candidate count drops toward
    * Σ|allowed-pair| ≪ n²/2; on a structureless corpus it degrades
    * to the quadratic candidate set (never worse than brute force by
    * more than the centroid pass).
    */
  def exactCosinePairs(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double, nLists: Int = 16,
                       kmeansIters: Int = 3,
                       inputKey: Option[String] = None,
                       blockSize: Int = 4096): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // With inputKey, the cluster index rides the SAME session memo as
    // the IVF search paths (identical key: one index per corpus,
    // built once, shared by search AND verification — the pattern
    // ivfTopKCached set); the prune stays exact either way, the memo
    // only skips the rebuild.
    val centroids = (inputKey match {
      case Some(k) => kmeansLiteCentroidsCached(base, k, nLists, kmeansIters)
      case None    => kmeansLiteCentroids(base, nLists, kmeansIters)
    }).localCheckpoint(true)
    def ang(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      acos(least(lit(1.0), greatest(lit(-1.0),
        call_function("graft_cosine", a, b))))
    val assignments = inputKey match {
      case Some(k) => assignmentsCached(base, k, nLists, kmeansIters)
      case None    => assignmentsOf(base, centroids)
    }
    val assigned = base.join(assignments, "id")
      .join(broadcast(centroids), "cid")
      .withColumn("theta", ang(col("v"), col("cv")))
      .select(col("id"), col("cid"), col("theta"))
      .localCheckpoint(true)
    val radii = assigned.groupBy("cid").agg(max("theta").as("rmax"))
    val tAngle = math.acos(threshold)
    val allowed = centroids.select(col("cid").as("ca"), col("cv").as("cva"))
      .crossJoin(centroids.select(col("cid").as("cb"), col("cv").as("cvb")))
      .filter(col("ca") <= col("cb"))
      .withColumn("cang", ang(col("cva"), col("cvb")))
      .join(radii.select(col("cid").as("ca"), col("rmax").as("ra")), "ca")
      .join(radii.select(col("cid").as("cb"), col("rmax").as("rb")), "cb")
      .filter(col("cang") <= col("ra") + col("rb") + lit(tAngle + 1e-9))
      .select(col("ca"), col("cb"))
    // Scoring kernel — DISTRIBUTED block-nested-loop over the allowed
    // cluster pairs. Each cluster's members pack into id-ordered
    // chunks of ≤ blockSize vectors, each chunk ONE row holding a
    // contiguous float array (fixed stride: the array-of-arrays
    // layout measured ~2 μs per scored pair — pointer chasing, not
    // arithmetic). The tiny allowed list (≤ nLists² rows) broadcasts
    // onto the A-side chunks; the B-side chunks arrive by an
    // equi-join on cluster id — both sides partitioned by cid, no
    // corpus-sized collect, driver memory flat at any corpus size
    // (Profile `stress-exact` pins this at 100k vectors). Pair
    // coverage: a pair is scored exactly once — cross-cluster from
    // the (ca ≤ cb) orientation of the allowed list, same-cluster
    // from chunk pairs with chk_a ≤ chk_b plus the id guard on the
    // diagonal (chunks are id-ranges, so off-diagonal chunk pairs
    // satisfy the guard by construction). The chunk BUILD is itself
    // fully parallel: rows range-partition on (cid, id) across a
    // task count that grows with the corpus (never the old
    // Window.partitionBy(cid) whose per-cluster sort ran on ONE
    // task), and each task slices its sorted stream into ≤ blockSize
    // spans locally. A chunk is labeled by its MIN id — within a cid
    // the chunks are disjoint id-intervals (range partitioning keeps
    // a cid's ids ordered across tasks too), so min-id labels order
    // exactly like the intervals and every chk_a ≤ chk_b comparison
    // below is unchanged. Chunk boundaries are NOT deterministic
    // (range sampling), but the emitted pair set never depends on
    // them — coverage is exactly-once for ANY id-range chunking and
    // the arithmetic is per pair. Arithmetic replicates
    // graft_cosine exactly — double accumulation of widened floats in
    // index order, dot/(√na·√nb), then Spark round HALF_UP at 4 dp —
    // so the result set is bit-identical to the join formulation and
    // the oracle's DuckDB replay. Assumes equal-length vectors (as
    // graft_cosine's min-length truncation and these precomputed
    // norms differ on ragged input).
    val spark = df.sparkSession
    import spark.implicits._
    val members = base.join(assignments, "id")
      .select(col("cid"), col("id"), col("v"))
      .localCheckpoint(true)
    val total = members.count()
    // ~4 blockSize-chunks per task; floor at the session parallelism,
    // cap only as a runaway guard. At toy SF this is defaultParallelism;
    // at 100 TB the task count follows the corpus.
    val nPart = math.max(spark.sparkContext.defaultParallelism,
      math.min(65536L, total / (blockSize.toLong * 4) + 1L).toInt)
    val chunks = members
      .repartitionByRange(nPart, col("cid"), col("id"))
      .sortWithinPartitions(col("cid"), col("id"))
      .as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Long, Array[Long], Array[Float],
            Array[Double], Int)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Long, Array[Long], Array[Float],
              Array[Double], Int) = {
            val cid = buf.head._1
            val rs = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Array[Float])]
            while (buf.hasNext && buf.head._1 == cid &&
                rs.length < blockSize)
              rs += buf.next()
            val d = rs.head._3.length
            require(rs.forall(_._3.length == d),
              "exactCosinePairs requires equal-length vectors")
            val flat = new Array[Float](rs.length * d)
            val norms = new Array[Double](rs.length)
            var j = 0
            while (j < rs.length) {
              val v = rs(j)._3
              System.arraycopy(v, 0, flat, j * d, d)
              var s = 0.0; var i = 0
              while (i < d) { val x = v(i).toDouble; s += x * x; i += 1 }
              norms(j) = s
              j += 1
            }
            // chunk label = min id of the span (input is (cid, id)-sorted)
            (cid, rs.head._2, rs.map(_._2).toArray, flat, norms, d)
          }
        }
      }
      .toDF("cid", "chk", "ids", "flat", "norms", "d")
      .localCheckpoint(true)
    val aSide = chunks
      .join(broadcast(allowed), col("cid") === col("ca"))
      .select(col("ca"), col("cb"), col("chk").as("chk_a"),
        col("ids").as("ids_a"), col("flat").as("flat_a"),
        col("norms").as("norms_a"), col("d").as("d_a"))
    val bSide = chunks.select(col("cid").as("cid_b"),
      col("chk").as("chk_b"), col("ids").as("ids_b"),
      col("flat").as("flat_b"), col("norms").as("norms_b"),
      col("d").as("d_b"))
    val paired = aSide.join(bSide, col("cb") === col("cid_b") &&
        (col("ca") =!= col("cid_b") || col("chk_a") <= col("chk_b")))
      .select(col("ca"), col("cb"), col("ids_a"), col("flat_a"),
        col("norms_a"), col("d_a"), col("ids_b"), col("flat_b"),
        col("norms_b"), col("d_b"))
      .as[(Long, Long, Array[Long], Array[Float], Array[Double], Int,
        Array[Long], Array[Float], Array[Double], Int)]
    val thr = threshold
    paired.flatMap { case (ca, cb, idsA, flatA, normsA, dA,
        idsB, flatB, normsB, dB) =>
      val same = ca == cb
      val n = math.min(dA, dB)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Double)]
      var i = 0
      while (i < idsA.length) {
        val ida = idsA(i)
        val offA = i * dA
        val sqa = math.sqrt(normsA(i))
        var j = 0
        while (j < idsB.length) {
          if (!same || idsB(j) > ida) {
            val offB = j * dB
            var dot = 0.0
            var k = 0
            while (k < n) {
              dot += flatA(offA + k).toDouble * flatB(offB + k)
              k += 1
            }
            val denom = sqa * math.sqrt(normsB(j))
            if (denom != 0.0) {
              val cos = dot / denom
              // cheap pre-filter: only pairs that can round to >= thr
              // pay the BigDecimal; 5e-5 covers the 4-dp half-step
              if (cos >= thr - 5e-5) {
                val r = java.math.BigDecimal.valueOf(cos)
                  .setScale(4, java.math.RoundingMode.HALF_UP)
                  .doubleValue()
                if (r >= thr)
                  out += ((math.min(ida, idsB(j)),
                    math.max(ida, idsB(j)), r))
              }
            }
          }
          j += 1
        }
        i += 1
      }
      out
    }.toDF("id_a", "id_b", "cosine")
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

  /** Nearest-centroid id per corpus vector — (id, cid) ONLY, so the
    * result is memoizable without duplicating the float vectors.
    * Distances are computed codegen-style — posexplode both sides,
    * join on the dimension index, hash-aggregate Σ(x-c)² per
    * (id, cid) — because array-lambda l2Sq runs interpreted (outside
    * codegen) and measured ~3-4× slower on the corpus×centroids
    * product. argmin via min(struct(d2, cid)), map-side combinable.
    */
  def assignmentsOf(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val vpos = corpus.select(col("id"),
      posexplode(col("v")).as(Seq("p", "x")))
    val cpos = centroids.select(col("cid"),
      posexplode(col("cv")).as(Seq("p", "cx")))
    val d2 = vpos.join(broadcast(cpos), "p")
      .groupBy("id", "cid")
      .agg(sum(pow(col("x").cast("double") - col("cx").cast("double"), 2))
        .as("d2"))
    d2.groupBy("id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"))
  }

  /** Assign each corpus vector to its nearest centroid: (id, v, cid). */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.select(col("id"), col("v"))
      .join(assignmentsOf(corpus, centroids), "id")

  /** [[kmeansLiteCentroids]] memoized per (session, input, params). */
  def kmeansLiteCentroidsCached(corpus: DataFrame, inputKey: String,
                                c: Int, iters: Int = 1): DataFrame =
    indexMemo.getOrElseUpdate(corpus.sparkSession,
      s"ivf-centroids|$inputKey|$c|$iters") {
      kmeansLiteCentroids(corpus, c, iters)
    }

  /** Memoized ids-only IVF assignment for the cached search paths. */
  private def assignmentsCached(corpus: DataFrame, inputKey: String,
                                nLists: Int, iters: Int): DataFrame = {
    val centroids = kmeansLiteCentroidsCached(corpus, inputKey, nLists, iters)
    indexMemo.getOrElseUpdate(corpus.sparkSession,
      s"ivf-assign|$inputKey|$nLists|$iters") {
      assignmentsOf(corpus, centroids)
    }
  }

  /** IVF ANN: probe the `nProbe` centroids nearest to each query and
    * rank only vectors assigned to those lists. Returns same shape as
    * bruteForceTopK. Recall < 1 by design; measured in SimilaritySpec.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 3): DataFrame = {
    val centroids = kmeansLiteCentroids(corpus, nLists, kmeansIters).cache()
    ivfSearch(corpus, assignToCentroids(corpus, centroids), centroids,
      queries, k, nProbe)
  }

  /** [[ivfTopK]] with the index (centroids + assignments) memoized per
    * (session, input, params) — repeated searches pay the build once.
    */
  def ivfTopKCached(corpus: DataFrame, inputKey: String, queries: DataFrame,
                    k: Int, nLists: Int = 16, nProbe: Int = 4,
                    kmeansIters: Int = 3): DataFrame = {
    val centroids = kmeansLiteCentroidsCached(corpus, inputKey, nLists,
      kmeansIters)
    val lists = corpus.select(col("id"), col("v"))
      .join(assignmentsCached(corpus, inputKey, nLists, kmeansIters), "id")
    ivfSearch(corpus, lists, centroids, queries, k, nProbe)
  }

  private def ivfSearch(corpus: DataFrame, lists: DataFrame,
                        centroids: DataFrame, queries: DataFrame,
                        k: Int, nProbe: Int): DataFrame = {
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

  /** Quantized-residual corpus codes: each vector's residual against
    * its assigned IVF centroid, affine-int8 per dimension (global
    * per-dim lo/scale from a corpus stats pass), packed as
    * `array<tinyint>` — a REAL 1-byte-per-dimension representation
    * (4× smaller than float32 on disk and over the wire), not floats
    * pretending. Returns (codes (id, cid, codes), centroids,
    * stats (p, lo, scale)).
    */
  def ivfSq8Index(corpus: DataFrame, nLists: Int, kmeansIters: Int = 3)
  : (DataFrame, DataFrame, DataFrame) = {
    val centroids = kmeansLiteCentroids(corpus, nLists, kmeansIters)
      .localCheckpoint(true)
    val assign = assignmentsOf(corpus, centroids)
    val stats = sq8Stats(corpus, assign, centroids).localCheckpoint(true)
    (sq8Codes(corpus, assign, centroids, stats), centroids, stats)
  }

  /** [[ivfSq8Index]] with every part memoized per (session, input,
    * params): centroids and stats are tiny, assignments are ids-only,
    * and the codes table IS the compact index (1 byte/dimension).
    */
  def ivfSq8IndexCached(corpus: DataFrame, inputKey: String, nLists: Int,
                        kmeansIters: Int = 3)
  : (DataFrame, DataFrame, DataFrame) = {
    val centroids = kmeansLiteCentroidsCached(corpus, inputKey, nLists,
      kmeansIters)
    val assign = assignmentsCached(corpus, inputKey, nLists, kmeansIters)
    val stats = indexMemo.getOrElseUpdate(corpus.sparkSession,
      s"sq8-stats|$inputKey|$nLists|$kmeansIters") {
      sq8Stats(corpus, assign, centroids)
    }
    val codes = indexMemo.getOrElseUpdate(corpus.sparkSession,
      s"sq8-codes|$inputKey|$nLists|$kmeansIters") {
      sq8Codes(corpus, assign, centroids, stats)
    }
    (codes, centroids, stats)
  }

  /** Per-(id, cid, dimension) residual vs the assigned centroid. */
  private def rposOf(corpus: DataFrame, assign: DataFrame,
                     centroids: DataFrame): DataFrame = {
    val cpos = centroids.select(col("cid"),
      posexplode(col("cv")).as(Seq("p", "cx")))
    corpus.select(col("id"), col("v")).join(assign, "id")
      .select(col("id"), col("cid"), posexplode(col("v")).as(Seq("p", "x")))
      .join(broadcast(cpos), Seq("cid", "p"))
      .withColumn("r", col("x").cast("double") - col("cx").cast("double"))
  }

  private def sq8Stats(corpus: DataFrame, assign: DataFrame,
                       centroids: DataFrame): DataFrame =
    rposOf(corpus, assign, centroids).groupBy("p")
      .agg(min("r").as("lo"), max("r").as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / 255.0)
      .select("p", "lo", "scale")

  private def sq8Codes(corpus: DataFrame, assign: DataFrame,
                       centroids: DataFrame, stats: DataFrame): DataFrame =
    rposOf(corpus, assign, centroids).join(broadcast(stats), "p")
      .withColumn("q", when(col("scale") > 0,
        round((col("r") - col("lo")) / col("scale"))).otherwise(0.0))
      .withColumn("code", (col("q") - 128).cast("byte"))
      .groupBy("id", "cid")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** IVF-SQ8 ANN with exact re-rank: probe `nProbe` lists, score every
    * candidate on its RECONSTRUCTED residual (lo + (code+128)·scale —
    * pure column arithmetic over the 1-byte codes, fully codegen'd),
    * keep the `rerank` best per query by approximate distance, then
    * re-rank just those with exact float cosine. Same output shape as
    * [[bruteForceTopK]].
    *
    * Scale shape: the big probe-join scans only the 1-byte codes of
    * the probed lists (~nProbe/nLists of the corpus at 1/4 the bytes);
    * exact float vectors are touched for `rerank` ids per query — the
    * standard IVF-PQ/ADC search structure (Jégou, Douze & Schmid,
    * "Product quantization for nearest neighbor search", PAMI 2011),
    * with a scalar-quantizer codebook instead of per-subspace PQ
    * codebooks.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nLists: Int = 16, nProbe: Int = 4, rerank: Int = 32,
                kmeansIters: Int = 3): DataFrame =
    ivfPqSearch(corpus, queries, ivfSq8Index(corpus, nLists, kmeansIters),
      k, nProbe, rerank)

  /** [[ivfPqTopK]] over the memoized index ([[ivfSq8IndexCached]]). */
  def ivfPqTopKCached(corpus: DataFrame, inputKey: String,
                      queries: DataFrame, k: Int,
                      nLists: Int = 16, nProbe: Int = 4, rerank: Int = 32,
                      kmeansIters: Int = 3): DataFrame =
    ivfPqSearch(corpus, queries,
      ivfSq8IndexCached(corpus, inputKey, nLists, kmeansIters),
      k, nProbe, rerank)

  private def ivfPqSearch(corpus: DataFrame, queries: DataFrame,
                          index: (DataFrame, DataFrame, DataFrame), k: Int,
                          nProbe: Int, rerank: Int): DataFrame = {
    val (codes, centroids, stats) = index
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val cpos = centroids.select(col("cid"),
      posexplode(col("cv")).as(Seq("p", "cx")))

    val wq = Window.partitionBy("qid").orderBy(col("qd2"), col("cid"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("qd2", l2Sq(col("qv"), col("cv")))
      .withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))

    // Fold the dequantization affine into the TINY query side: per
    // (query, probed list) an array a with a_p = qr_p − lo_p −
    // 128·scale_p, so the per-candidate score is
    // Σ(a_p − code_p·scale_p)² — one codegen loop per candidate row
    // (graft_sq8_d2), no per-dimension explode/join/aggregate on the
    // corpus-sized side. nq·nProbe rows, broadcast.
    val qarr = probes
      .select(col("qid"), col("cid"), posexplode(col("qv")).as(Seq("p", "qx")))
      .join(broadcast(cpos), Seq("cid", "p"))
      .join(broadcast(stats), "p")
      .withColumn("a", col("qx").cast("double") - col("cx").cast("double") -
        col("lo") - lit(128.0) * col("scale"))
      .groupBy("qid", "cid")
      .agg(
        transform(array_sort(collect_list(struct(col("p"), col("a")))),
          s => s.getField("a")).as("a"),
        transform(array_sort(collect_list(struct(col("p"), col("scale")))),
          s => s.getField("scale")).as("sc"))

    val approx = codes
      .join(broadcast(qarr), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("ad2",
        call_function("graft_sq8_d2", col("a"), col("sc"), col("codes")))
    val ws = Window.partitionBy("qid").orderBy(col("ad2"), col("id"))
    val shortlist = approx.withColumn("srn", row_number().over(ws))
      .filter(col("srn") <= rerank)
      .select("qid", "id")

    // exact re-rank: float vectors touched ONLY for the shortlist
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val exact = shortlist
      .join(corpus.select(col("id"), col("v")), Seq("id"))
      .join(broadcast(queries.select(col("qid"), col("qv"))), Seq("qid"))
      .withColumn("cosine", call_function("graft_cosine", col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster embeddings, compare pairs ONLY within a
    * cluster, drop all but the smallest id of each cosine-≥-threshold
    * group.
    *
    * Clustering is what makes this survive 100 TB: the pairwise stage
    * is quadratic only in the cluster size (n²/c per cluster vs n²
    * corpus-wide), and duplicate groups come from the checkpointed
    * [[Components.connectedComponents]] fixpoint, so chained dups
    * (a≈b≈c with cos(a,c) < τ) still collapse to one survivor.
    * Near-dups split across cluster boundaries are the documented
    * recall loss (SemDeDup accepts it; multi-probe assignment is the
    * upgrade).
    *
    * @param corpus (id, v)
    * @return (id, cid, keep) — every input vector, its cluster, and
    *         whether semantic dedup keeps it
    */
  def semanticDedup(corpus: DataFrame, nClusters: Int, threshold: Double,
                    kmeansIters: Int = 3,
                    inputKey: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // inputKey → the SAME session-memoized index the IVF/exact-pair
    // paths build (one cluster index per corpus, many consumers)
    val assigned = inputKey match {
      case Some(k) =>
        corpus.select(col("id"), col("v"))
          .join(assignmentsCached(corpus, k, nClusters, kmeansIters), "id")
      case None =>
        val centroids = kmeansLiteCentroids(corpus, nClusters, kmeansIters)
        assignToCentroids(corpus, centroids)
    }
    val a = assigned.select(col("cid"), col("id").as("id_a"),
      col("v").as("va"))
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("v").as("vb"))
    val pairs = a.join(b, "cid")
      .filter(col("id_a") < col("id_b"))
      .filter(call_function("graft_cosine", col("va"), col("vb"))
        >= threshold)
      .select("id_a", "id_b")
    val comp = Components.connectedComponents(pairs)
    val dropped = comp.filter(col("id") =!= col("component"))
      .select(col("id"), lit(true).as("__dup"))
    assigned.select(col("id"), col("cid"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cid"),
        coalesce(!col("__dup"), lit(true)).as("keep"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-similar corpus vectors with a DIFFERENT label (the
    * near-misses that make the best negatives). Same plan as
    * [[bruteForceTopK]] — broadcast queries, one corpus scan, codegen
    * cosine, per-query top-k — plus the label-disagreement filter
    * evaluated before the cosine.
    *
    * @param corpus  (id, v, label)
    * @param queries (qid, qv, qlabel)
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val joined = corpus.select(col("id"), col("v"), col("label"))
      .join(broadcast(queries.select(col("qid"), col("qv"),
        col("qlabel"))))
      .filter(col("label") =!= col("qlabel"))
      // same rank-on-rounded-cosine contract as bruteForceTopK
      .withColumn("cosine",
        round(call_function("graft_cosine", col("v"), col("qv")), 4))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }
}
