package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-verifiable error-bound checks for the approximate operators.
  *
  * The approximate family (t-digest, HLL, KMV, IVF/IVF-SQ8 ANN,
  * hyperplane-LSH near-dup) cannot be hash-compared to a SQL oracle
  * directly — their outputs are estimates. What CAN be oracled is the
  * claim each estimate makes: "within this error of exact". Each check
  * here recomputes the exact ground truth inside the engine, evaluates
  * the approximate operator against it, and emits a row of
  * exact-reproducible columns (group counts, distinct counts — things
  * DuckDB computes identically) plus deterministic within-bound
  * booleans. The driver's DuckDB compare then verifies the exact
  * columns value-for-value and pins every boolean to TRUE — turning
  * the documented error bounds from spec-only assertions into graded,
  * per-round correctness gates. All inputs are deterministic (seeded
  * hyperplanes/k-means, no RNG at eval), so the booleans are stable
  * across runs and scale factors.
  *
  * The exact ground truths are quadratic or full-sort computations run
  * at verification scale; production pipelines run only the
  * approximate side. That asymmetry is the point: the bound is checked
  * where exact is affordable, trusted where it isn't.
  */
object ErrorBounds {

  /** t-digest rank-error check: for each group and quantile q, the
    * digest's estimate must sit within `tol` of rank q in the group's
    * empirical CDF. Duplicates make the CDF step, so the check uses
    * the discrete bracket: P[x < est] ≤ q + tol AND P[x ≤ est] ≥
    * q - tol. Output: group, exact row count, one boolean per q.
    */
  def tdigestRankBound(df: DataFrame, groupCol: String, valueCol: String,
                       qs: Seq[Double], compression: Int = 100,
                       tol: Double = 0.02): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val ests = df.groupBy(groupCol)
      .agg(call_function("graft_tdigest", col(valueCol), lit(compression))
        .as("td"))
      .select(col(groupCol) +: qs.zipWithIndex.map { case (q, i) =>
        call_function("graft_td_quantile", col("td"), lit(q)).as(s"est_$i")
      }: _*)
    // one row per group: broadcast back onto the data pass
    val joined = df.join(broadcast(ests), groupCol)
    val checks = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        avg((col(valueCol) <= col(s"est_$i")).cast("int")).as(s"le_$i"),
        avg((col(valueCol) < col(s"est_$i")).cast("int")).as(s"lt_$i"))
    }
    val aggs = count(lit(1)).as("n_rows") +: checks
    joined.groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: col("n_rows") +:
        qs.zipWithIndex.map { case (q, i) =>
          (col(s"le_$i") >= q - tol && col(s"lt_$i") <= q + tol)
            .as(f"p${(q * 100).toInt}%d_rank_ok")
        }: _*)
  }

  /** ANN gate with two teeth, collapsed to one row. `pruned` is the
    * production operating point: its average recall@k vs brute force
    * must clear `minAvgRecall` (average, not per-query min — ANN
    * bounds are corpus-level; one query may legitimately land in an
    * unprobed list). `full` is the same machinery with every budget
    * opened (all lists probed, re-rank ≥ corpus): it must reproduce
    * the brute-force top-k EXACTLY — both paths score with
    * `graft_cosine` and break ties by id, so any divergence is a bug
    * in list assignment or candidate routing, not float noise. All
    * inputs carry (qid, neighbor_id); `exact` has exactly k rows/query.
    */
  def annRecallGate(pruned: DataFrame, full: DataFrame, exact: DataFrame,
                    k: Int, minAvgRecall: Double): DataFrame = {
    val ex = exact.select("qid", "neighbor_id")
    def hits(df: DataFrame, as: String): DataFrame =
      df.select("qid", "neighbor_id").join(ex, Seq("qid", "neighbor_id"))
        .agg(count(lit(1)).as(as))
    ex.agg(countDistinct(col("qid")).as("n_queries"))
      .crossJoin(hits(pruned, "n_pruned_hits"))
      .crossJoin(hits(full, "n_full_hits"))
      .select(col("n_queries"),
        (col("n_pruned_hits") / (col("n_queries") * k) >= minAvgRecall)
          .as("recall_ok"),
        (col("n_full_hits") === col("n_queries") * k)
          .as("full_budget_exact"))
  }

  /** Recall of the hyperplane-LSH near-dup pairs against the exact
    * all-pairs cosine set at `threshold`. The exact side is
    * [[Similarity.exactCosinePairs]] — cluster-angular-bound pruned
    * but EXACT (every surviving candidate scored with the same 4-dp
    * cosine the oracle replays; DuckDB `list_cosine_similarity` agrees
    * with `graft_cosine` at that grid, established by q27's
    * hash-matched oracle) — so the gate verifies the FULL corpus with
    * no sampling cap. Output: exact pair count + recall boolean.
    */
  def lshCosineRecall(df: DataFrame, vecCol: String, idCol: String,
                      threshold: Double, bits: Int, tables: Int,
                      minRecall: Double,
                      indexKey: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // Materialize both pair sets once (each is tiny — true near-dup
    // pairs): the exact side otherwise re-runs its scoring for the
    // count AND the hits join, and the LSH side re-runs banding.
    val exact = Similarity
      .exactCosinePairs(df, vecCol, idCol, threshold, inputKey = indexKey)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    val approx = Dedup.embeddingNearDups(df, vecCol, idCol, threshold,
      bits, tables).select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    val found = exact.join(approx, Seq("id_a", "id_b"))
    exact.agg(count(lit(1)).as("n_exact_pairs"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_exact_pairs"),
        (col("n_found") >= col("n_exact_pairs") * minRecall)
          .as("recall_ok"))
  }
}
