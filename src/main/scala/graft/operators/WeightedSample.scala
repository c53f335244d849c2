package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement (per group):
  * the A-ES / Efraimidis–Spirakis scheme — each row draws a uniform
  * u ∈ (0,1) and the k rows with smallest key = −ln(u)/w win, which is
  * exactly weighted sampling without replacement. The "random" u is a
  * 48-bit md5-derived hash of (salt, id), so
  *
  *  - re-runs pick the SAME rows (reproducible corpus builds — the
  *    property q44 gives uniform sampling, extended to weights);
  *  - the whole thing is two codegen expressions + one per-group
  *    top-k window: a single shuffle on the group key, no RNG state;
  *  - changing `salt` re-draws the sample (epochs).
  *
  * Typical use: quality-weighted training-corpus selection (weight =
  * quality score × length).
  */
object WeightedSample {

  /** 48-bit md5 prefix as a long — the native `graft_md5i` form of
    * `conv(substr(md5(x),1,12),16,10)` (bit-identical; oracles keep
    * replaying the spelled-out idiom). Callers that build DataFrames
    * register the function; `aesKey` consumers go through
    * [[topKPerGroup]], which does.
    */
  private def md5u48(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    call_function("graft_md5i", c, lit(12))

  /** The A-ES sort key. Exposed for oracles/tests: engines that render
    * md5 identically compute the identical key.
    *
    * Self-registering: expands to the native `graft_md5i`, which is
    * registered against the ACTIVE session here (column construction
    * happens on the driver, where a session is active whenever the
    * result can be used). Building columns with no active session and
    * resolving them against a session that never saw
    * `GraftFunctions.ensureRegistered` is the one unsupported corner.
    */
  def aesKey(id: org.apache.spark.sql.Column,
             weight: org.apache.spark.sql.Column,
             salt: String): org.apache.spark.sql.Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.ensureRegistered)
    // u in (0,1]: (h+1) / 2^48 over the first 12 md5 hex digits
    val h = md5u48(concat_ws("|", lit(salt),
      id.cast("string"))).cast("double")
    val u = (h + 1.0) / 281474976710656.0
    -log(u) / weight
  }

  /** Deterministic train/val/test split assignment: hash the id into
    * 100 buckets (same md5-derived uniform as the sampler — salt
    * changes re-deal the split) and carve [0,train), [train,
    * train+val), rest. Hash-based splits survive corpus growth: a doc
    * keeps its split when new data lands, unlike row-number slicing.
    */
  def splitAssign(df: DataFrame, idCol: String,
                  trainPct: Int = 90, valPct: Int = 5,
                  salt: String = "epoch0"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split $trainPct/$valPct")
    val h = md5u48(concat_ws("|", lit(salt),
      col(idCol).cast("string")))
    val bucket = h % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** ANTI-LEAK split: [[splitAssign]] keyed by near-dup CLUSTER
    * instead of document — the fix for what q96's leak gate detects.
    * Hashing per document puts near-duplicate pairs on both sides of
    * the train/eval fence (eval contamination); hashing the cluster
    * label moves every member of a duplicate family together, so NO
    * verified near-dup pair can straddle splits, by construction.
    *
    * `components` is the (id, component) labeling from
    * [[Components.connectedComponents]] over the verified pair graph;
    * documents absent from it (no near-dup) are their own singleton
    * cluster (label = own id — disjoint from component labels, which
    * are min member ids). The join is an id-keyed equi-join (cluster
    * membership can be a large fraction of the corpus — it shuffles,
    * deliberately; don't broadcast it), then the same stateless md5
    * bucket arithmetic as [[splitAssign]]: growth-stable, re-dealable
    * by salt, no driver state.
    */
  def clusterSplit(df: DataFrame, idCol: String, components: DataFrame,
                   trainPct: Int = 90, valPct: Int = 5,
                   salt: String = "epoch0"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split $trainPct/$valPct")
    val withCluster = df
      .join(components.select(col("id").as(idCol), col("component")),
        Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .drop("component")
    val h = md5u48(concat_ws("|", lit(salt), col("cluster").cast("string")))
    val bucket = h % 100
    withCluster.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Corpus mixing: downsample each source to a target keep-rate —
    * the composition knob corpus builders turn (e.g. 30% web, 100%
    * reference text). Per-row decision = the same md5-derived uniform
    * as the sampler compared against the source's rate, so the mix is
    * reproducible, per-doc stable as the corpus grows, embarrassingly
    * parallel (no shuffle), and re-dealable by salt.
    */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0,
                 salt: String = "epoch0"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "keep-rates must be in [0,1]")
    val h = md5u48(concat_ws("|", lit(salt),
      col(idCol).cast("string"))).cast("double")
    val u = h / 281474976710656.0
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, r).otherwise(acc)
    }
    df.filter(u < rate)
  }

  /** Temperature-based corpus rebalancing (the multilingual-LM
    * sampling scheme): the target distribution q_g ∝ p_g^alpha
    * flattens group skew as alpha → 0 (alpha = 1 keeps the corpus
    * as-is). Realized as per-group KEEP RATES over the same per-doc
    * md5 uniform as [[mixSources]]: r_g ∝ p_g^(alpha−1), normalized so
    * the rarest group keeps rate 1 — downsampling only, never
    * replication, so expected kept counts follow q_g exactly.
    *
    * Corpus-sized work is ONE count aggregate; the |groups|-row rate
    * table broadcast-joins back onto the docs and the keep decision is
    * a codegen filter — document rows never shuffle. Monotone in
    * alpha: raising alpha only ADDS docs (same uniforms, higher
    * rates), so corpus recomposition between epochs is incremental.
    */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
                     alpha: Double, salt: String = "epoch0"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha must be in (0, 1]")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n_g"))
    val total = counts.agg(sum("__n_g").cast("double").as("__nt"))
    val rr = counts.crossJoin(broadcast(total))
      .withColumn("__rr",
        pow(col("__n_g").cast("double") / col("__nt"), alpha - 1.0))
    val rates = rr.crossJoin(broadcast(rr.agg(max("__rr").as("__mr"))))
      .select(col(groupCol), (col("__rr") / col("__mr")).as("__rate"))
    val h = md5u48(concat_ws("|", lit(salt),
      col(idCol).cast("string"))).cast("double")
    df.join(broadcast(rates), groupCol)
      .filter(h / 281474976710656.0 < col("__rate"))
      .drop("__rate")
  }

  /** Keep the `k` weighted-sample winners per group. Rows with
    * non-positive weight are EXCLUDED (a zero-weight row must never be
    * sampled, even when the group has fewer than k positive rows).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   weightCol: String, k: Int,
                   salt: String = "epoch0"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val w = Window.partitionBy(groupCol).orderBy(
      aesKey(col(idCol), col(weightCol), salt).asc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
