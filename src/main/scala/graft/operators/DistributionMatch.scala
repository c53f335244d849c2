package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-matching subsampler: deterministically thin a corpus
  * so a bucketed feature (length band, language, source, quality
  * tier) matches a TARGET histogram — the "rebalance the pretraining
  * mix by subsampling only" operator (the downsampling half of
  * temperature mixing: no duplication, every kept row is an original
  * row, and the kept set is the largest one the data admits).
  *
  * Semantics: with integer target weights w_b (Σ = W), the largest
  * total K compatible with keeping ≤ n_b rows of bucket b at share
  * w_b/W is K = min_b ⌊n_b·W/w_b⌋. Each bucket then keeps rows whose
  * 48-bit md5 uniform (salted id) falls below the integer threshold
  * ⌊K·w_b·2⁴⁸/(W·n_b)⌋ — EXPECTED bucket counts K·w_b/W, exact
  * thresholds, no floats anywhere, so any engine replays the same
  * kept set bit-for-bit.
  *
  * Scale shape: the histogram is a |buckets|-row aggregate collected
  * on the driver (the accepted O(k) stat pattern — buckets are a
  * feature domain, never corpus-sized); selection is ONE broadcast
  * join + filter pass over the scan, no corpus shuffle. The hash
  * gate makes the sample IDEMPOTENT: retries, re-runs, and
  * per-partition recomputation all select identical rows, which is
  * what makes a 100 TB sampling job restartable mid-way.
  */
object DistributionMatch {

  /** Thin `df` so `bucket` matches `target` (bucket value → integer
    * weight). Rows in buckets absent from `target` are dropped; a
    * target bucket with no rows forces K = 0 (empty result) — the
    * no-upsampling contract. Returns the kept rows with `df`'s
    * columns. `idCol` must be unique per row; `salt` namespaces the
    * uniform so stacked samplers stay independent.
    */
  def sampleToTarget(df: DataFrame, bucket: Column, idCol: Column,
                     target: Seq[(String, Long)],
                     salt: String): DataFrame = {
    require(target.nonEmpty, "target histogram must be non-empty")
    require(target.forall(_._2 >= 0), s"negative target weight: $target")
    val positive = target.filter(_._2 > 0)
    require(positive.nonEmpty, "target histogram must have a positive weight")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val totalW = positive.map(_._2).sum

    val staged = df.withColumn("graft_dm_bucket", bucket.cast("string"))
    // |buckets|-bounded driver collect (the O(k) stat pattern)
    val hist: Map[String, Long] = staged.groupBy("graft_dm_bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val k = positive.map { case (b, w) =>
      hist.getOrElse(b, 0L) * totalW / w
    }.min
    val two48 = BigInt(1) << 48
    val thresholds = positive.map { case (b, w) =>
      val n = hist.getOrElse(b, 0L)
      val t = if (n == 0L) BigInt(0)
        else BigInt(k) * BigInt(w) * two48 / (BigInt(totalW) * BigInt(n))
      (b, t.toLong)
    }
    val tdf = spark.createDataFrame(thresholds)
      .toDF("graft_dm_bucket", "graft_dm_thresh")
    val h = call_function("graft_md5i",
      concat(lit(salt), idCol.cast("string")), lit(12))
    staged.join(broadcast(tdf), "graft_dm_bucket")
      .filter(h < col("graft_dm_thresh"))
      .drop("graft_dm_bucket", "graft_dm_thresh")
  }
}
