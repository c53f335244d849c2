package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float/double>` embedding
  * columns. Built from `zip_with`/`aggregate` higher-order functions —
  * codegen-friendly, no UDF serialization, executor-parallel.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — null-safe only in that null elements propagate nulls. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor
    * ranking — monotone in the true distance).
    */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Per-dimension z-score standardization of an embedding column:
    * two codegen'd passes (stats, apply) over the posexploded table —
    * the standard ML-prep normalization, dimension-agnostic, no
    * driver-side vectors. Returns (idCol, <vecCol> standardized).
    * Zero-variance dimensions pass through as 0.
    */
  def standardize(df: org.apache.spark.sql.DataFrame, vecCol: String,
                  idCol: String): org.apache.spark.sql.DataFrame = {
    val pos = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("p", "x")))
      .select(col(idCol), col("p"), col("x").cast("double").as("x"))
    val stats = pos.groupBy("p")
      .agg(avg("x").as("mu"), stddev_pop(col("x")).as("sigma"))
    // z is ALWAYS non-null (null elements → 0 = the mean): a null z
    // would vanish from collect_list and silently shift later
    // dimensions into earlier slots
    pos.join(broadcast(stats), "p")
      .withColumn("z", when(col("sigma") > 0 && col("x").isNotNull,
        (col("x") - col("mu")) / col("sigma")).otherwise(0.0))
      .groupBy(idCol)
      .agg(transform(array_sort(collect_list(struct(col("p"), col("z")))),
        s => s.getField("z")).as(vecCol))
  }

  /** Per-dimension affine int8 quantization of an embedding column —
    * the 4× storage/bandwidth compression step for large vector
    * stores: q = round((x − min_d)/scale_d) ∈ [0,255] with
    * scale_d = (max_d − min_d)/255 from a corpus stats pass.
    * Zero-variance dimensions quantize to 0 and reconstruct exactly.
    *
    * Returns per-row reconstruction diagnostics
    * (idCol, max_abs_err, mse) — the numbers a pipeline gates on
    * before swapping float vectors for int8. Two codegen passes
    * (stats, apply), no driver-side state; the quantized array itself
    * is `transform`-derivable from the same join when materializing.
    */
  def quantizeInt8Error(df: org.apache.spark.sql.DataFrame, vecCol: String,
                        idCol: String): org.apache.spark.sql.DataFrame = {
    val pos = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("p", "x")))
      .select(col(idCol), col("p"), col("x").cast("double").as("x"))
    val stats = pos.groupBy("p")
      .agg(min("x").as("lo"), max("x").as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / 255.0)
    pos.join(broadcast(stats), "p")
      .withColumn("q", when(col("scale") > 0,
        round((col("x") - col("lo")) / col("scale"))).otherwise(0.0))
      .withColumn("err", abs(col("x") - (col("lo") + col("q") * col("scale"))))
      .groupBy(idCol)
      .agg(round(max("err"), 6).as("max_abs_err"),
        round(avg(col("err") * col("err")), 6).as("mse"))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits, each from a
    * deterministic pseudo-random hyperplane derived from (seed, bit,
    * dimension) via a hash — no stored projection matrix, so the same
    * expression reproduces the same signature on any executor.
    * Returns an int bucket id in [0, 2^bits).
    */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Int = 42): Column = {
    val bitCols = (0 until bits).map { b =>
      // pseudo-random ±1 weights per dimension: sign of xxhash64(seed,b,i)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val h = xxhash64(lit(seed), lit(b), i)
          x.cast("double") * when(h % 2 === 0, 1.0).otherwise(-1.0)
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }
}
