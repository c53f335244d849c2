package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a Rademacher (±1) sign
  * matrix — the embedding-compression primitive behind cheap ANN
  * pre-filters, sketch-based clustering, and bandwidth-reduced
  * shuffles of high-dimensional vectors (Achlioptas 2003: ±1 entries
  * satisfy the JL lemma with the same distortion guarantees as
  * Gaussians, and need no float random source).
  *
  * Two deliberate design points make this exact and engine-portable:
  *
  *  - **The sign matrix is content-addressed, not sampled**:
  *    sign(j,i) = parity of the first hex nibble of md5("rp_j_i").
  *    Any engine (and the DuckDB oracle) reconstructs the identical
  *    matrix from the formula — no model file, no seed plumbing, no
  *    broadcast (the signs are compile-time constants folded into the
  *    generated code).
  *  - **Integer arithmetic**: components are scaled to micro-units
  *    (round(x·10⁶) as long) BEFORE the signed sum, so the projection
  *    is a sum of longs — associative, bit-identical under any
  *    partitioning and in any engine. A float dot product would be
  *    order-sensitive and unverifiable.
  *
  * Scale posture: map-only — zero shuffles, zero state. The whole
  * projection is one straight-line codegen expression tree
  * (outDims × inDims add/negate terms on `element_at` reads), so it
  * runs at parquet-scan speed; at 100 TB this is the cheapest possible
  * plan shape (the reduced vectors are outDims/inDims of the scan
  * bytes downstream). For very large outDims×inDims (≳10⁴ terms) the
  * straight-line tree would stress JIT budgets — the upgrade path is a
  * blocked native `Expression` over the sign matrix (same semantics),
  * not a shuffle.
  */
object Projection {

  /** Rademacher sign from the content-addressed hash: −1 when the
    * first hex nibble of md5("rp_<j>_<i>") is odd, +1 otherwise.
    * Replayed in SQL as
    * `substr(md5('rp_'||j||'_'||i),1,1) IN ('1','3',...,'f')`.
    */
  def sign(j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp_${j}_${i}".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0x1) == 1) -1 else 1
  }

  /** One row per (id, output dim): `(id, dim, proj_micro)`.
    * Map-only: the native `graft_random_project` expression (tight
    * codegen loop — each input element rounded once, reused across
    * all output dims; the equivalent declarative Column tree was a
    * ~10⁴-node expression that recompiled per run, measured 3.9 s at
    * sf0.1 vs scan-speed here) feeds `posexplode` — still no shuffle,
    * no sort. Malformed vectors (short array / null element) project
    * to null and emit no rows.
    */
  def randomProject(df: DataFrame, embCol: String, idCol: String,
                    inDims: Int = 64, outDims: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol),
      posexplode(call_function("graft_random_project", col(embCol),
        lit(inDims), lit(outDims))).as(Seq("dim", "proj_micro")))
  }
}
