package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Projection, TrendFit}
import graft.sources.FileSources

/** q133–q136 family: JL random projection, Markov transitions (via
  * the q134 query shape), JSON quarantine parsing, grouped OLS.
  */
class ProjectionTrendSpec extends SparkSpec {

  test("projection: basis vector picks out one signed column") {
    import spark.implicits._
    // e_3 (1 at index 3, 0 elsewhere): proj_micro(j) = sign(j,3)·10⁶
    val basis = Seq((1L, Array.fill(64)(0.0f).updated(3, 1.0f))).toDF("id", "v")
    val got = Projection.randomProject(basis, "v", "id")
      .orderBy("dim").collect()
    assert(got.length === 16)
    got.foreach { r =>
      val j = r.getAs[Int]("dim")
      assert(r.getAs[Long]("proj_micro") === Projection.sign(j, 3) * 1000000L,
        s"dim $j")
    }
    // the sign function itself is md5-parity: recompute independently
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("rp_5_3".getBytes("UTF-8"))
    val expected = if (((hex(0) >> 4) & 1) == 1) -1 else 1
    assert(Projection.sign(5, 3) === expected)
  }

  test("projection: identical vectors project identically; JL norm ratio") {
    import spark.implicits._
    // 50 deterministic pseudo-random unit-ish vectors
    def vec(s: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(s * 64 + i).toFloat) * 0.1f)
    val df = (0 until 50).map(s => (s.toLong, vec(s))).toDF("id", "v")
    val proj = Projection.randomProject(df, "v", "id")
    // E[‖y‖²] = outDims·‖x_int‖² for Rademacher signs; check the
    // corpus-mean ratio is near 1 (JL concentration at k=16)
    val xi = df.select(col("id"), explode(col("v")).as("x"))
      .select(col("id"),
        (round(col("x").cast("double") * 1e6, 0).cast("long")).as("xi"))
      .groupBy("id").agg(sum(col("xi") * col("xi")).as("xx"))
    val yy = proj.groupBy("id")
      .agg(sum(col("proj_micro") * col("proj_micro")).as("yy"))
    val ratios = yy.join(xi, "id")
      .select((col("yy").cast("double") /
        (col("xx").cast("double") * 16.0)).as("r")).collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.6 && mean < 1.5, s"mean norm ratio $mean")
    // determinism: same input, same projection
    val again = Projection.randomProject(df, "v", "id")
    assert(proj.except(again).count() === 0 && again.except(proj).count() === 0)
  }

  test("projection: codegen ≡ interpreted eval; malformed vectors drop") {
    import spark.implicits._
    def run(): Array[org.apache.spark.sql.Row] = {
      val df = Seq(
        (1L, Array.tabulate(64)(i => (i * 0.01f) - 0.3f)),
        (2L, Array.fill(10)(1.0f)),            // short → no rows
        (3L, null.asInstanceOf[Array[Float]])  // null → no rows
      ).toDF("id", "v")
      Projection.randomProject(df, "v", "id").orderBy("id", "dim").collect()
    }
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val off = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(on.toSeq === off.toSeq)
    assert(on.map(_.getLong(0)).distinct.toSeq === Seq(1L),
      "short/null vectors emit no rows")
    assert(on.length === 16)
  }

  test("markov: hand-computed transitions and probabilities") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // user 1: A B A C   → A→B, B→A, A→C
    // user 2: B A       → B→A
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      (1L, t(0), 0L, "A"), (1L, t(1), 1L, "B"), (1L, t(2), 2L, "A"),
      (1L, t(3), 3L, "C"), (2L, t(0), 4L, "B"), (2L, t(1), 5L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val got = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead("from_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")).cast("double"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === Set(("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5),
      ("B", "A", 2L, 1.0)))
  }

  test("quarantine: truncated-mid-string rows are invalid despite partial fields") {
    import spark.implicits._
    val schema = StructType.fromDDL("k BIGINT, p BIGINT, s STRING")
    val rows = Seq(
      """{"k":1,"p":10,"s":"A"}""",   // valid
      """{"k":2,"p":20,"s":"B""",     // unterminated string: invalid
      """{"k":3,"p":30}""",           // valid, s missing → null field
      """not json at all"""          // invalid
    ).toDF("payload")
    val parsed = FileSources.parseJsonColumn(rows, "payload", schema)
    val byKey = parsed.select(col("payload"), col("is_valid"),
      col("parsed.k").as("k"), col("parsed.p").as("p")).collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(byKey("""{"k":1,"p":10,"s":"A"}""") === true)
    assert(byKey("""{"k":3,"p":30}""") === true)
    assert(byKey("""{"k":2,"p":20,"s":"B""") === false,
      "partial result must NOT count as valid")
    assert(byKey("""not json at all""") === false)
    // whether the parser salvages prefix fields on a truncated record
    // is version-dependent; the stable contract is the corrupt channel
    // carrying the raw payload for every invalid row
    val partial = parsed
      .filter(col("payload") === """{"k":2,"p":20,"s":"B""").head()
    assert(partial.getAs[Row]("parsed")
      .getAs[String](FileSources.CorruptCol) === """{"k":2,"p":20,"s":"B""")
  }

  test("ols: exact line fits exactly; degenerate groups yield nulls") {
    import spark.implicits._
    val pts = Seq(
      // group a: y = 2x + 3 exactly
      ("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L),
      // group b: constant x → varx = 0 → null fit
      ("b", 4L, 1L), ("b", 4L, 9L),
      // group c: single point
      ("c", 7L, 7L)
    ).toDF("g", "x", "y")
    val got = TrendFit.olsFit(pts, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Double]("slope") === 2.0)
    assert(got("a").getAs[Double]("intercept") === 3.0)
    assert(got("a").getAs[Double]("r2") === 1.0)
    assert(got("b").isNullAt(got("b").fieldIndex("slope")))
    assert(got("c").isNullAt(got("c").fieldIndex("slope")))
    // constant y: slope exactly 0, r2 null (vary = 0)
    val flat = Seq(("f", 1L, 5L), ("f", 2L, 5L), ("f", 3L, 5L))
      .toDF("g", "x", "y")
    val fr = TrendFit.olsFit(flat, Seq("g"), col("x"), col("y")).head()
    assert(fr.getAs[Double]("slope") === 0.0)
    assert(fr.isNullAt(fr.fieldIndex("r2")))
  }
}
