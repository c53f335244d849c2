package graft

import org.apache.spark.sql.functions._

/** q193–q195 family: ORC round-trip, token-budget apportionment,
  * winnowing fingerprints — the invariants the oracles can't state
  * directly.
  */
class MixPlanningSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("token budget: allocations sum EXACTLY to the budget and " +
    "deviate from floor by at most 1") {
    val out = SparkEntry.queries("q194_token_budget")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum === 1000000L,
      "largest-remainder must apportion the budget exactly")
    out.foreach { r =>
      val d = r.getAs[Long]("alloc") - r.getAs[Long]("floor_alloc")
      assert(d === 0L || d === 1L)
    }
    // proportionality: alloc within 1 of the exact share
    val totTok = out.map(_.getAs[Long]("n_tok")).sum
    out.foreach { r =>
      val exact = 1000000.0 * r.getAs[Long]("n_tok") / totTok
      assert(math.abs(r.getAs[Long]("alloc") - exact) <= 1.0,
        s"${r.getAs[String]("source")}: alloc off the exact share")
    }
  }

  test("winnowing: a shared run of >= w+k-1 tokens shares a " +
    "fingerprint; disjoint vocabularies share none") {
    import org.apache.spark.sql.expressions.Window
    // replicate the q195 pipeline on a planted fixture
    def fingerprints(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
      val toks = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")
            .as("ts"))
        .filter(size(col("ts")) >= 3)
      val grams = toks.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, size(ts) - 2), " +
            "i -> concat_ws(' ', slice(ts, i, 3)))")).as(Seq("p0", "g")))
        .select(col("doc_id"), (col("p0") + 1).as("p"),
          conv(substring(md5(concat_ws("|", lit("win0"), col("g"))),
            1, 12), 16, 10).cast("long").as("h"))
      val wWin = Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.currentRow, 3)
      val wDoc = Window.partitionBy("doc_id")
      grams.withColumn("hmin", min("h").over(wWin))
        .withColumn("ng", count(lit(1)).over(wDoc))
        .filter(col("p") <= col("ng") - 3)
        .select("doc_id", "hmin").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) =>
          k -> rs.map(_.getLong(1)).toSet
        }
    }
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 = w+k-1 tokens
    val fp = fingerprints(Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"red blue green $shared yellow purple orange pink"),
      (3L, "cat dog bird fish mouse horse cow sheep goat llama")))
    assert((fp(1L) & fp(2L)).nonEmpty,
      "docs sharing a 6-token run must share a winnowing fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty && (fp(2L) & fp(3L)).isEmpty,
      "disjoint vocabularies must not collide")
  }

  test("ORC round-trip preserves values bit-for-bit vs parquet") {
    val orc = SparkEntry.queries("q193_orc_roundtrip")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pq = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(orc === pq)
  }
}
