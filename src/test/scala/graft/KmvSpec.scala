package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k; estimate within 15% above k; deterministic") {
    // exact regime: fewer distinct values than k
    val small = (1 to 100).map(i => i % 37).toDF("x")
    val exactSmall = small.agg(
      KmvSketch.distinctEstimate($"x", 256)).head().getLong(0)
    assert(exactSmall === 37L)

    // estimate regime on real data, many partitions (forces merges)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartition(8)
    val est = li.agg(KmvSketch.distinctEstimate($"l_partkey", 256))
      .head().getLong(0)
    val exact = li.select(countDistinct("l_partkey")).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.15,
      s"est $est exact $exact")

    // deterministic across runs and partitionings
    val est2 = li.repartition(3)
      .agg(KmvSketch.distinctEstimate($"l_partkey", 256)).head().getLong(0)
    assert(est === est2)
  }
}
