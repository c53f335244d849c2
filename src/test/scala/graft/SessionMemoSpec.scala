package graft

import graft.core.SessionMemo

class SessionMemoSpec extends SparkSpec {
  import spark.implicits._

  test("computes once per (session, key) and returns the materialized " +
    "result on reuse") {
    val memo = new SessionMemo
    var computes = 0
    def get(key: String) = memo.getOrElseUpdate(spark, key) {
      computes += 1
      Seq(1, 2, 3).toDF("x")
    }
    val a = get("k1")
    val b = get("k1")
    assert(computes === 1)
    assert(a.collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
    assert(b.collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
    get("k2")
    assert(computes === 2)
    assert(memo.sizeFor(spark) === 2)
  }

  test("distinct parameterizations never share an entry (the key " +
    "carries every algorithm parameter)") {
    val memo = new SessionMemo
    val a = memo.getOrElseUpdate(spark, "docs|n=2")(Seq(2).toDF("n"))
    val b = memo.getOrElseUpdate(spark, "docs|n=3")(Seq(3).toDF("n"))
    assert(a.head().getInt(0) === 2)
    assert(b.head().getInt(0) === 3)
  }
}
