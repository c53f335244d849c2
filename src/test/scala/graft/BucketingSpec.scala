package graft

import org.apache.spark.sql.functions._
import graft.sinks.BucketedTables

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with NO shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — remove them or CTAS refuses
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
    }
    BucketedTables.writeBucketed(
      spark.read.parquet(s"$d/orders.parquet")
        .withColumnRenamed("o_orderkey", "okey"),
      "b_orders", "okey", buckets = 4, sortCol = Some("okey"))
    BucketedTables.writeBucketed(
      spark.read.parquet(s"$d/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "okey"),
      "b_lineitem", "okey", buckets = 4, sortCol = Some("okey"))

    // disable auto-broadcast: at this tiny SF both sides fit under the
    // broadcast threshold and a BroadcastHashJoin plan trivially has
    // no hash Exchange — the assertion must exercise the SortMergeJoin
    // path bucketing exists for
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.bucketedJoin(spark, "b_orders", "b_lineitem", "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)

      // unbucketed control: the same join DOES shuffle
      val plain = spark.read.parquet(s"$d/orders.parquet")
        .join(spark.read.parquet(s"$d/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      assert(joined.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }
}
