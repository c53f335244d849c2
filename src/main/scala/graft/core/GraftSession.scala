package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * Scale posture (100 TB target, tested on local[32]):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    splitting replace hand-tuned partition counts at scale.
  *  - shuffle.partitions sized to the local core count here; on a real
  *    cluster this is overridden (AQE coalesces down from a high
  *    initial number).
  *  - Session timezone pinned UTC everywhere (reference normalizes all
  *    timestamps to UTC — /root/reference/ingestion/fetch_data.py:113).
  *  - ANSI off: the reference's non-strict casts (null on failure,
  *    /root/reference/transformation/clean_data.py:78-86) are
  *    load-bearing for dirty inputs.
  */
object GraftSession {
  def build(appName: String = "graft",
            master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
            shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // row-level SQL (UPDATE / MERGE INTO / DELETE-with-subquery)
      // on graft tables; the full GraftExtensions adds the function
      // registry + stats-broadcast rule for sessions that want them
      .config("spark.sql.extensions",
        "graft.plans.GraftSqlExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
