package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop timing for a SUBSET of SparkEntry.queries — the bench
  * shape (same session confs, per-query min-of-2 after one warm run)
  * without paying for all ~190 queries.
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> q30_x,q31_y,...
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, warmDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[warm] $q: ${e.getMessage}") }
    }
    var total = 0.0
    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(name)(spark, sfDir).count()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      total += t
      println(f"[time] $name%-28s $t%8.3f s")
    }
    println(f"[time] TOTAL ${total}%.3f s over ${names.size} queries")
    spark.stop()
  }
}
