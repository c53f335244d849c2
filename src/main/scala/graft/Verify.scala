package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only; the driver passes 2):
    // comma-separated query names — dump just those
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // row-level SQL (UPDATE / MERGE INTO / DELETE-with-subquery)
      .config("spark.sql.extensions", "graft.plans.GraftSqlExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query watchdog: one pathological query must not stall the
    // whole correctness gate (the driver grades whatever parquet
    // exists — a hang would silently zero every later query, the
    // round-6 failure shape). Each query runs in its own job group
    // with a generous budget; on timeout the group's Spark jobs are
    // cancelled and the dump continues. Hardening (round 8): each
    // callable clears a stale interrupt flag (task.cancel(true) can
    // race completion and poison the NEXT query on the shared worker),
    // and a worker that cancelJobGroup/interrupt cannot unstick
    // (driver-side planning, non-interruptible IO) is ABANDONED — the
    // executor is replaced so later queries run instead of queueing
    // forever behind the dead one and "timing out" unexecuted.
    val budgetMs = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_MS",
      "300000").toLong
    var pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          Thread.interrupted() // drop a stale cancel-race interrupt
          spark.sparkContext.setJobGroup(name, name,
            interruptOnCancel = true)
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try task.get(budgetMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          if (!task.isDone) task.cancel(true)
          try task.get(15000, java.util.concurrent.TimeUnit.MILLISECONDS)
          catch { case _: Throwable => () }
          if (!task.isDone) {
            pool.shutdownNow()
            pool = java.util.concurrent.Executors.newSingleThreadExecutor()
          }
          System.err.println(s"[verify] $name failed: timeout ${budgetMs}ms")
        case e: Throwable =>
          val cause = Option(e.getCause).getOrElse(e)
          System.err.println(s"[verify] $name failed: ${cause.getMessage}")
      }
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
