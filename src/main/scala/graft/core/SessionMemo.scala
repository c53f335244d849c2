package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of deterministic intermediate DataFrames (pair
  * graphs, component labels): queries that share an expensive
  * deterministic subresult pay its cost ONCE per session. Values are
  * `localCheckpoint(true)`-materialized, so reuse cannot change any
  * answer.
  *
  * Lifecycle: entries are evicted when their session's SparkContext
  * ends (a listener registered on first use), so checkpointed blocks
  * do not outlive the session in a long-running JVM that cycles many
  * sessions.
  *
  * KEY CONTRACT — the string key must uniquely identify the CONTENT of
  * the input, not just its name: callers key by (input path + every
  * algorithm parameter), which is sound while the files under a path
  * are immutable within a session (true for this engine's read-only
  * test data and for any sanely-versioned data lake). If a caller
  * re-generates data under the same path mid-session it MUST fold a
  * content fingerprint (e.g. max(file mtime) or a snapshot version)
  * into the key, or call the uncached form.
  */
final class SessionMemo {
  private val map = new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(spark: SparkSession, key: String)
                     (compute: => DataFrame): DataFrame = {
    if (hooked.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          map.keySet.removeIf(_._1 eq spark)
          hooked.remove(spark)
        }
      })
    }
    map.computeIfAbsent((spark, key), _ => compute.localCheckpoint(true))
  }

  /** Visible for tests: number of live entries for a session. */
  private[graft] def sizeFor(spark: SparkSession): Int = {
    var n = 0
    map.keySet.forEach(k => if (k._1 eq spark) n += 1)
    n
  }
}
