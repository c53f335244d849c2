package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: file source → watermarked
  * transforms → sink. The reference has no streaming (SURVEY §2.7 — its
  * cadence is re-ingest + keyed upsert); this is the scalable successor
  * for incremental processing: `Trigger.AvailableNow` gives exactly the
  * daily-batch semantics while the SAME code runs continuous at 100 TB/day.
  */
object EventsStream {

  /** Streaming events source from the sf dir. The file source needs an
    * explicit schema, and the physical `ts` encoding varies by testdata
    * generation (INT64 nanos vs TIMESTAMP_NTZ micros — see
    * Tables.events), so pin the stream schema to the batch footer
    * schema of the same file and apply the matching conversion.
    */
  // one staged symlink dir per sfDir (repeat calls reuse it — no
  // temp-dir leak across Bench/Verify/Profile loops)
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file-stream source needs a DIRECTORY; the testdata table is a
    // single file. Stage a symlink dir (no data copy).
    val dir = stagedDirs.computeIfAbsent(sfDir, { _ =>
      val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
      val d = java.nio.file.Files.createTempDirectory("events_stream")
      java.nio.file.Files.createSymbolicLink(d.resolve("events.parquet"), src)
      d.toString
    })
    // Footer-driven schema (one cheap metadata read) so the stream sees
    // exactly the physical types; conversion branch mirrors Tables.events.
    val phys = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(phys).parquet(dir)
    phys("ts").dataType match {
      case LongType =>
        // integer `div`: see Tables.events — float division rounds at
        // epoch-nanos magnitude
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling-window counts per event_type with a 1-hour watermark —
    * the canonical windowed streaming aggregate. Late data beyond the
    * watermark is dropped; with AvailableNow nothing is late, so the
    * result equals the batch GROUP BY (oracle-checked as
    * q30_stream_window).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming windowed QUANTILE monitoring via the mergeable t-digest
    * aggregate: per (window, event_type), the digest accumulates in the
    * streaming state store exactly like any other aggregate buffer
    * (TypedImperativeAggregate serializes across micro-batches), and
    * the p-quantile is probed from the final digest. This is the
    * standard latency-percentile dashboard shape — a full-accuracy
    * percentile would need every raw value in state; the digest keeps
    * O(δ) per window. q119 grades the estimate with the batch
    * rank-error gate (ErrorBounds semantics) so the stream path's
    * accuracy is oracle-checked, not assumed.
    */
  def windowedDigestQuantile(events: DataFrame, q: Double = 0.95,
                             compression: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
    // daily windows: the synthetic stream is ~7 events/type/day — an
    // hourly grain would make every digest a 1-3 value group and the
    // rank gate vacuous
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(call_function("graft_tdigest", col("value"), lit(compression))
        .as("td"), count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"),
        call_function("graft_td_quantile", col("td"), lit(q)).as("p_est"))
  }

  /** Native session windows: per-user sessions split at 30-minute
    * inactivity gaps (Spark's built-in session_window — the idiomatic
    * form of streaming sessionization).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start_epoch"),
        col("n_events"), col("sum_value"))

  /** Run a streaming DataFrame to completion with AvailableNow into a
    * memory sink; returns the materialized result. Output mode must be
    * Append for watermarked aggregates to emit finalized windows... but
    * with AvailableNow the watermark only advances BETWEEN micro-batches,
    * so Complete mode is used: every window is final when the source is
    * exhausted.
    */
  def runToTable(spark: SparkSession, df: DataFrame, name: String,
                 mode: OutputMode = OutputMode.Complete(),
                 needsFinalize: Option[Boolean] = None,
                 partitions: Option[Int] = None): DataFrame = {
    // Stateful streaming cost scales with shuffle partitions (one
    // state store instance per partition per stateful operator); pin a
    // partition count sized to the data, not the core count — on a
    // real cluster this is a deliberate sizing decision (state store
    // count is fixed at first checkpoint). Measured at sf0.1: 32
    // partitions cost ~10s for the stream-stream join (4.3s of it the
    // NO-DATA watermark-finalization batch committing 32x4 stores), 2
    // partitions ~2.2s. The default HDFS-backed (in-memory) provider
    // also measured FASTER than RocksDB here (q40 2.3s vs 2.9s, q31
    // 1.7s vs 1.9s): native-store overhead only pays once per-partition
    // state outgrows executor memory.
    // NB: set/restore of the session conf assumes no CONCURRENT query
    // submissions on this session (Verify/Bench/tests are sequential);
    // a multi-tenant caller should pass a dedicated session.
    // 4 measured best on the sf0.1 family (2 under-parallelizes the
    // 200k-row join batches, 32 pays 4.3s of no-data store commits —
    // see the sizing note above; sweep rerun with tmpfs checkpoints).
    // `partitions` overrides per query: heavier per-row stateful
    // shapes (session windows) measured faster at 16.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      partitions.map(_.toString).getOrElse(
        sys.props.getOrElse("graft.stream.partitions", "4")))
    // Complete mode emits every group when the source drains — the
    // extra NO-DATA micro-batch (whose only job is advancing the
    // watermark so Append-mode sinks finalize) is pure fixed cost
    // here: skip it. Append-mode runs need it WHEN emission waits on
    // the watermark (outer-join NULL extension, session timeout,
    // finalized windows); an Append INNER stream-stream join emits
    // every match in the data batch itself and may pass
    // `needsFinalize = Some(false)` to skip the state-eviction-only
    // batch too. The conf is scoped to this run and restored.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.getOption(noDataKey)
    val finalize = needsFinalize.getOrElse(mode != OutputMode.Complete())
    if (!finalize) spark.conf.set(noDataKey, "false")
    // explicit checkpoint on fast scratch (tmpfs locally): the WAL/
    // commit/state small-file writes are the per-query floor — see
    // ScratchDirs for the local-vs-cluster placement contract
    val ckpt = graft.core.ScratchDirs.fresh(s"ckpt_$name")
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevNoData match {
        case Some(v) => spark.conf.set(noDataKey, v)
        case None    => spark.conf.unset(noDataKey)
      }
      graft.core.ScratchDirs.delete(ckpt)
    }
    spark.table(name)
  }

  /** Stateful streaming deduplication: first arrival per key wins,
    * state bounded by the watermark (late duplicates beyond it may
    * reappear — the documented streaming-dedup contract). The
    * streaming analog of the reference's keyed upsert (SURVEY §2.7:
    * re-ingest + keyed overwrite). Emits the KEYS (deterministic);
    * which physical row survives first-arrival is not.
    */
  def streamDedupKeys(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select((keys.map(col) :+ col("ts")): _*)
      .dropDuplicatesWithinWatermark(keys)
      .select(keys.map(col): _*)

  /** Stream-stream interval join: each purchase joined to the same
    * user's error events from the preceding 30 minutes. Both sides are
    * watermarked so the join state is bounded — the right side can be
    * evicted once it falls behind left-watermark − 30 min; unbounded
    * state is the classic stream-join failure mode at scale.
    */
  def purchaseErrorJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val e = errors
      .select(col("event_id").as("e_event_id"),
        col("user_id").as("e_user_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    p.join(e,
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("e_ts") <= col("p_ts"))
      .select(col("p_event_id"), col("user_id"), col("e_event_id"))
  }

  /** Stream–stream LEFT OUTER interval join: every purchase appears,
    * null-padded if no error preceded it within 30 minutes. The outer
    * semantics are watermark-driven — an unmatched purchase can only be
    * emitted once the error-side watermark has passed its match window
    * (before that, a matching error might still arrive), so null rows
    * trail matched rows by the watermark delay, and purchases inside
    * the final un-finalized horizon of a bounded run may never emit
    * their null row at all. The query-level watermark is the MIN over
    * both watermarked inputs (multipleWatermarkPolicy=min default), so
    * the finalized horizon is set by the EARLIER of the two sides' max
    * event times — a sparse right stream holds back finalization of
    * the whole join. Callers comparing against a batch left join must
    * restrict both sides to the finalized region
    * (`p_ts ≤ least(max left ts, max right ts) − watermark −
    * interval`); q92 does exactly that. State is bounded on both
    * sides by the same watermark + interval arithmetic as the inner
    * form.
    */
  def purchaseErrorLeftJoin(purchases: DataFrame,
                            errors: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val e = errors
      .select(col("event_id").as("e_event_id"),
        col("user_id").as("e_user_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    p.join(e,
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("e_ts") <= col("p_ts"),
      "leftOuter")
      .select(col("p_event_id"), col("user_id"), col("p_ts"),
        col("e_event_id"))
  }

  // -------------------------------------------------------------------
  // Custom state: flatMapGroupsWithState — the escape hatch for
  // semantics session_window can't express. Example operator: per-user
  // running anomaly detector that emits an alert row whenever a value
  // exceeds `k`× the user's running mean (state = count + mean).
  // -------------------------------------------------------------------

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  final case class UserStats(n: Long, sumCents: Long)
  final case class Anomaly(user_id: Long, event_id: Long, value: Double,
                           running_mean: Double, n_prior: Long)

  /** Per-user running-mean anomaly detector. The anomaly predicate is
    * EXACTLY portable across engines: values are 2-decimal, so state
    * keeps an integer cents sum and the test `value > k·mean` is
    * evaluated as `value_cents · n > k · sum_cents` — pure integer
    * products (k rational), no floating summation order or decimal-
    * boundary rounding in the decision. An external replay (q62's
    * DuckDB oracle) computes the identical set with a windowed integer
    * sum. `running_mean` (= sum_cents/100/n) stays a diagnostic column.
    * Cents via `floor(x·100 + 0.5)` spelled literally (NOT
    * `math.round`, which since JDK-8010430 differs from floor(x+0.5)
    * at half-up boundary doubles) so the Scala and oracle-SQL
    * expressions are the same operation. Exact portability requires an
    * integer-valued `k`, so the parameter type is `Long` — the
    * integer-only contract is enforced by the compiler rather than a
    * runtime require (a fractional threshold simply doesn't typecheck).
    */
  def detectAnomalies(events: Dataset[EventRow], k: Long = 5L)
                     (implicit enc1: org.apache.spark.sql.Encoder[Anomaly])
  : Dataset[Anomaly] = {
    require(k > 0, s"k=$k: the anomaly threshold must be positive")
    val kL = k
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserStats]) =>
          var st = state.getOption.getOrElse(UserStats(0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer[Anomaly]()
          // order within the batch for deterministic running stats
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val vc = math.floor(e.value * 100 + 0.5).toLong
            if (st.n >= 3 && vc * st.n > kL * st.sumCents)
              out += Anomaly(uid, e.event_id, e.value,
                st.sumCents / 100.0 / st.n, st.n)
            st = UserStats(st.n + 1, st.sumCents + vc)
          }
          state.update(st)
          out.iterator
      }
  }
}
