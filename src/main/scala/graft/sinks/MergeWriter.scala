package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** S8 — the keyed upsert sink: the reference's
  * `INSERT ... ON CONFLICT (city, ts_utc) DO UPDATE`
  * (/root/reference/transformation/clean_data.py:222-243), re-expressed
  * for an immutable columnar store.
  *
  * Emulation: `existing LEFT ANTI updates ON keys` ∪ `updates`, written
  * to a temp directory then swapped into place — the temp-write avoids
  * the read-own-input overwrite hazard (SURVEY §7.4 risk 1). Re-running
  * the same batch is idempotent: every key collides and is replaced by
  * the identical row.
  *
  * Partitioned mode is the 100 TB path: with `partitionColumns`, ONLY
  * partitions present in `updates` are read, merged, and swapped — the
  * anti-join scans just those partitions (partition pruning) and the
  * swap replaces just those partition DIRECTORIES; untouched partitions
  * are never read or rewritten. An unpartitioned merge rewrites the
  * whole table and is only appropriate for small/metadata tables.
  *
  * CONTRACT (partitioned mode): every partition column must be a
  * function of the merge keys (e.g. dt = to_date(ts_utc) with ts_utc a
  * key). Otherwise an update row whose key exists under a DIFFERENT
  * partition value leaves the old copy in the untouched partition —
  * the same constraint partitioned MERGE targets carry in
  * Delta/Iceberg when only touched partitions are rewritten.
  *
  * CONCURRENCY: the swap is NOT atomic for concurrent readers. The
  * unpartitioned path does two ATOMIC_MOVEs (target→old, tmp→target),
  * so a reader listing the table in the sub-second window between them
  * sees no directory; the partitioned path swaps one partition dir at
  * a time, so a concurrent full-table read can observe partition A
  * post-merge and partition B pre-merge. Single-writer /
  * retry-on-missing readers (the batch-pipeline pattern this sink
  * serves) are unaffected; [[VersionedTable.upsert]] closes the window
  * with manifest indirection (readers never see a missing dir), and a
  * transactional table format (Delta/Iceberg) is the upgrade path when
  * concurrent readers need full snapshot isolation with concurrent
  * writers. For a relational target, [[JdbcUpsert]] gives
  * per-transaction atomicity instead.
  */
object MergeWriter {

  /** Schema-drift policy for `merge`, mirroring the reference's dbt
    * incremental contract (`/root/reference/dbt/dbt_project.yml:15`
    * `on_schema_change: sync_all_columns`).
    */
  sealed trait SchemaMode
  object SchemaMode {
    /** Any column-set difference between updates and target fails
      * loudly. The default: silent column dropping is how upstream
      * schema drift turns into quiet data loss.
      */
    case object Strict extends SchemaMode

    /** Columns new in the updates are ADDED to the target (existing
      * rows read back as null); columns the updates lack are null-
      * filled in the update rows. Nothing is silently dropped.
      * Partitioned-mode caveat: only touched partitions are rewritten
      * with the widened schema — readers of a partially-evolved table
      * must read with `mergeSchema=true` (as with any parquet table
      * evolved in place).
      */
    case object SyncAllColumns extends SchemaMode
  }

  def merge(spark: SparkSession,
            targetPath: String,
            updates: DataFrame,
            keys: Seq[String],
            partitionColumns: Seq[String] = Nil,
            schemaMode: SchemaMode = SchemaMode.Strict): Unit = {
    val target = Paths.get(targetPath)
    val exists = Files.exists(target) && {
      val s = Files.list(target)
      try s.findFirst.isPresent finally s.close()
    }

    if (!exists) {
      val w = updates.write.mode(SaveMode.Overwrite)
      (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
        .parquet(targetPath)
      return
    }

    // mergeSchema: a previously-evolved partitioned table may hold a
    // mix of file schemas; the union below must see every column
    val existing0 = spark.read.option("mergeSchema", "true").parquet(targetPath)
    val (existingAligned, updatesAligned) =
      alignSchemas(existing0, updates, keys, schemaMode)
    val tmpPath = targetPath + ".__merge_tmp"

    if (partitionColumns.isEmpty) {
      val kept = existingAligned.join(updates.select(
        keys.map(updates(_)): _*), keys, "left_anti")
      val merged = kept.unionByName(updatesAligned)
      merged.write.mode(SaveMode.Overwrite).parquet(tmpPath)
      // swap the whole table dir
      val oldPath = Paths.get(targetPath + ".__merge_old")
      deleteRecursively(oldPath)
      Files.move(target, oldPath, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmpPath), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(oldPath)
    } else {
      // prune: the anti-join reads only partitions the updates touch
      val touched = updates.select(partitionColumns.map(updates(_)): _*)
        .distinct().collect()
      if (touched.isEmpty) return
      // balanced tree (VersionedTable.touchedPredicate), NOT a left
      // fold: a wide backfill's linear OR chain stack-overflows
      // Catalyst past ~10k touched partitions
      val touchedPred =
        VersionedTable.touchedPredicate(partitionColumns, touched)
      val kept = existingAligned.filter(touchedPred)
        .join(updates.select(keys.map(updates(_)): _*), keys, "left_anti")
      val merged = kept.unionByName(updatesAligned)
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionColumns: _*).parquet(tmpPath)

      // swap ONLY the written partition directories into the target;
      // untouched partition dirs are never rewritten
      partitionDirs(Paths.get(tmpPath), partitionColumns.size).foreach { rel =>
        val dst = target.resolve(rel)
        deleteRecursively(dst)
        Files.createDirectories(dst.getParent)
        Files.move(Paths.get(tmpPath).resolve(rel), dst,
          StandardCopyOption.ATOMIC_MOVE)
      }
      deleteRecursively(Paths.get(tmpPath))
    }
  }

  /** Reconcile target and update schemas per `schemaMode`. Returns
    * (existing, updates) projected to the SAME column list in the same
    * order, ready for `unionByName`. Merge keys must always be present
    * in the updates — a null-filled key would merge nonsense.
    */
  private[sinks] def alignSchemas(existing: DataFrame, updates: DataFrame,
                                  keys: Seq[String], mode: SchemaMode)
  : (DataFrame, DataFrame) = {
    val eCols = existing.columns.toSeq
    val uSet = updates.columns.toSet
    val eSet = eCols.toSet
    val missingKeys = keys.filterNot(uSet)
    require(missingKeys.isEmpty,
      s"updates lack merge key column(s): ${missingKeys.mkString(", ")}")
    if (uSet == eSet)
      (existing, updates.select(eCols.map(updates(_)): _*))
    else mode match {
      case SchemaMode.Strict =>
        throw new IllegalArgumentException(
          "update schema differs from target " +
            s"(extra: ${(uSet -- eSet).toSeq.sorted.mkString(", ")}; " +
            s"missing: ${(eSet -- uSet).toSeq.sorted.mkString(", ")}); " +
            "pass SchemaMode.SyncAllColumns to evolve the target instead " +
            "of failing")
      case SchemaMode.SyncAllColumns =>
        val newCols = updates.columns.toSeq.filterNot(eSet)
        val uTypes = updates.schema.map(f => f.name -> f.dataType).toMap
        val eTypes = existing.schema.map(f => f.name -> f.dataType).toMap
        val outCols = eCols ++ newCols
        val ex = existing.select(
          eCols.map(existing(_)) ++
            newCols.map(c => lit(null).cast(uTypes(c)).as(c)): _*)
        val up = updates.select(outCols.map(c =>
          if (uSet(c)) updates(c)
          else lit(null).cast(eTypes(c)).as(c)): _*)
        (ex, up)
    }
  }

  /** Relative `col=value[/col=value...]` partition paths under base. */
  private def partitionDirs(base: Path, depth: Int): Seq[Path] = {
    def walk(dir: Path, level: Int): Seq[Path] =
      if (level == 0) Seq(dir)
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq
            .filter(p => Files.isDirectory(p) &&
              p.getFileName.toString.contains("="))
            .flatMap(walk(_, level - 1))
        } finally s.close()
      }
    walk(base, depth).map(base.relativize)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
