package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.lit

/** S8 — the keyed upsert sink: the reference's
  * `INSERT ... ON CONFLICT (city, ts_utc) DO UPDATE`
  * (/root/reference/transformation/clean_data.py:222-243), re-expressed
  * for an immutable columnar store.
  *
  * Emulation: `existing LEFT ANTI updates ON keys` ∪ `updates`, written
  * to a temp directory then atomically swapped into place — the
  * temp-write avoids the read-own-input overwrite hazard (SURVEY §7.4
  * risk 1). Re-running the same batch is idempotent: every key collides
  * and is replaced by the identical row.
  *
  * Scale: the anti-join shuffles both sides on the key columns once; at
  * 100 TB the target table should be partitioned (e.g. by date bucket)
  * so only affected partitions join+rewrite. `partitionColumns` enables
  * that: with it, only partitions present in `updates` are rewritten
  * (the merge join reads just those partitions via partition pruning).
  */
object MergeWriter {

  def merge(spark: SparkSession,
            targetPath: String,
            updates: DataFrame,
            keys: Seq[String],
            partitionColumns: Seq[String] = Nil): Unit = {
    val target = Paths.get(targetPath)
    val exists = Files.exists(target) &&
      Files.list(target).findFirst.isPresent

    if (!exists) {
      val w = updates.write.mode(SaveMode.Overwrite)
      (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
        .parquet(targetPath)
      return
    }

    val existing0 = spark.read.parquet(targetPath)
    // Partition pruning: the anti-join only reads partitions the
    // updates touch; untouched partitions pass through scan→write with
    // no join at all (their filter prunes at the parquet source).
    val touchedPred =
      if (partitionColumns.isEmpty) None
      else {
        val preds = updates.select(partitionColumns.map(updates(_)): _*)
          .distinct().collect()
          .map(r => partitionColumns.zipWithIndex
            .map { case (c, i) => existing0(c) === r.get(i) }
            .reduce(_ && _))
        Some(if (preds.isEmpty) lit(false) else preds.reduce(_ || _))
      }
    val existing = touchedPred.fold(existing0)(existing0.filter)
    val untouched = touchedPred.map(p => existing0.filter(!p))

    val kept = existing.join(updates, keys, "left_anti")
    val merged = kept.unionByName(updates.select(existing0.columns.map(updates(_)): _*))

    val tmpPath = targetPath + ".__merge_tmp"
    val outDf = untouched.map(merged.unionByName(_)).getOrElse(merged)
    val w = outDf.write.mode(SaveMode.Overwrite)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(tmpPath)

    // atomic-ish swap: old dir out of the way, tmp in, old removed
    val oldPath = Paths.get(targetPath + ".__merge_old")
    deleteRecursively(oldPath)
    Files.move(target, oldPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmpPath), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(oldPath)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
