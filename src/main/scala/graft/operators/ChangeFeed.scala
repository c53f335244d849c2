package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC apply-changes: collapse an insert/update/delete change feed to
  * the current snapshot — the batch side of a Delta/Iceberg MERGE,
  * done as a plain relational op so any store can consume the result.
  *
  * Physical shape: ONE aggregation — `max(struct(seq..., op,
  * payload...))` per key — rather than a row_number window. Both need
  * a shuffle on the key, but the aggregate form applies map-side
  * partial reduction (each input partition keeps one candidate row
  * per key before the exchange), while a window ships EVERY feed row
  * through the shuffle and sorts whole partitions. On a 100 TB feed
  * where keys repeat heavily — the norm for CDC — that is the
  * difference between shuffling |keys| rows and |feed| rows.
  *
  * Determinism: the caller supplies a (seqCol, tieCol) pair whose
  * struct order is a TOTAL order on each key's feed rows (e.g.
  * timestamp + unique event id); last-write-wins follows that order
  * exactly. Keys whose final operation is a delete disappear from the
  * snapshot.
  */
object ChangeFeed {

  /** `feed` must contain `keyCol`, `seqCol`, `tieCol`, `opCol`
    * (values 'I'/'U'/'D') and `payloadCols`. Returns one row per
    * surviving key: (key, seq, tie, payload...).
    */
  def snapshot(feed: DataFrame, keyCol: String, seqCol: String,
               tieCol: String, opCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val ordered: Column = struct(
      (Seq(seqCol, tieCol, opCol) ++ payloadCols).map(col): _*)
    feed.groupBy(col(keyCol))
      .agg(max(ordered).as("last"))
      .filter(col(s"last.$opCol") =!= "D")
      .select(col(keyCol) +:
        col(s"last.$seqCol").as(seqCol) +:
        col(s"last.$tieCol").as(tieCol) +:
        payloadCols.map(c => col(s"last.$c").as(c)): _*)
  }

  /** MERGE the collapsed feed INTO a base table: the full Delta-style
    * `WHEN MATCHED UPDATE / WHEN MATCHED AND op='D' DELETE / WHEN NOT
    * MATCHED INSERT`, as two relational steps — (1) [[snapshot]]
    * collapses the feed to one surviving row per key (map-side
    * combined, |keys| rows cross the wire), (2) base rows whose key
    * appears ANYWHERE in the feed leave via one left-anti join
    * (final-delete keys vanish, updated keys are replaced), survivors
    * union with the collapsed upserts. Both steps shuffle on the
    * merge key only; payload width rides the scan, not the shuffle
    * comparator. Returns `(key, payload...)` — the new table state
    * for a [[graft.sinks.VersionedTable]] commit.
    */
  def applyTo(target: DataFrame, feed: DataFrame, keyCol: String,
              seqCol: String, tieCol: String, opCol: String,
              payloadCols: Seq[String]): DataFrame = {
    val outCols = (keyCol +: payloadCols).map(col)
    val changedKeys = feed.select(col(keyCol)).distinct()
    val upserts = snapshot(feed, keyCol, seqCol, tieCol, opCol,
      payloadCols).select(outCols: _*)
    target.select(outCols: _*)
      .join(changedKeys, Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }
}
