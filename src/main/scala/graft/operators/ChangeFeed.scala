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
}
