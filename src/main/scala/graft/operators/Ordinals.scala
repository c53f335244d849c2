package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dense global ordinals (0..n−1 in key order) WITHOUT a single-
  * partition global sort — the scalable version of `zipWithIndex` for
  * assigning stable corpus positions (sequence packing order, shard
  * manifests, deterministic shuffles).
  *
  * A naive `row_number() OVER (ORDER BY key)` collapses the corpus
  * into ONE task. Instead: range-repartition by the key (parallel,
  * sampled boundaries), sort within partitions, and let
  * `RDD.zipWithIndex` do its two passes (per-partition counts, then
  * offset + local index) over the SAME materialized shuffle.
  *
  * CORRECTNESS SUBTLETY (round 8, found by q239 at sf0.01): the two
  * passes MUST observe one physical partitioning. Running them as two
  * separate DataFrame actions re-executes `repartitionByRange`, whose
  * boundary SAMPLER is seeded per-RDD-instance — the second run can
  * draw different boundaries, so counts collected from run 1 mis-
  * offset run 2's partitions (duplicate + missing ordinals; the old
  * implementation did exactly this, and survived q128 only because a
  * 500-row input was fully sampled, making boundaries accidentally
  * stable). Dropping to ONE RDD instance fixes it structurally:
  * both of `zipWithIndex`'s jobs run over the same RDD lineage, so
  * the range shuffle's map outputs are computed once and REUSED, and
  * the boundaries cannot differ. The RDD bridge costs codegen at the
  * boundary — the price of a correct distributed zipWithIndex, and
  * the row volume here is the corpus, paid once.
  *
  * Output is deterministic for a unique key regardless of sampled
  * boundaries: range partitioning preserves global key order across
  * partition ids, so offset + local index IS the global rank.
  */
object Ordinals {

  def globalOrdinals(df: DataFrame, keyCol: String,
                     numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol)
    val schema = ranged.schema.add("ordinal", LongType, nullable = false)
    val indexed = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
