package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: documents are
  * concatenated in a deterministic order and chunked into fixed
  * token-budget bins (context windows). Each doc gets the bin index
  * where it STARTS and its token offset within that bin — the
  * concatenate-then-chunk scheme standard in pretraining pipelines
  * (docs may straddle bin boundaries; the consumer slices).
  *
  * Scale design: packing is PER SHARD (`shardCol`) — a window
  * partitioned by shard and ordered by id is one shuffle with
  * parallelism = #shards. A single global packing order would be a
  * one-partition window (scale killer); per-shard packing is also what
  * real pipelines do, since shards are the unit of training-file
  * output. Pure integer window arithmetic — fully oracle-able.
  */
object SequencePack {

  /** @param df        corpus
    * @param shardCol  packing shard (e.g. source); parallelism unit
    * @param idCol     deterministic order within the shard
    * @param nTokCol   per-doc token count column
    * @param budget    tokens per bin (context length)
    * @return df + (cum_excl, bin, bin_offset): doc starts in `bin` at
    *         `bin_offset`; cum_excl is the exclusive running total.
    */
  def pack(df: DataFrame, shardCol: String, idCol: String,
           nTokCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_excl",
        sum(col(nTokCol)).over(w) - col(nTokCol))
      .withColumn("bin", (col("cum_excl") / budget).cast("bigint"))
      .withColumn("bin_offset", col("cum_excl") % budget)
  }

  /** Sliding-window chunk plan (retrieval/RAG prep): split each doc
    * into chunks of `chunkSize` tokens overlapping by `overlap`, as
    * pure generator arithmetic — one row per (doc, chunk) with the
    * token start/length to slice. The last chunk may be shorter; every
    * token is covered; docs shorter than one chunk yield exactly one.
    * Narrow codegen explode, no shuffle at all (embarrassingly
    * parallel over docs).
    */
  def slidingChunks(df: DataFrame, idCol: String, nTokCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got $overlap/$chunkSize")
    val step = chunkSize - overlap
    df.filter(col(nTokCol) > 0)
      .withColumn("tok_start", explode(sequence(lit(0),
        greatest(col(nTokCol) - overlap - 1, lit(0)), lit(step))))
      .withColumn("chunk_idx", (col("tok_start") / step).cast("int"))
      .withColumn("tok_len",
        least(lit(chunkSize), col(nTokCol) - col("tok_start")))
  }

  /** Materialized chunk TEXT on top of the chunk plan — the step a RAG
    * corpus build actually ships: each (doc, chunk) row carries the
    * overlapping token-slice substring, rebuilt as the tokens joined by
    * a single space (the canonical whitespace-normalized form retrieval
    * indexes want; byte-exact raw substrings would need char offsets,
    * which whitespace tokenization deliberately discards).
    *
    * `toksCol` is the already-tokenized array column (e.g.
    * `TextFunctions.tokens`); slicing the array is pure codegen row
    * arithmetic — still zero-shuffle, embarrassingly parallel over
    * docs. Multi-byte text is safe: slicing happens on token ARRAY
    * indices, never on byte offsets.
    */
  def slidingChunkText(df: DataFrame, idCol: String, toksCol: String,
                       chunkSize: Int, overlap: Int): DataFrame = {
    val planned = slidingChunks(
      df.withColumn("n_tok", size(col(toksCol))),
      idCol, "n_tok", chunkSize, overlap)
    // slice() is 1-based; tok_start is 0-based
    planned.withColumn("chunk_text",
      array_join(slice(col(toksCol), col("tok_start") + 1, col("tok_len")),
        " "))
  }
}
