package graft

/** Guards the driver contract surface itself: the t1 smoke gate
  * (`entry` rows > 0), the queries↔oracle key correspondence, and the
  * "every oracle key has a query" invariant — a typo'd map key would
  * otherwise only surface in the driver's scoring run.
  */
class EntrySpec extends SparkSpec {

  test("entry (t1 smoke gate) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle keys without queries: $orphans")
  }

  test("rows-only queries are the documented approximate/non-SQL set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set(
      "q18_weather_pipeline",   // e2e side-effecting pipeline
      "q28_knn_ivf",            // approximate (IVF recall < 1)
      "q29_embed_neardup",      // approximate (LSH recall < 1)
      "q32_multimodal",         // stubbed decode features
      "q34_approx_distinct",    // HLL estimate
      "q45_kmv_distinct",       // KMV estimate
      "q66_incremental_staging", // side-effecting streaming pipeline
      "q69_bpe_vocab",          // iterative argmax, not SQL-replayable
      "q80_tdigest_quantile",   // t-digest estimate (bound in TDigestSpec)
      "q82_knn_ivfpq",          // approximate (SQ8 shortlist recall < 1)
      "q108_bpe_encode",        // iterative min-rank merge loop, not
                                // SQL-replayable (BpeEncodeSpec)
      "q126_compress_ratio",    // deflate ratio — no zlib in DuckDB
                                // (determinism in RetrievalFuzzySpec)
      "q131_semantic_dedup",    // iterative k-means clustering — not
                                // SQL-replayable (GraphSelectionSpec)
      "q155_image_neardup",     // binary image decode (dHash) — no SQL
                                // oracle (MultimodalSpec)
      "q180_image_dedup_corpus" // q155 ∘ components composition — same
                                // binary-decode limitation
    ), s"unexpected rows-only set: $rowsOnly")
  }
}
