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
      "q18_weather_pipeline",   // e2e pipeline over a float-valued fact
                                // — graded EXACTLY via its derived
                                // q228_pipeline_oracle (integer-exact
                                // closed-form replay of the same run)
      "q28_knn_ivf",            // approximate (IVF recall < 1); the
                                // probe path is hash-graded via
                                // planted q342 (identical-vector
                                // groups: the query's top probed list
                                // contains every true neighbor by
                                // construction), recall bounded by
                                // q87's gate
      "q29_embed_neardup",      // approximate (LSH recall < 1); the
                                // banding+gate path is hash-graded
                                // via planted q341 (closed-form
                                // axis-aligned twin), recall bounded
                                // by q89's gate
      "q32_multimodal",         // stubbed decode features
      "q34_approx_distinct",    // HLL estimate; the sketch path is
                                // hash-graded via planted q340
                                // (coupon-regime exactness plateau)
      "q45_kmv_distinct",       // KMV estimate (exactness plateau
                                // hash-graded via q324)
      "q69_bpe_vocab",          // iterative argmax, not SQL-replayable
      "q80_tdigest_quantile",   // t-digest estimate (bound in
                                // TDigestSpec); the full aggregate/
                                // merge/quantile path is hash-graded
                                // via planted q347 (singleton-regime
                                // exactness: n < 2δ ⇒ no centroid
                                // ever merges)
      "q82_knn_ivfpq",          // approximate (SQ8 shortlist recall
                                // < 1); the full quantize + rerank
                                // pipeline is hash-graded via planted
                                // q343 (full-budget exact rerank =
                                // closed-form output), recall bounded
                                // by q88's gate
      "q108_bpe_encode",        // iterative min-rank merge loop, not
                                // SQL-replayable (BpeEncodeSpec)
      "q126_compress_ratio",    // deflate ratio — no zlib in DuckDB
                                // (determinism in RetrievalFuzzySpec);
                                // the deflate expression is
                                // hash-graded via q348's pinned
                                // fixture sizes
      "q131_semantic_dedup",    // iterative k-means on REAL vectors —
                                // not SQL-replayable (GraphSelection-
                                // Spec); the iteration itself is
                                // hash-graded via planted q277
      "q155_image_neardup",     // binary image decode (dHash) — no SQL
                                // oracle (MultimodalSpec)
      "q180_image_dedup_corpus", // q155 ∘ components composition — same
                                // binary-decode limitation
      "q226_kcenter_coreset"    // iterative farthest-point argmax on
                                // REAL vectors, not SQL-replayable
                                // (CoresetSpec pins it against a
                                // driver-side reference); the
                                // iteration is hash-graded via planted
                                // q274/q275, the cover radius via the
                                // q276 bound gate
    ), s"unexpected rows-only set: $rowsOnly")
  }

  test("round(double) in an oracle output column requires a pin") {
    // Any `round(` in graded output is a latent cross-engine hash
    // fail (r5: q115/q118/q121/q122/q140 all failed exactly this way)
    // UNLESS the double expression tree is fully pinned: exact-integer
    // inputs, fixed association order, identical op sequence both
    // engines — in which case the query is listed here WITH the pin
    // rationale. New queries must either stay in exact integer space
    // (div basis points / scaled longs / counts) or document the pin.
    // The grandfathered set: every round(-using oracle below was
    // verified EXACT (full-precision value compare, zero tolerance)
    // against DuckDB at sf0.01 on 2026-08-13 via tools/check_oracle.py
    // — their double trees are de-facto pinned. Do NOT add to this
    // list without running that strict check on the new query.
    val pinned: Set[String] = Set(
      "q106_rolling_7d", "q107_grouping_sets", "q110_topk_group",
      "q112_containment", "q113_collocations", "q117_band_histogram",
      "q118_matryoshka_recall", "q121_mad_outliers", "q122_psi_drift",
      "q124_dsir_score", "q130_pareto_frontier", "q132_hard_negatives",
      "q135_json_quarantine", "q136_group_trend", "q137_gap_fill",
      "q138_salted_join", "q139_char_entropy", "q143_bootstrap",
      "q144_ks_test", "q146_join_size_estimate",
      "q149_embedding_dim_stats", "q150_skew_report", "q153_kneser_ney",
      "q157_cuped", "q158_neyman_allocation", "q159_calibration_curve",
      "q160_benford", "q164_trending_terms", "q165_vocab_overlap",
      "q169_packing_efficiency", "q170_mutual_information",
      "q171_autocorrelation", "q173_negative_sampling",
      "q176_interarrival", "q177_churn_labels", "q179_effective_tokens",
      "q184_rank_fusion", "q185_session_conversion", "q187_gini",
      "q188_tail_index", "q189_padding_waste", "q190_dup_rate_by_source",
      "q191_chi2_independence", "q192_sample_size", "q20_text_quality",
      "q23_minhash_neardup", "q26_fingerprint", "q27_knn_brute",
      "q38_salted_agg", "q39_percentile", "q41_cube",
      "q42_running_window", "q47_tfidf", "q48_outer_join", "q49_pivot",
      "q51_correlated_subquery", "q55_stats", "q56_standardize",
      "q58_stream_static_join", "q60_bucketed_join", "q63_bloom_join",
      "q73_repetition", "q75_perplexity", "q76_quantize_int8",
      "q77_corpus_pipeline", "q89_lshcos_recall", "q95_span_dedup",
      "q123_bm25", "q133_random_projection", "q134_markov_transitions",
      "q140_drift_report", "q25_ngram_jaccard", "q81_ngram_prefix",
      "q97_incremental_neardup",
      "q229_incremental_ingest", // same pinned tree as q97 (integer
                             // common/n_a/n_b quotient, single round);
                             // strict-verified at sf0.001 + sf0.01 on
                             // 2026-08-14 via tools/check_oracle.py
      "q230_stream_neardup", // identical tree/ground truth to q229
                             // (streaming drive of the same loop);
                             // strict-verified at sf0.001 + sf0.01 on
                             // 2026-08-14
      "q236_ivm_aggregate",  // integer-cents pin (round(value*100) →
                             // BIGINT before any arithmetic, the
                             // q205/q216 idiom); strict-verified at
                             // sf0.001 + sf0.01 on 2026-08-14
      "q237_stream_ivm",     // identical tree/ground truth to q236
                             // (streaming drive of the same loop);
                             // strict-verified at sf0.001 + sf0.01 on
                             // 2026-08-14
      "q273_ivm_minmax",     // integer-cents pin (round(value*100) →
                             // BIGINT before any min/max); strict-
                             // verified at sf0.001 + sf0.01 + sf0.1 on
                             // 2026-08-14
      "q247_unpivot",        // integer-cents pin (round(x*100) →
                             // BIGINT before the melt); strict-
                             // verified at sf0.001 + sf0.01 2026-08-14
      "q246_hierarchy_rollup", // integer-cents pin (round(value*100)
                             // → BIGINT); strict-verified at sf0.001 +
                             // sf0.01 2026-08-14
      "q244_ivm_cube",       // integer-cents pin (round(value*100) →
                             // BIGINT); strict-verified at sf0.001 +
                             // sf0.01 2026-08-14
      "q243_bitemporal",     // integer-cents pin (round(value*100) →
                             // BIGINT before any arithmetic); strict-
                             // verified at sf0.001 + sf0.01 2026-08-14
      "q282_partitioned_travel", // q243's math verbatim on the
                             // partitioned store — same integer-cents
                             // pin; strict-verified at sf0.001 +
                             // sf0.01 + sf0.1 2026-08-14
      "q283_corpus_diff",    // integer-cents pin; diff classes are
                             // integer equality on (count, cents
                             // sum); strict-verified at sf0.001 +
                             // sf0.01 + sf0.1 2026-08-14
      "q284_cluster_sample", // integer-cents pin + md5-replayable day
                             // selection, HT expansion is integer ×2;
                             // strict-verified at sf0.001 + sf0.01 +
                             // sf0.1 2026-08-14
      "q241_dp_counts",      // ln of an exact-rational double (the
                             // q113 ln precedent), integer md5-derived
                             // numerators, literal 5.0 scale; strict-
                             // verified at sf0.001 + sf0.01 2026-08-14
      "q238_seasonal_decompose", // integer numerators (window count
                             // sums, detrended ×7, dow sums) with ONE
                             // rounded division per output column,
                             // identically placed both engines;
                             // strict-verified at sf0.001 + sf0.01 on
                             // 2026-08-14
      "q239_quantile_normalize", // integer-cents pin + pure integer
                             // order statistics (round(value*100) →
                             // BIGINT, ranks, ceil-index div);
                             // strict-verified at sf0.001 + sf0.01 on
                             // 2026-08-14
      "q260_woe_binning",    // ln of an exact rational (integer WoE
                             // cell counts), ONE rounded emit — the
                             // q241/q113 ln pin; strict-verified at
                             // sf0.001 + sf0.01 2026-08-14
      "q263_decayed_topk",   // q248's integer-cents staircase tree +
                             // a rank window; strict-verified at
                             // sf0.001 + sf0.01 2026-08-14
      "q261_trimmed_stats",  // integer-cents pin (round(value*100) →
                             // BIGINT before ranking); strict-verified
                             // at sf0.001 + sf0.01 2026-08-14
      "q259_incremental_decay", // q248's integer tree at a grid-
                             // aligned instant; strict-verified at
                             // sf0.001 + sf0.01 2026-08-14
      "q258_mann_whitney",   // integer-cents pin (round(value*100) →
                             // BIGINT before ranking); strict-verified
                             // at sf0.001 + sf0.01 2026-08-14
      "q256_golden_record",  // integer-cents pin (round(price*100) →
                             // BIGINT before min); strict-verified at
                             // sf0.001 + sf0.01 2026-08-14
      "q248_decayed_counters", // integer-cents pin (round(value*100)
                             // → BIGINT before any arithmetic);
                             // weights are integer shifts — strict-
                             // verified at sf0.001 + sf0.01 2026-08-14
      "q233_t_closeness",    // exact-integer EMD numerator over the
                             // common denominator n_g·N·(m−1); the
                             // single rounded division is the ONLY
                             // float op and the gate is a pure
                             // integer compare; strict-verified at
                             // sf0.001 + sf0.01 on 2026-08-14
      "q269_xml_roundtrip",  // q193's integer-cents pin applied to the
                             // native XML source; strict-verified at
                             // sf0.001 + sf0.01 2026-08-14
      // strict-verified 2026-08-13 (round 6 additions)
      "q193_orc_roundtrip",
      "q205_record_linkage", // integer-cents pin; see oracle comment
      "q220_variant_shred",  // integer-cents pin (round(x*100)→BIGINT
                             // before any arithmetic); strict-verified
                             // at sf0.01 AND sf0.1 on 2026-08-13
      "q222_payload_key_census", // same integer-cents pin inside the
                             // payload literal; strict-verified at
                             // sf0.01 AND sf0.1 on 2026-08-13
      "q212_label_centroids", // round(f·1000) provably tie-free
                              // (odd/2000 non-dyadic); see query doc
      "q216_cdc_merge", // integer-cents pin; see oracle comment
      "q286_stream_ivm_minmax", // q273's integer-cents pin under the
                             // streaming drive; strict-verified at
                             // sf0.001 + sf0.01 2026-08-14
      "q287_file_stats_prune", // integer-cents pin; file decision is
                             // an integer zone-overlap count
      "q288_compact_table",  // same integer-cents pin as q287;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q289_sorted_compact", // same integer-cents pin; audit columns
                             // are integer file counts / bits;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q291_pos_delete_vacuum", // same integer-cents pin (round(value
                             // *100) → BIGINT before any arithmetic);
                             // audit columns are integer entry/file
                             // counts; strict-verified sf0.001/0.01/
                             // 0.1 2026-08-15
      "q292_bloom_sidecar",  // same integer-cents pin; audit columns
                             // are integer file counts / flag bits;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q295_partition_bounds", // same integer-cents pin; partition
                             // decision is an integer zone-overlap
                             // count; strict-verified sf0.001/0.01/
                             // 0.1 2026-08-15
      "q296_orphan_cleanup", // same integer-cents pin; audit columns
                             // are integer artifact counts; strict-
                             // verified sf0.001/0.01/0.1 2026-08-15
      "q307_check_constraints", // same integer-cents pin; audit
                             // columns are integer violation/version
                             // counts; strict-verified sf0.001/0.01/
                             // 0.1 2026-08-15
      "q305_partition_overwrite", // same integer-cents pin; audit
                             // columns are integer pointer/partition
                             // counts; strict-verified sf0.001/0.01/
                             // 0.1 2026-08-15
      "q306_overwrite_where", // same integer-cents pin; audit columns
                             // are integer entry/version counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q304_named_refs",     // same integer-cents pin (round(price
                             // *100) → BIGINT before ×2/×3/×5); audit
                             // columns are integer ref/version counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q302_partition_sorted_cluster", // same integer-cents pin; audit
                             // columns are improvement/soundness bits
                             // + version; month granularity (r15);
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q301_table_lifecycle", // same integer-cents pin; audit columns
                             // are integer partition/file/zone counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q319_r13_capstone",   // integer-cents pin (round(value*100) →
                             // BIGINT before +5); audit columns are
                             // integer partition/type/version counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q320_sql_catalog",    // integer-cents pin (round(value*100) →
                             // BIGINT before *2); audit columns are
                             // integer counts/versions;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q321_stats_broadcast", // integer-cents pin (round(value*100)
                             // → BIGINT before integer products/sums);
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q317_partitioned_pos_deletes", // integer-cents pin
                             // (round(value*100) → BIGINT before +77);
                             // audit columns are integer partition/
                             // version counts; strict-verified
                             // sf0.001/0.01/0.1 2026-08-15
      "q315_dsv2_write_surface", // integer-cents pin (round(value
                             // *100) → BIGINT before +9/×2); audit
                             // columns are integer version/partition
                             // counts; strict-verified sf0.001/0.01/
                             // 0.1 2026-08-15
      "q312_partition_spec_evolution", // integer-cents pin
                             // (round(value*100) → BIGINT before +5);
                             // audit columns are integer partition/
                             // row counts + flag; strict-verified
                             // sf0.001/0.01/0.1 2026-08-15
      "q313_stream_from_table", // integer-cents pin (round(value*100)
                             // → BIGINT before any arithmetic); audit
                             // columns are integer op/batch counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q310_change_feed_ivm", // integer-cents pin (round(value*100) →
                             // BIGINT before any arithmetic); audit
                             // columns are integer op/version counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q309_dsv2_read_surface", // same integer-cents pin as q287;
                             // audit columns are integer file counts
                             // / flag bits; strict-verified sf0.001/
                             // 0.01/0.1 2026-08-15
      "q299_schema_evolution", // integer-cents pin (round(price*100)
                             // → BIGINT before any arithmetic); audit
                             // columns are integer schema/row counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-15
      "q325_sql_update",     // integer-cents pin (round(value*100) →
                             // BIGINT before *2); audit columns are
                             // integer pointer/version counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q326_sql_merge",      // integer-cents pin (round(value*100) →
                             // BIGINT before +7); audit column is an
                             // integer snapshot count;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q327_sql_delete_subquery", // integer-cents pin (round(value
                             // *100) → BIGINT before comparisons);
                             // audit columns are integer version/
                             // entry counts; strict-verified
                             // sf0.001/0.01/0.1 2026-08-16
      "q335_branch_wap",     // integer-cents pin (round(value*100) →
                             // BIGINT before sums); audit columns are
                             // integer pin digits; strict-verified
                             // sf0.001/0.01/0.1 2026-08-16
      "q334_sql_views",      // integer-cents pin (round(value*100) →
                             // BIGINT before sums); audit columns are
                             // integer pin digits; strict-verified
                             // sf0.001/0.01/0.1 2026-08-16
      "q332_mor_update",     // integer-cents pin (round(value*100) →
                             // BIGINT before *3/sums); audit columns
                             // are integer pin digits;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q337_mor_merge_part", // integer-cents pin (round(value*100) →
                             // BIGINT before +/×2/sums); audit
                             // columns are integer pin digits;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q345_mor_move_part",  // integer-cents pin (round(value*100) →
                             // BIGINT before +1/+/×3/sums); audit
                             // columns are integer pin digits;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q338_ctas_rtas",      // integer-cents pin (round(value*100) →
                             // BIGINT before sums); audit columns are
                             // integer pin digits / counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q339_analyze_stats",  // integer-cents pin (round(value*100) →
                             // BIGINT before exact count-distinct /
                             // min / max; bounds rendered as decimal
                             // strings both engines);
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q346_stats_fold",     // integer-cents pin (round(value*100) →
                             // BIGINT % 83 before coupon-regime NDV
                             // folds / min / max); strict-verified
                             // sf0.001/0.01/0.1 2026-08-16
      "q347_tdigest_exact_twin", // singleton-regime pin: integer
                             // values + binary-exact q make the
                             // interpolation exact in doubles before
                             // the round; strict-verified
                             // sf0.001/0.01/0.1 2026-08-16
      "q331_stream_sink",    // integer-cents pin (round(value*100) →
                             // BIGINT before sums); audit columns are
                             // integer version digits + a flag;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q330_sql_ddl_evolution", // integer-cents pin (round(value
                             // *100) → BIGINT before *2); audit
                             // columns are integer counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q329_sql_procedures", // integer-cents pin (round(value*100) →
                             // BIGINT before comparisons); audit
                             // columns are integer flags/counts;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
      "q328_sql_dynamic_overwrite") // integer-cents pin (round(value
                             // *100) → BIGINT before *3); audit
                             // column is an integer pointer count;
                             // strict-verified sf0.001/0.01/0.1
                             // 2026-08-16
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql)
        if sql.toLowerCase.contains("round(") && !pinned(name) => name
    }
    assert(offenders.isEmpty,
      s"oracle queries using round(double) without a documented pin " +
        s"(add the pin comment at the query AND list it here, or emit " +
        s"exact integers instead): ${offenders.toSeq.sorted}")
  }
}
