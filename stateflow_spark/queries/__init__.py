"""Query registry: every implemented operator from SURVEY.md §2 registers a
named query (Spark DataFrame builder) and a DuckDB oracle string (the driver
FAILS oracle-less rows, so every registration carries one). The driver runs
both sides at sf0.01 and hash-compares.

Import side effects populate ``REGISTRY``.
"""

from __future__ import annotations

from stateflow_spark.queries.common import REGISTRY, QueryDef, register  # noqa: F401

# Each module registers its queries on import; the driver-checked 50-query
# prefix is pinned EXPLICITLY below (imports only group families). Local
# tests/test_oracle.py checks ALL oracled queries every run regardless —
# that is the regression net for rotated-out families (round-2 ADVICE).
from stateflow_spark.queries import similarity  # noqa: F401, E402
from stateflow_spark.queries import streaming_late  # noqa: F401, E402
from stateflow_spark.queries import entity_stream  # noqa: F401, E402
from stateflow_spark.queries import curation  # noqa: F401, E402
from stateflow_spark.queries import tpch2  # noqa: F401, E402  (pulls tpch)
from stateflow_spark.queries import windows  # noqa: F401, E402
from stateflow_spark.queries import setops  # noqa: F401, E402
from stateflow_spark.queries import aggregates  # noqa: F401, E402
from stateflow_spark.queries import dedup  # noqa: F401, E402
from stateflow_spark.queries import streaming_events  # noqa: F401, E402  (pulls events)
from stateflow_spark.queries import text  # noqa: F401, E402
from stateflow_spark.queries import udtfs  # noqa: F401, E402
from stateflow_spark.queries import multimodal  # noqa: F401, E402
from stateflow_spark.queries import joins  # noqa: F401, E402
from stateflow_spark.queries import entity_ops  # noqa: F401, E402
from stateflow_spark.queries import entity_flow  # noqa: F401, E402
from stateflow_spark.queries import sources_robustness  # noqa: F401, E402

# Round-6 prefix (the driver stamps the first ~50 registered queries):
#   1-6   the six queries that have NEVER had a driver row (round-5
#         VERDICT "Next round" #2): text_chunking, the four round-5
#         events analytics rows, dedup_pagerank
#   7-9   changed THIS round: agg_approx_sketches (r05's only red — now
#         carries a deterministic bound-check oracle), entity_stream_replay
#         (bursts rebuilt cluster-side), curation_full_pipeline (benchmark
#         eval docs excluded from survivors)
#   10-38 NEW this round (registered after the initial pin; swapped in so
#         no query debuts unstamped): agg_sketch_rollup, sim_range_search,
#         join_range_view_clicks, dedup_cluster_keeper, text_token_rarity,
#         text_repetition_filter, dedup_semantic,
#         curation_adaptive_threshold, curation_source_overlap,
#         text_vocab_coverage, sim_mmr_diverse_topk, text_bm25_retrieval,
#         curation_temperature_mixture, agg_countmin_heavy_hitters,
#         agg_bloom_filter_membership, stream_countmin_sketch,
#         events_ewma_value, dedup_containment, sim_power_iteration,
#         curation_reservoir_sample, sim_rank_fusion, events_state_runs,
#         window_equidepth_histogram, dedup_triangle_stats,
#         stream_state_runs, window_pareto_frontier, dedup_edit_distance,
#         join_market_basket_pairs, agg_group_ols_trend,
#         dedup_winnowing_pairs (pinned in the dedup tail slot, swapped
#         in over dedup_embedding_cosine — r04-green, family keeps
#         minhash in; embedding_cosine joins the round-7 rotation front),
#         text_pii_scrub (pinned in the text slot, swapped in over
#         text_quality_score — r04-green, same rotation treatment),
#         agg_series_correlation (pinned in the entity slot, swapped in
#         over entity_invoke_fold — r04-green, same rotation treatment)
#   39-50 a mix of (a) r04 re-stamps the round-5 VERDICT called out —
#         udtf, multimodal, entity stateful/ycsb, dedup minhash — and
#         (b) the LATE round-6 batch, each swapped 1:1 over an r04 row
#         whose family keeps other stamped representatives (the evicted
#         row joins the round-7 rotation front; per-slot comments below):
#         stream_static_enrich, source_corrupt_json,
#         stream_stream_join_outer, text_chunking's siblings
#         source_schema_evolution + text_pii_scrub,
#         agg_series_correlation, dedup_winnowing_pairs
# Rotated out (all r05-green, CORRECTNESS_r05.json): similarity (8),
# streaming_late (3), the dedup jaccard head + connected components,
# the rest of curation, all 22 TPC-H, window_topk, setops_union_distinct,
# agg_salted_two_phase. The windows/setops/aggregates demoted rows,
# events_type_pivot and text_length_histogram, plus the five r04 rows
# evicted for this round's second new-query batch (events_json_payload,
# events_topk_users, scalar_function_zoo, join_full_outer_part_sales,
# events_dedup_first, text_fingerprint, text_lang_id,
# events_session_windows, events_hourly_tumbling, events_sliding_window
# — their streaming twins stay in — entity_get_state (family keeps 7
# other rows in), multimodal_frame_sample (family keeps 2 rows in) and
# entity_find_class (family keeps 6 rows in), dedup_simhash_pairs
# (dedup_simhash stays in), text_rolling_fingerprint (text keeps 5
# rows in) and entity_update_state (entity keeps 5 rows in), plus the
# eight evicted for the third new-query batch — events_funnel (the events
# family keeps retention/resample/rolling/anomaly/ewma/state_runs in),
# multimodal_decode_features
# (multimodal_binary_metadata stays in), entity_flow_golden and
# entity_init_class (entity keeps invoke/stateful/ycsb in), dedup_simhash
# (minhash/embedding tail stays in), stream_sliding_window (streaming
# keeps hourly/session/join plus the new stateful runs row),
# text_bpe_token_count (text keeps token_stats/quality/chunking in),
# join_asof_click_view (joins keep range + the new basket row in) — stay
# r04-stamped and are the round-7 rotation front, JOINED by the four
# deliberate exceptions to "nothing debuts unstamped":
# agg_ab_test_zscore, agg_exact_percentiles, agg_table_checksum and
# dedup_incremental_index, curation_split_leakage,
# curation_shuffle_shards, text_source_drift and
# curation_length_buckets and sim_pq_adc_topk (registered after the
# last 1:1 swap; the remaining r04 prefix rows are each their family's
# ONLY stamp — udtf, multimodal, entity stateful/ycsb, dedup minhash —
# and evicting any of them would leave a whole family 3 rounds stale, a
# worse trade), plus the post-freeze batch events_markov_transitions,
# text_ngram_lm_score, sim_ivfpq_topk, join_band_price_neighbors,
# and the final-session batch: sim_hard_negatives,
# text_quality_classifier, scd2_dimension_versions, profile_table_stats,
# dedup_label_propagation, text_bpe_train_merges, text_bpe_compression,
# text_bpe_apply, text_keyword_extraction, profile_referential_integrity,
# curation_assign_ids, events_attribution, stream_scd2_merge,
# text_memorization_audit, sim_bitext_mining, agg_winsorized_mean,
# profile_table_diff, join_point_in_time_scd2,
# entity_state_relational_join, join_association_rules,
# profile_join_skew, curation_quantile_normalize,
# events_gap_detection, agg_srm_audit. All
# post-freeze queries are local-oracle green at sf0.001 and sf0.01
# (sf1/sf10 where noted in SCALING.md) and MUST lead the r7 prefix.
_R06_PREFIX = [
    # never driver-stamped
    "text_chunking",
    "events_retention_cohorts",
    "events_resample_ffill",
    "events_rolling_features",
    "events_anomaly_hours",
    "dedup_pagerank",
    # changed this round
    "agg_approx_sketches",
    "entity_stream_replay",
    "curation_full_pipeline",
    # new this round, registered after the initial prefix pin
    "agg_sketch_rollup",
    "sim_range_search",
    "join_range_view_clicks",
    "dedup_cluster_keeper",
    "text_token_rarity",
    "text_repetition_filter",
    "dedup_semantic",
    "curation_adaptive_threshold",
    "curation_source_overlap",
    "text_vocab_coverage",
    "sim_mmr_diverse_topk",
    "text_bm25_retrieval",
    "curation_temperature_mixture",
    "agg_countmin_heavy_hitters",
    "agg_bloom_filter_membership",
    "stream_countmin_sketch",
    "events_ewma_value",
    "dedup_containment",
    "sim_power_iteration",
    "curation_reservoir_sample",
    "sim_rank_fusion",
    "events_state_runs",
    "window_equidepth_histogram",
    "dedup_triangle_stats",
    "stream_state_runs",
    "window_pareto_frontier",
    "dedup_edit_distance",
    "join_market_basket_pairs",
    "agg_group_ols_trend",
    # streaming family (r04 re-stamps + round-6 additions)
    # new this round (late batch): stream-static broadcast enrichment —
    # swapped in over stream_hourly_tumbling (r04-green; its oracle IS
    # the batch twin's, so the aggregate arithmetic stays hash-gated via
    # events_hourly's r04 stamp and the local net; joins the r7 front)
    "stream_static_enrich",
    # new this round (late batch): corrupt-JSON quarantine — swapped in
    # over stream_session_windows (r04-green; streaming family keeps
    # static_enrich/outer-join/countmin/state_runs in; joins the r7 front)
    "source_corrupt_json",
    # new this round (late batch): LEFT OUTER stream-stream join — the
    # state-eviction row; swapped in over the r04-green inner join
    # (stream_stream_join, whose matched output is a subset of this
    # row's; it joins the round-7 rotation front)
    "stream_stream_join_outer",
    # text (r04; chunking already above)
    # new this round (late batch): schema-evolution merged read — swapped
    # in over text_token_stats (r04-green; text family keeps chunking +
    # pii_scrub in; joins the r7 front)
    "source_schema_evolution",
    # new this round (late batch): PII scrub — swapped in over
    # text_quality_score (r04-green; family keeps token_stats/chunking
    # in; quality_score joins the round-7 rotation front)
    "text_pii_scrub",
    # udtf + multimodal (r04)
    "udtf_bigram_top20",
    "multimodal_binary_metadata",
    # entity family (r04)
    # new this round (late batch): pairwise series correlation — swapped
    # in over entity_invoke_fold (r04-green; family keeps stateful/ycsb
    # plus entity_stream_replay above; invoke_fold joins the r7 front)
    "agg_series_correlation",
    "entity_stateful_replay",
    "entity_ycsb_replay",
    # dedup tail (r04)
    "dedup_minhash_lsh",
    # new this round (late batch): winnowing substring detector — swapped
    # in over dedup_embedding_cosine (r04-green; family keeps minhash in;
    # embedding_cosine joins the round-7 rotation front)
    "dedup_winnowing_pairs",
]
assert len(_R06_PREFIX) == 50, len(_R06_PREFIX)
assert set(_R06_PREFIX) <= set(REGISTRY), set(_R06_PREFIX) - set(REGISTRY)
_order = _R06_PREFIX + [n for n in REGISTRY if n not in set(_R06_PREFIX)]
assert set(_order) == set(REGISTRY) and len(_order) == len(REGISTRY)
_by_name = dict(REGISTRY)
REGISTRY.clear()
REGISTRY.update({n: _by_name[n] for n in _order})
