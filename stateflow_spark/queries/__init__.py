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

# Round-10 prefix (the driver stamps the first ~50 registered queries).
# Composition rule (round-6 VERDICT "Next round" #1 + #8), ENFORCED by
# tests/test_driver_contract.py::test_prefix_is_stalest_first against the
# CORRECTNESS_r*.json stamp history:
#   (a) every query with NO driver stamp ever — the 6 round-10 additions
#       (sim_ivf_index_maintenance, sim_ivf_index_merge,
#       dedup_minhash_index_maintenance, dedup_minhash_index_merge,
#       stream_ivf_delta_classify, multimodal_audio_fingerprint_nn);
#   (b) every query whose results or plan changed this round
#       (CHANGED_THIS_ROUND below) = 12: 9 from the round-10 zero-norm
#       sweep closure + 3 r9-guarded rows whose PLAN changed in the
#       round-10 fold-reinline fix;
#   (c) the remaining slots fill with the STALEST stamps — the 5
#       r05-tier rows deferred in round 9 (sim_kmeans_iterations,
#       stream_append_late_drop, stream_dedup_watermark,
#       stream_incremental_rollup, window_topk_orders_per_customer)
#       lead, then 27 of the 38 r06-tier rows (stream_state_runs,
#       stream_static_enrich, stream_stream_join_outer,
#       text_bm25_retrieval, text_chunking, text_pii_scrub,
#       text_repetition_filter, text_token_rarity, text_vocab_coverage,
#       window_equidepth_histogram, window_pareto_frontier — same r06
#       tier — rotate to round 11;
#       tier-splitting is allowed: nothing OUTSIDE the prefix is
#       strictly staler than any fill row).
# Stamp-age invariant: the prefix is exactly never-stamped ∪ changed ∪
# oldest-tier fill — no query outside the prefix is staler than any fill
# row, so rotation cannot silently skip a family. Everything rotated out
# stays covered every run by tests/test_oracle.py (the local net).
# The round this prefix was pinned FOR: the stalest-first invariant is
# checked against CORRECTNESS history from rounds BEFORE this one (the
# history that existed at pin time) — otherwise the driver's own r10
# stamps would instantly make the pinned prefix look "stale" and fail
# the suite mid-round. The round-11 builder bumps this when re-pinning.
PREFIX_PINNED_FOR_ROUND = 10

CHANGED_THIS_ROUND = [
    # round-10 zero-norm sweep closure: the degenerate-embeddings fixture
    # gained the missing vec_id-0 query row (r9 ADVICE) and the widened
    # sweep caught these seven unguarded cosine consumers — n2 > 0
    # predicates added to query AND oracle (results identical on any
    # corpus without zero vectors)
    "sim_cosine_topk",
    "sim_hyperplane_lsh",
    "sim_quantized_topk",
    "sim_ivf_topk",
    "sim_range_search",
    "sim_mmr_diverse_topk",
    "multimodal_crossmodal_retrieval",
    # same guards, added via the five queries NEWLY swept (VERDICT r9 #3)
    "sim_rank_fusion",
    "sim_bitext_mining",
    # r10 fold-reinline fix: the norm-guard filters re-inlined the
    # interpreted decimal fold (2x per corpus row); these three r9-guarded
    # rows changed PLAN (results identical) when their norms moved behind
    # the _corpus_n2/_pin_n2 barrier
    "sim_knn_join",
    "sim_ivf_knn_join",
    "sim_hard_negatives",
]
_R10_PREFIX = [
    # (a) never driver-stamped (round-10 additions)
    "sim_ivf_index_maintenance",
    "sim_ivf_index_merge",
    "dedup_minhash_index_maintenance",
    "dedup_minhash_index_merge",
    "stream_ivf_delta_classify",
    "multimodal_audio_fingerprint_nn",
    # (b) changed this round
    *CHANGED_THIS_ROUND,
    # (c) stalest-stamp fill: the 5 r05 rows deferred in round 9...
    "sim_kmeans_iterations",
    "stream_append_late_drop",
    "stream_dedup_watermark",
    "stream_incremental_rollup",
    "window_topk_orders_per_customer",
    # ...then 27 of the 38 r06 rows (eleven rotate to round 11, named
    # in the composition note above)
    "agg_approx_sketches",
    "agg_bloom_filter_membership",
    "agg_countmin_heavy_hitters",
    "agg_group_ols_trend",
    "agg_series_correlation",
    "agg_sketch_rollup",
    "curation_adaptive_threshold",
    "curation_full_pipeline",
    "curation_reservoir_sample",
    "curation_temperature_mixture",
    "dedup_edit_distance",
    "dedup_minhash_lsh",
    "dedup_winnowing_pairs",
    "entity_stateful_replay",
    "entity_ycsb_replay",
    "events_anomaly_hours",
    "events_ewma_value",
    "events_resample_ffill",
    "events_retention_cohorts",
    "events_rolling_features",
    "events_state_runs",
    "join_range_view_clicks",
    "multimodal_binary_metadata",
    "sim_power_iteration",
    "source_corrupt_json",
    "source_schema_evolution",
    "stream_countmin_sketch",
]
assert len(_R10_PREFIX) == 50, len(_R10_PREFIX)
assert len(set(_R10_PREFIX)) == 50
assert set(_R10_PREFIX) <= set(REGISTRY), set(_R10_PREFIX) - set(REGISTRY)
_order = _R10_PREFIX + [n for n in REGISTRY if n not in set(_R10_PREFIX)]
assert set(_order) == set(REGISTRY) and len(_order) == len(REGISTRY)
_by_name = dict(REGISTRY)
REGISTRY.clear()
REGISTRY.update({n: _by_name[n] for n in _order})
