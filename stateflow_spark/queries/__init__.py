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

# Round-9 prefix (the driver stamps the first ~50 registered queries).
# Composition rule (round-6 VERDICT "Next round" #1 + #8), ENFORCED by
# tests/test_driver_contract.py::test_prefix_is_stalest_first against the
# CORRECTNESS_r*.json stamp history:
#   (a) every query with NO driver stamp ever — the 4 round-9 additions
#       (2 audio fingerprint rows, curation_conversation_assembly,
#       text_fim_split);
#   (b) every query whose results or plan changed this round
#       (CHANGED_THIS_ROUND below) = 7 (sim_knn_join and
#       sim_ivf_knn_join are also the r05 fill tier, listed once;
#       sim_hard_negatives is r07-stamped);
#   (c) the remaining slots fill with the STALEST stamps — the 3
#       r04-tier rows deferred in round 8 (text_token_stats,
#       text_rolling_fingerprint, text_quality_score) lead, then 38 of
#       the 45 r05-tier rows (window_topk_orders_per_customer,
#       stream_incremental_rollup, stream_dedup_watermark,
#       stream_append_late_drop, sim_quantized_topk, sim_ivf_topk,
#       sim_kmeans_iterations — same r05 tier, rotate next round —
#       tier-splitting is allowed: nothing OUTSIDE the prefix is
#       strictly staler than any fill row).
# Stamp-age invariant: the prefix is exactly never-stamped ∪ changed ∪
# oldest-tier fill — no query outside the prefix is staler than any fill
# row, so rotation cannot silently skip a family. Everything rotated out
# stays covered every run by tests/test_oracle.py (the local net).
# The round this prefix was pinned FOR: the stalest-first invariant is
# checked against CORRECTNESS history from rounds BEFORE this one (the
# history that existed at pin time) — otherwise the driver's own r9
# stamps would instantly make the pinned prefix look "stale" and fail
# the suite mid-round. The round-10 builder bumps this when re-pinning.
PREFIX_PINNED_FOR_ROUND = 9

CHANGED_THIS_ROUND = [
    # three-level IVF-tree quantizer (round-8 VERDICT #4): the assignment
    # rule changed, so cluster ids and kept flags CHANGE (oracle replays
    # the new rule)
    "dedup_semantic_scaled",
    # Arrow-optimized UDTF (plan changes — BatchEvalPythonUDTF →
    # ArrowEvalPythonUDTF — same results; found by the new suite-wide
    # BatchEvalPython gate)
    "udtf_bigram_top20",
    # zero-norm cosine guards (round-9 edge audit): plan + oracle change
    # (n2 > 0 predicates; cosine_ge_banded zero short-circuit), results
    # identical on any corpus without zero vectors
    "dedup_embedding_cosine",
    "dedup_semantic",
    "sim_knn_join",
    "sim_ivf_knn_join",
    "sim_hard_negatives",
]
_R09_PREFIX = [
    # (a) never driver-stamped (round-9 additions)
    "multimodal_audio_fingerprint",
    "multimodal_audio_fingerprint_neardup",
    "curation_conversation_assembly",
    "text_fim_split",
    # (b) changed this round
    *CHANGED_THIS_ROUND,
    # (c) stalest-stamp fill: the 3 r04 rows deferred in round 8...
    "text_quality_score",
    "text_rolling_fingerprint",
    "text_token_stats",
    # ...then 39 of the 45 r05 rows (six rotate to round 10, named in
    # the composition note above)
    "agg_salted_two_phase",
    "curation_balance_mixture",
    "curation_benchmark_contamination",
    "curation_epoch_upsample",
    "curation_pack_sequences",
    "curation_stratified_sample",
    "dedup_exact",
    "dedup_jaccard_stop_shingle",
    "dedup_ngram_jaccard",
    "dedup_normalized",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipping_delay_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q1_pricing_summary",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "setops_union_distinct",
    "sim_centroid_distance",
    "sim_cosine_topk",
    "sim_hyperplane_lsh",
]
assert len(_R09_PREFIX) == 50, len(_R09_PREFIX)
assert len(set(_R09_PREFIX)) == 50
assert set(_R09_PREFIX) <= set(REGISTRY), set(_R09_PREFIX) - set(REGISTRY)
_order = _R09_PREFIX + [n for n in REGISTRY if n not in set(_R09_PREFIX)]
assert set(_order) == set(REGISTRY) and len(_order) == len(REGISTRY)
_by_name = dict(REGISTRY)
REGISTRY.clear()
REGISTRY.update({n: _by_name[n] for n in _order})
