"""Query registry: importing this package registers the relational and
LLM-pipeline suites.

Ordering contract: the driver's correctness runner executes QUERIES in
dict (insertion) order with a global time budget, so one pathological
query stalls everything registered after it (round 2: d08 hung at
position ~17 and zeroed the whole correctness file). We therefore
rebuild the dict so the long-verified relational suite runs first and
_RISKY_TAIL — the most expensive / most recently added entries — runs
LAST. Add any brand-new, never-locally-verified query to _RISKY_TAIL
until a full tools/check_oracle.py run has passed it.
"""

from . import llm, llm2, llm3, llm4, pipeline, readstat, relational, relational2, relational3, streaming_q, tpch, llm5  # noqa: F401  (registration side effects)
from .registry import ORACLES, QUERIES

_RISKY_TAIL = (
    "r09_sav_option_interaction",
    "q44_fuzzy_match",
    "q45_gapfill",
    "q46_moving_window",
    "p07_importance_sample",
    "t12_zipf_stats",
    "t13_chunk_documents",
    "g01_triangle_stats",
    "g02_bfs_hops",
    "q47_iqr_outliers",
    "q48_histogram",
    "p08_group_sample",
    "q49_ntile",
    "q50_asof_nearest",
    "v07_pq_topk",
    "q51_event_patterns",
    "q52_snapshot_diff",
    "q53_zorder",
    "q54_ohlc",
    "q55_hopping_window",
    "d10_prefix_filter",
    "g03_pagerank",
    "q56_trend",
    "q57_group_center",
    "q58_rank_family",
    "q59_array_funcs",
    "q60_unpivot",
    "q61_lateral",
    "t09_gopher_quality",
    "t10_bigram_lm",
    "q42_salted_join",
    "t11_bpe_pairs",
    "q43_upsert",
    "d08_semantic_dedup",
    "v06_ann_recall",
    "s01_stream_windowed_counts",
    "s02_stream_sessions",
    "s03_stream_stream_join",
    "s04_stream_dedup",
    "s05_stream_static_join",
    "s06_incremental_agg",
    "v08_ivf_append",
    "s07_stream_hopping",
    "m03_wav_codec",
    "m04_bmp_codec",
    "q62_priority_exists",
    "q63_volume_shipping",
    "q64_market_share",
    "q65_profit",
    "q66_returned_items",
    "q67_important_parts",
    "q68_cust_order_dist",
    "q69_promo_share",
    "q70_top_supplier",
    "q71_small_qty",
    "q72_large_orders",
    "q73_or_predicates",
    "q74_waiting_supplier",
    "q75_no_order_customers",
    "d11_span_dedup",
    "t14_tfidf_terms",
    "s08_stream_outer_join",
    "v09_filtered_topk",
    "p09_temperature_mix",
    "q76_recursive_cte",
    "q77_min_cost_supplier",
    "q78_supplier_part_counts",
    "q79_excess_suppliers",
    "q80_python_udtf",
    "m05_video_frames",
    "r10_stream_source",
    "r11_stream_sink",
    "q81_map_functions",
)

_ordered = [n for n in QUERIES if n not in _RISKY_TAIL] + [
    n for n in _RISKY_TAIL if n in QUERIES
]
_q = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_q)

RISKY_TAIL = _RISKY_TAIL  # single source of truth — __spark_entry__ imports this

__all__ = ["QUERIES", "ORACLES", "RISKY_TAIL"]
