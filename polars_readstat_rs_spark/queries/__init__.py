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

from . import llm, llm2, llm3, llm4, pipeline, readstat, relational, relational2, relational3, streaming_q, tpch, llm5, llm6  # noqa: F401  (registration side effects)
from .registry import ORACLES, QUERIES

# Round-5 rotation: every pre-r5 entry has passed the complete
# tools/check_oracle.py gate at sf0.01 AND sf0.1 in at least two
# independent full runs (builder r4 + judge r4), so the old 76-entry
# verified tail is promoted out of RISKY_TAIL. Only queries added THIS
# round (never locally gate-verified) belong here.
_RISKY_TAIL = (
    "m06_png_codec",
    "r12_pushdown_matrix",
    "r13_xpt_roundtrip_agg",
    "m07_audio_frames",
    "q82_scd2_intervals",
    "v10_ann_join",
    "p10_curriculum",
    "q83_point_in_time_join",
    "v11_mmr_rerank",
    "t15_wordpiece",
    "g04_components_star",
    "s09_stream_session_window",
    "d12_cluster_representatives",
)

_ordered = [n for n in QUERIES if n not in _RISKY_TAIL] + [
    n for n in _RISKY_TAIL if n in QUERIES
]
_q = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_q)

RISKY_TAIL = _RISKY_TAIL  # single source of truth — __spark_entry__ imports this

__all__ = ["QUERIES", "ORACLES", "RISKY_TAIL"]
