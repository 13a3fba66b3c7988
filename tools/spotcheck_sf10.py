"""sf10 value-hash spot-check over SF-derived-threshold query families.

r12 verdict item 7: the sf1 sweep caught thresholds that DEGENERATE
with scale (decimal sums crossing 2^53, fixture-dependent terciles);
the r12 spot-check covered 5 money-sum queries. This extends the sf10
value-hash evidence to the sketch / LSH / sizing-curve families whose
parameters are derived from the data scale (t22 CCNet terciles, d19/d20
band curves, v17-v21 ANN curves, t23/t24/t26/t27 sketch curves, d17
Bloom FP, v19 capped recall, v24 chunk parity).

Each query runs through tools/check_oracle.py in a KILLABLE subprocess
with a per-query wall cap — at sf10 some DuckDB oracle legs are known
to grow superlinearly (v02's timed out >600 s in BENCH_SF10_r12); a
TIMEOUT row records the attempt honestly instead of stalling the run.

Usage: python tools/spotcheck_sf10.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES = [
    "t22_lm_buckets",          # LM-score terciles: cutpoints are SF-derived
    "d19_band_width_recall",   # simhash band_bits recall curve
    "d20_lsh_band_curve",      # minhash (b,r) sizing curve
    "v17_recall_nprobe_curve", # IVF nprobe recall curve
    "v18_pq_m_curve",          # PQ m curve
    "v19_capped_neardup_recall",  # capped vs exact recall (heavy oracle)
    "v21_rerank_depth_curve",  # PQ rerank depth curve
    "t23_cms_token_freq",      # CMS sketch
    "t24_kmv_ndv",             # KMV distinct estimate
    "t26_cms_width_curve",     # CMS width sizing curve
    "t27_kmv_k_curve",         # KMV k sizing curve
    "d17_bloom_membership",    # Bloom screen
    "d21_bloom_fp_curve",      # Bloom FP curve
    "v24_chunked_neardup_parity",  # chunk-pair triangle == monolith
]

TIMEOUT = float(os.environ.get("SPOTCHECK_TIMEOUT", "900"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_staged"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SPOTCHECK_SF10_r13.json"
    results: dict[str, str] = {}
    walls: dict[str, float] = {}
    for q in QUERIES:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "tools/check_oracle.py", sf_dir, q],
                capture_output=True,
                text=True,
                timeout=TIMEOUT,
            )
            tail = (proc.stdout or "").strip().splitlines()
            verdict = "PASS" if any(
                line.startswith(f"PASS {q}") for line in tail
            ) else "FAIL"
            if verdict == "FAIL":
                sys.stderr.write(f"--- {q} output tail ---\n" + "\n".join(tail[-6:]) + "\n")
            results[q] = verdict
        except subprocess.TimeoutExpired:
            results[q] = f"TIMEOUT>{int(TIMEOUT)}s"
        walls[q] = round(time.time() - t0, 1)
        print(f"{results[q]:>12}  {q}  [{walls[q]}s]", flush=True)
    n_pass = sum(1 for v in results.values() if v == "PASS")
    artifact = {
        "metric": "sf10_value_hash_spotcheck",
        "sf_dir": f"{sf_dir} (factor 100 from sf0.1)",
        "why": "SF-derived-threshold families (sketch/LSH/sizing curves) — the class the sf1 sweep caught degenerating; extends the r12 money-sum spot-check",
        "per_query_timeout_sec": TIMEOUT,
        "queries": results,
        "wall_sec": walls,
        "result": f"{n_pass}/{len(QUERIES)} rows+schema+value-hash match vs DuckDB at sf10",
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"done": out_path, "pass": n_pass, "total": len(QUERIES)}))


if __name__ == "__main__":
    main()
