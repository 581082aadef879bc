#!/usr/bin/env python
"""Merge two back-to-back bench.py runs into a comparability artifact
(round 11, VERDICT r10 item 1): the gate is the two sessions' headline
(non-streaming) subtotals within ±10% of each other, raw and
normalized. Usage:

  python tools/bench_comparability.py runA.json runB.json [out.json]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_comparability_r11.json"
    a, b = json.load(open(a_path)), json.load(open(b_path))
    spread_raw = abs(a["value"] / b["value"] - 1.0)
    spread_norm = abs(a["value_normalized"] / b["value_normalized"] - 1.0)
    per_query = {
        q: {
            "a": a["queries"][q],
            "b": b["queries"][q],
            "ratio": round(max(a["queries"][q], b["queries"][q])
                           / max(min(a["queries"][q], b["queries"][q]), 1e-9), 2),
        }
        for q in a["queries"]
    }
    artifact = {
        "metric": "back_to_back_session_spread",
        "gate": "two clean back-to-back sessions of identical code within "
        "+-10% on the non-streaming headline subtotal",
        "protocol": a.get("estimator_per_query"),
        "runs": [
            {
                "value": r["value"],
                "value_normalized": r["value_normalized"],
                "calibration": r["calibration"],
                "streaming": {k: v for k, v in r["streaming"].items() if k != "note"},
            }
            for r in (a, b)
        ],
        "spread_raw": round(spread_raw, 4),
        "spread_normalized": round(spread_norm, 4),
        "pass": spread_raw <= 0.10,
        "per_query": per_query,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({k: artifact[k] for k in
                      ("spread_raw", "spread_normalized", "pass")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
