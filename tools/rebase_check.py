#!/usr/bin/env python
"""Re-baseline analysis over N full bench passes (SURVEY §6 / BENCH.json
protocol): reads /tmp/bench_pass{1..N}.json (full per-key records from
sequential quiet-machine bench.py runs), compares each key's median to
the committed BENCH.json row, and prints the keys whose median ratio
exceeds the drift gate — the inputs to the drifting-key re-base
decision (note61 discipline: re-base to the measured median, alert on
two-consecutive-round growth)."""

from __future__ import annotations

import json
import statistics
import sys

GATE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.35


def main() -> None:
    passes = []
    for i in (1, 2, 3):
        try:
            with open(f"/tmp/bench_pass{i}.json") as f:
                passes.append(json.load(f))
        except (OSError, ValueError):
            pass
    if not passes:
        raise SystemExit("no pass files")
    base = json.load(open("BENCH.json"))
    bq = base["queries"]
    meds = {}
    for k in passes[0]["queries"]:
        vals = [p["queries"][k] for p in passes if k in p["queries"]]
        meds[k] = round(statistics.median(vals), 3)
    totals = [p["value"] for p in passes]
    print(
        json.dumps(
            {
                "pass_totals": totals,
                "committed_total": base["value"],
                "ratio_range": [
                    round(min(totals) / base["value"], 3),
                    round(max(totals) / base["value"], 3),
                ],
                "n_keys": len(meds),
            }
        )
    )
    flagged = {
        k: {"median": m, "committed": bq[k], "ratio": round(m / bq[k], 2)}
        for k, m in meds.items()
        if k in bq and bq[k] > 0 and m / bq[k] > GATE
    }
    under = {
        k: {"median": m, "committed": bq[k], "ratio": round(m / bq[k], 2)}
        for k, m in meds.items()
        if k in bq and bq[k] > 0 and m / bq[k] < 1 / GATE
    }
    print(json.dumps({"over_gate": flagged}))
    print(json.dumps({"under_inverse_gate": under}))


if __name__ == "__main__":
    main()
