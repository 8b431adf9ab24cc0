"""Merge a bench run's timings into BENCH_BASELINE.json for queries
that have no pinned entry yet (new queries get their first quiet-box
number; existing pins are NEVER overwritten — drift detection needs a
stable reference, so re-pinning an existing query requires deleting
its entry by hand with a reason in the commit message).

Usage: python bench.py > /tmp/bench.json && \
       python tools/pin_baseline.py /tmp/bench.json r7_preflight
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    bench_path, source = sys.argv[1], sys.argv[2]
    with open(bench_path) as f:
        bench = json.load(f)
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    with open(base_path) as f:
        base = json.load(f)
    if base.get("sf") != bench.get("sf"):
        raise SystemExit(
            f"refusing to pin: bench sf={bench.get('sf')} != "
            f"baseline sf={base.get('sf')}"
        )
    added = []
    measured = {**bench.get("queries", {}), **bench.get("phase_split", {})}
    for name, sec in measured.items():
        if name not in base["queries"]:
            base["queries"][name] = {"sec": sec, "source": source}
            added.append(name)
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"pinned {len(added)} new queries: {sorted(added)}")


if __name__ == "__main__":
    main()
