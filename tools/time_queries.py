"""Isolated per-query timing with the bench methodology (warm-up at
sf0.001, best-of-2 `.count()`, clearCache between queries).

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     TIME_RUNS (default 2).

Prints one JSON line {"queries": {name: best_sec}} for A/B comparisons.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from distributed_vector_database_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("TIME_RUNS", "2"))
    spark = get_spark(app_name="dvds-time-queries")
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass
    spark.catalog.clearCache()
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        best = None
        for _ in range(runs):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]:.3f}s ({n} rows)", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
