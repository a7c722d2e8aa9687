"""Isolate-time queries with bench methodology (noop sink, min-of-N).

Usage: python scripts/isolate_probe.py q214 q375 q286 [--reps N | --reps=N]

Same session factory and timed action as bench.py, one fresh session,
queries in the given order, min-of-N (default 4) per query with all
reps printed so dispersion is visible. Load1 sampled per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.queries import all_queries  # noqa: E402
from hive_hw_spark.session import get_spark  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    ns = ap.parse_args()
    args, reps = ns.queries, ns.reps
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="isolate_probe")
    registry = all_queries()

    def run(name: str) -> None:
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    run(args[0])  # session warm-up rep, uncounted
    for name in args:
        rs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(name)
            rs.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: min={min(rs)} reps={rs} load1={os.getloadavg()[0]:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
