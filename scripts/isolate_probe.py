"""Isolate-time queries with bench methodology (noop sink, min-of-N).

Usage: python scripts/isolate_probe.py q214 q375 q286 [--reps N]

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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
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
