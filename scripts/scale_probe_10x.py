"""10x scale probe of the heavy single-scan DECIMAL folds (r8 verdict #6).

The 100 TB claim for the sufficient-stats family (q321 one-pass
correlation matrix, q308 two-feature OLS, q133 regression/correlation
aggregates) is that they are single-scan, map-side-combinable folds —
so wall time should scale ~linearly in rows with no shuffle blow-up.
This probe MEASURES that: it materializes a ~6M-row lineitem (10 unioned
copies of sf0.1, written once to /tmp/scale10x) behind a directory that
symlinks every other sf0.1 table, runs each query at sf0.1 and at 10x
(min of 2 executions through the noop sink), and prints the scaling
factor. Expect ~O(10) or less (fixed per-query plan/launch overhead
amortizes); a super-linear factor would flag a hidden shuffle or spill.

Usage: python scripts/scale_probe_10x.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.queries import all_queries  # noqa: E402
from hive_hw_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
X10_DIR = "/tmp/scale10x"
QUERIES = ("q321", "q308", "q133")
COPIES = 10


def build_10x(spark) -> None:
    os.makedirs(X10_DIR, exist_ok=True)
    for f in os.listdir(SF_DIR):
        if f == "lineitem.parquet":
            continue
        dst = os.path.join(X10_DIR, f)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(SF_DIR, f), dst)
    dst = os.path.join(X10_DIR, "lineitem.parquet")
    if os.path.exists(os.path.join(dst, "_SUCCESS")):
        return
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = li
    for _ in range(COPIES - 1):
        big = big.unionAll(li)
    # one shuffle-free write: union of 10 scans, repartitioned only to
    # keep file count sane for the re-read
    big.repartition(32).write.mode("overwrite").parquet(dst)


def time_query(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    spark = get_spark(app_name="hive_hw_scale_probe_10x")
    build_10x(spark)
    n1 = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    n10 = spark.read.parquet(os.path.join(X10_DIR, "lineitem.parquet")).count()
    reg = all_queries()
    out = {"rows_sf0.1": n1, "rows_10x": n10}
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    for name in QUERIES:
        t1 = time_query(reg[name].fn, spark, SF_DIR)
        t10 = time_query(reg[name].fn, spark, X10_DIR)
        out[name] = {
            "sec_sf0.1": t1,
            "sec_10x": t10,
            "scaling": round(t10 / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
