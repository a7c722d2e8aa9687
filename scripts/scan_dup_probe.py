"""Count base-table scans in each query's formatted plan.

The multi-branch recompute class (CLAUDE.md: exchange reuse does NOT
reliably fire across plan branches under AQE) shows up statically as
the SAME parquet relation scanned more than once in one plan. This
probe explains every registry query (no execution) and reports, per
query, how many times each input table's scan appears, flagging any
table scanned >= 2x — the candidate list for the persist-the-shared-
frame fix, with the count as the plan evidence.

Usage: python scripts/scan_dup_probe.py [q254 q403 ...]
       (no args = whole registry; slow but thorough)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.queries import all_queries  # noqa: E402
from hive_hw_spark.session import get_spark  # noqa: E402

TABLES = (
    "lineitem", "orders", "customer", "part", "supplier", "nation",
    "region", "partsupp", "events", "docs", "embeddings",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scan_dup_probe")
    registry = all_queries()
    names = sys.argv[1:] or sorted(registry)
    rows = []
    for name in names:
        if name not in registry:
            continue
        try:
            df = registry[name].fn(spark, sf_dir)
            jvm = spark._jvm
            plan = (
                jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - side-effectful fns etc.
            print(f"{name}: SKIP ({type(exc).__name__}: {str(exc)[:80]})")
            continue
        # Count scan nodes per table. Formatted plans carry one
        # "Location: InMemoryFileIndex [...path...]" line per parquet
        # scan node in the details section — match table dir names there.
        scans = re.findall(r"Location:[^\n]*", plan)
        counts: dict[str, int] = {}
        for s in scans:
            for t in TABLES:
                if f"/{t}.parquet" in s or f"/{t}]" in s or f"/{t}/" in s:
                    counts[t] = counts.get(t, 0) + 1
                    break
            else:
                counts["<other>"] = counts.get("<other>", 0) + 1
        dups = {
            t: c for t, c in counts.items() if c >= 2 and t != "<other>"
        }
        n_inmem = plan.count("InMemoryTableScan")
        n_reuse = plan.count("ReusedExchange")
        tag = "DUP " + str(dups) if dups else "ok"
        rows.append((name, tag))
        print(
            f"{name}: scans={counts} inmem={n_inmem} "
            f"reused_exchange={n_reuse} -> {tag}",
            flush=True,
        )
    n_dup = sum(1 for _, t in rows if t.startswith("DUP"))
    print(f"\n{n_dup}/{len(rows)} queries with a >=2x base-table scan")


if __name__ == "__main__":
    main()
