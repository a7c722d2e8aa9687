"""Count base-table scans in each query's formatted plan (v2).

The multi-branch recompute class (CLAUDE.md: exchange reuse does NOT
reliably fire across plan branches under AQE) shows up statically as
the SAME parquet relation scanned more than once in one plan. This
probe explains every registry query (no execution) and reports, per
query, how many times each input table's scan appears, flagging any
table scanned >= 2x — the candidate list for the persist-the-shared-
frame fix, with the count as the plan evidence.

v2 (r14, verdict item 4): the r13 probe counted raw "Location:" lines,
which includes the scan nodes inside a persisted frame's OWN cached-plan
definition (the InMemoryRelation child printed in the tree). That
definition executes ONCE per session when the cache first materializes —
it is the intended single pass, not a duplicate. v2 parses the tree,
assigns each distinct Scan-parquet node id to real (reachable outside
any InMemoryRelation definition) or cached-def-only, and flags DUP on
the REAL count. v2 also sources TABLES from hive_hw_spark.catalog
(the r13 list said 'docs' for the 'documents' table and included a
nonexistent 'partsupp', silently blinding the sweep to documents dups).

Usage: python scripts/scan_dup_probe.py [q254 q403 ...]
       (no args = whole registry; slow but thorough)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.catalog import TABLES  # noqa: E402
from hive_hw_spark.queries import all_queries  # noqa: E402
from hive_hw_spark.session import get_spark  # noqa: E402


def _table_of(location_line: str) -> str:
    for t in TABLES:
        if (
            f"/{t}.parquet" in location_line
            or f"/{t}]" in location_line
            or f"/{t}/" in location_line
        ):
            return t
    return "<other>"


def classify_scans(plan: str) -> tuple[dict[str, int], dict[str, int]]:
    """Return (real_counts, cached_def_counts) of DISTINCT parquet scan
    node ids per table.

    A scan node id is "real" when at least one of its tree occurrences
    is NOT inside an InMemoryRelation subtree (a cached-plan definition,
    which runs once per session at first materialization, not once per
    branch). Tree depth comes from the indentation of the node marker.
    """
    # id -> table, from the details section ("(7) Scan parquet" block
    # followed by its "Location:" line).
    id_table: dict[int, str] = {}
    cur_scan_id: int | None = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) Scan parquet", line)
        if m:
            cur_scan_id = int(m.group(1))
            continue
        if re.match(r"^\(\d+\) ", line):
            cur_scan_id = None
            continue
        if cur_scan_id is not None and line.startswith("Location:"):
            id_table[cur_scan_id] = _table_of(line)
            cur_scan_id = None

    real_ids: set[int] = set()
    cached_ids: set[int] = set()
    # Parse the tree (everything before the first "(N) " detail header).
    imr_stack: list[int] = []  # depths of enclosing InMemoryRelation nodes
    for line in plan.splitlines():
        if re.match(r"^\(\d+\) ", line):
            break  # details section reached
        m = re.search(
            r"(?:^|[+:]- )([A-Za-z][\w]*(?: [\w=]+)*?)\s*\((\d+)\)", line
        )
        if not m:
            continue
        marker = re.search(r"[+:]- ", line)
        depth = (marker.start() // 3 + 1) if marker else 0
        while imr_stack and depth <= imr_stack[-1]:
            imr_stack.pop()
        name, nid = m.group(1), int(m.group(2))
        if name == "InMemoryRelation":
            imr_stack.append(depth)
            continue
        if name.startswith("Scan parquet"):
            if imr_stack:
                cached_ids.add(nid)
            else:
                real_ids.add(nid)
    cached_ids -= real_ids  # real anywhere wins

    def counts(ids: set[int]) -> dict[str, int]:
        out: dict[str, int] = {}
        for nid in ids:
            t = id_table.get(nid, "<other>")
            out[t] = out.get(t, 0) + 1
        return out

    return counts(real_ids), counts(cached_ids)


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
        real, cached = classify_scans(plan)
        dups = {t: c for t, c in real.items() if c >= 2 and t != "<other>"}
        n_inmem = plan.count("InMemoryTableScan")
        n_reuse = plan.count("ReusedExchange")
        tag = "DUP " + str(dups) if dups else "ok"
        rows.append((name, tag))
        print(
            f"{name}: real={real} cached_def={cached} inmem={n_inmem} "
            f"reused_exchange={n_reuse} -> {tag}",
            flush=True,
        )
    n_dup = sum(1 for _, t in rows if t.startswith("DUP"))
    print(f"\n{n_dup}/{len(rows)} queries with a >=2x REAL base-table scan")


if __name__ == "__main__":
    main()
