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

# r14 (verdict item 4): every residual >=2x REAL scan was reviewed and
# either FIXED (persist/derive the shared fold — see plans/r14/) or
# classified here as an inherent multi-pass shape. Classes:
#   fence+apply  — a tiny aggregate (min/max/percentile/top-k/query-row)
#                  must complete before the main pass can consume it;
#                  the fence scan is column-pruned. Folding it away
#                  would need a second shuffle of the fact table.
#   self-join    — the operator IS a join of the table against itself
#                  (or against its own group-aggregates on the same
#                  key); materializing the probe side trades a pruned
#                  scan for a fact-sized persist.
#   two-pass     — a small fence FRAME is built from one full pass and
#                  applied in a second (decontamination, boilerplate,
#                  thresholds); the passes read different column sets.
#   distinct-passes — branches aggregate DIFFERENT groupings/filters of
#                  the table where no shared sub-fold exists.
#   union-sides  — two filtered selections of the table union into one
#                  stream (as-of emulation, A/B layout audit).
#   tiny-dim     — the doubly-scanned table is a broadcast dimension
#                  (nation: 25 rows); a persist costs more than a scan.
INHERENT: dict[str, str] = {
    "q117": "two-pass (pruned eval-slice scan + shingle pass + id scan)",
    "q165": "two-pass (chunk-df fence + apply; + pruned count fence)",
    "q300": "distinct-passes (yoy after dmax fence, churn fold, "
    "nation join)",
    "q27": "self-join (minute-bucket burst pairs)",
    "q78": "fence+apply (max-day split) + materialized rollup re-read",
    "q92": "fence+apply (query-vector row)",
    "q92b": "fence+apply (query-vector bucket)",
    "q102b": "fence+apply (query-vector row; scores persisted)",
    "q111": "fence+apply (query-doc TF row)",
    "q113": "distinct-passes (two referential audits, different keys)",
    "q115": "union-sides (word + bigram streams; persisting the "
    "tokenized corpus trades a scan for a corpus-sized spill)",
    "q121": "two-pass (per-lang P25 fence + apply; declared shape)",
    "q134": "self-join (decorrelated Q21: fact vs its own per-order "
    "supplier stats)",
    "q138": "self-join (decorrelated Q2: fact vs its own per-part min)",
    "q140": "distinct-passes (sharded-vs-direct sketch comparison IS "
    "the operator)",
    "q144": "self-join (decorrelated Q17: fact vs per-part avg)",
    "q163": "self-join (name-length-bucket fuzzy pairs)",
    "q166": "fence+apply (per-lang ratio fence onto corpus)",
    "q174": "fence+apply (min-day fence)",
    "q175": "fence+apply (global min/max bin fence)",
    "q177": "fence+apply (avg-acctbal fence)",
    "q186": "cogroup (trades/quotes as-of sides)",
    "q187": "fence+apply (top-40 anchor fence)",
    "q192": "tiny-dim (nation 25 rows, two branches)",
    "q193": "tiny-dim (nation 25 rows, two branches)",
    "q206": "two-pass (per-doc bigram fold + unigram vocab fold; the "
    "corpus bigram counts are persisted VOCAB-sized — persisting the "
    "corpus-sized dbc instead measured slower at sf0.1 and is a "
    "corpus-sized spill at 100 TB)",
    "q209": "one real scan after r14 rewrite; residue is probe artifact",
    "q216": "union-sides (aggregated touches + raw purchases; purchase "
    "rows cannot ride the touch groupBy)",
    "q233": "self-join (spatial grid-cell pairs)",
    "q240": "distinct-passes (per-user cohort fold + row-level "
    "purchase join)",
    "q258": "fence+apply (first-purchase fence onto touches)",
    "q271": "fence+apply (per-type percentile fence)",
    "q279": "fence+apply (per-type VaR fence)",
    "q294": "fence+apply (min/max ts fence; intervals persisted)",
    "q332": "distinct-passes (disjoint pre/post date slices)",
    "q335": "distinct-passes (token-stat fold + hash-distinct fold; "
    "merging them forces an Expand over the corpus)",
    "q342": "distinct-passes (placed-day fold + completion join)",
    "q364": "fence+apply (min/max orderdate fence)",
    "q373": "fence+apply (doc-count fence + word fold)",
    "q380": "distinct-passes (persisted scores + label lookup)",
    "q387": "fence+apply (time-cut fence; transitions persisted)",
    "q394": "fence+apply (min-day fence)",
    "q418": "union-sides (A/B page-layout audit: two different "
    "groupings of the same scan IS the comparison)",
    "q426": "distinct-passes (lineitem/orders each feed TWO join-pair "
    "folds on different keys after the r14 one-pass-per-pair rewrite; "
    "12 scans -> 6 is the floor without cross-pair persists)",
}


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
        if dups and name in INHERENT:
            tag = f"inherent[{INHERENT[name]}] {dups}"
        elif dups:
            tag = "DUP " + str(dups)
        else:
            tag = "ok"
        rows.append((name, tag))
        print(
            f"{name}: real={real} cached_def={cached} inmem={n_inmem} "
            f"reused_exchange={n_reuse} -> {tag}",
            flush=True,
        )
    n_dup = sum(1 for _, t in rows if t.startswith("DUP"))
    n_inh = sum(1 for _, t in rows if t.startswith("inherent"))
    print(
        f"\n{n_dup}/{len(rows)} queries with an UNEXPLAINED >=2x REAL "
        f"base-table scan ({n_inh} whitelisted inherent multi-pass)"
    )


if __name__ == "__main__":
    main()
