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

SRC_DIR = "/root/testdata/sf0.1"
SF_DIR = "/tmp/scale1x"
# SPARK_GRAFT_PROBE_COPIES widens the probe (e.g. 100 -> 60M-row
# lineitem, ~1.1 GB parquet): two decades of scaling evidence instead
# of one. Default stays 10 so the per-round gate remains cheap.
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "10"))
X10_DIR = f"/tmp/scale{COPIES}x"
# the heavy DECIMAL sufficient-stat folds (the r8 verdict's ask) plus one
# representative per core family over lineitem: q213 predicate-pushdown
# scan, q30 TPC-H-Q1 hash agg, q151 3-table join->agg->top-k (orders/
# customer stay 1x behind the symlinks, so the join fans out 10x on the
# probe side — the shuffle-scaling signal we want). r13 adds the newly
# fixed-point-ported lineitem folds: q359 ABC-XYZ (two fact folds +
# part-bucketed cumsum), q433 price dispersion (two-level hash fold),
# q441 rank stability (fact join->rollup->per-month windows).
# r14 (verdict item 5) extends coverage to the heavy ABSOLUTE tail,
# each replicating the table its cost actually scales with (the probe
# previously only knew how to grow lineitem): q316 brand elasticity
# (lineitem ln-moment fold), q353 recommender backtest (lineitem basket
# pair expansion), q141 bloom pre-filter join (orders probe side),
# q132 PPJoin n-gram Jaccard (documents), q186 cogrouped as-of merge
# (events), q444 PQ/ADC frontier (embeddings). Values are the table to
# replicate COPIES times; every other table stays 1x via symlink.
QUERIES: dict[str, str] = {
    "q321": "lineitem",
    "q308": "lineitem",
    "q133": "lineitem",
    "q213": "lineitem",
    "q30": "lineitem",
    "q151": "lineitem",
    "q359": "lineitem",
    "q433": "lineitem",
    "q441": "lineitem",
    "q316": "lineitem",
    "q353": "lineitem",
    "q141": "orders",
    "q132": "documents",
    "q186": "events",
    "q444": "embeddings",
}


def _build(spark, dst_dir: str, copies: int, table: str = "lineitem") -> None:
    """Materialize ``table`` with ``copies`` unioned sf0.1 replicas and
    symlink every other table. BOTH scales go through this identical
    writer (repartition(32), same codec) so the 1x/10x comparison
    isolates DATA VOLUME — the first probe version read the driver's
    single-file sf0.1 parquet on one side and a 32-file Spark-written
    layout on the other, and layout beat volume."""
    os.makedirs(dst_dir, exist_ok=True)
    for f in os.listdir(SRC_DIR):
        if f == f"{table}.parquet":
            continue
        dst = os.path.join(dst_dir, f)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(SRC_DIR, f), dst)
    dst = os.path.join(dst_dir, f"{table}.parquet")
    src = os.path.join(SRC_DIR, f"{table}.parquet")
    # Cache validity is stamped with the SOURCE's size+mtime, not just
    # _SUCCESS existing: the driver regenerates /root/testdata between
    # rounds, and a stale replicated table next to freshly-symlinked
    # side tables would silently skew the join-family scaling numbers.
    stamp_file = os.path.join(dst_dir, f"{table}.src_stamp")
    st = os.stat(src)
    stamp = f"{st.st_size}:{int(st.st_mtime)}"
    if os.path.exists(os.path.join(dst, "_SUCCESS")):
        try:
            with open(stamp_file) as fh:
                if fh.read() == stamp:
                    return
        except OSError:
            pass
    li = spark.read.parquet(src)
    big = li
    for _ in range(copies - 1):
        big = big.unionAll(li)
    big.repartition(32).write.mode("overwrite").parquet(dst)
    with open(stamp_file, "w") as fh:
        fh.write(stamp)


def _dirs_for(table: str) -> tuple[str, str]:
    """(1x_dir, Nx_dir) for ``table`` — lineitem keeps the historical
    unsuffixed names so the cached build survives the r14 extension."""
    if table == "lineitem":
        return SF_DIR, X10_DIR
    return f"{SF_DIR}_{table}", f"{X10_DIR}_{table}"


def build_10x(spark, table: str = "lineitem") -> tuple[str, str]:
    d1, dn = _dirs_for(table)
    _build(spark, d1, 1, table)
    _build(spark, dn, COPIES, table)
    return d1, dn


def _one(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def time_pair(fn, spark, d1: str = SF_DIR, dn: str = X10_DIR) -> tuple[float, float]:
    """Min-of-2 at each scale, reps INTERLEAVED (1x,10x,1x,10x) after one
    unmeasured warmup per scale — ambient-load drift on the shared host
    hits both scales equally instead of whichever ran first (the first
    probe version timed all sf0.1 reps right after the 6M-row build job
    and read a nonsensical 0.15x 'scaling')."""
    _one(fn, spark, d1)
    _one(fn, spark, dn)
    t1, t10 = float("inf"), float("inf")
    for _ in range(2):
        t1 = min(t1, _one(fn, spark, d1))
        t10 = min(t10, _one(fn, spark, dn))
    return round(t1, 3), round(t10, 3)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "queries",
        nargs="*",
        help="subset of probe queries to run (default: all)",
    )
    ns = ap.parse_args()
    todo = {
        q: t
        for q, t in QUERIES.items()
        if not ns.queries or q in ns.queries
    }

    spark = get_spark(app_name="hive_hw_scale_probe_10x")
    reg = all_queries()
    out: dict = {"copies": COPIES}
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    # Group by scaled table so each replica set is built once and its
    # queries run back-to-back against it.
    for table in dict.fromkeys(todo.values()):
        d1, dn = build_10x(spark, table)
        n1 = spark.read.parquet(os.path.join(d1, f"{table}.parquet")).count()
        n10 = spark.read.parquet(os.path.join(dn, f"{table}.parquet")).count()
        out[f"rows_1x_{table}"] = n1
        out[f"rows_nx_{table}"] = n10
        for name, t in todo.items():
            if t != table:
                continue
            t1, t10 = time_pair(reg[name].fn, spark, d1, dn)
            out[name] = {
                "table": table,
                "sec_1x": t1,
                "sec_nx": t10,
                "scaling": round(t10 / t1, 2) if t1 > 0 else None,
            }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
