"""Targeted oracle check: `python scripts/check_subset.py q422 q434 ...`

Same vanilla-session + DuckDB compare as scripts/drive.py, restricted
to the named queries — the fast loop for verifying a rewrite batch
before the full sweep. Oracle-free queries fall back to a rows-only
count, like the driver does.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_harness import compare, duckdb_conn  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: python scripts/check_subset.py qNNN [qNNN ...]")
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf)
    bad = []
    for name in names:
        if name not in qs:
            bad.append((name, "not in registry"))
            continue
        try:
            sdf = qs[name](spark, sf)
            if name in osql:
                compare(sdf, con, osql[name], name=name)
                print(f"{name}: oracle OK")
            else:
                print(f"{name}: no oracle, {sdf.count()} rows")
        except Exception as ex:  # noqa: BLE001
            bad.append((name, str(ex)[:300]))
    if bad:
        print(f"FAILED ({len(bad)}):")
        for n, m in bad:
            print(f"  {n}: {m}")
        return 1
    print("SUBSET GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
