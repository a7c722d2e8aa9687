"""Driver-style verification: vanilla session, entry smoke + full oracle sweep."""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

sf = "/root/testdata/sf0.01"
qs, osql = e.queries(), e.oracle_sql()
con = duckdb_conn(sf)
ok, bad, noracle = [], [], []
for name in sorted(qs):
    try:
        sdf = qs[name](spark, sf)
        if name in osql:
            compare(sdf, con, osql[name], name=name)
            ok.append(name)
        else:
            n = sdf.count()
            noracle.append(f"{name}({n} rows)")
    except Exception as ex:  # noqa: BLE001
        bad.append((name, str(ex)[:200]))
print(f"ORACLE OK ({len(ok)}): {' '.join(ok)}")
print(f"NO-ORACLE rows-only ({len(noracle)}): {' '.join(noracle)}")
if bad:
    print(f"FAILED ({len(bad)}):")
    for n, m in bad:
        print(f"  {n}: {m}")
    sys.exit(1)
print("ALL GREEN")
