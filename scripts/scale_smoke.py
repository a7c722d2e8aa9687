"""Pre-snapshot scale gate: execute EVERY registry query once at sf0.1.

The round-7 lesson: q295-q303 entered the bench headline without one
sf0.1 execution, and q298's BIGINT overflow (which only manifests at
sf0.1 row counts) crashed the driver's official bench run. Correctness
tests at sf0.01 cannot catch magnitude-dependent failures — this gate
can, and it is cheap (one noop-sink execution per query, no min-of-N).

Run before every end-of-round snapshot (and after any wave that adds or
rewrites queries):

    python scripts/scale_smoke.py            # all registry queries
    python scripts/scale_smoke.py q298 q285  # just-touched subset

Exit code 0 = every query executed end-to-end at sf0.1; 1 = at least
one raised (each failure is printed with its head-of-stack).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.queries import all_queries  # noqa: E402


def _vanilla_spark():
    """Same explicit-minimal session shape as scripts/drive.py (r8 advice):
    vanilla engine defaults — no AQE/shuffle-partition/timestamp configs a
    query fn could lean on — plus the two infrastructure knobs the sweep
    needs (driver heap for 440+ queries of accumulated storage, UI off).
    Magnitude-dependent failures that only manifest under vanilla
    defaults (e.g. default shuffle-partition sizing changing per-task
    volumes) now hit this gate instead of passing on get_spark's tuning."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    return (
        SparkSession.builder.appName("hive_hw_scale_smoke")
        .master(master)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _vanilla_spark()
    registry = all_queries()
    names = sys.argv[1:] or sorted(registry)
    failed: list[str] = []
    t_all = time.perf_counter()
    for name in names:
        if name not in registry:
            print(f"?? {name}: not in registry", flush=True)
            failed.append(name)
            continue
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"ok {name} {time.perf_counter() - t0:.2f}s", flush=True)
        except Exception:
            failed.append(name)
            tb = traceback.format_exc().splitlines()
            print(f"FAIL {name}: " + " | ".join(tb[-3:]), flush=True)
    total = time.perf_counter() - t_all
    if failed:
        print(f"SCALE SMOKE FAILED ({len(failed)}/{len(names)}): "
              + " ".join(failed) + f"  [{total:.0f}s]")
        return 1
    print(f"SCALE SMOKE GREEN ({len(names)} queries, {total:.0f}s, "
          f"sf_dir={sf_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
