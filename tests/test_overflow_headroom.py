"""ANSI-overflow headroom for integer sufficient-statistic closed forms.

Round-7 incident: q298 accumulated Σgap² as BIGINT; at sf0.1 row counts
``n * sxx`` exceeded 2^63 and ANSI mode raised ARITHMETIC_OVERFLOW —
crashing the driver's official bench. q285 carried the same latent form.
Both now accumulate as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB).

These tests feed adversarial magnitudes — epoch-scale gaps and simulated
1e9-row-group sums — through the SAME closed forms the queries use, via
tiny synthetic parquet tables, and assert the math survives with exact
values. A plain BIGINT accumulator provably fails on these inputs (the
first test asserts that too, so the test itself would catch a regression
back to the overflowing form).
"""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F
import pytest

from hive_hw_spark.queries import all_queries


@pytest.fixture(scope="module")
def registry():
    return all_queries()


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_q298_burstiness_survives_epoch_scale_gaps(spark, tmp_path, registry):
    # One user, gaps of ~2.1e9 s (beyond any real epoch range): per-row
    # gap^2 ~ 4.4e18, and with 3 gaps Σgap² ~ 1.3e19 > 2^63 — the exact
    # magnitude class that killed the BIGINT form. n*sxx - sx*sx must
    # come out exact in DECIMAL(38,0).
    t0 = datetime.datetime(1970, 1, 2)
    gap = 2_100_000_000  # seconds
    rows = [
        (i, t0 + datetime.timedelta(seconds=i * gap), 1, "a", 0.0, "{}")
        for i in range(4)  # 3 gaps
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["event_type"]: r
        for r in registry["q298"].fn(spark, str(tmp_path)).collect()
    }
    assert got["a"]["n"] == 3
    # identical gaps -> sd == 0, burstiness == (0-mu)/(0+mu) == -1
    assert got["a"]["mean_gap_h"] == round(gap / 3600, 4)
    assert got["a"]["sd_gap_h"] == 0.0
    assert got["a"]["burstiness"] == -1.0
    # the BIGINT form would have overflowed: n * Σgap² > 2^63
    assert 3 * (3 * gap * gap) > 2**63


def test_q285_dispersion_closed_form_headroom(spark):
    # Simulate a 1e9-row group's sufficient statistics directly through
    # the same DECIMAL expression shape q285 uses: n=1e9, per-order
    # basket c=1000 -> sx=1e12, sxx=1e15, n*sxx=1e24 (overflows BIGINT),
    # variance must come out exactly 0 for a constant column.
    df = spark.range(1).select(
        F.lit(1_000_000_000).cast("bigint").alias("n"),
        F.lit(10**12).cast("decimal(38,0)").alias("sx"),
        F.lit(10**15).cast("decimal(38,0)").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    num = (n.cast("decimal(20,0)") * sxx - sx * sx).cast("double")
    var = num / (n.cast("double") * (n - 1))
    row = df.select(var.alias("v")).collect()[0]
    assert row["v"] == 0.0
    assert 10**9 * 10**15 > 2**63  # BIGINT n*sxx would have overflowed


def test_decimal38_product_magnitude_ceiling(spark):
    # Document the actual headroom: the largest intermediate the closed
    # form produces is sx*sx. At 100 TB scale (n ~ 1e12 rows/group,
    # mean gap ~ 1e5 s) sx ~ 1e17 and sx^2 ~ 1e34 — four orders of
    # magnitude inside DECIMAL(38,0). Verify 1e17^2 computes exactly.
    df = spark.range(1).select(
        F.lit(10**17).cast("decimal(38,0)").alias("sx")
    )
    got = df.select(
        (F.col("sx") * F.col("sx")).cast("decimal(38,0)").alias("sq")
    ).collect()[0]["sq"]
    assert int(got) == 10**34


def test_q298_bigint_form_overflows_where_decimal_survives(spark, tmp_path, registry):
    # Regression tripwire: run the OLD BIGINT arithmetic over the same
    # adversarial frame and assert it raises under ANSI — proving the
    # test data genuinely exercises the overflow class.
    t0 = datetime.datetime(1970, 1, 2)
    gap = 2_100_000_000
    rows = [
        (i, t0 + datetime.timedelta(seconds=i * gap), 1, "a", 0.0, "{}")
        for i in range(4)
    ]
    _write_events(spark, str(tmp_path), rows)
    from hive_hw_spark.catalog import load_table
    from pyspark.sql import Window

    ev = load_table(spark, str(tmp_path), "events")
    epoch = F.floor(F.unix_timestamp("ts")).cast("bigint")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type", (epoch - F.lag(epoch).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").cast("bigint").alias("sx"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    bad = s.select(
        ((n * sxx - sx * sx) / (n.cast("double") * (n - 1))).alias("v")
    )
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
            bad.collect()
    else:
        pytest.skip("ANSI mode off — overflow raises only under ANSI")
