"""Semantic golden tests for the reference telemetry pipeline (SURVEY §5.2
item 3, build plan M2): calibration, sentinel-null discipline, grams
payload rebuild, hourly boundary math, and completeness/error queries —
over reference-shaped `nodes`/`readings` fixtures (FIXTURES.md group B).

Every expected value is hand-computed from the reference formulas:
- calibration: units = raw/factor; weight = |units − zero_factor|
  (slave.ino:22,52,141; hx711_calibration.ino:20-30)
- grams: ceil(kg*1000) (master.ino:474)
- payload: {"H0001":{"w":g},...} (master.ino:462-480)
- sentinel: weight 0.0 == missing (master.ino:162)
- boundary: next = (ts/3600 + 1) * 3600 (master.ino:670-679)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# nodes dimension: (node_code, master_code, calibration_factor, zero_factor)
# constants from slave.ino:22 / prototype_1.ino:16 / prototype_2.ino:25
NODES = [
    ("H0001", "M0001", 20750.0, -0.5),
    ("H0002", "M0001", 21500.0, 0.35),
    ("H0003", "M0002", 20750.0, -0.5),
]
# readings facts: (node_code, ts, raw, confirmed);
# raw chosen so units = raw/factor is exact-ish
READINGS = [
    ("H0001", "2024-03-01 10:12:00", 664000.0, True),   # units 32.0 → kg 32.5
    ("H0002", "2024-03-01 10:13:30", 268750.0, True),   # units 12.5 → kg 12.15
    ("H0003", "2024-03-01 10:20:00", 0.0, False),       # sentinel: missing
    ("H0001", "2024-03-01 11:05:00", 207500.0, True),   # units 10.0 → kg 10.5
]


@pytest.fixture(scope="module")
def fixtures(spark):
    nodes = spark.createDataFrame(
        NODES,
        "node_code string, master_code string,"
        " calibration_factor double, zero_factor double",
    )
    readings = spark.createDataFrame(
        READINGS, "node_code string, ts string, raw double, confirmed boolean"
    ).withColumn("ts", F.to_timestamp("ts"))
    return nodes, readings


def _calibrated(nodes, readings):
    """A11/A12: join the calibration dim (broadcast — it is the device
    registry, always tiny) and apply the reference transform; the
    sentinel-zero raw maps to NULL kg (A24)."""
    return (
        readings.join(F.broadcast(nodes), "node_code")
        .withColumn(
            "kg",
            F.when(
                F.col("raw") != 0.0,
                F.abs(F.col("raw") / F.col("calibration_factor") - F.col("zero_factor")),
            ),
        )
    )


def test_calibration_formula(spark, fixtures):
    nodes, readings = fixtures
    got = {
        (r.node_code, r.ts.strftime("%H:%M")): r.kg
        for r in _calibrated(nodes, readings).collect()
    }
    assert got[("H0001", "10:12")] == pytest.approx(32.5)   # |32.0 - (-0.5)|
    assert got[("H0002", "10:13")] == pytest.approx(12.15)  # |12.5 - 0.35|
    assert got[("H0003", "10:20")] is None                  # sentinel → NULL
    assert got[("H0001", "11:05")] == pytest.approx(10.5)


def test_sentinel_null_keeps_aggregates_honest(spark, fixtures):
    """The reference bug class SURVEY §7 warns about: averaging with the
    0.0 sentinel silently skews; the NULL view does not."""
    nodes, readings = fixtures
    cal = _calibrated(nodes, readings)
    stats = cal.agg(
        F.avg("kg").alias("avg_null_aware"),
        F.avg(F.coalesce("kg", F.lit(0.0))).alias("avg_sentinel_style"),
        F.count("kg").alias("n_present"),
        F.count(F.lit(1)).alias("n_rows"),
    ).first()
    assert stats.n_rows == 4 and stats.n_present == 3
    assert stats.avg_null_aware == pytest.approx((32.5 + 12.15 + 10.5) / 3)
    # the sentinel-style average is wrong — that's the point
    assert stats.avg_sentinel_style < stats.avg_null_aware


def test_grams_payload_rebuild(spark, fixtures):
    """A14+A18: per (master, hour) payload JSON keyed by node code with
    integer grams — byte-shape of master.ino:462-480."""
    nodes, readings = fixtures
    cal = _calibrated(nodes, readings).filter(F.col("kg").isNotNull())
    payload = (
        cal.withColumn("g", F.ceil(F.col("kg") * 1000).cast("long"))
        .withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy("master_code", "hour")
        .agg(
            F.to_json(
                F.map_from_entries(
                    F.sort_array(
                        F.collect_list(
                            F.struct("node_code", F.struct(F.col("g").alias("w")))
                        )
                    )
                )
            ).alias("payload")
        )
    )
    got = {
        (r.master_code, r.hour.strftime("%H")): r.payload
        for r in payload.collect()
    }
    assert got[("M0001", "10")] == '{"H0001":{"w":32500},"H0002":{"w":12150}}'
    assert got[("M0001", "11")] == '{"H0001":{"w":10500}}'


def test_hour_boundary_formula_vs_reference_math(spark, fixtures):
    """A17: window(ts,'1 hour').end equals the reference's integer alarm
    formula (ts/3600 + 1) * 3600 for every reading."""
    _, readings = fixtures
    check = readings.select(
        F.window("ts", "1 hour").end.alias("spark_end"),
        F.timestamp_seconds(
            (F.expr("unix_timestamp(ts) div 3600") + 1) * 3600
        ).alias("ref_end"),
    )
    assert check.filter(F.col("spark_end") != F.col("ref_end")).count() == 0


def test_completeness_and_error_report(spark, fixtures):
    """A25/A28: per (master, hour) completeness — every fleet node
    reported — and the error-report row set for incomplete rounds
    (the 'missing slave' anti join, master.ino:552-574)."""
    nodes, readings = fixtures
    cal = _calibrated(nodes, readings).withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    fleet_size = nodes.groupBy("master_code").agg(
        F.count(F.lit(1)).alias("n_fleet")
    )
    per_round = (
        cal.groupBy("master_code", "hour")
        .agg(F.count("kg").alias("n_ok"))
        .join(F.broadcast(fleet_size), "master_code")
        .withColumn("complete", F.col("n_ok") == F.col("n_fleet"))
    )
    got = {
        (r.master_code, r.hour.strftime("%H")): r.complete
        for r in per_round.collect()
    }
    assert got[("M0001", "10")] is True
    assert got[("M0002", "10")] is False   # H0003's reading was the sentinel
    assert got[("M0001", "11")] is False   # H0002 never reported at 11:00

    # error report: the missing nodes per incomplete round (left anti)
    reported = cal.filter(F.col("kg").isNotNull()).select(
        "master_code", "hour", "node_code"
    )
    rounds = cal.select("master_code", "hour").distinct()
    expected_nodes = rounds.join(
        F.broadcast(nodes.select("master_code", "node_code")), "master_code"
    )
    missing = expected_nodes.join(
        reported, ["master_code", "hour", "node_code"], "left_anti"
    )
    got_missing = {
        (r.master_code, r.hour.strftime("%H"), r.node_code)
        for r in missing.collect()
    }
    assert got_missing == {
        ("M0002", "10", "H0003"),
        ("M0001", "11", "H0002"),
    }
