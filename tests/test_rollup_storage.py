"""q78 rollup storage prefix (round-4 brief item 4): the materialized
hourly rollup goes wherever `spark.hive_hw.rollup.prefix` points — the
production warehouse/object-store path is a conf line, not a code edit —
and the serve union still hash-matches the DuckDB oracle from there."""

from __future__ import annotations

import os

from hive_hw_spark.queries import all_queries
from hive_hw_spark.queries.streaming_batch import (
    ROLLUP_PREFIX_CONF,
    rollup_prefix,
)
from tests.oracle_harness import compare


def test_q78_rollup_under_configured_prefix(spark, sf_dir, oracle, tmp_path):
    prefix = str(tmp_path / "warehouse")
    spark.conf.set(ROLLUP_PREFIX_CONF, prefix)
    try:
        assert rollup_prefix(spark) == prefix
        q = all_queries()["q78"]
        df = q.fn(spark, sf_dir)
        # full oracle hash-parity, served from the non-default prefix
        compare(df, oracle, q.oracle, name="q78@prefix")
        # the rollup parquet actually landed under the configured prefix
        rollup_dirs = [
            d for d in os.listdir(prefix) if d.startswith("hive_hw_rollup_")
        ]
        assert rollup_dirs, f"no rollup dir under {prefix}"
        hourly = os.path.join(prefix, rollup_dirs[0], "hourly")
        assert any(f.endswith(".parquet") for f in os.listdir(hourly))
    finally:
        spark.conf.unset(ROLLUP_PREFIX_CONF)


def test_rollup_prefix_defaults_to_tmp(spark):
    import tempfile

    assert spark.conf.get(ROLLUP_PREFIX_CONF, None) in (None, "")
    got = rollup_prefix(spark)
    assert got == os.environ.get(
        "HIVE_HW_ROLLUP_PREFIX", tempfile.gettempdir()
    ).rstrip("/")
