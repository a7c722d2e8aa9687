"""Q247/Q248 — runtime observability contracts."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hive_hw_spark.observability import MetricsListener, explain_digest


def test_q247_explain_digest_reports_plan_facts(spark, sf_dir):
    """The digest of a filtered broadcast join must surface: the pruned
    scan columns, the pushed-down filter, the broadcast strategy, and
    zero Python operators — the interactive form of the plan-lint
    red-flag list."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation_sized = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_acctbal") > 9999
    )
    j = (
        orders.where(F.col("o_totalprice") > 100.0)
        .join(F.broadcast(nation_sized),
              orders.o_custkey == nation_sized.c_custkey)
        .select("o_orderkey", "c_name")
    )
    j.collect()  # AQE: codegen ids only appear in the FINAL plan
    d = explain_digest(j)
    assert d["join_strategies"] == ["BroadcastHashJoin"]
    assert any("o_totalprice" in p for p in d["pushed_filters"])
    # column pruning reached the scans: no unprojected wide columns
    assert any("o_orderkey" in s for s in d["scan_columns"])
    assert not any("o_orderdate" in s for s in d["scan_columns"])
    assert d["python_operators"] == []
    # codegen: assert on a plain scan→agg plan — AQE's final plan for
    # THIS broadcast join happens to carry no WholeStageCodegen block,
    # so the join digest legitimately reports False
    agg = orders.where(F.col("o_totalprice") > 100.0).groupBy(
        "o_orderstatus"
    ).count()
    agg.collect()
    assert explain_digest(agg)["whole_stage_codegen"]


def test_q247_digest_flags_python_operators(spark, sf_dir):
    """A pandas-UDF plan must show up in the digest's python_operators —
    the signal a plan review keys on."""
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def ident(batches):
        yield from batches

    mp = docs.mapInPandas(ident, schema="doc_id long")
    assert "MapInPandas" in explain_digest(mp)["python_operators"]


def test_q248_metrics_listener_records_actions(spark, sf_dir):
    """The listener must record a completed action with its duration;
    records survive until detach."""
    lis = MetricsListener().attach(spark)
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        # listener callbacks are asynchronous — poll briefly
        for _ in range(40):
            if lis.records:
                break
            time.sleep(0.25)
        assert lis.records, "no metrics recorded"
        rec = lis.records[-1]
        assert rec.get("duration_ns", 0) > 0
        assert "error" not in rec
    finally:
        lis.detach(spark)
