"""Local mirror of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL side by side over the same
parquet tables, canonicalizes both results (sort columns by name, sort rows,
round floats), and asserts equality. Catching parity bugs here is cheaper
than waiting for the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hive_hw_spark.catalog import TABLES, table_path

# The driver's value hash is round(4)-DECIMAL-STRING equality: it rounds
# every float to 4 digits and hashes the repr. Round 9 proved the old
# relative-1e-9 gate was ~2000x looser at |x|~2e6 (q259/q307 driver-red,
# q317 latent-red, all invisible locally). Canonicalization and the strict
# compare both use the driver's granularity now.
ROUND = 4


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # Python round (exact-binary-expansion half-even), NOT
            # numpy's scaled round: the driver rounds with Python round()
            # before hashing, and the two disagree at .5e-4 boundaries.
            df[c] = s.map(lambda v: round(v, ROUND) if v == v else v)
        elif pd.api.types.is_datetime64_any_dtype(s):
            # normalize tz + ns/us precision differences between engines
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: round(v, ROUND) if isinstance(v, float) else
                (tuple(round(x, ROUND) if isinstance(x, float) else x for x in v)
                 if isinstance(v, (list, tuple)) else v)
            )
    # Sort primarily on non-float columns: a float that rounds differently
    # across engines inside the 1e-9 compare tolerance must not reorder
    # rows. Floats participate as tie-breakers rounded to the SAME
    # precision the values are compared at — a coarser sort key would let
    # rows that tie under it but differ within the compare precision be
    # ordered differently by the two engines' (stable) sorts.
    non_float = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    floats = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]

    def _key(s: pd.Series) -> pd.Series:
        if pd.api.types.is_float_dtype(s):
            return s.round(ROUND)
        return s.map(str)

    df = df.sort_values(by=non_float + floats, ignore_index=True, key=_key)
    return df


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class: the granularity the driver's hash is sensitive to.

    The driver hashes values through their pandas repr, so BIGINT 100 vs
    DOUBLE 100.0 mismatch (q64, round 3) while int8 vs int64 both print
    '100' and match. Compare at kind level: int / float / bool / datetime,
    and object columns subdivided by their element type — Decimal('1.50')
    reprs differently from 1.5, and date-as-object differs from str, so
    'object' alone would hide repr-divergent pairs (round-4 brief item 6;
    a full sweep found zero such pairs, this keeps it that way).
    """
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object:
        nn = s.dropna()
        if len(nn) == 0:
            return "object"  # indeterminate: all-null column carries no repr
        v = nn.iloc[0]
        import datetime
        import decimal

        import numpy as np
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, datetime.datetime):
            return "datetime"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "seq"
        if isinstance(v, dict):
            return "map"
    return "object"


# Rule-(b) float-discipline gate (r9 verdict item 4): a double output with
# |value| >= 1e9 has ulp >= ~0.12 — a ROUND(x, 4) there compares raw noise
# unless the value reached the output through an exact, engine-identical
# path. Every (query, column) that legitimately emits such values must be
# registered here WITH its justification; anything else is a lint failure
# at compare() time, so the q307 class (big raw sum-of-squares in ambient
# double) can never ship silently again.
BIG_FLOAT_OK: dict[tuple[str, str], str] = {
    ("q136", "valid_to_s"): "epoch seconds — exact integer-derived",
    ("q148", "revenue"): "2dp money total: exact DECIMAL sum cast to "
    "double; exact value is >=4.9e-5 from any round(4) boundary",
    ("q167", "class_rev"): "2dp money total, exact DECIMAL sum (same "
    "argument as q148)",
    ("q255", "total_rev"): "2dp money total, exact DECIMAL sum",
    ("q300", "total_rev"): "2dp money total, exact DECIMAL sum",
    ("q307", "ss_between"): "exact integer cents^2 units end-to-end "
    "(r10 rewrite), rounded in integer arithmetic via dratio_round",
    ("q307", "ss_within"): "exact integer cents^2 units end-to-end",
    ("q317", "cum_rev"): "2dp money cumulative total: exact cents/100 "
    "(same argument as q148); largest cohort can exceed 1e9 at sf0.1 "
    "or after testdata growth",
    ("q371", "var_resid"): "exact integer 1e-4-unit moment fold "
    "(r11 rewrite): residuals are exact 4dp multiples, so the "
    "variance numerator/denominator are exact integers divided via "
    "dratio_round — bit-identical in both engines, zero flake risk",
    ("q416", "revenue"): "2dp money total, exact DECIMAL sum",
}


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    # Row count first: when one engine returns zero rows its columns land on
    # default dtypes, and a kind-mismatch report would mask the clearer
    # row-count error.
    assert len(got) == len(want), f"{name}: row count spark={len(got)} duckdb={len(want)}"
    # Dtype-kind parity BEFORE value canonicalization masks it: the driver's
    # hash sees 100 (BIGINT) != 100.0 (DOUBLE) even when values are equal.
    kind_diffs = [
        (c, _dtype_kind(got[c]), _dtype_kind(want[c]))
        for c in got.columns
        if _dtype_kind(got[c]) != _dtype_kind(want[c])
    ]
    assert not kind_diffs, (
        f"{name}: dtype-kind mismatch (driver hash WILL fail even if values "
        f"match): {[(c, f'spark={g}', f'duckdb={w}') for c, g, w in kind_diffs]}"
    )
    import re as _re

    qtoken = _re.match(r"(q\d+[a-z]?)", name)
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            if qtoken is not None:
                mx = g.abs().max()
                if mx == mx and mx >= 1e9 and (
                    (qtoken.group(1), c) not in BIG_FLOAT_OK
                ):
                    raise AssertionError(
                        f"{name}: col {c} reaches |{mx}| >= 1e9 — double "
                        f"ulp there makes ROUND(x,4) compare raw noise. "
                        f"Either derive it through exact integer/DECIMAL "
                        f"units (see _util.dratio_round) or register the "
                        f"(query, column) in BIG_FLOAT_OK with a "
                        f"justification."
                    )
            # STRICT gate — the driver's actual granularity: values were
            # canonicalized with Python round(x, 4); their reprs must be
            # string-identical. The pre-r10 relative-1e-9 tolerance let
            # q259/q307/q317 ship driver-red while local stayed green; it
            # survives only as a diagnostic tag in the failure message.
            ga = g.astype(float).to_numpy()
            wa = w.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if math.isnan(x) and math.isnan(y):
                    continue
                if repr(x) != repr(y):
                    rel_ok = abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                    tag = (
                        "PASSED — sub-ULP boundary flake"
                        if rel_ok
                        else "also failed"
                    )
                    raise AssertionError(
                        f"{name}: col {c} row {i}: round(4) strings differ: "
                        f"spark={x!r} duckdb={y!r} (legacy relative-1e-9 "
                        f"gate would have {tag})"
                    )
        else:
            same = g.map(str).to_numpy() == w.map(str).to_numpy()
            if not same.all():
                i = int((~same).argmax())
                raise AssertionError(
                    f"{name}: col {c} row {i}: spark={g.iloc[i]!r} duckdb={w.iloc[i]!r}"
                )
