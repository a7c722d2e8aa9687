"""Property tests for the exact-ratio helpers in _util.py (round 10).

dratio_round / sql_dratio_round / dround_units / dec_ratio are the
load-bearing fix for the r9 float-parity class, so they get their own
ground truth here: a Python ``fractions.Fraction`` reference implements
round-half-away-from-zero exactly, and both engines must match it (and
therefore each other) on adversarial inputs — exact .5e-k boundaries,
negatives, huge magnitudes, and hypothesis-generated random pairs.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hive_hw_spark.queries._util import (
    DECZ,
    dratio_round,
    dround_units,
    sql_dratio_round,
    sql_dround_units,
)


def ref_round_ratio(num: int, den: int, ndigits: int = 4) -> float:
    """Round-half-away-from-zero of num/den to ndigits, modeling the
    engines' two-step conversion exactly: the integer quotient q is cast
    to double FIRST (correctly rounded — lossy above 2^53) and then
    divided by 10^ndigits. Both engines share this pipeline, so the
    reference must too; a one-step Fraction-exact division differs in
    the last ulp for q > 2^53 (seen at 2^60/3)."""
    assert den != 0
    sign = -1 if (num < 0) != (den < 0) else 1
    a, d = abs(num), abs(den)
    p = 10**ndigits
    q = (2 * a * p + d) // (2 * d)
    return sign * (float(q) / p)


BOUNDARY_CASES = [
    # (num, den, ndigits) — exact .5e-k boundaries where the engines'
    # double ROUNDs deterministically disagree (the q259 mechanism)
    (1951278653750, 1000000, 4),
    (65375, 100000, 4),
    (-65375, 100000, 4),
    (5, 100000, 4),          # 0.00005 -> 0.0001 half-up
    (-5, 100000, 4),
    (15, 1000, 2),           # 0.015 -> 0.02
    (125, 1000, 2),          # 0.125 -> 0.13 (dyadic boundary)
    (1, 32, 4),              # 0.03125 -> 0.0313
    (3, 7, 4),               # non-terminating
    (122214417380125, 1000000, 4),
    (2**60, 3, 4),           # huge
    (0, 5, 4),
    (12345, 2, 4),           # x.5 exact, no rounding needed
    (7, 2000000, 6),         # 0.0000035 -> 0.000004 at 6dp
    (-7, 2000000, 6),
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_eval(spark, cases):
    df = spark.createDataFrame(
        [(str(n), str(d), k) for n, d, k in cases], "n string, d string, k int"
    ).select(F.col("n").cast(DECZ).alias("n"), F.col("d").cast(DECZ).alias("d"), "k")
    out = []
    for k in sorted({c[2] for c in cases}):
        sub = df.where(F.col("k") == k).select(
            dratio_round(F.col("n"), F.col("d"), k).alias("x")
        )
        out.extend((k, r.x) for r in sub.collect())
    return out


def test_boundary_cases_match_fraction_reference(spark, duck):
    for n, d, k in BOUNDARY_CASES:
        want = ref_round_ratio(n, d, k)
        got_duck = duck.execute(
            "SELECT "
            + sql_dratio_round(f"CAST({n} AS HUGEINT)", f"CAST({d} AS HUGEINT)", k)
        ).fetchone()[0]
        assert repr(got_duck) == repr(want), (n, d, k, got_duck, want)
    # Spark side in one pass per ndigits
    by_k = {}
    for n, d, k in BOUNDARY_CASES:
        by_k.setdefault(k, []).append((n, d, k))
    for k, cases in by_k.items():
        df = spark.createDataFrame(
            [(str(n), str(d)) for n, d, _ in cases], "n string, d string"
        ).select(
            F.col("n").cast(DECZ).alias("n"), F.col("d").cast(DECZ).alias("d")
        )
        got = [r.x for r in df.select(
            dratio_round(F.col("n"), F.col("d"), k).alias("x")
        ).collect()]
        for (n, d, _), g in zip(cases, got):
            assert repr(g) == repr(ref_round_ratio(n, d, k)), (n, d, k, g)


@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(min_value=-(10**15), max_value=10**15),
    den=st.integers(min_value=1, max_value=10**9),
    k=st.sampled_from([2, 4, 6]),
)
def test_duckdb_matches_fraction_reference(duck, num, den, k):
    from hypothesis import assume

    # Parity contract: the scaled quotient q = |num/den|*10^k must stay
    # under 2^63. DuckDB converts int128->double by 2^64-halves (upper *
    # 2^64 + lower, two roundings), so above ~2^64 its cast drifts from
    # the correctly-rounded float() that Spark's decimal cast matches
    # (hypothesis-found: q=2.25e19 prints ...840.996 vs ...841.0).
    # Registry headroom: the largest plain-dratio quotient is q307
    # ss_within at 3.1e18 (sf0.01).
    assume(abs(num) * 10**k < den * (1 << 63))
    got = duck.execute(
        "SELECT "
        + sql_dratio_round(f"CAST({num} AS HUGEINT)", f"CAST({den} AS HUGEINT)", k)
    ).fetchone()[0]
    assert repr(got) == repr(ref_round_ratio(num, den, k)), (num, den, k, got)


def test_spark_matches_fraction_on_random_grid(spark):
    # deterministic pseudo-random grid (no hypothesis-Spark per-example
    # round trips: one createDataFrame, one collect)
    import random

    rng = random.Random(10)
    cases = [
        (rng.randint(-(10**15), 10**15), rng.randint(1, 10**9))
        for _ in range(300)
    ]
    # salt in guaranteed boundary hits: num = den-scaled odd multiples
    cases += [((2 * j + 1) * d, 20000 * d) for j, d in ((3, 7), (11, 13), (99, 1))]
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in cases], "n string, d string"
    ).select(F.col("n").cast(DECZ).alias("n"), F.col("d").cast(DECZ).alias("d"))
    got = [r.x for r in df.select(
        dratio_round(F.col("n"), F.col("d"), 4).alias("x")
    ).collect()]
    for (n, d), g in zip(cases, got):
        assert repr(g) == repr(ref_round_ratio(n, d, 4)), (n, d, g)


def test_dround_units_matches_floor_half_up(spark, duck):
    cases = [(7, 2), (6, 4), (10, 4), (0, 3), (2**40 + 1, 2), (999999, 1000)]
    for n, d in cases:
        want = (2 * n + d) // (2 * d)
        got = duck.execute(
            "SELECT " + sql_dround_units(f"CAST({n} AS HUGEINT)", f"CAST({d} AS HUGEINT)")
        ).fetchone()[0]
        assert int(got) == want, (n, d, got, want)
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in cases], "n string, d string"
    ).select(F.col("n").cast(DECZ).alias("n"), F.col("d").cast(DECZ).alias("d"))
    got = [r.x for r in df.select(
        dround_units(F.col("n"), F.col("d")).alias("x")
    ).collect()]
    for (n, d), g in zip(cases, got):
        assert int(g) == (2 * n + d) // (2 * d), (n, d, g)


def ref_round_ratio_wide(num: int, den: int, ndigits: int = 4) -> float:
    """Reference for the wide variant: the integer quotient is split into
    whole/frac parts BEFORE the double conversion, so each part converts
    exactly while whole < 2^53 (q itself may exceed 2^53)."""
    assert num >= 0 and den > 0
    p = 10**ndigits
    q = (2 * num * p + den) // (2 * den)
    return float(q // p) + float(q % p) / p


def test_dratio_round_wide_matches_reference(spark, duck):
    from hive_hw_spark.queries._util import (
        dratio_round_wide,
        sql_dratio_round_wide,
    )

    cases = [
        # (num, den, k) — nonnegative; includes quotients ABOVE 2^53,
        # where plain dratio_round's q->double conversion diverges
        # between Spark (correctly rounded) and DuckDB (truncating)
        (4444800653656096258, 1000000000, 4),   # ~4.4e9 ratio, q ~4.4e13
        (2**60, 3, 4),                          # q ~3.8e21 — far past 2^53
        (2**53 + 1, 1, 4),                      # q just past 2^53
        (4815302813400067, 1000, 4),            # the q371 sf0.1 shape
        (65375, 100000, 4),                     # .5e-4 boundary half-up
        (5, 100000, 4),
        (0, 5, 4),
        (999999999999999999, 7, 4),
        (123456789, 1, 6),
    ]
    for n, d, k in cases:
        want = ref_round_ratio_wide(n, d, k)
        got_duck = duck.execute(
            "SELECT "
            + sql_dratio_round_wide(
                f"CAST({n} AS HUGEINT)", f"CAST({d} AS HUGEINT)", k
            )
        ).fetchone()[0]
        assert repr(got_duck) == repr(want), ("duck", n, d, k, got_duck, want)
    by_k = {}
    for n, d, k in cases:
        by_k.setdefault(k, []).append((n, d))
    for k, sub in by_k.items():
        df = spark.createDataFrame(
            [(str(n), str(d)) for n, d in sub], "n string, d string"
        ).select(
            F.col("n").cast(DECZ).alias("n"), F.col("d").cast(DECZ).alias("d")
        )
        got = [
            r.x
            for r in df.select(
                dratio_round_wide(F.col("n"), F.col("d"), k).alias("x")
            ).collect()
        ]
        for (n, d), g in zip(sub, got):
            assert repr(g) == repr(ref_round_ratio_wide(n, d, k)), (
                "spark", n, d, k, g,
            )


@settings(max_examples=150, deadline=None)
@given(
    num=st.integers(min_value=0, max_value=10**22),
    den=st.integers(min_value=1, max_value=10**9),
    k=st.sampled_from([2, 4, 6]),
)
def test_duckdb_wide_matches_reference(duck, num, den, k):
    from hypothesis import assume

    from hive_hw_spark.queries._util import sql_dratio_round_wide

    # The helper's contract is |ratio| < 2^53 (the whole part converts
    # exactly). Beyond it, DuckDB's int128->double cast itself stops
    # being correctly rounded (hypothesis-found: whole=2.26e19 casts 4
    # ulp off float()), so no decomposition can help — q371-style
    # callers are bounded far below (documented headroom ~9e15).
    assume(num < den * (1 << 53))
    got = duck.execute(
        "SELECT "
        + sql_dratio_round_wide(
            f"CAST({num} AS HUGEINT)", f"CAST({den} AS HUGEINT)", k
        )
    ).fetchone()[0]
    assert repr(got) == repr(ref_round_ratio_wide(num, den, k)), (
        num, den, k, got,
    )


def test_duckdb_round_double_matches_duckdb(spark, duck):
    """duckdb_round_double must equal DuckDB's native ROUND(double, 4)
    bit-for-bit on adversarial doubles — quantized values whose scaled
    products land exactly on .5 boundaries (the q160/q289 regen-fuzz
    class), plus a jittered pseudo-random grid. Values are shipped to
    BOTH engines as binary doubles (pandas registration), so no
    literal-parsing differences contaminate the comparison."""
    import pandas as pd

    from hive_hw_spark.queries._util import duckdb_round_double

    import random

    rng = random.Random(11)
    vals = []
    # exact .5-product boundaries: k/2 * 1e-4 for odd k
    vals += [(2 * k + 1) / 2 / 10000.0 for k in range(0, 4000, 37)]
    # 2dp money jittered by the fuzz factors (5dp-ish quantized)
    vals += [round(rng.randint(1, 10**6) / 100.0 * f, 10)
             for f in (0.999, 1.001, 1.002)
             for _ in range(200)]
    # continuous
    vals += [rng.uniform(-1e6, 1e6) for _ in range(300)]
    vals += [0.0, -0.00005, 0.00005, 59.090849999999996, 370.17945]

    pdf = pd.DataFrame({"v": vals})
    duck.register("t_round_probe", pdf)
    want = [
        r[0]
        for r in duck.execute(
            "SELECT ROUND(v, 4) FROM t_round_probe"
        ).fetchall()
    ]
    df = spark.createDataFrame(pdf).select(
        duckdb_round_double(F.col("v"), 4).alias("x")
    )
    got = [r.x for r in df.collect()]
    assert len(got) == len(want)
    diffs = [
        (v, g, w) for v, g, w in zip(vals, got, want) if repr(g) != repr(w)
    ]
    assert not diffs, diffs[:10]


def test_units4_matches_sql_units4(spark, duck):
    """units4 / sql_units4 (r12, the q44/q289 fixed-point ingest) must
    agree bit-for-bit: both run the same IEEE sequence (x*1e4, |..|+0.5,
    floor, sign) on the same double, so NO rounding-model divergence is
    possible — this pins the op sequence itself. Values ship to both
    engines as binary doubles via pandas registration."""
    import random

    import pandas as pd

    from hive_hw_spark.queries._util import sql_units4, units4

    rng = random.Random(12)
    vals = []
    # exact .5-unit boundaries (odd k / 2e4) — the r11 flake class
    vals += [(2 * k + 1) / 2 / 10000.0 for k in range(0, 4000, 31)]
    vals += [-(2 * k + 1) / 2 / 10000.0 for k in range(0, 4000, 43)]
    # fuzz-jittered money and continuous doubles
    vals += [round(rng.randint(1, 10**6) / 100.0 * f, 10)
             for f in (0.998, 1.001) for _ in range(150)]
    vals += [rng.uniform(-1e6, 1e6) for _ in range(300)]
    vals += [0.0, -0.0, 0.00005, -0.00005, 2.5, -2.5]

    pdf = pd.DataFrame({"v": vals})
    duck.register("t_units_probe", pdf)
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {sql_units4('v')} FROM t_units_probe"
        ).fetchall()
    ]
    got = [
        r.x
        for r in spark.createDataFrame(pdf)
        .select(units4(F.col("v")).alias("x"))
        .collect()
    ]
    diffs = [
        (v, g, w) for v, g, w in zip(vals, got, want) if g != w
    ]
    assert not diffs, diffs[:10]


def test_iratio_round4_matches_reference_and_sql(spark, duck):
    """iratio_round4 / sql_iratio_round4 (r12): all-LONG half-away
    rounding of num/den in 1e-4 units, against the exact Fraction-free
    integer reference (den > 0, |2*num|+den < 2^53)."""
    from hive_hw_spark.queries._util import (
        iratio_round4,
        sql_iratio_round4,
    )

    def ref(num: int, den: int) -> float:
        sign = -1 if num < 0 else 1
        q = (2 * abs(num) + den) // (2 * den)
        return sign * (float(q) / 10000.0)

    import random

    rng = random.Random(13)
    cases = [
        (0, 1), (5000, 1), (-5000, 1), (1, 2), (-1, 2),
        (15000, 3), (2**50, 997), (-(2**50), 997),
        (65375, 10),  # .5 boundary in units
    ]
    cases += [
        (rng.randint(-(10**14), 10**14), rng.randint(1, 10**8))
        for _ in range(300)
    ]
    # ONE DuckDB pass over the FULL cases list (r12 advice: the old
    # cases[:20] slice meant the 300 random BIGINT cases never
    # validated sql_iratio_round4's // floor-division spelling).
    import pandas as pd

    cases_pdf = pd.DataFrame(cases, columns=["n", "d"]).astype("int64")
    duck.register("t_iratio_probe", cases_pdf)
    duck_got = [
        r[0]
        for r in duck.execute(
            "SELECT "
            + sql_iratio_round4("n", "d")
            + " FROM t_iratio_probe"
        ).fetchall()
    ]
    duck.unregister("t_iratio_probe")
    for (n, d), got_duck in zip(cases, duck_got):
        assert repr(got_duck) == repr(ref(n, d)), ("duck", n, d, got_duck)
    df = spark.createDataFrame(cases, "n long, d long")
    got = [
        r.x
        for r in df.select(
            iratio_round4(F.col("n"), F.col("d")).alias("x")
        ).collect()
    ]
    for (n, d), g in zip(cases, got):
        assert repr(g) == repr(ref(n, d)), ("spark", n, d, g)


def test_usum4_matches_sql_usum4(spark, duck):
    """usum4 / sql_usum4 (r13, dsum4's fixed-point fast path) must agree
    bit-for-bit INCLUDING at magnitudes where the old scale-4 decimal
    cast was the only exact zone boundary (sums > ~9e11): the scale-0
    sum->double cast is correctly rounded in both engines at any
    magnitude and the final /10000.0 is one shared IEEE op. Groups mix
    signs, sub-cent 4dp values, and a >9e11 total."""
    import random

    import pandas as pd

    from hive_hw_spark.queries._util import sql_usum4, usum4

    rng = random.Random(13)
    rows = []
    # group 0: ordinary money (2 dp), group 1: 4 dp values incl. exact
    # .5e-4 boundaries, group 2: large values pushing the sum past 9e11
    # (beyond dsum4's bit-exact zone), group 3: mixed-sign cancellation.
    for _ in range(4000):
        rows.append((0, rng.randint(1, 10**7) / 100.0))
    for k in range(0, 4000, 7):
        rows.append((1, (2 * k + 1) / 2 / 10000.0))
        rows.append((1, rng.randint(1, 10**8) / 10000.0))
    for _ in range(2000):
        rows.append((2, rng.randint(10**10, 10**11) / 100.0))
    for _ in range(3000):
        rows.append((3, rng.choice((-1, 1)) * rng.randint(1, 10**9) / 100.0))
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    assert sum(v for g, v in rows if g == 2) > 9e11
    duck.register("t_usum_probe", pdf)
    want = dict(
        duck.execute(
            f"SELECT g, {sql_usum4('v')} FROM t_usum_probe GROUP BY g"
        ).fetchall()
    )
    duck.unregister("t_usum_probe")
    got = {
        r.g: r.x
        for r in spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(usum4(F.col("v")).alias("x"))
        .collect()
    }
    assert set(got) == set(want)
    diffs = {g: (got[g], want[g]) for g in got if repr(got[g]) != repr(want[g])}
    assert not diffs, diffs
