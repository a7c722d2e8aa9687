"""Registry-wide float-discipline lint (r9 verdict item 4).

Round 9's three driver-red parity failures (q259/q307/q317) shared two
source patterns:

(a) a double-typed aggregate partial re-cast back to DECIMAL at a later
    fold ("the bounce"). Spark casts a double to DECIMAL by rounding its
    EXACT decimal expansion half-up; DuckDB rescales through binary
    arithmetic, so for large doubles the two engines produce different
    decimals (probed r10: 402653184.00048828125 -> ...4883000 vs
    ...4882944). A re-cast partial that is then SQUARED or multiplied by
    another partial amplifies that divergence by 2*x*delta — the exact
    q307 failure (ss deltas of 0.125/0.25).

(b) ROUND(x, 4) on a double of magnitude >= 1e9, where the ulp swamps
    the rounding granularity and the driver hash compares raw noise.

Rule (b) is enforced at runtime for every oracle comparison
(tests/oracle_harness.py BIG_FLOAT_OK). Rule (a) is enforced here as a
RATCHET: the bounce sites that exist today are inventoried below with
the magnitude analysis that clears them (normalized statistical outputs
divide the divergence back below round(4) visibility); any NEW site
fails this test and must either use the exact integer-unit discipline
(_util.dratio_round / dround_units / cents units) or justify itself by
extending the inventory in the same commit.
"""

from __future__ import annotations

import inspect
import re

from hive_hw_spark.queries import all_queries

# (query, partial_name) pairs where a `.cast("double").alias(name)` (or
# dsum/davg) partial is later re-cast to DECIMAL in the same function.
# All audited r10: every site below feeds a NORMALIZED statistic (mean,
# variance ratio, share, z-score, slope, entropy) where the cast
# divergence delta ~ 1.4e-17*x per value shrinks below 1e-7 at the
# output — invisible at the driver's round(4) hash. Unnormalized big
# outputs are separately gated by BIG_FLOAT_OK at compare() time.
KNOWN_BOUNCE_SITES: frozenset[tuple[str, str]] = frozenset(
    {
        ("q156", "outdeg"),
        ("q178", "x"),
        ("q235", "revenue"),
        ("q240", "revenue"),
        ("q245", "revenue"),
        ("q255", "rev"),
        ("q261", "rev"),
        ("q268", "tot"),
        ("q277", "x"),
        ("q292", "x"),
        ("q292", "y"),
        ("q296", "x"),
        ("q305", "rx2"),
        ("q309", "rev"),
        ("q320", "demand"),
        ("q334", "sx"),
        ("q340", "rev"),
        ("q343", "rev"),
        ("q345", "sx"),
        ("q345", "sxl"),
        ("q345", "x"),
        ("q346", "rev"),
        ("q349", "hs"),
        ("q349", "w"),
        ("q355", "sxa"),
        ("q355", "sxb"),
        ("q355", "x"),
        ("q357", "y"),
        ("q360", "y"),
        ("q366", "x"),
        ("q369", "rs"),
        ("q375", "v"),
        ("q375", "w"),
        ("q381", "q"),
        ("q390", "x"),
        ("q391", "x"),
        ("q398", "p"),
        ("q406", "rev"),
        ("q414", "rev"),
        ("q416", "r"),
        ("q421", "obs"),
        ("q421", "r"),
        ("q429", "x"),
    }
)


def _bounce_sites() -> set[tuple[str, str]]:
    sites: set[tuple[str, str]] = set()
    for name, q in all_queries().items():
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            continue
        doubled = set(
            re.findall(r'\.cast\("double"\)\s*\.alias\(\s*"(\w+)"', src)
        )
        doubled |= set(
            re.findall(r'(?:dsum|davg)\([^)]*\)\s*\.alias\(\s*"(\w+)"', src)
        )
        for x in doubled:
            # DECZ casts are deliberately excluded: `(x * 10^k).cast(DECZ)`
            # over an exact-k-dp double is the SANCTIONED integer-unit
            # discipline (the value is integer-valued, so the cast is
            # exact in both engines); the hazard this lint encodes is the
            # scale-10 DEC re-cast of a full-mantissa double, where the
            # engines' fractional rounding diverges (q307). Each DECZ
            # conversion carries its own exactness analysis in the batch
            # commit that introduced it.
            pats = (
                rf'F\.col\(\s*"{x}"\s*\)[^\n]*?\.cast\(\s*(?:DEC\b|DEC38\b|"decimal\(30)',
                rf'(?:dsum|davg)\(\s*"{x}"',
            )
            if any(re.search(p, src) for p in pats):
                sites.add((name, x))
    return sites


def test_no_new_double_to_decimal_bounce_sites():
    found = _bounce_sites()
    new = found - KNOWN_BOUNCE_SITES
    assert not new, (
        f"NEW double->DECIMAL bounce site(s) {sorted(new)}: a double "
        f"aggregate partial re-cast to DECIMAL diverges across engines "
        f"for large values (Spark exact-expansion half-up vs DuckDB "
        f"binary rescale) and broke q307 in round 9. Use the exact "
        f"integer-unit discipline (_util.dratio_round / dround_units / "
        f"integer cents) or audit the magnitude and extend "
        f"KNOWN_BOUNCE_SITES with the justification."
    )


def test_fixed_queries_stay_bounce_free():
    """The three r9 reds were rewritten to integer units — keep them so."""
    found = _bounce_sites()
    regressed = {s for s in found if s[0] in ("q259", "q307", "q317")}
    assert not regressed, regressed


def test_bounce_site_raw_divergence_below_visibility(spark, sf_dir):
    """Early-warning tripwire for the audited bounce sites: their raw
    (UNrounded) cross-engine divergence must stay well below the
    driver's 0.5e-4 round(4) visibility. The r10 audit measured ZERO
    raw-bit divergence across all 36 site queries on current testdata;
    a future testdata regeneration that pushes a re-cast partial onto a
    divergent cast boundary shows up here as growing raw noise BEFORE
    it can flip a rounded output — at 1e-5 the lint fires while the
    driver hash is still green, leaving a round to convert the site."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as entry
    from tests.oracle_harness import duckdb_conn

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb_conn(sf_dir)
    names = sorted({q for q, _ in KNOWN_BOUNCE_SITES})
    offenders = []
    for name in names:
        got = qs[name](spark, sf_dir).toPandas()
        want = con.execute(osql[name]).df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.sort_values(
            by=list(got.columns), key=lambda s: s.map(str), ignore_index=True
        )
        want = want.sort_values(
            by=list(want.columns), key=lambda s: s.map(str), ignore_index=True
        )
        if len(got) != len(want):
            offenders.append((name, "row count", len(got), len(want)))
            continue
        for c in got.columns:
            if not pd.api.types.is_float_dtype(got[c]) or c not in want.columns:
                continue
            g = got[c].to_numpy(dtype=float)
            w = want[c].to_numpy(dtype=float)
            mask = ~(np.isnan(g) & np.isnan(w))
            d = np.abs(g[mask] - w[mask])
            if d.size and float(d.max()) > 1e-5:
                offenders.append((name, c, float(d.max())))
    assert not offenders, (
        f"raw cross-engine divergence approaching round(4) visibility at "
        f"bounce sites: {offenders} — convert the site to integer units "
        f"(_util.dratio_round / cents) before the driver samples it"
    )


def test_ratchet_inventory_has_no_stale_entries():
    """Every pinned site must still exist — a fixed site leaves the list
    in the same commit, keeping the inventory an honest worklist."""
    found = _bounce_sites()
    stale = KNOWN_BOUNCE_SITES - found
    assert not stale, f"fixed sites to remove from KNOWN_BOUNCE_SITES: {sorted(stale)}"
