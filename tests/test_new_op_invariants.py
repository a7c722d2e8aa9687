"""Structural invariants of the wave-29-40 analytics operators.

Oracle parity proves cross-engine agreement; these prove the MATH is
the math — identities that hold by construction and would break under
any future refactor that reorders rounding or mislabels a branch.
"""

from __future__ import annotations

from hive_hw_spark.queries import all_queries


def _rows(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir).collect()


def test_q265_km_survival_is_monotone_nonincreasing(spark, sf_dir):
    rows = _rows("q265", spark, sf_dir)
    surv = [r.survival for r in rows]  # already week-ordered
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)
    # at-risk counts strictly decrease as events/censors accrue
    risk = [r.n_at_risk for r in rows]
    assert all(a > b for a, b in zip(risk, risk[1:]))


def test_q274_growth_accounting_identity(spark, sf_dir):
    rows = _rows("q274", spark, sf_dir)
    # active = new + retained + resurrected, every month
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected, r
    # churned(m) = active(m-1) - retained(m) for consecutive months
    by_month = {r.month: r for r in rows}
    months = sorted(by_month)
    for prev, cur in zip(months, months[1:]):
        p, c = by_month[prev], by_month[cur]
        py, pm = map(int, prev.split("-"))
        cy, cm = map(int, cur.split("-"))
        if (cy * 12 + cm) - (py * 12 + pm) == 1:
            assert c.n_churned == p.n_active - c.n_retained, (prev, cur)


def test_q276_revenue_bridge_identity(spark, sf_dir):
    rows = _rows("q276", spark, sf_dir)
    assert rows, "bridge must cover brands active in both years"
    for r in rows:
        total = r.price_effect + r.volume_effect + r.mix_effect
        assert abs(total - r.delta_rev) < 0.01, r


def test_q292_cuped_reduces_variance(spark, sf_dir):
    rows = _rows("q292", spark, sf_dir)
    assert len(rows) == 2
    for r in rows:
        # var(y - theta x) <= var(y) by construction of the pooled OLS
        # theta (up to per-arm vs pooled slack; allow 5%)
        assert r.var_adj <= r.var_y * 1.05, r
        assert r.n > 0


def test_q259_rfm_scores_cover_declared_range(spark, sf_dir):
    rows = _rows("q259", spark, sf_dir)
    for r in rows:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
    # quintile fences must actually split: at least 3 distinct scores
    # per dimension across segments
    assert len({r.m_score for r in rows}) >= 3
    assert len({r.r_score for r in rows}) >= 3


def test_q267_containment_bounds_and_direction(spark, sf_dir):
    rows = _rows("q267", spark, sf_dir)
    assert rows, "sf0.01 corpus contains near-dup pairs"
    for r in rows:
        assert 0 < r.inter <= r.a_shingles
        assert 0.8 <= r.containment <= 1.0 + 1e-9


def test_q286_anomalies_are_a_strict_subset_of_days(spark, sf_dir):
    anomalies = _rows("q286", spark, sf_dir)
    decomposed = _rows("q278", spark, sf_dir)
    days = {r.day for r in decomposed}
    assert 0 < len(anomalies) < len(decomposed) * 0.05
    for r in anomalies:
        assert r.day in days
        assert r.robust_z > 4.44  # the 3-robust-sigma rule in MAD units
