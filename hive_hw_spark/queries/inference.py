"""Inferential-statistics operators (SURVEY.md §2 Part B wave 41).

Hypothesis tests and effect-size estimators layered on the descriptive
statistics family (q133 regression, q162 chi-square, q242 z-test, q252
ACF, q254 KS): two-sample location tests (Welch t, Mann-Whitney U),
rank and concordance correlation (Spearman, Kendall tau-b), k-group
variance decomposition (one-way ANOVA), multiple regression (two-feature
OLS via normal equations), process control (EWMA chart), and categorical
association strength (Cramér's V).  Reference analog: the master's
per-round min/max/avg statistics over gathered slave readings
(master.ino:151-169) — these are the corpus-scale inferential
generalizations of "is the fleet's behavior different / related".

Shared scale discipline (the stats.py contract, restated):
- Aggregate the fact table FIRST: every test here reduces the corpus to
  a sufficient-statistic frame (per-group moment sums, per-distinct-value
  counts, calendar-day totals) in ONE partial+final fold; the closed-form
  derivation then runs over a 1-to-few-thousand-row frame.
- No unpartitioned windows: global ranks/cumulatives use the q167/q254
  two-phase discipline — exact percentile bounds define value-range
  buckets as a pure function of the value, per-bucket offsets cumulate
  via a triangular broadcast join, within-bucket windows PARTITION BY
  bucket.  (Oracles state the naive global-window form.)
- Float determinism: per-row products stay in IEEE double (bit-identical
  in both engines), every SUM runs through an exact DECIMAL accumulator
  (associative, map-side combinable), and integer pair/rank products that
  can exceed 2^63 at 100 TB row counts accumulate as DECIMAL(38,0)
  (the q298/q285 overflow lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table

from . import plan_cache, register
from ._util import (
    DEC,
    DECZ,
    dratio_round,
    dround_units,
    sql_dratio_round,
    sql_dround_units,
    sql_units2,
    units2,
)

DEC38 = "decimal(38,0)"


@register(
    "q304",
    oracle="""
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        CAST(SUM(CAST(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN o_totalprice END AS DECIMAL(30,10))) AS DOUBLE)
          AS sx_hi,
        CAST(SUM(CAST(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                 THEN o_totalprice END AS DECIMAL(30,10))) AS DOUBLE)
          AS sx_lo,
        CAST(SUM(CAST(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN o_totalprice * o_totalprice END AS DECIMAL(30,10)))
          AS DOUBLE) AS sxx_hi,
        CAST(SUM(CAST(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                 THEN o_totalprice * o_totalprice END AS DECIMAL(30,10)))
          AS DOUBLE) AS sxx_lo
      FROM orders
    ),
    d AS (
      SELECT n_hi, n_lo,
             sx_hi / n_hi AS m_hi, sx_lo / n_lo AS m_lo,
             (sxx_hi - sx_hi * sx_hi / n_hi) / (n_hi - 1) AS v_hi,
             (sxx_lo - sx_lo * sx_lo / n_lo) / (n_lo - 1) AS v_lo
      FROM s
    )
    SELECT n_hi, n_lo, ROUND(m_hi, 4) AS mean_hi, ROUND(m_lo, 4) AS mean_lo,
           ROUND((m_hi - m_lo) / SQRT(v_hi / n_hi + v_lo / n_lo), 4)
             AS t_stat,
           ROUND(POWER(v_hi / n_hi + v_lo / n_lo, 2)
                 / (POWER(v_hi / n_hi, 2) / (n_hi - 1)
                    + POWER(v_lo / n_lo, 2) / (n_lo - 1)), 4) AS df
    FROM d
    """,
    doc="Welch's two-sample t-test (unequal variances) — do high-"
    "priority orders ('1-URGENT','2-HIGH') carry a different mean "
    "value than the rest?  t and the Welch-Satterthwaite df from "
    "per-group sufficient statistics.  Scale shape: ONE conditional "
    "partial+final fold of the fact table (no join, no shuffle "
    "beyond the single global agg; at 100 TB this is a pure "
    "map-side-combinable pass); per-row x*x stays IEEE double, all "
    "six moment sums accumulate in exact DECIMAL, and the t/df "
    "closed form runs once over the 1-row frame identically in "
    "both engines.",
)
@plan_cache
def q304(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    x = F.col("o_totalprice")
    s = o.agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("n_hi"),
        F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("n_lo"),
        F.sum(F.when(hi, x).cast(DEC)).cast("double").alias("sx_hi"),
        F.sum(F.when(~hi, x).cast(DEC)).cast("double").alias("sx_lo"),
        F.sum(F.when(hi, x * x).cast(DEC)).cast("double").alias("sxx_hi"),
        F.sum(F.when(~hi, x * x).cast(DEC)).cast("double").alias("sxx_lo"),
    )
    n1, n2 = F.col("n_hi"), F.col("n_lo")
    m1 = F.col("sx_hi") / n1
    m2 = F.col("sx_lo") / n2
    v1 = (F.col("sxx_hi") - F.col("sx_hi") * F.col("sx_hi") / n1) / (n1 - 1)
    v2 = (F.col("sxx_lo") - F.col("sx_lo") * F.col("sx_lo") / n2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    return s.select(
        "n_hi",
        "n_lo",
        F.round(m1, 4).alias("mean_hi"),
        F.round(m2, 4).alias("mean_lo"),
        F.round((m1 - m2) / F.sqrt(se1 + se2), 4).alias("t_stat"),
        F.round(
            F.pow(se1 + se2, 2)
            / (F.pow(se1, 2) / (n1 - 1) + F.pow(se2, 2) / (n2 - 1)),
            4,
        ).alias("df"),
    )


@register(
    "q305",
    oracle="""
    WITH cm AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY o_custkey
    ),
    fc AS (
      SELECT freq, CAST(COUNT(*) AS BIGINT) AS c FROM cm GROUP BY freq
    ),
    fr AS (
      SELECT freq,
             CAST(2 * (SUM(c) OVER (ORDER BY freq) - c) + c + 1 AS DOUBLE)
               AS rx2
      FROM fc
    ),
    yr AS (
      SELECT o_custkey,
             CAST(2 * ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
               AS DOUBLE) AS ry2
      FROM cm
    ),
    j AS (
      SELECT rx2, ry2
      FROM cm JOIN fr USING (freq) JOIN yr USING (o_custkey)
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rx2 AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry2 AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 * rx2 AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry2 * ry2 AS DECIMAL(30,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(rx2 * ry2 AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM j
    )
    SELECT n AS n_customers,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 4)
             AS spearman_rho
    FROM s
    """,
    doc="Spearman rank correlation between customer order frequency and "
    "customer revenue — the monotone-association complement to "
    "q133's Pearson (robust to the heavy-tailed revenue "
    "distribution).  Ties: frequency (a small-cardinality count) "
    "uses EXACT average ranks via per-distinct-value counts "
    "(doubled to stay integer: rx2 = 2*cum_before + c + 1); revenue "
    "(continuous) uses a deterministic (rev, custkey) tie-break, "
    "stated identically in both engines.  Scale shape: the fact "
    "folds to per-customer totals in one partial+final agg; "
    "frequency ranks cumulate over the <=|distinct freq| (~22-row) "
    "count frame via a window the optimizer sees as tiny (oracle "
    "states the same form); the GLOBAL revenue rank uses the "
    "q255/q167 two-phase discipline — percentile bounds bucket rev "
    "as a pure function of the value, per-bucket offsets via a "
    "triangular broadcast join, row_number windows PARTITIONED BY "
    "bucket.  Rank products stay IEEE double, sums in exact "
    "DECIMAL, Pearson-on-ranks closed form runs on one row.",
)
@plan_cache
def q305(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # cm feeds the freq-rank fold, the percentile bounds and the
    # bucketed chain; bucketed feeds the bucket totals and the ranked
    # pass — 8 orders scans in one plan without materialization
    # (scan-dup probe).
    cm = _managed_persist(
        "q305_cm",
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("rev"),
        ),
    )
    # Frequency average ranks over the tiny distinct-count frame:
    # triangular broadcast join (bounded by |distinct freq|, ~22 rows).
    fc = cm.groupBy("freq").agg(F.count(F.lit(1)).alias("c"))
    fc2 = fc.select(F.col("freq").alias("freq2"), F.col("c").alias("c2"))
    fr = (
        fc.join(F.broadcast(fc2), F.col("freq2") < F.col("freq"), "left")
        .groupBy("freq", "c")
        .agg(F.coalesce(F.sum("c2"), F.lit(0)).alias("cb"))
        .select(
            "freq",
            (2 * F.col("cb") + F.col("c") + 1).cast("double").alias("rx2"),
        )
    )
    # Global revenue rank: two-phase percentile-bucket discipline.
    bounds = cm.agg(
        F.expr(
            "percentile(rev, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = _managed_persist(
        "q305_bucketed",
        cm.crossJoin(F.broadcast(bounds)).select(
            "o_custkey",
            "freq",
            "rev",
            F.expr("size(filter(bs, b -> b < rev))").alias("bk"),
        ),
    )
    btot = bucketed.groupBy("bk").agg(F.count(F.lit(1)).alias("bn"))
    b2 = btot.select(F.col("bk").alias("bk2"), F.col("bn").alias("bn2"))
    offsets = (
        btot.join(F.broadcast(b2), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(F.coalesce(F.sum("bn2"), F.lit(0)).alias("off"))
    )
    wb = Window.partitionBy("bk").orderBy("rev", "o_custkey")
    ranked = (
        bucketed.join(F.broadcast(offsets), "bk")
        .withColumn(
            "ry2",
            (2 * (F.col("off") + F.row_number().over(wb))).cast("double"),
        )
        .join(F.broadcast(fr), "freq")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rx2").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("ry2").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast(DEC))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast(DEC))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast(DEC))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    return s.select(
        n.alias("n_customers"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            4,
        ).alias("spearman_rho"),
    )


@register(
    "q306",
    oracle="""
    WITH vc AS (
      SELECT value AS v,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS c2
      FROM events
      WHERE event_type IN ('error', 'click') AND value IS NOT NULL
      GROUP BY v
    ),
    cum AS (
      SELECT v, c1, c2,
             CAST(SUM(c2) OVER (ORDER BY v) - c2 AS BIGINT) AS cb2
      FROM vc
    ),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(CAST(c1 * (2 * cb2 + c2) AS DECIMAL(38,0)))
               AS DOUBLE) AS u1x2,
             CAST(SUM(CAST((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)
                  AS DECIMAL(38,0))) AS DOUBLE) AS tie3
      FROM cum
    ),
    d AS (
      SELECT n1, n2, u1x2 / 2 AS u1,
             CAST(n1 AS DOUBLE) * n2 / 2 AS mu,
             SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                  * ((n1 + n2 + 1)
                     - tie3 / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))
               AS sigma
      FROM s
    )
    SELECT n1, n2, ROUND(u1, 4) AS u_stat,
           CASE WHEN (n1 + n2) > 1 AND sigma <> 0
                THEN ROUND((u1 - mu) / sigma, 4)
                ELSE NULL END AS z_stat
    FROM d
    """,
    doc="Mann-Whitney U rank-sum test — are 'error' event values "
    "stochastically larger than 'click' values?  The distribution-"
    "free two-sample location test next to q304's parametric Welch "
    "t and q254's KS.  U1 kept EXACT as the integer 2*U1 = "
    "Sigma_v c1(v)*(2*cum2_before(v) + c2(v)) over per-distinct-"
    "value conditional counts (ties contribute the half-credit c2/2 "
    "term without any float), with the tie-corrected normal "
    "approximation z = (U1 - n1*n2/2)/sigma.  Scale shape: the "
    "corpus folds to per-distinct-value counts first; the running "
    "cumulative uses the q254 two-phase discipline (percentile-"
    "bounded buckets, triangular offset join, bucket-partitioned "
    "windows; oracle states the naive global window); pair products "
    "n1*n2 and t^3 tie terms accumulate as DECIMAL(38,0) — at "
    "100 TB row counts (n ~ 10^9+) the BIGINT closed form would "
    "overflow 2^63 (the q298 lesson).",
)
@plan_cache
def q306(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("error", "click") & F.col("value").isNotNull()
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # q254's discipline (6 events scans in the plan probe): vc feeds
    # bounds + bucketed; bucketed feeds the bucket totals + cum chain.
    vc = _managed_persist(
        "q306_vc",
        ev.groupBy(F.col("value").alias("v")).agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        ),
    )
    bounds = vc.agg(
        F.expr(
            "percentile(v, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = _managed_persist(
        "q306_bucketed",
        vc.crossJoin(F.broadcast(bounds)).select(
            "v",
            "c1",
            "c2",
            F.expr("size(filter(bs, b -> b < v))").alias("bk"),
        ),
    )
    btot = bucketed.groupBy("bk").agg(F.sum("c2").alias("b2"))
    bo = btot.select(F.col("bk").alias("bk2"), F.col("b2").alias("e2"))
    offsets = (
        btot.join(F.broadcast(bo), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(F.coalesce(F.sum("e2"), F.lit(0)).alias("o2"))
    )
    wb = Window.partitionBy("bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = F.col("c1") + F.col("c2")
    cum = (
        bucketed.withColumn("w2", F.sum("c2").over(wb))
        .join(F.broadcast(offsets), "bk")
        .withColumn("cb2", (F.col("o2") + F.col("w2") - F.col("c2")).cast("long"))
    )
    s = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum((F.col("c1") * (2 * F.col("cb2") + F.col("c2"))).cast(DEC38))
        .cast("double")
        .alias("u1x2"),
        F.sum((t * t * t - t).cast(DEC38)).cast("double").alias("tie3"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("u1x2") / 2
    mu = n1.cast("double") * n2 / 2
    sigma = F.sqrt(
        n1.cast("double")
        * n2
        / 12
        * (
            (n1 + n2 + 1)
            - F.col("tie3") / ((n1 + n2).cast("double") * (n1 + n2 - 1))
        )
    )
    # All-tied / tiny-sample guard (q330/q372 class, extended r12;
    # NESTED per the r12 advice): one distinct value makes the tie
    # correction cancel sigma to exactly 0, and n1+n2 <= 1 zeroes the
    # tie divisor — Spark ANSI raises where DuckDB yields NaN/inf.
    # Spark does not contractually short-circuit And, so the
    # sigma-bearing comparison (which divides by (n1+n2)(n1+n2-1))
    # lives one F.when deeper: CaseWhen guarantees inner-branch
    # predicates only evaluate once n1+n2 > 1 held.
    return s.select(
        "n1",
        "n2",
        F.round(u1, 4).alias("u_stat"),
        F.when(
            (n1 + n2) > 1,
            F.when(sigma != 0, F.round((u1 - mu) / sigma, 4)),
        ).alias("z_stat"),
    )


@register(
    "q307",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    g AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(cents AS HUGEINT)) AS sx_u,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sxx_u
      FROM c GROUP BY o_orderpriority
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             SUM(sx_u) AS sx_all,
             SUM(sxx_u) AS sxx_all,
             SUM({sql_dround_units('sx_u * sx_u', 'n')}) AS sbn_u
      FROM g
    ),
    d AS (
      SELECT k, n_total,
             sbn_u - {sql_dround_units('sx_all * sx_all', 'n_total')}
               AS ssb_u,
             sxx_all - sbn_u AS ssw_u
      FROM s
    )
    SELECT k AS k_groups, n_total,
           {sql_dratio_round('ssb_u', '10000')} AS ss_between,
           {sql_dratio_round('ssw_u', '10000')} AS ss_within,
           {sql_dratio_round('ssb_u * (n_total - k)', 'ssw_u * (k - 1)')}
             AS f_stat,
           {sql_dratio_round('ssb_u', 'ssb_u + ssw_u')} AS eta_sq
    FROM d
    """,
    doc="One-way ANOVA F-test — does mean order value differ across the "
    "five order priorities?  Between/within sum-of-squares from "
    "per-group sufficient statistics (SSB = Sigma sx_g^2/n_g - "
    "(Sigma sx)^2/N, SSW = Sigma sxx - Sigma sx_g^2/n_g), F and "
    "eta-squared effect size.  Scale shape: ONE partial+final "
    "group-by fold of the fact table to a k=5-row moment frame. "
    "Float discipline (r10, driver-red in r9): all moments are "
    "exact INTEGERS — prices as cents, squares as cents^2 held in "
    "DECIMAL(38,0)/HUGEINT — and every division is the exact "
    "half-up integer division of dround_units/dratio_round. The "
    "old spelling bounced per-group DECIMAL partials through DOUBLE "
    "and re-cast to DECIMAL at the second fold (Spark rounds that "
    "cast HALF_UP, DuckDB half-even: sx_all differed by 1e-10, "
    "amplified to ~1.4 absolute by sx_all^2), and ROUND(x,4) at "
    "|x|~3e14 is a no-op (double ulp 0.03 > 1e-4), so the driver "
    "hash compared raw ulp noise.",
)
@plan_cache
def q307(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    g = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents.cast("decimal(20,0)")).alias("sx_u"),
            F.sum((cents * cents).cast(DECZ)).alias("sxx_u"),
        )
    )
    sx, n = F.col("sx_u").cast(DECZ), F.col("n").cast(DECZ)
    s = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum(sx).alias("sx_all"),
        F.sum(F.col("sxx_u").cast(DECZ)).alias("sxx_all"),
        F.sum(dround_units((sx * sx).cast(DECZ), n)).alias("sbn_u"),
    )
    d = s.select(
        "k",
        "n_total",
        (
            F.col("sbn_u").cast(DECZ)
            - dround_units(
                (F.col("sx_all") * F.col("sx_all")).cast(DECZ),
                F.col("n_total").cast(DECZ),
            )
        ).alias("ssb_u"),
        (F.col("sxx_all") - F.col("sbn_u")).cast(DECZ).alias("ssw_u"),
    )
    ssb, ssw = F.col("ssb_u"), F.col("ssw_u")
    k, n_tot = F.col("k"), F.col("n_total")
    return d.select(
        k.alias("k_groups"),
        "n_total",
        dratio_round(ssb, F.lit(10000).cast(DECZ)).alias("ss_between"),
        dratio_round(ssw, F.lit(10000).cast(DECZ)).alias("ss_within"),
        dratio_round(
            (ssb * (n_tot - k).cast(DECZ)).cast(DECZ),
            (ssw * (k - 1).cast(DECZ)).cast(DECZ),
        ).alias("f_stat"),
        dratio_round(ssb, (ssb + ssw).cast(DECZ)).alias("eta_sq"),
    )


@register(
    "q308",
    oracle=f"""
    WITH u AS (
      SELECT l_returnflag,
             {sql_units2('l_quantity')} AS x1u,
             {sql_units2('l_discount')} AS x2u,
             {sql_units2('l_extendedprice')} AS yu
      FROM lineitem
    ),
    g AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1u) AS DOUBLE) AS s1,
             CAST(SUM(x2u) AS DOUBLE) AS s2,
             CAST(SUM(yu) AS DOUBLE) AS sy,
             CAST(SUM(x1u * x1u) AS DOUBLE) AS s11,
             CAST(SUM(x2u * x2u) AS DOUBLE) AS s22,
             CAST(SUM(x1u * x2u) AS DOUBLE) AS s12,
             CAST(SUM(x1u * yu) AS DOUBLE) AS s1y,
             CAST(SUM(x2u * yu) AS DOUBLE) AS s2y,
             CAST(SUM(yu * yu) AS DOUBLE) AS syy
      FROM u GROUP BY l_returnflag
    ),
    c AS (
      SELECT l_returnflag, n,
             s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
             s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
             s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy,
             s1 / n AS m1, s2 / n AS m2, sy / n AS my
      FROM g
    ),
    b AS (
      SELECT l_returnflag, n, m1, m2, my, c1y, c2y, cyy,
             CASE WHEN (c11 * c22 - c12 * c12) <> 0
                  THEN (c1y * c22 - c2y * c12)
                       / (c11 * c22 - c12 * c12) ELSE NULL END AS b1,
             CASE WHEN (c11 * c22 - c12 * c12) <> 0
                  THEN (c2y * c11 - c1y * c12)
                       / (c11 * c22 - c12 * c12) ELSE NULL END AS b2
      FROM c
    )
    SELECT l_returnflag, n,
           ROUND((my - b1 * m1 - b2 * m2) / 100.0, 4) AS b0,
           ROUND(b1, 4) AS b_qty, ROUND(b2, 4) AS b_disc,
           CASE WHEN cyy <> 0
                THEN ROUND((b1 * c1y + b2 * c2y) / cyy, 4)
                ELSE NULL END AS r2
    FROM b ORDER BY l_returnflag
    """,
    doc="Two-feature OLS via normal equations — extended price regressed "
    "on quantity and discount per return flag: the multiple-"
    "regression generalization of q133's simple regression, solved "
    "in closed form (centered 2x2 system by Cramer's rule) from one "
    "pass of sufficient statistics; reports intercept, both "
    "coefficients, and R^2.  Declared semantics: all three measures "
    "are QUANTIZED AT INGEST to 1e-2 units (units2 — lossless, "
    "lineitem values exact at 2 dp); per-row cross products are LONG "
    "multiplies inside codegen accumulating in DECIMAL(38,0) (the "
    "r12 fixed-point discipline ported to moment folds, r13 — "
    "replaces the per-row double->DECIMAL(30,10) cast), and the "
    "scale-0 sum->double casts are correctly rounded in BOTH "
    "engines.  Unit scales cancel in b1/b2/R^2 (y and x scale "
    "together); b0 unscales by /100 with identical op order in both "
    "engines.  Scale shape: ONE partial+final group-by fold of the "
    "fact table to a 3-row, 10-moment frame (pure map-side-"
    "combinable; no second shuffle); the matrix solve runs per row "
    "of the tiny frame identically in both engines.",
)
@plan_cache
def q308(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        "l_returnflag",
        units2(F.col("l_quantity")).alias("x1u"),
        units2(F.col("l_discount")).alias("x2u"),
        units2(F.col("l_extendedprice")).alias("yu"),
    )
    x1, x2, y = F.col("x1u"), F.col("x2u"), F.col("yu")

    def ds(c, name):
        return F.sum(c.cast(DECZ)).cast("double").alias(name)

    g = u.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        ds(x1, "s1"),
        ds(x2, "s2"),
        ds(y, "sy"),
        ds(x1 * x1, "s11"),
        ds(x2 * x2, "s22"),
        ds(x1 * x2, "s12"),
        ds(x1 * y, "s1y"),
        ds(x2 * y, "s2y"),
        ds(y * y, "syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    # Collinear/constant-feature guard (q330/q372 class, extended r12):
    # a singular normal-equation system or constant target zeroes a
    # divisor — Spark ANSI raises where DuckDB yields NaN/inf. Note
    # Spark's ANSI Divide raises on a ZERO divisor even when the
    # numerator is NULL, so cyy needs its own guard (NULL b1 does not
    # protect r2).
    b1 = F.when(det != 0, (c1y * c22 - c2y * c12) / det)
    b2 = F.when(det != 0, (c2y * c11 - c1y * c12) / det)
    m1, m2, my = F.col("s1") / n, F.col("s2") / n, F.col("sy") / n
    return (
        g.select(
            "l_returnflag",
            "n",
            F.round((my - b1 * m1 - b2 * m2) / F.lit(100.0), 4).alias("b0"),
            F.round(b1, 4).alias("b_qty"),
            F.round(b2, 4).alias("b_disc"),
            F.when(
                cyy != 0, F.round((b1 * c1y + b2 * c2y) / cyy, 4)
            ).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q309",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY day
    ),
    gstat AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE) AS s,
             CAST(SUM(CAST(rev * rev AS DECIMAL(30,10))) AS DOUBLE) AS ss
      FROM daily
    ),
    ew AS (
      SELECT d.day, MAX(d.rev) AS rev,
             CAST(SUM(CAST(d2.rev * POWER(0.5,
                      date_diff('day', d2.day, d.day))
                    AS DECIMAL(30,10))) AS DOUBLE)
             / CAST(SUM(CAST(POWER(0.5,
                      date_diff('day', d2.day, d.day))
                    AS DECIMAL(30,10))) AS DOUBLE) AS ewma
      FROM daily d JOIN daily d2
        ON d2.day BETWEEN d.day - 19 AND d.day
      GROUP BY d.day
    )
    SELECT CAST(day AS VARCHAR) AS day, ROUND(rev, 4) AS rev,
           ROUND(ewma, 4) AS ewma,
           CASE WHEN n > 1 THEN
             CAST(CASE WHEN ABS(ewma - s / n)
                    > 3 * SQRT((ss - s * s / n) / (n - 1)) * SQRT(1.0 / 3)
                  THEN 1 ELSE 0 END AS INT)
           ELSE NULL END AS ooc
    FROM ew, gstat ORDER BY day
    """,
    doc="EWMA control chart on daily revenue — q260's truncated "
    "exponentially-weighted average (lambda = 1/2, 20-day support, "
    "0.5^k exact in IEEE double) promoted to a process-control "
    "monitor: each day's EWMA tested against the center line "
    "+/- 3*sigma*sqrt(lambda/(2-lambda)) (= sigma*sqrt(1/3)) control "
    "limits, sigma estimated from global sufficient statistics.  "
    "Scale shape: the fact folds to <=|calendar| daily rows in one "
    "partial+final agg; the 20-term EWMA support is a BROADCAST "
    "band self-join over the tiny calendar frame (calendar x 20 "
    "rows at any corpus size); sigma comes from one more fold of "
    "the same frame, broadcast as a 1-row cross join; weighted sums "
    "accumulate in exact DECIMAL and the flag compare evaluates the "
    "same IEEE expression in both engines.",
)
@plan_cache
def q309(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # daily feeds the global moments and both sides of the decay band
    # join — 3 orders scans in one plan without materialization.
    daily = _managed_persist(
        "q309_daily",
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev")
        ),
    )
    glob = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rev").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("rev") * F.col("rev")).cast(DEC))
        .cast("double")
        .alias("ss"),
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    w = F.pow(F.lit(0.5), F.datediff("day", "day2"))
    ew = (
        daily.join(
            F.broadcast(d2),
            (F.col("day2") >= F.date_sub(F.col("day"), 19))
            & (F.col("day2") <= F.col("day")),
        )
        .groupBy("day")
        .agg(
            F.max("rev").alias("rev"),
            (
                F.sum((F.col("rev2") * w).cast(DEC)).cast("double")
                / F.sum(w.cast(DEC)).cast("double")
            ).alias("ewma"),
        )
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    sigma = F.sqrt((ss - s * s / n) / (n - 1))
    # Single-day guard (q330/q372 class, extended r12): n==1 zeroes
    # sigma's n-1 divisor — Spark ANSI raises where DuckDB yields NaN;
    # the control flag is undefined, NULL in both engines.
    return (
        ew.crossJoin(F.broadcast(glob))
        .select(
            F.col("day").cast("string").alias("day"),
            F.round("rev", 4).alias("rev"),
            F.round("ewma", 4).alias("ewma"),
            F.when(
                n > 1,
                F.when(
                    F.abs(F.col("ewma") - s / n)
                    > 3 * sigma * F.sqrt(F.lit(1.0) / 3),
                    1,
                ).otherwise(0),
            )
            .cast("int")
            .alias("ooc"),
        )
        .orderBy("day")
    )


@register(
    "q310",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(30,10))) AS DOUBLE) AS rev,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM lineitem GROUP BY 1
    ),
    p AS (
      SELECT CASE WHEN (a.rev - b.rev) * (a.vol - b.vol) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.rev - b.rev) * (a.vol - b.vol) < 0
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.vol = b.vol THEN 1 ELSE 0 END AS ty
      FROM m a JOIN m b ON a.month < b.month
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(conc) AS BIGINT) AS nc,
             CAST(SUM(disc) AS BIGINT) AS nd,
             CAST(SUM(tx) AS BIGINT) AS ntx,
             CAST(SUM(ty) AS BIGINT) AS nty
      FROM p
    )
    SELECT n0 AS n_pairs, nc AS concordant, nd AS discordant,
           ROUND((nc - nd) / (SQRT(CAST(n0 - ntx AS DOUBLE))
                              * SQRT(CAST(n0 - nty AS DOUBLE))), 4)
             AS kendall_tau_b
    FROM s
    """,
    doc="Kendall tau-b concordance between monthly revenue and monthly "
    "line-item volume — the pairwise-concordance complement to "
    "q305's Spearman (tau-b's tie terms make it exact on the "
    "integer volume axis).  Scale shape: the fact folds to a "
    "<=|calendar months| (~84-row) frame in one partial+final agg; "
    "the O(m^2) pair enumeration is a triangular BROADCAST self-"
    "join over that tiny frame (~3.5k pairs at any corpus size — "
    "the q253 discipline), concordant/discordant/tie counts are "
    "exact integers, and the closed form runs once.",
)
@plan_cache
def q310(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 lineitem scans): both sides of the
    # month-pair cross join rebuilt the monthly fold. Persist it; the
    # Kendall pair expansion runs on |months|^2 rows.
    m = _managed_persist(
        "q310_m",
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.trunc(F.col("l_shipdate"), "month").alias("month"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            )
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).cast("long").alias("vol"),
        ),
    )
    b = m.select(
        F.col("month").alias("month2"),
        F.col("rev").alias("rev2"),
        F.col("vol").alias("vol2"),
    )
    pairs = m.join(F.broadcast(b), F.col("month") < F.col("month2"))
    prod = (F.col("rev") - F.col("rev2")) * (F.col("vol") - F.col("vol2"))
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("long").alias("nd"),
        F.sum(F.when(F.col("rev") == F.col("rev2"), 1).otherwise(0))
        .cast("long")
        .alias("ntx"),
        F.sum(F.when(F.col("vol") == F.col("vol2"), 1).otherwise(0))
        .cast("long")
        .alias("nty"),
    )
    n0, nc, nd = F.col("n0"), F.col("nc"), F.col("nd")
    return s.select(
        n0.alias("n_pairs"),
        nc.alias("concordant"),
        nd.alias("discordant"),
        F.round(
            (nc - nd)
            / (
                F.sqrt((n0 - F.col("ntx")).cast("double"))
                * F.sqrt((n0 - F.col("nty")).cast("double"))
            ),
            4,
        ).alias("kendall_tau_b"),
    )


@register(
    "q311",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
               AS wd,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS r FROM obs
           GROUP BY 1),
    ct AS (SELECT wd, CAST(SUM(c) AS BIGINT) AS cc FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT rt.event_type, ct.wd, rt.r, ct.cc, COALESCE(obs.c, 0) AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.wd = ct.wd
    ),
    chi AS (
      SELECT CAST(SUM(CAST(POWER(o - CAST(r AS DOUBLE) * cc / n.n, 2)
                           / (CAST(r AS DOUBLE) * cc / n.n)
                  AS DECIMAL(30,10))) AS DOUBLE) AS chi2,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS rdim,
             CAST(COUNT(DISTINCT wd) AS BIGINT) AS cdim
      FROM cells, n
    )
    SELECT n.n AS n_events, rdim AS n_types, cdim AS n_weekdays,
           ROUND(chi2, 4) AS chi2,
           CASE WHEN LEAST(rdim, cdim) > 1
                THEN ROUND(SQRT(chi2
                       / (n.n * (LEAST(rdim, cdim) - 1))), 4)
                ELSE NULL END AS cramers_v
    FROM chi, n
    """,
    doc="Cramér's V association strength for the event-type x weekday "
    "contingency table — the normalized effect size on top of "
    "q162's raw chi-square (V in [0,1] is comparable across table "
    "shapes).  Weekday derives from epoch-day modulo 7 (the q278 "
    "cross-engine discipline — dayofweek()'s week origin differs "
    "between engines).  Zero cells matter: the contingency frame is "
    "densified via margin cross join + left join so absent "
    "(type, weekday) combinations contribute their full expected-"
    "count term in BOTH engines.  Scale shape: ONE partial+final "
    "fold of the corpus to the <= r*c (35-row) contingency frame; "
    "margins and N are 1-to-7-row broadcast folds of that frame; "
    "per-cell chi-square terms stay IEEE double and sum in exact "
    "DECIMAL; the closed form runs once.",
)
@plan_cache
def q311(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # obs feeds the row/column margins, the grand total and the cell
    # join — 4 events scans in one plan without materialization.
    obs = _managed_persist(
        "q311_obs",
        ev.groupBy(
            "event_type",
            F.pmod(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
                ),
                F.lit(7),
            ).alias("wd"),
        ).agg(F.count(F.lit(1)).cast("long").alias("c")),
    )
    rt = obs.groupBy("event_type").agg(F.sum("c").cast("long").alias("r"))
    ct = obs.groupBy("wd").agg(F.sum("c").cast("long").alias("cc"))
    ntot = obs.agg(F.sum("c").cast("long").alias("n"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(obs), ["event_type", "wd"], "left")
        .select(
            "event_type",
            "wd",
            "r",
            "cc",
            F.coalesce(F.col("c"), F.lit(0)).alias("o"),
        )
    )
    e = F.col("r").cast("double") * F.col("cc") / F.col("n")
    chi = (
        cells.crossJoin(F.broadcast(ntot))
        .agg(
            F.sum((F.pow(F.col("o") - e, 2) / e).cast(DEC))
            .cast("double")
            .alias("chi2"),
            F.countDistinct("event_type").cast("long").alias("rdim"),
            F.countDistinct("wd").cast("long").alias("cdim"),
            F.max("n").alias("n"),
        )
    )
    return chi.select(
        F.col("n").alias("n_events"),
        F.col("rdim").alias("n_types"),
        F.col("cdim").alias("n_weekdays"),
        F.round("chi2", 4).alias("chi2"),
        # Single-row/column table guard (q330/q372 class, extended r12):
        # LEAST(r,c)-1 == 0 — Spark ANSI raises where DuckDB yields
        # NaN/inf; V is undefined on a 1xK table, NULL both engines.
        F.when(
            F.least("rdim", "cdim") > 1,
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * (F.least("rdim", "cdim") - 1))
                ),
                4,
            ),
        ).alias("cramers_v"),
    )
