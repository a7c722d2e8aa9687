"""Statistical / time-series analysis operators (SURVEY.md §2 Part B wave 28).

The inferential-statistics surface a production analytics engine ships on
top of the descriptive aggregates (q133 regression, q162 chi-square, q242
z-test): series autocorrelation, changepoint detection, distribution
comparison (KS), inequality/concentration (Gini), first-digit fraud audit
(Benford), Markov behavior modeling, and multi-touch attribution.
Reference analog: the master's per-round statistics over gathered slave
readings (master.ino:151-169) — these are the corpus-scale
generalizations of "summarize the fleet's behavior numerically".

Shared scale discipline:
- Every operator aggregates the fact table FIRST (daily totals, per-value
  counts, per-customer totals, transition counts) so the statistical
  closed form runs over a calendar/cardinality-bounded frame, never the
  raw corpus.
- No unpartitioned windows: prefix sums over bounded frames use either a
  triangular broadcast self-join (<= ~31 rows: q253) or the q167
  percentile-bucket two-phase discipline (value-cardinality frames:
  q254, q255).
- Float determinism: per-row products stay in IEEE double (identical in
  both engines), every SUM runs through the exact DECIMAL accumulator
  (associative, map-side combinable — the 1000-executor algebra), and
  closed-form derivations run once over the tiny aggregated result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table

from . import plan_cache, register
from ._util import (
    DEC,
    DECZ,
    dec_ratio,
    dratio_round,
    dratio_round_wide,
    dround_units,
    duckdb_round_double,
    sql_dec_ratio,
    sql_dratio_round,
    sql_dround_units,
    sql_dratio_round_wide,
    sql_units2,
    sql_units6,
    units2,
    units6,
)


def _user_day_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, day) distinct activity pairs. Managed-persisted (r14):
    q324 (rolling WAU) and q325 (DAU/MAU stickiness) each consumed this
    fold from two plan branches (2 events scans per query, v2 scan
    probe); the distinct frame is the natural shared materialization —
    far smaller than events, read by all four branches."""
    from hive_hw_spark.queries.llm_ops import _managed_persist

    return _managed_persist(
        "user_day_distinct",
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct(),
    )


def _orders_daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, rev) — exact-DECIMAL daily order revenue. Managed-persisted
    (r14): q252/q260/q272 each consumed this identical fold from BOTH
    sides of a day-pair self-join (2 orders scans per query, v2 scan
    probe); one tiny per-day materialization serves all six branches."""
    from hive_hw_spark.queries.llm_ops import _managed_persist

    return _managed_persist(
        "orders_daily_rev",
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev")
        ),
    )


@register(
    "q252",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY day
    ),
    lags AS (
      SELECT l.lag, d1.rev AS x, d2.rev AS y
      FROM (VALUES (1), (2), (3)) l(lag)
      JOIN daily d1 ON TRUE
      JOIN daily d2 ON d2.day = d1.day + l.lag
    ),
    s AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM lags GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx)
                     * (n_pairs * syy - sy * sy) <> 0
                THEN ROUND((n_pairs * sxy - sx * sy)
                      / SQRT((n_pairs * sxx - sx * sx)
                             * (n_pairs * syy - sy * sy)), 4)
                ELSE NULL END AS acf
    FROM s ORDER BY lag
    """,
    doc="Series autocorrelation — Pearson ACF of the daily-revenue "
    "series at lags 1..3 (the seasonality/momentum diagnostic that "
    "precedes any forecasting model). Scale shape: ONE partial+final "
    "decimal agg folds the fact table to <=|calendar| daily rows "
    "(size fixed by the date range, not the corpus), lagged pairs "
    "come from a BROADCAST self-join on day+k (no window, no sort), "
    "and the Pearson closed form runs on 3 rows of exact-DECIMAL "
    "sufficient statistics (q133's discipline: per-pair products in "
    "IEEE double — identical in both engines — summed in associative "
    "decimal).",
)
@plan_cache
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _orders_daily_rev(spark, sf_dir)
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(d2),
            F.expr("date_add(day, CAST(lag AS INT))") == F.col("day2"),
        )
        .select("lag", F.col("rev").alias("x"), "y")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
    )
    n = F.col("n_pairs")
    # Constant-series guard (q330/q372 class, extended r12): zero
    # variance at either lag end zeroes the divisor — Spark-4 ANSI
    # raises DIVIDE_BY_ZERO where DuckDB yields NaN/inf, so both
    # engines agree on NULL first.
    vprod = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select(
        "lag",
        "n_pairs",
        F.when(
            vprod != 0,
            F.round(
                (n * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(vprod),
                4,
            ),
        ).alias("acf"),
    ).orderBy("lag")


@register(
    "q253",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(c) AS BIGINT) AS total FROM daily
    ),
    cum AS (
      SELECT day, c,
             CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS p,
             CAST(COUNT(*) OVER (ORDER BY day) AS BIGINT) AS idx
      FROM daily
    )
    SELECT day, c AS n_events,
           CAST(n_days * p - idx * total AS BIGINT) AS d_stat,
           CAST(ABS(n_days * p - idx * total)
                = (SELECT MAX(ABS(n_days * p - idx * total))
                   FROM cum, tot) AS BOOLEAN) AS is_changepoint
    FROM cum, tot ORDER BY day
    """,
    doc="CUSUM changepoint detection on the daily event-count series: "
    "D_t = n·P_t − t·T (the cumulative deviation from a constant "
    "rate, kept in EXACT integer arithmetic — no float mean, no "
    "drift), with the max-|D| day flagged as the level-shift "
    "changepoint. Scale shape: the corpus folds to <=|calendar| "
    "daily counts in one partial+final agg; the prefix sum P_t and "
    "the day index t both come from ONE triangular broadcast "
    "self-join over that <=31-row frame (no window, no single-task "
    "sort — the oracle states the naive window form); the peak flag "
    "is a 1-row broadcast compare. Integer-exact end to end.",
)
@plan_cache
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # daily feeds the totals fence and both sides of the triangular
    # join; cum feeds the peak fence and the final flag pass — 6
    # events scans in one plan without materialization (scan-dup
    # probe).
    daily = _managed_persist(
        "q253_daily",
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("c")),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("total")
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("c").alias("c2"))
    # one triangular join yields BOTH the prefix sum and the day index
    cum = _managed_persist(
        "q253_cum",
        daily.join(F.broadcast(d2), F.col("day2") <= F.col("day"))
        .groupBy("day", "c")
        .agg(F.sum("c2").alias("p"), F.count(F.lit(1)).alias("idx"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "d_stat",
            (
                F.col("n_days") * F.col("p") - F.col("idx") * F.col("total")
            ).cast("long"),
        ),
    )
    peak = cum.agg(F.max(F.abs(F.col("d_stat"))).alias("peak"))
    return (
        cum.crossJoin(F.broadcast(peak))
        .select(
            "day",
            F.col("c").alias("n_events"),
            "d_stat",
            (F.abs(F.col("d_stat")) == F.col("peak")).alias("is_changepoint"),
        )
        .orderBy("day")
    )


@register(
    "q254",
    oracle="""
    WITH vc AS (
      SELECT value AS v,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c2
      FROM events GROUP BY v
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM vc
    ),
    cum AS (
      SELECT v,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS r1,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS r2
      FROM vc
    ),
    d AS (
      SELECT v, ABS(r1 * n2 - r2 * n1) AS dd FROM cum, tot
    )
    SELECT n1, n2,
           (SELECT MIN(v) FROM d WHERE dd = (SELECT MAX(dd) FROM d))
             AS ks_at,
           ROUND(CAST((SELECT MAX(dd) FROM d) AS DOUBLE) / (n1 * n2), 4)
             AS ks_stat
    FROM tot
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic — error-event values vs "
    "all other events (the distribution-shift test behind data-drift "
    "monitors). D = max_v |F1(v) − F2(v)| kept EXACT as the integer "
    "|r1·n2 − r2·n1| (cross-multiplied ECDFs — no per-step float "
    "division to accumulate error), divided once at the end. Scale "
    "shape: the corpus folds to per-distinct-value conditional counts "
    "first; both running ECDFs then cumulate with the q167 two-phase "
    "discipline — exact percentile bounds define ~8 value-range "
    "buckets as a PURE function of v, per-bucket totals cumulate via "
    "a triangular join over 8 rows, the within-bucket running sums "
    "window PARTITIONED BY bucket (the oracle states the naive "
    "global-window form). Single-row output: n1, n2, the argmax "
    "value (min such v — deterministic), and D/(n1·n2) round(4).",
)
@plan_cache
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    is1 = F.col("event_type") == "error"
    # vc feeds the totals fence, the percentile bounds and the bucketed
    # chain; cum feeds the peak fence and the final argmax — without
    # materialization the events fold re-ran 14x in one plan (scan-dup
    # probe), the worst dup in the registry.
    vc = _managed_persist(
        "q254_vc",
        ev.groupBy(F.col("value").alias("v")).agg(
            F.sum(F.when(is1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(~is1, 1).otherwise(0)).alias("c2"),
        ),
    )
    tot = vc.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    bounds = vc.agg(
        F.expr(
            "percentile(v, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = vc.crossJoin(F.broadcast(bounds)).select(
        "v",
        "c1",
        "c2",
        F.expr("size(filter(bs, b -> b < v))").alias("bk"),
    )
    btot = bucketed.groupBy("bk").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    b2 = btot.select(
        F.col("bk").alias("bk2"), F.col("b1").alias("e1"), F.col("b2").alias("e2")
    )
    offsets = (
        btot.join(F.broadcast(b2), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(
            F.coalesce(F.sum("e1"), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("e2"), F.lit(0)).alias("o2"),
        )
    )
    wb = Window.partitionBy("bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = _managed_persist(
        "q254_cum",
        bucketed.withColumn("w1", F.sum("c1").over(wb))
        .withColumn("w2", F.sum("c2").over(wb))
        .join(F.broadcast(offsets), "bk")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "n1",
            "n2",
            F.abs(
                (F.col("o1") + F.col("w1")) * F.col("n2")
                - (F.col("o2") + F.col("w2")) * F.col("n1")
            )
            .cast("long")
            .alias("dd"),
        ),
    )
    peak = cum.agg(F.max("dd").alias("peak"))
    return (
        cum.crossJoin(F.broadcast(peak))
        .where(F.col("dd") == F.col("peak"))
        .groupBy("n1", "n2")
        .agg(
            F.min("v").alias("ks_at"),
            F.round(
                F.max("dd").cast("double") / (F.col("n1") * F.col("n2")), 4
            ).alias("ks_stat"),
        )
        .select("n1", "n2", "ks_at", "ks_stat")
    )


@register(
    "q255",
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT rev,
             CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS BIGINT)
               AS rnk
      FROM cr
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE) AS total_rev,
             CAST(SUM(CAST(rnk * rev AS DECIMAL(30,10))) AS DOUBLE) AS srr
      FROM rk
    )
    SELECT n_customers, ROUND(total_rev, 2) AS total_rev,
           ROUND((2 * srr - (n_customers + 1) * total_rev)
                 / (n_customers * total_rev), 4) AS gini
    FROM s
    """,
    doc="Gini coefficient of customer-revenue concentration (the "
    "inequality metric behind 'whale' risk reports): G = (2·Σ r·x_r "
    "− (n+1)·Σx) / (n·Σx) over revenue-ascending ranks. Scale shape: "
    "the fact folds to per-customer totals first; the GLOBAL "
    "revenue-ascending rank is computed distributed with the "
    "q167/q41 two-phase discipline — exact percentile bounds define "
    "~8 revenue buckets as a pure function of rev (monotone, so "
    "bucket order IS rank order), per-bucket counts offset via a "
    "triangular join over 8 rows, within-bucket row_number windows "
    "PARTITIONED BY bucket (oracle states the naive global window). "
    "rank·rev products stay in IEEE double (identical both engines), "
    "summed in exact DECIMAL; the closed form runs on one row.",
)
@plan_cache
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # cr feeds the percentile-bounds fence and the bucketed chain;
    # bucketed feeds the bucket totals and the ranked pass — 6 orders
    # scans in one plan without materialization (scan-dup probe).
    cr = _managed_persist(
        "q255_cr",
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev")
        ),
    )
    bounds = cr.agg(
        F.expr(
            "percentile(rev, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = _managed_persist(
        "q255_bucketed",
        cr.crossJoin(F.broadcast(bounds)).select(
            "o_custkey",
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
        .withColumn("rnk", (F.col("off") + F.row_number().over(wb)).cast("long"))
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("rev").cast(DEC)).cast("double").alias("total_rev"),
        F.sum((F.col("rnk") * F.col("rev")).cast(DEC))
        .cast("double")
        .alias("srr"),
    )
    n = F.col("n_customers")
    t = F.col("total_rev")
    return s.select(
        "n_customers",
        F.round(t, 2).alias("total_rev"),
        F.round((2 * F.col("srr") - (n + 1) * t) / (n * t), 4).alias("gini"),
    )


_BENFORD = [
    (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691),
    (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
    (9, 0.045757),
]


@register(
    "q256",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100, 0)
                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
    exp AS (
      SELECT * FROM (VALUES
        (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757)) e(digit, p)
    )
    SELECT CAST(exp.digit AS BIGINT) AS digit,
           COALESCE(n_obs, 0) AS n_obs,
           {sql_dratio_round('COALESCE(n_obs, 0)', 'n')} AS obs_share,
           ROUND(p, 4) AS exp_share,
           ROUND(POWER(COALESCE(n_obs, 0) - n * p, 2) / (n * p), 4)
             AS chi2_term
    FROM exp LEFT JOIN obs ON exp.digit = obs.digit, tot
    ORDER BY digit
    """,
    doc="Benford's-law first-digit audit on order totals (the classic "
    "fabricated-numbers / fraud screen): observed first-significant-"
    "digit shares vs the Benford expectation, with per-digit "
    "chi-square contributions. Determinism: the first digit is "
    "extracted through INTEGER CENTS + string head (never "
    "floor(log10(x)) — libm log10 can straddle a power-of-ten "
    "boundary differently per engine), and the Benford expectations "
    "are shared LITERAL constants, not per-engine log10 calls. Scale "
    "shape: one partial+final count agg folds the corpus to <=9 "
    "rows; the expectation table is a 9-row broadcast; every float "
    "op runs once over 9 rows, identically in both engines.",
)
@plan_cache
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 orders scans): the total fence
    # re-ran the digit fold. Persist the 9-row frame.
    obs = _managed_persist(
        "q256_obs",
        load_table(spark, sf_dir, "orders")
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs")),
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    exp = spark.createDataFrame(_BENFORD, ["digit", "p"]).select(
        F.col("digit").cast("long").alias("digit"), "p"
    )
    return (
        exp.join(F.broadcast(obs), "digit", "left")
        .na.fill({"n_obs": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            dratio_round(
                F.col("n_obs").cast(DECZ), F.col("n").cast(DECZ)
            ).alias("obs_share"),
            F.round(F.col("p"), 4).alias("exp_share"),
            F.round(
                F.pow(F.col("n_obs") - F.col("n") * F.col("p"), 2)
                / (F.col("n") * F.col("p")),
                4,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@register(
    "q257",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    tot AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t
      FROM cnt GROUP BY prev_type
    )
    SELECT cnt.prev_type, next_type, n,
           {sql_dratio_round('n', 't')} AS prob
    FROM cnt JOIN tot ON cnt.prev_type = tot.prev_type
    ORDER BY cnt.prev_type, next_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the behavior model behind next-action prediction and "
    "anomalous-flow detection; completes the sequence family next to "
    "q145's trigram mining and q184's entry-exit pairs). Scale "
    "shape: ONE user_id exchange carries the lag window "
    "(deterministic (ts, event_id) order), the corpus then folds to "
    "<=|types|^2 transition counts in a map-side-combinable agg, and "
    "row-normalization joins the 25-row totals frame BROADCAST — "
    "never a second pass over the fact. Probabilities are single "
    "integer divisions round(4) — identical in both engines.",
)
@plan_cache
def q257(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 events scans): the row-total fence
    # re-ran the lag window + fold. Persist the |types|^2 count frame.
    cnt = _managed_persist(
        "q257_cnt",
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n")),
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("n").cast("long").alias("t"))
    return (
        cnt.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            dratio_round(
                F.col("n").cast(DECZ), F.col("t").cast(DECZ)
            ).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "q258",
    oracle="""
    WITH first_purchase AS (
      SELECT user_id, MIN(ts) AS fp_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT e.user_id, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY e.user_id) AS nt
      FROM events e JOIN first_purchase fp ON e.user_id = fp.user_id
      WHERE e.ts < fp.fp_ts AND e.event_type <> 'purchase'
    ),
    credit AS (
      SELECT event_type AS channel,
             CASE WHEN nt = 1 THEN 1.0
                  WHEN nt = 2 THEN 0.5
                  WHEN rn = 1 OR rn = nt THEN 0.4
                  ELSE 0.2 / (nt - 2) END AS c
      FROM touches
    )
    SELECT channel,
           ROUND(CAST(SUM(CAST(c AS DECIMAL(30,10))) AS DOUBLE), 4)
             AS credit
    FROM credit GROUP BY channel ORDER BY channel
    """,
    doc="Position-based (U-shaped) multi-touch attribution — 40/20/40 "
    "credit across each converting user's pre-purchase touchpoints "
    "(first touch 0.4, last 0.4, middles split 0.2; degenerate "
    "journeys: 1 touch = 1.0, 2 touches = 0.5/0.5). Completes the "
    "attribution family next to q216's last-touch rule. Scale shape: "
    "conversion times reduce per user and join back co-partitioned "
    "on user_id (the window and the join share ONE exchange); "
    "per-touch credits are rational constants computed identically "
    "in both engines (each journey's middle share divides ONE "
    "integer), summed in exact DECIMAL per channel — a 4-row result.",
)
@plan_cache
def q258(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    touches = (
        ev.join(fp, "user_id")
        .where(
            (F.col("ts") < F.col("fp_ts"))
            & (F.col("event_type") != "purchase")
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    credited = (
        touches.withColumn("rn", F.row_number().over(w))
        .withColumn("nt", F.count(F.lit(1)).over(wn))
        .withColumn(
            "c",
            F.when(F.col("nt") == 1, F.lit(1.0))
            .when(F.col("nt") == 2, F.lit(0.5))
            .when(
                (F.col("rn") == 1) | (F.col("rn") == F.col("nt")), F.lit(0.4)
            )
            .otherwise(F.lit(0.2) / (F.col("nt") - 2)),
        )
    )
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(F.round(F.sum(F.col("c").cast(DEC)).cast("double"), 4).alias("credit"))
        .orderBy("channel")
    )


@register(
    "q259",
    oracle=f"""
    WITH per AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS mon_c
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT custkey,
             CAST(date_diff('day', last_day,
                            (SELECT MAX(last_day) FROM per)) AS BIGINT)
               AS rec_days,
             freq, mon_c
      FROM per
    ),
    th AS (
      SELECT quantile_disc(rec_days, 0.2) AS r1,
             quantile_disc(rec_days, 0.4) AS r2,
             quantile_disc(rec_days, 0.6) AS r3,
             quantile_disc(rec_days, 0.8) AS r4,
             quantile_disc(freq, 0.2) AS f1,
             quantile_disc(freq, 0.4) AS f2,
             quantile_disc(freq, 0.6) AS f3,
             quantile_disc(freq, 0.8) AS f4,
             quantile_disc(mon_c, 0.2) AS m1,
             quantile_disc(mon_c, 0.4) AS m2,
             quantile_disc(mon_c, 0.6) AS m3,
             quantile_disc(mon_c, 0.8) AS m4
      FROM m
    ),
    scored AS (
      SELECT CAST(6 - (1 + CAST(rec_days > r1 AS INT)
                         + CAST(rec_days > r2 AS INT)
                         + CAST(rec_days > r3 AS INT)
                         + CAST(rec_days > r4 AS INT)) AS INT) AS r_score,
             CAST(1 + CAST(freq > f1 AS INT) + CAST(freq > f2 AS INT)
                    + CAST(freq > f3 AS INT) + CAST(freq > f4 AS INT)
                  AS INT) AS f_score,
             CAST(1 + CAST(mon_c > m1 AS INT) + CAST(mon_c > m2 AS INT)
                    + CAST(mon_c > m3 AS INT) + CAST(mon_c > m4 AS INT)
                  AS INT) AS m_score,
             mon_c
      FROM m CROSS JOIN th
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dratio_round('SUM(mon_c)', 'COUNT(*) * 100')}
             AS avg_monetary
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="RFM (recency/frequency/monetary) quintile segmentation — the "
    "CRM/marketing staple: each customer scored 1-5 on how recently, "
    "how often, and how much they bought, reported as segment "
    "counts + average spend. Scale shape: the fact table folds to "
    "ONE per-customer agg (single shuffle); quintile boundaries come "
    "from percentile_disc / quantile_disc over that frame (map-side-"
    "combinable counts state — approx_percentile is the documented "
    "100 TB swap, same trade as q47), so the score is a pure "
    "broadcast function of the row (no rank, no global window, "
    "ntile would be an unpartitioned sort). Float discipline (r10, "
    "driver-red in r9): everything is INTEGER — monetary flows as "
    "exact cents, the DISCRETE quantile fences are actual data "
    "values (the old interpolated percentile + double ROUND(4) "
    "fences were the documented latent flake of this family), the "
    "threshold compares are integer compares, and avg_monetary is "
    "the exact half-up integer division of dratio_round (the old "
    "double SUM/COUNT ratio straddled .65375 one ulp apart across "
    "engines).",
)
@plan_cache
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    # per feeds the anchor fence and the RFM frame; m feeds the
    # quintile-threshold fence and the scoring pass — 4 orders scans
    # in one plan without materialization (scan-dup probe).
    per = _managed_persist(
        "q259_per",
        o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            ).alias("mon_c"),
        ),
    )
    anchor = per.agg(F.max("last_day").alias("anchor"))
    m = _managed_persist(
        "q259_m",
        per.crossJoin(F.broadcast(anchor)).select(
            "custkey",
            F.datediff("anchor", "last_day").cast("bigint").alias("rec_days"),
            "freq",
            "mon_c",
        ),
    )
    th = m.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {v})"
            ).alias(f"{a}{i}")
            for v, a in (("rec_days", "r"), ("freq", "f"), ("mon_c", "m"))
            for i, p in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
        ]
    )

    def raw(v, t):
        c = F.lit(1)
        for i in (1, 2, 3, 4):
            c = c + (F.col(v) > F.col(f"{t}{i}")).cast("int")
        return c

    scored = m.crossJoin(F.broadcast(th)).select(
        (F.lit(6) - raw("rec_days", "r")).cast("int").alias("r_score"),
        raw("freq", "f").cast("int").alias("f_score"),
        raw("mon_c", "m").cast("int").alias("m_score"),
        "mon_c",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dratio_round(
                F.sum("mon_c").cast(DECZ),
                (F.count(F.lit(1)) * 100).cast(DECZ),
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q260",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY day
    )
    SELECT CAST(d.day AS VARCHAR) AS day, ROUND(MAX(d.rev), 4) AS rev,
           ROUND(CAST(SUM(CAST(d2.rev * POWER(0.5,
                        date_diff('day', d2.day, d.day))
                      AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(SUM(CAST(POWER(0.5,
                        date_diff('day', d2.day, d.day))
                      AS DECIMAL(30,10))) AS DOUBLE), 4) AS ema
    FROM daily d JOIN daily d2
      ON d2.day BETWEEN d.day - 19 AND d.day
    GROUP BY d.day ORDER BY day
    """,
    doc="Truncated exponentially-weighted moving average of daily "
    "revenue (alpha = 1/2, 20-day support) — the smoothing/"
    "forecast-baseline primitive next to q44's flat moving average "
    "and q142's rolling z-score. Determinism: the recursive EMA "
    "definition is order-dependent and unimplementable as a "
    "mergeable aggregate, so the operator states the CLOSED FORM "
    "with an explicit 20-term support (weights below 2^-19 dropped "
    "identically in both engines, renormalized over the available "
    "window so the series start is unbiased); 0.5^k is EXACT in "
    "IEEE double for every k, per-term products are identical in "
    "both engines, and the weighted sums accumulate in exact "
    "DECIMAL. Scale shape: the fact table folds to <=|calendar| "
    "daily rows in one partial+final agg; the 20-term support is a "
    "BROADCAST band self-join over that tiny frame (no window, no "
    "sort) — at 100 TB the same plan holds because the banded join "
    "size is calendar x 20, independent of the corpus.",
)
@plan_cache
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _orders_daily_rev(spark, sf_dir)
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    w = F.pow(F.lit(0.5), F.datediff("day", "day2"))
    return (
        daily.join(
            F.broadcast(d2),
            (F.col("day2") >= F.date_sub(F.col("day"), 19))
            & (F.col("day2") <= F.col("day")),
        )
        .groupBy("day")
        .agg(
            F.round(F.max("rev"), 4).alias("rev"),
            F.round(
                F.sum((F.col("rev2") * w).cast(DEC)).cast("double")
                / F.sum(w.cast(DEC)).cast("double"),
                4,
            ).alias("ema"),
        )
        .select(F.col("day").cast("string").alias("day"), "rev", "ema")
        .orderBy("day")
    )


@register(
    "q261",
    oracle="""
    WITH sr AS (
      SELECT s_nationkey AS nk, l_suppkey AS sk,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,10))) AS DOUBLE) AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             SUM(CAST(rev AS DECIMAL(30,10))) AS tot,
             CAST(SUM(CAST(rev * rev AS DECIMAL(30,10)))
                  AS DOUBLE) AS sqq
      FROM sr GROUP BY 1
    )
    SELECT n_name AS nation, n_suppliers,
           ROUND(CAST(tot AS DOUBLE), 4) AS total_rev,
           ROUND(10000 * sqq
                 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 4) AS hhi
    FROM agg JOIN nation ON nk = n_nationkey
    ORDER BY nation
    """,
    doc="Herfindahl-Hirschman market-concentration index of supplier "
    "revenue share per nation (the antitrust/market-structure "
    "metric; 10000 = monopoly, ->0 = atomistic) — completes the "
    "concentration family next to q255's Gini and q167's Pareto/ABC "
    "bands. Scale shape: ONE broadcast dim join (supplier) + one "
    "partial+final agg on the supplier key folds the fact table to "
    "|suppliers| rows; the per-nation reduction is a second agg "
    "over that tiny frame; HHI's closed form needs only sum(rev) "
    "and sum(rev^2) — both exact-DECIMAL mergeable partials "
    "(per-supplier squares in IEEE double, identical in both "
    "engines) — so no shares are materialized and no second pass "
    "over the detail happens (the naive form divides every row by "
    "its group total via a window).",
)
@plan_cache
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sr = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            )
            .cast("double")
            .alias("rev")
        )
    )
    agg = sr.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("rev").cast(DEC)).alias("tot"),
        F.sum((F.col("rev") * F.col("rev")).cast(DEC)).cast("double").alias("sqq"),
    )
    return (
        agg.join(F.broadcast(n), F.col("nk") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            F.round(F.col("tot").cast("double"), 4).alias("total_rev"),
            F.round(
                F.lit(10000)
                * F.col("sqq")
                / (F.col("tot").cast("double") * F.col("tot").cast("double")),
                4,
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


@register(
    "q262",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(ROUND(o_totalprice / 1000) AS BIGINT) AS amount_band,
             o_totalprice,
             CAST(o_orderdate AS DATE) AS day, o_orderkey,
             LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_day,
             LAG(o_orderkey) OVER w AS prev_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey,
                     CAST(ROUND(o_totalprice / 1000) AS BIGINT)
                   ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    )
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           amount_band,
           o_totalprice AS amount,
           CAST(prev_day AS VARCHAR) AS first_day,
           CAST(day AS VARCHAR) AS second_day,
           CAST(prev_key AS BIGINT) AS first_orderkey,
           CAST(o_orderkey AS BIGINT) AS second_orderkey,
           CAST(date_diff('day', prev_day, day) AS BIGINT) AS gap_days
    FROM s
    WHERE prev_day IS NOT NULL
      AND date_diff('day', prev_day, day) <= 30
    ORDER BY custkey, second_orderkey
    """,
    doc="Duplicate-payment detection — consecutive orders by the SAME "
    "customer in the SAME rounded $1000 amount band within 30 days "
    "(the accounts-payable fraud/error audit; banding catches "
    "near-identical amounts, and adjacency after the in-group date "
    "sort reports a k-order chain as k-1 suspect pairs, not the "
    "quadratic pair set). Scale shape: ONE exchange on (custkey, "
    "band) carries the whole query — the lag window sorts only "
    "within each tiny group, the ≤30-day filter is row-local, and "
    "no self-join over the fact table exists (the naive form is an "
    "O(n²)-per-group banded self-join). The band is "
    "round(amount/1000) — identical HALF_UP-for-positive rounding "
    "in both engines; dates emit as strings, gaps in exact "
    "integer days.",
)
@plan_cache
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") / 1000).cast("bigint").alias(
            "amount_band"
        ),
        "o_totalprice",
        F.to_date("o_orderdate").alias("day"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey", "amount_band").orderBy(
        "day", "o_orderkey"
    )
    s = o.select(
        "o_custkey",
        "amount_band",
        "o_totalprice",
        "day",
        "o_orderkey",
        F.lag("day").over(w).alias("prev_day"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    )
    return (
        s.where(
            F.col("prev_day").isNotNull()
            & (F.datediff("day", "prev_day") <= 30)
        )
        .select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            "amount_band",
            F.col("o_totalprice").alias("amount"),
            F.col("prev_day").cast("string").alias("first_day"),
            F.col("day").cast("string").alias("second_day"),
            F.col("prev_key").cast("bigint").alias("first_orderkey"),
            F.col("o_orderkey").cast("bigint").alias("second_orderkey"),
            F.datediff("day", "prev_day").cast("bigint").alias("gap_days"),
        )
        .orderBy("custkey", "second_orderkey")
    )


@register(
    "q264",
    oracle="""
    WITH seq AS (
      SELECT event_type AS x,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS y
      FROM events
    ),
    big AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM seq WHERE y IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM big),
    xm AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM big GROUP BY 1),
    ym AS (SELECT y, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM big GROUP BY 1)
    SELECT b.x, b.y, b.c_xy,
           ROUND(LN(CAST(b.c_xy AS DOUBLE) * n / (c_x * c_y)), 4) AS pmi
    FROM big b JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN tot
    ORDER BY x, y
    """,
    doc="Pointwise mutual information of adjacent event-type bigrams "
    "per user session stream — the information-theoretic lift "
    "behind collocation mining and next-action suggestion (PMI > 0: "
    "the transition happens more than independence predicts; "
    "completes the sequence family next to q257's Markov matrix and "
    "q145's trigram mining). Scale shape: ONE user_id exchange "
    "builds adjacent pairs (lead window, per-user sort only), one "
    "partial+final agg folds them to a <=|types|² frame, and ALL "
    "marginals (row, column, grand total) re-aggregate from that "
    "tiny PERSISTED frame — the fact table is scanned exactly once "
    "(the multi-branch recompute rule) and every join below the "
    "fold is a broadcast. One ln per bigram TYPE, round(4).",
)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("x"),
        F.lead("event_type").over(w).alias("y"),
    )
    big = _managed_persist(
        "q264_bigrams",
        seq.where(F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy")),
    )
    tot = big.agg(F.sum("c_xy").alias("n"))
    xm = big.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    ym = big.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    return (
        big.join(F.broadcast(xm), "x")
        .join(F.broadcast(ym), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("n")
                    / (F.col("c_x") * F.col("c_y"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy("x", "y")
    )


@register(
    "q265",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             MIN(CAST(o_orderdate AS DATE)) AS f,
             MAX(CAST(o_orderdate AS DATE)) AS l
      FROM orders GROUP BY 1
    ),
    cu AS (
      SELECT o_custkey,
             CAST(date_diff('day', f, l) // 7 AS BIGINT) AS wk,
             CASE WHEN date_diff('day', l, (SELECT MAX(l) FROM per)) > 90
                  THEN 1 ELSE 0 END AS churn
      FROM per
    ),
    weekly AS (
      SELECT wk, CAST(SUM(churn) AS BIGINT) AS d,
             CAST(SUM(1 - churn) AS BIGINT) AS c
      FROM cu GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM cu),
    risk AS (
      SELECT w.wk, w.d, w.c,
             CAST(n_cust - COALESCE(SUM(p.d + p.c), 0) AS BIGINT)
               AS n_at_risk
      FROM weekly w CROSS JOIN tot
      LEFT JOIN weekly p ON p.wk < w.wk
      GROUP BY w.wk, w.d, w.c, n_cust
    ),
    km AS (
      SELECT t.wk, t.d, t.c, t.n_at_risk,
             CAST(MIN(u.n_at_risk - u.d) AS BIGINT) AS min_open,
             SUM(CAST(CASE WHEN u.d < u.n_at_risk
                      THEN LN(1.0 - CAST(u.d AS DOUBLE) / u.n_at_risk)
                      ELSE 0.0 END AS DECIMAL(30,10))) AS lnsum
      FROM risk t JOIN risk u ON u.wk <= t.wk
      GROUP BY t.wk, t.d, t.c, t.n_at_risk
    )
    SELECT wk AS week, n_at_risk, d AS d_churned, c AS c_censored,
           ROUND(CASE WHEN min_open = 0 THEN 0.0
                 ELSE EXP(CAST(lnsum AS DOUBLE)) END, 4) AS survival
    FROM km ORDER BY week
    """,
    doc="Kaplan-Meier survival curve of customer lifetime (weeks from "
    "first to last order; churn event = inactive for the trailing 90 "
    "days of the dataset, later lifetimes right-CENSORED — the "
    "estimator the naive 'avg customer lifetime' gets wrong by "
    "treating still-active customers as churned). Scale shape: the "
    "fact table folds to one per-customer row, then to <=|weeks| "
    "event rows; at-risk counts AND the KM product both come from "
    "triangular broadcast self-joins over that calendar-bounded "
    "frame (the oracle's window form restated without a global "
    "sort), with the product computed as exp(sum ln(1 - d/n)) — "
    "per-week terms identical in IEEE double in both engines, "
    "summed in exact DECIMAL, with the n=d absorbing state handled "
    "explicitly (Spark ln(0) is NULL, DuckDB -inf — the CASE keeps "
    "both engines on the 0.0 branch).",
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("f"),
        F.max(F.to_date("o_orderdate")).alias("l"),
    )
    anchor = per.agg(F.max("l").alias("anchor"))
    cu = per.crossJoin(F.broadcast(anchor)).select(
        F.expr("CAST(datediff(l, f) DIV 7 AS BIGINT)").alias("wk"),
        F.when(F.datediff("anchor", "l") > 90, 1).otherwise(0).alias("churn"),
    )
    weekly = _managed_persist(
        "q265_weekly",
        cu.groupBy("wk").agg(
            F.sum("churn").cast("bigint").alias("d"),
            F.sum(1 - F.col("churn")).cast("bigint").alias("c"),
        ),
    )
    tot = weekly.agg(F.sum(F.col("d") + F.col("c")).alias("n_cust"))
    p = weekly.select(
        F.col("wk").alias("pwk"), (F.col("d") + F.col("c")).alias("pdc")
    )
    risk = _managed_persist(
        "q265_risk",
        weekly.crossJoin(F.broadcast(tot))
        .join(F.broadcast(p), F.col("pwk") < F.col("wk"), "left")
        .groupBy("wk", "d", "c", "n_cust")
        .agg(F.coalesce(F.sum("pdc"), F.lit(0)).alias("seen"))
        .select(
            "wk",
            "d",
            "c",
            (F.col("n_cust") - F.col("seen")).cast("bigint").alias("n_at_risk"),
        ),
    )
    u = risk.select(
        F.col("wk").alias("uwk"),
        F.col("d").alias("ud"),
        F.col("n_at_risk").alias("un"),
    )
    term = F.when(
        F.col("ud") < F.col("un"),
        F.log(1.0 - F.col("ud").cast("double") / F.col("un")),
    ).otherwise(F.lit(0.0))
    km = (
        risk.join(F.broadcast(u), F.col("uwk") <= F.col("wk"))
        .groupBy("wk", "d", "c", "n_at_risk")
        .agg(
            F.min(F.col("un") - F.col("ud")).cast("bigint").alias("min_open"),
            F.sum(term.cast(DEC)).alias("lnsum"),
        )
    )
    return km.select(
        F.col("wk").alias("week"),
        "n_at_risk",
        F.col("d").alias("d_churned"),
        F.col("c").alias("c_censored"),
        F.round(
            F.when(F.col("min_open") == 0, F.lit(0.0)).otherwise(
                F.exp(F.col("lnsum").cast("double"))
            ),
            4,
        ).alias("survival"),
    ).orderBy("week")


@register(
    "q268",
    oracle="""
    WITH fp AS (
      SELECT user_id, MIN(ts) AS fp_ts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    touches AS (
      SELECT e.user_id, e.event_type AS channel,
             POWER(0.5, date_diff('day', CAST(e.ts AS DATE),
                                  CAST(fp.fp_ts AS DATE)) // 7)
               AS raw
      FROM events e JOIN fp ON e.user_id = fp.user_id
      WHERE e.ts < fp.fp_ts AND e.event_type <> 'purchase'
    ),
    norm AS (
      SELECT user_id,
             CAST(SUM(CAST(raw AS DECIMAL(30,10))) AS DOUBLE) AS tot
      FROM touches GROUP BY 1
    )
    SELECT channel,
           ROUND(CAST(SUM(CAST(raw / tot AS DECIMAL(30,10)))
                 AS DOUBLE), 4) AS credit
    FROM touches JOIN norm USING (user_id)
    GROUP BY channel ORDER BY channel
    """,
    doc="Time-decay multi-touch attribution — each converting user's "
    "pre-purchase touchpoints share 1.0 credit weighted by "
    "0.5^(weeks-before-conversion), completing the attribution "
    "family (q216 last-touch, q258 U-shaped): recent touches earn "
    "more, nothing earns zero. Determinism: the decay exponent is "
    "an INTEGER week count (0.5^k is exact in IEEE double for every "
    "k; a fractional-day exponent would hit pow()'s 1-ulp libm "
    "slack), per-user normalizers and per-channel totals accumulate "
    "in exact DECIMAL. Scale shape: conversion times reduce per "
    "user and join back co-partitioned on user_id (one exchange "
    "shared by the join, the normalizer agg, and the share join); "
    "the channel rollup is a second tiny agg.",
)
def q268(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    touches = _managed_persist(
        "q268_touches",
        ev.join(fp, "user_id")
        .where((F.col("ts") < F.col("fp_ts")) & (F.col("event_type") != "purchase"))
        .select(
            "user_id",
            F.col("event_type").alias("channel"),
            F.pow(
                F.lit(0.5),
                F.expr(
                    "CAST(datediff(CAST(fp_ts AS DATE), CAST(ts AS DATE)) "
                    "DIV 7 AS INT)"
                ),
            ).alias("raw"),
        ),
    )
    norm = touches.groupBy("user_id").agg(
        F.sum(F.col("raw").cast(DEC)).cast("double").alias("tot")
    )
    return (
        touches.join(norm, "user_id")
        .groupBy("channel")
        .agg(
            F.round(
                F.sum((F.col("raw") / F.col("tot")).cast(DEC)).cast("double"),
                4,
            ).alias("credit")
        )
        .orderBy("channel")
    )


@register(
    "q269",
    oracle="""
    WITH td AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c, MAX(ts) AS mx
      FROM events GROUP BY 1, 2
    ),
    g AS (SELECT MAX(day) AS gmax FROM td)
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n_events,
           strftime(MAX(mx), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(date_diff('day', MAX(day), gmax) AS BIGINT)
             AS staleness_days,
           ROUND(CAST(SUM(c) FILTER (WHERE day >= gmax - 6) AS DOUBLE)
                 / CAST(SUM(c) AS DOUBLE), 4) AS share_last_7d
    FROM td CROSS JOIN g
    GROUP BY event_type, gmax ORDER BY event_type
    """,
    doc="Ingestion-freshness / data-staleness audit per event type — "
    "last-seen timestamp, staleness vs the feed's global high-water "
    "mark, and the share of volume in the trailing 7 days (a "
    "collapsing share flags a dying upstream before a hard gap "
    "appears; the ops guardrail next to q112's value-quality audit "
    "and q263's skew report). Reference analog: the master's "
    "missing-node error report (master.ino:552-574) generalized to "
    "per-source feed health. Scale shape: ONE partial+final agg "
    "folds the stream to |types| x |days| rows; the high-water mark "
    "and every derived metric reduce from THAT frame (no second "
    "fact scan), the global max broadcasts back as a 1-row cross "
    "join.",
)
def q269(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    td = _managed_persist(
        "q269_type_day",
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.count(F.lit(1)).alias("c"), F.max("ts").alias("mx")
        ),
    )
    g = td.agg(F.max("day").alias("gmax"))
    return (
        td.crossJoin(F.broadcast(g))
        .groupBy("event_type", "gmax")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.date_format(F.max("mx"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_seen"
            ),
            F.datediff(F.first("gmax"), F.max("day"))
            .cast("bigint")
            .alias("staleness_days"),
            F.round(
                F.sum(
                    F.when(
                        F.col("day") >= F.date_sub(F.col("gmax"), 6),
                        F.col("c"),
                    ).otherwise(0)
                ).cast("double")
                / F.sum("c").cast("double"),
                4,
            ).alias("share_last_7d"),
        )
        .drop("gmax")
        .orderBy("event_type")
    )


@register(
    "q270",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10)))
                        / COUNT(value) AS DOUBLE), 4) AS y
      FROM events GROUP BY 1, 2
    ),
    g AS (SELECT MIN(day) AS gmin FROM daily),
    pts AS (
      SELECT event_type,
             CAST(date_diff('day', gmin, day) AS BIGINT) AS x, y
      FROM daily CROSS JOIN g
    ),
    slopes AS (
      SELECT a.event_type,
             (b.y - a.y) / (b.x - a.x) AS slope
      FROM pts a JOIN pts b
        ON a.event_type = b.event_type AND b.x > a.x
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
           ROUND(MAX(CASE WHEN rn = (n + 1) // 2 THEN slope END), 4)
             AS ts_slope
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    doc="Theil-Sen robust trend estimation per event type — the slope "
    "is the MEDIAN of all pairwise daily-mean slopes (29% breakdown "
    "point: a month of corrupted telemetry barely moves it, where "
    "q133's OLS line chases it; completes the robust family with "
    "q246 MAD and q255 Gini). Determinism: daily means round(4) "
    "through the exact-DECIMAL accumulator BEFORE sloping, so every "
    "pairwise slope is an identical IEEE division in both engines; "
    "the median is the DISCRETE lower median (rank (n+1) DIV 2 in "
    "exact integer arithmetic, q218's discipline — interpolated "
    "medians of near-equal doubles would reopen the last-ulp gap). "
    "Scale shape: the fact table folds to |types| x |days| daily "
    "means in one agg; the O(days²) pair set builds per type from "
    "that tiny frame (calendar-bounded, never corpus-bounded) and "
    "the rank window partitions by type — no global sort.",
)
@plan_cache
def q270(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # daily feeds the grid-origin fence and both sides of the pairwise
    # slope join — 4 events scans in one plan without materialization.
    daily = _managed_persist(
        "q270_daily",
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                (F.sum(F.col("value").cast(DEC)) / F.count("value")).cast(
                    "double"
                ),
                4,
            ).alias("y")
        ),
    )
    g = daily.agg(F.min("day").alias("gmin"))
    pts = daily.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.datediff("day", "gmin").cast("bigint").alias("x"),
        "y",
    )
    b = pts.select(
        F.col("event_type").alias("et2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    slopes = pts.join(
        F.broadcast(b),
        (F.col("event_type") == F.col("et2")) & (F.col("x2") > F.col("x")),
    ).select(
        "event_type",
        ((F.col("y2") - F.col("y")) / (F.col("x2") - F.col("x"))).alias(
            "slope"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_pairs"),
            F.round(
                F.max(
                    F.when(
                        F.col("rn") == F.expr("div(n + 1, 2)"), F.col("slope")
                    )
                ),
                4,
            ).alias("ts_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "q271",
    oracle="""
    WITH th AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.05), 4) AS lo,
             ROUND(quantile_cont(value, 0.95), 4) AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_used,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10)))
                      / COUNT(value) AS DOUBLE), 4) AS trimmed_avg,
           ROUND(MAX(lo), 4) AS p05, ROUND(MAX(hi), 4) AS p95
    FROM events e JOIN th ON e.event_type = th.event_type
    WHERE value >= lo AND value <= hi
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Trimmed (5%-winsor-band) mean per event type — the robust "
    "location estimate that survives fat-tailed telemetry (one "
    "sensor stuck at 1e9 shifts the plain mean arbitrarily, moves "
    "this not at all; completes the robust family with q246 MAD and "
    "q270 Theil-Sen). Determinism: the P05/P95 fences come from "
    "Spark's exact percentile() ≡ DuckDB quantile_cont (q47's "
    "proven pairing) and are ROUNDED to 4 dp in both engines before "
    "the inclusive band filter, so membership is engine-exact; the "
    "trimmed mean runs through the exact-DECIMAL accumulator. Scale "
    "shape: pass 1 reduces to |types| fence rows (approx_percentile "
    "is the documented 100 TB swap), which BROADCAST back into a "
    "pass-2 filtered partial+final agg — two scans, zero fact-table "
    "shuffles beyond the group key.",
)
@plan_cache
def q271(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    th = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05D)"), 4).alias("lo"),
        F.round(F.expr("percentile(value, 0.95D)"), 4).alias("hi"),
    )
    return (
        ev.join(F.broadcast(th), "event_type")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_used"),
            F.round(
                (F.sum(F.col("value").cast(DEC)) / F.count("value")).cast(
                    "double"
                ),
                4,
            ).alias("trimmed_avg"),
            F.round(F.max("lo"), 4).alias("p05"),
            F.round(F.max("hi"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


@register(
    "q272",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY day
    ),
    band AS (
      SELECT d.day, MAX(d.rev) AS rev,
             MAX(CASE WHEN d2.day <> d.day THEN d2.rev END)
               AS best_other,
             MIN(d2.rev) AS band_min,
             CAST(COUNT(*) AS BIGINT) AS band_n
      FROM daily d JOIN daily d2
        ON d2.day BETWEEN d.day - 3 AND d.day + 3
      GROUP BY d.day
    )
    SELECT CAST(day AS VARCHAR) AS day, ROUND(rev, 4) AS rev,
           ROUND(rev - band_min, 4) AS prominence
    FROM band
    WHERE band_n = 7 AND rev > best_other
    ORDER BY day
    """,
    doc="Local-peak detection on the daily-revenue series — days whose "
    "revenue STRICTLY exceeds every other day in the centered 7-day "
    "band (edge days with truncated bands excluded), reported with "
    "their prominence over the band minimum: the spike-mining "
    "primitive behind alert review and promotion analysis "
    "(completes the series family: q142 rolling z-score flags "
    "global outliers, q253 CUSUM finds level shifts, this finds "
    "LOCAL extrema). Determinism: strict-> comparison against the "
    "band's best OTHER day — the tie of two equal adjacent maxima "
    "yields NO peak in both engines by construction, no rank "
    "tie-break needed. Scale shape: the fact table folds to "
    "<=|calendar| daily rows in one partial+final agg; the centered "
    "band is a BROADCAST self-join over that tiny frame (q260's "
    "discipline — no window, no sort, size = calendar x 7 "
    "regardless of corpus scale).",
)
@plan_cache
def q272(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _orders_daily_rev(spark, sf_dir)
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    band = (
        daily.join(
            F.broadcast(d2),
            (F.col("day2") >= F.date_sub(F.col("day"), 3))
            & (F.col("day2") <= F.date_add(F.col("day"), 3)),
        )
        .groupBy("day")
        .agg(
            F.max("rev").alias("rev"),
            F.max(
                F.when(F.col("day2") != F.col("day"), F.col("rev2"))
            ).alias("best_other"),
            F.min("rev2").alias("band_min"),
            F.count(F.lit(1)).alias("band_n"),
        )
    )
    return (
        band.where((F.col("band_n") == 7) & (F.col("rev") > F.col("best_other")))
        .select(
            F.col("day").cast("string").alias("day"),
            F.round("rev", 4).alias("rev"),
            F.round(F.col("rev") - F.col("band_min"), 4).alias("prominence"),
        )
        .orderBy("day")
    )


@register(
    "q274",
    oracle="""
    WITH cm AS (
      SELECT DISTINCT o_custkey AS ck,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mk
      FROM orders
    ),
    seq AS (
      SELECT ck, mk,
             LAG(mk) OVER (PARTITION BY ck ORDER BY mk) AS pmk,
             LEAD(mk) OVER (PARTITION BY ck ORDER BY mk) AS nmk
      FROM cm
    ),
    mx AS (SELECT MAX(mk) AS maxmk FROM cm),
    status AS (
      SELECT mk,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(COUNT(*) FILTER (WHERE pmk IS NULL) AS BIGINT) AS n_new,
             CAST(COUNT(*) FILTER (WHERE pmk = mk - 1) AS BIGINT)
               AS n_retained,
             CAST(COUNT(*) FILTER (WHERE pmk IS NOT NULL
                                   AND pmk < mk - 1) AS BIGINT)
               AS n_resurrected
      FROM seq GROUP BY 1
    ),
    churn AS (
      SELECT mk + 1 AS cmk, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM seq CROSS JOIN mx
      WHERE (nmk IS NULL OR nmk > mk + 1) AND mk + 1 <= maxmk
      GROUP BY 1
    )
    SELECT printf('%04d-%02d', s.mk // 12, s.mk % 12 + 1) AS month,
           n_active, n_new, n_retained, n_resurrected,
           COALESCE(n_churned, 0) AS n_churned
    FROM status s LEFT JOIN churn c ON s.mk = c.cmk
    ORDER BY month
    """,
    doc="Monthly growth accounting — every active customer classified "
    "as NEW (first month), RETAINED (active last month) or "
    "RESURRECTED (returning after a gap), plus the CHURNED count "
    "attributed to the month after last activity (capped at the "
    "dataset horizon): the startup-metrics decomposition where "
    "active(m) = new + retained + resurrected and "
    "churned(m) = active(m-1) - retained(m) — the identity the "
    "naive 'MoM active delta' hides. Scale shape: the fact table "
    "folds to DISTINCT (customer, month) rows in one agg; lag/lead "
    "ride ONE customer-partitioned window over that PERSISTED "
    "frame (status and churn both read it — the multi-branch "
    "recompute rule); monthly rollups and the horizon scalar are "
    "tiny-frame reductions.",
)
def q274(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    cm = o.select(
        F.col("o_custkey").alias("ck"),
        (
            F.year(F.to_date("o_orderdate")) * 12
            + F.month(F.to_date("o_orderdate"))
            - 1
        )
        .cast("bigint")
        .alias("mk"),
    ).distinct()
    w = Window.partitionBy("ck").orderBy("mk")
    seq = _managed_persist(
        "q274_seq",
        cm.select(
            "ck",
            "mk",
            F.lag("mk").over(w).alias("pmk"),
            F.lead("mk").over(w).alias("nmk"),
        ),
    )
    mx = seq.agg(F.max("mk").alias("maxmk"))
    status = seq.groupBy("mk").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count(F.when(F.col("pmk").isNull(), 1)).alias("n_new"),
        F.count(F.when(F.col("pmk") == F.col("mk") - 1, 1)).alias(
            "n_retained"
        ),
        F.count(
            F.when(
                F.col("pmk").isNotNull() & (F.col("pmk") < F.col("mk") - 1), 1
            )
        ).alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(mx))
        .where(
            (F.col("nmk").isNull() | (F.col("nmk") > F.col("mk") + 1))
            & (F.col("mk") + 1 <= F.col("maxmk"))
        )
        .groupBy((F.col("mk") + 1).alias("cmk"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        status.join(F.broadcast(churn), status.mk == churn.cmk, "left")
        .select(
            F.format_string(
                "%04d-%02d",
                F.expr("CAST(div(mk, 12) AS INT)"),
                F.expr("CAST(pmod(mk, 12) + 1 AS INT)"),
            ).alias("month"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint").alias(
                "n_churned"
            ),
        )
        .orderBy("month")
    )


@register(
    "q276",
    oracle="""
    WITH y AS (
      SELECT p_brand,
             CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
             SUM(CAST(l_quantity AS DECIMAL(30,10))) AS qty,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,10))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(CAST(l_shipdate AS DATE)) IN (1999, 2000)
      GROUP BY 1, 2
    ),
    p AS (
      SELECT a.p_brand,
             CAST(a.qty AS DOUBLE) AS q1, CAST(a.rev AS DOUBLE) AS r1,
             CAST(b.qty AS DOUBLE) AS q2, CAST(b.rev AS DOUBLE) AS r2
      FROM y a JOIN y b ON a.p_brand = b.p_brand
       AND a.yr = 1999 AND b.yr = 2000
      WHERE a.qty > 0 AND b.qty > 0
    )
    SELECT p_brand AS brand,
           ROUND(r2 - r1, 4) AS delta_rev,
           ROUND((r2 / q2 - r1 / q1) * q1, 4) AS price_effect,
           ROUND((q2 - q1) * (r1 / q1), 4) AS volume_effect,
           ROUND((r2 / q2 - r1 / q1) * (q2 - q1), 4) AS mix_effect
    FROM p ORDER BY brand
    """,
    doc="Price/volume/mix revenue-bridge decomposition per brand "
    "(1999 -> 2000) — the FP&A waterfall: delta_rev = price_effect "
    "+ volume_effect + mix_effect EXACTLY (algebraic identity on "
    "(p2-p1, q2-q1), no residual bucket), answering 'did we sell "
    "more, or at better prices?'. Determinism: qty and revenue "
    "reduce in exact DECIMAL; average prices and all three effects "
    "are identical IEEE doubles in both engines, round(4) at the "
    "edge. Scale shape: one broadcast dim join + ONE partial+final "
    "agg on (brand, year) with the year filter pushed to the scan; "
    "the bridge itself is a self-join over the ~|brands| frame. "
    "Brands need activity in BOTH years (a brand at zero quantity "
    "has no average price to bridge from).",
)
@plan_cache
def q276(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    yr = F.year(F.to_date("l_shipdate"))
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: lineitem and part each scanned twice
    # — both year-slices re-ran the brand-year fold). Persist it.
    y = _managed_persist(
        "q276_y",
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .where(yr.isin(1999, 2000))
        .groupBy("p_brand", yr.cast("int").alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("qty"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            ).alias("rev"),
        ),
    )
    a = y.where(F.col("yr") == 1999).select(
        "p_brand",
        F.col("qty").cast("double").alias("q1"),
        F.col("rev").cast("double").alias("r1"),
    )
    b = y.where(F.col("yr") == 2000).select(
        F.col("p_brand").alias("brand2"),
        F.col("qty").cast("double").alias("q2"),
        F.col("rev").cast("double").alias("r2"),
    )
    p = a.join(F.broadcast(b), F.col("p_brand") == F.col("brand2")).where(
        (F.col("q1") > 0) & (F.col("q2") > 0)
    )
    dp = F.col("r2") / F.col("q2") - F.col("r1") / F.col("q1")
    return p.select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("r2") - F.col("r1"), 4).alias("delta_rev"),
        F.round(dp * F.col("q1"), 4).alias("price_effect"),
        F.round(
            (F.col("q2") - F.col("q1")) * (F.col("r1") / F.col("q1")), 4
        ).alias("volume_effect"),
        F.round(dp * (F.col("q2") - F.col("q1")), 4).alias("mix_effect"),
    ).orderBy("brand")


@register(
    "q277",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id,
             CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    z AS (
      SELECT vec_id,
             CAST(SUM(CAST(x * ((CAST((pos * 2654435761) % 997 AS DOUBLE)
                                 / 997.0) - 0.5)
                           AS DECIMAL(30,10))) AS DOUBLE) AS z
      FROM ex GROUP BY vec_id
    ),
    sc AS (
      SELECT vec_id, ROUND(1.0 / (1.0 + exp(-z)), 6) AS score,
             CAST((vec_id % 2147483648) * 2654435761 % 1000000
                  AS DOUBLE) / 1000000.0 AS u
      FROM z
    ),
    th AS (
      SELECT ROUND(quantile_cont(score, 0.1), 6) AS t1,
             ROUND(quantile_cont(score, 0.2), 6) AS t2,
             ROUND(quantile_cont(score, 0.3), 6) AS t3,
             ROUND(quantile_cont(score, 0.4), 6) AS t4,
             ROUND(quantile_cont(score, 0.5), 6) AS t5,
             ROUND(quantile_cont(score, 0.6), 6) AS t6,
             ROUND(quantile_cont(score, 0.7), 6) AS t7,
             ROUND(quantile_cont(score, 0.8), 6) AS t8,
             ROUND(quantile_cont(score, 0.9), 6) AS t9
      FROM sc
    ),
    dec AS (
      SELECT CAST(1 + CAST(score > t1 AS INT) + CAST(score > t2 AS INT)
                    + CAST(score > t3 AS INT) + CAST(score > t4 AS INT)
                    + CAST(score > t5 AS INT) + CAST(score > t6 AS INT)
                    + CAST(score > t7 AS INT) + CAST(score > t8 AS INT)
                    + CAST(score > t9 AS INT) AS INT) AS decile,
             score, CAST(u < score AS INT) AS actual
      FROM sc CROSS JOIN th
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(30,10))) / COUNT(*)
                 AS DOUBLE), 4) AS avg_score,
           {sql_dratio_round('SUM(actual)', 'COUNT(*)')} AS pos_rate,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(30,10))) / COUNT(*)
                 AS DOUBLE)
                 - CAST(SUM(actual) AS DOUBLE) / COUNT(*), 4)
             AS calibration_gap
    FROM dec GROUP BY decile ORDER BY decile
    """,
    doc="Model-calibration report by score decile — q178's logistic "
    "quality scores bucketed into deciles and compared against the "
    "realized positive rate (a calibrated model's decile gap ≈ 0; "
    "the MLOps acceptance check that precedes any threshold "
    "decision). Outcomes are a deterministic hash draw u < score "
    "(both engines hold the identical 'world', integer-hash based "
    "— no rand()). Scale shape: one posexplode + DECIMAL dot-"
    "product agg per vector (q178's plan), decile FENCES from exact "
    "percentile() rounded to 6 dp in both engines and broadcast "
    "back as pure threshold compares (no global rank window), one "
    "final 10-row agg.",
)
@plan_cache
def q277(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("p0", "xf")
    ).select(
        "vec_id",
        (F.col("p0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    wgt = (
        F.pmod(F.col("pos") * F.lit(2654435761), F.lit(997)).cast("double")
        / F.lit(997.0)
    ) - F.lit(0.5)
    z = ex.groupBy("vec_id").agg(
        F.sum((F.col("x") * wgt).cast(DEC)).cast("double").alias("z")
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 embeddings scans): the decile-
    # threshold fence re-ran the explode + score pipeline. Persist the
    # per-vector score frame.
    sc = _managed_persist(
        "q277_sc",
        z.select(
            "vec_id",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6
            ).alias("score"),
            (
                F.pmod(
                    F.pmod(F.col("vec_id"), F.lit(2147483648))
                    * F.lit(2654435761),
                    F.lit(1000000),
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("u"),
        ),
    )
    th = sc.agg(
        F.expr(
            "transform(percentile(score, array(0.1D,0.2D,0.3D,0.4D,0.5D,"
            "0.6D,0.7D,0.8D,0.9D)), t -> round(t, 6))"
        ).alias("ts")
    )
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + (
            F.col("score") > F.element_at(F.col("ts"), i)
        ).cast("int")
    dec = sc.crossJoin(F.broadcast(th)).select(
        decile.cast("int").alias("decile"),
        "score",
        (F.col("u") < F.col("score")).cast("int").alias("actual"),
    )
    avg_score = (F.sum(F.col("score").cast(DEC)) / F.count(F.lit(1))).cast(
        "double"
    )
    pos_rate = F.sum("actual").cast("double") / F.count(F.lit(1))
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(avg_score, 4).alias("avg_score"),
            dratio_round(
                F.sum("actual").cast(DECZ), F.count(F.lit(1)).cast(DECZ)
            ).alias("pos_rate"),
            F.round(avg_score - pos_rate, 4).alias("calibration_gap"),
        )
        .orderBy("decile")
    )


@register(
    "q278",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                   AS DOUBLE), 4) AS rev
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT d.day, MAX(d.rev) AS rev,
             CAST(COUNT(*) AS BIGINT) AS band_n,
             ROUND(CAST(SUM(CAST(d2.rev AS DECIMAL(30,10))) / 15
                   AS DOUBLE), 4) AS trend
      FROM daily d JOIN daily d2
        ON d2.day BETWEEN d.day - 7 AND d.day + 7
      GROUP BY d.day
    ),
    det AS (
      SELECT day, rev, trend, ROUND(rev - trend, 4) AS detr,
             CAST(date_diff('day', DATE '1992-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM tr WHERE band_n = 15
    ),
    seas AS (
      SELECT dow,
             ROUND(CAST(SUM(CAST(detr AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 4) AS seasonal
      FROM det GROUP BY 1
    )
    SELECT CAST(d.day AS VARCHAR) AS day, d.rev, d.trend,
           s.seasonal, ROUND(d.detr - s.seasonal, 4) AS residual
    FROM det d JOIN seas s ON d.dow = s.dow
    ORDER BY day
    """,
    doc="Classical additive seasonal decomposition of daily revenue — "
    "rev = trend (centered 15-day moving average, edges dropped) + "
    "day-of-week seasonal index (mean detrended value per weekday) "
    "+ residual: the series triage that separates 'weekends are "
    "slow' from 'demand is shifting' before any anomaly rule runs "
    "(q142's z-score flags what THIS explains away). Determinism: "
    "every stage rounds to 4 dp through the exact-DECIMAL "
    "accumulator before the next subtraction, so both engines "
    "subtract identical doubles; weekday = days-since-epoch mod 7 "
    "(never dayofweek() — engines disagree on week origin). Scale "
    "shape: fact folds to ≤|calendar| daily rows; the centered "
    "window is a BROADCAST band self-join (q272's discipline); the "
    "7-row seasonal index broadcasts back.",
)
@plan_cache
def q278(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # q286's discipline: the daily fold feeds both sides of the band
    # self-join (4 orders scans in the plan probe) — materialize the
    # |days| frame once.
    daily = _managed_persist(
        "q278_daily",
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
            ).alias("rev")
        ),
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    tr = (
        daily.join(
            F.broadcast(d2),
            (F.col("day2") >= F.date_sub(F.col("day"), 7))
            & (F.col("day2") <= F.date_add(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(
            F.max("rev").alias("rev"),
            F.count(F.lit(1)).alias("band_n"),
            F.round(
                (F.sum(F.col("rev2").cast(DEC)) / 15).cast("double"), 4
            ).alias("trend"),
        )
    )
    # det feeds the seasonal fold AND the final residual join —
    # materialize so the band nested-loop join runs once.
    det = _managed_persist(
        "q278_det",
        tr.where(F.col("band_n") == 15).select(
            "day",
            "rev",
            "trend",
            F.round(F.col("rev") - F.col("trend"), 4).alias("detr"),
            F.pmod(
                F.datediff("day", F.lit("1992-01-01").cast("date")), F.lit(7)
            )
            .cast("bigint")
            .alias("dow"),
        ),
    )
    seas = det.groupBy("dow").agg(
        F.round(
            (F.sum(F.col("detr").cast(DEC)) / F.count(F.lit(1))).cast(
                "double"
            ),
            4,
        ).alias("seasonal")
    )
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            F.col("day").cast("string").alias("day"),
            "rev",
            "trend",
            "seasonal",
            F.round(F.col("detr") - F.col("seasonal"), 4).alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "q279",
    oracle="""
    WITH th AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.95), 4) AS var95
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           MAX(var95) AS var95,
           CAST(COUNT(*) FILTER (WHERE value > var95) AS BIGINT)
             AS n_tail,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10)))
                      FILTER (WHERE value > var95)
                 AS DOUBLE)
                 / COUNT(*) FILTER (WHERE value > var95), 4) AS es95
    FROM events e JOIN th ON e.event_type = th.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Value-at-risk + expected shortfall (CVaR) per event type — "
    "VaR95 is the exact P95 fence, ES95 the mean of the exceedance "
    "tail (the coherent risk measure: VaR says where the tail "
    "starts, ES says how bad it is once entered — the q271 "
    "winsorized mean's mirror image, completing the tail-risk "
    "family). Determinism: the fence comes from exact percentile() "
    "≡ quantile_cont rounded to 4 dp in both engines before the "
    "strict-> tail membership test; the tail mean runs through the "
    "exact-DECIMAL accumulator. Scale shape: pass 1 reduces to "
    "|types| fences (approx_percentile = the 100 TB swap), "
    "broadcast into ONE pass-2 conditional agg — no shuffle of the "
    "fact table beyond the group key.",
)
@plan_cache
def q279(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    th = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.95D)"), 4).alias("var95")
    )
    tail = F.col("value") > F.col("var95")
    return (
        ev.join(F.broadcast(th), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("var95").alias("var95"),
            F.count(F.when(tail, 1)).alias("n_tail"),
            F.round(
                F.sum(F.when(tail, F.col("value")).cast(DEC)).cast("double")
                / F.count(F.when(tail, 1)),
                4,
            ).alias("es95"),
        )
        .orderBy("event_type")
    )


@register(
    "q285",
    oracle="""
    WITH oc AS (
      SELECT o_orderpriority AS priority, l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS sx,
             SUM(CAST(c AS HUGEINT) * c) AS sxx
      FROM oc GROUP BY 1
    ),
    v AS (
      SELECT priority, n,
             CAST(sx AS DOUBLE) / n AS mean,
             CASE WHEN n > 1
                  THEN CAST(n * sxx - sx * sx AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (n - 1))
                  ELSE NULL END AS var
      FROM s
    )
    SELECT priority, n,
           ROUND(mean, 4) AS mean_lines,
           ROUND(var, 4) AS var_lines,
           CASE WHEN mean <> 0 THEN ROUND(var / mean, 4)
                ELSE NULL END AS dispersion
    FROM v ORDER BY priority
    """,
    doc="Index-of-dispersion test on basket sizes per order priority — "
    "variance-to-mean ratio of lines-per-order (≈1 = Poisson "
    "arrivals, >1 = clumped/bursty baskets, <1 = regularized: the "
    "distributional diagnostic behind inventory and capacity "
    "models). Determinism: basket counts are integers; the "
    "sufficient statistics (n, Σx, Σx²) accumulate as "
    "DECIMAL(38,0)/HUGEINT (no BIGINT overflow at 1e9-row groups) "
    "and the sample variance (n·Σx² − (Σx)²)/(n(n−1)) is "
    "exact-rational until one final double division — "
    "engine-identical by construction, round(4) at the edge. "
    "Scale shape: one orderkey "
    "co-partitioned join+agg folds the fact table to per-order "
    "counts; the per-priority reduction is mergeable integer "
    "partials (the 1000-executor algebra).",
)
@plan_cache
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    oc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"), "l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cd = F.col("c").cast("decimal(18,0)")
    s = oc.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sx"),
        F.sum(cd * cd).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    num = (n.cast("decimal(20,0)") * sxx - sx * sx).cast("double")
    # n==1 guard (q330/q372 class, extended r12): Spark ANSI raises on
    # the zero n*(n-1) divisor where DuckDB yields NaN/inf — NULL both.
    var = F.when(n > 1, num / (n.cast("double") * (n - 1)))
    mean = sx.cast("double") / n
    return s.select(
        "priority",
        "n",
        F.round(mean, 4).alias("mean_lines"),
        F.round(var, 4).alias("var_lines"),
        F.when(mean != 0, F.round(var / mean, 4)).alias("dispersion"),
    ).orderBy("priority")


@register(
    "q286",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                   AS DOUBLE), 4) AS rev
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT d.day, MAX(d.rev) AS rev,
             CAST(COUNT(*) AS BIGINT) AS band_n,
             ROUND(CAST(SUM(CAST(d2.rev AS DECIMAL(30,10))) / 15
                   AS DOUBLE), 4) AS trend
      FROM daily d JOIN daily d2
        ON d2.day BETWEEN d.day - 7 AND d.day + 7
      GROUP BY d.day
    ),
    det AS (
      SELECT day, rev, trend, ROUND(rev - trend, 4) AS detr,
             CAST(date_diff('day', DATE '1992-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM tr WHERE band_n = 15
    ),
    seas AS (
      SELECT dow,
             ROUND(CAST(SUM(CAST(detr AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 4) AS seasonal
      FROM det GROUP BY 1
    ),
    res AS (
      SELECT d.day, d.rev, ROUND(d.detr - s.seasonal, 4) AS residual
      FROM det d JOIN seas s ON d.dow = s.dow
    ),
    fence AS (
      SELECT ROUND(quantile_cont(residual, 0.5), 4) AS med
      FROM res
    ),
    madf AS (
      SELECT med,
             ROUND(quantile_cont(ABS(residual - med), 0.5), 4) AS mad
      FROM res CROSS JOIN fence GROUP BY med
    )
    SELECT CAST(day AS VARCHAR) AS day, rev, residual,
           ROUND(ABS(residual - med) / mad, 4) AS robust_z
    FROM res CROSS JOIN madf
    WHERE mad > 0 AND ABS(residual - med) > 4.4478 * mad
    ORDER BY day
    """,
    doc="Seasonally-adjusted anomaly detection — q278's decomposition "
    "composed with q246's MAD rule: a day is anomalous only if its "
    "RESIDUAL (after removing trend and weekday effect) sits more "
    "than 3 robust sigmas (3 x 1.4826 x MAD) from the residual "
    "median — so 'Sunday is slow' never pages anyone, and a slow "
    "TUESDAY does. The composition is the point: raw z-scores "
    "(q142) alarm on every weekend at this threshold. Determinism: "
    "decomposition stages round(4) through DECIMAL (q278), "
    "median/MAD via exact percentile() ≡ quantile_cont rounded "
    "4 dp, threshold compare on identical doubles. Scale shape: "
    "everything after the daily fold runs on calendar-bounded "
    "frames (band self-joins + broadcast fences).",
)
@plan_cache
def q286(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # The daily fold feeds the band self-join twice (main + broadcast
    # side) and every downstream fence rebuild reached back through it —
    # 12 orders scans in one plan (scan-dup probe). Materialize the
    # ~|days| frame once; everything after runs on calendar-bounded
    # in-memory frames.
    daily = _managed_persist(
        "q286_daily",
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
            ).alias("rev")
        ),
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    tr = (
        daily.join(
            F.broadcast(d2),
            (F.col("day2") >= F.date_sub(F.col("day"), 7))
            & (F.col("day2") <= F.date_add(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(
            F.max("rev").alias("rev"),
            F.count(F.lit(1)).alias("band_n"),
            F.round(
                (F.sum(F.col("rev2").cast(DEC)) / 15).cast("double"), 4
            ).alias("trend"),
        )
    )
    # The +/-7-day band join is a broadcast nested-loop over |days|^2
    # pairs; det feeds the seasonal fold AND the residual chain, and res
    # feeds three fence branches — materialize both tiny frames so the
    # band join runs once, not four times.
    det = _managed_persist(
        "q286_det",
        tr.where(F.col("band_n") == 15).select(
            "day",
            "rev",
            F.round(F.col("rev") - F.col("trend"), 4).alias("detr"),
            F.pmod(
                F.datediff("day", F.lit("1992-01-01").cast("date")), F.lit(7)
            )
            .cast("bigint")
            .alias("dow"),
        ),
    )
    seas = det.groupBy("dow").agg(
        F.round(
            (F.sum(F.col("detr").cast(DEC)) / F.count(F.lit(1))).cast(
                "double"
            ),
            4,
        ).alias("seasonal")
    )
    res = _managed_persist(
        "q286_res",
        det.join(F.broadcast(seas), "dow").select(
            "day",
            "rev",
            F.round(F.col("detr") - F.col("seasonal"), 4).alias("residual"),
        ),
    )
    fence = res.agg(
        F.round(F.expr("percentile(residual, 0.5D)"), 4).alias("med")
    )
    madf = (
        res.crossJoin(F.broadcast(fence))
        .agg(
            F.max("med").alias("med"),
            F.round(
                F.expr("percentile(abs(residual - med), 0.5D)"), 4
            ).alias("mad"),
        )
    )
    dev = F.abs(F.col("residual") - F.col("med"))
    return (
        res.crossJoin(F.broadcast(madf))
        .where((F.col("mad") > 0) & (dev > 4.4478 * F.col("mad")))
        .select(
            F.col("day").cast("string").alias("day"),
            "rev",
            "residual",
            F.round(dev / F.col("mad"), 4).alias("robust_z"),
        )
        .orderBy("day")
    )


@register(
    "q290",
    oracle="""
    SELECT b AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                 AS DOUBLE), 4) AS total
    FROM (
      SELECT o_totalprice,
             CAST(LEAST(CAST(FLOOR(o_totalprice / 50000) AS INT) + 1, 13)
                  AS INT) AS b
      FROM orders
    ) GROUP BY b ORDER BY b
    """,
    doc="Fixed-edge histogram via width_bucket — order totals binned "
    "into twelve 50k-wide buckets over [0, 600k) plus the overflow "
    "bucket 13 (the reporting histogram with CONTRACTUAL edges, vs "
    "q107's data-driven bands and q175's mergeable quantile sketch). "
    "Spark's width_bucket(x, 0, 600000, 12) is exactly "
    "least(floor(x/50000)+1, 13) for non-negative x — the oracle "
    "states that arithmetic since DuckDB spells the same semantics "
    "differently. Scale shape: the bucket id is a pure codegen "
    "function of the row, so this is ONE partial+final agg over 13 "
    "integer cells with DECIMAL totals — the mergeable-counter "
    "algebra at its simplest.",
)
@plan_cache
def q290(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_totalprice",
            F.expr("CAST(width_bucket(o_totalprice, 0D, 600000D, 12) AS INT)")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
            ).alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "q291",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    s1 AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS s
           FROM d GROUP BY 1),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM d),
    p AS (
      SELECT d1.l_partkey AS a, d2.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS supp
      FROM d d1 JOIN d d2
        ON d1.l_orderkey = d2.l_orderkey AND d1.l_partkey < d2.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    rules AS (
      SELECT a AS ante, b AS cons, supp,
             ROUND(CAST(supp * n.nb AS DOUBLE) / (sa.s * sb.s), 4) AS lift
      FROM p JOIN s1 sa ON sa.k = a JOIN s1 sb ON sb.k = b CROSS JOIN n
      UNION ALL
      SELECT b AS ante, a AS cons, supp,
             ROUND(CAST(supp * n.nb AS DOUBLE) / (sa.s * sb.s), 4) AS lift
      FROM p JOIN s1 sa ON sa.k = a JOIN s1 sb ON sb.k = b CROSS JOIN n
    ),
    owned AS (
      SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE (o_custkey % 2147483648) * 2654435761 % 100 < 1
    ),
    cand AS (
      SELECT ck, cons AS rec, MAX(lift) AS lift, MAX(supp) AS supp
      FROM owned JOIN rules ON pk = ante
      WHERE NOT EXISTS (SELECT 1 FROM owned o2
                        WHERE o2.ck = owned.ck AND o2.pk = cons)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT ck, rec, lift,
             ROW_NUMBER() OVER (PARTITION BY ck
                                ORDER BY lift DESC, supp DESC, rec)
               AS rnk
      FROM cand
    )
    SELECT CAST(ck AS BIGINT) AS custkey, CAST(rnk AS BIGINT) AS rnk,
           CAST(rec AS BIGINT) AS rec_part, lift
    FROM ranked WHERE rnk <= 3 ORDER BY custkey, rnk
    """,
    doc="Next-best-offer recommendation — top-3 parts per (hash-"
    "sampled 1%) customer by association-rule LIFT over parts they "
    "already buy, excluding what they own: the end-to-end composition "
    "that turns q214's rule mining into a serving table (mine -> "
    "match -> exclude -> rank). Scale shape: baskets expand to pairs "
    "map-side from q139's per-basket arrays (fact shuffled once, "
    "never self-joined); the rules frame is |frequent pairs| x 2 and "
    "the customer->part ownership frame folds through one "
    "co-partitioned orderkey join with the customer sample pushed to "
    "the orders SCAN (q221's arithmetic membership — no key list "
    "distributed); candidate scoring joins ownership to BROADCAST "
    "rules, the own-it-already exclusion is a left anti join on the "
    "same persisted ownership frame, and the final rank window "
    "partitions per customer. Lift ties break on (supp, part id) — "
    "fully deterministic.",
)
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = _managed_persist(
        "q291_orderparts", li.select("l_orderkey", "l_partkey").distinct()
    )
    baskets = d.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= 3)
    )
    s1 = d.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("s")
    )
    nb = d.select("l_orderkey").distinct().agg(F.count(F.lit(1)).alias("nb"))
    scored = (
        pairs.join(
            F.broadcast(
                s1.select(F.col("k").alias("ka"), F.col("s").alias("sa"))
            ),
            F.col("a") == F.col("ka"),
        )
        .join(
            F.broadcast(
                s1.select(F.col("k").alias("kb"), F.col("s").alias("sb"))
            ),
            F.col("b") == F.col("kb"),
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "a",
            "b",
            "supp",
            F.round(
                (F.col("supp") * F.col("nb")).cast("double")
                / (F.col("sa") * F.col("sb")),
                4,
            ).alias("lift"),
        )
    )
    rules = _managed_persist(
        "q291_rules",
        scored.select(
            F.col("a").alias("ante"), F.col("b").alias("cons"), "supp", "lift"
        ).unionAll(
            scored.select(
                F.col("b").alias("ante"),
                F.col("a").alias("cons"),
                "supp",
                "lift",
            )
        ),
    )
    sampled = (F.col("o_custkey") % F.lit(2147483648)) * 2654435761 % 100 < 1
    owned = _managed_persist(
        "q291_owned",
        o.where(sampled)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
        )
        .distinct(),
    )
    cand = (
        owned.join(F.broadcast(rules), F.col("pk") == F.col("ante"))
        .join(
            owned.select(F.col("ck").alias("ck2"), F.col("pk").alias("pk2")),
            (F.col("ck") == F.col("ck2")) & (F.col("cons") == F.col("pk2")),
            "left_anti",
        )
        .groupBy("ck", F.col("cons").alias("rec"))
        .agg(F.max("lift").alias("lift"), F.max("supp").alias("supp"))
    )
    w = Window.partitionBy("ck").orderBy(
        F.col("lift").desc(), F.col("supp").desc(), F.col("rec")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select(
            F.col("ck").cast("bigint").alias("custkey"),
            "rnk",
            F.col("rec").cast("bigint").alias("rec_part"),
            "lift",
        )
        .orderBy("custkey", "rnk")
    )


@register(
    "q292",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS lo,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS hi
      FROM events
    ),
    per AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
             CAST(SUM(CAST(CASE WHEN FLOOR(epoch(ts)) < (lo + hi) / 2
                           THEN value ELSE 0 END AS DECIMAL(30,10)))
                  AS DOUBLE) AS x,
             CAST(SUM(CAST(CASE WHEN FLOOR(epoch(ts)) >= (lo + hi) / 2
                           THEN value ELSE 0 END AS DECIMAL(30,10)))
                  AS DOUBLE) AS y
      FROM events CROSS JOIN bounds GROUP BY 1, 2
    ),
    s AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) * 10000000000
                  AS HUGEINT) AS sy_u,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM per GROUP BY 1
    ),
    g AS (
      SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
             SUM(sxx) AS sxx, SUM(sxy) AS sxy
      FROM s
    ),
    theta AS (
      SELECT CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                  ELSE NULL END AS th,
             sx / n AS xbar
      FROM g
    )
    SELECT arm, n,
           {sql_dratio_round('sy_u', 'n * 10000000000')} AS mean_y,
           ROUND(sy / n - th * (sx / n - xbar), 4) AS mean_adj,
           CASE WHEN n > 1
                THEN ROUND((syy - sy * sy / n) / (n - 1), 4)
                ELSE NULL END AS var_y,
           CASE WHEN n > 1
                THEN ROUND(((syy - sy * sy / n)
                       - 2 * th * (sxy - sx * sy / n)
                       + th * th * (sxx - sx * sx / n)) / (n - 1), 4)
                ELSE NULL END AS var_adj
    FROM s CROSS JOIN theta ORDER BY arm
    """,
    doc="CUPED variance-reduced A/B readout — pre-period activity as "
    "the control covariate: adjusted metric y* = y − θ(x − x̄) with "
    "θ = cov(x,y)/var(x) from the POOLED data (the modern "
    "experimentation-platform standard; same decision, tighter "
    "confidence — var_adj/var_y ≈ 1 − ρ² — so experiments conclude "
    "in a fraction of the traffic). Arms are deterministic "
    "(user_id mod 2), the pre/post split is the midpoint of the "
    "feed's epoch range. Scale shape: ONE conditional per-user fold "
    "(pre-sum, post-sum in exact DECIMAL), then everything — per-arm "
    "sufficient stats, pooled θ, adjusted means AND adjusted "
    "variances — derives in closed form from six mergeable DECIMAL "
    "partials per arm; the fact table is never rescanned and no "
    "per-user adjustment column is materialized.",
)
@plan_cache
def q292(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.floor(F.unix_timestamp("ts")).cast("bigint")
    bounds = ev.agg(
        F.min(epoch).alias("lo"), F.max(epoch).alias("hi")
    )
    mid = (F.col("lo") + F.col("hi")) / 2
    per = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id", F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("arm")
        )
        .agg(
            F.sum(
                F.when(epoch < mid, F.col("value")).otherwise(0.0).cast(DEC)
            )
            .cast("double")
            .alias("x"),
            F.sum(
                F.when(epoch >= mid, F.col("value")).otherwise(0.0).cast(DEC)
            )
            .cast("double")
            .alias("y"),
        )
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # The 2-row arm moment frame feeds the pooled-theta fence AND the
    # final readout — each re-ran the whole per-user fold (4 events
    # scans in the plan probe).
    s = _managed_persist(
        "q292_s",
        per.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        (F.sum(F.col("y").cast(DEC)) * F.lit(10**10).cast("decimal(11,0)"))
        .cast(DECZ)
        .alias("sy_u"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
        ),
    )
    g = s.agg(
        F.sum("n").alias("gn"),
        F.sum("sx").alias("gsx"),
        F.sum("sy").alias("gsy"),
        F.sum("sxx").alias("gsxx"),
        F.sum("sxy").alias("gsxy"),
    )
    # Constant-pooled-covariate guard (q330/q372 class, extended r12):
    # zero pooled var(x) zeroes th's divisor — Spark ANSI raises where
    # DuckDB yields NaN/inf; NULL th propagates through the adjusted
    # outputs identically in both engines.
    gden = F.col("gn") * F.col("gsxx") - F.col("gsx") * F.col("gsx")
    theta = g.select(
        F.when(
            gden != 0,
            (F.col("gn") * F.col("gsxy") - F.col("gsx") * F.col("gsy"))
            / gden,
        ).alias("th"),
        (F.col("gsx") / F.col("gn")).alias("xbar"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    th = F.col("th")
    return (
        s.crossJoin(F.broadcast(theta))
        .select(
            "arm",
            "n",
            dratio_round(
                F.col("sy_u"),
                (n.cast(DECZ) * F.lit(10**10).cast("decimal(11,0)")).cast(
                    DECZ
                ),
            ).alias("mean_y"),
            F.round(sy / n - th * (sx / n - F.col("xbar")), 4).alias(
                "mean_adj"
            ),
            F.when(
                n > 1, F.round((syy - sy * sy / n) / (n - 1), 4)
            ).alias("var_y"),
            F.when(
                n > 1,
                F.round(
                    (
                        (syy - sy * sy / n)
                        - 2 * th * (sxy - sx * sy / n)
                        + th * th * (sxx - sx * sx / n)
                    )
                    / (n - 1),
                    4,
                ),
            ).alias("var_adj"),
        )
        .orderBy("arm")
    )


@register(
    "q293",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
      SELECT user_id, MIN(ts) AS p_ts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    lat AS (
      SELECT CAST(year(CAST(s_ts AS DATE)) * 12
                  + month(CAST(s_ts AS DATE)) - 1 AS BIGINT) AS mk,
             CAST(date_diff('day', CAST(s_ts AS DATE),
                            CAST(p_ts AS DATE)) AS BIGINT) AS days
      FROM su JOIN pu USING (user_id)
      WHERE p_ts >= s_ts
    ),
    r AS (
      SELECT mk, days,
             ROW_NUMBER() OVER (PARTITION BY mk ORDER BY days) AS rn,
             COUNT(*) OVER (PARTITION BY mk) AS n
      FROM lat
    )
    SELECT printf('%04d-%02d', mk // 12, mk % 12 + 1) AS cohort_month,
           CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN days END)
                AS BIGINT) AS median_days,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN days END)
                AS BIGINT) AS p90_days
    FROM r GROUP BY mk ORDER BY cohort_month
    """,
    doc="Time-to-convert distribution per signup cohort — median and "
    "P90 days from first signup to first purchase, by signup month "
    "(the latency half of the funnel story: q180 counts WHO "
    "converted inside a deadline, this reports HOW LONG converts "
    "take — the activation metric growth teams steer by). "
    "Determinism: latencies are exact integer days; medians are "
    "DISCRETE ranks in integer arithmetic ((n+1) DIV 2, (9n+9) DIV "
    "10 — q218's discipline), so no interpolation ever happens. "
    "Scale shape: two conditional per-user folds share one user_id "
    "exchange pattern, the cohort rank window partitions by MONTH "
    "over the converted-user frame (bounded by users, grouped "
    "small), and the final rollup is |months| rows.",
)
@plan_cache
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = (
        su.join(pu, "user_id")
        .where(F.col("p_ts") >= F.col("s_ts"))
        .select(
            (
                F.year(F.to_date("s_ts")) * 12
                + F.month(F.to_date("s_ts"))
                - 1
            )
            .cast("bigint")
            .alias("mk"),
            F.datediff(F.to_date("p_ts"), F.to_date("s_ts"))
            .cast("bigint")
            .alias("days"),
        )
    )
    w = Window.partitionBy("mk").orderBy("days")
    wn = Window.partitionBy("mk")
    r = lat.select(
        "mk",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.groupBy("mk")
        .agg(
            F.max("n").cast("bigint").alias("n_converted"),
            F.max(
                F.when(F.col("rn") == F.expr("div(n + 1, 2)"), F.col("days"))
            )
            .cast("bigint")
            .alias("median_days"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("div(9 * n + 9, 10)"), F.col("days")
                )
            )
            .cast("bigint")
            .alias("p90_days"),
        )
        .select(
            F.format_string(
                "%04d-%02d",
                F.expr("CAST(div(mk, 12) AS INT)"),
                F.expr("CAST(pmod(mk, 12) + 1 AS INT)"),
            ).alias("cohort_month"),
            "n_converted",
            "median_days",
            "p90_days",
        )
        .orderBy("cohort_month")
    )


@register(
    "q294",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    o AS (
      SELECT user_id, event_id, event_type, ts_s,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts_s, event_id) AS prev
      FROM e
    ),
    ch AS (
      SELECT user_id, event_type AS state, ts_s,
             LEAD(ts_s) OVER (PARTITION BY user_id
                              ORDER BY ts_s, event_id) AS valid_to
      FROM o WHERE prev IS NULL OR prev <> event_type
    ),
    b AS (
      SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS lo,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS hi
      FROM events
    ),
    a1 AS (
      SELECT user_id, state FROM ch CROSS JOIN b
      WHERE ts_s <= lo + (hi - lo) / 3
        AND COALESCE(valid_to, 9223372036854775807) > lo + (hi - lo) / 3
    ),
    a2 AS (
      SELECT user_id, state FROM ch CROSS JOIN b
      WHERE ts_s <= lo + 2 * (hi - lo) / 3
        AND COALESCE(valid_to, 9223372036854775807)
              > lo + 2 * (hi - lo) / 3
    )
    SELECT CAST(COALESCE(a1.user_id, a2.user_id) AS BIGINT) AS user_id,
           a1.state AS state_t1, a2.state AS state_t2,
           CASE WHEN a1.user_id IS NULL THEN 'added'
                WHEN a2.user_id IS NULL THEN 'removed'
                WHEN a1.state <> a2.state THEN 'changed'
                ELSE 'unchanged' END AS diff
    FROM a1 FULL OUTER JOIN a2 ON a1.user_id = a2.user_id
    WHERE NOT (a1.state = a2.state)
       OR a1.user_id IS NULL OR a2.user_id IS NULL
    ORDER BY user_id
    """,
    doc="Temporal dimension diff — the SCD2 history (q136's build) "
    "queried AS OF two instants (T1 = 1/3, T2 = 2/3 of the feed's "
    "epoch range) and reconciled into added / removed / changed "
    "rows: the snapshot-compare primitive behind dimension audits "
    "and replication checks, done WITHOUT materializing either "
    "snapshot table (each as-of is a filter on the interval table). "
    "Scale shape: the change-row build shares ONE user_id exchange "
    "(q136); both as-of selections filter the SAME persisted "
    "interval frame; the reconciliation is a user-keyed full outer "
    "join emitting only differences. Epoch thirds are exact integer "
    "arithmetic; NULL valid_to (current row) coalesces to +inf "
    "identically in both engines.",
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    # event_id tiebreak on the lead window too: two change rows at the
    # same floored second would otherwise get engine-dependent tie order
    # for which state holds the live valid_to interval.
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    ch = _managed_persist(
        "q294_intervals",
        e.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts_s",
            F.lead("ts_s").over(wl).alias("valid_to"),
        ),
    )
    b = ev.agg(
        F.floor(F.min(F.unix_timestamp("ts"))).cast("bigint").alias("lo"),
        F.floor(F.max(F.unix_timestamp("ts"))).cast("bigint").alias("hi"),
    )
    inf = F.lit(9223372036854775807)

    def asof(frac_num: int):
        cut = F.col("lo") + frac_num * (F.col("hi") - F.col("lo")) / 3
        return (
            ch.crossJoin(F.broadcast(b))
            .where(
                (F.col("ts_s") <= cut)
                & (F.coalesce(F.col("valid_to"), inf) > cut)
            )
            .select("user_id", "state")
        )

    a1 = asof(1).select(
        F.col("user_id").alias("u1"), F.col("state").alias("state_t1")
    )
    a2 = asof(2).select(
        F.col("user_id").alias("u2"), F.col("state").alias("state_t2")
    )
    j = a1.join(a2, F.col("u1") == F.col("u2"), "full_outer")
    diff = (
        F.when(F.col("u1").isNull(), "added")
        .when(F.col("u2").isNull(), "removed")
        .when(F.col("state_t1") != F.col("state_t2"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.where(
            F.col("u1").isNull()
            | F.col("u2").isNull()
            | (F.col("state_t1") != F.col("state_t2"))
        )
        .select(
            F.coalesce(F.col("u1"), F.col("u2"))
            .cast("bigint")
            .alias("user_id"),
            "state_t1",
            "state_t2",
            diff.alias("diff"),
        )
        .orderBy("user_id")
    )


@register(
    "q295",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    k AS (
      SELECT event_type, value, rn, n,
             GREATEST(1, CAST(FLOOR((n - 1.96 * sqrt(n)) / 2) AS BIGINT))
               AS lo_rank,
             LEAST(n, CAST(CEIL((n + 1.96 * sqrt(n)) / 2) AS BIGINT) + 1)
               AS hi_rank
      FROM r
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS median,
           MAX(CASE WHEN rn = lo_rank THEN value END) AS ci_lo,
           MAX(CASE WHEN rn = hi_rank THEN value END) AS ci_hi
    FROM k GROUP BY event_type ORDER BY event_type
    """,
    doc="Median with a distribution-free 95% confidence interval per "
    "event type — the CI endpoints are ORDER STATISTICS at ranks "
    "(n ± 1.96√n)/2 (the binomial/sign-test interval: no normality "
    "assumption, valid for any continuous distribution — the "
    "uncertainty quantification the bare q218 median lacks; a "
    "dashboard movement INSIDE the interval is noise). Determinism: "
    "ranks are computed from one sqrt/floor/ceil chain on identical "
    "doubles, clamped to [1, n]; all three picks are exact "
    "integer-rank order statistics (actual data rows, never "
    "interpolated). Scale shape: ONE exchange on the group key; "
    "rank and count ride the same window partition; one conditional "
    "agg collapses each group (q218's plan with two extra picks).",
)
@plan_cache
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n = F.col("n")
    k = r.select(
        "event_type",
        "value",
        "rn",
        "n",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor((n - 1.96 * F.sqrt(n)) / 2).cast("bigint"),
        ).alias("lo_rank"),
        F.least(
            n.cast("bigint"),
            F.ceil((n + 1.96 * F.sqrt(n)) / 2).cast("bigint") + 1,
        ).alias("hi_rank"),
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max(
                F.when(F.col("rn") == F.expr("div(n + 1, 2)"), F.col("value"))
            ).alias("median"),
            F.max(
                F.when(F.col("rn") == F.col("lo_rank"), F.col("value"))
            ).alias("ci_lo"),
            F.max(
                F.when(F.col("rn") == F.col("hi_rank"), F.col("value"))
            ).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@register(
    "q296",
    oracle="""
    WITH ex AS (
      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS (
      SELECT label, pos,
             ROUND(CAST(SUM(CAST(x AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 6) AS c
      FROM ex GROUP BY 1, 2
    ),
    norms AS (
      SELECT label,
             CAST(SUM(CAST(c * c AS DECIMAL(30,10))) AS DOUBLE) AS nn
      FROM cent GROUP BY 1
    ),
    dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(SUM(CAST(a.c * b.c AS DECIMAL(30,10))) AS DOUBLE)
               AS dot
      FROM cent a JOIN cent b
        ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT CAST(label_a AS BIGINT) AS label_a,
           CAST(label_b AS BIGINT) AS label_b,
           ROUND(dot / sqrt(na.nn * nb.nn), 4) AS cosine
    FROM dots
    JOIN norms na ON na.label = label_a
    JOIN norms nb ON nb.label = label_b
    ORDER BY label_a, label_b
    """,
    doc="Inter-centroid cosine similarity matrix across embedding "
    "cluster labels — the confusion-structure view on top of q161's "
    "per-cluster cohesion: two centroids near cosine 1 mean the "
    "labels are semantically entangled (merge candidates for "
    "dedup/mixture policy); the full matrix is the input to any "
    "label-taxonomy cleanup. Determinism: centroid coordinates "
    "round(6) through the exact-DECIMAL mean BEFORE any product, so "
    "dots and norms are products of identical doubles summed in "
    "DECIMAL. Scale shape: one posexplode + (label, pos) "
    "partial+final agg folds N vectors to |labels| x dim centroid "
    "rows; the pairwise matrix is a self-join over that TINY frame "
    "(labels², never vectors²).",
)
@plan_cache
def q296(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("p0", "xf")
    ).select(
        "label",
        (F.col("p0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = _managed_persist(
        "q296_centroids",
        ex.groupBy("label", "pos").agg(
            F.round(
                (F.sum(F.col("x").cast(DEC)) / F.count(F.lit(1))).cast(
                    "double"
                ),
                6,
            ).alias("c")
        ),
    )
    norms = cent.groupBy("label").agg(
        F.sum((F.col("c") * F.col("c")).cast(DEC)).cast("double").alias("nn")
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        F.col("c").alias("cb"),
    )
    dots = (
        cent.join(
            b,
            (F.col("pos") == F.col("pos_b"))
            & (F.col("label") < F.col("label_b")),
        )
        .groupBy(F.col("label").alias("label_a"), "label_b")
        .agg(
            F.sum((F.col("c") * F.col("cb")).cast(DEC))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("label").alias("la"), F.col("nn").alias("na"))
    nb = norms.select(F.col("label").alias("lb"), F.col("nn").alias("nb"))
    return (
        dots.join(F.broadcast(na), F.col("label_a") == F.col("la"))
        .join(F.broadcast(nb), F.col("label_b") == F.col("lb"))
        .select(
            F.col("label_a").cast("bigint").alias("label_a"),
            F.col("label_b").cast("bigint").alias("label_b"),
            F.round(
                F.col("dot") / F.sqrt(F.col("na") * F.col("nb")), 4
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


@register(
    "q297",
    oracle=f"""
    WITH r AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             SUM({sql_units2('l_quantity')}) OVER w AS cumw,
             SUM({sql_units2('l_quantity')})
               OVER (PARTITION BY l_returnflag) AS totw
      FROM lineitem
      WINDOW w AS (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    )
    SELECT flag,
           ROUND(CAST(MAX(totw) AS DOUBLE) / 100.0, 4) AS total_weight,
           MIN(CASE WHEN 2 * cumw >= totw THEN price END)
             AS weighted_median
    FROM r GROUP BY flag ORDER BY flag
    """,
    doc="Weighted median — the price point splitting each return "
    "flag's QUANTITY mass in half (the 'typical unit sells at' "
    "number; the unweighted q218 median answers what the typical "
    "LINE costs — different question when quantities skew). "
    "Weights are QUANTIZED AT INGEST to 1e-2 integer units "
    "(units2 — lossless: l_quantity is exact at <= 2 dp), so both "
    "cumulative sums slide LONGs in whole-stage codegen instead of "
    "boxing a DECIMAL accumulator per row (the r11 q44/q289 window "
    "discipline, r14 port; was the 2x cost of this plan). "
    "Determinism: integer-unit window sums with a unique (price, "
    "orderkey, linenumber) sort key, the half-mass test "
    "2·cumw ≥ totw is an exact integer compare (no float rates), "
    "and the pick is MIN over qualifying rows — an actual data "
    "row; total weight unscales by one /100.0 IEEE divide of a "
    "correctly-rounded integer->double cast, identical in both "
    "engines. Scale shape: ONE exchange on the group key carries "
    "both windows and the final conditional agg (q218's single-"
    "exchange quantile plan, weight-generalized).",
)
@plan_cache
def q297(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    wtu = units2(F.col("l_quantity"))
    r = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.sum(wtu).over(w).alias("cumw"),
        F.sum(wtu).over(wn).alias("totw"),
    )
    return (
        r.groupBy("flag")
        .agg(
            F.round(
                F.max("totw").cast("double") / F.lit(100.0), 4
            ).alias("total_weight"),
            F.min(
                F.when(2 * F.col("cumw") >= F.col("totw"), F.col("price"))
            ).alias("weighted_median"),
        )
        .orderBy("flag")
    )


@register(
    "q298",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS gap
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS HUGEINT) AS sx,
             SUM(CAST(gap AS HUGEINT) * gap) AS sxx
      FROM g WHERE gap IS NOT NULL GROUP BY 1
    ),
    v AS (
      SELECT event_type, n,
             CAST(sx AS DOUBLE) / n AS mu,
             CASE WHEN n > 1
                  THEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1)))
                  ELSE NULL END AS sd
      FROM s
    )
    SELECT event_type, n,
           ROUND(mu / 3600, 4) AS mean_gap_h,
           ROUND(sd / 3600, 4) AS sd_gap_h,
           CASE WHEN (sd + mu) <> 0
                THEN ROUND((sd - mu) / (sd + mu), 4)
                ELSE NULL END AS burstiness
    FROM v ORDER BY event_type
    """,
    doc="Inter-event burstiness per event type — B = (σ−μ)/(σ+μ) over "
    "per-user inter-arrival gaps (the Goh-Barabási coefficient: "
    "−1 = metronome, 0 = Poisson, →1 = bursty — tells capacity "
    "planning whether q285's clumping happens in TIME; 'error' "
    "events bursting is an incident signature). Determinism: gaps "
    "are exact integer seconds from ONE (user, type)-partitioned "
    "lag window; Σg/Σg² accumulate as DECIMAL(38,0) (Spark) / "
    "HUGEINT (DuckDB) — exact 128-bit-class integers, so the "
    "variance numerator n·Σg²−(Σg)² is exact-rational with no "
    "BIGINT overflow at any scale (the r7 BIGINT form overflowed "
    "ANSI long at sf0.1), and σ is one sqrt on an identical "
    "double. Scale shape: one exchange on (user, type), mergeable "
    "decimal partials, |types|-row closed form.",
)
@plan_cache
def q298(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.floor(F.unix_timestamp("ts")).cast("bigint")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    g = ev.select(
        "event_type", (epoch - F.lag(epoch).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(18,0)")
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("sx"),
        F.sum(gd * gd).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mu = sx.cast("double") / n
    num = (n.cast("decimal(20,0)") * sxx - sx * sx).cast("double")
    # Degenerate-data guards (q330/q372 class, extended r12): n==1
    # zeroes sd's n*(n-1) divisor; all-zero gaps zero sd+mu — Spark
    # ANSI raises where DuckDB yields NaN/inf, so NULL first, in both.
    sd = F.when(n > 1, F.sqrt(num / (n.cast("double") * (n - 1))))
    return s.select(
        "event_type",
        "n",
        F.round(mu / 3600, 4).alias("mean_gap_h"),
        F.round(sd / 3600, 4).alias("sd_gap_h"),
        F.when(
            (sd + mu) != 0, F.round((sd - mu) / (sd + mu), 4)
        ).alias("burstiness"),
    ).orderBy("event_type")


@register(
    "q299",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                   AS DOUBLE), 4) AS y
      FROM orders GROUP BY 1
    ),
    g AS (SELECT MIN(day) AS d0, MAX(day) AS dmax FROM daily),
    pts AS (
      SELECT day, y,
             CAST(date_diff('day', d0, day) AS BIGINT) AS x,
             CAST(date_diff('day', DATE '1992-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM daily CROSS JOIN g
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM pts
    ),
    ab AS (
      SELECT CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                  ELSE NULL END AS b,
             CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (sy - (n * sxy - sx * sy)
                        / (n * sxx - sx * sx) * sx) / n
                  ELSE NULL END AS a
      FROM s
    ),
    seas AS (
      SELECT dow,
             ROUND(CAST(SUM(CAST(y - (a + b * x) AS DECIMAL(30,10)))
                        / COUNT(*) AS DOUBLE), 4) AS s_dow
      FROM pts CROSS JOIN ab GROUP BY 1
    ),
    future AS (
      SELECT dmax + h AS day,
             CAST(date_diff('day', d0, dmax + h) AS BIGINT) AS x,
             CAST(date_diff('day', DATE '1992-01-01', dmax + h) % 7
                  AS BIGINT) AS dow
      FROM g CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) h(h)
    )
    SELECT CAST(f.day AS VARCHAR) AS day,
           ROUND(a + b * f.x + s_dow, 4) AS forecast
    FROM future f JOIN seas ON f.dow = seas.dow CROSS JOIN ab
    ORDER BY day
    """,
    doc="7-day revenue forecast — linear trend (exact-sufficient-stat "
    "OLS over the whole daily series) plus the day-of-week seasonal "
    "index (mean residual per weekday), extrapolated to the seven "
    "days after the data ends: the baseline forecasting model every "
    "fancier method must beat, produced as a pure QUERY (the engine "
    "emits predictions, not just reports — q133/q278's machinery "
    "pointed forward). Determinism: daily totals round(4) through "
    "DECIMAL; (a, b) come from one closed form on DECIMAL-summed "
    "products; seasonal indices round(4); the forecast is one "
    "a + b·x + s arithmetic chain on identical doubles. Scale "
    "shape: everything beyond the daily fold runs on the "
    "≤|calendar| frame; the future frame is seven generated rows.",
)
@plan_cache
def q299(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # daily feeds the date-bounds fence AND the pts build — 3 orders
    # scans in one plan without materialization (scan-dup probe).
    daily = _managed_persist(
        "q299_daily",
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
            ).alias("y")
        ),
    )
    g = daily.agg(F.min("day").alias("d0"), F.max("day").alias("dmax"))
    pts = _managed_persist(
        "q299_pts",
        daily.crossJoin(F.broadcast(g)).select(
            "y",
            F.datediff("day", "d0").cast("bigint").alias("x"),
            F.pmod(
                F.datediff("day", F.lit("1992-01-01").cast("date")),
                F.lit(7),
            )
            .cast("bigint")
            .alias("dow"),
        ),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    # Single-distinct-day guard (q330/q372 class, extended r12): zero
    # x-variance zeroes the OLS divisor — Spark ANSI raises where
    # DuckDB yields NaN/inf; NULL (a, b) propagate to NULL outputs
    # identically in both engines.
    bden = n * F.col("sxx") - F.col("sx") * F.col("sx")
    bexp = F.when(
        bden != 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / bden,
    )
    ab = s.select(
        bexp.alias("b"),
        ((F.col("sy") - bexp * F.col("sx")) / n).alias("a"),
    )
    seas = (
        pts.crossJoin(F.broadcast(ab))
        .groupBy("dow")
        .agg(
            F.round(
                (
                    F.sum(
                        (
                            F.col("y")
                            - (F.col("a") + F.col("b") * F.col("x"))
                        ).cast(DEC)
                    )
                    / F.count(F.lit(1))
                ).cast("double"),
                4,
            ).alias("s_dow")
        )
    )
    future = (
        spark.range(1, 8)
        .crossJoin(F.broadcast(g))
        .select(
            F.expr("date_add(dmax, CAST(id AS INT))").alias("day"),
            (
                F.datediff(F.expr("date_add(dmax, CAST(id AS INT))"), F.col("d0"))
            )
            .cast("bigint")
            .alias("x"),
            F.pmod(
                F.datediff(
                    F.expr("date_add(dmax, CAST(id AS INT))"),
                    F.lit("1992-01-01").cast("date"),
                ),
                F.lit(7),
            )
            .cast("bigint")
            .alias("dow"),
        )
    )
    return (
        future.join(F.broadcast(seas), "dow")
        .crossJoin(F.broadcast(ab))
        .select(
            F.col("day").cast("string").alias("day"),
            F.round(
                F.col("a") + F.col("b") * F.col("x") + F.col("s_dow"), 4
            ).alias("forecast"),
        )
        .orderBy("day")
    )


@register(
    "q300",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS total_rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             MAX(CAST(o_orderdate AS DATE)) AS dmax
      FROM orders
    ),
    yoy AS (
      SELECT CAST(SUM(CAST(CASE WHEN year(CAST(o_orderdate AS DATE))
                                     = year(dmax) - 1
                           THEN o_totalprice ELSE 0 END
                      AS DECIMAL(30,10))) AS DOUBLE) AS prev_rev,
             CAST(SUM(CAST(CASE WHEN year(CAST(o_orderdate AS DATE))
                                     = year(dmax) - 2
                           THEN o_totalprice ELSE 0 END
                      AS DECIMAL(30,10))) AS DOUBLE) AS prev2_rev
      FROM orders CROSS JOIN rev
    ),
    churn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) FILTER (
               WHERE date_diff('day', last_day,
                               (SELECT dmax FROM rev)) > 90)
               AS BIGINT) AS n_churned
      FROM (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day
            FROM orders GROUP BY 1)
    ),
    nat AS (
      SELECT MAX(concat(lpad(CAST(CAST(FLOOR(r) AS BIGINT) AS VARCHAR), 18, '0'),
                        n_name)) AS nat_key
      FROM (
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(30,10))) AS DOUBLE) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
      )
    )
    SELECT ROUND(total_rev, 2) AS total_rev, n_orders, n_customers,
           CASE WHEN prev2_rev <> 0
                THEN ROUND((prev_rev - prev2_rev) / prev2_rev * 100, 4)
                ELSE NULL END AS yoy_growth_pct,
           {sql_dratio_round('n_churned', 'n_total')} AS churn_rate,
           substr(nat_key, 19) AS top_nation
    FROM rev CROSS JOIN yoy CROSS JOIN churn CROSS JOIN nat
    ORDER BY n_orders
    """,
    doc="Executive KPI one-pager — total revenue, order and customer "
    "counts, YoY growth of the last COMPLETE year, 90-day churn "
    "rate, and the top revenue nation, as ONE wide row (the "
    "dashboard-header query; every number defined elsewhere in the "
    "registry, here composed into a single result). Determinism: "
    "DECIMAL money folds; YoY compares two conditional DECIMAL "
    "sums; the top-nation pick uses the zero-padded (revenue_int, "
    "name) string-max encoding (q238's arg-max discipline — "
    "engine-portable without tuple max_by). Scale shape: three "
    "fact-table passes (order rollup, conditional YoY, the q39 "
    "revenue join), each a standard partial+final plan; everything "
    "joins as 1-row broadcasts at the end.",
)
@plan_cache
def q300(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    # rev is a full-orders fold consumed by the final row AND two dmax
    # broadcast fences (yoy, churn) — three re-runs of the same agg
    # without materialization (6 orders scans in the plan probe).
    rev = _managed_persist(
        "q300_rev",
        o.agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias(
                "total_rev"
            ),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.max(F.to_date("o_orderdate")).alias("dmax"),
        ),
    )
    yr = F.year(F.to_date("o_orderdate"))
    yoy = (
        o.crossJoin(F.broadcast(rev.select("dmax")))
        .agg(
            F.sum(
                F.when(
                    yr == F.year("dmax") - 1, F.col("o_totalprice")
                )
                .otherwise(0.0)
                .cast(DEC)
            )
            .cast("double")
            .alias("prev_rev"),
            F.sum(
                F.when(
                    yr == F.year("dmax") - 2, F.col("o_totalprice")
                )
                .otherwise(0.0)
                .cast(DEC)
            )
            .cast("double")
            .alias("prev2_rev"),
        )
    )
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day")
    )
    churn = (
        per.crossJoin(F.broadcast(rev.select("dmax")))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(
                F.when(F.datediff("dmax", "last_day") > 90, 1)
            ).alias("n_churned"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    nn = load_table(spark, sf_dir, "nation")
    natrev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(nn), c.c_nationkey == nn.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            )
            .cast("double")
            .alias("r")
        )
    )
    nat = natrev.agg(
        F.max(
            F.concat(
                F.lpad(F.col("r").cast("bigint").cast("string"), 18, "0"),
                F.col("n_name"),
            )
        ).alias("nat_key")
    )
    return (
        rev.crossJoin(F.broadcast(yoy))
        .crossJoin(F.broadcast(churn))
        .crossJoin(F.broadcast(nat))
        .select(
            F.round("total_rev", 2).alias("total_rev"),
            "n_orders",
            "n_customers",
            # No-prior-year guard (q330/q372 class, extended r12):
            # Spark ANSI raises where DuckDB yields NaN/inf; NULL both.
            F.when(
                F.col("prev2_rev") != 0,
                F.round(
                    (F.col("prev_rev") - F.col("prev2_rev"))
                    / F.col("prev2_rev")
                    * 100,
                    4,
                ),
            ).alias("yoy_growth_pct"),
            dratio_round(
                F.col("n_churned").cast(DECZ), F.col("n_total").cast(DECZ)
            ).alias("churn_rate"),
            F.substring(F.col("nat_key"), 19, 100).alias("top_nation"),
        )
        .orderBy("n_orders")
    )


@register(
    "q301",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                   AS DOUBLE), 4) AS y
      FROM orders GROUP BY 1
    ),
    g AS (SELECT MIN(day) AS d0, MAX(day) AS dmax FROM daily),
    train AS (
      SELECT day, y,
             CAST(date_diff('day', d0, day) AS BIGINT) AS x,
             CAST(date_diff('day', DATE '1992-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM daily CROSS JOIN g WHERE day <= dmax - 7
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM train
    ),
    ab AS (
      SELECT CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                  ELSE NULL END AS b,
             CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (sy - (n * sxy - sx * sy)
                        / (n * sxx - sx * sx) * sx) / n
                  ELSE NULL END AS a
      FROM s
    ),
    seas AS (
      SELECT dow,
             ROUND(CAST(SUM(CAST(y - (a + b * x) AS DECIMAL(30,10)))
                        / COUNT(*) AS DOUBLE), 4) AS s_dow
      FROM train CROSS JOIN ab GROUP BY 1
    ),
    test AS (
      SELECT day, y,
             CAST(date_diff('day', d0, day) AS BIGINT) AS x,
             CAST(date_diff('day', DATE '1992-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM daily CROSS JOIN g WHERE day > dmax - 7
    ),
    e AS (
      SELECT t.day, t.y,
             ROUND(a + b * t.x + s_dow, 4) AS yhat
      FROM test t JOIN seas ON t.dow = seas.dow CROSS JOIN ab
    )
    SELECT CAST(day AS VARCHAR) AS day, y AS actual, yhat AS forecast,
           ROUND(ABS(y - yhat) / y * 100, 4) AS ape_pct,
           ROUND((yhat - y) / y * 100, 4) AS bias_pct
    FROM e ORDER BY day
    """,
    doc="Forecast backtest — q299's trend+seasonal model refit on "
    "everything EXCEPT the last 7 observed days, then scored against "
    "those held-out actuals with per-day absolute-percentage error "
    "and signed bias: the evaluation loop that must precede trusting "
    "any forecast (a model the engine can fit, it must also be able "
    "to GRADE — train/test hygiene as a pure query). Determinism: "
    "identical to q299's discipline (rounded DECIMAL stages, closed-"
    "form OLS, epoch-mod-7 weekday), holdout boundary in exact date "
    "arithmetic. Scale shape: calendar-bounded frames beyond the "
    "daily fold; train and test are filters on the SAME daily CTE.",
)
@plan_cache
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
            ).alias("y")
        )
    )
    g = daily.agg(F.min("day").alias("d0"), F.max("day").alias("dmax"))
    pts = _managed_persist(
        "q301_pts",
        daily.crossJoin(F.broadcast(g)).select(
            "day",
            "y",
            F.datediff("day", "d0").cast("bigint").alias("x"),
            F.pmod(
                F.datediff("day", F.lit("1992-01-01").cast("date")),
                F.lit(7),
            )
            .cast("bigint")
            .alias("dow"),
            F.col("dmax"),
        ),
    )
    train = pts.where(F.col("day") <= F.date_sub(F.col("dmax"), 7))
    s = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    # Single-distinct-day guard (q330/q372 class, extended r12): zero
    # x-variance zeroes the OLS divisor — Spark ANSI raises where
    # DuckDB yields NaN/inf; NULL (a, b) propagate to NULL outputs
    # identically in both engines.
    bden = n * F.col("sxx") - F.col("sx") * F.col("sx")
    bexp = F.when(
        bden != 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / bden,
    )
    ab = s.select(
        bexp.alias("b"),
        ((F.col("sy") - bexp * F.col("sx")) / n).alias("a"),
    )
    seas = (
        train.crossJoin(F.broadcast(ab))
        .groupBy("dow")
        .agg(
            F.round(
                (
                    F.sum(
                        (
                            F.col("y")
                            - (F.col("a") + F.col("b") * F.col("x"))
                        ).cast(DEC)
                    )
                    / F.count(F.lit(1))
                ).cast("double"),
                4,
            ).alias("s_dow")
        )
    )
    test = pts.where(F.col("day") > F.date_sub(F.col("dmax"), 7))
    e = (
        test.join(F.broadcast(seas), "dow")
        .crossJoin(F.broadcast(ab))
        .select(
            "day",
            "y",
            F.round(
                F.col("a") + F.col("b") * F.col("x") + F.col("s_dow"), 4
            ).alias("yhat"),
        )
    )
    return e.select(
        F.col("day").cast("string").alias("day"),
        F.col("y").alias("actual"),
        F.col("yhat").alias("forecast"),
        F.round(F.abs(F.col("y") - F.col("yhat")) / F.col("y") * 100, 4).alias(
            "ape_pct"
        ),
        F.round((F.col("yhat") - F.col("y")) / F.col("y") * 100, 4).alias(
            "bias_pct"
        ),
    ).orderBy("day")


@register(
    "q302",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS lo,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS hi
      FROM events
    ),
    v AS (
      SELECT event_type, value,
             CASE WHEN FLOOR(epoch(ts)) < (lo + hi) / 2
                  THEN 0 ELSE 1 END AS period
      FROM events CROSS JOIN b
    ),
    th AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.25), 4) AS t1,
             ROUND(quantile_cont(value, 0.50), 4) AS t2,
             ROUND(quantile_cont(value, 0.75), 4) AS t3
      FROM v WHERE period = 0 GROUP BY 1
    ),
    binned AS (
      SELECT v.event_type, period,
             CAST(1 + CAST(value > t1 AS INT) + CAST(value > t2 AS INT)
                    + CAST(value > t3 AS INT) AS INT) AS bin
      FROM v JOIN th ON v.event_type = th.event_type
    ),
    cnt AS (
      SELECT event_type, bin,
             CAST(COUNT(*) FILTER (WHERE period = 0) AS BIGINT) AS c0,
             CAST(COUNT(*) FILTER (WHERE period = 1) AS BIGINT) AS c1
      FROM binned GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1
      FROM cnt GROUP BY 1
    )
    SELECT c.event_type,
           ROUND(CAST(SUM(CAST(
                     (GREATEST(CAST(c0 AS DOUBLE) / n0, 1e-6)
                      - GREATEST(CAST(c1 AS DOUBLE) / n1, 1e-6))
                     * LN(GREATEST(CAST(c0 AS DOUBLE) / n0, 1e-6)
                          / GREATEST(CAST(c1 AS DOUBLE) / n1, 1e-6))
                   AS DECIMAL(30,10))) AS DOUBLE), 4) AS psi
    FROM cnt c JOIN tot t ON c.event_type = t.event_type
    GROUP BY c.event_type ORDER BY c.event_type
    """,
    doc="Population stability index (PSI) drift detector — first-half "
    "vs second-half value distributions per event type over "
    "quartile bins FROM THE REFERENCE PERIOD (the ML-ops drift "
    "gauge: PSI < 0.1 stable, > 0.25 retrain; the distributional "
    "sibling of q254's KS statistic, stated in the binned form "
    "production monitors actually ship). Determinism: reference "
    "fences from exact percentile() rounded 4 dp, bins by strict-> "
    "compares, PSI terms are identical-IEEE products with one ln "
    "per (type, bin), summed over a ≤|types|·4 frame. Scale shape: "
    "fence pass + ONE conditional binned count pass (both "
    "partial+final), closed form on the tiny count frame.",
)
@plan_cache
def q302(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.floor(F.unix_timestamp("ts")).cast("bigint")
    b = ev.agg(F.min(epoch).alias("lo"), F.max(epoch).alias("hi"))
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # v feeds the period-0 threshold fence AND the binned count pass;
    # cnt feeds the per-type totals AND the PSI fold — 8 events scans
    # in one plan without materialization (scan-dup probe).
    v = _managed_persist(
        "q302_v",
        ev.crossJoin(F.broadcast(b)).select(
            "event_type",
            "value",
            F.when(epoch < (F.col("lo") + F.col("hi")) / 2, 0)
            .otherwise(1)
            .alias("period"),
        ),
    )
    th = (
        v.where(F.col("period") == 0)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25D)"), 4).alias("t1"),
            F.round(F.expr("percentile(value, 0.50D)"), 4).alias("t2"),
            F.round(F.expr("percentile(value, 0.75D)"), 4).alias("t3"),
        )
    )
    bin_ = (
        F.lit(1)
        + (F.col("value") > F.col("t1")).cast("int")
        + (F.col("value") > F.col("t2")).cast("int")
        + (F.col("value") > F.col("t3")).cast("int")
    )
    cnt = _managed_persist(
        "q302_cnt",
        v.join(F.broadcast(th), "event_type")
        .groupBy("event_type", bin_.cast("int").alias("bin"))
        .agg(
            F.count(F.when(F.col("period") == 0, 1)).alias("c0"),
            F.count(F.when(F.col("period") == 1, 1)).alias("c1"),
        ),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
    )
    # epsilon-clamp (standard PSI practice): a bin empty in one period
    # would give ln(inf)/NaN and raise on the DECIMAL cast under ANSI.
    p0 = F.greatest(F.col("c0").cast("double") / F.col("n0"), F.lit(1e-6))
    p1 = F.greatest(F.col("c1").cast("double") / F.col("n1"), F.lit(1e-6))
    term = (p0 - p1) * F.log(p0 / p1)
    return (
        cnt.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(term.cast(DEC)).cast("double"), 4).alias("psi")
        )
        .orderBy("event_type")
    )


@register(
    "q303",
    oracle="""
    WITH last_sale AS (
      SELECT l_partkey, MAX(CAST(l_shipdate AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS n_sales
      FROM lineitem GROUP BY 1
    ),
    hw AS (SELECT MAX(last_day) AS dmax FROM last_sale)
    SELECT CAST(p_partkey AS BIGINT) AS partkey, p_brand,
           CASE WHEN last_day IS NULL THEN 'never_sold'
                WHEN date_diff('day', last_day, dmax) > 365
                  THEN 'dead_stock'
                ELSE 'slow' END AS status,
           COALESCE(CAST(n_sales AS BIGINT), 0) AS n_sales,
           CAST(date_diff('day', last_day, dmax) AS BIGINT)
             AS days_since_sale,
           p_retailprice AS value_at_risk
    FROM part
    LEFT JOIN last_sale ON p_partkey = l_partkey
    CROSS JOIN hw
    WHERE last_day IS NULL
       OR date_diff('day', last_day, dmax) > 180
    ORDER BY partkey
    """,
    doc="Dead-stock / slow-mover report — parts never sold or unsold "
    "for 180+ days (365+ = dead), with recency, lifetime sales and "
    "retail value at risk: the inventory-hygiene complement to "
    "q167's Pareto/ABC (which ranks what SELLS; this surfaces what "
    "DOESN'T — the left-anti-shaped question every merchandiser "
    "asks). Scale shape: ONE partial+final fold of the fact table "
    "to per-part recency, a LEFT join from the dimension (never-"
    "sold parts surface as NULLs — the anti join and the aging "
    "report share one plan), 1-row broadcast high-water mark; "
    "exact integer day arithmetic.",
)
@plan_cache
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 lineitem scans): the dmax fence
    # re-ran the per-part fold. Persist it; the fence re-aggs the
    # per-part frame.
    last_sale = _managed_persist(
        "q303_last_sale",
        li.groupBy("l_partkey").agg(
            F.max(F.to_date("l_shipdate")).alias("last_day"),
            F.count(F.lit(1)).alias("n_sales"),
        ),
    )
    hw = last_sale.agg(F.max("last_day").alias("dmax"))
    age = F.datediff("dmax", "last_day")
    status = (
        F.when(F.col("last_day").isNull(), "never_sold")
        .when(age > 365, "dead_stock")
        .otherwise("slow")
    )
    return (
        pt.join(last_sale, pt.p_partkey == last_sale.l_partkey, "left")
        .crossJoin(F.broadcast(hw))
        .where(F.col("last_day").isNull() | (age > 180))
        .select(
            F.col("p_partkey").cast("bigint").alias("partkey"),
            "p_brand",
            status.alias("status"),
            F.coalesce(F.col("n_sales"), F.lit(0))
            .cast("bigint")
            .alias("n_sales"),
            age.cast("bigint").alias("days_since_sale"),
            F.col("p_retailprice").alias("value_at_risk"),
        )
        .orderBy("partkey")
    )


# --------------------------------------------------------------------------
# Wave 43: economics / cohort-value / reliability operators
# --------------------------------------------------------------------------
@register(
    "q316",
    oracle=f"""
    WITH obs AS (
      SELECT p_brand,
             {sql_units6('ln(l_extendedprice / l_quantity)')} AS xu,
             {sql_units6('ln(l_quantity)')} AS yu
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_quantity > 0
    ),
    s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xu) AS DOUBLE) AS sx,
             CAST(SUM(yu) AS DOUBLE) AS sy,
             CAST(SUM(xu * xu) AS DOUBLE) AS sxx,
             CAST(SUM(xu * yu) AS DOUBLE) AS sxy,
             CAST(SUM(yu * yu) AS DOUBLE) AS syy
      FROM obs GROUP BY p_brand
    )
    SELECT p_brand, n,
           CASE WHEN (n * sxy - sx * sy) = 0 THEN 0.0
                WHEN (n * sxx - sx * sx) <> 0
                THEN ROUND((n * sxy - sx * sy)
                           / (n * sxx - sx * sx), 4)
                ELSE NULL END AS elasticity,
           CASE WHEN (n * sxy - sx * sy) = 0 THEN 0.0
                WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0
                THEN ROUND(POWER(n * sxy - sx * sy, 2)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
                ELSE NULL END AS r2
    FROM s ORDER BY p_brand
    """,
    doc="Price-elasticity estimate per brand — log-log OLS of quantity "
    "on unit price (ln q = a + e*ln p; the slope e IS the elasticity), "
    "the demand-curve read every pricing team runs.  The ln inputs "
    "are QUANTIZED AT INGEST on the 1e-6 grid (units6) and the "
    "moments are sums of unit PRODUCTS — the declared statistic "
    "was already 1e-10-quantized (the old per-moment "
    "DECIMAL(30,10) casts), and the 1e-6 grid moves slope/R^2 by "
    "O(5e-7), ~100x below the round(4) output granularity, while "
    "the unit scales cancel exactly in both ratios (no unscaling "
    "anywhere). Scale shape: "
    "the dimension joins BROADCAST (|part| rows, pruned to the two "
    "join/group columns); per-row work is 2 ln + codegen LONG "
    "multiplies (the r13 q321 fixed-point discipline — the old "
    "fold boxed 5 BigDecimals per row); the "
    "corpus folds to a 25-row (|brands|) moment frame in ONE "
    "partial+final agg with exact DECIMAL(38,0) accumulators whose "
    "scale-0 double casts are correctly rounded in BOTH engines; "
    "the slope/R^2 closed form runs per brand row.",
)
@plan_cache
def q316(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    xu = units6(F.log(F.col("l_extendedprice") / F.col("l_quantity")))
    yu = units6(F.log(F.col("l_quantity")))
    s = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select("p_brand", xu.alias("xu"), yu.alias("yu"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("xu").cast(DECZ)).cast("double").alias("sx"),
            F.sum(F.col("yu").cast(DECZ)).cast("double").alias("sy"),
            F.sum((F.col("xu") * F.col("xu")).cast(DECZ))
            .cast("double")
            .alias("sxx"),
            F.sum((F.col("xu") * F.col("yu")).cast(DECZ))
            .cast("double")
            .alias("sxy"),
            F.sum((F.col("yu") * F.col("yu")).cast(DECZ))
            .cast("double")
            .alias("syy"),
        )
    )
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    # Constant-price / constant-quantity guard (q330/q372 class,
    # extended r12): zero variance at either end zeroes a divisor —
    # Spark ANSI raises where DuckDB yields NaN/inf; NULL both. The
    # cov==0 clamp comes FIRST: with exactly-zero covariance the slope
    # is 0 regardless of vx, and deciding via vx would hit the two
    # engines' sub-ulp decimal->double divergence on near-zero vx
    # (0.0 vs -0.0 signs, and NULL-vs-0.0 splits — fence-caught r12).
    return s.select(
        "p_brand",
        "n",
        F.when(cov == 0, F.lit(0.0))
        .when(vx != 0, F.round(cov / vx, 4))
        .alias("elasticity"),
        F.when(cov == 0, F.lit(0.0))
        .when(vx * vy != 0, F.round(F.pow(cov, 2) / (vx * vy), 4))
        .alias("r2"),
    ).orderBy("p_brand")


@register(
    "q317",
    oracle=f"""
    WITH om AS (
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS rev_c
      FROM orders
    ),
    first_m AS (
      SELECT o_custkey, MIN(month) AS cohort FROM om GROUP BY o_custkey
    ),
    sizes AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM first_m GROUP BY cohort
    ),
    ca AS (
      SELECT f.cohort,
             CAST(date_diff('month', f.cohort, om.month) AS BIGINT)
               AS age,
             SUM(om.rev_c) AS rev_u
      FROM om JOIN first_m f ON om.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, age,
             SUM(rev_u) OVER (PARTITION BY cohort ORDER BY age) AS cum_u
      FROM ca
    )
    SELECT CAST(c.cohort AS VARCHAR) AS cohort, c.age, s.n_customers,
           CAST(c.cum_u AS DOUBLE) / 100.0 AS cum_rev,
           {sql_dratio_round('c.cum_u', 's.n_customers * 100')}
             AS ltv_per_customer
    FROM cum c JOIN sizes s ON c.cohort = s.cohort
    ORDER BY cohort, age
    """,
    doc="Cohort LTV curves — customers grouped by first-order month, "
    "cumulative revenue per cohort by month-age, normalized per "
    "cohort customer: the payback/LTV report behind every "
    "acquisition-spend decision (q130's retention counts answer "
    "'do they come back'; this answers 'what are they worth by "
    "age').  Scale shape: the fact folds once to per-customer first "
    "months and once to the (cohort, age) revenue frame — bounded "
    "by |calendar months|^2 (~3.5k rows) at ANY corpus size; the "
    "running LTV cumulates via a window PARTITIONED BY cohort over "
    "that tiny frame; month age is exact integer month arithmetic "
    "on month-truncated dates (identical in both engines — no "
    "day-fraction months_between ambiguity). Float discipline "
    "(r10): revenue flows as exact integer CENTS end-to-end — the "
    "window cumsum is an exact integer sum, cum_rev is an exact "
    "cents/100 double, and ltv_per_customer is rounded with the "
    "integer half-up division of dratio_round — the r9 judge found "
    "3 rows where the old decimal->double->decimal bounce plus a "
    "double ROUND landed one ulp apart across engines exactly on a "
    ".5e-4 boundary.",
)
@plan_cache
def q317(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # om feeds the cohort fold and the age join; first_m feeds the
    # cohort sizes and the age join — 3 orders scans in one plan
    # without materialization (scan-dup probe).
    om = _managed_persist(
        "q317_om",
        load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            F.trunc("o_orderdate", "month").alias("month"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(20,0)")
            .alias("rev_c"),
        ),
    )
    first_m = _managed_persist(
        "q317_first_m",
        om.groupBy("o_custkey").agg(F.min("month").alias("cohort")),
    )
    sizes = first_m.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    ca = (
        om.join(first_m, "o_custkey")
        .groupBy(
            "cohort",
            (
                (F.year("month") - F.year("cohort")) * 12
                + (F.month("month") - F.month("cohort"))
            )
            .cast("long")
            .alias("age"),
        )
        .agg(F.sum("rev_c").alias("rev_u"))
    )
    w = Window.partitionBy("cohort").orderBy("age")
    cum = ca.withColumn("cum_u", F.sum("rev_u").over(w))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            F.col("cohort").cast("string").alias("cohort"),
            "age",
            "n_customers",
            (F.col("cum_u").cast("double") / F.lit(100.0)).alias("cum_rev"),
            dratio_round(
                F.col("cum_u"), (F.col("n_customers") * 100).cast(DECZ)
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort", "age")
    )


@register(
    "q319",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS k
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT month, n, k,
             CAST(k AS DOUBLE) / n AS p,
             1.96 * 1.96 AS z2
      FROM m
    )
    SELECT CAST(month AS VARCHAR) AS month, n, k, ROUND(p, 4) AS p_hat,
           ROUND((p + z2 / (2 * n)
                  - 1.96 * SQRT(p * (1 - p) / n + z2 / (4.0 * n * n)))
                 / (1 + z2 / n), 4) AS wilson_lo,
           ROUND((p + z2 / (2 * n)
                  + 1.96 * SQRT(p * (1 - p) / n + z2 / (4.0 * n * n)))
                 / (1 + z2 / n), 4) AS wilson_hi
    FROM w ORDER BY month
    """,
    doc="SLA attainment with Wilson-score 95% confidence bounds — per "
    "month, the share of events meeting the latency objective "
    "(value <= 100) with the CI every honest SLO report needs "
    "(the Wilson interval stays valid at p near 0/1 and small n, "
    "unlike the normal approximation; z = 1.96).  Scale shape: ONE "
    "conditional partial+final fold of the corpus to the "
    "|calendar months| frame; the interval closed form evaluates "
    "the same IEEE expression per tiny-frame row in both engines.",
)
@plan_cache
def q319(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.trunc(F.col("ts").cast("date"), "month").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("value") <= 100.0, 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    n, k = F.col("n"), F.col("k")
    p = k.cast("double") / n
    z = F.lit(1.96)
    z2 = z * z
    denom = 1 + z2 / n
    center = p + z2 / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    return m.select(
        F.col("month").cast("string").alias("month"),
        "n",
        "k",
        F.round(p, 4).alias("p_hat"),
        F.round((center - half) / denom, 4).alias("wilson_lo"),
        F.round((center + half) / denom, 4).alias("wilson_hi"),
    ).orderBy("month")


@register(
    "q320",
    oracle="""
    WITH wk AS (
      SELECT p_brand,
             CAST(FLOOR(date_diff('day', DATE '1992-01-01',
                        CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT)
               AS week,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
               AS demand
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_weeks,
             CAST(SUM(CAST(demand AS DECIMAL(30,10))) AS DOUBLE) AS sd,
             CAST(SUM(CAST(demand * demand AS DECIMAL(30,10)))
               AS DOUBLE) AS sdd
      FROM wk GROUP BY p_brand
    ),
    d AS (
      SELECT p_brand, n_weeks, sd / n_weeks AS mu,
             SQRT((sdd - sd * sd / n_weeks) / (n_weeks - 1)) AS sigma
      FROM s
    )
    SELECT p_brand, n_weeks, ROUND(mu, 4) AS mean_weekly_demand,
           ROUND(sigma, 4) AS sd_weekly_demand,
           ROUND(1.645 * sigma * SQRT(2.0), 4) AS safety_stock,
           ROUND(mu * 2 + 1.645 * sigma * SQRT(2.0), 4) AS reorder_point
    FROM d ORDER BY p_brand
    """,
    doc="Safety-stock / reorder-point planning per brand — weekly demand "
    "mean and standard deviation drive the classic (z = 1.645, 95% "
    "service level, lead time L = 2 weeks) safety stock "
    "z*sigma*sqrt(L) and reorder point mu*L + safety: the inventory-"
    "planning complement to q303's dead-stock report.  Weeks are "
    "exact integer anchored week numbers via FLOOR(day_diff / 7) "
    "spelled identically in both engines (DuckDB's date_diff('week') "
    "counts calendar week-boundary crossings — a different, "
    "origin-dependent quantity; the q278/q299 weekday lesson).  Scale shape: broadcast dimension join, then the "
    "corpus folds to the |brands| x |weeks| frame and again to "
    "|brands| sufficient stats — two partial+final aggs, DECIMAL "
    "accumulators, closed form per 25-row output.",
)
@plan_cache
def q320(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    wk = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            "p_brand",
            F.floor(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.lit("1992-01-01").cast("date"),
                )
                / 7
            ).alias("week"),
        )
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("demand"))
    )
    s = wk.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum(F.col("demand").cast(DEC)).cast("double").alias("sd"),
        F.sum((F.col("demand") * F.col("demand")).cast(DEC))
        .cast("double")
        .alias("sdd"),
    )
    n = F.col("n_weeks")
    mu = F.col("sd") / n
    sigma = F.sqrt((F.col("sdd") - F.col("sd") * F.col("sd") / n) / (n - 1))
    safety = 1.645 * sigma * F.sqrt(F.lit(2.0))
    return s.select(
        "p_brand",
        "n_weeks",
        F.round(mu, 4).alias("mean_weekly_demand"),
        F.round(sigma, 4).alias("sd_weekly_demand"),
        F.round(safety, 4).alias("safety_stock"),
        F.round(mu * 2 + safety, 4).alias("reorder_point"),
    ).orderBy("p_brand")


@register(
    "q321",
    oracle=f"""
    WITH u AS (
      SELECT {sql_units2('l_quantity')} AS qu,
             {sql_units2('l_extendedprice')} AS pu,
             {sql_units2('l_discount')} AS du,
             {sql_units2('l_tax')} AS tu
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qu) AS DOUBLE) AS sq,
             CAST(SUM(pu) AS DOUBLE) AS sp,
             CAST(SUM(du) AS DOUBLE) AS sd,
             CAST(SUM(tu) AS DOUBLE) AS st,
             CAST(SUM(qu * qu) AS DOUBLE) AS sqq,
             CAST(SUM(pu * pu) AS DOUBLE) AS spp,
             CAST(SUM(du * du) AS DOUBLE) AS sdd,
             CAST(SUM(tu * tu) AS DOUBLE) AS stt,
             CAST(SUM(qu * pu) AS DOUBLE) AS sqp,
             CAST(SUM(qu * du) AS DOUBLE) AS sqd,
             CAST(SUM(qu * tu) AS DOUBLE) AS sqt,
             CAST(SUM(pu * du) AS DOUBLE) AS spd,
             CAST(SUM(pu * tu) AS DOUBLE) AS spt,
             CAST(SUM(du * tu) AS DOUBLE) AS sdt
      FROM u
    )
    SELECT var_a, var_b, ROUND(corr, 4) AS corr FROM (
      SELECT 'disc' AS var_a, 'price' AS var_b,
             CASE WHEN (n * spp - sp * sp)
                  * (n * sdd - sd * sd) <> 0
             THEN (n * spd - sp * sd)
             / (SQRT(n * spp - sp * sp) * SQRT(n * sdd - sd * sd))
             ELSE NULL END
               AS corr FROM s
      UNION ALL SELECT 'disc', 'qty',
             CASE WHEN (n * sqq - sq * sq)
                  * (n * sdd - sd * sd) <> 0
             THEN (n * sqd - sq * sd)
             / (SQRT(n * sqq - sq * sq) * SQRT(n * sdd - sd * sd))
             ELSE NULL END FROM s
      UNION ALL SELECT 'disc', 'tax',
             CASE WHEN (n * sdd - sd * sd)
                  * (n * stt - st * st) <> 0
             THEN (n * sdt - sd * st)
             / (SQRT(n * sdd - sd * sd) * SQRT(n * stt - st * st))
             ELSE NULL END FROM s
      UNION ALL SELECT 'price', 'qty',
             CASE WHEN (n * sqq - sq * sq)
                  * (n * spp - sp * sp) <> 0
             THEN (n * sqp - sq * sp)
             / (SQRT(n * sqq - sq * sq) * SQRT(n * spp - sp * sp))
             ELSE NULL END FROM s
      UNION ALL SELECT 'price', 'tax',
             CASE WHEN (n * spp - sp * sp)
                  * (n * stt - st * st) <> 0
             THEN (n * spt - sp * st)
             / (SQRT(n * spp - sp * sp) * SQRT(n * stt - st * st))
             ELSE NULL END FROM s
      UNION ALL SELECT 'qty', 'tax',
             CASE WHEN (n * sqq - sq * sq)
                  * (n * stt - st * st) <> 0
             THEN (n * sqt - sq * st)
             / (SQRT(n * sqq - sq * sq) * SQRT(n * stt - st * st))
             ELSE NULL END FROM s
    ) ORDER BY var_a, var_b
    """,
    doc="One-pass pairwise correlation matrix over the four lineitem "
    "measures (quantity, extended price, discount, tax) — all "
    "C(4,2) = 6 Pearson coefficients from a SINGLE scan computing "
    "15 mergeable sufficient statistics (the feature-screening / "
    "multicollinearity pre-check before any q308-style regression; "
    "naive per-pair corr() would scan the fact 6 times).  Declared "
    "semantics: all four measures are QUANTIZED AT INGEST to 1e-2 "
    "units (units2 — lossless, lineitem values exact at 2 dp); "
    "per-row products are LONG multiplies inside codegen "
    "accumulating in DECIMAL(38,0) (the r12 fixed-point discipline "
    "ported to moment folds, r13 — replaces the per-row "
    "double->DECIMAL(30,10) cast), scale-0 sum->double casts are "
    "correctly rounded in BOTH engines, and the unit scales cancel "
    "in every correlation.  Scale shape: ONE partial+final fold to "
    "a 1-row moment frame (map-side combinable); the 6 output rows "
    "unfold from that single row driver-free.",
)
@plan_cache
def q321(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li = li.select(
        units2(F.col("l_quantity")).alias("uq"),
        units2(F.col("l_extendedprice")).alias("up"),
        units2(F.col("l_discount")).alias("ud"),
        units2(F.col("l_tax")).alias("ut"),
    )
    cols = {
        "q": F.col("uq"),
        "p": F.col("up"),
        "d": F.col("ud"),
        "t": F.col("ut"),
    }
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for k, c in cols.items():
        aggs.append(F.sum(c.cast(DECZ)).cast("double").alias(f"s{k}"))
    pairs = [("q", "q"), ("p", "p"), ("d", "d"), ("t", "t"),
             ("q", "p"), ("q", "d"), ("q", "t"),
             ("p", "d"), ("p", "t"), ("d", "t")]
    for a, b in pairs:
        aggs.append(
            F.sum((cols[a] * cols[b]).cast(DECZ))
            .cast("double")
            .alias(f"s{a}{b}")
        )
    s = li.agg(*aggs)

    made = {f"{a}{b}" for a, b in pairs}

    def corr(a: str, b: str):
        # Constant-column guard (q330/q372 class, extended r12): zero
        # variance on either side zeroes the divisor — Spark ANSI
        # raises where DuckDB yields NaN/inf; NULL both engines.
        n = F.col("n")
        ab = f"{a}{b}" if f"{a}{b}" in made else f"{b}{a}"
        cov = n * F.col(f"s{ab}") - F.col(f"s{a}") * F.col(f"s{b}")
        va = n * F.col(f"s{a}{a}") - F.col(f"s{a}") * F.col(f"s{a}")
        vb = n * F.col(f"s{b}{b}") - F.col(f"s{b}") * F.col(f"s{b}")
        return F.when(va * vb != 0, cov / (F.sqrt(va) * F.sqrt(vb)))

    names = {"q": "qty", "p": "price", "d": "disc", "t": "tax"}
    out_pairs = [("d", "p"), ("d", "q"), ("d", "t"),
                 ("p", "q"), ("p", "t"), ("q", "t")]
    rows = F.array(
        *[
            F.struct(
                F.lit(names[a]).alias("var_a"),
                F.lit(names[b]).alias("var_b"),
                F.round(corr(a, b), 4).alias("corr"),
            )
            for a, b in out_pairs
        ]
    )
    return (
        s.select(F.explode(rows).alias("r"))
        .select("r.var_a", "r.var_b", "r.corr")
        .orderBy("var_a", "var_b")
    )


@register(
    "q322",
    oracle="""
    WITH lat AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) AS DOUBLE) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(days, 0.5), 4) AS p50,
           ROUND(quantile_cont(days, 0.9), 4) AS p90,
           ROUND(quantile_cont(days, 0.99), 4) AS p99
    FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Order-to-ship latency percentiles per order priority — p50/"
    "p90/p99 of days from order placement to line-item shipment: "
    "the fulfillment-SLA report (does paying for '1-URGENT' "
    "actually ship faster, and at which tail?).  Spark's exact "
    "interpolating percentile() ≡ DuckDB quantile_cont on integer "
    "day diffs cast to double.  Scale shape: the orders side "
    "prunes to two columns before a single shuffle join on "
    "orderkey (both sides fact-scale — sort-merge, AQE-planned); "
    "the corpus then folds to the tiny (priority, days) histogram "
    "in a codegen count agg (map-side combinable — the shuffle "
    "carries <= |priorities|x|day values| cells per task, not "
    "rows), and the exact interpolating percentile runs over the "
    "histogram via percentile()'s frequency argument — value-"
    "identical to the row-level form (r14 A/B: bit-equal outputs) "
    "because Spark's Percentile buffer IS a (value -> count) map; "
    "per-group holistic state is bounded by the day-value domain, "
    "not the row count.",
)
@plan_cache
def q322(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("double")
        .alias("days"),
    )
    hist = lat.groupBy("o_orderpriority", "days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        hist.groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.round(
                F.percentile("days", F.lit(0.5), F.col("cnt")), 4
            ).alias("p50"),
            F.round(
                F.percentile("days", F.lit(0.9), F.col("cnt")), 4
            ).alias("p90"),
            F.round(
                F.percentile("days", F.lit(0.99), F.col("cnt")), 4
            ).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q323",
    oracle="""
    WITH obs AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
               AS wd,
             event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT wd, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM obs GROUP BY wd
    )
    SELECT o.wd AS wd, t.n AS n_events, t.k AS n_types,
           ROUND(CAST(SUM(CAST(
               -(CAST(o.c AS DOUBLE) / t.n) * ln(CAST(o.c AS DOUBLE) / t.n)
             AS DECIMAL(30,10))) AS DOUBLE), 4) AS entropy,
           ROUND(CAST(SUM(CAST(
               -(CAST(o.c AS DOUBLE) / t.n) * ln(CAST(o.c AS DOUBLE) / t.n)
             AS DECIMAL(30,10))) AS DOUBLE) / ln(CAST(t.k AS DOUBLE)), 4)
             AS norm_entropy
    FROM obs o JOIN tot t ON o.wd = t.wd
    GROUP BY o.wd, t.n, t.k ORDER BY o.wd
    """,
    doc="Shannon entropy of the event-type mix per weekday — H = "
    "-Sigma p ln p plus the [0,1]-normalized H/ln(k) evenness "
    "index: the behavioral-diversity monitor (a weekday whose mix "
    "collapses toward one event type is an incident signature; "
    "complements q302's PSI drift which needs two periods).  "
    "Weekday is epoch-day mod 7 (the q278/q311 cross-engine "
    "discipline).  Scale shape: ONE fold of the corpus to the "
    "<= 7 x |types| contingency frame; margins broadcast back; "
    "per-cell p ln p terms stay IEEE double and sum in exact "
    "DECIMAL; zero-count cells cannot occur (group-by only emits "
    "observed cells) so ln never sees 0.",
)
@plan_cache
def q323(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 events scans): the per-weekday
    # totals fence re-ran the corpus fold. Persist the 7x|types| frame.
    obs = _managed_persist(
        "q323_obs",
        ev.groupBy(
            F.pmod(
                F.datediff(
                    F.col("ts").cast("date"),
                    F.lit("1970-01-01").cast("date"),
                ),
                F.lit(7),
            ).alias("wd"),
            "event_type",
        ).agg(F.count(F.lit(1)).cast("long").alias("c")),
    )
    tot = obs.groupBy("wd").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = (-p * F.log(p)).cast(DEC)
    return (
        obs.join(F.broadcast(tot), "wd")
        .groupBy("wd", "n", "k")
        .agg(
            F.round(F.sum(term).cast("double"), 4).alias("entropy"),
            F.round(
                F.sum(term).cast("double") / F.log(F.col("k").cast("double")),
                4,
            ).alias("norm_entropy"),
        )
        .select(
            "wd",
            F.col("n").alias("n_events"),
            F.col("k").alias("n_types"),
            "entropy",
            "norm_entropy",
        )
        .orderBy("wd")
    )


@register(
    "q324",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE user_id IS NOT NULL
    ),
    cal AS (SELECT DISTINCT day FROM ud)
    SELECT CAST(c.day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM cal c JOIN ud u
      ON u.day BETWEEN c.day - 6 AND c.day
    GROUP BY c.day ORDER BY day
    """,
    doc="Exact 7-day rolling active users, DISTINCT-FREE — q164 answers "
    "the same WAU question with the bounded 7x explode followed by "
    "a per-day COUNT DISTINCT (a dedup shuffle holding per-day user "
    "state); this variant eliminates the distinct entirely.  The "
    "oracle states the naive band join (calendar x user-days, "
    "re-deduped per window); the Spark plan uses the GAP-BOUNDED "
    "EXPANSION identity — a user counts for "
    "window day d iff d lies in [a, min(next_active - 1, a + 6)] "
    "for some active day a, so each (user, day) row expands to AT "
    "MOST 7 (day, +1) contributions via sequence+explode after a "
    "lead window per user — the gap bound guarantees each user "
    "contributes AT MOST ONCE per window day, so the per-day result "
    "is a plain ADDITIVE count (map-side-combinable partials, no "
    "dedup state at all).  At 100 TB this is the difference between "
    "shuffling raw (day, user) pairs into a distinct-agg (q164) and "
    "shuffling pre-combined per-partition day counts; output "
    "restricted to days with direct activity.",
)
@plan_cache
def q324(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = _user_day_distinct(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("day")
    spans = ud.withColumn("nxt", F.lead("day").over(w)).select(
        "day",
        F.least(
            F.coalesce(F.date_sub(F.col("nxt"), 1), F.date_add(F.col("day"), 6)),
            F.date_add(F.col("day"), 6),
        ).alias("hi"),
    )
    contrib = spans.select(
        F.explode(F.sequence(F.col("day"), F.col("hi"))).alias("day")
    )
    cal = ud.select("day").distinct()
    return (
        contrib.join(cal, "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
        .select(F.col("day").cast("string").alias("day"), "wau")
        .orderBy("day")
    )


@register(
    "q325",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE user_id IS NOT NULL
    ),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    m AS (
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS active_days,
             CAST(SUM(dau) AS BIGINT) AS sum_dau
      FROM dau GROUP BY 1
    ),
    mau AS (
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      FROM ud GROUP BY 1
    )
    SELECT CAST(m.month AS VARCHAR) AS month, m.active_days, mau.mau,
           {sql_dratio_round('m.sum_dau', 'm.active_days')}
             AS avg_dau,
           {sql_dratio_round('m.sum_dau', 'm.active_days * mau.mau')}
             AS stickiness
    FROM m JOIN mau ON m.month = mau.month
    ORDER BY month
    """,
    doc="DAU/MAU stickiness per calendar month — average daily active "
    "users over monthly active users (the engagement-intensity "
    "ratio; 1.0 = every monthly user active every day), with "
    "active-day and MAU counts.  Scale shape: ONE dedup of the "
    "corpus to (user, day) pairs feeds both branches — the daily "
    "counts (additive fold to |calendar| rows) and the per-month "
    "distinct (one shuffle on (month, user), partial-deduped "
    "map-side); the final join is |months| x |months| broadcast.  "
    "No window, no overlap: calendar months partition, so distinct "
    "IS decomposable here — contrast q324 where overlap forces the "
    "expansion identity.",
)
@plan_cache
def q325(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = _user_day_distinct(spark, sf_dir)
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    m = dau.groupBy(F.trunc("day", "month").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("active_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    mau = (
        ud.groupBy(F.trunc("day", "month").alias("month"))
        .agg(F.countDistinct("user_id").cast("long").alias("mau"))
    )
    avg_dau = F.col("sum_dau").cast("double") / F.col("active_days")
    return (
        m.join(F.broadcast(mau), "month")
        .select(
            F.col("month").cast("string").alias("month"),
            "active_days",
            "mau",
            dratio_round(
                F.col("sum_dau").cast(DECZ), F.col("active_days").cast(DECZ)
            ).alias("avg_dau"),
            dratio_round(
                F.col("sum_dau").cast(DECZ),
                (F.col("active_days") * F.col("mau")).cast(DECZ),
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


@register(
    "q330",
    oracle="""
    WITH daily AS (
      SELECT CAST(FLOOR((doc_id % 730)) AS BIGINT) AS day,
             CAST(SUM(n_chars) AS BIGINT) AS bytes_in
      FROM documents GROUP BY 1
    ),
    cum AS (
      SELECT day, bytes_in,
             CAST(SUM(bytes_in) OVER (ORDER BY day) AS BIGINT) AS stored
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(day AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(bytes_in AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(day * day AS DECIMAL(30,10))) AS DOUBLE)
               AS sxx,
             CAST(SUM(CAST(day * bytes_in AS DECIMAL(30,10))) AS DOUBLE)
               AS sxy,
             CAST(MAX(stored) AS DOUBLE) AS stored_now,
             CAST(MAX(day) AS BIGINT) AS last_day
      FROM cum
    )
    SELECT n AS n_days, CAST(stored_now AS BIGINT) AS stored_bytes,
           CASE WHEN (n * sxx - sx * sx) <> 0
                THEN ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
                ELSE NULL END AS daily_growth,
           CASE WHEN (n * sxx - sx * sx) <> 0
                 AND (n * sxy - sx * sy) <> 0
                THEN ROUND((10 * stored_now - stored_now)
                      / ((n * sxy - sx * sy) / (n * sxx - sx * sx)), 2)
                ELSE NULL END AS days_to_10x
    FROM s
    """,
    doc="Capacity-runway forecast — fit the daily ingest-volume trend "
    "(OLS of bytes/day on day) over the cumulative stored total and "
    "report days until storage reaches 10x today's footprint at the "
    "current growth rate: the 'when do we buy disks' one-pager "
    "(q299's revenue trend pointed at operations).  Ingestion day "
    "derives as doc_id mod 730 (q329's synthetic-clock convention); "
    "volume proxies as n_chars.  Scale shape: ONE fold of the "
    "corpus metadata column to the <=730-row day frame; the "
    "cumulative is a window over that tiny frame (oracle states "
    "it; Spark computes stored_now as a plain SUM — no window "
    "needed for the max of a cumulative of positives); trend "
    "closed-form from DECIMAL moments on one row.",
)
@plan_cache
def q330(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    daily = d.groupBy(
        F.pmod(F.col("doc_id"), F.lit(730)).cast("long").alias("day")
    ).agg(F.sum("n_chars").cast("long").alias("bytes_in"))
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("day").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("bytes_in").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("day") * F.col("day")).cast(DEC))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("day") * F.col("bytes_in")).cast(DEC))
        .cast("double")
        .alias("sxy"),
        F.sum("bytes_in").cast("double").alias("stored_now"),
    )
    n = F.col("n")
    # Degenerate-data guards (regen-fuzz class, r11; widened r12 per
    # ADVICE): the variance denominator n*sxx - sx*sx is exactly 0 when
    # every doc lands on ONE ingest day, and the covariance numerator is
    # 0 on flat ingest — Spark ANSI raises DIVIDE_BY_ZERO on either
    # double divide where DuckDB yields NaN/inf, so BOTH engines agree
    # on NULL first (mirrors q372's (s_den != 0) & (s_num != 0) shape).
    s_num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    s_den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = s_num / s_den
    return s.select(
        n.alias("n_days"),
        F.col("stored_now").cast("long").alias("stored_bytes"),
        F.when(s_den != 0, F.round(slope, 4)).alias("daily_growth"),
        F.when(
            (s_den != 0) & (s_num != 0),
            F.round(
                (10 * F.col("stored_now") - F.col("stored_now")) / slope, 2
            ),
        ).alias("days_to_10x"),
    )


@register(
    "q331",
    oracle="""
    WITH arm AS (
      SELECT user_id % 16 AS bucket, user_id,
             CAST(COUNT(*) AS BIGINT) AS n_ev
      FROM events GROUP BY 1, 2
    ),
    per_split AS (
      SELECT CAST(FLOOR(bucket / 2) AS BIGINT) AS split_id,
             bucket % 2 AS arm_b,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n_ev) AS DOUBLE) AS sx,
             CAST(SUM(n_ev * n_ev) AS DOUBLE) AS sxx
      FROM arm GROUP BY 1, 2
    ),
    z AS (
      SELECT a.split_id,
             CASE WHEN a.n_users > 1 AND b.n_users > 1
                   AND ((a.sxx - a.sx * a.sx / a.n_users)
                        / (a.n_users - 1) / a.n_users
                        + (b.sxx - b.sx * b.sx / b.n_users)
                        / (b.n_users - 1) / b.n_users) <> 0
                  THEN (a.sx / a.n_users - b.sx / b.n_users)
                       / SQRT((a.sxx - a.sx * a.sx / a.n_users)
                          / (a.n_users - 1) / a.n_users
                          + (b.sxx - b.sx * b.sx / b.n_users)
                          / (b.n_users - 1) / b.n_users)
                  ELSE NULL END AS zval
      FROM per_split a JOIN per_split b
        ON a.split_id = b.split_id AND a.arm_b = 0 AND b.arm_b = 1
    )
    SELECT split_id, ROUND(zval, 4) AS z_stat,
           CAST(CASE WHEN ABS(zval) > 1.96 THEN 1 ELSE 0 END AS INT)
             AS false_positive
    FROM z ORDER BY split_id
    """,
    doc="A/A null-experiment audit — 8 deterministic user splits "
    "(user_id mod 16, paired buckets) each z-tested for a "
    "difference in per-user event counts that CANNOT be real: any "
    "|z| > 1.96 is a false positive, and more than ~0-1 of 8 "
    "flags a broken randomization/metric pipeline BEFORE anyone "
    "trusts q242's real A/B readouts (the experimentation-hygiene "
    "harness every platform runs).  Splits are pure hash-free "
    "modulo arithmetic — identical across engines by construction.  "
    "Scale shape: ONE fold to per-user counts, ONE fold to the "
    "16-row (split, arm) moment frame, per-split Welch z closed "
    "form over an 8-row self-join.",
)
@plan_cache
def q331(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = ev.groupBy(
        F.pmod(F.col("user_id"), F.lit(16)).alias("bucket"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 events scans): the a/b arm branches
    # each re-ran the per-user fold. Persist the 16-row split frame.
    per_split = _managed_persist(
        "q331_per_split",
        arm.groupBy(
            F.floor(F.col("bucket") / 2).cast("long").alias("split_id"),
            F.pmod(F.col("bucket"), F.lit(2)).alias("arm_b"),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            # n_ev is an integer count: accumulate at SCALE 0
            # (DECIMAL(38,0) / HUGEINT) so the final decimal->double
            # cast is correctly rounded in BOTH engines at any
            # magnitude — the scale-10 cast diverges sub-ulp once sums
            # pass ~9e5 (r11 probe), which a 100 TB per-arm event total
            # would (r13 discipline sweep).
            F.sum(F.col("n_ev").cast(DECZ)).cast("double").alias("sx"),
            F.sum((F.col("n_ev") * F.col("n_ev")).cast(DECZ))
            .cast("double")
            .alias("sxx"),
        ),
    )
    a = per_split.where(F.col("arm_b") == 0).alias("a")
    b = per_split.where(F.col("arm_b") == 1).alias("b")
    va = (F.col("a.sxx") - F.col("a.sx") * F.col("a.sx") / F.col("a.n_users")) / (
        F.col("a.n_users") - 1
    ) / F.col("a.n_users")
    vb = (F.col("b.sxx") - F.col("b.sx") * F.col("b.sx") / F.col("b.n_users")) / (
        F.col("b.n_users") - 1
    ) / F.col("b.n_users")
    # Degenerate-split guard (q330/q372 class, extended r12; NESTED per
    # the r12 advice): singleton arms or zero pooled variance zero a
    # divisor — Spark ANSI raises where DuckDB yields NaN/inf. Spark
    # does not contractually short-circuit And, so the dividing
    # `(va+vb) != 0` comparison must not exist in the same predicate as
    # the `n_users > 1` test: CaseWhen DOES guarantee non-selected
    # branches (including inner-branch predicates) are not evaluated,
    # so the division-bearing conjunct lives one F.when deeper.
    z = F.when(
        (F.col("a.n_users") > 1) & (F.col("b.n_users") > 1),
        F.when(
            (va + vb) != 0,
            (
                F.col("a.sx") / F.col("a.n_users")
                - F.col("b.sx") / F.col("b.n_users")
            )
            / F.sqrt(va + vb),
        ),
    )
    return (
        a.join(F.broadcast(b), F.col("a.split_id") == F.col("b.split_id"))
        .select(
            F.col("a.split_id").alias("split_id"),
            F.round(z, 4).alias("z_stat"),
            F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("int")
            .alias("false_positive"),
        )
        .orderBy("split_id")
    )


@register(
    "q342",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS placed
      FROM orders
    ),
    done AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS completed
      FROM lineitem GROUP BY l_orderkey
    ),
    placed_d AS (
      SELECT placed AS day, CAST(COUNT(*) AS BIGINT) AS n_placed
      FROM o GROUP BY placed
    ),
    done_d AS (
      SELECT completed AS day, CAST(COUNT(*) AS BIGINT) AS n_done
      FROM o JOIN done ON o_orderkey = l_orderkey
      GROUP BY completed
    ),
    cal AS (
      SELECT day FROM placed_d UNION SELECT day FROM done_d
    ),
    flow AS (
      SELECT cal.day,
             COALESCE(p.n_placed, 0) AS n_placed,
             COALESCE(f.n_done, 0) AS n_done
      FROM cal LEFT JOIN placed_d p ON cal.day = p.day
      LEFT JOIN done_d f ON cal.day = f.day
    ),
    cum AS (
      SELECT day, n_placed, n_done,
             CAST(SUM(n_placed - n_done) OVER (ORDER BY day) AS BIGINT)
               AS backlog
      FROM flow
    )
    SELECT CAST(date_trunc('month', day) AS VARCHAR) AS month,
           CAST(MAX_BY(backlog, day) AS BIGINT) AS month_end_backlog,
           CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
           CAST(SUM(n_placed) AS BIGINT) AS placed,
           CAST(SUM(n_done) AS BIGINT) AS completed
    FROM cum GROUP BY 1 ORDER BY month
    """,
    doc="Order-backlog flow balance — cumulative placed minus cumulative "
    "completed (an order completes when its LAST line item ships), "
    "reported as month-end and peak backlog with monthly in/out "
    "flows: the WIP/queue-depth report behind every fulfillment "
    "capacity decision (Little's-law input; q322 gives the latency "
    "view, this gives the inventory-of-work view).  Scale shape: "
    "one fold per fact to daily in/out counts (the completion fold "
    "is a per-order MAX — partial-combined), a calendar-bounded "
    "full-union merge, ONE running-sum window over the tiny "
    "calendar frame, month rollup via max_by.",
)
@plan_cache
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("placed")
    )
    done = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("completed"))
    )
    placed_d = o.groupBy(F.col("placed").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_placed")
    )
    done_d = (
        o.join(done, o.o_orderkey == done.l_orderkey)
        .groupBy(F.col("completed").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_done"))
    )
    flow = (
        placed_d.join(done_d, "day", "full")
        .select(
            "day",
            F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
            F.coalesce("n_done", F.lit(0)).alias("n_done"),
        )
    )
    # single tiny calendar frame: structurally bounded by |distinct days|;
    # constant partition key via the non-foldable pmod idiom (CLAUDE.md)
    w = (
        Window.partitionBy(F.pmod(F.dayofmonth("day"), F.lit(1)))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = flow.withColumn(
        "backlog", F.sum(F.col("n_placed") - F.col("n_done")).over(w).cast("long")
    )
    return (
        cum.groupBy(F.trunc("day", "month").alias("m"))
        .agg(
            F.max_by("backlog", "day").cast("long").alias("month_end_backlog"),
            F.max("backlog").cast("long").alias("peak_backlog"),
            F.sum("n_placed").cast("long").alias("placed"),
            F.sum("n_done").cast("long").alias("completed"),
        )
        .select(
            F.col("m").cast("string").alias("month"),
            "month_end_backlog",
            "peak_backlog",
            "placed",
            "completed",
        )
        .orderBy("month")
    )


@register(
    "q343",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY day
    ),
    mr AS (
      SELECT day, rev,
             ABS(rev - LAG(rev) OVER (ORDER BY day)) AS m
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(m AS DECIMAL(30,10))) AS DOUBLE) AS sm,
             CAST(COUNT(m) AS BIGINT) AS nm
      FROM mr
    )
    SELECT CAST(mr.day AS VARCHAR) AS day, ROUND(mr.rev, 4) AS rev,
           CAST(CASE WHEN ABS(mr.rev - s.sr / s.n)
                          > 2.66 * (s.sm / s.nm)
                     THEN 1 ELSE 0 END AS INT) AS x_ooc,
           CAST(CASE WHEN mr.m > 3.267 * (s.sm / s.nm)
                     THEN 1 ELSE 0 END AS INT) AS mr_ooc
    FROM mr, s ORDER BY day
    """,
    doc="XmR (individuals / moving-range) control chart on daily "
    "revenue — the SPC chart for single observations per period: "
    "X limits at xbar ± 2.66·MRbar and MR limit at 3.267·MRbar "
    "(the Shewhart constants for n = 2 subgroups), flagging both "
    "level shifts (x_ooc) and volatility spikes (mr_ooc).  "
    "Complements q309's EWMA chart: XmR reacts to single large "
    "shocks, EWMA to small sustained drifts — a real SPC deployment "
    "runs both.  Scale shape: one fold to the calendar frame, ONE "
    "lag window over it (bounded, structurally tiny), limits from a "
    "1-row broadcast of DECIMAL-accumulated moments.",
)
@plan_cache
def q343(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"))
    )
    w = Window.partitionBy(F.pmod(F.dayofmonth("day"), F.lit(1))).orderBy(
        "day"
    )
    mr = daily.withColumn(
        "m", F.abs(F.col("rev") - F.lag("rev").over(w))
    ).localCheckpoint()
    s = mr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rev").cast(DEC)).cast("double").alias("sr"),
        F.sum(F.col("m").cast(DEC)).cast("double").alias("sm"),
        F.count("m").cast("long").alias("nm"),
    )
    xbar = F.col("sr") / F.col("n")
    mrbar = F.col("sm") / F.col("nm")
    return (
        mr.crossJoin(F.broadcast(s))
        .select(
            F.col("day").cast("string").alias("day"),
            F.round("rev", 4).alias("rev"),
            F.when(F.abs(F.col("rev") - xbar) > 2.66 * mrbar, 1)
            .otherwise(0)
            .cast("int")
            .alias("x_ooc"),
            F.when(F.col("m") > 3.267 * mrbar, 1)
            .otherwise(0)
            .cast("int")
            .alias("mr_ooc"),
        )
        .orderBy("day")
    )


@register(
    "q344",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY day
    ),
    med AS (SELECT quantile_cont(rev, 0.5) AS m FROM daily),
    sgn AS (
      SELECT day, CASE WHEN rev > med.m THEN 1 ELSE 0 END AS s
      FROM daily, med WHERE rev <> med.m
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                       OR s <> LAG(s) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS new_run
      FROM sgn
    ),
    c AS (
      SELECT CAST(SUM(new_run) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2
      FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           ROUND(1 + 2.0 * n1 * n2 / (n1 + n2), 4) AS expected_runs,
           ROUND((r - (1 + 2.0 * n1 * n2 / (n1 + n2)))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2) * (n1 + n2 - 1))), 4) AS z_stat
    FROM c
    """,
    doc="Wald-Wolfowitz runs test for randomness — is the daily-revenue "
    "series' above/below-median sign sequence random, or does it "
    "cluster (trend/regime) or alternate (over-correction)?  Runs "
    "counted as sign-change starts (the gaps-and-islands trick on "
    "the sign sequence), exact-median ties excluded, normal-approx "
    "z from the run-count moments: the model-free randomness check "
    "run BEFORE trusting q252's ACF or q299's trend fit.  Scale "
    "shape: one fold to the calendar frame, one lag window over it, "
    "closed form on one row.",
)
@plan_cache
def q344(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"))
        .localCheckpoint()
    )
    med = daily.agg(F.percentile("rev", F.lit(0.5)).alias("m"))
    sgn = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("rev") != F.col("m"))
        .select("day", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w = Window.partitionBy(F.pmod(F.dayofmonth("day"), F.lit(1))).orderBy(
        "day"
    )
    runs = sgn.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.col("s") != F.lag("s").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    c = runs.agg(
        F.sum("new_run").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 1 + 2.0 * n1 * n2 / (n1 + n2)
    vr = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    return c.select(
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        F.round(er, 4).alias("expected_runs"),
        F.round((r - er) / F.sqrt(vr), 4).alias("z_stat"),
    )


@register(
    "q345",
    oracle="""
    WITH cr AS (
      SELECT o_custkey, c_nationkey AS nk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x * ln(x) AS DECIMAL(30,10))) AS DOUBLE)
               AS sxl
      FROM cr GROUP BY nk
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn,
             CAST(SUM(CAST(sx AS DECIMAL(30,10))) AS DOUBLE) AS gs,
             CAST(SUM(CAST(sxl AS DECIMAL(30,10))) AS DOUBLE) AS gl
      FROM g
    ),
    parts AS (
      SELECT
        CAST(SUM(CAST((sx / gs) * ln((sx / gs) / (CAST(n AS DOUBLE) / gn))
             AS DECIMAL(30,10))) AS DOUBLE) AS t_between
      FROM g, tot
    )
    SELECT ROUND(gl / gs - ln(gs / gn), 4) AS theil_total,
           ROUND(t_between, 4) AS theil_between,
           ROUND(gl / gs - ln(gs / gn) - t_between, 4) AS theil_within
    FROM parts, tot
    """,
    doc="Theil T inequality index with between/within-nation "
    "decomposition — T = E[(x/mu)·ln(x/mu)] over per-customer "
    "revenue, split EXACTLY into between-group (nation revenue "
    "shares vs population shares) and within-group terms (within "
    "reported as total − between, the decomposition identity): the "
    "decomposable complement to q255's Gini (Gini does not "
    "decompose; Theil answers 'how much inequality is ACROSS "
    "markets vs INSIDE them').  Per-row x·ln x stays IEEE double, "
    "all folds DECIMAL; groups are |nations| rows.  Scale shape: "
    "broadcast dim join, fold to per-customer, fold to per-nation "
    "sufficient stats, closed form from 1-row broadcasts.",
)
@plan_cache
def q345(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_nationkey").alias("nk"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("x"))
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # The 25-row nation moment frame feeds the grand totals AND the
    # between-group fold — each re-ran the customer spend fold (3
    # orders + 3 customer scans in the plan probe).
    g = _managed_persist(
        "q345_g",
        cr.groupBy("nk").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
            F.sum((F.col("x") * F.log("x")).cast(DEC))
            .cast("double")
            .alias("sxl"),
        ),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum(F.col("sx").cast(DEC)).cast("double").alias("gs"),
        F.sum(F.col("sxl").cast(DEC)).cast("double").alias("gl"),
    )
    share = F.col("sx") / F.col("gs")
    pop = F.col("n").cast("double") / F.col("gn")
    tb = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((share * F.log(share / pop)).cast(DEC))
            .cast("double")
            .alias("t_between")
        )
    )
    t_total = F.col("gl") / F.col("gs") - F.log(F.col("gs") / F.col("gn"))
    return (
        tot.crossJoin(F.broadcast(tb))
        .select(
            F.round(t_total, 4).alias("theil_total"),
            F.round(F.col("t_between"), 4).alias("theil_between"),
            F.round(t_total - F.col("t_between"), 4).alias("theil_within"),
        )
    )


@register(
    "q346",
    oracle=f"""
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT rev,
             NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM cr
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE) AS s
      FROM rk GROUP BY decile
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn,
             CAST(SUM(CAST(s AS DECIMAL(30,10))) AS DOUBLE) AS gs
      FROM d
    ),
    cum AS (
      SELECT decile, n, s,
             CAST(SUM(CAST(s AS DECIMAL(30,10)))
                  OVER (ORDER BY decile) AS DOUBLE) AS cs,
             CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cn
      FROM d
    )
    SELECT CAST(decile AS BIGINT) AS decile, n AS n_customers,
           {sql_dratio_round('cn', 'gn')} AS cum_pop_share,
           ROUND(cs / gs, 4) AS cum_rev_share
    FROM cum, tot ORDER BY decile
    """,
    doc="Lorenz curve at revenue deciles — cumulative population share "
    "vs cumulative revenue share per decile of customers ordered by "
    "spend: the 10-point curve behind q255's Gini scalar (the "
    "'bottom 50% hold X% of revenue' chart).  Decile assignment "
    "uses the deterministic (rev, custkey) tie-break; the oracle "
    "states NTILE over the naive global window, the Spark plan "
    "derives the SAME decile as a pure function of the q255 "
    "two-phase global rank (off + row_number, bucket-partitioned "
    "windows), so both engines assign identical membership.  Scale "
    "shape: fold to per-customer, two-phase rank, fold to 10 rows, "
    "cumulate over the 10-row frame.",
)
@plan_cache
def q346(spark: SparkSession, sf_dir: str) -> DataFrame:
    cr = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"))
    )
    bounds = cr.agg(
        F.expr(
            "percentile(rev, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = cr.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "rev",
        F.expr("size(filter(bs, b -> b < rev))").alias("bk"),
    )
    btot = bucketed.groupBy("bk").agg(F.count(F.lit(1)).alias("bn"))
    b2 = btot.select(F.col("bk").alias("bk2"), F.col("bn").alias("bn2"))
    offsets = (
        btot.join(F.broadcast(b2), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(F.coalesce(F.sum("bn2"), F.lit(0)).alias("off"))
    )
    total = cr.agg(F.count(F.lit(1)).cast("long").alias("gn"))
    wb = Window.partitionBy("bk").orderBy("rev", "o_custkey")
    # NTILE(10) over n rows assigns rank r (1-based) to tile
    # floor((r - 1) * 10 / n) + 1 when n % 10 == 0; in general the first
    # (n % 10) tiles get one extra row — replicate exactly:
    # tile(r) = the unique t with r <= t*q + min(t, rem) where
    # q = n / 10, rem = n % 10; closed form below.
    ranked = (
        bucketed.join(F.broadcast(offsets), "bk")
        .withColumn("r", (F.col("off") + F.row_number().over(wb)).cast("long"))
        .crossJoin(F.broadcast(total))
    )
    q = F.floor(F.col("gn") / 10)
    rem = F.col("gn") % 10
    big = (q + 1) * rem  # rows covered by the first `rem` (larger) tiles
    decile = F.when(
        F.col("r") <= big, F.floor((F.col("r") - 1) / (q + 1)) + 1
    ).otherwise(F.floor((F.col("r") - big - 1) / q) + rem + 1)
    d = (
        ranked.select(decile.cast("long").alias("decile"), "rev")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("rev").cast(DEC)).alias("sdec"),
        )
        .localCheckpoint()
    )
    tot = d.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("sdec").cast("double").alias("gs"),
    )
    wc = Window.partitionBy(F.pmod(F.col("decile"), F.lit(1))).orderBy(
        "decile"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        d.withColumn("cs", F.sum("sdec").over(wc).cast("double"))
        .withColumn("cn", F.sum("n").over(wc).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n").alias("n_customers"),
            dratio_round(
                F.col("cn").cast(DECZ), F.col("gn").cast(DECZ)
            ).alias("cum_pop_share"),
            F.round(F.col("cs") / F.col("gs"), 4).alias("cum_rev_share"),
        )
        .orderBy("decile")
    )


@register(
    "q347",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             MIN(CAST(o_orderdate AS DATE)) AS f,
             MAX(CAST(o_orderdate AS DATE)) AS l
      FROM orders GROUP BY 1
    ),
    cu AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING'
                  THEN 'b' ELSE 'o' END AS grp,
             CAST(date_diff('day', f, l) // 7 AS BIGINT) AS wk,
             CASE WHEN date_diff('day', l, (SELECT MAX(l) FROM per)) > 90
                  THEN 1 ELSE 0 END AS churn
      FROM per p JOIN customer c ON p.o_custkey = c.c_custkey
    ),
    weekly AS (
      SELECT grp, wk, CAST(SUM(churn) AS BIGINT) AS d,
             CAST(SUM(1 - churn) AS BIGINT) AS c
      FROM cu GROUP BY 1, 2
    ),
    grid AS (
      SELECT w.wk, g.grp
      FROM (SELECT DISTINCT wk FROM weekly) w
      CROSS JOIN (SELECT DISTINCT grp FROM weekly) g
    ),
    fill AS (
      SELECT grid.wk, grid.grp,
             COALESCE(weekly.d, 0) AS d, COALESCE(weekly.c, 0) AS c
      FROM grid LEFT JOIN weekly
        ON grid.wk = weekly.wk AND grid.grp = weekly.grp
    ),
    tot AS (
      SELECT grp, CAST(SUM(d + c) AS BIGINT) AS tot
      FROM fill GROUP BY 1
    ),
    risk AS (
      SELECT f.grp, f.wk, f.d,
             CAST(t.tot - COALESCE(SUM(p.d + p.c), 0) AS BIGINT)
               AS n_at_risk
      FROM fill f JOIN tot t ON f.grp = t.grp
      LEFT JOIN fill p ON p.grp = f.grp AND p.wk < f.wk
      GROUP BY f.grp, f.wk, f.d, t.tot
    ),
    wide AS (
      SELECT wk,
             CAST(SUM(CASE WHEN grp = 'b' THEN d ELSE 0 END)
                  AS BIGINT) AS db,
             CAST(SUM(CASE WHEN grp = 'o' THEN d ELSE 0 END)
                  AS BIGINT) AS do_,
             CAST(SUM(CASE WHEN grp = 'b' THEN n_at_risk ELSE 0 END)
                  AS BIGINT) AS nb,
             CAST(SUM(CASE WHEN grp = 'o' THEN n_at_risk ELSE 0 END)
                  AS BIGINT) AS no_
      FROM risk GROUP BY wk
    ),
    terms AS (
      SELECT db, do_, nb, no_, db + do_ AS dtot, nb + no_ AS n
      FROM wide WHERE db + do_ > 0 AND nb + no_ > 1
    ),
    s AS (
      SELECT CAST(SUM(db) AS BIGINT) AS ob,
             CAST(SUM(do_) AS BIGINT) AS od,
             CAST(SUM(CAST(CAST(dtot AS DOUBLE) * nb / n
                           AS DECIMAL(30,10))) AS DOUBLE) AS eb,
             CAST(SUM(CAST(CAST(dtot AS DOUBLE) * no_ / n
                           AS DECIMAL(30,10))) AS DOUBLE) AS eo,
             CAST(SUM(CAST((CAST(dtot AS DOUBLE) * nb / n)
                           * (CAST(no_ AS DOUBLE) / n)
                           * (CAST(n - dtot AS DOUBLE) / (n - 1))
                           AS DECIMAL(30,10))) AS DOUBLE) AS v
      FROM terms
    ),
    tw AS (
      SELECT
        CAST(MAX(CASE WHEN grp = 'b' THEN tot END) AS BIGINT) AS n_b,
        CAST(MAX(CASE WHEN grp = 'o' THEN tot END) AS BIGINT) AS n_o
      FROM tot
    )
    SELECT n_b, n_o, ob AS obs_b, ROUND(eb, 4) AS exp_b,
           od AS obs_o, ROUND(eo, 4) AS exp_o,
           ROUND(CASE WHEN v > 0
                 THEN (ob - eb) * (ob - eb) / v ELSE 0.0 END, 4)
             AS chi2
    FROM s CROSS JOIN tw ORDER BY n_b
    """,
    doc="Log-rank test comparing q265's Kaplan-Meier churn survival "
    "between BUILDING-segment customers and everyone else — the "
    "standard censoring-aware two-group survival comparison (naive "
    "mean-lifetime deltas are biased by right-censored still-active "
    "customers).  Per event week: observed group-b deaths vs "
    "hypergeometric expectation d*nb/n and variance "
    "d*(nb/n)*(no/n)*(n-d)/(n-1); chi2 = (O-E)^2/V on 1 df.  "
    "Scale shape: the fact folds once to per-customer (f, l) rows, "
    "the customer dim joins on the fold's own key, the week grid / "
    "at-risk counts come from triangular broadcast joins over the "
    "calendar-bounded weekly frame (q265's discipline), and the "
    "test statistic is three DECIMAL folds of per-week IEEE-double "
    "terms over that tiny frame.",
)
def q347(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", "b")
        .otherwise("o")
        .alias("grp"),
    )
    # per feeds the anchor fence AND the main chain — without
    # materialization the orders fold runs twice (scan-dup probe).
    per = _managed_persist(
        "q347_per",
        o.groupBy("o_custkey").agg(
            F.min(F.to_date("o_orderdate")).alias("f"),
            F.max(F.to_date("o_orderdate")).alias("l"),
        ),
    )
    anchor = per.agg(F.max("l").alias("anchor"))
    cu = (
        per.join(c, per.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(anchor))
        .select(
            "grp",
            F.expr("CAST(datediff(l, f) DIV 7 AS BIGINT)").alias("wk"),
            F.when(F.datediff("anchor", "l") > 90, 1)
            .otherwise(0)
            .alias("churn"),
        )
    )
    weekly = _managed_persist(
        "q347_weekly",
        cu.groupBy("grp", "wk").agg(
            F.sum("churn").cast("bigint").alias("d"),
            F.sum(1 - F.col("churn")).cast("bigint").alias("c"),
        ),
    )
    grid = (
        weekly.select("wk")
        .distinct()
        .crossJoin(F.broadcast(weekly.select("grp").distinct()))
    )
    fill = _managed_persist(
        "q347_fill",
        grid.join(weekly, ["wk", "grp"], "left").select(
            "wk",
            "grp",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        ),
    )
    tot = fill.groupBy("grp").agg(
        F.sum(F.col("d") + F.col("c")).cast("bigint").alias("tot")
    )
    p = fill.select(
        F.col("grp").alias("pgrp"),
        F.col("wk").alias("pwk"),
        (F.col("d") + F.col("c")).alias("pdc"),
    )
    risk = (
        fill.join(F.broadcast(tot), "grp")
        .join(
            F.broadcast(p),
            (F.col("pgrp") == F.col("grp")) & (F.col("pwk") < F.col("wk")),
            "left",
        )
        .groupBy("grp", "wk", "d", "tot")
        .agg(F.coalesce(F.sum("pdc"), F.lit(0)).alias("seen"))
        .select(
            "grp",
            "wk",
            "d",
            (F.col("tot") - F.col("seen")).cast("bigint").alias("n_at_risk"),
        )
    )
    wide = risk.groupBy("wk").agg(
        F.sum(F.when(F.col("grp") == "b", F.col("d")).otherwise(0))
        .cast("bigint")
        .alias("db"),
        F.sum(F.when(F.col("grp") == "o", F.col("d")).otherwise(0))
        .cast("bigint")
        .alias("do_"),
        F.sum(F.when(F.col("grp") == "b", F.col("n_at_risk")).otherwise(0))
        .cast("bigint")
        .alias("nb"),
        F.sum(F.when(F.col("grp") == "o", F.col("n_at_risk")).otherwise(0))
        .cast("bigint")
        .alias("no_"),
    )
    terms = wide.select(
        "db",
        "do_",
        "nb",
        "no_",
        (F.col("db") + F.col("do_")).alias("dtot"),
        (F.col("nb") + F.col("no_")).alias("n"),
    ).where((F.col("db") + F.col("do_") > 0) & (F.col("nb") + F.col("no_") > 1))
    dtot_d = F.col("dtot").cast("double")
    s = terms.agg(
        F.sum("db").cast("bigint").alias("ob"),
        F.sum("do_").cast("bigint").alias("od"),
        F.sum((dtot_d * F.col("nb") / F.col("n")).cast(DEC))
        .cast("double")
        .alias("eb"),
        F.sum((dtot_d * F.col("no_") / F.col("n")).cast(DEC))
        .cast("double")
        .alias("eo"),
        F.sum(
            (
                (dtot_d * F.col("nb") / F.col("n"))
                * (F.col("no_").cast("double") / F.col("n"))
                * (
                    (F.col("n") - F.col("dtot")).cast("double")
                    / (F.col("n") - 1)
                )
            ).cast(DEC)
        )
        .cast("double")
        .alias("v"),
    )
    tw = tot.agg(
        F.max(F.when(F.col("grp") == "b", F.col("tot")))
        .cast("bigint")
        .alias("n_b"),
        F.max(F.when(F.col("grp") == "o", F.col("tot")))
        .cast("bigint")
        .alias("n_o"),
    )
    return s.crossJoin(F.broadcast(tw)).select(
        "n_b",
        "n_o",
        F.col("ob").alias("obs_b"),
        F.round("eb", 4).alias("exp_b"),
        F.col("od").alias("obs_o"),
        F.round("eo", 4).alias("exp_o"),
        F.round(
            F.when(
                F.col("v") > 0,
                (F.col("ob") - F.col("eb"))
                * (F.col("ob") - F.col("eb"))
                / F.col("v"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("chi2"),
    ).orderBy("n_b")


@register(
    "q348",
    oracle="""
    WITH ue AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CASE WHEN (user_id % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm
      FROM events GROUP BY user_id, event_type
    ),
    arms AS (
      SELECT
        CAST(COUNT(DISTINCT CASE WHEN (user_id % 2147483648)
                                      * 2654435761 % 100 < 50
                                 THEN user_id END) AS BIGINT) AS na,
        CAST(COUNT(DISTINCT CASE WHEN (user_id % 2147483648)
                                      * 2654435761 % 100 >= 50
                                 THEN user_id END) AS BIGINT) AS nb
      FROM events
    ),
    mom AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 'A' THEN n ELSE 0 END)
                  AS BIGINT) AS sxa,
             CAST(SUM(CASE WHEN arm = 'A' THEN n * n ELSE 0 END)
                  AS BIGINT) AS sxxa,
             CAST(SUM(CASE WHEN arm = 'B' THEN n ELSE 0 END)
                  AS BIGINT) AS sxb,
             CAST(SUM(CASE WHEN arm = 'B' THEN n * n ELSE 0 END)
                  AS BIGINT) AS sxxb
      FROM ue GROUP BY event_type
    ),
    z AS (
      SELECT event_type,
             CASE WHEN na > 1 AND nb > 1
                   AND (CAST(na AS HUGEINT) * sxxa
                        - CAST(sxa AS HUGEINT) * sxa)
                       + (CAST(nb AS HUGEINT) * sxxb
                          - CAST(sxb AS HUGEINT) * sxb) <> 0
                  THEN (CAST(sxa AS DOUBLE) / na
                        - CAST(sxb AS DOUBLE) / nb)
                       / SQRT((CAST(sxxa AS DOUBLE)
                          - CAST(sxa AS DOUBLE) * sxa / na) / (na - 1) / na
                         + (CAST(sxxb AS DOUBLE)
                            - CAST(sxb AS DOUBLE) * sxb / nb) / (nb - 1) / nb)
                  ELSE NULL END AS zval
      FROM mom CROSS JOIN arms
    ),
    pv AS (
      SELECT event_type, zval,
             2 * (EXP(-ABS(zval) * ABS(zval) / 2) * 0.3989422804014327)
               * (((((1.330274429 * (1 / (1 + 0.2316419 * ABS(zval)))
                      - 1.821255978) * (1 / (1 + 0.2316419 * ABS(zval)))
                     + 1.781477937) * (1 / (1 + 0.2316419 * ABS(zval)))
                    - 0.356563782) * (1 / (1 + 0.2316419 * ABS(zval)))
                   + 0.319381530) * (1 / (1 + 0.2316419 * ABS(zval))))
               AS p
      FROM z
    ),
    rc AS (
      SELECT event_type, zval, p,
             CAST(ROW_NUMBER() OVER (ORDER BY p, event_type)
                  AS BIGINT) AS rnk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pv
    ),
    kmax AS (
      SELECT COALESCE(MAX(CASE WHEN p <= rnk * 0.10 / m
                               THEN rnk END), 0) AS k
      FROM rc
    )
    SELECT event_type, ROUND(zval, 4) AS z_stat, ROUND(p, 6) AS p_value,
           rnk AS p_rank,
           CAST(CASE WHEN rnk <= k THEN 1 ELSE 0 END AS INT)
             AS significant
    FROM rc CROSS JOIN kmax ORDER BY event_type
    """,
    doc="Benjamini-Hochberg FDR correction over the per-event-type "
    "A/B metric family — one Welch z per event type (per-user count "
    "of that type, q242's deterministic hash split, absent users "
    "contributing implicit zeros through the arm-total denominator), "
    "two-sided p via the Abramowitz-Stegun 26.2.17 normal-tail "
    "polynomial (spelled with IDENTICAL double literals in both "
    "engines — neither has erf), then the BH step-up at FDR 0.10: "
    "reject all p(i) with rank <= max{i : p(i) <= i*alpha/m}.  The "
    "multiple-testing guard q331's single-split A/A audit needs once "
    "dashboards test 25 metrics at once.  Scale shape: one "
    "(user,type) fold with map-side combine, one fold to the "
    "|types|-row moment frame (persisted — rank and step-up "
    "threshold are two branches over it), moment sums in DECIMAL(38,0) (n^2 "
    "per user-type bounded by session length), rank window "
    "bucket-partitioned over the tiny frame.",
)
def q348(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.pmod(
            F.pmod(F.col("user_id"), F.lit(2147483648)) * 2654435761,
            F.lit(100),
        )
        < 50,
        "A",
    ).otherwise("B")
    ue = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("arm", arm)
    )
    arms = ev.agg(
        F.countDistinct(
            F.when(
                F.pmod(
                    F.pmod(F.col("user_id"), F.lit(2147483648)) * 2654435761,
                    F.lit(100),
                )
                < 50,
                F.col("user_id"),
            )
        )
        .cast("bigint")
        .alias("na"),
        F.countDistinct(
            F.when(
                F.pmod(
                    F.pmod(F.col("user_id"), F.lit(2147483648)) * 2654435761,
                    F.lit(100),
                )
                >= 50,
                F.col("user_id"),
            )
        )
        .cast("bigint")
        .alias("nb"),
    )
    mom = _managed_persist(
        "q348_mom",
        ue.groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("arm") == "A", F.col("n"))
                .otherwise(0)
                .cast("decimal(38,0)")
            ).alias("sxa"),
            F.sum(
                F.when(F.col("arm") == "A", F.col("n") * F.col("n"))
                .otherwise(0)
                .cast("decimal(38,0)")
            ).alias("sxxa"),
            F.sum(
                F.when(F.col("arm") == "B", F.col("n"))
                .otherwise(0)
                .cast("decimal(38,0)")
            ).alias("sxb"),
            F.sum(
                F.when(F.col("arm") == "B", F.col("n") * F.col("n"))
                .otherwise(0)
                .cast("decimal(38,0)")
            ).alias("sxxb"),
        )
        .crossJoin(F.broadcast(arms)),
    )
    # Degenerate-data guard (q330/q372 class, extended r12): an empty/
    # singleton arm or a zero-variance metric in BOTH arms (every user
    # has the same count of that type) zeroes a divisor — Spark ANSI
    # raises where DuckDB yields NaN/inf. The condition is spelled
    # DIVISION-FREE (exact decimal variance numerators) because Spark
    # ANSI would raise while merely EVALUATING a dividing predicate.
    vnum = (
        F.col("na") * F.col("sxxa") - F.col("sxa") * F.col("sxa")
    ) + (F.col("nb") * F.col("sxxb") - F.col("sxb") * F.col("sxb"))
    zguard = (F.col("na") > 1) & (F.col("nb") > 1) & (vnum != 0)
    zval = F.when(
        zguard,
        (
            F.col("sxa").cast("double") / F.col("na")
            - F.col("sxb").cast("double") / F.col("nb")
        )
        / F.sqrt(
            (
                F.col("sxxa").cast("double")
                - F.col("sxa").cast("double") * F.col("sxa") / F.col("na")
            )
            / (F.col("na") - 1)
            / F.col("na")
            + (
                F.col("sxxb").cast("double")
                - F.col("sxb").cast("double") * F.col("sxb") / F.col("nb")
            )
            / (F.col("nb") - 1)
            / F.col("nb")
        ),
    )
    z = mom.select("event_type", zval.alias("zval"))
    # Abramowitz-Stegun 26.2.17 upper-tail polynomial; t re-spelled
    # inline exactly as in the oracle so both engines evaluate the
    # same double expression tree.
    t = 1 / (1 + 0.2316419 * F.abs(F.col("zval")))
    p = (
        2
        * (
            F.exp(-F.abs(F.col("zval")) * F.abs(F.col("zval")) / 2)
            * 0.3989422804014327
        )
        * (
            ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
              - 0.356563782) * t + 0.319381530)
            * t
        )
    )
    pv = z.select("event_type", "zval", p.alias("p"))
    # asc_nulls_last matches DuckDB's ascending default; a guarded-NULL
    # p (degenerate data) must rank identically in both engines.
    wr = Window.partitionBy(F.pmod(F.xxhash64("event_type"), F.lit(1))).orderBy(
        F.col("p").asc_nulls_last(), "event_type"
    )
    m = pv.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    rc = (
        pv.crossJoin(F.broadcast(m))
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
    )
    kmax = rc.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") <= F.col("rnk") * 0.10 / F.col("m"),
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    return (
        rc.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            F.round("zval", 4).alias("z_stat"),
            F.round("p", 6).alias("p_value"),
            F.col("rnk").alias("p_rank"),
            F.when(F.col("rnk") <= F.col("k"), 1)
            .otherwise(0)
            .cast("int")
            .alias("significant"),
        )
        .orderBy("event_type")
    )


@register(
    "q349",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    states AS (SELECT DISTINCT prev_type AS st FROM cnt),
    r AS (
      SELECT prev_type, next_type, n FROM cnt
      WHERE next_type IN (SELECT st FROM states)
    ),
    tot AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t
      FROM r GROUP BY prev_type
    ),
    pm AS (
      SELECT r.prev_type AS i, r.next_type AS j,
             CAST(n AS DOUBLE) / t AS pij
      FROM r JOIN tot ON r.prev_type = tot.prev_type
    ),
    ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cs FROM states),
    x0 AS (SELECT st, 1.0 / cs AS w FROM states CROSS JOIN ns),
    x1 AS (
      SELECT j AS st,
             CAST(SUM(CAST(w * pij AS DECIMAL(30,10))) AS DOUBLE) AS w
      FROM x0 JOIN pm ON x0.st = pm.i GROUP BY j
    ),
    x2 AS (
      SELECT j AS st,
             CAST(SUM(CAST(w * pij AS DECIMAL(30,10))) AS DOUBLE) AS w
      FROM x1 JOIN pm ON x1.st = pm.i GROUP BY j
    ),
    x3 AS (
      SELECT j AS st,
             CAST(SUM(CAST(w * pij AS DECIMAL(30,10))) AS DOUBLE) AS w
      FROM x2 JOIN pm ON x2.st = pm.i GROUP BY j
    ),
    h AS (
      SELECT i AS st,
             CAST(SUM(CAST(-pij * LN(pij) AS DECIMAL(30,10)))
                  AS DOUBLE) AS hs
      FROM pm GROUP BY i
    ),
    hr AS (
      SELECT CAST(SUM(CAST(x3.w * h.hs AS DECIMAL(30,10)))
                  AS DOUBLE) AS hrate
      FROM x3 JOIN h ON x3.st = h.st
    )
    SELECT x3.st AS state, ROUND(x3.w, 4) AS pi_3,
           ROUND(h.hs, 4) AS h_state,
           ROUND((SELECT hrate FROM hr), 4) AS entropy_rate
    FROM x3 JOIN h ON x3.st = h.st
    ORDER BY state
    """,
    doc="Markov-chain stationary distribution (3-step power iteration "
    "from uniform) and entropy rate H = sum_i pi_i * "
    "(-sum_j p_ij ln p_ij) over q257's behavioral transition matrix "
    "— the predictability summary of user flows (low H = scripted "
    "journeys, high H = exploratory) and the long-run state "
    "occupancy next-action models should be calibrated against.  "
    "The chain is restricted to states observed as a SOURCE (mass "
    "into pure-sink types is dropped identically in both engines).  "
    "Scale shape: the only corpus-scale work is q257's single "
    "user_id exchange folding to <=|types|^2 counts; that frame is "
    "localCheckpointed ONCE and every power-iteration step, the "
    "row-entropy fold, and the final contraction are broadcast "
    "joins over the tiny matrix (the q118 rule: materialize before "
    "branch fan-out — pm feeds five branches).",
)
@plan_cache
def q349(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    states = cnt.select(F.col("prev_type").alias("st")).distinct()
    r = cnt.join(
        F.broadcast(states), cnt.next_type == states.st, "left_semi"
    )
    tot = r.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("t"))
    pm = (
        r.join(F.broadcast(tot), "prev_type")
        .select(
            F.col("prev_type").alias("i"),
            F.col("next_type").alias("j"),
            (F.col("n").cast("double") / F.col("t")).alias("pij"),
        )
        .localCheckpoint()
    )
    ns = states.agg(F.count(F.lit(1)).cast("double").alias("cs"))
    x = states.crossJoin(F.broadcast(ns)).select(
        "st", (F.lit(1.0) / F.col("cs")).alias("w")
    )
    for _ in range(3):
        x = (
            x.join(F.broadcast(pm), x.st == pm.i)
            .groupBy(F.col("j").alias("st2"))
            .agg(
                F.sum((F.col("w") * F.col("pij")).cast(DEC))
                .cast("double")
                .alias("w")
            )
            .withColumnRenamed("st2", "st")
        )
    h = pm.groupBy(F.col("i").alias("st")).agg(
        F.sum((-F.col("pij") * F.log(F.col("pij"))).cast(DEC))
        .cast("double")
        .alias("hs")
    )
    joined = x.join(F.broadcast(h), "st")
    hr = joined.agg(
        F.sum((F.col("w") * F.col("hs")).cast(DEC))
        .cast("double")
        .alias("hrate")
    )
    return (
        joined.crossJoin(F.broadcast(hr))
        .select(
            F.col("st").alias("state"),
            F.round("w", 4).alias("pi_3"),
            F.round("hs", 4).alias("h_state"),
            F.round("hrate", 4).alias("entropy_rate"),
        )
        .orderBy("state")
    )


@register(
    "q350",
    oracle=f"""
    WITH reps AS (SELECT range AS b FROM range(40)),
    u AS (
      SELECT o_orderkey, {sql_units2('o_totalprice')} AS pu FROM orders
    ),
    ww AS (
      SELECT b, pu,
             CASE
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 367879 THEN 0
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 735759 THEN 1
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 919699 THEN 2
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 981012 THEN 3
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 996340 THEN 4
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 999406 THEN 5
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 999917 THEN 6
               WHEN ((o_orderkey * 40 + b) % 2147483648)
                    * 2654435761 % 1000000 < 999990 THEN 7
               ELSE 8
             END AS w
      FROM u CROSS JOIN reps
    ),
    per AS (
      SELECT b, CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(w * pu) AS DOUBLE) AS swp
      FROM ww GROUP BY b
    ),
    m AS (SELECT b, swp / sw / 100.0 AS mb FROM per),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS bn,
             CAST(SUM(CAST(mb AS DECIMAL(30,10))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(mb * mb AS DECIMAL(30,10))) AS DOUBLE)
               AS smm
      FROM m
    ),
    pt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(pu) AS DOUBLE) / COUNT(*) / 100.0 AS mu
      FROM u
    )
    SELECT n_orders, ROUND(mu, 4) AS point_mean,
           ROUND(SQRT((smm - sm * sm / bn) / (bn - 1)), 4) AS boot_se,
           ROUND(mu - 1.96 * SQRT((smm - sm * sm / bn) / (bn - 1)), 4)
             AS lo95,
           ROUND(mu + 1.96 * SQRT((smm - sm * sm / bn) / (bn - 1)), 4)
             AS hi95
    FROM pt CROSS JOIN s ORDER BY n_orders
    """,
    doc="Poisson-bootstrap 95% CI for mean order value — THE "
    "shared-nothing bootstrap: instead of resampling n rows with "
    "replacement (which needs global coordination), each row draws "
    "an independent Poisson(1) replication weight per replicate, "
    "which converges to the multinomial bootstrap as n grows "
    "(Chamandy et al., 'Estimating Uncertainty for Massive Data "
    "Streams', Google 2012).  40 replicates; weights come from the "
    "q105 multiplicative-hash uniform quantized to integer "
    "micro-units compared against exact Poisson(1) CDF thresholds "
    "— pure 64-bit integer arithmetic, identical in both engines, "
    "no float RNG anywhere.  SE = stddev of replicate means, "
    "normal-interval CI around the exact point estimate.  Declared "
    "semantics: prices are QUANTIZED AT INGEST to integer cents "
    "(units2 — lossless, o_totalprice exact at 2 dp), so the hot "
    "40x-exploded fold sums LONG products in codegen instead of "
    "boxing a BigDecimal per row (the r13 fixed-point discipline); "
    "replicate means divide the correctly-rounded scale-0 sum by "
    "count then by 100 with identical IEEE op order both engines.  "
    "Scale shape: the 40x row expansion is map-side (no shuffle "
    "amplification — partial aggregation folds each partition to "
    "40 rows before the exchange), the replicate frame is 40 rows, "
    "and the 40-row replicate-mean moments stay exact DECIMAL.",
)
@plan_cache
def q350(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # The quantized projection feeds the 40x replicate fold AND the
    # exact point-estimate fold — one materialization, one scan.
    o = _managed_persist(
        "q350_o",
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", units2(F.col("o_totalprice")).alias("pu")
        ),
    )
    h = F.pmod(
        F.pmod(F.col("o_orderkey") * 40 + F.col("b"), F.lit(2147483648))
        * 2654435761,
        F.lit(1000000),
    )
    wcol = (
        F.when(h < 367879, 0)
        .when(h < 735759, 1)
        .when(h < 919699, 2)
        .when(h < 981012, 3)
        .when(h < 996340, 4)
        .when(h < 999406, 5)
        .when(h < 999917, 6)
        .when(h < 999990, 7)
        .otherwise(8)
    )
    ww = o.select(
        "o_orderkey",
        "pu",
        F.explode(F.sequence(F.lit(0), F.lit(39))).alias("b"),
    ).select("b", "pu", wcol.alias("w"))
    per = ww.groupBy("b").agg(
        F.sum("w").cast("bigint").alias("sw"),
        F.sum((F.col("w") * F.col("pu")).cast(DECZ))
        .cast("double")
        .alias("swp"),
    )
    mrep = per.select(
        "b", (F.col("swp") / F.col("sw") / F.lit(100.0)).alias("mb")
    )
    s = mrep.agg(
        F.count(F.lit(1)).cast("bigint").alias("bn"),
        F.sum(F.col("mb").cast(DEC)).cast("double").alias("sm"),
        F.sum((F.col("mb") * F.col("mb")).cast(DEC))
        .cast("double")
        .alias("smm"),
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (
            F.sum(F.col("pu").cast(DECZ)).cast("double")
            / F.count(F.lit(1))
            / F.lit(100.0)
        ).alias("mu"),
    )
    se = F.sqrt(
        (F.col("smm") - F.col("sm") * F.col("sm") / F.col("bn"))
        / (F.col("bn") - 1)
    )
    return pt.crossJoin(F.broadcast(s)).select(
        "n_orders",
        F.round("mu", 4).alias("point_mean"),
        F.round(se, 4).alias("boot_se"),
        F.round(F.col("mu") - 1.96 * se, 4).alias("lo95"),
        F.round(F.col("mu") + 1.96 * se, 4).alias("hi95"),
    ).orderBy("n_orders")


@register(
    "q351",
    oracle=f"""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w WHERE word <> '' GROUP BY 1, 2
    ),
    s AS (
      SELECT lang,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(COUNT(*) FILTER (WHERE cnt = 1) AS BIGINT) AS f1,
             CAST(COUNT(*) FILTER (WHERE cnt = 2) AS BIGINT) AS f2
      FROM wc GROUP BY 1
    )
    SELECT lang, n_tokens, vocab, f1, f2,
           CASE WHEN f2 > 0
                THEN {sql_dratio_round('vocab * 2 * f2 + f1 * f1',
                                       '2 * f2')}
                ELSE {sql_dratio_round('2 * vocab + f1 * (f1 - 1)', '2')}
                END AS chao1,
           {sql_dratio_round('f1', 'n_tokens')} AS unseen_mass
    FROM s ORDER BY lang
    """,
    doc="Vocabulary-richness estimation per language: Chao1 lower "
    "bound on TRUE vocabulary size (V + f1^2/(2 f2), the "
    "species-richness estimator; bias-corrected f1(f1-1)/2 form "
    "when no doubletons) and the Good-Turing unseen-probability "
    "mass f1/N — 'how much vocabulary has this crawl NOT seen "
    "yet', the coverage planning number behind q313's OOV audit "
    "and q108's Zipf head (those describe the seen distribution; "
    "this extrapolates the unseen).  Scale shape: explode to "
    "words, ONE (lang, word) fold with map-side combine (shuffle "
    "bounded by vocabulary), then a |langs|-row frequency-of-"
    "frequencies fold; the estimators are closed-form arithmetic "
    "over five integers per language.",
)
@plan_cache
def q351(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = wc.groupBy("lang").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.count(F.when(F.col("cnt") == 1, 1)).alias("f1"),
        F.count(F.when(F.col("cnt") == 2, 1)).alias("f2"),
    )
    f1d = F.col("f1").cast("double")
    return s.select(
        "lang",
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        F.when(
            F.col("f2") > 0,
            dratio_round(
                (
                    F.col("vocab") * 2 * F.col("f2")
                    + F.col("f1") * F.col("f1")
                ).cast(DECZ),
                (2 * F.col("f2")).cast(DECZ),
            ),
        )
        .otherwise(
            dratio_round(
                (
                    2 * F.col("vocab") + F.col("f1") * (F.col("f1") - 1)
                ).cast(DECZ),
                F.lit(2).cast(DECZ),
            )
        )
        .alias("chao1"),
        dratio_round(
            F.col("f1").cast(DECZ), F.col("n_tokens").cast(DECZ)
        ).alias("unseen_mass"),
    ).orderBy("lang")


@register(
    "q352",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w WHERE word <> '' GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n
      FROM wc GROUP BY 1
    ),
    p AS (
      SELECT wc.source, word, CAST(cnt AS DOUBLE) / n AS pr
      FROM wc JOIN tot ON wc.source = tot.source
    ),
    pair AS (
      SELECT a.source AS s1, b.source AS s2,
             CAST(COUNT(*) AS BIGINT) AS shared_types,
             CAST(SUM(CAST(a.pr * LN(2 * a.pr / (a.pr + b.pr))
                           + b.pr * LN(2 * b.pr / (a.pr + b.pr))
                           AS DECIMAL(30,10))) AS DOUBLE) AS t12,
             CAST(SUM(CAST(a.pr AS DECIMAL(30,10))) AS DOUBLE) AS m1,
             CAST(SUM(CAST(b.pr AS DECIMAL(30,10))) AS DOUBLE) AS m2
      FROM p a JOIN p b ON a.word = b.word AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s1, s2, shared_types,
           ROUND(0.5 * (t12 + 0.6931471805599453 * (1 - m1)
                            + 0.6931471805599453 * (1 - m2))
                 / 0.6931471805599453, 4) AS js_bits
    FROM pair ORDER BY s1, s2
    """,
    doc="Pairwise Jensen-Shannon divergence (in bits) between the "
    "unigram distributions of every source pair — the symmetric, "
    "bounded [0,1] corpus-drift matrix behind mixture design and "
    "crawl-overlap triage (q302's PSI tracks ONE distribution over "
    "time; this compares all sources to each other).  Identity "
    "used: words private to one side contribute exactly "
    "p*ln2, so JS = 0.5*(sum_shared terms + ln2*(1-M1) + "
    "ln2*(1-M2)) where M is each side's shared mass — the whole "
    "statistic needs only the INNER join on shared words, never a "
    "full-outer vocabulary alignment.  Scale shape: one "
    "(source, word) fold (shuffle bounded by vocabulary), the "
    "probability frame self-joins on word (fan-out = sources "
    "sharing the word, grouped map-side to |pairs| rows), "
    "per-word double terms folded in exact DECIMAL.",
)
@plan_cache
def q352(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = wc.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("n"))
    p = _managed_persist(
        "q352_p",
        wc.join(F.broadcast(tot), "source").select(
            "source", "word", (F.col("cnt").cast("double") / F.col("n")).alias("pr")
        ),
    )
    a = p.select(
        F.col("source").alias("s1"), "word", F.col("pr").alias("p1")
    )
    b = p.select(
        F.col("source").alias("s2"),
        F.col("word").alias("word2"),
        F.col("pr").alias("p2"),
    )
    ln2 = 0.6931471805599453
    term = F.col("p1") * F.log(2 * F.col("p1") / (F.col("p1") + F.col("p2"))) + F.col(
        "p2"
    ) * F.log(2 * F.col("p2") / (F.col("p1") + F.col("p2")))
    pair = (
        a.join(b, (F.col("word") == F.col("word2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("shared_types"),
            F.sum(term.cast(DEC)).cast("double").alias("t12"),
            F.sum(F.col("p1").cast(DEC)).cast("double").alias("m1"),
            F.sum(F.col("p2").cast(DEC)).cast("double").alias("m2"),
        )
    )
    return pair.select(
        "s1",
        "s2",
        "shared_types",
        F.round(
            0.5
            * (
                F.col("t12")
                + ln2 * (1 - F.col("m1"))
                + ln2 * (1 - F.col("m2"))
            )
            / ln2,
            4,
        ).alias("js_bits"),
    ).orderBy("s1", "s2")


@register(
    "q353",
    oracle=f"""
    WITH b AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
             MAX(CAST(o_orderdate AS DATE)) AS mx
      FROM orders
    ),
    cut AS (
      SELECT mn + CAST(date_diff('day', mn, mx) * 4 // 5 AS INTEGER)
               AS c
      FROM b
    ),
    d AS (
      SELECT DISTINCT l_orderkey, l_partkey,
             CAST(o_orderdate AS DATE) < (SELECT c FROM cut) AS train
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    pt AS (
      SELECT d1.l_partkey AS a, d2.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS supp
      FROM d d1 JOIN d d2
        ON d1.l_orderkey = d2.l_orderkey
       AND d1.l_partkey < d2.l_partkey
      WHERE d1.train GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    rules AS (
      SELECT a AS ante, b AS cons, supp FROM pt
      UNION ALL
      SELECT b AS ante, a AS cons, supp FROM pt
    ),
    recs AS (
      SELECT ante, cons,
             CAST(ROW_NUMBER() OVER (PARTITION BY ante
                                     ORDER BY supp DESC, cons)
                  AS BIGINT) AS rnk
      FROM rules
    ),
    tp AS (
      SELECT DISTINCT d1.l_partkey AS x, d2.l_partkey AS y
      FROM d d1 JOIN d d2
        ON d1.l_orderkey = d2.l_orderkey
       AND d1.l_partkey <> d2.l_partkey
      WHERE NOT d1.train
    ),
    hits AS (
      SELECT tp.x, tp.y, recs.rnk
      FROM tp LEFT JOIN recs
        ON recs.ante = tp.x AND recs.cons = tp.y AND recs.rnk <= 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test_pairs,
           CAST(COUNT(rnk) AS BIGINT) AS hits_at_3,
           CAST(COUNT(CASE WHEN rnk = 1 THEN 1 END) AS BIGINT)
             AS hits_at_1,
           {sql_dratio_round('COUNT(rnk)', 'COUNT(*)')}
             AS hit_rate,
           {sql_dec_ratio(
               'SUM(CAST(COALESCE(CAST(1.0 AS DOUBLE) / rnk, 0.0)'
               ' AS DECIMAL(30,10)))',
               'COUNT(*)')} AS mrr
    FROM hits ORDER BY n_test_pairs
    """,
    doc="Temporal backtest of the co-purchase recommender: rules are "
    "mined ONLY on the first 80% of the order-date range (integer "
    "day arithmetic for the cut), top-3 recs per part ranked by "
    "(support desc, part id), then every directed co-purchase pair "
    "in the held-out last 20% asks 'was y among x's top-3?' — "
    "hit-rate@3/@1 and MRR, the leakage-free offline eval q291's "
    "serving table needs before anyone ships it (same discipline as "
    "q334's temporal CV folds, applied to a ranking model).  Scale "
    "shape: baskets expand to pairs MAP-SIDE from per-order sorted "
    "arrays (the q139/q291 idiom — the fact is never self-joined "
    "in Spark; the oracle states the naive self-join), one rank "
    "window over the |frequent-pair|-bounded rules frame, and the "
    "eval join probes the broadcast top-3 table.",
)
def q353(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.to_date("o_orderdate")).alias("mn"),
        F.max(F.to_date("o_orderdate")).alias("mx"),
    ).select(
        "mn",
        F.date_add(
            F.col("mn"),
            F.floor(F.datediff("mx", "mn") * 4 / 5).cast("int"),
        ).alias("c"),
    )
    d = _managed_persist(
        "q353_d",
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .join(
            o.select("o_orderkey", F.to_date("o_orderdate").alias("day")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .crossJoin(F.broadcast(b))
        .select(
            "l_orderkey", "l_partkey", (F.col("day") < F.col("c")).alias("train")
        ),
    )

    def _pairs(frame):
        baskets = frame.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("items")
        )
        pp = baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        ).select("p.a", "p.b")
        return pp

    pt = (
        _pairs(d.where("train"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= 2)
    )
    rules = pt.select(
        F.col("a").alias("ante"), F.col("b").alias("cons"), "supp"
    ).unionAll(
        pt.select(F.col("b").alias("ante"), F.col("a").alias("cons"), "supp")
    )
    wr = Window.partitionBy("ante").orderBy(F.col("supp").desc(), "cons")
    recs = (
        rules.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select(F.col("ante"), F.col("cons"), "rnk")
    )
    # Dedup the undirected pairs FIRST, then mirror directions: the
    # expansion emits only a < b, so the two direction sets are
    # disjoint and distinct-of-union == union-of-distinct — half the
    # distinct shuffle bytes. Materialize so both union legs don't
    # re-run the basket expansion (q118 rule).
    tpu = _managed_persist(
        "q353_tpu", _pairs(d.where(~F.col("train"))).distinct()
    )
    tp = tpu.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        tpu.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    hits = tp.join(
        F.broadcast(recs),
        (F.col("ante") == F.col("x")) & (F.col("cons") == F.col("y")),
        "left",
    )
    return hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_pairs"),
        F.count("rnk").cast("bigint").alias("hits_at_3"),
        F.count(F.when(F.col("rnk") == 1, 1)).cast("bigint").alias("hits_at_1"),
        dratio_round(
            F.count("rnk").cast(DECZ), F.count(F.lit(1)).cast(DECZ)
        ).alias("hit_rate"),
        dec_ratio(
            F.sum(F.coalesce(1.0 / F.col("rnk"), F.lit(0.0)).cast(DEC)),
            F.count(F.lit(1)),
        ).alias("mrr"),
    ).orderBy("n_test_pairs")


@register(
    "q354",
    oracle="""
    WITH x AS (
      SELECT i AS dim,
             CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS v
      FROM embeddings
      CROSS JOIN (SELECT range AS i FROM range(64))
    ),
    st AS (
      SELECT dim, MIN(v) AS lo, MAX(v) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM x GROUP BY dim
    ),
    err AS (
      SELECT x.dim,
             CASE WHEN hi > lo THEN
               v - (lo + ROUND((v - lo) / ((hi - lo) / 255))
                         * ((hi - lo) / 255))
             ELSE 0.0 END AS e
      FROM x JOIN st ON x.dim = st.dim
    )
    SELECT st.dim, ROUND(lo, 6) AS lo, ROUND(hi, 6) AS hi,
           ROUND((hi - lo) / 255, 6) AS scale,
           ROUND(SQRT(CAST(SUM(CAST(e * e AS DECIMAL(30,15)))
                           AS DOUBLE) / st.n) * 1000, 4) AS rmse_milli,
           ROUND(MAX(ABS(e)) * 1000, 4) AS max_err_milli
    FROM err JOIN st ON err.dim = st.dim
    GROUP BY st.dim, lo, hi, n ORDER BY st.dim
    """,
    doc="Scalar int8 quantization audit over the embedding corpus: "
    "per-dimension asymmetric min/max quantization to 256 levels, "
    "reporting the per-dimension RMSE and worst-case reconstruction "
    "error (in milli-units) — the storage-planning table behind "
    "'can we serve q92's index at 1/4 the bytes', and the "
    "per-dimension outlier detector (one heavy-tailed dimension "
    "inflates its scale and ruins its RMSE).  round() on "
    "non-negative arguments is half-up in both engines; constant "
    "dimensions quantize losslessly by definition.  Scale shape: "
    "posexplode is map-side, both folds group on the 64-value "
    "dimension key (map-side combine), the stats frame joins back "
    "BROADCAST, and every error sum is an exact DECIMAL "
    "accumulator.",
)
@plan_cache
def q354(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 dup-scan fix (v2 probe: 2 embeddings scans, each paying the
    # full posexplode): the min/max fence and the error pass both
    # rebuilt the exploded frame. The shared _exploded_embeddings
    # helper carries the same values (1-based pos) — derive the 0-based
    # dim from it so both branches read one materialization.
    from hive_hw_spark.queries.llm_ops import _exploded_embeddings

    x = _exploded_embeddings(spark, sf_dir).select(
        (F.col("pos") - 1).alias("dim"), F.col("x").alias("v")
    )
    st = x.groupBy("dim").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    scale = (F.col("hi") - F.col("lo")) / 255
    err = x.join(F.broadcast(st), "dim").select(
        "dim",
        "lo",
        "hi",
        "n",
        F.when(
            F.col("hi") > F.col("lo"),
            F.col("v")
            - (
                F.col("lo")
                + F.round((F.col("v") - F.col("lo")) / scale, 0) * scale
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("e"),
    )
    return (
        err.groupBy("dim", "lo", "hi", "n")
        .agg(
            F.round(
                F.sqrt(
                    F.sum((F.col("e") * F.col("e")).cast("decimal(30,15)"))
                    .cast("double")
                    / F.col("n")
                )
                * 1000,
                4,
            ).alias("rmse_milli"),
            F.round(F.max(F.abs("e")) * 1000, 4).alias("max_err_milli"),
        )
        .select(
            "dim",
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
            F.round(scale, 6).alias("scale"),
            "rmse_milli",
            "max_err_milli",
        )
        .orderBy("dim")
    )


@register(
    "q355",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, c_nationkey,
             CASE WHEN (o_custkey % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
    ),
    mom AS (
      SELECT c_nationkey,
             CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT)
               AS na,
             CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT)
               AS nb,
             CAST(SUM(CAST(CASE WHEN arm = 'A' THEN x ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxa,
             CAST(SUM(CAST(CASE WHEN arm = 'B' THEN x ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxb,
             CAST(SUM(CAST(CASE WHEN arm = 'A' THEN x * x ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxxa,
             CAST(SUM(CAST(CASE WHEN arm = 'B' THEN x * x ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxxb
      FROM spend GROUP BY 1 HAVING na > 1 AND nb > 1
    ),
    tot AS (SELECT CAST(SUM(na + nb) AS BIGINT) AS n FROM mom),
    agg AS (
      SELECT
        CAST(SUM(CAST(CAST(na + nb AS DOUBLE) / n
                      * (sxa / na - sxb / nb)
                      AS DECIMAL(30,10))) AS DOUBLE) AS ate,
        CAST(SUM(CAST((CAST(na + nb AS DOUBLE) / n)
                      * (CAST(na + nb AS DOUBLE) / n)
                      * ((sxxa - sxa * sxa / na) / (na - 1) / na
                         + (sxxb - sxb * sxb / nb) / (nb - 1) / nb)
                      AS DECIMAL(30,10))) AS DOUBLE) AS var_ate,
        CAST(SUM(CAST(sxa AS DECIMAL(30,10))) AS DOUBLE) AS ta,
        CAST(SUM(CAST(sxb AS DECIMAL(30,10))) AS DOUBLE) AS tb,
        CAST(SUM(na) AS BIGINT) AS tna, CAST(SUM(nb) AS BIGINT) AS tnb
      FROM mom CROSS JOIN tot
    )
    SELECT mom.c_nationkey AS nation, na, nb,
           {sql_dratio_round(
               'CAST(sxa*100 AS HUGEINT)*nb - CAST(sxb*100 AS HUGEINT)*na',
               'na * nb * 100')} AS stratum_diff,
           {sql_dratio_round('na + nb', 'tot.n')} AS weight,
           {sql_dratio_round(
               'CAST(agg.ta*100 AS HUGEINT)*agg.tnb'
               ' - CAST(agg.tb*100 AS HUGEINT)*agg.tna',
               'agg.tna * agg.tnb * 100')} AS ate_naive,
           ROUND(agg.ate, 4) AS ate_strat,
           ROUND(agg.ate / SQRT(agg.var_ate), 4) AS z_strat
    FROM mom CROSS JOIN tot CROSS JOIN agg
    ORDER BY nation
    """,
    doc="Post-stratified treatment-effect estimate: per-customer "
    "total spend under the q242 hash arms, stratified by customer "
    "nation — ATE = sum_s w_s (mean_As - mean_Bs) with pooled "
    "stratum weights, Var = sum_s w_s^2 (va/na + vb/nb).  The "
    "second variance-reduction tool next to q292's CUPED "
    "(covariate-based): stratification removes between-nation "
    "variance from the contrast and is the unbiased fix when "
    "assignment happens to imbalance a stratum.  Per-nation rows "
    "carry the stratum diff and weight; the overall naive vs "
    "stratified ATE and its z ride along broadcast.  Scale shape: "
    "one custkey-partitioned fold (customer dim joined on the "
    "fold key), one fold to the |nations|x2 moment frame, closed "
    "forms over tiny frames; strata needing variance get the "
    "na>1/nb>1 guard identically in both engines.",
)
def q355(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    arm = F.when(
        F.pmod(
            F.pmod(F.col("o_custkey"), F.lit(2147483648)) * 2654435761,
            F.lit(100),
        )
        < 50,
        "A",
    ).otherwise("B")
    spend = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_custkey", "c_nationkey", arm.alias("arm"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("x")
        )
    )
    mom = _managed_persist(
        "q355_mom",
        spend.groupBy("c_nationkey")
        .agg(
            F.count(F.when(F.col("arm") == "A", 1)).cast("bigint").alias("na"),
            F.count(F.when(F.col("arm") == "B", 1)).cast("bigint").alias("nb"),
            F.sum(
                F.when(F.col("arm") == "A", F.col("x")).otherwise(0.0).cast(DEC)
            )
            .cast("double")
            .alias("sxa"),
            F.sum(
                F.when(F.col("arm") == "B", F.col("x")).otherwise(0.0).cast(DEC)
            )
            .cast("double")
            .alias("sxb"),
            F.sum(
                F.when(F.col("arm") == "A", F.col("x") * F.col("x"))
                .otherwise(0.0)
                .cast(DEC)
            )
            .cast("double")
            .alias("sxxa"),
            F.sum(
                F.when(F.col("arm") == "B", F.col("x") * F.col("x"))
                .otherwise(0.0)
                .cast(DEC)
            )
            .cast("double")
            .alias("sxxb"),
        )
        .where((F.col("na") > 1) & (F.col("nb") > 1)),
    )
    tot = mom.agg(F.sum(F.col("na") + F.col("nb")).cast("bigint").alias("n"))
    w_s = (F.col("na") + F.col("nb")).cast("double") / F.col("n")
    diff_s = F.col("sxa") / F.col("na") - F.col("sxb") / F.col("nb")
    var_s = (
        F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("na")
    ) / (F.col("na") - 1) / F.col("na") + (
        F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("nb")
    ) / (F.col("nb") - 1) / F.col("nb")
    agg = (
        mom.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((w_s * diff_s).cast(DEC)).cast("double").alias("ate"),
            F.sum((w_s * w_s * var_s).cast(DEC))
            .cast("double")
            .alias("var_ate"),
            F.sum(F.col("sxa").cast(DEC)).cast("double").alias("ta"),
            F.sum(F.col("sxb").cast(DEC)).cast("double").alias("tb"),
            F.sum("na").cast("bigint").alias("tna"),
            F.sum("nb").cast("bigint").alias("tnb"),
        )
    )
    return (
        mom.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(agg))
        .select(
            F.col("c_nationkey").alias("nation"),
            "na",
            "nb",
            dratio_round(
                (
                    (F.col("sxa") * 100).cast(DECZ) * F.col("nb").cast(DECZ)
                    - (F.col("sxb") * 100).cast(DECZ)
                    * F.col("na").cast(DECZ)
                ).cast(DECZ),
                (F.col("na") * F.col("nb") * 100).cast(DECZ),
            ).alias("stratum_diff"),
            dratio_round(
                (F.col("na") + F.col("nb")).cast(DECZ), F.col("n").cast(DECZ)
            ).alias("weight"),
            dratio_round(
                (
                    (F.col("ta") * 100).cast(DECZ) * F.col("tnb").cast(DECZ)
                    - (F.col("tb") * 100).cast(DECZ)
                    * F.col("tna").cast(DECZ)
                ).cast(DECZ),
                (F.col("tna") * F.col("tnb") * 100).cast(DECZ),
            ).alias("ate_naive"),
            F.round("ate", 4).alias("ate_strat"),
            F.round(F.col("ate") / F.sqrt(F.col("var_ate")), 4).alias(
                "z_strat"
            ),
        )
        .orderBy("nation")
    )


@register(
    "q357",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS y
      FROM orders GROUP BY 1
    ),
    xy AS (
      SELECT CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
                  AS BIGINT) AS x, y
      FROM daily
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(x AS DOUBLE) * x AS DECIMAL(30,10)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(30,4))) AS DOUBLE) AS sxy
      FROM xy
    ),
    ols AS (
      SELECT n,
             CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                  ELSE 0.0 END AS b1,
             CASE WHEN (n * sxx - sx * sx) <> 0
                  THEN (sy - (n * sxy - sx * sy)
                        / (n * sxx - sx * sx) * sx) / n
                  ELSE sy / n END AS b0
      FROM m
    ),
    res AS (
      SELECT x, y, y - (b0 + b1 * x) AS r FROM xy CROSS JOIN ols
    ),
    sc AS (
      SELECT 1.4826 * median(abs(r)) AS s FROM res
    ),
    wts AS (
      SELECT x, y,
             CASE WHEN abs(r) <= 1.345 * s THEN 1.0
                  ELSE 1.345 * s / abs(r) END AS w
      FROM res CROSS JOIN sc
    ),
    wm AS (
      SELECT CAST(SUM(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS sw,
             CAST(SUM(CAST(w * x AS DECIMAL(30,10))) AS DOUBLE) AS swx,
             CAST(SUM(CAST(w * y AS DECIMAL(30,10))) AS DOUBLE) AS swy,
             CAST(SUM(CAST(w * x * x AS DECIMAL(30,10))) AS DOUBLE)
               AS swxx,
             CAST(SUM(CAST(w * x * y AS DECIMAL(30,10))) AS DOUBLE)
               AS swxy,
             CAST(COUNT(CASE WHEN w < 1.0 THEN 1 END) AS BIGINT)
               AS n_down
      FROM wts
    )
    SELECT ols.n AS n_days,
           ROUND(ols.b1, 4) AS slope_ols,
           ROUND(ols.b0, 4) AS icept_ols,
           ROUND((SELECT s FROM sc), 4) AS scale_s,
           wm.n_down AS n_downweighted,
           CASE WHEN (sw * swxx - swx * swx) <> 0
                THEN ROUND((sw * swxy - swx * swy)
                           / (sw * swxx - swx * swx), 4)
                ELSE NULL END AS slope_huber,
           CASE WHEN (sw * swxx - swx * swx) <> 0
                THEN ROUND((swy - (sw * swxy - swx * swy)
                             / (sw * swxx - swx * swx) * swx) / sw, 4)
                ELSE NULL END AS icept_huber
    FROM ols CROSS JOIN wm ORDER BY n_days
    """,
    doc="One-step Huber robust trend on daily revenue: plain OLS "
    "(q299's fit), residual scale s = 1.4826*median|r| (q246's MAD "
    "constant), Huber weights w = min(1, 1.345*s/|r|), then ONE "
    "weighted-least-squares refit — the first IRLS iteration, which "
    "captures most of the robustness (promo-day spikes stop "
    "dragging the slope) while staying a fixed two-pass plan "
    "instead of an open-ended iteration.  Reports both fits so the "
    "gap itself is the outlier-influence diagnostic.  Scale shape: "
    "one fold to the calendar frame (persisted — moments, "
    "residuals and the refit all branch from it), 1-row parameter "
    "broadcasts, exact interpolated median over the bounded daily "
    "frame (approx_percentile is the documented 100 TB swap), "
    "every sum a DECIMAL accumulator.",
)
def q357(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    # Scale-4 money accumulators (q414 fence rationale, r12): y and x*y
    # are exact at <= 4 dp (2-dp money, integer day index), so scale 4
    # keeps their sums conversion-exact in both engines up to ~9e11.
    daily = _managed_persist(
        "q357_daily",
        o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("y")
        ),
    )
    mn = daily.agg(F.min("day").alias("mn"))
    xy = _managed_persist(
        "q357_xy",
        daily.crossJoin(F.broadcast(mn)).select(
            F.datediff("day", "mn").cast("bigint").alias("x"), "y"
        ),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(30,4)")).cast("double").alias("sy"),
        F.sum((F.col("x").cast("double") * F.col("x")).cast(DEC))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sxy"),
    )
    # Single-day guard (q330/q372 class, extended r12): on a one-point
    # series the OLS degenerates to (slope 0, intercept = mean) so the
    # residual pipeline still runs; Spark ANSI would raise on the zero
    # variance divisor where DuckDB yields NaN/inf.
    xden = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    b1 = F.when(
        xden != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / xden,
    ).otherwise(F.lit(0.0))
    ols = m.select(
        "n",
        b1.alias("b1"),
        ((F.col("sy") - b1 * F.col("sx")) / F.col("n")).alias("b0"),
    )
    res = xy.crossJoin(F.broadcast(ols)).select(
        "x", "y", (F.col("y") - (F.col("b0") + F.col("b1") * F.col("x"))).alias("r")
    )
    sc = res.agg((1.4826 * F.median(F.abs("r"))).alias("s"))
    wts = res.crossJoin(F.broadcast(sc)).select(
        "x",
        "y",
        F.when(F.abs("r") <= 1.345 * F.col("s"), F.lit(1.0))
        .otherwise(1.345 * F.col("s") / F.abs("r"))
        .alias("w"),
    )
    wm = wts.agg(
        F.sum(F.col("w").cast(DEC)).cast("double").alias("sw"),
        F.sum((F.col("w") * F.col("x")).cast(DEC)).cast("double").alias("swx"),
        F.sum((F.col("w") * F.col("y")).cast(DEC)).cast("double").alias("swy"),
        F.sum((F.col("w") * F.col("x") * F.col("x")).cast(DEC))
        .cast("double")
        .alias("swxx"),
        F.sum((F.col("w") * F.col("x") * F.col("y")).cast(DEC))
        .cast("double")
        .alias("swxy"),
        F.count(F.when(F.col("w") < 1.0, 1)).cast("bigint").alias("n_down"),
    )
    wden = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    hb1 = F.when(
        wden != 0,
        (F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy"))
        / wden,
    )
    return (
        ols.crossJoin(F.broadcast(sc))
        .crossJoin(F.broadcast(wm))
        .select(
            F.col("n").alias("n_days"),
            # duckdb_round_double: on rational series (two-point fence)
            # the OLS outputs land exactly on .5e-4 where Spark F.round
            # and DuckDB ROUND disagree (q160 recipe, extended r12).
            duckdb_round_double(F.col("b1"), 4).alias("slope_ols"),
            duckdb_round_double(F.col("b0"), 4).alias("icept_ols"),
            duckdb_round_double(F.col("s"), 4).alias("scale_s"),
            F.col("n_down").alias("n_downweighted"),
            duckdb_round_double(hb1, 4).alias("slope_huber"),
            F.when(
                wden != 0,
                duckdb_round_double(
                    (F.col("swy") - hb1 * F.col("swx")) / F.col("sw"), 4
                ),
            ).alias("icept_huber"),
        )
        .orderBy("n_days")
    )


@register(
    "q360",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS y
      FROM orders GROUP BY 1
    ),
    xy AS (
      SELECT CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
                  AS BIGINT) AS x, y
      FROM daily
    ),
    cutv AS (SELECT MAX(x) - 28 AS xt FROM xy),
    tr AS (
      SELECT CAST(MAX(x) AS BIGINT) AS xl,
             arg_max(y, x) AS yl,
             CAST(MIN(x) AS BIGINT) AS x0,
             arg_min(y, x) AS y0
      FROM xy CROSS JOIN cutv WHERE x <= xt
    ),
    err AS (
      SELECT t.y,
             t.y - tr.yl AS e_naive,
             t.y - l7.y AS e_snaive,
             t.y - (tr.yl + (t.x - tr.xl)
                            * (tr.yl - tr.y0) / (tr.xl - tr.x0))
               AS e_drift
      FROM xy t CROSS JOIN cutv CROSS JOIN tr
      JOIN xy l7 ON l7.x = t.x - 7
      WHERE t.x > cutv.xt
    ),
    stacked AS (
      SELECT 'drift' AS model, y, e_drift AS e FROM err
      UNION ALL
      SELECT 'naive' AS model, y, e_naive AS e FROM err
      UNION ALL
      SELECT 'snaive' AS model, y, e_snaive AS e FROM err
    )
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(CAST(ABS(e) AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(*), 4) AS mae,
           ROUND(CAST(SUM(CAST(ABS(e) / y AS DECIMAL(30,10)))
                      AS DOUBLE) / COUNT(*), 4) AS mape,
           ROUND(CAST(SUM(CAST(e AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(*), 4) AS bias
    FROM stacked GROUP BY model ORDER BY model
    """,
    doc="Three-model forecast bake-off on a 28-day holdout: naive "
    "(last train value), seasonal-naive (actual from 7 days "
    "earlier), and drift (last value + per-day trend from the "
    "train endpoints) — the mandatory benchmark table before "
    "trusting q299's fitted forecast (a model that can't beat "
    "seasonal-naive isn't a model; Hyndman's forecasting first "
    "commandment).  All three evaluate over the IDENTICAL day set "
    "(test days whose lag-7 day exists), so MAE/MAPE/bias are "
    "directly comparable.  Scale shape: one fold to the persisted "
    "calendar frame, train anchors via arg_max/arg_min in a 1-row "
    "broadcast, lag-7 as a self-join on the tiny frame, one "
    "3x-stacked DECIMAL metric fold.",
)
def q360(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    daily = _managed_persist(
        "q360_daily",
        o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("y")
        ),
    )
    mn = daily.agg(F.min("day").alias("mn"))
    xy = _managed_persist(
        "q360_xy",
        daily.crossJoin(F.broadcast(mn)).select(
            F.datediff("day", "mn").cast("bigint").alias("x"), "y"
        ),
    )
    cutv = xy.agg((F.max("x") - 28).alias("xt"))
    tr = (
        xy.crossJoin(F.broadcast(cutv))
        .where(F.col("x") <= F.col("xt"))
        .agg(
            F.max("x").cast("bigint").alias("xl"),
            F.expr("max_by(y, x)").alias("yl"),
            F.min("x").cast("bigint").alias("x0"),
            F.expr("min_by(y, x)").alias("y0"),
        )
    )
    l7 = xy.select(F.col("x").alias("lx"), F.col("y").alias("ly"))
    err = (
        xy.crossJoin(F.broadcast(cutv))
        .where(F.col("x") > F.col("xt"))
        .crossJoin(F.broadcast(tr))
        .join(F.broadcast(l7), F.col("lx") == F.col("x") - 7)
        .select(
            "y",
            (F.col("y") - F.col("yl")).alias("e_naive"),
            (F.col("y") - F.col("ly")).alias("e_snaive"),
            (
                F.col("y")
                - (
                    F.col("yl")
                    + (F.col("x") - F.col("xl"))
                    * (F.col("yl") - F.col("y0"))
                    / (F.col("xl") - F.col("x0"))
                )
            ).alias("e_drift"),
        )
    )
    stacked = err.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("drift").alias("model"),
                    F.col("y").alias("y"),
                    F.col("e_drift").alias("e"),
                ),
                F.struct(
                    F.lit("naive").alias("model"),
                    F.col("y").alias("y"),
                    F.col("e_naive").alias("e"),
                ),
                F.struct(
                    F.lit("snaive").alias("model"),
                    F.col("y").alias("y"),
                    F.col("e_snaive").alias("e"),
                ),
            )
        ).alias("s")
    ).select("s.model", "s.y", "s.e")
    return (
        stacked.groupBy("model")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum(F.abs("e").cast(DEC)).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("mae"),
            F.round(
                F.sum((F.abs("e") / F.col("y")).cast(DEC)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mape"),
            F.round(
                F.sum(F.col("e").cast(DEC)).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("bias"),
        )
        .orderBy("model")
    )


@register(
    "q363",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({sql_units2('o_totalprice')}) AS DOUBLE) / 100.0
               AS y
      FROM orders GROUP BY 1
    ),
    xy AS (
      SELECT CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
                  AS BIGINT) AS x, y
      FROM daily
    ),
    ms AS (SELECT m FROM (VALUES (8), (16), (32), (64)) AS t(m)),
    blk AS (
      SELECT CAST(ms.m AS BIGINT) AS m, x // ms.m AS b, x, y
      FROM xy CROSS JOIN ms
    ),
    bs AS (
      SELECT m, b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS s,
             CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS ss
      FROM blk GROUP BY 1, 2
    ),
    cum AS (
      SELECT blk.m, blk.b, blk.x,
             CAST(SUM(CAST(blk.y AS DECIMAL(30,10)))
                  OVER (PARTITION BY blk.m, blk.b ORDER BY blk.x
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cy,
             CAST(ROW_NUMBER() OVER (PARTITION BY blk.m, blk.b
                                     ORDER BY blk.x) AS BIGINT) AS k,
             bs.s, bs.ss, bs.n
      FROM blk JOIN bs ON blk.m = bs.m AND blk.b = bs.b
      WHERE bs.n = blk.m
    ),
    rs AS (
      SELECT m, b,
             (MAX(cy - k * (s / n)) - MIN(cy - k * (s / n)))
             / SQRT((ANY_VALUE(ss) - ANY_VALUE(s) * ANY_VALUE(s)
                     / ANY_VALUE(n)) / ANY_VALUE(n)) AS rsv
      FROM cum GROUP BY m, b
    ),
    per_m AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CAST(rsv AS DECIMAL(30,10))) AS DOUBLE)
               / COUNT(*) AS avg_rs
      FROM rs GROUP BY m
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(LN(CAST(m AS DOUBLE)) AS DECIMAL(30,10)))
                  AS DOUBLE) AS sx,
             CAST(SUM(CAST(LN(avg_rs) AS DECIMAL(30,10))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(LN(CAST(m AS DOUBLE))
                           * LN(CAST(m AS DOUBLE)) AS DECIMAL(30,10)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(LN(CAST(m AS DOUBLE)) * LN(avg_rs)
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM per_m
    )
    SELECT per_m.m AS block_size, n_blocks, ROUND(avg_rs, 4) AS avg_rs,
           ROUND((fit.k * sxy - sx * sy) / (fit.k * sxx - sx * sx), 4)
             AS hurst
    FROM per_m CROSS JOIN fit ORDER BY block_size
    """,
    doc="Hurst exponent via rescaled-range (R/S) analysis of daily "
    "revenue: full blocks of 8/16/32/64 days, per-block R = range of "
    "the mean-adjusted cumulative sum, S = population sd, H = "
    "log-log slope of avg(R/S) vs block size — the long-memory "
    "diagnostic (H≈0.5 random walk, H>0.5 persistent trends, H<0.5 "
    "mean-reverting) that q252's short-lag ACF cannot see.  Daily "
    "revenue is QUANTIZED AT INGEST to cents (units2, lossless at "
    "2 dp) so the one fact-scale fold sums LONGs in codegen; both "
    "engines divide the correctly-rounded scale-0 sum by 100.0 "
    "identically (r13 fixed-point port).  Scale "
    "shape: one fold to the calendar frame, a 4x map-side block "
    "expansion, cumulative DECIMAL prefix sums in windows "
    "partitioned by (block size, block) — bounded frames, never "
    "global — and the final fit is a 4-row closed form.  Partial "
    "trailing blocks are excluded (n = m) identically in both "
    "engines.",
)
def q363(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    # daily feeds the origin fence AND the xy build — the daily fold
    # re-ran for each (2 orders scans in the plan probe).
    daily = _managed_persist(
        "q363_daily",
        o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
            (
                F.sum(units2(F.col("o_totalprice"))).cast("double")
                / F.lit(100.0)
            ).alias("y")
        ),
    )
    mn = daily.agg(F.min("day").alias("mn"))
    xy = _managed_persist(
        "q363_xy",
        daily.crossJoin(F.broadcast(mn)).select(
            F.datediff("day", "mn").cast("bigint").alias("x"), "y"
        ),
    )
    blk = xy.crossJoin(
        F.broadcast(
            xy.sparkSession.createDataFrame(
                [(8,), (16,), (32,), (64,)], "m long"
            )
        )
    ).select("m", F.floor(F.col("x") / F.col("m")).alias("b"), "x", "y")
    bs = blk.groupBy("m", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("ss"),
    )
    w = Window.partitionBy("m", "b").orderBy("x")
    cum = (
        blk.join(bs, ["m", "b"])
        .where(F.col("n") == F.col("m"))
        .select(
            "m",
            "b",
            "s",
            "ss",
            "n",
            F.sum(F.col("y").cast(DEC))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("cy"),
            F.row_number().over(w).cast("bigint").alias("k"),
        )
    )
    z = F.col("cy") - F.col("k") * (F.col("s") / F.col("n"))
    rs = (
        cum.groupBy("m", "b")
        .agg(
            (
                (F.max(z) - F.min(z))
                / F.sqrt(
                    (
                        F.any_value("ss")
                        - F.any_value("s") * F.any_value("s") / F.any_value("n")
                    )
                    / F.any_value("n")
                )
            ).alias("rsv")
        )
    )
    per_m = rs.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        (
            F.sum(F.col("rsv").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("avg_rs"),
    )
    lm = F.log(F.col("m").cast("double"))
    fit = per_m.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(lm.cast(DEC)).cast("double").alias("sx"),
        F.sum(F.log("avg_rs").cast(DEC)).cast("double").alias("sy"),
        F.sum((lm * lm).cast(DEC)).cast("double").alias("sxx"),
        F.sum((lm * F.log("avg_rs")).cast(DEC)).cast("double").alias("sxy"),
    )
    return (
        per_m.crossJoin(F.broadcast(fit))
        .select(
            F.col("m").alias("block_size"),
            "n_blocks",
            F.round("avg_rs", 4).alias("avg_rs"),
            F.round(
                (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
                4,
            ).alias("hurst"),
        )
        .orderBy("block_size")
    )


@register(
    "q364",
    oracle="""
    WITH b AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
             MAX(CAST(o_orderdate AS DATE)) AS mx
      FROM orders
    ),
    cells AS (
      SELECT CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS treated,
             CASE WHEN CAST(o_orderdate AS DATE)
                       >= mn + CAST(date_diff('day', mn, mx) // 2
                                    AS INTEGER)
                  THEN 1 ELSE 0 END AS post,
             o_totalprice AS x
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      CROSS JOIN b
    ),
    mom AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx
      FROM cells GROUP BY 1, 2
    ),
    wd AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN sx / n END) AS tp,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN sx / n END) AS tr,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN sx / n END) AS cp,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN sx / n END) AS cr,
        CAST(SUM(CAST((sxx - sx * sx / n) / (n - 1) / n
                      AS DECIMAL(30,10))) AS DOUBLE) AS var_did,
        CAST(MAX(CASE WHEN treated = 1 AND post = 1 THEN n END)
             AS BIGINT) AS n_tp
      FROM mom
    )
    SELECT n_tp AS n_treated_post,
           ROUND(tr, 4) AS treated_pre, ROUND(tp, 4) AS treated_post,
           ROUND(cr, 4) AS control_pre, ROUND(cp, 4) AS control_post,
           ROUND((tp - tr) - (cp - cr), 4) AS did,
           ROUND(((tp - tr) - (cp - cr)) / SQRT(var_did), 4) AS z_did
    FROM wd ORDER BY n_treated_post
    """,
    doc="Difference-in-differences: ASIA-region customers as the "
    "'treated' group, order value as the outcome, the date-range "
    "midpoint as the policy instant — DiD = (T_post - T_pre) - "
    "(C_post - C_pre) removes both the group-level baseline gap "
    "and the common time trend, the observational-causal "
    "complement to the randomized q242/q355 family (when you "
    "cannot randomize, you difference twice).  SE from the four "
    "independent cell variances.  Scale shape: the dim chain "
    "(customer, nation, region) joins the fact once, one fold to "
    "the 4-cell moment frame, closed forms on one row; the period "
    "split is integer day arithmetic identical in both engines.",
)
def q364(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    b = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("mn"),
        F.max(F.col("o_orderdate").cast("date")).alias("mx"),
    )
    cells = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .crossJoin(F.broadcast(b))
        .select(
            F.when(F.col("r_name") == "ASIA", 1).otherwise(0).alias("treated"),
            F.when(
                F.col("o_orderdate").cast("date")
                >= F.date_add(
                    F.col("mn"),
                    F.floor(F.datediff("mx", "mn") / 2).cast("int"),
                ),
                1,
            )
            .otherwise(0)
            .alias("post"),
            F.col("o_totalprice").alias("x"),
        )
    )
    mom = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
    )
    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("sx") / F.col("n"),
            )
        )

    wd = mom.agg(
        cell(1, 1).alias("tp"),
        cell(1, 0).alias("tr"),
        cell(0, 1).alias("cp"),
        cell(0, 0).alias("cr"),
        F.sum(
            (
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
                / F.col("n")
            ).cast(DEC)
        )
        .cast("double")
        .alias("var_did"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("n"))
        )
        .cast("bigint")
        .alias("n_tp"),
    )
    did = (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))
    return wd.select(
        F.col("n_tp").alias("n_treated_post"),
        F.round("tr", 4).alias("treated_pre"),
        F.round("tp", 4).alias("treated_post"),
        F.round("cr", 4).alias("control_pre"),
        F.round("cp", 4).alias("control_post"),
        F.round(did, 4).alias("did"),
        F.round(did / F.sqrt(F.col("var_did")), 4).alias("z_did"),
    ).orderBy("n_treated_post")


@register(
    "q366",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, c_nationkey, c_acctbal,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
    ),
    med AS (SELECT median(c_acctbal) AS md FROM spend),
    lab AS (
      SELECT c_nationkey,
             CASE WHEN c_acctbal > md THEN 1 ELSE 0 END AS tr, x
      FROM spend CROSS JOIN med
    ),
    prop AS (
      SELECT c_nationkey,
             CAST(SUM(tr) AS DOUBLE) / COUNT(*) AS p
      FROM lab GROUP BY 1
      HAVING SUM(tr) > 0 AND SUM(tr) < COUNT(*)
    ),
    w AS (
      SELECT tr, x, p FROM lab JOIN prop USING (c_nationkey)
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(tr) AS BIGINT) AS nt,
             CAST(SUM(CAST(CASE WHEN tr = 1 THEN x ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxt,
             CAST(SUM(CAST(CASE WHEN tr = 0 THEN x ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxc,
             CAST(SUM(CAST(CASE WHEN tr = 1 THEN x / p ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS swt,
             CAST(SUM(CAST(CASE WHEN tr = 0 THEN x / (1 - p) ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS swc
      FROM w
    )
    SELECT n, nt AS n_treated,
           {sql_dratio_round(
               'CAST(sxt*100 AS HUGEINT)*(n - nt)'
               ' - CAST(sxc*100 AS HUGEINT)*nt',
               'nt * (n - nt) * 100')} AS naive_diff,
           ROUND(swt / n - swc / n, 4) AS ipw_ate
    FROM s ORDER BY n
    """,
    doc="Inverse-propensity-weighted treatment effect: 'treated' = "
    "above-median account balance, outcome = customer total spend, "
    "confounder = nation (balance mix differs by nation) — "
    "propensity is the within-nation treated share and the "
    "Horvitz-Thompson estimator reweights each observation by "
    "1/p or 1/(1-p), closing the causal trio: randomized "
    "(q242/q355), parallel-trends (q364 DiD), and "
    "selection-on-observables (this).  Nations with no overlap "
    "(all or none treated) are excluded by the positivity HAVING "
    "guard identically in both engines — the textbook overlap "
    "requirement, not a hack.  Scale shape: one custkey fold, "
    "exact median on the customer-cardinality frame (documented "
    "approx swap), a 25-row broadcast propensity join, one "
    "DECIMAL moment fold.",
)
def q366(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # The custkey spend fold feeds the median fence, the propensity
    # fold and the weighted moment pass — 4 orders + 4 customer scans
    # in one plan without materialization (scan-dup probe).
    spend = _managed_persist(
        "q366_spend",
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_custkey", "c_nationkey", "c_acctbal")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("x")
        ),
    )
    med = spend.agg(F.median("c_acctbal").alias("md"))
    lab = spend.crossJoin(F.broadcast(med)).select(
        "c_nationkey",
        F.when(F.col("c_acctbal") > F.col("md"), 1).otherwise(0).alias("tr"),
        "x",
    )
    prop = (
        lab.groupBy("c_nationkey")
        .agg(
            F.sum("tr").alias("st"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where((F.col("st") > 0) & (F.col("st") < F.col("cnt")))
        .select(
            "c_nationkey",
            (F.col("st").cast("double") / F.col("cnt")).alias("p"),
        )
    )
    w = lab.join(F.broadcast(prop), "c_nationkey").select("tr", "x", "p")
    s = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("tr").cast("bigint").alias("nt"),
        F.sum(F.when(F.col("tr") == 1, F.col("x")).otherwise(0.0).cast(DEC))
        .cast("double")
        .alias("sxt"),
        F.sum(F.when(F.col("tr") == 0, F.col("x")).otherwise(0.0).cast(DEC))
        .cast("double")
        .alias("sxc"),
        F.sum(
            F.when(F.col("tr") == 1, F.col("x") / F.col("p"))
            .otherwise(0.0)
            .cast(DEC)
        )
        .cast("double")
        .alias("swt"),
        F.sum(
            F.when(F.col("tr") == 0, F.col("x") / (1 - F.col("p")))
            .otherwise(0.0)
            .cast(DEC)
        )
        .cast("double")
        .alias("swc"),
    )
    return s.select(
        "n",
        F.col("nt").alias("n_treated"),
        dratio_round(
            (
                (F.col("sxt") * 100).cast(DECZ)
                * (F.col("n") - F.col("nt")).cast(DECZ)
                - (F.col("sxc") * 100).cast(DECZ) * F.col("nt").cast(DECZ)
            ).cast(DECZ),
            (F.col("nt") * (F.col("n") - F.col("nt")) * 100).cast(DECZ),
        ).alias("naive_diff"),
        F.round(F.col("swt") / F.col("n") - F.col("swc") / F.col("n"), 4).alias(
            "ipw_ate"
        ),
    ).orderBy("n")


@register(
    "q368",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    base AS (SELECT DISTINCT user_id FROM e),
    s1 AS (
      SELECT user_id, MIN(ts_s) AS t1 FROM e
      WHERE event_type = 'signup' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(ts_s) AS t2
      FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE event_type = 'view'
        AND ts_s >= t1 AND ts_s <= t1 + 604800
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(ts_s) AS t3
      FROM e JOIN s2 ON e.user_id = s2.user_id
      JOIN s1 ON e.user_id = s1.user_id
      WHERE event_type = 'click'
        AND ts_s >= t2 AND ts_s <= t1 + 604800
      GROUP BY 1
    ),
    s4 AS (
      SELECT e.user_id, MIN(ts_s) AS t4
      FROM e JOIN s3 ON e.user_id = s3.user_id
      JOIN s1 ON e.user_id = s1.user_id
      WHERE event_type = 'purchase'
        AND ts_s >= t3 AND ts_s <= t1 + 604800
      GROUP BY 1
    ),
    lv AS (
      SELECT base.user_id,
             CASE WHEN s4.user_id IS NOT NULL THEN 4
                  WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS level
      FROM base
      LEFT JOIN s1 ON base.user_id = s1.user_id
      LEFT JOIN s2 ON base.user_id = s2.user_id
      LEFT JOIN s3 ON base.user_id = s3.user_id
      LEFT JOIN s4 ON base.user_id = s4.user_id
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lv GROUP BY level ORDER BY level
    """,
    doc="Windowed funnel with timeout (ClickHouse windowFunnel "
    "semantics): signup -> view -> click -> purchase where each "
    "next stage's EARLIEST qualifying event must follow the "
    "previous stage's chosen event AND land within 7 days of the "
    "funnel's first event — the deadline-bounded variant of "
    "q129's strict-order funnel and q180's single-edge window "
    "(a user who converts in month two no longer counts).  "
    "Greedy earliest-event semantics make the level "
    "deterministic.  Scale shape: each stage is one type-filtered "
    "pass over the SAME user_id-partitioned events frame "
    "(persisted once) joined to the previous stage's per-user "
    "1-row frame — four co-partitioned joins, no windows, no "
    "per-user arrays; the level histogram is a 5-row fold.",
)
def q368(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = _managed_persist(
        "q368_events",
        load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_type",
            F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
        ),
    )
    base = ev.select("user_id").distinct()
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where((F.col("ts_s") >= F.col("t1")) & (F.col("ts_s") <= F.col("t1") + 604800))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "click")
        .join(s2, "user_id")
        .join(s1, "user_id")
        .where((F.col("ts_s") >= F.col("t2")) & (F.col("ts_s") <= F.col("t1") + 604800))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t3"))
    )
    s4 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s3, "user_id")
        .join(s1, "user_id")
        .where((F.col("ts_s") >= F.col("t3")) & (F.col("ts_s") <= F.col("t1") + 604800))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t4"))
    )
    lv = (
        base.join(s1.select("user_id", F.lit(1).alias("l1")), "user_id", "left")
        .join(s2.select("user_id", F.lit(1).alias("l2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("l3")), "user_id", "left")
        .join(s4.select("user_id", F.lit(1).alias("l4")), "user_id", "left")
        .select(
            F.when(F.col("l4").isNotNull(), 4)
            .when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("level")
        )
    )
    return (
        lv.groupBy("level")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("level")
    )


@register(
    "q369",
    oracle=f"""
    WITH ut AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    vf AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM ut GROUP BY 1),
    pre AS (
      SELECT a.v,
             CAST(COALESCE(SUM(b.cnt), 0) AS BIGINT) AS cless,
             ANY_VALUE(a.cnt) AS cnt
      FROM vf a LEFT JOIN vf b ON b.v < a.v
      GROUP BY a.v
    ),
    rnk AS (
      SELECT v, cless + (CAST(cnt AS DOUBLE) + 1) / 2 AS r, cnt
      FROM pre
    ),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vf),
    grp AS (
      SELECT ut.event_type,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(rnk.r AS DECIMAL(30,10))) AS DOUBLE) AS rs
      FROM ut JOIN rnk ON ut.v = rnk.v
      GROUP BY 1
    ),
    h AS (
      SELECT CAST(SUM(CAST(rs * rs / ng AS DECIMAL(30,10))) AS DOUBLE)
               AS srr
      FROM grp
    ),
    tie AS (
      SELECT CAST(SUM(CAST(CAST(cnt AS DOUBLE) * cnt * cnt - cnt
                           AS DECIMAL(30,10))) AS DOUBLE) AS st
      FROM vf
    )
    SELECT event_type, ng AS n_obs,
           {sql_dratio_round('CAST(rs * 2 AS HUGEINT)', 'ng * 2')} AS mean_rank,
           ROUND(12.0 / (n.n * (CAST(n.n AS DOUBLE) + 1)) * h.srr
                 - 3 * (CAST(n.n AS DOUBLE) + 1), 4) AS h_stat,
           ROUND((12.0 / (n.n * (CAST(n.n AS DOUBLE) + 1)) * h.srr
                  - 3 * (CAST(n.n AS DOUBLE) + 1))
                 / (1 - tie.st / (CAST(n.n AS DOUBLE) * n.n * n.n - n.n)),
                 4) AS h_corrected
    FROM grp CROSS JOIN n CROSS JOIN h CROSS JOIN tie
    ORDER BY event_type
    """,
    doc="Kruskal-Wallis H test — do per-user activity counts differ "
    "in DISTRIBUTION across event types?  The k-group rank test "
    "completing the nonparametric battery (q306 Mann-Whitney is "
    "its 2-group case, q310 ANOVA its parametric twin): H = "
    "12/(N(N+1)) * sum R_s^2/n_s - 3(N+1) with the exact "
    "tie-correction 1 - sum(t^3-t)/(N^3-N), which heavy integer "
    "ties make mandatory here.  Average ranks come from the "
    "CLOSED FORM over the value-frequency table (rank(v) = "
    "#less + (t_v+1)/2) — no global sort, no row-level rank "
    "window, the q255 discipline taken further: the ranking frame "
    "is value-cardinality (a few hundred distinct counts), "
    "prefix-summed by triangular broadcast join.  N^3 runs in "
    "IEEE double (exact to 2^53; BIGINT would overflow first at "
    "100 TB row counts).  Scale shape: one (user, type) fold, one "
    "value-frequency fold, tiny joins, 5-row output.",
)
@plan_cache
def q369(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    ut = _managed_persist(
        "q369_ut",
        ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("v")
        ),
    )
    vf = _managed_persist(
        "q369_vf",
        ut.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")),
    )
    b = vf.select(F.col("v").alias("bv"), F.col("cnt").alias("bcnt"))
    pre = (
        vf.join(F.broadcast(b), F.col("bv") < F.col("v"), "left")
        .groupBy("v")
        .agg(
            F.coalesce(F.sum("bcnt"), F.lit(0)).cast("bigint").alias("cless"),
            F.any_value("cnt").alias("cnt"),
        )
    )
    rnk = pre.select(
        "v",
        (F.col("cless") + (F.col("cnt").cast("double") + 1) / 2).alias("r"),
        "cnt",
    )
    n = vf.agg(F.sum("cnt").cast("bigint").alias("n"))
    grp = (
        ut.join(F.broadcast(rnk.select("v", "r")), "v")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.sum(F.col("r").cast(DEC)).cast("double").alias("rs"),
        )
    )
    h = grp.agg(
        F.sum((F.col("rs") * F.col("rs") / F.col("ng")).cast(DEC))
        .cast("double")
        .alias("srr")
    )
    tie = vf.agg(
        F.sum(
            (
                F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
                - F.col("cnt")
            ).cast(DEC)
        )
        .cast("double")
        .alias("st")
    )
    nd = F.col("n").cast("double")
    hstat = 12.0 / (F.col("n") * (nd + 1)) * F.col("srr") - 3 * (nd + 1)
    return (
        grp.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(h))
        .crossJoin(F.broadcast(tie))
        .select(
            "event_type",
            F.col("ng").alias("n_obs"),
            dratio_round(
                (F.col("rs") * 2).cast(DECZ),
                (F.col("ng") * 2).cast(DECZ),
            ).alias("mean_rank"),
            F.round(hstat, 4).alias("h_stat"),
            F.round(
                hstat / (1 - F.col("st") / (nd * F.col("n") * F.col("n") - F.col("n"))),
                4,
            ).alias("h_corrected"),
        )
        .orderBy("event_type")
    )


@register(
    "q370",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS y
      FROM orders GROUP BY 1
    ),
    bm AS (
      SELECT CAST(strftime(day, '%Y-%m') AS VARCHAR) AS mo,
             MAX(y) AS mx
      FROM daily GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(mx AS DECIMAL(30,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(mx * mx AS DECIMAL(30,10))) AS DOUBLE) AS ss
      FROM bm
    ),
    fit AS (
      SELECT n,
             CASE WHEN n > 1
                  THEN SQRT((ss - s * s / n) / (n - 1))
                       * 0.7796968012336093
                  ELSE NULL END AS beta,
             CASE WHEN n > 1
                  THEN s / n - SQRT((ss - s * s / n) / (n - 1))
                       * 0.7796968012336093 * 0.5772156649015329
                  ELSE NULL END AS mu
      FROM m
    )
    SELECT n AS n_months, ROUND(mu, 4) AS mu, ROUND(beta, 4) AS beta,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 12)), 4)
             AS return_level_12mo,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 60)), 4)
             AS return_level_60mo
    FROM fit ORDER BY n_months
    """,
    doc="Extreme-value analysis of daily revenue: monthly block "
    "maxima fitted to a Gumbel distribution by method of moments "
    "(beta = sd*sqrt(6)/pi, mu = mean - gamma*beta, with sqrt(6)/pi "
    "and Euler-Mascheroni spelled as identical double literals), "
    "then the 12- and 60-month return levels mu - beta*ln(-ln(1-1/T)) "
    "— 'the largest daily revenue we should expect once per year / "
    "per five years', the capacity-planning tail number that "
    "q279's within-sample VaR cannot extrapolate.  Scale shape: "
    "calendar fold, |months|-row block-maxima fold, 1-row moment "
    "closed form — the entire EVT fit costs two tiny aggs over "
    "one fact scan.",
)
@plan_cache
def q370(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Scale-4 money accumulators (q414 fence rationale, r12): keeps the
    # daily/block sums conversion-exact in both engines up to ~9e11.
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
        .cast("double")
        .alias("y")
    )
    bm = daily.groupBy(
        F.date_format("day", "yyyy-MM").alias("mo")
    ).agg(F.max("y").alias("mx"))
    m = bm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("mx").cast("decimal(30,4)"))
        .cast("double")
        .alias("s"),
        F.sum((F.col("mx") * F.col("mx")).cast(DEC))
        .cast("double")
        .alias("ss"),
    )
    # Single-month guard (q330/q372 class, extended r12): n==1 zeroes
    # the n-1 divisor — Spark ANSI raises where DuckDB yields NaN.
    sd = F.when(
        F.col("n") > 1,
        F.sqrt(
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        ),
    )
    beta = sd * 0.7796968012336093
    mu = F.col("s") / F.col("n") - sd * 0.7796968012336093 * 0.5772156649015329
    # ln(-ln(1-1/T)) is spelled as F.log over literals (not a Python
    # math.log constant) so BOTH engines compute the same expression.
    # Display rounding via duckdb_round_double (q160 recipe, extended
    # r12): the unrounded doubles are engine-identical (decimal-exact
    # sums, same IEEE tree), but on a rational series (two-point fence)
    # they can land EXACTLY on .5e-4 — Spark F.round (shortest-repr
    # half-up) then disagrees with DuckDB ROUND (half-away on the IEEE
    # product); this Spark mirror of DuckDB's model closes the class.
    return m.select(
        F.col("n").alias("n_months"),
        duckdb_round_double(mu, 4).alias("mu"),
        duckdb_round_double(beta, 4).alias("beta"),
        duckdb_round_double(
            mu - beta * F.log(-F.log(F.lit(1) - F.lit(1.0) / 12)), 4
        ).alias("return_level_12mo"),
        duckdb_round_double(
            mu - beta * F.log(-F.log(F.lit(1) - F.lit(1.0) / 60)), 4
        ).alias("return_level_60mo"),
    ).orderBy("n_months")


@register(
    "q371",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                   AS DOUBLE), 4) AS rev
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT d.day, MAX(d.rev) AS rev,
             CAST(COUNT(*) AS BIGINT) AS band_n,
             ROUND(CAST(SUM(CAST(d2.rev AS DECIMAL(30,10))) / 15
                   AS DOUBLE), 4) AS trend
      FROM daily d JOIN daily d2
        ON d2.day BETWEEN d.day - 7 AND d.day + 7
      GROUP BY d.day
    ),
    det AS (
      SELECT day, rev, trend, ROUND(rev - trend, 4) AS detr,
             CAST(date_diff('day', DATE '1992-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM tr WHERE band_n = 15
    ),
    seas AS (
      SELECT dow,
             ROUND(CAST(SUM(CAST(detr AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 4) AS seasonal
      FROM det GROUP BY 1
    ),
    js AS (
      SELECT CAST(ROUND((d.detr - s.seasonal) * 10000) AS HUGEINT) AS ru,
             CAST(ROUND((d.rev - s.seasonal) * 10000) AS HUGEINT) AS uu,
             CAST(ROUND(d.detr * 10000) AS HUGEINT) AS vu
      FROM det d JOIN seas s ON d.dow = s.dow
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(ru) AS sr, SUM(ru * ru) AS srr,
             SUM(uu) AS su, SUM(uu * uu) AS suu,
             SUM(vu) AS sv, SUM(vu * vu) AS svv
      FROM js
    ),
    nums AS (
      SELECT n,
             n * srr - sr * sr AS nr,
             n * suu - su * su AS nu,
             n * svv - sv * sv AS nv
      FROM m
    )
    SELECT n AS n_days,
           {SQL_VAR_RESID} AS var_resid,
           CASE WHEN nu > nr THEN {SQL_F_TREND} ELSE 0.0 END AS f_trend,
           CASE WHEN nv > nr THEN {SQL_F_SEAS} ELSE 0.0 END AS f_seasonal
    FROM nums ORDER BY n_days
    """.replace(
        "{SQL_VAR_RESID}",
        sql_dratio_round_wide("nr", "n * (n - 1) * 100000000"),
    ).replace(
        "{SQL_F_TREND}", sql_dratio_round("nu - nr", "nu")
    ).replace(
        "{SQL_F_SEAS}", sql_dratio_round("nv - nr", "nv")
    ),
    doc="Seasonal- and trend-strength indices (Hyndman's F_T/F_S from "
    "'STL-based features'): over q278's additive decomposition, "
    "F_trend = max(0, 1 - Var(R)/Var(deseasonalized)) and "
    "F_seasonal = max(0, 1 - Var(R)/Var(detrended)) — one number "
    "each in [0,1] saying HOW trended / HOW seasonal the series is, "
    "the triage that decides whether q299's trend model or q245's "
    "DOW index is even worth fitting.  Intermediate rounding "
    "replicates q278 exactly so the decomposition is the SAME one.  "
    "Determinism (r11): r/u/v are differences of round(4) values - "
    "exact multiples of 1e-4 - so the moment fold runs in integer "
    "1e-4 units (products exact in DECIMAL(38,0)); the variance and "
    "both strength indices are exact integer ratios via dratio_round "
    "(vr/vu shares a common denominator, so 1 - vr/vu reduces to "
    "(nu-nr)/nu) - bit-identical across engines, no double->decimal "
    "cast bounce. Headroom: daily |u| <= ~1e7 keeps n*suu ~6e28, "
    "x2e4 well inside DECIMAL(38,0). "
    "Scale shape: q278's calendar-frame band join, then ONE 7-moment "
    "integer fold over the joined frame, closed forms on one row.",
)
@plan_cache
def q371(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # q286's discipline (4 orders scans in the plan probe): materialize
    # the daily fold and the post-band det frame once each.
    daily = _managed_persist(
        "q371_daily",
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
            ).alias("rev")
        ),
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    tr = (
        daily.join(
            F.broadcast(d2),
            (F.col("day2") >= F.date_sub(F.col("day"), 7))
            & (F.col("day2") <= F.date_add(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(
            F.max("rev").alias("rev"),
            F.count(F.lit(1)).alias("band_n"),
            F.round(
                (F.sum(F.col("rev2").cast(DEC)) / 15).cast("double"), 4
            ).alias("trend"),
        )
    )
    det = _managed_persist(
        "q371_det",
        tr.where(F.col("band_n") == 15).select(
            "rev",
            "trend",
            F.round(F.col("rev") - F.col("trend"), 4).alias("detr"),
            F.pmod(
                F.datediff("day", F.lit("1992-01-01").cast("date")), F.lit(7)
            )
            .cast("bigint")
            .alias("dow"),
        ),
    )
    seas = det.groupBy("dow").agg(
        F.round(
            (F.sum(F.col("detr").cast(DEC)) / F.count(F.lit(1))).cast(
                "double"
            ),
            4,
        ).alias("seasonal")
    )
    js = det.join(F.broadcast(seas), "dow").select(
        F.round((F.col("detr") - F.col("seasonal")) * 10000, 0)
        .cast("decimal(19,0)")
        .alias("ru"),
        F.round((F.col("rev") - F.col("seasonal")) * 10000, 0)
        .cast("decimal(19,0)")
        .alias("uu"),
        F.round(F.col("detr") * 10000, 0).cast("decimal(19,0)").alias("vu"),
    )
    m = js.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("ru").cast(DECZ)).alias("sr"),
        F.sum((F.col("ru") * F.col("ru")).cast(DECZ)).alias("srr"),
        F.sum(F.col("uu").cast(DECZ)).alias("su"),
        F.sum((F.col("uu") * F.col("uu")).cast(DECZ)).alias("suu"),
        F.sum(F.col("vu").cast(DECZ)).alias("sv"),
        F.sum((F.col("vu") * F.col("vu")).cast(DECZ)).alias("svv"),
    )
    n = F.col("n")
    nd = n.cast("decimal(20,0)")
    nr = (F.col("srr") * nd - F.col("sr") * F.col("sr")).cast(DECZ)
    nu = (F.col("suu") * nd - F.col("su") * F.col("su")).cast(DECZ)
    nv = (F.col("svv") * nd - F.col("sv") * F.col("sv")).cast(DECZ)
    dv = (nd * (n - 1).cast("decimal(20,0)")).cast(DECZ) * F.lit(
        10**8
    ).cast("decimal(9,0)")
    return (
        m.select(n.alias("n"), nr.alias("nr"), nu.alias("nu"), nv.alias("nv"), dv.cast(DECZ).alias("dv"))
        .select(
            F.col("n").alias("n_days"),
            dratio_round_wide(F.col("nr"), F.col("dv")).alias("var_resid"),
            F.when(
                F.col("nu") > F.col("nr"),
                dratio_round(
                    (F.col("nu") - F.col("nr")).cast(DECZ), F.col("nu")
                ),
            )
            .otherwise(0.0)
            .alias("f_trend"),
            F.when(
                F.col("nv") > F.col("nr"),
                dratio_round(
                    (F.col("nv") - F.col("nr")).cast(DECZ), F.col("nv")
                ),
            )
            .otherwise(0.0)
            .alias("f_seasonal"),
        )
        .orderBy("n_days")
    )


@register(
    "q372",
    oracle="""
    WITH c AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY 1
    ),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      FROM events
    ),
    mx AS (SELECT MAX(wk) AS mw FROM a),
    ages AS (
      SELECT a.user_id,
             CAST(date_diff('day', c.cohort, a.wk) // 7 AS BIGINT) AS k
      FROM a JOIN c ON a.user_id = c.user_id
    ),
    poss AS (
      SELECT k.k,
             CAST(COUNT(*) AS BIGINT) AS n_possible
      FROM c CROSS JOIN mx
      CROSS JOIN (SELECT range AS k FROM range(1, 9)) k
      WHERE date_diff('day', c.cohort, mw) // 7 >= k.k
      GROUP BY k.k
    ),
    act AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM ages WHERE k BETWEEN 1 AND 8 GROUP BY k
    ),
    r AS (
      SELECT poss.k, n_possible, COALESCE(n_active, 0) AS n_active,
             CAST(COALESCE(n_active, 0) AS DOUBLE) / n_possible AS rk
      FROM poss LEFT JOIN act ON poss.k = act.k
      WHERE n_possible > 0
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(k AS DOUBLE) AS DECIMAL(30,10)))
                  AS DOUBLE) AS sx,
             CAST(SUM(CAST(LN(rk) AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(k AS DOUBLE) * k AS DECIMAL(30,10)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(k * LN(rk) AS DECIMAL(30,10))) AS DOUBLE)
               AS sxy
      FROM r WHERE rk > 0
    )
    SELECT r.k AS age_weeks, n_possible, n_active,
           ROUND(rk, 4) AS retention,
           CASE WHEN (fit.n * sxx - sx * sx) <> 0
                 AND (fit.n * sxy - sx * sy) <> 0
                THEN ROUND(-0.6931471805599453
                      / ((fit.n * sxy - sx * sy) / (fit.n * sxx - sx * sx)),
                      4)
                ELSE NULL END AS half_life_weeks
    FROM r CROSS JOIN fit ORDER BY age_weeks
    """,
    doc="Retention half-life: pooled weekly retention r_k (active "
    "users at cohort age k over users whose cohort is old enough "
    "to be observed at age k — the right-censoring denominator "
    "q130's per-cohort matrix makes you eyeball) for k = 1..8, "
    "exponential-decay fit ln r_k ~ a + b*k, half-life = -ln2/b — "
    "the single number behind 'our users decay with a 5-week "
    "half-life'.  Scale shape: two user-keyed folds (cohort, "
    "distinct active weeks), one age fold to <=8 rows, the "
    "possible-denominator from a cohort-frame scan against the "
    "8-value age spine, 8-point closed-form fit.",
)
def q372(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    c = _managed_persist(
        "q372_cohort",
        ev.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).alias("cohort")
        ),
    )
    # a feeds the max-week fence AND the age join — the user-week
    # distinct re-ran for each (3 events scans in the plan probe).
    a = _managed_persist(
        "q372_a",
        ev.select(
            "user_id", F.date_trunc("week", "ts").alias("wk")
        ).distinct(),
    )
    mx = a.agg(F.max("wk").alias("mw"))
    ages = a.join(c, "user_id").select(
        F.expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").alias("k")
    )
    spine = ev.sparkSession.range(1, 9).select(F.col("id").alias("k"))
    poss = (
        c.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(spine))
        .where(F.expr("CAST(datediff(mw, cohort) DIV 7 AS BIGINT)") >= F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_possible"))
    )
    act = (
        ages.where((F.col("k") >= 1) & (F.col("k") <= 8))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    r = _managed_persist(
        "q372_r",
        poss.join(act, "k", "left")
        .where(F.col("n_possible") > 0)
        .select(
            "k",
            "n_possible",
            F.coalesce("n_active", F.lit(0)).cast("bigint").alias("n_active"),
            (
                F.coalesce("n_active", F.lit(0)).cast("double")
                / F.col("n_possible")
            ).alias("rk"),
        ),
    )
    kd = F.col("k").cast("double")
    fit = r.where(F.col("rk") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(kd.cast(DEC)).cast("double").alias("sx"),
        F.sum(F.log("rk").cast(DEC)).cast("double").alias("sy"),
        F.sum((kd * F.col("k")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("k") * F.log("rk")).cast(DEC)).cast("double").alias("sxy"),
    )
    # Degenerate-fit guard (regen-fuzz finding, r11): a single usable
    # age point zeroes the slope DENOMINATOR, and perfectly flat
    # retention zeroes the slope itself — Spark-4 ANSI raises
    # DIVIDE_BY_ZERO even for doubles where DuckDB yields inf, so both
    # engines must agree on NULL before any division happens.
    s_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    s_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    half_life = F.when(
        (s_den != 0) & (s_num != 0),
        F.round(-0.6931471805599453 / (s_num / s_den), 4),
    )
    return (
        r.crossJoin(F.broadcast(fit))
        .select(
            F.col("k").alias("age_weeks"),
            "n_possible",
            "n_active",
            F.round("rk", 4).alias("retention"),
            half_life.alias("half_life_weeks"),
        )
        .orderBy("age_weeks")
    )


@register(
    "q374",
    oracle="""
    WITH top AS (
      SELECT o_totalprice AS x FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 501
    ),
    ref AS (SELECT MIN(x) AS xr FROM top),
    h AS (
      SELECT CAST(SUM(CAST(LN(x / xr) AS DECIMAL(30,10))) AS DOUBLE)
               / 500 AS hill
      FROM top CROSS JOIN ref
    )
    SELECT CAST(500 AS BIGINT) AS k, ROUND(ref.xr, 4) AS threshold,
           ROUND(h.hill, 4) AS hill_mean,
           ROUND(1.0 / h.hill, 4) AS tail_index
    FROM ref CROSS JOIN h ORDER BY k
    """,
    doc="Hill estimator of the order-value Pareto tail index over the "
    "top-500 order values (threshold = the 501st): alpha = "
    "1/mean(ln(x_i/x_ref)) — the EVT peaks-over-threshold sibling "
    "of q370's block-maxima Gumbel, and the number that says "
    "whether revenue concentration has finite variance (alpha > 2) "
    "or whale orders dominate (alpha < 2).  The 501st element "
    "itself contributes ln(1) = 0, so the sum runs over the whole "
    "top frame and divides by 500 — no rank window needed.  "
    "Deterministic membership via the (value desc, key) tie-break.  "
    "Scale shape: TakeOrdered(501) — per-partition top-k then one "
    "driver-side merge of 501-row partials, never a global sort — "
    "then a 1-row closed form.",
)
@plan_cache
def q374(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # top feeds the threshold fence AND the Hill fold — the global
    # top-k sort re-ran for each (3 orders scans in the plan probe).
    top = _managed_persist(
        "q374_top",
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), "o_orderkey")
        .limit(501)
        .select("x"),
    )
    ref = top.agg(F.min("x").alias("xr"))
    h = top.crossJoin(F.broadcast(ref)).agg(
        (
            F.sum(F.log(F.col("x") / F.col("xr")).cast(DEC)).cast("double")
            / 500
        ).alias("hill")
    )
    return (
        ref.crossJoin(F.broadcast(h))
        .select(
            F.lit(500).cast("bigint").alias("k"),
            F.round("xr", 4).alias("threshold"),
            F.round("hill", 4).alias("hill_mean"),
            F.round(F.lit(1.0) / F.col("hill"), 4).alias("tail_index"),
        )
        .orderBy("k")
    )


@register(
    "q375",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mu AS (
      SELECT i,
             CAST(SUM(CAST(v AS DECIMAL(30,10))) AS DOUBLE)
               / (SELECT n FROM nv) AS m
      FROM x GROUP BY i
    ),
    c AS (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(ROUND(a.v * b.v * 1e9) AS BIGINT))
                  AS DOUBLE) / 1e9 / (SELECT n FROM nv)
             - ma.m * mb.m AS cij
      FROM x a JOIN x b ON a.vec_id = b.vec_id
      JOIN mu ma ON ma.i = a.i JOIN mu mb ON mb.i = b.i
      GROUP BY a.i, b.i, ma.m, mb.m
    ),
    v0 AS (SELECT i, 0.125 AS w FROM mu),
    r1 AS (
      SELECT c.i,
             CAST(SUM(CAST(cij * v0.w AS DECIMAL(30,15))) AS DOUBLE)
               AS w
      FROM c JOIN v0 ON c.j = v0.i GROUP BY c.i
    ),
    n1 AS (
      SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(30,15))) AS DOUBLE))
               AS nm
      FROM r1
    ),
    v1 AS (SELECT i, w / (SELECT nm FROM n1) AS w FROM r1),
    r2 AS (
      SELECT c.i,
             CAST(SUM(CAST(cij * v1.w AS DECIMAL(30,15))) AS DOUBLE)
               AS w
      FROM c JOIN v1 ON c.j = v1.i GROUP BY c.i
    ),
    n2 AS (
      SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(30,15))) AS DOUBLE))
               AS nm
      FROM r2
    ),
    v2 AS (SELECT i, w / (SELECT nm FROM n2) AS w FROM r2),
    r3 AS (
      SELECT c.i,
             CAST(SUM(CAST(cij * v2.w AS DECIMAL(30,15))) AS DOUBLE)
               AS w
      FROM c JOIN v2 ON c.j = v2.i GROUP BY c.i
    ),
    n3 AS (
      SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(30,15))) AS DOUBLE))
               AS nm
      FROM r3
    ),
    v3 AS (SELECT i, w / (SELECT nm FROM n3) AS w FROM r3),
    lam AS (SELECT nm AS l FROM n3),
    tr AS (
      SELECT CAST(SUM(CAST(cij AS DECIMAL(30,15))) AS DOUBLE) AS t
      FROM c WHERE i = j
    )
    SELECT v3.i AS dim, ROUND(v3.w, 4) AS loading,
           ROUND(lam.l, 6) AS eigenvalue,
           ROUND(lam.l / tr.t, 4) AS explained_share
    FROM v3 CROSS JOIN lam CROSS JOIN tr
    ORDER BY dim
    """,
    doc="Leading principal component of the embedding corpus by power "
    "iteration: the 64x64 covariance matrix from ONE vec-keyed "
    "self-join fold (E[x_i x_j] - mu_i mu_j), then three "
    "normalize-and-multiply steps from a uniform start — loadings, "
    "leading eigenvalue (the final pre-normalization norm, since "
    "||Cv|| -> lambda for a unit v), and explained-variance share "
    "vs the trace.  The anisotropy audit for embedding quality "
    "(one dominant direction = rogue feature or un-centered "
    "model; Mu & Viswanath's 'all-but-the-top' diagnostic), and "
    "the q349/q156 iterative-dataflow discipline applied to "
    "linear algebra.  Scale shape: the covariance fold is "
    "dim^2-bounded shuffle (map-side combinable products), the "
    "matrix is a 4096-row broadcast, each iteration two tiny "
    "aggs.  The product fold quantizes to integer nano-units "
    "(q206's discipline; per-element |p| <= ~0.2 bounds the BIGINT "
    "sum to ~4e10 rows per group, with the DECIMAL accumulator as "
    "the documented swap beyond) — 3x cheaper than a wide-DECIMAL "
    "accumulator; the iteration folds stay DECIMAL(30,15).",
)
@plan_cache
def q375(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "vf")
    ).select("vec_id", "i", F.col("vf").cast("double").alias("v"))
    nv = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # mu is rebuilt inside EVERY broadcast build it reaches: ma, mb, and
    # each power-iteration's v-chain replays it (24 embeddings scans in
    # the plan probe). Materialize the 64-row mean frame once.
    from hive_hw_spark.queries.llm_ops import _managed_persist

    mu = _managed_persist(
        "q375_mu",
        x.groupBy("i")
        .agg(F.sum(F.col("v").cast(DEC)).cast("double").alias("sm"))
        .crossJoin(F.broadcast(nv))
        .select("i", (F.col("sm") / F.col("n")).alias("m")),
    )
    b = x.select(
        F.col("vec_id").alias("vid2"),
        F.col("i").alias("j"),
        F.col("v").alias("v2"),
    )
    ma = mu.select(F.col("i").alias("mi"), F.col("m").alias("mam"))
    mb = mu.select(F.col("i").alias("mj"), F.col("m").alias("mbm"))
    c = (
        x.join(b, F.col("vec_id") == F.col("vid2"))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.round(F.col("v") * F.col("v2") * 1e9, 0).cast("bigint")
            )
            .cast("double")
            .alias("sq")
        )
        .crossJoin(F.broadcast(nv))
        .join(F.broadcast(ma), F.col("mi") == F.col("i"))
        .join(F.broadcast(mb), F.col("mj") == F.col("j"))
        .select(
            "i",
            "j",
            (
                F.col("sq") / 1e9 / F.col("n") - F.col("mam") * F.col("mbm")
            ).alias("cij"),
        )
        .localCheckpoint()
    )
    v = mu.select("i", F.lit(0.125).alias("w"))
    lam = None
    for _ in range(3):
        r = (
            c.join(
                F.broadcast(v.select(F.col("i").alias("j"), "w")), "j"
            )
            .groupBy("i")
            .agg(
                F.sum((F.col("cij") * F.col("w")).cast("decimal(30,15)"))
                .cast("double")
                .alias("w")
            )
        )
        nm = r.agg(
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast("decimal(30,15)")).cast(
                    "double"
                )
            ).alias("nm")
        )
        # q118 rule: checkpoint each round's 64-row vector — without it
        # every broadcast(v) build replays the whole prior-iteration
        # chain (the replay count doubles per iteration).
        v = (
            r.crossJoin(F.broadcast(nm))
            .select("i", (F.col("w") / F.col("nm")).alias("w"))
            .localCheckpoint()
        )
        lam = nm
    tr = c.where(F.col("i") == F.col("j")).agg(
        F.sum(F.col("cij").cast("decimal(30,15)")).cast("double").alias("t")
    )
    return (
        v.crossJoin(F.broadcast(lam.select(F.col("nm").alias("l"))))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("i").alias("dim"),
            F.round("w", 4).alias("loading"),
            F.round("l", 6).alias("eigenvalue"),
            F.round(F.col("l") / F.col("t"), 4).alias("explained_share"),
        )
        .orderBy("dim")
    )


@register(
    "q376",
    oracle="""
    WITH lab AS (
      SELECT o_totalprice AS x,
             CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS grp
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    ),
    qa AS (
      SELECT quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
               AS qs
      FROM lab WHERE grp = 1
    ),
    qb AS (
      SELECT quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
               AS qs
      FROM lab WHERE grp = 0
    ),
    ua AS (
      SELECT generate_subscripts(qs, 1) AS d,
             CAST(unnest(qs) AS DOUBLE) AS va
      FROM qa
    ),
    ub AS (
      SELECT generate_subscripts(qs, 1) AS d,
             CAST(unnest(qs) AS DOUBLE) AS vb
      FROM qb
    )
    SELECT CAST(ua.d AS BIGINT) * 10 AS pct,
           ROUND(va, 4) AS asia, ROUND(vb, 4) AS rest,
           ROUND(va - vb, 4) AS shift,
           ROUND(va / vb, 4) AS ratio
    FROM ua JOIN ub ON ua.d = ub.d
    ORDER BY pct
    """,
    doc="Q-Q decile table: order-value deciles for ASIA-region "
    "customers vs everyone else, with per-decile shift and ratio — "
    "a constant ratio says pure scale difference, a ratio growing "
    "in the tail says the segments differ in SHAPE (which a mean "
    "comparison like q364's DiD cells cannot distinguish).  The "
    "distribution-compare communicator beside q254's KS decision "
    "statistic.  Scale shape: one dim-chain join, two exact "
    "interpolated quantile aggs (q47 family; approx_percentile is "
    "the documented 100 TB swap), 9-row output.",
)
@plan_cache
def q376(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    lab = _managed_persist(
        "q376_lab",
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("o_totalprice").alias("x"),
            F.when(F.col("r_name") == "ASIA", 1).otherwise(0).alias("grp"),
        ),
    )
    pct = "percentile(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
    qa = (
        lab.where("grp = 1")
        .agg(F.expr(pct).alias("qs"))
        .select(F.posexplode("qs").alias("d0", "va"))
        .select((F.col("d0") + 1).alias("d"), "va")
    )
    qb = (
        lab.where("grp = 0")
        .agg(F.expr(pct).alias("qs"))
        .select(F.posexplode("qs").alias("d0", "vb"))
        .select((F.col("d0") + 1).alias("db"), "vb")
    )
    return (
        qa.join(F.broadcast(qb), F.col("db") == F.col("d"))
        .select(
            (F.col("d").cast("bigint") * 10).alias("pct"),
            F.round("va", 4).alias("asia"),
            F.round("vb", 4).alias("rest"),
            F.round(F.col("va") - F.col("vb"), 4).alias("shift"),
            F.round(F.col("va") / F.col("vb"), 4).alias("ratio"),
        )
        .orderBy("pct")
    )


@register(
    "q378",
    oracle="""
    WITH vc AS (
      SELECT value AS v,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c2
      FROM events GROUP BY v
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM vc
    ),
    cum AS (
      SELECT v, c1, c2,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS r1,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS r2
      FROM vc
    ),
    terms AS (
      SELECT CAST(SUM(CAST(
               (c1 + c2)
               * (CAST(r1 * n2 - r2 * n1 AS DOUBLE) / (n1 * n2))
               * (CAST(r1 * n2 - r2 * n1 AS DOUBLE) / (n1 * n2))
               AS DECIMAL(30,10))) AS DOUBLE) AS s
      FROM cum, tot
    )
    SELECT n1, n2,
           ROUND(CAST(n1 AS DOUBLE) * n2
                 / (n1 + n2) / (n1 + n2) * terms.s, 4) AS cvm_stat
    FROM tot CROSS JOIN terms ORDER BY n1
    """,
    doc="Two-sample Cramer-von Mises statistic over the same "
    "error-vs-rest split as q254's KS: T = n1*n2/N^2 * sum over "
    "POOLED observations of (F1 - F2)^2 — integral-type "
    "sensitivity that catches distributed small shifts a single "
    "max-gap (KS) under-weights; run both and disagreement itself "
    "is diagnostic (KS fires = one localized break, CvM fires = "
    "broad drift).  ECDF differences stay in the exact "
    "cross-multiplied integer form r1*n2 - r2*n1, divided ONCE "
    "per distinct value before the per-row double square (dd^2 "
    "would overflow BIGINT — the q298 lesson applied at design "
    "time).  Scale shape: q254's machinery verbatim — per-value "
    "fold, two-phase bucketed cumulative sums (the oracle states "
    "the naive global window), one DECIMAL term fold.",
)
@plan_cache
def q378(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    is1 = F.col("event_type") == "error"
    # q254's discipline (8 events scans in the plan probe): vc feeds
    # the totals, bounds and bucketed branches; bucketed feeds the
    # bucket totals and the term fold.
    vc = _managed_persist(
        "q378_vc",
        ev.groupBy(F.col("value").alias("v")).agg(
            F.sum(F.when(is1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(~is1, 1).otherwise(0)).alias("c2"),
        ),
    )
    tot = vc.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    bounds = vc.agg(
        F.expr(
            "percentile(v, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = _managed_persist(
        "q378_bucketed",
        vc.crossJoin(F.broadcast(bounds)).select(
            "v",
            "c1",
            "c2",
            F.expr("size(filter(bs, b -> b < v))").alias("bk"),
        )
    )
    btot = bucketed.groupBy("bk").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    b2 = btot.select(
        F.col("bk").alias("bk2"),
        F.col("b1").alias("e1"),
        F.col("b2").alias("e2"),
    )
    offsets = (
        btot.join(F.broadcast(b2), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(
            F.coalesce(F.sum("e1"), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("e2"), F.lit(0)).alias("o2"),
        )
    )
    wb = Window.partitionBy("bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    delta = (
        (
            (F.col("o1") + F.col("w1")) * F.col("n2")
            - (F.col("o2") + F.col("w2")) * F.col("n1")
        ).cast("double")
        / (F.col("n1") * F.col("n2"))
    )
    terms = (
        bucketed.withColumn("w1", F.sum("c1").over(wb))
        .withColumn("w2", F.sum("c2").over(wb))
        .join(F.broadcast(offsets), "bk")
        .crossJoin(F.broadcast(tot))
        .select(((F.col("c1") + F.col("c2")) * delta * delta).alias("t"))
        .agg(F.sum(F.col("t").cast(DEC)).cast("double").alias("s"))
    )
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            "n1",
            "n2",
            F.round(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
                / (F.col("n1") + F.col("n2"))
                * F.col("s"),
                4,
            ).alias("cvm_stat"),
        )
        .orderBy("n1")
    )


@register(
    "q379",
    oracle=f"""
    WITH b AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
             MAX(CAST(o_orderdate AS DATE)) AS mx
      FROM orders
    ),
    cutv AS (
      SELECT mn + CAST(date_diff('day', mn, mx) * 4 // 5 AS INTEGER)
               AS c, mx
      FROM b
    ),
    tr AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                            (SELECT c FROM cutv)) AS BIGINT) AS rec
      FROM orders
      WHERE CAST(o_orderdate AS DATE) < (SELECT c FROM cutv)
      GROUP BY 1
    ),
    hold AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE CAST(o_orderdate AS DATE) >= (SELECT c FROM cutv)
    ),
    cells AS (
      SELECT LEAST(CAST(freq AS BIGINT), 5) AS f_cell,
             CASE WHEN rec <= 30 THEN 0 WHEN rec <= 90 THEN 1
                  WHEN rec <= 180 THEN 2 ELSE 3 END AS r_cell,
             CASE WHEN hold.o_custkey IS NOT NULL THEN 1 ELSE 0 END
               AS alive
      FROM tr LEFT JOIN hold ON tr.o_custkey = hold.o_custkey
    )
    SELECT f_cell AS frequency_cell, r_cell AS recency_cell,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(alive) AS BIGINT) AS n_alive,
           {sql_dratio_round('SUM(alive)', 'COUNT(*)')}
             AS p_alive
    FROM cells GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Empirical buy-til-you-die P(alive) grid: customers binned by "
    "train-period frequency (capped at 5+) x recency band at the "
    "80% date cut, each cell's 'alive' probability measured as the "
    "share actually ordering in the holdout — the model-free "
    "empirical version of BG/NBD (Fader et al.), and the "
    "calibration table any parametric churn model (q332's features "
    "feed one) must beat.  The signature BTYD pattern — high "
    "frequency + long recency = most likely dead — is read "
    "directly off the grid.  Scale shape: one custkey fold for "
    "(freq, recency), one distinct fold for holdout membership, a "
    "custkey LEFT join, <=24-cell output.",
)
def q379(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("mn"),
        F.max(F.col("o_orderdate").cast("date")).alias("mx"),
    ).select(
        F.date_add(
            F.col("mn"),
            F.floor(F.datediff("mx", "mn") * 4 / 5).cast("int"),
        ).alias("c")
    )
    # od feeds the train fold AND the holdout distinct — 4 orders
    # scans in one plan without materialization (scan-dup probe).
    od = _managed_persist(
        "q379_od",
        o.select(
            "o_custkey", F.col("o_orderdate").cast("date").alias("day")
        ).crossJoin(F.broadcast(b)),
    )
    tr = (
        od.where(F.col("day") < F.col("c"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.datediff(F.max("c"), F.max("day"))
            .cast("bigint")
            .alias("rec"),
        )
    )
    hold = (
        od.where(F.col("day") >= F.col("c"))
        .select(F.col("o_custkey").alias("hk"))
        .distinct()
    )
    cells = tr.join(hold, F.col("o_custkey") == F.col("hk"), "left").select(
        F.least(F.col("freq"), F.lit(5).cast("bigint")).alias("f_cell"),
        F.when(F.col("rec") <= 30, 0)
        .when(F.col("rec") <= 90, 1)
        .when(F.col("rec") <= 180, 2)
        .otherwise(3)
        .alias("r_cell"),
        F.when(F.col("hk").isNotNull(), 1).otherwise(0).alias("alive"),
    )
    return (
        cells.groupBy(
            F.col("f_cell").alias("frequency_cell"),
            F.col("r_cell").alias("recency_cell"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("alive").cast("bigint").alias("n_alive"),
            dratio_round(
                F.sum("alive").cast(DECZ), F.count(F.lit(1)).cast(DECZ)
            ).alias("p_alive"),
        )
        .orderBy("frequency_cell", "recency_cell")
    )


@register(
    "q381",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
               AS q
      FROM lineitem GROUP BY 1, 2
    ),
    agg AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(CAST(q AS DECIMAL(30,10))) AS DOUBLE) AS tot,
             MAX(q) AS mx
      FROM ps GROUP BY 1
    ),
    risk AS (
      SELECT l_partkey, n_suppliers, mx / tot AS top_share
      FROM agg
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(CASE WHEN n_suppliers = 1 THEN 1 END) AS BIGINT)
             AS single_sourced,
           CAST(COUNT(CASE WHEN top_share > 0.5 THEN 1 END) AS BIGINT)
             AS concentrated,
           ROUND(CAST(SUM(CAST(top_share AS DECIMAL(30,10)))
                      AS DOUBLE) / COUNT(*), 4) AS avg_top_share
    FROM risk ORDER BY n_parts
    """,
    doc="Supply-concentration risk audit: per part, the top supplier's "
    "share of shipped quantity — single-sourced parts and parts "
    "with a >50% dominant supplier are the procurement "
    "vulnerabilities (the supplier-side mirror of q261's "
    "customer-side HHI).  Scale shape: one (part, supplier) fold "
    "with map-side combine, one part fold, a 1-row summary — two "
    "hash aggs over one fact scan, no joins at all.",
)
@plan_cache
def q381(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("q")
    )
    agg = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.col("q").cast(DEC)).cast("double").alias("tot"),
        F.max("q").alias("mx"),
    )
    risk = agg.select(
        "n_suppliers", (F.col("mx") / F.col("tot")).alias("top_share")
    )
    return risk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.count(F.when(F.col("n_suppliers") == 1, 1))
        .cast("bigint")
        .alias("single_sourced"),
        F.count(F.when(F.col("top_share") > 0.5, 1))
        .cast("bigint")
        .alias("concentrated"),
        F.round(
            F.sum(F.col("top_share").cast(DEC)).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_top_share"),
    ).orderBy("n_parts")


@register(
    "q383",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS DOUBLE) AS vx,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS DOUBLE) AS py
      FROM events GROUP BY 1
    ),
    lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-7, 8)),
    pairs AS (
      SELECT l.lag, d1.vx AS x, d2.py AS y
      FROM lags l
      JOIN daily d1 ON TRUE
      JOIN daily d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
    ),
    s AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM pairs GROUP BY lag
    ),
    r AS (
      SELECT lag, n_pairs,
             CASE WHEN (n_pairs * sxx - sx * sx)
                       * (n_pairs * syy - sy * sy) <> 0
                  THEN ROUND((n_pairs * sxy - sx * sy)
                        / sqrt((n_pairs * sxx - sx * sx)
                               * (n_pairs * syy - sy * sy)), 4)
                  ELSE NULL END AS xcorr
      FROM s
    )
    SELECT lag, n_pairs, xcorr,
           CAST(CASE WHEN xcorr = (SELECT MAX(xcorr) FROM r)
                THEN 1 ELSE 0 END AS INTEGER) AS is_peak
    FROM r ORDER BY lag
    """,
    doc="Cross-correlation lead-lag scan (CCF) between the daily view "
    "and purchase series at lags -7..+7 — the diagnostic that says "
    "whether views LEAD purchases (and by how many days), which no "
    "single-series ACF (q252) can answer; the peak-flagged lag is "
    "the natural feature-engineering offset for q332-style models. "
    "Scale shape: one partial+final agg folds the events fact to "
    "<=|calendar| daily rows, the 15 lag pairings come from a "
    "BROADCAST self-join on day+lag (no window, no sort), and the "
    "Pearson closed form runs on 15 rows of exact-DECIMAL "
    "sufficient statistics (q252's discipline). The peak flag "
    "compares ROUNDED correlations (engine-identical doubles), so "
    "the argmax is deterministic cross-engine.",
)
@plan_cache
def q383(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    # daily feeds both sides of the lag join and r feeds the peak fence
    # and the final readout — 4 events scans in one plan without
    # materialization (scan-dup probe).
    daily = _managed_persist(
        "q383_daily",
        ev.groupBy(F.to_date("ts").alias("day")).agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("double")
            .alias("vx"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("double")
            .alias("py"),
        ),
    )
    lags = spark.range(-7, 8).select(F.col("id").alias("lag"))
    d2 = daily.select(F.col("day").alias("day2"), F.col("py").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(d2),
            F.expr("date_add(day, CAST(lag AS INT))") == F.col("day2"),
        )
        .select("lag", F.col("vx").alias("x"), "y")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
    )
    n = F.col("n_pairs")
    # Constant-series guard (q330/q372 class, extended r12): zero
    # variance at either series zeroes the divisor — Spark ANSI raises
    # where DuckDB yields NaN/inf; NULL both engines (the peak flag
    # then compares NULL = NULL -> 0 in both).
    vprod = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    r = s.select(
        "lag",
        "n_pairs",
        F.when(
            vprod != 0,
            F.round(
                (n * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(vprod),
                4,
            ),
        ).alias("xcorr"),
    )
    peak = r.agg(F.max("xcorr").alias("peak"))
    return (
        r.crossJoin(F.broadcast(peak))
        .select(
            "lag",
            "n_pairs",
            "xcorr",
            F.when(F.col("xcorr") == F.col("peak"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_peak"),
        )
        .orderBy("lag")
    )


@register(
    "q385",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
             CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                        THEN user_id END) AS BIGINT) AS n_conv
      FROM events GROUP BY 1
    ),
    base AS (
      SELECT CAST(SUM(n_conv) AS DOUBLE) / CAST(SUM(n_active) AS DOUBLE)
               AS p,
             CAST(SUM(n_active) AS DOUBLE) / COUNT(*) AS daily_n
      FROM daily
    ),
    h AS (SELECT CAST(horizon AS BIGINT) AS horizon_days
          FROM (VALUES (7), (14), (28)) v(horizon))
    SELECT horizon_days,
           CAST(FLOOR(horizon_days * daily_n / 2) AS BIGINT) AS n_per_arm,
           ROUND(p, 6) AS baseline_p,
           ROUND((1.959963984540054 + 0.8416212335729143)
                 * sqrt(2 * p * (1 - p)
                        / FLOOR(horizon_days * daily_n / 2)), 6)
             AS mde_abs,
           ROUND(ROUND((1.959963984540054 + 0.8416212335729143)
                 * sqrt(2 * p * (1 - p)
                        / FLOOR(horizon_days * daily_n / 2)), 6) / p, 4)
             AS mde_rel
    FROM h CROSS JOIN base ORDER BY horizon_days
    """,
    doc="A/B experiment power planning: the minimum detectable effect "
    "(80% power, two-sided alpha=0.05, two-proportion z approximation) "
    "on the daily purchase-conversion metric for 7/14/28-day runtimes "
    "at observed traffic — the table every experiment review starts "
    "from (run longer vs accept a coarser MDE), the planning "
    "counterpart to q242's post-hoc readout and q331's A/A "
    "calibration. Determinism: p and daily_n derive from integer "
    "distinct-counts (exact in double); n_per_arm uses FLOOR spelled "
    "identically in both engines (DuckDB CAST rounds, the q289 "
    "lesson). Scale shape: one daily distinct-count fold (size fixed "
    "by the calendar), a 1-row closed form, 3-row output.",
)
@plan_cache
def q385(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_conv"),
    )
    base = daily.agg(
        (
            F.sum("n_conv").cast("double")
            / F.sum("n_active").cast("double")
        ).alias("p"),
        (F.sum("n_active").cast("double") / F.count(F.lit(1))).alias(
            "daily_n"
        ),
    )
    h = spark.range(1).select(
        F.explode(F.array(F.lit(7), F.lit(14), F.lit(28))).alias("hd")
    ).select(F.col("hd").cast("bigint").alias("horizon_days"))
    z = F.lit(1.959963984540054 + 0.8416212335729143)
    n_arm = F.floor(
        F.col("horizon_days") * F.col("daily_n") / 2
    )
    mde = F.round(
        z
        * F.sqrt(
            2 * F.col("p") * (1 - F.col("p")) / n_arm
        ),
        6,
    )
    return (
        h.crossJoin(F.broadcast(base))
        .select(
            "horizon_days",
            n_arm.cast("bigint").alias("n_per_arm"),
            F.round(F.col("p"), 6).alias("baseline_p"),
            mde.alias("mde_abs"),
            F.round(mde / F.col("p"), 4).alias("mde_rel"),
        )
        .orderBy("horizon_days")
    )


def _phi_sql(z: str) -> str:
    """Standard-normal CDF as a SQL expression string (Abramowitz-Stegun
    7.1.26 erf polynomial, |error| < 1.5e-7) — built from the SAME text
    for the Spark plan (via F.expr) and the DuckDB oracle, so both
    engines evaluate an identical double expression tree and the
    round(4) comparison can never diverge structurally."""
    x = f"(ABS({z}) / 1.4142135623730951)"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"(((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741)"
        f" * {t} - 0.284496736) * {t} + 0.254829592) * {t})"
    )
    erf = f"(1.0 - {poly} * EXP(-({x} * {x})))"
    return f"(CASE WHEN {z} >= 0 THEN 0.5 * (1.0 + {erf}) ELSE 0.5 * (1.0 - {erf}) END)"


_Q386_Z = "((LN(CAST(v AS DOUBLE)) - mu) / sigma)"


@register(
    "q386",
    oracle="""
    WITH vc AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents WHERE n_chars > 0 GROUP BY 1
    ),
    fit AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(LN(CAST(v AS DOUBLE)) * c
                                 AS DECIMAL(30,10)))
                        / SUM(c) AS DOUBLE), 6) AS mu,
             CAST(SUM(CAST(LN(CAST(v AS DOUBLE)) * c
                           AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(LN(CAST(v AS DOUBLE))
                           * LN(CAST(v AS DOUBLE)) * c
                           AS DECIMAL(30,10))) AS DOUBLE) AS sxx
      FROM vc
    ),
    fit2 AS (
      SELECT n, mu,
             ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS sigma
      FROM fit
    ),
    cum AS (
      SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS r
      FROM vc
    ),
    d AS (
      SELECT GREATEST(
               CAST(r AS DOUBLE) / n - {PHI},
               {PHI} - CAST(r - c AS DOUBLE) / n) AS dv
      FROM cum, fit2
    )
    SELECT n AS n_docs, mu, sigma,
           ROUND((SELECT MAX(dv) FROM d), 4) AS ks_d,
           ROUND(1.3581 / sqrt(n), 4) AS ks_crit,
           CAST(CASE WHEN ROUND((SELECT MAX(dv) FROM d), 4)
                          <= ROUND(1.3581 / sqrt(n), 4)
                THEN 1 ELSE 0 END AS INTEGER) AS lognormal_ok
    FROM fit2 ORDER BY n_docs
    """.replace("{PHI}", _phi_sql(_Q386_Z)),
    doc="Log-normal fit + Kolmogorov-Smirnov goodness-of-fit on document "
    "lengths — the canonical corpus-shape check (web-text length is "
    "famously log-normal; a rejected fit flags truncation or a mixed "
    "extraction pipeline) and the distribution-FITTING counterpart "
    "to q254's two-sample comparison. mu/sigma are the exact-DECIMAL "
    "log-moment estimates rounded to 6 BEFORE any z-score; Phi is the "
    "Abramowitz-Stegun erf polynomial generated from ONE shared SQL "
    "string (_phi_sql) so both engines evaluate the identical "
    "expression tree; D uses both ECDF step edges (F_hi and F_lo) as "
    "the KS definition requires. Scale shape: the corpus folds to "
    "per-distinct-length counts first (bounded by the length domain, "
    "not the doc count); the running ECDF cumulates with the q167 "
    "two-phase discipline (percentile-bound buckets, partitioned "
    "windows only — the oracle states the naive global-window form); "
    "the fit itself is one partial+final decimal agg. Single-row "
    "output; 1.3581/sqrt(n) is the alpha=0.05 large-n critical value.",
)
@plan_cache
def q386(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 8 documents scans): vc feeds fit,
    # bounds and bucketed, and the offsets/cum/d chain nests those
    # branches — every one re-ran the corpus fold. Persist the tiny
    # value-count frame; one scan, every branch reads it warm.
    vc = _managed_persist(
        "q386_vc",
        docs.groupBy(F.col("n_chars").alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        ),
    )
    lx = F.log(F.col("v").cast("double"))
    fit = vc.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.round(
            (F.sum((lx * F.col("c")).cast(DEC)) / F.sum("c")).cast("double"),
            6,
        ).alias("mu"),
        F.sum((lx * F.col("c")).cast(DEC)).cast("double").alias("sx"),
        F.sum((lx * lx * F.col("c")).cast(DEC)).cast("double").alias("sxx"),
    ).select(
        "n",
        "mu",
        F.round(
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
            ),
            6,
        ).alias("sigma"),
    )
    # two-phase running ECDF (q254's discipline: no unpartitioned window)
    bounds = vc.agg(
        F.expr(
            "percentile(v, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = vc.crossJoin(F.broadcast(bounds)).select(
        "v", "c", F.expr("size(filter(bs, b -> b < v))").alias("bk")
    )
    btot = bucketed.groupBy("bk").agg(F.sum("c").alias("bc"))
    b2 = btot.select(F.col("bk").alias("bk2"), F.col("bc").alias("ec"))
    offsets = (
        btot.join(F.broadcast(b2), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(F.coalesce(F.sum("ec"), F.lit(0)).alias("off"))
    )
    wb = Window.partitionBy("bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        bucketed.withColumn("wc", F.sum("c").over(wb))
        .join(F.broadcast(offsets), "bk")
        .select("v", "c", (F.col("off") + F.col("wc")).cast("bigint").alias("r"))
    )
    phi = F.expr(_phi_sql(_Q386_Z))
    d = cum.crossJoin(F.broadcast(fit)).select(
        F.greatest(
            F.col("r").cast("double") / F.col("n") - phi,
            phi - (F.col("r") - F.col("c")).cast("double") / F.col("n"),
        ).alias("dv")
    )
    ks = d.agg(F.round(F.max("dv"), 4).alias("ks_d"))
    return (
        fit.crossJoin(F.broadcast(ks))
        .select(
            F.col("n").alias("n_docs"),
            "mu",
            "sigma",
            "ks_d",
            F.round(F.lit(1.3581) / F.sqrt(F.col("n")), 4).alias("ks_crit"),
            F.when(
                F.col("ks_d") <= F.round(F.lit(1.3581) / F.sqrt(F.col("n")), 4),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("lognormal_ok"),
        )
        .orderBy("n_docs")
    )


@register(
    "q387",
    oracle=f"""
    WITH b AS (
      SELECT CAST(FLOOR(MIN(EPOCH(ts))) AS BIGINT) AS mn,
             CAST(FLOOR(MAX(EPOCH(ts))) AS BIGINT) AS mx
      FROM events
    ),
    tr AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state,
             event_type AS next_state,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    cutv AS (SELECT mn + CAST(FLOOR((mx - mn) * 4.0 / 5) AS BIGINT) AS c
             FROM b),
    train AS (
      SELECT prev_state, next_state, CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE prev_state IS NOT NULL
        AND ts_s < (SELECT c FROM cutv)
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT prev_state, next_state AS predicted FROM (
        SELECT prev_state, next_state,
               ROW_NUMBER() OVER (PARTITION BY prev_state
                                  ORDER BY n DESC, next_state) AS rn
        FROM train) WHERE rn = 1
    ),
    test AS (
      SELECT prev_state, next_state FROM tr
      WHERE prev_state IS NOT NULL AND ts_s >= (SELECT c FROM cutv)
    )
    SELECT t.prev_state,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.next_state = p.predicted
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           {sql_dratio_round(
               'SUM(CASE WHEN t.next_state = p.predicted'
               ' THEN 1 ELSE 0 END)',
               'COUNT(*)')}
             AS top1_acc
    FROM test t JOIN pred p ON p.prev_state = t.prev_state
    GROUP BY 1 ORDER BY 1
    """,
    doc="Markov next-event prediction backtest: first-order transition "
    "counts trained on the first 80% of the event span (epoch-second "
    "cut, FLOOR spelled identically in both engines — the q289 "
    "lesson), argmax next-state prediction (count DESC, state ASC "
    "tie-break), top-1 accuracy measured on the held-out 20% — the "
    "out-of-sample validation q257's transition matrix and q349's "
    "stationary analysis never get; per-state accuracy directly "
    "prices a next-action recommender. Scale shape: transitions come "
    "from ONE user-partitioned lag window over the fact table, train "
    "folds to a |states|^2 frame, prediction is a |states|-row "
    "broadcast join onto the test fold — no N^2, no driver loop.",
)
@plan_cache
def q387(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # The per-user transition window feeds the train fold (via the pred
    # broadcast) AND the test pass — 4 events scans in one plan without
    # materialization (scan-dup probe).
    tr = _managed_persist(
        "q387_tr",
        ev.select(
            F.lag("event_type").over(w).alias("prev_state"),
            F.col("event_type").alias("next_state"),
            F.col("ts").cast("long").alias("ts_s"),
        ).where(F.col("prev_state").isNotNull()),
    )
    b = ev.agg(
        F.min(F.col("ts").cast("long")).alias("mn"),
        F.max(F.col("ts").cast("long")).alias("mx"),
    ).select(
        (
            F.col("mn")
            + F.floor((F.col("mx") - F.col("mn")) * 4.0 / 5).cast("bigint")
        ).alias("c")
    )
    trc = tr.crossJoin(F.broadcast(b))
    train = (
        trc.where(F.col("ts_s") < F.col("c"))
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = Window.partitionBy("prev_state").orderBy(
        F.col("n").desc(), "next_state"
    )
    pred = (
        train.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("prev_state", F.col("next_state").alias("predicted"))
    )
    test = trc.where(F.col("ts_s") >= F.col("c")).select(
        "prev_state", "next_state"
    )
    return (
        test.join(F.broadcast(pred), "prev_state")
        .groupBy("prev_state")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("next_state") == F.col("predicted"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_correct"),
            dratio_round(
                F.sum(
                    F.when(
                        F.col("next_state") == F.col("predicted"), 1
                    ).otherwise(0)
                ).cast(DECZ),
                F.count(F.lit(1)).cast(DECZ),
            ).alias("top1_acc"),
        )
        .orderBy("prev_state")
    )


@register(
    "q388",
    oracle="""
    WITH hourly AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hr,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS errs,
             CAST(COUNT(*) AS BIGINT) AS total
      FROM events GROUP BY 1
    ),
    roll AS (
      SELECT h.hr, h.errs, h.total,
             CAST(SUM(p.errs) AS BIGINT) AS errs6,
             CAST(SUM(p.total) AS BIGINT) AS total6
      FROM hourly h JOIN hourly p ON p.hr BETWEEN h.hr - 5 AND h.hr
      GROUP BY 1, 2, 3
    )
    SELECT hr,
           ROUND(CAST(errs AS DOUBLE) / total / 0.25, 4) AS burn_1h,
           ROUND(CAST(errs6 AS DOUBLE) / total6 / 0.25, 4) AS burn_6h,
           CAST(CASE WHEN ROUND(CAST(errs AS DOUBLE) / total / 0.25, 4)
                          > 1.1
                      AND ROUND(CAST(errs6 AS DOUBLE) / total6 / 0.25, 4)
                          > 1.05
                THEN 1 ELSE 0 END AS INTEGER) AS alert
    FROM roll ORDER BY hr
    """,
    doc="SRE error-budget multi-window burn-rate report (the "
    "Google-SRE-workbook alerting pattern): hourly error share over a "
    "25% error budget (the corpus's synthetic error mix is ~20%, so "
    "burn 1.0 is the expected baseline and the 1.1/1.05 thresholds "
    "flag genuine bursts), paired with the trailing-6h burn so "
    "transient blips don't page but sustained burns do — alert only "
    "when BOTH windows exceed. Scale shape: the fact table folds to "
    "one calendar-bounded hourly frame; the trailing window is a "
    "band self-join over that TINY frame (hr BETWEEN hr-5 AND hr), "
    "never a global-ordered window over raw events; flags compare "
    "ROUNDED burns so both engines cut identically.",
)
@plan_cache
def q388(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 events scans): both sides of the
    # 6h-band self-join re-ran the hourly fold. Persist it.
    hourly = _managed_persist(
        "q388_hourly",
        ev.groupBy(
            F.floor(F.col("ts").cast("long") / 3600)
            .cast("bigint")
            .alias("hr")
        ).agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("errs"),
            F.count(F.lit(1)).cast("bigint").alias("total"),
        ),
    )
    p = hourly.select(
        F.col("hr").alias("phr"),
        F.col("errs").alias("perrs"),
        F.col("total").alias("ptotal"),
    )
    roll = (
        hourly.join(
            F.broadcast(p),
            (F.col("phr") >= F.col("hr") - 5) & (F.col("phr") <= F.col("hr")),
        )
        .groupBy("hr", "errs", "total")
        .agg(
            F.sum("perrs").cast("bigint").alias("errs6"),
            F.sum("ptotal").cast("bigint").alias("total6"),
        )
    )
    b1 = F.round(F.col("errs").cast("double") / F.col("total") / 0.25, 4)
    b6 = F.round(F.col("errs6").cast("double") / F.col("total6") / 0.25, 4)
    return roll.select(
        "hr",
        b1.alias("burn_1h"),
        b6.alias("burn_6h"),
        F.when((b1 > 1.1) & (b6 > 1.05), 1)
        .otherwise(0)
        .cast("int")
        .alias("alert"),
    ).orderBy("hr")


@register(
    "q389",
    oracle="""
    WITH g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS DOUBLE) AS sx,
             CAST(SUM(CAST(n_chars AS BIGINT) * n_chars) AS DOUBLE)
               AS sxx
      FROM documents GROUP BY 1
    ),
    m AS (
      SELECT source, n, sx / n AS xbar,
             (sxx - sx * sx / n) / (n - 1) AS s2
      FROM g
    ),
    pool AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(xbar AS DECIMAL(30,10))) AS DOUBLE)
               / COUNT(*) AS grand,
             CAST(SUM(CAST(s2 / n AS DECIMAL(30,10))) AS DOUBLE)
               / COUNT(*) AS v
      FROM m
    ),
    s AS (
      SELECT k, grand, v,
             CAST(SUM(CAST((xbar - grand) * (xbar - grand)
                           AS DECIMAL(30,10))) AS DOUBLE) AS ss
      FROM m, pool GROUP BY 1, 2, 3
    ),
    c AS (
      SELECT grand,
             GREATEST(0.0, 1.0 - (k - 3) * v / ss) AS shrink
      FROM s
    )
    SELECT m.source, m.n AS n_docs,
           ROUND(m.xbar, 4) AS raw_mean,
           ROUND(c.grand + c.shrink * (m.xbar - c.grand), 4)
             AS shrunk_mean,
           ROUND(c.shrink, 4) AS shrink_factor
    FROM m, c ORDER BY m.source
    """,
    doc="James-Stein / Efron-Morris shrinkage of per-source mean "
    "document length: each source's raw mean is pulled toward the "
    "grand mean by 1 - (k-3)V/S (V = average squared standard error, "
    "S = between-group sum of squares, floored at 0) — the "
    "empirical-Bayes estimator that DOMINATES the raw means for k>=4 "
    "and the principled answer to 'this tiny source looks anomalous' "
    "(it is mostly noise, and the shrinkage says how much). The "
    "corpus's 20 balanced sources are the textbook equal-n case. "
    "Scale shape: one partial+final decimal agg folds the corpus to "
    "k group rows; everything after is closed-form arithmetic on a "
    "broadcast 1-row frame.",
)
@plan_cache
def q389(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 3 documents scans): pool, s and the
    # final select all nested the per-source moment fold. Persist it;
    # the shrinkage math runs on |sources| rows.
    g = _managed_persist(
        "q389_g",
        docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            # n_chars is an integer count: scale-0 accumulators (exact
            # LONG products, DECIMAL(38,0)/HUGEINT sums) keep the final
            # decimal->double cast correctly rounded in BOTH engines at
            # any magnitude — the scale-10 cast diverges sub-ulp past
            # ~9e5 (r13 discipline sweep, same as q331/q321/q308/q133).
            F.sum(F.col("n_chars").cast(DECZ)).cast("double").alias("sx"),
            F.sum(
                (F.col("n_chars").cast("long") * F.col("n_chars")).cast(
                    DECZ
                )
            )
            .cast("double")
            .alias("sxx"),
        ),
    )
    m = g.select(
        "source",
        "n",
        (F.col("sx") / F.col("n")).alias("xbar"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("s2"),
    )
    pool = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.sum(F.col("xbar").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "grand"
        ),
        (
            F.sum((F.col("s2") / F.col("n")).cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("v"),
    )
    s = (
        m.crossJoin(F.broadcast(pool))
        .groupBy("k", "grand", "v")
        .agg(
            F.sum(
                (
                    (F.col("xbar") - F.col("grand"))
                    * (F.col("xbar") - F.col("grand"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("ss")
        )
    )
    c = s.select(
        "grand",
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - (F.col("k") - 3) * F.col("v") / F.col("ss"),
        ).alias("shrink"),
    )
    return (
        m.crossJoin(F.broadcast(c))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(F.col("xbar"), 4).alias("raw_mean"),
            F.round(
                F.col("grand")
                + F.col("shrink") * (F.col("xbar") - F.col("grand")),
                4,
            ).alias("shrunk_mean"),
            F.round(F.col("shrink"), 4).alias("shrink_factor"),
        )
        .orderBy("source")
    )


@register(
    "q391",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN (user_id % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    per_user AS (
      SELECT e.user_id, a.arm,
             CAST(SUM(CAST(CASE WHEN e.event_type = 'purchase'
                           THEN e.value ELSE 0 END AS DECIMAL(30,10)))
               AS DOUBLE) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events e JOIN assign a ON a.user_id = e.user_id
      GROUP BY 1, 2
    ),
    s AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(y AS DOUBLE) * y AS DECIMAL(30,10)))
               AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM per_user GROUP BY 1
    ),
    d AS (
      SELECT arm, n, sx / sy AS r,
             ((sxx - sx * sx / n) / (n - 1)
              + (sx / sy) * (sx / sy) * ((syy - sy * sy / n) / (n - 1))
              - 2 * (sx / sy) * ((sxy - sx * sy / n) / (n - 1)))
             / ((sy / n) * (sy / n)) / n AS vr
      FROM s
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 'A' THEN r END) AS ra,
             MAX(CASE WHEN arm = 'B' THEN r END) AS rb,
             MAX(CASE WHEN arm = 'A' THEN vr END) AS va,
             MAX(CASE WHEN arm = 'B' THEN vr END) AS vb,
             MAX(CASE WHEN arm = 'A' THEN n END) AS na,
             MAX(CASE WHEN arm = 'B' THEN n END) AS nb
      FROM d
    )
    SELECT na, nb,
           ROUND(ra, 6) AS ratio_a, ROUND(rb, 6) AS ratio_b,
           ROUND(ra - rb, 6) AS diff,
           ROUND(sqrt(va + vb), 6) AS se,
           ROUND((ra - rb) / sqrt(va + vb), 4) AS z_score,
           CAST(CASE WHEN ABS(ROUND((ra - rb) / sqrt(va + vb), 4))
                          > 1.96
                THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM wide ORDER BY na
    """,
    doc="Delta-method A/B readout for a RATIO metric (purchase revenue "
    "per event) — the experimentation-platform staple q242's "
    "two-proportion z cannot handle: per-user numerator/denominator "
    "totals make users the randomization unit, and Var(X̄/Ȳ) is "
    "linearized as (var_x + R² var_y − 2R cov_xy) / ȳ² / n (Deng et "
    "al.'s ratio-metric correction; naive per-event variance would "
    "be anticonservative under within-user correlation). Assignment "
    "is q242's deterministic hash. Scale shape: one user-keyed "
    "partial+final decimal fold, then closed-form arithmetic over a "
    "2-row frame; all float ops run once, identically, in both "
    "engines.",
)
@plan_cache
def q391(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        (F.col("user_id") % F.lit(2147483648)) * 2654435761 % 100 < 50, "A"
    ).otherwise("B")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
            .cast(DEC)
        )
        .cast("double")
        .alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    ).select(arm.alias("arm"), "x", "y")
    s = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y").cast("double") * F.col("y")).cast(DEC))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
    )
    r = F.col("sx") / F.col("sy")
    n = F.col("n")
    vr = (
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
            + r * r * ((F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1))
            - 2 * r * ((F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1))
        )
        / ((F.col("sy") / n) * (F.col("sy") / n))
        / n
    )
    d = s.select("arm", "n", r.alias("r"), vr.alias("vr"))
    wide = d.agg(
        F.max(F.when(F.col("arm") == "A", F.col("r"))).alias("ra"),
        F.max(F.when(F.col("arm") == "B", F.col("r"))).alias("rb"),
        F.max(F.when(F.col("arm") == "A", F.col("vr"))).alias("va"),
        F.max(F.when(F.col("arm") == "B", F.col("vr"))).alias("vb"),
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
    )
    z = F.round(
        (F.col("ra") - F.col("rb")) / F.sqrt(F.col("va") + F.col("vb")), 4
    )
    return wide.select(
        "na",
        "nb",
        F.round(F.col("ra"), 6).alias("ratio_a"),
        F.round(F.col("rb"), 6).alias("ratio_b"),
        F.round(F.col("ra") - F.col("rb"), 6).alias("diff"),
        F.round(F.sqrt(F.col("va") + F.col("vb")), 6).alias("se"),
        z.alias("z_score"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("int").alias("significant"),
    ).orderBy("na")


@register(
    "q392",
    oracle=f"""
    WITH salts AS (SELECT CAST(range AS BIGINT) AS salt FROM range(0, 20)),
    ud AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY 1, 2
    ),
    assigned AS (
      SELECT s.salt, u.day, u.conv,
             CASE WHEN ((u.user_id % 2147483648) * 2654435761
                        + s.salt * 40503) % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm
      FROM ud u JOIN salts s ON TRUE
    ),
    daily AS (
      SELECT salt, arm, day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS c
      FROM assigned GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT salt, arm, day,
             CAST(SUM(n) OVER w AS BIGINT) AS cn,
             CAST(SUM(c) OVER w AS BIGINT) AS cc
      FROM daily
      WINDOW w AS (PARTITION BY salt, arm ORDER BY day)
    ),
    z AS (
      SELECT a.salt, a.day,
             CASE WHEN a.cc + b.cc > 0
                   AND a.cc + b.cc < a.cn + b.cn
                  THEN ROUND((CAST(a.cc AS DOUBLE) / a.cn
                         - CAST(b.cc AS DOUBLE) / b.cn)
                        / sqrt((CAST(a.cc + b.cc AS DOUBLE) / (a.cn + b.cn))
                               * (1 - CAST(a.cc + b.cc AS DOUBLE)
                                      / (a.cn + b.cn))
                               * (1.0 / a.cn + 1.0 / b.cn)), 4)
                  ELSE NULL END AS zd
      FROM (SELECT * FROM cum WHERE arm = 'A') a
      JOIN (SELECT * FROM cum WHERE arm = 'B') b
        ON b.salt = a.salt AND b.day = a.day
    ),
    per_exp AS (
      SELECT salt,
             MAX(CASE WHEN ABS(zd) > 1.96 THEN 1 ELSE 0 END) AS anytime,
             MAX(CASE WHEN day = (SELECT MAX(day) FROM z)
                      AND ABS(zd) > 1.96 THEN 1 ELSE 0 END) AS final
      FROM z GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_experiments,
           CAST(SUM(final) AS BIGINT) AS sig_final,
           CAST(SUM(anytime) AS BIGINT) AS sig_anytime,
           {sql_dratio_round('SUM(final)', 'COUNT(*)')}
             AS fp_rate_final,
           {sql_dratio_round('SUM(anytime)', 'COUNT(*)')}
             AS fp_rate_anytime
    FROM per_exp ORDER BY n_experiments
    """,
    doc="Peeking-bias (continuous-monitoring) inflation audit: 20 "
    "deterministic A/A experiments (per-salt hash splits of the same "
    "traffic), each read with a daily running two-proportion z on "
    "user-day conversion — comparing the false-positive rate of the "
    "honest final-day read against 'significant on ANY day' "
    "(unadjusted sequential peeking). The measured inflation is the "
    "empirical argument for q385's fixed-horizon planning or a "
    "proper sequential boundary; it generalizes q331's single-salt "
    "A/A to the time dimension. Scale shape: one user-day fold, a "
    "20-salt broadcast fan-out, per-(salt, arm) partitioned running "
    "sums over the calendar-bounded daily frame, closed-form z per "
    "row; flags compare ROUNDED z so both engines cut identically.",
)
@plan_cache
def q392(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    salts = spark.range(0, 20).select(F.col("id").alias("salt"))
    assigned = ud.crossJoin(F.broadcast(salts)).select(
        "salt",
        "day",
        "conv",
        F.when(
            (
                (F.col("user_id") % F.lit(2147483648)) * 2654435761
                + F.col("salt") * 40503
            )
            % 100
            < 50,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    daily = assigned.groupBy("salt", "arm", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("c"),
    )
    w = (
        Window.partitionBy("salt", "arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # cum feeds both arm branches of the peeking join — each replayed
    # the 20x salt expansion + window chain (4 events scans in the
    # plan probe).
    cum = _managed_persist(
        "q392_cum",
        daily.select(
            "salt",
            "arm",
            "day",
            F.sum("n").over(w).cast("bigint").alias("cn"),
            F.sum("c").over(w).cast("bigint").alias("cc"),
        ),
    )
    a = cum.where(F.col("arm") == "A").select(
        "salt", "day", F.col("cn").alias("an"), F.col("cc").alias("ac")
    )
    b = cum.where(F.col("arm") == "B").select(
        F.col("salt").alias("salt_b"),
        F.col("day").alias("day_b"),
        F.col("cn").alias("bn"),
        F.col("cc").alias("bc"),
    )
    pooled = (F.col("ac") + F.col("bc")).cast("double") / (
        F.col("an") + F.col("bn")
    )
    z = a.join(
        b,
        (F.col("salt_b") == F.col("salt")) & (F.col("day_b") == F.col("day")),
    ).select(
        "salt",
        "day",
        # All-converted / none-converted guard (q330/q372 class,
        # extended r12): pooled p in {0,1} zeroes p(1-p) — Spark ANSI
        # raises where DuckDB yields NaN/inf; NULL zd drops out of the
        # MAX(CASE ...) flags identically in both engines. Division-
        # free predicate (integer count compares).
        F.when(
            (F.col("ac") + F.col("bc") > 0)
            & (F.col("ac") + F.col("bc") < F.col("an") + F.col("bn")),
            F.round(
                (
                    F.col("ac").cast("double") / F.col("an")
                    - F.col("bc").cast("double") / F.col("bn")
                )
                / F.sqrt(
                    pooled
                    * (1 - pooled)
                    * (1.0 / F.col("an") + 1.0 / F.col("bn"))
                ),
                4,
            ),
        ).alias("zd"),
    )
    last = z.agg(F.max("day").alias("last_day"))
    per_exp = (
        z.crossJoin(F.broadcast(last))
        .groupBy("salt")
        .agg(
            F.max(F.when(F.abs(F.col("zd")) > 1.96, 1).otherwise(0)).alias(
                "anytime"
            ),
            F.max(
                F.when(
                    (F.col("day") == F.col("last_day"))
                    & (F.abs(F.col("zd")) > 1.96),
                    1,
                ).otherwise(0)
            ).alias("final"),
        )
    )
    return per_exp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_experiments"),
        F.sum("final").cast("bigint").alias("sig_final"),
        F.sum("anytime").cast("bigint").alias("sig_anytime"),
        dratio_round(
            F.sum("final").cast(DECZ), F.count(F.lit(1)).cast(DECZ)
        ).alias("fp_rate_final"),
        dratio_round(
            F.sum("anytime").cast(DECZ), F.count(F.lit(1)).cast(DECZ)
        ).alias("fp_rate_anytime"),
    ).orderBy("n_experiments")


@register(
    "q393",
    oracle=f"""
    WITH b AS (
      SELECT CAST(FLOOR(MIN(EPOCH(ts))) AS BIGINT) AS mn,
             CAST(FLOOR(MAX(EPOCH(ts))) AS BIGINT) AS mx
      FROM events
    ),
    cutv AS (SELECT mn + CAST(FLOOR((mx - mn) / 2.0) AS BIGINT) AS c
             FROM b),
    halves AS (
      SELECT user_id,
             CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                       < (SELECT c FROM cutv)
                  THEN 0 ELSE 1 END AS half,
             value
      FROM events
    ),
    um AS (
      SELECT user_id, half,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10)))
                        / COUNT(*) AS DOUBLE), 6) AS mv
      FROM halves GROUP BY 1, 2
    ),
    paired AS (
      SELECT pre.user_id, post.mv - pre.mv AS d
      FROM (SELECT * FROM um WHERE half = 0) pre
      JOIN (SELECT * FROM um WHERE half = 1) post
        ON post.user_id = pre.user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(d AS DECIMAL(30,10))) AS DOUBLE) AS sd_,
             CAST(SUM(CAST(d * d AS DECIMAL(30,10))) AS DOUBLE) AS sdd
      FROM paired
    )
    SELECT n AS n_users,
           {sql_dratio_round('CAST(sd_ * 1000000 AS HUGEINT)', 'n * 1000000', 6)}
             AS mean_diff,
           ROUND(sqrt((sdd - sd_ * sd_ / n) / (n - 1)), 6) AS sd_diff,
           ROUND((sd_ / n) / (sqrt((sdd - sd_ * sd_ / n) / (n - 1))
                              / sqrt(n)), 4) AS t_stat,
           CAST(CASE WHEN ABS(ROUND((sd_ / n)
                  / (sqrt((sdd - sd_ * sd_ / n) / (n - 1))
                     / sqrt(n)), 4)) > 1.96
                THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM s ORDER BY n_users
    """,
    doc="Paired (within-user) pre/post t-test on mean event value across "
    "the two halves of the observation span — the repeated-measures "
    "design q304's Welch test cannot express: each user is their own "
    "control, so between-user variance cancels and the test runs on "
    "per-user DIFFERENCES (users active in both halves only). "
    "Determinism: the epoch-second midpoint cut uses FLOOR spelled "
    "identically (q289), per-user half-means round(6) through the "
    "exact-DECIMAL divide BEFORE differencing, and the t closed form "
    "runs once on decimal sufficient statistics. Scale shape: one "
    "(user, half) fold, a user-keyed self-join, one 1-row moment "
    "fold.",
)
@plan_cache
def q393(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("long")).alias("mn"),
        F.max(F.col("ts").cast("long")).alias("mx"),
    ).select(
        (
            F.col("mn") + F.floor((F.col("mx") - F.col("mn")) / 2.0).cast("bigint")
        ).alias("c")
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # um feeds the pre and post halves of the pairing join — each
    # replayed the per-user fold (4 events scans in the plan probe).
    um = _managed_persist(
        "q393_um",
        ev.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.when(F.col("ts").cast("long") < F.col("c"), 0)
            .otherwise(1)
            .alias("half"),
            "value",
        )
        .groupBy("user_id", "half")
        .agg(
            F.round(
                (F.sum(F.col("value").cast(DEC)) / F.count(F.lit(1))).cast(
                    "double"
                ),
                6,
            ).alias("mv")
        ),
    )
    pre = um.where(F.col("half") == 0).select("user_id", F.col("mv").alias("pre"))
    post = um.where(F.col("half") == 1).select(
        "user_id", F.col("mv").alias("post")
    )
    paired = pre.join(post, "user_id").select(
        (F.col("post") - F.col("pre")).alias("d")
    )
    s = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("d").cast(DEC)).cast("double").alias("sd_"),
        F.sum((F.col("d") * F.col("d")).cast(DEC)).cast("double").alias("sdd"),
    )
    n = F.col("n")
    sdiff = F.sqrt(
        (F.col("sdd") - F.col("sd_") * F.col("sd_") / n) / (n - 1)
    )
    t = F.round((F.col("sd_") / n) / (sdiff / F.sqrt(n)), 4)
    return s.select(
        n.alias("n_users"),
        dratio_round(
            (F.col("sd_") * 1000000).cast(DECZ), (n * 1000000).cast(DECZ), 6
        ).alias("mean_diff"),
        F.round(sdiff, 6).alias("sd_diff"),
        t.alias("t_stat"),
        F.when(F.abs(t) > 1.96, 1).otherwise(0).cast("int").alias("significant"),
    ).orderBy("n_users")


@register(
    "q394",
    oracle=f"""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d0
      FROM events
    ),
    c AS (
      SELECT
        CAST(SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) - b.d0
                           BETWEEN 0 AND 6
                       AND event_type = 'error'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        CAST(SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) - b.d0
                           BETWEEN 7 AND 13
                       AND event_type = 'error'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM events, b GROUP BY b.d0
    )
    SELECT c1 AS errors_week1, c2 AS errors_week2,
           ROUND(CAST(c1 AS DOUBLE) / 7, 4) AS rate1_per_day,
           ROUND(CAST(c2 AS DOUBLE) / 7, 4) AS rate2_per_day,
           CASE WHEN c1 > 0 THEN {sql_dratio_round('c2', 'c1')}
                ELSE NULL END AS rate_ratio,
           CASE WHEN c1 > 0 AND c2 > 0
                THEN ROUND((LN(CAST(c2 AS DOUBLE))
                       - LN(CAST(c1 AS DOUBLE)))
                      / sqrt(1.0 / c1 + 1.0 / c2), 4)
                ELSE NULL END AS z_score,
           CAST(CASE WHEN c1 > 0 AND c2 > 0
                      AND ABS(ROUND((LN(CAST(c2 AS DOUBLE))
                      - LN(CAST(c1 AS DOUBLE)))
                      / sqrt(1.0 / c1 + 1.0 / c2), 4)) > 1.96
                THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM c ORDER BY errors_week1
    """,
    doc="Two-sample Poisson rate-ratio test on error counts, week 1 vs "
    "week 2 of the span (equal 7-day exposures): z on the log rate "
    "ratio with Var(ln ĉ) ≈ 1/c — the COUNT-process complement to "
    "q242's proportion z and q304's mean t (incident rates, crash "
    "counts, and ingestion-failure monitoring are Poisson, not "
    "Bernoulli). Scale shape: one conditional fold over the fact "
    "table (two integers out), closed form on one row; all float "
    "ops run once, identically, in both engines.",
)
@plan_cache
def q394(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    b = ev.agg(F.min(day).alias("d0"))
    rel = F.col("dd") - F.col("d0")
    c = (
        ev.select(day.alias("dd"), "event_type")
        .crossJoin(F.broadcast(b))
        .agg(
            F.sum(
                F.when(
                    rel.between(0, 6) & (F.col("event_type") == "error"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("c1"),
            F.sum(
                F.when(
                    rel.between(7, 13) & (F.col("event_type") == "error"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("c2"),
        )
    )
    # Empty-week guard (q330/q372 class, extended r12): c1 or c2 == 0
    # zeroes a 1/c divisor (Spark ANSI raises; DuckDB yields inf) and
    # LN(0) is NULL in Spark vs -inf in DuckDB — NULL z in both.
    z = F.when(
        (F.col("c1") > 0) & (F.col("c2") > 0),
        F.round(
            (
                F.log(F.col("c2").cast("double"))
                - F.log(F.col("c1").cast("double"))
            )
            / F.sqrt(1.0 / F.col("c1") + 1.0 / F.col("c2")),
            4,
        ),
    )
    return c.select(
        F.col("c1").alias("errors_week1"),
        F.col("c2").alias("errors_week2"),
        F.round(F.col("c1").cast("double") / 7, 4).alias("rate1_per_day"),
        F.round(F.col("c2").cast("double") / 7, 4).alias("rate2_per_day"),
        F.when(
            F.col("c1") > 0,
            dratio_round(F.col("c2").cast(DECZ), F.col("c1").cast(DECZ)),
        ).alias("rate_ratio"),
        z.alias("z_score"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("int").alias("significant"),
    ).orderBy("errors_week1")


@register(
    "q395",
    oracle=f"""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d0
      FROM events
    ),
    w1 AS (
      SELECT DISTINCT user_id FROM events, b
      WHERE date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) - b.d0
            BETWEEN 0 AND 9
    ),
    w2 AS (
      SELECT DISTINCT user_id FROM events, b
      WHERE date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) - b.d0
            BETWEEN 10 AND 19
    ),
    s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w1) AS m,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM w2) AS c,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM w1 JOIN w2 USING (user_id)) AS r,
             (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
              FROM events) AS observed_total
    )
    SELECT m AS captured_w1, c AS captured_w2, r AS recaptured,
           observed_total,
           {sql_dratio_round('(m + 1) * (c + 1) - (r + 1)', 'r + 1', 2)}
             AS n_hat,
           ROUND((m + 1.0) * (c + 1.0) / (r + 1.0) - 1
                 - 1.96 * sqrt((m + 1.0) * (c + 1.0) * (m - r)
                               * (c - r)
                               / ((r + 1.0) * (r + 1.0) * (r + 2.0))),
                 2) AS ci_lo,
           ROUND((m + 1.0) * (c + 1.0) / (r + 1.0) - 1
                 + 1.96 * sqrt((m + 1.0) * (c + 1.0) * (m - r)
                               * (c - r)
                               / ((r + 1.0) * (r + 1.0) * (r + 2.0))),
                 2) AS ci_hi
    FROM s ORDER BY captured_w1
    """,
    doc="Capture-recapture (Chapman-corrected Lincoln-Petersen) estimate "
    "of the true user population from two observation windows (days "
    "0-9 vs 10-19) — the ecology estimator data teams reuse to "
    "answer 'how many users/entities exist that we have NOT yet "
    "observed' (dedup-coverage and entity-resolution completeness "
    "audits); the observed lifetime distinct count rides along as "
    "the validation column. Chapman's +1 correction keeps the "
    "estimator finite and near-unbiased at small recapture counts; "
    "the CI uses the standard Seber variance. Scale shape: two "
    "distinct-user folds, one semi-join for the recapture count, "
    "closed form on one row.",
)
@plan_cache
def q395(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    b = ev.agg(F.min(day).alias("d0"))
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # w1/w2 each feed a capture count AND the recapture join, and rel
    # feeds both window filters — 9 events scans in one plan without
    # materialization (scan-dup probe).
    rel = _managed_persist(
        "q395_rel",
        ev.select("user_id", day.alias("dd"))
        .crossJoin(F.broadcast(b))
        .select("user_id", (F.col("dd") - F.col("d0")).alias("rd")),
    )
    w1 = _managed_persist(
        "q395_w1",
        rel.where(F.col("rd").between(0, 9)).select("user_id").distinct(),
    )
    w2 = _managed_persist(
        "q395_w2",
        rel.where(F.col("rd").between(10, 19)).select("user_id").distinct(),
    )
    s = (
        w1.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .crossJoin(w2.agg(F.count(F.lit(1)).cast("bigint").alias("c")))
        .crossJoin(
            w1.join(w2, "user_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("r")
            )
        )
        .crossJoin(
            ev.agg(
                F.countDistinct("user_id").cast("bigint").alias(
                    "observed_total"
                )
            )
        )
    )
    m, c, r = F.col("m"), F.col("c"), F.col("r")
    n_hat = (m + 1.0) * (c + 1.0) / (r + 1.0) - 1
    se = F.sqrt(
        (m + 1.0)
        * (c + 1.0)
        * (m - r)
        * (c - r)
        / ((r + 1.0) * (r + 1.0) * (r + 2.0))
    )
    return s.select(
        m.alias("captured_w1"),
        c.alias("captured_w2"),
        r.alias("recaptured"),
        "observed_total",
        dratio_round(
            ((m + 1) * (c + 1) - (r + 1)).cast(DECZ),
            (r + 1).cast(DECZ),
            2,
        ).alias("n_hat"),
        F.round(n_hat - 1.96 * se, 2).alias("ci_lo"),
        F.round(n_hat + 1.96 * se, 2).alias("ci_hi"),
    ).orderBy("captured_w1")


def _q398_oracle() -> str:
    """Unrolled 8-step absorption SQL for the removal-effect chain,
    generated so every step is the IDENTICAL expression tree the Spark
    plan evaluates (round(8) per step, exact-DECIMAL folds)."""
    head = """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    raw AS (
      SELECT event_type AS f,
             CASE WHEN nxt IS NULL THEN 'NULL'
                  WHEN nxt = 'purchase' THEN 'CONV' ELSE nxt END AS t
      FROM seq WHERE event_type <> 'purchase'
      UNION ALL
      SELECT 'START' AS f,
             CASE WHEN event_type = 'purchase' THEN 'CONV'
                  ELSE event_type END AS t
      FROM seq WHERE rn = 1
    ),
    cnts AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c
             FROM raw GROUP BY 1, 2),
    fsum AS (SELECT f, CAST(SUM(c) AS BIGINT) AS tot
             FROM cnts GROUP BY 1),
    tp AS (
      SELECT cnts.f, cnts.t,
             CAST(SIGN(cnts.c) AS DOUBLE) * CAST(SIGN(fsum.tot) AS DOUBLE) * CAST((2*1000000*CAST(ABS(cnts.c) AS HUGEINT) + CAST(ABS(fsum.tot) AS HUGEINT)) // (2*CAST(ABS(fsum.tot) AS HUGEINT)) AS DOUBLE) / 1000000.0 AS p
      FROM cnts JOIN fsum ON fsum.f = cnts.f
    ),
    rms AS (SELECT rm FROM (VALUES ('none'), ('click'), ('error'),
                            ('signup'), ('view')) v(rm)),
    trm AS (
      SELECT r.rm, f,
             CASE WHEN t = r.rm THEN 'NULL' ELSE t END AS t2,
             CAST(SUM(CAST(p AS DECIMAL(30,10))) AS DOUBLE) AS p
      FROM tp CROSS JOIN rms r
      WHERE f <> r.rm
      GROUP BY 1, 2, 3
    ),
    v1 AS (
      SELECT rm, f AS s,
             ROUND(CAST(SUM(CAST(p * (CASE WHEN t2 = 'CONV' THEN 1.0
                                       ELSE 0.0 END)
                                 AS DECIMAL(30,10))) AS DOUBLE), 8) AS val
      FROM trm GROUP BY 1, 2
    )"""
    steps = []
    for k in range(2, 9):
        steps.append(f""",
    v{k} AS (
      SELECT m.rm, m.f AS s,
             ROUND(CAST(SUM(CAST(m.p
               * (CASE WHEN m.t2 = 'CONV' THEN 1.0
                       WHEN m.t2 = 'NULL' THEN 0.0
                       ELSE COALESCE(pv.val, 0.0) END)
               AS DECIMAL(30,10))) AS DOUBLE), 8) AS val
      FROM trm m LEFT JOIN v{k - 1} pv
        ON pv.rm = m.rm AND pv.s = m.t2
      GROUP BY 1, 2
    )""")
    tail = """,
    base AS (SELECT val AS bc FROM v8 WHERE rm = 'none' AND s = 'START'),
    re AS (
      SELECT v.rm AS channel,
             GREATEST(0.0, ROUND(1 - v.val / b.bc, 6)) AS re
      FROM v8 v, base b WHERE v.rm <> 'none' AND v.s = 'START'
    ),
    tot AS (SELECT CAST(SUM(CAST(re AS DECIMAL(30,10))) AS DOUBLE) AS tre
            FROM re)
    SELECT channel, re AS removal_effect,
           ROUND(re / tre, 4) AS attribution_share,
           (SELECT ROUND(bc, 6) FROM base) AS base_conv
    FROM re, tot ORDER BY channel"""
    return head + "".join(steps) + tail


@register(
    "q398",
    oracle=_q398_oracle(),
    doc="Markov removal-effect attribution — the data-driven multi-touch "
    "model next to q216 (last-touch), q258 (U-shaped) and q268 "
    "(time-decay), and the only one that prices a channel by what "
    "conversions would be LOST without it: a first-order journey "
    "chain (START, 4 channel states, CONV/NULL absorbing; "
    "transitions from one user-ordered lag pass), conversion "
    "probability evaluated as 8 unrolled absorption steps, and each "
    "channel's removal chain redirecting its inbound mass to NULL "
    "(Anderl et al.'s framework). Determinism: transition probs "
    "round(6), each absorption step rounds to 8 through exact-"
    "DECIMAL folds, removal effects clamp at 0 before the share "
    "normalization. Scale shape: ONE user-partitioned lag window "
    "over the fact table folds to a <=|states|^2 count frame; the "
    "5-removal fan-out and all 8 steps run on broadcast-tiny "
    "frames (the transition frame localCheckpoints first — the "
    "q118 rule — so the event scan runs once, not per step).",
)
@plan_cache
def q398(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    pair = seq.where(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("f"),
        F.when(F.col("nxt").isNull(), "NULL")
        .when(F.col("nxt") == "purchase", "CONV")
        .otherwise(F.col("nxt"))
        .alias("t"),
    )
    first = seq.where(F.col("rn") == 1).select(
        F.lit("START").alias("f"),
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("t"),
    )
    cnts = pair.unionAll(first).groupBy("f", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    fsum = cnts.groupBy(F.col("f").alias("f2")).agg(
        F.sum("c").cast("bigint").alias("tot")
    )
    tp = cnts.join(F.broadcast(fsum), F.col("f") == F.col("f2")).select(
        "f",
        "t",
        dratio_round(F.col("c").cast(DECZ), F.col("tot").cast(DECZ), 6).alias(
            "p"
        ),
    )
    rms = spark.createDataFrame(
        [("none",), ("click",), ("error",), ("signup",), ("view",)], ["rm"]
    )
    trm = (
        tp.crossJoin(F.broadcast(rms))
        .where(F.col("f") != F.col("rm"))
        .groupBy(
            "rm",
            "f",
            F.when(F.col("t") == F.col("rm"), "NULL")
            .otherwise(F.col("t"))
            .alias("t2"),
        )
        .agg(F.sum(F.col("p").cast(DEC)).cast("double").alias("p"))
        .localCheckpoint()
    )
    v = trm.groupBy("rm", F.col("f").alias("s")).agg(
        F.round(
            F.sum(
                (
                    F.col("p")
                    * F.when(F.col("t2") == "CONV", 1.0).otherwise(0.0)
                ).cast(DEC)
            ).cast("double"),
            8,
        ).alias("val")
    ).localCheckpoint()
    for _ in range(2, 9):
        pv = v.select(
            F.col("rm").alias("prm"),
            F.col("s").alias("ps"),
            F.col("val").alias("pval"),
        )
        v = (
            trm.join(
                pv,
                (F.col("prm") == F.col("rm")) & (F.col("ps") == F.col("t2")),
                "left",
            )
            .groupBy("rm", F.col("f").alias("s"))
            .agg(
                F.round(
                    F.sum(
                        (
                            F.col("p")
                            * F.when(F.col("t2") == "CONV", 1.0)
                            .when(F.col("t2") == "NULL", 0.0)
                            .otherwise(F.coalesce(F.col("pval"), F.lit(0.0)))
                        ).cast(DEC)
                    ).cast("double"),
                    8,
                ).alias("val")
            )
            .localCheckpoint()
        )
    base = v.where((F.col("rm") == "none") & (F.col("s") == "START")).select(
        F.col("val").alias("bc")
    )
    re = (
        v.where((F.col("rm") != "none") & (F.col("s") == "START"))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("rm").alias("channel"),
            F.greatest(
                F.lit(0.0), F.round(1 - F.col("val") / F.col("bc"), 6)
            ).alias("re"),
            F.round(F.col("bc"), 6).alias("base_conv"),
        )
    )
    tot = re.agg(
        F.sum(F.col("re").cast(DEC)).cast("double").alias("tre")
    )
    return (
        re.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("re").alias("removal_effect"),
            F.round(F.col("re") / F.col("tre"), 4).alias("attribution_share"),
            "base_conv",
        )
        .orderBy("channel")
    )


@register(
    "q399",
    oracle="""
    WITH pm AS (
      SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 100
                  + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS month_id,
             l.l_partkey,
             ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,10)))
                        AS DOUBLE)
                   / CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,10)))
                          AS DOUBLE), 6) AS price,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,10))) AS DOUBLE)
               AS qty
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    b0 AS (SELECT MIN(month_id) AS m0 FROM pm),
    base AS (
      SELECT l_partkey, price AS p0, qty AS q0
      FROM pm, b0 WHERE month_id = m0
    ),
    j AS (
      SELECT pm.month_id, pm.price AS p1, pm.qty AS q1, b.p0, b.q0
      FROM pm JOIN base b ON b.l_partkey = pm.l_partkey
    )
    SELECT month_id,
           CAST(COUNT(*) AS BIGINT) AS n_common_parts,
           ROUND(CAST(SUM(CAST(p1 * q0 AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(SUM(CAST(p0 * q0 AS DECIMAL(30,10))) AS DOUBLE),
                 4) AS laspeyres,
           ROUND(CAST(SUM(CAST(p1 * q1 AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(SUM(CAST(p0 * q1 AS DECIMAL(30,10))) AS DOUBLE),
                 4) AS paasche,
           ROUND(sqrt(
             (CAST(SUM(CAST(p1 * q0 AS DECIMAL(30,10))) AS DOUBLE)
              / CAST(SUM(CAST(p0 * q0 AS DECIMAL(30,10))) AS DOUBLE))
             * (CAST(SUM(CAST(p1 * q1 AS DECIMAL(30,10))) AS DOUBLE)
                / CAST(SUM(CAST(p0 * q1 AS DECIMAL(30,10))) AS DOUBLE))),
             4) AS fisher
    FROM j GROUP BY month_id ORDER BY month_id
    """,
    doc="Chained price-index family per month against the first month's "
    "basket: Laspeyres (base-weighted), Paasche (current-weighted) "
    "and Fisher (their geometric mean, the 'ideal' index) over parts "
    "traded in BOTH periods — the macro-style inflation readout of "
    "the catalog that q276's price/volume/mix bridge decomposes "
    "period-to-period but never levels into an index series. "
    "Determinism: per-(month, part) unit prices round(6) through "
    "exact-DECIMAL spend/qty folds BEFORE any cross-period product; "
    "index numerators/denominators are DECIMAL folds of identical "
    "doubles. Scale shape: one (month, part) partial+final fold "
    "over the fact join, the base-month slice broadcast to the "
    "period join, |months|-row output.",
)
@plan_cache
def q399(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    pm = _managed_persist(
        "q399_pm",
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            (F.year("od") * 100 + F.month("od"))
            .cast("bigint")
            .alias("month_id"),
            "l_partkey",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / F.sum(F.col("l_quantity").cast(DEC)).cast("double"),
                6,
            ).alias("price"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
        ),
    )
    b0 = pm.agg(F.min("month_id").alias("m0"))
    base = (
        pm.crossJoin(F.broadcast(b0))
        .where(F.col("month_id") == F.col("m0"))
        .select(
            F.col("l_partkey").alias("bk"),
            F.col("price").alias("p0"),
            F.col("qty").alias("q0"),
        )
    )
    j = pm.join(F.broadcast(base), F.col("l_partkey") == F.col("bk")).select(
        "month_id",
        F.col("price").alias("p1"),
        F.col("qty").alias("q1"),
        "p0",
        "q0",
    )
    lnum = F.sum((F.col("p1") * F.col("q0")).cast(DEC)).cast("double")
    lden = F.sum((F.col("p0") * F.col("q0")).cast(DEC)).cast("double")
    pnum = F.sum((F.col("p1") * F.col("q1")).cast(DEC)).cast("double")
    pden = F.sum((F.col("p0") * F.col("q1")).cast(DEC)).cast("double")
    return (
        j.groupBy("month_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common_parts"),
            F.round(lnum / lden, 4).alias("laspeyres"),
            F.round(pnum / pden, 4).alias("paasche"),
            F.round(F.sqrt((lnum / lden) * (pnum / pden)), 4).alias("fisher"),
        )
        .orderBy("month_id")
    )


@register(
    "q401",
    oracle="""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE))) AS mn,
             MAX(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE))) AS mx
      FROM orders
    ),
    oh AS (
      SELECT CASE WHEN date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE))
                       < b.mn + CAST(FLOOR((b.mx - b.mn) / 2.0) AS BIGINT)
                  THEN 0 ELSE 1 END AS half,
             o_totalprice AS tp, o_orderpriority AS pri, o_custkey AS ck,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS day
      FROM orders, b
    ),
    hs AS (
      SELECT half, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT ck) AS BIGINT) AS dk,
             CAST(COUNT(DISTINCT day) AS BIGINT) AS days,
             CAST(SUM(CAST(tp AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(tp * tp AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             ROUND(quantile_cont(CAST(tp AS DOUBLE), 0.5), 4) AS med
      FROM oh GROUP BY 1
    ),
    w AS (
      SELECT MAX(CASE WHEN half = 0 THEN n END) AS n1,
             MAX(CASE WHEN half = 1 THEN n END) AS n2,
             MAX(CASE WHEN half = 0 THEN dk END) AS d1,
             MAX(CASE WHEN half = 1 THEN dk END) AS d2,
             MAX(CASE WHEN half = 0 THEN days END) AS dy1,
             MAX(CASE WHEN half = 1 THEN days END) AS dy2,
             MAX(CASE WHEN half = 0 THEN sx END) AS sx1,
             MAX(CASE WHEN half = 1 THEN sx END) AS sx2,
             MAX(CASE WHEN half = 0 THEN sxx END) AS sxx1,
             MAX(CASE WHEN half = 1 THEN sxx END) AS sxx2,
             MAX(CASE WHEN half = 0 THEN med END) AS med1,
             MAX(CASE WHEN half = 1 THEN med END) AS med2
      FROM hs
    ),
    pm AS (
      SELECT pri,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS c1,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               AS c2
      FROM oh GROUP BY 1
    ),
    jsd AS (
      SELECT CAST(SUM(CAST(
               (CASE WHEN p1 > 0
                     THEN 0.5 * p1 * LN(p1 / ((p1 + p2) / 2)) ELSE 0 END)
             + (CASE WHEN p2 > 0
                     THEN 0.5 * p2 * LN(p2 / ((p1 + p2) / 2)) ELSE 0 END)
             AS DECIMAL(30,10))) AS DOUBLE) AS v
      FROM (SELECT CASE WHEN (SELECT SUM(c1) FROM pm) <> 0
                        THEN c1 / (SELECT SUM(c1) FROM pm)
                        ELSE NULL END AS p1,
                   CASE WHEN (SELECT SUM(c2) FROM pm) <> 0
                        THEN c2 / (SELECT SUM(c2) FROM pm)
                        ELSE NULL END AS p2
            FROM pm)
    )
    SELECT metric, value FROM (
      SELECT 'custkey_distinct_ratio' AS metric,
             ROUND((CAST(d2 AS DOUBLE) / n2)
                   / (CAST(d1 AS DOUBLE) / n1), 4) AS value FROM w
      UNION ALL
      SELECT 'daily_volume_ratio',
             ROUND((CAST(n2 AS DOUBLE) / dy2)
                   / (CAST(n1 AS DOUBLE) / dy1), 4) FROM w
      UNION ALL
      SELECT 'priority_mix_jsd', ROUND(v, 6) FROM jsd
      UNION ALL
      SELECT 'totalprice_mean_z',
             CASE WHEN n1 > 1 AND n2 > 1
                   AND (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                        + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) <> 0
                  THEN ROUND((sx2 / n2 - sx1 / n1)
                        / sqrt(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                           + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2),
                        4)
                  ELSE NULL END FROM w
      UNION ALL
      SELECT 'totalprice_p50_ratio', ROUND(med2 / med1, 4) FROM w
    ) ORDER BY metric
    """,
    doc="Column-profile drift audit between the two halves of the order "
    "history — the schema-contract monitor that diffs PROFILES over "
    "time where q112 audits one snapshot and q302's PSI tracks one "
    "categorical stream: daily-volume ratio, customer-cardinality "
    "rate ratio, Welch z on the price mean, exact-median ratio, and "
    "Jensen-Shannon divergence of the priority mix — the five "
    "signals a pipeline regression (dropped feed, duplicated load, "
    "mix shift) shows first. Determinism: decimal moment folds, "
    "exact interpolated medians (q47 family), JSD terms as "
    "identical per-row doubles summed in DECIMAL. Scale shape: ONE "
    "labeled pass over the fact table feeds five "
    "cardinality-bounded folds; output is a fixed 5-row report.",
)
@plan_cache
def q401(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    b = o.agg(F.min(day).alias("mn"), F.max(day).alias("mx")).select(
        (F.col("mn") + F.floor((F.col("mx") - F.col("mn")) / 2.0)).alias("c")
    )
    oh = _managed_persist(
        "q401_oh",
        o.select(
            day.alias("day"),
            F.col("o_totalprice").alias("tp"),
            F.col("o_orderpriority").alias("pri"),
            F.col("o_custkey").alias("ck"),
        )
        .crossJoin(F.broadcast(b))
        .select(
            F.when(F.col("day") < F.col("c"), 0).otherwise(1).alias("half"),
            "tp",
            "pri",
            "ck",
            "day",
        ),
    )
    hs = oh.groupBy("half").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("ck").cast("bigint").alias("dk"),
        F.countDistinct("day").cast("bigint").alias("days"),
        F.sum(F.col("tp").cast(DEC)).cast("double").alias("sx"),
        F.sum((F.col("tp") * F.col("tp")).cast(DEC))
        .cast("double")
        .alias("sxx"),
        F.round(F.expr("percentile(CAST(tp AS DOUBLE), 0.5)"), 4).alias(
            "med"
        ),
    )

    def side(h: int, col: str, alias: str):
        return F.max(F.when(F.col("half") == h, F.col(col))).alias(alias)

    w = hs.agg(
        side(0, "n", "n1"), side(1, "n", "n2"),
        side(0, "dk", "d1"), side(1, "dk", "d2"),
        side(0, "days", "dy1"), side(1, "days", "dy2"),
        side(0, "sx", "sx1"), side(1, "sx", "sx2"),
        side(0, "sxx", "sxx1"), side(1, "sxx", "sxx2"),
        side(0, "med", "med1"), side(1, "med", "med2"),
    )
    pm = oh.groupBy("pri").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("double")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("double")
        .alias("c2"),
    )
    tots = pm.agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    # Empty-half guard (q330/q372 class, extended r12): an empty half
    # zeroes its mix total — Spark ANSI raises on 0/0 where DuckDB
    # yields NaN; NULL probabilities cascade to a NULL JSD in both.
    probs = pm.crossJoin(F.broadcast(tots)).select(
        F.when(F.col("t1") != 0, F.col("c1") / F.col("t1")).alias("p1"),
        F.when(F.col("t2") != 0, F.col("c2") / F.col("t2")).alias("p2"),
    )
    mmix = (F.col("p1") + F.col("p2")) / 2
    jsd = probs.agg(
        F.sum(
            (
                F.when(
                    F.col("p1") > 0,
                    0.5 * F.col("p1") * F.log(F.col("p1") / mmix),
                ).otherwise(0.0)
                + F.when(
                    F.col("p2") > 0,
                    0.5 * F.col("p2") * F.log(F.col("p2") / mmix),
                ).otherwise(0.0)
            ).cast(DEC)
        )
        .cast("double")
        .alias("v")
    )
    n1, n2 = F.col("n1"), F.col("n2")
    rows = [
        w.select(
            F.lit("custkey_distinct_ratio").alias("metric"),
            F.round(
                (F.col("d2").cast("double") / n2)
                / (F.col("d1").cast("double") / n1),
                4,
            ).alias("value"),
        ),
        w.select(
            F.lit("daily_volume_ratio").alias("metric"),
            F.round(
                (n2.cast("double") / F.col("dy2"))
                / (n1.cast("double") / F.col("dy1")),
                4,
            ).alias("value"),
        ),
        jsd.select(
            F.lit("priority_mix_jsd").alias("metric"),
            F.round(F.col("v"), 6).alias("value"),
        ),
        w.select(
            F.lit("totalprice_mean_z").alias("metric"),
            # Singleton/constant-half guard (NESTED per the r12 advice):
            # Spark does not contractually short-circuit And, so the
            # dividing variance conjunct lives one F.when deeper —
            # CaseWhen guarantees the inner predicate (which divides by
            # n-1 and n) only evaluates once both n1,n2 > 1 held.
            F.when(
                (n1 > 1) & (n2 > 1),
                F.when(
                    (
                        (F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1)
                        / (n1 - 1)
                    )
                    / n1
                    + (
                        (F.col("sxx2") - F.col("sx2") * F.col("sx2") / n2)
                        / (n2 - 1)
                    )
                    / n2
                    != 0,
                    F.round(
                        (F.col("sx2") / n2 - F.col("sx1") / n1)
                        / F.sqrt(
                            (
                                (F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1)
                                / (n1 - 1)
                            )
                            / n1
                            + (
                                (F.col("sxx2") - F.col("sx2") * F.col("sx2") / n2)
                                / (n2 - 1)
                            )
                            / n2
                        ),
                        4,
                    ),
                ),
            ).alias("value"),
        ),
        w.select(
            F.lit("totalprice_p50_ratio").alias("metric"),
            F.round(F.col("med2") / F.col("med1"), 4).alias("value"),
        ),
    ]
    res = rows[0]
    for fr in rows[1:]:
        res = res.unionAll(fr)
    return res.orderBy("metric")


@register(
    "q402",
    oracle="""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d0
      FROM events
    ),
    ud AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               - b.d0 AS rd,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events, b GROUP BY 1, 2
    ),
    looks AS (SELECT CAST(k AS BIGINT) AS look
              FROM (VALUES (1), (2), (3), (4)) v(k)),
    arms AS (
      SELECT l.look, u.rd, u.conv,
             CASE WHEN (u.user_id % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm
      FROM ud u JOIN looks l ON u.rd < l.look * 7
    ),
    cum AS (
      SELECT look, arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS c
      FROM arms GROUP BY 1, 2
    ),
    z AS (
      SELECT a.look, a.n AS n_a, b2.n AS n_b,
             CASE WHEN a.c + b2.c > 0 AND a.c + b2.c < a.n + b2.n
                  THEN ROUND((CAST(a.c AS DOUBLE) / a.n
                         - CAST(b2.c AS DOUBLE) / b2.n)
                        / sqrt((CAST(a.c + b2.c AS DOUBLE) / (a.n + b2.n))
                               * (1 - CAST(a.c + b2.c AS DOUBLE)
                                      / (a.n + b2.n))
                               * (1.0 / a.n + 1.0 / b2.n)), 4)
                  ELSE NULL END AS z
      FROM (SELECT * FROM cum WHERE arm = 'A') a
      JOIN (SELECT * FROM cum WHERE arm = 'B') b2 ON b2.look = a.look
    )
    SELECT look, look * 7 - 1 AS through_day, n_a, n_b, z,
           ROUND(2.024 * sqrt(4.0 / look), 4) AS obf_boundary,
           CAST(CASE WHEN ABS(z) > ROUND(2.024 * sqrt(4.0 / look), 4)
                THEN 1 ELSE 0 END AS INTEGER) AS crossed
    FROM z ORDER BY look
    """,
    doc="Group-sequential A/B readout with O'Brien-Fleming-style "
    "boundaries: four weekly interim looks at the q242-hash split "
    "(user-day conversion trials), each compared against the "
    "spending-function boundary c·sqrt(K/k) (C = 2.024, the standard "
    "K=4 two-sided-0.05 OBF constant) — the PRINCIPLED way to peek "
    "that q392 shows naive peeking needs: early looks demand ~4 "
    "sigma, the final look spends almost the full alpha. Scale "
    "shape: one user-day fold, a 4-look broadcast fan-out folded to "
    "a 4x2 frame, closed-form z per look; flags compare ROUNDED "
    "values so both engines cut identically.",
)
@plan_cache
def q402(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    b = ev.agg(F.min(day).alias("d0"))
    ud = (
        ev.select("user_id", day.alias("dd"), "event_type")
        .crossJoin(F.broadcast(b))
        .groupBy("user_id", (F.col("dd") - F.col("d0")).alias("rd"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    looks = spark.range(1, 5).select(F.col("id").alias("look"))
    arms = ud.join(
        F.broadcast(looks), F.col("rd") < F.col("look") * 7
    ).select(
        "look",
        "conv",
        F.when(
            (F.col("user_id") % F.lit(2147483648)) * 2654435761 % 100 < 50,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # cum feeds both arm branches — each replayed the look-expansion
    # fold (4 events scans in the plan probe).
    cum = _managed_persist(
        "q402_cum",
        arms.groupBy("look", "arm").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("conv").cast("bigint").alias("c"),
        ),
    )
    a = cum.where(F.col("arm") == "A").select(
        "look", F.col("n").alias("n_a"), F.col("c").alias("ca")
    )
    bb = cum.where(F.col("arm") == "B").select(
        F.col("look").alias("look_b"),
        F.col("n").alias("n_b"),
        F.col("c").alias("cb"),
    )
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    # All-converted / none-converted guard (q330/q372 class, extended
    # r12): pooled p in {0,1} zeroes p(1-p) — Spark ANSI raises where
    # DuckDB yields NaN/inf; NULL z -> crossed 0 in both engines.
    z = F.when(
        (F.col("ca") + F.col("cb") > 0)
        & (F.col("ca") + F.col("cb") < F.col("n_a") + F.col("n_b")),
        F.round(
            (
                F.col("ca").cast("double") / F.col("n_a")
                - F.col("cb").cast("double") / F.col("n_b")
            )
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            4,
        ),
    )
    bound = F.round(2.024 * F.sqrt(4.0 / F.col("look")), 4)
    return (
        a.join(bb, F.col("look_b") == F.col("look"))
        .select(
            "look",
            (F.col("look") * 7 - 1).alias("through_day"),
            "n_a",
            "n_b",
            z.alias("z"),
            bound.alias("obf_boundary"),
            F.when(F.abs(z) > bound, 1).otherwise(0).cast("int").alias(
                "crossed"
            ),
        )
        .orderBy("look")
    )


@register(
    "q403",
    oracle=f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    s1 AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS s
           FROM d GROUP BY 1),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM d),
    p AS (
      SELECT d1.l_partkey AS a, d2.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS supp
      FROM d d1 JOIN d d2
        ON d1.l_orderkey = d2.l_orderkey AND d1.l_partkey < d2.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    rules AS (
      SELECT a AS ante, b AS cons, supp,
             ROUND(CAST(supp * n.nb AS DOUBLE) / (sa.s * sb.s), 4) AS lift
      FROM p JOIN s1 sa ON sa.k = a JOIN s1 sb ON sb.k = b CROSS JOIN n
      UNION ALL
      SELECT b AS ante, a AS cons, supp,
             ROUND(CAST(supp * n.nb AS DOUBLE) / (sa.s * sb.s), 4) AS lift
      FROM p JOIN s1 sa ON sa.k = a JOIN s1 sb ON sb.k = b CROSS JOIN n
    ),
    owned AS (
      SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE (o_custkey % 2147483648) * 2654435761 % 100 < 1
    ),
    cand AS (
      SELECT ck, cons AS rec, MAX(lift) AS lift, MAX(supp) AS supp
      FROM owned JOIN rules ON pk = ante
      WHERE NOT EXISTS (SELECT 1 FROM owned o2
                        WHERE o2.ck = owned.ck AND o2.pk = cons)
      GROUP BY 1, 2
    ),
    recs AS (
      SELECT ck, rec FROM (
        SELECT ck, rec, supp,
               ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY lift DESC, supp DESC, rec)
                 AS rnk
        FROM cand) WHERE rnk <= 3
    ),
    rc AS (SELECT rec, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM recs GROUP BY 1),
    rtot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nr,
                    CAST(COUNT(*) AS BIGINT) AS dp FROM rc),
    ent AS (
      SELECT CAST(SUM(CAST(-(CAST(cnt AS DOUBLE) / t.nr)
                           * LN(CAST(cnt AS DOUBLE) / t.nr)
                           AS DECIMAL(30,10))) AS DOUBLE) AS h
      FROM rc, rtot t
    ),
    top10 AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS tc FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, rec) AS rn
        FROM rc) WHERE rn <= 10
    ),
    pop AS (
      SELECT CAST(SUM(CAST(r.cnt * s1.s AS DECIMAL(30,10))) AS DOUBLE)
               / (SELECT nr FROM rtot) AS rec_pop,
             (SELECT CAST(SUM(CAST(s AS DECIMAL(30,10))) AS DOUBLE)
                     / COUNT(*) FROM s1) AS cat_pop
      FROM rc r JOIN s1 ON s1.k = r.rec
    ),
    cat AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM part)
    SELECT (SELECT CAST(COUNT(DISTINCT ck) AS BIGINT) FROM recs)
             AS n_users,
           t.nr AS n_recs, t.dp AS distinct_parts,
           {sql_dratio_round('t.dp', 'c.np')} AS catalog_coverage,
           ROUND(EXP(e.h), 2) AS effective_catalog,
           {sql_dratio_round('tt.tc', 't.nr')} AS top10_share,
           ROUND(p2.rec_pop / p2.cat_pop, 4) AS popularity_bias
    FROM rtot t, ent e, top10 tt, pop p2, cat c
    ORDER BY n_users
    """,
    doc="Recommendation coverage/diversity audit over q291's "
    "next-best-offer table — the serving-quality counterpart to "
    "q353's accuracy backtest (accuracy alone rewards recommending "
    "bestsellers to everyone): catalog coverage, effective catalog "
    "size exp(H) of the recommendation distribution, top-10-item "
    "concentration, and popularity bias (mean basket-support of "
    "recommended parts vs the catalog mean, >1 = popular-skewed). "
    "Scale shape: composes q291's pipeline (persisted rules, "
    "broadcast joins), then folds the rec table to per-part counts "
    "— every audit stat runs on |recommended parts| rows.",
)
@plan_cache
def q403(spark: SparkSession, sf_dir: str) -> DataFrame:
    recs = q291(spark, sf_dir).select("custkey", "rec_part").localCheckpoint()
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    s1 = d.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    rc = recs.groupBy(F.col("rec_part").alias("rec")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    rtot = rc.agg(
        F.sum("cnt").cast("bigint").alias("nr"),
        F.count(F.lit(1)).cast("bigint").alias("dp"),
    )
    ent = (
        rc.crossJoin(F.broadcast(rtot))
        .agg(
            F.sum(
                (
                    -(F.col("cnt").cast("double") / F.col("nr"))
                    * F.log(F.col("cnt").cast("double") / F.col("nr"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("h")
        )
    )
    top10 = (
        rc.orderBy(F.col("cnt").desc(), "rec")
        .limit(10)
        .agg(F.sum("cnt").cast("bigint").alias("tc"))
    )
    rec_pop = (
        rc.join(F.broadcast(s1), F.col("rec") == F.col("k"))
        .crossJoin(F.broadcast(rtot))
        .agg(
            (
                F.sum((F.col("cnt") * F.col("s")).cast(DEC)).cast("double")
                / F.max("nr")
            ).alias("rec_pop")
        )
    )
    cat_pop = s1.agg(
        (F.sum(F.col("s").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "cat_pop"
        )
    )
    nu = recs.agg(
        F.countDistinct("custkey").cast("bigint").alias("n_users")
    )
    cat = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).cast("bigint").alias("np")
    )
    return (
        nu.crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ent))
        .crossJoin(F.broadcast(top10))
        .crossJoin(F.broadcast(rec_pop))
        .crossJoin(F.broadcast(cat_pop))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_users",
            F.col("nr").alias("n_recs"),
            F.col("dp").alias("distinct_parts"),
            dratio_round(
                F.col("dp").cast(DECZ), F.col("np").cast(DECZ)
            ).alias("catalog_coverage"),
            F.round(F.exp(F.col("h")), 2).alias("effective_catalog"),
            dratio_round(
                F.col("tc").cast(DECZ), F.col("nr").cast(DECZ)
            ).alias("top10_share"),
            F.round(F.col("rec_pop") / F.col("cat_pop"), 4).alias(
                "popularity_bias"
            ),
        )
        .orderBy("n_users")
    )


@register(
    "q404",
    oracle="""
    WITH src AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders),
    bk AS (
      SELECT CAST(FLOOR(LN(v) / LN(1.1)) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM src GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bk),
    cum AS (
      SELECT b.bucket, CAST(SUM(p.c) AS BIGINT) AS r
      FROM bk b JOIN bk p ON p.bucket <= b.bucket
      GROUP BY 1
    ),
    qs AS (SELECT q FROM (VALUES (0.5), (0.9), (0.99)) v(q)),
    ranks AS (
      SELECT q, CAST(FLOOR(q * (n - 1)) AS BIGINT) + 1 AS rk
      FROM qs, tot
    ),
    est AS (
      SELECT r2.q, MIN(cum.bucket) AS bucket
      FROM ranks r2 JOIN cum ON cum.r >= r2.rk
      GROUP BY 1
    ),
    ex AS (
      SELECT ROUND(quantile_cont(v, 0.50), 4) AS e50,
             ROUND(quantile_cont(v, 0.90), 4) AS e90,
             ROUND(quantile_cont(v, 0.99), 4) AS e99
      FROM src
    )
    SELECT est.q AS quantile,
           ROUND(POW(1.1, est.bucket), 4) AS sketch_est,
           CASE est.q WHEN 0.5 THEN ex.e50 WHEN 0.9 THEN ex.e90
                      ELSE ex.e99 END AS exact_value,
           ROUND(POW(1.1, est.bucket)
                 / (CASE est.q WHEN 0.5 THEN ex.e50
                         WHEN 0.9 THEN ex.e90 ELSE ex.e99 END) - 1,
                 4) AS rel_err,
           CAST(CASE WHEN ABS(ROUND(POW(1.1, est.bucket)
                 / (CASE est.q WHEN 0.5 THEN ex.e50
                         WHEN 0.9 THEN ex.e90 ELSE ex.e99 END) - 1,
                 4)) <= 0.1 THEN 1 ELSE 0 END AS INTEGER)
             AS within_bound
    FROM est, ex ORDER BY quantile
    """,
    doc="HDR-style log-bucketed quantile sketch + error audit (the 5th "
    "mergeable-sketch family after q140 HLL, q111 count-min, q174 "
    "bitmaps and q175 equi-width histograms, and the VARIABLE-RANGE "
    "complement to q175: log base 1.1 buckets give a ~10% relative-"
    "error guarantee at ANY magnitude, where equi-width bins blow up "
    "on heavy tails): bucket counts fold map-side-combinably, each "
    "target quantile reads the first bucket whose cumulative count "
    "reaches floor(q(n-1))+1, and the audit row compares against the "
    "exact interpolated quantile with the guarantee flag. Scale "
    "shape: one integer-bucket fold (|buckets| ~ 70 for this "
    "domain), a triangular join over that tiny frame for the "
    "cumsum, exact quantiles once for the audit column; at 100 TB "
    "only the bucket fold touches the corpus and merges "
    "associatively across executors.",
)
@plan_cache
def q404(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    # The ~70-row bucket fold feeds tot, both sides of the triangular
    # cumsum join, and the rank probe — each re-ran the corpus fold
    # (4 orders scans in the plan probe). Materialize the sketch once;
    # only the exact-quantile audit column still scans the corpus.
    bk = _managed_persist(
        "q404_bk",
        o.groupBy(
            F.floor(F.log("v") / F.log(F.lit(1.1)))
            .cast("bigint")
            .alias("bucket")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("c")),
    )
    tot = bk.agg(F.sum("c").cast("bigint").alias("n"))
    p = bk.select(F.col("bucket").alias("pb"), F.col("c").alias("pc"))
    cum = (
        bk.join(F.broadcast(p), F.col("pb") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(F.sum("pc").cast("bigint").alias("r"))
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q")
    )
    ranks = qs.crossJoin(F.broadcast(tot)).select(
        "q",
        (F.floor(F.col("q") * (F.col("n") - 1)).cast("bigint") + 1).alias(
            "rk"
        ),
    )
    est = (
        ranks.join(F.broadcast(cum), F.col("r") >= F.col("rk"))
        .groupBy("q")
        .agg(F.min("bucket").alias("bucket"))
    )
    ex = o.agg(
        F.round(F.expr("percentile(v, 0.50)"), 4).alias("e50"),
        F.round(F.expr("percentile(v, 0.90)"), 4).alias("e90"),
        F.round(F.expr("percentile(v, 0.99)"), 4).alias("e99"),
    )
    exact = (
        F.when(F.col("q") == 0.5, F.col("e50"))
        .when(F.col("q") == 0.9, F.col("e90"))
        .otherwise(F.col("e99"))
    )
    rel = F.round(F.pow(F.lit(1.1), F.col("bucket")) / exact - 1, 4)
    return (
        est.crossJoin(F.broadcast(ex))
        .select(
            F.col("q").alias("quantile"),
            F.round(F.pow(F.lit(1.1), F.col("bucket")), 4).alias(
                "sketch_est"
            ),
            exact.alias("exact_value"),
            rel.alias("rel_err"),
            F.when(F.abs(rel) <= 0.1, 1).otherwise(0).cast("int").alias(
                "within_bound"
            ),
        )
        .orderBy("quantile")
    )


@register(
    "q406",
    oracle="""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE))) AS d0,
             MAX(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE))) AS d1
      FROM orders
    ),
    daily AS (
      SELECT (date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) - b.d0) // 7 AS wk,
             (date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) - b.d0) % 7 AS dow,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders, b
      WHERE date_diff('day', DATE '1970-01-01',
                      CAST(o_orderdate AS DATE)) - b.d0
            < ((b.d1 - b.d0 + 1) // 7) * 7
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT w.wk, d.dow, COALESCE(daily.rev, 0.0) AS rev
      FROM (SELECT DISTINCT wk FROM daily) w
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS dow FROM range(0, 7)) d
      LEFT JOIN daily ON daily.wk = w.wk AND daily.dow = d.dow
    ),
    st AS (
      SELECT wk,
             CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE) / 7 AS mu,
             sqrt((CAST(SUM(CAST(rev * rev AS DECIMAL(30,10))) AS DOUBLE)
                   - CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE)
                     * CAST(SUM(CAST(rev AS DECIMAL(30,10))) AS DOUBLE)
                     / 7) / 6) AS sd
      FROM grid GROUP BY 1
    ),
    z AS (
      SELECT g.wk, g.dow, ROUND((g.rev - st.mu) / st.sd, 6) AS z
      FROM grid g JOIN st ON st.wk = g.wk WHERE st.sd > 0
    ),
    pairs AS (
      SELECT a.wk AS w1, b2.wk AS w2,
             ROUND(CAST(SUM(CAST((a.z - b2.z) * (a.z - b2.z)
                                 AS DECIMAL(30,10))) AS DOUBLE), 6) AS dist
      FROM z a JOIN z b2 ON b2.dow = a.dow AND b2.wk > a.wk
      GROUP BY 1, 2
    ),
    motif AS (
      SELECT w1, w2, dist FROM pairs
      ORDER BY dist, w1, w2 LIMIT 1
    ),
    nn AS (
      SELECT wk, MIN(dist) AS nn_dist FROM (
        SELECT w1 AS wk, dist FROM pairs
        UNION ALL SELECT w2 AS wk, dist FROM pairs
      ) GROUP BY 1
    ),
    discord AS (
      SELECT wk, nn_dist FROM nn ORDER BY nn_dist DESC, wk LIMIT 1
    )
    SELECT m.w1 AS motif_week_a, m.w2 AS motif_week_b,
           m.dist AS motif_dist,
           d.wk AS discord_week, d.nn_dist AS discord_nn_dist
    FROM motif m, discord d ORDER BY motif_week_a
    """,
    doc="Matrix-profile-lite over the weekly revenue series: z-normalize "
    "each complete calendar week's 7-day shape, compute all pairwise "
    "distances, and report the MOTIF (the two most similar weeks — "
    "the recurring regime) and the DISCORD (the week farthest from "
    "its nearest neighbor — the strongest shape anomaly, which a "
    "point-wise detector like q142/q286 misses when every individual "
    "day is in range but the WEEK's profile is wrong). Keogh's "
    "matrix-profile primitive restricted to non-overlapping calendar "
    "windows. Determinism: zero-filled day grid, per-week z round(6) "
    "through decimal folds, pair distances decimal-summed and "
    "rounded before the ordered-limit argmin/argmax. Scale shape: "
    "the fact table folds to a CALENDAR-bounded (week, dow) frame — "
    "series length is fixed by the date range, not the corpus — so "
    "the |weeks|^2/2 pair fold (~59k pairs here) costs the same at "
    "100 TB; the dow-keyed join broadcasts one tiny side.",
)
@plan_cache
def q406(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    b = o.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    rel = o.select(day.alias("dd"), "o_totalprice").crossJoin(
        F.broadcast(b)
    ).select(
        (F.col("dd") - F.col("d0")).alias("rd"),
        "o_totalprice",
        (((F.col("d1") - F.col("d0") + 1) / 7).cast("bigint") * 7).alias(
            "cap"
        ),
    )
    daily = (
        rel.where(F.col("rd") < F.col("cap"))
        .groupBy(
            F.expr("rd DIV 7").alias("wk"), F.expr("rd % 7").alias("dow")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("rev")
        )
    )
    wks = daily.select("wk").distinct()
    dows = spark.range(0, 7).select(F.col("id").alias("dow"))
    grid = (
        wks.crossJoin(F.broadcast(dows))
        .join(daily, ["wk", "dow"], "left")
        .select("wk", "dow", F.coalesce(F.col("rev"), F.lit(0.0)).alias("rev"))
    )
    st = grid.groupBy("wk").agg(
        (F.sum(F.col("rev").cast(DEC)).cast("double") / 7).alias("mu"),
        F.sqrt(
            (
                F.sum((F.col("rev") * F.col("rev")).cast(DEC)).cast("double")
                - F.sum(F.col("rev").cast(DEC)).cast("double")
                * F.sum(F.col("rev").cast(DEC)).cast("double")
                / 7
            )
            / 6
        ).alias("sd"),
    )
    z = (
        grid.join(st, "wk")
        .where(F.col("sd") > 0)
        .select(
            "wk", "dow", F.round((F.col("rev") - F.col("mu")) / F.col("sd"), 6).alias("z")
        )
        .localCheckpoint()
    )
    z2 = z.select(
        F.col("wk").alias("w2"), F.col("dow").alias("dow2"), F.col("z").alias("zb")
    )
    pairs = (
        z.join(
            F.broadcast(z2),
            (F.col("dow2") == F.col("dow")) & (F.col("w2") > F.col("wk")),
        )
        .groupBy(F.col("wk").alias("w1"), "w2")
        .agg(
            F.round(
                F.sum(
                    ((F.col("z") - F.col("zb")) * (F.col("z") - F.col("zb"))).cast(
                        DEC
                    )
                ).cast("double"),
                6,
            ).alias("dist")
        )
        .localCheckpoint()
    )
    motif = pairs.orderBy("dist", "w1", "w2").limit(1)
    nn = (
        pairs.select(F.col("w1").alias("wk"), "dist")
        .unionAll(pairs.select(F.col("w2").alias("wk"), "dist"))
        .groupBy("wk")
        .agg(F.min("dist").alias("nn_dist"))
    )
    discord = nn.orderBy(F.col("nn_dist").desc(), "wk").limit(1)
    return (
        motif.select(
            F.col("w1").alias("motif_week_a"),
            F.col("w2").alias("motif_week_b"),
            F.col("dist").alias("motif_dist"),
        )
        .crossJoin(
            F.broadcast(
                discord.select(
                    F.col("wk").alias("discord_week"),
                    F.col("nn_dist").alias("discord_nn_dist"),
                )
            )
        )
        .orderBy("motif_week_a")
    )


@register(
    "q407",
    oracle="""
    WITH pm AS (
      SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 100
                  + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS month_id,
             l.l_partkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,10)))
                  AS DOUBLE) AS rev
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    mm AS (SELECT MAX(month_id) AS m_last FROM pm),
    mp AS (SELECT MAX(month_id) AS m_prev FROM pm, mm
           WHERE month_id < m_last),
    rk AS (
      SELECT month_id, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY month_id
                                ORDER BY rev DESC, l_partkey) AS rnk
      FROM pm, mm, mp WHERE month_id IN (m_last, m_prev)
    ),
    j AS (
      SELECT c.l_partkey AS partkey,
             CAST(p.rnk AS BIGINT) AS rank_prev,
             CAST(c.rnk AS BIGINT) AS rank_curr,
             CAST(p.rnk - c.rnk AS BIGINT) AS delta
      FROM rk c JOIN rk p ON p.l_partkey = c.l_partkey, mm, mp
      WHERE c.month_id = m_last AND p.month_id = m_prev
    )
    SELECT direction, partkey, rank_prev, rank_curr, delta FROM (
      SELECT 'riser' AS direction, * FROM
        (SELECT * FROM j ORDER BY delta DESC, partkey LIMIT 10)
      UNION ALL
      SELECT 'faller' AS direction, * FROM
        (SELECT * FROM j ORDER BY delta ASC, partkey LIMIT 10)
    ) ORDER BY direction, partkey
    """,
    doc="Top-movers report: the 10 biggest revenue-rank risers and "
    "fallers among parts traded in BOTH of the two most recent "
    "months — the month-over-month 'what changed' BI staple that "
    "q222's period-over-period totals and q167's static ABC classes "
    "don't surface (a part can grow in absolute terms and still "
    "fall 50 ranks). Determinism: ranks are row_numbers over "
    "(exact-decimal revenue DESC, partkey) so ties and the top-10 "
    "cuts are engine-identical. Scale shape: one (month, part) "
    "partial+final fold; ranking windows partition per month; the "
    "two month slices join on partkey and the top-10 cuts are "
    "ordered limits (no global window).",
)
@plan_cache
def q407(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    pm = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            (F.year("od") * 100 + F.month("od"))
            .cast("bigint")
            .alias("month_id"),
            "l_partkey",
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("double")
            .alias("rev")
        )
        .localCheckpoint()
    )
    mm = pm.agg(F.max("month_id").alias("m_last"))
    mp = (
        pm.crossJoin(F.broadcast(mm))
        .where(F.col("month_id") < F.col("m_last"))
        .agg(F.max("month_id").alias("m_prev"))
    )
    wr = Window.partitionBy("month_id").orderBy(
        F.col("rev").desc(), "l_partkey"
    )
    rk = (
        pm.crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(mp))
        .where(
            (F.col("month_id") == F.col("m_last"))
            | (F.col("month_id") == F.col("m_prev"))
        )
        .withColumn("rnk", F.row_number().over(wr))
    )
    c = rk.where(F.col("month_id") == F.col("m_last")).select(
        F.col("l_partkey").alias("partkey"), F.col("rnk").alias("rank_curr")
    )
    p = rk.where(F.col("month_id") == F.col("m_prev")).select(
        F.col("l_partkey").alias("pk2"), F.col("rnk").alias("rank_prev")
    )
    j = (
        c.join(p, F.col("pk2") == F.col("partkey"))
        .select(
            "partkey",
            F.col("rank_prev").cast("bigint").alias("rank_prev"),
            F.col("rank_curr").cast("bigint").alias("rank_curr"),
            (F.col("rank_prev") - F.col("rank_curr"))
            .cast("bigint")
            .alias("delta"),
        )
        .localCheckpoint()
    )
    risers = (
        j.orderBy(F.col("delta").desc(), "partkey")
        .limit(10)
        .select(F.lit("riser").alias("direction"), "*")
    )
    fallers = (
        j.orderBy(F.col("delta").asc(), "partkey")
        .limit(10)
        .select(F.lit("faller").alias("direction"), "*")
    )
    return risers.unionAll(fallers).orderBy("direction", "partkey")


@register(
    "q408",
    oracle="""
    WITH tr AS (
      SELECT event_type AS state,
             CAST(FLOOR(EPOCH(LEAD(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)))
                  AS BIGINT)
             - CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS gap
      FROM events
    ),
    g AS (SELECT state, gap FROM tr WHERE gap IS NOT NULL)
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_dwells,
           ROUND(CAST(SUM(CAST(gap AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(*), 2) AS mean_gap_s,
           ROUND(quantile_cont(CAST(gap AS DOUBLE), 0.5), 2)
             AS median_gap_s,
           ROUND(quantile_cont(CAST(gap AS DOUBLE), 0.9), 2)
             AS p90_gap_s
    FROM g GROUP BY state ORDER BY state
    """,
    doc="Semi-Markov state dwell-time profile: per event-type state, "
    "the distribution of time spent before the user's NEXT event "
    "(mean / median / p90 of within-user gaps) — the HOLDING-TIME "
    "half of the behavior model whose jump chain q257/q349/q387 "
    "already cover (a transition matrix alone can't distinguish a "
    "5-second bounce state from a 5-minute engagement state). "
    "Epoch-second gaps FLOOR'd identically (q289). Scale shape: "
    "one user-partitioned lead window over the fact table, one "
    "|states|-row fold with exact-decimal mean and interpolated "
    "percentiles.",
)
@plan_cache
def q408(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        F.col("event_type").alias("state"),
        (
            F.lead(F.col("ts").cast("long")).over(w)
            - F.col("ts").cast("long")
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    return (
        g.groupBy("state")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dwells"),
            F.round(
                F.sum(F.col("gap").cast(DEC)).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("mean_gap_s"),
            F.round(
                F.expr("percentile(CAST(gap AS DOUBLE), 0.5)"), 2
            ).alias("median_gap_s"),
            F.round(
                F.expr("percentile(CAST(gap AS DOUBLE), 0.9)"), 2
            ).alias("p90_gap_s"),
        )
        .orderBy("state")
    )


def _user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user churn-feature frame (f_freq, f_value_mean,
    f_days_active, engaged label) shared by q409's eta-squared screen
    and q435's stump induction — one events fold, persisted."""
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    return _managed_persist(
        "q409_uf",
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("double").alias("f_freq"),
            F.round(
                (F.sum(F.col("value").cast(DEC)) / F.count(F.lit(1))).cast(
                    "double"
                ),
                6,
            ).alias("f_value_mean"),
            F.countDistinct(F.to_date("ts")).cast("double").alias(
                "f_days_active"
            ),
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("label"),
        ),
    )




@register(
    "q409",
    oracle="""
    WITH uf AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS f_freq,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 6) AS f_value_mean,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS DOUBLE)
               AS f_days_active,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS label
      FROM events GROUP BY 1
    ),
    melted AS (
      SELECT 'f_days_active' AS feature, f_days_active AS x, label
      FROM uf
      UNION ALL
      SELECT 'f_freq', f_freq, label FROM uf
      UNION ALL
      SELECT 'f_value_mean', f_value_mean, label FROM uf
    ),
    gs AS (
      SELECT feature, label, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx
      FROM melted GROUP BY 1, 2
    ),
    tot AS (
      SELECT feature, CAST(COUNT(*) AS BIGINT) AS nt,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sxt,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx
      FROM melted GROUP BY 1
    ),
    ssb AS (
      SELECT g.feature,
             CAST(SUM(CAST(
               g.n * (g.sx / g.n - t.sxt / t.nt)
                   * (g.sx / g.n - t.sxt / t.nt)
               AS DECIMAL(30,10))) AS DOUBLE) AS ssb
      FROM gs g JOIN tot t ON t.feature = g.feature
      GROUP BY 1
    )
    SELECT b.feature,
           CASE WHEN (t.sxx - t.sxt * t.sxt / t.nt) <> 0
                THEN ROUND(b.ssb / (t.sxx - t.sxt * t.sxt / t.nt), 6)
                ELSE NULL END AS eta_sq
    FROM ssb b JOIN tot t ON t.feature = b.feature
    ORDER BY b.feature
    """,
    doc="Univariate feature-importance screen (correlation-ratio "
    "eta-squared): for each candidate churn feature — activity "
    "frequency, mean event value, active days — the share of its "
    "variance explained by the engaged/not-engaged label (binary "
    "groups: eta^2 equals the point-biserial r^2), the classic "
    "FILTER-method triage run before any model training (q308's OLS "
    "and q334's target encoding assume you already chose features). "
    "Determinism: per-user means round(6) through exact-DECIMAL "
    "folds; SSB/SST from decimal sufficient statistics. Scale "
    "shape: one user fold, a 3-way melt of the TINY user-feature "
    "frame, per-(feature, label) partial+final folds — feature "
    "count scales the melt linearly, never the fact scan.",
)
@plan_cache
def q409(spark: SparkSession, sf_dir: str) -> DataFrame:
    uf = _user_features(spark, sf_dir)
    melted = None
    for feat in ["f_days_active", "f_freq", "f_value_mean"]:
        part = uf.select(
            F.lit(feat).alias("feature"),
            F.col(feat).alias("x"),
            "label",
        )
        melted = part if melted is None else melted.unionAll(part)
    gs = melted.groupBy("feature", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
    )
    tot = melted.groupBy(F.col("feature").alias("ft")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sxt"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
    )
    ssb = (
        gs.join(F.broadcast(tot), F.col("feature") == F.col("ft"))
        .groupBy("feature")
        .agg(
            F.sum(
                (
                    F.col("n")
                    * (F.col("sx") / F.col("n") - F.col("sxt") / F.col("nt"))
                    * (F.col("sx") / F.col("n") - F.col("sxt") / F.col("nt"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("ssb"),
        )
    )
    return (
        ssb.join(F.broadcast(tot), F.col("feature") == F.col("ft"))
        .select(
            "feature",
            # Constant-feature guard (q330/q372 class, extended r12):
            # zero total variance zeroes SST — Spark ANSI raises where
            # DuckDB yields NaN; eta^2 undefined, NULL both engines.
            F.when(
                F.col("sxx") - F.col("sxt") * F.col("sxt") / F.col("nt")
                != 0,
                F.round(
                    F.col("ssb")
                    / (
                        F.col("sxx")
                        - F.col("sxt") * F.col("sxt") / F.col("nt")
                    ),
                    6,
                ),
            ).alias("eta_sq"),
        )
        .orderBy("feature")
    )


@register(
    "q410",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hr,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS e,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(e) AS BIGINT) AS ce,
                   CAST(SUM(t) AS BIGINT) AS ct FROM hourly),
    durs AS (SELECT CAST(d AS BIGINT) AS dur
             FROM (VALUES (1), (6), (24), (72)) v(d)),
    wins AS (
      SELECT s.hr AS start_hr, d.dur,
             CAST(SUM(p.e) AS BIGINT) AS c,
             CAST(SUM(p.t) AS BIGINT) AS n
      FROM hourly s
      CROSS JOIN durs d
      JOIN hourly p ON p.hr BETWEEN s.hr AND s.hr + d.dur - 1
      GROUP BY 1, 2
    ),
    llr AS (
      SELECT start_hr, dur, c, n,
             {sql_dratio_round('c', 'n')} AS window_rate,
             ROUND(c * LN((CAST(c AS DOUBLE) / n)
                          / (CAST(ce AS DOUBLE) / ct))
                   + (ce - c) * LN(((CAST(ce AS DOUBLE) - c)
                                    / (ct - n))
                                   / (CAST(ce AS DOUBLE) / ct)), 4)
               AS llr
      FROM wins, tot
      WHERE CAST(c AS DOUBLE) / n > CAST(ce AS DOUBLE) / ct
        AND c < ce AND n < ct
    )
    SELECT start_hr, dur, c AS errors_in_window, window_rate, llr
    FROM llr ORDER BY llr DESC, start_hr, dur LIMIT 5
    """,
    doc="Retrospective scan statistic (Kulldorff-style, 1-D temporal): "
    "over all windows of 1/6/24/72 hours, the Poisson-binomial "
    "likelihood-ratio score for 'error rate inside the window "
    "exceeds the global rate', reporting the top-5 scoring windows "
    "— WHEN the incident was, found after the fact, where q253's "
    "CUSUM and q388's burn rate watch the stream forward; the scan "
    "statistic corrects for trying every window (the max-LLR "
    "form is the multiple-testing-honest burst detector). "
    "Determinism: LLR per window from integer counts in identical "
    "double expressions, round(4), (start, dur) tie-break on the "
    "ordered-limit cut. Scale shape: the fact table folds to the "
    "calendar-bounded hourly frame once; all ~74k (start, dur) "
    "windows come from a band self-join over that tiny frame.",
)
@plan_cache
def q410(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # hourly feeds the global totals, the probe side and the window
    # grid — 3 events scans in one plan without materialization.
    hourly = _managed_persist(
        "q410_hourly",
        ev.groupBy(
            F.floor(F.col("ts").cast("long") / 3600)
            .cast("bigint")
            .alias("hr")
        ).agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("e"),
            F.count(F.lit(1)).cast("bigint").alias("t"),
        ),
    )
    tot = hourly.agg(
        F.sum("e").cast("bigint").alias("ce"),
        F.sum("t").cast("bigint").alias("ct"),
    )
    durs = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(6), F.lit(24), F.lit(72))).alias(
            "d0"
        )
    ).select(F.col("d0").cast("bigint").alias("dur"))
    p = hourly.select(
        F.col("hr").alias("phr"), F.col("e").alias("pe"), F.col("t").alias("pt")
    )
    wins = (
        hourly.select(F.col("hr").alias("start_hr"))
        .crossJoin(F.broadcast(durs))
        .join(
            F.broadcast(p),
            (F.col("phr") >= F.col("start_hr"))
            & (F.col("phr") <= F.col("start_hr") + F.col("dur") - 1),
        )
        .groupBy("start_hr", "dur")
        .agg(
            F.sum("pe").cast("bigint").alias("c"),
            F.sum("pt").cast("bigint").alias("n"),
        )
    )
    c, n, ce, ct = F.col("c"), F.col("n"), F.col("ce"), F.col("ct")
    wr = c.cast("double") / n
    gr = ce.cast("double") / ct
    llr = F.round(
        c * F.log(wr / gr)
        + (ce - c)
        * F.log(((ce.cast("double") - c) / (ct - n)) / gr),
        4,
    )
    return (
        wins.crossJoin(F.broadcast(tot))
        .where((wr > gr) & (c < ce) & (n < ct))
        .select(
            "start_hr",
            "dur",
            c.alias("errors_in_window"),
            dratio_round(c.cast(DECZ), n.cast(DECZ)).alias("window_rate"),
            llr.alias("llr"),
        )
        .orderBy(F.col("llr").desc(), "start_hr", "dur")
        .limit(5)
    )


_Q413_Z = "((mb - ma) / SQRT(va + vb))"


@register(
    "q413",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN (user_id % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING COUNT(*) >= 14
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(conv.user_id) AS BIGINT) AS c
      FROM assign LEFT JOIN conv USING (user_id) GROUP BY arm
    ),
    post AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS na,
        MAX(CASE WHEN arm = 'A' THEN c END) AS ca,
        MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN c END) AS cb
      FROM arms
    ),
    p AS (
      SELECT na, ca, nb, cb,
             (ca + 1.0) / (na + 2.0) AS ma,
             (cb + 1.0) / (nb + 2.0) AS mb,
             (ca + 1.0) * (na - ca + 1.0)
               / ((na + 2.0) * (na + 2.0) * (na + 3.0)) AS va,
             (cb + 1.0) * (nb - cb + 1.0)
               / ((nb + 2.0) * (nb + 2.0) * (nb + 3.0)) AS vb
      FROM post
    )
    SELECT na, ca, nb, cb,
           ROUND(ma, 6) AS posterior_a,
           ROUND(mb, 6) AS posterior_b,
           ROUND({PHI}, 4) AS p_b_beats_a,
           CAST(CASE WHEN ROUND({PHI}, 4) > 0.95 OR
                          ROUND({PHI}, 4) < 0.05
                THEN 1 ELSE 0 END AS INTEGER) AS decisive
    FROM p ORDER BY na
    """.replace("{PHI}", _phi_sql(_Q413_Z)),
    doc="Bayesian A/B readout: Beta(1+c, 1+n-c) posteriors on each "
    "arm's engaged-conversion rate (q242's split and conversion "
    "definition) and P(B > A) via the normal approximation of the "
    "posterior difference — the 'probability B is better' number "
    "stakeholders actually ask for, where q242 answers with a "
    "p-value; decisive at 95% either way. Phi comes from the SAME "
    "shared Abramowitz-Stegun SQL string as q386, so both engines "
    "evaluate one expression tree (the normal approximation is "
    "exact enough at these n that the betainc integral is "
    "unnecessary — documented). Scale shape: one distinct-user "
    "fold + one engaged fold, closed form on a 1-row frame.",
)
@plan_cache
def q413(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        (F.col("user_id") % F.lit(2147483648)) * 2654435761 % 100 < 50, "A"
    ).otherwise("B")
    # r14 dup-scan fix (v2 probe: 2 events scans): distinct users +
    # purchase fold collapse to ONE per-user fold (q242's rewrite) —
    # converted == purchase count >= 14, every user gets a row.
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np")
    )
    arms = per_user.groupBy(arm.alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("np") >= 14, 1)).cast("bigint").alias("c"),
    )
    post = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("c"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("c"))).alias("cb"),
    )
    p = post.select(
        "na",
        "ca",
        "nb",
        "cb",
        ((F.col("ca") + 1.0) / (F.col("na") + 2.0)).alias("ma"),
        ((F.col("cb") + 1.0) / (F.col("nb") + 2.0)).alias("mb"),
        (
            (F.col("ca") + 1.0)
            * (F.col("na") - F.col("ca") + 1.0)
            / ((F.col("na") + 2.0) * (F.col("na") + 2.0) * (F.col("na") + 3.0))
        ).alias("va"),
        (
            (F.col("cb") + 1.0)
            * (F.col("nb") - F.col("cb") + 1.0)
            / ((F.col("nb") + 2.0) * (F.col("nb") + 2.0) * (F.col("nb") + 3.0))
        ).alias("vb"),
    )
    phi = F.expr(_phi_sql(_Q413_Z))
    pr = F.round(phi, 4)
    return p.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.round(F.col("ma"), 6).alias("posterior_a"),
        F.round(F.col("mb"), 6).alias("posterior_b"),
        pr.alias("p_b_beats_a"),
        F.when((pr > 0.95) | (pr < 0.05), 1)
        .otherwise(0)
        .cast("int")
        .alias("decisive"),
    ).orderBy("na")


@register(
    "q414",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(30,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(rev * rev AS DECIMAL(30,10))) AS DOUBLE)
               AS sxx
      FROM daily
    ),
    pairs AS (
      SELECT d1.rev AS x, d2.rev AS y
      FROM daily d1 JOIN daily d2 ON d2.day = d1.day + 1
    ),
    ac AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS px,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS py,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS pxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS pyy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS pxy
      FROM pairs
    ),
    d2 AS (
      SELECT n, sx / n AS mean_rev,
             CASE WHEN n > 1
                  THEN sqrt((sxx - sx * sx / n) / (n - 1))
                  ELSE NULL END AS sd,
             CASE WHEN (np * pxx - px * px)
                       * (np * pyy - py * py) <> 0
                  THEN ROUND((np * pxy - px * py)
                        / sqrt((np * pxx - px * px)
                               * (np * pyy - py * py)), 6)
                  ELSE NULL END AS rho
      FROM s, ac
    ),
    d3 AS (
      SELECT n, mean_rev, sd, rho,
             CASE WHEN (1 + rho) <> 0
                  THEN n * (1 - rho) / (1 + rho)
                  ELSE NULL END AS n_eff
      FROM d2
    )
    SELECT n AS n_days, ROUND(mean_rev, 2) AS mean_rev,
           ROUND(sd, 2) AS sd, rho AS rho1,
           ROUND(n_eff, 2) AS n_eff,
           CASE WHEN n_eff > 0
                THEN ROUND(mean_rev - 1.96 * sd / sqrt(n_eff), 2)
                ELSE NULL END AS ci_lo,
           CASE WHEN n_eff > 0
                THEN ROUND(mean_rev + 1.96 * sd / sqrt(n_eff), 2)
                ELSE NULL END AS ci_hi,
           ROUND(mean_rev - 1.96 * sd / sqrt(n), 2) AS naive_ci_lo,
           ROUND(mean_rev + 1.96 * sd / sqrt(n), 2) AS naive_ci_hi
    FROM d3 ORDER BY n_days
    """,
    doc="Autocorrelation-adjusted confidence interval for mean daily "
    "revenue: the AR(1) effective-sample-size correction "
    "n_eff = n(1-rho)/(1+rho) — time-series observations are not "
    "independent, and the naive CI (shown alongside) is "
    "anticonservative exactly when momentum is positive; this is "
    "the inference-hygiene twin of q252's descriptive ACF and the "
    "time-series sibling of q411's design effect. Scale shape: the "
    "fact table folds to the calendar-bounded daily frame; rho "
    "comes from a broadcast day+1 self-join; one closed form.",
)
@plan_cache
def q414(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Scale-4 money accumulators (dsum4 rationale, fence-extended r12):
    # a few-distinct-day collapse makes the daily sum's scale-10
    # unscaled value exceed 2^53, where DuckDB's two-step decimal->
    # double conversion diverges sub-ulp from Spark's one-step — and
    # the mean of two 2-dp days lands EXACTLY on .005, turning the
    # sub-ulp into a cent flip. Scale 4 keeps money sums conversion-
    # exact in both engines up to ~9e11.
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # daily feeds the moment fold and both sides of the lag-1 pair
    # join — 3 orders scans in one plan without materialization.
    daily = _managed_persist(
        "q414_daily",
        o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("rev")
        ),
    )
    s = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rev").cast("decimal(30,4)"))
        .cast("double")
        .alias("sx"),
        F.sum((F.col("rev") * F.col("rev")).cast(DEC))
        .cast("double")
        .alias("sxx"),
    )
    d2f = daily.select(F.col("day").alias("day2"), F.col("rev").alias("y"))
    pairs = daily.join(
        F.broadcast(d2f), F.expr("date_add(day, 1)") == F.col("day2")
    ).select(F.col("rev").alias("x"), "y")
    ac = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("px"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("py"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("pxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("pyy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("pxy"),
    )
    np_, n = F.col("np"), F.col("n")
    # Degenerate-series guards (q330/q372 class, extended r12): n==1
    # zeroes sd's divisor; constant pairs zero rho's; rho == +/-1
    # (exact on a 2-point series) zeroes or kills n_eff — Spark ANSI
    # raises where DuckDB yields NaN/inf; NULL cascade in both.
    vprod = (np_ * F.col("pxx") - F.col("px") * F.col("px")) * (
        np_ * F.col("pyy") - F.col("py") * F.col("py")
    )
    j = s.crossJoin(F.broadcast(ac)).select(
        "n",
        (F.col("sx") / n).alias("mean_rev"),
        F.when(
            n > 1,
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
            ),
        ).alias("sd"),
        F.when(
            vprod != 0,
            F.round(
                (np_ * F.col("pxy") - F.col("px") * F.col("py"))
                / F.sqrt(vprod),
                6,
            ),
        ).alias("rho"),
    )
    ne = F.when(
        (1 + F.col("rho")) != 0,
        F.col("n") * (1 - F.col("rho")) / (1 + F.col("rho")),
    )
    # duckdb_round_double on every display output (q160 recipe,
    # extended r12): a mean of two 2-dp money days lands EXACTLY on a
    # .005 boundary where Spark F.round (shortest-repr half-up) and
    # DuckDB ROUND (half-away on the IEEE product) disagree — fence-
    # caught; the unrounded doubles are engine-identical.
    return j.select(
        F.col("n").alias("n_days"),
        duckdb_round_double(F.col("mean_rev"), 2).alias("mean_rev"),
        duckdb_round_double(F.col("sd"), 2).alias("sd"),
        F.col("rho").alias("rho1"),
        duckdb_round_double(ne, 2).alias("n_eff"),
        F.when(
            ne > 0,
            duckdb_round_double(
                F.col("mean_rev") - 1.96 * F.col("sd") / F.sqrt(ne), 2
            ),
        ).alias("ci_lo"),
        F.when(
            ne > 0,
            duckdb_round_double(
                F.col("mean_rev") + 1.96 * F.col("sd") / F.sqrt(ne), 2
            ),
        ).alias("ci_hi"),
        duckdb_round_double(
            F.col("mean_rev") - 1.96 * F.col("sd") / F.sqrt(F.col("n")), 2
        ).alias("naive_ci_lo"),
        duckdb_round_double(
            F.col("mean_rev") + 1.96 * F.col("sd") / F.sqrt(F.col("n")), 2
        ).alias("naive_ci_hi"),
    ).orderBy("n_days")


@register(
    "q415",
    oracle="""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d0
      FROM events
    ),
    fs AS (
      SELECT user_id,
             MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 - b.d0) AS first_day
      FROM events, b GROUP BY 1
    ),
    de AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               - b.d0 AS day,
             CAST(COUNT(*) AS BIGINT) AS ne
      FROM events, b GROUP BY 1
    ),
    nu AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS nw
      FROM fs GROUP BY 1
    ),
    cum AS (
      SELECT d.day,
             CAST(SUM(p.ne) AS BIGINT) AS cum_events,
             CAST(SUM(COALESCE(u.nw, 0)) AS BIGINT) AS cum_users
      FROM de d
      JOIN de p ON p.day <= d.day
      LEFT JOIN nu u ON u.day = p.day
      GROUP BY 1
    ),
    pts AS (
      SELECT LN(CAST(cum_events AS DOUBLE)) AS x,
             LN(CAST(cum_users AS DOUBLE)) AS y
      FROM cum
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      FROM pts
    ),
    fit AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
             sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx)
               * sx / n AS alpha,
             (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      FROM s
    ),
    tot AS (
      SELECT MAX(cum_events) AS e_tot, MAX(cum_users) AS u_tot FROM cum
    )
    SELECT t.e_tot AS total_events,
           t.u_tot AS observed_users,
           ROUND(f.beta, 4) AS heaps_beta,
           ROUND(f.r2, 4) AS r_squared,
           ROUND(EXP(f.alpha + f.beta
                     * LN(10.0 * CAST(t.e_tot AS DOUBLE))), 2)
             AS predicted_users_at_10x
    FROM fit f, tot t ORDER BY total_events
    """,
    doc="Heaps'-law growth fit + 10x extrapolation: cumulative distinct "
    "users vs cumulative events on the log-log scale (U ~ alpha·E^beta, "
    "the vocabulary-growth law), OLS slope beta with R², and the "
    "predicted distinct-user count if the corpus grew 10x — the "
    "capacity question ('how many uniques at the next order of "
    "magnitude') that a 100 TB planner asks before sizing identity "
    "stores and HLL registers; the growth-curve complement to q395's "
    "closed-population estimate and q351's richness estimators. "
    "Scale shape: distinct-cardinality series comes from a "
    "first-seen-day fold (one user fold + calendar cumsum via a "
    "triangular join over ~30 day rows — never a giant distinct per "
    "prefix), OLS on decimal sufficient statistics.",
)
@plan_cache
def q415(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    b = ev.agg(F.min(day).alias("d0"))
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # rel feeds the first-seen fold AND the daily fold; cum feeds the
    # log-log fit AND the totals — 12 events scans in one plan without
    # materialization (scan-dup probe).
    rel = _managed_persist(
        "q415_rel",
        ev.select("user_id", day.alias("dd"))
        .crossJoin(F.broadcast(b))
        .select("user_id", (F.col("dd") - F.col("d0")).alias("day")),
    )
    fs = rel.groupBy("user_id").agg(F.min("day").alias("first_day"))
    de = rel.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("ne"))
    nu = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nw")
    )
    p = de.join(nu, "day", "left").select(
        F.col("day").alias("pd"),
        F.col("ne").alias("pe"),
        F.coalesce(F.col("nw"), F.lit(0)).alias("pw"),
    )
    cum = _managed_persist(
        "q415_cum",
        de.select("day")
        .join(F.broadcast(p), F.col("pd") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.sum("pe").cast("bigint").alias("cum_events"),
            F.sum("pw").cast("bigint").alias("cum_users"),
        ),
    )
    pts = cum.select(
        F.log(F.col("cum_events").cast("double")).alias("x"),
        F.log(F.col("cum_users").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    beta = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        beta.alias("beta"),
        (F.col("sy") / n - beta * F.col("sx") / n).alias("alpha"),
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("r2"),
    )
    tot = cum.agg(
        F.max("cum_events").alias("e_tot"), F.max("cum_users").alias("u_tot")
    )
    return (
        fit.crossJoin(F.broadcast(tot))
        .select(
            F.col("e_tot").alias("total_events"),
            F.col("u_tot").alias("observed_users"),
            F.round(F.col("beta"), 4).alias("heaps_beta"),
            F.round(F.col("r2"), 4).alias("r_squared"),
            F.round(
                F.exp(
                    F.col("alpha")
                    + F.col("beta") * F.log(10.0 * F.col("e_tot").cast("double"))
                ),
                2,
            ).alias("predicted_users_at_10x"),
        )
        .orderBy("total_events")
    )


@register(
    "q416",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 100
                  + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS month_id,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,10)))
                  AS DOUBLE) AS r
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ru AS (
      SELECT COALESCE(brand, 'ALL') AS brand,
             COALESCE(month_id, -1) AS month_id,
             CAST(GROUPING(brand) * 2 + GROUPING(month_id) AS BIGINT)
               AS lvl,
             ROUND(CAST(SUM(CAST(r AS DECIMAL(30,10))) AS DOUBLE), 2)
               AS revenue
      FROM rev GROUP BY ROLLUP (brand, month_id)
    ),
    rk AS (
      SELECT lvl, brand, month_id, revenue,
             ROW_NUMBER() OVER (PARTITION BY lvl
                                ORDER BY revenue DESC, brand, month_id)
               AS rnk
      FROM ru
    )
    SELECT CAST(lvl AS BIGINT) AS lvl, brand, month_id, revenue,
           CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= 10
    ORDER BY lvl, rnk
    """,
    doc="Hierarchical top-k over a ROLLUP (TPC-DS Q67 shape): revenue "
    "rolled up through (brand, month) -> (brand) -> grand total, then "
    "the top 10 rows WITHIN EACH rollup level — the 'best sellers at "
    "every level of the hierarchy in one pass' report that composes "
    "q33's rollup with q52's per-group top-k (one aggregate scan "
    "serves every level; re-running one query per level would scan "
    "the fact table three times). Determinism: level key from "
    "GROUPING() bits, ranks on exact-decimal revenue with "
    "(brand, month) tie-break. Scale shape: one fact join + ONE "
    "rollup agg (partial+final, map-side combinable); the rank "
    "window partitions by level over the |brands|x|months| rollup "
    "frame, never the fact table.",
)
@plan_cache
def q416(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("od") * 100 + F.month("od"))
            .cast("bigint")
            .alias("month_id"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("double")
            .alias("r")
        )
    )
    ru = rev.rollup("brand", "month_id").agg(
        F.round(F.sum(F.col("r").cast(DEC)).cast("double"), 2).alias(
            "revenue"
        ),
        (F.grouping("brand") * 2 + F.grouping("month_id"))
        .cast("bigint")
        .alias("lvl"),
    ).select(
        "lvl",
        F.coalesce(F.col("brand"), F.lit("ALL")).alias("brand"),
        F.coalesce(F.col("month_id"), F.lit(-1)).alias("month_id"),
        "revenue",
    )
    w = Window.partitionBy("lvl").orderBy(
        F.col("revenue").desc(), "brand", "month_id"
    )
    return (
        ru.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 10)
        .select("lvl", "brand", "month_id", "revenue", "rnk")
        .orderBy("lvl", "rnk")
    )


@register(
    "q417",
    oracle=f"""
    WITH fo AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             event_type,
             MIN(ts) AS ft
      FROM events GROUP BY 1, 2, 3
    ),
    rked AS (
      SELECT user_id, day, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY ft, event_type) AS rn
      FROM fo
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_seq
      FROM (SELECT DISTINCT user_id, day FROM fo)
    ),
    trip AS (
      SELECT a.event_type || '>' || b.event_type || '>' || c.event_type
               AS pattern,
             CAST(COUNT(*) AS BIGINT) AS n_sequences
      FROM rked a
      JOIN rked b ON b.user_id = a.user_id AND b.day = a.day
                 AND b.rn > a.rn
      JOIN rked c ON c.user_id = a.user_id AND c.day = a.day
                 AND c.rn > b.rn
      GROUP BY 1
    )
    SELECT pattern, n_sequences,
           {sql_dratio_round('n_sequences', 't.n_seq')} AS support
    FROM trip, tot t ORDER BY pattern
    """,
    doc="Sequential-pattern support mining (PrefixSpan-style, "
    "first-occurrence ordering): for every ordered triple of DISTINCT "
    "event types, the share of user-day sequences containing it as a "
    "subsequence — 'view before signup before purchase' behavioral "
    "grammar with GAPS allowed, which q145's contiguous trigrams "
    "cannot see. Reducing each sequence to its first-occurrence type "
    "ordering bounds the per-sequence pattern count at C(|types|,3) "
    "combinations — the classic closed-world trick that keeps "
    "subsequence mining linear in sequences instead of exponential "
    "in length. Scale shape: one (user, day, type) fold, a per-"
    "sequence rank window over <=|types| rows, two co-partitioned "
    "self-joins with bounded fan-out, one pattern fold.",
)
@plan_cache
def q417(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    fo = ev.groupBy("user_id", day.alias("day"), "event_type").agg(
        F.min("ts").alias("ft")
    )
    w = Window.partitionBy("user_id", "day").orderBy("ft", "event_type")
    rked = fo.select(
        "user_id", "day", "event_type", F.row_number().over(w).alias("rn")
    ).localCheckpoint()
    tot = rked.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seq")
    )
    b = rked.select(
        F.col("user_id").alias("ub"),
        F.col("day").alias("db"),
        F.col("event_type").alias("tb"),
        F.col("rn").alias("rb"),
    )
    c = rked.select(
        F.col("user_id").alias("uc"),
        F.col("day").alias("dc"),
        F.col("event_type").alias("tc"),
        F.col("rn").alias("rc"),
    )
    trip = (
        rked.join(
            b,
            (F.col("ub") == F.col("user_id"))
            & (F.col("db") == F.col("day"))
            & (F.col("rb") > F.col("rn")),
        )
        .join(
            c,
            (F.col("uc") == F.col("user_id"))
            & (F.col("dc") == F.col("day"))
            & (F.col("rc") > F.col("rb")),
        )
        .groupBy(
            F.concat_ws(
                ">", F.col("event_type"), F.col("tb"), F.col("tc")
            ).alias("pattern")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sequences"))
    )
    return (
        trip.crossJoin(F.broadcast(tot))
        .select(
            "pattern",
            "n_sequences",
            dratio_round(
                F.col("n_sequences").cast(DECZ), F.col("n_seq").cast(DECZ)
            ).alias("support"),
        )
        .orderBy("pattern")
    )


@register(
    "q418",
    oracle=f"""
    WITH rows_ AS (
      SELECT l_orderkey // 512 AS page_ins,
             date_diff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE)) // 4 AS page_sorted,
             CAST(l_shipdate AS DATE) AS sd
      FROM lineitem
    ),
    pred AS (
      SELECT DATE '1997-03-01' AS lo, DATE '1997-04-01' AS hi
    ),
    ins AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pages,
             CAST(SUM(CASE WHEN mn < hi AND mx >= lo THEN 1 ELSE 0 END)
               AS BIGINT) AS scanned
      FROM (SELECT page_ins, MIN(sd) AS mn, MAX(sd) AS mx
            FROM rows_ GROUP BY 1), pred
    ),
    srt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pages,
             CAST(SUM(CASE WHEN mn < hi AND mx >= lo THEN 1 ELSE 0 END)
               AS BIGINT) AS scanned
      FROM (SELECT page_sorted, MIN(sd) AS mn, MAX(sd) AS mx
            FROM rows_ GROUP BY 1), pred
    )
    SELECT layout, n_pages, scanned AS pages_scanned,
           {sql_dratio_round('n_pages - scanned', 'n_pages')} AS skip_rate
    FROM (
      SELECT 'insertion' AS layout, * FROM ins
      UNION ALL
      SELECT 'shipdate_sorted', * FROM srt
    ) ORDER BY layout
    """,
    doc="Zone-map skipping effectiveness audit: simulate per-page "
    "min/max statistics for a one-month shipdate predicate under two "
    "physical layouts — insertion order (pages = orderkey ranges; "
    "orderkey and shipdate are uncorrelated here, so zone maps skip "
    "nothing) vs shipdate-clustered (pages = date ranges; ~97% of "
    "pages skip) — the quantified WHY behind q159's sorted layout, "
    "q210's Z-order and q146's partition pruning: it prices the "
    "re-cluster before you pay for it. Page ids are PURE FUNCTIONS "
    "of row values (orderkey DIV 512, epoch-day DIV 4 — never "
    "row_number over a global sort, the q45 rule), so the audit "
    "itself needs no global ordering. Scale shape: two "
    "(page -> min/max) partial+final folds over one scan, 2-row "
    "output.",
)
@plan_cache
def q418(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("l_orderkey DIV 512").alias("page_ins"),
        F.expr(
            "datediff(to_date(l_shipdate), DATE '1970-01-01') DIV 4"
        ).alias("page_sorted"),
        F.to_date("l_shipdate").alias("sd"),
    )
    lo, hi = F.lit("1997-03-01").cast("date"), F.lit("1997-04-01").cast(
        "date"
    )

    def audit(page_col: str, name: str) -> DataFrame:
        pages = li.groupBy(page_col).agg(
            F.min("sd").alias("mn"), F.max("sd").alias("mx")
        )
        return pages.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.sum(
                F.when((F.col("mn") < hi) & (F.col("mx") >= lo), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("scanned"),
        ).select(F.lit(name).alias("layout"), "n_pages", "scanned")

    both = audit("page_ins", "insertion").unionAll(
        audit("page_sorted", "shipdate_sorted")
    )
    return both.select(
        "layout",
        "n_pages",
        F.col("scanned").alias("pages_scanned"),
        dratio_round(
            (F.col("n_pages") - F.col("scanned")).cast(DECZ),
            F.col("n_pages").cast(DECZ),
        ).alias("skip_rate"),
    ).orderBy("layout")


@register(
    "q419",
    oracle="""
    WITH sc AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    av AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ca FROM sc GROUP BY 1),
    srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n1 FROM sc
             GROUP BY 1),
    ntot AS (SELECT CAST(SUM(ca) AS BIGINT) AS nt FROM av),
    grid AS (
      SELECT s.source, a.v, COALESCE(sc.c, 0) AS cs, a.ca
      FROM srcs s CROSS JOIN av a
      LEFT JOIN sc ON sc.source = s.source AND sc.v = a.v
    ),
    cum AS (
      SELECT source, v,
             CAST(SUM(cs) OVER w AS BIGINT) AS r1,
             CAST(SUM(ca - cs) OVER w AS BIGINT) AS r2
      FROM grid
      WINDOW w AS (PARTITION BY source ORDER BY v)
    ),
    dmax AS (
      SELECT c.source,
             MAX(ABS(c.r1 * (t.nt - s.n1) - c.r2 * s.n1)) AS dd
      FROM cum c
      JOIN srcs s ON s.source = c.source
      CROSS JOIN ntot t
      GROUP BY 1
    ),
    ks AS (
      SELECT d.source, s.n1,
             ROUND(CAST(d.dd AS DOUBLE)
                   / (s.n1 * (t.nt - s.n1)), 6) AS ks_d,
             sqrt(CAST(s.n1 AS DOUBLE) * (t.nt - s.n1) / t.nt) AS sne
      FROM dmax d JOIN srcs s ON s.source = d.source CROSS JOIN ntot t
    ),
    pv AS (
      SELECT source, n1, ks_d,
             ROUND(LEAST(1.0, GREATEST(0.0,
               2 * (EXP(-2 * ((sne + 0.12 + 0.11 / sne) * ks_d)
                        * ((sne + 0.12 + 0.11 / sne) * ks_d))
                    - EXP(-8 * ((sne + 0.12 + 0.11 / sne) * ks_d)
                          * ((sne + 0.12 + 0.11 / sne) * ks_d))
                    + EXP(-18 * ((sne + 0.12 + 0.11 / sne) * ks_d)
                          * ((sne + 0.12 + 0.11 / sne) * ks_d))))),
               6) AS p_value
      FROM ks
    ),
    rked AS (
      SELECT source, n1, ks_d, p_value,
             ROW_NUMBER() OVER (ORDER BY p_value, source) AS rnk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pv
    ),
    kmax AS (
      SELECT COALESCE(MAX(CASE WHEN p_value <= rnk * 0.05 / m
                           THEN rnk END), 0) AS k
      FROM rked
    )
    SELECT r.source, r.n1 AS n_docs, r.ks_d, r.p_value,
           CAST(r.rnk AS BIGINT) AS p_rank,
           CAST(CASE WHEN r.rnk <= k.k THEN 1 ELSE 0 END AS INTEGER)
             AS bh_reject
    FROM rked r, kmax k ORDER BY r.source
    """,
    doc="Stratified distribution-drift screen with FDR control: each "
    "source's document-length distribution is KS-tested against the "
    "REST of the corpus (cross-multiplied integer ECDFs on a shared "
    "value grid — q254's exactness, per-source), p-values from the "
    "asymptotic Kolmogorov series (3 terms, identical expression "
    "both engines), then Benjamini-Hochberg at q=0.05 across the 20 "
    "strata (q348's step-up) — the honest 'WHICH feeds changed' "
    "screen: 20 marginal tests at 0.05 would false-alarm once per "
    "run by design. Scale shape: one (source, length) fold, a "
    "sources x values broadcast grid, running ECDFs partitioned per "
    "source, BH over a 20-row frame (non-foldable constant "
    "partition for the rank — the q348 device).",
)
@plan_cache
def q419(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sc_ = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    av = sc_.groupBy("v").agg(F.sum("c").cast("bigint").alias("ca"))
    srcs = sc_.groupBy("source").agg(F.sum("c").cast("bigint").alias("n1"))
    ntot = av.agg(F.sum("ca").cast("bigint").alias("nt"))
    grid = (
        srcs.select("source", "n1")
        .crossJoin(F.broadcast(av))
        .join(sc_, ["source", "v"], "left")
        .select(
            "source",
            "n1",
            "v",
            F.coalesce(F.col("c"), F.lit(0)).alias("cs"),
            "ca",
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "source",
        "n1",
        F.sum("cs").over(w).cast("bigint").alias("r1"),
        F.sum(F.col("ca") - F.col("cs")).over(w).cast("bigint").alias("r2"),
    )
    dmax = (
        cum.crossJoin(F.broadcast(ntot))
        .groupBy("source", "n1", "nt")
        .agg(
            F.max(
                F.abs(
                    F.col("r1") * (F.col("nt") - F.col("n1"))
                    - F.col("r2") * F.col("n1")
                )
            ).alias("dd")
        )
    )
    sne = F.sqrt(
        F.col("n1").cast("double") * (F.col("nt") - F.col("n1")) / F.col("nt")
    )
    ks = dmax.select(
        "source",
        "n1",
        F.round(
            F.col("dd").cast("double")
            / (F.col("n1") * (F.col("nt") - F.col("n1"))),
            6,
        ).alias("ks_d"),
        sne.alias("sne"),
    )
    lam = (F.col("sne") + 0.12 + 0.11 / F.col("sne")) * F.col("ks_d")
    pv = ks.select(
        "source",
        "n1",
        "ks_d",
        F.round(
            F.least(
                F.lit(1.0),
                F.greatest(
                    F.lit(0.0),
                    2
                    * (
                        F.exp(-2 * lam * lam)
                        - F.exp(-8 * lam * lam)
                        + F.exp(-18 * lam * lam)
                    ),
                ),
            ),
            6,
        ).alias("p_value"),
    )
    wr = Window.partitionBy(
        F.pmod(F.xxhash64("source"), F.lit(1))
    ).orderBy("p_value", "source")
    rked = pv.select(
        "source",
        "n1",
        "ks_d",
        "p_value",
        F.row_number().over(wr).alias("rnk"),
    ).localCheckpoint()
    m = rked.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    kmax = (
        rked.crossJoin(F.broadcast(m))
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("p_value") <= F.col("rnk") * 0.05 / F.col("m"),
                        F.col("rnk"),
                    )
                ),
                F.lit(0),
            ).alias("k")
        )
    )
    return (
        rked.crossJoin(F.broadcast(kmax))
        .select(
            "source",
            F.col("n1").alias("n_docs"),
            "ks_d",
            "p_value",
            F.col("rnk").cast("bigint").alias("p_rank"),
            F.when(F.col("rnk") <= F.col("k"), 1)
            .otherwise(0)
            .cast("int")
            .alias("bh_reject"),
        )
        .orderBy("source")
    )


@register(
    "q420",
    oracle="""
    WITH cells AS (
      SELECT p.p_brand AS brand,
             CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 100
                  + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS month_id,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,10)))
                  AS DECIMAL(38,10)) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    m0 AS (
      SELECT rev AS g FROM (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn,
               COUNT(*) OVER () AS n
        FROM cells) WHERE rn = (n + 1) // 2
    ),
    r0 AS (SELECT brand, month_id, CAST(rev - g AS DECIMAL(38,10)) AS r
           FROM cells, m0),
    re1 AS (
      SELECT brand, r AS e FROM (
        SELECT brand, r, ROW_NUMBER() OVER (PARTITION BY brand
                                            ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY brand) AS n
        FROM r0) WHERE rn = (n + 1) // 2
    ),
    r1 AS (SELECT r0.brand, r0.month_id,
                  CAST(r0.r - re1.e AS DECIMAL(38,10)) AS r
           FROM r0 JOIN re1 ON re1.brand = r0.brand),
    ce1 AS (
      SELECT month_id, r AS e FROM (
        SELECT month_id, r, ROW_NUMBER() OVER (PARTITION BY month_id
                                               ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY month_id) AS n
        FROM r1) WHERE rn = (n + 1) // 2
    ),
    r2 AS (SELECT r1.brand, r1.month_id,
                  CAST(r1.r - ce1.e AS DECIMAL(38,10)) AS r
           FROM r1 JOIN ce1 ON ce1.month_id = r1.month_id),
    re2 AS (
      SELECT brand, r AS e FROM (
        SELECT brand, r, ROW_NUMBER() OVER (PARTITION BY brand
                                            ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY brand) AS n
        FROM r2) WHERE rn = (n + 1) // 2
    ),
    r3 AS (SELECT r2.brand, r2.month_id,
                  CAST(r2.r - re2.e AS DECIMAL(38,10)) AS r
           FROM r2 JOIN re2 ON re2.brand = r2.brand),
    ce2 AS (
      SELECT month_id, r AS e FROM (
        SELECT month_id, r, ROW_NUMBER() OVER (PARTITION BY month_id
                                               ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY month_id) AS n
        FROM r3) WHERE rn = (n + 1) // 2
    ),
    r4 AS (SELECT r3.brand, r3.month_id,
                  CAST(ROUND(r3.r - ce2.e, 2) AS DOUBLE) AS residual
           FROM r3 JOIN ce2 ON ce2.month_id = r3.month_id)
    SELECT brand, month_id, residual
    FROM r4 ORDER BY ABS(residual) DESC, brand, month_id LIMIT 10
    """,
    doc="Tukey median polish of the brand x month revenue table (two "
    "full row/column sweeps), reporting the 10 largest surviving "
    "residuals — the ROBUST two-way decomposition: medians absorb "
    "the additive brand and month effects without letting a single "
    "outlier cell drag them (a mean-based two-way fit smears exactly "
    "those cells), so what remains IS the anomaly list ('this brand "
    "in this month, net of both effects'). Determinism: the entire "
    "polish runs in EXACT DECIMAL — each sweep's median is the "
    "LOWER median picked by rank (an actual cell value, no "
    "interpolated float), so the subtraction chain never touches "
    "IEEE doubles until the final round(2) (an interpolated-median "
    "variant flaked on a .xx5 rounding boundary — caught in "
    "development). Scale shape: one fact fold to the "
    "|brands| x |months| cell frame; all four sweeps are per-key "
    "rank windows over that tiny frame.",
)
@plan_cache
def q420(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("od") * 100 + F.month("od"))
            .cast("bigint")
            .alias("month_id"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("decimal(38,10)")
            .alias("rev")
        )
        .localCheckpoint()
    )
    wg = Window.partitionBy(
        F.pmod(F.xxhash64("brand"), F.lit(1))
    ).orderBy("rev")
    m0 = (
        cells.select(
            "rev",
            F.row_number().over(wg).alias("rn"),
            F.count(F.lit(1)).over(
                Window.partitionBy(F.pmod(F.xxhash64("brand"), F.lit(1)))
            ).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select(F.col("rev").alias("g"))
    )
    r = cells.crossJoin(F.broadcast(m0)).select(
        "brand",
        "month_id",
        (F.col("rev") - F.col("g")).cast("decimal(38,10)").alias("r"),
    )
    for key in ["brand", "month_id", "brand", "month_id"]:
        wk = Window.partitionBy(key).orderBy("r")
        wc = Window.partitionBy(key)
        eff = (
            r.select(
                F.col(key).alias("k"),
                "r",
                F.row_number().over(wk).alias("rn"),
                F.count(F.lit(1)).over(wc).alias("n"),
            )
            .where(F.col("rn") == F.expr("(n + 1) DIV 2"))
            .select("k", F.col("r").alias("e"))
        )
        r = (
            r.join(F.broadcast(eff), F.col(key) == F.col("k"))
            .select(
                "brand",
                "month_id",
                (F.col("r") - F.col("e")).cast("decimal(38,10)").alias("r"),
            )
        )
    return (
        r.select(
            "brand",
            "month_id",
            F.round(F.col("r"), 2).cast("double").alias("residual"),
        )
        .orderBy(F.abs(F.col("residual")).desc(), "brand", "month_id")
        .limit(10)
        .orderBy(F.abs(F.col("residual")).desc(), "brand", "month_id")
    )


@register(
    "q421",
    oracle="""
    WITH cs AS (
      SELECT c.c_custkey, c.c_mktsegment AS seg, n.n_name AS nation
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS r
      FROM orders GROUP BY 1
    ),
    cust AS (
      SELECT cs.nation, cs.seg, COALESCE(rev.r, 0.0) AS r
      FROM cs LEFT JOIN rev ON rev.o_custkey = cs.c_custkey
    ),
    rate AS (
      SELECT seg,
             ROUND(CAST(SUM(CAST(r AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(*), 6) AS rps
      FROM cust GROUP BY 1
    ),
    nat AS (
      SELECT nation, seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r AS DECIMAL(30,10))) AS DOUBLE) AS obs
      FROM cust GROUP BY 1, 2
    ),
    agg AS (
      SELECT nation, CAST(SUM(n) AS BIGINT) AS n_customers,
             CAST(SUM(CAST(obs AS DECIMAL(30,10))) AS DOUBLE)
               AS observed,
             CAST(SUM(CAST(n * rps AS DECIMAL(30,10))) AS DOUBLE)
               AS expected
      FROM nat JOIN rate USING (seg) GROUP BY 1
    )
    SELECT nation, n_customers,
           ROUND(observed, 2) AS observed_rev,
           ROUND(expected, 2) AS expected_rev,
           ROUND(observed / expected, 4) AS smr
    FROM agg ORDER BY nation
    """,
    doc="Indirect standardization (SMR) of per-nation revenue: each "
    "nation's observed customer revenue against the revenue EXPECTED "
    "from its market-segment mix at corpus-wide per-segment rates — "
    "the epidemiology-grade answer to 'is this nation actually "
    "under-performing, or does it just have a cheap segment mix?', "
    "which raw per-nation comparisons (q152's volumes, q235's "
    "shares) conflate. SMR > 1 = outperforms its mix. Determinism: "
    "per-segment rates round(6) through exact-DECIMAL folds before "
    "the expectation products. Scale shape: one per-customer "
    "revenue fold, a broadcast nation/segment dim join, "
    "|nations| x |segments| intermediate, closed form per nation.",
)
@plan_cache
def q421(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg"), "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("r")
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # cust feeds the segment-rate fence AND the per-nation fold — the
    # whole customer+orders join chain re-ran for each (6 scans in the
    # plan probe).
    cust = _managed_persist(
        "q421_cust",
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(rev, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "nation", "seg", F.coalesce(F.col("r"), F.lit(0.0)).alias("r")
        ),
    )
    rate = cust.groupBy(F.col("seg").alias("seg_r")).agg(
        F.round(
            F.sum(F.col("r").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("rps")
    )
    nat = cust.groupBy("nation", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r").cast(DEC)).cast("double").alias("obs"),
    )
    agg = (
        nat.join(F.broadcast(rate), F.col("seg") == F.col("seg_r"))
        .groupBy("nation")
        .agg(
            F.sum("n").cast("bigint").alias("n_customers"),
            F.sum(F.col("obs").cast(DEC)).cast("double").alias("observed"),
            F.sum((F.col("n") * F.col("rps")).cast(DEC))
            .cast("double")
            .alias("expected"),
        )
    )
    return agg.select(
        "nation",
        "n_customers",
        F.round(F.col("observed"), 2).alias("observed_rev"),
        F.round(F.col("expected"), 2).alias("expected_rev"),
        F.round(F.col("observed") / F.col("expected"), 4).alias("smr"),
    ).orderBy("nation")


def _q422_oracle() -> str:
    """Unrolled 2-iteration IPF SQL (4 alternating marginal steps),
    generated so each step is the identical expression tree the Spark
    loop builds (weight round(8) per step, exact-DECIMAL folds)."""
    head = """
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS ns,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM documents
    ),
    w0 AS (SELECT lang, source, n, 1.0 AS w FROM cells)"""
    steps = []
    for i, (key, tgt) in enumerate(
        [("lang", "nl"), ("source", "ns"), ("lang", "nl"), ("source", "ns")],
        start=1,
    ):
        steps.append(f""",
    f{i} AS (
      SELECT {key},
             (SELECT CAST(nt AS DOUBLE) / {tgt} FROM dims)
             / CAST(SUM(CAST(w * n AS DECIMAL(30,10))) AS DOUBLE)
               AS fac
      FROM w{i - 1} GROUP BY 1
    ),
    w{i} AS (
      SELECT p.lang, p.source, p.n, ROUND(p.w * f.fac, 8) AS w
      FROM w{i - 1} p JOIN f{i} f ON f.{key} = p.{key}
    )""")
    tail = """,
    achieved AS (
      SELECT lang,
             CAST(SUM(CAST(w * n AS DECIMAL(30,10))) AS DOUBLE) AS wl
      FROM w4 GROUP BY 1
    )
    SELECT w4.lang, w4.source, w4.n AS n_docs,
           ROUND(w4.w, 6) AS weight,
           ROUND(a.wl / (SELECT CAST(nt AS DOUBLE) FROM dims), 4)
             AS lang_share_achieved
    FROM w4 JOIN achieved a ON a.lang = w4.lang
    ORDER BY w4.lang, w4.source"""
    return head + "".join(steps) + tail


@register(
    "q422",
    oracle=_q422_oracle(),
    doc="Raking / iterative proportional fitting of corpus weights: two "
    "full IPF iterations (lang step, source step, twice) drive the "
    "weighted lang x source table toward UNIFORM marginals on both "
    "axes — the survey-statistics way to reweight a skewed corpus so "
    "every language AND every feed speak with equal total voice, "
    "where q166's temperature sampling balances one margin only and "
    "q411 prices the result; the achieved lang share rides along as "
    "the convergence check. Determinism: weights round(8) after "
    "every multiplicative step, all marginal folds exact-DECIMAL. "
    "Scale shape: ONE (lang, source) fold touches the corpus; the "
    "IPF loop runs entirely on that |langs| x |sources| frame "
    "(broadcast factor joins), and the final weights apply to the "
    "corpus as a pure broadcast-joinable function of (lang, source).",
)
@plan_cache
def q422(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint()
    # r14 dup-scan fix: dims was a second full documents agg AND its
    # subtree was embedded in every broadcast(dims) inside the nested
    # IPF lineage — the v2 scan probe counted 31 documents scans in one
    # plan (1,3,7,15 doubling per step + final joins). Derive it from
    # the checkpointed cells frame instead (identical by definition:
    # distinct langs/sources among group keys == among docs, and
    # count(*) == sum of group counts) and checkpoint the 1-row result
    # so each broadcast build reads a materialized RDD, not the corpus.
    dims = cells.agg(
        F.countDistinct("lang").cast("bigint").alias("nl"),
        F.countDistinct("source").cast("bigint").alias("ns"),
        F.sum("n").cast("bigint").alias("nt"),
    ).localCheckpoint()
    w = cells.select("lang", "source", "n", F.lit(1.0).alias("w"))
    for key, tgt in [
        ("lang", "nl"),
        ("source", "ns"),
        ("lang", "nl"),
        ("source", "ns"),
    ]:
        fac = (
            w.groupBy(F.col(key).alias("k"))
            .agg(
                F.sum((F.col("w") * F.col("n")).cast(DEC))
                .cast("double")
                .alias("cur")
            )
            .crossJoin(F.broadcast(dims))
            .select(
                "k",
                (
                    F.col("nt").cast("double") / F.col(tgt) / F.col("cur")
                ).alias("fac"),
            )
        )
        w = w.join(F.broadcast(fac), F.col(key) == F.col("k")).select(
            "lang",
            "source",
            "n",
            F.round(F.col("w") * F.col("fac"), 8).alias("w"),
        )
    achieved = w.groupBy(F.col("lang").alias("la")).agg(
        F.sum((F.col("w") * F.col("n")).cast(DEC)).cast("double").alias("wl")
    )
    return (
        w.join(F.broadcast(achieved), F.col("lang") == F.col("la"))
        .crossJoin(F.broadcast(dims))
        .select(
            "lang",
            "source",
            F.col("n").alias("n_docs"),
            F.round(F.col("w"), 6).alias("weight"),
            F.round(F.col("wl") / F.col("nt").cast("double"), 4).alias(
                "lang_share_achieved"
            ),
        )
        .orderBy("lang", "source")
    )


@register(
    "q423",
    oracle="""
    WITH vc AS (
      SELECT ROUND(value, 2) AS v,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c2
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2 FROM vc),
    cum AS (
      SELECT v,
             CAST(SUM(c1) OVER w AS BIGINT) AS r1,
             CAST(SUM(c2) OVER w AS BIGINT) AS r2,
             LEAD(v) OVER (ORDER BY v) AS nxt
      FROM vc WINDOW w AS (ORDER BY v)
    ),
    seg AS (
      SELECT ABS(r1 * n2 - r2 * n1) * (nxt - v) AS contrib
      FROM cum, tot WHERE nxt IS NOT NULL
    )
    SELECT n1, n2,
           ROUND(CAST(SUM(CAST(contrib AS DECIMAL(38,10))) AS DOUBLE)
                 / (n1 * n2), 6) AS wasserstein_1
    FROM seg, tot GROUP BY n1, n2 ORDER BY n1
    """,
    doc="Wasserstein-1 (earth-mover) distance between error-event and "
    "other-event value distributions — the ML-monitoring drift metric "
    "that INTEGRATES the ECDF gap over the value axis (KS q254 takes "
    "the max, CvM q378 squares at jump points; W1 alone is in the "
    "metric's units and sees slow wide drift). Exact arithmetic: "
    "per-segment contribution |r1·n2 − r2·n1|·(v_next − v) on "
    "round(2)-bucketed values, one DECIMAL fold, a single divide by "
    "n1·n2. Scale shape: the corpus folds to the bounded rounded-"
    "value frame; the running ECDFs and the next-value lookup both "
    "follow the q167/q254 two-phase bucket discipline (percentile-"
    "bound buckets, partitioned windows, bucket-head stitch join — "
    "the oracle states the naive global-window form).",
)
@plan_cache
def q423(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is1 = F.col("event_type") == "error"
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # q254's discipline (9 events scans in the plan probe): vc feeds
    # totals/bounds/bucketed; bucketed feeds the bucket totals, the
    # head stitch and the cum chain.
    vc = _managed_persist(
        "q423_vc",
        ev.groupBy(F.round("value", 2).alias("v")).agg(
            F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("c1"),
            F.sum(F.when(~is1, 1).otherwise(0)).cast("bigint").alias("c2"),
        ),
    )
    tot = vc.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    bounds = vc.agg(
        F.expr(
            "percentile(v, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = _managed_persist(
        "q423_bucketed",
        vc.crossJoin(F.broadcast(bounds)).select(
            "v", "c1", "c2", F.expr("size(filter(bs, b -> b < v))").alias("bk")
        )
    )
    btot = bucketed.groupBy("bk").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    b2 = btot.select(
        F.col("bk").alias("bk2"), F.col("b1").alias("e1"), F.col("b2").alias("e2")
    )
    offsets = (
        btot.join(F.broadcast(b2), F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(
            F.coalesce(F.sum("e1"), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("e2"), F.lit(0)).alias("o2"),
        )
    )
    wb = Window.partitionBy("bk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bucket-head stitch: the last value of bucket k needs bucket k+1's
    # first value as its segment end
    heads = bucketed.groupBy(F.col("bk").alias("hbk")).agg(
        F.min("v").alias("head_v")
    )
    cum = (
        bucketed.withColumn("r1w", F.sum("c1").over(wb))
        .withColumn("r2w", F.sum("c2").over(wb))
        .withColumn("nxt_in", F.lead("v").over(Window.partitionBy("bk").orderBy("v")))
        .join(F.broadcast(offsets), "bk")
        .join(
            F.broadcast(heads), F.col("hbk") == F.col("bk") + 1, "left"
        )
        .select(
            "v",
            (F.col("o1") + F.col("r1w")).cast("bigint").alias("r1"),
            (F.col("o2") + F.col("r2w")).cast("bigint").alias("r2"),
            F.coalesce(F.col("nxt_in"), F.col("head_v")).alias("nxt"),
        )
    )
    seg = (
        cum.where(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1"))
                * (F.col("nxt") - F.col("v"))
            ).alias("contrib"),
            "n1",
            "n2",
        )
    )
    return (
        seg.groupBy("n1", "n2")
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(38,10)")).cast("double")
                / (F.col("n1") * F.col("n2")),
                6,
            ).alias("wasserstein_1")
        )
        .select("n1", "n2", "wasserstein_1")
        .orderBy("n1")
    )


@register(
    "q424",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             CASE WHEN (user_id % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS tv
      FROM events GROUP BY 1
    ),
    qa AS (
      SELECT arm,
             quantile_cont(tv, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
               AS qs
      FROM pu GROUP BY 1
    ),
    ex AS (
      SELECT arm, generate_subscripts(qs, 1) AS d,
             ROUND(CAST(unnest(qs) AS DOUBLE), 4) AS q
      FROM qa
    )
    SELECT a.d AS decile,
           a.q AS val_a, b.q AS val_b,
           ROUND(b.q - a.q, 4) AS qte
    FROM (SELECT * FROM ex WHERE arm = 'A') a
    JOIN (SELECT * FROM ex WHERE arm = 'B') b ON b.d = a.d
    ORDER BY decile
    """,
    doc="Quantile treatment effects: decile-by-decile difference of the "
    "per-user total-value distribution between the q242 hash arms — "
    "WHERE in the distribution the treatment acts (a mean effect of "
    "zero can hide a tail gain funding a median loss; q391's "
    "delta-method mean and q376's two-group Q-Q are the neighbors). "
    "Exact interpolated quantiles (q47 family) rounded to 4 before "
    "differencing. Scale shape: one user fold, two 9-element "
    "quantile aggs, a 9-row join.",
)
@plan_cache
def q424(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        (F.col("user_id") % F.lit(2147483648)) * 2654435761 % 100 < 50, "A"
    ).otherwise("B")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast(DEC)).cast("double").alias("tv")
    ).select(arm.alias("arm"), "tv")
    qa = pu.groupBy("arm").agg(
        F.expr(
            "percentile(tv, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("qs")
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 events scans): the A and B decile
    # branches each re-ran the per-user fold + percentile agg. Persist
    # the 18-row decile frame.
    ex = _managed_persist(
        "q424_ex",
        qa.select("arm", F.posexplode("qs").alias("d0", "qv")).select(
            "arm",
            (F.col("d0") + 1).alias("d"),
            F.round(F.col("qv").cast("double"), 4).alias("q"),
        ),
    )
    a = ex.where(F.col("arm") == "A").select(
        F.col("d").alias("decile"), F.col("q").alias("val_a")
    )
    b = ex.where(F.col("arm") == "B").select(
        F.col("d").alias("db"), F.col("q").alias("val_b")
    )
    return (
        a.join(b, F.col("db") == F.col("decile"))
        .select(
            "decile",
            "val_a",
            "val_b",
            F.round(F.col("val_b") - F.col("val_a"), 4).alias("qte"),
        )
        .orderBy("decile")
    )


@register(
    "q425",
    oracle="""
    WITH pu AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS c
      FROM events GROUP BY 1 HAVING COUNT(*) >= 5
    ),
    pk AS (
      SELECT CAST(c AS DOUBLE) / n AS p1,
             CASE WHEN n - c < 5 THEN 1.0
                  ELSE 1.0
                    - (CAST(n - c AS DOUBLE) / n)
                    * (CAST(n - c - 1 AS DOUBLE) / (n - 1))
                    * (CAST(n - c - 2 AS DOUBLE) / (n - 2))
                    * (CAST(n - c - 3 AS DOUBLE) / (n - 3))
                    * (CAST(n - c - 4 AS DOUBLE) / (n - 4))
             END AS p5
      FROM pu
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tasks,
           ROUND(CAST(SUM(CAST(p1 AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(*), 6) AS pass_at_1,
           ROUND(CAST(SUM(CAST(p5 AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(*), 6) AS pass_at_5,
           ROUND((CAST(SUM(CAST(p5 AS DECIMAL(30,10))) AS DOUBLE)
                  / COUNT(*))
                 / (CAST(SUM(CAST(p1 AS DECIMAL(30,10))) AS DOUBLE)
                    / COUNT(*)), 4) AS lift_5_over_1
    FROM pk ORDER BY n_tasks
    """,
    doc="Unbiased pass@k estimator (Chen et al., the Codex/HumanEval "
    "formula): per task with n samples and c successes, "
    "pass@k = 1 − C(n−c,k)/C(n,k), evaluated as the exact telescoped "
    "product Π(n−c−i)/(n−i) — the LLM-eval aggregation primitive, "
    "here over users-as-tasks (n events, purchases as successes, "
    "k=5; n>=k tasks only, C(n−c,k)=0 → pass=1 when fewer than k "
    "failures exist). The naive (c/n)^-based estimate is biased at "
    "small n — this form is not, which is the entire point of the "
    "operator. Determinism: per-task doubles from identical integer "
    "products, corpus averages through exact-DECIMAL folds. Scale "
    "shape: one task-keyed fold, per-row closed form, 1-row output.",
)
@plan_cache
def q425(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("c"),
        )
        .where(F.col("n") >= 5)
    )
    n, c = F.col("n"), F.col("c")
    fail = n - c
    prod = (
        (fail.cast("double") / n)
        * ((fail - 1).cast("double") / (n - 1))
        * ((fail - 2).cast("double") / (n - 2))
        * ((fail - 3).cast("double") / (n - 3))
        * ((fail - 4).cast("double") / (n - 4))
    )
    pk = pu.select(
        (c.cast("double") / n).alias("p1"),
        F.when(fail < 5, F.lit(1.0)).otherwise(1.0 - prod).alias("p5"),
    )
    a1 = F.sum(F.col("p1").cast(DEC)).cast("double") / F.count(F.lit(1))
    a5 = F.sum(F.col("p5").cast(DEC)).cast("double") / F.count(F.lit(1))
    return pk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tasks"),
        F.round(a1, 6).alias("pass_at_1"),
        F.round(a5, 6).alias("pass_at_5"),
        F.round(a5 / a1, 4).alias("lift_5_over_1"),
    ).orderBy("n_tasks")


@register(
    "q426",
    oracle=f"""
    WITH stats AS (
      SELECT 'lineitem_orders' AS join_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_a,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_b,
             (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
              FROM lineitem) AS ndv_a,
             (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS ndv_b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey) AS actual
      UNION ALL
      SELECT 'lineitem_part',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM part),
             (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
              FROM lineitem),
             (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT)
              FROM part),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'orders_customer',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
             (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
              FROM orders),
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
              FROM customer),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey)
    )
    SELECT join_name, n_a, n_b, ndv_a, ndv_b, actual,
           CAST(FLOOR(CAST(n_a AS DOUBLE) * n_b
                      / GREATEST(ndv_a, ndv_b)) AS BIGINT) AS estimated,
           {sql_dratio_round(
               'CAST(FLOOR(CAST(n_a AS DOUBLE) * n_b'
               ' / GREATEST(ndv_a, ndv_b)) AS HUGEINT)',
               'actual')} AS est_over_actual
    FROM stats ORDER BY join_name
    """,
    doc="Join-cardinality estimator audit: for the three core FK joins, "
    "the textbook CBO estimate |A||B| / max(ndv_a, ndv_b) (uniform-"
    "containment assumption — what q230's ANALYZE statistics feed "
    "the optimizer) against the TRUE join cardinality, with the "
    "over/under ratio — the audit that tells you where the "
    "optimizer's selectivity model will misplan (ratio far from 1 = "
    "skewed or filtered keys; pair with q263's skew diagnosis). "
    "Scale shape: exact distinct counts and join counts are one "
    "co-partitioned pass each; output is 3 rows.",
)
@plan_cache
def q426(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def one(name, a, b, ka, kb):
        # r14 rewrite (v2 probe: each pair scanned both tables twice —
        # stats agg + raw fact-fact join; 12 scans total). Tag-union the
        # two key streams and fold per key ONCE: the inner equi-join
        # cardinality is exactly sum(cnt_a * cnt_b) over shared keys
        # (NULL keys never match — the null group's product term is
        # excluded below just as join equality excludes it), row counts
        # are sum(cnt), and NDV is the non-null group count. One scan
        # per table per pair, one pre-aggregated key shuffle instead of
        # shuffling every fact row through the join (guide §2.3).
        ua = a.select(
            F.col(ka).alias("k"),
            F.lit(1).alias("ta"),
            F.lit(0).alias("tb"),
        )
        ub = b.select(
            F.col(kb).alias("k"),
            F.lit(0).alias("ta"),
            F.lit(1).alias("tb"),
        )
        per = (
            ua.unionAll(ub)
            .groupBy("k")
            .agg(
                F.sum("ta").cast("long").alias("cnt_a"),
                F.sum("tb").cast("long").alias("cnt_b"),
            )
        )
        agg = per.agg(
            F.sum("cnt_a").cast("bigint").alias("n_a"),
            F.sum("cnt_b").cast("bigint").alias("n_b"),
            F.count(
                F.when(F.col("k").isNotNull() & (F.col("cnt_a") > 0), 1)
            )
            .cast("bigint")
            .alias("ndv_a"),
            F.count(
                F.when(F.col("k").isNotNull() & (F.col("cnt_b") > 0), 1)
            )
            .cast("bigint")
            .alias("ndv_b"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("k").isNotNull(),
                        (F.col("cnt_a") * F.col("cnt_b")).cast(DECZ),
                    )
                ),
                F.lit(0).cast(DECZ),
            )
            .cast("bigint")
            .alias("actual"),
        )
        return agg.select(
            F.lit(name).alias("join_name"),
            "n_a",
            "n_b",
            "ndv_a",
            "ndv_b",
            "actual",
        )

    stats = (
        one("lineitem_orders", li, o, "l_orderkey", "o_orderkey")
        .unionAll(one("lineitem_part", li, p, "l_partkey", "p_partkey"))
        .unionAll(one("orders_customer", o, c, "o_custkey", "c_custkey"))
    )
    est = F.floor(
        F.col("n_a").cast("double")
        * F.col("n_b")
        / F.greatest(F.col("ndv_a"), F.col("ndv_b"))
    ).cast("bigint")
    return stats.select(
        "join_name",
        "n_a",
        "n_b",
        "ndv_a",
        "ndv_b",
        "actual",
        est.alias("estimated"),
        dratio_round(est.cast(DECZ), F.col("actual").cast(DECZ)).alias(
            "est_over_actual"
        ),
    ).orderBy("join_name")


@register(
    "q432",
    oracle=f"""
    WITH b AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE))) AS mn,
             MAX(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE))) AS mx
      FROM orders
    ),
    pr AS (
      SELECT o_custkey AS ck,
             CASE WHEN date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE))
                       < b.mn + CAST(FLOOR((b.mx - b.mn) / 2.0)
                                     AS BIGINT)
                  THEN 0 ELSE 1 END AS period,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS rev
      FROM orders, b GROUP BY 1, 2
    ),
    bounds AS (
      SELECT period,
             quantile_cont(rev, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
               AS bs
      FROM pr GROUP BY 1
    ),
    dec_ AS (
      SELECT pr.ck, pr.period,
             CAST(len(list_filter(bounds.bs, x -> x < pr.rev))
                  AS BIGINT) AS d
      FROM pr JOIN bounds ON bounds.period = pr.period
    ),
    mat AS (
      SELECT a.d AS d1, c.d AS d2, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM dec_ WHERE period = 0) a
      JOIN (SELECT * FROM dec_ WHERE period = 1) c ON c.ck = a.ck
      GROUP BY 1, 2
    ),
    rows_ AS (SELECT d1, CAST(SUM(n) AS BIGINT) AS rn FROM mat
              GROUP BY 1),
    sh AS (
      SELECT ROUND((10.0 - CAST(SUM(CAST(
               CASE WHEN m.d1 = m.d2
                    THEN CAST(m.n AS DOUBLE) / r.rn ELSE 0 END
               AS DECIMAL(30,10))) AS DOUBLE)) / 9.0, 4) AS mob
      FROM mat m JOIN rows_ r ON r.d1 = m.d1
    )
    SELECT m.d1 AS decile_from, m.d2 AS decile_to,
           m.n AS n_customers,
           {sql_dratio_round('m.n', 'r.rn')} AS row_share,
           (SELECT mob FROM sh) AS shorrocks_mobility
    FROM mat m JOIN rows_ r ON r.d1 = m.d1
    ORDER BY decile_from, decile_to
    """,
    doc="Revenue-decile mobility matrix between the two halves of the "
    "order history, with the Shorrocks mobility index "
    "(k − trace(P))/(k−1) — the customer-dynamics view RFM snapshots "
    "(q259) and cohort LTV curves (q240) both miss: a business can "
    "hold every aggregate steady while customers churn violently "
    "between value tiers. Decile assignment is the q45 "
    "percentile-bound discipline (bounds per period, bucket = a "
    "PURE comparison function of the row's revenue — never ntile "
    "over a 2-partition window, which would serialize at scale). "
    "Scale shape: one (customer, period) fold, two 9-element "
    "quantile aggs broadcast to the assignment, a customer-keyed "
    "self-join, 100-cell output.",
)
@plan_cache
def q432(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    b = o.agg(F.min(day).alias("mn"), F.max(day).alias("mx")).select(
        (F.col("mn") + F.floor((F.col("mx") - F.col("mn")) / 2.0)).alias("c")
    )
    pr = (
        o.select("o_custkey", day.alias("dd"), "o_totalprice")
        .crossJoin(F.broadcast(b))
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.when(F.col("dd") < F.col("c"), 0).otherwise(1).alias("period"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("rev")
        )
    )
    bounds = pr.groupBy(F.col("period").alias("pb")).agg(
        F.expr(
            "percentile(rev, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("bs")
    )
    dec_ = pr.join(
        F.broadcast(bounds), F.col("pb") == F.col("period")
    ).select(
        "ck",
        "period",
        F.expr("CAST(size(filter(bs, x -> x < rev)) AS BIGINT)").alias("d"),
    )
    a = dec_.where(F.col("period") == 0).select("ck", F.col("d").alias("d1"))
    c2 = dec_.where(F.col("period") == 1).select(
        F.col("ck").alias("ck2"), F.col("d").alias("d2")
    )
    mat = (
        a.join(c2, F.col("ck2") == F.col("ck"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()
    )
    rows_ = mat.groupBy(F.col("d1").alias("rd")).agg(
        F.sum("n").cast("bigint").alias("rn")
    )
    withr = mat.join(F.broadcast(rows_), F.col("rd") == F.col("d1"))
    sh = withr.agg(
        F.round(
            (
                10.0
                - F.sum(
                    F.when(
                        F.col("d1") == F.col("d2"),
                        F.col("n").cast("double") / F.col("rn"),
                    )
                    .otherwise(0.0)
                    .cast(DEC)
                )
                .cast("double")
            )
            / 9.0,
            4,
        ).alias("mob")
    )
    return (
        withr.crossJoin(F.broadcast(sh))
        .select(
            F.col("d1").alias("decile_from"),
            F.col("d2").alias("decile_to"),
            F.col("n").alias("n_customers"),
            dratio_round(
                F.col("n").cast(DECZ), F.col("rn").cast(DECZ)
            ).alias("row_share"),
            F.col("mob").alias("shorrocks_mobility"),
        )
        .orderBy("decile_from", "decile_to")
    )


@register(
    "q433",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST({sql_dround_units(
                 f"CAST(SUM({sql_units2('l_extendedprice')}) AS HUGEINT)"
                 " * 10000",
                 f"SUM({sql_units2('l_quantity')})")}
                  AS BIGINT) AS pu
      FROM lineitem GROUP BY 1, 2
    ),
    agg AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(pu) AS BIGINT) AS sx,
             CAST(SUM(pu * pu) AS DOUBLE) AS sxx
      FROM ps GROUP BY 1 HAVING COUNT(*) >= 3
    )
    SELECT l_partkey AS partkey, n_suppliers,
           {sql_dratio_round('sx', 'n_suppliers * 10000')} AS mean_price,
           ROUND(sqrt((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                             / n_suppliers)
                      / (n_suppliers - 1))
                 / (CAST(sx AS DOUBLE) / n_suppliers), 4) AS price_cv
    FROM agg
    ORDER BY ROUND(sqrt((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                               / n_suppliers)
                        / (n_suppliers - 1))
                   / (CAST(sx AS DOUBLE) / n_suppliers), 4) DESC, partkey
    LIMIT 15
    """,
    doc="Law-of-one-price dispersion audit: for every part sourced from "
    ">= 3 suppliers, the coefficient of variation of per-supplier "
    "unit prices — the 15 most dispersed parts are where procurement "
    "is leaving money on the table (or where the 'same' part number "
    "hides different goods); the PRICE-side mirror of q381's "
    "volume-concentration risk. Declared semantics (r13 fixed-point "
    "port): spend/qty are QUANTIZED AT INGEST to cents (units2 — "
    "lossless at 2 dp), the per-(part, supplier) unit price is the "
    "EXACT half-up integer division of spend/qty in 1e-4 units "
    "(dround_units — no engine ROUND model involved, killing the "
    "F.round-vs-DuckDB-ROUND boundary flake the old round(6) double "
    "carried), and the moment fold sums LONG unit prices/squares in "
    "codegen; unit scales cancel in the CV. CV round(4) with partkey "
    "tie-break on the ordered-limit cut. Scale shape: two "
    "partial+final hash folds over one fact scan, no joins; top-15 "
    "is an ordered limit.",
)
@plan_cache
def q433(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        dround_units(
            F.sum(units2(F.col("l_extendedprice"))).cast(DECZ)
            * F.lit(10000).cast("decimal(5,0)"),
            F.sum(units2(F.col("l_quantity"))).cast(DECZ),
        )
        .cast("long")
        .alias("pu")
    )
    agg = (
        ps.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("pu").cast("bigint").alias("sx"),
            F.sum((F.col("pu") * F.col("pu")).cast(DECZ))
            .cast("double")
            .alias("sxx"),
        )
        .where(F.col("n_suppliers") >= 3)
    )
    n = F.col("n_suppliers")
    sxd = F.col("sx").cast("double")
    cv = F.round(
        F.sqrt((F.col("sxx") - sxd * sxd / n) / (n - 1)) / (sxd / n),
        4,
    )
    return (
        agg.select(
            F.col("l_partkey").alias("partkey"),
            "n_suppliers",
            dratio_round(
                F.col("sx").cast(DECZ),
                (n * 10000).cast(DECZ),
            ).alias("mean_price"),
            cv.alias("price_cv"),
        )
        .orderBy(F.col("price_cv").desc(), "partkey")
        .limit(15)
    )


@register(
    "q434",
    oracle="""
    WITH maj AS (
      SELECT source, lang AS pred FROM (
        SELECT source, lang,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY COUNT(*) DESC, lang) AS rn
        FROM documents GROUP BY source, lang
      ) WHERE rn = 1
    ),
    lab AS (
      SELECT d.lang AS a, m.pred AS b
      FROM documents d JOIN maj m ON m.source = d.source
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab),
    po AS (
      SELECT CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS DOUBLE)
               / (SELECT n FROM n) AS po
      FROM lab
    ),
    ma AS (SELECT a AS lang, CAST(COUNT(*) AS BIGINT) AS ca
           FROM lab GROUP BY 1),
    mb AS (SELECT b AS lang, CAST(COUNT(*) AS BIGINT) AS cb
           FROM lab GROUP BY 1),
    pe AS (
      SELECT CAST(SUM(CAST(
               (CAST(ma.ca AS DOUBLE) / n.n)
               * (CAST(mb.cb AS DOUBLE) / n.n)
               AS DECIMAL(30,10))) AS DOUBLE) AS pe
      FROM ma JOIN mb ON mb.lang = ma.lang CROSS JOIN n
    )
    SELECT (SELECT n FROM n) AS n_docs,
           ROUND(po.po, 4) AS observed_agreement,
           ROUND(pe.pe, 4) AS chance_agreement,
           ROUND((po.po - pe.pe) / (1 - pe.pe), 4) AS cohens_kappa
    FROM po, pe ORDER BY n_docs
    """,
    doc="Cohen's kappa inter-annotator agreement: the document's true "
    "lang tag against a source-majority heuristic labeler, "
    "chance-corrected — the annotation-pipeline QA metric raw "
    "percent-agreement inflates whenever classes are imbalanced "
    "(here chance agreement is high because one lang dominates, so "
    "kappa is the honest number); the labeling-quality sibling of "
    "q405's embedding-side noise screen. Determinism: majority "
    "labels break ties lexicographically; marginal products are "
    "identical doubles folded in DECIMAL. Scale shape: one "
    "(source, lang) fold for the labeler, a broadcast prediction "
    "join, two marginal folds, closed form on one row.",
)
@plan_cache
def q434(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), "lang"
    )
    # r14 dup-scan fix (v2 probe: 10 documents scans): n/po/ma/mb each
    # re-ran docs JOIN broadcast(maj) — and every broadcast build re-ran
    # maj's own corpus fold. Every aggregate here is a pure function of
    # the (source, lang) cell counts (a doc row contributes its cell's
    # cnt), so fold the corpus ONCE into the tiny cells frame,
    # checkpoint it, and derive maj + the per-(a,b) weighted counts
    # from it: count(rows of docs-join-maj) == sum(cnt) over cells.
    from hive_hw_spark.queries.llm_ops import _managed_persist

    cells = _managed_persist(
        "q434_cells",
        docs.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("cnt")
        ),
    )
    maj = (
        cells.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("source").alias("msrc"), F.col("lang").alias("pred"))
    )
    lab = cells.join(
        F.broadcast(maj), F.col("msrc") == F.col("source")
    ).select(
        F.col("lang").alias("a"), F.col("pred").alias("b"), F.col("cnt")
    )
    n = lab.agg(F.sum("cnt").cast("bigint").alias("n"))
    po = lab.agg(
        F.sum(
            F.when(F.col("a") == F.col("b"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("agree")
    )
    ma = lab.groupBy(F.col("a").alias("lang")).agg(
        F.sum("cnt").cast("bigint").alias("ca")
    )
    mb = lab.groupBy(F.col("b").alias("lang_b")).agg(
        F.sum("cnt").cast("bigint").alias("cb")
    )
    pe = (
        ma.join(F.broadcast(mb), F.col("lang_b") == F.col("lang"))
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                (
                    (F.col("ca").cast("double") / F.col("n"))
                    * (F.col("cb").cast("double") / F.col("n"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("pe")
        )
    )
    return (
        n.crossJoin(F.broadcast(po))
        .crossJoin(F.broadcast(pe))
        .select(
            F.col("n").alias("n_docs"),
            F.round(F.col("agree").cast("double") / F.col("n"), 4).alias(
                "observed_agreement"
            ),
            F.round(F.col("pe"), 4).alias("chance_agreement"),
            F.round(
                (F.col("agree").cast("double") / F.col("n") - F.col("pe"))
                / (1 - F.col("pe")),
                4,
            ).alias("cohens_kappa"),
        )
        .orderBy("n_docs")
    )


@register(
    "q435",
    oracle=f"""
    WITH uf AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS f_freq,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 6) AS f_value_mean,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS DOUBLE)
               AS f_days_active,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS label
      FROM events GROUP BY 1
    ),
    melted AS (
      SELECT 'f_days_active' AS feature, f_days_active AS x, label
      FROM uf
      UNION ALL SELECT 'f_freq', f_freq, label FROM uf
      UNION ALL SELECT 'f_value_mean', f_value_mean, label FROM uf
    ),
    th AS (
      SELECT feature,
             ROUND(CAST(unnest(
               quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]))
               AS DOUBLE), 4) AS t
      FROM melted GROUP BY feature
    ),
    splits AS (
      SELECT m.feature, th.t,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m.label) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN m.x <= th.t THEN 1 ELSE 0 END)
               AS BIGINT) AS nl,
             CAST(SUM(CASE WHEN m.x <= th.t THEN m.label ELSE 0 END)
               AS BIGINT) AS pl
      FROM melted m JOIN th ON th.feature = m.feature
      GROUP BY 1, 2
    ),
    gains AS (
      SELECT feature, t, nl, n - nl AS nr,
             ROUND(
               (1 - POW(CAST(pos AS DOUBLE) / n, 2)
                  - POW(1 - CAST(pos AS DOUBLE) / n, 2))
               - (CAST(nl AS DOUBLE) / n)
                 * (1 - POW(CAST(pl AS DOUBLE) / nl, 2)
                      - POW(1 - CAST(pl AS DOUBLE) / nl, 2))
               - (CAST(n - nl AS DOUBLE) / n)
                 * (1 - POW(CAST(pos - pl AS DOUBLE) / (n - nl), 2)
                      - POW(1 - CAST(pos - pl AS DOUBLE) / (n - nl),
                            2)), 6) AS gain,
             {sql_dratio_round('pl', 'nl')} AS left_rate,
             {sql_dratio_round('pos - pl', 'n - nl')} AS right_rate
      FROM splits WHERE nl > 0 AND nl < n
    )
    SELECT feature, t AS best_threshold, gain AS gini_gain,
           left_rate, right_rate
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
                                   ORDER BY gain DESC, t) AS rn
      FROM gains) WHERE rn = 1
    ORDER BY feature
    """,
    doc="Decision-stump induction (CART's single split): for each churn "
    "feature, the Gini-impurity-optimal threshold among its deciles "
    "— weighted child impurity vs root, best split per feature with "
    "its leaf conversion rates — the actual TREE-LEARNING primitive "
    "(q409's eta² ranks features; this one yields a deployable "
    "rule, and boosting is this step on residuals). Determinism: "
    "thresholds are exact interpolated deciles round(4); gains "
    "round(6) with threshold tie-break. Scale shape: one user fold "
    "(the shared q409 feature frame), a 27-row threshold broadcast "
    "fanned against the melted frame in ONE pass (every split's "
    "counts from a single conditional fold — no per-threshold "
    "re-scan), per-feature argmax windows over 9 rows.",
)
@plan_cache
def q435(spark: SparkSession, sf_dir: str) -> DataFrame:
    uf = _user_features(spark, sf_dir)
    melted = None
    for feat in ["f_days_active", "f_freq", "f_value_mean"]:
        part = uf.select(
            F.lit(feat).alias("feature"), F.col(feat).alias("x"), "label"
        )
        melted = part if melted is None else melted.unionAll(part)
    th = (
        melted.groupBy(F.col("feature").alias("tf"))
        .agg(
            F.expr(
                "percentile(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("qs")
        )
        .select("tf", F.explode("qs").alias("t0"))
        .select("tf", F.round(F.col("t0").cast("double"), 4).alias("t"))
    )
    splits = (
        melted.join(F.broadcast(th), F.col("tf") == F.col("feature"))
        .groupBy("feature", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
            F.sum(F.when(F.col("x") <= F.col("t"), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(
                F.when(F.col("x") <= F.col("t"), F.col("label")).otherwise(0)
            )
            .cast("bigint")
            .alias("pl"),
        )
        .where((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
    )
    n, pos, nl, pl = F.col("n"), F.col("pos"), F.col("nl"), F.col("pl")

    def gini(p):
        return 1 - F.pow(p, 2) - F.pow(1 - p, 2)

    gain = F.round(
        gini(pos.cast("double") / n)
        - (nl.cast("double") / n) * gini(pl.cast("double") / nl)
        - ((n - nl).cast("double") / n)
        * gini((pos - pl).cast("double") / (n - nl)),
        6,
    )
    gains = splits.select(
        "feature",
        "t",
        gain.alias("gain"),
        dratio_round(pl.cast(DECZ), nl.cast(DECZ)).alias("left_rate"),
        dratio_round(
            (pos - pl).cast(DECZ), (n - nl).cast(DECZ)
        ).alias("right_rate"),
    )
    w = Window.partitionBy("feature").orderBy(F.col("gain").desc(), "t")
    return (
        gains.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "feature",
            F.col("t").alias("best_threshold"),
            F.col("gain").alias("gini_gain"),
            "left_rate",
            "right_rate",
        )
        .orderBy("feature")
    )


_Q43X_UF_SQL = """
    uf AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS f_freq,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) / COUNT(*)
                   AS DOUBLE), 6) AS f_value_mean,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS DOUBLE)
               AS f_days_active,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS label
      FROM events GROUP BY 1
    )"""


@register(
    "q436",
    oracle=f"""
    WITH""" + _Q43X_UF_SQL + f""",
    melted AS (
      SELECT user_id, 'f_days_active' AS feature, f_days_active AS x,
             label FROM uf
      UNION ALL SELECT user_id, 'f_freq', f_freq, label FROM uf
      UNION ALL SELECT user_id, 'f_value_mean', f_value_mean, label
        FROM uf
    ),
    th AS (
      SELECT feature,
             ROUND(CAST(unnest(
               quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]))
               AS DOUBLE), 4) AS t
      FROM melted GROUP BY feature
    ),
    sp1 AS (
      SELECT m.feature, th.t,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m.label) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN m.x <= th.t THEN 1 ELSE 0 END)
               AS BIGINT) AS nl,
             CAST(SUM(CASE WHEN m.x <= th.t THEN m.label ELSE 0 END)
               AS BIGINT) AS pl
      FROM melted m JOIN th ON th.feature = m.feature
      GROUP BY 1, 2
    ),
    g1 AS (
      SELECT feature, t, nl, n, pl, pos,
             ROUND(
               (1 - POW(CAST(pos AS DOUBLE) / n, 2)
                  - POW(1 - CAST(pos AS DOUBLE) / n, 2))
               - (CAST(nl AS DOUBLE) / n)
                 * (1 - POW(CAST(pl AS DOUBLE) / nl, 2)
                      - POW(1 - CAST(pl AS DOUBLE) / nl, 2))
               - (CAST(n - nl AS DOUBLE) / n)
                 * (1 - POW(CAST(pos - pl AS DOUBLE) / (n - nl), 2)
                      - POW(1 - CAST(pos - pl AS DOUBLE) / (n - nl),
                            2)), 6) AS gain
      FROM sp1 WHERE nl > 0 AND nl < n
    ),
    s1 AS (
      SELECT feature, t, gain,
             {sql_dratio_round('pl', 'nl', 6)} AS lr,
             {sql_dratio_round('pos - pl', 'n - nl', 6)} AS rr
      FROM g1 ORDER BY gain DESC, feature, t LIMIT 1
    ),
    res AS (
      SELECT m.user_id, m2.feature AS f2, m2.x,
             m.label - (CASE WHEN m.x <= s1.t THEN s1.lr
                             ELSE s1.rr END) AS r
      FROM melted m
      JOIN s1 ON s1.feature = m.feature
      JOIN melted m2 ON m2.user_id = m.user_id
    ),
    sp2 AS (
      SELECT r.f2 AS feature, th.t,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r.r AS DECIMAL(30,10))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(r.r * r.r AS DECIMAL(30,10))) AS DOUBLE)
               AS srr,
             CAST(SUM(CASE WHEN r.x <= th.t THEN 1 ELSE 0 END)
               AS BIGINT) AS nl,
             CAST(SUM(CAST(CASE WHEN r.x <= th.t THEN r.r ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE) AS srl,
             CAST(SUM(CAST(CASE WHEN r.x <= th.t THEN r.r * r.r
                           ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
               AS srrl
      FROM res r JOIN th ON th.feature = r.f2
      GROUP BY 1, 2
    ),
    g2 AS (
      SELECT feature, t,
             ROUND((srr - sr * sr / n)
                   - (srrl - srl * srl / nl)
                   - ((srr - srrl)
                      - (sr - srl) * (sr - srl) / (n - nl)), 6)
               AS gain
      FROM sp2 WHERE nl > 0 AND nl < n
    ),
    s2 AS (
      SELECT feature, t, gain FROM g2
      ORDER BY gain DESC, feature, t LIMIT 1
    )
    SELECT CAST(1 AS BIGINT) AS stage, feature, t AS best_threshold,
           'gini_gain' AS criterion, gain
    FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), feature, t, 'sse_gain', gain FROM s2
    ORDER BY stage
    """,
    doc="Gradient-boosting step: stage 1 is the global Gini-best stump "
    "(q435's winner across features, leaf rates as predictions); "
    "stage 2 fits a second stump to the RESIDUALS by SSE reduction "
    "— the literal first boosting iteration (GBM with squared loss "
    "= fit trees to residuals), showing which feature carries the "
    "signal the first split left behind. Determinism: stage-1 leaf "
    "rates round(6) before residuals; both stage selections on "
    "round(6) gains with (feature, threshold) tie-breaks; residual "
    "moments fold in exact DECIMAL. Scale shape: the same "
    "one-pass-per-stage conditional fold as q435 (27 splits per "
    "stage from one scan of the tiny melted user frame); the "
    "residual join is user-keyed over that frame.",
)
@plan_cache
def q436(spark: SparkSession, sf_dir: str) -> DataFrame:
    uf = _user_features(spark, sf_dir)
    melted = None
    for feat in ["f_days_active", "f_freq", "f_value_mean"]:
        part = uf.select(
            "user_id",
            F.lit(feat).alias("feature"),
            F.col(feat).alias("x"),
            "label",
        )
        melted = part if melted is None else melted.unionAll(part)
    melted = melted.localCheckpoint()
    th = (
        melted.groupBy(F.col("feature").alias("tf"))
        .agg(
            F.expr(
                "percentile(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("qs")
        )
        .select("tf", F.explode("qs").alias("t0"))
        .select("tf", F.round(F.col("t0").cast("double"), 4).alias("t"))
        .localCheckpoint()
    )
    n, pos, nl, pl = F.col("n"), F.col("pos"), F.col("nl"), F.col("pl")
    sp1 = (
        melted.join(F.broadcast(th), F.col("tf") == F.col("feature"))
        .groupBy("feature", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
            F.sum(F.when(F.col("x") <= F.col("t"), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(
                F.when(F.col("x") <= F.col("t"), F.col("label")).otherwise(0)
            )
            .cast("bigint")
            .alias("pl"),
        )
        .where((nl > 0) & (nl < n))
    )

    def gini(p):
        return 1 - F.pow(p, 2) - F.pow(1 - p, 2)

    g1 = sp1.select(
        "feature",
        "t",
        F.round(
            gini(pos.cast("double") / n)
            - (nl.cast("double") / n) * gini(pl.cast("double") / nl)
            - ((n - nl).cast("double") / n)
            * gini((pos - pl).cast("double") / (n - nl)),
            6,
        ).alias("gain"),
        dratio_round(pl.cast(DECZ), nl.cast(DECZ), 6).alias("lr"),
        dratio_round(
            (pos - pl).cast(DECZ), (n - nl).cast(DECZ), 6
        ).alias("rr"),
    )
    s1 = (
        g1.orderBy(F.col("gain").desc(), "feature", "t")
        .limit(1)
        .localCheckpoint()
    )
    chosen = melted.join(
        F.broadcast(
            s1.select(
                F.col("feature").alias("cf"),
                F.col("t").alias("ct"),
                "lr",
                "rr",
            )
        ),
        F.col("cf") == F.col("feature"),
    ).select(
        "user_id",
        (
            F.col("label")
            - F.when(F.col("x") <= F.col("ct"), F.col("lr")).otherwise(
                F.col("rr")
            )
        ).alias("r"),
    )
    res = melted.join(
        chosen.withColumnRenamed("user_id", "u2"),
        F.col("u2") == F.col("user_id"),
    ).select("feature", "x", "r")
    sr, srr, srl, srrl = (
        F.col("sr"),
        F.col("srr"),
        F.col("srl"),
        F.col("srrl"),
    )
    sp2 = (
        res.join(F.broadcast(th), F.col("tf") == F.col("feature"))
        .groupBy("feature", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("r").cast(DEC)).cast("double").alias("sr"),
            F.sum((F.col("r") * F.col("r")).cast(DEC))
            .cast("double")
            .alias("srr"),
            F.sum(F.when(F.col("x") <= F.col("t"), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(
                F.when(F.col("x") <= F.col("t"), F.col("r"))
                .otherwise(0.0)
                .cast(DEC)
            )
            .cast("double")
            .alias("srl"),
            F.sum(
                F.when(F.col("x") <= F.col("t"), F.col("r") * F.col("r"))
                .otherwise(0.0)
                .cast(DEC)
            )
            .cast("double")
            .alias("srrl"),
        )
        .where((nl > 0) & (nl < n))
    )
    g2 = sp2.select(
        "feature",
        "t",
        F.round(
            (srr - sr * sr / n)
            - (srrl - srl * srl / nl)
            - ((srr - srrl) - (sr - srl) * (sr - srl) / (n - nl)),
            6,
        ).alias("gain"),
    )
    s2 = g2.orderBy(F.col("gain").desc(), "feature", "t").limit(1)
    return (
        s1.select(
            F.lit(1).cast("bigint").alias("stage"),
            "feature",
            F.col("t").alias("best_threshold"),
            F.lit("gini_gain").alias("criterion"),
            "gain",
        )
        .unionAll(
            s2.select(
                F.lit(2).cast("bigint").alias("stage"),
                "feature",
                F.col("t").alias("best_threshold"),
                F.lit("sse_gain").alias("criterion"),
                "gain",
            )
        )
        .orderBy("stage")
    )


@register(
    "q437",
    oracle="""
    WITH""" + _Q43X_UF_SQL + """,
    split_ AS (
      SELECT user_id, f_freq AS x, label,
             (user_id % 2147483648) * 2654435761 % 100 AS h
      FROM uf
    ),
    fr AS (SELECT CAST(pct AS BIGINT) AS pct
           FROM (VALUES (10), (30), (60)) v(pct)),
    th AS (
      SELECT fr.pct,
             ROUND(CAST(unnest(quantile_cont(s.x,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS DOUBLE), 4)
               AS t
      FROM split_ s JOIN fr ON s.h < fr.pct
      GROUP BY fr.pct
    ),
    sp AS (
      SELECT th.pct, th.t,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s.label) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN s.x <= th.t THEN 1 ELSE 0 END)
               AS BIGINT) AS nl,
             CAST(SUM(CASE WHEN s.x <= th.t THEN s.label ELSE 0 END)
               AS BIGINT) AS pl
      FROM split_ s JOIN th ON s.h < th.pct
      GROUP BY 1, 2
    ),
    g AS (
      SELECT pct, t, nl, n, pl, pos,
             ROUND(
               (1 - POW(CAST(pos AS DOUBLE) / n, 2)
                  - POW(1 - CAST(pos AS DOUBLE) / n, 2))
               - (CAST(nl AS DOUBLE) / n)
                 * (1 - POW(CAST(pl AS DOUBLE) / nl, 2)
                      - POW(1 - CAST(pl AS DOUBLE) / nl, 2))
               - (CAST(n - nl AS DOUBLE) / n)
                 * (1 - POW(CAST(pos - pl AS DOUBLE) / (n - nl), 2)
                      - POW(1 - CAST(pos - pl AS DOUBLE) / (n - nl),
                            2)), 6) AS gain
      FROM sp WHERE nl > 0 AND nl < n
    ),
    best AS (
      SELECT pct, t, gain, n AS train_n,
             CASE WHEN CAST(pl AS DOUBLE) / nl >= 0.5
                  THEN 1 ELSE 0 END AS pred_left,
             CASE WHEN CAST(pos - pl AS DOUBLE) / (n - nl) >= 0.5
                  THEN 1 ELSE 0 END AS pred_right
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY pct
                                     ORDER BY gain DESC, t) AS rn
        FROM g) WHERE rn = 1
    ),
    test_ AS (SELECT x, label FROM split_ WHERE h >= 60),
    acc AS (
      SELECT b.pct, b.t, b.gain, b.train_n,
             ROUND(CAST(SUM(CASE WHEN te.label =
                        (CASE WHEN te.x <= b.t THEN b.pred_left
                              ELSE b.pred_right END)
                        THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
               AS test_accuracy
      FROM best b JOIN test_ te ON TRUE
      GROUP BY 1, 2, 3, 4
    )
    SELECT pct AS train_pct, train_n, t AS best_threshold,
           gain AS train_gain, test_accuracy
    FROM acc ORDER BY train_pct
    """,
    doc="Learning curve for the f_freq decision stump: train on nested "
    "10%/30%/60% hash slices (thresholds re-derived from each "
    "slice's own deciles, Gini-best split, majority-leaf "
    "prediction), evaluate all three on the SAME fixed 40% holdout "
    "— the does-more-data-help curve that decides whether to buy "
    "labels or buy features, and the sample-efficiency counterpart "
    "to q336's temporal CV and q385's power planning. Determinism: "
    "deterministic hash slices (q105's convention), round(4) "
    "thresholds, round(6) gains with threshold tie-breaks, "
    "prediction from rounded-rate majority. Scale shape: one user "
    "fold; all 27 (fraction, threshold) split stats from one "
    "conditional fold over the sliced frame; evaluation is a "
    "3-row broadcast against the holdout.",
)
@plan_cache
def q437(spark: SparkSession, sf_dir: str) -> DataFrame:
    uf = _user_features(spark, sf_dir)
    split_ = uf.select(
        "user_id",
        F.col("f_freq").alias("x"),
        "label",
        (
            (F.col("user_id") % F.lit(2147483648)) * 2654435761 % 100
        ).alias("h"),
    ).localCheckpoint()
    fr = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(30), F.lit(60))).alias("p0")
    ).select(F.col("p0").cast("bigint").alias("pct"))
    th = (
        split_.crossJoin(F.broadcast(fr))
        .where(F.col("h") < F.col("pct"))
        .groupBy("pct")
        .agg(
            F.expr(
                "percentile(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("qs")
        )
        .select("pct", F.explode("qs").alias("t0"))
        .select(
            F.col("pct").alias("tpct"),
            F.round(F.col("t0").cast("double"), 4).alias("t"),
        )
    )
    sp = (
        split_.crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("tpct"))
        .groupBy(F.col("tpct").alias("pct"), "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
            F.sum(F.when(F.col("x") <= F.col("t"), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(
                F.when(F.col("x") <= F.col("t"), F.col("label")).otherwise(0)
            )
            .cast("bigint")
            .alias("pl"),
        )
        .where((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
    )
    n, pos, nl, pl = F.col("n"), F.col("pos"), F.col("nl"), F.col("pl")

    def gini(p):
        return 1 - F.pow(p, 2) - F.pow(1 - p, 2)

    g = sp.select(
        "pct",
        "t",
        "n",
        "nl",
        "pl",
        "pos",
        F.round(
            gini(pos.cast("double") / n)
            - (nl.cast("double") / n) * gini(pl.cast("double") / nl)
            - ((n - nl).cast("double") / n)
            * gini((pos - pl).cast("double") / (n - nl)),
            6,
        ).alias("gain"),
    )
    w = Window.partitionBy("pct").orderBy(F.col("gain").desc(), "t")
    best = (
        g.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "pct",
            "t",
            "gain",
            F.col("n").alias("train_n"),
            F.when(pl.cast("double") / nl >= 0.5, 1).otherwise(0).alias(
                "pred_left"
            ),
            F.when((pos - pl).cast("double") / (n - nl) >= 0.5, 1)
            .otherwise(0)
            .alias("pred_right"),
        )
        .localCheckpoint()
    )
    test_ = split_.where(F.col("h") >= 60).select(
        F.col("x").alias("tx"), F.col("label").alias("tl")
    )
    pred = F.when(
        F.col("tx") <= F.col("t"), F.col("pred_left")
    ).otherwise(F.col("pred_right"))
    return (
        test_.crossJoin(F.broadcast(best))
        .groupBy("pct", "t", "gain", "train_n")
        .agg(
            F.round(
                F.sum(F.when(F.col("tl") == pred, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("test_accuracy")
        )
        .select(
            F.col("pct").alias("train_pct"),
            "train_n",
            F.col("t").alias("best_threshold"),
            F.col("gain").alias("train_gain"),
            "test_accuracy",
        )
        .orderBy("train_pct")
    )


_Q438_Z = "(es / se - 1.959963984540054)"


@register(
    "q438",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
             CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                        THEN user_id END) AS BIGINT) AS n_conv
      FROM events GROUP BY 1
    ),
    base AS (
      SELECT CAST(SUM(n_conv) AS DOUBLE) / CAST(SUM(n_active) AS DOUBLE)
               AS p,
             CAST(SUM(n_active) AS DOUBLE) / COUNT(*) AS daily_n
      FROM daily
    ),
    es_grid AS (SELECT CAST(e AS DOUBLE) / 1000 AS rel_effect
                FROM (VALUES (10), (20), (30), (50), (100)) v(e)),
    terms AS (
      SELECT g.rel_effect,
             p * g.rel_effect AS es,
             sqrt(2 * p * (1 - p)
                  / FLOOR(14 * daily_n / 2)) AS se,
             CAST(FLOOR(14 * daily_n / 2) AS BIGINT) AS n_per_arm,
             ROUND(p, 6) AS baseline_p
      FROM es_grid g CROSS JOIN base
    )
    SELECT rel_effect, n_per_arm, baseline_p,
           ROUND(es, 6) AS abs_effect,
           CASE WHEN se <> 0 THEN ROUND({PHI}, 4)
                ELSE NULL END AS power
    FROM terms ORDER BY rel_effect
    """.replace("{PHI}", _phi_sql(_Q438_Z)),
    doc="Statistical-power sensitivity curve: for relative effect sizes "
    "of 1/2/3/5/10% on the daily purchase-conversion metric at a "
    "fixed 14-day runtime, the achieved power "
    "Phi(effect/SE − z_0.975) — the other axis of q385's MDE table "
    "(q385 fixes power and solves for the effect; this fixes the "
    "effect and reports the power, which is how 'can we even detect "
    "a 2% lift?' actually gets asked). Phi is the shared "
    "Abramowitz-Stegun SQL string (q386/q413); FLOOR spelled "
    "identically for the arm size (q289). Scale shape: one daily "
    "distinct fold, a 5-row effect grid, closed form per row.",
)
@plan_cache
def q438(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_conv"),
    )
    base = daily.agg(
        (
            F.sum("n_conv").cast("double") / F.sum("n_active").cast("double")
        ).alias("p"),
        (F.sum("n_active").cast("double") / F.count(F.lit(1))).alias(
            "daily_n"
        ),
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(F.lit(10), F.lit(20), F.lit(30), F.lit(50), F.lit(100))
        ).alias("e")
    ).select((F.col("e").cast("double") / 1000).alias("rel_effect"))
    n_arm = F.floor(14 * F.col("daily_n") / 2)
    terms = grid.crossJoin(F.broadcast(base)).select(
        "rel_effect",
        (F.col("p") * F.col("rel_effect")).alias("es"),
        F.sqrt(2 * F.col("p") * (1 - F.col("p")) / n_arm).alias("se"),
        n_arm.cast("bigint").alias("n_per_arm"),
        F.round(F.col("p"), 6).alias("baseline_p"),
    )
    # Saturated-conversion guard (q330/q372 class, extended r12):
    # p in {0,1} zeroes the standard error — Spark ANSI raises on
    # es/se inside Phi where DuckDB yields NaN/inf; NULL power both.
    return terms.select(
        "rel_effect",
        "n_per_arm",
        "baseline_p",
        F.round(F.col("es"), 6).alias("abs_effect"),
        F.when(
            F.col("se") != 0, F.round(F.expr(_phi_sql(_Q438_Z)), 4)
        ).alias("power"),
    ).orderBy("rel_effect")


@register(
    "q439",
    oracle="""
    WITH ud AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT)
             + 2 * CAST(MAX(CASE WHEN event_type = 'view' THEN 1
                            ELSE 0 END) AS BIGINT)
             + 4 * CAST(MAX(CASE WHEN event_type = 'signup' THEN 1
                            ELSE 0 END) AS BIGINT) AS s,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY 1, 2
    ),
    subsets AS (SELECT CAST(range AS BIGINT) AS s FROM range(0, 8)),
    v AS (
      SELECT sub.s,
             COALESCE(ROUND(CAST(SUM(ud.conv) AS DOUBLE)
                            / COUNT(ud.conv), 6), 0.0) AS rate
      FROM subsets sub LEFT JOIN ud ON ud.s = sub.s
      GROUP BY 1
    ),
    chans AS (
      SELECT ch, bit FROM (VALUES ('click', 1), ('view', 2),
                                  ('signup', 4)) c(ch, bit)
    ),
    contribs AS (
      SELECT c.ch,
             CASE WHEN
               CAST(v0.s // c.bit AS BIGINT) % 2 = 0
             THEN (CASE WHEN v0.s IN (0, 7 - c.bit)
                        THEN 1.0 / 3 ELSE 1.0 / 6 END)
                  * (v1.rate - v0.rate)
             ELSE 0.0 END AS w
      FROM chans c
      JOIN v v0 ON CAST(v0.s // c.bit AS BIGINT) % 2 = 0
      JOIN v v1 ON v1.s = v0.s + c.bit
    ),
    shap AS (
      SELECT ch,
             ROUND(CAST(SUM(CAST(w AS DECIMAL(30,10))) AS DOUBLE), 6)
               AS shapley
      FROM contribs GROUP BY 1
    ),
    tot AS (
      SELECT GREATEST(CAST(SUM(CAST(ABS(shapley) AS DECIMAL(30,10)))
                  AS DOUBLE), 0.000000000001) AS t
      FROM shap
    )
    SELECT s.ch AS channel, s.shapley,
           ROUND(s.shapley / t.t, 4) AS attribution_share
    FROM shap s, tot t ORDER BY channel
    """,
    doc="Exact Shapley-value attribution over channel-presence "
    "coalitions: with 3 marketing touch types (click / view / "
    "signup) per user-day, the characteristic function v(S) = "
    "conversion rate of user-days with presence set exactly S is "
    "fully observable (8 coalitions), so each channel's Shapley "
    "value — the UNIQUE fair credit split — computes in closed form "
    "with the k=3 weights (1/3 for the empty and complement-of-"
    "singleton margins, 1/6 for the middle) — the attribution gold "
    "standard next to q216/q258/q268's heuristics and q398's Markov "
    "removal effect, exact precisely because the channel count is "
    "small (the 2^k wall is documented: beyond ~10 channels you "
    "sample permutations). Determinism: subset rates round(6), "
    "absent coalitions rate 0, DECIMAL folds, shares normalize by "
    "total ABSOLUTE credit (epsilon-guarded: a saturated corpus can "
    "zero every margin — observed here, conversion ~1 regardless of "
    "touches, making near-zero signed values the HONEST readout). Scale shape: one user-day bitmask fold; "
    "everything after runs on an 8-row frame.",
)
@plan_cache
def q439(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))

    def has(t):
        return F.max(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).cast("bigint")

    ud = ev.groupBy("user_id", day.alias("day")).agg(
        (has("click") + 2 * has("view") + 4 * has("signup")).alias("s"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    subsets = spark.range(0, 8).select(F.col("id").alias("sub"))
    v = (
        subsets.join(ud, F.col("s") == F.col("sub"), "left")
        .groupBy("sub")
        .agg(
            # absent coalition -> rate 0 (ANSI: guard the 0-count divide)
            F.when(
                F.count("conv") > 0,
                F.round(
                    F.sum("conv").cast("double") / F.count("conv"), 6
                ),
            )
            .otherwise(0.0)
            .alias("rate")
        )
        .localCheckpoint()
    )
    chans = spark.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 4)], ["ch", "bit"]
    )
    v0 = v.select(F.col("sub").alias("s0"), F.col("rate").alias("r0"))
    v1 = v.select(F.col("sub").alias("s1"), F.col("rate").alias("r1"))
    contribs = (
        chans.join(
            F.broadcast(v0),
            F.expr("CAST(s0 DIV bit AS BIGINT) % 2 = 0"),
        )
        .join(F.broadcast(v1), F.col("s1") == F.col("s0") + F.col("bit"))
        .select(
            "ch",
            (
                F.when(
                    (F.col("s0") == 0)
                    | (F.col("s0") == 7 - F.col("bit")),
                    1.0 / 3,
                ).otherwise(1.0 / 6)
                * (F.col("r1") - F.col("r0"))
            ).alias("w"),
        )
    )
    shap = contribs.groupBy("ch").agg(
        F.round(F.sum(F.col("w").cast(DEC)).cast("double"), 6).alias(
            "shapley"
        )
    )
    tot = shap.agg(
        F.greatest(
            F.sum(F.abs(F.col("shapley")).cast(DEC)).cast("double"),
            F.lit(1e-12),
        ).alias("t")
    )
    return (
        shap.crossJoin(F.broadcast(tot))
        .select(
            F.col("ch").alias("channel"),
            "shapley",
            F.round(F.col("shapley") / F.col("t"), 4).alias(
                "attribution_share"
            ),
        )
        .orderBy("channel")
    )


@register(
    "q440",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT)
             - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)))
                    AS BIGINT) AS gap
      FROM events
    ),
    th AS (SELECT CAST(m AS BIGINT) * 60 AS gap_s,
                  CAST(m AS BIGINT) AS gap_min
           FROM (VALUES (15), (30), (60)) v(m)),
    agg AS (
      SELECT th.gap_min,
             CAST(SUM(CASE WHEN g.gap IS NULL OR g.gap > th.gap_s
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT g.user_id) AS BIGINT) AS n_users
      FROM gaps g CROSS JOIN th
      GROUP BY 1
    )
    SELECT gap_min, n_sessions,
           {sql_dratio_round('n_events', 'n_sessions')}
             AS avg_events_per_session,
           {sql_dratio_round('n_sessions', 'n_users')}
             AS sessions_per_user
    FROM agg ORDER BY gap_min
    """,
    doc="Sessionization parameter-sensitivity sweep: session counts, "
    "mean session length and sessions-per-user under 15/30/60-minute "
    "inactivity gaps — the audit that says whether the 30-minute "
    "industry convention actually matters on THIS corpus before "
    "q135's materialized sessions and q241's bounce rates inherit "
    "it (a flat curve means any threshold works; a steep one means "
    "the metric suite is an artifact of the knob). Session starts "
    "count as NULL-or-exceeding lag gaps — one number per "
    "threshold, no per-session materialization. Epoch-second gaps "
    "FLOOR'd identically (q289); new-session boundary uses STRICTLY "
    "greater, matching the session-window merge contract. Scale "
    "shape: ONE user-partitioned lag pass fans against a 3-row "
    "broadcast threshold grid; one conditional fold.",
)
@plan_cache
def q440(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap"),
    )
    th = spark.range(1).select(
        F.explode(F.array(F.lit(15), F.lit(30), F.lit(60))).alias("m")
    ).select(
        (F.col("m").cast("bigint") * 60).alias("gap_s"),
        F.col("m").cast("bigint").alias("gap_min"),
    )
    agg = (
        gaps.crossJoin(F.broadcast(th))
        .groupBy("gap_min")
        .agg(
            F.sum(
                F.when(
                    F.col("gap").isNull() | (F.col("gap") > F.col("gap_s")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sessions"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    return agg.select(
        "gap_min",
        "n_sessions",
        dratio_round(
            F.col("n_events").cast(DECZ), F.col("n_sessions").cast(DECZ)
        ).alias("avg_events_per_session"),
        dratio_round(
            F.col("n_sessions").cast(DECZ), F.col("n_users").cast(DECZ)
        ).alias("sessions_per_user"),
    ).orderBy("gap_min")


@register(
    "q441",
    oracle=f"""
    WITH pm AS (
      SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 100
                  + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT)
               AS month_id,
             l.l_partkey,
             CAST(SUM({sql_units2('l.l_extendedprice')}) AS BIGINT)
               AS rev
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT month_id, l_partkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY month_id
                                     ORDER BY rev DESC, l_partkey)
                  AS BIGINT) AS r
      FROM pm
    ),
    nxt AS (
      SELECT DISTINCT a.month_id AS m1, b.month_id AS m2
      FROM (SELECT DISTINCT month_id FROM pm) a
      JOIN (SELECT DISTINCT month_id FROM pm) b
        ON b.month_id = (SELECT MIN(month_id) FROM pm p
                         WHERE p.month_id > a.month_id)
    ),
    pairs AS (
      SELECT n.m2 AS month_id, ra.r AS x, rb.r AS y
      FROM nxt n
      JOIN rk ra ON ra.month_id = n.m1
      JOIN rk rb ON rb.month_id = n.m2
               AND rb.l_partkey = ra.l_partkey
    ),
    s AS (
      SELECT month_id, CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM pairs GROUP BY 1
    )
    SELECT month_id, n_common,
           ROUND((n_common * sxy - sx * sy)
                 / sqrt((n_common * sxx - sx * sx)
                        * (n_common * syy - sy * sy)), 4)
             AS rank_stability
    FROM s WHERE n_common >= 3 ORDER BY month_id
    """,
    doc="Month-over-month rank-stability series: Spearman correlation "
    "(Pearson on revenue ranks) between each month's part ranking "
    "and the previous month's, over parts traded in both — the "
    "TIME-SERIES of ranking churn whose single-step extremes q407's "
    "top-movers report names (a falling stability series says the "
    "catalog's competitive order itself is destabilizing — a leading "
    "indicator no level metric shows). Determinism: revenue is "
    "QUANTIZED AT INGEST to cents (units2 — lossless at 2 dp and "
    "strictly order-preserving, so ranks are unchanged); ranks stay "
    "BIGINT end-to-end and the moment fold sums LONG rank products "
    "in codegen with scale-0 casts (r13 fixed-point port). Scale "
    "shape: one (month, part) fold, per-month rank "
    "windows over the rollup frame, consecutive months linked by a "
    "distinct-months self-join, one moment fold per month pair.",
)
@plan_cache
def q441(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    pm = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            (F.year("od") * 100 + F.month("od"))
            .cast("bigint")
            .alias("month_id"),
            "l_partkey",
        )
        .agg(F.sum(units2(F.col("l_extendedprice"))).alias("rev"))
        .localCheckpoint()
    )
    w = Window.partitionBy("month_id").orderBy(
        F.col("rev").desc(), "l_partkey"
    )
    rk = pm.select(
        "month_id",
        "l_partkey",
        F.row_number().over(w).cast("bigint").alias("r"),
    )
    months = pm.select("month_id").distinct()
    m2 = months.select(F.col("month_id").alias("mb"))
    nxt = (
        months.join(F.broadcast(m2), F.col("mb") > F.col("month_id"))
        .groupBy(F.col("month_id").alias("m1"))
        .agg(F.min("mb").alias("m2"))
    )
    ra = rk.select(
        F.col("month_id").alias("ma"),
        F.col("l_partkey").alias("ka"),
        F.col("r").alias("x"),
    )
    rb = rk.select(
        F.col("month_id").alias("mbb"),
        F.col("l_partkey").alias("kb"),
        F.col("r").alias("y"),
    )
    pairs = (
        nxt.join(ra, F.col("ma") == F.col("m1"))
        .join(
            rb,
            (F.col("mbb") == F.col("m2")) & (F.col("kb") == F.col("ka")),
        )
        .select(F.col("m2").alias("month_id"), "x", "y")
    )
    s = pairs.groupBy("month_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.sum(F.col("x").cast(DECZ)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DECZ)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DECZ))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DECZ))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DECZ))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n_common")
    return (
        s.where(n >= 3)
        .select(
            "month_id",
            "n_common",
            F.round(
                (n * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(
                    (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * (n * F.col("syy") - F.col("sy") * F.col("sy"))
                ),
                4,
            ).alias("rank_stability"),
        )
        .orderBy("month_id")
    )


@register(
    "q442",
    oracle="""
    WITH s AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS r
      FROM lineitem GROUP BY 1
    ),
    w AS (
      SELECT l_suppkey, n, r,
             CAST(r AS DOUBLE) / n AS p,
             (CAST(r AS DOUBLE) / n + 1.9208 / n
              - 1.96 * sqrt((CAST(r AS DOUBLE) / n)
                            * (1 - CAST(r AS DOUBLE) / n) / n
                            + 0.9604 / (n * n)))
             / (1 + 3.8416 / n) AS lb
      FROM s WHERE n >= 10
    )
    SELECT l_suppkey AS suppkey, n AS n_lineitems, r AS n_returned,
           ROUND(p, 4) AS return_rate,
           ROUND(lb, 6) AS wilson_lower_bound
    FROM w ORDER BY ROUND(lb, 6) DESC, suppkey LIMIT 10
    """,
    doc="Supplier quality leaderboard ranked by the WILSON LOWER BOUND "
    "of the return rate (z=1.96; the 'how not to sort by average' "
    "correction): a supplier with 3/5 returns must NOT outrank one "
    "with 400/1000, and the raw rate sorts exactly that way — the "
    "lower confidence bound is the principled small-n ranking, here "
    "surfacing the 10 suppliers whose HIGH return rate is "
    "statistically confident (>=10 lineitems); composes q319's "
    "Wilson interval into a ranking decision. Determinism: per-row "
    "closed form from integer counts (z constants pre-squared as "
    "literals so both engines evaluate the identical tree), "
    "round(6) bound with suppkey tie-break on the ordered-limit "
    "cut. Scale shape: one supplier fold, per-row arithmetic, "
    "ordered-limit top-10.",
)
@plan_cache
def q442(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
        .where(F.col("n") >= 10)
    )
    n = F.col("n")
    p = F.col("r").cast("double") / n
    lb = (
        p
        + 1.9208 / n
        - 1.96 * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    ) / (1 + 3.8416 / n)
    return (
        s.select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("n").alias("n_lineitems"),
            F.col("r").alias("n_returned"),
            F.round(p, 4).alias("return_rate"),
            F.round(lb, 6).alias("wilson_lower_bound"),
        )
        .orderBy(F.col("wilson_lower_bound").desc(), "suppkey")
        .limit(10)
    )
