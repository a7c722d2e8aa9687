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
from ._util import DEC


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
           ROUND((n_pairs * sxy - sx * sy)
                 / SQRT((n_pairs * sxx - sx * sx)
                        * (n_pairs * syy - sy * sy)), 4) AS acf
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
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"))
    )
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
    return s.select(
        "lag",
        "n_pairs",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            4,
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
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("total")
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("c").alias("c2"))
    # one triangular join yields BOTH the prefix sum and the day index
    cum = (
        daily.join(F.broadcast(d2), F.col("day2") <= F.col("day"))
        .groupBy("day", "c")
        .agg(F.sum("c2").alias("p"), F.count(F.lit(1)).alias("idx"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "d_stat",
            (F.col("n_days") * F.col("p") - F.col("idx") * F.col("total")).cast(
                "long"
            ),
        )
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
    ev = load_table(spark, sf_dir, "events")
    is1 = F.col("event_type") == "error"
    vc = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(is1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(~is1, 1).otherwise(0)).alias("c2"),
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
    cum = (
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
        )
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
    oracle="""
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
           ROUND(CAST(COALESCE(n_obs, 0) AS DOUBLE) / n, 4) AS obs_share,
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
    obs = (
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
        .agg(F.count(F.lit(1)).alias("n_obs"))
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
            F.round(F.col("n_obs").cast("double") / F.col("n"), 4).alias(
                "obs_share"
            ),
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
    tot AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t
      FROM cnt GROUP BY prev_type
    )
    SELECT cnt.prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) / t, 4) AS prob
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
    cnt = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("n").cast("long").alias("t"))
    return (
        cnt.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 4).alias("prob"),
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
    oracle="""
    WITH per AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS mon_d
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT custkey,
             CAST(date_diff('day', last_day,
                            (SELECT MAX(last_day) FROM per)) AS BIGINT)
               AS rec_days,
             freq, CAST(mon_d AS DOUBLE) AS mon, mon_d
      FROM per
    ),
    th AS (
      SELECT ROUND(quantile_cont(CAST(rec_days AS DOUBLE), 0.2), 4) AS r1,
             ROUND(quantile_cont(CAST(rec_days AS DOUBLE), 0.4), 4) AS r2,
             ROUND(quantile_cont(CAST(rec_days AS DOUBLE), 0.6), 4) AS r3,
             ROUND(quantile_cont(CAST(rec_days AS DOUBLE), 0.8), 4) AS r4,
             ROUND(quantile_cont(CAST(freq AS DOUBLE), 0.2), 4) AS f1,
             ROUND(quantile_cont(CAST(freq AS DOUBLE), 0.4), 4) AS f2,
             ROUND(quantile_cont(CAST(freq AS DOUBLE), 0.6), 4) AS f3,
             ROUND(quantile_cont(CAST(freq AS DOUBLE), 0.8), 4) AS f4,
             ROUND(quantile_cont(mon, 0.2), 4) AS m1,
             ROUND(quantile_cont(mon, 0.4), 4) AS m2,
             ROUND(quantile_cont(mon, 0.6), 4) AS m3,
             ROUND(quantile_cont(mon, 0.8), 4) AS m4
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
             CAST(1 + CAST(mon > m1 AS INT) + CAST(mon > m2 AS INT)
                    + CAST(mon > m3 AS INT) + CAST(mon > m4 AS INT)
                  AS INT) AS m_score,
             mon_d
      FROM m CROSS JOIN th
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(mon_d) AS DOUBLE) / COUNT(*), 4) AS avg_monetary
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="RFM (recency/frequency/monetary) quintile segmentation — the "
    "CRM/marketing staple: each customer scored 1-5 on how recently, "
    "how often, and how much they bought, reported as segment "
    "counts + average spend. Scale shape: the fact table folds to "
    "ONE per-customer agg (single shuffle); quintile boundaries come "
    "from Spark's exact percentile() over that frame (map-side-"
    "combinable partial state — approx_percentile is the documented "
    "100 TB swap, same trade as q47) and are ROUNDED to 4 dp in both "
    "engines before the strict-> threshold compare, so the score is "
    "a pure broadcast function of the row (no rank, no global "
    "window, ntile would be an unpartitioned sort). Monetary sums "
    "stay in exact DECIMAL end to end.",
)
@plan_cache
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("mon_d"),
    )
    anchor = per.agg(F.max("last_day").alias("anchor"))
    m = per.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        F.datediff("anchor", "last_day").cast("bigint").alias("rec_days"),
        "freq",
        F.col("mon_d").cast("double").alias("mon"),
        "mon_d",
    )
    th = m.agg(
        F.expr(
            "transform(percentile(CAST(rec_days AS DOUBLE), "
            "array(0.2D,0.4D,0.6D,0.8D)), t -> round(t, 4))"
        ).alias("rt"),
        F.expr(
            "transform(percentile(CAST(freq AS DOUBLE), "
            "array(0.2D,0.4D,0.6D,0.8D)), t -> round(t, 4))"
        ).alias("ft"),
        F.expr(
            "transform(percentile(mon, array(0.2D,0.4D,0.6D,0.8D)), "
            "t -> round(t, 4))"
        ).alias("mt"),
    )

    def raw(v, t):
        c = F.lit(1)
        for i in (1, 2, 3, 4):
            c = c + (F.col(v) > F.element_at(F.col(t), i)).cast("int")
        return c

    scored = m.crossJoin(F.broadcast(th)).select(
        (F.lit(6) - raw("rec_days", "rt")).cast("int").alias("r_score"),
        raw("freq", "ft").cast("int").alias("f_score"),
        raw("mon", "mt").cast("int").alias("m_score"),
        "mon_d",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum("mon_d").cast("double") / F.count(F.lit(1)), 4
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
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"))
    )
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
