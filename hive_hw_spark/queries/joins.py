"""B-C Joins (SURVEY.md §2 Q20–Q28).

Grounding: the reference's two-phase request/confirm exchange (A27,
master.ino:231-267) is a key-correlated join with a confirm gate; the
positional address↔reading zip (A33, master.ino:467-474) is an equi join
to a dimension. Everything else generalizes to the OLAP join surface.

Scale notes:
- Q20/Q22-Q25 shuffle on the join key (sort-merge under AQE); at 100 TB the
  orders/customer join co-locates if both are bucketed by custkey — the
  query code is unchanged.
- Q21 broadcasts the dim side explicitly: nation/region are KB-sized and a
  shuffle there would be pure waste at any scale.
- Q27 is an equi join on user_id with a range residual — Spark executes it
  as a sort-merge join on user_id, NOT a cartesian product; the per-user
  time filter is applied post-merge. Skewed users would salt.
- Q28 (as-of) deliberately avoids an O(n·m) join: one union + one window
  pass (single shuffle on user_id) — the scalable as-of pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import plan_cache, register


@register(
    "q20",
    oracle="""
    SELECT o_orderkey, c_name FROM orders
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
    doc="Inner equi join (A27/A33 key correlation).",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@register(
    "q21",
    oracle="""
    SELECT r_name, COUNT(*) AS n FROM nation
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="Broadcast hash join: tiny dim explicitly broadcast (plan asserted "
    "in tests/test_plan_shapes.py).",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r_name")
    )


@register(
    "q22",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="Left outer join: customers with order counts including zero "
    "(A25 completeness incl. missing nodes).",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


@register(
    "q23",
    oracle="""
    SELECT COUNT(*) AS n,
           COUNT(s_suppkey) AS n_supp,
           COUNT(c_custkey) AS n_cust
    FROM supplier FULL OUTER JOIN customer ON s_nationkey = c_nationkey
    """,
    doc="Full outer join on nationkey with null-side counts.",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(c, s.s_nationkey == c.c_nationkey, "full").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("s_suppkey").alias("n_supp"),
        F.count("c_custkey").alias("n_cust"),
    )


@register(
    "q24",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left semi join (EXISTS): customers having ≥1 order (A25).",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q25",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left anti join (NOT EXISTS): the reference's 'missing slave' set "
    "(A24/A28 error report, master.ino:552-574).",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q26",
    oracle="SELECT COUNT(*) AS n FROM region CROSS JOIN nation",
    doc="Cross join cardinality.",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q27",
    oracle="""
    SELECT e1.user_id AS user_id, COUNT(*) AS n
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 60 SECOND
    GROUP BY e1.user_id ORDER BY user_id
    """,
    doc="Theta/range self-join: event pairs of the same user within 60 s "
    "(A27 request↔response window). Scale-hardened shape: the join key is "
    "(user_id, minute-bucket) — each left row probes its bucket b and "
    "b+1, so candidate pairs are bounded to adjacent minutes per user "
    "instead of O(rows_per_user²) for the bare user_id key. The time "
    "residual then filters exactly. Same oracle result, bounded per-key "
    "work at any scale.",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .withColumn("b", F.expr("unix_timestamp(ts) div 60"))
    )
    # left side probes its own minute bucket and the next one
    e1 = ev.select(
        "user_id",
        F.col("ts").alias("ts1"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("jb"),
    )
    e2 = ev.select(
        F.col("user_id").alias("user_id2"),
        F.col("ts").alias("ts2"),
        F.col("b").alias("jb2"),
    )
    cond = (
        (F.col("user_id") == F.col("user_id2"))
        & (F.col("jb") == F.col("jb2"))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 60 SECONDS"))
    )
    return (
        e1.join(e2, cond)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("user_id")
    )


@register(
    "q28",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         s AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT p.event_id AS event_id, s.ts AS signup_ts
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY event_id
    """,
    doc="Batch as-of join: each purchase matched to the latest prior-or-equal "
    "signup of the same user. Spark has no native batch ASOF; this is the "
    "scalable union+window emulation — ONE shuffle on user_id, no n×m join "
    "(SURVEY.md §4.3). DuckDB ASOF JOIN is the oracle.",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.col("event_type") == "signup").alias("is_signup"),
        )
    )
    # Order signups before purchases at equal ts so p.ts >= s.ts includes ties.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_signup").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "signup_ts",
            F.last(F.when(F.col("is_signup"), F.col("ts")), ignorenulls=True).over(w),
        )
        .filter(~F.col("is_signup"))
        .select("event_id", "signup_ts")
        .orderBy("event_id")
    )


@register(
    "q131",
    oracle="""
    WITH RECURSIVE chain(s_suppkey, ancestor, depth) AS (
      SELECT s_suppkey, s_suppkey // 10 AS ancestor, 1 AS depth
      FROM supplier
      UNION ALL
      SELECT c.s_suppkey, c.ancestor // 10, c.depth + 1
      FROM chain c WHERE c.ancestor > 0
    )
    SELECT s_suppkey, CAST(ancestor AS BIGINT) AS ancestor,
           CAST(depth AS BIGINT) AS depth
    FROM chain ORDER BY s_suppkey, depth
    """,
    doc="Hierarchy traversal via Spark 4's native WITH RECURSIVE (B-B "
    "extension; the org-chart / bill-of-materials staple): each "
    "supplier's ancestor chain under the deterministic parent rule "
    "parent = key DIV 10 (an acyclic tree of depth <= 5 over this "
    "keyspace), expanded to the root with per-hop depth. Engine "
    "constraint honored: Spark's recursive CTEs support UNION ALL "
    "only, so this operator targets ACYCLIC hierarchies — cyclic "
    "transitive closure (near-dup reachability) uses the "
    "neardup_components label-propagation loop instead, which "
    "converges on cycles (q118's docstring contrasts the two). Scale "
    "shape: each iteration is one filter+project over the frontier "
    "rows only (no re-join against the full table), depth-bounded; "
    "the identical SQL text runs on the DuckDB oracle.",
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "supplier_q131"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain(s_suppkey, ancestor, depth) AS (
          SELECT s_suppkey, s_suppkey DIV 10 AS ancestor, 1 AS depth
          FROM supplier_q131
          UNION ALL
          SELECT c.s_suppkey, c.ancestor DIV 10, c.depth + 1
          FROM chain c WHERE c.ancestor > 0
        )
        SELECT s_suppkey, CAST(ancestor AS BIGINT) AS ancestor,
               CAST(depth AS BIGINT) AS depth
        FROM chain ORDER BY s_suppkey, depth
        """
    )


@register(
    "q134",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders o
    WHERE s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape — the hardest classic subquery pattern: a "
    "correlated EXISTS plus a correlated NOT EXISTS against the same "
    "fact table ('suppliers whose line was the only returned line in "
    "a multi-supplier finished order'). The oracle keeps the textbook "
    "correlated form; the engine plans it as the AGGREGATION REWRITE "
    "a 100 TB run needs: one partial+final agg over lineitem computes "
    "per-order (distinct suppliers, distinct returned suppliers) — "
    "exactly the two facts both subqueries ask — then the returned "
    "lines join those order stats and the F-orders on l_orderkey "
    "(every shuffle on the SAME key, co-partitioned, AQE-coalesced) "
    "and the 100-row supplier dim broadcasts. The naive plan is two "
    "extra shuffles of the full fact table through semi/anti self-"
    "joins; this is one. Deterministic top-20: unique s_name "
    "tie-break, TakeOrderedAndProject (never a global sort).",
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    # two-level agg instead of two countDistinct()s: the Expand node
    # those plan doubles every fact row per distinct column; collapsing
    # to (orderkey, suppkey) first is one ordinary partial+final pass
    # and the reduced frame is orderkey-partitioned for the second agg
    stats = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("has_r")
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("has_r").alias("n_r_supp"),
        )
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_orderkey").alias("l_orderkey")
            ),
            "l_orderkey",
        )
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .join(
            F.broadcast(
                supp.select(
                    F.col("s_suppkey").alias("l_suppkey"), "s_name"
                )
            ),
            "l_suppkey",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q138",
    oracle="""
    SELECT DISTINCT l.l_partkey AS p_partkey, s_name,
           l.l_extendedprice AS min_price
    FROM lineitem l JOIN supplier ON s_suppkey = l.l_suppkey
    WHERE l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
    ORDER BY p_partkey, s_name
    """,
    doc="TPC-H Q2 shape — min-cost supplier per part (the correlated "
    "scalar-MIN subquery classic, reshaped for this schema's "
    "lineitem-as-partsupp link). The oracle keeps the textbook "
    "correlated form; the engine plans the DECORRELATED rewrite every "
    "100 TB optimizer wants: one partial+final MIN agg per part, then "
    "a self-join of the fact against its own group-mins ON THE SAME "
    "KEY — both shuffles hash on l_partkey, so under AQE the join is "
    "co-partitioned with zero extra exchanges — and the 100-row "
    "supplier dim broadcasts. Ties (several suppliers at the min "
    "price) are kept, deduped, and totally ordered on the unique "
    "(part, supplier-name) pair. MIN over doubles is selection, not "
    "accumulation, so no decimal discipline is needed for parity.",
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier")
    mins = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    ).select(F.col("l_partkey").alias("mp_partkey"), "min_price")
    return (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"), "l_suppkey", "min_price"
        )
        .join(
            F.broadcast(
                supp.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
            ),
            "l_suppkey",
        )
        .select("p_partkey", "s_name", "min_price")
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


# Bloom-filter build parameters for q141: M bits as W 64-bit words, k
# independent xxhash64 seeds. Fill factor at sf0.01 (~300 keys × 2 bits
# over 8192) is ~7%, FPR ≈ 0.5%; both scale with dim cardinality only.
_Q141_BITS = 8192
_Q141_WORDS = _Q141_BITS // 64
_Q141_SEEDS = (101, 202)


def _q141_pos_sql(key_sql: str, seed: int) -> str:
    """SQL text of one bloom bit position — xxhash64(key, seed) mod M."""
    return f"pmod(xxhash64({key_sql}, {seed}), {_Q141_BITS})"


@register(
    "q141",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Bloom-filter pre-shuffle join pruning (the runtime-filter / "
    "sideways-information-passing pattern, hand-rolled so the mechanism "
    "is explicit; Spark's own spark.sql.optimizer.runtimeFilter."
    "bloomFilter does the same transparently when enabled): the "
    "filtered dim's keys are folded into an 8192-bit bloom — each key "
    "sets k=2 xxhash64-seeded bits; the per-word OR is one map-side-"
    "combinable bit_or hash agg, i.e. the sketch algebra is mergeable "
    "across 1000 executors exactly like q111's count-min — and the "
    "finished ONE-ROW bitset (1 KB at any scale) is gathered by the "
    "driver and injected as a literal fact-side predicate that drops "
    "non-members BEFORE the join shuffle — the same gather-and-"
    "reinject mechanism Spark's runtime filter uses, and the only way "
    "the filter provably sits BELOW the join (a crossJoin'd bitset "
    "column is reorderable above the semi join). Membership can "
    "false-positive but never false-negative (unit-tested), so the "
    "exact semi join after it returns exactly the unfiltered answer — "
    "the bloom only cuts shuffle volume, by ~the dim selectivity "
    "(here 80%). At 100 TB this is the difference between shuffling "
    "the whole fact table and shuffling the matching fifth.",
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim_keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    # build: explode each key's k positions, OR per-word masks in ONE agg
    pos_array = ", ".join(
        _q141_pos_sql("c_custkey", s) for s in _Q141_SEEDS
    )
    pos = dim_keys.selectExpr(
        f"explode(array({pos_array})) AS p"
    ).selectExpr(
        "CAST(p DIV 64 AS INT) AS w",
        "shiftleft(1L, CAST(p % 64 AS INT)) AS m",
    )
    # r14: fold per WORD (<=128 groups, one bit_or each) instead of the
    # r13 single-group agg with 128 conditional bit_or accumulators —
    # that form evaluated 128 `when(w == i, m)` branches PER INPUT ROW
    # and carried a 128-expression tree through analysis (isolated A/B:
    # build 1.34 s -> 0.23 s, bitsets bit-identical). The per-word hash
    # agg is the mergeable sketch algebra the op doc states; missing
    # words (no key hashed into them) stay 0 exactly as coalesce(...,0)
    # produced.
    wb = pos.groupBy("w").agg(F.bit_or("m").alias("mask")).collect()
    # Inject the finished bitset as a LITERAL predicate, the way Spark's
    # own runtime filter does (subquery result gathered by the driver,
    # re-broadcast as part of the plan): a crossJoin'd bitset column is
    # legal but Catalyst may reorder the cross join ABOVE the semi join,
    # which defeats the pruning. The gather is <=128 (word, mask) rows
    # (1 KB) regardless of input scale — the build stays distributed.
    words = [0] * _Q141_WORDS
    for r in wb:
        words[r["w"]] = r["mask"]
    blit = F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    member = None
    for s in _Q141_SEEDS:
        w = F.expr(f"CAST({_q141_pos_sql('o_custkey', s)} DIV 64 AS INT)")
        m = F.expr(
            f"shiftleft(1L, CAST({_q141_pos_sql('o_custkey', s)} % 64 AS INT))"
        )
        hit = (F.element_at(blit, w + F.lit(1)).bitwiseAND(m)) != 0
        member = hit if member is None else (member & hit)
    pruned = orders.select("o_custkey", "o_orderpriority").filter(member)
    return (
        pruned.join(
            dim_keys,
            pruned.o_custkey == dim_keys.c_custkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


# Price-band dimension for q148 — the tiny range table the oracle joins
# against and the engine compiles away. (lo inclusive, hi exclusive).
_Q148_BANDS = (
    (0, 50_000, "B1"),
    (50_000, 100_000, "B2"),
    (100_000, 200_000, "B3"),
    (200_000, 300_000, "B4"),
    (300_000, None, "B5"),
)


@register(
    "q148",
    oracle="""
    WITH bands(lo, hi, band) AS (VALUES
      (0, 50000, 'B1'), (50000, 100000, 'B2'), (100000, 200000, 'B3'),
      (200000, 300000, 'B4'), (300000, NULL, 'B5'))
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
             AS revenue
    FROM orders JOIN bands
      ON o_totalprice >= lo AND (hi IS NULL OR o_totalprice < hi)
    GROUP BY band ORDER BY band
    """,
    doc="Range-band dimension lookup WITHOUT the theta join (the "
    "IP-range / price-tier / SLA-bucket lookup staple): the oracle "
    "states the textbook BETWEEN join against a tiny range table — "
    "which Spark can only execute as a broadcast NESTED-LOOP join, "
    "O(rows × bands) comparisons and no codegen-friendly probe. The "
    "engine compiles the 5-row band dim into a per-row CASE chain "
    "(the sorted-boundary binary-search lookup, unrolled), so band "
    "assignment is pure whole-stage-codegen scan work: zero joins, "
    "zero extra comparisons beyond the boundary count, one "
    "map-side-combinable agg. The compile-away is valid whenever the "
    "range dim is small and static per run — exactly the broadcast "
    "criterion; a 10^6-row range dim would instead bucket both sides "
    "by range stripe (q27's minute-bucket idiom).",
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = None
    for lo, hi, label in reversed(_Q148_BANDS):
        cond = F.col("o_totalprice") >= lo
        if band is None:
            band = F.when(cond, label)
        else:
            band = band.when(cond, label)
    return (
        orders.select(band.alias("band"), "o_totalprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # scale-4 accumulator: o_totalprice is exact at 2 dp, and at
            # scale 4 the unscaled sum stays under 2^53, so the final
            # decimal->double conversion is bit-identical across engines
            # (DuckDB's int128->double truncates above 2^53, probed r10)
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("band")
    )


@register(
    "q151",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,10))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape — shipping-priority top-10 (the canonical "
    "filter→join→agg→top-k pipeline; reference analog: the hourly "
    "round's filtered fan-in, master.ino:151-169). Scale shape: the "
    "segment filter prunes customer BEFORE its join (predicate "
    "pushdown reaches the parquet scan), orders⋈lineitem shuffles on "
    "the orderkey both sides already share, and the final top-10 is "
    "TakeOrderedAndProject — per-partition heaps, only 10 rows per "
    "task reach the driver, never a global sort. Revenue uses the "
    "exact DECIMAL accumulator (order-independent bit parity), and "
    "the order-by is total via the unique orderkey tie-break. The "
    "date cutoffs make it the 'unshipped revenue' report: ordered "
    "before the cutoff, shipped after.",
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1998-07-01"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1998-07-01"
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                F.col("o_custkey") == F.col("c_custkey"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,10)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q152",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,10))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape — local-supplier volume by nation (the 6-way "
    "snowflake join with the n1=n2 'local' residual). Scale shape: "
    "region→nation prunes to the ASIA nations and BROADCASTS (KB-"
    "sized dims — shuffling them at any scale is waste), supplier "
    "broadcasts too (100 rows), so the only real shuffles are the "
    "fact-side orders⋈customer (custkey) and lineitem⋈orders "
    "(orderkey); the 'supplier in the customer's nation' condition "
    "rides the broadcast join as a residual instead of a second "
    "fact shuffle. Year filter prunes orders at the scan. Exact "
    "DECIMAL revenue; total order by (revenue desc, unique n_name). "
    "plan_cache (r14): Catalyst analysis of the 5-join snowflake "
    "tree costs ~0.3-0.5 s of driver time per build — the prepared-"
    "statement memo pays it once per (session, sf_dir); every "
    "invocation still executes fully.",
)
@plan_cache
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    asia_nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "c_nationkey", "n_name"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,10)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q153",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,10))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape — product-line profit by supplier nation and "
    "order year (this schema has no partsupp/supplycost, so profit is "
    "the discounted revenue — the join/agg SHAPE is what Q9 "
    "exercises). Scale shape: the p_name LIKE filter prunes part "
    "before anything joins it, and the pruned part key set plus "
    "supplier→nation both BROADCAST into the lineitem scan — the "
    "lineitem rows surviving the part semi-filter are the only ones "
    "that reach the single fact-fact shuffle (lineitem⋈orders on "
    "orderkey). GROUP BY (nation, year) is two dozen groups — "
    "partial agg collapses almost everything map-side. Exact "
    "DECIMAL profit; total order on the (nation, year) pair.",
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount",
    )
    return (
        li.join(
            F.broadcast(part_red.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supp_nation),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,10)"
                )
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q163",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY name_a, name_b
    """,
    doc="Fuzzy string matching / entity resolution — name pairs within "
    "edit distance 2, found WITHOUT the all-pairs cross join (the "
    "record-linkage staple: product titles, author names, address "
    "lines). Discipline: (1) resolve over the DISTINCT name "
    "dictionary, never the fact table — dictionary cardinality is "
    "what matters at 100 TB; (2) block on a SOUND key: edit distance "
    "<= 2 implies length difference <= 2, so bucketing names by "
    "floor(len/3) and exploding one side to its 3 adjacent buckets "
    "is a complete cover (same band-join idiom as q27's minute "
    "buckets / q102b's norm bands) — the join becomes an equi join "
    "on the bucket key and Levenshtein runs only inside bands; "
    "(3) the cheap length filter re-checks before the O(len^2) "
    "metric. Each unordered pair survives exactly once (the "
    "exploded side must hold the lexically smaller name). The "
    "oracle brute-forces the same semantics O(n^2) — the blocked "
    "plan must match it row-for-row, proving the cover loses "
    "nothing.",
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    bucket = F.floor(F.length("p_name") / 3)
    left = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bk"),
    )
    right = names.select(
        F.col("p_name").alias("name_b"), bucket.alias("bk")
    )
    return (
        left.join(right, "bk")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= 2
            )
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
        .where(F.col("dist") <= 2)
        .orderBy("name_a", "name_b")
    )


@register(
    "q172",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape — priority counts of orders with a late-shipped "
    "line (EXISTS with a CROSS-side residual: the subquery predicate "
    "compares l_shipdate to the OUTER row's o_orderdate, this "
    "schema's stand-in for Q4's commit/receipt lag). The engine "
    "plans the decorrelation every optimizer wants: LEFT SEMI join "
    "on orderkey with the cross-side comparison as a join residual "
    "— the fact-fact shuffle hashes on the key both tables already "
    "share, the date filter prunes orders at the scan, and the semi "
    "join short-circuits per order (no row multiplication, no "
    "distinct). One quarter of data, five output rows, all partial-"
    "agg combinable.",
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q176",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand
    ORDER BY supplier_cnt DESC, p_brand
    """,
    doc="TPC-H Q16 shape — distinct supplier count per brand over a "
    "part-attribute slice, with an EXCLUSION subquery (suppliers in "
    "deficit stand in for Q16's complaint list; lineitem is this "
    "schema's partsupp link). Plan discipline: the p_size IN slice "
    "prunes part BEFORE its broadcast into lineitem; the NOT IN "
    "subquery — the classic null-trap — is safe here (s_suppkey is "
    "non-null) and the engine states it as a LEFT ANTI join against "
    "the broadcast deficit list, which is how a 100 TB plan should "
    "always spell NOT IN; the count-distinct expands to the "
    "dedup-then-count two-phase (q31/q157 shape), both shuffles on "
    "the same grouping key. Total order on (count DESC, unique "
    "brand).",
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_slice = load_table(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            F.broadcast(part_slice.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand")
    )


@register(
    "q177",
    oracle="""
    WITH t AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10)))
                  / COUNT(*) AS DOUBLE) AS thresh
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
             AS totacctbal
    FROM customer, t
    WHERE c_acctbal > thresh
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape — 'global sales opportunity': wealthy-but-"
    "inactive customers per nation (balance above the positive-"
    "balance average, zero orders). Three classic pieces composed: "
    "an uncorrelated scalar aggregate (exact-DECIMAL mean cast to "
    "one double, broadcast as a 1-row frame — the q48 discipline), "
    "a NOT EXISTS stated as a LEFT ANTI join on custkey (q25), and "
    "the final nation rollup with the DECIMAL balance sum. The anti "
    "join is the only fact-fact shuffle; the threshold compare is "
    "identical IEEE on both engines because the mean derives from "
    "exact decimal sums.",
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    thresh = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("thresh")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("thresh"))
        .join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q202",
    oracle="""
    WITH c AS (
      SELECT NULLIF(c_nationkey % 5, 0) AS grp,
             CAST(COUNT(*) AS BIGINT) AS c_cnt
      FROM customer GROUP BY grp
    ), s AS (
      SELECT NULLIF(s_nationkey % 5, 0) AS grp,
             CAST(COUNT(*) AS BIGINT) AS s_cnt
      FROM supplier GROUP BY grp
    )
    SELECT c.grp AS grp, c_cnt, s_cnt, c_cnt * s_cnt AS pairs
    FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
    ORDER BY grp NULLS LAST
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM) — B-B "
    "extension: both sides derive a NULLable group key (the A24 "
    "sentinel rule: bucket 0 means 'missing' and becomes NULL), and "
    "the join must MATCH the NULL groups to each other — plain "
    "equality silently drops every sentinel row because NULL = NULL "
    "is NULL. Scale shape: both sides pre-aggregate to one row per "
    "group BEFORE the join (agg-then-join — the shuffle carries "
    "distinct groups, not raw rows); Spark plans <=> as a normal "
    "hash join on a null-safe key, not a nested loop. Explicit "
    "NULLS LAST because the engines' default null order differs "
    "(Spark NULLS FIRST asc, DuckDB NULLS LAST asc).",
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .select(F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("sgrp"))
        .groupBy("sgrp")
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return (
        c.join(s, F.col("grp").eqNullSafe(F.col("sgrp")))
        .select(
            "grp",
            "c_cnt",
            "s_cnt",
            (F.col("c_cnt") * F.col("s_cnt")).alias("pairs"),
        )
        .orderBy(F.col("grp").asc_nulls_last())
    )


_Q203_SQL = """
    SELECT r_name, t.n_name, t.n_cust
    FROM region, LATERAL (
      SELECT n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_cust
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      WHERE n_regionkey = r_regionkey
      GROUP BY n_name
      ORDER BY n_cust DESC, n_name
      LIMIT 2
    ) t
    ORDER BY r_name, n_cust DESC, n_name
"""


@register(
    "q203",
    oracle=_Q203_SQL,
    doc="LATERAL correlated subquery join (B-B completion; Spark 3.2+ "
    "surface): for each region, the top-2 nations by customer count — "
    "the per-outer-row parameterized subquery SQL users reach for "
    "when a window rewrite is non-obvious. The SAME SQL text runs on "
    "both engines. Catalyst DECORRELATES the lateral into a "
    "join + per-group window rank (DomainJoin rewrite) rather than "
    "executing the subquery once per outer row — so the plan scales "
    "like q52's top-k-per-group (one shuffle on the correlation "
    "key), not like a nested loop. The 5-row outer side keeps the "
    "decorrelation overhead trivial; a fact-sized outer side would "
    "make the window rewrite (q52) the explicit choice.",
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("region", "nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q203_SQL)


_Q233_COORD_SQL = """
      SELECT c_custkey,
             45.0 + ((c_custkey % 2147483648) * 2654435761 % 2000) / 1000.0
               AS lat,
             7.0 + ((c_custkey % 2147483648) * 1103515245 % 2000) / 1000.0
               AS lon
      FROM customer
"""


@register(
    "q233",
    oracle="""
    WITH pts AS (
    """
    + _Q233_COORD_SQL
    + """
    )
    SELECT a.c_custkey AS k1, b.c_custkey AS k2,
           ROUND(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(b.lat - a.lat) / 2), 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * pow(sin(radians(b.lon - a.lon) / 2), 2))), 4) AS dist_km
    FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
    WHERE 2 * 6371.0 * asin(sqrt(
            pow(sin(radians(b.lat - a.lat) / 2), 2)
            + cos(radians(a.lat)) * cos(radians(b.lat))
              * pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 2.0
    ORDER BY k1, k2
    """,
    doc="Spatial distance join via GRID BUCKETING (B-F extension; the "
    "geo sibling of q27's time-range self-join): customer pairs "
    "within 2 km, coordinates derived deterministically from the key "
    "(q105's hash) into a 2°×2° region. The oracle states the "
    "textbook all-pairs haversine cross join — O(n²) distance "
    "evals; the engine snaps each point to a grid cell sized >= the "
    "search radius in BOTH axes (0.02° lat, 0.03° lon at 46°N), "
    "explodes each LEFT point to its 3×3 cell neighborhood, and "
    "hash-joins on the cell key — every qualifying pair appears "
    "exactly once (the right point's home cell is one of the left's "
    "nine), candidates shrink from n²/2 to local-density × n, and "
    "the exact haversine verifies per candidate only. This is the "
    "uniform-grid spatial join every engine (PostGIS, Sedona, H3 "
    "bucketing) builds on; skewed cities → finer cells + the q91 "
    "per-bucket cap. Same IEEE formula both engines; threshold on "
    "the unrounded distance, output round(4).",
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    h = (F.col("c_custkey") % F.lit(2147483648)).cast("bigint")
    pts = cust.select(
        "c_custkey",
        (F.lit(45.0) + (h * 2654435761 % 2000) / 1000.0).alias("lat"),
        (F.lit(7.0) + (h * 1103515245 % 2000) / 1000.0).alias("lon"),
    )
    s_lat, s_lon = 0.02, 0.03
    with_cell = pts.select(
        "*",
        F.floor(F.col("lat") / s_lat).cast("int").alias("cx"),
        F.floor(F.col("lon") / s_lon).cast("int").alias("cy"),
    )
    left = with_cell.select(
        F.col("c_custkey").alias("k1"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> "
                "struct(cx + dx AS x, cy + dy AS y))))"
            )
        ).alias("cell"),
    ).select("k1", "lat1", "lon1", "cell.x", "cell.y")
    right = with_cell.select(
        F.col("c_custkey").alias("k2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.col("cx").alias("x"),
        F.col("cy").alias("y"),
    )
    dist = (
        F.lit(2.0)
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat2") - F.col("lat1")) / 2), 2)
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.pow(
                    F.sin(F.radians(F.col("lon2") - F.col("lon1")) / 2), 2
                )
            )
        )
    )
    return (
        left.join(right, ["x", "y"])
        .where(F.col("k1") < F.col("k2"))
        .where(dist <= 2.0)
        .select("k1", "k2", F.round(dist, 4).alias("dist_km"))
        .orderBy("k1", "k2")
    )
