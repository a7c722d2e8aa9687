"""Shared expression helpers for oracle-parity determinism.

Floating-point sums are order-dependent; Spark's parallel partial/final
aggregation and DuckDB's sequential scan can disagree in the last ulp,
which breaks value-hash parity. Rule: every SUM/AVG over a double that
feeds an oracle-checked result goes through an exact DECIMAL accumulator
(bit-identical in both engines), then back to double. This costs nothing
at scale — decimal partial aggregation is still map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str, ndigits: int = 4) -> Column:
    """Exact-accumulator average rounded to ``ndigits`` (oracle-stable).

    The ratio itself is computed in exact integer arithmetic (see
    :func:`dratio_round`): Spark's decimal division rounds its quotient
    half-up at the result scale while DuckDB's decimal ``/`` degrades to
    IEEE double, so the two engines' quotients differ near (and exactly
    on) ``.5e-ndigits`` boundaries — the q259 r9 driver-red. Multiplying
    both sides by 10^10 turns the scale-10 accumulator into exact
    integer units first.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(10**10).cast("decimal(11,0)")
    num = (F.sum(c.cast(DEC)) * scale).cast(DECZ)
    den = (F.count(c).cast("decimal(20,0)") * scale).cast(DECZ)
    return dratio_round(num, den, ndigits)


DECZ = "decimal(38,0)"


def dfloor_div(a: Column, b: Column) -> Column:
    """Exact floor division of two nonnegative integer-valued decimals.

    Spark decimal ``/`` rounds its quotient to the result scale, so a bare
    ``F.floor(a / b)`` can be off by one when the true quotient sits within
    that rounding of an integer — exactly the boundary case this helper
    exists for. ``(a - pmod(a, b)) / b`` is exact: decimal pmod is exact
    BigDecimal remainder, the difference divides evenly, and rounding an
    exact integer quotient is a no-op.
    """
    return ((a - F.pmod(a, b)) / b).cast(DECZ)


def dratio_round(num: Column, den: Column, ndigits: int = 4) -> Column:
    """Half-away-from-zero round of ``num/den`` to ``ndigits``, exactly.

    ``num`` and ``den`` are integer-valued DECIMAL columns in the same
    unit (``den`` nonzero). The quotient is never materialized in a float
    or a scale-rounded decimal: ``round(|n|/|d| * 10^k)`` is computed as
    ``(2*|n|*10^k + |d|) div (2*|d|)`` in exact integer decimal
    arithmetic, so the result is bit-identical in Spark and DuckDB (via
    :func:`sql_dratio_round`) even when the true ratio sits exactly on a
    ``.5e-ndigits`` rounding boundary — the class that broke q259/q307/
    q317 at the driver's round(4)-string hash granularity in round 9.
    Requires ``|num| * 2 * 10^ndigits < 1e38``. Parity contract:
    ``|num/den| * 10^ndigits < 2^63`` — DuckDB converts int128->double
    by 2^64-halves (two roundings above 2^64), so a larger scaled
    quotient drifts from Spark's correctly-rounded decimal cast
    (hypothesis-found r11); largest registry quotient is q307
    ss_within at 3.1e18. The emitted double is additionally the
    correctly-ROUNDED ratio only below 2^53 — see
    :func:`dratio_round_wide`.
    """
    p = 10**ndigits
    a = (F.abs(num).cast(DECZ) * F.lit(2 * p).cast("decimal(20,0)")).cast(DECZ)
    d = F.abs(den).cast(DECZ)
    q = dfloor_div(a + d, (d * F.lit(2).cast("decimal(2,0)")).cast(DECZ))
    sgn = F.signum(num.cast("double")) * F.signum(den.cast("double"))
    return sgn * (q.cast("double") / F.lit(float(p)))


def dratio_round_wide(num: Column, den: Column, ndigits: int = 4) -> Column:
    """:func:`dratio_round` for quotients whose scaled integer result can
    exceed 2^53 (e.g. a variance in 1e-8 units at 4 output digits).

    PARITY is safe either way while the scaled quotient stays under
    2^63: both engines' integer->double casts agree there (DuckDB's
    int128 cast is exact below 2^64 — single uint64 half — and Spark's
    decimal cast is correctly rounded), so the plain form stays
    bit-identical even above 2^53; the r10-probed divergence is
    specific to SCALED-decimal->double, where DuckDB converts the
    unscaled int128 first and divides by 10^scale second (two
    roundings) while Spark rounds once. What the plain form loses above
    2^53 is ACCURACY: the q->double cast quantizes q to ~ulp(q) > 1, so
    the emitted double is no longer round(ratio, k) — off by up to
    ulp(q)/10^k, which exceeds the 0.5e-k the rounding promised.
    Splitting the quotient into ``whole = q div 10^k`` and
    ``frac = q mod 10^k`` keeps both parts exactly convertible while
    ``|ratio| < 2^53`` (vs ``|ratio| < 2^53 / 10^k``), and
    ``whole + frac/10^k`` runs the same two IEEE ops on the same exact
    inputs in both engines. NONNEGATIVE num/den only (variances,
    counts) — sign handling would need the full dratio_round treatment.
    The |ratio| < 2^53 contract is hard: beyond it DuckDB's
    int128->double cast is itself no longer correctly rounded
    (hypothesis-found at whole ~2.3e19: 4 ulp off Python's float()),
    so no decomposition can restore parity there.
    """
    p = 10**ndigits
    pd = F.lit(p).cast("decimal(9,0)")
    a = (num.cast(DECZ) * F.lit(2 * p).cast("decimal(20,0)")).cast(DECZ)
    d = den.cast(DECZ)
    q = dfloor_div(a + d, (d * F.lit(2).cast("decimal(2,0)")).cast(DECZ))
    whole = dfloor_div(q, pd).cast("double")
    frac = F.pmod(q, pd).cast("double")
    return whole + frac / F.lit(float(p))


def sql_dratio_round_wide(num: str, den: str, ndigits: int = 4) -> str:
    """DuckDB-side mirror of :func:`dratio_round_wide` (nonnegative
    integer-valued ``num``/``den``)."""
    p = 10**ndigits
    q = (
        f"((2*{p}*CAST({num} AS HUGEINT) + CAST({den} AS HUGEINT)) "
        f"// (2*CAST({den} AS HUGEINT)))"
    )
    return (
        f"(CAST({q} // {p} AS DOUBLE) + CAST({q} % {p} AS DOUBLE) / {p}.0)"
    )


def duckdb_round_double(col: Column, ndigits: int = 4) -> Column:
    """Spark mirror of DuckDB's ``ROUND(double, k)``: ``round(x * 10^k)
    / 10^k`` with half-away-from-zero on the IEEE PRODUCT (r11 probe:
    3000/3000 parquet-column values match this model; Python's
    correctly-rounded ``round()`` differed on 106 of them, and Spark's
    own ``F.round(double, k)`` — half-up on the shortest decimal repr —
    differs whenever the product lands on/within an ulp of a .5
    boundary, the q160/q289 regen-fuzz flakes). Use when an output
    must equal a DuckDB-side ROUND of a RAW double; prefer
    dec_ratio/dratio_round when the value has an exact decimal
    accumulator (those bypass both engines' ROUND entirely).
    """
    p = float(10**ndigits)
    x = col * F.lit(p)
    a = F.abs(x)
    f = F.floor(a).cast("double")
    r = f + F.when(a - f >= 0.5, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.signum(x) * r / F.lit(p)


def dround_units(num: Column, den: Column) -> Column:
    """``round_half_up(num/den)`` for NONNEGATIVE integer-valued decimals.

    Exact integer result (DECIMAL(38,0)) via ``floor((2*num+den)/(2*den))``
    — the deterministic quantization used when a per-group quotient (e.g.
    ANOVA's ``sx_g^2 / n_g``) must be folded further: both engines compute
    the identical integer, so downstream sums stay bit-identical.
    """
    two = F.lit(2).cast("decimal(2,0)")
    return dfloor_div(
        (num.cast(DECZ) * two).cast(DECZ) + den.cast(DECZ),
        (den.cast(DECZ) * two).cast(DECZ),
    )


def sql_dround_units(num: str, den: str) -> str:
    """DuckDB-side mirror of :func:`dround_units` (HUGEINT floor division)."""
    return (
        f"((2*CAST({num} AS HUGEINT) + CAST({den} AS HUGEINT)) "
        f"// (2*CAST({den} AS HUGEINT)))"
    )


def sql_dratio_round(num: str, den: str, ndigits: int = 4) -> str:
    """DuckDB-side mirror of :func:`dratio_round`.

    DuckDB has no decimal division (``/`` on decimals returns DOUBLE), so
    the same integer formula runs on HUGEINT with ``//`` floor division.
    ``num``/``den`` must be integer-valued expressions (HUGEINT-castable).
    """
    p = 10**ndigits
    return (
        f"CAST(SIGN({num}) AS DOUBLE) * CAST(SIGN({den}) AS DOUBLE) * "
        f"CAST((2*{p}*CAST(ABS({num}) AS HUGEINT) + CAST(ABS({den}) AS HUGEINT)) "
        f"// (2*CAST(ABS({den}) AS HUGEINT)) AS DOUBLE) / {p}.0"
    )


def dec_ratio(num_dec: Column, den: Column, ndigits: int = 4) -> Column:
    """Exact half-up round of ``num_dec / den`` where ``num_dec`` is a
    scale-10 DECIMAL (e.g. a ``SUM(x.cast(DEC))`` accumulator) and
    ``den`` an integer-valued column. Scales the numerator into 1e-10
    integer units (exact: DECIMAL(38,10) * 10^10 keeps every digit) and
    delegates to :func:`dratio_round` — the replacement for the inline
    ``ROUND((sum / n).cast('double'), 4)`` spelling whose Spark-decimal
    vs DuckDB-IEEE quotients disagree exactly on .5e-4 boundaries.
    """
    scale = F.lit(10**10).cast("decimal(11,0)")
    num = (num_dec * scale).cast(DECZ)
    d = (den.cast("decimal(28,0)") * scale).cast(DECZ)
    return dratio_round(num, d, ndigits)


def sql_dec_ratio(num: str, den: str, ndigits: int = 4) -> str:
    """DuckDB-side mirror of :func:`dec_ratio` (``num`` a DECIMAL(38,10)
    expression, ``den`` integer-valued)."""
    n = f"CAST(({num}) * 10000000000 AS HUGEINT)"
    d = f"(CAST(({den}) AS HUGEINT) * 10000000000)"
    return sql_dratio_round(n, d, ndigits)


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE)"


def dsum4(col: Column | str) -> Column:
    """Exact sum of a value with <= 4 decimal places, as double — with a
    BIT-EXACT decimal->double conversion in both engines.

    The generic scale-10 accumulator's final cast diverges sub-ulp for
    large sums: DuckDB converts DECIMAL->DOUBLE two-step (int128 ->
    double — TRUNCATING above 2^53, probed r10 — then /10^scale) while
    Spark converts one-step correctly rounded. At scale 4 the unscaled
    value stays under 2^53 for sums < ~9e11, so both conversions are
    exact and identical. Use for money-family expressions
    (price, price*(1-discount)) whose values are exact at <= 4 dp;
    NEVER for continuous doubles (the scale-4 quantization would bite).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(30,4)")).cast("double")


def sql_dsum4(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum4`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE)"


def usum4(col: Column | str) -> Column:
    """:func:`dsum4` on the fixed-point fast path: quantize to 1e-4
    integer units at ingest (units4 — lossless under dsum4's own
    precondition, values exact at <= 4 dp), sum LONGs into a
    DECIMAL(38,0) accumulator (the long->decimal cast is
    integer-cheap; DECIMAL(30,4)'s per-row double->decimal cast pays
    a Double.toString, and precision 30 exceeds Spark's long-backed
    compact decimal so the old sum boxed BigDecimal per row), cast
    the scale-0 sum to double — correctly rounded in BOTH engines at
    ANY magnitude (r11 probe; the scale-4 cast was only exact below
    ~9e11) — and divide once by 10000.0, the same single IEEE op in
    both engines (:func:`sql_usum4`). Same contract as dsum4/units4:
    money-family expressions only, NEVER continuous doubles. The r13
    port of the r12 window discipline to plain hash-agg folds
    (q30/q39 subset anchors).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(units4(c).cast(DECZ)).cast("double") / F.lit(10000.0)


def sql_usum4(expr: str) -> str:
    """DuckDB-side mirror of :func:`usum4` (HUGEINT sum of 1e-4 units,
    correctly-rounded scale-0 cast, one final IEEE divide)."""
    return f"(CAST(SUM({sql_units4(expr)}) AS DOUBLE) / 10000.0)"


def units4(col: Column | str) -> Column:
    """Quantize a double to integer 1e-4 units (half away from zero), as
    BIGINT — the fixed-point ingest convention for rolling/window frames.

    Bit-identical across engines by construction: both sides run the SAME
    IEEE ops (``x*1e4``, ``|..|+0.5``, ``floor``) on the same double, so
    neither engine's ROUND model nor its double->decimal cast is involved
    (those are the two probed divergence sources; see
    :func:`duckdb_round_double` and the r10 cast probe). Downstream
    aggregates then sum LONGs inside whole-stage codegen instead of
    128-bit decimals — the r12 q44/q289 rewrite that reclaims the ~2x
    the r11 dec_ratio fuzz fix cost, at equal exactness: a sliding RANGE
    frame over BIGINT is a two-pointer add/subtract, while the DECIMAL(38)
    path boxes java.math.BigDecimal per row. Declared semantics shift:
    the op aggregates VALUES QUANTIZED AT INGEST (money-grade 4 dp), not
    round(agg(exact), 4) — state it in the op's doc.
    """
    x = (F.col(col) if isinstance(col, str) else col) * F.lit(10000.0)
    return (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast("long")


def sql_units4(expr: str) -> str:
    """DuckDB-side mirror of :func:`units4` (same IEEE op sequence)."""
    x = f"(({expr}) * 10000.0)"
    return f"CAST(SIGN({x}) * FLOOR(ABS({x}) + 0.5) AS BIGINT)"


def units2(col: Column | str) -> Column:
    """:func:`units4` at scale 100 — integer 1e-2 (cents) units.

    For money-family columns exact at <= 2 dp (lineitem price/discount/
    tax/quantity) the cents grid loses nothing, and the smaller
    magnitudes keep per-row unit PRODUCTS (cents x cents, for moment
    folds like q321/q308/q133) comfortably inside LONG: max lineitem
    cross product ~1.2e14 << 2^63. Same engine-agnostic IEEE op
    sequence as units4 (x*100, |..|+0.5, floor) — no ROUND model or
    double->decimal cast involved. Accumulate the products as
    DECIMAL(38,0) (long->decimal cast is integer-cheap; the old
    double->DECIMAL(30,10) per-row cast paid a Double.toString), and
    cast the scale-0 sums back to double — correctly rounded in BOTH
    engines at any magnitude (r11 probe), unlike scaled-decimal casts.
    """
    x = (F.col(col) if isinstance(col, str) else col) * F.lit(100.0)
    return (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast("long")


def sql_units2(expr: str) -> str:
    """DuckDB-side mirror of :func:`units2` (same IEEE op sequence)."""
    x = f"(({expr}) * 100.0)"
    return f"CAST(SIGN({x}) * FLOOR(ABS({x}) + 0.5) AS BIGINT)"


def units6(col: Column | str) -> Column:
    """:func:`units4` at scale 1e6 — the fixed-point ingest grid for
    CONTINUOUS (irrational-valued) doubles whose declared spec already
    quantizes them, e.g. log-transformed moments that previously summed
    ``CAST(x AS DECIMAL(30,10))`` (a 1e-10 half-up quantizer paying a
    per-row double->BigDecimal boxing). Declaring the grid at 1e-6
    keeps unit PRODUCTS for |x| <= ~300 inside LONG (3e8^2 = 9e16 <
    2^63) so moment folds run as codegen long multiplies into
    DECIMAL(38,0) accumulators (the q321 r13 port, extended to the
    ln() family). Same engine-agnostic IEEE op sequence (x*1e6,
    |..|+0.5, floor) — no ROUND model or double->decimal cast
    involved. Semantics shift to declare in the op doc: the moments
    aggregate VALUES QUANTIZED AT INGEST on the 1e-6 grid (and
    products of quantized values, not quantized products); for
    round(4) ratio outputs of O(1) statistics the 5e-7 grid error is
    ~100x below output granularity.
    """
    x = (F.col(col) if isinstance(col, str) else col) * F.lit(1000000.0)
    return (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast("long")


def sql_units6(expr: str) -> str:
    """DuckDB-side mirror of :func:`units6` (same IEEE op sequence)."""
    x = f"(({expr}) * 1000000.0)"
    return f"CAST(SIGN({x}) * FLOOR(ABS({x}) + 0.5) AS BIGINT)"


def iratio_round4(num: Column, den: Column) -> Column:
    """Half-away-from-zero round of ``num/den`` to 4 dp where ``num`` is
    already in 1e-4 integer units and ``den`` a positive LONG count —
    i.e. the quotient to round IS ``num/den`` in units. All-LONG
    arithmetic (``(2*|num| + den) div (2*den)``, exact), then one
    long->double cast and one divide by 1e4 — identical IEEE ops both
    engines (:func:`sql_iratio_round4`). Contract: ``2*|num| + den``
    stays below 2^53 (|num| < ~4.5e15, i.e. frame sums < ~4.5e11 in
    value terms) so the exactly-divisible double division is exact;
    beyond that use :func:`dratio_round` on decimal-cast inputs."""
    two = F.lit(2).cast("long")
    q = (two * F.abs(num) + den) - F.pmod(two * F.abs(num) + den, two * den)
    # (a - a%b)/b on longs: exactly divisible, and the double divide of
    # exactly-divisible longs below 2^53 is exact — no div operator
    # needed, stays in codegen.
    qq = (q / (two * den)).cast("long")
    return (
        F.signum(num.cast("double"))
        * qq.cast("double")
        / F.lit(10000.0)
    )


def sql_iratio_round4(num: str, den: str) -> str:
    """DuckDB-side mirror of :func:`iratio_round4` (BIGINT floor div)."""
    return (
        f"CAST(SIGN({num}) AS DOUBLE) * "
        f"CAST((2*ABS(CAST({num} AS BIGINT)) + CAST({den} AS BIGINT)) "
        f"// (2*CAST({den} AS BIGINT)) AS DOUBLE) / 10000.0"
    )


def sql_davg(expr: str, ndigits: int = 4) -> str:
    """DuckDB-side mirror of :func:`davg`.

    DECIMAL(38,10) * 10^10 stays DECIMAL(38,10) in DuckDB (saturating
    precision, probed r10) and the product is integer-valued, so the
    HUGEINT cast is exact; the ratio then rounds via integer floor
    division exactly like the Spark side.
    """
    num = (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,10))) * 10000000000 AS HUGEINT)"
    )
    den = f"(CAST(COUNT({expr}) AS HUGEINT) * 10000000000)"
    return sql_dratio_round(num, den, ndigits)
