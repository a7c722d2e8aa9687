"""B-J UDF / UDAF / UDTF surface (SURVEY.md §2 Q80–Q85).

Grounding: the calibration transform `(raw − tare)/factor`, then
`fabs(units − zero_factor)` (A11/A12, slave.ino:22,52,141;
hx711_calibration.ino:20-30) is Q80's pandas UDF; the printable-char
scrub (A23, master.ino:612) is Q83's mapInPandas; kg→grams (A14,
master.ino:474) is Q84's SQL-registered UDF.

Performance rules embodied here (the UDF story at 100 TB):
- Every Python UDF below is Arrow-batched (pandas_udf / applyInPandas /
  mapInPandas) — never row-at-a-time Python. The JVM↔Python exchange
  moves columnar batches, ~10-100× the throughput of pickled rows.
- Q80/Q84 exist to prove the surface; their docstrings note the built-in
  expression equivalent, which stays in codegen and is what production
  should use when the logic is expressible (tests assert equality).
- Exact-sum discipline: grouped reductions use math.fsum (correctly
  rounded exact sum) so results are partition-order independent and match
  the oracle's DECIMAL accumulator bit-for-bit.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register

# Reference calibration constants (slave.ino:22): factor 20750, zero -0.5.
CAL_FACTOR = 20750.0
ZERO_FACTOR = -0.5


def calibrate_udf():
    """HX711 calibration (A11/A12): units = raw/factor, weight = |units − zero|.

    Built lazily — pandas_udf registration needs an active SparkContext.
    """

    @pandas_udf("double")
    def calibrate(raw: pd.Series) -> pd.Series:
        return (raw / CAL_FACTOR - ZERO_FACTOR).abs()

    return calibrate


@register(
    "q80",
    oracle=f"""
    SELECT event_id, abs(value / {CAL_FACTOR} - ({ZERO_FACTOR})) AS kg
    FROM events ORDER BY event_id
    """,
    doc="Scalar pandas UDF (Arrow-batched): the reference's calibration "
    "math (slave.ino:22,141) over raw counts. Same IEEE ops as the "
    "oracle's built-in expression → bit-identical. Production would use "
    "the built-in form (stays in codegen); equality is asserted in "
    "tests/test_udfs.py.",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", calibrate_udf()(F.col("value")).alias("kg")
    ).orderBy("event_id")


def trimmed_mean_udf():
    """Drop one min and one max, exact-sum the rest (grouped-agg UDF).

    The sum quantizes each value to integer 1e-4 units first, with the
    SAME per-element rounding as the oracle's ROUND(value*10000): DuckDB
    ROUND on a double is half-AWAY-from-zero on the BINARY value (probed
    r11: ROUND(413086.5)=413087, ROUND(216283.49999999997)=216283),
    which `floor(|x|) + (frac >= 0.5)` replicates exactly on the same
    IEEE product — no np.round (half-even: 413086.5 -> 413086) and no
    decimal cast (DuckDB's double->DECIMAL rounds the SHORTEST REPR
    half-up: 21.628349999999998 -> 21.6284 — both probed divergent on
    regen-fuzz data). The unit total via fsum is then bit-identical to
    the oracle's DECIMAL-summed units cast to double. Scale 4, not
    cents (r11 regen-fuzz finding): values are 2dp money on current
    testdata, where every scheme agrees, but a regeneration with
    finer-precision values diverges coarser or mode-mismatched
    quantizations by up to 0.005/n.
    """
    import numpy as np

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        if len(v) <= 2:
            return None  # matches the oracle's NULL for undersized groups
        x = v.to_numpy() * 10000.0
        a = np.abs(x)
        f = np.floor(a)
        units = np.sign(x) * (f + (a - f >= 0.5))
        total = math.fsum(units) / 10000.0 - v.min() - v.max()
        return total / (len(v) - 2)

    return trimmed_mean


@register(
    "q81",
    oracle="""
    SELECT user_id,
           CASE WHEN COUNT(*) > 2 THEN
             (CAST(SUM(CAST(ROUND(value * 10000) AS DECIMAL(30,0)))
                   AS DOUBLE) / 10000
              - MIN(value) - MAX(value)) / (COUNT(*) - 2)
           END AS tmean
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Grouped-aggregate pandas UDF: per-user trimmed mean (A13 "
    "averaging, robustified). math.fsum = correctly-rounded exact sum, "
    "matching the oracle's DECIMAL accumulator regardless of partition "
    "order. Scale-4 unit accumulator (value exact at 2 dp today): at "
    "scale 10 a heavy user's unscaled sum passes 2^53, where DuckDB's "
    "two-step decimal->double conversion sat one ulp off fsum "
    "(the last nonzero raw divergence in the r10 registry audit); "
    "quantization mode matched to DuckDB ROUND's binary half-away "
    "(r11 regen-fuzz finding — see trimmed_mean_udf).",
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(trimmed_mean_udf()(F.col("value")).alias("tmean"))
        .orderBy("user_id")
    )


def _znorm(pdf: pd.DataFrame) -> pd.DataFrame:
    # fsum for the reductions (exact, partition-order independent — the
    # oracle-parity contract); vectorized numpy for the per-row map.
    # numpy computes the per-element terms vectorized; fsum then reduces
    # the C-double array exactly (a Python generator here tripled the
    # whole query's cost at sf0.1)
    vals = pdf["value"].to_numpy()
    mu = math.fsum(vals) / len(pdf)
    var = math.fsum((vals - mu) ** 2) / len(pdf)
    sd = math.sqrt(var)
    out = pdf[["event_id", "user_id"]].copy()
    # Structural degenerate predicate (MIN==MAX), not sd>0: the oracle's
    # DECIMAL-quantized var and fsum's exact var can disagree about
    # "exactly zero" on continuous (>10 dp) values — MIN==MAX is
    # engine-agnostic, and MIN!=MAX guarantees the exact sd is > 0.
    degenerate = vals.min() == vals.max()
    out["z"] = 0.0 if degenerate else ((pdf["value"] - mu) / sd).round(4)
    return out


def _znorm_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    # one Arrow batch = one hash bucket of users; per-user math stays
    # _znorm's exactly (fsum reductions), but results land in ONE
    # preallocated array via groupby indices — concat-ing thousands of
    # per-user frames cost more than the math itself
    import numpy as np

    vals = pdf["value"].to_numpy()
    z = np.zeros(len(pdf))
    for idx in pdf.groupby("user_id", sort=False).indices.values():
        v = vals[idx]
        # Structural degenerate predicate (MIN==MAX), matching the
        # oracle's CASE: comparing a COMPUTED var to 0 is engine-
        # sensitive on continuous values (oracle var is DECIMAL-
        # quantized, fsum is exact — a constant group can read var>0
        # in one engine and 0 in the other; r12 advice). MIN!=MAX
        # guarantees fsum's sd > 0 exactly.
        if v.min() != v.max():
            mu = math.fsum(v) / len(v)
            sd = math.sqrt(math.fsum((v - mu) ** 2) / len(v))
            z[idx] = np.round((v - mu) / sd, 4)
    out = pdf[["event_id", "user_id"]].copy()
    out["z"] = z
    return out


@register(
    "q82",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS mu,
             COUNT(*) AS n
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT e2.user_id,
             CAST(SUM(CAST((e2.value - m.mu) * (e2.value - m.mu)
                  AS DECIMAL(38,18))) AS DOUBLE) / MAX(m.n) AS var,
             MIN(e2.value) AS vmin, MAX(e2.value) AS vmax
      FROM events e2 JOIN m ON e2.user_id = m.user_id
      GROUP BY e2.user_id
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN v.vmin <> v.vmax
                THEN ROUND((e.value - m.mu) / sqrt(v.var), 4)
                ELSE 0.0 END AS z
    FROM events e JOIN m USING (user_id) JOIN v USING (user_id)
    ORDER BY e.event_id
    """,
    doc="Grouped-map applyInPandas: z-normalize value per user — the "
    "whole group arrives as one pandas frame (Arrow), the canonical "
    "custom-per-group transform. Population std, exact sums, round(4). "
    "Grouping key is a hash BUCKET of the user (the q186 many-small-"
    "groups discipline: applyInPandas invokes Python once per key, and "
    "~10k per-user calls cost 7 s at sf0.1 in overhead alone — 64 "
    "buckets amortize it to ~1 s); the per-user frames are recovered "
    "INSIDE the call with pandas groupby, so the math is unchanged. "
    "Zero-variance groups emit z=0 via a STRUCTURAL predicate "
    "(MIN(value)=MAX(value) per user, stated identically in both "
    "engines): comparing a computed var to 0 is engine-sensitive on "
    "continuous values — the oracle's DECIMAL-quantized var and the "
    "UDF's exact fsum can disagree about 'exactly zero' (r12 advice; "
    "the bare-0/0 NaN class was fence-caught r12).",
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("bucket"),
            "event_id",
            "user_id",
            "value",
        )
        .groupBy("bucket")
        .applyInPandas(
            _znorm_bucket, schema="event_id long, user_id long, z double"
        )
        .orderBy("event_id")
    )


def _scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import re

    pat = re.compile(r"[^ -~]")
    for pdf in batches:
        out = pdf[["doc_id"]].copy()
        out["clean"] = pdf["text"].map(lambda s: pat.sub("", s))
        yield out


@register(
    "q83",
    oracle="""
    SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS clean
    FROM documents ORDER BY doc_id
    """,
    doc="mapInPandas: the reference's printable-character scrub (A23, "
    "master.ino:612 keeps bytes 32..126) over document batches. This "
    "corpus is ASCII-clean, so the oracle checks plumbing; "
    "tests/test_udfs.py scrubs actual control bytes.",
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "text")
        .mapInPandas(_scrub, schema="doc_id long, clean string")
        .orderBy("doc_id")
    )


@register(
    "q84",
    oracle="""
    SELECT event_id, CAST(ceil(value * 1000) AS BIGINT) AS g
    FROM events ORDER BY event_id
    """,
    doc="SQL-registered UDF: `grams(value)` usable from spark.sql — the "
    "kg→integer-grams conversion (A14, master.ino:474) registered as a "
    "vectorized pandas UDF, invoked through the SQL surface.",
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("long")
    def grams(kg: pd.Series) -> pd.Series:
        return np.ceil(kg * 1000).astype("int64")

    spark.udf.register("grams", grams)
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("hive_hw_q84_events")
    return spark.sql(
        "SELECT event_id, grams(value) AS g FROM hive_hw_q84_events"
        " ORDER BY event_id"
    )


@register(
    "q85",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
    ORDER BY doc_id, pos
    """,
    doc="Python UDTF (lateral join): explode text into (word, pos) rows — "
    "equivalent to posexplode(split()), which is what production uses; "
    "the UDTF proves the table-function surface.",
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("hive_hw_split_words", SplitWords)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("hive_hw_q85_docs")
    return spark.sql(
        "SELECT d.doc_id, t.word, t.pos"
        " FROM hive_hw_q85_docs d, LATERAL hive_hw_split_words(d.text) t"
        " ORDER BY d.doc_id, t.pos"
    )


@register(
    "q186",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         s AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT p.event_id AS event_id, s.ts AS signup_ts
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY event_id
    """,
    doc="Cogrouped-pandas as-of merge — the LAST pandas API surface "
    "(groupBy().cogroup().applyInPandas): purchases and signups are "
    "cogrouped, each Arrow-batched pair of frames runs "
    "pandas.merge_asof (backward, exact matches allowed, by=user), "
    "reproducing q28's as-of semantics with the SAME DuckDB ASOF "
    "oracle. This is the escape hatch for per-key logic that needs "
    "BOTH sides as real dataframes (interval algebra, custom "
    "interpolation, model scoring against a per-key reference curve) "
    "— one shuffle on the cogroup key, Arrow both directions, no "
    "driver involvement. The cogroup key is a hash BUCKET of the "
    "user, not the user itself: applyInPandas invokes Python once "
    "per KEY, and with ~10k users the per-call overhead alone cost "
    "17 s at sf0.1 (measured round 7); 64 buckets amortize it to "
    "~1 s, with merge_asof(by='user_id') doing the per-user "
    "grouping VECTORIZED inside each call — the many-small-groups "
    "discipline every cogrouped UDF at 100 TB needs (bucket count "
    "scales with cores, never with keys). q28's union+window form "
    "remains the pure-JVM plan when the semantics fit built-ins.",
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("bucket")
    p = ev.where(F.col("event_type") == "purchase").select(
        bucket, "user_id", "event_id", "ts"
    )
    s = ev.where(F.col("event_type") == "signup").select(
        bucket, "user_id", "ts"
    )

    def asof_merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:
            out = left[["event_id"]].copy()
            out["signup_ts"] = pd.NaT
            return out
        left = left.sort_values("ts", kind="mergesort")
        right = (
            right.sort_values("ts", kind="mergesort")
            .rename(columns={"ts": "signup_ts"})
            .assign(ts=lambda r: r["signup_ts"])
        )
        merged = pd.merge_asof(
            left,
            right[["user_id", "signup_ts", "ts"]],
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[["event_id", "signup_ts"]]

    return (
        p.groupBy("bucket")
        .cogroup(s.groupBy("bucket"))
        .applyInPandas(asof_merge, schema="event_id long, signup_ts timestamp")
        .orderBy("event_id")
    )


@register(
    "q188",
    oracle="""
    SELECT doc_id, upper(source) AS source_uc,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents ORDER BY doc_id
    """,
    doc="mapInArrow columnar transform — the zero-pandas Arrow surface "
    "(Spark 4's third Python batch API next to mapInPandas/"
    "applyInPandas): the UDF receives raw pyarrow.RecordBatch "
    "objects and answers with pyarrow compute kernels "
    "(utf8_upper, utf8_length) — no pandas materialization, no "
    "object-dtype boxing, which for byte-dominant work (binary "
    "payloads, long strings) removes the biggest Python-side cost "
    "left after Arrow transfer. Semantics here are deliberately "
    "builtin-expressible so the DuckDB oracle can hash-check the "
    "Arrow path end to end; the real use is kernels Spark lacks "
    "(custom tokenizers over large utf8 columns, bit-twiddling on "
    "binary). Plan: map-only, no shuffle, streams batch-by-batch.",
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def arrow_transform(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.utf8_upper(batch.column("source")),
                    pc.cast(
                        pc.utf8_length(batch.column("text")), pa.int64()
                    ),
                ],
                names=["doc_id", "source_uc", "text_len"],
            )

    return docs.mapInArrow(
        arrow_transform,
        schema="doc_id long, source_uc string, text_len long",
    ).orderBy("doc_id")


@register(
    "q223",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_tokens,
           CAST(COUNT(DISTINCT word) AS INTEGER) AS n_unique
    FROM tok GROUP BY doc_id ORDER BY doc_id
    """,
    doc="POLYMORPHIC Python UDTF (Spark 4 analyze() API — the dynamic "
    "successor to q85's fixed-schema UDTF): the same table function "
    "returns a DIFFERENT schema per call site, resolved at plan time "
    "from the literal mode argument ('stats' → one (n_tokens, "
    "n_unique) row per doc; 'words' → a (word) row per token — "
    "tests/test_udfs.py asserts both shapes). This is the surface "
    "for tokenizer-style libraries whose output columns depend on "
    "configuration. The oracle checks the 'stats' mode end to end. "
    "Plan: lateral join, Python-batched per input row — fine for "
    "per-DOC work (one eval per doc, vectorized inside); per-TOKEN "
    "hot paths stay on explode+codegen (q93-q94's rule).",
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class DocTok:
        @staticmethod
        def analyze(text: AnalyzeArgument, mode: AnalyzeArgument) -> AnalyzeResult:
            if mode.value == "stats":
                return AnalyzeResult(
                    StructType(
                        [
                            StructField("n_tokens", IntegerType()),
                            StructField("n_unique", IntegerType()),
                        ]
                    )
                )
            return AnalyzeResult(
                StructType([StructField("word", StringType())])
            )

        def eval(self, text, mode):
            words = text.split(" ")
            if mode == "stats":
                yield (len(words), len(set(words)))
            else:
                for w in words:
                    yield (w,)

    spark.udtf.register("q223_doctok", DocTok)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "q223_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.n_tokens, t.n_unique
        FROM q223_documents d, LATERAL q223_doctok(d.text, 'stats') t
        ORDER BY d.doc_id
        """
    )
