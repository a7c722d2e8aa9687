"""B-H Scalar function families (SURVEY.md §2 Q60–Q68).

Four of the nine families reproduce actual reference behavior:
- Q61 base64 transport encoding (A19, gateway.ino:83-84)
- Q63 next-hour-boundary alarm math (A17, master.ino:670-679)
- Q64 kg→grams ``cast(ceil(w*1000) as long)`` (A14, master.ino:474)
- Q65 one-char prefix → endpoint dispatch (A20, gateway.ino:69-75)
- Q68 JSON payload rebuild ``{"H0001":{"w":g}}`` shape (A18,
  master.ino:462-480)

All functions are built-in JVM expressions inside whole-stage codegen —
zero Python in the hot path, so throughput at 100 TB is scan-bound.
Oracle-parity rules: float outputs round(4); integer/string outputs exact;
JSON emitted compact by both engines (byte-identical, no canonicalization
needed); DuckDB mirrors are noted inline where the function name differs
(instr→strpos, format_string→printf, from_unixtime→strftime,
dayofweek→dow+1, explode-map→unnest(json_keys)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register
from hive_hw_spark.queries._util import (
    DECZ,
    dratio_round,
    sql_dratio_round,
    sql_dsum,
)


@register(
    "q60",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                          AS up,
           substring(p_name, 1, 8)                AS sub8,
           length(p_name)                         AS len,
           trim(concat(' ', p_name, ' '))         AS tr,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS lp,
           concat_ws('-', p_brand, p_type)        AS cw,
           replace(p_name, ' ', '_')              AS rep,
           strpos(p_name, 'a')                    AS pos_a,
           regexp_extract(p_name, '([a-z]+)', 1)  AS first_word,
           reverse(p_name)                        AS rev,
           printf('%6.2f', p_retailprice)         AS fmt
    FROM part ORDER BY p_partkey
    """,
    doc="String family: case/substring/trim/pad/concat/replace/search/"
    "regex/reverse/format (A15 dtostrf, A21 substring, A22 strstr). "
    "DuckDB mirrors: instr→strpos, format_string→printf.",
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.substring("p_name", 1, 8).alias("sub8"),
        F.length("p_name").alias("len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("tr"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("lp"),
        F.concat_ws("-", "p_brand", "p_type").alias("cw"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.instr("p_name", "a").alias("pos_a"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.reverse("p_name").alias("rev"),
        F.format_string("%6.2f", "p_retailprice").alias("fmt"),
    ).orderBy("p_partkey")


@register(
    "q61",
    oracle="""
    SELECT doc_id,
           base64(CAST(text AS BLOB))                               AS b64,
           (decode(from_base64(base64(CAST(text AS BLOB)))) = text) AS rt_ok
    FROM documents ORDER BY doc_id
    """,
    doc="Base64 encode + decode round-trip — the gateway's transport "
    "encoding (A19, gateway.ino:83-84). Spark's base64 emits RFC-2045 MIME "
    "chunks (CRLF every 76 chars); the gateway's encoder — and DuckDB — "
    "emit the unchunked RFC-4648 form, so the CRLFs are stripped.",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.replace(
            F.base64(F.col("text").cast("binary")), F.lit("\r\n"), F.lit("")
        ).alias("b64"),
        (
            F.unbase64(F.base64(F.col("text").cast("binary"))).cast("string")
            == F.col("text")
        ).alias("rt_ok"),
    ).orderBy("doc_id")


@register(
    "q62",
    oracle="""
    SELECT event_id,
           date_trunc('hour', ts)                              AS hr,
           date_trunc('minute', ts)                            AS mi,
           date_part('dow', ts) + 1                            AS dow,
           CAST(CAST(ts AS DATE) AS VARCHAR)                   AS d,
           CAST(FLOOR(epoch(ts)) AS BIGINT)                    AS unix_s,
           strftime(make_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S')                       AS fmt_ts,
           CAST(CAST(ts AS DATE) + 7 AS VARCHAR)               AS d_plus7,
           date_diff('day', CAST(ts AS DATE), DATE '2024-06-01') AS days_to_jun
    FROM events ORDER BY event_id
    """,
    doc="Date/time family (A2 RTC scan, A16 epoch fold): trunc/dow/to_date/"
    "unix_timestamp/from_unixtime/date_add/datediff. DuckDB mirrors: "
    "dayofweek = dow+1 (Spark is 1=Sunday), from_unixtime = strftime, "
    "unix_timestamp = floor(epoch()).",
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("hr"),
        F.date_trunc("minute", "ts").alias("mi"),
        F.dayofweek("ts").alias("dow"),
        F.to_date("ts").cast("string").alias("d"),
        F.unix_timestamp("ts").alias("unix_s"),
        F.from_unixtime(F.unix_timestamp("ts")).alias("fmt_ts"),
        F.date_add(F.to_date("ts"), 7).cast("string").alias("d_plus7"),
        F.datediff(F.lit("2024-06-01").cast("date"), F.to_date("ts")).alias(
            "days_to_jun"
        ),
    ).orderBy("event_id")


@register(
    "q63",
    oracle="""
    SELECT event_id,
           (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 + 1) * 3600 AS next_s,
           make_timestamp(((CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 + 1) * 3600)
                          * 1000000)                             AS next_ts
    FROM events ORDER BY event_id
    """,
    doc="Next-hour-boundary ceiling — the reference's alarm formula "
    "`next = (ts/interval + 1) * interval` (A17, master.ino:670-679, "
    "interval master.ino:27) in exact integer math.",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "unix_s", F.unix_timestamp("ts")
    )
    next_s = (F.expr("unix_s div 3600") + 1) * 3600
    return ev.select(
        "event_id",
        next_s.alias("next_s"),
        F.timestamp_seconds(next_s).alias("next_ts"),
    ).orderBy("event_id")


@register(
    "q64",
    oracle="""
    SELECT event_id,
           CAST(ceil(value * 1000) AS BIGINT)    AS grams,
           CAST(floor(value) AS BIGINT)          AS flr,
           abs(value - 100)                      AS ab,
           CAST(sign(value - 100) AS DOUBLE)     AS sg,
           event_id % 7                          AS md,
           round(sqrt(value), 4)                 AS r_sqrt,
           round(pow(value, 2), 4)               AS r_pow,
           round(exp(-value / 100), 4)           AS r_exp,
           round(ln(value + 1), 4)               AS r_ln,
           greatest(value, 100.0)                AS gt,
           least(value, 100.0)                   AS lt
    FROM events ORDER BY event_id
    """,
    doc="Math family, incl. the reference's kg→integer-grams conversion "
    "`cast(ceil(w*1000) as long)` (A12/A14, slave.ino:141, master.ino:474). "
    "Transcendentals rounded(4) — libm vs JDK may differ in the last ulp.",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.ceil(v * 1000).cast("bigint").alias("grams"),
        F.floor(v).alias("flr"),
        F.abs(v - 100).alias("ab"),
        F.signum(v - 100).alias("sg"),
        (F.col("event_id") % 7).alias("md"),
        F.round(F.sqrt(v), 4).alias("r_sqrt"),
        F.round(F.pow(v, 2), 4).alias("r_pow"),
        F.round(F.exp(-v / 100), 4).alias("r_exp"),
        F.round(F.log(v + 1), 4).alias("r_ln"),
        F.greatest(v, F.lit(100.0)).alias("gt"),
        F.least(v, F.lit(100.0)).alias("lt"),
    ).orderBy("event_id")


@register(
    "q65",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error'  THEN '/error-report/'
                WHEN event_type = 'signup' THEN '/setup-notification/'
                ELSE '/data/' END                         AS path,
           coalesce(nullif(value, 0), -1)                 AS v_clean,
           least(greatest(value, 50.0), 150.0)            AS clamped
    FROM events ORDER BY event_id
    """,
    doc="Conditional family: the gateway's 1-char prefix → endpoint "
    "dispatch (A20, gateway.ino:69-75; command switch slave.ino:92-118) as "
    "CASE WHEN, plus coalesce/nullif sentinel handling and a "
    "least/greatest clamp (A28 budget clamp analog).",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "/error-report/")
        .when(F.col("event_type") == "signup", "/setup-notification/")
        .otherwise("/data/")
        .alias("path"),
        F.coalesce(F.nullif(F.col("value"), F.lit(0)), F.lit(-1.0)).alias("v_clean"),
        F.least(F.greatest(F.col("value"), F.lit(50.0)), F.lit(150.0)).alias(
            "clamped"
        ),
    ).orderBy("event_id")


@register(
    "q66",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks)                                            AS n_tokens,
           array_to_string(list_slice(toks, 1, 3), ' ')         AS first3,
           list_contains(toks, 'spark')                         AS has_spark,
           len(list_distinct(toks))                             AS n_distinct,
           list_sort(toks)[1]                                   AS first_sorted,
           len(list_filter(toks, x -> length(x) > 4))           AS n_long,
           list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                       (a, x) -> a + x)                         AS total_chars,
           array_to_string(
             list_transform(range(1, 3), i -> toks[i] || '_' || toks[i+1]),
             ',')                                               AS zipped
    FROM t ORDER BY doc_id
    """,
    doc="Array family over tokenized documents: size/slice/contains/"
    "distinct/sort/filter/aggregate/zip_with (A33 positional zip). "
    "DuckDB mirrors: list_* lambdas; aggregate = list_reduce with a "
    "prepended init; zip_with = adjacent-index transform.",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.array_join(F.slice("toks", 1, 3), " ").alias("first3"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.element_at(F.sort_array("toks"), 1).alias("first_sorted"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(
            F.zip_with(
                F.slice("toks", 1, 2),
                F.slice("toks", 2, 2),
                lambda a, b: F.concat(a, F.lit("_"), b),
            ),
            ",",
        ).alias("zipped"),
    ).orderBy("doc_id")


@register(
    "q67",
    oracle="""
    SELECT event_id,
           k                                          AS mk,
           CAST(json_extract(props, '$.' || k) AS INT) AS mv,
           len(json_keys(props))                      AS n_keys
    FROM events, unnest(json_keys(props)) AS u(k)
    ORDER BY event_id, mk
    """,
    doc="Map family: parse events.props into map<string,int>, explode to "
    "(key, value) rows, count keys (A18 JSON document keyed by node code). "
    "DuckDB mirror: unnest(json_keys()) + json_extract.",
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "m", F.from_json("props", "map<string,int>")
    )
    return (
        ev.select(
            "event_id",
            F.explode("m").alias("mk", "mv"),
            F.size(F.map_keys("m")).alias("n_keys"),
        )
        .select("event_id", "mk", "mv", "n_keys")
        .orderBy("event_id", "mk")
    )


@register(
    "q68",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract(props, '$.k') AS INT)      AS k_int,
           to_json(struct_pack(
             w := CAST(ceil(value * 1000) AS BIGINT)))  AS payload
    FROM events ORDER BY event_id
    """,
    doc="JSON family: extract (get_json_object / from_json) and rebuild the "
    "reference's uplink payload `{\"w\":<grams>}` (A18, master.ino:462-480; "
    "grams master.ino:474) via to_json(named_struct(...)). Both engines "
    "emit compact JSON, so the compare is byte-exact without "
    "canonicalization.",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # parse the JSON ONCE (k as string, cast for the int view) — a
    # get_json_object + from_json pair would run the parser twice per row
    return (
        ev.withColumn("j", F.from_json("props", "k STRING"))
        .select(
            "event_id",
            F.col("j.k").alias("k_str"),
            F.col("j.k").cast("int").alias("k_int"),
            F.to_json(
                F.named_struct(
                    F.lit("w"), F.ceil(F.col("value") * 1000).cast("bigint")
                )
            ).alias("payload"),
        )
        .orderBy("event_id")
    )


@register(
    "q69",
    oracle="""
    SELECT event_id,
           CASE WHEN CAST(trunc(value) AS BIGINT) % 10 = 0 THEN NULL
                ELSE value / (CAST(trunc(value) AS BIGINT) % 10) END AS safe_div,
           TRY_CAST(event_type AS INTEGER)  AS bad_cast,
           TRY_CAST(props AS INTEGER)       AS bad_cast2
    FROM events ORDER BY event_id
    """,
    doc="Safe/try arithmetic (B-H extension): under ANSI mode (the Spark 4 "
    "default, and the only sane 100 TB posture - silent NULLs hide data "
    "corruption) overflow/bad-cast/div-by-zero THROW; the try_* family is "
    "the explicit opt-out. DuckDB mirror: TRY_CAST + a NULL-guarding CASE "
    "for division.",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    denom = F.col("value").cast("bigint") % 10
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), denom).alias("safe_div"),
        F.try_to_number(F.col("event_type"), F.lit("999")).cast("int").alias("bad_cast"),
        F.try_to_number(F.col("props"), F.lit("999")).cast("int").alias("bad_cast2"),
    ).orderBy("event_id")


@register(
    "q67b",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) * 2       AS doubled,
           'k_' || k                                         AS renamed_key,
           len(json_keys(props))                             AS n_entries
    FROM events, unnest(json_keys(props)) AS u(k)
    ORDER BY event_id, renamed_key
    """,
    doc="Map-transform family (B-H extension): transform_values / "
    "transform_keys / map_concat-style reshaping of the parsed props map, "
    "exploded for the oracle (DuckDB mirrors via json_keys arithmetic).",
)
def q67b(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("m", F.from_json("props", "map<string,int>"))
        .withColumn("m2", F.expr("transform_values(m, (k, v) -> v * 2)"))
        .withColumn("m3", F.expr("transform_keys(m2, (k, v) -> concat('k_', k))"))
    )
    return (
        ev.select(
            "event_id",
            F.explode("m3").alias("renamed_key", "doubled"),
            F.size("m3").alias("n_entries"),
        )
        .select("event_id", "doubled", "renamed_key", "n_entries")
        .orderBy("event_id", "renamed_key")
    )


@register(
    "q127",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_min,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_max,
           {sql_dratio_round("SUM(CAST(props->>'k' AS BIGINT))",
                             'COUNT(*)')}
             AS k_avg,
           CAST(COUNT(*) FILTER (WHERE props->>'missing' IS NOT NULL)
                AS BIGINT) AS n_has_missing
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Semi-structured props via Spark 4 VARIANT (B-H extension; the "
    "modern form of q68's string-JSON family): parse_json once per row "
    "into the binary variant encoding, then typed variant_get path "
    "extraction feeds a plain hash agg — min/max/sum/avg of $.k per "
    "event type, plus a path-miss probe ($.missing is NULL, never an "
    "error). Scale shape: variant decode + extraction are per-row JVM "
    "expressions (no Python, no shuffle beyond the agg); at 100 TB "
    "variant beats repeated get_json_object string re-parses because "
    "the JSON parses ONCE regardless of how many paths are read. "
    "DuckDB oracle reads the same paths with ->> JSON extraction; "
    "integer k keeps every aggregate exact (avg = exact-int sum / "
    "count, rounded identically).",
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("v", F.parse_json("props")).withColumn(
        "k", F.variant_get("v", "$.k", "long")
    ).withColumn("miss", F.variant_get("v", "$.missing", "string"))
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            dratio_round(
                F.sum("k").cast(DECZ), F.count(F.lit(1)).cast(DECZ)
            ).alias("k_avg"),
            F.count("miss").alias("n_has_missing"),
        )
        .orderBy("event_type")
    )


@register(
    "q219",
    oracle="""
    WITH v AS (
      SELECT CASE c_custkey % 3
               WHEN 0 THEN lower(c_mktsegment)
               WHEN 1 THEN upper(c_mktsegment)
               ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                           lower(substr(c_mktsegment, 2)))
             END AS seg
      FROM customer
    )
    SELECT lower(seg) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_spellings
    FROM v GROUP BY lower(seg) ORDER BY segment
    """,
    doc="Case-insensitive semantics via Spark 4 COLLATIONS (B-H "
    "extension; the first-class form of the lower()-everywhere "
    "workaround): a mixed-case segment column (three deterministic "
    "spellings per value) is grouped under the UTF8_LCASE collation — "
    "equality, GROUP BY, and DISTINCT all fold case at the COMPARISON "
    "level, so the data keeps its original spelling (n_spellings "
    "proves 2-3 variants per group survive). The oracle mirrors with "
    "lower() grouping, which is semantically identical for ASCII — "
    "the output key is canonicalized through lower() because a "
    "collated group's REPRESENTATIVE is whichever spelling a "
    "partition saw first (order-dependent; never emit it raw in an "
    "engine-compared result). Scale: collation comparisons run in "
    "codegen like any string compare; the group count is unchanged, "
    "so the shuffle is the same size as the naive lower() plan.",
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.upper("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
        .alias("seg")
    )
    return (
        c.select(seg)
        .groupBy(F.collate("seg", "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.collate("seg", "UTF8_BINARY")).alias(
                "n_spellings"
            ),
        )
        .select(
            F.lower("k").alias("segment"),
            "n_rows",
            "n_spellings",
        )
        .orderBy("segment")
    )


@register(
    "q227",
    oracle="""
    WITH per AS (
      SELECT l_orderkey AS o_orderkey,
             CAST(COUNT(*) AS INTEGER) AS n_lines,
             {rev} AS revenue,
             CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey, n_lines, revenue, max_qty
    FROM per
    WHERE max_qty >= 49
    ORDER BY o_orderkey
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
    doc="Nested-data processing (B-H capstone): lineitems NEST into an "
    "array<struct> per order (one shuffle — the Dremel/Parquet "
    "repeated-group model), and every later computation runs INSIDE "
    "the row with higher-order functions: exists() filters orders by "
    "a nested predicate (array-level predicate pushdown — "
    "non-matching orders drop before any further work), aggregate() "
    "folds revenue over the struct array with a DECIMAL accumulator "
    "lambda, size()/array_max over transform() give per-order stats "
    "— ZERO additional shuffles after the nest. This is the "
    "denormalized-document shape (order + items as one record) that "
    "at 100 TB replaces a fact-fact join per query with a one-time "
    "nest; the oracle states the flat GROUP BY equivalent. "
    "Array lambdas are interpreted per ELEMENT (CLAUDE.md HOF note) "
    "— fine at ~4 items/order; corpus-sized arrays would explode+"
    "re-agg instead.",
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
            )
        ).alias("items")
    )
    return (
        nested
        # array-level predicate: keep orders with any near-max-qty line
        .where(F.expr("exists(items, it -> it.l_quantity >= 49)"))
        .select(
            "o_orderkey",
            F.size("items").alias("n_lines"),
            F.expr(
                "CAST(aggregate(items, CAST(0 AS DECIMAL(30,10)), "
                "(acc, it) -> CAST(acc + CAST(it.l_extendedprice * "
                "(1 - it.l_discount) AS DECIMAL(30,10)) "
                "AS DECIMAL(30,10))) AS DOUBLE)"
            ).alias("revenue"),
            F.expr(
                "array_max(transform(items, it -> it.l_quantity))"
            ).alias("max_qty"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q243",
    oracle="""
    WITH spine AS (
      SELECT CAST(d AS DATE) AS d
      FROM generate_series(DATE '1995-01-01', DATE '2001-12-31',
                           INTERVAL 1 DAY) t(d)
    )
    SELECT strftime(date_trunc('month', d), '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) FILTER (WHERE dayofweek(d) NOT IN (0, 6))
                AS BIGINT) AS n_business_days,
           strftime(MIN(d) FILTER (WHERE dayofweek(d) NOT IN (0, 6)),
                    '%Y-%m-%d') AS first_bday,
           strftime(MAX(d) FILTER (WHERE dayofweek(d) NOT IN (0, 6)),
                    '%Y-%m-%d') AS last_bday
    FROM spine GROUP BY month ORDER BY month
    """,
    doc="Calendar (date) dimension GENERATED in-engine (B-A extension; "
    "the warehouse date-spine staple q114's gap fill uses implicitly, "
    "here as a first-class dimension build): sequence() + explode "
    "materializes every day of the corpus range, derives business-day "
    "flags (weekday conventions DIFFER per engine — Spark dayofweek "
    "is 1=Sun..7=Sat, DuckDB 0=Sun..6=Sat — each side spells its own "
    "constant, the classic cross-engine calendar trap), and rolls up "
    "per-month day counts and first/last business days. Scale: the "
    "spine is |days| rows (~2.5k for 7 years) generated from ONE row "
    "— broadcastable to any fact join; a 100 TB deployment persists "
    "it once as a bucketed dim. Dates emitted as strings (contract "
    "rule).",
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(DATE'1995-01-01', DATE'2001-12-31',"
                " interval 1 day)"
            )
        ).alias("d")
    )
    bday = ~F.dayofweek("d").isin(1, 7)  # Spark: 1=Sunday, 7=Saturday
    return (
        spine.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.count(F.when(bday, 1)).alias("n_business_days"),
            F.date_format(F.min(F.when(bday, F.col("d"))), "yyyy-MM-dd").alias(
                "first_bday"
            ),
            F.date_format(F.max(F.when(bday, F.col("d"))), "yyyy-MM-dd").alias(
                "last_bday"
            ),
        )
        .orderBy("month")
    )
