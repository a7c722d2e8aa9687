"""B-A source/sink round-trips (SURVEY.md §2 Q03–Q05).

Grounding: the reference's sinks are serialized JSON uplinks (A7,
master.ino:462-505) and its routing is the one-char prefix dispatch (A20,
gateway.ino:69-75) — here: format round-trips with explicit schemas
(inference never touches declared data) and a partitioned write whose
directory layout IS the routing.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_q03_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    out = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(out)
    )
    assert back.count() == nation.count()
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0


def test_q04_jsonl_roundtrip(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(500)
    out = str(tmp_path / "events_jsonl")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(ev.schema).json(out)
    assert back.count() == ev.count()
    # sample equality on a deterministic key
    a = ev.select("event_id", "user_id", "event_type").orderBy("event_id")
    b = back.select("event_id", "user_id", "event_type").orderBy("event_id")
    assert a.exceptAll(b).count() == 0


def test_q05_partitioned_write_routing(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = str(tmp_path / "by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    # directory layout is the dispatch (A20): one path per message type
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    types = sorted(
        r.event_type for r in ev.select("event_type").distinct().collect()
    )
    assert dirs == [f"event_type={t}" for t in types]
    # reading ONE partition prunes to exactly that type's rows
    one = spark.read.parquet(out).filter(F.col("event_type") == types[0])
    assert one.count() == ev.filter(F.col("event_type") == types[0]).count()
    # partition pruning is visible in the plan
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_q03b_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC round-trip (native Spark datasource, columnar like parquet):
    schema and values survive write+read exactly. Avro is NOT covered:
    the spark-avro datasource module isn't bundled in this container and
    no network exists to fetch it (same blocker as the Kafka connector)."""
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    out = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == nation.schema
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0


def test_q03b_xml_roundtrip(spark, sf_dir, tmp_path):
    """Spark 4's built-in XML source (no external package) round-trips a
    dimension table with an explicit schema. Avro, by contrast, is NOT
    exercisable here: spark-avro is an external data source module and
    its jar is not in this container (only avro-core ships with
    pyspark), so `.format("avro")` raises FAILED_TO_FIND_DATA_SOURCE —
    the same environment-blocked class as the Kafka connector."""
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    out = str(tmp_path / "nation_xml")
    (
        nation.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(out)
    )
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .format("xml")
        .option("rowTag", "nation")
        .load(out)
    )
    assert back.count() == nation.count()
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0


def test_q179_file_provenance_metadata_column(spark, tmp_path):
    """Q179: row-level provenance via the hidden _metadata struct — every
    row reports the parquet file it physically came from (the lineage/
    audit primitive: quarantine a bad ingest file, re-derive per-file
    stats, debug skew by file). Verified against ground truth by
    reading each part file individually."""
    import glob

    src = str(tmp_path / "prov")
    spark.range(0, 1000).selectExpr("id", "id % 7 AS g").repartition(
        4
    ).write.parquet(src)
    with_prov = spark.read.parquet(src).select(
        "id", F.col("_metadata.file_path").alias("src_file")
    )
    got = {r.id: r.src_file for r in with_prov.collect()}
    assert len(got) == 1000
    files = glob.glob(f"{src}/part-*.parquet")
    assert len(files) == 4
    for f in files:
        ids_in_f = {r.id for r in spark.read.parquet(f).select("id").collect()}
        for i in ids_in_f:
            assert got[i].endswith(f.rsplit("/", 1)[-1])
    # per-file row counts derived from the metadata column match reality
    per_file = {
        r.src_file.rsplit("/", 1)[-1]: r.n
        for r in with_prov.groupBy("src_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(per_file.values()) == 1000 and len(per_file) == 4


def test_q228_parquet_schema_evolution_merge(spark, tmp_path):
    """Q228: schema-on-read evolution — a v2 writer added a column; the
    directory holds BOTH generations. mergeSchema=True reconciles to
    the union schema with NULLs for the old files (the long-lived-table
    ingest contract); the default read must also keep working (it
    serves whichever schema it samples — asserting the merged read is
    the point here)."""
    d = str(tmp_path / "evolving")
    spark.range(0, 5).selectExpr("id AS k", "id * 2 AS v").write.parquet(
        d + "/gen=1"
    )
    spark.range(5, 10).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id AS STRING) AS note"
    ).write.parquet(d + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"k", "v", "note", "gen"}
    rows = {r.k: (r.v, r.note) for r in merged.collect()}
    assert len(rows) == 10
    assert rows[2] == (4, None)       # old generation null-fills
    assert rows[7] == (14, "7")       # new generation carries the column


def test_q229_json_corrupt_record_quarantine(spark, tmp_path):
    """Q229: malformed-input handling — PERMISSIVE mode parses what it
    can and routes the raw text of broken rows to _corrupt_record
    (the quarantine column), so one bad producer can't fail a 100 TB
    ingest; DROPMALFORMED silently discards them; FAILFAST raises.
    All three policies asserted on the same file."""
    import pytest

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"k": 2, "v": "also ok"}\n'
        '{"k": "NaN-ish", "v": 3}\n'
    )
    schema = "k long, v string, _corrupt_record string"
    permissive = (
        spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(p))
    )
    rows = permissive.collect()
    good = {r.k for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {1, 2}
    assert len(bad) == 2 and "THIS IS NOT JSON" in bad[0]

    dropped = (
        spark.read.schema("k long, v string")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r.k for r in dropped.collect()} == {1, 2}

    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        (
            spark.read.schema("k long, v string")
            .option("mode", "FAILFAST")
            .json(str(p))
            .collect()
        )


def test_q275_text_source_line_and_wholetext(spark, tmp_path):
    """Q275: the line-oriented text source — the rawest LLM-corpus
    ingest path (one line = one training example, or one FILE = one
    document with wholetext). Line mode must preserve line count and
    content exactly; wholetext mode must yield one row per file with
    the full payload; lineSep override must re-split the same bytes.
    DuckDB has no analog (unit contract like q03)."""
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha line 1\nalpha line 2\n")
    (d / "b.txt").write_text("beta only line\n")
    lines = spark.read.text(str(d))
    got = sorted(r.value for r in lines.collect())
    assert got == ["alpha line 1", "alpha line 2", "beta only line"]
    # wholetext: one row per FILE, full bytes preserved (must be the
    # text() kwarg — a .option("wholetext", ...) string is ignored)
    whole = spark.read.text(str(d), wholetext=True)
    by_file = sorted(r.value for r in whole.collect())
    assert by_file == ["alpha line 1\nalpha line 2\n", "beta only line\n"]
    # custom record separator: same bytes, different framing
    (d / "c.txt").unlink(missing_ok=True)
    sep = spark.read.option("lineSep", " line ").text(str(d / "a.txt"))
    assert sep.count() == 3


def test_q312_binaryfile_source(spark, tmp_path):
    """Q312: binaryFile source — the multimodal ingest path (SURVEY §2

    B-K): opaque payloads (image/audio/video bytes) land as files and
    enter the engine via spark.read.format("binaryFile") with the fixed
    (path, modificationTime, length, content) schema; pathGlobFilter
    prunes non-matching payloads at the LISTING stage (no bytes read),
    and the content column round-trips byte-exact into the q95-style
    BinaryType pipeline.
    """
    payloads = {
        "a.img": b"\x89PNG\r\n\x1a\n" + bytes(range(64)),
        "b.img": b"\x89PNG\r\n\x1a\n" + bytes(reversed(range(64))),
        "c.wav": b"RIFF" + b"\x00" * 32,
    }
    src = tmp_path / "blobs"
    src.mkdir()
    for name, blob in payloads.items():
        (src / name).write_bytes(blob)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(str(src))
    )
    assert [f.name for f in df.schema.fields] == [
        "path",
        "modificationTime",
        "length",
        "content",
    ]
    rows = {
        os.path.basename(r.path): bytes(r.content)
        for r in df.select("path", "content").collect()
    }
    # glob filter pruned the .wav at listing time; bytes are exact
    assert rows == {k: v for k, v in payloads.items() if k.endswith(".img")}
    lens = {
        os.path.basename(r.path): r.length
        for r in df.select("path", "length").collect()
    }
    assert lens == {k: len(v) for k, v in payloads.items() if k.endswith(".img")}
