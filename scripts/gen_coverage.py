"""Regenerate COVERAGE.md: SURVEY §2 ID → implementation/verification map.

Run from the repo root: python scripts/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_hw_spark.queries import all_queries  # noqa: E402

# SURVEY-declared operators whose contract is a pytest (not a registry row)
UNIT_ONLY = {
    "Q03": "CSV round-trip — tests/test_sources.py::test_q03_csv_roundtrip",
    "Q04": "JSONL round-trip — tests/test_sources.py::test_q04_jsonl_roundtrip",
    "Q05": "partitioned write — tests/test_sources.py::test_q05_partitioned_write_routing",
    "Q29": "stream-stream interval join — tests/test_streaming.py::test_q77_stream_stream_interval_join",
    "Q73": "watermark late-drop — tests/test_streaming.py::test_q73_watermark_drops_late_rows",
    "Q74": "stream dedup — tests/test_streaming.py::test_q74_stream_dedup",
    "Q75": "stateful gather-with-timeout — hive_hw_spark/queries/telemetry.py + tests/test_telemetry.py",
    "Q76": "foreachBatch routed sink — tests/test_streaming.py::test_q76_foreachbatch_routed_sink",
    "Q77": "stream-stream join — tests/test_streaming.py::test_q77_stream_stream_interval_join",
    "Q74b": "incremental corpus dedup (stream-static anti join) — tests/test_streaming.py::test_incremental_dedup_stream_static",
    "Q74c": "incremental decontamination (stream-static nested-loop anti join) — tests/test_streaming.py::test_incremental_decontaminate_stream_static",
    "Q03b": "XML round-trip (Spark 4 built-in source) — tests/test_sources.py::test_q03b_xml_roundtrip",
    "Q76b": "idempotent exactly-once foreachBatch sink — tests/test_streaming.py::test_q76b_idempotent_foreachbatch_sink",
    "Q112b": "observe() ride-along quality metrics — tests/test_quality.py::test_observe_metrics_ride_along_one_scan",
    "Q111b": "count-min sketch mergeability — tests/test_llm_ops.py::test_cms_sketch_merges_across_shards",
    "Q147": "transformWithStateInPandas threshold alerts — hive_hw_spark/stateful_v2.py + tests/test_stateful_v2.py (plan/schema contract + mock-state SEMANTICS drive of the shipped processor both green; only the protobuf state-server wire protocol remains env-blocked, e2e test skip-gated)",
    "Q150": "small-file compaction (table maintenance) — hive_hw_spark/tables.py::compact_parquet_dir + tests/test_tables.py::test_compact_parquet_dir_rewrites_to_target_file_count",
    "Q159": "sorted data layout for zone-map skipping — hive_hw_spark/tables.py::sort_parquet_dir + tests/test_tables.py::test_sort_parquet_dir_produces_disjoint_zone_maps",
    "Q168": "bucketed co-located join (exchange-free plan) — hive_hw_spark/tables.py::write_bucketed_table + tests/test_tables.py::test_bucketed_join_plans_without_exchange",
    "Q169": "incremental OHLC bars (stream ≡ batch) — hive_hw_spark/queries/streaming_batch.py::ohlc_bars + tests/test_streaming.py::test_q169_incremental_ohlc_stream_equals_batch",
    "Q171": "MERGE-maintained incremental rollup — hive_hw_spark/tables.py::incremental_rollup_merge + tests/test_tables.py::test_incremental_rollup_merge_equals_full_recompute",
    "Q179": "row-level file provenance (_metadata.file_path) — tests/test_sources.py::test_q179_file_provenance_metadata_column",
    "Q185": "stream dedup with bounded state (dropDuplicatesWithinWatermark) — tests/test_streaming.py::test_q185_dedup_within_watermark_bounds_state",
    "Q190": "streaming materialized-view maintenance (foreachBatch → incremental_rollup_merge) — tests/test_streaming.py::test_q190_streaming_materialized_view_maintenance",
    "Q207": "custom Python DataSource, batch (one partition per round; pyspark.sql.datasource) — hive_hw_spark/pydatasource.py + tests/test_pydatasource.py",
    "Q208": "custom Python DataSource, streaming (offset-protocol micro-batch replay ≡ batch) — hive_hw_spark/pydatasource.py + tests/test_pydatasource.py",
    "Q210": "Z-order multi-dimensional clustering layout — hive_hw_spark/tables.py::zorder_parquet_dir + tests/test_tables.py::test_q210_zorder_layout_prunes_on_both_dimensions",
    "Q211": "stream-stream LEFT OUTER interval join (watermarked NULL emission) — tests/test_streaming.py::test_q211_stream_stream_left_outer_join_emits_null_after_watermark",
    "Q212": "parquet bloom-filter write contract — hive_hw_spark/tables.py::write_parquet_with_bloom + tests/test_tables.py::test_q212_parquet_bloom_filter_write_contract",
    "Q225": "streaming session windows (cross-batch merge + exactly-once close) — tests/test_streaming.py::test_q225_streaming_session_window",
    "Q273": "stream-stream FULL OUTER interval join (NULLs emitted on BOTH sides after watermark) — tests/test_streaming.py::test_q273_stream_stream_full_outer_join_emits_nulls_both_sides",
    "Q275": "line-oriented text source (line / wholetext / lineSep framing) — tests/test_sources.py::test_q275_text_source_line_and_wholetext",
    "Q280": "SQL scripting control flow (BEGIN/DECLARE/WHILE/IF, Spark 4) — tests/test_sql_surface.py::test_q280_sql_scripting_control_flow",
    "Q287": "streaming observe() ride-along metrics (per-micro-batch DQ counters via query progress) — tests/test_streaming.py::test_q287_streaming_observe_metrics_per_batch",
    "Q283": "custom Python DataSource batch WRITER (per-task parts + manifest commit, orphans invisible) — hive_hw_spark/pydatasource.py::UplinkWriter + tests/test_pydatasource.py::test_q283_uplink_batch_writer_manifest_commit",
    "Q284": "custom Python DataSource STREAMING writer (per-micro-batch manifests, exactly-once union) — hive_hw_spark/pydatasource.py::UplinkStreamWriter + tests/test_pydatasource.py::test_q284_uplink_stream_writer_batch_manifests",
    "Q281": "parameterized SQL + IDENTIFIER() clause (injection-safe templating) — tests/test_sql_surface.py::test_q281_parameterized_sql_and_identifier",
    "Q282": "Python UDTF with TABLE argument + PARTITION BY/ORDER BY — tests/test_udfs.py::test_q282_udtf_table_argument_partition_by",
    "Q312": "binaryFile multimodal ingest source (fixed 4-column schema, pathGlobFilter listing-time pruning, byte-exact content) — tests/test_sources.py::test_q312_binaryfile_source",
    "Q327": "TABLESAMPLE / df.sample determinism contract (REPEATABLE seeding, BUCKET x OUT OF y, kwargs-only seed trap) — tests/test_sql_surface.py::test_q327_tablesample_repeatable",
    "Q226": "streaming SCD2 dimension maintenance (stream ≡ batch) — hive_hw_spark/tables.py::scd2_apply_batch + tests/test_streaming.py::test_q226_streaming_scd2_maintenance",
    "Q228": "parquet schema evolution via mergeSchema (NULL-fill across writer generations) — tests/test_sources.py::test_q228_parquet_schema_evolution_merge",
    "Q229": "corrupt-record quarantine (PERMISSIVE/_corrupt_record, DROPMALFORMED, FAILFAST) — tests/test_sources.py::test_q229_json_corrupt_record_quarantine",
    "Q230": "cost-based statistics (ANALYZE TABLE, table+column stats queryable) — tests/test_optimizer_features.py::test_q230_cbo_statistics_recorded_and_queryable",
    "Q231": "dynamic partition pruning (runtime file skipping from the dim filter) — tests/test_optimizer_features.py::test_q231_dynamic_partition_pruning_in_plan",
    "Q232": "runtime bloom-filter injection (built-in pre-shuffle runtime filter) — tests/test_optimizer_features.py::test_q232_runtime_bloom_filter_injected",
    "Q236": "join strategy hints honored (BHJ/SMJ/SHJ) — tests/test_plan_shapes.py::test_q236_join_strategy_hints_are_honored",
    "Q237": "multi-format federated union (parquet+CSV+JSONL one query) — tests/test_plan_shapes.py::test_q237_multi_format_federated_union",
    "Q247": "plan digest / runtime explain audit — hive_hw_spark/observability.py::explain_digest + tests/test_observability.py",
    "Q248": "per-query metrics listener (py4j QueryExecutionListener) — hive_hw_spark/observability.py::MetricsListener + tests/test_observability.py",
    "Q191": "parquet compression tuning (zstd/snappy round-trip + size ordering) — tests/test_tables.py::test_q191_parquet_compression_codecs_roundtrip_and_size",
}


def main() -> None:
    qs = all_queries()
    print("# COVERAGE — SURVEY §2 operator → implementation map")
    print()
    print("Generated by scripts/gen_coverage.py from the live registry.")
    print("`oracle` = DuckDB hash-parity checked at sf0.01 (driver t2 +")
    print("tests/test_oracle_queries.py); `rows-only` = registry entry whose")
    print("semantics are approximate (error-bound unit test cited);")
    print("`unit` = pytest contract for streaming/source ops.")
    print()
    print("| ID | check | notes |")
    print("|---|---|---|")

    def sort_key(name: str):
        num = "".join(ch for ch in name[1:] if ch.isdigit())
        return (int(num), name)

    for name in sorted(qs, key=sort_key):
        q = qs[name]
        kind = "oracle" if q.oracle else "rows-only"
        first_line = (q.doc or "").strip().split(". ")[0][:90]
        print(f"| {name} | {kind} | {first_line} |")
    for qid, note in sorted(UNIT_ONLY.items()):
        print(f"| {qid.lower()} | unit | {note} |")

    n_oracle = sum(1 for q in qs.values() if q.oracle)
    n_rows = len(qs) - n_oracle
    print()
    print(
        f"**Totals: {n_oracle} oracle-checked, {n_rows} rows-only "
        f"(approximate ops with error-bound tests), {len(UNIT_ONLY)} "
        f"unit-contract ops.**"
    )


if __name__ == "__main__":
    main()
