"""bench.py's HEADLINE must stay consistent with the live registry.

bench skips unknown names silently (so it never breaks on an older
checkout) — which means a typo'd or renamed entry would silently drop a
query from the perf record. This guard makes that loud in CI instead.
"""

from __future__ import annotations


def test_headline_names_all_resolve():
    import bench

    from hive_hw_spark.queries import all_queries

    registry = all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"
