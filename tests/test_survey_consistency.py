"""SURVEY.md §2 Part B ↔ implementation consistency guard.

The operator table is the judge-facing contract; the registry and the
UNIT_ONLY map are the implementations. This test pins the three views
together so a row added to one without the others fails loudly instead
of silently drifting (the COVERAGE.md generator only sees the registry,
so a SURVEY row with no implementation would otherwise go unnoticed).
"""

from __future__ import annotations

import re

from hive_hw_spark.queries import all_queries
from scripts.gen_coverage import UNIT_ONLY


def _survey_part_b_ids() -> set[str]:
    with open("SURVEY.md") as f:
        text = f.read()
    part_b = text.split("### Part B")[1].split("\n## ")[0]
    return set(re.findall(r"^\| (Q[0-9]+[a-z]?) \|", part_b, re.M))


def test_every_survey_row_has_an_implementation():
    ids = _survey_part_b_ids()
    assert len(ids) > 150
    covered = {n.capitalize() for n in all_queries()} | set(UNIT_ONLY)
    missing = {
        i for i in ids
        if i not in covered and i.lower() not in all_queries()
    }
    assert not missing, f"SURVEY rows with no implementation: {sorted(missing)}"


def test_every_registry_entry_has_a_survey_row():
    ids = {i.lower() for i in _survey_part_b_ids()}
    unmapped = {n for n in all_queries() if n not in ids}
    assert not unmapped, f"registry entries missing from SURVEY §2: {sorted(unmapped)}"


def test_every_unit_only_contract_has_a_survey_row():
    ids = _survey_part_b_ids()
    unmapped = set(UNIT_ONLY) - ids
    assert not unmapped, f"UNIT_ONLY contracts missing from SURVEY §2: {sorted(unmapped)}"
