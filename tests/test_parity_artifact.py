"""Pin the checked-in PARITY.json artifact to the live registry.

The artifact itself is produced by ``scripts/parity_matrix.py`` (full
registry vs DuckDB at sf0.01 — too heavy for every pytest run, which
already runs the same comparison per-query at sf0.001 in
``test_oracle_parity.py``). This test keeps the artifact honest: it
must cover exactly the registered queries, agree with the registry on
which have oracles, and contain no recorded failures.
"""

from __future__ import annotations

import json
import os

import pytest

from lookup_transform_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "PARITY.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(PATH):
        pytest.fail(
            "PARITY.json missing — regenerate with scripts/parity_matrix.py"
        )
    with open(PATH) as f:
        return json.load(f)


def test_artifact_covers_registry_exactly(artifact):
    assert set(artifact["queries"]) == set(registry.QUERIES), (
        "PARITY.json out of sync with registry — regenerate with "
        "scripts/parity_matrix.py"
    )


def test_artifact_oracle_flags_match_registry(artifact):
    for name, rec in artifact["queries"].items():
        if name in registry.ORACLES:
            assert rec["status"] != "rows_only", (
                f"{name} has an oracle now — regenerate PARITY.json"
            )
        else:
            assert rec["status"] == "rows_only", (
                f"{name} lost its oracle — regenerate PARITY.json"
            )


def test_artifact_has_no_failures(artifact):
    bad = {
        n: r.get("err")
        for n, r in artifact["queries"].items()
        if r["status"] not in ("pass", "rows_only")
    }
    assert not bad, f"PARITY.json records failures: {bad}"


def test_rows_only_entries_carry_green_bound_checks(artifact):
    """VERDICT r9 #4: every rows-only query records a quantitative
    bound verdict (parity_bounds.BOUND_CHECKS) and that verdict passed
    — a new rows-only query without a registered check fails here, as
    does a bound regression recorded by the last regeneration."""
    from lookup_transform_spark import parity_bounds

    for name, rec in artifact["queries"].items():
        if rec["status"] != "rows_only":
            continue
        assert name in parity_bounds.BOUND_CHECKS, (
            f"{name} is rows-only but has no bound check registered"
        )
        bc = rec.get("bound_check")
        assert bc is not None, (
            f"{name}: PARITY.json predates bound checks — regenerate"
        )
        assert bc["passed"] is True, f"{name}: bound check failed: {bc}"


def test_artifact_summary_consistent(artifact):
    s = artifact["summary"]
    q = artifact["queries"]
    assert s["n_queries"] == len(q)
    assert s["n_pass"] == sum(1 for r in q.values() if r["status"] == "pass")
    assert s["n_rows_only"] == sum(
        1 for r in q.values() if r["status"] == "rows_only"
    )
