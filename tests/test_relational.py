"""Differential tests: every declared query vs. its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01). Values must match
EXACTLY — the decimal-cast strategy makes double aggregates cross-engine
deterministic."""

from __future__ import annotations

import pytest

from esvc_spark.queries import all_oracles, all_queries

from .oracle_utils import compare, run_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(sdf, pdf, exact=True)
    assert not problems, f"{name}: {problems}"


def test_all_queries_have_callables():
    for name in ORACLES:
        assert name in QUERIES


def test_every_query_has_a_full_oracle():
    """The whole surface is value-hash checkable: no rows-only entries.
    (A query without an oracle gets only the driver's weak rows-only
    check — round 2's single red row; keep this invariant at zero.)"""
    missing = [name for name in QUERIES if name not in ORACLES]
    assert missing == []
