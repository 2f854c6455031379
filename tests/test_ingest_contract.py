"""q_dq_ingest_contract gate tests (VERDICT r6 next-round #3).

Two properties make the gate real rather than decorative:

1. On a CONTRACT-VALID corpus (sf0.001, and the degenerate seeds with
   their NULL optional fields) every check passes — NULL lang/source/
   label/value/props/user_id/event_type must NOT trip the gate.
2. On a VIOLATING corpus, each violation class fires its own check with
   the exact bad-row count, and Spark and DuckDB agree bit-for-bit —
   the same differential contract every other query carries.

The violating dir seeds one row per violation class: NULL doc_id,
duplicate doc_id, NULL text, inconsistent n_chars, NULL vec_id,
duplicate vec_id, NULL embedding, 3-dim embedding, NaN and +Inf
embedding elements, NULL element, NULL event_id, duplicate event_id,
NULL ts, NaN value, -Inf value.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from esvc_spark.queries import all_oracles, all_queries

from .conftest import SF_DIR
from .oracle_utils import compare, run_oracle

GATE = "q_dq_ingest_contract"

_COPY_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)


def _build_violating_dir(base: str) -> None:
    for t in _COPY_TABLES:
        shutil.copyfile(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(base, f"{t}.parquet"),
        )
    con = duckdb.connect()
    src = SF_DIR
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet' WHERE doc_id < 20
          UNION ALL
          SELECT * FROM (VALUES
            (CAST(NULL AS BIGINT), 'null id', 'en', 'src0', CAST(7 AS BIGINT)),
            (CAST(5 AS BIGINT), 'dup id', 'en', 'src0', CAST(6 AS BIGINT)),
            (CAST(90 AS BIGINT), CAST(NULL AS VARCHAR), 'en', 'src0',
             CAST(0 AS BIGINT)),
            (CAST(91 AS BIGINT), 'short', 'en', 'src0', CAST(999 AS BIGINT))
          ) v(doc_id, text, lang, source, n_chars)
        ) TO '{base}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/embeddings.parquet' WHERE vec_id < 20
          UNION ALL
          SELECT CAST(NULL AS BIGINT), embedding, label
          FROM '{src}/embeddings.parquet' WHERE vec_id = 0
          UNION ALL
          SELECT CAST(5 AS BIGINT), embedding, label
          FROM '{src}/embeddings.parquet' WHERE vec_id = 1
          UNION ALL
          SELECT CAST(90 AS BIGINT), CAST(NULL AS FLOAT[]), 0
          UNION ALL
          SELECT CAST(91 AS BIGINT), CAST([1.0, 2.0, 3.0] AS FLOAT[]), 0
          UNION ALL
          SELECT CAST(92 AS BIGINT),
                 CAST(list_transform(range(64),
                      i -> CASE WHEN i = 3 THEN 'nan'::FLOAT ELSE 0.5 END)
                      AS FLOAT[]), 0
          UNION ALL
          SELECT CAST(93 AS BIGINT),
                 CAST(list_transform(range(64),
                      i -> CASE WHEN i = 7 THEN 'inf'::FLOAT ELSE 0.5 END)
                      AS FLOAT[]), 0
          UNION ALL
          SELECT CAST(94 AS BIGINT),
                 CAST(list_transform(range(64),
                      i -> CASE WHEN i = 9 THEN NULL ELSE 0.5 END)
                      AS FLOAT[]), 0
        ) TO '{base}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet' WHERE event_id < 20
          UNION ALL
          SELECT * FROM (VALUES
            (CAST(NULL AS BIGINT), TIMESTAMP '2024-01-01 01:00:00',
             CAST(1 AS BIGINT), 'view', 1.0, '{{}}'),
            (CAST(5 AS BIGINT), TIMESTAMP '2024-01-01 02:00:00',
             CAST(1 AS BIGINT), 'view', 1.0, '{{}}'),
            (CAST(900 AS BIGINT), CAST(NULL AS TIMESTAMP),
             CAST(1 AS BIGINT), 'view', 1.0, '{{}}'),
            (CAST(901 AS BIGINT), TIMESTAMP '2024-01-01 03:00:00',
             CAST(1 AS BIGINT), 'view', 'nan'::DOUBLE, '{{}}'),
            (CAST(902 AS BIGINT), TIMESTAMP '2024-01-01 04:00:00',
             CAST(1 AS BIGINT), 'view', '-inf'::DOUBLE, '{{}}')
          ) v(event_id, ts, user_id, event_type, value, props)
        ) TO '{base}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


@pytest.fixture(scope="module")
def violating_dir(tmp_path_factory) -> str:
    base = str(tmp_path_factory.mktemp("violated_sf"))
    _build_violating_dir(base)
    return base


def test_gate_passes_on_valid_corpus(spark, sf_dir):
    rows = {
        (r["tbl"], r["check_name"]): r
        for r in all_queries()[GATE](spark, sf_dir).collect()
    }
    assert len(rows) == 13
    bad = {k: r["n_bad"] for k, r in rows.items() if r["passed"] != 1}
    assert bad == {}


def test_gate_fires_per_violation_class(spark, violating_dir):
    rows = {
        r["check_name"]: r["n_bad"]
        for r in all_queries()[GATE](spark, violating_dir).collect()
    }
    assert rows == {
        "doc_id_not_null": 1,
        "doc_id_unique": 1,
        "text_not_null": 1,
        # NULL text also fails the length consistency check (999 != len)
        "n_chars_matches_text": 2,
        "vec_id_not_null": 1,
        "vec_id_unique": 1,
        "embedding_not_null": 1,
        # NULL embedding + 3-dim embedding
        "embedding_dim_64": 2,
        # NaN element + Inf element + NULL element + NULL embedding
        "embedding_finite": 4,
        "event_id_not_null": 1,
        "event_id_unique": 1,
        "ts_not_null": 1,
        # NaN + -Inf values (NULL values are allowed)
        "value_finite_or_null": 2,
    }


def test_gate_differential_on_violations(spark, violating_dir):
    """Spark and the DuckDB oracle agree on the violating corpus too —
    the gate's cross-engine contract holds exactly where it matters."""
    sdf = all_queries()[GATE](spark, violating_dir)
    pdf = run_oracle(all_oracles()[GATE], violating_dir)
    problems = compare(sdf, pdf, exact=True)
    assert not problems, problems


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory) -> str:
    """A delivery whose three pipeline tables are EMPTY (schema kept)."""
    base = str(tmp_path_factory.mktemp("empty_sf"))
    for t in _COPY_TABLES:
        shutil.copyfile(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(base, f"{t}.parquet"),
        )
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' WHERE 1 = 0) "
            f"TO '{base}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return base


def test_gate_on_empty_delivery(spark, empty_dir):
    """A zero-row delivery reports 0 bad / passed = 1 / bad_fraction 0.0
    on every check in BOTH engines (ADVICE r7: Spark's SUM over zero rows
    is NULL — the gate must not report an empty table as indeterminate)."""
    rows = all_queries()[GATE](spark, empty_dir).collect()
    assert len(rows) == 13
    for r in rows:
        assert r["n_rows"] == 0 and r["n_bad"] == 0, r
        assert r["passed"] == 1 and r["bad_fraction"] == 0.0, r
    problems = compare(
        all_queries()[GATE](spark, empty_dir),
        run_oracle(all_oracles()[GATE], empty_dir),
        exact=True,
    )
    assert not problems, problems
