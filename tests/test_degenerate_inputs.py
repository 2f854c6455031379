"""Degenerate-input differential suite (VERDICT r4 next-round #6).

The r3/r4 ADVICE findings shared one shape: an expression correct on
generator-typical rows that diverges (or errors) on an empty/degenerate
row — `slice` on an empty token list, `string_split('')`, zero-length
audio chunks, zero-token documents. This suite makes that class
systematic: build a tiny sf-dir whose documents/embeddings/events tables
are SEEDED with degenerate rows (empty text, whitespace-only text,
single-token docs, exact-duplicate docs, newline text, zero vectors,
duplicate vectors, constant vectors, single-event users, tied
timestamps, empty-JSON props, zero values — and, round 6, NULL optional
fields: lang/source/label/value/props/user_id/event_type, plus sparse
event ids; identity and payload columns doc_id/text/ts/vec_id/embedding
stay NOT NULL by ingest contract), then run every registered query
through the SAME Spark-vs-DuckDB comparator the driver uses. Any
unguarded edge either errors or hash-mismatches here at 50-row scale.

The remaining tables (region..lineitem) are copied verbatim from
sf0.001 so loaders and oracles see the full catalog.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from esvc_spark.queries import all_oracles, all_queries

from .conftest import SF_DIR
from .oracle_utils import compare, run_oracle

QUERIES = all_queries()
ORACLES = all_oracles()

# Round 6 (VERDICT r5 next-round #2): the parametrization is the WHOLE
# registered surface, not a per-round allowlist — the zero-norm cosine
# crash hid for two rounds in earlier-vintage queries precisely because
# the original list covered only round-4/5 names. Every query runs the
# driver's Spark-vs-DuckDB comparator on the degenerate-seeded tables.
# Skips must be explicit and justified here.
DEGEN_SKIP: dict[str, str] = {}

DEGEN_QUERIES = sorted(n for n in QUERIES if n not in DEGEN_SKIP)

_COPY_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

# lang/source values drawn from the generator's domain so per-group
# queries see the degenerates inside existing groups.
_DEGEN_DOCS = [
    ("", "en", "src0"),
    (" ", "en", "src1"),
    ("   ", "fr", "src2"),
    ("a", "de", "src3"),
    ("dup dup dup dup", "es", "src4"),
    ("!!!", "zh", "src5"),
    ("fast slow", "en", "src6"),
    ("  leading and trailing  ", "en", "src7"),
    ("line one\nline two", "fr", "src8"),
    ("a" * 200, "en", "src9"),
]


def _build_degen_dir(base: str) -> None:
    for t in _COPY_TABLES:
        shutil.copyfile(
            os.path.join(SF_DIR, f"{t}.parquet"), os.path.join(base, f"{t}.parquet")
        )
    con = duckdb.connect()
    src = SF_DIR

    # documents: 40 originals + 10 degenerates + 1 exact duplicate of
    # doc 0 + 2 NULL-optional-field rows (round 6: NULL lang/source —
    # identity and payload columns stay NOT NULL by ingest contract)
    doc_rows = ", ".join(
        f"({40 + i}, {t!r}, {lang!r}, {srcv!r}, {len(t)})"
        for i, (t, lang, srcv) in enumerate(_DEGEN_DOCS)
    )
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet' WHERE doc_id < 40
          UNION ALL
          SELECT * FROM (VALUES {doc_rows})
            v(doc_id, text, lang, source, n_chars)
          UNION ALL
          SELECT CAST(50 AS BIGINT), text, lang, source, n_chars
          FROM '{src}/documents.parquet' WHERE doc_id = 0
          UNION ALL
          SELECT * FROM (VALUES
            (CAST(60 AS BIGINT), 'fast slow key value',
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(19 AS BIGINT)),
            (CAST(61 AS BIGINT), 'the a of and to', 'en',
             CAST(NULL AS VARCHAR), CAST(15 AS BIGINT))
          ) n(doc_id, text, lang, source, n_chars)
        ) TO '{base}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: 100 originals + zero vector, duplicate of vec 0,
    # constant vector (labels from the existing domain)
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/embeddings.parquet' WHERE vec_id < 100
          UNION ALL
          SELECT CAST(100 AS BIGINT),
                 CAST(list_transform(range(64), i -> 0.0) AS FLOAT[]), 0
          UNION ALL
          SELECT CAST(101 AS BIGINT), embedding, label
          FROM '{src}/embeddings.parquet' WHERE vec_id = 0
          UNION ALL
          SELECT CAST(102 AS BIGINT),
                 CAST(list_transform(range(64), i -> 0.5) AS FLOAT[]), 1
          UNION ALL
          SELECT CAST(103 AS BIGINT), embedding, CAST(NULL AS INTEGER)
          FROM '{src}/embeddings.parquet' WHERE vec_id = 1
          UNION ALL
          -- round 7 (ADVICE): vote-tie-with-NULL-label — five clones of
          -- vec 2's embedding labelled NULL,NULL,own,own,other, so
          -- anchor 2's top-5 neighborhood votes NULL:2 vs own_label:2
          -- and the majority tiebreak over the NULLABLE label column
          -- decides n_consistent (Spark ASC = NULLS FIRST elects NULL
          -- -> inconsistent; an unpinned DuckDB oracle would elect
          -- own_label -> consistent and hash-diverge).
          SELECT CAST(104 AS BIGINT) + i, embedding,
                 CASE WHEN i < 2 THEN CAST(NULL AS INTEGER)
                      WHEN i < 4 THEN label ELSE label + 1 END
          FROM '{src}/embeddings.parquet', unnest(range(5)) t(i)
          WHERE vec_id = 2
        ) TO '{base}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    # events: 300 originals + single-event user, tied-timestamp pair,
    # zero value, empty-JSON props, exact-midnight boundary
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet' WHERE event_id < 300
          UNION ALL
          SELECT * FROM (VALUES
            (CAST(300 AS BIGINT), TIMESTAMP '2024-01-01 05:00:00',
             CAST(9999 AS BIGINT), 'view', 1.0, '{{"k": 1}}'),
            (CAST(301 AS BIGINT), TIMESTAMP '2024-01-01 06:30:30.123456',
             CAST(9998 AS BIGINT), 'click', 2.5, '{{"k": 2}}'),
            (CAST(302 AS BIGINT), TIMESTAMP '2024-01-01 06:30:30.123456',
             CAST(9998 AS BIGINT), 'purchase', 0.0, '{{"k": 3}}'),
            (CAST(303 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
             CAST(9997 AS BIGINT), 'signup', 0.0, '{{}}'),
            (CAST(304 AS BIGINT), TIMESTAMP '2024-01-02 00:00:00',
             CAST(9997 AS BIGINT), 'error', 0.0, '{{}}'),
            -- round 6: NULL optional fields (subject-less event, untyped
            -- event) at SPARSE ids — 307/309 skip 305/306/308, so any
            -- oracle assuming a dense id space diverges from the
            -- operator (q_stream_heads' old max-bound head rule did)
            (CAST(307 AS BIGINT), TIMESTAMP '2024-01-01 07:00:00',
             CAST(NULL AS BIGINT), 'view', CAST(NULL AS DOUBLE),
             CAST(NULL AS VARCHAR)),
            (CAST(309 AS BIGINT), TIMESTAMP '2024-01-01 08:00:00',
             CAST(9996 AS BIGINT), CAST(NULL AS VARCHAR), 1.5, '{{}}')
          ) v(event_id, ts, user_id, event_type, value, props)
        ) TO '{base}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


@pytest.fixture(scope="session")
def degen_dir(tmp_path_factory) -> str:
    base = str(tmp_path_factory.mktemp("degen_sf"))
    _build_degen_dir(base)
    return base


def test_skip_list_is_registered():
    missing = [n for n in DEGEN_SKIP if n not in QUERIES]
    assert missing == []


@pytest.mark.parametrize("name", DEGEN_QUERIES)
def test_degenerate_inputs(spark, degen_dir, name):
    sdf = QUERIES[name](spark, degen_dir)
    pdf = run_oracle(ORACLES[name], degen_dir)
    problems = compare(sdf, pdf, exact=True)
    assert not problems, f"{name}: {problems}"
