"""Driver-contract smoke tests."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert {f.name for f in df.schema.fields} == {"lang", "n_docs", "avg_chars"}
    assert len(rows) >= 0


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs


def test_all_queries_build_plans(spark, sf_dir):
    """Every registered query must at least analyze (schema resolves)
    at sf0.001 — catches column typos without running 42 jobs."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, name
