"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"p_brand", "order_year", "n_lines", "avg_price"}


def test_every_oracle_has_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"


def test_queries_run_at_smoke_sf(spark, sf_dir):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        # touch the plan + a cheap action; full value checks are in
        # tools/selfcheck.py against DuckDB
        n = df.limit(5).count()
        assert n >= 0, name


def test_docstring_constants_render_at_registration():
    """registry._render_doc: every registered operator's docstring has
    its {_CONSTANT} tokens substituted (f-strings can't BE docstrings);
    regex braces like {m,n} must survive untouched."""
    import re

    import __spark_entry__ as entrymod
    from agri_market_data_pipeline_spark.registry import all_queries

    unrendered = [
        n
        for n, f in all_queries().items()
        if f.__doc__ and re.search(r"\{_[A-Z][A-Z0-9_]*\}", f.__doc__)
    ]
    assert not unrendered, f"unrendered docstring tokens: {unrendered}"
