"""Property-based tests (hypothesis): the cleaning contract holds for
arbitrary inputs, not just the profiled ones."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Pure-Python twin of the reference's safe_name (fetch_data.py:36-40
# semantics, re-expressed from the SURVEY description): lower, trim,
# drop [^\w\s-], collapse whitespace to _.


def safe_name_py(text: str) -> str:
    s = text.lower().strip()
    s = re.sub(r"[^\w\s-]", "", s)
    s = re.sub(r"\s+", "_", s)
    return s


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_safe_name_spark_matches_python(spark, rows):
    from agri_market_data_pipeline_spark.operators.scalar_fns import safe_name

    df = spark.createDataFrame([(r,) for r in rows], ["c"])
    got = [r.s for r in df.select(safe_name("c").alias("s")).collect()]
    assert got == [safe_name_py(r) for r in rows]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.from_regex(r"[0-3]?\d/[01]?\d/\d{4}", fullmatch=True),
            st.text(alphabet="0123456789/ab-", min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_date_coerce_never_throws_and_nulls_invalid(spark, rows):
    """errors='coerce' parity: any string either parses as dd/MM/yyyy or
    becomes null — the pipeline never raises on dirty feed data."""
    from agri_market_data_pipeline_spark.functions.cleaning import cast_date_coerce

    df = spark.createDataFrame([(r,) for r in rows], ["d"])
    out = df.select(cast_date_coerce("d").alias("d")).collect()
    assert len(out) == len(rows)  # no crash, row-for-row
