"""Cleaning-contract tests (SURVEY.md §1.3): pin the reference's observable
cleaning behaviors on literal mini-DataFrames.

Reference semantics reproduced:
- date coercion dd/MM/yyyy, null on failure   (fetch_data.py:149-153)
- numeric coercion, null on failure           (fetch_data.py:154)
- drop rows with null Commodity/Modal_Price   (fetch_data.py:156)
- safe_name partition-key normalization       (fetch_data.py:36-40)
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from agri_market_data_pipeline_spark.functions.cleaning import (
    cast_date_coerce,
    cast_double_coerce,
    clean_agmarknet,
    filter_required_nonnull,
)
from agri_market_data_pipeline_spark.operators.scalar_fns import safe_name


def test_cast_date_coerce_dayfirst_and_null_on_failure(spark):
    df = spark.createDataFrame(
        [("15/01/2023",), ("31/12/2006",), ("not-a-date",), ("2023-13-45",), (None,)],
        ["d"],
    )
    out = [r.d for r in df.select(cast_date_coerce("d").alias("d")).collect()]
    assert out[0] == datetime.date(2023, 1, 15)
    assert out[1] == datetime.date(2006, 12, 31)
    assert out[2] is None and out[3] is None and out[4] is None


def test_cast_double_coerce_null_on_failure(spark):
    df = spark.createDataFrame([("1600",), ("350.0",), ("abc",), ("",), (None,)], ["p"])
    out = [r.p for r in df.select(cast_double_coerce("p").alias("p")).collect()]
    assert out[0] == 1600.0 and out[1] == 350.0
    assert out[2] is None and out[3] is None and out[4] is None


def test_filter_required_nonnull(spark):
    df = spark.createDataFrame(
        [
            Row(Commodity="Apple", Modal_Price=100.0),
            Row(Commodity=None, Modal_Price=100.0),
            Row(Commodity="Apple", Modal_Price=None),
        ]
    )
    out = filter_required_nonnull(df).collect()
    assert len(out) == 1


def test_safe_name_matches_reference_examples(spark):
    # "Bhindi(Ladies Finger)" -> "bhindiladies_finger" (SURVEY.md §1.3.4)
    df = spark.createDataFrame(
        [("Bhindi(Ladies Finger)",), ("  Apple ",), ("Green Chilli",), ("Arhar (Tur/Red Gram)",)],
        ["c"],
    )
    out = [r.s for r in df.select(safe_name("c").alias("s")).collect()]
    assert out == ["bhindiladies_finger", "apple", "green_chilli", "arhar_turred_gram"]


def test_clean_agmarknet_end_to_end(spark):
    raw = spark.createDataFrame(
        [
            # good row, Indian date format
            ("Kerala", "Ernakulam", "Aluva", "Apple", "Other", "FAQ",
             "15/01/2023", "1500", "1700", "1600", "17"),
            # unparseable price -> coerced null -> dropped
            ("Kerala", "Ernakulam", "Aluva", "Apple", "Other", "FAQ",
             "15/01/2023", "1500", "1700", "n/a", "17"),
            # null commodity -> dropped
            ("Kerala", "Ernakulam", "Aluva", None, "Other", "FAQ",
             "15/01/2023", "1500", "1700", "1600", "17"),
            # bad date -> date null but row kept (reference keeps it)
            ("Kerala", "Ernakulam", "Aluva", "Apple", "Other", "FAQ",
             "99/99/9999", "1500", "1700", "350.0", "17"),
        ],
        "State string, District string, Market string, Commodity string, "
        "Variety string, Grade string, Arrival_Date string, Min_Price string, "
        "Max_Price string, Modal_Price string, Commodity_Code string",
    )
    out = clean_agmarknet(raw).collect()
    assert len(out) == 2
    good = [r for r in out if r.Arrival_Date is not None][0]
    assert good.Arrival_Date == datetime.date(2023, 1, 15)
    assert good.Modal_Price == 1600.0
    bad_date = [r for r in out if r.Arrival_Date is None][0]
    assert bad_date.Modal_Price == 350.0
