"""Golden-file tests: pin the cleaning/ingestion contract against REAL
reference output (tests/golden/*.csv = head-slices of
/root/reference/data/crops/{apple,tea,egg}.csv — the reference
pipeline's actual materialized rows, SURVEY.md §5).

The reference output is already-cleaned data, so cleaning it again must
be a no-op on row counts (idempotence) and reproduce the exact typed
values; the known residual dirt (Min>Max rows, SURVEY.md §1.3.5) must
survive and be flaggable, not silently dropped."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from agri_market_data_pipeline_spark.functions.cleaning import clean_agmarknet
from agri_market_data_pipeline_spark.schemas import AGMARKNET_RAW_SCHEMA, AGMARKNET_SCHEMA

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _raw(spark):
    return (
        spark.read.schema(AGMARKNET_RAW_SCHEMA)
        .option("header", True)
        .csv(os.path.join(GOLDEN, "*.csv"))
    )


def test_clean_is_idempotent_on_reference_output(spark):
    raw = _raw(spark)
    n_raw = raw.count()
    assert n_raw == 1717  # 1000 + 436 + 281 data rows
    cleaned = clean_agmarknet(
        raw.withColumn(  # reference CSVs hold ISO dates (already normalized)
            "Arrival_Date", F.date_format(F.to_date("Arrival_Date"), "dd/MM/yyyy")
        )
    )
    assert cleaned.count() == n_raw  # no row lost: output was already clean


def test_types_and_values_match_reference_rows(spark):
    cleaned = clean_agmarknet(
        _raw(spark).withColumn(
            "Arrival_Date", F.date_format(F.to_date("Arrival_Date"), "dd/MM/yyyy")
        )
    )
    assert cleaned.schema == AGMARKNET_SCHEMA
    # First apple row (tests/golden/apple_slice.csv:2):
    row = cleaned.filter(
        (F.col("Commodity") == "Apple")
        & (F.col("Market") == "Udhampur")
        & (F.col("Arrival_Date") == "2007-07-21")
        & (F.col("Modal_Price") == 1600.0)
    ).collect()
    assert row, "reference row not reproduced"
    r = row[0]
    assert r.Min_Price == 1400.0 and r.Max_Price == 1600.0
    assert r.Commodity_Code == 17
    assert r.Arrival_Date == datetime.date(2007, 7, 21)


def test_known_residual_dirt_survives_and_is_flaggable(spark):
    """SURVEY.md §1.3.5: apple.csv holds rows with Min_Price > Max_Price;
    cleaning must keep them (the reference does) and filter_quality-style
    flagging must find them."""
    cleaned = clean_agmarknet(
        _raw(spark).withColumn(
            "Arrival_Date", F.date_format(F.to_date("Arrival_Date"), "dd/MM/yyyy")
        )
    )
    anomalies = cleaned.filter(F.col("Min_Price") > F.col("Max_Price")).count()
    assert anomalies >= 1  # the slice contains at least one such row
