"""The reference's cleaning contract, Spark-native (SURVEY.md §1.3).

Bit-compatible in effect with fetch_data.py's pandas pass:

- ``cast_date_coerce``    ≡ pd.to_datetime(col, dayfirst=True,
                            errors="coerce")        (fetch_data.py:149-153)
- ``cast_double_coerce``  ≡ pd.to_numeric(col, errors="coerce")
                                                    (fetch_data.py:154)
- ``filter_required_nonnull`` ≡ df.dropna(subset=["Commodity",
                            "Modal_Price"])         (fetch_data.py:156)
- ``clean_agmarknet``     = the whole pass over a raw (all-string) page.

All expressions are ANSI-safe (try_* variants), so the engine behaves
identically whether ``spark.sql.ansi.enabled`` is on or off — pandas'
errors="coerce" is exactly try-semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cast_date_coerce(col: Column | str, fmt: str = "dd/MM/yyyy") -> Column:
    """dd/MM/yyyy string → DateType, null on failure (dayfirst parsing).

    `try_to_timestamp` (not `to_date`) so behavior is null-on-failure even
    under ANSI mode, matching pandas errors="coerce"."""
    return F.try_to_timestamp(_c(col), F.lit(fmt)).cast("date")


def cast_double_coerce(col: Column | str) -> Column:
    """Numeric string → DoubleType, null on failure ('' included)."""
    return _c(col).try_cast("double")


def filter_required_nonnull(
    df: DataFrame, subset: tuple[str, ...] = ("Commodity", "Modal_Price")
) -> DataFrame:
    """Drop rows with nulls in the mandatory fields (post-coercion, so a
    price that failed coercion drops its row — reference order of ops)."""
    return df.na.drop(subset=list(subset))


def clean_agmarknet(raw: DataFrame) -> DataFrame:
    """Full cleaning pass over a raw all-string agmarknet page:
    type the three coerced columns (the reference coerces exactly
    Arrival_Date and Modal_Price; we deliberately also type Min/Max_Price
    and Commodity_Code — documented deviation, SURVEY.md §1.3.2), then
    apply the mandatory-field filter."""
    df = (
        raw.withColumn("Arrival_Date", cast_date_coerce("Arrival_Date"))
        .withColumn("Min_Price", cast_double_coerce("Min_Price"))
        .withColumn("Max_Price", cast_double_coerce("Max_Price"))
        .withColumn("Modal_Price", cast_double_coerce("Modal_Price"))
        .withColumn("Commodity_Code", _c("Commodity_Code").try_cast("int"))
    )
    return filter_required_nonnull(df)
