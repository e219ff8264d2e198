"""Explicit schemas.

The reference never declares a schema (``pd.DataFrame(records)`` with
dynamic columns, fetch_data.py:146, then partial coercion at
fetch_data.py:149-154). Here every table gets an explicit StructType:
schema-on-read with PERMISSIVE mode + corrupt-record column replaces
pandas' silent coercion (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- The reference's one table (SURVEY.md §1.1; data/crops/*.csv header) ---

AGMARKNET_SCHEMA = StructType([
    StructField("State", StringType()),
    StructField("District", StringType()),
    StructField("Market", StringType()),
    StructField("Commodity", StringType()),          # partition key
    StructField("Variety", StringType()),
    StructField("Grade", StringType()),
    StructField("Arrival_Date", DateType()),
    StructField("Min_Price", DoubleType()),
    StructField("Max_Price", DoubleType()),
    StructField("Modal_Price", DoubleType()),
    StructField("Commodity_Code", IntegerType()),
])

# Raw feed shape before cleaning: everything arrives as strings from the
# JSON API (dates as dd/MM/yyyy); cleaning coerces (functions/cleaning.py).
AGMARKNET_RAW_SCHEMA = StructType([
    StructField(f.name, StringType()) for f in AGMARKNET_SCHEMA.fields
])

# --- Driver testdata star schema (TESTDATA.md / FIXTURES.md §B) ---

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType([
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]),
    "nation": StructType([
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]),
    "customer": StructType([
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]),
    "supplier": StructType([
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]),
    "part": StructType([
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]),
    "orders": StructType([
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]),
    "lineitem": StructType([
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]),
    "events": StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]),
    "documents": StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]),
    "embeddings": StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)
