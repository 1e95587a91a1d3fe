"""Explicit schemas — never infer in production paths.

The reference uses SQLite's dynamic typing plus pandas inference (reference
pipeline/db_operations.py:46-57); here every table has a declared StructType.
Parquet reads use the file schema (already strongly typed by the driver);
these StructTypes are applied to CSV reads and used to validate fixture data.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- attribution star schema (reference-native; SURVEY.md §1.1) -------------

# reference pipeline/cj_builder.py:36-42 (+ revenue: channel_reporter.py:70,77)
CONVERSIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("conv_date", StringType(), False),  # 'YYYY-MM-DD'
        StructField("conv_time", StringType(), False),  # 'HH:MM:SS'
        StructField("revenue", DoubleType(), True),
    ]
)

# reference pipeline/cj_builder.py:62-72
SESSION_SOURCES = StructType(
    [
        StructField("session_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("event_date", StringType(), False),
        StructField("event_time", StringType(), False),
        StructField("channel_name", StringType(), False),
        StructField("holder_engagement", IntegerType(), False),
        StructField("closer_engagement", IntegerType(), False),
        StructField("impression_interaction", IntegerType(), False),
    ]
)

# reference pipeline/channel_reporter.py:40-44
SESSION_COSTS = StructType(
    [
        StructField("session_id", StringType(), False),
        StructField("cost", DoubleType(), True),
    ]
)

# reference pipeline/api_client.py:146-148
ATTRIBUTION_CUSTOMER_JOURNEY = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("session_id", StringType(), False),
        StructField("ihc", DoubleType(), False),
    ]
)

# reference pipeline/channel_reporter.py:105-107
CHANNEL_REPORTING = StructType(
    [
        StructField("channel_name", StringType(), False),
        StructField("date", StringType(), False),
        StructField("cost", DoubleType(), True),
        StructField("ihc", DoubleType(), True),
        StructField("ihc_revenue", DoubleType(), True),
    ]
)

# the 8-column journey interchange relation (reference cj_builder.py:103-106)
CUSTOMER_JOURNEY = StructType(
    [
        StructField("conversion_id", StringType(), False),
        StructField("session_id", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("channel_label", StringType(), False),
        StructField("holder_engagement", IntegerType(), False),
        StructField("closer_engagement", IntegerType(), False),
        StructField("conversion", IntegerType(), False),
        StructField("impression_interaction", IntegerType(), False),
    ]
)

# --- driver testdata tables (/root/testdata/sf*/, TESTDATA.md) --------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), False),
        StructField("r_name", StringType(), False),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), False),
        StructField("n_name", StringType(), False),
        StructField("n_regionkey", IntegerType(), False),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), False),
        StructField("c_name", StringType(), False),
        StructField("c_nationkey", IntegerType(), False),
        StructField("c_acctbal", DoubleType(), False),
        StructField("c_mktsegment", StringType(), False),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), False),
        StructField("s_name", StringType(), False),
        StructField("s_nationkey", IntegerType(), False),
        StructField("s_acctbal", DoubleType(), False),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), False),
        StructField("p_name", StringType(), False),
        StructField("p_brand", StringType(), False),
        StructField("p_type", StringType(), False),
        StructField("p_size", IntegerType(), False),
        StructField("p_retailprice", DoubleType(), False),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), False),
        StructField("o_custkey", LongType(), False),
        StructField("o_orderstatus", StringType(), False),
        StructField("o_totalprice", DoubleType(), False),
        StructField("o_orderdate", TimestampType(), False),
        StructField("o_orderpriority", StringType(), False),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), False),
        StructField("l_partkey", LongType(), False),
        StructField("l_suppkey", LongType(), False),
        StructField("l_linenumber", IntegerType(), False),
        StructField("l_quantity", DoubleType(), False),
        StructField("l_extendedprice", DoubleType(), False),
        StructField("l_discount", DoubleType(), False),
        StructField("l_tax", DoubleType(), False),
        StructField("l_returnflag", StringType(), False),
        StructField("l_linestatus", StringType(), False),
        StructField("l_shipdate", TimestampType(), False),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("props", StringType(), True),  # JSON string
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("source", StringType(), False),
        StructField("n_chars", LongType(), False),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), False),
    ]
)

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
