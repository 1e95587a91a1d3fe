"""Sources and sinks (SURVEY.md §2.1)."""

from data_engineering_challenge_spark.sources.io import (
    read_csv,
    read_jdbc,
    read_parquet_table,
    read_testdata,
    write_csv,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_jdbc",
    "read_parquet_table",
    "read_testdata",
    "write_csv",
    "write_parquet",
]
