"""Multi-format source/sink layer: CSV, JSON, ORC, Parquet.

The reference ingests only over JDBC (SQL Server ``sql_to_es_etl.py:76-82``,
Snowflake ``snowflake_to_es_etl.py:89-99``) and writes Parquet/ES. A
complete engine also speaks the file formats a lake actually contains;
these helpers pin the correctness-bearing options (explicit schema — NO
runtime inference on the read path, header handling, timestamp format)
so format round-trips are loss-free and oracle-checkable.

Scale notes: CSV/JSON are splittable by line so big files parallelize,
but they are row-oriented, schema-on-read, and 5-10x the scan cost of
Parquet — the engine treats them as INGEST formats (read once, write
Parquet partitioned, query that), which is exactly what
``preprocess_and_store_parquets.py`` did with its RDBMS source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink with pinned header/timestamp options (overwrite).

    ``ignoreLeading/TrailingWhiteSpace`` are TRUE by default on write —
    Spark silently strips field-edge spaces; pinned false here (found by
    the round-trip property test, tests/test_properties.py)."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV scan with an EXPLICIT schema — inference reads the data twice
    and guesses types per run; a 100 TB ingest declares its contract.

    ``multiLine`` is required to re-parse quoted embedded newlines the
    writer legally emits (without it, rows split mid-field). Lossy corner
    that remains: CSV cannot represent empty-string vs null — both read
    back as null."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .option("multiLine", "true")
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (overwrite). Timestamps serialized with the pinned
    format so the read side re-parses them exactly."""
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with explicit schema (schema-on-read, no inference
    pass; missing keys become nulls, matching lake semantics)."""
    return (
        spark.read.schema(schema).option("timestampFormat", _TS_FMT).json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like Parquet; schema travels with the file."""
    return spark.read.orc(path)
