"""Sink layer: schema contracts, partitioned Parquet, merge-by-key upsert.

Re-expresses the reference's three sink behaviors Spark-first:

- ``sink_schema_ddl`` (reference ``sql_to_es_etl.py:98-134``): the ES
  mapping classes are a writer-side DDL layer. Here that collapses to an
  explicit ``StructType`` contract asserted before write.
- ``sink_parquet_partitioned`` (``preprocess_and_store_parquets.py:243-249``):
  the reference loops month buckets and overwrites one directory per
  bucket, with ``repartition(df.count())`` producing one row per file —
  an anti-pattern at scale. Here: a single ``partitionBy`` write with
  dynamic partition overwrite (idempotent per-partition replace, no
  driver loop, no tiny files) and ``maxRecordsPerFile`` to bound file
  size instead of row-per-file.
- ``sink_es_upsert`` (``snowflake_to_es_etl.py:234-241``): ES
  ``es.write.operation=upsert`` merges documents by id. Here:
  ``merge_upsert`` — union existing+incoming, keep the latest row per
  key by an ordering column. Pure shuffle-on-key; no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaContractError(ValueError):
    """Raised when a DataFrame does not match the declared sink schema."""


def assert_schema_contract(df: DataFrame, expected: StructType, check_nullability: bool = False) -> DataFrame:
    """Writer-side schema contract (stand-in for the reference's ES mapping DDL).

    Compares field names and types (nullability optionally). Raises with a
    field-by-field diff, so a drifting upstream plan fails fast at the sink
    boundary instead of corrupting the table.
    """
    def norm(st: StructType):
        return [
            (f.name, f.dataType.simpleString(), f.nullable if check_nullability else None)
            for f in st.fields
        ]

    got, want = norm(df.schema), norm(expected)
    if got != want:
        lines = ["schema contract violation:"]
        for g, w in zip(got + [None] * max(0, len(want) - len(got)),
                        want + [None] * max(0, len(got) - len(want))):
            if g != w:
                lines.append(f"  got {g} want {w}")
        raise SchemaContractError("\n".join(lines))
    return df


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "month_year",
    max_records_per_file: int = 1_000_000,
    expected_schema: StructType | None = None,
) -> None:
    """Partitioned Parquet overwrite, idempotent per partition.

    ``partitionOverwriteMode=dynamic`` replaces only the partitions present
    in ``df`` — the scalable equivalent of the reference's per-bucket
    directory overwrite loop (one write job instead of N driver-looped
    jobs; late re-runs of one month touch only that month).
    """
    if expected_schema is not None:
        assert_schema_contract(df, expected_schema)
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(partition_col)
        .parquet(path)
    )


def latest_by_key(df: DataFrame, key_cols: list[str], order_col: str, tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Keep the newest row per key: row_number() over (partition by key
    order by order_col desc, tiebreakers desc) == 1.

    This is the merge step of upsert semantics. At scale it is one hash
    shuffle on the key; AQE handles skewed keys. Tiebreakers make the
    result deterministic when order_col ties.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    existing: DataFrame | None,
    incoming: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Upsert merge: union existing and incoming by name, keep latest per key.

    Idempotent: re-applying the same incoming batch yields the same table
    (the property the reference got from ES ``upsert`` + ``mode('append')``).
    """
    merged = incoming if existing is None else existing.unionByName(incoming)
    return latest_by_key(merged, key_cols, order_col, tiebreak_cols)
