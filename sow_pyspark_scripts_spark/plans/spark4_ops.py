"""Spark-4-native surface tier: the three engine capabilities Spark 4
added that a 100 TB lakehouse pipeline should expose — the VARIANT
semi-structured type (replaces schema-on-write ``from_json`` for open
JSON, the path the reference's ES sink implied for `props`-style
payloads), SQL recursive CTEs (hierarchy/BOM traversal the reference
pushed to its RDBMS — SURVEY.md §2 marks all pushed-down SQL as ours to
re-express), and the Python DataSource API (the modern, Arrow-batched
answer to the reference's JDBC source plumbing,
``sql_to_es_etl.py:76-82``).

Scale notes:
- VARIANT parses once into a binary-encoded tree; ``variant_get``
  path extraction is JVM-side (no Python boundary) and columnar, so
  extracting one field from petabytes of heterogeneous JSON does not
  pay string re-parsing per access the way repeated ``get_json_object``
  calls do;
- the recursive CTE's per-iteration increment is a join of the frontier
  (rows added last round) against the dimension — Catalyst plans each
  step; the frontier is small even when the dimension is not, which is
  exactly the BOM-explosion access pattern;
- the Python DataSource reader declares explicit input partitions, so a
  custom source parallelizes across executors like any file scan
  instead of funneling through one driver connection (the reference's
  single-partition JDBC read is the anti-pattern this replaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table

# ---------------------------------------------------------------------------
# expr_variant_extract — VARIANT semi-structured field access
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
"""


@query("expr_variant_extract", _VARIANT_ORACLE)
def expr_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema JSON via the VARIANT type (Spark 4): ``parse_json``
    decodes each payload once into Spark's binary variant encoding, and
    ``variant_get`` extracts a typed path JVM-side. Against
    ``events_json_props``'s ``from_json`` (fixed schema declared
    up-front), VARIANT keeps fields the schema didn't anticipate —
    the right default for prop-bag columns that drift weekly — while
    staying columnar and whole-stage-codegen'd, with none of the
    per-access string re-parsing of chained ``get_json_object``. The
    aggregate is one map-side-combined hash agg on a 5-value key.
    """
    ev = read_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.filter(F.col("props").isNotNull())
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# sql_recursive_bom — WITH RECURSIVE hierarchy explosion
# ---------------------------------------------------------------------------

_BOM_SQL = """
WITH RECURSIVE bom AS (
  SELECT p_partkey AS pkey, 0 AS lvl FROM {part} WHERE p_partkey = 1
  UNION ALL
  SELECT p.p_partkey AS pkey, b.lvl + 1 AS lvl
  FROM bom b JOIN {part} p
    ON p.p_partkey = b.pkey * 2 OR p.p_partkey = b.pkey * 2 + 1
)
SELECT CAST(lvl AS BIGINT) AS lvl,
       count(*) AS n_parts,
       sum(pkey) AS sum_keys
FROM bom GROUP BY lvl
"""


@query("sql_recursive_bom", _BOM_SQL.format(part="part"))
def sql_recursive_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion with a SQL recursive CTE (Spark 4's
    WITH RECURSIVE): part k's components are parts 2k and 2k+1 — a
    synthetic but structurally faithful assembly tree rooted at part 1,
    traversed to its leaves with per-level counts. This is the
    hierarchy-walk class of query the reference could only run by
    pushing SQL into SQL Server (SURVEY.md §3 E1 boundary); here the
    engine itself iterates, and each recursion step joins only the
    current frontier against the part dimension, so the per-step work
    tracks the frontier size, not the table. Levels are integer-exact.
    """
    read_table(spark, sf_dir, "part").createOrReplaceTempView("__bom_part")
    return spark.sql(_BOM_SQL.format(part="__bom_part"))


# ---------------------------------------------------------------------------
# src_python_datasource — custom Python DataSource (Spark 4 API)
# ---------------------------------------------------------------------------

_PYDS_ROWS = 10_000
_PYDS_PARTS = 8

_PYDS_ORACLE = f"""
SELECT id % 10 AS bucket,
       count(*) AS n,
       min(md5(CAST(id AS VARCHAR))) AS min_tag
FROM range({_PYDS_ROWS}) t(id)
GROUP BY id % 10
"""


@query("src_python_datasource", _PYDS_ORACLE)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user-defined table source via Spark 4's Python DataSource API:
    the reader declares 8 explicit input partitions, each generating its
    deterministic id-range independently on an executor — the pattern
    that replaces the reference's one-connection JDBC pull
    (``sql_to_es_etl.py:76-82``, which read the whole relation through
    a single partition and then repartition(300)'d it). A custom API
    client, message-queue poller, or object-store lister slots into the
    same two classes; the md5 tag makes the output value-checkable
    against the oracle's ``range()`` twin. The downstream agg is an
    ordinary hash aggregate — custom sources compose with Catalyst
    like any native scan.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    rows_per = _PYDS_ROWS // _PYDS_PARTS

    class _SynthReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(_PYDS_PARTS)]

        def read(self, partition):
            import hashlib

            start = partition.value * rows_per
            for rid in range(start, start + rows_per):
                yield (rid, rid % 10, hashlib.md5(str(rid).encode()).hexdigest())

    class _SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_rows"

        def schema(self):
            return "id BIGINT, bucket BIGINT, tag STRING"

        def reader(self, schema):
            return _SynthReader()

    spark.dataSource.register(_SynthSource)
    df = spark.read.format("synthetic_rows").load()
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.min("tag").alias("min_tag")
    )
