"""Cross-engine result-type-class parity for every oracle-checked query.

Round 5's driver reds were a TYPE-level hash mismatch (DuckDB HUGEINT
vs Spark BIGINT) that was invisible at value level; the BIGINT cast
table closed the int128 boundary. This test closes every neighboring
boundary: for each query it compares the Spark result schema against
the DuckDB oracle's planned types, normalized to coarse classes
(int32 / int64 / float32 / float64 / str / bool / date / timestamp /
list / decimal), and asserts they agree column-for-column. A future
driver that hashes through Arrow (where int32 and int64 differ) can
then never red a value-identical result.

Plan-only on both sides: Spark schemas come from DataFrame analysis,
DuckDB types from relation binding — no rows are moved, so the full
481-query sweep stays cheap. Queries whose builders EXECUTE eagerly
(index builds, streaming drains) still run their side effects at
sf0.001, same as tests/test_plan_hygiene.py.
"""

from __future__ import annotations

import pytest

from sow_pyspark_scripts_spark.registry import pinned_queries, resolved_oracles


def _duck_class(duck_t) -> str:
    t = str(duck_t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int32"
    if t in ("BIGINT", "UBIGINT"):
        return "int64"
    if t in ("HUGEINT", "UHUGEINT"):
        return "int128"
    if t == "FLOAT":
        return "float32"
    if t == "DOUBLE":
        return "float64"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t.endswith("[]"):
        return "list"
    return t


def _spark_class(spark_t) -> str:
    s = spark_t.simpleString()
    flat = {
        "tinyint": "int32",
        "smallint": "int32",
        "int": "int32",
        "bigint": "int64",
        "float": "float32",
        "double": "float64",
        "string": "str",
        "boolean": "bool",
        "date": "date",
    }
    if s in flat:
        return flat[s]
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("array"):
        return "list"
    return s


@pytest.mark.parametrize("name", sorted(resolved_oracles()))
def test_result_type_classes_match(spark, duck, name):
    sdf = pinned_queries()[name](spark, "/root/testdata/sf0.001")
    spark_types = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
    rel = duck.sql(resolved_oracles()[name])
    duck_types = dict(zip(rel.columns, (_duck_class(t) for t in rel.types)))
    skew = {
        c: (spark_types.get(c), duck_types[c])
        for c in duck_types
        if c in spark_types and spark_types[c] != duck_types[c]
    }
    assert not skew, (
        f"{name}: cross-engine result-type skew {skew} — cast the Spark "
        "column to long (or add the oracle column to "
        "registry._ORACLE_BIGINT_CASTS) so a type-aware driver hash can "
        "never red a value-identical result"
    )
