"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (``zip_with`` / ``aggregate`` / ``transform``),
no UDFs: the arithmetic runs JVM-side per row with no Python boundary.

Backs the declared-but-external embedding surface of the reference
(``MeanEmbeddings`` import at ``preprocess_and_store_parquets.py:12``,
500-dim ES DenseVector at ``sql_to_es_etl.py:123``) and the north-star
similarity-search / near-dup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product then sum — all in double for cross-engine parity."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize once upstream so top-k cosine becomes a plain dot
    product in the (possibly huge) candidate join."""
    n = l2_norm(a)
    return F.transform(_dbl(a), lambda x: x / n)
