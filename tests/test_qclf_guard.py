"""_qclf_train must fail loudly on an empty training relation
(ADVICE r5): with zero rows the gradient mean is NULL and every
downstream score/pred silently nulls out; the assert_true guard turns
that into an immediate error at the first weight update."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.plans.mlops_ops import _qclf_features, _qclf_train
from sow_pyspark_scripts_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_empty_training_relation_raises(spark):
    docs = read_table(spark, SF_DIR, "documents")
    feat = _qclf_features(docs.where(F.lit(False)))
    with pytest.raises(Exception, match="empty training relation"):
        _qclf_train(feat).collect()


def test_nonempty_training_still_trains(spark):
    docs = read_table(spark, SF_DIR, "documents")
    feat = _qclf_features(docs.where(F.col("doc_id") % 10 != 0))
    [w] = _qclf_train(feat).collect()
    assert all(w[c] is not None for c in ("w0", "w1", "w2", "w3"))
