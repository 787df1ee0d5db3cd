"""Optional-dependency seams (VERDICT r1 #5/#6): the spaCy lemmatizer and
the real PIL image decoder plug into the SAME plan shapes as their
deterministic oracle-checked stand-ins. When the libs are absent (this
container) the real paths must fail fast with a clear error and these
tests skip; when present they run rows-only checks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.operators.multimodal import (
    decode_media,
    media_table,
    pil_available,
)
from sow_pyspark_scripts_spark.operators.text import (
    make_spacy_lemmatize_udf,
    remove_stopwords,
    spacy_available,
    tokenize,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark, n=50):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )


# --- absent-dependency contracts (what actually runs in this container) ---


@pytest.mark.skipif(spacy_available(), reason="spaCy installed; absent-path n/a")
def test_spacy_lemmatizer_fails_fast_when_absent():
    with pytest.raises(ImportError):
        make_spacy_lemmatize_udf()


@pytest.mark.skipif(pil_available(), reason="PIL installed; absent-path n/a")
def test_real_decode_fails_fast_when_absent(spark):
    media = media_table(_docs(spark))
    with pytest.raises(NotImplementedError):
        decode_media(media, fake_decode=False)


# --- present-dependency rows-only checks (skip cleanly here) ---


@pytest.mark.skipif(not spacy_available(), reason="spaCy not installed")
def test_spacy_lemmatizer_rows_only(spark):
    docs = _docs(spark)
    toks = docs.select(
        "doc_id", remove_stopwords(tokenize(F.col("text"))).alias("tokens")
    )
    out = toks.select(
        "doc_id", make_spacy_lemmatize_udf()(F.col("tokens")).alias("lemmas")
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r.lemmas is not None for r in rows)


@pytest.mark.skipif(not pil_available(), reason="PIL not installed")
def test_real_decode_rows_only(spark):
    import io

    from PIL import Image

    # build a tiny real PNG payload table
    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "image/png", len(buf.getvalue()))],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    row = decode_media(media, fake_decode=False).collect()[0]
    assert (row.width, row.height, row.n_frames) == (7, 5, 1)
