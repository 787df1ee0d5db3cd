"""normalize_text fidelity against the reference UDF (VERDICT r5 task #3).

The reference chain (``preprocess_and_store_parquets.py:111-138``):
lowercase; remove four domain phrases with EMPTY replacement; collapse
whitespace (before the removals below, never re-collapsed); remove
emails (empty); remove file paths with OPTIONAL drive letter (empty);
remove digit runs (single space); strip. ``ref_normalize`` below is a
faithful Python reimplementation of that UDF, ASCII-flagged to match
the Java/RE2 semantics the engine deliberately uses (see the fidelity
note in ``functions/text.py``); on ASCII input — every case here —
the flag changes nothing vs the reference's default unicode mode.

Asserts three-way equality: reference == Spark column chain == DuckDB
oracle fragment, on adversarial strings (relative paths without drive
letters, 'long text id', runs of spaces surviving the early collapse).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.functions.text import normalize_text
from sow_pyspark_scripts_spark.plans.text_pipeline import _norm_sql


def ref_normalize(text: str) -> str:
    n = text.lower()
    n = re.sub(r"\bencounter id\b", "", n, flags=re.ASCII)
    n = re.sub(r"\blong text id\b", "", n, flags=re.ASCII)
    n = re.sub(r"\barea affected\b", "", n, flags=re.ASCII)
    n = re.sub(r"\baffected applications\b", "", n, flags=re.ASCII)
    n = re.sub(r"\s+", " ", n, flags=re.ASCII)
    n = re.sub(
        r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "", n,
        flags=re.ASCII,
    )
    n = re.sub(
        r"([A-Za-z]:)?(\\[\w-]+)+\\?([\w-]+(\.\w+)*)?", "", n,
        flags=re.ASCII,
    )
    n = re.sub(r"\d+", " ", n, flags=re.ASCII)
    return n.strip()


CASES = [
    "Encounter ID 12345 reported by John.Doe@example.COM at C:\\Users\\jd\\log.txt",
    r"relative path \share\folder\file.txt no drive letter",
    "long text id appears   with  double  spaces",
    "area affected applications are down",
    "AREA AFFECTED: the Area Affected applications list",
    "tabs\tand\nnewlines   collapse first",
    "digits 123 become 4 spaces 56789 end",
    "email first a@b.co then path \\x\\y then 77",
    "encounter identifier is not the phrase encounter id here",
    "trailing backslash path \\dir\\sub\\ then text",
    "",
    "   ",
    "no-changes needed here",
    "x encounter id y long text id z",
    "a\\b windows-ish D:\\Data\\set-1\\f.tar.gz mid",
    "removal leaves runs:  a  encounter id  b  12  c",
    # Path removal splices a FRESH email into the output ('a@b\c\d.com' ->
    # 'a@b.com') — the reference applies each removal once, so the spliced
    # email SURVIVES a single pass. This is why normalize is not idempotent
    # even up to whitespace collapse (tests/test_properties.py).
    "spliced a@b\\c\\d.com survives one pass",
]


@pytest.fixture(scope="module")
def outputs(spark, duck):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "i int, text string"
    )
    got_spark = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text(F.col("text")).alias("n")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE __norm_fid(i int, text varchar)")
    duck.executemany(
        "INSERT INTO __norm_fid VALUES (?,?)", list(enumerate(CASES))
    )
    got_duck = dict(
        duck.execute(f"SELECT i, {_norm_sql('text')} FROM __norm_fid").fetchall()
    )
    duck.execute("DROP TABLE __norm_fid")
    return got_spark, got_duck


@pytest.mark.parametrize("i", range(len(CASES)))
def test_three_way_fidelity(outputs, i):
    got_spark, got_duck = outputs
    expected = ref_normalize(CASES[i])
    assert got_spark[i] == expected, f"spark diverges on {CASES[i]!r}"
    assert got_duck[i] == expected, f"oracle diverges on {CASES[i]!r}"


def test_output_may_contain_space_runs(outputs):
    """The reference collapses whitespace BEFORE the removals and never
    re-collapses — so removals can leave runs of spaces. A normalize
    that re-collapses at the end would flatten these and diverge."""
    got_spark, _ = outputs
    assert "  " in got_spark[15]
