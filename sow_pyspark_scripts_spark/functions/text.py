"""Text analytics as native column expressions.

``normalize_text`` re-expresses the reference's Python UDF
(``preprocess_and_store_parquets.py:111-138``) as a chain of ``lower``
+ ``regexp_replace`` + ``trim`` — same steps, same regexes, same order,
but JVM-side and codegen'd instead of a row-at-a-time Python roundtrip.
At 100 TB this is the difference between a narrow codegen stage and a
pickled-UDF boundary on every row.

Fidelity note (the one deliberate seam): the reference runs Python 3
``re``, where ``\\w``/``\\d``/``\\b`` are unicode-aware; Spark (Java
regex) and the DuckDB oracle (RE2) both default those classes to ASCII.
On ASCII text — including every adversarial case in
``tests/test_normalize_fidelity.py`` — the output is byte-identical to
the reference UDF; a document containing non-ASCII digits or word
characters would keep them here where Python would treat them as
``\\d``/``\\w``. Kept ASCII on both engines so the Spark plan and its
oracle can never diverge from each other.

The rest are the training-data-pipeline text operators (language ID,
quality scoring, token counting, fingerprinting) over ``documents``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference chain, verbatim (preprocess_and_store_parquets.py:
# 112-135): lowercase; remove FOUR domain phrases with EMPTY
# replacement, one sub each, in this order; collapse whitespace (BEFORE
# the removals below — the reference never re-collapses, so output may
# contain runs of spaces, and a removal can even splice a NEW match
# into existence: path removal turns "a@b\c\d.com" into "a@b.com", an
# email that survives because the email pass already ran — so the chain
# is NOT idempotent, not even up to whitespace collapse; the invariant
# is fidelity under composition, tests/test_properties.py); remove
# emails (empty); remove file paths
# (empty — drive letter OPTIONAL, so relative \dir\file forms match
# too); remove digit runs (SINGLE SPACE); strip. After the collapse
# step all whitespace is plain spaces, so trim() == Python strip().
_PHRASES = (
    r"\bencounter id\b",
    r"\blong text id\b",
    r"\barea affected\b",
    r"\baffected applications\b",
)
_WS = r"\s+"
_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_FILE_PATH = r"([A-Za-z]:)?(\\[\w-]+)+\\?([\w-]+(\.\w+)*)?"
_DIGITS = r"\d+"


def normalize_text(col: Column) -> Column:
    c = F.lower(col)
    for p in _PHRASES:
        c = F.regexp_replace(c, p, "")
    c = F.regexp_replace(c, _WS, " ")
    c = F.regexp_replace(c, _EMAIL, "")
    c = F.regexp_replace(c, _FILE_PATH, "")
    c = F.regexp_replace(c, _DIGITS, " ")
    return F.trim(c)


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _WS))).cast("long")


# A BPE-ish pre-tokenizer: runs of letters, runs of digits, or a single
# non-alnum non-space symbol — the usual byte-pair pre-segmentation shape.
_BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(_BPE_ISH), 0)).cast("long")


# Tiny per-language marker lexicons for the n-gram/stopword heuristic
# language ID. Deterministic, SQL-expressible (so the DuckDB oracle can
# replay it); a real deployment would swap in fastText behind the same
# column contract.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|it|for|on)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans|que|des)\b",
    "es": r"\b(el|los|las|es|una|por|para|con|del|se)\b",
}
_CJK = r"[一-鿿]"


def _hits(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK chars -> zh, else argmax of marker-word
    hits with fixed precedence (en > de > fr > es), 'und' when nothing hits.
    """
    lc = F.lower(col)
    en, de, fr, es = (_hits(lc, LANG_MARKERS[k]) for k in ("en", "de", "fr", "es"))
    best = F.greatest(en, de, fr, es)
    return (
        F.when(_hits(col, _CJK) > 0, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def quality_score(col: Column) -> Column:
    """Document quality in [0,1] from length / punctuation / stopword ratios.

    score = 0.4*saturating(n_tokens/50) + 0.3*(1 - punct_ratio)
          + 0.3*min(1, 5*stopword_ratio), rounded to 4dp.
    Pure arithmetic over regexp counts — fully SQL-expressible.
    """
    lc = F.lower(col)
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    punct = _hits(lc, r"[^a-z0-9\s]").cast("double")
    stops = _hits(lc, LANG_MARKERS["en"]).cast("double")
    len_part = F.least(F.lit(1.0), n_tok / F.lit(50.0))
    punct_part = F.lit(1.0) - punct / F.greatest(n_chars, F.lit(1.0))
    stop_part = F.least(F.lit(1.0), F.lit(5.0) * stops / F.greatest(n_tok, F.lit(1.0)))
    score = F.lit(0.4) * len_part + F.lit(0.3) * punct_part + F.lit(0.3) * stop_part
    # floor(x*1e4+0.5)/1e4 instead of round(): native round() disagrees
    # between engines on ...49999 doubles (DuckDB rounds via decimal
    # repr); this form is pure double ops -> bit-identical everywhere.
    return F.floor(score * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Identical content
    (after normalization) -> identical fingerprint; the join key for
    exact dedup at scale (hash once, shuffle the 32-byte digest, not the
    document)."""
    return F.md5(normalize_text(col))
