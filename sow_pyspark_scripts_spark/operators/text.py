"""Tokenization / stopword / lemmatization operators (SURVEY.md §2.9).

The reference delegates these to spaCy inside a row-at-a-time Python UDF
(``preprocess_and_store_parquets.py:151-160``) with a customized stop
list (``:67-71``: "by" and "hi" added, "not" removed). Here:

- tokenize + stopword removal are native higher-order functions
  (``split`` + ``filter``) — no Python boundary at all;
- lemmatization is the one genuinely-Python step; spaCy is not in this
  container, so the operator ships a deterministic rule lemmatizer
  behind an Arrow-batched ``pandas_udf`` (the *plumbing* — batch
  transfer, array columns, executor-side state — is the real thing; the
  model is swappable). The rules are simple enough to replay in SQL, so
  even the UDF path is oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# Base English stop list with the reference's customization applied:
# + "by", + "hi", - "not" (preprocess_and_store_parquets.py:67-71).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "for", "if", "in",
    "into", "is", "it", "no", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with", "by", "hi",
)


def tokenize(col: Column) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>; empty
    input -> empty array."""
    t = F.trim(F.lower(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def remove_stopwords(tokens: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Order-preserving stopword filter as a native higher-order function —
    the stop list is a plan literal (broadcast with the plan, no closure
    shipping as in the reference's UDF capture)."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.filter(tokens, lambda t: ~F.array_contains(stop_arr, t))


def make_lemmatize_udf():
    """Arrow-batched lemmatizer over array<string> columns.

    This is the engine's pattern for *any* per-token Python model
    (spaCy, HF tokenizer): vectorized batches over Arrow, model state
    loaded once per executor process, never per row. Swap the rule
    function for a real model without touching the plan shape.

    Built from a NESTED function on purpose: cloudpickle serializes
    nested functions by value, so executors do NOT need this package on
    their PYTHONPATH (a module-level UDF pickles by reference and dies
    with ModuleNotFoundError on workers that can't import the repo —
    the reference hit the same class of problem shipping spaCy closures,
    preprocess_and_store_parquets.py:151-160).
    """

    def _rule_lemma(tok: str) -> str:
        # Deterministic suffix rules (stand-in for spaCy lemmatization;
        # same column contract). Mirrored exactly by LEMMA_SQL_CASE.
        if len(tok) > 5 and tok.endswith("ing"):
            return tok[:-3]
        if len(tok) > 4 and tok.endswith("ed"):
            return tok[:-2]
        if len(tok) > 3 and tok.endswith("s") and not tok.endswith("ss"):
            return tok[:-1]
        return tok

    def _lemmatize(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda toks: None if toks is None else [_rule_lemma(t) for t in toks]
        )

    # typed ArrayType (not a DDL string) so no SparkSession is needed here
    return pandas_udf(_lemmatize, ArrayType(StringType()))


def spacy_available() -> bool:
    """True when a spaCy English pipeline can actually load here."""
    try:
        import spacy  # noqa: F401

        spacy.load("en_core_web_sm", disable=["parser", "ner"])
        return True
    except Exception:
        return False


def make_spacy_lemmatize_udf(model: str = "en_core_web_sm"):
    """spaCy-backed lemmatizer behind the SAME seam as
    ``make_lemmatize_udf`` — identical signature (array<string> ->
    array<string>) and Arrow batch shape, so a plan built on the rule
    lemmatizer swaps to the real model by replacing one call. This is
    the reference's actual semantics (spaCy pipeline with
    lemmatization=True, preprocess_and_store_parquets.py:151-160).

    Model state loads ONCE PER EXECUTOR PROCESS (lazy module-level
    cache inside the closure), never per batch or per row. Not
    SQL-replayable, so queries using it are rows-only checked; the rule
    lemmatizer stays the oracle-checked default. Raises ImportError at
    build time when spaCy/model are absent — callers gate on
    ``spacy_available()``.
    """
    import spacy

    spacy.load(model, disable=["parser", "ner"])  # fail fast on the driver

    def _lemmatize(tokens: pd.Series) -> pd.Series:
        import spacy as _spacy

        if not hasattr(_lemmatize, "_nlp"):
            _lemmatize._nlp = _spacy.load(model, disable=["parser", "ner"])
        nlp = _lemmatize._nlp

        def _one(toks):
            if toks is None:
                return None
            doc = _spacy.tokens.Doc(nlp.vocab, words=list(toks))
            for _, proc in nlp.pipeline:
                doc = proc(doc)
            return [t.lemma_ for t in doc]

        return tokens.map(_one)

    return pandas_udf(_lemmatize, ArrayType(StringType()))


# SQL twin of _rule_lemma for the DuckDB oracle (list_transform lambda).
LEMMA_SQL_CASE = """
CASE
  WHEN length(t) > 5 AND t LIKE '%ing' THEN substr(t, 1, length(t) - 3)
  WHEN length(t) > 4 AND t LIKE '%ed' THEN substr(t, 1, length(t) - 2)
  WHEN length(t) > 3 AND t LIKE '%s' AND t NOT LIKE '%ss' THEN substr(t, 1, length(t) - 1)
  ELSE t
END
"""
