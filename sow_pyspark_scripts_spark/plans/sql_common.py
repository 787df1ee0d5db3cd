"""Oracle-SQL fragments shared across plan modules.

A LEAF module: it must not import `registry` or any plan module, so any
plan file can pull these constants at import time without creating a
cycle through registry's plan-module import chain (stats_ops once
imported `_SHINGLES_CTE` from dedup_sim while dedup_sim was still
initializing — importing dedup_sim directly, before registry, crashed).
"""

# 3-word shingles per document (DuckDB CTE) — the dedup family's shared
# notion of content: whitespace tokens of lowercased, trimmed text.
# Mirrors operators/dedup.py word_shingles(n=3, distinct=True).
SHINGLES_CTE = r"""
toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
    FROM toks WHERE len(t) >= 3
  )
)
"""
