"""sow_pyspark_scripts_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference repo ``sbhatm1213/sow-pyspark-scripts`` (three PySpark ETL
scripts: SQL Server -> Elasticsearch, Snowflake -> Elasticsearch, and a
month-bucketed NLP -> Parquet pipeline), generalized into a reusable
engine over Parquet with:

- a SparkSession factory pinning the correctness-bearing configuration
  (UTC session timezone, case sensitivity, AQE) — ``session.py``
- Parquet sources/sinks with schema contracts, partitioned overwrite
  and merge-by-key (upsert) semantics — ``sources/``
- the full relational operator surface of the reference (projections,
  casts, NOT LIKE with ``[_]`` escapes, NOT IN exclusions, left joins
  incl. two-role dimensions, DISTINCT, window row-numbering/chunking,
  unionByName, range slices) — ``operators/relational.py``
- scalar expression library (TAT case/datediff chain, LIKE-flag,
  month-year bucketing, text normalization as native column
  expressions) — ``functions/``
- text analytics, dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine) and similarity search (brute-force and
  LSH-bucketed cosine top-k) — ``operators/``
- event-stream analytics in both batch and Structured Streaming form
  (tumbling/sliding/session windows, watermarked dedup, upsert sink)
  — ``plans/events.py``, ``streaming/``

Everything is DataFrame/Catalyst-first: no RDD hot paths, no
driver-side collect loops, Python UDFs only where Spark has no native
expression (and then Arrow-batched).
"""

__version__ = "0.1.0"
