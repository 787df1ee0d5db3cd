"""Data-selection / compressed-ANN tier: the two pretraining-corpus
techniques still missing from the battery, plus the streaming join
variant production pipelines actually deploy.

- DSIR importance weights (Xie et al. 2023, "Data Selection via
  Importance Resampling"): score every raw document by how much more
  likely its hashed-bigram bag is under the target-domain distribution
  than under the raw-corpus distribution. This is THE standard cheap
  domain-matching filter for 100 TB pretraining corpora: two bounded
  (256-bucket) count tables, one broadcast, one pass over the token
  stream — no model, no embedding.
- Product quantization (Jegou et al. 2011): the memory-compressed ANN
  tier beyond int8 (`embedding_quantize_int8`) — split each vector
  into m=4 subvectors, code each against a per-subvector codebook, and
  answer queries with asymmetric distance (exact query subvector vs
  quantized candidate) summed from a broadcast lookup table. 64 dims
  collapse to 4 bytes per vector; the scan of codes is the whole
  query-time cost.
- Stream-stream LEFT OUTER join: the inner form
  (`streaming_stream_stream_join`, plans/scale_ops.py) only reports
  conversions; the outer form is how funnels measure NON-conversion in
  motion (views that never matched a purchase emit with nulls once the
  watermark proves no match can arrive). Null-side emission only
  happens when the watermark passes, so the availableNow drain stages
  a far-future sentinel row on both streams to push the final
  watermark past every real event — the streaming twin of "close the
  books" — and filters the sentinel back out of the result.

Cross-engine determinism follows the house rules: integer counts until
a single ln()/division, 1e9 or 1e6 half-up quantization before any
sum-of-floats, 6dp rounding before every argmin/rank, ties broken on
the integer id.

Reference scope note: the reference repo (sbhatm1213/sow-pyspark-scripts)
has no data-selection or ANN surface at all — this tier generalizes its
preprocess_and_store_parquets.py corpus stage (tokenize -> store) into
the selection stage that follows it in a real pretraining pipeline.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _round6(c):
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# corpus_dsir_weights — hashed-bigram importance weights, target lang='en'
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256

_DSIR_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
  FROM toks WHERE len(t) >= 2
),
hashed AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(b), 1, 8) AS BIGINT) % {_DSIR_BUCKETS} AS bucket
  FROM bg
),
raw_cnt AS (SELECT bucket, count(*) AS rc FROM hashed GROUP BY bucket),
tgt_cnt AS (SELECT bucket, count(*) AS tc FROM hashed WHERE lang = 'en' GROUP BY bucket),
nr AS (SELECT count(*) AS n FROM hashed),
nt AS (SELECT count(*) AS n FROM hashed WHERE lang = 'en'),
lr AS (
  SELECT r.bucket,
         CAST(floor(ln(
           CAST((coalesce(t.tc, 0) + 1) * ((SELECT n FROM nr) + {_DSIR_BUCKETS}) AS DOUBLE)
           / CAST((r.rc + 1) * ((SELECT n FROM nt) + {_DSIR_BUCKETS}) AS DOUBLE)
         ) * 1e9 + 0.5) AS BIGINT) AS lrq
  FROM raw_cnt r LEFT JOIN tgt_cnt t ON r.bucket = t.bucket
),
per_doc AS (
  SELECT h.doc_id, count(*) AS n_bigrams, sum(l.lrq) AS s
  FROM hashed h JOIN lr l ON h.bucket = l.bucket
  GROUP BY h.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       floor(coalesce(CAST(p.s AS DOUBLE), 0.0) / 1e9 * 1e6 + 0.5) / 1e6
           AS dsir_logw
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


@query("corpus_dsir_weights", _DSIR_ORACLE)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weight per document: hashed-bigram bag scored
    by ln(p_target/p_raw) with Laplace smoothing over 256 buckets,
    target = the lang='en' slice, raw = the whole corpus. Positive
    weight = looks more like the target domain than the average raw doc;
    importance RESAMPLING then keeps docs with probability proportional
    to exp(weight) — this query materializes the weights, the decision
    input.

    Scale shape: the bucket vocabulary is FIXED (256) regardless of
    corpus size, so both count tables and the log-ratio table are
    broadcast-sized; the token stream is touched once (explode ->
    bucket -> broadcast-join the 256-row ratio table -> per-doc sum).
    The only shuffle over unbounded data is the per-doc aggregate, keyed
    by doc_id. Determinism: the smoothed ratio is assembled as one
    integer fraction before the single ln(); per-bucket log-ratios are
    quantized half-up to integer nano-units and per-doc summed as
    BIGINTs, so cross-engine float addition order can never flip a
    weight."""
    docs = read_table(spark, sf_dir, "documents")
    from ..operators.text import tokenize

    toks = docs.where(F.trim(F.col("text")) != "").select(
        "doc_id", "lang", tokenize(F.col("text")).alias("t")
    )
    bg = toks.where(F.size("t") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("b"),
    )
    hashed = bg.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_tgt"),
        (
            F.conv(F.substring(F.md5("b"), 1, 8), 16, 10).cast("long")
            % F.lit(_DSIR_BUCKETS)
        ).alias("bucket"),
    )
    # ONE pass over the bigram stream: the (doc_id, bucket) rollup is the
    # only aggregate that sees unbounded data (map-side combinable, keyed
    # by doc). It is persisted because it has two consumers — the
    # 256-row bucket table and the per-doc weight sum — and its cache
    # footprint (<=256 integer rows per doc) is orders of magnitude
    # smaller than re-exploding the corpus per consumer. Corpus totals
    # come from an unpartitioned window over the BOUNDED bucket table
    # (256 rows — the doctrine's tiny-relation exception), not from a
    # separate scan lineage.
    rollup = hashed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n"), F.max("is_tgt").alias("is_tgt")
    ).persist()
    bucket_tab = rollup.groupBy("bucket").agg(
        F.sum("n").alias("rc"),
        F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(0)).alias("tc"),
    )
    wall = Window.partitionBy()
    lr = bucket_tab.select(
        "bucket",
        "rc",
        "tc",
        F.sum("rc").over(wall).alias("n_raw"),
        F.sum("tc").over(wall).alias("n_tgt"),
    ).select(
        "bucket",
        F.floor(
            F.log(
                ((F.col("tc") + 1) * (F.col("n_raw") + _DSIR_BUCKETS)).cast(
                    "double"
                )
                / ((F.col("rc") + 1) * (F.col("n_tgt") + _DSIR_BUCKETS)).cast(
                    "double"
                )
            )
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lrq"),
    )
    per_doc = (
        rollup.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("lrq")).alias("s"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        (
            F.floor(
                F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                / F.lit(1e9)
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("dsir_logw"),
    )


# ---------------------------------------------------------------------------
# product quantization: encode + asymmetric-distance top-k
# ---------------------------------------------------------------------------

_PQ_M = 4       # subvectors
_PQ_SUB = 16    # dims per subvector (64 / 4)

_PQ_CENT_CTE = """
flat AS (
  SELECT vec_id, label,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
cent AS (
  SELECT label AS cent_id, pos, avg(v) AS c FROM flat GROUP BY label, pos
),
subd AS (
  SELECT f.vec_id, c.cent_id, (f.pos - 1) // 16 AS sub,
         floor(sum((f.v - c.c) * (f.v - c.c)) * 1e6 + 0.5) / 1e6 AS d2
  FROM flat f JOIN cent c ON f.pos = c.pos
  GROUP BY f.vec_id, c.cent_id, (f.pos - 1) // 16
),
codes AS (
  SELECT vec_id, sub, cent_id AS code, d2 FROM (
    SELECT vec_id, sub, cent_id, d2,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cent_id) AS rn
    FROM subd
  ) WHERE rn = 1
)"""

_PQ_ENCODE_ORACLE = f"""
WITH {_PQ_CENT_CTE}
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), '|' ORDER BY sub) AS codes,
       floor(sum(d2) * 1e6 + 0.5) / 1e6 AS qerr
FROM codes GROUP BY vec_id
"""


def _collect_codebook(emb: DataFrame):
    """Per-(label, subvector) mean codebook as a python list — the
    KB-scale broadcast every PQ index ships to workers (10 labels x 64
    doubles here; k=256 x d at production scale is still < 1 MB)."""
    flat = emb.select(
        F.col("label").alias("cent_id"), F.posexplode("embedding").alias("pos", "v")
    ).select("cent_id", "pos", F.col("v").cast("double").alias("v"))
    cent = (
        flat.groupBy("cent_id", "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy("cent_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("cent_id", F.col("pc.c").alias("centroid"))
    )
    rows = sorted(
        ((r["cent_id"], list(r["centroid"])) for r in cent.collect()),
        key=lambda t: t[0],
    )
    return [c for c, _ in rows], [v for _, v in rows]


def _make_pq_sub_d2(m: int, sub: int):
    """Build the (n, d) x (k, d) -> (n, k, m) per-subvector squared-
    distance kernel: accumulated DIM-SEQUENTIALLY inside each subvector
    so float rounding matches the oracle's sum, rounded half-up at 1e-6.

    Returned as a CLOSURE (not a module function) so cloudpickle ships
    it by value inside mapInPandas kernels — workers never need this
    package importable."""

    def pq_sub_d2(x, c):
        import numpy as np

        out = np.zeros((len(x), len(c), m), dtype=np.float64)
        for j in range(m):
            lo = j * sub
            for d in range(lo, lo + sub):
                diff = x[:, d, None] - c[None, :, d]
                out[:, :, j] += diff * diff
        return np.floor(out * 1e6 + 0.5) / 1e6

    return pq_sub_d2


def _pq_codes(emb: DataFrame) -> DataFrame:
    """Encode every vector: (vec_id, sub, code, d2) via the broadcast-
    codebook numpy kernel — one mapInPandas pass, no shuffle."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cent_ids, cent_mat = _collect_codebook(emb)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("sub", LongType()),
            StructField("code", LongType()),
            StructField("d2", DoubleType()),
        ]
    )
    sub_d2 = _make_pq_sub_d2(_PQ_M, _PQ_SUB)
    m = _PQ_M

    def _encode(batches):
        import numpy as np
        import pandas as pd

        if not cent_ids:
            return
        c = np.asarray(cent_mat, dtype=np.float64)
        cid = np.asarray(cent_ids, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            d2 = sub_d2(x, c)  # (n, k, m)
            best = np.argmin(d2, axis=1)  # (n, m) — first/lowest cent wins ties
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            n = len(ids)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, m),
                    "sub": np.tile(np.arange(m, dtype=np.int64), n),
                    "code": cid[best].ravel(),
                    "d2": np.take_along_axis(
                        d2, best[:, None, :], axis=1
                    ).ravel(),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(_encode, schema)


@query("embedding_pq_encode", _PQ_ENCODE_ORACLE)
def embedding_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: 64-dim float vector -> 4 codebook
    ids (one per 16-dim subvector; per-label mean codebooks, the same
    deterministic k-means stand-in as `similarity_topk_ivf`) plus the
    total quantization error. 4 bytes per vector replaces 256 — the
    16-billion-vector index that fits a 1000-executor cluster's memory.

    The codebook is collected once (KB-scale) and every vector is coded
    in one mapInPandas numpy pass — zero shuffles before the final
    per-vector regroup, which is map-side combinable. Sub-distances are
    6dp-quantized before the argmin and before the error sum, ties break
    to the lowest centroid id, so the oracle's window argmin picks the
    identical code."""
    emb = read_table(spark, sf_dir, "embeddings")
    codes = _pq_codes(emb)
    return codes.groupBy("vec_id").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"].cast("string"),
            ),
        ).alias("codes"),
        _round6(F.sum("d2")).alias("qerr"),
    )


_PQ_TOPK_ORACLE = f"""
WITH {_PQ_CENT_CTE},
qflat AS (
  SELECT vec_id AS qid,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE vec_id < 20
),
lut AS (
  SELECT q.qid, c.cent_id, (q.pos - 1) // 16 AS sub,
         floor(sum((q.v - c.c) * (q.v - c.c)) * 1e6 + 0.5) / 1e6 AS pd2
  FROM qflat q JOIN cent c ON q.pos = c.pos
  GROUP BY q.qid, c.cent_id, (q.pos - 1) // 16
),
adc AS (
  SELECT l.qid, k.vec_id AS cid,
         floor(sum(l.pd2) * 1e6 + 0.5) / 1e6 AS adc_d2
  FROM codes k JOIN lut l ON l.sub = k.sub AND l.cent_id = k.code
  WHERE k.vec_id <> l.qid
  GROUP BY l.qid, k.vec_id
)
SELECT qid, cid, adc_d2, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, cid, adc_d2,
         row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rnk
  FROM adc
) WHERE rnk <= 5
"""


@query("similarity_topk_pq", _PQ_TOPK_ORACLE)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5: each query keeps its EXACT
    subvectors; every candidate is its 4 codes; distance = sum of 4
    lookups in a (query x centroid x subvector) table. The fourth ANN
    tier after exact / LSH / IVF — this is the one that bounds MEMORY,
    not just compute.

    Scale shape: the LUT is (n_queries x k x m) — broadcast-sized by
    construction (queries are the small side of any ANN batch) — and the
    candidate side streams through one broadcast join + a (qid, cid)
    sum of exactly m=4 6dp-quantized terms, then a per-query top-k
    window over candidate-count rows. No pairwise vector math touches
    the big side at query time; the float vectors themselves are never
    read after encoding."""
    emb = read_table(spark, sf_dir, "embeddings")
    codes = _pq_codes(emb)

    cent_ids, cent_mat = _collect_codebook(emb)
    qrows = sorted(
        (
            (r["vec_id"], list(r["embedding"]))
            for r in emb.where(F.col("vec_id") < 20)
            .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
            .collect()
        ),
        key=lambda t: t[0],
    )
    import numpy as np

    qids = [q for q, _ in qrows]
    x = np.asarray([v for _, v in qrows], dtype=np.float64)
    c = np.asarray(cent_mat, dtype=np.float64)
    pd2 = _make_pq_sub_d2(_PQ_M, _PQ_SUB)(x, c)  # (nq, k, m)
    lut_rows = [
        (int(qids[i]), int(cent_ids[j]), int(s), float(pd2[i, j, s]))
        for i in range(len(qids))
        for j in range(len(cent_ids))
        for s in range(_PQ_M)
    ]
    lut = emb.sparkSession.createDataFrame(
        lut_rows, "qid long, cent_id long, sub long, pd2 double"
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["sub"] == lut["sub"]) & (codes["code"] == lut["cent_id"]),
        )
        .where(codes["vec_id"] != lut["qid"])
        .groupBy(lut["qid"].alias("qid"), codes["vec_id"].alias("cid"))
        .agg(_round6(F.sum("pd2")).alias("adc_d2"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_d2"), F.col("cid"))
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("qid", "cid", "adc_d2", "rank")
    )


# ---------------------------------------------------------------------------
# streaming_join_left_outer — stream-stream LEFT OUTER with watermark flush
# ---------------------------------------------------------------------------

_SJLO_ORACLE = f"""
SELECT v.user_id AS user_id,
       strftime(v.ts, '{_TS_FMT_DUCK}') AS view_ts,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


def _stream_events_flushed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events plus one far-future sentinel row per
    event_type of interest (user_id = -1, ts = max(ts) + 30 days).

    Outer-join null emission is watermark-driven: a buffered left row
    only emits its null match once the watermark proves no right row can
    arrive. A drained static fixture's watermark stops `delay` short of
    max(ts), which would hold back the tail of the result forever — the
    sentinel advances the final watermark past every real event, exactly
    like a producer's end-of-day heartbeat record. The sentinel is
    filtered back out by user_id >= 0 downstream."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    stage = os.path.join(
        tempfile.gettempdir(),
        "spark_stream_flush_" + sf_dir.strip("/").replace("/", "_").replace(".", "_"),
    )
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        sentinel = ev.agg(F.max("ts").alias("mx")).select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("mx") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.explode(F.array(F.lit("view"), F.lit("purchase"))).alias(
                "event_type"
            ),
            F.lit(0.0).alias("value"),
        )
        ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(stage)
        open(done, "w").close()
    schema = spark.read.parquet(stage).schema
    return spark.readStream.schema(schema).parquet(stage)


@query("streaming_join_left_outer", _SJLO_ORACLE)
def streaming_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every view emits — joined to the
    purchases that follow it within 30 minutes, or with nulls once the
    watermark proves no purchase can still arrive. The state-eviction
    contract is the same as the inner form (equality key routes both
    streams to one state partition; watermark + time bound gives every
    buffered row a drop deadline); the OUTER addition is that expiry
    EMITS instead of just discarding — which is why the drain needs the
    sentinel heartbeat (`_stream_events_flushed`) to push the closing
    watermark past the fixture's tail. Matches the batch left join
    exactly, which is the oracle."""
    from ..streaming.pipeline import run_to_memory

    src = _stream_events_flushed(spark, sf_dir)
    views = (
        src.where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        src.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    out = joined.select(
        "user_id",
        F.date_format("v_ts", _TS_FMT_SPARK).alias("view_ts"),
        F.date_format("p_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.round("p_value", 2).alias("purchase_value"),
    )
    return run_to_memory(out, "append").where(F.col("user_id") >= 0)
