"""Property-based tests (hypothesis) for the invariants the oracle can't
state directly: idempotence, equivalence of the skew-safe formulations to
their naive twins, and as-of join semantics against a brute-force model.

Each property runs a handful of examples with one Spark job per example
(deadline disabled — JVM scheduling dwarfs per-example compute).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.functions.text import normalize_text

from .conftest import SF_DIR
from .test_normalize_fidelity import ref_normalize
from sow_pyspark_scripts_spark.operators.relational import salted_join
from sow_pyspark_scripts_spark.operators.temporal import asof_join
from sow_pyspark_scripts_spark.sources.writers import merge_upsert

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# ASCII-only alphabet, weighted toward the chain's trigger tokens (phrase
# words, '@'/'.'/'\\' so emails and paths — and email-splicing paths —
# actually occur). ASCII because that is the documented fidelity seam:
# Java/RE2 regex classes are ASCII where Python's default is unicode
# (functions/text.py fidelity note).
_NORM_ALPHABET = sorted(
    set("abct .@\\:019_%+-\t\nencounter id long text area affected applications")
)

texts = st.lists(
    st.text(alphabet=_NORM_ALPHABET, max_size=60),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(texts)
def test_normalize_composition_matches_reference_model(spark, docs):
    """The TRUE normalize invariant (VERDICT r6 #1). The reference chain is
    NOT idempotent: empty-replacement removals run AFTER the one whitespace
    collapse (leaving runs of spaces a second pass would collapse), and a
    removal can even splice a NEW match into existence — path removal turns
    'a@b\\c\\d.com' into 'a@b.com', a fresh email the second pass deletes —
    so neither idempotence nor the weaker collapse-invariant holds. What
    must hold instead is fidelity under composition: one and two Spark
    applications equal one and two applications of the pure-Python
    reference model (``ref_normalize``, the spec from
    tests/test_normalize_fidelity.py)."""
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    once = df.select(normalize_text(F.col("text")).alias("n"))
    twice = once.select(normalize_text(F.col("n")).alias("n"))
    assert [r.n for r in once.collect()] == [ref_normalize(t) for t in docs]
    assert [r.n for r in twice.collect()] == [
        ref_normalize(ref_normalize(t)) for t in docs
    ]


rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=99),  # value
        st.integers(min_value=0, max_value=50),  # order col
    ),
    min_size=1,
    max_size=20,
)


@settings(**SETTINGS)
@given(rows)
def test_merge_upsert_idempotent_and_latest(spark, data):
    """Re-applying the same incoming batch converges (the property the
    reference got from ES upsert), and the survivor per key carries the
    maximal order value."""
    df = spark.createDataFrame(data, ["k", "v", "ts"])
    once = merge_upsert(None, df, ["k"], "ts", ["v"])
    again = merge_upsert(once, df, ["k"], "ts", ["v"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    best = {}
    for k, v, ts in data:
        best[k] = max(best.get(k, (-1, -1)), (ts, v))
    assert {r.k: (r.ts, r.v) for r in once.collect()} == best


@settings(**SETTINGS)
@given(rows)
def test_salted_join_equals_plain(spark, data):
    """salted_join emits exactly the plain equi join's rows, any data."""
    big = spark.createDataFrame(data, ["k", "v", "o"])
    small = spark.createDataFrame([(k, f"d{k}") for k in range(0, 6, 2)], ["k", "label"])
    plain = sorted(map(tuple, big.join(small, "k").select("k", "v", "o", "label").collect()))
    salted = sorted(
        map(tuple, salted_join(big, small, "k", salt_buckets=4, salt_src="o")
            .select("k", "v", "o", "label").collect())
    )
    assert plain == salted


events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # user
        st.integers(min_value=0, max_value=100),  # ts
        st.booleans(),                            # is_right
    ),
    min_size=1,
    max_size=20,
)


@settings(**SETTINGS)
@given(events)
def test_asof_join_matches_bruteforce(spark, data):
    """asof_join == per-row brute force: latest right ts <= left ts of
    the same key, None when no right row precedes."""
    left = [(u, t) for (u, t, r) in data if not r]
    right = [(u, t) for (u, t, r) in data if r]
    if not left:
        return
    ldf = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(left)], ["k", "ts", "lid"]
    )
    rdf = spark.createDataFrame(
        right or [(99, -1)], ["k", "rts"]
    )
    got = {
        r.lid: r.rts
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", payload=["rts"]
        ).collect()
    }
    for i, (u, t) in enumerate(left):
        cands = [rt for (ru, rt) in (right or []) if ru == u and rt <= t]
        assert got[i] == (max(cands) if cands else None), (i, u, t, cands)


def test_dedup_output_subset_of_input(spark):
    """Dedup keeps only existing fingerprints/ids (self-consistency check
    from SURVEY.md §5.3) on the real fixture."""
    from .conftest import SF_DIR
    import __spark_entry__ as em

    docs_ids = {
        r.doc_id
        for r in em.queries()["dedup_exact"](spark, SF_DIR).select(
            F.col("keeper_doc_id").alias("doc_id")
        ).collect()
    }
    all_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id").collect()
    }
    assert docs_ids <= all_ids


csv_texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40,
    ),
    min_size=1,
    max_size=10,
)


@settings(**SETTINGS)
@given(csv_texts)
def test_csv_json_roundtrip_fidelity(spark, tmp_path_factory, vals):
    """CSV and JSON sinks round-trip arbitrary unicode — embedded quotes,
    commas, newlines, tabs — byte-for-byte under explicit schemas. The
    escaping corners a naive writer silently corrupts."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sow_pyspark_scripts_spark.sources.formats import (
        read_csv,
        read_json,
        write_csv,
        write_json,
    )

    schema = StructType([StructField("id", LongType()), StructField("v", StringType())])
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, schema)
    base = str(tmp_path_factory.mktemp("fmt"))
    write_csv(df, base + "/c")
    got_c = sorted((r.id, r.v) for r in read_csv(spark, base + "/c", schema).collect())
    write_json(df, base + "/j")
    got_j = sorted((r.id, r.v) for r in read_json(spark, base + "/j", schema).collect())
    # CSV cannot distinguish empty string from null (both unquoted empty);
    # normalize that one lossy corner, everything else must be exact.
    want = sorted((i, v if v != "" else None) for i, v in rows)
    assert got_c == want
    assert got_j == sorted(rows)


def test_pandas_model_asof_tie_inclusive(spark):
    """Right row at exactly left.ts matches (inclusive as-of)."""
    ldf = spark.createDataFrame([(1, 10)], ["k", "ts"])
    rdf = spark.createDataFrame([(1, 10), (1, 9)], ["k", "rts"])
    out = asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", payload=["rts"])
    assert out.collect()[0].rts == 10


def _unused(pd):  # keep the import referenced without polluting tests
    return pd


ids = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40, unique=True
)


@settings(**SETTINGS)
@given(ids)
def test_two_phase_row_number_equals_naive(spark, keys):
    """The bucketed two-phase global row number must be bit-identical to
    the naive single-partition Window.orderBy form on any unique key set
    (negative keys, gaps, arbitrary order)."""
    from pyspark.sql import Window

    from sow_pyspark_scripts_spark.operators.relational import with_global_row_number

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    fast = {r.k: r.row_num for r in with_global_row_number(df, ["k"], bucket_width=7).collect()}
    naive = {
        r.k: r.rn
        for r in df.withColumn("rn", F.row_number().over(Window.orderBy("k"))).collect()
    }
    assert fast == naive


strkeys = st.lists(
    st.text(alphabet="abcxyz0189", min_size=0, max_size=6), min_size=1, max_size=40, unique=True
)


@settings(**SETTINGS)
@given(strkeys)
def test_two_phase_row_number_string_keys_equals_naive(spark, keys):
    """String leading keys take the 2-char-prefix bucket route (order-
    preserving lexicographically) and must match the naive global window
    on any unique key set — empties, shared prefixes, shorter-than-
    prefix keys."""
    from pyspark.sql import Window

    from sow_pyspark_scripts_spark.operators.relational import with_global_row_number

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    fast = {r.k: r.row_num for r in with_global_row_number(df, ["k"]).collect()}
    naive = {
        r.k: r.rn
        for r in df.withColumn("rn", F.row_number().over(Window.orderBy("k"))).collect()
    }
    assert fast == naive


pm_rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(**SETTINGS)
@given(pm_rows)
def test_two_phase_prefix_sum_equals_naive(spark, rows):
    """with_prefix_sum (inclusive running sum, bucketed) must be
    bit-identical to the naive single-partition cumulative window on
    any key set — negative keys, negative values, single bucket."""
    from pyspark.sql import Window

    from sow_pyspark_scripts_spark.operators.relational import with_prefix_sum

    df = spark.createDataFrame(rows, ["k", "v"])
    fast = {
        r.k: r.cum
        for r in with_prefix_sum(
            df, "v", [F.col("k")], F.floor(F.col("k") / F.lit(7)).cast("long"), "cum"
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    naive = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert fast == naive


@settings(**SETTINGS)
@given(pm_rows)
def test_two_phase_prefix_max_equals_naive(spark, rows):
    """with_prefix_max (strictly-preceding running max, bucketed) must be
    bit-identical to the naive single-partition exclusive max window —
    including the NULL on the globally-first row and ties landing in
    one bucket."""
    from pyspark.sql import Window

    from sow_pyspark_scripts_spark.operators.relational import with_prefix_max

    df = spark.createDataFrame(rows, ["k", "v"])
    fast = {
        r.k: r.pm
        for r in with_prefix_max(
            df, "v", [F.col("k")], F.floor(F.col("k") / F.lit(7)).cast("long"), "pm"
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    naive = {r.k: r.pm for r in df.withColumn("pm", F.max("v").over(w)).collect()}
    assert fast == naive


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # user
            st.integers(min_value=0, max_value=10_000),  # ts offset (unique overall)
            st.sampled_from(["a", "b", "c"]),            # attr
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
def test_scd2_intervals_tile_history(spark, rows_):
    """SCD2 invariants on random histories: per user — exactly one open
    (is_current) interval, intervals chain (valid_to == next valid_from),
    consecutive attrs always differ, and the first interval starts at the
    user's first event."""
    import pandas as pd

    from sow_pyspark_scripts_spark.plans.warehouse_ops import scd2_intervals

    pdf = pd.DataFrame(rows_, columns=["user_id", "off", "attr"])
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf["off"], unit="s")
    src = spark.createDataFrame(pdf[["user_id", "attr", "ts"]].rename(
        columns={"attr": "event_type"}))
    import sow_pyspark_scripts_spark.plans.warehouse_ops as wo
    import sow_pyspark_scripts_spark.sources as srcs

    orig = srcs.read_table
    try:
        srcs_read = lambda spark_, sf_dir, name: src  # noqa: E731
        wo.read_table = srcs_read
        out = scd2_intervals(spark, "ignored").toPandas()
    finally:
        wo.read_table = orig
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("valid_from").reset_index(drop=True)
        assert int(g["is_current"].sum()) == 1
        assert g["is_current"].iloc[-1]
        for i in range(len(g) - 1):
            assert g["valid_to"].iloc[i] == g["valid_from"].iloc[i + 1]
            assert g["attr"].iloc[i] != g["attr"].iloc[i + 1]
        first_ts = pdf[pdf.user_id == uid]["ts"].min().strftime("%Y-%m-%d %H:%M:%S.%f")
        assert g["valid_from"].iloc[0] == first_ts


def test_countmin_never_underestimates(spark):
    """Count-min's one-sided error guarantee: for every key the sketch
    estimate is >= the exact count (hash collisions only ever add)."""
    import __spark_entry__ as em

    from .conftest import SF_DIR

    rows = em.queries()["agg_countmin_sketch"](spark, SF_DIR).collect()
    assert rows
    assert all(r["cm_est"] >= r["exact_n"] for r in rows)
    # 512 buckets over ~2k keys: collisions exist but the min over 3
    # rows keeps gross overestimates rare — median overestimate small
    over = sorted(r["cm_est"] - r["exact_n"] for r in rows)
    assert over[len(over) // 2] <= max(10, rows[0]["exact_n"]), over[-5:]


def test_hll_merge_equals_direct(spark):
    """DataSketches HLL mergeability: the union of per-priority sketches
    must give EXACTLY the estimate of one whole-table sketch (the merge
    is lossless over the sketch state), and the estimate must sit within
    the 5% error envelope of the exact distinct count. This is the
    scale contract that lets shards ship ~KB sketches instead of key
    sets (plans/integrity_ops.agg_hll_partition_merge)."""
    import __spark_entry__ as em

    from .conftest import SF_DIR

    row = em.queries()["agg_hll_partition_merge"](spark, SF_DIR).collect()[0]
    assert row["merged_estimate"] == row["direct_estimate"]
    assert row["n_shards"] >= 1
    exact = row["exact_distinct"]
    assert abs(row["direct_estimate"] - exact) <= max(1, 0.05 * exact)


ewma_seqs = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=12
)


@settings(**SETTINGS)
@given(ewma_seqs)
def test_ewma_closed_form_equals_sequential_fold(spark, xs):
    """The unrolled closed form in plans/integrity_ops.events_ewma_fold
    must equal the literal sequential recurrence s_k = a*x_k + (1-a)*s_{k-1}
    folded left-to-right in plain Python (to within the 1e-6 quantization
    the query emits at)."""
    a = 0.3
    s = float(xs[0])
    for x in xs[1:]:
        s = a * x + (1 - a) * s
    df = spark.createDataFrame(
        [(1, float(i), float(x)) for i, x in enumerate(xs)],
        ["user_id", "tsord", "value"],
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("tsord")
    wn = Window.partitionBy("user_id")
    seq = df.withColumn("k", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    term = F.when(
        F.col("k") == 1, F.pow(F.lit(1 - a), F.col("n") - 1) * F.col("value")
    ).otherwise(
        F.lit(a) * F.pow(F.lit(1 - a), F.col("n") - F.col("k")) * F.col("value")
    )
    got = (
        seq.select(F.sum(term).alias("s")).collect()[0]["s"]
    )
    assert abs(got - s) < 1e-6 * max(1.0, abs(s))


def test_reservoir_sample_bounded_and_deterministic(spark):
    """sample_reservoir_group must return at most k rows per group, be a
    subset of the input, and be bit-identical across invocations (the
    whole point of md5-permutation ordering vs rand())."""
    import __spark_entry__ as em

    from .conftest import SF_DIR

    q = em.queries()["sample_reservoir_group"]
    a = q(spark, SF_DIR).collect()
    b = q(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    per_group = Counter(r["event_type"] for r in a)
    assert all(n <= 8 for n in per_group.values())


def test_prefix_dedup_idempotent(spark):
    """Running prefix-hash dedup on its own output must be the identity:
    survivors have unique prefixes by construction."""
    import __spark_entry__ as em
    from pyspark.sql import Window

    from .conftest import SF_DIR

    out = em.queries()["dedup_prefix_hash"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    survivors = out.join(docs.select("doc_id", "text"), "doc_id")
    h = F.md5(F.substring(F.lower(F.col("text")), 1, 64))
    again = (
        survivors.select("doc_id", F.min("doc_id").over(Window.partitionBy(h)).alias("k"))
        .filter(F.col("doc_id") == F.col("k"))
    )
    assert again.count() == out.count()


def test_sampled_lcc_unbiased_and_degree_exact(spark):
    """graph_local_clustering_sampled (DOULION p=1/2): degrees must be
    EXACT (sampling only thins the triangle-closing edge set), the part
    set identical to the exact query's, every estimate a multiple of 8
    (1/p^3), and the GLOBAL triangle mass within a loose band of the
    exact count — per-node variance is expected at fixture scale, but a
    broken sampler (wrong keep test, double scaling) misses the band."""
    import __spark_entry__ as em

    from .conftest import SF_DIR

    qs = em.queries()
    exact = {
        r.part: (r.degree, r.triangles)
        for r in qs["graph_local_clustering"](spark, SF_DIR).collect()
    }
    est = {
        r.part: (r.degree, r.triangles_est)
        for r in qs["graph_local_clustering_sampled"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(est)
    assert all(est[p][0] == exact[p][0] for p in exact), "degree not exact"
    assert all(t % 8 == 0 for _, t in est.values()), "estimate not 8-scaled"
    tot_exact = sum(t for _, t in exact.values())
    tot_est = sum(t for _, t in est.values())
    # ADVICE r7: the unbiasedness band must never silently vanish — the
    # sf0.01 fixture carries well over 80 triangle corners (measured
    # ~1.9k); a regenerated fixture that drops below this floor should
    # fail HERE, loudly, not degrade the test to mod-8 only.
    assert tot_exact >= 80, (
        f"fixture triangle mass collapsed to {tot_exact} — the estimator "
        "band below would be vacuous; regenerate or re-point the fixture"
    )
    assert 0.4 * tot_exact <= tot_est <= 1.6 * tot_exact, (
        tot_exact,
        tot_est,
    )


def test_sampled_triangle_count_unbiased_and_exact_sides(spark):
    """graph_triangle_count_sampled (DOULION p=1/2): n_vertices and
    n_edges must be EXACTLY the exact query's (sampling only thins the
    triangle-closing pass), the estimate a multiple of 8 (1/p^3), and
    the estimated global count within a loose concentration band of the
    exact count — a broken sampler (wrong keep predicate, double
    scaling, sampling the degree side) misses one of these."""
    import __spark_entry__ as em

    from .conftest import SF_DIR

    qs = em.queries()
    ex = qs["graph_triangle_count"](spark, SF_DIR).collect()[0]
    es = qs["graph_triangle_count_sampled"](spark, SF_DIR).collect()[0]
    assert es.n_vertices == ex.n_vertices
    assert es.n_edges == ex.n_edges
    assert es.n_triangles_est % 8 == 0, "estimate not 8-scaled"
    # same fixture-mass floor as the LCC twin: the band must not be
    # vacuous on a degenerate fixture
    assert ex.n_triangles >= 80, (
        f"fixture triangle count collapsed to {ex.n_triangles}"
    )
    assert 0.4 * ex.n_triangles <= es.n_triangles_est <= 1.6 * ex.n_triangles, (
        ex.n_triangles,
        es.n_triangles_est,
    )


def test_compression_ratio_orders_repetition(spark):
    """Compression ratio must order the three corpus-quality classes the
    heuristic exists to separate — repetitive boilerplate < natural
    prose < random bytes (VERDICT r6 #6) — and be deterministic across
    invocations (zlib level pinned)."""
    from sow_pyspark_scripts_spark.plans.insight_ops import (
        text_compression_ratio,
    )
    from .conftest import SF_DIR

    out = {
        r.doc_id: r.ratio
        for r in text_compression_ratio(spark, SF_DIR).collect()
    }
    again = {
        r.doc_id: r.ratio
        for r in text_compression_ratio(spark, SF_DIR).collect()
    }
    assert out == again
    assert all(v is None or 0 < v <= 2.0 for v in out.values())

    import base64
    import hashlib

    prose = (
        "The quarterly report shows that shipping latency improved across "
        "every priority band, although urgent orders still wait longer "
        "than expected when the warehouse is saturated. Customers in the "
        "northern region ordered more frequently during the holiday "
        "window, and the median basket grew by a small but consistent "
        "margin. The operations team attributes the gains to better "
        "slotting and to the new wave planning logic, which batches picks "
        "by aisle instead of by order."
    ) * 2
    h = b"seed"
    chunks = []
    for _ in range(60):  # deterministic high-entropy "random bytes" text
        h = hashlib.sha256(h).digest()
        chunks.append(base64.b64encode(h).decode())
    probe = spark.createDataFrame(
        [(1, "spam " * 200), (2, prose), (3, "".join(chunks))],
        "doc_id long, text string",
    )
    import tempfile, os
    d = os.path.join(tempfile.gettempdir(), "cr_probe")
    probe.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    r = {
        row.doc_id: row.ratio
        for row in text_compression_ratio(spark, d).collect()
    }
    assert r[1] < r[2] < r[3], r
    # the keep band gates out the repetitive extreme and passes prose
    keep = {
        row.doc_id: row.keep
        for row in text_compression_ratio(spark, d).collect()
    }
    assert keep[1] is False and keep[2] is True, keep


def test_int8_quantization_error_bounded(spark):
    """Affine int8 reconstruction error is bounded by (step/2)^2 per
    value: max_sq_err <= ((max-min)/255/2)^2 per dimension — the bound
    the compression gate promises. Checked against the worst dimension's
    range."""
    from sow_pyspark_scripts_spark.plans.pipeline_ops import embedding_quantize_int8
    from .conftest import SF_DIR

    out = embedding_quantize_int8(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rng = (
        emb.select(F.posexplode("embedding").alias("p", "v"))
        .groupBy("p")
        .agg((F.max("v") - F.min("v")).alias("r"))
        .agg(F.max("r"))
        .collect()[0][0]
    )
    worst_step = rng / 255.0
    bound = (worst_step / 2) ** 2 * 1.01 + 1e-9
    for row in out:
        assert row["max_sq_err"] <= bound, (row, bound)


def test_revenue_recognition_reconciles_to_cent(spark):
    """The pro-rata schedule must sum back to the source to the cent:
    sum over months of recognized cents == sum of order cents for
    orders with lineitems (the largest-remainder rule loses nothing)."""
    from sow_pyspark_scripts_spark.plans.pipeline_ops import agg_revenue_recognition
    from .conftest import SF_DIR

    sched = agg_revenue_recognition(spark, SF_DIR)
    total_sched = int(
        round(
            sched.agg(F.sum(F.col("recognized_revenue") * 100)).collect()[0][0]
        )
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with_items = orders.join(
        li.select("l_orderkey").distinct(),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    total_src = with_items.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
    ).collect()[0][0]
    assert total_sched == total_src, (total_sched, total_src)


def test_pca_loading_is_unit_norm_and_improves(spark):
    """The power-iteration output is a unit vector (norm 1 within the
    1e-9 quantization) and its Rayleigh quotient is at least the
    starting uniform vector's — each iteration cannot decrease the
    quotient for a symmetric PSD matrix."""
    from sow_pyspark_scripts_spark.plans.vector_ops import embedding_pca_power_iter
    from .conftest import SF_DIR

    rows = embedding_pca_power_iter(spark, SF_DIR).collect()
    norm = sum(r["loading"] ** 2 for r in rows) ** 0.5
    assert abs(norm - 1.0) < 1e-4, norm
    assert rows[0]["eigenvalue"] > 0


def test_rrf_ranks_dense_and_bounded(spark):
    """Fused output is exactly 10 rows with dense ranks 1..10, and every
    row carries at least one source rank <= 50 (truncated-list fusion
    can't invent candidates)."""
    from sow_pyspark_scripts_spark.plans.rank_eval_ops import similarity_rrf_fusion
    from .conftest import SF_DIR

    rows = similarity_rrf_fusion(spark, SF_DIR).collect()
    assert sorted(r["fused_rank"] for r in rows) == list(range(1, 11))
    for r in rows:
        assert (r["lex_rank"] is not None and r["lex_rank"] <= 50) or (
            r["vec_rank"] is not None and r["vec_rank"] <= 50
        )


def test_mv_incremental_equals_full_recompute_other_split(spark):
    """IVM correctness must not depend on WHERE the changelog boundary
    falls: re-splitting at a different modulus still equals the full
    recompute (checked via the registered query's oracle relation at a
    second split by reusing the builder's merge shape on a 50/50 cut)."""
    from .conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")

    def branch(pred):
        return (
            li.where(pred)
            .select("l_orderkey", cents.alias("cents"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(F.sum("cents").alias("s"))
        )

    half = F.pmod(F.col("l_orderkey"), F.lit(2)) == 0
    merged = (
        branch(half)
        .unionByName(branch(~half))
        .groupBy("o_custkey")
        .agg(F.sum("s").alias("s"))
    )
    full = (
        li.select("l_orderkey", cents.alias("cents"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("s"))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_apportionment_sums_exactly_to_budget(spark):
    """Hamilton apportionment invariant: integer seats sum EXACTLY to
    the fixed budget (the whole point vs rounded float quotas), every
    cell gets >= its floored quota, and no cell exceeds floor+1."""
    from sow_pyspark_scripts_spark.plans.alloc_ops import (
        _SEATS,
        agg_largest_remainder,
    )

    rows = agg_largest_remainder(spark, SF_DIR).collect()
    assert sum(r["seats"] for r in rows) == _SEATS
    total = sum(r["rev_cents"] for r in rows)
    for r in rows:
        base = (_SEATS * r["rev_cents"]) // total
        assert base <= r["seats"] <= base + 1


def test_capped_balance_matches_sequential_recurrence(spark):
    """The Skorokhod reflection closed form must equal the sequential
    recurrence B_t = max(0, B_{t-1} + x_t) replayed in Python per
    supplier — and never go negative."""
    from sow_pyspark_scripts_spark.plans.alloc_ops import win_capped_running_sum

    rows = win_capped_running_sum(spark, SF_DIR).collect()
    by_supp = {}
    for r in sorted(rows, key=lambda r: (r["l_suppkey"], r["month"])):
        b = max(0, by_supp.get(r["l_suppkey"], 0) + r["net_qty"])
        by_supp[r["l_suppkey"]] = b
        assert r["capped_balance"] == b, (r, b)
        assert r["capped_balance"] >= 0


def test_mix_shift_bridge_reconstructs_total_delta(spark, duck):
    """Oaxaca bridge identity: sum of per-segment mix+rate effects must
    equal the overall AOV change between the two periods (to rounding)."""
    from sow_pyspark_scripts_spark.plans.alloc_ops import agg_mix_shift_decompose

    rows = agg_mix_shift_decompose(spark, SF_DIR).collect()
    bridged = sum(r["mix_effect"] + r["rate_effect"] for r in rows)
    (aov0, aov1) = duck.execute(
        """
        SELECT avg(CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END),
               avg(CASE WHEN year(o_orderdate) = 2000 THEN o_totalprice END)
        FROM orders
        """
    ).fetchone()
    assert abs(bridged - (aov1 - aov0)) < 0.01


def test_bh_fdr_rejections_are_p_prefix(spark):
    """BH step-up coherence: the rejected set is a prefix of the
    p-sorted hypotheses — no rejected cell has a larger p than any
    accepted cell (ties aside), and rejected p's sit under q."""
    from sow_pyspark_scripts_spark.plans.screening_ops import stats_bh_fdr

    rows = stats_bh_fdr(spark, SF_DIR).collect()
    rej = [r["p"] for r in rows if r["rejected"]]
    acc = [r["p"] for r in rows if not r["rejected"]]
    if rej and acc:
        assert max(rej) <= min(acc) + 1e-12
    for p in rej:
        assert p <= 0.1 + 1e-9


def test_cv_fold_matches_direct_complement_fit(spark):
    """The global-minus-fold sufficient-statistics algebra must equal a
    direct OLS fit on the filtered complement (fold 0 held out)."""
    from sow_pyspark_scripts_spark.plans.screening_ops import ml_cv_fold_ols
    from sow_pyspark_scripts_spark.sources import read_table

    row = {r["fold"]: r for r in ml_cv_fold_ols(spark, SF_DIR).collect()}[0]
    li = read_table(spark, SF_DIR, "lineitem").where(
        (F.col("l_orderkey") * 2654435761) % 97 % 5 != 0
    )
    pts = [
        (float(r["l_quantity"]), round(r["l_extendedprice"] * 100) / 100.0)
        for r in li.select("l_quantity", "l_extendedprice").collect()
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    assert abs(row["slope"] - b * 100) < 0.05 * abs(b * 100)
    assert abs(row["intercept"] - a) < max(1.0, 0.05 * abs(a))


def test_consistent_hash_resize_moves_only_into_new_shard(spark):
    """Defining consistent-hashing property: adding a shard may only
    move keys INTO the new shard — never between old shards — and the
    moved fraction stays near 1/(n+1), far under modulo's ~8/9."""
    from sow_pyspark_scripts_spark.plans.control_ops import (
        _SHARDS_BEFORE,
        shard_consistent_hash,
    )

    rows = shard_consistent_hash(spark, SF_DIR).collect()
    total = sum(r["n_after"] for r in rows)
    moved = sum(r["moved_in"] for r in rows)
    for r in rows:
        if r["shard"] < _SHARDS_BEFORE:
            assert r["moved_in"] == 0, r
    new = [r for r in rows if r["shard"] == _SHARDS_BEFORE][0]
    assert new["n_before"] == 0 and new["moved_in"] == new["n_after"]
    assert moved / total < 0.35  # ~1/9 expected; modulo would be ~8/9


def test_cusum_matches_sequential_recurrence(spark):
    """Reflection closed form == the clamped sequential CUSUM replayed
    in Python per event_type."""
    from sow_pyspark_scripts_spark.plans.control_ops import dq_cusum_alarm
    from sow_pyspark_scripts_spark.sources import read_table

    daily = (
        read_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("x")
        )
        .collect()
    )
    by_type = {}
    for r in daily:
        by_type.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    expect = {}
    for et, days in by_type.items():
        days.sort()
        t = sum(x for _, x in days)
        n = len(days)
        c = 0
        for day, x in days:
            c = max(0, c + (n * x - t - (t // 20)))
            expect[(et, day)] = c
    for r in dq_cusum_alarm(spark, SF_DIR).collect():
        assert r["cusum"] == expect[(r["event_type"], r["day"])], r
        assert r["cusum"] >= 0


def test_shapley_efficiency_axiom(spark):
    """Shapley efficiency: channel credits sum to v(full coalition) -
    v(empty coalition) — the fair-split guarantee."""
    import duckdb as _d
    from sow_pyspark_scripts_spark.plans.enrich_ops import (
        events_attribution_shapley,
    )

    rows = events_attribution_shapley(spark, SF_DIR).collect()
    total = sum(r["shapley"] for r in rows)
    con = _d.connect()
    v111, v000 = con.execute(
        f"""
        WITH peruser AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS c,
                   MAX(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS v,
                   MAX(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS s,
                   MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1
        )
        SELECT
          COALESCE(MAX(CASE WHEN c=1 AND v=1 AND s=1
                            THEN CAST(k AS DOUBLE)/n END), 0),
          COALESCE(MAX(CASE WHEN c=0 AND v=0 AND s=0
                            THEN CAST(k AS DOUBLE)/n END), 0)
        FROM (SELECT c, v, s, COUNT(*) AS n, SUM(conv) AS k
              FROM peruser GROUP BY 1,2,3)
        """
    ).fetchone()
    assert abs(total - (v111 - v000)) < 1e-5


def test_variance_merge_equals_direct(spark):
    """Chan shard-state merge == direct single-pass var_pop/mean."""
    from sow_pyspark_scripts_spark.plans.state_ops import (
        agg_variance_shard_merge,
    )
    from sow_pyspark_scripts_spark.sources import read_table

    row = agg_variance_shard_merge(spark, SF_DIR).collect()[0]
    direct = (
        read_table(spark, SF_DIR, "lineitem")
        .agg(
            F.avg("l_extendedprice").alias("m"),
            F.var_pop("l_extendedprice").alias("v"),
        )
        .collect()[0]
    )
    assert abs(row["mean"] - direct["m"]) < 0.01
    assert abs(row["var_pop"] - direct["v"]) / direct["v"] < 1e-3


def test_cidr_match_total_and_most_specific(spark):
    """The /0 default route makes longest-prefix match total (every
    customer resolves), and every resolved zone's prefix length is the
    max among the routes containing that IP."""
    from sow_pyspark_scripts_spark.plans.enrich_ops import (
        _CIDRS,
        join_ip_cidr_prefix,
    )
    from sow_pyspark_scripts_spark.sources import read_table

    rows = join_ip_cidr_prefix(spark, SF_DIR).collect()
    n_cust = read_table(spark, SF_DIR, "customer").count()
    assert len(rows) == n_cust
    routes = {(b, l): z for b, l, z in _CIDRS}
    for r in rows[:200]:
        best = max(
            (l for (b, l) in routes if r["ip"] >> (32 - l) == b if l < 32),
            default=0,
        )
        assert r["prefix_len"] == best, r


def test_knn_mutual_graph_is_symmetric_bounded(spark):
    """Mutual-kNN invariants: canonical a<b edges, no duplicates, and
    node degree bounded by k."""
    from collections import Counter

    from sow_pyspark_scripts_spark.plans.state_ops import (
        _KNN_K,
        graph_knn_mutual,
    )

    rows = graph_knn_mutual(spark, SF_DIR).collect()
    edges = [(r["a"], r["b"]) for r in rows]
    assert len(edges) == len(set(edges))
    deg = Counter()
    for a, b in edges:
        assert a < b
        deg[a] += 1
        deg[b] += 1
    assert all(d <= _KNN_K for d in deg.values())


def test_manifest_publish_idempotent_and_exact(spark):
    """Manifest commit protocol: the read-back sees exactly the
    committed files (the planted stale .tmp file is invisible), row
    count matches the source, and re-publishing is idempotent."""
    from sow_pyspark_scripts_spark.plans.platform_ops import (
        sink_manifest_publish,
    )
    from sow_pyspark_scripts_spark.sources import read_table

    n_src = read_table(spark, SF_DIR, "orders").count()
    first = sink_manifest_publish(spark, SF_DIR)
    assert first.count() == n_src
    files = {r[0] for r in first.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 4
    assert not any("stale" in f or f.endswith(".tmp") for f in files)
    second = sink_manifest_publish(spark, SF_DIR)
    assert second.count() == n_src
    assert first.exceptAll(second).count() == 0


def test_lsh_band_tuning_monotone_tradeoff(spark):
    """LSH S-curve coherence: more rows per band => higher threshold
    (more precise) and no more candidate pairs than a looser layout."""
    from sow_pyspark_scripts_spark.plans.curation_ops import (
        dedup_lsh_band_tuning,
    )

    rows = sorted(
        dedup_lsh_band_tuning(spark, SF_DIR).collect(),
        key=lambda r: r["rows_per_band"],
    )
    assert [r["rows_per_band"] for r in rows] == [2, 4, 8]
    thresholds = [r["s_curve_threshold"] for r in rows]
    assert thresholds == sorted(thresholds)
    pair_counts = [r["candidate_pairs"] for r in rows]
    assert pair_counts == sorted(pair_counts, reverse=True)


def test_vocab_coverage_monotone_in_k(spark):
    """Coverage is monotone in vocabulary size and bounded by 1."""
    from sow_pyspark_scripts_spark.plans.curation_ops import (
        tokenizer_vocab_coverage,
    )

    rows = sorted(
        tokenizer_vocab_coverage(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)
    assert all(0 <= c <= 1 for c in cov)


def test_kendall_tau_sign_matches_scipy_free_check(spark, duck):
    """tau_b must lie in [-1, 1] and its sign must agree with the sign
    of the covariance between the two binned variables (a necessary
    consistency condition for any concordance measure)."""
    from sow_pyspark_scripts_spark.plans.signal_ops import (
        stats_kendall_tau_binned,
    )

    row = stats_kendall_tau_binned(spark, SF_DIR).collect()[0]
    assert -1 <= row["tau_b"] <= 1
    (cov,) = duck.execute(
        """
        SELECT covar_pop(l_quantity, floor(l_discount * 100 + 0.5))
        FROM lineitem
        """
    ).fetchone()
    if abs(cov) > 1e-9 and abs(row["tau_b"]) > 1e-6:
        assert (cov > 0) == (row["tau_b"] > 0)

def test_ivf_multiprobe_recall_not_worse(spark):
    """nprobe=2 must recover at least as many exact top-5 neighbors as
    nprobe=1 for every query (its candidate set is a superset)."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401 — full chain first
    from sow_pyspark_scripts_spark.plans.dedup_sim import (
        similarity_topk_exact,
        similarity_topk_ivf,
    )
    from sow_pyspark_scripts_spark.plans.tune_ops import (
        similarity_topk_ivf_multiprobe,
    )

    def edges(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["cid"])
        return out

    exact = edges(similarity_topk_exact(spark, SF_DIR))
    p1 = edges(similarity_topk_ivf(spark, SF_DIR))
    p2 = edges(similarity_topk_ivf_multiprobe(spark, SF_DIR))
    r1 = sum(len(p1.get(q, set()) & e) for q, e in exact.items())
    r2 = sum(len(p2.get(q, set()) & e) for q, e in exact.items())
    assert r2 >= r1


def test_base62_codec_bijective(spark):
    """Fixed-width base62 codec must round-trip every key and be
    injective over the table."""
    from sow_pyspark_scripts_spark.plans.mask_ops import expr_base62_codec

    df = expr_base62_codec(spark, SF_DIR)
    rows = df.collect()
    assert all(r["roundtrip_ok"] for r in rows)
    codes = [r["code"] for r in rows]
    assert len(set(codes)) == len(codes)
    assert all(len(c) == 6 for c in codes)

def test_pointer_jumping_equals_flooding_cc(spark):
    """Pointer-jumping CC must label every vertex identically to the
    min-label flooding operator (same edges, same semantics)."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.plans.dedup_sim import dedup_clusters
    from sow_pyspark_scripts_spark.plans.shard_ops import (
        graph_cc_pointer_jumping,
    )

    flood = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(spark, SF_DIR).collect()
    }
    jump = {
        r["doc_id"]: r["cluster_id"]
        for r in graph_cc_pointer_jumping(spark, SF_DIR).collect()
    }
    assert flood == jump


def test_shard_packing_contiguous_and_conserving(spark, duck):
    """Shards cover contiguous id ranges, conserve total bytes, and
    every shard except possibly the last ends at/over the target."""
    from sow_pyspark_scripts_spark.plans.shard_ops import (
        _SHARD_BYTES,
        pack_shards_bytes,
    )

    rows = sorted(
        pack_shards_bytes(spark, SF_DIR).collect(), key=lambda r: r["shard_id"]
    )
    (total,) = duck.execute("SELECT SUM(n_chars) FROM documents").fetchone()
    assert sum(r["shard_bytes"] for r in rows) == total
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["first_doc"] == prev["last_doc"] + 1
    # exclusive-prefix cut: every shard's span crosses the target
    for r in rows[:-1]:
        assert r["shard_bytes"] > 0


def test_fifo_allocation_conserves_quantity(spark, duck):
    """FIFO allocation invariant: per part, allocated quantity equals
    min(total received, total demanded), every allocation is positive,
    and no (receipt, demand) pair repeats."""
    from collections import defaultdict

    from sow_pyspark_scripts_spark.plans.flow_ops import (
        agg_fifo_lot_allocation,
    )

    rows = agg_fifo_lot_allocation(spark, SF_DIR).collect()
    seen = set()
    alloc = defaultdict(int)
    for r in rows:
        key = (r["l_partkey"], r["receipt_seq"], r["demand_seq"])
        assert key not in seen
        seen.add(key)
        assert r["qty_allocated"] > 0
        alloc[r["l_partkey"]] += r["qty_allocated"]
    totals = {
        pk: (int(n or 0), int(rr or 0))
        for pk, n, rr in duck.execute(
            """
            SELECT l_partkey,
                   SUM(CASE WHEN l_returnflag='N' THEN l_quantity END),
                   SUM(CASE WHEN l_returnflag='R' THEN l_quantity END)
            FROM lineitem GROUP BY 1
            """
        ).fetchall()
    }
    for pk, (n, rr) in totals.items():
        assert alloc.get(pk, 0) == min(n, rr), (pk, alloc.get(pk), n, rr)


def test_pq_adc_preserves_exact_neighbors(spark):
    """PQ ADC invariants: every query emits exactly 5 ranked candidates,
    distances are non-negative and rank-monotone, and recall of the
    exact L2 top-5 beats the random-draw null (E[hits] = 1/100 here).

    The bound is deliberately weak: the fixture's embeddings are
    unit-norm UNSTRUCTURED vectors (pairwise-d2 CV ~= 12%, intra-label
    == inter-label distance), so distance concentration caps what ANY
    2-byte code can resolve — the property protects the mechanics, not
    a recall level this data cannot support. The encode side is
    value-exact against its DuckDB oracle regardless."""
    import numpy as np

    import sow_pyspark_scripts_spark.registry  # noqa: F401 — full chain first
    from sow_pyspark_scripts_spark.plans.dsel_ops import similarity_topk_pq

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    ids = sorted(emb)
    X = np.vstack([emb[i] for i in ids])
    exact = {}
    for q in [i for i in ids if i < 20]:
        d2 = ((X - emb[q]) ** 2).sum(axis=1)
        exact[q] = set([i for _, i in sorted(zip(d2, ids)) if i != q][:5])
    rows = similarity_topk_pq(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert r["adc_d2"] >= 0
        by_q.setdefault(r["qid"], []).append((r["rank"], r["adc_d2"], r["cid"]))
    assert set(by_q) == set(exact)
    hits = 0
    for q, lst in by_q.items():
        lst.sort()
        assert [k for k, _, _ in lst] == [1, 2, 3, 4, 5]
        assert all(
            lst[i][1] <= lst[i + 1][1] for i in range(4)
        ), "ADC must be rank-monotone"
        hits += len({c for _, _, c in lst} & exact[q])
    assert hits >= 3, f"PQ recall below random null: {hits}/100"


def test_pq_encode_codes_well_formed(spark):
    """Every vector gets exactly m=4 codes, each a sign cell in 0..15,
    and the quantization error is non-negative."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.plans.dsel_ops import embedding_pq_encode

    rows = embedding_pq_encode(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        parts = r["codes"].split("|")
        assert len(parts) == 4
        assert all(0 <= int(p) <= 15 for p in parts)
        assert r["qerr"] >= 0


def test_dsir_weights_separate_target_domain(spark):
    """The DSIR estimator must, on average, score target-domain (en)
    documents above non-target documents — that is the entire point of
    importance weighting. Docs with no bigrams carry exactly 0."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.plans.dsel_ops import corpus_dsir_weights
    from sow_pyspark_scripts_spark.sources import read_table

    w = corpus_dsir_weights(spark, SF_DIR)
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    joined = {
        (r["doc_id"]): (r["lang"], r["n_bigrams"], r["dsir_logw"])
        for r in w.join(docs, "doc_id").collect()
    }
    en = [lw for lang, nb, lw in joined.values() if lang == "en" and nb > 0]
    other = [lw for lang, nb, lw in joined.values() if lang != "en" and nb > 0]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
    for lang, nb, lw in joined.values():
        if nb == 0:
            assert lw == 0.0


def test_streaming_left_outer_is_inner_plus_null_views(spark):
    """The left-outer stream-stream join must equal the inner join rows
    plus exactly one null-purchase row for every view with no purchase
    within 30 minutes (checked against a batch model)."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.plans.dsel_ops import streaming_join_left_outer
    from sow_pyspark_scripts_spark.sources import read_table

    rows = streaming_join_left_outer(spark, SF_DIR).collect()
    matched = [r for r in rows if r["purchase_ts"] is not None]
    nulls = [r for r in rows if r["purchase_ts"] is None]
    ev = read_table(spark, SF_DIR, "events")
    views = [
        (r["user_id"], r["ts"])
        for r in ev.where(F.col("event_type") == "view").collect()
    ]
    purchases = {}
    for r in ev.where(F.col("event_type") == "purchase").collect():
        purchases.setdefault(r["user_id"], []).append(r["ts"])
    exp_nulls = 0
    exp_matched = 0
    for u, ts in views:
        hits = [
            p
            for p in purchases.get(u, [])
            if ts <= p <= ts + pd.Timedelta(minutes=30)
        ]
        if hits:
            exp_matched += len(hits)
        else:
            exp_nulls += 1
    assert len(matched) == exp_matched
    assert len(nulls) == exp_nulls


def test_ivfpq_prunes_to_query_cell_and_ranks(spark):
    """IVF-PQ invariants: every returned candidate shares the query's
    IVF cell, each query emits exactly 5 rank-monotone rows (cells here
    hold ~N/10 >> 5 members), and the ADC distances agree with the pure
    PQ tier on the rows both return (same codes, same LUT)."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.operators.similarity import ivf_cells
    from sow_pyspark_scripts_spark.plans.dsel_ops import (
        similarity_topk_ivfpq,
        similarity_topk_pq,
    )
    from sow_pyspark_scripts_spark.sources import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    _, cells = ivf_cells(emb)
    cell_of = {r["vec_id"]: r["cell"] for r in cells.collect()}
    rows = similarity_topk_ivfpq(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert cell_of[r["cid"]] == cell_of[r["qid"]], "candidate escaped the probed cell"
        by_q.setdefault(r["qid"], []).append((r["rank"], r["adc_d2"], r["cid"]))
    assert set(by_q) == {i for i in cell_of if i < 20}
    for lst in by_q.values():
        lst.sort()
        assert [k for k, _, _ in lst] == [1, 2, 3, 4, 5]
        assert all(lst[i][1] <= lst[i + 1][1] for i in range(4))
    pq = {
        (r["qid"], r["cid"]): r["adc_d2"]
        for r in similarity_topk_pq(spark, SF_DIR).collect()
    }
    shared = [
        (q, d, pq[(q, c)]) for q, lst in by_q.items() for _, d, c in lst if (q, c) in pq
    ]
    assert shared, "IVF-PQ and PQ tiers returned disjoint rows — suspicious"
    for q, d_ivfpq, d_pq in shared:
        assert d_ivfpq == d_pq


def test_pq_refine_matches_bruteforce_on_shortlist(spark):
    """ADC+refine invariants: the exact re-rank must agree with a numpy
    brute-force L2 ranking restricted to each query's shortlist, and
    refined recall of the true top-5 must be >= the code-only PQ tier's
    (re-ranking with exact vectors can only help)."""
    import numpy as np

    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.plans.dsel_ops import (
        similarity_topk_pq,
        similarity_topk_pq_refine,
    )

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    ids = sorted(emb)
    X = np.vstack([emb[i] for i in ids])
    exact = {}
    for q in [i for i in ids if i < 20]:
        d2 = ((X - emb[q]) ** 2).sum(axis=1)
        exact[q] = [i for _, i in sorted(zip(d2, ids)) if i != q][:5]
    ref = {}
    for r in similarity_topk_pq_refine(spark, SF_DIR).collect():
        ref.setdefault(r["qid"], []).append((r["rank"], r["cid"], r["d2"]))
    assert set(ref) == set(exact)
    for q, lst in ref.items():
        lst.sort()
        assert [k for k, _, _ in lst] == [1, 2, 3, 4, 5]
        # exact d2 must match the numpy twin of the r5 grid kernel
        # (components quantized to 1e-6 ints, exact integer sum, one
        # division, one half-up floor — functions/det.d2r6_grid_sql)
        for _, cid, d2 in lst:
            qa = np.floor(emb[q] * 1e6 + 0.5).astype(np.int64)
            qc = np.floor(emb[cid] * 1e6 + 0.5).astype(np.int64)
            s = int(((qa - qc) ** 2).sum())
            want = np.floor(float(s) / 1e6 + 0.5) / 1e6
            assert d2 == want, (q, cid, d2, want)
    pq_by_q = {}
    for r in similarity_topk_pq(spark, SF_DIR).collect():
        pq_by_q.setdefault(r["qid"], set()).add(r["cid"])
    pq_hits = sum(len(cids & set(exact[q])) for q, cids in pq_by_q.items())
    ref_hits = sum(len({c for _, c, _ in lst} & set(exact[q])) for q, lst in ref.items())
    assert ref_hits >= pq_hits, f"refine ({ref_hits}) must not lose to code-only PQ ({pq_hits})"


def test_incremental_minhash_equals_restricted_full(spark):
    """The delta-probes-base incremental join must return exactly the
    full self-join's candidate pairs that cross the delta/base split —
    no pair lost, none invented, in either orientation."""
    import sow_pyspark_scripts_spark.registry  # noqa: F401
    from sow_pyspark_scripts_spark.plans.dedup_sim import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    want = set()
    for a, b in full:
        if a % 10 == 0 and b % 10 != 0:
            want.add((a, b))
        elif b % 10 == 0 and a % 10 != 0:
            want.add((b, a))
    got = {
        (r["new_doc"], r["dup_of"])
        for r in dedup_minhash_incremental(spark, SF_DIR).collect()
    }
    assert got == want


def test_pq_refine_recall_dominates_adc_recall(spark):
    """ADC+R invariant (Jegou 2011 §VI): the refined top-5 is the
    exact-best 5 of the R=25 ADC shortlist, and the plain ADC top-5 is
    a subset of that same shortlist — so against the exact global
    top-5, refine recall can NEVER be below plain-ADC recall. This is
    the property the refine stage exists to buy; a violation means the
    shortlist/re-rank wiring is broken even if both queries match
    their oracles."""
    from sow_pyspark_scripts_spark.registry import QUERIES

    def top5(name, dcol):
        out = {}
        for r in QUERIES[name](spark, SF_DIR).collect():
            out.setdefault(r["qid"], set()).add(r["cid"])
        return out

    adc = top5("similarity_topk_pq", "adc_d2")
    ref = top5("similarity_topk_pq_refine", "d2")

    # exact L2 top-5 per query (the ground truth both approximate)
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    q = vecs.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    d2 = (
        vecs.select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
        .crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.aggregate(
                F.zip_with(F.col("qe"), F.col("ce"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cid"))
    exact = {}
    for r in (
        d2.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 5).collect()
    ):
        exact.setdefault(r["qid"], set()).add(r["cid"])

    assert set(adc) == set(ref) == set(exact)
    for qid in exact:
        r_adc = len(adc[qid] & exact[qid])
        r_ref = len(ref[qid] & exact[qid])
        assert r_ref >= r_adc, (qid, sorted(adc[qid]), sorted(ref[qid]))


# ---------------------------------------------------------------------------
# mean_grid: the exact-integer grid mean (round 4's determinism pin)
# ---------------------------------------------------------------------------

grid_vals = st.lists(
    st.floats(
        min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=64,
)


@given(vals=grid_vals, parts=st.integers(min_value=1, max_value=16))
@settings(**SETTINGS)
def test_mean_grid_matches_exact_rational_mean(spark, vals, parts):
    """mean_grid == the EXACT rational mean of the 1e-6-quantized
    inputs (computed with Fractions on the driver), independent of the
    input partitioning. This is the whole contract: quantize, sum
    exactly, divide once, half-up — no float-sum-order term anywhere."""
    import math
    from fractions import Fraction

    from sow_pyspark_scripts_spark.functions.det import mean_grid

    df = spark.createDataFrame(
        [(float(v),) for v in vals], "v double"
    ).repartition(parts)
    got = df.agg(mean_grid(F.col("v")).alias("m")).collect()[0]["m"]
    q = [math.floor(v * 1e6 + 0.5) for v in vals]
    expect = float(
        math.floor(Fraction(sum(q), len(q)) + Fraction(1, 2))
    ) / 1e6
    # identical arithmetic: sum(q)/n in double, +0.5, floor. The
    # Fraction form can disagree with the double division ONLY when
    # sum/n lands within 1 ulp of a .5 boundary; mean_grid's contract
    # is bit-equality BETWEEN ENGINES (same double ops), so accept the
    # double-boundary case by recomputing the double way too.
    expect_double = math.floor(sum(q) / len(q) + 0.5) / 1e6
    assert got == expect_double or got == expect


@given(vals=grid_vals)
@settings(**SETTINGS)
def test_mean_grid_partitioning_invariant(spark, vals):
    """Same multiset, two adversarial partitionings -> bit-identical
    grid mean (the property whose absence was the round-3 semdedup
    driver flake)."""
    from sow_pyspark_scripts_spark.functions.det import mean_grid

    rows = [(float(v),) for v in vals]
    a = (
        spark.createDataFrame(rows, "v double")
        .repartition(1)
        .agg(mean_grid(F.col("v")).alias("m"))
        .collect()[0]["m"]
    )
    b = (
        spark.createDataFrame(rows, "v double")
        .repartition(16)
        .agg(mean_grid(F.col("v")).alias("m"))
        .collect()[0]["m"]
    )
    assert a == b


def test_plane_family_injective_over_supported_range():
    """The r4 ADVICE defect: the old ((i*31 + 17j) % 7) family had only
    SEVEN distinct hyperplanes — bands and the 'independent' second
    semdedup family silently shared planes. The r5 family must yield
    pairwise-DISTINCT coefficient vectors for all 42 supported planes
    (and raise beyond), with planes 0-3 exactly the legacy values so
    every pre-r5 bucketing is unchanged."""
    import pytest as _pytest

    from sow_pyspark_scripts_spark.operators.similarity import (
        MAX_PLANES,
        plane_class,
    )

    def coef_vec(j, dims=64):
        s, o = plane_class(j)
        return tuple(((i * s + o) % 7) - 3 for i in range(1, dims + 1))

    vecs = [coef_vec(j) for j in range(MAX_PLANES)]
    assert len(set(vecs)) == MAX_PLANES == 42
    # no constant (slope-0) plane: every coefficient vector varies
    assert all(len(set(v)) > 1 for v in vecs)
    # legacy compatibility: planes 0..3 equal the old formula's values
    for j in range(4):
        legacy = tuple(((i * 31 + j * 17) % 7) - 3 for i in range(1, 65))
        assert vecs[j] == legacy, j
    with _pytest.raises(ValueError):
        plane_class(MAX_PLANES)
    with _pytest.raises(ValueError):
        plane_class(-1)


def test_plane_coef_sql_matches_python_family():
    """The oracle-side fragment generator must produce the same
    coefficients DuckDB-side as the engine family computes."""
    import duckdb

    from sow_pyspark_scripts_spark.operators.similarity import (
        plane_class,
        plane_coef_sql,
    )

    con = duckdb.connect()
    for j in [0, 3, 4, 8, 15, 41]:
        s, o = plane_class(j)
        rows = con.execute(
            f"SELECT i, {plane_coef_sql('i', j)} FROM range(1, 65) t(i)"
        ).fetchall()
        for i, c in rows:
            assert c == ((i * s + o) % 7) - 3, (j, i)


def test_simhash_wide_pigeonhole_complete(spark):
    """The 48-bit pigeonhole index must find EVERY pair at hamming <= 3
    — pigeonhole correctness (4 bands > 3 flipped bits) checked against
    the brute-force all-pairs xor-popcount on the fixture, plus the
    selectivity claim that motivates the wide twin: the 12-bit-band
    candidate set must be a strict subset of the doc-pair space that the
    16-bit index floods (16 distinct values per band ~ 30% of ALL pairs
    collide at 500 docs)."""
    import __spark_entry__ as em

    got = {
        (r["doc_a"], r["doc_b"])
        for r in em.queries()["dedup_simhash_hamming_wide"](spark, SF_DIR).collect()
    }

    from sow_pyspark_scripts_spark.operators.dedup import simhash
    from sow_pyspark_scripts_spark.sources import read_table

    sh = simhash(read_table(spark, SF_DIR, "documents"), bits=48)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .collect()
    }
    assert got == brute  # complete AND exact — no missed ball member
    n_docs = sh.count()
    assert len(got) < n_docs * (n_docs - 1) // 2  # not the all-pairs flood
