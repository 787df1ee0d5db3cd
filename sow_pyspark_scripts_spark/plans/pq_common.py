"""Shared PQ / IVFADC building blocks (LEAF module).

Constants, oracle CTE fragments and DataFrame helpers used by BOTH the
in-query compressed-ANN tier (`plans/dsel_ops.py`) and the stored-index
tier (`plans/ann_index.py`). A leaf module: it imports only pyspark and
the operator layer — never `registry` or another plan module — so any
plan file can pull these at import time without re-entering the
registry's import chain half-initialized (importing dsel_ops directly
used to crash exactly that way once ann_index imported its symbols).

See dsel_ops.py for the tier design notes and Jegou et al. 2011
citations; everything here follows the house determinism rules
(fixed integer plane weights, exact integer arithmetic for sign cells,
6dp half-up quantization before ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import (
    cos_grid_sql,
    d2_grid_sql,
    d2r6_grid_sql,
    mean_grid,
    mean_grid_sql,
    quant_sql,
)
from ..sources import read_table

def _round6(c):
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Exact-integer 1e-6 grid mean (functions/det.py): every centroid /
# codeword mean below is pinned so its value is independent of Spark's
# partial-aggregate merge order — the round-3 semdedup flake class.
_MEAN6_V = mean_grid_sql("v")
_MEAN6_SV = mean_grid_sql("s.v")


_PQ_M = 4        # subvectors
_PQ_SUB = 16     # dims per subvector (64 / 4)
_PQ_PLANES = 4   # sign planes per subvector -> up to 16 cells each

# Fixed integer plane weights, same affine family as the SRP buckets in
# plans/dedup_sim.py:_srp_sql (i = GLOBAL 1-based dim subscript, so each
# subvector sees a different slice of the pattern): products of float32
# values with small integers and 16-term sums are EXACT in double, so
# both engines compute bit-identical projections and the sign cells can
# never disagree.


def _pq_w(k: int) -> str:
    return f"(((i * 31 + {k * 17}) % 7) - 3)"


def _proj_term_sql(arr: str, s: int, k: int, float_w: bool = False) -> str:
    """The unrolled sign-projection sum for subvector ``s`` / plane ``k``
    as ONE Spark-SQL fragment over the integer grid array ``arr``.

    r6 lesson: building this chain as ~50 Python Column operations per
    plane costs a py4j round-trip EACH — `_pq_subvecs` alone spent 2-3s
    of driver time per query constructing expression trees before any
    row moved. One f-string parsed JVM-side by a single F.expr builds
    the identical tree (same left-assoc sum, same literal types:
    integer weights for the quantized embedding path, `D`-suffixed
    double weights for the residual path that always multiplied by
    float(w)) for microseconds.
    """
    terms = []
    for j in range(_PQ_SUB):
        i = s * _PQ_SUB + j + 1
        w = ((i * 31 + k * 17) % 7) - 3
        if w:
            lit = f"{w}.0D" if float_w else str(w)
            terms.append(f"element_at({arr}, {i}) * {lit}")
    return " + ".join(terms)


def _cell_sql(arr: str, s: int, float_w: bool = False) -> str:
    """Sign-cell code for subvector ``s``: 4 plane-sign bits summed,
    cast BIGINT — the SQL twin of the old per-plane F.when chain."""
    cases = " + ".join(
        f"(CASE WHEN ({_proj_term_sql(arr, s, k, float_w)}) > 0 "
        f"THEN {2 ** k} ELSE 0 END)"
        for k in range(_PQ_PLANES)
    )
    return f"CAST({cases} AS BIGINT)"


_PQ_CODE_CTE = f"""
sflat AS (
  SELECT vec_id, (generate_subscripts(embedding, 1) - 1) // {_PQ_SUB} AS sub,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
projs AS (
  SELECT vec_id, sub,
         {", ".join(f"sum({quant_sql('v')} * {_pq_w(k)}) AS p{k}" for k in range(4))}
  FROM sflat GROUP BY vec_id, sub
),
cells AS (
  SELECT vec_id, sub,
         CAST({" + ".join(f"(CASE WHEN p{k} > 0 THEN {2**k} ELSE 0 END)" for k in range(4))}
              AS BIGINT) AS cell
  FROM projs
),
cw AS (
  SELECT s.sub, c.cell, s.i, {_MEAN6_SV} AS c
  FROM sflat s JOIN cells c ON s.vec_id = c.vec_id AND s.sub = c.sub
  GROUP BY s.sub, c.cell, s.i
)"""


def _pq_subvecs(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, cell, sv): m=4 rows per vector — ``sv`` is the
    16-dim subvector slice, ``cell`` its sign-cell code. The sign
    projections are UNROLLED per (sub, plane) into explicit
    element_at-times-literal sum chains (zero-weight terms dropped):
    plain arithmetic that whole-stage codegen compiles, where the
    higher-order-function form (zip_with + aggregate lambdas) is
    interpreted per row — measured 6x slower at the 100x smoke. No
    dimension explode, no shuffle, no join before the struct explode."""
    # Quantize the vector to integer grid units ONCE, in its own
    # projection: everything downstream references the `eq` ATTRIBUTE,
    # so the unrolled sign sums stay compact element_at terms. Inlining
    # the floor/cast per term (the first r5 form) grew the Generate
    # stage past janino's 64 KB method limit — Spark silently fell back
    # to interpreted evaluation and the PQ bench tier doubled.
    base = emb.select(
        "vec_id",
        F.expr(
            "transform(cast(embedding as array<double>), "
            "x -> cast(floor(x * 1e6 + 0.5D) as bigint))"
        ).alias("eq"),
    )

    # sv in INTEGER grid units (r5): quantize ONCE in `base`, so every
    # downstream d2 is pure integer diffs — the per-pair
    # re-quantization this replaced cost the PQ bench tier ~2x.
    # Whole expression assembled as ONE SQL string -> ONE py4j call
    # (r6: the per-term Column-arithmetic loop this replaces spent 2-3s
    # of driver time per query on py4j round trips; tree is identical).
    structs = ", ".join(
        f"named_struct("
        f"'sub', CAST({s} AS BIGINT), "
        f"'cell', {_cell_sql('eq', s)}, "
        f"'sv', slice(eq, {s * _PQ_SUB + 1}, {_PQ_SUB}))"
        for s in range(_PQ_M)
    )
    # Materialize the 4-struct array as its OWN projection attribute and
    # explode the attribute: with the array constructor (4 x unrolled
    # sign sums + slices) inlined in the Generate, the fused delta-encode
    # stage (generate + % 10 filters + codebook join feeding d2) grew
    # past janino's 64 KB method limit — ERROR CodeGenerator, silent
    # interpreted fallback (the same class as the `eq` fix above; found
    # by the bench-log "Failed to compile" checklist). Project expressions
    # split into helper methods; Generate's doConsume cannot.
    arr = base.select("vec_id", F.expr(f"array({structs})").alias("sc_arr"))
    return arr.select("vec_id", F.explode("sc_arr").alias("sc")).select(
        "vec_id", "sc.sub", "sc.cell", "sc.sv"
    )


def _pq_codebook(subvecs: DataFrame) -> DataFrame:
    """(sub, cell, carr): the trained codeword per cell as a 16-dim
    array — elementwise mean of the cell's members. One posexplode +
    map-side-combinable avg (the ONLY per-dimension shuffle in the PQ
    stage), then a 64-row regroup. KB-scale, broadcast downstream.
    The mean is the exact-integer grid mean (``mean_grid``) so the
    codeword is independent of partial-aggregate merge order — the
    round-3 semdedup flake class applies to codewords exactly as it
    does to IVF centroids (both feed 6dp-rounded d2 rankings)."""
    flat = subvecs.select("sub", "cell", F.posexplode("sv").alias("p", "v"))
    # sv is already in integer grid units, so the pinned mean is the
    # plain integer mean floor(sum/count + 0.5) — exactly the integer
    # inside the oracle's mean_grid_sql value (carr = quant(oracle c))
    cw = flat.groupBy("sub", "cell", "p").agg(
        F.floor(F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("c")
    )
    return (
        cw.groupBy("sub", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("p", "c"))).alias("pc"))
        .select("sub", "cell", F.col("pc.c").alias("carr"))
    )


def _pq_d2(sv: str, carr: str):
    """Squared L2 between a subvector and a codeword (column NAMES),
    rounded half-up to the 6dp grid FROM EXACT INTEGER SUMS (r5,
    `d2r6_grid_sql` twin). Both arrays arrive ALREADY in 1e-6 integer
    grid units (`_pq_subvecs` / `_pq_codebook` quantize once at the
    source), so this is 16 pure integer diffs summed (order-free), one
    division, one floor — unrolled codegen arithmetic, no per-pair
    re-quantization. One SQL string -> one py4j call (r6)."""
    total = " + ".join(
        f"(element_at({sv}, {j}) - element_at({carr}, {j}))"
        f" * (element_at({sv}, {j}) - element_at({carr}, {j}))"
        for j in range(1, _PQ_SUB + 1)
    )
    return F.expr(
        f"floor(cast(({total}) as double) / 1e6 + 0.5D) / 1e6"
    )


_PQ_TOPK_ORACLE = f"""
WITH {_PQ_CODE_CTE},
lut AS (
  SELECT q.vec_id AS qid, w.sub, w.cell,
         {d2r6_grid_sql('q.v', 'w.c')} AS pd2
  FROM sflat q JOIN cw w ON w.sub = q.sub AND w.i = q.i
  WHERE q.vec_id < 20
  GROUP BY q.vec_id, w.sub, w.cell
),
adc AS (
  SELECT l.qid, c.vec_id AS cid,
         floor(sum(l.pd2) * 1e6 + 0.5) / 1e6 AS adc_d2
  FROM cells c JOIN lut l ON l.sub = c.sub AND l.cell = c.cell
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
)
SELECT qid, cid, adc_d2, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, cid, adc_d2,
         row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rnk
  FROM adc
) WHERE rnk <= 5
"""


_PQ_REFINE_R = 25  # ADC shortlist size per query before exact re-rank

_PQ_REFINE_ORACLE = f"""
WITH {_PQ_CODE_CTE},
lut AS (
  SELECT q.vec_id AS qid, w.sub, w.cell,
         {d2r6_grid_sql('q.v', 'w.c')} AS pd2
  FROM sflat q JOIN cw w ON w.sub = q.sub AND w.i = q.i
  WHERE q.vec_id < 20
  GROUP BY q.vec_id, w.sub, w.cell
),
adc AS (
  SELECT l.qid, c.vec_id AS cid,
         floor(sum(l.pd2) * 1000000.0 + 0.5) / 1000000.0 AS adc_d2
  FROM cells c JOIN lut l ON l.sub = c.sub AND l.cell = c.cell
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
),
short AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rnk
    FROM adc
  ) WHERE rnk <= {_PQ_REFINE_R}
),
vflat AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
ex AS (
  SELECT s.qid, s.cid,
         {d2r6_grid_sql('qv.v', 'cv.v')} AS d2
  FROM short s
  JOIN vflat qv ON qv.vec_id = s.qid
  JOIN vflat cv ON cv.vec_id = s.cid AND cv.i = qv.i
  GROUP BY s.qid, s.cid
)
SELECT qid, cid, d2, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, cid, d2,
         row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rnk
  FROM ex
) WHERE rnk <= 5
"""


_IVFPQ_ORACLE = f"""
WITH {_PQ_CODE_CTE},
iflat AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
icent AS (
  SELECT label AS cent_id, i, {_MEAN6_V} AS c
  FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
  GROUP BY label, i
),
idist AS (
  SELECT f.vec_id, c.cent_id,
         {d2_grid_sql('f.v', 'c.c')} AS d2
  FROM iflat f JOIN icent c ON f.i = c.i
  GROUP BY f.vec_id, c.cent_id
),
ivf AS (
  SELECT vec_id, cent_id AS ivf_cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
    FROM idist
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS qid, w.sub, w.cell,
         {d2r6_grid_sql('q.v', 'w.c')} AS pd2
  FROM sflat q JOIN cw w ON w.sub = q.sub AND w.i = q.i
  WHERE q.vec_id < 20
  GROUP BY q.vec_id, w.sub, w.cell
),
adc AS (
  SELECT l.qid, c.vec_id AS cid,
         floor(sum(l.pd2) * 1000000.0 + 0.5) / 1000000.0 AS adc_d2
  FROM cells c
  JOIN lut l ON l.sub = c.sub AND l.cell = c.cell
  JOIN ivf ic ON ic.vec_id = c.vec_id
  JOIN ivf iq ON iq.vec_id = l.qid AND iq.ivf_cell = ic.ivf_cell
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
)
SELECT qid, cid, adc_d2, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, cid, adc_d2,
         row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rnk
  FROM adc
) WHERE rnk <= 5
"""


_IVFADC_RPROJ = ",\n         ".join(
    f"sum(r6 * {_pq_w(k)}) AS p{k}" for k in range(_PQ_PLANES)
)
_IVFADC_RCELL = " + ".join(
    f"(CASE WHEN p{k} > 0 THEN {2**k} ELSE 0 END)" for k in range(_PQ_PLANES)
)

_IVFADC_ORACLE = f"""
WITH iflat AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
icent AS (
  SELECT label AS cent_id, i, {_MEAN6_V} AS c
  FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
  GROUP BY label, i
),
idist AS (
  SELECT f.vec_id, c.cent_id,
         {d2_grid_sql('f.v', 'c.c')} AS d2
  FROM iflat f JOIN icent c ON f.i = c.i
  GROUP BY f.vec_id, c.cent_id
),
ivf AS (
  SELECT vec_id, cent_id AS ivf_cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
    FROM idist
  ) WHERE rn = 1
),
icq AS (SELECT cent_id, i, CAST(floor(c * 1e6 + 0.5) AS BIGINT) AS c6 FROM icent),
r AS (
  SELECT f.vec_id, iv.ivf_cell, f.i, CAST((f.i - 1) // {_PQ_SUB} AS BIGINT) AS sub,
         CAST(floor(f.v * 1e6 + 0.5) AS BIGINT) - q.c6 AS r6
  FROM iflat f
  JOIN ivf iv ON iv.vec_id = f.vec_id
  JOIN icq q ON q.cent_id = iv.ivf_cell AND q.i = f.i
),
rproj AS (
  SELECT vec_id, sub,
         {_IVFADC_RPROJ}
  FROM r GROUP BY vec_id, sub
),
rcells AS (
  SELECT vec_id, sub, CAST({_IVFADC_RCELL} AS BIGINT) AS cell FROM rproj
),
rcw AS (
  SELECT rr.sub, c.cell, rr.i,
         CAST(floor(CAST(sum(rr.r6) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cw6
  FROM r rr JOIN rcells c ON c.vec_id = rr.vec_id AND c.sub = rr.sub
  GROUP BY rr.sub, c.cell, rr.i
),
lut AS (
  SELECT q.vec_id AS qid, q.ivf_cell, w.sub, w.cell,
         floor(CAST(sum((q.r6 - w.cw6) * (q.r6 - w.cw6)) AS DOUBLE) / 1e6 + 0.5)
             / 1e6 AS pd2
  FROM r q JOIN rcw w ON w.sub = q.sub AND w.i = q.i
  WHERE q.vec_id < 20
  GROUP BY q.vec_id, q.ivf_cell, w.sub, w.cell
),
adc AS (
  SELECT l.qid, c.vec_id AS cid,
         floor(sum(l.pd2) * 1e6 + 0.5) / 1e6 AS adc_d2
  FROM rcells c
  JOIN ivf ic ON ic.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.cell = c.cell AND l.ivf_cell = ic.ivf_cell
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
)
SELECT qid, cid, adc_d2, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, cid, adc_d2,
         row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rnk
  FROM adc
) WHERE rnk <= 5
"""


def _ivfadc_residuals(spark: SparkSession, sf_dir: str, coarse=None):
    """(vec_id, ivf_cell, r6): per-vector integer residual array on the
    1e-6 grid — x and its assigned coarse centroid are both quantized
    BEFORE subtracting, so every downstream statistic is exact integer
    arithmetic. The centroid table broadcasts (KB); the residual is one
    zip_with over the scan, no per-dimension rows. Pass ``coarse`` =
    (centroids, cells) to reuse an assignment already computed — the
    numpy coarse kernel is the dominant cost at 500k+ vectors and the
    index build needs the same relation twice."""
    from ..operators.similarity import ivf_cells

    emb = read_table(spark, sf_dir, "embeddings")
    centroids, icells = coarse if coarse is not None else ivf_cells(emb)
    ivf = icells.select("vec_id", F.col("cell").alias("ivf_cell"))
    cq = centroids.select(
        F.col("cent_id").alias("ivf_cell"),
        F.transform("centroid", lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5))).alias(
            "c6"
        ),
    )
    xq = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda v: F.floor(v * F.lit(1e6) + F.lit(0.5)),
        ).alias("x6"),
    )
    return (
        xq.join(ivf, "vec_id")
        .join(F.broadcast(cq), "ivf_cell")
        .select(
            "vec_id",
            "ivf_cell",
            F.zip_with("x6", "c6", lambda a, b: a - b).alias("r6"),
        )
    )


def _ivfadc_subvecs(resid: DataFrame) -> DataFrame:
    """(vec_id, ivf_cell, sub, cell, rsv): residual sign-cell coding —
    the `_pq_subvecs` shape on the integer residual array. Projections
    are exact integer sums (residual values ~4e6, 16 terms x weight <=3
    stay far under 2^53), so the sign cells are engine-independent by
    construction, not by accepted ulp risk."""
    # One SQL string -> one py4j call (r6, same rationale as
    # `_pq_subvecs`); float_w keeps the original double weight
    # literals (the residual path always multiplied by float(w)).
    structs = ", ".join(
        f"named_struct("
        f"'sub', CAST({s} AS BIGINT), "
        f"'cell', {_cell_sql('r6', s, float_w=True)}, "
        f"'rsv', slice(r6, {s * _PQ_SUB + 1}, {_PQ_SUB}))"
        for s in range(_PQ_M)
    )
    return resid.select(
        "vec_id", "ivf_cell", F.expr(f"explode(array({structs}))").alias("sc")
    ).select("vec_id", "ivf_cell", "sc.sub", "sc.cell", "sc.rsv")


def _ivfadc_d2(rsv: str, cw: str):
    """pd2 between an integer residual subvector and an integer codeword
    (column NAMES): exact integer sum of 16 squared diffs (<= ~1e15 <
    2^53), ONE division at the end — floor(sum/1e6 + 0.5)/1e6 puts the
    value on the same 6dp grid as the other ANN tiers. One SQL string
    -> one py4j call (r6)."""
    total = " + ".join(
        f"(element_at({rsv}, {j}) - element_at({cw}, {j}))"
        f" * (element_at({rsv}, {j}) - element_at({cw}, {j}))"
        for j in range(1, _PQ_SUB + 1)
    )
    return F.expr(f"floor(({total}) / 1e6 + 0.5D) / 1e6")


_IVFADC_MP_ORACLE = f"""
WITH iflat AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
icent AS (
  SELECT label AS cent_id, i, {_MEAN6_V} AS c
  FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
  GROUP BY label, i
),
idist AS (
  SELECT f.vec_id, c.cent_id,
         {d2_grid_sql('f.v', 'c.c')} AS d2
  FROM iflat f JOIN icent c ON f.i = c.i
  GROUP BY f.vec_id, c.cent_id
),
probes AS (
  SELECT vec_id, cent_id, rn AS probe_rank FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
    FROM idist
  ) WHERE rn <= 2
),
ivf AS (SELECT vec_id, cent_id AS ivf_cell FROM probes WHERE probe_rank = 1),
icq AS (SELECT cent_id, i, CAST(floor(c * 1e6 + 0.5) AS BIGINT) AS c6 FROM icent),
r AS (
  SELECT f.vec_id, iv.ivf_cell, f.i, CAST((f.i - 1) // {_PQ_SUB} AS BIGINT) AS sub,
         CAST(floor(f.v * 1e6 + 0.5) AS BIGINT) - q.c6 AS r6
  FROM iflat f
  JOIN ivf iv ON iv.vec_id = f.vec_id
  JOIN icq q ON q.cent_id = iv.ivf_cell AND q.i = f.i
),
rproj AS (
  SELECT vec_id, sub,
         {_IVFADC_RPROJ}
  FROM r GROUP BY vec_id, sub
),
rcells AS (
  SELECT vec_id, sub, CAST({_IVFADC_RCELL} AS BIGINT) AS cell FROM rproj
),
rcw AS (
  SELECT rr.sub, c.cell, rr.i,
         CAST(floor(CAST(sum(rr.r6) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cw6
  FROM r rr JOIN rcells c ON c.vec_id = rr.vec_id AND c.sub = rr.sub
  GROUP BY rr.sub, c.cell, rr.i
),
qr AS (
  SELECT f.vec_id, p.cent_id AS probe_cell, f.i,
         CAST((f.i - 1) // {_PQ_SUB} AS BIGINT) AS sub,
         CAST(floor(f.v * 1e6 + 0.5) AS BIGINT) - q.c6 AS r6
  FROM iflat f
  JOIN probes p ON p.vec_id = f.vec_id
  JOIN icq q ON q.cent_id = p.cent_id AND q.i = f.i
  WHERE f.vec_id < 20
),
lut AS (
  SELECT q.vec_id AS qid, q.probe_cell, w.sub, w.cell,
         floor(CAST(sum((q.r6 - w.cw6) * (q.r6 - w.cw6)) AS DOUBLE) / 1e6 + 0.5)
             / 1e6 AS pd2
  FROM qr q JOIN rcw w ON w.sub = q.sub AND w.i = q.i
  GROUP BY q.vec_id, q.probe_cell, w.sub, w.cell
),
adc AS (
  SELECT l.qid, c.vec_id AS cid,
         floor(sum(l.pd2) * 1e6 + 0.5) / 1e6 AS adc_d2
  FROM rcells c
  JOIN ivf ic ON ic.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.cell = c.cell AND l.probe_cell = ic.ivf_cell
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
)
SELECT qid, cid, adc_d2, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, cid, adc_d2,
         row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rnk
  FROM adc
) WHERE rnk <= 5
"""
