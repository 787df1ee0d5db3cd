#!/usr/bin/env python
"""Full-registry driver-sim: run EVERY registered query against its
DuckDB oracle at sf0.01 (the driver's correctness scale) from a fresh
process, and dump one row per query to CORRECTNESS_FULL_r{N}.json.

The per-round driver samples the first 50 registered queries; pytest
checks all of them but leaves no committed artifact. This tool closes
that gap (VERDICT.md round-2 item #5): the verdict can diff full
coverage across rounds without a 12-minute pytest rerun.

Usage: python tools/full_correctness.py [--round N] [--sf-dir DIR]
Writes CORRECTNESS_FULL_r{N}.json at the repo root and prints one
summary JSON line.

--dump-dir DIR (VERDICT r5 task #2) additionally writes one forensic
file per query: both sides' canonical sorted rows at FULL precision
(``repr`` + python type tag per cell, duckdb/pyspark versions in the
header), so the next driver-vs-builder contract divergence is a
line-diff instead of a multi-round mystery. ``--dump-limit`` caps rows
per side (default 20000; counts and a digest always recorded).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _forensic(v) -> str:
    """Full-precision, type-tagged cell repr for the divergence dump.

    Unlike ``_canon`` (which rounds floats and drops type identity to
    absorb benign cross-engine noise), this keeps everything: a driver
    whose hash is type-aware (the round-5 HUGEINT lesson) diverges in a
    way only a type-tagged dump can show.
    """
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_forensic(x) for x in v) + "]"
    return f"{v!r}:{type(v).__name__}"


def _write_dump(dump_dir, name, scols, srows_f, dcols, drows_f, limit):
    import hashlib
    import platform

    import duckdb
    import pyspark

    path = Path(dump_dir) / f"{name}.txt"
    with open(path, "w") as fh:
        fh.write(f"# query: {name}\n")
        fh.write(
            f"# pyspark={pyspark.__version__} duckdb={duckdb.__version__} "
            f"python={platform.python_version()}\n"
        )
        for side, cols, rows in (
            ("spark", scols, srows_f),
            ("oracle", dcols, drows_f),
        ):
            digest = hashlib.sha256(
                "\n".join("\t".join(r) for r in rows).encode()
            ).hexdigest()[:16]
            fh.write(
                f"--- {side} cols={cols} rows={len(rows)} "
                f"sha256/16={digest} ---\n"
            )
            for r in rows[:limit]:
                fh.write("\t".join(r) + "\n")
            if len(rows) > limit:
                fh.write(f"... {len(rows) - limit} more rows elided ...\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated subset")
    ap.add_argument(
        "--dump-dir", default=None,
        help="write per-query full-precision type-tagged row dumps here",
    )
    ap.add_argument("--dump-limit", type=int, default=20000)
    ap.add_argument(
        "--out", default=None,
        help="artifact filename (repo-root relative); default "
        "CORRECTNESS_FULL_r{round}.json. The standing per-round sf0.1 "
        "parity gate (VERDICT r7 #1) uses --sf-dir /root/testdata/sf0.1 "
        "--out CORRECTNESS_SF01_r{N}.json",
    )
    args = ap.parse_args()
    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)

    import duckdb

    import __spark_entry__ as em
    from sow_pyspark_scripts_spark.session import get_spark

    spark = get_spark(app_name="full_correctness", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = em.queries()
    oracles = em.oracle_sql()
    names = args.only.split(",") if args.only else list(queries)
    out: dict[str, dict] = {}
    t_all = time.time()
    for name in names:
        spark.catalog.clearCache()
        row: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = queries[name](spark, args.sf_dir)
            scols = sorted(sdf.columns)
            sraw = sdf.collect()
            srows = sorted(
                tuple(_canon(r[c]) for c in scols) for r in sraw
            )
            row["spark_rows"] = len(srows)
            sql = oracles.get(name)
            if sql is None:
                # rows-only contract: >=0 rows, stable schema on re-run
                again = queries[name](spark, args.sf_dir)
                row.update(
                    rows_match=True,
                    schema_match=sdf.schema == again.schema,
                    hash_match=None,
                    oracle_rows=None,
                    mode="rows_only",
                )
            else:
                res = con.execute(sql)
                dcols = [d[0] for d in res.description]
                idx = [dcols.index(c) for c in sorted(dcols)]
                draw = res.fetchall()
                drows = sorted(
                    tuple(_canon(r[i]) for i in idx) for r in draw
                )
                # strict compare: full-precision repr + python type tag
                # per cell — r5's judge replay at full precision found
                # zero diffs; recording it per round makes latent
                # float/type drift visible the round it appears instead
                # of when a driver hash change exposes it.
                srows_f = sorted(
                    tuple(_forensic(r[c]) for c in scols) for r in sraw
                )
                drows_f = sorted(
                    tuple(_forensic(r[i]) for i in idx) for r in draw
                )
                row.update(
                    oracle_rows=len(drows),
                    rows_match=len(srows) == len(drows),
                    schema_match=scols == sorted(dcols),
                    hash_match=srows == drows,
                    strict_match=srows_f == drows_f,
                )
                if args.dump_dir:
                    _write_dump(
                        args.dump_dir, name, scols, srows_f,
                        sorted(dcols), drows_f, args.dump_limit,
                    )
        except Exception as e:  # record, keep going
            row["err"] = str(e)[:300]
        out[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"] in (True, None)
        print(json.dumps({"query": name, "ok": ok}), flush=True)

    path = REPO / (args.out or f"CORRECTNESS_FULL_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    n_ok = sum(
        1 for r in out.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"] in (True, None)
    )
    print(json.dumps({
        "total": len(out), "pass": n_ok, "fail": len(out) - n_ok,
        "sec": round(time.time() - t_all, 1), "artifact": str(path),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
