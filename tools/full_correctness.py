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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated subset")
    args = ap.parse_args()

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
            srows = sorted(
                tuple(_canon(r[c]) for c in scols) for r in sdf.collect()
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
                drows = sorted(
                    tuple(_canon(r[i]) for i in idx) for r in res.fetchall()
                )
                row.update(
                    oracle_rows=len(drows),
                    rows_match=len(srows) == len(drows),
                    schema_match=scols == sorted(dcols),
                    hash_match=srows == drows,
                )
        except Exception as e:  # record, keep going
            row["err"] = str(e)[:300]
        out[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"] in (True, None)
        print(json.dumps({"query": name, "ok": ok}), flush=True)

    path = REPO / f"CORRECTNESS_FULL_r{args.round:02d}.json"
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
