"""The driver contract (__spark_entry__.py) must work from ANY cwd:
the driver may `sys.path.insert` the repo and run from elsewhere, and
Python WORKER processes don't inherit the driver's sys.path — a kernel
closure that references a package module by import REFERENCE crashes
worker-side with ModuleNotFoundError even though everything passed when
tests ran from /root/repo (workers there can import via cwd).

functions/gridnp registers itself for cloudpickle pickle-by-value so
its functions ship INSIDE the closure. This test pins that contract by
running a gridnp-backed kernel query from /tmp in a fresh interpreter
whose workers cannot import the package.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as em
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
# exercises guarded_pair_sims (functions/gridnp) inside applyInPandas
n = em.queries()["dedup_semantic_semdedup"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("OK", n)
"""


def test_gridnp_kernel_runs_without_package_on_worker_path():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd="/tmp",  # workers inherit this cwd: package NOT importable
        timeout=300,
    )
    assert r.returncode == 0, r.stderr.strip().splitlines()[-5:]
    assert "OK" in r.stdout
