"""Every plan module must be importable DIRECTLY from a fresh process.

`import sow_pyspark_scripts_spark.plans.X` re-enters the registry's
import chain with X only partially initialized; any OTHER module that
imports X's symbols at import time then crashes with
"cannot import name ... from partially initialized module". The cure is
the leaf-module pattern (sql_common / pq_common hold every fragment
shared across plan modules); this test pins it for the modules with a
shared-fragment history, each in its own interpreter (sys.modules can't
be reset in-process).
"""

from __future__ import annotations

import subprocess
import sys

import pytest

# the modules whose symbols are (or were) imported by other plan modules
# — each one crashed a direct import at some point before the leaf
# refactor, or exports leaf fragments now
HISTORY = [
    "dedup_sim",
    "dsel_ops",
    "ann_index",
    "text_pipeline",
    "screening_ops",
    "stats_ops",
    "sql_common",
    "pq_common",
    "mlops_ops",
    "corpus_ops",
]


@pytest.mark.parametrize("mod", HISTORY)
def test_plan_module_imports_directly(mod):
    r = subprocess.run(
        [sys.executable, "-c", f"import sow_pyspark_scripts_spark.plans.{mod}"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert r.returncode == 0, r.stderr.strip().splitlines()[-3:]
