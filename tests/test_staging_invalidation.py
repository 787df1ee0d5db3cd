"""Staging-cache invalidation (VERDICT r2 #7, ADVICE r2): derived
artifacts staged under tempdir — the streaming sentinel copy and the
stored ANN index — are keyed by a CONTENT fingerprint of their source
parquet (names + sizes + mtimes), so regenerating a fixture can never
serve a stale staged copy. These tests regenerate a fixture copy in
tmp and assert the staging key moves.
"""

from __future__ import annotations

import os
import shutil
import time

from sow_pyspark_scripts_spark.plans.ann_index import _fingerprint, _index_dir

from .conftest import SF_DIR


def _copy_fixture(tmp_path, tables=("events", "embeddings")):
    sf = tmp_path / "sfcopy"
    sf.mkdir()
    for t in tables:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = sf / f"{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return str(sf)


def _touch_tree(path):
    """Simulate fixture regeneration: bump mtimes (and thereby the
    content fingerprint) of every file under the table path."""
    future = time.time() + 10
    if os.path.isdir(path):
        for p in os.listdir(path):
            os.utime(os.path.join(path, p), (future, future))
    else:
        os.utime(path, (future, future))


def test_ann_index_dir_moves_on_fixture_regeneration(tmp_path):
    sf = _copy_fixture(tmp_path)
    d1, f1 = _index_dir(sf), _fingerprint(sf)
    _touch_tree(os.path.join(sf, "embeddings.parquet"))
    d2, f2 = _index_dir(sf), _fingerprint(sf)
    assert f1 != f2
    assert d1 != d2  # a stale index built at f1 can never be read at f2


def test_stream_flush_staging_moves_on_fixture_regeneration(spark, tmp_path):
    from sow_pyspark_scripts_spark.plans.dsel_ops import _stream_events_flushed

    sf = _copy_fixture(tmp_path, tables=("events",))
    _stream_events_flushed(spark, sf)
    import tempfile

    base = "spark_stream_flush_" + sf.strip("/").replace("/", "_").replace(".", "_")
    tmp = tempfile.gettempdir()
    dirs1 = {d for d in os.listdir(tmp) if d.startswith(base + "_")}
    assert len(dirs1) == 1, dirs1

    _touch_tree(os.path.join(sf, "events.parquet"))
    _stream_events_flushed(spark, sf)
    dirs2 = {d for d in os.listdir(tmp) if d.startswith(base + "_")}
    # re-staged under the NEW fingerprint; the stale sibling was removed
    assert len(dirs2) == 1, dirs2
    assert dirs1 != dirs2
