"""Landing-root trust model (VERDICT r7 hygiene): engine-managed on-disk
artifacts live under a verified per-user 0700 root; a squatted
deterministic name must never be read through; the bucketed attach gate
must reject a partially-deleted layout (ADVICE r7, medium)."""

import glob
import os
import stat

import pytest

from gps_stream_processing_spark import workdir


@pytest.fixture
def fresh_root(monkeypatch, tmp_path):
    """Point the deterministic root name into an isolated tempdir and
    clear the per-process cache, restoring it after the test."""
    monkeypatch.setattr(workdir.tempfile, "gettempdir", lambda: str(tmp_path))
    old = workdir._ROOT
    workdir._ROOT = None
    yield tmp_path
    workdir._ROOT = old


def test_session_root_private_and_stable(fresh_root):
    root = workdir.session_root()
    st = os.lstat(root)
    assert stat.S_ISDIR(st.st_mode)
    assert st.st_uid == os.getuid()
    assert (st.st_mode & 0o077) == 0, "group/other bits must be clear"
    # stable within the process, deterministic child naming
    assert workdir.session_root() == root
    d1 = workdir.land_dir("json", "/some/sf")
    assert d1 == workdir.land_dir("json", "/some/sf")
    assert d1.startswith(root + os.sep)
    assert workdir.land_dir("json", "/other/sf") != d1


def test_session_root_rejects_squatted_name(fresh_root):
    squat = fresh_root / f"gps_spark_work_{os.getuid()}"
    squat.mkdir(mode=0o777)
    os.chmod(squat, 0o777)  # umask-independent: explicitly loose
    root = workdir.session_root()
    assert root != str(squat), "must not reuse a world-writable squat"
    assert (os.lstat(root).st_mode & 0o077) == 0
    # and the fallback is cached — _SUCCESS-gated idempotence holds
    assert workdir.session_root() == root


def test_session_root_rejects_symlink(fresh_root):
    target = fresh_root / "elsewhere"
    target.mkdir(mode=0o700)
    os.symlink(target, fresh_root / f"gps_spark_work_{os.getuid()}")
    root = workdir.session_root()
    assert not os.path.islink(root)


def test_bucketed_attach_rejects_partial_layout(spark):
    """Deleting ONE bucket file (fingerprint intact) must force a
    re-land, not an attach over an incomplete layout that would
    silently drop that bucket's rows from every join."""
    from tests.conftest import SF_SMALL as SF

    from gps_stream_processing_spark.plans.relational import (
        bucketed_lineitem_orders,
    )
    import hashlib

    tag = hashlib.md5(SF.encode()).hexdigest()[:8]
    bucketed_lineitem_orders(spark, SF)
    li_dir = os.path.join(workdir.land_dir("bucketed", SF), "lineitem")
    parts = sorted(glob.glob(os.path.join(li_dir, "part-*")))
    assert len(parts) == 8, "one file per bucket by construction"
    src_rows = spark.read.parquet(os.path.join(SF, "lineitem.parquet")).count()
    # drop the catalog entry AND one data file; fingerprint stays
    spark.sql(f"DROP TABLE IF EXISTS bkt_lineitem_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS bkt_orders_{tag}")
    os.remove(parts[0])
    li, _ = bucketed_lineitem_orders(spark, SF)
    assert len(glob.glob(os.path.join(li_dir, "part-*"))) == 8
    assert li.count() == src_rows, "re-land restored the full table"
