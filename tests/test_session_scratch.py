"""Fast-scratch routing (session.py round 13): the tmpfs preference is
guarded — no mount / no headroom degrades to the platform default, and
scratch_dir always yields a writable fresh dir either way."""

from __future__ import annotations

import os
import tempfile


def test_fast_local_dir_guard(monkeypatch):
    from data_engineering_projects_spark.session import _fast_local_dir

    # missing mount -> None (no exception)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/nonexistent-mount-xyz")
    assert _fast_local_dir() is None

    # a real dir with headroom -> a created subdir under it
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", tempfile.gettempdir())
    d = _fast_local_dir()
    if d is not None:  # None only if tmp itself lacks 16 GiB headroom
        assert os.path.isdir(d)
        assert d.startswith(tempfile.gettempdir())


def test_scratch_dir_always_writable(monkeypatch):
    from data_engineering_projects_spark.session import scratch_dir

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/nonexistent-mount-xyz")
    d = scratch_dir("depa_test_")
    try:
        assert os.path.isdir(d)
        with open(os.path.join(d, "probe"), "w") as f:
            f.write("x")
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)
