"""Round-10 hardening tests (round-9 ADVICE items).

1. ``_shared_persist`` LogicalRDD-leaf guard — the bench loop deep-frees
   every result's LogicalRDD leaves between reps
   (``free_local_checkpoint(df, deep=True)``, bench.py). That is safe
   ONLY while the shared memo relations bottom out in parquet scans; a
   memo built on a ``localCheckpoint`` would have its blocks freed while
   the memo still hands out the handle, and the truncated lineage could
   never recompute them. The guard makes that contract loud at build
   time (ADVICE low, bench.py:97).

2. ``tools/rocksdb_probe.py`` summary ratio floors its denominator so a
   sub-10ms hdfs pass (rounds to 0.0) cannot ZeroDivisionError away the
   summary (ADVICE low, rocksdb_probe.py:79).

The medium ADVICE item (interrupted merge-swap recovery) is pinned in
``tests/test_models.py::test_interrupted_swap_recovers_old_table``.
"""
import pytest

from data_engineering_projects_spark.contract.extensions import (
    _shared_persist, clear_shared_persisted)


def test_shared_persist_accepts_scan_rooted_plan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10).write.parquet(p)
    df = _shared_persist(spark, str(tmp_path), "ok_tag",
                         lambda: spark.read.parquet(p))
    assert df.count() == 10
    # memo returns the SAME handle on the second call
    again = _shared_persist(spark, str(tmp_path), "ok_tag",
                            lambda: spark.read.parquet(p))
    assert again is df
    clear_shared_persisted()


def test_shared_persist_rejects_localcheckpoint_root(spark, tmp_path):
    """A localCheckpoint-rooted build must trip the guard: its plan is a
    LogicalRDD leaf whose blocks the bench deep-free would release out
    from under the memo."""
    def build():
        return spark.range(5).localCheckpoint(eager=True)
    with pytest.raises(AssertionError, match="LogicalRDD"):
        _shared_persist(spark, str(tmp_path), "bad_tag", build)
    clear_shared_persisted()


def test_rocksdb_probe_ratio_floors_denominator():
    """Mirror of the probe's summary arithmetic: a 0.0-rounded hdfs
    sample must yield a finite ratio, not ZeroDivisionError."""
    hdfs_sec, rocksdb_sec = 0.0, 0.42
    ratio = round(rocksdb_sec / max(hdfs_sec, 0.01), 2)
    assert ratio == 42.0
