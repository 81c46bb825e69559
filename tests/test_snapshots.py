"""Snapshot lineage + time-travel decode: append-mode writes commit new
partitions under a new snapshot id; decode_dir(snapshot=K) reproduces the
table exactly as of write K."""

from __future__ import annotations

import pytest

from sparrow_ipc_spark.operators.decode_job import decode_dir, snapshots
from sparrow_ipc_spark.operators.encode_job import write_encoded
from sparrow_ipc_spark.sources.transcripts import transcripts_df


@pytest.fixture(scope="module")
def snap_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snap") / "enc")
    df0 = transcripts_df(spark, n_convs=30, seed=3).cache()
    df1 = transcripts_df(spark, n_convs=20, seed=11).cache()
    df2 = transcripts_df(spark, n_convs=10, seed=23).cache()
    s0 = write_encoded(spark, df0, out, n_parts=3)
    s1 = write_encoded(spark, df1, out, n_parts=3, append=True)
    s2 = write_encoded(spark, df2, out, n_parts=3, append=True)
    return out, (df0, df1, df2), (s0, s1, s2)


def test_snapshot_ids_monotonic(snap_dir):
    _, _, (s0, s1, s2) = snap_dir
    assert (s0["snapshot"], s1["snapshot"], s2["snapshot"]) == (0, 1, 2)


def test_snapshot_log(spark, snap_dir):
    out, (df0, df1, df2), _ = snap_dir
    log = {r["snapshot"]: r for r in snapshots(spark, out).collect()}
    assert sorted(log) == [0, 1, 2]
    assert log[0]["n_rows"] == df0.count()
    assert log[1]["n_rows"] == df1.count()
    assert log[2]["n_rows"] == df2.count()
    # append never reuses part ids
    all_parts = [p for r in log.values() for p in r["part_ids"]]
    assert len(all_parts) == len(set(all_parts))


def test_time_travel_decode(spark, snap_dir):
    out, (df0, df1, df2), _ = snap_dir
    as_of_0 = decode_dir(spark, out, snapshot=0)
    assert as_of_0.count() == df0.count()
    assert df0.exceptAll(as_of_0).count() == 0
    as_of_1 = decode_dir(spark, out, snapshot=1)
    assert as_of_1.count() == df0.count() + df1.count()
    full = decode_dir(spark, out)
    assert full.count() == df0.count() + df1.count() + df2.count()
    assert decode_dir(spark, out, snapshot=2).count() == full.count()


def test_resume_keeps_original_snapshot(spark, snap_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snap_resume") / "enc")
    df = transcripts_df(spark, n_convs=25, seed=5).cache()
    write_encoded(spark, df, out, n_parts=4)
    st = write_encoded(spark, df, out, n_parts=4, resume=True)
    assert st["skipped_parts"] == 4
    log = snapshots(spark, out).collect()
    # all parts were committed by snapshot 0; the no-op resume adds nothing
    assert [r["snapshot"] for r in log] == [0]
    assert decode_dir(spark, out, snapshot=0).count() == df.count()
