"""Resumable partitioned Parquet sink: round-trip, resume-after-failure
(finished partitions untouched, missing ones redone), and the P-mismatch
guard."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest


def _table(n=500, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table({
        "conv_id": pa.array(rng.randint(0, 80, n), pa.int64()),
        "ts": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"row {i}" for i in range(n)]),
    })


def _canon(df):
    return sorted(map(tuple, df[sorted(df.columns)].astype(str).values.tolist()))


def test_sink_round_trip(ray_session, tmp_path):
    import ray.data as rd
    from opencep_ray.stages.sink import (read_partitioned,
                                         resumable_write_parquet)
    root = str(tmp_path / "out")
    t = _table()
    stats = resumable_write_parquet(rd.from_arrow(t), root, "conv_id",
                                    num_partitions=8)
    assert stats["rows"].to_pylist() and sum(
        stats["rows"].to_pylist()) == t.num_rows
    back = read_partitioned(root).to_pandas()
    assert _canon(back) == _canon(t.to_pandas())
    # every written partition holds exactly its hash bucket
    from opencep_ray.stages.sink import partition_ids
    for i in stats["partition"].to_pylist():
        part = pa.parquet.read_table(f"{root}/part={i}/data.parquet")
        assert set(partition_ids(part["conv_id"], 8)) == {i}


def test_sink_resume_skips_finished_partitions(ray_session, tmp_path):
    import ray.data as rd
    from opencep_ray.stages.sink import (done_partitions, read_partitioned,
                                         resumable_write_parquet)
    root = str(tmp_path / "out")
    t = _table()
    first = resumable_write_parquet(rd.from_arrow(t), root, "conv_id",
                                    num_partitions=8)
    written = first["partition"].to_pylist()
    assert len(written) >= 3
    # simulate a crash: two partitions never finished
    lost = written[:2]
    for i in lost:
        shutil.rmtree(f"{root}/part={i}")
    survivors = {i: os.path.getmtime(f"{root}/part={i}/data.parquet")
                 for i in written[2:]}
    second = resumable_write_parquet(rd.from_arrow(t), root, "conv_id",
                                     num_partitions=8)
    assert sorted(second["partition"].to_pylist()) == sorted(lost)
    for i, mtime in survivors.items():   # finished partitions untouched
        assert os.path.getmtime(f"{root}/part={i}/data.parquet") == mtime
    assert done_partitions(root, 8) == frozenset(written)
    back = read_partitioned(root).to_pandas()
    assert _canon(back) == _canon(t.to_pandas())
    # fully-done rerun is a no-op with an empty stats table
    third = resumable_write_parquet(rd.from_arrow(t), root, "conv_id",
                                    num_partitions=8)
    assert third.num_rows == 0


def test_sink_missing_marker_means_redo(ray_session, tmp_path):
    """Data file present but no _SUCCESS (killed between rename and
    marker): the partition must be rewritten, not trusted."""
    import ray.data as rd
    from opencep_ray.stages.sink import resumable_write_parquet
    root = str(tmp_path / "out")
    t = _table()
    first = resumable_write_parquet(rd.from_arrow(t), root, "conv_id",
                                    num_partitions=8)
    victim = first["partition"].to_pylist()[0]
    os.remove(f"{root}/part={victim}/{'_SUCCESS'}")
    second = resumable_write_parquet(rd.from_arrow(t), root, "conv_id",
                                     num_partitions=8)
    assert second["partition"].to_pylist() == [victim]


def test_sink_meta_mismatch_raises(ray_session, tmp_path):
    import ray.data as rd
    from opencep_ray.stages.sink import resumable_write_parquet
    root = str(tmp_path / "out")
    resumable_write_parquet(rd.from_arrow(_table(50)), root, "conv_id",
                            num_partitions=8)
    with pytest.raises(ValueError, match="resume mismatch"):
        resumable_write_parquet(rd.from_arrow(_table(50)), root, "conv_id",
                                num_partitions=16)
    with pytest.raises(ValueError, match="resume mismatch"):
        resumable_write_parquet(rd.from_arrow(_table(50)), root, "ts",
                                num_partitions=8)
    meta = json.load(open(f"{root}/_meta.json"))
    assert meta == {"num_partitions": 8, "key_col": "conv_id"}
