"""Pins the synthetic transcript generator's output: the round-4
vectorization (Arrow C string kernels replacing np.char + .tolist(),
~60x on string construction; loop-free turn_idx ramp) must be
BIT-IDENTICAL to the original formatting — every oracle, driver row and
ref-conformance stream depends on these exact values."""

import hashlib

from opencep_ray.sources.transcripts import synth_transcripts

# md5 over the python-repr of every column of the canonical
# (300 convs, 20 avg turns, seed 42) table, computed from the ORIGINAL
# np.char implementation before the vectorization (verified equal via
# Table.equals on three shapes at the switch).
CANONICAL_ROWS = 5831
CANONICAL_MD5 = "45540b686518f4cd48bd85d32f0a1a09"


def test_canonical_table_pinned():
    t = synth_transcripts(300, 20, seed=42)
    assert t.num_rows == CANONICAL_ROWS
    h = hashlib.md5()
    for col in t.column_names:
        h.update(str(t[col].to_pylist()).encode())
    assert h.hexdigest() == CANONICAL_MD5


def test_schema_and_invariants():
    import numpy as np
    t = synth_transcripts(57, 9, seed=7)
    assert t.column_names == ["conv_id", "turn_idx", "role", "text",
                              "tool", "ts"]
    # ts non-decreasing within each conversation; turn_idx a 0..n ramp
    df = t.to_pandas()
    for _, g in df.groupby("conv_id"):
        assert (g["ts"].astype("int64").diff().dropna() >= 0).all()
        assert (g["turn_idx"].to_numpy()
                == np.arange(len(g), dtype=np.int32)).all()
    # tool set only on tool turns
    assert (df["tool"].notna() == (df["role"] == "tool")).all()


def test_sharded_writer_deterministic_and_unique(tmp_path, ray_session):
    """write_transcripts_sharded: same bytes whether shards run inline or
    as Ray tasks; globally unique conv_ids; canonical schema."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    from opencep_ray.sources.transcripts import (SCHEMA,
                                                 write_transcripts_sharded)

    def run(sub, force_inline):
        d = tmp_path / sub
        if force_inline:
            import ray
            import opencep_ray.sources.transcripts as tr
            real = ray.is_initialized
            ray.is_initialized = lambda: False
            try:
                n = write_transcripts_sharded(str(d), 250, avg_turns=6,
                                              seed=9, convs_per_shard=100,
                                              rows_per_file=300)
            finally:
                ray.is_initialized = real
        else:
            n = write_transcripts_sharded(str(d), 250, avg_turns=6, seed=9,
                                          convs_per_shard=100,
                                          rows_per_file=300)
        files = sorted(glob.glob(f"{d}/*.parquet"))
        h = hashlib.md5()
        tables = []
        for f in files:
            t = pq.read_table(f)
            tables.append(t)
            for col in t.column_names:
                h.update(str(t[col].to_pylist()).encode())
        return n, [f.rsplit("/", 1)[1] for f in files], h.hexdigest(), tables

    n1, names1, md51, tables1 = run("a", force_inline=True)
    n2, names2, md52, _ = run("b", force_inline=False)
    assert (n1, names1, md51) == (n2, names2, md52)

    import pyarrow as pa
    full = pa.concat_tables(tables1)
    assert full.num_rows == n1
    assert full.schema.equals(SCHEMA)
    convs = set(full["conv_id"].to_pylist())
    assert len(convs) == 250  # globally unique ids across 3 shards
    assert min(convs) == "c0000000" and max(convs) == "c0000249"


def test_conv_offset_shifts_ids_only():
    from opencep_ray.sources.transcripts import synth_transcripts
    base = synth_transcripts(40, 8, seed=5)
    off = synth_transcripts(40, 8, seed=5, conv_offset=1000)
    assert base.drop_columns(["conv_id"]).equals(off.drop_columns(["conv_id"]))
    assert off["conv_id"].to_pylist()[0] == "c0001000"


def test_synth_embeddings_schema_and_determinism(tmp_path):
    import numpy as np
    import pyarrow.parquet as pq
    from opencep_ray.sources.documents import (synth_embeddings,
                                               write_embeddings)
    a = synth_embeddings(200, dim=16, seed=5)
    b = synth_embeddings(200, dim=16, seed=5)
    assert a.equals(b)
    assert a.column_names == ["vec_id", "embedding", "label"]
    m = np.array(a["embedding"].to_pylist(), dtype=np.float32)
    assert m.shape == (200, 16)
    # clustered: same-label vectors are closer than cross-label ones
    lab = a["label"].to_numpy()
    mu = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = mu @ mu.T
    same = sim[lab[:, None] == lab[None, :]].mean()
    diff = sim[lab[:, None] != lab[None, :]].mean()
    assert same > diff + 0.3
    # sharded writer: globally unique ids, resume skips finished shards
    n = write_embeddings(str(tmp_path / "e"), 500, dim=16,
                         vecs_per_file=200)
    assert n == 500
    import glob
    files = sorted(glob.glob(f"{tmp_path}/e/*.parquet"))
    assert len(files) == 3
    ids = []
    for f in files:
        ids += pq.read_table(f, columns=["vec_id"])["vec_id"].to_pylist()
    assert sorted(ids) == list(range(500))


def test_synth_documents_planted_dup_contract():
    """Every planted exact duplicate is VERBATIM equal to its resolved
    source (the bug class: a source that is itself a planted copy used
    to be read pre-overwrite); near dups differ from their source in a
    small fraction of tokens."""
    import numpy as np
    from opencep_ray.sources.documents import synth_documents
    t = synth_documents(500, seed=7)
    texts = t["text"].to_pylist()
    i = np.arange(500)
    exact = (i % 25 == 24) & (i >= 24)
    near = (i % 17 == 16) & (i >= 16) & ~exact
    src = np.where(exact, i - 24, np.where(near, i - 16, i))
    while True:
        nxt = src[src]
        if (nxt == src).all():
            break
        src = nxt
    for d in i[exact]:
        assert texts[d] == texts[src[d]], (d, src[d])
    for d in i[near]:
        a, b = texts[d].split(), texts[src[d]].split()
        assert len(a) == len(b)
        frac = sum(x != y for x, y in zip(a, b)) / len(a)
        assert 0 < frac < 0.3, (d, src[d], frac)


def test_sharded_writer_param_guards(tmp_path):
    """The _COMPLETE marker carries generation params: matching params
    fast-path, mismatched params refuse loudly (no corpus mixing), and
    a per-shard _done with stale params regenerates the shard."""
    import glob
    import pytest
    from opencep_ray.sources.transcripts import write_transcripts_sharded
    d = str(tmp_path / "c")
    n1 = write_transcripts_sharded(d, 150, avg_turns=5, seed=3,
                                   convs_per_shard=100, rows_per_file=200)
    files1 = sorted(glob.glob(f"{d}/*.parquet"))
    # same params: fast return, nothing rewritten
    mtimes = {f: __import__("os").path.getmtime(f) for f in files1}
    assert write_transcripts_sharded(d, 150, avg_turns=5, seed=3,
                                     convs_per_shard=100,
                                     rows_per_file=200) == n1
    assert {f: __import__("os").path.getmtime(f)
            for f in files1} == mtimes
    # different params into the same dir: loud refusal
    with pytest.raises(ValueError, match="different parameters"):
        write_transcripts_sharded(d, 300, avg_turns=5, seed=3,
                                  convs_per_shard=100, rows_per_file=200)
