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
