"""Deterministic hash split/sample (stages/split.py): exact partition of
the bucket space, determinism across runs and batch sizes, approximate
fractions, key-consistency of sampling, and negative-key handling."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(n=20_000, seed=0):
    import ray.data as rd
    rng = np.random.RandomState(seed)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.rand(n))}))


def test_split_fractions_and_determinism(ray_session):
    from opencep_ray.stages.split import hash_split
    ds = _ds()
    out = hash_split(ds, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1},
                     salt=3).to_pandas()
    counts = out.split.value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.02
    assert abs(counts["val"] - 0.1) < 0.01
    assert abs(counts["test"] - 0.1) < 0.01
    # complete: every row assigned
    assert out.split.notna().all()
    # deterministic across runs and across different batch shapes
    again = hash_split(_ds().repartition(7), "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1},
                       salt=3).to_pandas()
    a = dict(zip(out.doc_id, out.split))
    b = dict(zip(again.doc_id, again.split))
    assert a == b
    # a different salt produces a different assignment
    other = hash_split(_ds(), "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1},
                       salt=4).to_pandas()
    assert dict(zip(other.doc_id, other.split)) != a


def test_split_thresholds_partition_exactly():
    from opencep_ray.stages.split import split_thresholds
    th = split_thresholds({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert th[0][1] == 0 and th[-1][2] == 1_000_000
    for (_, _, hi), (_, lo, _) in zip(th, th[1:]):
        assert hi == lo
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.2})


def test_sample_rate_and_key_consistency(ray_session):
    from opencep_ray.stages.split import bucket_of, hash_sample
    ds = _ds()
    kept = hash_sample(ds, "doc_id", 0.25, salt=1).to_pandas()
    assert abs(len(kept) / 20_000 - 0.25) < 0.02
    # membership is exactly the bucket predicate (pure function of key)
    expect = set(np.flatnonzero(
        bucket_of(np.arange(20_000, dtype=np.int64), 1) < 250_000))
    assert set(kept.doc_id) == expect


def test_string_keys_group_consistently(ray_session):
    """String keys: md5-based hashing, all rows of one key in one fold,
    and the value matches DuckDB's md5_number_lower (the oracle trust
    anchor)."""
    import duckdb
    import ray.data as rd
    from opencep_ray.stages.split import hash_split, keys_to_u64
    src = [f"domain-{i % 7}.example" for i in range(700)]
    t = pa.table({"doc_id": pa.array(range(700), pa.int64()),
                  "src": pa.array(src)})
    out = hash_split(rd.from_arrow(t), "src",
                     {"a": 0.5, "b": 0.5}, salt=0).to_pandas()
    folds = out.groupby("src").split.nunique()
    assert (folds == 1).all()          # leakage-free: one fold per key
    got = keys_to_u64(pa.array(["abc", "xyz"]))
    want = duckdb.connect().execute(
        "SELECT md5_number_lower('abc'), md5_number_lower('xyz')"
    ).fetchone()
    assert [int(x) for x in got] == [int(w) for w in want]


def test_stratified_sample_rates(ray_session):
    import ray.data as rd
    from opencep_ray.stages.split import stratified_sample
    rng = np.random.RandomState(1)
    t = pa.table({"doc_id": pa.array(range(6000), pa.int64()),
                  "lang": pa.array(rng.choice(["en", "de", "fr"], 6000))})
    out = stratified_sample(rd.from_arrow(t), "doc_id", "lang",
                            {"en": 0.2, "de": 1.0}, default_rate=0.5,
                            salt=2).to_pandas()
    orig = t.to_pandas().lang.value_counts()
    kept = out.lang.value_counts()
    assert abs(kept["en"] / orig["en"] - 0.2) < 0.04
    assert kept["de"] == orig["de"]                  # rate 1.0 keeps all
    assert abs(kept["fr"] / orig["fr"] - 0.5) < 0.04  # default rate
    # deterministic re-run
    again = stratified_sample(rd.from_arrow(t), "doc_id", "lang",
                              {"en": 0.2, "de": 1.0}, default_rate=0.5,
                              salt=2).to_pandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)


def test_negative_keys_wrap_consistently():
    from opencep_ray.stages.split import bucket_of
    neg = bucket_of(np.array([-1, -2, -3], dtype=np.int64), 0)
    # two's-complement view: -1 -> 2^64-1; stable and in range
    assert ((neg >= 0) & (neg < 1_000_000)).all()
    again = bucket_of(np.array([-1, -2, -3], dtype=np.int64), 0)
    assert (neg == again).all()


def test_md5_kernel_parity_with_hashlib():
    """The vectorized single-block MD5 kernel (round-4 VERDICT ask #5)
    must match hashlib byte-for-byte across lengths 0..120 (covering the
    ≤55-byte vectorized path, the one-block boundary, and the long-key
    hashlib fallback), unicode, and both string widths."""
    import hashlib
    import random
    import numpy as np
    import pyarrow as pa
    from opencep_ray.stages.split import _md5_upper_u64, keys_to_u64
    rng = random.Random(42)
    ss = ["", "a", "x" * 54, "x" * 55, "x" * 56, "x" * 64, "z" * 120,
          "héllo wörld", "中文键值"]
    ss += ["".join(rng.choice("abc defg.com/é9") for _ in
                   range(rng.randint(0, 90))) for _ in range(300)]
    exp = np.array([int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                                   "little") for s in ss], np.uint64)
    assert (_md5_upper_u64(pa.array(ss, pa.string())) == exp).all()
    assert (_md5_upper_u64(pa.array(ss, pa.large_string())) == exp).all()
    assert (keys_to_u64(pa.array([s.encode() for s in ss],
                                 pa.binary())) == exp).all()


def test_md5_kernel_sliced_array():
    """A SLICED arrow array (nonzero value-buffer base offset) must hash
    identically to the unsliced values — ADVICE r04 flagged the
    short.all() fast path assumed offsets[0] == 0."""
    import hashlib
    import numpy as np
    import pyarrow as pa
    from opencep_ray.stages.split import _md5_upper_u64
    ss = ["alpha", "bravo", "charlie", "x" * 80, "delta", "écho"]
    arr = pa.array(ss, pa.string())
    for lo, n in [(1, 4), (2, 3), (3, 3), (0, 6), (5, 1)]:
        sl = arr.slice(lo, n)
        exp = np.array([int.from_bytes(
            hashlib.md5(s.encode()).digest()[8:], "little")
            for s in ss[lo:lo + n]], np.uint64)
        assert (_md5_upper_u64(sl) == exp).all(), (lo, n)
        # large_string slices too (different offset width)
        sl2 = arr.cast(pa.large_string()).slice(lo, n)
        assert (_md5_upper_u64(sl2) == exp).all(), (lo, n)


def test_md5_first_be_slices_parity_with_hashlib():
    """`md5_first_be_u64_slices` (the Fingerprint gram-hash kernel) must
    equal int.from_bytes(md5(slice).digest()[:8], 'big') for arbitrary
    overlapping byte slices of one buffer, covering the ≤55-byte
    vectorized path and the long-slice hashlib fallback."""
    import hashlib
    import random
    import numpy as np
    from opencep_ray.stages.split import md5_first_be_u64_slices
    rng = random.Random(11)
    buf = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(4000)), np.uint8)
    starts, lens = [], []
    for _ in range(500):
        ln = rng.choice([0, 1, 5, 20, 54, 55, 56, 70, 120])
        starts.append(rng.randrange(0, len(buf) - 130))
        lens.append(ln)
    starts = np.array(starts, np.int64)
    lens = np.array(lens, np.int64)
    got = md5_first_be_u64_slices(buf, starts, lens)
    exp = np.array([int.from_bytes(
        hashlib.md5(buf[s:s + l].tobytes()).digest()[:8], "big")
        for s, l in zip(starts, lens)], np.uint64)
    assert (got == exp).all()


def test_stable_str_hash_semantics():
    """`stable_str_hash_u64` invariants: deterministic, slice/chunk
    invariant, word-order sensitive, length-aware (zero-pad vs real NUL),
    null != empty, no collisions on a 200k random corpus."""
    import random
    import string
    import numpy as np
    import pyarrow as pa
    from opencep_ray.stages.split import stable_str_hash_u64
    ss = ["", "a", "ab", "abcdefgh", "abcdefghi", "x" * 100,
          "héllo wörld", "中文", None, "a\x00", "a"]
    h = stable_str_hash_u64(pa.array(ss, pa.string()))
    assert h[1] == h[10]           # same string, same hash
    assert h[0] != h[8] != 0       # null != empty
    assert h[9] != h[1]            # "a\0" != "a"
    a = stable_str_hash_u64(pa.array(["AAAAAAAABBBBBBBB",
                                      "BBBBBBBBAAAAAAAA"]))
    assert a[0] != a[1]            # word order matters
    arr = pa.array(ss, pa.string())
    assert (stable_str_hash_u64(arr.slice(2, 5)) == h[2:7]).all()
    ch = pa.chunked_array([ss[:5], ss[5:]], pa.string())
    assert (stable_str_hash_u64(ch) == h).all()
    assert stable_str_hash_u64(pa.array(["x"]), salt=1)[0] != \
        stable_str_hash_u64(pa.array(["x"]), salt=2)[0]
    rng = random.Random(1)
    big = list({"".join(rng.choices(string.printable,
                                    k=rng.randint(0, 60)))
                for _ in range(200000)})
    hb = stable_str_hash_u64(pa.array(big))
    assert len(np.unique(hb)) == len(big)


def test_stable_str_hash_pinned_values():
    """The digests are a STORAGE format (incremental dedup against a
    persisted digest table), so their exact values are pinned: any
    library upgrade or kernel edit that shifts them must fail loudly
    here (this is the guarantee polars' .hash(), which the digest dedup
    used to rely on, does not make — round-4 VERDICT 'what's wrong' #2)."""
    import numpy as np
    import pyarrow as pa
    from opencep_ray.stages.split import mix64, stable_str_hash_u64
    got = stable_str_hash_u64(
        pa.array(["", "a", "hello world", "x" * 100, "中文", None]))
    exp = np.array([18103133745651211640, 10697954623148952921,
                    15596796146387958372, 7679206015240453825,
                    14726915404035259469, 4660035904982865171],
                   np.uint64)
    assert (got == exp).all()
    assert int(stable_str_hash_u64(pa.array(["pinned"]),
                                   salt=42)[0]) == 15318593198004348896
    # the exact turn-hash composition conversation_digest_ids stores
    h = mix64(stable_str_hash_u64(pa.array(["hi there"]))
              ^ mix64(np.array([1], np.uint64), salt=13), salt=7)
    assert int(h[0]) == 18339247997605315489
