"""Deterministic hash-based dataset splitting and sampling.

The standard way to carve train/val/test out of a 100 TB corpus is NOT
random sampling — it's a pure function of a stable key, so that

* every worker makes the same decision without coordination or RNG
  state (embarrassingly parallel inside ``map_batches``);
* re-runs, resumed runs and incremental refreshes assign every document
  to the SAME split (no leakage when the corpus grows);
* downstream joins can recompute membership instead of shipping it.

The hash is a splitmix64-style finalizer over the key (two wrapping
uint64 multiplies + xor-shifts), reduced to a bucket in [0, 1e6); split
thresholds are INTEGER cumulative fractions of 1e6, so assignment is
exact integer arithmetic end-to-end — bit-reproducible in numpy
(wrapping uint64) and in the DuckDB oracle (128-bit modular arithmetic
with a 32-bit-split multiply; see ``SPLIT_ASSIGN_SQL`` in
pipelines/queries.py).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_BUCKETS = 1_000_000


# MD5 single-block constants (RFC 1321): K[i] = floor(|sin(i+1)| * 2^32),
# per-round left-rotate amounts, and the message-word schedule g(i).
_MD5_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * 2.0 ** 32) \
    .astype(np.uint32)
_MD5_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
                  + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, np.uint32)
_MD5_G = np.array([i for i in range(16)]
                  + [(5 * i + 1) % 16 for i in range(16, 32)]
                  + [(3 * i + 5) % 16 for i in range(32, 48)]
                  + [(7 * i) % 16 for i in range(48, 64)], np.intp)


def _md5_upper_u64_block(data: np.ndarray, lens: np.ndarray,
                         part: str = "upper") -> np.ndarray:
    """Vectorized single-block MD5 over an (n, 64) zero-padded uint8
    matrix of messages with byte lengths ``lens`` (all ≤ 55, so padding
    + the 8-byte bit-length trailer fit in one 512-bit block).  The 64
    MD5 rounds run as numpy uint32 column ops — no per-row Python.

    ``part="upper"`` returns ``int.from_bytes(digest[8:], "little")``
    per row, i.e. the upper half of the digest = C | (D << 32) in
    little-endian word order — exactly what DuckDB's
    ``md5_number_lower`` exposes.  ``part="first_be"`` returns
    ``int.from_bytes(digest[:8], "big")`` — the convention
    ``stages/text.py:stable_token_hash`` pinned for the winnowing
    fingerprint (= byteswap of A | (B << 32))."""
    n = len(lens)
    m = data.copy()
    m[np.arange(n), lens] = 0x80
    # 8-byte little-endian bit length at bytes 56..63
    bits = (lens.astype(np.uint64) * np.uint64(8))
    for b in range(8):
        m[:, 56 + b] = ((bits >> np.uint64(8 * b))
                        & np.uint64(0xFF)).astype(np.uint8)
    # transposed word table: W[g] is a contiguous row per schedule slot
    words = np.ascontiguousarray(
        np.ascontiguousarray(m).view("<u4").reshape(n, 16).T)
    a = np.full(n, 0x67452301, np.uint32)
    b = np.full(n, 0xEFCDAB89, np.uint32)
    c = np.full(n, 0x98BADCFE, np.uint32)
    d = np.full(n, 0x10325476, np.uint32)
    f = np.empty(n, np.uint32)
    with np.errstate(over="ignore"):
        for i in range(64):
            # allocation-free round: the nonlinear function via the
            # 3-op xor/and forms, then f += a + K[i] + W[g], then the
            # rotate-add written into the spent `a` buffer, which
            # becomes the new b in the register rotation
            if i < 16:           # F = d ^ (b & (c ^ d))
                np.bitwise_xor(c, d, out=f)
                np.bitwise_and(f, b, out=f)
                np.bitwise_xor(f, d, out=f)
            elif i < 32:         # G = c ^ (d & (b ^ c))
                np.bitwise_xor(b, c, out=f)
                np.bitwise_and(f, d, out=f)
                np.bitwise_xor(f, c, out=f)
            elif i < 48:         # H = b ^ c ^ d
                np.bitwise_xor(b, c, out=f)
                np.bitwise_xor(f, d, out=f)
            else:                # I = c ^ (b | ~d)
                np.invert(d, out=f)
                np.bitwise_or(f, b, out=f)
                np.bitwise_xor(f, c, out=f)
            f += a
            f += _MD5_K[i]
            f += words[_MD5_G[i]]
            s = int(_MD5_S[i])
            np.left_shift(f, np.uint32(s), out=a)
            np.right_shift(f, np.uint32(32 - s), out=f)
            np.bitwise_or(a, f, out=a)
            a += b
            a, b, c, d = d, a, b, c
        if part == "first_be":
            a += np.uint32(0x67452301)
            b += np.uint32(0xEFCDAB89)
            return (a.astype(np.uint64)
                    | (b.astype(np.uint64) << np.uint64(32))).byteswap()
        c += np.uint32(0x98BADCFE)
        d += np.uint32(0x10325476)
    return c.astype(np.uint64) | (d.astype(np.uint64) << np.uint64(32))


def _md5_upper_u64(arr: pa.Array) -> np.ndarray:
    """Upper-digest-half md5 of a string/binary arrow array: vectorized
    single-block path for keys ≤ 55 bytes (the overwhelming case for
    split keys — domains, doc ids), per-row hashlib fallback for the
    rest.  Parity with hashlib/DuckDB is pinned in tests/test_split.py."""
    import hashlib
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_string() if pa.types.is_string(arr.type)
                       else pa.large_binary())
    offsets = np.frombuffer(arr.buffers()[1], np.int64,
                            count=len(arr) + 1, offset=8 * arr.offset)
    values = np.frombuffer(arr.buffers()[2], np.uint8,
                           count=int(offsets[-1]))
    if offsets[0]:
        # sliced array: rebase so the short.all() fast path's
        # contiguous-values assumption holds (zero-copy views)
        values = values[int(offsets[0]):]
        offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    out = np.empty(len(arr), np.uint64)
    short = lens <= 55
    if short.any():
        n_s = int(short.sum())
        data = np.zeros((n_s, 64), np.uint8)
        s_lens = lens[short]
        mask = np.arange(64)[None, :] < s_lens[:, None]
        if short.all():
            data[mask] = values
        else:
            starts = offsets[:-1][short]
            flat = np.concatenate(
                [values[s:s + l] for s, l in zip(starts, s_lens)]) \
                if n_s else np.empty(0, np.uint8)
            data[mask] = flat
        # chunk so each round's working set stays cache-resident
        # (~1 MiB per uint32 buffer at 2^18 rows)
        step = 1 << 18
        res = np.empty(n_s, np.uint64)
        for lo in range(0, n_s, step):
            hi = min(lo + step, n_s)
            res[lo:hi] = _md5_upper_u64_block(data[lo:hi], s_lens[lo:hi])
        out[short] = res
    if not short.all():
        long_idx = np.flatnonzero(~short)
        for i in long_idx:
            s, e = int(offsets[i]), int(offsets[i + 1])
            out[i] = int.from_bytes(
                hashlib.md5(values[s:e].tobytes()).digest()[8:], "little")
    return out


def md5_first_be_u64_slices(values: np.ndarray, starts: np.ndarray,
                            lens: np.ndarray) -> np.ndarray:
    """``int.from_bytes(md5(x).digest()[:8], "big")`` for arbitrary byte
    SLICES ``values[starts[i] : starts[i]+lens[i]]`` of one uint8 buffer
    — the gather-then-single-block kernel that lets the winnowing
    fingerprint hash all of a batch's token k-grams without ever
    materializing the gram strings (k-grams of a space-tokenized text
    are substrings of the original buffer).  Slices ≤ 55 bytes take the
    vectorized path; longer ones fall back to per-row hashlib (rare for
    word-k-grams).  Parity with hashlib is pinned in tests."""
    import hashlib
    n = len(starts)
    out = np.empty(n, np.uint64)
    short = lens <= 55
    if short.any():
        s_starts = starts[short].astype(np.int64, copy=False)
        s_lens = lens[short].astype(np.int64, copy=False)
        n_s = len(s_starts)
        step = 1 << 18
        res = np.empty(n_s, np.uint64)
        # pad the source so a fixed 64-byte window starting at any
        # start index is in bounds; one 2-D fancy gather + mask beats
        # per-byte repeat/arange scatter indexing
        pad = np.zeros(len(values) + 64, np.uint8)
        pad[:len(values)] = values
        win = np.arange(64)
        for lo in range(0, n_s, step):
            hi = min(lo + step, n_s)
            st, ln = s_starts[lo:hi], s_lens[lo:hi]
            data = pad[st[:, None] + win]
            data[win >= ln[:, None]] = 0
            res[lo:hi] = _md5_upper_u64_block(data, ln, part="first_be")
        out[short] = res
    if not short.all():
        for i in np.flatnonzero(~short):
            s = int(starts[i])
            out[i] = int.from_bytes(
                hashlib.md5(values[s:s + int(lens[i])].tobytes())
                .digest()[:8], "big")
    return out


def keys_to_u64(col) -> np.ndarray:
    """uint64 view of a key column.  Integer keys reinterpret as
    two's-complement uint64 (free).  String/binary keys take the upper
    half of their md5 digest, little-endian — chosen because DuckDB's
    ``md5_number_lower(s)`` computes the identical value, so string
    splits stay bit-reproducible in the SQL oracle.  The md5 is a
    vectorized numpy single-block kernel (RFC 1321) for keys ≤ 55
    bytes — ~25-60 ns/row at 10⁷ keys (see BASELINE.md) — with a
    per-row hashlib fallback only for longer keys."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        if arr.null_count:
            raise ValueError("split key column contains nulls")
        return _md5_upper_u64(arr)
    return arr.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)


def mix64(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized splitmix64-style finalizer (wrapping uint64)."""
    with np.errstate(over="ignore"):
        h = keys.astype(np.uint64, copy=False) * _C1 + np.uint64(salt)
        h ^= h >> np.uint64(33)
        h = h * _C2
        h ^= h >> np.uint64(29)
    return h


_NULL_SENTINEL = np.uint64(0x6E756C6C5F736E74)  # "null_snt"


def stable_str_hash_u64(col, salt: int = 0) -> np.ndarray:
    """Version-stable vectorized 64-bit hash of arbitrary-length
    strings.  Each string's UTF-8 bytes are viewed as little-endian
    uint64 words (zero-padded tail), every word is mixed with its
    position via the splitmix64 finalizer, the mixes are XOR-folded per
    string, and the fold is finalized with the byte length.  Pure numpy
    with pinned constants — unlike polars' ``.hash()`` (whose value may
    change across polars versions), these digests are safe to STORE and
    compare across runs and environment upgrades (pinned-constant test
    in tests/test_split.py).  Collision probability is the usual
    ~n²/2⁻⁶⁴ birthday bound; position mixing makes permuted word orders
    distinct, and the length finalizer distinguishes zero-padded tails
    from real NUL bytes.  Nulls hash to a fixed sentinel distinct from
    the empty string."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.large_string())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], np.int64,
                            count=n + 1, offset=8 * arr.offset)
    values = np.frombuffer(arr.buffers()[2], np.uint8,
                           count=int(offsets[-1]))
    if offsets[0]:
        values = values[int(offsets[0]):]
        offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    if arr.null_count:
        lens = np.where(arr.is_null().to_numpy(zero_copy_only=False),
                        0, lens)
    starts = offsets[:-1]
    w = (lens + 7) >> 3                      # words per string
    cum = np.cumsum(w)
    total_w = int(cum[-1])
    fold = np.zeros(n, np.uint64)
    if total_w:
        # All words of one string share the alignment starts[i] & 7, so
        # eight passes (one per alignment) gather whole uint64 words
        # with a single 1-D fancy index each — no per-byte scatter.
        pad = np.zeros(((len(values) + 15) >> 3) << 3, np.uint8)
        pad[:len(values)] = values
        views = [pad[a:a + ((len(pad) - 8) & ~7)].view("<u8")
                 for a in range(8)]
        seg = np.repeat(np.arange(n), w)
        wpos = np.arange(total_w) - np.repeat(cum - w, w)
        words = np.empty(total_w, np.uint64)
        word0 = starts >> 3                  # word index in views[a]
        align = (starts & 7).astype(np.int8)
        align_w = align[seg]
        for a in range(8):
            sel = np.flatnonzero(align_w == a)
            if len(sel):
                words[sel] = views[a][word0[seg[sel]] + wpos[sel]]
        # zero the padding bytes of each string's last word
        rem = lens & 7
        tail = np.flatnonzero(rem[seg] != 0) if (rem != 0).any() else []
        if len(tail):
            last = tail[wpos[tail] == w[seg[tail]] - 1]
            mask = (np.uint64(1) << (np.uint64(8) *
                                     rem[seg[last]].astype(np.uint64))) \
                - np.uint64(1)
            words[last] &= mask
        mixed = mix64(words ^ mix64(wpos.astype(np.uint64) + np.uint64(1)))
        live = np.flatnonzero(w > 0)
        run_starts = (cum - w)[live]
        fold[live] = np.bitwise_xor.reduceat(mixed, run_starts)
    h = mix64(fold ^ lens.astype(np.uint64) ^ _C2, salt)
    if arr.null_count:
        h = np.where(arr.is_null().to_numpy(zero_copy_only=False),
                     mix64(np.full(n, _NULL_SENTINEL), salt), h)
    return h


def bucket_of(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic bucket in [0, 1e6) per key."""
    return (mix64(keys, salt) % np.uint64(_BUCKETS)).astype(np.int64)


def split_thresholds(fractions: Dict[str, float]) -> Sequence[tuple]:
    """[(name, lo, hi)] integer bucket ranges covering [0, 1e6).  The
    LAST split absorbs rounding slack so the ranges always partition the
    bucket space exactly."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, lo = [], 0
    names = list(fractions)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 \
            else lo + int(round(fractions[name] * _BUCKETS))
        out.append((name, lo, hi))
        lo = hi
    return out


class _AssignSplit:
    """map_batches stage: append a ``split`` string column."""

    def __init__(self, key_col: str, thresholds, salt: int):
        self.key_col = key_col
        self.thresholds = thresholds
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = bucket_of(keys_to_u64(batch[self.key_col]), self.salt)
        names = np.empty(len(b), dtype=object)
        for name, lo, hi in self.thresholds:
            names[(b >= lo) & (b < hi)] = name
        return batch.append_column("split", pa.array(names, pa.string()))


def hash_split(ds: Dataset, key_col: str,
               fractions: Dict[str, float], salt: int = 0) -> Dataset:
    """Appends a deterministic ``split`` column (e.g. ``{"train": 0.9,
    "val": 0.05, "test": 0.05}``).  Pure per-batch function of the key —
    no shuffle, no RNG, stable across re-runs and corpus growth."""
    return ds.map_batches(
        _AssignSplit, batch_format="pyarrow",
        fn_constructor_args=(key_col, split_thresholds(fractions), salt),
        concurrency=(1, 8))


def hash_sample(ds: Dataset, key_col: str, rate: float,
                salt: int = 0) -> Dataset:
    """Deterministic ~``rate`` sample: keeps rows whose bucket falls
    below ``round(rate * 1e6)``.  Unlike ``Dataset.random_sample`` this
    is reproducible, key-consistent (all rows of a key stay together)
    and needs no seed plumbing across workers."""
    cut = int(round(rate * _BUCKETS))

    class _Sample:
        def __init__(self, key_col=key_col, cut=cut, salt=salt):
            self.key_col, self.cut, self.salt = key_col, cut, salt

        def __call__(self, batch: pa.Table) -> pa.Table:
            b = bucket_of(keys_to_u64(batch[self.key_col]), self.salt)
            return batch.filter(pa.array(b < self.cut))

    return ds.map_batches(_Sample, batch_format="pyarrow",
                          concurrency=(1, 8))


def stratified_sample(ds: Dataset, key_col: str, strata_col: str,
                      rates: Dict[str, float], default_rate: float = 0.0,
                      salt: int = 0) -> Dataset:
    """Per-stratum deterministic sampling — the standard rebalancing
    move (downsample the dominant language/domain, keep the rest): a
    row survives iff ``bucket(key) < rates[stratum] * 1e6``.  Same
    bucket function as :func:`hash_split`, so sampling composes with
    splits without correlation (use a different salt).  Strata absent
    from ``rates`` get ``default_rate``.  Vectorized: one unique() over
    the batch's strata + one integer compare per row."""
    cuts_map = {s: int(round(r * _BUCKETS)) for s, r in rates.items()}
    default_cut = int(round(default_rate * _BUCKETS))

    class _Stratified:
        def __init__(self):
            self.__name__ = "StratifiedSample"

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            b = bucket_of(keys_to_u64(batch[key_col]), salt)
            strata = batch[strata_col].to_numpy(zero_copy_only=False)
            u, inv = np.unique(strata, return_inverse=True)
            cuts = np.array([cuts_map.get(s, default_cut) for s in u],
                            dtype=np.int64)[inv]
            return batch.filter(pa.array(b < cuts))

    return ds.map_batches(_Stratified, batch_format="pyarrow",
                          concurrency=(1, 8))
