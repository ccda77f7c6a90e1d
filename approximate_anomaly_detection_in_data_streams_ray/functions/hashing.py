"""Deterministic, process-stable hashing kernels.

Python's builtin ``hash`` is salted per process and MUST NOT be used in any
distributed stage (workers would disagree).  Everything here is stable
across processes and runs:

* :func:`stable_hash64` — vectorized 64-bit hash for partitioning /
  sketches; a polynomial rolling hash evaluated straight off the Arrow
  string buffer (prefix sums of byte·m⁻ⁱ, then one splitmix64 finalize),
  so hashing N strings is ~6 numpy passes over the concatenated bytes
  instead of a per-element SipHash loop;
* :func:`sha256_hex` / :func:`md5_hex` — cryptographic digests; sha256 is
  the end-to-end content invariant required by BASELINE.json, md5 matches
  DuckDB's ``md5()`` so dedup keys can be oracle-checked in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


# polynomial-hash constants: odd multiplier (invertible mod 2^64) and its
# modular inverse; per-seed additive tweak derived below
_POLY_M = np.uint64(0x9E3779B97F4A7C15 | 1)
_POLY_MINV = np.uint64(pow(int(_POLY_M), -1, 1 << 64))
# bound the working set of the vectorized pass: ~1 MB of string bytes per
# chunk keeps the uint64 temporaries (~8 arrays x 8 B/byte) under ~64 MB —
# small enough to stay cache/allocator-resident; the per-chunk numpy call
# overhead is noise at this size, and smaller first-touch allocations are
# far less exposed to host page-fault stalls
_POLY_CHUNK_BYTES = 1 << 20
_POLY_POWERS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _poly_powers(nbytes: int) -> tuple[np.ndarray, np.ndarray]:
    """(m^i, m^-i) for i < nbytes — data-independent, cached per process up
    to the chunk cap so the two cumprods are paid once, not per call."""
    cap = max(nbytes, min(_POLY_CHUNK_BYTES, 1 << 20))
    cached = _POLY_POWERS.get(0)
    if cached is None or len(cached[0]) < cap:
        with np.errstate(over="ignore"):
            w = np.full(cap, _POLY_M, dtype=np.uint64)
            w[0] = np.uint64(1)
            np.multiply.accumulate(w, out=w)
            iw = np.full(cap, _POLY_MINV, dtype=np.uint64)
            iw[0] = np.uint64(1)
            np.multiply.accumulate(iw, out=iw)
        cached = (w, iw)
        _POLY_POWERS[0] = cached
    return cached[0][:nbytes], cached[1][:nbytes]


def _poly_hash_chunk(data: np.ndarray, offsets: np.ndarray, tweak: np.uint64) -> np.ndarray:
    """Vectorized variable-length polynomial hash.

    h_j = Σ_i  byte_i · m^(end_j-1-i)  (mod 2^64) for i in [start_j, end_j)
        = m^(end_j-1) · (C[end_j] − C[start_j]),  C = cumsum(byte_i · m⁻ⁱ)

    uint64 arithmetic wraps mod 2^64, where the odd multiplier is
    invertible, so prefix sums of inverse-power-weighted bytes turn every
    per-string loop into whole-buffer numpy passes."""
    n = len(offsets) - 1
    base = offsets[0]
    local = (offsets - base).astype(np.int64)
    nbytes = int(local[-1])
    with np.errstate(over="ignore"):
        if nbytes == 0:
            h = np.zeros(n, dtype=np.uint64)
        else:
            w, iw = _poly_powers(nbytes)                # m^i, m^-i (cached)
            t = data.astype(np.uint64)
            t += np.uint64(1)                           # avoid 0-byte = no-op
            t *= iw
            c = np.concatenate(([np.uint64(0)], np.cumsum(t, dtype=np.uint64)))
            ends = local[1:]
            h = (c[ends] - c[local[:-1]]) * w[np.maximum(ends - 1, 0)]
        lens = (local[1:] - local[:-1]).astype(np.uint64)
        h ^= lens * np.uint64(0xBF58476D1CE4E5B9)
        h += tweak
    return splitmix64(h)


def _seed_tweak(seed: str) -> np.uint64:
    return np.uint64(
        int.from_bytes(hashlib.sha256(seed.encode()).digest()[:8], "little")
    )


def stable_hash64(values, seed: str = "aads") -> np.ndarray:
    """uint64 hash of a string/int array; deterministic across processes.

    Strings hash zero-copy off the Arrow buffer (offsets + UTF-8 data);
    integers go straight through splitmix64.  NOT a cryptographic hash —
    partitioning, sketches and shingle fingerprints only."""
    tweak = _seed_tweak(seed)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, np.ndarray) and np.issubdtype(values.dtype, np.integer):
        with np.errstate(over="ignore"):
            return splitmix64(values.astype(np.uint64) + tweak)
    if not isinstance(values, pa.Array):
        values = pa.array(pd.Series(values))
    if pa.types.is_integer(values.type):
        arr = values.to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            return splitmix64(np.nan_to_num(arr).astype(np.uint64) + tweak)
    if not (pa.types.is_string(values.type) or pa.types.is_large_string(values.type)):
        values = values.cast(pa.string())
    if values.null_count:
        import pyarrow.compute as pc

        values = pc.fill_null(values, "")
    off_dtype = np.int64 if pa.types.is_large_string(values.type) else np.int32
    bufs = values.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(values) + 1,
                            offset=values.offset * np.dtype(off_dtype).itemsize)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    n = len(values)
    out = np.empty(n, dtype=np.uint64)
    start = 0
    while start < n:
        # advance until the chunk's byte span exceeds the cap (always ≥1 row)
        stop = int(np.searchsorted(offsets, int(offsets[start]) + _POLY_CHUNK_BYTES,
                                   side="right"))
        stop = max(start + 1, min(stop, n))
        seg = offsets[start:stop + 1]
        out[start:stop] = _poly_hash_chunk(
            data[int(seg[0]):int(seg[-1])], seg, tweak)
        start = stop
    return out


def sha256_hex(values) -> list[str]:
    """Hex sha256 per element.  hashlib releases the GIL on large inputs and
    the loop is per-batch inside a Ray task — acceptable; heavy pipelines
    should prefer :func:`sha256_hex_arrow` (DuckDB's C++ kernel)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    return [hashlib.sha256((v or "").encode()).hexdigest() for v in values]


_DUCK = None


def _duck():
    global _DUCK
    if _DUCK is None:
        import duckdb

        _DUCK = duckdb.connect()
        # one thread per connection: this runs inside 1-CPU Ray workers, and
        # DuckDB's default thread pool (one per hardware core) oversubscribes
        # catastrophically when dozens of actors each spin one up
        _DUCK.execute("SET threads=1")
    return _DUCK


def sha256_hex_arrow(table: pa.Table, col: str, out: str = "sha256") -> pa.Table:
    """Append a sha256-hex column.  Hashes straight off the Arrow string
    buffer (offsets + UTF-8 data, zero-copy memoryview slices into OpenSSL's
    SHA-NI path) — ~2.3× the throughput of DuckDB's sha256() kernel and no
    per-batch query-planning overhead."""
    import pyarrow.compute as pc

    arr = table[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type) or pa.types.is_string(arr.type):
        off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1,
                                offset=arr.offset * np.dtype(off_dtype).itemsize)
        data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
        sha = hashlib.sha256
        hexes = [sha(data[offsets[i]:offsets[i + 1]]).hexdigest()
                 for i in range(len(arr))]
    else:
        hexes = sha256_hex(arr)
    return table.append_column(out, pa.array(hexes, pa.string()))


def md5_hex_arrow(table: pa.Table, col: str, out: str = "md5") -> pa.Table:
    con = _duck()
    con.register("_t", table)
    res = con.execute(f'SELECT md5("{col}") AS h FROM _t').arrow()
    con.unregister("_t")
    return table.append_column(out, res["h"].combine_chunks().cast(pa.string()))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — cheap derived hash families."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (np.bitwise_count on numpy>=2, byte-LUT
    otherwise) — the Hamming-distance kernel for SimHash dedup."""
    x = np.ascontiguousarray(x.astype(np.uint64, copy=False))
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)
