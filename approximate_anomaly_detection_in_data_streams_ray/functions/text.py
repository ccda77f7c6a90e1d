"""Vectorized text analysis: tokens, quality, language-ID, fingerprints.

All hot paths are ``pyarrow.compute`` regex/string kernels over whole
columns — no Python loop touches row text except the (per-batch, numpy)
fingerprint/minhash paths.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9_]+"
# A BPE-ish pre-tokenizer split: words, numbers, or single non-space symbols.
BPEISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "una", "es", "para", "con", "por"],
}

_TOKEN_COMPILED = re.compile(TOKEN_RE)


def token_count(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """#tokens per row (word/number/underscore runs), C++ regex kernel."""
    return pc.count_substring_regex(col, TOKEN_RE)


def bpeish_token_count(col) -> pa.Array:
    return pc.count_substring_regex(col, BPEISH_RE)


def quality_features(col) -> dict[str, pa.Array]:
    """Length/punctuation/digit/whitespace profile per row — the engine's
    document quality score inputs."""
    n_chars = pc.utf8_length(col)
    n_tokens = pc.count_substring_regex(col, TOKEN_RE)
    n_punct = pc.count_substring_regex(col, r"[^\w\s]")
    n_digit = pc.count_substring_regex(col, r"[0-9]")
    n_space = pc.count_substring_regex(col, r"\s")
    n_lines = pc.add(pc.count_substring(col, "\n"), 1)
    safe = pc.max_element_wise(n_chars, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_lines": n_lines,
        "punct_ratio": pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(safe, pa.float64())),
        "digit_ratio": pc.divide(pc.cast(n_digit, pa.float64()), pc.cast(safe, pa.float64())),
        "space_ratio": pc.divide(pc.cast(n_space, pa.float64()), pc.cast(safe, pa.float64())),
    }


def quality_score(col) -> pa.Array:
    """Scalar quality in [0,1]: penalize extreme length, high punctuation,
    digit soup, and whitespace anomalies."""
    f = quality_features(col)
    n = pc.cast(f["n_chars"], pa.float64()).to_numpy(zero_copy_only=False)
    punct = f["punct_ratio"].to_numpy(zero_copy_only=False)
    digit = f["digit_ratio"].to_numpy(zero_copy_only=False)
    space = f["space_ratio"].to_numpy(zero_copy_only=False)
    len_score = np.clip(np.log1p(n) / np.log(5000.0), 0, 1)
    len_score = np.where(n > 200_000, 0.2, len_score)
    score = (
        0.4 * len_score
        + 0.2 * (1 - np.clip(punct / 0.5, 0, 1))
        + 0.2 * (1 - np.clip(digit / 0.5, 0, 1))
        + 0.2 * (1 - np.abs(np.clip(space, 0, 1) - 0.15) / 0.85)
    )
    return pa.array(np.nan_to_num(score, nan=0.0))


def language_id(col) -> pa.Array:
    """n-gram/stopword-heuristic language guess: argmax of per-language
    stopword hit counts (vectorized: one regex kernel per language)."""
    scores = []
    langs = list(_STOPWORDS)
    for lang in langs:
        pat = r"(?i)\b(" + "|".join(_STOPWORDS[lang]) + r")\b"
        counts = pc.fill_null(pc.count_substring_regex(col, pat), 0)
        scores.append(counts.to_numpy(zero_copy_only=False).astype(np.int64))
    m = np.stack(scores)  # (n_langs, n_rows)
    best = m.argmax(axis=0)
    hit = m.max(axis=0) > 0
    out = np.where(hit, np.array(langs, dtype=object)[best], "unknown")
    return pa.array(out.tolist(), pa.string())


def token_hashes(text: str) -> np.ndarray:
    """uint64 hashes of a single document's tokens (for SimHash).  Uses the
    vectorized process-stable hash so the batched SimHash path
    (:func:`..functions.sketches.simhash64_batch`) produces identical
    fingerprints."""
    from .hashing import stable_hash64

    toks = _TOKEN_COMPILED.findall(text or "")
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return stable_hash64(toks).astype(np.uint64)


def tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 token hashes, per-doc token counts) for a whole batch —
    ONE vectorized hash call over every token of every document."""
    from .hashing import stable_hash64

    toks_per_doc = [_TOKEN_COMPILED.findall(t or "") for t in texts]
    counts = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    flat = [tok for doc in toks_per_doc for tok in doc]
    if not flat:
        return np.empty(0, dtype=np.uint64), counts
    return stable_hash64(flat).astype(np.uint64), counts


def hash_bytes_u64(b: bytes) -> int:
    """FNV-1a 64 — tiny deterministic per-token hash."""
    h = 0xCBF29CE484222325
    for c in b:
        h ^= c
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def doc_fingerprint(text: str, n: int = 8) -> int:
    """Rolling-hash document fingerprint: min of the n-gram rolling hashes
    (winnowing-style single-value fingerprint, deterministic)."""
    from .sketches import char_shingle_hashes

    h = char_shingle_hashes(text or "", n=n)
    return int(h.min()) if len(h) else 0


def doc_fingerprints(texts, n: int = 8) -> np.ndarray:
    """Batched :func:`doc_fingerprint`: ONE vectorized rolling-hash pass
    over the concatenated (padded) byte buffer of the whole batch, per-doc
    min via a masked ``minimum.reduceat`` — no per-row Python in the hot
    loop.  Returns int64 values identical to the scalar function."""
    from .hashing import splitmix64

    if len(texts) == 0:
        return np.empty(0, dtype=np.int64)
    base = np.uint64(1099511628211)
    powers = base ** np.arange(n, dtype=np.uint64)
    out = np.empty(len(texts), dtype=np.uint64)
    CHUNK_BYTES = 2 << 20  # bound the (windows × n) uint64 intermediate
    i = 0
    while i < len(texts):
        bufs, lens, j = [], [], i
        total = 0
        while j < len(texts) and (total < CHUNK_BYTES or j == i):
            b = np.frombuffer((texts[j] or "").encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) < n:  # same space padding as char_shingle_hashes
                b = np.pad(b, (0, n - len(b)), constant_values=32)
            bufs.append(b)
            lens.append(len(b))
            total += len(b)
            j += 1
        buf = np.concatenate(bufs)
        lens = np.array(lens, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        win = np.lib.stride_tricks.sliding_window_view(buf, n).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64((win * powers).sum(axis=1, dtype=np.uint64))
        # windows crossing a document boundary are not that document's
        # shingles: mask them to MAX so the segment min ignores them
        valid_end = starts + lens - n  # last valid window index per doc
        mask = np.ones(len(h), dtype=bool)
        for s, e in zip(valid_end + 1, np.append(starts[1:], len(h))):
            mask[s:e] = False
        h[~mask] = np.iinfo(np.uint64).max
        out[i:j] = np.minimum.reduceat(h, starts)
        i = j
    return out.view(np.int64)


# ------------------------------------------------ fuzzy matching (edit dist)

_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(14695981039346656037)
_LEN_SALT = np.uint64(0x9E3779B97F4A7C15)


def _pad_rows(strs) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte matrix (n, Lmax) zero-padded + per-row byte lengths —
    built by ONE scatter from the concatenated buffer, no per-row loop."""
    enc = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    n, L = len(enc), int(lens.max()) if len(enc) else 0
    M = np.zeros((n, max(L, 1)), np.uint8)
    if lens.sum():
        flat = np.frombuffer(b"".join(enc), np.uint8)
        row = np.repeat(np.arange(n), lens)
        starts = np.cumsum(lens) - lens
        col = np.arange(len(flat)) - np.repeat(starts, lens)
        M[row, col] = flat
    return M, lens


def _poly_hash_rows(M: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a over each row's first ``lens`` bytes, vectorized over rows
    (the column loop is bounded by the max string length).  Length is
    folded in so a shorter variant can never alias a longer one."""
    h = np.full(M.shape[0], _FNV_BASIS, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(M.shape[1]):
            live = lens > k
            hk = (h ^ M[:, k].astype(np.uint64)) * _FNV_PRIME
            h = np.where(live, hk, h)
        return h ^ (lens.astype(np.uint64) * _LEN_SALT)


def levenshtein_batch(a_strs, b_strs) -> np.ndarray:
    """Exact Levenshtein distance for N pairs at once: ONE shared numpy
    DP — O(Lmax²) vectorized steps over all pairs instead of N Python
    DPs.  Byte-level (UTF-8), matching DuckDB's ``levenshtein``."""
    n = len(a_strs)
    if n == 0:
        return np.zeros(0, np.int64)
    Am, la = _pad_rows(a_strs)
    Bm, lb = _pad_rows(b_strs)
    La, Lb = Am.shape[1], Bm.shape[1]
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    res = lb.astype(np.int64).copy()          # rows with la == 0
    rows = np.arange(n)
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = (Am[:, i - 1:i] != Bm).astype(np.int32)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1])
        done = la == i
        if done.any():
            res[done] = cur[rows[done], lb[done]]
        prev = cur
    return res


def deletion_variant_hashes(strs, k: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """SymSpell-style blocking keys: the FNV hash of every ≤``k``-deletion
    variant of each string (k ≤ 2).  If ``lev(a, b) <= k`` then a and b
    share at least one common variant (delete, from each side, the bytes
    an optimal edit script touches — ≤ 1 per edit per side), so grouping
    by these hashes is a complete candidate generator for edit distance
    ≤ k.  Neighborhood size is O(L^k) per string — loops run over byte
    POSITIONS (≤ Lmax², tiny), every position vectorized over all rows.

    Returns (variant_hash, row_index) arrays, duplicates included."""
    if k > 2:
        raise ValueError("deletion_variant_hashes supports k <= 2")
    M, lens = _pad_rows(strs)
    n, L = M.shape
    hs = [_poly_hash_rows(M, lens)]
    idxs = [np.arange(n)]
    for i in range(L):                       # single deletions at byte i
        sel = i < lens                       # position i must exist
        if not sel.any():
            continue
        V = np.delete(M, i, axis=1)
        hs.append(_poly_hash_rows(V[sel], lens[sel] - 1))
        idxs.append(np.flatnonzero(sel))
    if k >= 2:
        for i in range(L):                   # double deletions at (i, j)
            for j in range(i + 1, L):
                sel = lens > j               # both positions must exist
                if not sel.any():
                    continue
                V = np.delete(M, (i, j), axis=1)
                hs.append(_poly_hash_rows(V[sel], lens[sel] - 2))
                idxs.append(np.flatnonzero(sel))
    return np.concatenate(hs), np.concatenate(idxs)
