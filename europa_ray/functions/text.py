"""Tokenization + shingling — the engine's "content normalization" stage.

This is the analog of Europa's thumbnail-normalization step
(``/root/reference/Api/Implementations/SimilarImages/ImageProcessors/
MagicScalerImageProcessor.cs:50-98``): reduce each artifact to a canonical
small representation before signatures. For source code that is a token
stream → k-gram shingle hash set.

Everything here is batch-vectorized: the only Python-level per-row work is a
compiled-regex ``findall`` (C speed); token hashing uses
``pandas.util.hash_array`` and shingle construction is a flat polynomial
rolling combine with row boundaries handled by masking — no Python loop over
tokens or shingles.
"""

from __future__ import annotations

import itertools
import re

import numpy as np

from europa_ray.util import HASH_KEY, hash_strings, mix64

# \w+ (identifier/number runs) or single non-word-non-space char (operators,
# punctuation). re.ASCII so semantics match RE2-based SQL oracles
# (DuckDB regexp_extract_all uses ASCII \w).
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.ASCII)

_U64 = np.uint64
# odd multiplier for the polynomial rolling combine (any odd constant works;
# the result is finalized through splitmix64)
_POLY = _U64(0x100000001B3)  # FNV-64 prime


def tokenize(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a batch of strings → (flat uint64 token hashes, row offsets).

    ``offsets`` has ``len(texts) + 1`` entries; row ``i``'s token hashes are
    ``flat[offsets[i]:offsets[i+1]]``.
    """
    toks_per_row = [TOKEN_RE.findall(t) if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in toks_per_row), dtype=np.int64, count=len(toks_per_row))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = list(itertools.chain.from_iterable(toks_per_row))
    return hash_strings(flat, seed_key=HASH_KEY), offsets


def token_counts(texts) -> np.ndarray:
    """Per-row token count under TOKEN_RE (vectorized oracle-checkable)."""
    return np.fromiter(
        (len(TOKEN_RE.findall(t)) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
    )


def _poly_combine(tok_hash: np.ndarray, k: int) -> np.ndarray:
    """Polynomial combine of every length-k window of a flat uint64 array.

    Returns one value per window start (``len - k + 1`` values), computed with
    k vectorized multiply-adds (k is small: 5 or 16) and a final splitmix64.
    """
    n = tok_hash.shape[0]
    m = n - k + 1
    if m <= 0:
        return np.empty(0, dtype=_U64)
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=_U64)
        for j in range(k):
            acc = acc * _POLY + tok_hash[j : m + j]
    return mix64(acc, seed=k)


def shingles(
    tok_hash: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle hashes per row, fully vectorized across the batch.

    Windows are computed over the *flat* token-hash array, then windows that
    cross a row boundary are masked out. Rows shorter than ``k`` (but
    non-empty) contribute a single whole-row shingle — the fallback for
    1-token files (FIXTURES.md §1 edge rows).

    Returns (flat shingle hashes, shingle offsets per row).
    """
    n_rows = offsets.shape[0] - 1
    n = tok_hash.shape[0]
    win = _poly_combine(tok_hash, k)  # one per flat window start
    m = win.shape[0]

    row_lens = np.diff(offsets)
    # number of shingles per row: len-k+1 if len>=k, 1 if 0<len<k, 0 if empty
    per_row = np.where(row_lens >= k, row_lens - k + 1, np.where(row_lens > 0, 1, 0))
    sh_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(per_row, out=sh_offsets[1:])

    out = np.empty(sh_offsets[-1], dtype=_U64)

    if m > 0:
        # valid window starts: start in [offsets[r], offsets[r+1]-k] for row r
        starts = np.arange(m, dtype=np.int64)
        row_of = np.searchsorted(offsets, starts, side="right") - 1
        valid = starts + k <= offsets[row_of + 1]
        long_rows = row_lens >= k
        # destinations: rows with len>=k take their windows in order
        if long_rows.any():
            vs = starts[valid]
            # position within row + row's output offset
            vrow = row_of[valid]
            dest = sh_offsets[vrow] + (vs - offsets[vrow])
            out[dest] = win[vs]

    # short non-empty rows: one whole-row polynomial shingle each (rare path)
    short = np.nonzero((row_lens > 0) & (row_lens < k))[0]
    for r in short:
        seg = tok_hash[offsets[r] : offsets[r + 1]]
        with np.errstate(over="ignore"):
            acc = _U64(0)
            for v in seg:
                acc = acc * _POLY + v
        out[sh_offsets[r]] = mix64(np.array([acc], dtype=_U64), seed=int(len(seg)))[0]
    return out, sh_offsets


def truncate_rows(flat: np.ndarray, offsets: np.ndarray, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Clip every row segment to its first ``max_len`` elements (vectorized).

    Wide-row guard: a single multi-MB file otherwise becomes an end-of-stage
    straggler task. Mirrors the reference's partial-hash idea (signature from
    a bounded prefix, ``DuplicateByHashFinder.cs:42-44``).
    """
    lens = np.diff(offsets)
    if not (lens > max_len).any():
        return flat, offsets
    new_lens = np.minimum(lens, max_len)
    new_offsets = np.zeros_like(offsets)
    np.cumsum(new_lens, out=new_offsets[1:])
    idx = np.arange(flat.shape[0])
    row_of = np.searchsorted(offsets, idx, side="right") - 1
    keep = (idx - offsets[row_of]) < max_len
    return flat[keep], new_offsets


def unique_per_row(
    flat: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate values within each row segment (shingle *sets*, not bags).

    Vectorized: sort each segment (via a composite key of row index and
    value), then drop adjacent duplicates within rows.
    """
    n_rows = offsets.shape[0] - 1
    n = flat.shape[0]
    if n == 0:
        return flat, offsets.copy()
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((flat, row_of))
    sf = flat[order]
    sr = row_of[order]
    keep = np.ones(n, dtype=bool)
    keep[1:] = (sf[1:] != sf[:-1]) | (sr[1:] != sr[:-1])
    uf = sf[keep]
    ur = sr[keep]
    new_counts = np.bincount(ur, minlength=n_rows)
    new_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    return uf, new_offsets
