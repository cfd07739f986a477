"""Pluggable 64-bit fuzzy-signature registry (SURVEY.md §2.10, M6).

The reference swaps perceptual-hash algorithms via keyed DI — the hashing
algorithm is a constructor-selected strategy (``/root/reference/Api/
Program.cs:104-108``, ``Api/Implementations/SimilarImages/
ImageHashResolver.cs:15-20``: ``pHash`` / ``dHash`` / ``blockMeanHash``
resolved by name). The engine analog: a registry of 64-bit signature
algorithms over the per-row shingle/token hash stream, selected by
``EngineConfig.fuzzy_algo``. All registered algorithms share the contract:

    fingerprint(flat_hashes, row_offsets) -> (n_rows,) uint64

with Hamming distance as the similarity metric (threshold rule
``Hamming ≤ degree`` ⇔ score ≥ hashSize − degree − 1,
``Api/Client/QdrantRepository.cs:192``), so the SimHash pass machinery
(piece banding + popcount verify) works unchanged for every algorithm.

Each registration declares whether the algorithm is ORDER-SENSITIVE.
Set-semantics algorithms (simhash) receive the sorted-unique shingle set;
order-sensitive algorithms (diffhash) receive the document-order shingle
stream — feeding a sorted stream to diffhash would make every long document
hash to all-ones (strictly increasing anchors) and short documents hash by
shingle count alone, collapsing the 64-bit pass.

Registered:

- ``simhash``: classic SimHash over the shingle multiset (pHash analog —
  dense transform of the whole content). Set semantics.
- ``diffhash``: order-sensitive difference hash (dHash analog): sample 65
  evenly-spaced anchors from the document-order SHINGLE stream,
  bit i = anchor[i] < anchor[i+1] — like dHash's adjacent-cell gradient
  signs, it encodes local structure and is robust to global perturbations
  that preserve local order.

Third-party algorithms register via :func:`register_signature`.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

_U64 = np.uint64

SignatureFn = Callable[[np.ndarray, np.ndarray], np.ndarray]

_REGISTRY: dict[str, tuple[SignatureFn, bool]] = {}


def register_signature(name: str, fn: SignatureFn, *, order_sensitive: bool = False) -> None:
    """Register a 64-bit signature algorithm (overwrites quietly, like keyed
    DI registration order in the reference).

    ``order_sensitive=True`` makes the signature stage feed the algorithm
    the document-order shingle stream instead of the sorted-unique shingle
    set (required by anchor/gradient-style algorithms like diffhash)."""
    _REGISTRY[name] = (fn, order_sensitive)


def get_signature(name: str) -> SignatureFn:
    try:
        return _REGISTRY[name][0]
    except KeyError:
        raise ValueError(
            f"unknown fuzzy signature algorithm {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def signature_order_sensitive(name: str) -> bool:
    """Whether ``name`` requires the document-order shingle stream."""
    try:
        return _REGISTRY[name][1]
    except KeyError:
        raise ValueError(
            f"unknown fuzzy signature algorithm {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_signatures() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def _simhash(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    from europa_ray.functions.sig import simhash_signatures

    return simhash_signatures(flat, offsets)


def diffhash_signatures(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """dHash-analog: 64 adjacent-anchor comparison bits per row.

    For each row, 65 anchors are sampled at evenly-spaced positions of the
    row's hash stream (with repetition when the row is shorter); bit i is
    ``anchor[i] < anchor[i+1]``. Fully vectorized across the batch: one
    (n_rows, 65) gather + one comparison. Rows with < 2 values hash to 0.

    ORDER-SENSITIVE: the input must be the document-order shingle stream
    (registered with ``order_sensitive=True``); a sorted stream degenerates
    to all-ones / count-only hashes.
    """
    n_rows = offsets.shape[0] - 1
    out = np.zeros(n_rows, dtype=_U64)
    if n_rows == 0 or flat.shape[0] == 0:
        return out
    lens = np.diff(offsets)
    ok = lens >= 2
    if not ok.any():
        return out
    starts = offsets[:-1][ok].astype(np.int64)
    L = lens[ok].astype(np.int64)
    # anchor positions: floor(i * len / 65) for i in 0..64  (within-row)
    steps = np.arange(65, dtype=np.int64)
    pos = starts[:, None] + (steps[None, :] * L[:, None]) // 65
    anchors = flat[pos]  # (m, 65) gather
    bits = anchors[:, :-1] < anchors[:, 1:]  # (m, 64)
    shifts = np.arange(64, dtype=_U64)
    out[ok] = (bits.astype(_U64) << shifts[None, :]).sum(axis=1, dtype=_U64)
    return out


register_signature("simhash", _simhash)
register_signature("diffhash", diffhash_signatures, order_sensitive=True)
