"""Benchmark decontamination — flag training documents that contain any
snippet from a benchmark/eval set (verbatim-overlap decontamination, the
pass every pre-training pipeline runs so eval data never leaks into
training data; cf. GPT-3 §C / PaLM §8 n-gram overlap filters).

Shape: the benchmark side is SMALL (a fixed eval suite) and the corpus side
is 100 TB — so the snippet set is broadcast once (``ray.put``, read per
worker) and each corpus batch is scanned in one vectorized pass whose cost
is **independent of the snippet count**:

1. group snippets by byte length L; per L, hash every L-byte window of the
   batch's concatenated UTF-8 buffer with a polynomial rolling hash over
   Z/2^64 (Rabin–Karp multi-pattern scheme, vectorized: base B odd ⇒
   invertible mod 2^64; position factors cancelled with one
   cumulative-product pass of B^-1 — two cumsum/cumprod passes total,
   O(bytes), no per-snippet work);
2. ``np.isin`` against the sorted snippet-hash array → candidate positions
   (windows crossing row boundaries masked out);
3. exact byte-compare of the few candidates (hash collisions removed —
   output is exact, the hash is only a prefilter).

A byte-substring match of one well-formed UTF-8 string inside another
always aligns on character boundaries (UTF-8 is self-synchronizing), so
byte-window semantics equal the SQL oracle's character semantics
(``position(snippet IN text)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from europa_ray.functions.text import arrow_string_bytes

_U64 = np.uint64
_B = _U64(0x100000001B3)  # odd ⇒ invertible mod 2^64 (FNV prime)
_BINV = _U64(pow(0x100000001B3, -1, 1 << 64))

# benchmark-snippet derivation (deterministic, SQL-mirrored): every
# SNIPPET_EVERY-th doc with ≥ SNIPPET_MIN_CHARS chars contributes
# chars [SNIPPET_OFF, SNIPPET_OFF+SNIPPET_LEN) — substr(text, 41, 80)
SNIPPET_EVERY = 37
SNIPPET_OFF = 40
SNIPPET_LEN = 80
SNIPPET_MIN_CHARS = SNIPPET_OFF + SNIPPET_LEN


def _poly_hash(data: np.ndarray) -> np.uint64:
    """sum(data[j] * B^j) mod 2^64 — the position-normalized window hash."""
    if data.shape[0] == 0:
        return _U64(0)
    powers = np.empty(data.shape[0], dtype=_U64)
    powers[0] = _U64(1)
    if data.shape[0] > 1:
        np.multiply.accumulate(np.full(data.shape[0] - 1, _B, dtype=_U64),
                               out=powers[1:])
    return _U64(np.sum(data.astype(_U64) * powers, dtype=_U64))


def benchmark_snippets(
    files: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
    max_snippets: int = 5_000_000,
) -> pa.Table:
    """Derive the benchmark set from the corpus itself (deterministic — the
    sandbox has no external eval data): distinct snippets with their minimum
    source id. Gathered driver-side (it IS the broadcast small side);
    ``max_snippets`` guards the gather like every sibling driver gather."""
    import pyarrow.compute as pc

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        content = batch[content_col]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        sel = pc.and_(
            pa.array(ids.to_numpy() % SNIPPET_EVERY == 0),
            pc.and_(
                pc.is_valid(content),
                pc.greater_equal(
                    pc.fill_null(pc.utf8_length(content), 0), SNIPPET_MIN_CHARS
                ),
            ),
        )
        sub = batch.filter(sel)
        snip = pc.utf8_slice_codeunits(
            sub[content_col], SNIPPET_OFF, SNIPPET_OFF + SNIPPET_LEN
        )
        return pa.table({"src": sub[id_col], "snippet": snip})

    parts = list(
        files.map_batches(extract, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    t = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"src": pa.array([], pa.int64()),
                       "snippet": pa.array([], pa.string())})
    )
    if t.num_rows > max_snippets:
        raise ValueError(
            f"benchmark snippet set ({t.num_rows}) exceeds max_snippets "
            f"({max_snippets}); raise the budget or shard the benchmark"
        )
    # distinct snippet, minimum source id (SQL: GROUP BY snippet, min(src)).
    # Select aggregate outputs BY NAME — pyarrow's group_by column order
    # (keys-first vs aggregates-first) has differed across releases, so a
    # positional rename_columns would silently swap snippet/src.
    g = t.group_by("snippet").aggregate([("src", "min")])
    return pa.table({"snippet": g["snippet"], "src": g["src_min"]}).sort_by("src")


def _snippet_index(snippets: pa.Table):
    """Per-byte-length sorted hash arrays + raw bytes for exact verify."""
    by_len: dict[int, list[bytes]] = {}
    for s in snippets["snippet"].to_pylist():
        b = s.encode()
        by_len.setdefault(len(b), []).append(b)
    out = {}
    for L, blobs in by_len.items():
        hs = np.array(
            [_poly_hash(np.frombuffer(b, dtype=np.uint8)) for b in blobs],
            dtype=_U64,
        )
        order = np.argsort(hs)
        out[L] = (hs[order], [blobs[i] for i in order])
    return out


def _scan_batch(data: np.ndarray, offs: np.ndarray, index) -> tuple[np.ndarray, np.ndarray]:
    """(row, snippet_ordinal) hits of any snippet anywhere in any row —
    exact (hash candidates byte-verified), vectorized over the whole batch
    buffer. Snippet ordinals are offset per length group."""
    n = data.shape[0]
    rows_out, snips_out = [], []
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # shared position factors for every length group
    powers = np.empty(n + 1, dtype=_U64)
    powers[0] = _U64(1)
    np.multiply.accumulate(np.full(n, _B, dtype=_U64), out=powers[1:])
    inv = np.empty(n + 1, dtype=_U64)
    inv[0] = _U64(1)
    np.multiply.accumulate(np.full(n, _BINV, dtype=_U64), out=inv[1:])
    prefix = np.zeros(n + 1, dtype=_U64)
    np.cumsum(data.astype(_U64) * powers[:-1], dtype=_U64, out=prefix[1:])
    base_ord = 0
    for L, (hashes, blobs) in sorted(index.items()):
        if L == 0 or L > n:
            base_ord += len(blobs)
            continue
        # W[i] = (prefix[i+L] - prefix[i]) * B^-i  == poly_hash(window at i)
        w = (prefix[L:] - prefix[:-L]) * inv[: n - L + 1]
        # windows must lie inside one row: start row == row of (start+L-1)
        row = np.searchsorted(offs, np.arange(n - L + 1, dtype=np.int64),
                              side="right") - 1
        valid = (np.arange(n - L + 1, dtype=np.int64) + L) <= offs[row + 1]
        cand = np.flatnonzero(valid & np.isin(w, hashes))
        for i in cand:
            j = int(np.searchsorted(hashes, w[i]))
            while j < len(hashes) and hashes[j] == w[i]:
                if data[i : i + L].tobytes() == blobs[j]:
                    rows_out.append(int(row[i]))
                    snips_out.append(base_ord + j)
                j += 1
        base_ord += len(blobs)
    return (np.array(rows_out, dtype=np.int64), np.array(snips_out, dtype=np.int64))


_WORKER_IDX_CACHE: dict = {}  # per worker process: ref.hex() → snippet index


def decontam_stats(
    files: ray.data.Dataset,
    snippets: pa.Table,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> ray.data.Dataset:
    """Per-document count of DISTINCT benchmark snippets contained (docs
    with ≥ 1 hit). The snippet index is broadcast once and built once per
    worker PROCESS — the cache must be module-level (keyed by the object
    ref), not a closure dict: Ray deserializes the task closure per task,
    so closure state would silently rebuild the index per batch."""
    ref = ray.put(snippets)

    def scan(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        idx = _WORKER_IDX_CACHE.get(key)
        if idx is None:
            _WORKER_IDX_CACHE.clear()  # one benchmark set live per worker
            idx = _WORKER_IDX_CACHE[key] = _snippet_index(ray.get(ref))
        data, offs = arrow_string_bytes(batch[content_col])
        rows, snips = _scan_batch(data, offs, idx)
        if rows.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        uniq = np.unique(np.stack([rows, snips], axis=1), axis=0)
        hit_rows, counts = np.unique(uniq[:, 0], return_counts=True)
        ids = batch[id_col].to_numpy()
        return pa.table({id_col: pa.array(ids[hit_rows]),
                         "n_hits": pa.array(counts.astype(np.int64))})

    return files.map_batches(scan, batch_format="pyarrow")
