"""KMV (bottom-k / K-Minimum-Values) distinct-counting sketch over the
corpus vocabulary — approximate COUNT(DISTINCT word) with a fixed-size,
mergeable, DETERMINISTIC summary (Bar-Yossef et al., RANDOM 2002; the
bottom-k form of Beyer et al., SIGMOD 2007).

Every distinct word hashes to ``u64(sha256(word)[:16])``; the sketch is the
k smallest distinct hash values corpus-wide. Because the hash is fixed and
the k-min set is a pure function of the input, the sketch (and the derived
estimator) is exactly reproducible — the DuckDB oracle computes the
identical rows, so this "approximate" operator is value-checked exactly.
The estimator is the classic ``(k−1) · 2^64 / h_k`` (h_k = k-th smallest),
evaluated in INTEGER floor arithmetic on both sides (no floats anywhere).

100-TB shape: this is the cheapest aggregation in the engine — one content
scan emits ≤ k rows per BLOCK (per-block distinct words → hash → k-min),
and the driver folds the block sketches with a running k-min merge in O(k)
memory; no shuffle of any kind, at any scale. The sketch doubles as a
bottom-k MinHash signature of the corpus vocabulary, so two corpora's
sketches also estimate vocabulary Jaccard (:func:`vocab_jaccard_kmv`).

Reference parity: the reference keeps per-file hash summaries in a
signature store (``/root/reference/Api/Implementations/Commons/
HashGenerator.cs``); this is the corpus-level summary analog (SURVEY §2
SF-family hashing re-used as a sketch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.util import sha256_hex_arrow

DEFAULT_K = 256

SKETCH_SCHEMA = pa.schema(
    [pa.field("rank", pa.int64()), pa.field("h", pa.string())]
)

ESTIMATE_SCHEMA = pa.schema(
    [pa.field("n_hashes", pa.int64()), pa.field("estimate", pa.int64())]
)


def _kmin_batch(batch: pa.Table, *, k: int, text_col: str) -> pa.Table:
    """k smallest word-hash prefixes of this block: distinct whitespace
    words → 16-hex sha256 prefix → sorted head. Fixed-width lowercase hex
    sorts exactly like the u64 it encodes, so string order IS hash order."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.filter(
        pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    )
    if len(col) == 0:
        return pa.table({"h": pa.array([], pa.string())})
    split = pc.split_pattern(col, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    words = pc.unique(split.flatten())
    words = words.filter(pc.greater(pc.utf8_length(words), 0))
    if len(words) == 0:
        return pa.table({"h": pa.array([], pa.string())})
    # S64 → S16 astype truncates to the leading 16 bytes (vectorized)
    h = np.asarray(sha256_hex_arrow(words), dtype="S64").astype("S16")
    h = np.unique(h)[:k]
    return pa.table({"h": pa.array(h.astype("U16").astype(object), pa.string())})


def _fold_kmin(
    parts: ray.data.Dataset, k: int
) -> np.ndarray:
    """Streaming k-min merge over the per-block sketches: O(k) memory on
    the driver regardless of corpus size (each block contributes ≤ k)."""
    running = np.empty(0, dtype="S16")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        if b.num_rows == 0:
            continue
        incoming = b["h"].to_numpy(zero_copy_only=False).astype("S16")
        running = np.unique(np.concatenate([running, incoming]))[:k]
    return running


def vocab_kmv_sketch(
    files: ray.data.Dataset, *, k: int = DEFAULT_K, text_col: str = "content"
) -> pa.Table:
    """The corpus vocabulary's bottom-k sketch: (rank, h) for the k
    smallest distinct 16-hex word-hash prefixes, hash-ordered."""
    parts = files.map_batches(
        _kmin_batch,
        fn_kwargs={"k": k, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=None,
    )
    h = _fold_kmin(parts, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, h.shape[0] + 1, dtype=np.int64)),
            "h": pa.array(h.astype("U16").astype(object), pa.string()),
        }
    )


def distinct_word_estimate(
    files: ray.data.Dataset, *, k: int = DEFAULT_K, text_col: str = "content"
) -> pa.Table:
    """One-row distinct-word estimate from the bottom-k sketch:
    (n_hashes, estimate). With fewer than k distinct hashes the sketch IS
    the exact count; at k the estimator is ``(k−1) · 2^64 // h_k`` in
    exact integer arithmetic (both sides; no floats)."""
    parts = files.map_batches(
        _kmin_batch,
        fn_kwargs={"k": k, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=None,
    )
    h = _fold_kmin(parts, k)
    n = int(h.shape[0])
    if n < k:
        est = n
    else:
        hk = int(h[-1].decode(), 16)
        est = ((k - 1) << 64) // hk if hk else n
    return pa.table(
        {
            "n_hashes": pa.array([n], pa.int64()),
            "estimate": pa.array([est], pa.int64()),
        }
    )


JACCARD_SCHEMA = pa.schema(
    [pa.field("k_union", pa.int64()), pa.field("n_common", pa.int64())]
)


def vocab_jaccard_kmv(
    files_a: ray.data.Dataset,
    files_b: ray.data.Dataset,
    *,
    k: int = DEFAULT_K,
    text_col: str = "content",
) -> pa.Table:
    """Two-corpus vocabulary resemblance from bottom-k sketches (Beyer et
    al., SIGMOD 2007 §4: J ≈ |KMV_k(A ∪ B) ∩ KMV(A) ∩ KMV(B)| / k' with
    k' = |KMV_k(A ∪ B)|): one row ``(k_union, n_common)`` — both integers,
    so the estimate ``n_common / k_union`` is value-checked exactly via its
    numerator and denominator (no floats on either side).

    Scale shape: two independent sketch passes (≤ k rows per block, O(k)
    driver folds) and an O(k) set intersection on the driver — the corpora
    are never co-shuffled or joined."""
    ska = _fold_kmin(
        files_a.map_batches(
            _kmin_batch,
            fn_kwargs={"k": k, "text_col": text_col},
            batch_format="pyarrow",
            batch_size=None,
        ),
        k,
    )
    skb = _fold_kmin(
        files_b.map_batches(
            _kmin_batch,
            fn_kwargs={"k": k, "text_col": text_col},
            batch_format="pyarrow",
            batch_size=None,
        ),
        k,
    )
    union = np.unique(np.concatenate([ska, skb]))[:k]
    common = np.intersect1d(
        union, np.intersect1d(ska, skb, assume_unique=True), assume_unique=True
    )
    return pa.table(
        {
            "k_union": pa.array([int(union.shape[0])], pa.int64()),
            "n_common": pa.array([int(common.shape[0])], pa.int64()),
        }
    )


# Count-Min row seeds: first uint64 hex digits of pi (nothing-up-my-sleeve
# constants), shared verbatim with the SQL oracle
CM_SEEDS = (0x243F6A8885A308D3, 0x13198A2E03707344, 0xA4093822299F31D0)
CM_WIDTH = 512

CM_SCHEMA = pa.schema(
    [
        pa.field("cm_row", pa.int64()),
        pa.field("bucket", pa.int64()),
        pa.field("c", pa.int64()),
    ]
)


def _cm_partial(
    batch: pa.Table, *, width: int, seeds: tuple, text_col: str
) -> pa.Table:
    """Per-block Count-Min partial: word OCCURRENCE counts hashed into a
    depth×width matrix (bucket = splitmix64(u64(sha256(word)[:16]) XOR
    seed_r) mod width), emitted as nonzero (cm_row, bucket, c) cells —
    ≤ depth·width rows per block regardless of block size."""
    from europa_ray.util import hex_to_u64, splitmix64

    empty = CM_SCHEMA.empty_table()
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.filter(
        pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    )
    if len(col) == 0:
        return empty
    split = pc.split_pattern(col, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.flatten()
    flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    if len(flat) == 0:
        return empty
    vc = pc.value_counts(flat)
    words, counts = vc.field("values"), vc.field("counts").to_numpy()
    u = hex_to_u64(np.asarray(sha256_hex_arrow(words), dtype="U64"))
    rows_out, buckets_out, c_out = [], [], []
    for r, seed in enumerate(seeds):
        b = (splitmix64(u ^ np.uint64(seed)) % np.uint64(width)).astype(np.int64)
        mat = np.zeros(width, np.int64)
        np.add.at(mat, b, counts.astype(np.int64))
        nz = np.nonzero(mat)[0]
        rows_out.append(np.full(nz.shape[0], r, np.int64))
        buckets_out.append(nz.astype(np.int64))
        c_out.append(mat[nz])
    return pa.table(
        {
            "cm_row": pa.array(np.concatenate(rows_out)),
            "bucket": pa.array(np.concatenate(buckets_out)),
            "c": pa.array(np.concatenate(c_out)),
        }
    )


def wordcount_cm_sketch(
    files: ray.data.Dataset,
    *,
    width: int = CM_WIDTH,
    seeds: tuple = CM_SEEDS,
    text_col: str = "content",
) -> pa.Table:
    """Count-Min sketch of corpus word occurrences (Cormode & Muthukrishnan,
    J. Algorithms 2005): a depth×width counter matrix whose cell sums are a
    pure function of the input given the fixed row hashes — deterministic,
    so the DuckDB oracle replicates every cell exactly. Point estimates are
    ``min_r matrix[r][bucket_r(word)]`` (not exposed as a query; the matrix
    itself is the checked artifact).

    Scale shape: each block contributes ≤ depth·width nonzero cells (the
    per-block partial is a fixed-size matrix), and the driver folds block
    matrices with elementwise adds in O(depth·width) memory — zero shuffle
    at any corpus size (the KMV fold shape). Output: nonzero
    (cm_row, bucket, c), sorted."""
    depth = len(seeds)
    parts = files.map_batches(
        _cm_partial,
        fn_kwargs={"width": width, "seeds": seeds, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=None,
    )
    mat = np.zeros((depth, width), np.int64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        if b.num_rows == 0:
            continue
        np.add.at(
            mat,
            (b["cm_row"].to_numpy(), b["bucket"].to_numpy()),
            b["c"].to_numpy(),
        )
    r, bk = np.nonzero(mat)
    return pa.table(
        {
            "cm_row": pa.array(r.astype(np.int64)),
            "bucket": pa.array(bk.astype(np.int64)),
            "c": pa.array(mat[r, bk]),
        }
    )  # np.nonzero iterates row-major → (cm_row, bucket)-sorted


EST_SCHEMA = pa.schema(
    [
        pa.field("word", pa.string()),
        pa.field("n_true", pa.int64()),
        pa.field("n_est", pa.int64()),
    ]
)


def cm_word_estimates(
    files: ray.data.Dataset,
    *,
    probe_k: int = 10,
    width: int = CM_WIDTH,
    seeds: tuple = CM_SEEDS,
    text_col: str = "content",
) -> pa.Table:
    """Count-Min accuracy audit: the exact top-``probe_k`` words (by
    occurrence, n DESC / word ASC — the vocab_top_words order) probed
    against the sketch: (word, n_true, n_est), word-sorted. CM's one-sided
    error guarantees ``n_est ≥ n_true`` cell-exactly, so the audit is
    value-checkable, not just statistically plausible."""
    from europa_ray.pipelines.vocab import vocab_top_words
    from europa_ray.util import hex_to_u64, splitmix64

    top = vocab_top_words(files, k=probe_k, text_col=text_col)
    parts = [
        b
        for b in top.iter_batches(batch_format="pyarrow", batch_size=max(probe_k, 1))
        if b.num_rows
    ]
    if not parts:
        return EST_SCHEMA.empty_table()
    tt = pa.concat_tables(parts)
    words = tt["word"]
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_true = tt["n"].to_numpy().astype(np.int64)

    cells = wordcount_cm_sketch(files, width=width, seeds=seeds, text_col=text_col)
    mat = np.zeros((len(seeds), width), np.int64)
    np.add.at(
        mat,
        (cells["cm_row"].to_numpy(), cells["bucket"].to_numpy()),
        cells["c"].to_numpy(),
    )
    u = hex_to_u64(np.asarray(sha256_hex_arrow(words), dtype="U64"))
    est = np.full(u.shape[0], np.iinfo(np.int64).max, np.int64)
    for r, seed in enumerate(seeds):
        b = (splitmix64(u ^ np.uint64(seed)) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, mat[r][b])
    order = np.argsort(np.asarray(words.to_pylist(), dtype=object), kind="stable")
    return pa.table(
        {
            "word": pa.array(
                np.asarray(words.to_pylist(), dtype=object)[order], pa.string()
            ),
            "n_true": pa.array(n_true[order], pa.int64()),
            "n_est": pa.array(est[order], pa.int64()),
        }
    )
