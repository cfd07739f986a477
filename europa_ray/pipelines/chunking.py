"""Document chunking — cut every document's token stream into fixed-size
disjoint chunks (the context-window prep step: C4/Pile-style pipelines
split long documents before packing; RAG pipelines index fixed-token
chunks). Emits one row per chunk with its text's sha256 (not the text —
compact and value-checkable), so downstream chunk-level dedup can run on
digests.

Tokens are single-space-split segments (the corpus delimiter, shared with
:mod:`~europa_ray.pipelines.vocab`); chunk ``i`` holds tokens
``[i·C, (i+1)·C)`` and the last chunk keeps the remainder (no padding, no
overlap — disjoint chunks keep the whole operator expressible as ONE
zero-copy Arrow pass: chunk boundaries are a re-offsetting of the
flattened token stream, so no token is copied twice).

Output: ``(doc_id, chunk_idx, n_tokens, chunk_sha)``; null/empty content
excluded (house predicate).

Scale shape: single ``map_batches`` stage, no shuffle; output rows ≈
tokens/C per doc. Fully vectorized: ``split_pattern`` → new ListArray
offsets at ``row_start + k·C`` → ``binary_join`` → one sha pass.

SQL replica: ``unnest(generate_series(1, len(tk), C))`` +
``array_to_string(tk[i:i+C-1], ' ')`` (the line-dedup slicing pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("chunk_idx", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("chunk_sha", pa.string()),
    ]
)


def doc_chunks_batch(
    batch: pa.Table,
    *,
    chunk_tokens: int = 64,
    text_col: str = "content",
    id_col: str = "doc_id",
) -> pa.Table:
    """One row per ``chunk_tokens``-token chunk of every doc (last chunk =
    remainder). See module docstring."""
    from europa_ray.util import sha256_hex_arrow

    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    col = col.filter(valid)
    ids = batch[id_col].filter(valid).to_numpy()
    if len(col) == 0:
        return CHUNKS_SCHEMA.empty_table()

    split = pc.split_pattern(col, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    n_tok = pc.list_value_length(split).cast(pa.int64()).to_numpy()
    flat = split.flatten()

    # chunk boundaries: for each row, offsets row_start + k·C (k ≥ 0),
    # then the next row's start closes the last (remainder) chunk
    n_chunks = (n_tok + chunk_tokens - 1) // chunk_tokens  # ≥ 1 (n_tok ≥ 1)
    row_start = np.concatenate([[0], np.cumsum(n_tok)])
    total = int(n_chunks.sum())
    chunk_row = np.repeat(np.arange(len(col), dtype=np.int64), n_chunks)
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_chunks)])[:-1], n_chunks
    )
    starts = row_start[chunk_row] + chunk_idx * chunk_tokens
    offsets = np.concatenate([starts, [row_start[-1]]])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    texts = pc.binary_join(lists, pa.scalar(" "))
    n_in_chunk = np.diff(offsets)
    return pa.table(
        {
            "doc_id": pa.array(ids[chunk_row], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(n_in_chunk, pa.int64()),
            "chunk_sha": pa.array(sha256_hex_arrow(texts), pa.string()),
        }
    )
