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


CHUNK_DUP_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_chunks", pa.int64()),
        pa.field("n_dup_chunks", pa.int64()),
    ]
)

_WORKER_DUPSET_CACHE: dict = {}


def chunk_dup_stats(
    files,
    *,
    chunk_tokens: int = 16,
    text_col: str = "content",
    id_col: str = "doc_id",
    dup_broadcast_max: int = 20_000_000,
):
    """Chunk-level dedup report: per document, how many of its
    ``chunk_tokens``-token chunks are duplicated ANYWHERE in the corpus
    (RETRO-style chunk dedup / memorization auditing: near-identical file
    revisions share every chunk except the edited one, which doc-level
    dedup scores as one fuzzy pair but chunk-level dedup quantifies
    exactly).

    Scale shape: one chunking pass → one digest-only
    ``groupby(chunk_sha)`` shuffle reduced to the DISTINCT duplicated-sha
    set. Below ``dup_broadcast_max`` that set is broadcast as one sorted
    structured-u256 key array (32 B/sha, collision-free — the
    ``pipelines/exact.py`` broadcast key) and a second chunking pass
    counts membership in-batch — no doc-keyed shuffle. Above it, a chunk→count
    join + ``groupby(doc)`` aggregate (budget-0 equivalence-tested).

    Output: ``(doc_id, n_chunks, n_dup_chunks)`` — one row per nonempty
    doc. SQL replica: the chunking CTE + HAVING count(*) > 1 semi-join.
    """
    import ray
    import ray.data

    ck = {"chunk_tokens": chunk_tokens, "text_col": text_col, "id_col": id_col}
    chunks = files.map_batches(doc_chunks_batch, fn_kwargs=ck, batch_format="pyarrow")
    # ONE digest shuffle, materialized: the dup set (both paths) and the
    # fallback's per-sha counts both derive from it — the fallback must not
    # re-run the corpus-chunk-cardinality groupby
    cnt_all = (
        chunks.map_batches(
            lambda b: b.select(["chunk_sha"]), batch_format="pyarrow"
        )
        .groupby("chunk_sha")
        .count()
        .rename_columns({"count()": "sha_n"})
        .materialize()
    )
    dup_shas = cnt_all.filter(expr="sha_n > 1").materialize()
    n_dup = dup_shas.count()

    if n_dup <= dup_broadcast_max:
        parts = []
        for b in dup_shas.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            col = b["chunk_sha"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts.append(col)
        from europa_ray.util import U256_DTYPE, hex_to_u256_arrow

        if parts:
            u = np.sort(hex_to_u256_arrow(pa.concat_arrays(parts)))
        else:
            u = np.empty(0, U256_DTYPE)
        ref = ray.put(u)

        def count_batch(batch: pa.Table) -> pa.Table:
            from europa_ray.util import hex_to_u256_arrow, sorted_member

            key = ref.hex()
            dups = _WORKER_DUPSET_CACHE.get(key)
            if dups is None:
                _WORKER_DUPSET_CACHE.clear()
                dups = _WORKER_DUPSET_CACHE[key] = ray.get(ref)
            ch = doc_chunks_batch(batch, **ck)
            if ch.num_rows == 0:
                return CHUNK_DUP_SCHEMA.empty_table()
            isdup = sorted_member(dups, hex_to_u256_arrow(ch["chunk_sha"]))
            d = ch["doc_id"].to_numpy()
            newd = np.ones(d.shape[0], dtype=bool)
            newd[1:] = d[1:] != d[:-1]  # doc_chunks_batch emits docs contiguously
            starts = np.nonzero(newd)[0]
            return pa.table(
                {
                    "doc_id": pa.array(d[starts]),
                    "n_chunks": pa.array(np.diff(np.append(starts, d.shape[0]))),
                    "n_dup_chunks": pa.array(
                        np.add.reduceat(isdup.astype(np.int64), starts)
                    ),
                }
            )

        return files.map_batches(count_batch, batch_format="pyarrow")

    # --- join fallback: chunk rows → per-sha count → per-doc aggregate ---
    from ray.data.aggregate import Count, Sum

    from europa_ray.util import default_num_partitions, scrub_empty_blocks

    cnt = cnt_all.map_batches(
        lambda b: pa.table(
            {"__s": b["chunk_sha"], "__c": b["sha_n"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    joined = chunks.map_batches(
        lambda b: b.select(["doc_id", "chunk_sha"]), batch_format="pyarrow"
    ).join(
        cnt,
        join_type="inner",
        num_partitions=default_num_partitions(),
        on=("chunk_sha",),
        right_on=("__s",),
    )
    joined = scrub_empty_blocks(
        joined.materialize(),
        pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("chunk_sha", pa.string()),
                pa.field("__c", pa.int64()),
            ]
        ),
    )

    def flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "isdup": pc.cast(
                    pc.greater(batch["__c"], 1), pa.int64()
                ),
            }
        )

    agg = (
        joined.map_batches(flag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("one"), Sum("isdup"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_chunks": b["sum(one)"].cast(pa.int64()),
                "n_dup_chunks": b["sum(isdup)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
