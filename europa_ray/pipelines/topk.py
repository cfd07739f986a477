"""Per-group top-k — the K1 candidate-cap semantics (SURVEY.md §2.6,
``QdrantRepository.cs:192`` ``limit: 100``) as a first-class query: the k
highest-token-count documents of every group (ties → minimum id), the
"show me each language's largest files" shape.

Scale shape — combiner first, like ``vocab_top_words``: each batch emits
at most k rows per group it contains (one numpy lexsort per batch, no
Python loops), so the ``groupby(group)`` exchange carries
``k × groups × blocks`` rows instead of the corpus; the final per-group
top-k is a vectorized ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

TOPK_SCHEMA = pa.schema(
    [
        pa.field("lang", pa.string()),
        pa.field("rank", pa.int64()),
        pa.field("doc_id", pa.int64()),
        pa.field("n_tokens", pa.int64()),
    ]
)


def _partial_topk(
    groups: np.ndarray, ids: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-group (count DESC, id ASC) top-k over one unsorted batch; also
    returns the within-group rank (1-based) of each kept row."""
    order = np.lexsort((ids, -counts, groups))
    gs = groups[order]
    new = np.ones(gs.shape[0], dtype=bool)
    new[1:] = gs[1:] != gs[:-1]
    first_idx = np.flatnonzero(new)
    row_first = np.repeat(first_idx, np.diff(np.append(first_idx, gs.shape[0])))
    rank = np.arange(gs.shape[0], dtype=np.int64) - row_first + 1
    keep = rank <= k
    sel = order[keep]
    return groups[sel], ids[sel], counts[sel], rank[keep]


def top_docs_per_group(
    files: ray.data.Dataset,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
) -> ray.data.Dataset:
    """Top-k documents by token count per group: ``(lang, rank, doc_id,
    n_tokens)``, rank 1-based in (n_tokens DESC, id ASC) order. Empty/null
    content is excluded (it has no tokens to rank)."""
    import pyarrow.compute as pc

    from europa_ray.functions.text import token_count_arrow

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(pc.utf8_length(batch["content"]), 0))
        if batch.num_rows == 0:
            return TOPK_SCHEMA.empty_table()
        counts = token_count_arrow(batch["content"])
        gcol = batch[group_col]
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
        groups = np.asarray(gcol.to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy()
        g, i, c, r = _partial_topk(groups, ids, counts.astype(np.int64), k)
        return pa.table(
            {
                "lang": pa.array(g.tolist(), pa.string()),
                "rank": pa.array(r),
                "doc_id": pa.array(i, pa.int64()),
                "n_tokens": pa.array(c, pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        groups = np.asarray(group["lang"].to_pylist(), dtype=object)
        ids = group["doc_id"].to_numpy()
        counts = group["n_tokens"].to_numpy()
        g, i, c, r = _partial_topk(groups, ids, counts, k)
        return pa.table(
            {
                "lang": pa.array(g.tolist(), pa.string()),
                "rank": pa.array(r),
                "doc_id": pa.array(i, pa.int64()),
                "n_tokens": pa.array(c, pa.int64()),
            }
        )

    return (
        files.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pyarrow")
    )


def _partial_bottomk(
    groups: np.ndarray, ids: np.ndarray, keys: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-group (key ASC, id ASC) bottom-k over one unsorted batch; also
    returns the within-group rank (1-based) of each kept row."""
    order = np.lexsort((ids, keys, groups))
    gs = groups[order]
    new = np.ones(gs.shape[0], dtype=bool)
    new[1:] = gs[1:] != gs[:-1]
    first_idx = np.flatnonzero(new)
    row_first = np.repeat(first_idx, np.diff(np.append(first_idx, gs.shape[0])))
    rank = np.arange(gs.shape[0], dtype=np.int64) - row_first + 1
    keep = rank <= k
    sel = order[keep]
    return groups[sel], ids[sel], keys[sel], rank[keep]


def eval_sample_per_group(
    files: ray.data.Dataset,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
    text_col: str = "content",
) -> ray.data.Dataset:
    """Deterministic per-group eval/holdout sample: the ``k`` documents
    with the SMALLEST content-hash prefix per group (hex order ≡ u64
    order; ties → min id) — a stable, content-keyed selection that follows
    a document across runs, partitionings, and corpus growth (only a new
    globally-smaller hash can displace a member), keyed by the same
    sha-prefix family as ``split_assign``. NOTE: content-hash keying only
    guarantees eval/train separation on a DEDUPED corpus — two byte-equal
    copies share ``h`` but tie-break by id, so if they straddle rank k one
    lands in eval while its twin stays in train. Run exact dedup first if
    that separation matters. Output ``(group_col, rank, id, h)``, rank
    1-based in (h ASC, id ASC) order; the group column is named after
    ``group_col``.

    Scale shape: the partial-bottom-k combiner caps every batch's
    contribution at k rows per group seen, so the groupby moves ≤
    k × groups × batches rows — never the corpus."""
    import pyarrow.compute as pc

    from europa_ray.util import sha256_hex_arrow

    out_schema = pa.schema(
        [
            pa.field(group_col, pa.string()),
            pa.field("rank", pa.int64()),
            pa.field("doc_id", pa.int64()),
            pa.field("h", pa.string()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
        batch = batch.filter(valid)
        if batch.num_rows == 0:
            return out_schema.empty_table()
        col = col.filter(valid)
        keys = np.asarray(sha256_hex_arrow(col), dtype="S64").astype("S16")
        gcol = batch[group_col]
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
        groups = np.asarray(gcol.to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy()
        g, i, h, r = _partial_bottomk(groups, ids, keys, k)
        return pa.table(
            {
                group_col: pa.array(g.tolist(), pa.string()),
                "rank": pa.array(r),
                "doc_id": pa.array(i, pa.int64()),
                "h": pa.array(h.astype("U16").astype(object), pa.string()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        groups = np.asarray(group[group_col].to_pylist(), dtype=object)
        ids = group["doc_id"].to_numpy()
        keys = group["h"].to_numpy(zero_copy_only=False).astype("S16")
        g, i, h, r = _partial_bottomk(groups, ids, keys, k)
        return pa.table(
            {
                group_col: pa.array(g.tolist(), pa.string()),
                "rank": pa.array(r),
                "doc_id": pa.array(i, pa.int64()),
                "h": pa.array(h.astype("U16").astype(object), pa.string()),
            }
        )

    return (
        files.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )
