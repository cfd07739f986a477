"""Per-document n-gram novelty — the cross-document duplicate-n-gram
fraction used by web-scale corpus audits (RefinedWeb, Penedo et al. 2023,
reports "fraction of tokens in duplicated n-grams"; Gopher's repetition
rules measure the WITHIN-doc analog, covered by
``textstats.repetition_stats``).

For every document: the size of its unique k-gram shingle set and how many
of those shingles occur in at least one OTHER document (or twice via a
duplicated doc). A low-novelty document is boilerplate even when no single
whole-document dup rule fires — the per-doc complement of the pairwise
containment join (:mod:`europa_ray.pipelines.containment`), reusing its
exact tokenizer/shingle kernels (``\\w+|[^\\w\\s]`` tokens, ascending-hash
unique shingle sets, whole-row fallback for < k-token docs).

100-TB shape: one content scan explodes each doc into its unique
(doc, gram-u64) pairs — already globally distinct because a doc lives in
one row (no distinct-ing shuffle needed); content never shuffles. The
per-gram doc-count table is one gram-keyed aggregate; the dup-gram set
flows back via an inner join (gram-keyed) + per-doc count. Size-dispatched:
driver ``np.unique`` path under ``driver_max_rows`` explode rows, the
groupby/join fallback above it (forced-budget-0 equivalence-tested).

Reference parity: the same hash-group-count semantics as the reference's
per-file digest grouping (``/root/reference/Api/Implementations/
DuplicatesByHash/DuplicateByHashFinder.cs:29-77``) applied at shingle
granularity and aggregated per document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.util import default_num_partitions, scrub_empty_blocks

DEFAULT_K = 5

NOVELTY_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_grams", pa.int64()),
        pa.field("n_dup_grams", pa.int64()),
    ]
)

_ROWS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("gram", pa.int64()),
        pa.field("n_grams", pa.int64()),
        pa.field("real", pa.int8()),
    ]
)


def _explode_grams(
    batch: pa.Table, *, k: int, id_col: str, text_col: str
) -> pa.Table:
    """One row per (doc, unique gram) plus one marker row (``real=0``) per
    nonempty doc with zero tokens, so every document reaches the output.
    ``n_grams`` rides along on every row of its doc."""
    from europa_ray.functions.text import shingles, tokenize_arrow, unique_per_row

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    col = col.filter(valid)
    ids_np = ids.filter(valid).to_numpy().astype(np.int64)
    if ids_np.shape[0] == 0:
        return _ROWS_SCHEMA.empty_table()

    th, off = tokenize_arrow(col)
    sh, soff = shingles(th, off, k)
    ush, uoff = unique_per_row(sh, soff)
    sizes = np.diff(uoff).astype(np.int64)
    marker = np.nonzero(sizes == 0)[0]
    out_doc = np.concatenate([np.repeat(ids_np, sizes), ids_np[marker]])
    out_gram = np.concatenate(
        [ush.view(np.int64), np.zeros(marker.shape[0], np.int64)]
    )
    out_n = np.concatenate(
        [np.repeat(sizes, sizes), np.zeros(marker.shape[0], np.int64)]
    )
    out_real = np.concatenate(
        [
            np.ones(int(sizes.sum()), np.int8),
            np.zeros(marker.shape[0], np.int8),
        ]
    )
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "gram": pa.array(out_gram, pa.int64()),
            "n_grams": pa.array(out_n, pa.int64()),
            "real": pa.array(out_real, pa.int8()),
        }
    )


def _gram_partial_counts(
    batch: pa.Table, *, k: int, text_col: str
) -> pa.Table:
    """Per-batch (gram, c) partial occurrence counts over per-doc UNIQUE
    shingles — the combiner that keeps the gram shuffle at 16 B/row."""
    from europa_ray.functions.text import shingles, tokenize_arrow, unique_per_row

    empty = pa.table(
        {"gram": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
    )
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    col = col.filter(valid)
    if len(col) == 0:
        return empty
    th, off = tokenize_arrow(col)
    sh, soff = shingles(th, off, k)
    ush, _ = unique_per_row(sh, soff)
    if ush.shape[0] == 0:
        return empty
    ug, c = np.unique(ush.view(np.int64), return_counts=True)
    return pa.table(
        {"gram": pa.array(ug, pa.int64()), "c": pa.array(c.astype(np.int64))}
    )


_WORKER_DUPGRAM_CACHE: dict = {}


def gram_novelty(
    files: ray.data.Dataset,
    *,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "content",
    driver_max_rows: int = 50_000_000,
    dup_broadcast_max: int = 20_000_000,
    num_partitions: int | None = None,
):
    """Per-doc novelty profile: (doc_id, n_grams, n_dup_grams), doc-sorted.
    ``n_dup_grams`` counts the doc's unique shingles that occur in more
    than one document corpus-wide.

    Dispatch: driver ``np`` path under ``driver_max_rows`` explode rows;
    else a gram-keyed partial-count aggregate finds the dup-gram set and,
    when it fits ``dup_broadcast_max`` (8 B/gram + plasma overhead), a
    second content pass recounts in-batch against the broadcast sorted
    array — NO doc-keyed shuffle, the chunk_dup_stats shape; above that,
    the gram-keyed join fallback. All three equivalence-tested."""
    if num_partitions is None:
        num_partitions = default_num_partitions()
    rows = files.map_batches(
        _explode_grams,
        fn_kwargs={"k": k, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
    )

    # --- driver fast path ---
    doc_p: list[np.ndarray] = []
    gram_p: list[np.ndarray] = []
    n_p: list[np.ndarray] = []
    real_p: list[np.ndarray] = []
    total = 0
    for b in rows.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += b.num_rows
        if total > driver_max_rows:
            doc_p = []
            break
        doc_p.append(b["doc_id"].to_numpy())
        gram_p.append(b["gram"].to_numpy())
        n_p.append(b["n_grams"].to_numpy())
        real_p.append(b["real"].to_numpy())
    else:
        if not doc_p:
            return NOVELTY_SCHEMA.empty_table()
        doc = np.concatenate(doc_p)
        gram = np.concatenate(gram_p)
        ng = np.concatenate(n_p)
        real = np.concatenate(real_p).astype(bool)
        udoc, uidx = np.unique(doc, return_index=True)
        n_grams = ng[uidx]
        rd, rg = doc[real], gram[real]
        dup = np.zeros(udoc.shape[0], np.int64)
        if rd.shape[0]:
            gcodes_all, gcode = np.unique(rg, return_inverse=True)
            per_gram = np.bincount(gcode, minlength=gcodes_all.shape[0])
            is_dup = per_gram[gcode] > 1
            np.add.at(dup, np.searchsorted(udoc, rd[is_dup]), 1)
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_dup_grams": pa.array(dup, pa.int64()),
            }
        )  # np.unique → doc-sorted

    # --- distributed: gram-keyed partial-count aggregate → dup-gram set ---
    import ray

    dup_ds = (
        files.map_batches(
            _gram_partial_counts,
            fn_kwargs={"k": k, "text_col": text_col},
            batch_format="pyarrow",
        )
        .groupby("gram")
        .sum("c")
        .rename_columns({"sum(c)": "c"})
        .filter(expr="c > 1")
        .materialize()
    )

    if dup_ds.count() <= dup_broadcast_max:
        # broadcast path: sorted dup-gram array → one in-batch recount
        # pass, no doc-keyed shuffle (the chunk_dup_stats shape)
        parts = [
            b["gram"].to_numpy()
            for b in dup_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
            if b.num_rows
        ]
        dup_sorted = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        ref = ray.put(dup_sorted)

        def recount(batch: pa.Table) -> pa.Table:
            from europa_ray.functions.text import (
                shingles,
                tokenize_arrow,
                unique_per_row,
            )

            key = ref.hex()
            dg = _WORKER_DUPGRAM_CACHE.get(key)
            if dg is None:
                _WORKER_DUPGRAM_CACHE.clear()
                dg = _WORKER_DUPGRAM_CACHE[key] = ray.get(ref)
            col = batch[text_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ids = batch[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
            col = col.filter(valid)
            ids_np = ids.filter(valid).to_numpy().astype(np.int64)
            if ids_np.shape[0] == 0:
                return NOVELTY_SCHEMA.empty_table()
            th, off = tokenize_arrow(col)
            sh, soff = shingles(th, off, k)
            ush, uoff = unique_per_row(sh, soff)
            sizes = np.diff(uoff).astype(np.int64)
            g = ush.view(np.int64)
            if dg.shape[0] and g.shape[0]:
                pos = np.searchsorted(dg, g)
                pos[pos == dg.shape[0]] = 0
                is_dup = (dg[pos] == g).astype(np.int64)
            else:
                is_dup = np.zeros(g.shape[0], np.int64)
            # prefix-sum segments (safe for zero-gram rows, unlike reduceat)
            cs = np.concatenate([[0], np.cumsum(is_dup)])
            ndup = cs[uoff[1:]] - cs[uoff[:-1]]
            return pa.table(
                {
                    "doc_id": pa.array(ids_np, pa.int64()),
                    "n_grams": pa.array(sizes, pa.int64()),
                    "n_dup_grams": pa.array(ndup.astype(np.int64), pa.int64()),
                }
            )

        return files.map_batches(recount, batch_format="pyarrow").sort("doc_id")

    # --- join fallback (dup set too large to broadcast) ---
    rows = rows.materialize()  # two consumers: per-doc sizes + dup join
    docs = (
        rows.groupby("doc_id")
        .max("n_grams")
        .rename_columns({"max(n_grams)": "n_grams"})
        .materialize()
    )
    # groupby outputs can carry Ray 2.49 zero-column empty blocks that
    # poison downstream joins on either side — scrub
    docs = scrub_empty_blocks(
        docs,
        pa.schema([pa.field("doc_id", pa.int64()), pa.field("n_grams", pa.int64())]),
    )
    real = rows.filter(expr="real > 0")
    dupset = dup_ds.map_batches(
        lambda b: pa.table({"__g": b["gram"]}), batch_format="pyarrow"
    ).materialize()
    dupset = scrub_empty_blocks(dupset, pa.schema([pa.field("__g", pa.int64())]))
    if dupset.count() == 0:
        return docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_grams": b["n_grams"].cast(pa.int64()),
                    "n_dup_grams": pa.array(np.zeros(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ).sort("doc_id")
    dsum = (
        real.join(
            dupset,
            join_type="inner",
            num_partitions=num_partitions,
            on=("gram",),
            right_on=("__g",),
        )
        .groupby("doc_id")
        .count()
        .rename_columns({"count()": "n_dup_grams"})
    )
    zeros = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_dup_grams": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    alldup = scrub_empty_blocks(
        dsum.union(zeros)
        .groupby("doc_id")
        .sum("n_dup_grams")
        .rename_columns({"sum(n_dup_grams)": "n_dup_grams"})
        .materialize(),
        pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("n_dup_grams", pa.int64())]
        ),
    )
    final = docs.join(
        alldup,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_grams": b["n_grams"].cast(pa.int64()),
                "n_dup_grams": b["n_dup_grams"].cast(pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow").sort("doc_id")
